"""VGGish audio encoder (flax.linen, channel-last).

Conv stack [64, M, 128, M, 256, 256, M, 512, 512, M] on 1-channel log-mel
images (reference `models/vggish.py:96-128`). Only the conv features are used
by the main model (`forward_feat`); the FC embedding head (512*4*6 -> 4096 ->
4096 -> 128) exists in the reference checkpoint and is provided here as an
optional head for completeness. The encoder is frozen at the call site
(reference `models/diff_model.py:74-75` wraps it in no_grad — we expose a
`stop_gradient` at the composition level instead).

(B, 112, 192, 1) -> forward_feat -> (B, 7, 12, 512)
"""

from __future__ import annotations

from typing import Sequence, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from diff_sal_tpu.config import VGGishConfig


class VGGishFeatures(nn.Module):
    """The conv trunk; each 'M' is a 2x2 max-pool, each int a 3x3 conv+ReLU."""

    cfg: VGGishConfig = VGGishConfig()
    dtype: "jnp.dtype" = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        conv_idx = 0
        for v in self.cfg.layers:
            if v == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            else:
                x = nn.Conv(
                    int(v), (3, 3), padding=1, dtype=self.dtype,
                    name=f"conv{conv_idx}",
                )(x)
                x = nn.relu(x)
                conv_idx += 1
        return x


class VGGish(nn.Module):
    cfg: VGGishConfig = VGGishConfig()
    dtype: "jnp.dtype" = None

    def setup(self):
        self.features = VGGishFeatures(self.cfg, dtype=self.dtype)
        # FC embedding head (unused by the saliency path, kept for parity
        # with the published vggish.pth contract).
        self.fc1 = nn.Dense(4096)
        self.fc2 = nn.Dense(4096)
        self.fc3 = nn.Dense(128)

    def forward_feat(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.features(x)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """Full VGGish embedding (96x64-style inputs -> 128-d): flatten in the
        torch (C, H, W)->(H, W, C) transposed order the reference uses
        (vggish.py:83-88), then the 3-layer ReLU MLP."""
        feats = self.features(x)  # (B, H', W', 512) — already channel-last
        flat = feats.reshape(feats.shape[0], -1)
        h = nn.relu(self.fc1(flat))
        h = nn.relu(self.fc2(h))
        return nn.relu(self.fc3(h))
