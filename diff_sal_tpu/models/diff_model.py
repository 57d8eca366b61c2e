"""VideoSaliencyModel — top-level composition of encoder(s) + denoiser.

Mirrors the capability of reference `models/diff_model.py:8-114`: an optional
MViT visual encoder, optional frozen VGGish audio encoder with AudioAttnNet
spatio-temporal transformer, and the SalUNet diffusion decoder. Being
functional, the visual/audio features are first-class values: samplers
compute them once and reuse them across steps (the reference must deep-copy
the feature list every DDIM step because its decoder mutates it —
`diffusion_trainer.py:447-452` — a cost that simply disappears here).

Input layouts (channel-last):
  rgb   (B, 16, 224, 384, 3)   ImageNet-normalized frames
  audio (B, 9, 112, 192, 1)    log-mel examples
  x_t   (B, 224, 384, 1)       noised saliency map
  t     (B,)                   timesteps
"""

from __future__ import annotations

from typing import List, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from diff_sal_tpu.config import ModelConfig
from diff_sal_tpu.models.audio_attention import AudioAttnNet
from diff_sal_tpu.models.mvit import MViT
from diff_sal_tpu.models.sal_unet import SalUNet
from diff_sal_tpu.models.vggish import VGGish


class VideoSaliencyModel(nn.Module):
    cfg: ModelConfig

    def setup(self):
        dtype = (
            jnp.dtype(self.cfg.compute_dtype)
            if self.cfg.compute_dtype not in (None, "float32")
            else None
        )
        self.visual_net = (
            MViT(self.cfg.visual, dtype=dtype) if self.cfg.visual else None
        )
        self.audio_net = (
            VGGish(self.cfg.audio, dtype=dtype) if self.cfg.audio else None
        )
        self.spatiotemp_net = (
            AudioAttnNet(self.cfg.spatiotemp, dtype=dtype)
            if self.cfg.spatiotemp
            else None
        )
        self.decoder_net = SalUNet(self.cfg.decoder, dtype=dtype)

    def encode_visual(self, rgb: jnp.ndarray) -> List[jnp.ndarray]:
        """rgb (B, T, H, W, 3) -> coarse-first 4-scale pyramid.

        uint8 input (the packed decode-free pipeline, data/packed.py) is
        ImageNet-normalized on device here.

        With `visual=None` (decoder-only ablation) the reference substitutes
        a fresh RANDOM feature pyramid at the shapes MViT would have produced
        (diff_model.py:100-109) — replicated here. Callers must provide a
        'pyramid' rng (the reference draws fresh torch.randn per call; a
        silent fixed-key fallback would freeze the ablation's features, so
        a missing rng raises outside of `init`)."""
        if rgb.dtype == jnp.uint8:
            from diff_sal_tpu.data.transforms import normalize_rgb_u8

            rgb = normalize_rgb_u8(rgb, stats=self.cfg.uint8_norm)
        if self.visual_net is None:
            return self._random_pyramid(rgb)
        return self.visual_net(rgb)

    def _random_pyramid(self, rgb: jnp.ndarray) -> List[jnp.ndarray]:
        B, T, H, W = rgb.shape[:4]
        t4, h4, w4 = T // 2, H // 4, W // 4
        if self.has_rng("pyramid"):
            key = self.make_rng("pyramid")
        elif self.is_initializing():
            key = jax.random.PRNGKey(0)
        else:
            raise ValueError(
                "visual=None (random-pyramid ablation) requires a 'pyramid' "
                "rng: model.apply(..., rngs={'pyramid': key})"
            )
        dims = (768, 384, 192, 96)  # coarse-first, /8 /4 /2 /1 of (h4, w4)
        return [
            jax.random.normal(
                jax.random.fold_in(key, i),
                (B, t4, h4 >> (3 - i), w4 >> (3 - i), c),
                rgb.dtype,
            )
            for i, c in enumerate(dims)
        ]

    def encode_audio(
        self, audio: jnp.ndarray, deterministic: bool = True
    ) -> jnp.ndarray:
        """audio (B, Ta, 112, 192, 1) -> (B, Ta, 7, 12, 512).

        The VGGish trunk is frozen (reference diff_model.py:74-75 runs it
        under no_grad): gradients are stopped on its output so its params
        receive none.
        """
        assert self.audio_net is not None
        B, Ta = audio.shape[0], audio.shape[1]
        frames = audio.reshape((B * Ta,) + audio.shape[2:])
        feat = self.audio_net.forward_feat(frames)  # (B*Ta, 7, 12, 512)
        feat = jax.lax.stop_gradient(feat)
        feat = feat.reshape((B, Ta) + feat.shape[1:])
        if self.spatiotemp_net is not None:
            feat = self.spatiotemp_net(feat, deterministic=deterministic)
        return feat

    def denoise(
        self,
        x: jnp.ndarray,
        t: jnp.ndarray,
        feat_list: List[jnp.ndarray],
        audio_feat: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> jnp.ndarray:
        return self.decoder_net(x, t, feat_list, audio_feat, train=train)

    def __call__(
        self,
        data: dict,
        t: jnp.ndarray,
        train: bool = False,
    ) -> jnp.ndarray:
        """Full forward: encoders + denoiser (reference diff_model.py:83-114).

        data: {"rgb": ..., "input": x_t, "audio": optional}.
        """
        audio_feat = None
        if self.audio_net is not None and data.get("audio") is not None:
            audio_feat = self.encode_audio(data["audio"], deterministic=not train)
        feat_list = self.encode_visual(data["rgb"])
        return self.denoise(data["input"], t, feat_list, audio_feat, train=train)


def param_counts(variables) -> dict:
    """Per-subnet parameter counts in millions (reference prints these at
    build, diff_model.py:66-68)."""
    import numpy as np

    out = {}
    params = variables.get("params", variables)
    for key, sub in params.items():
        out[key] = sum(np.prod(x.shape) for x in jax.tree.leaves(sub)) / 1e6
    return out
