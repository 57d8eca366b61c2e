"""AudioAttnNet — transformer over VGGish audio feature tokens.

The reference module (`models/audio_attention.py:93-143`) computes a patch
embedding + temporal position embedding and then *discards both* (lines
132-139 re-derive `x` from the raw input); the effective computation is a
1-layer pre-norm transformer (dim 512, 2 heads, head-dim 64, mlp 256) over
the raw (t*h*w) tokens followed by a final LayerNorm. We build exactly that
effective behavior; the dead parameters are not recreated.

(B, T, H, W, 512) -> (B, T, H, W, 512)
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from diff_sal_tpu.config import AudioAttnConfig
from diff_sal_tpu.models.layers import FusedLayerNorm


class TokenAttention(nn.Module):
    """Pre-norm multi-head self-attention (reference audio_attention.py:30-66):
    LN -> fused qkv (no bias) -> softmax(q k^T / sqrt(d_head)) v -> out proj."""

    heads: int
    dim_head: int
    dropout: float = 0.0
    dtype: "jnp.dtype" = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        B, N, C = x.shape
        inner = self.heads * self.dim_head
        h = FusedLayerNorm(name="norm")(x)
        qkv = nn.Dense(
            inner * 3, use_bias=False, dtype=self.dtype, name="to_qkv"
        )(h)
        qkv = qkv.reshape(B, N, 3, self.heads, self.dim_head)
        q, k, v = jnp.moveaxis(qkv, 2, 0)
        attn = jnp.einsum("bnhd,bmhd->bhnm", q, k) * self.dim_head**-0.5
        attn = jax.nn.softmax(attn, axis=-1)
        attn = nn.Dropout(self.dropout)(attn, deterministic=deterministic)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(B, N, inner)
        out = nn.Dense(C, dtype=self.dtype, name="to_out")(out)
        return nn.Dropout(self.dropout)(out, deterministic=deterministic)


class TokenFeedForward(nn.Module):
    """LN -> Dense(hidden) -> GELU -> Dense(dim)
    (reference audio_attention.py:13-27)."""

    hidden_dim: int
    dropout: float = 0.0
    dtype: "jnp.dtype" = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        C = x.shape[-1]
        h = FusedLayerNorm(name="norm")(x)
        h = nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc1")(h)
        h = jax.nn.gelu(h, approximate=False)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Dense(C, dtype=self.dtype, name="fc2")(h)
        return nn.Dropout(self.dropout)(h, deterministic=deterministic)


class AudioAttnNet(nn.Module):
    cfg: AudioAttnConfig = AudioAttnConfig()
    dtype: "jnp.dtype" = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        B, T, H, W, C = x.shape
        tokens = x.reshape(B, T * H * W, C)
        for i in range(self.cfg.depth):
            tokens = (
                TokenAttention(
                    self.cfg.heads, self.cfg.dim_head, self.cfg.dropout,
                    dtype=self.dtype, name=f"attn{i}",
                )(tokens, deterministic)
                + tokens
            )
            tokens = (
                TokenFeedForward(
                    self.cfg.mlp_dim, self.cfg.dropout, dtype=self.dtype,
                    name=f"ff{i}",
                )(tokens, deterministic)
                + tokens
            )
        tokens = FusedLayerNorm(name="final_norm")(tokens)
        return tokens.reshape(B, T, H, W, C)
