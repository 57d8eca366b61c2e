"""Shared building blocks (flax.linen, channel-last layouts).

Covers the reference's small blocks: sinusoidal timestep embedding
(`models/saliency_decoder/sal_unet.py:15-33`), MLPs
(`common_block.py:125-147`, `mvit.py:404-440`), conv+BN+ReLU
(`common_block.py:33-36`), MLPHead (`common_block.py:111-122`),
DropPath (timm), GroupNorm-swish conv blocks. All convs operate on
channel-last arrays — the TPU-native layout.
"""

from __future__ import annotations

import math
from typing import Callable, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

# torch nn.GELU default is the exact erf formulation; jax defaults to tanh
# approximation, so pin approximate=False everywhere.
gelu_exact = lambda x: jax.nn.gelu(x, approximate=False)  # noqa: E731

# tanh approximation (~1e-3 max abs delta from exact): far fewer VPU ops
# than the erfc chain — selectable via MViTConfig.gelu (docs/PERF.md r3)
gelu_tanh = lambda x: jax.nn.gelu(x, approximate=True)  # noqa: E731

# N(0, 0.01) — the SalUNet init override (reference sal_unet.py:263-277).
salunet_init = nn.initializers.normal(stddev=0.01)
# timm trunc_normal_(std=0.02) — ViT-style init.
vit_init = nn.initializers.truncated_normal(stddev=0.02, lower=-2.0, upper=2.0)


def timestep_embedding(t: jnp.ndarray, dim: int) -> jnp.ndarray:
    """Sinusoidal timestep embedding, fairseq/DDPM convention
    (reference sal_unet.py:15-33): freq_i = exp(-ln(10000) * i / (half-1)),
    output [sin | cos], zero-padded if dim is odd."""
    assert t.ndim == 1
    half = dim // 2
    freqs = jnp.exp(
        -math.log(10000.0) * jnp.arange(half, dtype=jnp.float32) / (half - 1)
    )
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


def drop_path(
    x: jnp.ndarray, rate: float, deterministic: bool, rng: Optional[jax.Array]
) -> jnp.ndarray:
    """Stochastic depth on the leading (batch) axis, timm semantics."""
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jnp.floor(keep + jax.random.uniform(rng, shape, x.dtype))
    return x / keep * mask


class DropPath(nn.Module):
    rate: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        rng = None
        if not deterministic and self.rate > 0.0:
            rng = self.make_rng("dropout")
        return drop_path(x, self.rate, deterministic, rng)


class Mlp(nn.Module):
    """Linear -> act -> Linear (+dropout) on the trailing feature axis.

    quant: "none" | "w8" | "w8a8" — eval-time int8 storage of the fc
    kernels (ops/quant.py). The quantized tree is produced from an fp
    tree by quantize_like; the param NAMES stay fc1/fc2."""

    hidden_features: int
    out_features: Optional[int] = None
    act: Callable = gelu_exact
    dropout: float = 0.0
    kernel_init: Callable = salunet_init
    dtype: Optional[jnp.dtype] = None
    quant: str = "none"

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        out_features = self.out_features or x.shape[-1]
        if self.quant != "none":
            from diff_sal_tpu.ops.quant import QuantDense

            dense = lambda feat, name: QuantDense(  # noqa: E731
                feat, mode=self.quant, dtype=self.dtype, name=name
            )
        else:
            dense = lambda feat, name: nn.Dense(  # noqa: E731
                feat, kernel_init=self.kernel_init, dtype=self.dtype,
                name=name,
            )
        x = dense(self.hidden_features, "fc1")(x)
        x = self.act(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = dense(out_features, "fc2")(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return x


class ConvBNRelu(nn.Module):
    """3x3 conv + BatchNorm + ReLU (reference common_block.py:33-36).

    When called with `tasks` + `out_hw` instead of `x`, the input is the
    decoder's multi-scale resize+sum (sum_i bilinear_resize(task_i)),
    computed by the single-pass bilinear_resize_sum kernel. With
    fused_head=True (eval only) the WHOLE chain instead lowers through
    resize_sum_conv_relu (ops/resize.py) with the BN running stats folded
    into the conv weights — measured slower on v5e, see the field comment.
    Parameters are identical on every path."""

    features: int
    kernel_init: Callable = salunet_init
    dtype: Optional[jnp.dtype] = None
    # fused eval head: MEASURED SLOWER than the unfused chain on v5e
    # (4.1 vs 3.97 ms/iter at B=8, ht=28 variant 6.8 — the XLA conv
    # emitter + single-pass resize_sum win; docs/PERF.md round 3). Kept
    # implemented + equality-tested, default OFF.
    fused_head: bool = False
    # eval-only conv-at-low-res restructure (SalUNetConfig.head_lowres,
    # ops/resize.py resize_sum_conv_relu_lowres)
    head_lowres: bool = False
    # weight-grad-as-dots conv (SalUNetConfig.conv_wg_dots,
    # ops/convgrad.py) — forward bits identical, train-path lever
    wg_dots: bool = False

    def setup(self):
        self.conv = nn.Conv(
            self.features, (3, 3), padding=1, kernel_init=self.kernel_init,
            dtype=self.dtype, name="conv",
        )
        self.bn = nn.BatchNorm(
            momentum=0.9, epsilon=1e-5, dtype=self.dtype, name="bn",
        )

    def __call__(self, x=None, train: bool = False, *, tasks=None,
                 out_hw=None):
        from diff_sal_tpu.ops.resize import (bilinear_resize_sum,
                                             resize_sum_conv_relu,
                                             resize_sum_conv_relu_phase)

        if (self.head_lowres and tasks is not None and not train
                and not self.is_initializing()):
            kernel = self.conv.variables["params"]["kernel"]
            cbias = self.conv.variables["params"]["bias"]
            scale = self.bn.variables["params"]["scale"]
            bbias = self.bn.variables["params"]["bias"]
            mean = self.bn.variables["batch_stats"]["mean"]
            var = self.bn.variables["batch_stats"]["var"]
            a = scale * jax.lax.rsqrt(var + 1e-5)
            b = (cbias - mean) * a + bbias
            dt = self.dtype or tasks[0].dtype
            return resize_sum_conv_relu_phase(
                [t.astype(dt) for t in tasks], out_hw,
                (kernel * a).astype(dt), b.astype(jnp.float32),
            )
        if (self.fused_head and tasks is not None and not train
                and not self.is_initializing()):
            # eval: fold BN (running stats) + conv bias into one affine and
            # run the fused kernel: relu(conv_k'(sum resize) + b')
            kernel = self.conv.variables["params"]["kernel"]
            cbias = self.conv.variables["params"]["bias"]
            scale = self.bn.variables["params"]["scale"]
            bbias = self.bn.variables["params"]["bias"]
            mean = self.bn.variables["batch_stats"]["mean"]
            var = self.bn.variables["batch_stats"]["var"]
            a = scale * jax.lax.rsqrt(var + 1e-5)
            b = (cbias - mean) * a + bbias
            dt = self.dtype or tasks[0].dtype
            return resize_sum_conv_relu(
                [t.astype(dt) for t in tasks], out_hw,
                (kernel * a).astype(dt), b.astype(jnp.float32),
            )
        if tasks is not None:
            x = bilinear_resize_sum(tasks, out_hw)
        if self.wg_dots and not self.is_initializing():
            from diff_sal_tpu.ops.convgrad import conv2d_wg_dots

            kernel = self.conv.variables["params"]["kernel"]
            cbias = self.conv.variables["params"]["bias"]
            dt = self.dtype or x.dtype
            x = conv2d_wg_dots(
                x.astype(dt), kernel.astype(dt), (1, 1), (1, 1)
            ) + cbias.astype(dt)
        else:
            x = self.conv(x)
        x = self.bn(x, use_running_average=not train)
        return nn.relu(x)


class MLPHead(nn.Module):
    """1x1 conv + sigmoid head (reference common_block.py:111-122)."""

    num_classes: int = 1
    kernel_init: Callable = salunet_init

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.num_classes, (1, 1), kernel_init=self.kernel_init, name="linear_pred"
        )(x)
        return jax.nn.sigmoid(x)


class GroupNorm(nn.Module):
    """GroupNorm(32, eps=1e-6) matching the DDPM `Normalize`
    (reference sal_unet.py:41-44)."""

    num_groups: int = 32
    epsilon: float = 1e-6

    @nn.compact
    def __call__(self, x):
        return nn.GroupNorm(
            num_groups=self.num_groups, epsilon=self.epsilon, name="gn"
        )(x)


class LayerNorm(nn.Module):
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        return nn.LayerNorm(epsilon=self.epsilon)(x)


class FusedLayerNorm(nn.Module):
    """nn.LayerNorm-compatible module (same 'scale'/'bias' param tree) whose
    forward runs the single-pass Pallas kernel on TPU (ops/layernorm.py) and
    identical plain-jnp math elsewhere. XLA's LayerNorm chain is 2-3 HBM
    passes with f32 converts; the kernel is one.

    real_dim: masked LayerNorm over a zero-padded last axis (e.g. head_dim
    96 padded to the 128-lane tile) — params stay at the real (checkpoint)
    size and the pad lanes stay zero."""

    epsilon: float = 1e-6
    real_dim: Optional[int] = None

    @nn.compact
    def __call__(self, x):
        from diff_sal_tpu.ops.layernorm import fused_layernorm

        C = self.real_dim or x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (C,))
        bias = self.param("bias", nn.initializers.zeros, (C,))
        # positional: custom_vjp functions reject keyword arguments
        return fused_layernorm(x, scale, bias, self.epsilon, None,
                               self.real_dim)
