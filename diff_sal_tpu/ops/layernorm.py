"""Pallas TPU kernel: single-pass fused LayerNorm over the last axis.

XLA lowers LayerNorm as a convert->reduce fusion (mean, E[x^2]) plus a
separate normalize fusion — 2-3 passes through HBM with f32 converts in
between. At the MViT finest scale that chain costs ~5 ms/iter (xplane,
docs/PERF.md). This kernel reads each row tile once, computes the f32
stats in VMEM and writes the normalized output directly.

Backward goes through the plain-jnp reference formulation (LayerNorm's
VJP is elementwise + small reductions — XLA handles it well; the win is
the forward's HBM traffic).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from diff_sal_tpu.ops.attention import _round_up


def _ln_kernel(x_ref, scale_ref, bias_ref, o_ref, *, c_real: int,
               eps: float):
    x = x_ref[...].astype(jnp.float32)
    # padded lanes are zero: sums are exact as long as we divide by c_real
    mean = jnp.sum(x, axis=-1, keepdims=True) / c_real
    # fast-variance form can go slightly negative from f32 cancellation on
    # near-constant large-magnitude rows; clamp before rsqrt
    var = jnp.maximum(
        jnp.sum(x * x, axis=-1, keepdims=True) / c_real - mean * mean, 0.0
    )
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    o_ref[...] = (
        y * scale_ref[...].astype(jnp.float32)
        + bias_ref[...].astype(jnp.float32)
    ).astype(o_ref.dtype)


def _ln_reference(x, scale, bias, eps):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * scale.astype(jnp.float32) + bias.astype(jnp.float32)).astype(
        x.dtype
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_layernorm(
    x: jnp.ndarray,
    scale: jnp.ndarray,  # (C,)
    bias: jnp.ndarray,  # (C,)
    eps: float = 1e-6,
    interpret: bool = None,
) -> jnp.ndarray:
    """LayerNorm over the last axis of x, f32 statistics, output in x.dtype.

    interpret=None auto-selects: compiled on TPU, plain-jnp fallback
    elsewhere (interpret-mode pallas is slower than XLA on CPU)."""
    if interpret is None:
        import os

        if (
            jax.default_backend() != "tpu"
            or os.environ.get("DIFF_SAL_XLA_LN") == "1"
        ):
            return _ln_reference(x, scale, bias, eps)
        interpret = False
    C = x.shape[-1]
    lead = x.shape[:-1]
    R = 1
    for d in lead:
        R *= d
    x2 = x.reshape(R, C)
    c_pad = _round_up(C, 128)
    # the compiler keeps ~6 f32 tile-sized temporaries live (x, x*x, y,
    # scaled out, converts); budget 6 MB of the 16 MB VMEM for them
    budget_rows = (6 * 1024 * 1024) // (6 * c_pad * 4)
    r_tile = max(min(budget_rows, _round_up(R, 8)) // 8 * 8, 8)
    r_pad = _round_up(R, r_tile)
    xp = jnp.pad(x2, ((0, r_pad - R), (0, c_pad - C)))
    sp = jnp.pad(scale, (0, c_pad - C)).reshape(1, c_pad)
    bp = jnp.pad(bias, (0, c_pad - C)).reshape(1, c_pad)

    out = pl.pallas_call(
        functools.partial(_ln_kernel, c_real=C, eps=eps),
        grid=(r_pad // r_tile,),
        in_specs=[
            pl.BlockSpec((r_tile, c_pad), lambda i: (i, 0)),
            pl.BlockSpec((1, c_pad), lambda i: (0, 0)),
            pl.BlockSpec((1, c_pad), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((r_tile, c_pad), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((r_pad, c_pad), x.dtype),
        interpret=interpret,
    )(xp, sp, bp)
    return out[:R, :C].reshape(x.shape)


def _ln_fwd(x, scale, bias, eps, interpret):
    return fused_layernorm(x, scale, bias, eps, interpret), (x, scale, bias)


def _ln_bwd(eps, interpret, res, g):
    x, scale, bias = res
    _, vjp = jax.vjp(lambda x, s, b: _ln_reference(x, s, b, eps), x, scale,
                     bias)
    return vjp(g)


fused_layernorm.defvjp(_ln_fwd, _ln_bwd)
