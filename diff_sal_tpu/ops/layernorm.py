"""Pallas TPU kernel: single-pass fused LayerNorm over the last axis.

XLA lowers LayerNorm as a convert->reduce fusion (mean, E[x^2]) plus a
separate normalize fusion — 2-3 passes through HBM with f32 converts in
between. At the MViT finest scale that chain costs ~5 ms/iter (xplane,
docs/PERF.md). This kernel reads each row tile once, computes the f32
stats in VMEM and writes the normalized output directly.

Round-3 revision: the first version jnp.pad-ed the input to (row_tile,
128)-aligned shapes and sliced the result back — two extra full HBM passes
per call on the 96-channel tensors (the xplane 'pad'/'slice' categories).
Now the kernel reads the unpadded array directly (Mosaic masks partial
lane tiles) and the row tile is chosen to DIVIDE the row count whenever
possible, so the common shapes run with zero layout ops.

`real_dim` supports masked LayerNorm over pre-padded channels: an input
whose last dim is zero-padded beyond `real_dim` (e.g. head_dim 96 padded
to the 128-lane tile) is normalized over the real channels only — the
zero lanes contribute nothing to the sums and stay zero in the output
(scale/bias are zero-padded to match). This keeps 128-aligned attention
layouts checkpoint-exact.

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


def _ln_pack_kernel(x_ref, scale_ref, bias_ref, seg_ref, o_ref, *,
                    c_real: int, eps: float):
    """Packed variant: p rows of C real channels ride ONE (C*p)-lane row
    (96 -> 384 = 3 full 128-lane tiles — the unpacked 96-channel tile
    wastes 25% of every lane tile and measured ~2x its HBM floor,
    docs/PERF.md round 3). Per-segment stats come from one-hot segment
    matmuls on the MXU: sums = x @ S with S[i, j] = 1 iff lane i belongs
    to segment j, broadcast back via the transposed contraction."""
    x = x_ref[...].astype(jnp.float32)
    seg = seg_ref[...]  # (Cp, p) one-hot, f32
    sums = jnp.dot(x, seg, preferred_element_type=jnp.float32)
    sumsq = jnp.dot(x * x, seg, preferred_element_type=jnp.float32)
    mean = sums / c_real
    var = jnp.maximum(sumsq / c_real - mean * mean, 0.0)
    r = jax.lax.rsqrt(var + eps)
    bcast = lambda s: jax.lax.dot_general(  # noqa: E731
        s, seg, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    y = (x - bcast(mean)) * bcast(r)
    o_ref[...] = (
        y * scale_ref[...].astype(jnp.float32)
        + bias_ref[...].astype(jnp.float32)
    ).astype(o_ref.dtype)


def _pack_factor(R: int, C: int, real_dim) -> int:
    """Smallest p in {2, 4} packing C lanes to a 128 multiple, 0 if none
    applies (already aligned, ragged row count, or masked real_dim)."""
    if real_dim is not None or C % 128 == 0:
        return 0
    for p in (2, 4):
        if (C * p) % 128 == 0 and R % p == 0:
            return p
    return 0


def _ln_reference(x, scale, bias, eps, real_dim=None):
    xf = x.astype(jnp.float32)
    C = x.shape[-1]
    c_real = real_dim or C
    mean = jnp.sum(xf, axis=-1, keepdims=True) / c_real
    var = jnp.maximum(
        jnp.sum(xf * xf, axis=-1, keepdims=True) / c_real - mean * mean, 0.0
    )
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    if real_dim is not None and real_dim < C:
        # keep the padded lanes exactly zero (mean subtraction would leak)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, C), 1).reshape(
            (1,) * (x.ndim - 1) + (C,)
        )
        y = jnp.where(lane < real_dim, y, 0.0)
    return (y * scale.astype(jnp.float32) + bias.astype(jnp.float32)).astype(
        x.dtype
    )


# packed-row forward for lane-fractional C (96 -> 3x128). MEASURED NULL
# on v5e (scripts/micro_ln_pack.py: 1.16 -> 1.28 ms/call on the decoder's
# (387072, 96) bf16 shape, 0.90x): the per-segment stats ride one-hot
# matmuls whose N=4 pads to a full 128-wide MXU tile, and that MXU work
# (~0.19 ms/call) does NOT hide under the DMA — it costs more than the
# 25% lane waste it removes. Kept equality-tested, default OFF.
_PACK_ENABLED = False


def _row_tile(R: int, c_pad: int, sublane: int) -> int:
    """Largest row tile that divides R, is a multiple of the sublane tile,
    and keeps ~6 f32 temporaries within a 6 MB VMEM budget. 0 if none."""
    budget = max((6 * 1024 * 1024) // (6 * c_pad * 4), sublane)
    best = 0
    for t in range(sublane, min(budget, R) + 1, sublane):
        if R % t == 0:
            best = t
    return best


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def fused_layernorm(
    x: jnp.ndarray,
    scale: jnp.ndarray,  # (C,) or (real_dim,)
    bias: jnp.ndarray,  # (C,) or (real_dim,)
    eps: float = 1e-6,
    interpret: bool = None,
    real_dim: int = None,
) -> jnp.ndarray:
    """LayerNorm over the last axis of x, f32 statistics, output in x.dtype.

    real_dim: normalize over only the first `real_dim` channels of a
    zero-padded last axis (see module docstring). scale/bias may be given
    at either the padded or the real length.

    interpret=None auto-selects: compiled on TPU, plain-jnp fallback
    elsewhere (interpret-mode pallas is slower than XLA on CPU)."""
    C = x.shape[-1]
    if scale.shape[0] < C:  # tiny pads — params stay at checkpoint size
        scale = jnp.pad(scale, (0, C - scale.shape[0]))
        bias = jnp.pad(bias, (0, C - bias.shape[0]))
    if interpret is None:
        import os

        if (
            jax.default_backend() != "tpu"
            or os.environ.get("DIFF_SAL_XLA_LN") == "1"
        ):
            return _ln_reference(x, scale, bias, eps, real_dim)
        interpret = False
    c_real = real_dim or C
    lead = x.shape[:-1]
    R = 1
    for d in lead:
        R *= d
    x2 = x.reshape(R, C)
    # sublane granularity of the dtype tile (f32 8, bf16 16)
    sublane = 16 if x.dtype == jnp.bfloat16 else 8

    pack_p = _pack_factor(R, C, real_dim) if _PACK_ENABLED else 0
    if pack_p:
        Rp, Cp = R // pack_p, C * pack_p
        r_tile = _row_tile(Rp, Cp, sublane)
        if r_tile:
            import numpy as np

            seg = np.zeros((Cp, pack_p), np.float32)
            seg[np.arange(Cp), np.arange(Cp) // C] = 1.0
            out = pl.pallas_call(
                functools.partial(_ln_pack_kernel, c_real=C, eps=eps),
                grid=(Rp // r_tile,),
                in_specs=[
                    pl.BlockSpec((r_tile, Cp), lambda i: (i, 0)),
                    pl.BlockSpec((1, Cp), lambda i: (0, 0)),
                    pl.BlockSpec((1, Cp), lambda i: (0, 0)),
                    pl.BlockSpec((Cp, pack_p), lambda i: (0, 0)),
                ],
                out_specs=pl.BlockSpec((r_tile, Cp), lambda i: (i, 0)),
                out_shape=jax.ShapeDtypeStruct((Rp, Cp), x.dtype),
                interpret=interpret,
            )(
                x2.reshape(Rp, Cp),
                jnp.tile(scale, pack_p).reshape(1, Cp),
                jnp.tile(bias, pack_p).reshape(1, Cp),
                jnp.asarray(seg),
            )
            return out.reshape(x.shape)

    r_tile = _row_tile(R, _round_up(C, 128), sublane)
    if r_tile == 0:
        # ragged row count: pad rows (lane dim stays untouched)
        r_tile = max(
            min((6 * 1024 * 1024) // (6 * _round_up(C, 128) * 4),
                _round_up(R, sublane)) // sublane * sublane,
            sublane,
        )
        r_pad = _round_up(R, r_tile)
        x2 = jnp.pad(x2, ((0, r_pad - R), (0, 0)))
    else:
        r_pad = R

    sp = scale.reshape(1, C)
    bp = bias.reshape(1, C)
    out = pl.pallas_call(
        functools.partial(_ln_kernel, c_real=c_real, eps=eps),
        grid=(r_pad // r_tile,),
        in_specs=[
            pl.BlockSpec((r_tile, C), lambda i: (i, 0)),
            pl.BlockSpec((1, C), lambda i: (0, 0)),
            pl.BlockSpec((1, C), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((r_tile, C), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((r_pad, C), x.dtype),
        interpret=interpret,
    )(x2, sp, bp)
    if r_pad != R:
        out = out[:R]
    return out.reshape(x.shape)


def _ln_bwd_kernel(x_ref, g_ref, scale_ref, dx_ref, ds_ref, db_ref, *,
                   c_real: int, eps: float):
    """Single-pass LayerNorm backward: reads the x and g tiles once,
    recomputes the row stats in VMEM and writes dx + accumulates
    (d_scale, d_bias) across the sequential row grid. XLA's vjp lowers to
    convert->reduce + multiply->reduce fusion chains that re-read the
    activations several times (~19 ms/step of the B=4 AV train step,
    docs/PERF.md round 3). The math mirrors `_ln_reference`'s vjp exactly
    (including the pad-lane mean coupling), so grads match the XLA path."""
    i = pl.program_id(0)
    x = x_ref[...].astype(jnp.float32)
    g = g_ref[...].astype(jnp.float32)
    s = scale_ref[...].astype(jnp.float32)
    C = x.shape[-1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, C), 1)
    mask = (lane < c_real).astype(jnp.float32)

    mean = jnp.sum(x, axis=-1, keepdims=True) / c_real
    var = jnp.maximum(
        jnp.sum(x * x, axis=-1, keepdims=True) / c_real - mean * mean, 0.0
    )
    r = jax.lax.rsqrt(var + eps)
    u = x - mean
    y = u * r * mask  # masked normalized rows (pad lanes zero)

    dy = g * s * mask
    sum_dy = jnp.sum(dy, axis=-1, keepdims=True)
    dvar = -0.5 * (r * r * r) * jnp.sum(dy * u, axis=-1, keepdims=True)
    dmean = -r * sum_dy - 2.0 * mean * dvar
    dx = dy * r + (2.0 / c_real) * x * dvar + dmean / c_real
    dx_ref[...] = dx.astype(dx_ref.dtype)

    ds_tile = jnp.sum(g * y, axis=0, keepdims=True)
    db_tile = jnp.sum(g, axis=0, keepdims=True)

    @pl.when(i == 0)
    def _init():
        ds_ref[...] = jnp.zeros_like(ds_ref)
        db_ref[...] = jnp.zeros_like(db_ref)

    ds_ref[...] += ds_tile
    db_ref[...] += db_tile


def _ln_fwd(x, scale, bias, eps, interpret, real_dim):
    return fused_layernorm(x, scale, bias, eps, interpret, real_dim), (
        x, scale, bias,
    )


def _ln_bwd(eps, interpret, real_dim, res, g):
    x, scale, bias = res
    C = x.shape[-1]

    kernel_interpret = interpret is True  # explicit interpret: testable
    use_kernel = True
    if not kernel_interpret:
        import os

        if (
            jax.default_backend() != "tpu"
            or os.environ.get("DIFF_SAL_XLA_LN") == "1"
            or os.environ.get("DIFF_SAL_XLA_LN_BWD") == "1"
        ):
            use_kernel = False
    if not use_kernel:
        def ref(x, s, b):
            if s.shape[0] < C:
                s = jnp.pad(s, (0, C - s.shape[0]))
                b = jnp.pad(b, (0, C - b.shape[0]))
            return _ln_reference(x, s, b, eps, real_dim)

        _, vjp = jax.vjp(ref, x, scale, bias)
        return vjp(g)

    n_param = scale.shape[0]
    sp = (jnp.pad(scale, (0, C - n_param)) if n_param < C else scale)
    c_real = real_dim or C
    lead = x.shape[:-1]
    R = 1
    for d in lead:
        R *= d
    x2 = x.reshape(R, C)
    g2 = g.reshape(R, C)
    sublane = 16 if x.dtype == jnp.bfloat16 else 8
    # backward holds ~8 f32 tile temporaries
    r_tile = _row_tile(R, _round_up(C, 128), sublane)
    if r_tile == 0:
        r_tile = max(
            min((6 * 1024 * 1024) // (6 * _round_up(C, 128) * 4),
                _round_up(R, sublane)) // sublane * sublane,
            sublane,
        )
        r_pad = _round_up(R, r_tile)
        # padded g rows are zero => zero dx rows and no ds/db contribution
        x2 = jnp.pad(x2, ((0, r_pad - R), (0, 0)))
        g2 = jnp.pad(g2, ((0, r_pad - R), (0, 0)))
    else:
        r_pad = R

    dx, ds, db = pl.pallas_call(
        functools.partial(_ln_bwd_kernel, c_real=c_real, eps=eps),
        grid=(r_pad // r_tile,),
        in_specs=[
            pl.BlockSpec((r_tile, C), lambda i: (i, 0)),
            pl.BlockSpec((r_tile, C), lambda i: (i, 0)),
            pl.BlockSpec((1, C), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((r_tile, C), lambda i: (i, 0)),
            pl.BlockSpec((1, C), lambda i: (0, 0)),
            pl.BlockSpec((1, C), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((r_pad, C), x.dtype),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
        ],
        interpret=kernel_interpret,
    )(x2, g2, sp.reshape(1, C))
    if r_pad != R:
        dx = dx[:R]
    ds = ds[0, :n_param].astype(scale.dtype)
    db = db[0, :n_param].astype(bias.dtype)
    return dx.reshape(x.shape), ds, db


fused_layernorm.defvjp(_ln_fwd, _ln_bwd)
