"""Static-shape image resizing for TPU.

Because every resize in the model has static input/output shapes, bilinear
interpolation is expressed as two small dense matmuls (one per spatial axis)
with precomputed half-pixel weights. This matches
`torch.nn.functional.interpolate(mode='bilinear', align_corners=False)`
exactly for both up- and down-sampling (no antialiasing) and lowers onto the
MXU instead of gather pipelines. Used by UpEmbed's 2x upsample
(reference `models/saliency_decoder/common_block.py:196-216`), the per-scale
decoder upsample (`sal_unet.py:482-484`) and the final head resize
(`sal_unet.py:325-327`).
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _linear_weights(in_size: int, out_size: int) -> np.ndarray:
    """Dense (out, in) interpolation matrix, half-pixel centers, edge clamp.

    out[i] samples input coordinate (i + 0.5) * in/out - 0.5 — identical to
    PyTorch's align_corners=False bilinear (no antialias).
    """
    scale = in_size / out_size
    coords = (np.arange(out_size, dtype=np.float64) + 0.5) * scale - 0.5
    coords = np.clip(coords, 0.0, in_size - 1)
    lo = np.floor(coords).astype(np.int64)
    hi = np.minimum(lo + 1, in_size - 1)
    frac = coords - lo
    w = np.zeros((out_size, in_size), dtype=np.float32)
    w[np.arange(out_size), lo] += (1.0 - frac).astype(np.float32)
    w[np.arange(out_size), hi] += frac.astype(np.float32)
    return w


def bilinear_resize(
    x: jnp.ndarray, out_hw: tuple, h_axis: int = -3, w_axis: int = -2
) -> jnp.ndarray:
    """Bilinear-resize the (H, W) axes of a channel-last array.

    Default layout (..., H, W, C). Works for any rank; dtype is preserved.
    For the common (..., H, W, C) layout the contraction is emitted as an
    einsum that keeps the axis order — no moveaxis transposes of large
    activations (a profiled cost in the decoder's multi-scale sum).
    """
    out_h, out_w = out_hw
    h_axis = h_axis % x.ndim
    w_axis = w_axis % x.ndim
    in_h, in_w = x.shape[h_axis], x.shape[w_axis]
    dtype = x.dtype

    if h_axis == x.ndim - 3 and w_axis == x.ndim - 2:
        lead = x.shape[: x.ndim - 3]
        xf = x.astype(jnp.float32).reshape((-1,) + x.shape[-3:])
        if in_h != out_h:
            wh = jnp.asarray(_linear_weights(in_h, out_h), dtype=jnp.float32)
            xf = jnp.einsum("oh,bhwc->bowc", wh, xf)
        if in_w != out_w:
            ww = jnp.asarray(_linear_weights(in_w, out_w), dtype=jnp.float32)
            xf = jnp.einsum("ow,bhwc->bhoc", ww, xf)
        return xf.reshape(lead + (out_h, out_w, x.shape[-1])).astype(dtype)

    if in_h != out_h:
        wh = jnp.asarray(_linear_weights(in_h, out_h), dtype=jnp.float32)
        x = jnp.tensordot(wh, x.astype(jnp.float32), axes=((1,), (h_axis,)))
        x = jnp.moveaxis(x, 0, h_axis)
    if in_w != out_w:
        ww = jnp.asarray(_linear_weights(in_w, out_w), dtype=jnp.float32)
        x = jnp.tensordot(ww, x.astype(jnp.float32), axes=((1,), (w_axis,)))
        x = jnp.moveaxis(x, 0, w_axis)
    return x.astype(dtype)


def linear_resize_1d(x: jnp.ndarray, out_size: int, axis: int = 0) -> jnp.ndarray:
    """1-D linear resize along `axis` (half-pixel, matches torch
    `interpolate(mode='linear', align_corners=False)`)."""
    axis = axis % x.ndim
    in_size = x.shape[axis]
    if in_size == out_size:
        return x
    w = jnp.asarray(_linear_weights(in_size, out_size), dtype=jnp.float32)
    y = jnp.tensordot(w, x.astype(jnp.float32), axes=((1,), (axis,)))
    return jnp.moveaxis(y, 0, axis).astype(x.dtype)


def nearest_upsample(
    x: jnp.ndarray, factor: int, h_axis: int = -3, w_axis: int = -2
) -> jnp.ndarray:
    """Integer-factor nearest upsample == repeat (torch `F.upsample` default
    nearest mode with int scale_factor, used by the audio-gating alignment,
    reference `models/saliency_decoder/transformer.py:133-136`)."""
    if factor == 1:
        return x
    x = jnp.repeat(x, factor, axis=h_axis % x.ndim)
    x = jnp.repeat(x, factor, axis=w_axis % x.ndim)
    return x


def trilinear_resize(
    x: jnp.ndarray, out_thw: tuple, t_axis: int = -4, h_axis: int = -3, w_axis: int = -2
) -> jnp.ndarray:
    """Trilinear resize over (T, H, W) axes (used for abs-pos-embed resize,
    reference `models/mvit.py:283-328`)."""
    t_axis, h_axis, w_axis = (a % x.ndim for a in (t_axis, h_axis, w_axis))
    x = linear_resize_1d(x, out_thw[0], axis=t_axis)
    x = linear_resize_1d(x, out_thw[1], axis=h_axis)
    x = linear_resize_1d(x, out_thw[2], axis=w_axis)
    return x


# ---------------------------------------------------------------------------
# Fused bilinear-resize + accumulate (Pallas TPU) for the decoder's
# multi-scale sum (reference sal_unet.py:482-491): each scale's (B, h, w, C)
# task map is resized to (H, W) and added into the running accumulator in
# ONE kernel — XLA's separable-matmul lowering materializes transposed
# (H, C, B, W)-layout intermediates per scale (~3-4 ms/iter at B=4, xplane).
# ---------------------------------------------------------------------------


def _resize_acc_kernel(acc_ref, x_ref, ah_ref, aw_ref, o_ref):
    import jax

    xv = x_ref[0].astype(jnp.float32)  # (h, w, ct)
    h, w, ct = xv.shape
    t1 = jnp.dot(
        ah_ref[...], xv.reshape(h, w * ct),
        preferred_element_type=jnp.float32,
    ).reshape(-1, w, ct)  # (Ht, w, ct)
    t2 = jax.lax.dot_general(
        t1, aw_ref[...],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (Ht, ct, W)
    o_ref[0] = acc_ref[0] + jnp.swapaxes(t2, 1, 2).astype(o_ref.dtype)


def bilinear_resize_add(
    acc: jnp.ndarray,  # (B, H, W, C)
    x: jnp.ndarray,  # (B, h, w, C)
    interpret: bool = None,
) -> jnp.ndarray:
    """acc + bilinear_resize(x, (H, W)), fused on TPU; identical jnp math
    elsewhere. C must be a multiple of 128 on the kernel path (the decoder
    sum runs at C=768)."""
    import jax
    from jax.experimental import pallas as pl

    B, H, W, C = acc.shape
    _, h, w, _ = x.shape
    force_interpret = interpret == "force"  # pallas interpret mode (tests)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if (interpret and not force_interpret) or C % 128 or H % 8:
        return acc + bilinear_resize(x, (H, W)).astype(acc.dtype)

    ct = 128
    ht = 8
    for cand in (16, 8):
        if H % cand == 0:
            ht = cand
            break
    ah = jnp.asarray(_linear_weights(h, H), jnp.float32)
    aw = jnp.asarray(_linear_weights(w, W), jnp.float32)

    def fwd(acc, x):
        return pl.pallas_call(
            _resize_acc_kernel,
            grid=(B, C // ct, H // ht),
            in_specs=[
                pl.BlockSpec((1, ht, W, ct), lambda b, c, i: (b, i, 0, c)),
                pl.BlockSpec((1, h, w, ct), lambda b, c, i: (b, 0, 0, c)),
                pl.BlockSpec((ht, h), lambda b, c, i: (i, 0)),
                pl.BlockSpec((W, w), lambda b, c, i: (0, 0)),
            ],
            out_specs=pl.BlockSpec(
                (1, ht, W, ct), lambda b, c, i: (b, i, 0, c)
            ),
            out_shape=jax.ShapeDtypeStruct(acc.shape, acc.dtype),
            input_output_aliases={0: 0},
            interpret=force_interpret,
        )(acc, x, ah, aw)

    @jax.custom_vjp
    def op(acc, x):
        return fwd(acc, x)

    x_dtype = x.dtype  # static at trace time

    def op_fwd(acc, x):
        return fwd(acc, x), None

    def op_bwd(_, g):
        # d_acc = g; d_x = Ah^T g Aw^T — the same separable structure
        gh = jnp.einsum("oh,bowc->bhwc", jnp.asarray(ah), g.astype(jnp.float32))
        gx = jnp.einsum("ow,bhoc->bhwc", jnp.asarray(aw), gh)
        return g, gx.astype(x_dtype)

    op.defvjp(op_fwd, op_bwd)
    return op(acc, x)

def _resize_sum_kernel(*refs, n: int):
    """refs = (x_0..x_{n-1}, ah_0.., aw_0.., o_ref): one output tile =
    sum of the n separable-resize contributions."""
    import jax

    xs = refs[:n]
    ahs = refs[n : 2 * n]
    aws = refs[2 * n : 3 * n]
    o_ref = refs[3 * n]
    out = None
    for x_ref, ah_ref, aw_ref in zip(xs, ahs, aws):
        xv = x_ref[0].astype(jnp.float32)  # (h, w, ct)
        h, w, ct = xv.shape
        t1 = jnp.dot(
            ah_ref[...], xv.reshape(h, w * ct),
            preferred_element_type=jnp.float32,
        ).reshape(-1, w, ct)  # (ht, w, ct)
        # NOTE: an aw-as-LHS variant producing (W, ht, ct) + major-dim swap
        # measured WORSE in-pipeline (2.32 vs 1.86 ms/iter) than this
        # (ht, ct, W) + lane swapaxes form — keep this order.
        t2 = jax.lax.dot_general(
            t1, aw_ref[...],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (ht, ct, W)
        out = t2 if out is None else out + t2
    o_ref[0] = jnp.swapaxes(out, 1, 2).astype(o_ref.dtype)


def bilinear_resize_sum(
    xs,  # list of (B, h_i, w_i, C)
    out_hw: tuple,
    interpret: bool = None,
):
    """sum_i bilinear_resize(x_i, out_hw) in ONE pass.

    The decoder's multi-scale sum (reference sal_unet.py:482-491) chained
    bilinear_resize_add per scale — each call re-reads and re-writes the
    full-resolution accumulator (264 MB at B=8 C=768), ~4 HBM passes
    total. This kernel reads each small scale map once (resident across
    the output-row grid) and writes the accumulator once: ~0.35 GB of
    traffic instead of ~1.8 GB (docs/PERF.md round 3). C must be a
    multiple of 128 and H of 8 on the kernel path; identical jnp math
    elsewhere."""
    import jax
    from jax.experimental import pallas as pl

    H, W = out_hw
    B, _, _, C = xs[0].shape
    n = len(xs)
    force_interpret = interpret == "force"
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if (interpret and not force_interpret) or C % 128 or H % 8:
        out = bilinear_resize(xs[0], (H, W)).astype(xs[0].dtype)
        for x in xs[1:]:
            out = out + bilinear_resize(x, (H, W)).astype(out.dtype)
        return out

    ct = 128
    ht = 16 if H % 16 == 0 else 8
    ahs = [
        jnp.asarray(_linear_weights(x.shape[1], H), jnp.float32) for x in xs
    ]
    aws = [
        jnp.asarray(_linear_weights(x.shape[2], W), jnp.float32) for x in xs
    ]
    shapes = [(x.shape[1], x.shape[2]) for x in xs]

    def fwd(*xs):
        in_specs = (
            [
                pl.BlockSpec((1, h, w, ct), lambda b, c, i: (b, 0, 0, c))
                for (h, w) in shapes
            ]
            + [
                pl.BlockSpec((ht, h), lambda b, c, i: (i, 0))
                for (h, w) in shapes
            ]
            + [
                pl.BlockSpec((W, w), lambda b, c, i: (0, 0))
                for (h, w) in shapes
            ]
        )
        return pl.pallas_call(
            functools.partial(_resize_sum_kernel, n=n),
            grid=(B, C // ct, H // ht),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (1, ht, W, ct), lambda b, c, i: (b, i, 0, c)
            ),
            out_shape=jax.ShapeDtypeStruct((B, H, W, C), xs[0].dtype),
            interpret=force_interpret,
        )(*xs, *ahs, *aws)

    @jax.custom_vjp
    def op(*xs):
        return fwd(*xs)

    dtypes = [x.dtype for x in xs]

    def op_fwd(*xs):
        return fwd(*xs), None

    def op_bwd(_, g):
        # d_x_i = Ah_i^T g Aw_i^T — the separable structure per input
        gf = g.astype(jnp.float32)
        outs = []
        for ah, aw, dt in zip(ahs, aws, dtypes):
            gh = jnp.einsum("oh,bowc->bhwc", ah, gf)
            outs.append(jnp.einsum("ow,bhoc->bhwc", aw, gh).astype(dt))
        return tuple(outs)

    op.defvjp(op_fwd, op_bwd)
    return op(*xs)
