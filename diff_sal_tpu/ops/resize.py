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

# ---------------------------------------------------------------------------
# Fully fused decoder head: relu(conv3x3_same(sum_i resize(x_i)) + bias) in
# one kernel — the (th, tw, 768) multi-scale accumulator (264 MB at B=8)
# never exists in HBM; the 3x3 conv (mt_proj, reference common_block.py:33-36
# + sal_unet.py:489-491) contracts each 128-channel block as nine shifted
# 2D MXU dots accumulated in a VMEM scratch across the sequential c grid.
# All reorderings are major-dim swaps (lanes stay channel-minor): the
# earlier standalone chain cost ~3.9 ms/iter (resize_sum 1.86 + mt_proj
# fusion 2.11) at B=8, docs/PERF.md round 3.
# ---------------------------------------------------------------------------


def _resize_sum_conv_kernel(*refs, n: int, ht: int, n_c: int):
    import jax
    from jax.experimental import pallas as pl

    xs = refs[:n]
    ahs = refs[n : 2 * n]  # (H+2, h_i) with zero rows 0 and H+1
    aws = refs[2 * n : 3 * n]  # (W, w_i)
    k_ref, b_ref, o_ref, acc_ref = refs[3 * n : 3 * n + 4]
    i = pl.program_id(1)
    c = pl.program_id(2)

    t = None  # (W, (ht+2)*ct) f32: W-major rows, channel-minor lanes
    for x_ref, ah_ref, aw_ref in zip(xs, ahs, aws):
        xv = x_ref[0].astype(jnp.float32)  # (h, w, ct)
        h, w, ct = xv.shape
        ah_rows = ah_ref[pl.ds(i * ht, ht + 2), :]  # halo rows +-1
        t1 = jnp.dot(
            ah_rows, xv.reshape(h, w * ct),
            preferred_element_type=jnp.float32,
        ).reshape(ht + 2, w, ct)
        # major-dim swap (lanes intact) so the W contraction is a 2D dot
        t1 = jnp.swapaxes(t1, 0, 1).reshape(w, (ht + 2) * ct)
        t2 = jnp.dot(aw_ref[...], t1, preferred_element_type=jnp.float32)
        t = t2 if t is None else t + t2

    W = t.shape[0]
    ct = xs[0].shape[-1]
    tv = t.reshape(W, ht + 2, ct)
    # conv zero padding along W (major dim); H padding is the zero rows
    # built into ah
    tp = jnp.pad(tv, ((1, 1), (0, 0), (0, 0)))

    @pl.when(c == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    part = None
    for dy in range(3):
        for dx in range(3):
            sl = tp[dx : dx + W, dy : dy + ht].reshape(W * ht, ct)
            d = jnp.dot(
                sl.astype(k_ref.dtype), k_ref[0, dy, dx],
                preferred_element_type=jnp.float32,
            )
            part = d if part is None else part + d
    acc_ref[...] += part

    @pl.when(c == n_c - 1)
    def _emit():
        O = acc_ref.shape[-1]
        y = jnp.maximum(acc_ref[...] + b_ref[...].astype(jnp.float32), 0.0)
        o_ref[0] = jnp.swapaxes(y.reshape(W, ht, O), 0, 1).astype(o_ref.dtype)


def resize_sum_conv_relu(
    xs,  # list of (B, h_i, w_i, C)
    out_hw: tuple,
    kernel: jnp.ndarray,  # (3, 3, C, O) — any eval-time affine pre-folded
    bias: jnp.ndarray,  # (O,)
    interpret: bool = None,
):
    """relu(conv3x3_same(sum_i bilinear_resize(x_i, out_hw)) + bias).

    Kernel path requires C % 128 == 0 and out_hw[0] % 8 == 0; identical
    jnp math elsewhere. No gradient (inference head — the training path
    keeps the unfused ops)."""
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    H, W = out_hw
    B, _, _, C = xs[0].shape
    O = kernel.shape[-1]
    n = len(xs)
    force_interpret = interpret == "force"
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if (interpret and not force_interpret) or C % 128 or H % 8 or O > 128:
        acc = bilinear_resize_sum(xs, (H, W), interpret=interpret)
        y = jax.lax.conv_general_dilated(
            acc.astype(kernel.dtype), kernel, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return jax.nn.relu(y + bias.astype(y.dtype))

    ct = 128
    n_c = C // ct
    ht = 16 if H % 16 == 0 else 8
    dt = xs[0].dtype
    ahs, aws = [], []
    for x in xs:
        ah = _linear_weights(x.shape[1], H)
        ah = jnp.asarray(
            np.pad(ah, ((1, 1), (0, 0))), jnp.float32
        )  # zero rows = conv H padding
        ahs.append(ah)
        aws.append(jnp.asarray(_linear_weights(x.shape[2], W), jnp.float32))
    shapes = [(x.shape[1], x.shape[2]) for x in xs]
    k5 = kernel.reshape(3, 3, n_c, ct, O).transpose(2, 0, 1, 3, 4)
    k5 = jnp.asarray(k5, dt)

    in_specs = (
        [
            pl.BlockSpec((1, h, w, ct), lambda b, i, c: (b, 0, 0, c))
            for (h, w) in shapes
        ]
        + [
            pl.BlockSpec((H + 2, h), lambda b, i, c: (0, 0))
            for (h, w) in shapes
        ]
        + [
            pl.BlockSpec((W, w), lambda b, i, c: (0, 0))
            for (h, w) in shapes
        ]
        + [
            pl.BlockSpec((1, 3, 3, ct, O), lambda b, i, c: (c, 0, 0, 0, 0)),
            pl.BlockSpec((1, O), lambda b, i, c: (0, 0)),
        ]
    )
    return pl.pallas_call(
        functools.partial(_resize_sum_conv_kernel, n=n, ht=ht, n_c=n_c),
        grid=(B, H // ht, n_c),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, ht, W, O), lambda b, i, c: (b, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, W, O), dt),
        scratch_shapes=[pltpu.VMEM((W * ht, O), jnp.float32)],
        compiler_params=(
            None if force_interpret or interpret
            else pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)
        ),
        interpret=force_interpret or interpret,
    )(*xs, *ahs, *aws, k5, bias.reshape(1, O))


# ---------------------------------------------------------------------------
# Restructured decoder head: conv-at-low-res. conv3x3 and bilinear resize
# are both linear, so relu(conv(sum_i resize(x_i)) + b) =
# relu(sum_i sum_{dy,dx} S_dy A_h (x_i K[dy,dx]) A_w^T S_dx^T + b): the
# 9-tap channel contraction runs at each task's LOW resolution (the tasks
# sum to ~TH*TW/3 pixels -> ~3x fewer conv MACs than the full-res conv) and
# the 3x3 shifts ride the resize matrices — row o of the dy-shifted row
# matrix is row o+dy-1 of the bilinear matrix, with zero rows at the
# borders reproducing the conv's 'same' zero padding exactly. The
# (TH, TW, C) multi-scale accumulator never exists in HBM.
# (reference sal_unet.py:482-491 + common_block.py:33-36; exact
# linear-algebra rewrite up to float associativity.)
# ---------------------------------------------------------------------------


def resize_sum_conv_relu_lowres(
    xs,  # list of (B, h_i, w_i, C)
    out_hw: tuple,
    kernel: jnp.ndarray,  # (3, 3, C, O) — any eval-time affine pre-folded
    bias: jnp.ndarray,  # (O,)
) -> jnp.ndarray:
    """relu(conv3x3_same(sum_i bilinear_resize(x_i, out_hw)) + bias)."""
    TH, TW = out_hw
    C = xs[0].shape[-1]
    O = kernel.shape[-1]
    dt = xs[0].dtype
    # (3dy, 3dx, C, O) -> (C, 3dy, 3dx, O) -> (C, 9O), dy-major columns so
    # u[..., dy] below is a contiguous 3O slice
    kf = jnp.asarray(kernel, dt).transpose(2, 0, 1, 3).reshape(C, 9 * O)
    acc = None
    for x in xs:
        B, h, w, _ = x.shape
        u = jnp.dot(
            x.reshape(-1, C), kf, preferred_element_type=jnp.float32
        ).astype(dt).reshape(B, h, w, 3, 3 * O)
        ah = np.pad(_linear_weights(h, TH), ((1, 1), (0, 0)))
        aw = np.pad(_linear_weights(w, TW), ((1, 1), (0, 0)))
        v = None  # (B, TH, w, 3dx*O)
        for dy in range(3):
            a = jnp.asarray(ah[dy : dy + TH], dt)
            t = jnp.einsum(
                "oh,bhwk->bowk", a, u[:, :, :, dy],
                preferred_element_type=jnp.float32,
            )
            v = t if v is None else v + t
        v = v.astype(dt).reshape(B, TH, w, 3, O)
        y = None
        for dx in range(3):
            a = jnp.asarray(aw[dx : dx + TW], dt)
            t = jnp.einsum(
                "pw,bowc->bopc", a, v[:, :, :, dx],
                preferred_element_type=jnp.float32,
            )
            y = t if y is None else y + t
        acc = y if acc is None else acc + y
    return jnp.maximum(acc + bias.astype(jnp.float32), 0.0).astype(dt)


def _phase_resize_head_kernel(*refs, n: int, ht: int, TH: int, TW: int,
                              O: int):
    import jax
    from jax.experimental import pallas as pl

    us = refs[:n]  # (1, h, w, 9*128): columns (dy, dx, O padded to 128)
    ahs = refs[n : 2 * n]  # (3*TH, h) dy-shifted row matrices, stacked
    aws = refs[2 * n : 3 * n]  # (3*TW, w) dx-shifted col matrices, stacked
    b_ref, o_ref = refs[3 * n], refs[3 * n + 1]
    i = pl.program_id(1)
    dt = us[0].dtype

    acc = None  # (TW, ht*128) f32
    for u_ref, ah_ref, aw_ref in zip(us, ahs, aws):
        xv = u_ref[0]  # (h, w, 1152)
        h, w, _ = xv.shape
        v = None
        for dy in range(3):
            a = ah_ref[pl.ds(dy * TH + i * ht, ht), :]  # (ht, h)
            sl = xv[:, :, dy * 384 : (dy + 1) * 384].reshape(h, w * 384)
            t = jnp.dot(a, sl, preferred_element_type=jnp.float32)
            v = t if v is None else v + t
        v = v.astype(dt).reshape(ht, w, 3, 128)
        for dx in range(3):
            vd = jnp.swapaxes(v[:, :, dx, :], 0, 1).reshape(w, ht * 128)
            a = aw_ref[pl.ds(dx * TW, TW), :]  # (TW, w)
            t2 = jnp.dot(a, vd, preferred_element_type=jnp.float32)
            acc = t2 if acc is None else acc + t2
    y = acc.reshape(TW, ht, 128) + b_ref[...].astype(jnp.float32)
    y = jnp.maximum(y, 0.0)[:, :, :O]
    o_ref[0] = jnp.swapaxes(y, 0, 1).astype(o_ref.dtype)


def _shifted_resize_mats(in_size: int, TH: int) -> np.ndarray:
    """(3*TH, in) stack of dy-shifted bilinear row matrices: row o of
    block dy is row o+dy-1 of the resize matrix, zero rows at the borders
    (== the 3x3 conv's 'same' zero padding)."""
    a = np.pad(_linear_weights(in_size, TH), ((1, 1), (0, 0)))
    return np.concatenate([a[dy : dy + TH] for dy in range(3)], axis=0)


def resize_sum_conv_relu_phase(
    xs,  # list of (B, h_i, w_i, C)
    out_hw: tuple,
    kernel: jnp.ndarray,  # (3, 3, C, O) — any eval-time affine pre-folded
    bias: jnp.ndarray,  # (O,)
    interpret: bool = None,
) -> jnp.ndarray:
    """relu(conv3x3_same(sum_i bilinear_resize(x_i, out_hw)) + bias) as
    conv-at-low-res (see resize_sum_conv_relu_lowres) with the whole
    9-phase shifted resize+sum+bias+relu in ONE Pallas kernel.

    The per-task channel contraction x_i @ K (the only O(C) work) stays an
    XLA dot at the task's LOW resolution; the kernel reads the 9-phase
    low-res maps once (resident across the output-row grid) and the
    (TH,TW,C) accumulator never exists in HBM. O <= 128; identical jnp
    math (resize_sum_conv_relu_lowres) elsewhere."""
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    TH, TW = out_hw
    B, _, _, C = xs[0].shape
    O = kernel.shape[-1]
    n = len(xs)
    force_interpret = interpret == "force"
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if (interpret and not force_interpret) or O > 128 or TH % 28:
        return resize_sum_conv_relu_lowres(xs, out_hw, kernel, bias)

    dt = xs[0].dtype
    ht = 56 if TH % 56 == 0 else 28
    # kf columns (dy, dx, O padded to 128): in-kernel dy/dx slices stay
    # lane-tile aligned
    kf = jnp.asarray(kernel, dt).transpose(2, 0, 1, 3)  # (C, 3, 3, O)
    kf = jnp.pad(kf, ((0, 0), (0, 0), (0, 0), (0, 128 - O)))
    kf = kf.reshape(C, 9 * 128)
    us = [
        jnp.dot(
            x.reshape(-1, C), kf, preferred_element_type=jnp.float32
        ).astype(dt).reshape(x.shape[0], x.shape[1], x.shape[2], 9 * 128)
        for x in xs
    ]
    ahs = [jnp.asarray(_shifted_resize_mats(x.shape[1], TH), dt) for x in xs]
    aws = [jnp.asarray(_shifted_resize_mats(x.shape[2], TW), dt) for x in xs]
    shapes = [(x.shape[1], x.shape[2]) for x in xs]
    bp = jnp.pad(bias.astype(jnp.float32), (0, 128 - O)).reshape(1, 128)

    in_specs = (
        [
            pl.BlockSpec((1, h, w, 9 * 128), lambda b, i: (b, 0, 0, 0))
            for (h, w) in shapes
        ]
        + [
            pl.BlockSpec((3 * TH, h), lambda b, i: (0, 0))
            for (h, w) in shapes
        ]
        + [
            pl.BlockSpec((3 * TW, w), lambda b, i: (0, 0))
            for (h, w) in shapes
        ]
        + [pl.BlockSpec((1, 128), lambda b, i: (0, 0))]
    )
    return pl.pallas_call(
        functools.partial(
            _phase_resize_head_kernel, n=n, ht=ht, TH=TH, TW=TW, O=O
        ),
        grid=(B, TH // ht),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, ht, TW, O), lambda b, i: (b, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, TH, TW, O), dt),
        compiler_params=(
            None if force_interpret or interpret
            else pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
        ),
        interpret=force_interpret or interpret,
    )(*us, *ahs, *aws, bp)
