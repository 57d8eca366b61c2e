"""Pallas depthwise 3x3x3 attention-pooling on the native channel-minor
layout.

The MViT attention pools (reference mvit.py:443-575) are depthwise
Conv3d(3,3,3) ops applied to the qkv Dense output at every block. XLA:TPU
emits depthwise convs with batch-in-sublane layouts ({4,0,3,2,1}), which
forces full relayout copies of the 43k-token qkv activations into and out
of every pool — the xplane copy category was ~15.3 ms of a 78.6 ms/iter
B=8 forward, with the largest single copies (1.6 + 0.8 ms) feeding the
blocks_0/1 pools (docs/PERF.md round 3).

This kernel instead reads the (B, T, H, W, C) tensor in its native
{4,3,2,1,0} layout (C on lanes, W on sublanes) and reads it at most ONCE:

  * spatial strides come from PHASE VIEWS: x is reshaped (free, row-major)
    to (B, T, H/sh, sh, W/sw, sw*C); each distinct (h-phase, w-phase) a
    kernel tap needs becomes its own input spec whose index map picks the
    phase plane and the lane tile (pw*C + c — tile-aligned because C is a
    multiple of 128). Every tap is then a plain unit-stride slice of a
    (H', W', 128) slab: Mosaic rejects strided vector slices
    ('strides confined to [1, 2)'), and a first attempt that passed x
    under three t-1/t/t+1 index maps tripled HBM reads and measured
    0.998x. With phase views the total read is n_distinct_phases/(sh*sw)
    <= 1x of the input (9/16 at stride 4, 9/64 at stride 8);
  * the temporal axis (kernel 3, stride 1) is a ring buffer: grid
    (B, C/128, T+1) sequential in T, step t loads each phase slab of
    x[t] once, accumulates its 9 spatial taps under each temporal kernel
    plane kt (27 VPU multiply-adds total — identical FLOPs to the conv),
    and WRITES out[t-1], whose last (kt=2) contribution it just computed;
    two VMEM scratch slots carry the pending sums for out[t] and
    out[t+1];
  * edge zero-padding happens in VMEM via jnp.pad of each slab.

Temporal stride is asserted to 1: every pool in the MViT plan (q stride
(1,2,2) at the downscale blocks, kv stride (1,{8,4,2,1},{8,4,2,1})) keeps
T unstrided (reference mvit.py:1016-1066).

The backward pass reuses XLA's conv vjp (jax.custom_vjp below): training
keeps the exact conv-path gradients while inference gets the layout-free
forward.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _pool_out(n: int, s: int) -> int:
    # conv with kernel 3, padding 1, stride s: floor((n - 1) / s) + 1
    return (n - 1) // s + 1


def _tap_plan(s: int):
    """For kernel position k in {0,1,2} at stride s over a phase-split
    axis (n/s blocks, phase in [0,s)): input index s*i + k - 1 lives at
    (phase (k-1) mod s, block i + (k-1 - phase)/s). Returns per-k
    (phase, block_offset)."""
    plan = []
    for k in range(3):
        off = k - 1
        phase = off % s
        plan.append((phase, (off - phase) // s))
    return plan


def _pool_kernel(*refs, n_slabs, slab_of_tap, T, Ho, Wo, out_dtype):
    """refs = (*slabs, w_ref, o_ref, s0, s1). Step t: consume the phase
    slabs of x[min(t, T-1)] (masked at t == T), emit out[t-1]. Ring
    scratch: s0 = pending sum for out[t], s1 = for out[t+1]."""
    slabs = refs[:n_slabs]
    w_ref, o_ref, s0, s1 = refs[n_slabs:]
    t = pl.program_id(2)

    @pl.when(t == 0)
    def _init():
        s0[...] = jnp.zeros((Ho, Wo, LANES), jnp.float32)
        s1[...] = jnp.zeros((Ho, Wo, LANES), jnp.float32)

    padded = [
        jnp.pad(ref[0, 0, :, 0], ((1, 1), (1, 1), (0, 0))) for ref in slabs
    ]
    live = (t < T).astype(jnp.float32)  # step T re-presents slab T-1: mask

    def taps(kt, base):  # base + 9 spatial taps of temporal plane kt
        acc = base
        for kh in range(3):
            for kw in range(3):
                si, dh, dw = slab_of_tap[(kh, kw)]
                tap = jax.lax.slice(
                    padded[si],
                    (1 + dh, 1 + dw, 0),
                    (1 + dh + Ho, 1 + dw + Wo, LANES),
                )
                w = w_ref[kt, kh, kw].astype(jnp.float32) * live
                acc = acc + tap.astype(jnp.float32) * w
        return acc

    # one taps() temp live at a time (VMEM: blocks_0's stride-1 pool OOMed
    # the 16M scoped budget with three concurrent f32 partials)
    zero = jnp.zeros((Ho, Wo, LANES), jnp.float32)

    @pl.when(t > 0)
    def _emit():  # x[t]'s kt=2 plane completes out[t-1]
        o_ref[0, 0] = taps(2, s0[...]).astype(out_dtype)

    s0[...] = taps(1, s1[...])  # pending sum for out[t]
    s1[...] = taps(0, zero)  # pending sum for out[t+1]


def _pallas_pool(x: jnp.ndarray, w: jnp.ndarray,
                 stride: Tuple[int, int, int], *, interpret=None):
    if interpret is None:
        # compiled on TPU, interpreter elsewhere (CPU tests, virtual mesh)
        interpret = jax.default_backend() != "tpu"
    B, T, H, W, C = x.shape
    st, sh, sw = stride
    assert st == 1, "temporal pool stride is always 1 in the MViT plan"
    assert C % LANES == 0 and w.shape == (3, 3, 3, C)
    Ho, Wo = _pool_out(H, sh), _pool_out(W, sw)
    ctiles = C // LANES

    # phase views need stride-divisible extents; zero-pad up if needed
    # (never at the shipping resolutions — the valid taps only ever read
    # index <= H|W, which is zero either way). ceil(H/sh) == Ho, so the
    # padded block count IS the output extent.
    Hp, Wp = Ho * sh, Wo * sw
    if (Hp, Wp) != (H, W):
        x = jnp.pad(
            x, ((0, 0), (0, 0), (0, Hp - H), (0, Wp - W), (0, 0))
        )

    # phase views: (B, T, Ho, sh, Wo, sw*C), a free row-major reshape
    xv = x.reshape(B, T, Ho, sh, Wo, sw * C)
    hplan, wplan = _tap_plan(sh), _tap_plan(sw)

    # one input spec per distinct (h-phase, w-phase); taps map into them
    slab_index = {}
    slab_of_tap = {}
    for kh in range(3):
        for kw in range(3):
            ph, dh = hplan[kh]
            pw, dw = wplan[kw]
            if (ph, pw) not in slab_index:
                slab_index[(ph, pw)] = len(slab_index)
            slab_of_tap[(kh, kw)] = (slab_index[(ph, pw)], dh, dw)

    def xspec(ph, pw):
        return pl.BlockSpec(
            (1, 1, Ho, 1, Wo, LANES),
            lambda b, c, t, ph=ph, pw=pw: (
                b, jnp.minimum(t, T - 1), 0, ph, 0, pw * ctiles + c,
            ),
        )

    in_specs = [xspec(ph, pw) for (ph, pw) in slab_index]
    in_specs.append(
        pl.BlockSpec((3, 3, 3, LANES), lambda b, c, t: (0, 0, 0, c))
    )

    kern = functools.partial(
        _pool_kernel,
        n_slabs=len(slab_index),
        slab_of_tap=slab_of_tap,
        T=T, Ho=Ho, Wo=Wo, out_dtype=x.dtype,
    )
    out = pl.pallas_call(
        kern,
        grid=(B, ctiles, T + 1),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, 1, Ho, Wo, LANES),
            lambda b, c, t: (b, jnp.maximum(t - 1, 0), 0, 0, c),
        ),
        out_shape=jax.ShapeDtypeStruct((B, T, Ho, Wo, C), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((Ho, Wo, LANES), jnp.float32),
            pltpu.VMEM((Ho, Wo, LANES), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 27 * B * T * Ho * Wo * C,
            transcendentals=0,
            bytes_accessed=x.size * x.dtype.itemsize
            + B * T * Ho * Wo * C * x.dtype.itemsize,
        ),
    )(*([xv] * len(slab_index)), w)
    return out


def _conv_pool(x: jnp.ndarray, w: jnp.ndarray,
               stride: Tuple[int, int, int]):
    """XLA depthwise-conv reference implementation (same math)."""
    return jax.lax.conv_general_dilated(
        x,
        w.reshape(3, 3, 3, 1, x.shape[-1]).astype(x.dtype),
        window_strides=stride,
        padding=[(1, 1)] * 3,
        dimension_numbers=("NTHWC", "THWIO", "NTHWC"),
        feature_group_count=x.shape[-1],
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def depthwise_pool3d(x: jnp.ndarray, w: jnp.ndarray,
                     stride: Tuple[int, int, int]) -> jnp.ndarray:
    """Depthwise 3x3x3 pool, padding 1, per-channel weights w (3,3,3,C).

    x (B, T, H, W, C) with C a multiple of 128 -> (B, T', H', W', C)."""
    return _pallas_pool(x, w, tuple(stride))


def _pool_fwd(x, w, stride):
    return depthwise_pool3d(x, w, stride), (x, w)


def _pool_bwd(stride, res, g):
    x, w = res
    _, vjp = jax.vjp(lambda x_, w_: _conv_pool(x_, w_, stride), x, w)
    return vjp(g.astype(x.dtype))


depthwise_pool3d.defvjp(_pool_fwd, _pool_bwd)
