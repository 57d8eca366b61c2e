"""Pallas TPU kernel: fused MViT block tail — residual add + LayerNorm +
MLP (fc1 -> GELU -> fc2) + residual add in ONE pass over the token rows.

The unfused block tail (reference mvit.py:784-791: `x = x + attn; x = x +
mlp(norm2(x))`) lowers on XLA:TPU as ~5 HBM round trips per block: the
first residual add, the LayerNorm read+write, fc1's (R, 4C) hidden write,
fc2's hidden read, and the second residual add — ~13 C-sized tensor passes
per row where the information flow needs 3 (read skip, read attn, write
out). At B=8 the MViT-small plan moves ~2.6 GB/iter of hidden activations
alone (stage-0 hidden is 264 MB). This kernel reads the two residual
inputs once per row tile, computes the LayerNorm statistics, both matmuls
(f32 accumulation on the MXU, weights VMEM-resident across the row grid)
and the activation in VMEM, and writes only the final (R, C) output.

The FLOPs are unchanged (every MViT-small block's MLP is ~50 GFLOP at
B=8); the win is HBM traffic (13C -> 3C per row) plus ~4 fewer op launches
per block. Hidden widths are 4*C = 384/768/1536/3072 — all lane-tile
multiples; C = 96 at the finest stage relies on Mosaic's partial-lane
masking, identical to ops/layernorm.py.

Backward: custom_vjp whose bwd rebuilds the plain-jnp reference
composition and differentiates it (rematerialization — the fused forward
stores only the inputs). Numerics match the unfused path to bf16
rounding; the equality test drives both the interpret-mode kernel and the
reference composition.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from diff_sal_tpu.ops.attention import _round_up


def _act(h: jnp.ndarray, mode: str) -> jnp.ndarray:
    if mode == "tanh":
        return jax.nn.gelu(h, approximate=True)
    if mode == "exact":
        return jax.nn.gelu(h, approximate=False)
    raise ValueError(f"unknown activation mode {mode!r}")


def _tail_kernel(skip_ref, attn_ref, s_ref, b_ref, w1_ref, b1_ref, w2_ref,
                 b2_ref, o_ref, *, eps: float, act_mode: str):
    y = skip_ref[...].astype(jnp.float32) + attn_ref[...].astype(jnp.float32)
    C = y.shape[-1]
    mean = jnp.sum(y, axis=-1, keepdims=True) / C
    var = jnp.maximum(
        jnp.sum(y * y, axis=-1, keepdims=True) / C - mean * mean, 0.0
    )
    xn = (y - mean) * jax.lax.rsqrt(var + eps)
    xn = xn * s_ref[...].astype(jnp.float32) + b_ref[...].astype(jnp.float32)
    h = jax.lax.dot_general(
        xn.astype(w1_ref.dtype), w1_ref[...],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1_ref[...].astype(jnp.float32)
    h = _act(h, act_mode)
    o = jax.lax.dot_general(
        h.astype(w2_ref.dtype), w2_ref[...],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b2_ref[...].astype(jnp.float32)
    o_ref[...] = (y + o).astype(o_ref.dtype)


def block_tail_reference(skip, attn, scale, bias, w1, b1, w2, b2,
                         eps=1e-6, act_mode="tanh", compute_dtype=None):
    """Plain-jnp composition the kernel must match: the exact unfused path
    (fused LayerNorm reference math + dtype-cast Dense dots, f32 MXU
    accumulation)."""
    dt = compute_dtype or skip.dtype
    y = skip + attn
    yf = y.astype(jnp.float32)
    C = y.shape[-1]
    mean = jnp.sum(yf, axis=-1, keepdims=True) / C
    var = jnp.maximum(
        jnp.sum(yf * yf, axis=-1, keepdims=True) / C - mean * mean, 0.0
    )
    xn = (yf - mean) * jax.lax.rsqrt(var + eps)
    xn = (xn * scale.astype(jnp.float32) + bias.astype(jnp.float32)).astype(
        y.dtype
    )
    h = jax.lax.dot_general(
        xn.astype(dt), w1.astype(dt), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1.astype(jnp.float32)
    h = _act(h, act_mode)
    o = jax.lax.dot_general(
        h.astype(dt), w2.astype(dt), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b2.astype(jnp.float32)
    return (y.astype(jnp.float32) + o).astype(y.dtype)


_VMEM_BUDGET = 12 * 1024 * 1024  # leave headroom under the 16 MB scoped limit
_WEIGHT_BUDGET = 10 * 1024 * 1024  # above this the weights alone can't stay resident


def _weight_bytes(C: int, H: int, w_dtype) -> int:
    """VMEM held by the grid-invariant operands: fc1/fc2 kernels in the
    compute dtype plus f32 scale/bias/b1/b2 rows (padded to full lanes)."""
    wb = jnp.dtype(w_dtype).itemsize
    c_pad = _round_up(C, 128)
    h_pad = _round_up(H, 128)
    return 2 * c_pad * h_pad * wb + (3 * c_pad + h_pad) * 4


def _pick_row_tile(R: int, C: int, H: int, dtype, w_dtype):
    """Largest row tile that divides R (or the padded R), respects the
    sublane granularity, and keeps the resident weights + f32 temporaries
    (~3 C-wide + 2 H-wide per row) within the scoped-VMEM budget."""
    sublane = 16 if dtype == jnp.bfloat16 else 8
    c_pad = _round_up(C, 128)
    h_pad = _round_up(H, 128)
    io = jnp.dtype(dtype).itemsize
    per_row = (3 * c_pad + 2 * h_pad) * 4 + 3 * c_pad * io
    room = _VMEM_BUDGET - _weight_bytes(C, H, w_dtype)
    budget = max(room // per_row, sublane)
    best = 0
    for t in range(sublane, min(budget, R) + 1, sublane):
        if R % t == 0:
            best = t
    return best, budget, sublane


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10))
def fused_block_tail(skip, attn, scale, bias, w1, b1, w2, b2,
                     eps: float = 1e-6, act_mode: str = "tanh",
                     interpret: bool = None):
    """out = y + fc2(act(fc1(LN(y)))) with y = skip + attn, one HBM pass.

    skip/attn: (R, C). scale/bias: (C,). w1: (C, H), b1: (H,),
    w2: (H, C), b2: (C,). Returns (R, C) in skip.dtype.

    interpret=None auto-selects: compiled kernel on TPU, reference
    composition elsewhere (and under DIFF_SAL_XLA_TAIL=1 for A/B)."""
    if interpret is None:
        import os

        if (
            jax.default_backend() != "tpu"
            or os.environ.get("DIFF_SAL_XLA_TAIL") == "1"
        ):
            return block_tail_reference(
                skip, attn, scale, bias, w1, b1, w2, b2, eps, act_mode
            )
        interpret = False
    R, C = skip.shape
    H = w1.shape[1]
    if not interpret and _weight_bytes(C, H, w1.dtype) > _WEIGHT_BUDGET:
        # coarse stages (e.g. C=768, H=3072 in f32) can't keep the weights
        # VMEM-resident; their R is small so the unfused path is cheap
        return block_tail_reference(
            skip, attn, scale, bias, w1, b1, w2, b2, eps, act_mode
        )
    r_tile, budget, sublane = _pick_row_tile(R, C, H, skip.dtype, w1.dtype)
    if r_tile == 0:
        r_tile = max(budget // sublane * sublane, sublane)
        r_pad = _round_up(R, r_tile)
        skip = jnp.pad(skip, ((0, r_pad - R), (0, 0)))
        attn = jnp.pad(attn, ((0, r_pad - R), (0, 0)))
    else:
        r_pad = R

    out = pl.pallas_call(
        functools.partial(_tail_kernel, eps=eps, act_mode=act_mode),
        grid=(r_pad // r_tile,),
        in_specs=[
            pl.BlockSpec((r_tile, C), lambda i: (i, 0)),
            pl.BlockSpec((r_tile, C), lambda i: (i, 0)),
            pl.BlockSpec((1, C), lambda i: (0, 0)),
            pl.BlockSpec((1, C), lambda i: (0, 0)),
            pl.BlockSpec((C, H), lambda i: (0, 0)),
            pl.BlockSpec((1, H), lambda i: (0, 0)),
            pl.BlockSpec((H, C), lambda i: (0, 0)),
            pl.BlockSpec((1, C), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((r_tile, C), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((r_pad, C), skip.dtype),
        interpret=interpret,
    )(
        skip, attn, scale.reshape(1, C), bias.reshape(1, C),
        w1, b1.reshape(1, H), w2, b2.reshape(1, C),
    )
    return out[:R] if r_pad != R else out


def _tail_fwd(skip, attn, scale, bias, w1, b1, w2, b2, eps, act_mode,
              interpret):
    out = fused_block_tail(
        skip, attn, scale, bias, w1, b1, w2, b2, eps, act_mode, interpret
    )
    return out, (skip, attn, scale, bias, w1, b1, w2, b2)


def _tail_bwd(eps, act_mode, interpret, res, g):
    skip, attn, scale, bias, w1, b1, w2, b2 = res

    def ref(skip, attn, scale, bias, w1, b1, w2, b2):
        return block_tail_reference(
            skip, attn, scale, bias, w1, b1, w2, b2, eps, act_mode
        )

    _, vjp = jax.vjp(ref, skip, attn, scale, bias, w1, b1, w2, b2)
    return vjp(g)


fused_block_tail.defvjp(_tail_fwd, _tail_bwd)
