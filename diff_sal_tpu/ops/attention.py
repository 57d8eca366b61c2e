"""Pallas TPU kernel: fused pooled-attention with decomposed rel-pos bias.

The MViT encoder's hot attention has a very asymmetric shape: Lq up to
1 + 8*56*96 = 43009 query tokens against only Lk = 1 + 8*7*12 = 673
kv tokens (kv-stride pooling, reference mvit.py:935,1019). The XLA path
materializes the (B, H, Lq, Lk) logits plus the same-shaped rel-pos bias in
HBM; this kernel streams q in tiles, keeps k/v entirely in VMEM, adds the
decomposed (T, H, W) relative-position bias on the fly, and writes only the
(Lq, D) output — the attention matrix never exists in HBM.

Bias trick: the decomposed bias for column j >= 1 is
    rel_t[l, kt(j)] + rel_h[l, kh(j)] + rel_w[l, kw(j)]
with (kt, kh, kw) = unravel(j - 1). Instead of per-column gathers, each term
becomes a small matmul with a static one-hot expansion matrix
E_t (kt, Lk_pad), E_h (kh, Lk_pad), E_w (kw, Lk_pad):
    bias_tile = rel_t_tile @ E_t + rel_h_tile @ E_h + rel_w_tile @ E_w
which lands on the MXU. The cls row's bias is zero by zero-padding the rel
inputs at row 0; the cls column and the Lk padding get zero/-inf through the
same matrices plus a static additive mask row.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@functools.lru_cache(maxsize=None)
def _expansion_matrices(
    k_shape: Tuple[int, int, int], lk: int, lk_pad: int
):
    """Static one-hot matrices E_t/E_h/E_w (axis_len, lk_pad) mapping each
    padded key column to its (kt, kh, kw) coordinate, plus the additive
    column mask (1, lk_pad): 0 for real columns, NEG_INF for padding."""
    kt, kh, kw = k_shape
    Et = np.zeros((kt, lk_pad), np.float32)
    Eh = np.zeros((kh, lk_pad), np.float32)
    Ew = np.zeros((kw, lk_pad), np.float32)
    for j in range(1, lk):  # column 0 is cls: zero bias
        t, rem = divmod(j - 1, kh * kw)
        h, w = divmod(rem, kw)
        Et[t, j] = 1.0
        Eh[h, j] = 1.0
        Ew[w, j] = 1.0
    mask = np.full((1, lk_pad), NEG_INF, np.float32)
    mask[0, :lk] = 0.0
    return Et, Eh, Ew, mask


def _attn_kernel(q_ref, k_ref, v_ref, rt_ref, rh_ref, rw_ref, et_ref, eh_ref,
                 ew_ref, mask_ref, o_ref, *, scale: float,
                 residual: bool, q_tile: int):
    # blocked refs carry a leading unit (batch*head) dim. Dots stay in the
    # INPUT dtype (bf16 on the mixed-precision path) with f32 accumulation:
    # the MXU runs bf16 x bf16 -> f32 at 4x its f32 rate, and pre-casting
    # operands to f32 was the kernel's dominant cost.
    q = q_ref[0]
    k = k_ref[0]
    scores = jax.lax.dot_general(
        q * jnp.asarray(scale, q.dtype), k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (Tq, Lk_pad) f32
    bias = (
        jnp.dot(rt_ref[0].astype(jnp.float32), et_ref[:],
                preferred_element_type=jnp.float32)
        + jnp.dot(rh_ref[0].astype(jnp.float32), eh_ref[:],
                  preferred_element_type=jnp.float32)
        + jnp.dot(rw_ref[0].astype(jnp.float32), ew_ref[:],
                  preferred_element_type=jnp.float32)
    )
    scores = scores + bias + mask_ref[:]
    probs = jax.nn.softmax(scores, axis=-1)  # f32
    out = jnp.dot(
        probs.astype(q.dtype), v_ref[0],
        preferred_element_type=jnp.float32,
    )
    if residual:
        # residual pooling (reference mvit.py:640-644): out[1:] += q[1:];
        # the cls row (global row 0, first tile only) is excluded
        rows = jax.lax.broadcasted_iota(
            jnp.int32, (out.shape[0], 1), 0
        ) + pl.program_id(1) * q_tile
        out = out + jnp.where(rows >= 1, q.astype(jnp.float32), 0.0)
    o_ref[0] = out.astype(o_ref.dtype)


def _reference_bias_attention(q, k, v, rel_t, rel_h, rel_w, k_shape, scale):
    """XLA-path math, used as the custom-VJP backward (the fused kernel is
    the forward; gradients re-derive through this equivalent formulation)."""
    BH, Lq, _ = q.shape
    kt, kh, kw = k_shape
    scores = jnp.einsum("blc,btc->blt", q * scale, k)
    bias_cols = (
        rel_t[:, :, :, None, None]
        + rel_h[:, :, None, :, None]
        + rel_w[:, :, None, None, :]
    ).reshape(BH, Lq, kt * kh * kw)
    bias = jnp.pad(bias_cols, ((0, 0), (0, 0), (1, 0)))
    probs = jax.nn.softmax(scores + bias, axis=-1)
    return jnp.einsum("blt,btc->blc", probs, v)


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10)
)
def fused_bias_attention(
    q: jnp.ndarray,  # (BH, Lq, D) — cls token at row 0
    k: jnp.ndarray,  # (BH, Lk, D)
    v: jnp.ndarray,  # (BH, Lk, D)
    rel_t: jnp.ndarray,  # (BH, Lq, kt) — row 0 (cls) must be zero
    rel_h: jnp.ndarray,  # (BH, Lq, kh)
    rel_w: jnp.ndarray,  # (BH, Lq, kw)
    k_shape: Tuple[int, int, int],
    scale: float = 1.0,
    q_tile: int = 512,
    interpret: bool = None,
    residual: bool = False,
) -> jnp.ndarray:
    """softmax(q k^T * scale + decomposed-bias) v without materializing the
    attention matrix. Returns (BH, Lq, D) in q's dtype.

    interpret=None auto-selects: compiled on TPU, interpreter elsewhere (so
    the integrated path stays testable on the CPU backend)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    BH, Lq, D = q.shape
    Lk = k.shape[1]
    kt, kh, kw = k_shape
    assert Lk == 1 + kt * kh * kw

    lk_pad = _round_up(Lk, 128)
    # keep the f32 scores/bias tiles + kv within VMEM: ~3 * Tq * Lk_pad * 4B
    # plus kv/q blocks must stay under the ~16 MB budget (10 MB leaves room
    # for double buffering; larger tiles matter for the big-Lk blocks where
    # a 128-row tile starves the MXU)
    while q_tile > 128 and 3 * q_tile * lk_pad * 4 > 10 * 1024 * 1024:
        q_tile //= 2
    lq_pad = _round_up(Lq, q_tile)
    Et, Eh, Ew, maskrow = _expansion_matrices((kt, kh, kw), Lk, lk_pad)

    qp = jnp.pad(q, ((0, 0), (0, lq_pad - Lq), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, lk_pad - Lk), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, lk_pad - Lk), (0, 0)))
    rtp = jnp.pad(rel_t, ((0, 0), (0, lq_pad - Lq), (0, 0)))
    rhp = jnp.pad(rel_h, ((0, 0), (0, lq_pad - Lq), (0, 0)))
    rwp = jnp.pad(rel_w, ((0, 0), (0, lq_pad - Lq), (0, 0)))

    grid = (BH, lq_pad // q_tile)
    qspec = pl.BlockSpec((1, q_tile, D), lambda b, i: (b, i, 0))
    kvspec = pl.BlockSpec((1, lk_pad, D), lambda b, i: (b, 0, 0))

    def rspec(n):
        return pl.BlockSpec((1, q_tile, n), lambda b, i: (b, i, 0))

    def cspec(r, c):
        return pl.BlockSpec((r, c), lambda b, i: (0, 0))

    kernel = functools.partial(
        _attn_kernel, scale=scale, residual=residual, q_tile=q_tile
    )

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            qspec, kvspec, kvspec, rspec(kt), rspec(kh), rspec(kw),
            cspec(kt, lk_pad), cspec(kh, lk_pad), cspec(kw, lk_pad),
            cspec(1, lk_pad),
        ],
        out_specs=qspec,
        out_shape=jax.ShapeDtypeStruct((BH, lq_pad, D), q.dtype),
        interpret=interpret,
    )(
        qp, kp, vp, rtp, rhp, rwp,
        jnp.asarray(Et), jnp.asarray(Eh), jnp.asarray(Ew), jnp.asarray(maskrow),
    )
    return out[:, :Lq]


def _attn_bwd_kernel(q_ref, k_ref, v_ref, rt_ref, rh_ref, rw_ref, et_ref,
                     eh_ref, ew_ref, mask_ref, g_ref, dq_ref, dk_ref, dv_ref,
                     drt_ref, drh_ref, drw_ref, *, scale: float,
                     residual: bool, q_tile: int):
    """Flash-style backward: recompute this q-tile's probs, then produce
    dq/d_rel per tile and accumulate dk/dv across the (sequential) q-tile
    grid axis — the (Lq, Lk) attention matrix never exists in HBM."""
    i = pl.program_id(1)
    q = q_ref[0]  # input dtype — bf16 dots with f32 accumulation (see fwd)
    k = k_ref[0]
    v = v_ref[0]
    g = g_ref[0]

    scores = jax.lax.dot_general(
        q * jnp.asarray(scale, q.dtype), k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    bias = (
        jnp.dot(rt_ref[0].astype(jnp.float32), et_ref[:],
                preferred_element_type=jnp.float32)
        + jnp.dot(rh_ref[0].astype(jnp.float32), eh_ref[:],
                  preferred_element_type=jnp.float32)
        + jnp.dot(rw_ref[0].astype(jnp.float32), ew_ref[:],
                  preferred_element_type=jnp.float32)
    )
    p = jax.nn.softmax(scores + bias + mask_ref[:], axis=-1)  # f32
    p_lo = p.astype(q.dtype)

    # dv += p^T g ; dp = g v^T ; ds = p*(dp - rowsum(dp*p))
    dv_tile = jax.lax.dot_general(
        p_lo, g, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (Lk_pad, D)
    dp = jax.lax.dot_general(
        g, v, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (Tq, Lk_pad)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))  # f32
    ds_lo = ds.astype(q.dtype)

    dq = jnp.dot(ds_lo, k, preferred_element_type=jnp.float32) * scale
    if residual:
        rows = jax.lax.broadcasted_iota(
            jnp.int32, (dq.shape[0], 1), 0
        ) + i * q_tile
        dq = dq + jnp.where(rows >= 1, g.astype(jnp.float32), 0.0)
    dq_ref[0] = dq

    # decomposed-bias grads ride the same one-hot matrices, transposed
    # (tiny flops — keep f32 for the bias-table gradient precision)
    drt_ref[0] = jax.lax.dot_general(
        ds, et_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    drh_ref[0] = jax.lax.dot_general(
        ds, eh_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    drw_ref[0] = jax.lax.dot_general(
        ds, ew_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    dk_tile = jax.lax.dot_general(
        ds_lo, q, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # (Lk_pad, D)

    @pl.when(i == 0)
    def _init():
        dk_ref[0] = jnp.zeros_like(dk_ref[0])
        dv_ref[0] = jnp.zeros_like(dv_ref[0])

    dk_ref[0] += dk_tile
    dv_ref[0] += dv_tile


def _fba_fwd(q, k, v, rel_t, rel_h, rel_w, k_shape, scale, q_tile, interpret,
             residual):
    out = fused_bias_attention(
        q, k, v, rel_t, rel_h, rel_w, k_shape, scale, q_tile, interpret,
        residual,
    )
    return out, (q, k, v, rel_t, rel_h, rel_w)


def _fba_bwd(k_shape, scale, q_tile, interpret, residual, res, g):
    q, k, v, rel_t, rel_h, rel_w = res
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    BH, Lq, D = q.shape
    Lk = k.shape[1]
    kt, kh, kw = k_shape

    lk_pad = _round_up(Lk, 128)
    # backward holds ~5 f32 (Tq, Lk_pad) tiles live (scores/bias/p/dp/ds)
    while q_tile > 128 and 5 * q_tile * lk_pad * 4 > 8 * 1024 * 1024:
        q_tile //= 2
    lq_pad = _round_up(Lq, q_tile)
    Et, Eh, Ew, maskrow = _expansion_matrices((kt, kh, kw), Lk, lk_pad)

    pad_q = ((0, 0), (0, lq_pad - Lq), (0, 0))
    pad_k = ((0, 0), (0, lk_pad - Lk), (0, 0))
    qp, gp = jnp.pad(q, pad_q), jnp.pad(g, pad_q)
    kp, vp = jnp.pad(k, pad_k), jnp.pad(v, pad_k)
    rtp = jnp.pad(rel_t, pad_q)
    rhp = jnp.pad(rel_h, pad_q)
    rwp = jnp.pad(rel_w, pad_q)

    grid = (BH, lq_pad // q_tile)
    qspec = pl.BlockSpec((1, q_tile, D), lambda b, i: (b, i, 0))
    kvspec = pl.BlockSpec((1, lk_pad, D), lambda b, i: (b, 0, 0))

    def rspec(n):
        return pl.BlockSpec((1, q_tile, n), lambda b, i: (b, i, 0))

    def cspec(r, c):
        return pl.BlockSpec((r, c), lambda b, i: (0, 0))

    kernel = functools.partial(
        _attn_bwd_kernel, scale=scale, residual=residual, q_tile=q_tile
    )
    f32 = jnp.float32
    dq, dk, dv, drt, drh, drw = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            qspec, kvspec, kvspec, rspec(kt), rspec(kh), rspec(kw),
            cspec(kt, lk_pad), cspec(kh, lk_pad), cspec(kw, lk_pad),
            cspec(1, lk_pad), qspec,
        ],
        out_specs=[
            qspec, kvspec, kvspec, rspec(kt), rspec(kh), rspec(kw),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BH, lq_pad, D), f32),
            jax.ShapeDtypeStruct((BH, lk_pad, D), f32),
            jax.ShapeDtypeStruct((BH, lk_pad, D), f32),
            jax.ShapeDtypeStruct((BH, lq_pad, kt), f32),
            jax.ShapeDtypeStruct((BH, lq_pad, kh), f32),
            jax.ShapeDtypeStruct((BH, lq_pad, kw), f32),
        ],
        interpret=interpret,
    )(qp, kp, vp, rtp, rhp, rwp,
      jnp.asarray(Et), jnp.asarray(Eh), jnp.asarray(Ew),
      jnp.asarray(maskrow), gp)

    return (
        dq[:, :Lq].astype(q.dtype),
        dk[:, :Lk].astype(k.dtype),
        dv[:, :Lk].astype(v.dtype),
        drt[:, :Lq].astype(rel_t.dtype),
        drh[:, :Lq].astype(rel_h.dtype),
        drw[:, :Lq].astype(rel_w.dtype),
    )


fused_bias_attention.defvjp(_fba_fwd, _fba_bwd)


# ---------------------------------------------------------------------------
# v2: cls-free packed layout (round 3).
#
# The v1 kernel takes (B*H, Lq, D) with the cls token at row 0 — which forces
# the caller to slice cls off the (B, N, 3C) qkv tensor (a full relayout of
# the 43k-token activations), pad Lq to the tile grid, and ship three
# separately lane-padded rel tensors. The xplane breakdown attributes ~38% of
# the round-2 iteration to exactly those pads/slices/copies (docs/PERF.md).
#
# v2 reshapes nothing: operands arrive packed as (B, Lq, H*D) with
# D = head_dim padded to the 128-lane tile (zero channels), the spatial Lq
# contains NO cls row (the cls query row is a tiny einsum outside), and the
# decomposed rel-pos inputs are concatenated per head into (B, Lq, H*Kp),
# biased in-kernel through one stacked one-hot matmul. Per-head blocks are
# cut by lane OFFSET (h*D, h*Kp — tile-aligned because D=128 and Kp is a
# 128-multiple), so the grid is (B, H, q_tiles) with no (B,H,L,D) transpose
# on either side of the kernel. k/v carry cls at row 0 and zero rel bias in
# column 0 through the same stacked matrices.
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _expansion_cat(k_shape: Tuple[int, int, int], lk: int, lk_pad: int,
                   k_cat_pad: int):
    """Stacked one-hot matrix E (k_cat_pad, lk_pad): rows [0:kt) map the t
    coordinate, [kt:kt+kh) the h coordinate, [kt+kh:kt+kh+kw) the w
    coordinate of each key column; remaining rows zero. Plus the additive
    column mask (0 real / NEG_INF padding; column 0 = cls gets zero bias
    via all-zero one-hot columns)."""
    kt, kh, kw = k_shape
    E = np.zeros((k_cat_pad, lk_pad), np.float32)
    for j in range(1, lk):
        t, rem = divmod(j - 1, kh * kw)
        h, w = divmod(rem, kw)
        E[t, j] = 1.0
        E[kt + h, j] = 1.0
        E[kt + kh + w, j] = 1.0
    mask = np.full((1, lk_pad), NEG_INF, np.float32)
    mask[0, :lk] = 0.0
    return E, mask


# scratch budget for the (q_tile, lk_pad) f32 score/exp temporaries.
# 10 MB was tuned round 2; scripts/micro_attn.py sweeps it per shape
# (VMEM is 128 MB on v5e — the cap trades per-step overhead amortization
# against double-buffer headroom for the streamed q/rel/out tiles).
_QTILE_BUDGET_BYTES = 10 * 1024 * 1024


def _pick_q_tile(lq: int, lk_pad: int, budget_bytes: int = None):
    """Largest q tile with ~3 f32 (tile, lk_pad) temporaries under budget,
    preferring 128-multiples that DIVIDE lq (no pad, no ragged tail)."""
    if budget_bytes is None:
        budget_bytes = _QTILE_BUDGET_BYTES
    cap = max(budget_bytes // (3 * lk_pad * 4), 128)
    best = 0
    for t in range(128, min(cap, lq) + 1, 128):
        if lq % t == 0:
            best = t
    if best:
        return best, lq
    t = min(cap // 128 * 128, _round_up(lq, 128))
    t = max(t, 128)
    return t, _round_up(lq, t)


def reference_bias_attention_v2(
    q: jnp.ndarray,  # (B, Lq, H*D)
    k: jnp.ndarray,  # (B, Lk, H*D), cls at row 0
    v: jnp.ndarray,
    rel: jnp.ndarray,  # (B, Lq, H*Kp)
    k_shape: Tuple[int, int, int],
    num_heads: int,
    scale: float = 1.0,
    interpret=None,  # unused; signature-compatible with the kernel
    residual: bool = False,
    out_dtype=None,
    softmax_mode: str = "exp2",  # unused; signature-compatible
) -> jnp.ndarray:
    """XLA-einsum formulation of the v2 packed-layout attention — the
    non-Pallas fallback (CPU tests, ablation) and the semantic reference
    the kernel is pinned against."""
    B, Lq, HD = q.shape
    H = num_heads
    D = HD // H
    Lk = k.shape[1]
    kt, kh, kw = k_shape
    K = kt + kh + kw
    Kp = rel.shape[-1] // H

    q4 = q.reshape(B, Lq, H, D)
    k4 = k.reshape(B, Lk, H, D)
    v4 = v.reshape(B, Lk, H, D)
    scores = jnp.einsum(
        "blhd,bkhd->bhlk", q4 * jnp.asarray(scale, q.dtype), k4,
        preferred_element_type=jnp.float32,
    )
    r4 = rel.reshape(B, Lq, H, Kp)
    rel_t = r4[..., :kt]
    rel_h = r4[..., kt : kt + kh]
    rel_w = r4[..., kt + kh : K]
    bias = (
        rel_t[..., :, None, None]
        + rel_h[..., None, :, None]
        + rel_w[..., None, None, :]
    ).reshape(B, Lq, H, kt * kh * kw)
    bias = jnp.pad(bias, ((0, 0), (0, 0), (0, 0), (1, 0)))  # zero cls col
    probs = jax.nn.softmax(
        scores + jnp.moveaxis(bias, 2, 1).astype(jnp.float32), axis=-1
    )
    out = jnp.einsum(
        "bhlk,bkhd->blhd", probs.astype(q.dtype), v4,
        preferred_element_type=jnp.float32,
    ).astype(out_dtype or q.dtype)
    out = out.reshape(B, Lq, HD)
    if residual:
        out = out + q
    return out


LOG2E = 1.4426950408889634


def _attn_v2_kernel(q_ref, k_ref, v_ref, rel_ref, e_ref, mask_ref, o_ref, *,
                    scale: float, residual: bool, softmax_mode: str):
    q = q_ref[0]  # (Tq, D) input dtype
    k = k_ref[0]  # (Lk_pad, D)
    scores = jax.lax.dot_general(
        q * jnp.asarray(scale, q.dtype), k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # E is a {0,1} one-hot expansion (exact in bf16), rel is already the
    # input dtype: an input-dtype dot runs the MXU at full (4x f32) rate
    # with f32 accumulation and produces bit-identical sums of <=3 rel
    # entries — same values as the old f32 cast path
    bias = jnp.dot(rel_ref[0], e_ref[...].astype(rel_ref.dtype),
                   preferred_element_type=jnp.float32)
    s = scores + bias + mask_ref[...]
    if softmax_mode == "exp2_bf16":
        # candidate #3 (PERF.md): the (Tq, Lk_pad) max/sub/mul/exp2 chain
        # in the input dtype — halves the softmax tile's VMEM footprint
        # and feeds the pv dot without a second convert. Mosaic rejects
        # bf16 matmul accumulators, so the score/bias dots stay f32 and
        # one convert pass precedes the chain; the row sum still
        # accumulates f32 (bf16 accumulation over Lk<=2816 terms of a
        # ~100s-sized total would lose ~1%).
        sb = s.astype(q.dtype)
        m = jnp.max(sb, axis=-1, keepdims=True)
        e = jnp.exp2((sb - m) * jnp.asarray(LOG2E, sb.dtype))
        r = 1.0 / jnp.sum(e, axis=-1, keepdims=True, dtype=jnp.float32)
        out = jnp.dot(e, v_ref[0],
                      preferred_element_type=jnp.float32) * r
    elif softmax_mode == "exp2":
        # VPU-lean softmax: exp2 instead of exp (the hardware approximates
        # exp2 directly; exp lowers to a longer chain) and the row
        # normalization deferred PAST the pv dot — a (Tq, D) multiply
        # instead of a (Tq, Lk_pad) divide. The kernel was VPU-bound: at
        # block 1 the f32 softmax over (Tq, 2816) costs more than the
        # kernel's three MXU dots combined (docs/PERF.md round 3).
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp2((s - m) * LOG2E)  # unnormalized, <= 1.0
        r = 1.0 / jnp.sum(e, axis=-1, keepdims=True)
        out = jnp.dot(e.astype(q.dtype), v_ref[0],
                      preferred_element_type=jnp.float32) * r
    else:
        probs = jax.nn.softmax(s, axis=-1)
        out = jnp.dot(probs.astype(q.dtype), v_ref[0],
                      preferred_element_type=jnp.float32)
    if residual:
        # residual pooling over every row — q carries no cls row in v2
        out = out + q.astype(jnp.float32)
    o_ref[0] = out.astype(o_ref.dtype)


def _attn_v2_resident_kernel(q_ref, k_ref, v_ref, rel_ref, e_ref, mask_ref,
                             o_ref, *, scale: float, residual: bool,
                             softmax_mode: str, q_inner: int):
    """kv-resident variant: grid is (B, H) only; k/v live in VMEM for the
    whole (b, h) step and q tiles are walked with an inner loop. The
    tiled-grid kernel re-fetches the (lk_pad, D) k/v blocks on every
    q-tile step — ~970 MB of redundant DMA at MViT block 1 (B=8), which
    measured ~1.2 ms of the kernel's 2.3 ms (docs/PERF.md round 3)."""
    k = k_ref[0]
    v = v_ref[0]
    e = e_ref[...]
    mask = mask_ref[...]
    n = q_ref.shape[1] // q_inner

    def body(i, _):
        sl = pl.ds(i * q_inner, q_inner)
        q = q_ref[0, sl]
        scores = jax.lax.dot_general(
            q * jnp.asarray(scale, q.dtype), k,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        bias = jnp.dot(rel_ref[0, sl], e.astype(q.dtype),
                       preferred_element_type=jnp.float32)
        s = scores + bias + mask
        if softmax_mode == "exp2":
            m = jnp.max(s, axis=-1, keepdims=True)
            ex = jnp.exp2((s - m) * LOG2E)
            r = 1.0 / jnp.sum(ex, axis=-1, keepdims=True)
            out = jnp.dot(ex.astype(q.dtype), v,
                          preferred_element_type=jnp.float32) * r
        else:
            p = jax.nn.softmax(s, axis=-1)
            out = jnp.dot(p.astype(q.dtype), v,
                          preferred_element_type=jnp.float32)
        if residual:
            out = out + q.astype(jnp.float32)
        o_ref[0, sl] = out.astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, n, body, 0)


# kv-resident heuristics: only when the whole-(b,h) operands fit VMEM
# comfortably AND the kv block is big enough that re-fetching it per
# q-tile would dominate (lk_pad >= 1024: blocks 1/3/14 of the MViT plan).
# MEASURED NULL on v5e (block-1/3 shapes identical to the tiled grid —
# Mosaic already skips re-DMA of blocks whose index is unchanged between
# consecutive grid steps, so the suspected 970 MB of redundant kv traffic
# never existed); kept implemented + equality-tested, default OFF.
_RESIDENT_Q_INNER = 256
_RESIDENT_ENABLED = False

# backward kernel writes dq/drel in the INPUT dtype (bit-identical to the
# f32-output + XLA astype path; see _fba2_bwd). False restores f32 outputs
# for the A/B harness.
_BWD_NATIVE_OUT = True


def _use_resident(lq_pad: int, lk_pad: int, D: int, Kp: int) -> bool:
    if not _RESIDENT_ENABLED or lk_pad < 1024:
        return False
    vmem = (
        lq_pad * (2 * D + Kp) * 2  # q + out + rel (bf16)
        + 2 * lk_pad * D * 2  # k + v
        + Kp * lk_pad * 4  # E
        + 4 * _RESIDENT_Q_INNER * lk_pad * 4  # scores/exp temporaries
    )
    return vmem <= 64 * 1024 * 1024


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9, 10))
def fused_bias_attention_v2(
    q: jnp.ndarray,  # (B, Lq, H*D) — spatial tokens only, D = 128-padded hd
    k: jnp.ndarray,  # (B, Lk, H*D) — cls at row 0
    v: jnp.ndarray,  # (B, Lk, H*D)
    rel: jnp.ndarray,  # (B, Lq, H*Kp), per head [rel_t | rel_h | rel_w | 0]
    k_shape: Tuple[int, int, int],
    num_heads: int,
    scale: float = 1.0,
    interpret: bool = None,
    residual: bool = False,
    out_dtype=None,
    softmax_mode: str = "exp2",
) -> jnp.ndarray:
    """softmax(q k^T * scale + decomposed-bias) v on packed per-head lanes.

    Returns (B, Lq, H*D) in q's dtype (or out_dtype). Kp per head is
    round_up(kt+kh+kw, 128); rel's zero tail rows meet zero E rows.
    softmax_mode "exp2" (default) computes the identical softmax via
    exp2 with post-dot row normalization (VPU-lean, same math to fp
    rounding); "div" is the classic jax.nn.softmax formulation."""
    if softmax_mode not in ("exp2", "exp2_bf16", "div"):
        raise ValueError(f"unknown softmax_mode {softmax_mode!r}; "
                         "expected 'exp2' | 'exp2_bf16' | 'div'")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, Lq, HD = q.shape
    H = num_heads
    D = HD // H
    assert H * D == HD and D % 128 == 0, (HD, H)
    Lk = k.shape[1]
    kt, kh, kw = k_shape
    assert Lk == 1 + kt * kh * kw
    K = kt + kh + kw
    Kp = rel.shape[-1] // H
    assert Kp % 128 == 0 and Kp >= K, (Kp, K)

    lk_pad = _round_up(Lk, 128)
    resident = _use_resident(_round_up(Lq, _RESIDENT_Q_INNER), lk_pad, D, Kp)
    if resident:
        q_tile = _RESIDENT_Q_INNER
        lq_pad = _round_up(Lq, q_tile)
    else:
        q_tile, lq_pad = _pick_q_tile(Lq, lk_pad)
    E, maskrow = _expansion_cat((kt, kh, kw), Lk, lk_pad, Kp)

    if lq_pad != Lq:
        q = jnp.pad(q, ((0, 0), (0, lq_pad - Lq), (0, 0)))
        rel = jnp.pad(rel, ((0, 0), (0, lq_pad - Lq), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, lk_pad - Lk), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, lk_pad - Lk), (0, 0)))

    cspec = lambda r, c, n: pl.BlockSpec(  # noqa: E731
        (r, c), (lambda b, h: (0, 0)) if n == 2 else (lambda b, h, i: (0, 0))
    )
    if resident:
        grid = (B, H)
        qspec = pl.BlockSpec((1, lq_pad, D), lambda b, h: (b, 0, h))
        kvspec = pl.BlockSpec((1, lk_pad, D), lambda b, h: (b, 0, h))
        rspec = pl.BlockSpec((1, lq_pad, Kp), lambda b, h: (b, 0, h))
        kernel = functools.partial(
            _attn_v2_resident_kernel, scale=scale, residual=residual,
            # the resident kernel implements only exp2/div; exp2_bf16's
            # bf16 score chain normalizes to exp2 (same math, f32 chain)
            # rather than silently falling into the div branch
            softmax_mode="exp2" if softmax_mode == "exp2_bf16"
            else softmax_mode, q_inner=q_tile,
        )
    else:
        grid = (B, H, lq_pad // q_tile)
        qspec = pl.BlockSpec((1, q_tile, D), lambda b, h, i: (b, i, h))
        kvspec = pl.BlockSpec((1, lk_pad, D), lambda b, h, i: (b, 0, h))
        rspec = pl.BlockSpec((1, q_tile, Kp), lambda b, h, i: (b, i, h))
        kernel = functools.partial(
            _attn_v2_kernel, scale=scale, residual=residual,
            softmax_mode=softmax_mode,
        )

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[qspec, kvspec, kvspec, rspec,
                  cspec(Kp, lk_pad, len(grid)), cspec(1, lk_pad, len(grid))],
        out_specs=qspec,
        out_shape=jax.ShapeDtypeStruct((B, lq_pad, HD),
                                       out_dtype or q.dtype),
        # the resident variant holds whole-(b,h) operands in VMEM — raise
        # Mosaic's 16 MB default scoped-vmem cap (v5e has 128 MB)
        compiler_params=(
            pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
            if resident and not interpret else None
        ),
        interpret=interpret,
    )(q, kp, vp, rel, jnp.asarray(E), jnp.asarray(maskrow))
    return out[:, :Lq] if lq_pad != Lq else out


def _attn_v2_bwd_kernel(q_ref, k_ref, v_ref, rel_ref, e_ref, mask_ref, g_ref,
                        dq_ref, dk_ref, dv_ref, drel_ref, *, scale: float,
                        residual: bool):
    i = pl.program_id(2)
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    g = g_ref[0]

    scores = jax.lax.dot_general(
        q * jnp.asarray(scale, q.dtype), k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # input-dtype one-hot bias dot — see the forward kernel
    bias = jnp.dot(rel_ref[0], e_ref[...].astype(rel_ref.dtype),
                   preferred_element_type=jnp.float32)
    p = jax.nn.softmax(scores + bias + mask_ref[...], axis=-1)
    p_lo = p.astype(q.dtype)

    dv_tile = jax.lax.dot_general(
        p_lo, g, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dp = jax.lax.dot_general(
        g, v, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    ds_lo = ds.astype(q.dtype)

    dq = jnp.dot(ds_lo, k, preferred_element_type=jnp.float32) * scale
    if residual:
        dq = dq + g.astype(jnp.float32)
    dq_ref[0] = dq.astype(dq_ref.dtype)

    drel_ref[0] = jax.lax.dot_general(
        ds, e_ref[...], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(drel_ref.dtype)

    dk_tile = jax.lax.dot_general(
        ds_lo, q, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale

    @pl.when(i == 0)
    def _init():
        dk_ref[0] = jnp.zeros_like(dk_ref[0])
        dv_ref[0] = jnp.zeros_like(dv_ref[0])

    dk_ref[0] += dk_tile.astype(dk_ref.dtype)
    dv_ref[0] += dv_tile.astype(dv_ref.dtype)


def _fba2_fwd(q, k, v, rel, k_shape, num_heads, scale, interpret, residual,
              out_dtype, softmax_mode):
    out = fused_bias_attention_v2(
        q, k, v, rel, k_shape, num_heads, scale, interpret, residual,
        out_dtype, softmax_mode,
    )
    return out, (q, k, v, rel)


def _fba2_bwd(k_shape, num_heads, scale, interpret, residual, out_dtype,
              softmax_mode, res, g):
    q, k, v, rel = res
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, Lq, HD = q.shape
    H = num_heads
    D = HD // H
    Lk = k.shape[1]
    kt, kh, kw = k_shape
    Kp = rel.shape[-1] // H

    lk_pad = _round_up(Lk, 128)
    # backward holds ~5 f32 (tile, lk_pad) temporaries
    q_tile, lq_pad = _pick_q_tile(Lq, lk_pad, 8 * 1024 * 1024 * 3 // 5)
    E, maskrow = _expansion_cat((kt, kh, kw), Lk, lk_pad, Kp)

    if lq_pad != Lq:
        pad_q = ((0, 0), (0, lq_pad - Lq), (0, 0))
        q, g, rel = jnp.pad(q, pad_q), jnp.pad(g, pad_q), jnp.pad(rel, pad_q)
    pad_k = ((0, 0), (0, lk_pad - Lk), (0, 0))
    kp, vp = jnp.pad(k, pad_k), jnp.pad(v, pad_k)

    grid = (B, H, lq_pad // q_tile)
    qspec = pl.BlockSpec((1, q_tile, D), lambda b, h, i: (b, i, h))
    kvspec = pl.BlockSpec((1, lk_pad, D), lambda b, h, i: (b, 0, h))
    rspec = pl.BlockSpec((1, q_tile, Kp), lambda b, h, i: (b, i, h))
    cspec = lambda r, c: pl.BlockSpec((r, c), lambda b, h, i: (0, 0))  # noqa: E731

    # dq/drel are written ONCE per q-tile (no cross-tile accumulation), so
    # the kernel emits them in the INPUT dtype directly — bit-identical to
    # the old f32-output + XLA astype (same f32 value, same rounding), but
    # the f32 round trip (176 MB for block-0 dq at B=8) and the standalone
    # convert pass never touch HBM. dk/dv accumulate f32 across the
    # sequential q grid and stay f32 outputs (they are kv-pool-sized).
    # _BWD_NATIVE_OUT exists for the A/B harness (scripts/ab_train_attnbwd).
    f32 = jnp.float32
    dq_dt = q.dtype if _BWD_NATIVE_OUT else f32
    drel_dt = rel.dtype if _BWD_NATIVE_OUT else f32
    dq, dk, dv, drel = pl.pallas_call(
        functools.partial(_attn_v2_bwd_kernel, scale=scale,
                          residual=residual),
        grid=grid,
        in_specs=[qspec, kvspec, kvspec, rspec,
                  cspec(Kp, lk_pad), cspec(1, lk_pad), qspec],
        out_specs=[qspec, kvspec, kvspec, rspec],
        out_shape=[
            jax.ShapeDtypeStruct((B, lq_pad, HD), dq_dt),
            jax.ShapeDtypeStruct((B, lk_pad, HD), f32),
            jax.ShapeDtypeStruct((B, lk_pad, HD), f32),
            jax.ShapeDtypeStruct((B, lq_pad, H * Kp), drel_dt),
        ],
        interpret=interpret,
    )(q, kp, vp, rel, jnp.asarray(E), jnp.asarray(maskrow), g)

    return (
        dq[:, :Lq].astype(q.dtype),
        dk[:, :Lk].astype(k.dtype),
        dv[:, :Lk].astype(v.dtype),
        drel[:, :Lq].astype(rel.dtype),
    )


fused_bias_attention_v2.defvjp(_fba2_fwd, _fba2_bwd)


# ---------------------------------------------------------------------------
# Fused CvT cross-attention (decoder TransformerBlocks)
#
# The decoder's attention (reference saliency_decoder/attention.py:88-106)
# is extremely kv-poor: every stage pools k/v to S = 3*6 = 18 tokens while q
# keeps the full grid (84 / 336 / 1344 / 5376 tokens). The XLA einsum path
# materializes the (Bt, heads, L, S) scores + probabilities in HBM and drags
# bhlt-layout relayout copies around them (~0.5 ms/stage at B=8,
# docs/PERF.md round 4). This kernel keeps k/v resident in VMEM (padded
# 18 -> 128 lanes, masked), streams q in row tiles, and writes only the
# (L, C) output — scores never exist in HBM. Eval-path only (no vjp).
# ---------------------------------------------------------------------------


def _cvt_attn_kernel(q_ref, k_ref, v_ref, o_ref, *, num_heads, scale,
                     s_real):
    C = q_ref.shape[-1]
    hd = C // num_heads
    s_pad = k_ref.shape[1]
    col_mask = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (1, s_pad), 1) < s_real,
        0.0, NEG_INF,
    ).astype(jnp.float32)
    outs = []
    for h in range(num_heads):
        sl = slice(h * hd, (h + 1) * hd)
        qh = q_ref[0, :, sl]
        kh = k_ref[0, :, sl]
        vh = v_ref[0, :, sl]
        s = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale + col_mask
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        outs.append(
            jax.lax.dot_general(
                p.astype(vh.dtype), vh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        )
    o_ref[0] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)


def _cvt_q_tile(L: int, cap: int = 1024) -> int:
    """Largest multiple-of-8 tile <= cap that divides L exactly (zero row
    padding when possible); else the smallest 8-multiple covering L."""
    for tl in range(min(cap, _round_up(L, 8)), 7, -8):
        if L % tl == 0:
            return tl
    return _round_up(L, 8)


def reference_cvt_attention(q, k, v, num_heads, scale):
    """XLA reference: the einsum path of models/sal_unet.py CvTAttention."""
    Bt, L, C = q.shape
    hd = C // num_heads
    qh = q.reshape(Bt, -1, num_heads, hd)
    kh = k.reshape(Bt, -1, num_heads, hd)
    vh = v.reshape(Bt, -1, num_heads, hd)
    attn = jnp.einsum("blhd,bthd->bhlt", qh, kh) * scale
    attn = jax.nn.softmax(attn, axis=-1)
    return jnp.einsum("bhlt,bthd->blhd", attn, vh).reshape(Bt, L, C)


def cvt_cross_attention(q, k, v, num_heads, scale, interpret=None):
    """Fused decoder cross-attention: softmax(q k^T * scale) v.

    q (Bt, L, C); k, v (Bt, S, C) with small S (18 in the shipping config);
    heads split C. Returns (Bt, L, C). Numerics: f32 scores/softmax with a
    row-max shift (the einsum path computes softmax in f32 too when inputs
    are bf16 — XLA upcasts reductions); equality vs the einsum path is
    bf16-tolerance, tested in tests/test_ops.py.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    Bt, L, C = q.shape
    S = k.shape[1]
    assert C % num_heads == 0, (C, num_heads)
    s_pad = 128
    assert S <= s_pad, S
    tl = _cvt_q_tile(L)
    l_pad = _round_up(L, tl)
    if l_pad != L:
        q = jnp.pad(q, ((0, 0), (0, l_pad - L), (0, 0)))
    k = jnp.pad(k, ((0, 0), (0, s_pad - S), (0, 0)))
    v = jnp.pad(v, ((0, 0), (0, s_pad - S), (0, 0)))

    out = pl.pallas_call(
        functools.partial(
            _cvt_attn_kernel, num_heads=num_heads, scale=scale, s_real=S
        ),
        grid=(Bt, l_pad // tl),
        in_specs=[
            pl.BlockSpec((1, tl, C), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, s_pad, C), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, s_pad, C), lambda b, i: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, tl, C), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((Bt, l_pad, C), q.dtype),
        interpret=interpret,
    )(q, k, v)
    return out[:, :L] if l_pad != L else out
