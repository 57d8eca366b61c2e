"""Decomposed relative position embeddings for MViTv2 pooled attention.

Covers the behavior of reference `models/mvit.py:331-401`
(`resize_decomposed_rel_pos` + `add_decomposed_rel_pos`) with a TPU-first
formulation: all shapes are static per config, so the table interpolation is a
precomputed dense matmul (differentiable w.r.t. the learned table) and the
(q, k) relative-coordinate gather is a static-index take. The attention bias
add is three broadcast einsum terms fused by XLA — no materialized 8-D
intermediate beyond the attention logits themselves.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _interp_matrix(src_len: int, dst_len: int) -> np.ndarray:
    """(dst, src) matrix implementing torch F.interpolate(mode='linear',
    align_corners=False) used by the reference's rel-pos resize."""
    scale = src_len / dst_len
    coords = (np.arange(dst_len, dtype=np.float64) + 0.5) * scale - 0.5
    coords = np.clip(coords, 0.0, src_len - 1)
    lo = np.floor(coords).astype(np.int64)
    hi = np.minimum(lo + 1, src_len - 1)
    frac = coords - lo
    w = np.zeros((dst_len, src_len), dtype=np.float32)
    w[np.arange(dst_len), lo] += (1.0 - frac).astype(np.float32)
    w[np.arange(dst_len), hi] += frac.astype(np.float32)
    return w


@functools.lru_cache(maxsize=None)
def _rel_coords(q_size: int, k_size: int) -> np.ndarray:
    """Static (q, k) index grid into a length-(2*max(q,k)-1) rel-pos axis.

    When q and k sizes differ, coordinates are scaled by the long/short ratio
    exactly as the reference does (mvit.py:359-366)."""
    q_ratio = max(k_size / q_size, 1.0)
    k_ratio = max(q_size / k_size, 1.0)
    q_coords = np.arange(q_size)[:, None] * q_ratio
    k_coords = np.arange(k_size)[None, :] * k_ratio
    rel = (q_coords - k_coords) + (k_size - 1) * k_ratio
    return rel.astype(np.int64)  # trunc toward zero == .long() on non-negatives


def resize_rel_pos(rel_pos: jnp.ndarray, q_size: int, k_size: int) -> jnp.ndarray:
    """Return (q_size, k_size, C) table from a learned (L, C) table.

    Differentiable: interpolation is a fixed matmul, gather has static indices.
    """
    max_rel_dist = int(2 * max(q_size, k_size) - 1)
    L = rel_pos.shape[0]
    if L != max_rel_dist:
        m = jnp.asarray(_interp_matrix(L, max_rel_dist))
        resized = m @ rel_pos
    else:
        resized = rel_pos
    coords = jnp.asarray(_rel_coords(q_size, k_size))
    return resized[coords]


def add_decomposed_rel_pos(
    attn: jnp.ndarray,
    q: jnp.ndarray,
    q_shape: tuple,
    k_shape: tuple,
    rel_pos_t: jnp.ndarray,
    rel_pos_h: jnp.ndarray,
    rel_pos_w: jnp.ndarray,
    with_cls_token: bool = True,
) -> jnp.ndarray:
    """Add decomposed (T, H, W) relative-position bias to attention logits.

    attn: (B, heads, Lq, Lk) where Lq = qt*qh*qw (+1 cls), same for Lk.
    q:    (B, heads, Lq, C_head).
    Cls-token rows/cols (index 0) receive no bias, matching the reference.
    """
    sp = 1 if with_cls_token else 0
    qt, qh, qw = q_shape
    kt, kh, kw = k_shape
    B, H, _, C = q.shape

    Rt = resize_rel_pos(rel_pos_t, qt, kt)  # (qt, kt, C)
    Rh = resize_rel_pos(rel_pos_h, qh, kh)  # (qh, kh, C)
    Rw = resize_rel_pos(rel_pos_w, qw, kw)  # (qw, kw, C)

    r_q = q[:, :, sp:].reshape(B, H, qt, qh, qw, C)
    # (B,H,qt,qh,qw,k*) biases
    rel_t = jnp.einsum("bythwc,tkc->bythwk", r_q, Rt)
    rel_h = jnp.einsum("bythwc,hkc->bythwk", r_q, Rh)
    rel_w = jnp.einsum("bythwc,wkc->bythwk", r_q, Rw)

    bias = (
        rel_t[..., :, None, None]
        + rel_h[..., None, :, None]
        + rel_w[..., None, None, :]
    ).reshape(B, H, qt * qh * qw, kt * kh * kw)

    if sp:
        attn = attn.at[:, :, sp:, sp:].add(bias)
    else:
        attn = attn + bias
    return attn
