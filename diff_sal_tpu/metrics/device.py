"""On-device (jnp) batched saliency metrics.

TPU formulations of the numpy metrics in `saliency.py` for in-training
evaluation without host round-trips. The AUC-Judd threshold sweep is
rank-based: with the reference's own tie-breaking jitter, the trapezoidal
AUC equals the Mann-Whitney statistic
  AUC = P(S[fix] > S[non-fix])   (ties at 1/2)
computed here from average ranks via double argsort — one `jnp.sort`
pipeline instead of an O(n_fix * n_pixels) loop (SURVEY.md §7.3).

Fixation maps are dense binary masks (possibly padded); every function is
batched over the leading axis and jit/vmap-safe with static shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _flat(x):
    return x.reshape(x.shape[0], -1)


def auc_judd(saliency: jnp.ndarray, fixations: jnp.ndarray) -> jnp.ndarray:
    """Batched AUC-Judd with the reference's exact trapezoid semantics
    (thresholds at fixation saliencies, trapz over the (fp, tp) polyline —
    including its +0.5*dtp*dfp per-segment half-credit relative to the plain
    Mann-Whitney statistic).

    saliency (B, ...), fixations (B, ...) binary; returns (B,), NaN where a
    sample has no fixations. Ties are handled by average ranks (the
    reference disambiguates ties with 1e-7 jitter instead).
    """
    S = _flat(saliency).astype(jnp.float32)
    F = _flat(fixations) > 0.5
    n = S.shape[1]

    order = jnp.argsort(S, axis=1)
    inv_order = jnp.argsort(order, axis=1)
    S_sorted = jnp.take_along_axis(S, order, axis=1)

    def tie_avg(s_sorted):
        lo = jnp.searchsorted(s_sorted, s_sorted, side="left")
        hi = jnp.searchsorted(s_sorted, s_sorted, side="right")
        return (lo + hi - 1) / 2.0  # average 0-based ascending rank

    avg_rank_sorted = jax.vmap(tie_avg)(S_sorted)
    avg_rank = jnp.take_along_axis(avg_rank_sorted, inv_order, axis=1)

    n_fix = jnp.sum(F, axis=1, keepdims=True).astype(jnp.float32)
    n_neg = n - n_fix

    # fixation ranks, descending; non-fixations pushed to -inf
    fix_ranks = jnp.where(F, avg_rank, -jnp.inf)
    rd = -jnp.sort(-fix_ranks, axis=1)  # (B, n) descending

    k = jnp.arange(1, n + 1, dtype=jnp.float32)[None, :]  # 1-based
    valid = k <= n_fix
    above = n - rd  # |{S >= s_k}| for distinct values
    tp_mid = jnp.where(valid, k / n_fix, 1.0)
    fp_mid = jnp.where(valid, (above - k) / n_neg, 1.0)

    # polyline: (0,0), midpoints, (1,1)
    zeros = jnp.zeros((S.shape[0], 1), jnp.float32)
    ones = jnp.ones((S.shape[0], 1), jnp.float32)
    tp = jnp.concatenate([zeros, tp_mid, ones], axis=1)
    fp = jnp.concatenate([zeros, fp_mid, ones], axis=1)
    auc = jnp.sum(
        0.5 * (tp[:, 1:] + tp[:, :-1]) * (fp[:, 1:] - fp[:, :-1]), axis=1
    )
    return jnp.where(n_fix[:, 0] > 0, auc, jnp.nan)


def nss_fix(saliency: jnp.ndarray, fixations: jnp.ndarray) -> jnp.ndarray:
    """Batched fixation-based NSS (zero-mean unit-std map, mean at
    fixations)."""
    S = _flat(saliency).astype(jnp.float32)
    F = _flat(fixations) > 0.5
    mean = S.mean(axis=1, keepdims=True)
    std = S.std(axis=1, keepdims=True)
    Z = (S - mean) / std
    n_fix = jnp.sum(F, axis=1)
    val = jnp.sum(jnp.where(F, Z, 0.0), axis=1) / n_fix
    return jnp.where(n_fix > 0, val, jnp.nan)


def cc_maps(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched Pearson correlation between two maps, (B,) output."""
    A, B = _flat(a), _flat(b)
    A = A - A.mean(axis=1, keepdims=True)
    B = B - B.mean(axis=1, keepdims=True)
    num = jnp.sum(A * B, axis=1)
    den = jnp.sqrt(jnp.sum(A * A, axis=1) * jnp.sum(B * B, axis=1))
    return num / den


def sim_maps(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched histogram intersection after range+sum normalization."""
    def prep(x):
        x = _flat(x)
        mn = x.min(axis=1, keepdims=True)
        mx = x.max(axis=1, keepdims=True)
        x = (x - mn) / (mx - mn)
        return x / jnp.sum(x, axis=1, keepdims=True)

    return jnp.sum(jnp.minimum(prep(a), prep(b)), axis=1)
