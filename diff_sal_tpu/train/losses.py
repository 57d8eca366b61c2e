"""Saliency losses and eval scores (jnp, fully batched).

Mirrors reference `models/sal_losses.py`: MSE (the default training loss,
:189-192), KL-divergence (:103-128), Pearson CC (:66-100), histogram
similarity (:151-176), NSS (:14-35), and the two aggregators `get_lossv2`
(weighted training loss) and the unweighted eval score whose
`total = nss + cc + sim` drives best-checkpoint selection (:207-233).

All functions accept (B, ...) maps (any trailing layout; internally flattened
per sample). Variance uses ddof=1 to match torch.std's unbiased default.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp

from diff_sal_tpu.config import LossConfig

EPS = 2.2204e-16


def _flat(x: jnp.ndarray) -> jnp.ndarray:
    return x.reshape(x.shape[0], -1)


def _std(x: jnp.ndarray, axis=-1, keepdims=False) -> jnp.ndarray:
    return jnp.std(x, axis=axis, ddof=1, keepdims=keepdims)


def mse_loss(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """Sum-over-pixels, mean-over-batch squared error
    (reference sal_losses.py:189-192)."""
    return jnp.mean(jnp.sum(_flat((pred - gt) ** 2), axis=1))


def nss(pred: jnp.ndarray, gt: jnp.ndarray, reduce: bool = True) -> jnp.ndarray:
    """Normalized Scanpath Saliency against the (continuous) gt map, exactly
    as the reference computes it (sal_losses.py:14-35)."""
    p, g = _flat(pred), _flat(gt)
    p = (p - p.mean(axis=1, keepdims=True)) / (_std(p, keepdims=True) + EPS)
    num = jnp.sum(p * g, axis=1)
    cnt = jnp.sum(g, axis=1)
    v = num / cnt
    return jnp.mean(v) if reduce else v


def cc(pred: jnp.ndarray, gt: jnp.ndarray, reduce: bool = True) -> jnp.ndarray:
    """Pearson correlation (sal_losses.py:66-100)."""
    p, g = _flat(pred), _flat(gt)
    p = (p - p.mean(axis=1, keepdims=True)) / _std(p, keepdims=True)
    g = (g - g.mean(axis=1, keepdims=True)) / _std(g, keepdims=True)
    ab = jnp.sum(p * g, axis=1)
    aa = jnp.sum(p * p, axis=1)
    bb = jnp.sum(g * g, axis=1)
    v = ab / jnp.sqrt(aa * bb)
    return jnp.mean(v) if reduce else v


def kldiv(pred: jnp.ndarray, gt: jnp.ndarray, reduce: bool = True) -> jnp.ndarray:
    """KL divergence between sum-normalized maps (sal_losses.py:103-128)."""
    p, g = _flat(pred), _flat(gt)
    p = p / jnp.sum(p, axis=1, keepdims=True)
    g = g / jnp.sum(g, axis=1, keepdims=True)
    v = jnp.sum(g * jnp.log(EPS + g / (p + EPS)), axis=1)
    return jnp.mean(v) if reduce else v


def _minmax_norm(x: jnp.ndarray) -> jnp.ndarray:
    mn = x.min(axis=1, keepdims=True)
    mx = x.max(axis=1, keepdims=True)
    return (x - mn) / (mx - mn)


def similarity(pred: jnp.ndarray, gt: jnp.ndarray, reduce: bool = True) -> jnp.ndarray:
    """Histogram intersection after min-max + sum normalization
    (sal_losses.py:151-176)."""
    p, g = _minmax_norm(_flat(pred)), _minmax_norm(_flat(gt))
    p = p / jnp.sum(p, axis=1, keepdims=True)
    g = g / jnp.sum(g, axis=1, keepdims=True)
    v = jnp.sum(jnp.minimum(p, g), axis=1)
    return jnp.mean(v) if reduce else v


def bce_loss(pred_logits: jnp.ndarray, label: jnp.ndarray, weights) -> jnp.ndarray:
    """Weighted per-sample binary cross-entropy on logits with labels scaled
    by 1/255 (reference `cross_entropy_loss`, sal_losses.py:48-63)."""
    p, l = _flat(pred_logits), _flat(label) / 255.0
    per_el = jnp.maximum(p, 0) - p * l + jnp.log1p(jnp.exp(-jnp.abs(p)))
    per_sample = jnp.sum(per_el, axis=1) * weights
    return jnp.sum(per_sample)


def training_loss(
    cfg: LossConfig, pred: jnp.ndarray, gt: jnp.ndarray
) -> Dict[str, jnp.ndarray]:
    """Weighted train loss (reference `get_lossv2`/`get_kl_cc_sim_loss`,
    sal_losses.py:179-259). Default config: MSE only."""
    zero = jnp.zeros(())
    main = zero
    if cfg.loss_kl:
        main = cfg.kl_weight * kldiv(pred, gt)
    elif cfg.loss_ce:
        main = bce_loss(pred, gt, cfg.ce_weight)
    elif cfg.loss_mse:
        main = cfg.mse_weight * mse_loss(pred, gt)
    cc_l = cfg.cc_weight * cc(pred, gt) if cfg.loss_cc else zero
    sim_l = cfg.sim_weight * similarity(pred, gt) if cfg.loss_sim else zero
    nss_l = cfg.nss_weight * nss(pred, gt) if cfg.loss_nss else zero
    total = main + cc_l + sim_l + nss_l
    return {"total": total, "main": main, "cc": cc_l, "sim": sim_l, "nss": nss_l}


def _masked_mean(v: jnp.ndarray, mask) -> jnp.ndarray:
    """Mean over the batch axis, optionally weighted by a (B,) validity
    mask — padded duplicate samples (Loader pad_last) must not count."""
    if mask is None:
        return jnp.mean(v)
    m = mask.astype(v.dtype)
    return jnp.sum(v * m) / jnp.maximum(jnp.sum(m), 1.0)


def eval_scores(
    pred: jnp.ndarray, gt: jnp.ndarray, mask=None
) -> Dict[str, jnp.ndarray]:
    """Unweighted eval metrics; `total = nss + cc + sim` is the
    model-selection score, maximized (reference sal_losses.py:207-233 +
    diffusion_trainer.py:276-280 — the reference names it `min_loss` but
    compares with `>`; we keep the max-score semantics). `mask` (B,)
    excludes batch-padding duplicates from the averages."""
    cc_v = _masked_mean(cc(pred, gt, reduce=False), mask)
    sim_v = _masked_mean(similarity(pred, gt, reduce=False), mask)
    nss_v = _masked_mean(nss(pred, gt, reduce=False), mask)
    return {
        "total": nss_v + cc_v + sim_v,
        "kl": _masked_mean(kldiv(pred, gt, reduce=False), mask),
        "cc": cc_v,
        "sim": sim_v,
        "nss": nss_v,
    }
