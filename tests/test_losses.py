"""Loss/metric parity against direct torch transcriptions of the reference
formulas (unbiased std, eps constants, normalization order)."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from diff_sal_tpu.config import LossConfig
from diff_sal_tpu.train import losses


def _rand_maps(B=3, H=16, W=24, seed=0, positive=False):
    rng = np.random.RandomState(seed)
    a = rng.rand(B, H, W, 1).astype(np.float32)
    b = rng.rand(B, H, W, 1).astype(np.float32)
    if positive:
        a += 0.01
        b += 0.01
    return a, b


def _t(x):  # (B,H,W,1) -> torch (B,1,H,W)
    return torch.from_numpy(x).permute(0, 3, 1, 2)


def torch_nss(s_map, gt):
    b = s_map.size(0)
    m = s_map.view(b, -1).mean(1).view(b, 1, 1, 1)
    s = s_map.view(b, -1).std(1).view(b, 1, 1, 1)
    eps = 2.2204e-16
    sm = (s_map - m) / (s + eps)
    num = (sm * gt).view(b, -1).sum(1)
    cnt = gt.view(b, -1).sum(1)
    return (num / cnt).mean()


def torch_cc(s_map, gt):
    b = s_map.size(0)
    norm = lambda x: (  # noqa: E731
        x - x.view(b, -1).mean(1).view(b, 1, 1, 1)
    ) / x.view(b, -1).std(1).view(b, 1, 1, 1)
    s, g = norm(s_map), norm(gt)
    ab = (s * g).view(b, -1).sum(1)
    aa = (s * s).view(b, -1).sum(1)
    bb = (g * g).view(b, -1).sum(1)
    return (ab / torch.sqrt(aa * bb)).mean()


def torch_kldiv(s_map, gt):
    b = s_map.size(0)
    s = s_map / s_map.view(b, -1).sum(1).view(b, 1, 1, 1)
    g = gt / gt.view(b, -1).sum(1).view(b, 1, 1, 1)
    eps = torch.tensor(2.2204e-16)
    return (g * torch.log(eps + g / (s + eps))).view(b, -1).sum(1).mean()


def torch_sim(s_map, gt):
    b = s_map.size(0)

    def mm(x):
        mn = x.view(b, -1).min(1)[0].view(b, 1, 1, 1)
        mx = x.view(b, -1).max(1)[0].view(b, 1, 1, 1)
        return (x - mn) / (mx - mn)

    s, g = mm(s_map), mm(gt)
    s = s / s.view(b, -1).sum(1).view(b, 1, 1, 1)
    g = g / g.view(b, -1).sum(1).view(b, 1, 1, 1)
    return torch.min(s.view(b, -1), g.view(b, -1)).sum(1).mean()


@pytest.mark.parametrize(
    "ours,ref",
    [
        (losses.nss, torch_nss),
        (losses.cc, torch_cc),
        (losses.kldiv, torch_kldiv),
        (losses.similarity, torch_sim),
    ],
    ids=["nss", "cc", "kldiv", "sim"],
)
def test_metric_parity(ours, ref):
    a, b = _rand_maps(positive=True)
    got = float(ours(jnp.asarray(a), jnp.asarray(b)))
    want = float(ref(_t(a), _t(b)))
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_mse_matches_reference_reduction():
    a, b = _rand_maps()
    got = float(losses.mse_loss(jnp.asarray(a), jnp.asarray(b)))
    want = float(((_t(a) - _t(b)) ** 2).sum(dim=(1, 2, 3)).mean())
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_training_loss_default_is_mse_only():
    cfg = LossConfig()
    a, b = _rand_maps()
    out = losses.training_loss(cfg, jnp.asarray(a), jnp.asarray(b))
    np.testing.assert_allclose(
        float(out["total"]), float(losses.mse_loss(jnp.asarray(a), jnp.asarray(b)))
    )
    assert float(out["cc"]) == 0.0 and float(out["nss"]) == 0.0


def test_eval_scores_total():
    a, b = _rand_maps(positive=True)
    s = losses.eval_scores(jnp.asarray(a), jnp.asarray(b))
    np.testing.assert_allclose(
        float(s["total"]), float(s["nss"] + s["cc"] + s["sim"]), rtol=1e-6
    )


def test_perfect_prediction_scores():
    a, _ = _rand_maps(positive=True)
    s = losses.eval_scores(jnp.asarray(a), jnp.asarray(a))
    np.testing.assert_allclose(float(s["cc"]), 1.0, atol=1e-5)
    np.testing.assert_allclose(float(s["sim"]), 1.0, atol=1e-5)
    np.testing.assert_allclose(float(s["kl"]), 0.0, atol=1e-5)


def test_eval_scores_mask_excludes_padding():
    from diff_sal_tpu.train.losses import eval_scores

    """eval_scores with a validity mask over a padded batch equals the
    unpadded scores (Loader pad_last duplicates must not count twice)."""
    rng = np.random.RandomState(0)
    pred = rng.rand(3, 8, 12, 1).astype(np.float32)
    gt = rng.rand(3, 8, 12, 1).astype(np.float32) + 0.01
    padded_pred = np.concatenate([pred, pred[-1:]], axis=0)
    padded_gt = np.concatenate([gt, gt[-1:]], axis=0)
    mask = jnp.asarray([1.0, 1.0, 1.0, 0.0])

    want = eval_scores(jnp.asarray(pred), jnp.asarray(gt))
    got = eval_scores(jnp.asarray(padded_pred), jnp.asarray(padded_gt), mask)
    for k in want:
        np.testing.assert_allclose(float(got[k]), float(want[k]), rtol=1e-5)
    # without the mask the duplicate skews the average
    skewed = eval_scores(jnp.asarray(padded_pred), jnp.asarray(padded_gt))
    assert abs(float(skewed["total"]) - float(want["total"])) > 1e-6
