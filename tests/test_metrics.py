"""Metric tests: hand-computed small maps + numpy/device cross-checks."""

import jax.numpy as jnp
import numpy as np

from diff_sal_tpu.metrics import AUC_Borji, AUC_Judd, AUC_shuffled, CC, NSS, SIM
from diff_sal_tpu.metrics.device import auc_judd, cc_maps, nss_fix, sim_maps


def test_auc_judd_perfect_predictor():
    s = np.zeros((10, 10))
    f = np.zeros((10, 10))
    s[4:6, 4:6] = 1.0
    f[4:6, 4:6] = 1.0
    assert AUC_Judd(s, f, jitter=False) > 0.97


def test_auc_judd_chance_level():
    rng = np.random.RandomState(0)
    s = rng.rand(64, 64)
    f = (rng.rand(64, 64) < 0.05).astype(float)
    v = AUC_Judd(s, f, rng=np.random.RandomState(1))
    assert 0.4 < v < 0.6


def test_auc_judd_inverted_predictor():
    rng = np.random.RandomState(2)
    f = (rng.rand(32, 32) < 0.1).astype(float)
    s = 1.0 - f  # anti-predictive
    assert AUC_Judd(s, f, jitter=False) < 0.1


def test_auc_judd_no_fixations_nan():
    assert np.isnan(AUC_Judd(np.random.rand(8, 8), np.zeros((8, 8))))


def test_device_auc_matches_numpy():
    rng = np.random.RandomState(3)
    B = 4
    s = rng.rand(B, 24, 24).astype(np.float32)
    f = (rng.rand(B, 24, 24) < 0.08).astype(np.float32)
    dev = np.asarray(auc_judd(jnp.asarray(s), jnp.asarray(f)))
    host = np.array(
        [AUC_Judd(s[i], f[i], rng=np.random.RandomState(7)) for i in range(B)]
    )
    # jitter changes the host value in the ~1e-3 range at this size
    np.testing.assert_allclose(dev, host, atol=5e-3)


def test_device_nss_cc_sim_match_numpy():
    rng = np.random.RandomState(4)
    B = 3
    s = rng.rand(B, 20, 20).astype(np.float32)
    g = rng.rand(B, 20, 20).astype(np.float32)
    f = (rng.rand(B, 20, 20) < 0.1).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(nss_fix(jnp.asarray(s), jnp.asarray(f))),
        [NSS(s[i], f[i]) for i in range(B)],
        rtol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(cc_maps(jnp.asarray(s), jnp.asarray(g))),
        [CC(s[i], g[i]) for i in range(B)],
        rtol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(sim_maps(jnp.asarray(s), jnp.asarray(g))),
        [SIM(s[i], g[i]) for i in range(B)],
        rtol=1e-4,
    )


def test_cc_sim_extremes():
    a = np.random.RandomState(5).rand(16, 16)
    assert CC(a, a) > 0.9999
    assert abs(SIM(a, a) - 1.0) < 1e-9
    assert CC(a, 1 - a) < -0.9999


def test_auc_borji_and_shuffled_run():
    rng = np.random.RandomState(6)
    f = (rng.rand(32, 32) < 0.08).astype(float)
    s = f + rng.rand(32, 32) * 0.3
    other = (rng.rand(32, 32) < 0.2).astype(float)
    b = AUC_Borji(s, f, n_rep=20, rng=np.random.RandomState(8))
    sh = AUC_shuffled(s, f, other, n_rep=20, rng=np.random.RandomState(9))
    assert 0.8 < b <= 1.0
    assert 0.5 < sh <= 1.0


def test_nss_hand_computed():
    s = np.array([[0.0, 1.0], [0.0, 1.0]])
    f = np.array([[0.0, 1.0], [0.0, 0.0]])
    # standardized: mean 0.5, std 0.5 -> values ±1; fixation at a +1 spot
    np.testing.assert_allclose(NSS(s, f), 1.0)
