"""Golden-value tests for beta schedules and the coefficient tables.

Analytic spot checks plus invariants; the cosine schedule is additionally
checked against directly-computed alpha-bar values.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from diff_sal_tpu.diffusion.schedule import (
    DiffusionSchedule,
    get_beta_schedule,
    make_schedule,
    predict_noise_from_start,
    predict_start_from_noise,
    q_sample,
)


def test_linear_schedule_endpoints():
    betas = get_beta_schedule(
        "linear", beta_start=1e-4, beta_end=0.02, num_diffusion_timesteps=1000
    )
    assert betas[0] == pytest.approx(1e-4)
    assert betas[-1] == pytest.approx(0.02)
    assert np.all(np.diff(betas) > 0)


def test_quad_schedule():
    betas = get_beta_schedule(
        "quad", beta_start=1e-4, beta_end=0.02, num_diffusion_timesteps=10
    )
    expect = np.linspace(1e-2, 0.02**0.5, 10) ** 2
    np.testing.assert_allclose(betas, expect, rtol=1e-12)


def test_jsd_schedule():
    betas = get_beta_schedule(
        "jsd", beta_start=0, beta_end=0, num_diffusion_timesteps=4
    )
    np.testing.assert_allclose(betas, [1 / 4, 1 / 3, 1 / 2, 1.0], rtol=1e-12)


def test_cosine_schedule_golden():
    T = 1000
    betas = get_beta_schedule(
        "cosine", beta_start=1e-4, beta_end=0.02, num_diffusion_timesteps=T
    )
    # Recompute from the alpha-bar definition with the reference's exact grid.
    steps = T + 1
    s = 0.008
    x = np.linspace(0, steps, steps)
    ab = np.cos(((x / steps) + s) / (1 + s) * np.pi * 0.5) ** 2
    ab = ab / ab[0]
    expect = np.clip(1 - ab[1:] / ab[:-1], 0, 0.999)
    np.testing.assert_allclose(betas, expect, rtol=1e-12)
    assert betas.max() <= 0.999
    assert 0 < betas[0] < 1e-4  # cosine starts tiny


def test_schedule_tables_consistency():
    sch = make_schedule("cosine", num_diffusion_timesteps=100)
    assert isinstance(sch, DiffusionSchedule)
    assert sch.num_timesteps == 100
    a_hat = np.asarray(sch.alphas_hat)
    np.testing.assert_allclose(
        np.asarray(sch.sqrt_alphas_hat) ** 2, a_hat, rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(sch.sqrt_one_minus_alphas_hat) ** 2, 1 - a_hat, rtol=1e-5
    )
    assert np.asarray(sch.alphas_hat_prev)[0] == 1.0
    np.testing.assert_allclose(
        np.asarray(sch.alphas_hat_prev)[1:], a_hat[:-1], rtol=1e-7
    )
    # posterior mean coefficients sum: coef1 + coef2*sqrt(abar_t/abar_{t-1}) ~ relation holds
    assert np.all(np.asarray(sch.posterior_variance) >= 0)


def test_q_sample_analytic():
    sch = make_schedule("linear", num_diffusion_timesteps=10)
    x0 = jnp.ones((2, 1, 4, 4))
    noise = jnp.full((2, 1, 4, 4), 2.0)
    t = 3
    got = q_sample(sch, x0, t, noise)
    a = float(sch.sqrt_alphas_hat[t])
    b = float(sch.sqrt_one_minus_alphas_hat[t])
    np.testing.assert_allclose(np.asarray(got), a * 1.0 + b * 2.0, rtol=1e-6)


def test_q_sample_per_sample_t():
    sch = make_schedule("linear", num_diffusion_timesteps=10)
    x0 = jnp.ones((3, 1, 2, 2))
    noise = jnp.zeros_like(x0)
    t = jnp.array([0, 5, 9])
    got = np.asarray(q_sample(sch, x0, t, noise))
    for i, ti in enumerate([0, 5, 9]):
        np.testing.assert_allclose(
            got[i], float(sch.sqrt_alphas_hat[ti]), rtol=1e-6
        )


def test_noise_start_roundtrip():
    sch = make_schedule("cosine", num_diffusion_timesteps=50)
    rng = np.random.RandomState(0)
    x0 = jnp.asarray(rng.randn(2, 1, 8, 8).astype(np.float32))
    noise = jnp.asarray(rng.randn(2, 1, 8, 8).astype(np.float32))
    t = 17
    x_t = q_sample(sch, x0, t, noise)
    eps = predict_noise_from_start(sch, x_t, t, x0)
    np.testing.assert_allclose(np.asarray(eps), np.asarray(noise), atol=1e-4)
    x0_rec = predict_start_from_noise(sch, x_t, t, noise)
    np.testing.assert_allclose(np.asarray(x0_rec), np.asarray(x0), atol=1e-4)


def test_matches_reference_float32_cast_order():
    # The reference casts betas to float32 *before* deriving tables; a
    # float64-derived table would differ in the last ulps. Guard the order.
    sch = make_schedule("cosine", num_diffusion_timesteps=1000)
    betas32 = get_beta_schedule(
        "cosine", beta_start=1e-4, beta_end=0.02, num_diffusion_timesteps=1000
    ).astype(np.float32)
    a_hat32 = np.cumprod(1.0 - betas32)
    np.testing.assert_array_equal(np.asarray(sch.alphas_hat), a_hat32)
