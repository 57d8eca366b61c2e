"""Sampler correctness: DDIM/DDPM scans against hand-rolled numpy loops
implementing the reference equations (diffusion_trainer.py:439-543)."""

import jax
import jax.numpy as jnp
import numpy as np

from diff_sal_tpu.diffusion.sampling import ddim_sample, ddim_timesteps, ddpm_sample
from diff_sal_tpu.diffusion.schedule import make_schedule


def test_ddim_timesteps_nfe1():
    assert ddim_timesteps(1000, 1) == [(0, -1)]


def test_ddim_timesteps_multi():
    pairs = ddim_timesteps(1000, 4)
    assert pairs == [(750, 500), (500, 250), (250, 0), (0, -1)]


def test_ddim_nfe1_returns_model_output_at_t0():
    sch = make_schedule("cosine", num_diffusion_timesteps=1000)
    target = jnp.full((2, 8, 8, 1), 0.3)
    calls = []

    def denoise_fn(x, t_vec):
        calls.append(np.asarray(t_vec))
        return target

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 1))
    out = ddim_sample(sch, denoise_fn, x, timesteps=1, eta=0.0)
    np.testing.assert_allclose(np.asarray(out), 0.3, atol=1e-6)
    assert len(calls) == 1 and (calls[0] == 0).all()


def _numpy_ddim(sch_np, denoise, x, timesteps, eta=0.0):
    """Direct transcription of the reference DDIM update equations."""
    T = len(sch_np["alphas_hat"])
    skip = T // timesteps
    seq = list(range(0, T, skip))
    seq_next = [-1] + seq[:-1]
    ah = sch_np["alphas_hat"]
    for time, time_next in zip(reversed(seq), reversed(seq_next)):
        x_start = denoise(x, time)
        pred_noise = (x / np.sqrt(ah[time]) - x_start) / np.sqrt(
            1.0 / ah[time] - 1.0
        )
        if time_next < 0:
            x = x_start
            continue
        alpha, alpha_next = ah[time], ah[time_next]
        c1 = eta * np.sqrt((1 - alpha / alpha_next) * (1 - alpha_next) / (1 - alpha))
        c2 = np.sqrt((1 - alpha_next) - c1**2)
        x = np.sqrt(ah[time_next]) * x_start + c2 * pred_noise
    return x


def test_ddim_multistep_matches_reference_equations():
    sch = make_schedule("cosine", num_diffusion_timesteps=100)
    sch_np = {"alphas_hat": np.asarray(sch.alphas_hat)}

    # Linear "denoiser": x0_hat = 0.5 * x_t + 0.1
    def denoise_jax(x, t_vec):
        return 0.5 * x + 0.1

    def denoise_np(x, t):
        return 0.5 * x + 0.1

    x0 = np.random.RandomState(0).randn(2, 4, 4, 1).astype(np.float32)
    got = np.asarray(
        ddim_sample(sch, denoise_jax, jnp.asarray(x0), timesteps=5, eta=0.0)
    )
    want = _numpy_ddim(sch_np, denoise_np, x0.copy(), timesteps=5)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-5)


def test_ddpm_full_chain_shape_and_determinism_at_zero_noise():
    sch = make_schedule("linear", num_diffusion_timesteps=10)

    def denoise_fn(x, t_vec):
        return jnp.zeros_like(x)  # x0_hat == 0

    x = jnp.ones((1, 4, 4, 1))
    out = ddpm_sample(sch, denoise_fn, x, rng=jax.random.PRNGKey(0))
    assert out.shape == (1, 4, 4, 1)
    # Last step (t=0) adds no noise and with x0_hat=0 the posterior mean at
    # t=0 shrinks towards 0.
    assert np.abs(np.asarray(out)).mean() < 5.0


def test_ddpm_matches_reference_posterior_mean_single_step():
    sch = make_schedule("linear", num_diffusion_timesteps=1)

    def denoise_fn(x, t_vec):
        return jnp.full_like(x, 0.25)

    x = jnp.ones((1, 2, 2, 1)) * 2.0
    out = np.asarray(ddpm_sample(sch, denoise_fn, x, rng=jax.random.PRNGKey(0)))
    c1 = float(sch.posterior_mean_coef1[0])
    c2 = float(sch.posterior_mean_coef2[0])
    np.testing.assert_allclose(out, c1 * 0.25 + c2 * 2.0, rtol=1e-5)


def test_ddim_scan_path_matches_unrolled():
    """timesteps > 8 uses lax.scan with traced coefficients; it must agree
    with the host-float unrolled path (same equations)."""
    sch = make_schedule("cosine", num_diffusion_timesteps=160)

    def denoise_fn(x, t_vec):
        return 0.7 * x + 0.05

    x0 = jnp.asarray(
        np.random.RandomState(5).randn(1, 4, 4, 1).astype(np.float32)
    )
    # 16 steps -> scan; compute the same chain manually via the unrolled
    # equations using the module's own step math at 8-step granularity is not
    # equivalent, so compare directly against the numpy transcription:
    got = np.asarray(ddim_sample(sch, denoise_fn, x0, timesteps=16, eta=0.0))
    sch_np = {"alphas_hat": np.asarray(sch.alphas_hat)}

    def denoise_np(x, t):
        return 0.7 * x + 0.05

    want = _numpy_ddim(sch_np, denoise_np, np.asarray(x0).copy(), timesteps=16)
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=1e-5)
