"""Beta schedules and precomputed diffusion coefficient tables.

Mirrors the behavior of the reference's schedule factory
(`models/diffusion_decoder/diffusion_utils.py:5-45`) and the derived tables
built in `DiffusionTrainer.__init__` (`diffusion_trainer.py:46-76`), but as a
pure `NamedTuple` of arrays passed explicitly to jitted functions — no object
state, no device side effects. Tables are computed in float64 numpy and cast
to float32 exactly like the reference (`to_torch`, diffusion_utils.py:67-68).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


def get_beta_schedule(
    beta_schedule: str,
    *,
    beta_start: float,
    beta_end: float,
    num_diffusion_timesteps: int,
) -> np.ndarray:
    """Return betas of shape (T,) in float64.

    Supported: quad / linear / const / jsd / sigmoid / cosine (default config
    uses cosine — the Nichol & Dhariwal alpha-bar cosine with clip <= 0.999).
    """
    T = num_diffusion_timesteps
    if beta_schedule == "quad":
        betas = np.linspace(beta_start**0.5, beta_end**0.5, T, dtype=np.float64) ** 2
    elif beta_schedule == "linear":
        betas = np.linspace(beta_start, beta_end, T, dtype=np.float64)
    elif beta_schedule == "const":
        betas = beta_end * np.ones(T, dtype=np.float64)
    elif beta_schedule == "jsd":
        # 1/T, 1/(T-1), ..., 1
        betas = 1.0 / np.linspace(T, 1, T, dtype=np.float64)
    elif beta_schedule == "sigmoid":
        x = np.linspace(-6, 6, T)
        betas = 1.0 / (1.0 + np.exp(-x)) * (beta_end - beta_start) + beta_start
    elif beta_schedule == "cosine":
        # alpha-bar cosine schedule; note the reference evaluates the cosine on
        # linspace(0, T+1, T+1) (i.e. a step of (T+1)/T), which we match.
        steps = T + 1
        s = 0.008
        x = np.linspace(0, steps, steps)
        alphas_cumprod = np.cos(((x / steps) + s) / (1 + s) * np.pi * 0.5) ** 2
        alphas_cumprod = alphas_cumprod / alphas_cumprod[0]
        betas = 1.0 - (alphas_cumprod[1:] / alphas_cumprod[:-1])
        betas = np.clip(betas, 0, 0.999)
    else:
        raise NotImplementedError(beta_schedule)
    assert betas.shape == (T,)
    return betas


class DiffusionSchedule(NamedTuple):
    """All per-timestep coefficient tables, each shape (T,), float32.

    Field names follow the quantities in `diffusion_trainer.py:46-76`.
    """

    betas: jnp.ndarray
    alphas_hat: jnp.ndarray  # cumprod of (1 - beta)
    alphas_hat_prev: jnp.ndarray  # shifted, alphas_hat_prev[0] = 1
    sqrt_alphas_hat: jnp.ndarray
    sqrt_one_minus_alphas_hat: jnp.ndarray
    log_one_minus_alphas_hat: jnp.ndarray
    sqrt_recip_alphas_hat: jnp.ndarray
    sqrt_recipm1_alphas_hat: jnp.ndarray
    posterior_variance: jnp.ndarray
    posterior_log_variance_clipped: jnp.ndarray
    posterior_mean_coef1: jnp.ndarray
    posterior_mean_coef2: jnp.ndarray

    @property
    def num_timesteps(self) -> int:
        return self.betas.shape[0]


def make_schedule(
    beta_schedule: str = "cosine",
    beta_start: float = 0.0001,
    beta_end: float = 0.02,
    num_diffusion_timesteps: int = 1000,
) -> DiffusionSchedule:
    """Build the full coefficient table set.

    Matches the reference numerically: betas are float64 during derivation of
    nothing (the reference casts to float32 *before* deriving the tables via
    `to_torch(betas)`, diffusion_trainer.py:53), so we also cast first and
    derive in float32.
    """
    betas64 = get_beta_schedule(
        beta_schedule,
        beta_start=beta_start,
        beta_end=beta_end,
        num_diffusion_timesteps=num_diffusion_timesteps,
    )
    betas = betas64.astype(np.float32)
    alphas = 1.0 - betas
    alphas_hat = np.cumprod(alphas, axis=0)
    alphas_hat_prev = np.concatenate([np.ones(1, np.float32), alphas_hat[:-1]])
    posterior_variance = betas * (1.0 - alphas_hat_prev) / (1.0 - alphas_hat)
    return DiffusionSchedule(
        betas=jnp.asarray(betas),
        alphas_hat=jnp.asarray(alphas_hat),
        alphas_hat_prev=jnp.asarray(alphas_hat_prev),
        sqrt_alphas_hat=jnp.asarray(np.sqrt(alphas_hat)),
        sqrt_one_minus_alphas_hat=jnp.asarray(np.sqrt(1.0 - alphas_hat)),
        log_one_minus_alphas_hat=jnp.asarray(np.log(1.0 - alphas_hat)),
        sqrt_recip_alphas_hat=jnp.asarray(np.sqrt(1.0 / alphas_hat)),
        sqrt_recipm1_alphas_hat=jnp.asarray(np.sqrt(1.0 / alphas_hat - 1.0)),
        posterior_variance=jnp.asarray(posterior_variance),
        posterior_log_variance_clipped=jnp.asarray(
            np.log(np.maximum(posterior_variance, 1e-20))
        ),
        posterior_mean_coef1=jnp.asarray(
            betas * np.sqrt(alphas_hat) / (1.0 - alphas_hat)
        ),
        posterior_mean_coef2=jnp.asarray(
            (1.0 - alphas_hat_prev) * np.sqrt(alphas) / (1.0 - alphas_hat)
        ),
    )


def q_sample(
    schedule: DiffusionSchedule,
    x_start: jnp.ndarray,
    t: jnp.ndarray,
    noise: jnp.ndarray,
) -> jnp.ndarray:
    """Forward noising x_t = sqrt(a-bar_t) x0 + sqrt(1 - a-bar_t) eps.

    `t` may be a scalar or a (B,) vector (the reference uses one shared scalar
    per batch, `diffusion_trainer.py:111-115`; per-sample t is the standard
    improvement and works through the same code path).
    Mirrors `DiffusionTrainer.q_sample` (diffusion_trainer.py:122-137).
    """
    t = jnp.asarray(t)
    coef_shape = (-1,) + (1,) * (x_start.ndim - 1) if t.ndim else ()
    a = schedule.sqrt_alphas_hat[t].reshape(coef_shape)
    b = schedule.sqrt_one_minus_alphas_hat[t].reshape(coef_shape)
    return a * x_start + b * noise


def predict_noise_from_start(
    schedule: DiffusionSchedule, x_t: jnp.ndarray, t, x0: jnp.ndarray
) -> jnp.ndarray:
    """eps = (x_t / sqrt(a-bar) - x0) / sqrt(1/a-bar - 1)
    (reference diffusion_trainer.py:434-437)."""
    return (schedule.sqrt_recip_alphas_hat[t] * x_t - x0) / (
        schedule.sqrt_recipm1_alphas_hat[t]
    )


def predict_start_from_noise(
    schedule: DiffusionSchedule, x_t: jnp.ndarray, t, noise: jnp.ndarray
) -> jnp.ndarray:
    """x0 = x_t sqrt(1/a-bar) - eps sqrt(1/a-bar - 1)
    (reference diffusion_trainer.py:482-486)."""
    return (
        schedule.sqrt_recip_alphas_hat[t] * x_t
        - schedule.sqrt_recipm1_alphas_hat[t] * noise
    )
