"""DDIM / DDPM reverse-process samplers as `lax.scan` loops.

Covers reference `DiffusionTrainer.sample_ddim` (diffusion_trainer.py:439-480)
and `sample_ddpm`/`p_sample` (:482-543) with a functional denoiser closure
`denoise_fn(x, t_vec) -> prediction`. Conditioning features are computed once
outside and captured by the closure — the reference re-deep-copies its
feature list every step only because its decoder mutates it in place; that
cost does not exist here.

With the default config (timesteps=1, eta=0, x0-target) DDIM collapses to a
single denoiser call at t=0, NFE=1, exactly as the reference ships.

Quirk register (SURVEY.md §8): the reference's `clip_denoised` clamp is a
no-op (`x_recon.clamp(-1,1)` without assignment, diffusion_trainer.py:508-509)
— we default clip_denoised=False to match the effective behavior, with the
working clamp available behind the flag.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from diff_sal_tpu.diffusion.schedule import (
    DiffusionSchedule,
    predict_noise_from_start,
)

DenoiseFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]


def ddim_timesteps(num_timesteps: int, timesteps: int):
    """The reference's uniform skip sequence: range(0, T, T // steps), walked
    in reverse with predecessor pairs (seq_next = [-1] + seq[:-1])."""
    skip = num_timesteps // timesteps
    seq = list(range(0, num_timesteps, skip))
    seq_next = [-1] + seq[:-1]
    return list(zip(reversed(seq), reversed(seq_next)))


def ddim_sample(
    schedule: DiffusionSchedule,
    denoise_fn: DenoiseFn,
    x: jnp.ndarray,
    *,
    timesteps: int = 1,
    eta: float = 0.0,
    training_target: str = "x0",
    rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Generalized DDIM sampling (eta-parameterized)."""
    pairs = ddim_timesteps(schedule.num_timesteps, timesteps)
    if rng is None:
        rng = jax.random.PRNGKey(0)
    B = x.shape[0]

    def step(x, rng, time, time_next):
        """One DDIM update with traced scalar timesteps (scan body)."""
        t_vec = jnp.full((B,), time)
        alpha = schedule.alphas_hat[time]
        if training_target == "x0":
            x_start = denoise_fn(x, t_vec)
            pred_noise = predict_noise_from_start(schedule, x, time, x_start)
        else:
            pred_noise = denoise_fn(x, t_vec)
            x_start = (x - pred_noise * jnp.sqrt(1.0 - alpha)) / jnp.sqrt(alpha)

        safe_next = jnp.maximum(time_next, 0)
        alpha_next = schedule.alphas_hat[safe_next]
        c1 = eta * jnp.sqrt(
            (1 - alpha / alpha_next) * (1 - alpha_next) / (1 - alpha)
        )
        c2 = jnp.sqrt(jnp.maximum((1 - alpha_next) - c1**2, 0.0))
        rng, sub = jax.random.split(rng)
        noise = jax.random.normal(sub, x.shape, x.dtype) if eta > 0 else 0.0
        x_stepped = (
            schedule.sqrt_alphas_hat[safe_next] * x_start
            + c1 * noise
            + c2 * pred_noise
        )
        x_out = jnp.where(jnp.asarray(time_next) < 0, x_start, x_stepped)
        return x_out, rng

    if len(pairs) <= 8:
        # unrolled with host-float coefficients: the whole update chain is
        # elementwise ops with literal constants (no device gathers); the
        # final step short-circuits to x_start
        ah = np.asarray(schedule.alphas_hat, np.float64)
        sa = np.asarray(schedule.sqrt_alphas_hat, np.float64)
        sra = np.asarray(schedule.sqrt_recip_alphas_hat, np.float64)
        srm = np.asarray(schedule.sqrt_recipm1_alphas_hat, np.float64)
        for time, time_next in pairs:
            t_vec = jnp.full((B,), time)
            if training_target == "x0":
                x_start = denoise_fn(x, t_vec)
                if time_next < 0:
                    return x_start
                pred_noise = (float(sra[time]) * x - x_start) / float(srm[time])
            else:
                pred_noise = denoise_fn(x, t_vec)
                x_start = (
                    x - pred_noise * float(np.sqrt(1.0 - ah[time]))
                ) / float(np.sqrt(ah[time]))
                if time_next < 0:
                    return x_start
            alpha, alpha_next = float(ah[time]), float(ah[time_next])
            c1 = eta * float(
                np.sqrt((1 - alpha / alpha_next) * (1 - alpha_next) / (1 - alpha))
            )
            c2 = float(np.sqrt(max((1 - alpha_next) - c1**2, 0.0)))
            rng, sub = jax.random.split(rng)
            noise = jax.random.normal(sub, x.shape, x.dtype) if eta > 0 else 0.0
            x = float(sa[time_next]) * x_start + c1 * noise + c2 * pred_noise
        return x

    times = jnp.asarray(np.array([p[0] for p in pairs], np.int32))
    times_next = jnp.asarray(np.array([p[1] for p in pairs], np.int32))

    def scan_step(carry, inp):
        x, rng = carry
        x, rng = step(x, rng, inp[0], inp[1])
        return (x, rng), None

    (x, _), _ = jax.lax.scan(scan_step, (x, rng), (times, times_next))
    return x


def ddpm_sample(
    schedule: DiffusionSchedule,
    denoise_fn: DenoiseFn,
    x: jnp.ndarray,
    *,
    timesteps: Optional[int] = None,
    training_target: str = "x0",
    clip_denoised: bool = False,
    rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Ancestral DDPM sampling over the (possibly strided) timestep grid."""
    T = schedule.num_timesteps
    skip = T // (timesteps or T)
    seq = list(range(0, T, skip))[::-1]
    times = jnp.asarray(np.array(seq, np.int32))
    if rng is None:
        rng = jax.random.PRNGKey(0)
    B = x.shape[0]

    def step(carry, time):
        x, rng = carry
        t_vec = jnp.full((B,), time)
        if training_target == "x0":
            x_recon = denoise_fn(x, t_vec)
        else:
            eps = denoise_fn(x, t_vec)
            x_recon = (
                schedule.sqrt_recip_alphas_hat[time] * x
                - schedule.sqrt_recipm1_alphas_hat[time] * eps
            )
        if clip_denoised:
            x_recon = jnp.clip(x_recon, -1.0, 1.0)
        mean = (
            schedule.posterior_mean_coef1[time] * x_recon
            + schedule.posterior_mean_coef2[time] * x
        )
        log_var = schedule.posterior_log_variance_clipped[time]
        rng, sub = jax.random.split(rng)
        noise = jax.random.normal(sub, x.shape, x.dtype)
        noise = jnp.where(time > 0, noise, jnp.zeros_like(noise))
        x_out = mean + noise * jnp.exp(0.5 * log_var)
        return (x_out, rng), None

    (x, _), _ = jax.lax.scan(step, (x, rng), times)
    return x
