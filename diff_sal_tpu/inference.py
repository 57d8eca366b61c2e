"""End-to-end saliency sampling pipeline (reference `sample_image`,
diffusion_trainer.py:545-640).

Encodes video (and audio) once, runs the configured reverse process
(DDIM default NFE=1 / DDPM / DPM-Solver(++)), and inverse-transforms to a
[0,1] saliency map. The whole pipeline is jittable; features flow through
the sampler closure as values (no per-step recompute or deep copies).

The reference's DPM-Solver glue is broken as shipped (undefined variable +
eps-parameterization asserted against an x0-trained model — SURVEY.md §8.1);
here the solver is wired functionally and uses the x0 parameterization
consistent with `training_target: x0`.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from diff_sal_tpu.config import DataTransformConfig, SamplingConfig
from diff_sal_tpu.data.transforms import inverse_data_transform
from diff_sal_tpu.diffusion.sampling import ddim_sample, ddpm_sample
from diff_sal_tpu.diffusion.schedule import DiffusionSchedule
from diff_sal_tpu.models.diff_model import VideoSaliencyModel


def sample_saliency(
    model: VideoSaliencyModel,
    variables,
    schedule: DiffusionSchedule,
    sampling: SamplingConfig,
    data_cfg: DataTransformConfig,
    rgb: jnp.ndarray,
    audio: Optional[jnp.ndarray] = None,
    rng: Optional[jax.Array] = None,
    training_target: str = "x0",
) -> jnp.ndarray:
    """rgb (B, T, H, W, 3)[, audio (B, 9, 112, 192, 1)] -> pred (B, H', W', 1)
    in [0, 1]."""
    if rng is None:
        rng = jax.random.PRNGKey(0)
    rng, noise_rng, samp_rng = jax.random.split(rng, 3)

    audio_feat = None
    if audio is not None and model.cfg.audio is not None:
        audio_feat = model.apply(
            variables, audio, method=VideoSaliencyModel.encode_audio
        )
    feat_list = model.apply(
        variables, rgb, method=VideoSaliencyModel.encode_visual
    )

    B = rgb.shape[0]
    h, w = model.cfg.decoder.img_size
    x = jax.random.normal(noise_rng, (B, h, w, 1))

    def denoise_fn(x_t, t_vec):
        return model.apply(
            variables,
            x_t,
            t_vec,
            feat_list,
            audio_feat,
            method=VideoSaliencyModel.denoise,
        )

    if sampling.sample_type == "ddim":
        x = ddim_sample(
            schedule,
            denoise_fn,
            x,
            timesteps=sampling.timesteps,
            eta=sampling.eta,
            training_target=training_target,
            rng=samp_rng,
        )
    elif sampling.sample_type == "ddpm":
        x = ddpm_sample(
            schedule,
            denoise_fn,
            x,
            timesteps=sampling.timesteps,
            training_target=training_target,
            rng=samp_rng,
        )
    elif sampling.sample_type in ("dpmsolver", "dpmsolver++"):
        from diff_sal_tpu.diffusion.dpm_solver import dpm_solver_sample

        x = dpm_solver_sample(
            schedule,
            denoise_fn,
            x,
            sampling=sampling,
            training_target=training_target,
        )
    else:
        raise NotImplementedError(sampling.sample_type)

    return inverse_data_transform(data_cfg, x)


def sample_saliency_from_wave(
    model: VideoSaliencyModel,
    variables,
    schedule: DiffusionSchedule,
    sampling: SamplingConfig,
    data_cfg: DataTransformConfig,
    rgb: jnp.ndarray,
    wave16k: jnp.ndarray,  # (B, 25600) 16 kHz excerpts
    rng: Optional[jax.Array] = None,
    training_target: str = "x0",
) -> jnp.ndarray:
    """Fully fused TPU pipeline including the audio DSP frontend: raw 16 kHz
    wave excerpts -> log-mel examples -> VGGish -> ... -> saliency maps, one
    compiled program (the reference computes the mel frontend in numpy on
    CPU dataloader workers, SURVEY.md §2.4)."""
    from diff_sal_tpu.audio.mel import device_audio_frontend

    audio = device_audio_frontend(wave16k)
    return sample_saliency(
        model, variables, schedule, sampling, data_cfg, rgb, audio, rng,
        training_target,
    )
