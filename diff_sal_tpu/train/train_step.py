"""The jitted training / evaluation steps.

One SPMD program covers what the reference spreads across
`DiffusionTrainer.prepare_data` + `q_sample` + forward + `get_lossv2` +
backward + clip + step (diffusion_trainer.py:78-137, 347-376): the noising,
forward, loss, gradient (with XLA's automatic cross-device `psum` when the
batch is sharded over the 'data' mesh axis), clipping and Adam update all run
on device in a single compiled step. The dequantization / timestep / noise
randomness is explicit via a PRNG key split per step.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import flax
import jax
import jax.numpy as jnp
import optax
from flax.training import train_state

from diff_sal_tpu.config import ExperimentConfig
from diff_sal_tpu.data.transforms import data_transform
from diff_sal_tpu.diffusion.schedule import DiffusionSchedule, q_sample
from diff_sal_tpu.models.diff_model import VideoSaliencyModel
from diff_sal_tpu.train.losses import eval_scores, training_loss


def audio_hw_for(cfg: ExperimentConfig) -> Tuple[int, int]:
    """The model's audio example grid is half the saliency-map size
    (reference audio_size = sample_size/2: cfgs/dataset.json 192x112 vs
    384x224), keeping it 16x the coarsest video scale."""
    h, w = cfg.model.decoder.img_size
    return (h // 2, w // 2)


def resolve_audio(batch, hw=None) -> Optional[jnp.ndarray]:
    """Model audio input from a batch: precomputed log-mel examples
    ("audio"), or — the packed AV pipeline (data/packed.py) — raw 16 kHz
    wave excerpts ("wave") whose VGGish log-mel frontend runs HERE, inside
    the jitted step (audio/mel.py device_audio_frontend), replacing the
    reference's numpy-on-CPU-workers DSP (saliency_db.py:449-497)."""
    if "audio" in batch:
        return batch["audio"]
    if "wave" in batch:
        from diff_sal_tpu.audio.mel import device_audio_frontend

        return device_audio_frontend(batch["wave"].astype(jnp.float32), hw)
    return None


class TrainState(train_state.TrainState):
    batch_stats: Any = None
    ema_params: Any = None  # parameter EMA shadow (None when disabled)


def create_train_state(
    model: VideoSaliencyModel,
    variables,
    tx: optax.GradientTransformation,
    use_ema: bool = False,
) -> TrainState:
    return TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        tx=tx,
        batch_stats=variables.get("batch_stats", flax.core.freeze({})),
        ema_params=variables["params"] if use_ema else None,
    )


def make_train_step(
    model: VideoSaliencyModel,
    schedule: DiffusionSchedule,
    cfg: ExperimentConfig,
) -> Callable:
    """Returns train_step(state, batch, rng) -> (state, metrics).

    batch: {"rgb": (B,T,H,W,3), "salmap": (B,H,W,1)[, "audio": ...]}.
    """
    T = schedule.num_timesteps
    target_kind = cfg.training.training_target

    def train_step(state: TrainState, batch, rng: jax.Array):
        rng_deq, rng_t, rng_noise, rng_drop = jax.random.split(rng, 4)
        x0 = data_transform(
            cfg.data_transform, batch["salmap"].astype(jnp.float32), rng_deq
        )
        B = x0.shape[0]
        if cfg.training.shared_timestep_per_batch:
            # Reference quirk: one scalar t for the whole batch
            # (diffusion_trainer.py:111-114).
            t = jnp.full((B,), jax.random.randint(rng_t, (), 0, T))
        else:
            t = jax.random.randint(rng_t, (B,), 0, T)
        noise = jax.random.normal(rng_noise, x0.shape, x0.dtype)
        x_noisy = q_sample(schedule, x0, t, noise)
        target = x0 if target_kind == "x0" else noise

        audio = resolve_audio(batch, audio_hw_for(cfg))

        def loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            data = {"rgb": batch["rgb"], "input": x_noisy}
            if audio is not None:
                data["audio"] = audio
            # NOTE: must be the model passed to make_train_step, NOT
            # state.apply_fn — A/B harnesses share one TrainState across
            # two model variants (ab_train_sdf.py, ab_train_wgdots.py),
            # and state.apply_fn silently pins both to the state's model
            # (round-5 bug: the B side measured the A graph, docs/PERF.md)
            pred, mutated = model.apply(
                variables,
                data,
                t.astype(jnp.float32),
                True,
                mutable=["batch_stats"],
                rngs={"dropout": rng_drop},
            )
            loss_dict = training_loss(cfg.loss, pred, target)
            return loss_dict["total"], (loss_dict, mutated)

        grads, (loss_dict, mutated) = jax.grad(loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads=grads).replace(
            batch_stats=mutated["batch_stats"]
        )
        if state.ema_params is not None:
            from diff_sal_tpu.train.ema import ema_update

            new_state = new_state.replace(
                ema_params=ema_update(
                    state.ema_params, new_state.params, cfg.training.ema_rate
                )
            )
        metrics = {k: v for k, v in loss_dict.items()}
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    return train_step


def make_eval_step(
    model: VideoSaliencyModel,
    schedule: DiffusionSchedule,
    cfg: ExperimentConfig,
) -> Callable:
    """Returns eval_step(state, batch, rng) -> (scores dict, pred maps).
    Runs the default sampler (DDIM NFE=1 under the shipped config) and
    computes the nss+cc+sim validation score on device (reference
    `test`/`test_av_data_for_training`, diffusion_trainer.py:714-821 —
    with the metric reduction over the full global batch, not rank-0's
    shard). The sampled prediction is returned so callers that dump images
    score and save the SAME maps with one inference pass (the reference
    samples once and reuses it too, diffusion_trainer.py:856-885)."""
    from diff_sal_tpu.inference import sample_saliency

    def eval_step(state: TrainState, batch, rng: jax.Array):
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        pred = sample_saliency(
            model,
            variables,
            schedule,
            cfg.sampling,
            cfg.data_transform,
            batch["rgb"],
            resolve_audio(batch, audio_hw_for(cfg)),
            rng=rng,
            training_target=cfg.training.training_target,
        )
        return (
            eval_scores(
                pred,
                batch["salmap"].astype(jnp.float32),
                mask=batch.get("valid"),
            ),
            pred,
        )

    return eval_step
