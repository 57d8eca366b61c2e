"""Training-step tests: loss decreases when overfitting one batch (tiny
model), optimizer schedule semantics, frozen-VGGish gradient contract."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from diff_sal_tpu.config import (
    ExperimentConfig,
    MViTConfig,
    ModelConfig,
    SalUNetConfig,
)
from diff_sal_tpu.diffusion.schedule import make_schedule
from diff_sal_tpu.models.diff_model import VideoSaliencyModel
from diff_sal_tpu.train.optim import make_optimizer, multistep_lr
from diff_sal_tpu.train.train_step import (
    create_train_state,
    make_train_step,
)


def tiny_experiment(hw=(64, 96)):
    # dryrun plan + temporal 8: same structural kinds as the full plan at
    # a fraction of the compile cost (fast-tier budget, VERDICT r4 item 6)
    return ExperimentConfig(
        model=ModelConfig(
            visual=MViTConfig.dryrun(spatial_size=hw, temporal_size=8),
            decoder=SalUNetConfig(img_size=hw),
        )
    )


def test_multistep_lr_boundaries():
    sched = multistep_lr(1e-4, steps_per_epoch=100, n_epochs=4)
    np.testing.assert_allclose(float(sched(0)), 1e-4, rtol=1e-5)
    np.testing.assert_allclose(float(sched(199)), 1e-4, rtol=1e-5)
    np.testing.assert_allclose(float(sched(200)), 1e-5, rtol=1e-5)
    np.testing.assert_allclose(float(sched(300)), 1e-6, rtol=1e-5)


@pytest.mark.slow
def test_overfit_one_batch_loss_decreases():
    import dataclasses

    from diff_sal_tpu.config import OptimConfig

    cfg = dataclasses.replace(
        tiny_experiment(), optim=OptimConfig(lr=1e-3)
    )
    model = VideoSaliencyModel(cfg.model)
    schedule = make_schedule(
        cfg.diffusion.beta_schedule,
        num_diffusion_timesteps=cfg.diffusion.num_diffusion_timesteps,
    )
    rng = jax.random.PRNGKey(0)
    B, hw = 2, (64, 96)
    rgb = jax.random.normal(rng, (B, 8, *hw, 3)) * 0.1
    salmap = jax.random.uniform(jax.random.PRNGKey(1), (B, *hw, 1))
    batch = {"rgb": rgb, "salmap": salmap}

    variables = jax.jit(model.init)(
        jax.random.PRNGKey(2),
        {"rgb": rgb, "input": jnp.zeros((B, *hw, 1))},
        jnp.zeros((B,)),
    )
    tx = make_optimizer(cfg.optim, steps_per_epoch=10, n_epochs=3)
    state = create_train_state(model, variables, tx)
    step = jax.jit(make_train_step(model, schedule, cfg))

    losses = []
    for i in range(10):
        # fixed rng -> same timestep/noise each step: pure overfit signal
        state, metrics = step(state, batch, jax.random.PRNGKey(42))
        losses.append(float(metrics["total"]))
    assert np.isfinite(losses).all()
    # 10 steps is enough to establish a downward trend (full overfit runs
    # live in the TPU experiment scripts, not the CPU unit suite)
    assert losses[-1] < losses[2], losses
    assert losses[-1] < losses[0], losses
    assert np.mean(losses[-3:]) < np.mean(losses[:3]), losses
    assert float(metrics["grad_norm"]) > 0.0


@pytest.mark.slow
def test_train_step_binds_its_own_model():
    """Regression (round-5 harness bug): make_train_step must run the
    model it was GIVEN, not state.apply_fn — shared-state A/B harnesses
    create the TrainState from variant A, and the old state.apply_fn call
    silently ran the A graph for both sides (docs/PERF.md round 5).
    Build two models that differ only in activation math (identical param
    tree, guaranteed-different outputs — the dead-frame flags are exact
    no-ops on the tiny temporal-8 plan) and assert the two steps disagree
    on the loss."""
    import dataclasses

    cfg_a = tiny_experiment()
    cfg_b = dataclasses.replace(
        cfg_a,
        model=dataclasses.replace(
            cfg_a.model,
            visual=dataclasses.replace(cfg_a.model.visual, gelu="exact"),
        ),
    )
    model_a = VideoSaliencyModel(cfg_a.model)
    model_b = VideoSaliencyModel(cfg_b.model)
    schedule = make_schedule("cosine", num_diffusion_timesteps=100)
    B, hw = 1, (64, 96)
    rgb = jax.random.normal(jax.random.PRNGKey(0), (B, 8, *hw, 3)) * 0.1
    batch = {"rgb": rgb,
             "salmap": jax.random.uniform(jax.random.PRNGKey(1), (B, *hw, 1))}
    variables = jax.jit(model_a.init)(
        jax.random.PRNGKey(2),
        {"rgb": rgb, "input": jnp.zeros((B, *hw, 1))},
        jnp.zeros((B,)),
    )
    tx = make_optimizer(tiny_experiment().optim, steps_per_epoch=10,
                        n_epochs=3)
    state = create_train_state(model_a, variables, tx)  # A's apply_fn
    la = float(
        make_train_step(model_a, schedule, cfg_a)(
            state, batch, jax.random.PRNGKey(3)
        )[1]["total"]
    )
    lb = float(
        make_train_step(model_b, schedule, cfg_b)(
            state, batch, jax.random.PRNGKey(3)
        )[1]["total"]
    )
    assert la != lb, (la, lb)


@pytest.mark.slow
def test_frozen_vggish_receives_no_gradient():
    from diff_sal_tpu.config import AudioAttnConfig, VGGishConfig

    # hw must give a stage-0 grid of at least (4, 3): with a smaller grid the
    # kv pooling (kernel 2, stride 2) collapses to a single key token and
    # softmax over one key is constant -> the audio branch gets zero gradient
    # by construction, not by bug
    hw = (128, 96)
    cfg = ExperimentConfig(
        model=ModelConfig(
            visual=MViTConfig.dryrun(spatial_size=hw, temporal_size=8),
            audio=VGGishConfig(),
            spatiotemp=AudioAttnConfig(),
            decoder=SalUNetConfig(img_size=hw),
        )
    )
    model = VideoSaliencyModel(cfg.model)
    schedule = make_schedule("cosine", num_diffusion_timesteps=100)
    B = 1
    # nonzero inputs: exact zeros kill the audio-branch gradient (q=0 at the
    # cross-attention) and make LayerNorm backward pathological
    rgb = jax.random.normal(jax.random.PRNGKey(10), (B, 8, *hw, 3)) * 0.3
    # audio spatial must be 16x the coarsest video grid (4,3) at this size
    audio = jax.random.normal(jax.random.PRNGKey(11), (B, 9, 64, 48, 1)) * 0.3
    salmap = jax.random.uniform(jax.random.PRNGKey(12), (B, *hw, 1))
    batch = {"rgb": rgb, "salmap": salmap, "audio": audio}
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        {"rgb": rgb, "input": jnp.zeros((B, *hw, 1)), "audio": audio},
        jnp.zeros((B,)),
    )

    # compute grads directly (no optimizer) and assert audio trunk grads == 0
    from diff_sal_tpu.data.transforms import data_transform
    from diff_sal_tpu.diffusion.schedule import q_sample
    from diff_sal_tpu.train.losses import training_loss

    def loss_fn(params):
        x0 = salmap
        t = jnp.zeros((B,))
        x_noisy = q_sample(schedule, x0, jnp.zeros((B,), jnp.int32), x0 * 0)
        pred, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            {"rgb": rgb, "input": x_noisy, "audio": audio},
            t,
            True,
            mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(1)},
        )
        return training_loss(cfg.loss, pred, x0)["total"]

    grads = jax.grad(loss_fn)(variables["params"])
    audio_grad_norm = sum(
        float(jnp.abs(g).sum()) for g in jax.tree.leaves(grads["audio_net"])
    )
    assert audio_grad_norm == 0.0
    # but the trainable spatiotemp transformer does get gradients
    st_grad_norm = sum(
        float(jnp.abs(g).sum()) for g in jax.tree.leaves(grads["spatiotemp_net"])
    )
    assert st_grad_norm > 0.0
