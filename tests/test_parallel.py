"""Data-parallel training over an 8-device virtual CPU mesh: the full train
step runs SPMD with the batch sharded on 'data', and matches the
single-device result bitwise-closely."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from diff_sal_tpu.config import ExperimentConfig, MViTConfig, ModelConfig, SalUNetConfig
from diff_sal_tpu.diffusion.schedule import make_schedule
from diff_sal_tpu.models.diff_model import VideoSaliencyModel
from diff_sal_tpu.parallel.mesh import batch_sharding, make_mesh, shard_batch
from diff_sal_tpu.train.optim import make_optimizer
from diff_sal_tpu.train.train_step import create_train_state, make_train_step


def test_mesh_shapes():
    mesh = make_mesh()
    assert mesh.devices.shape == (8, 1)
    assert mesh.axis_names == ("data", "model")
    mesh2 = make_mesh(num_data=4, num_model=2)
    assert mesh2.devices.shape == (4, 2)


@pytest.mark.slow
def test_dp_train_step_matches_single_device():
    hw = (64, 96)
    cfg = ExperimentConfig(
        model=ModelConfig(
            visual=MViTConfig.tiny(spatial_size=hw),
            decoder=SalUNetConfig(img_size=hw),
        )
    )
    model = VideoSaliencyModel(cfg.model)
    schedule = make_schedule("cosine", num_diffusion_timesteps=100)
    B = 8
    rng = jax.random.PRNGKey(0)
    rgb = jax.random.normal(rng, (B, 16, *hw, 3)) * 0.1
    salmap = jax.random.uniform(jax.random.PRNGKey(1), (B, *hw, 1))
    batch = {"rgb": rgb, "salmap": salmap}
    variables = model.init(
        jax.random.PRNGKey(2),
        {"rgb": rgb[:1], "input": jnp.zeros((1, *hw, 1))},
        jnp.zeros((1,)),
    )
    tx = make_optimizer(cfg.optim, steps_per_epoch=10, n_epochs=3)
    step_fn = make_train_step(model, schedule, cfg)

    # single device
    state0 = create_train_state(model, variables, tx)
    state1, metrics1 = jax.jit(step_fn)(state0, batch, jax.random.PRNGKey(7))

    # 8-device data parallel
    mesh = make_mesh()
    state_dp = create_train_state(model, variables, tx)
    repl = NamedSharding(mesh, P())
    state_dp = jax.device_put(state_dp, repl)
    sharded = shard_batch(batch, mesh)
    dp_step = jax.jit(
        step_fn,
        in_shardings=(repl, batch_sharding(mesh), repl),
        out_shardings=(repl, repl),
    )
    state2, metrics2 = dp_step(state_dp, sharded, jax.random.PRNGKey(7))

    np.testing.assert_allclose(
        float(metrics1["total"]), float(metrics2["total"]), rtol=2e-4
    )
    # parameters after one step agree across the two layouts
    l1 = jax.tree.leaves(state1.params)
    l2 = jax.tree.leaves(state2.params)
    # float accumulation order differs between the single-device batch-8
    # reduction and the 8-way sharded psum; Adam normalizes the update so
    # sub-1e-3 drift on a 1e-4-lr step is the expected numerical envelope
    worst = max(np.max(np.abs(np.asarray(a) - np.asarray(b))) for a, b in zip(l1, l2))
    assert worst < 1e-3, worst


@pytest.mark.slow
def test_dp_eval_step_on_mesh():
    """The sharded EVAL step — sampler + on-device metrics + the pad_last
    valid-mask — on the 8-device mesh with Trainer's exact shardings
    (out=(replicated scores, data-sharded preds)); mirrors
    __graft_entry__._dryrun_multichip_impl phase 2. The reference equivalent
    is the DDP eval loaders (prepare_data.py:87-151)."""
    from diff_sal_tpu.train.train_step import make_eval_step

    hw = (64, 96)
    cfg = ExperimentConfig(
        model=ModelConfig(
            visual=MViTConfig.tiny(spatial_size=hw),
            decoder=SalUNetConfig(img_size=hw),
        )
    )
    model = VideoSaliencyModel(cfg.model)
    schedule = make_schedule("cosine", num_diffusion_timesteps=100)
    B = 8
    rng = jax.random.PRNGKey(0)
    rgb = jax.random.normal(rng, (B, 16, *hw, 3)) * 0.1
    salmap = jax.random.uniform(jax.random.PRNGKey(1), (B, *hw, 1))
    valid = (jnp.arange(B) < B - 2).astype(jnp.float32)  # padded tail batch
    variables = model.init(
        jax.random.PRNGKey(2),
        {"rgb": rgb[:1], "input": jnp.zeros((1, *hw, 1))},
        jnp.zeros((1,)),
    )
    tx = make_optimizer(cfg.optim, steps_per_epoch=10, n_epochs=3)
    mesh = make_mesh()
    repl = NamedSharding(mesh, P())
    state = jax.device_put(create_train_state(model, variables, tx), repl)
    batch = shard_batch(
        {"rgb": rgb, "salmap": salmap, "valid": valid}, mesh
    )
    eval_step = jax.jit(
        make_eval_step(model, schedule, cfg),
        in_shardings=(repl, batch_sharding(mesh), repl),
        out_shardings=(repl, batch_sharding(mesh)),
    )
    scores, pred = eval_step(state, batch, jax.random.PRNGKey(3))
    assert pred.shape == (B, *hw, 1)
    assert np.isfinite(float(scores["total"]))
    # same batch + mask + rng on a single device: identical math, different
    # sharding — the mesh layout must not change the masked reduction
    scores_ref, pred_ref = jax.jit(make_eval_step(model, schedule, cfg))(
        jax.device_get(state),
        {"rgb": rgb, "salmap": salmap, "valid": valid},
        jax.random.PRNGKey(3),
    )
    np.testing.assert_allclose(
        float(scores["total"]), float(scores_ref["total"]), rtol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(pred), np.asarray(pred_ref), atol=1e-4
    )


def test_tensor_parallel_forward_matches_replicated():
    """The 'model' mesh axis in use: AudioAttnNet parameters sharded on
    their output-feature axis over a (2, 4) mesh via
    tensor_parallel_param_shardings; GSPMD partitions the matmuls and the
    result matches the unsharded forward."""
    from diff_sal_tpu.config import AudioAttnConfig
    from diff_sal_tpu.models.audio_attention import AudioAttnNet
    from diff_sal_tpu.parallel.mesh import tensor_parallel_param_shardings

    mesh = make_mesh(num_data=2, num_model=4)
    model = AudioAttnNet(AudioAttnConfig())
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 9, 7, 12, 512)) * 0.3
    variables = model.init(rng, x)

    shardings = tensor_parallel_param_shardings(variables, mesh)
    sharded_leaves = [
        s for s in jax.tree.leaves(shardings)
        if s.spec != P()
    ]
    assert sharded_leaves, "no parameter qualified for TP sharding"

    ref = model.apply(variables, x)
    tp_vars = jax.device_put(variables, shardings)
    xd = jax.device_put(x, NamedSharding(mesh, P("data")))
    out = jax.jit(
        model.apply, out_shardings=NamedSharding(mesh, P())
    )(tp_vars, xd)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
