"""Probe 2: is the dryrun train-step compile blowup from (a) the combined
whole-program graph or (b) the 8-device SPMD partitioner?

  A: full train_step, single device, no shardings
  B: mvit7 grad, 8-device data sharding
  C: full train_step, 8 devices (the dryrun configuration)

    python scripts/probe_dryrun_compile2.py A|B|C
"""

import os
import sys
import time

sys.path.insert(0, ".")

N = 8
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + f" --xla_force_host_platform_device_count={N}"
).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

# the axon TPU plugin overrides the JAX_PLATFORMS env var; jax.config wins
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from diff_sal_tpu.config import (
    AudioAttnConfig,
    ExperimentConfig,
    MViTConfig,
    ModelConfig,
    SalUNetConfig,
    VGGishConfig,
)
from diff_sal_tpu.diffusion.schedule import make_schedule
from diff_sal_tpu.models.diff_model import VideoSaliencyModel
from diff_sal_tpu.models.mvit import MViT
from diff_sal_tpu.parallel.mesh import batch_sharding, make_mesh
from diff_sal_tpu.train.optim import make_optimizer
from diff_sal_tpu.train.train_step import create_train_state, make_train_step

HW = (64, 96)


def report(tag, lowered):
    t1 = time.perf_counter()
    lowered.compile()
    t2 = time.perf_counter()
    print(f"{tag:28s} compile {t2 - t1:6.1f}s", flush=True)


def full_cfg():
    return ExperimentConfig(
        model=ModelConfig(
            visual=MViTConfig.dryrun(spatial_size=HW, remat=True),
            audio=VGGishConfig(),
            spatiotemp=AudioAttnConfig(),
            decoder=SalUNetConfig(img_size=HW),
        )
    )


def make_all(B):
    cfg = full_cfg()
    model = VideoSaliencyModel(cfg.model)
    schedule = make_schedule("cosine", num_diffusion_timesteps=100)
    rng0 = jax.random.PRNGKey(42)
    rgb = jax.random.normal(rng0, (B, 16, *HW, 3)) * 0.1
    audio = jax.random.normal(jax.random.fold_in(rng0, 1),
                              (B, 9, 32, 48, 1)) * 0.1
    salmap = jax.random.uniform(jax.random.fold_in(rng0, 2), (B, *HW, 1))
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        {"rgb": rgb[:1], "input": jnp.zeros((1, *HW, 1)),
         "audio": audio[:1]},
        jnp.zeros((1,)),
    )
    tx = make_optimizer(cfg.optim, steps_per_epoch=10, n_epochs=3)
    state = create_train_state(model, variables, tx)
    batch = {"rgb": rgb, "salmap": salmap, "audio": audio}
    return cfg, model, schedule, state, batch


def probe_A():
    cfg, model, schedule, state, batch = make_all(B=2)
    step = jax.jit(make_train_step(model, schedule, cfg))
    t0 = time.perf_counter()
    lowered = step.lower(state, batch, jax.random.PRNGKey(1))
    print(f"A lower {time.perf_counter() - t0:.1f}s", flush=True)
    report("A train_step 1-dev", lowered)


def probe_B():
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = make_mesh(num_data=N, devices=jax.devices()[:N])
    repl = NamedSharding(mesh, P())
    data_sh = batch_sharding(mesh)
    m = MViT(MViTConfig.dryrun(spatial_size=HW, remat=True))
    x = jnp.zeros((N, 16, *HW, 3))
    params = jax.jit(m.init)(jax.random.PRNGKey(0), x)

    def loss(p, x):
        outs = m.apply(p, x)
        return sum(jnp.sum(o.astype(jnp.float32) ** 2) for o in outs)

    g = jax.jit(jax.grad(loss), in_shardings=(repl, data_sh),
                out_shardings=repl)
    t0 = time.perf_counter()
    lowered = g.lower(params, x)
    print(f"B lower {time.perf_counter() - t0:.1f}s", flush=True)
    report("B mvit7 grad 8-dev", lowered)


def probe_C():
    from jax.sharding import NamedSharding, PartitionSpec as P

    cfg, model, schedule, state, batch = make_all(B=N)
    mesh = make_mesh(num_data=N, devices=jax.devices()[:N])
    repl = NamedSharding(mesh, P())
    data_sh = batch_sharding(mesh)
    step = jax.jit(
        make_train_step(model, schedule, cfg),
        in_shardings=(repl, data_sh, repl),
        out_shardings=(repl, repl),
    )
    t0 = time.perf_counter()
    lowered = step.lower(state, batch, jax.random.PRNGKey(1))
    print(f"C lower {time.perf_counter() - t0:.1f}s", flush=True)
    report("C train_step 8-dev", lowered)




def probe_D():
    """Full-model grad-of-loss, 8-dev sharded, NO optimizer/metrics."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from diff_sal_tpu.diffusion.schedule import q_sample
    

    cfg, model, schedule, state, batch = make_all(B=N)
    mesh = make_mesh(num_data=N, devices=jax.devices()[:N])
    repl = NamedSharding(mesh, P())
    data_sh = batch_sharding(mesh)

    def loss_fn(params, batch, rng):
        x0 = batch["salmap"].astype(jnp.float32) * 2 - 1
        t = jax.random.randint(rng, (N,), 0, 100)
        noise = jax.random.normal(jax.random.fold_in(rng, 1), x0.shape)
        x_t = q_sample(schedule, x0, t, noise)
        pred, _ = model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            {"rgb": batch["rgb"], "input": x_t, "audio": batch["audio"]},
            t.astype(jnp.float32),
            train=True,
            mutable=["batch_stats"],
            rngs={"dropout": jax.random.fold_in(rng, 2)},
        )
        return jnp.mean((pred - batch["salmap"]) ** 2)

    g = jax.jit(jax.grad(loss_fn),
                in_shardings=(repl, data_sh, repl), out_shardings=repl)
    t0 = time.perf_counter()
    lowered = g.lower(state.params, batch, jax.random.PRNGKey(1))
    print(f"D lower {time.perf_counter() - t0:.1f}s", flush=True)
    report("D fullmodel grad 8-dev", lowered)


def probe_E():
    """JUST the optimizer update (apply_gradients incl. adam + LR schedule
    + global-norm clip), 8-dev replicated."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    cfg, model, schedule, state, batch = make_all(B=N)
    mesh = make_mesh(num_data=N, devices=jax.devices()[:N])
    repl = NamedSharding(mesh, P())

    def update(state, grads):
        return state.apply_gradients(grads=grads)

    f = jax.jit(update, in_shardings=(repl, repl), out_shardings=repl)
    grads = jax.tree.map(jnp.ones_like, state.params)
    t0 = time.perf_counter()
    lowered = f.lower(state, grads)
    print(f"E lower {time.perf_counter() - t0:.1f}s", flush=True)
    report("E apply_gradients 8-dev", lowered)


def probe_F():
    """The optimizer update on ONE device (no mesh)."""
    cfg, model, schedule, state, batch = make_all(B=2)

    def update(state, grads):
        return state.apply_gradients(grads=grads)

    f = jax.jit(update)
    grads = jax.tree.map(jnp.ones_like, state.params)
    t0 = time.perf_counter()
    lowered = f.lower(state, grads)
    print(f"F lower {time.perf_counter() - t0:.1f}s", flush=True)
    report("F apply_gradients 1-dev", lowered)




def _grad_plus_update(update_kind):
    from jax.sharding import NamedSharding, PartitionSpec as P

    from diff_sal_tpu.diffusion.schedule import q_sample

    cfg, model, schedule, state, batch = make_all(B=N)
    mesh = make_mesh(num_data=N, devices=jax.devices()[:N])
    repl = NamedSharding(mesh, P())
    data_sh = batch_sharding(mesh)

    def loss_fn(params, batch, rng):
        x0 = batch["salmap"].astype(jnp.float32) * 2 - 1
        t = jax.random.randint(rng, (N,), 0, 100)
        noise = jax.random.normal(jax.random.fold_in(rng, 1), x0.shape)
        x_t = q_sample(schedule, x0, t, noise)
        pred, _ = model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            {"rgb": batch["rgb"], "input": x_t, "audio": batch["audio"]},
            t.astype(jnp.float32),
            train=True,
            mutable=["batch_stats"],
            rngs={"dropout": jax.random.fold_in(rng, 2)},
        )
        return jnp.mean((pred - batch["salmap"]) ** 2)

    if update_kind == "sgd":

        def step(state, batch, rng):
            grads = jax.grad(loss_fn)(state.params, batch, rng)
            new_params = jax.tree.map(
                lambda p, g: p - 1e-4 * g, state.params, grads
            )
            return state.replace(params=new_params)

    else:

        def step(state, batch, rng):
            grads = jax.grad(loss_fn)(state.params, batch, rng)
            return state.apply_gradients(grads=grads)

    f = jax.jit(step, in_shardings=(repl, data_sh, repl),
                out_shardings=repl)
    t0 = time.perf_counter()
    lowered = f.lower(state, batch, jax.random.PRNGKey(1))
    print(f"G[{update_kind}] lower {time.perf_counter() - t0:.1f}s",
          flush=True)
    report(f"G grad+{update_kind} 8-dev", lowered)


def probe_G():
    _grad_plus_update("sgd")


def probe_H():
    _grad_plus_update("adam")




def probe_I():
    """grad + apply_gradients with optax.flatten(chain) — one flat vector
    update instead of ~200 per-param elementwise chains."""
    import optax

    from jax.sharding import NamedSharding, PartitionSpec as P

    from diff_sal_tpu.diffusion.schedule import q_sample
    from diff_sal_tpu.train.optim import make_optimizer
    from diff_sal_tpu.train.train_step import create_train_state

    cfg, model, schedule, state, batch = make_all(B=N)
    tx = optax.flatten(make_optimizer(cfg.optim, steps_per_epoch=10,
                                      n_epochs=3))
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    state = create_train_state(model, variables, tx)
    mesh = make_mesh(num_data=N, devices=jax.devices()[:N])
    repl = NamedSharding(mesh, P())
    data_sh = batch_sharding(mesh)

    def loss_fn(params, batch, rng):
        x0 = batch["salmap"].astype(jnp.float32) * 2 - 1
        t = jax.random.randint(rng, (N,), 0, 100)
        noise = jax.random.normal(jax.random.fold_in(rng, 1), x0.shape)
        x_t = q_sample(schedule, x0, t, noise)
        pred, _ = model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            {"rgb": batch["rgb"], "input": x_t, "audio": batch["audio"]},
            t.astype(jnp.float32),
            train=True,
            mutable=["batch_stats"],
            rngs={"dropout": jax.random.fold_in(rng, 2)},
        )
        return jnp.mean((pred - batch["salmap"]) ** 2)

    def step(state, batch, rng):
        grads = jax.grad(loss_fn)(state.params, batch, rng)
        return state.apply_gradients(grads=grads)

    f = jax.jit(step, in_shardings=(repl, data_sh, repl),
                out_shardings=repl)
    t0 = time.perf_counter()
    lowered = f.lower(state, batch, jax.random.PRNGKey(1))
    print(f"I lower {time.perf_counter() - t0:.1f}s", flush=True)
    report("I grad+flat-adam 8-dev", lowered)




def probe_J():
    """H + mutated batch_stats threaded into the output state + grad_norm
    + metrics outputs — the remaining deltas vs the real train step."""
    import optax

    from jax.sharding import NamedSharding, PartitionSpec as P

    from diff_sal_tpu.diffusion.schedule import q_sample

    cfg, model, schedule, state, batch = make_all(B=N)
    mesh = make_mesh(num_data=N, devices=jax.devices()[:N])
    repl = NamedSharding(mesh, P())
    data_sh = batch_sharding(mesh)

    def loss_fn(params, bs, batch, rng):
        x0 = batch["salmap"].astype(jnp.float32) * 2 - 1
        t = jax.random.randint(rng, (N,), 0, 100)
        noise = jax.random.normal(jax.random.fold_in(rng, 1), x0.shape)
        x_t = q_sample(schedule, x0, t, noise)
        pred, mutated = model.apply(
            {"params": params, "batch_stats": bs},
            {"rgb": batch["rgb"], "input": x_t, "audio": batch["audio"]},
            t.astype(jnp.float32),
            train=True,
            mutable=["batch_stats"],
            rngs={"dropout": jax.random.fold_in(rng, 2)},
        )
        return jnp.mean((pred - batch["salmap"]) ** 2), mutated

    def step(state, batch, rng):
        (loss, mutated), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats,
                                   batch, rng)
        new_state = state.apply_gradients(grads=grads).replace(
            batch_stats=mutated["batch_stats"]
        )
        return new_state, {"total": loss,
                           "grad_norm": optax.global_norm(grads)}

    f = jax.jit(step, in_shardings=(repl, data_sh, repl),
                out_shardings=(repl, repl))
    t0 = time.perf_counter()
    lowered = f.lower(state, batch, jax.random.PRNGKey(1))
    print(f"J lower {time.perf_counter() - t0:.1f}s", flush=True)
    report("J real-ish step 8-dev", lowered)


if __name__ == "__main__":
    {"A": probe_A, "B": probe_B, "C": probe_C, "D": probe_D, "E": probe_E, "F": probe_F, "G": probe_G, "H": probe_H, "I": probe_I, "J": probe_J}[sys.argv[1]]()
