"""Profile the dryrun train-step EXECUTION on the 8-device virtual CPU mesh
(execution was 297s of the 608s cold dryrun — find the pathological op).

    python scripts/profile_dryrun_exec.py [trace]

Uses a persistent /tmp cache so re-runs skip the ~140s compile. With
'trace', wraps the step in jax.profiler.trace writing to /tmp/dryrun_trace.
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

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/dryrun_profile_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

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
from diff_sal_tpu.parallel.mesh import batch_sharding, make_mesh, shard_batch
from diff_sal_tpu.train.optim import make_optimizer
from diff_sal_tpu.train.train_step import create_train_state, make_train_step


def main():
    trace = len(sys.argv) > 1 and sys.argv[1] == "trace"
    hw = (64, 96)
    t0 = time.monotonic()
    cfg = ExperimentConfig(
        model=ModelConfig(
            visual=MViTConfig.dryrun(spatial_size=hw, remat=True,
                                     temporal_size=8),
            audio=VGGishConfig(),
            spatiotemp=AudioAttnConfig(),
            decoder=SalUNetConfig(img_size=hw),
        )
    )
    model = VideoSaliencyModel(cfg.model)
    schedule = make_schedule("cosine", num_diffusion_timesteps=100)
    B = N
    rng0 = jax.random.PRNGKey(42)
    rgb = jax.random.normal(rng0, (B, 8, *hw, 3)) * 0.1
    audio = jax.random.normal(jax.random.fold_in(rng0, 1),
                              (B, 9, 32, 48, 1)) * 0.1
    salmap = jax.random.uniform(jax.random.fold_in(rng0, 2), (B, *hw, 1))
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        {"rgb": rgb[:1], "input": jnp.zeros((1, *hw, 1)),
         "audio": audio[:1]},
        jnp.zeros((1,)),
    )
    tx = make_optimizer(cfg.optim, steps_per_epoch=10, n_epochs=3)
    mesh = make_mesh(num_data=N, devices=jax.devices()[:N])
    repl = NamedSharding(mesh, P())
    data_sh = batch_sharding(mesh)
    state = jax.device_put(create_train_state(model, variables, tx), repl)
    batch = shard_batch({"rgb": rgb, "salmap": salmap, "audio": audio}, mesh)
    step = jax.jit(
        make_train_step(model, schedule, cfg),
        in_shardings=(repl, data_sh, repl),
        out_shardings=(repl, repl),
    ).lower(state, batch, jax.random.PRNGKey(1)).compile()
    print(f"ready at {time.monotonic() - t0:.0f}s", flush=True)

    t1 = time.monotonic()
    if trace:
        with jax.profiler.trace("/tmp/dryrun_trace"):
            s2, metrics = step(state, batch, jax.random.PRNGKey(1))
            jax.block_until_ready(metrics)
    else:
        s2, metrics = step(state, batch, jax.random.PRNGKey(1))
        jax.block_until_ready(metrics)
    print(f"exec1 {time.monotonic() - t1:.1f}s loss={float(metrics['total']):.3f}",
          flush=True)
    t2 = time.monotonic()
    s3, metrics = step(s2, batch, jax.random.PRNGKey(2))
    jax.block_until_ready(metrics)
    print(f"exec2 {time.monotonic() - t2:.1f}s", flush=True)


if __name__ == "__main__":
    main()
