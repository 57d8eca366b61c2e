"""Capture an xplane trace of the full AV TRAIN step on TPU.

    python scripts/trace_train.py [batch] [outdir]
    python tools/analyze_trace.py <outdir> 40
"""

import dataclasses
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", ".jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from diff_sal_tpu.config import audio_visual_experiment
from diff_sal_tpu.diffusion.schedule import make_schedule
from diff_sal_tpu.models.diff_model import VideoSaliencyModel
from diff_sal_tpu.train.optim import make_optimizer
from diff_sal_tpu.train.train_step import create_train_state, make_train_step


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/jaxtrace_train"

    cfg = audio_visual_experiment()
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(
            cfg.model,
            compute_dtype="bfloat16",
            visual=dataclasses.replace(
                cfg.model.visual, use_pallas_attention=True
            ),
        ),
    )
    model = VideoSaliencyModel(cfg.model)
    schedule = make_schedule("cosine", num_diffusion_timesteps=1000)
    key = jax.random.PRNGKey(0)
    batches = [
        {
            "rgb": jax.random.normal(
                jax.random.fold_in(key, i), (B, 16, 224, 384, 3)
            ) * 0.3,
            "salmap": jax.random.uniform(
                jax.random.fold_in(key, 100 + i), (B, 224, 384, 1)
            ),
            "audio": jax.random.normal(
                jax.random.fold_in(key, 300 + i), (B, 9, 112, 192, 1)
            ),
        }
        for i in range(4)
    ]
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(1),
        {"rgb": batches[0]["rgb"][:1],
         "input": jnp.zeros((1, 224, 384, 1)),
         "audio": batches[0]["audio"][:1]},
        jnp.zeros((1,)),
    )
    tx = make_optimizer(cfg.optim, steps_per_epoch=1000, n_epochs=3)
    state = create_train_state(model, variables, tx)
    step = jax.jit(make_train_step(model, schedule, cfg))

    state, m = step(state, batches[0], jax.random.PRNGKey(2))
    jax.block_until_ready(m["total"])
    t0 = time.perf_counter()
    for i in range(10):
        state, m = step(state, batches[i % 4], jax.random.PRNGKey(i))
    jax.block_until_ready(m["total"])
    print(f"pre-trace: {(time.perf_counter() - t0) / 10 * 1e3:.1f} ms/step")

    with jax.profiler.trace(outdir):
        for i in range(5):
            state, m = step(state, batches[i % 4], jax.random.PRNGKey(i))
        jax.block_until_ready(m["total"])
    print(f"trace written to {outdir}")


if __name__ == "__main__":
    main()
