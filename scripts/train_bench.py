"""Training-step throughput on the current backend.

    python scripts/train_bench.py [batch] [dtype]

Measures the full jitted train step (noising + forward + backward + Adam)
for the visual DHF1k config at full resolution.
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

from diff_sal_tpu.config import (ModelConfig, audio_visual_experiment,
                                 visual_experiment)
from diff_sal_tpu.diffusion.schedule import make_schedule
from diff_sal_tpu.models.diff_model import VideoSaliencyModel
from diff_sal_tpu.train.optim import make_optimizer
from diff_sal_tpu.train.train_step import create_train_state, make_train_step


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    dtype = sys.argv[2] if len(sys.argv) > 2 else "bfloat16"
    av = "av" in sys.argv[3:]
    use_pallas = "xla" not in sys.argv[3:]  # fused fwd+bwd kernel by default
    cfg = audio_visual_experiment() if av else visual_experiment()
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, compute_dtype=dtype)
    )
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(
            cfg.model,
            visual=dataclasses.replace(
                cfg.model.visual, use_pallas_attention=use_pallas
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
        }
        for i in range(4)
    ]
    if av:
        for i, b in enumerate(batches):
            b["audio"] = jax.random.normal(
                jax.random.fold_in(key, 300 + i), (B, 9, 112, 192, 1)
            )
    init_data = {"rgb": batches[0]["rgb"][:1],
                 "input": jnp.zeros((1, 224, 384, 1))}
    if av:
        init_data["audio"] = batches[0]["audio"][:1]
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(1), init_data, jnp.zeros((1,)),
    )
    tx = make_optimizer(cfg.optim, steps_per_epoch=1000, n_epochs=3)
    state = create_train_state(model, variables, tx)
    step = jax.jit(make_train_step(model, schedule, cfg), donate_argnums=0)

    t0 = time.perf_counter()
    state, metrics = step(state, batches[0], jax.random.PRNGKey(2))
    jax.block_until_ready(metrics)
    print(f"# compile {time.perf_counter() - t0:.1f}s", flush=True)

    # two timing rounds with mid-loop liveness syncs: the axon tunnel can
    # silently drop executions and fake a below-physical-floor time (round
    # 5 measured 19.7 ms/step for a ~45 ms-MXU-floor program on a plain
    # end-blocked loop); float(loss) every 5 iters forces each step chain
    # segment to really execute before the clock stops
    iters = 20
    rates = []
    for _ in range(2):
        losses = []
        t0 = time.perf_counter()
        for i in range(iters):
            state, metrics = step(
                state, batches[i % 4], jax.random.fold_in(key, 200 + i)
            )
            if i % 5 == 4:
                losses.append(float(metrics["total"]))
        jax.block_until_ready(metrics)
        rates.append((time.perf_counter() - t0) / iters)
        assert all(l > 0 and l == l for l in losses), losses
    dt = min(rates)
    spread = (max(rates) - min(rates)) / max(rates)
    if spread > 0.10:
        print(f"# WARNING timing spread {spread:.1%} between rounds "
              f"({[round(r * 1e3, 1) for r in rates]} ms)")
    print(
        f"{dtype} B={B} {'av' if av else 'visual'}"
        f"{' pallas' if use_pallas else ' xla'}: {dt*1e3:.1f} ms/step -> "
        f"{B/dt:.1f} clips/s/chip (loss {float(metrics['total']):.2f})"
    )


if __name__ == "__main__":
    main()
