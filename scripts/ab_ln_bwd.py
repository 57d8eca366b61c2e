"""Within-process A/B: XLA-vjp vs Pallas-kernel LayerNorm backward on the
full AV train step. The dispatch env var is flipped between the two jit
traces (it is read at trace time in ops/layernorm.py:_ln_bwd).

    python scripts/ab_ln_bwd.py [B] [iters] [rounds]
"""

import dataclasses
import os
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
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 15
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 5

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
    init_data = {
        "rgb": batches[0]["rgb"][:1],
        "input": jnp.zeros((1, 224, 384, 1)),
        "audio": batches[0]["audio"][:1],
    }
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(1), init_data, jnp.zeros((1,))
    )
    tx = make_optimizer(cfg.optim, steps_per_epoch=1000, n_epochs=3)
    state_a = create_train_state(model, variables, tx)
    state_b = create_train_state(model, variables, tx)

    os.environ["DIFF_SAL_XLA_LN_BWD"] = "1"
    step_a = jax.jit(make_train_step(model, schedule, cfg))
    la = float(step_a(state_a, batches[0], jax.random.PRNGKey(2))[1]["total"])
    os.environ["DIFF_SAL_XLA_LN_BWD"] = "0"
    step_b = jax.jit(make_train_step(model, schedule, cfg))
    lb = float(step_b(state_b, batches[0], jax.random.PRNGKey(2))[1]["total"])
    print(f"first-step loss A {la:.4f}  B {lb:.4f}")
    assert abs(la - lb) / max(abs(la), 1.0) < 0.05, (la, lb)

    def run(step, state):
        t0 = time.perf_counter()
        m = None
        for i in range(iters):
            state, m = step(state, batches[i % 4], jax.random.PRNGKey(i))
        v = float(m["total"])
        assert v == v and v > 0
        return (time.perf_counter() - t0) / iters * 1000, state

    res = {"A": [], "B": []}
    for r in range(rounds):
        dt, state_a = run(step_a, state_a)
        res["A"].append(dt)
        dt, state_b = run(step_b, state_b)
        res["B"].append(dt)
        print(
            f"round {r}: A {res['A'][-1]:.1f} ms/step   "
            f"B {res['B'][-1]:.1f} ms/step"
        )
    ma = sorted(res["A"])[rounds // 2]
    mb = sorted(res["B"])[rounds // 2]
    print(
        f"median A (XLA LN bwd)    {ma:.1f} ms/step\n"
        f"median B (Pallas LN bwd) {mb:.1f} ms/step\n"
        f"speedup {ma / mb:.3f}x"
    )


if __name__ == "__main__":
    main()
