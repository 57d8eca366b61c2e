"""Within-process A/B of the attention-backward output dtype
(ops/attention.py:_BWD_NATIVE_OUT) on the full AV TRAIN step.

    python scripts/ab_train_attnbwd.py [B] [iters] [rounds]

A = f32 dq/drel kernel outputs + XLA astype (round-3 behavior);
B = dq/drel written in the input dtype inside the kernel (bit-identical
value — the same f32 number is rounded, in-kernel instead of in a
standalone convert pass). The module flag is flipped between the two
jit traces; everything else (state, batches, schedule) is shared.
Interleaved rounds with per-round host syncs (docs/PERF.md measurement
integrity).
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
from diff_sal_tpu.ops import attention
from diff_sal_tpu.train.optim import make_optimizer
from diff_sal_tpu.train.train_step import create_train_state, make_train_step


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 15
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 5

    cfg = audio_visual_experiment()
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, compute_dtype="bfloat16")
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
    # ONE shared state for both variants (two full states + two loaded
    # executables exhaust HBM at B=4): run() feeds the same state every
    # iter and discards the update — identical per-step work, and the
    # loss stays finite/live for the integrity check
    state = create_train_state(model, variables, tx)
    del variables, init_data  # free the extra param-tree copy (HBM edge)
    keys = [jax.random.PRNGKey(i) for i in range(max(iters, 3))]

    raw = make_train_step(model, schedule, cfg)
    # distinct callables -> distinct jit cache entries; the module flag is
    # read at TRACE time, so each wrapper bakes in its own bwd variant
    attention._BWD_NATIVE_OUT = False
    step_a = jax.jit(lambda s, b, k: raw(s, b, k))
    la = float(step_a(state, batches[0], keys[2])[1]["total"])
    attention._BWD_NATIVE_OUT = True
    step_b = jax.jit(lambda s, b, k: raw(s, b, k))
    lb = float(step_b(state, batches[0], keys[2])[1]["total"])
    print(f"first-step loss A {la:.6f}  B {lb:.6f}")
    assert la == lb, (la, lb)  # bit-identical rounding claim

    def run(step):
        t0 = time.perf_counter()
        m = None
        for i in range(iters):
            new_state, m = step(state, batches[i % 4], keys[i])
            del new_state
        v = float(m["total"])
        assert v == v and v > 0
        return (time.perf_counter() - t0) / iters * 1000

    res = {"A": [], "B": []}
    for r in range(rounds):
        res["A"].append(run(step_a))
        res["B"].append(run(step_b))
        print(
            f"round {r}: A {res['A'][-1]:.1f} ms/step   "
            f"B {res['B'][-1]:.1f} ms/step"
        )
    ma = sorted(res["A"])[rounds // 2]
    mb = sorted(res["B"])[rounds // 2]
    print(
        f"median A (f32 bwd outs) {ma:.1f} ms/step\n"
        f"median B (native bwd outs) {mb:.1f} ms/step\n"
        f"speedup {ma / mb:.3f}x"
    )


if __name__ == "__main__":
    main()
