"""Within-process A/B of two MViTConfig variants on the full AV TRAIN step
(forward + fused-backward + Adam), one TPU chip.

    python scripts/ab_train_mvit.py 'fuse_kv=False' 'fuse_kv=True' [B] [iters] [rounds]

Same override interface as scripts/ab_mvit.py; both variants share ONE
initial state (layout-only A/B), losses must agree before timing starts.
Interleaved rounds with per-round host syncs (docs/PERF.md measurement
integrity).
"""

import ast
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


def parse_overrides(s: str):
    out = {}
    for part in s.split(","):
        if not part.strip():
            continue
        k, v = part.split("=", 1)
        out[k.strip()] = ast.literal_eval(v.strip())
    return out


def main():
    ov_a = parse_overrides(sys.argv[1])
    ov_b = parse_overrides(sys.argv[2])
    B = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    iters = int(sys.argv[4]) if len(sys.argv) > 4 else 15
    rounds = int(sys.argv[5]) if len(sys.argv) > 5 else 5

    def mk(ov):
        cfg = audio_visual_experiment()
        # "decoder."-prefixed overrides hit SalUNetConfig; bare ones MViTConfig
        dec = {k[8:]: v for k, v in ov.items() if k.startswith("decoder.")}
        vis = {k: v for k, v in ov.items() if not k.startswith("decoder.")}
        return dataclasses.replace(
            cfg,
            model=dataclasses.replace(
                cfg.model,
                compute_dtype="bfloat16",
                visual=dataclasses.replace(
                    cfg.model.visual,
                    use_pallas_attention=True,
                    cls_stream=True,
                    **vis,
                ),
                decoder=dataclasses.replace(cfg.model.decoder, **dec),
            ),
        )

    cfg_a, cfg_b = mk(ov_a), mk(ov_b)
    model_a = VideoSaliencyModel(cfg_a.model)
    model_b = VideoSaliencyModel(cfg_b.model)
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
    variables = jax.jit(model_a.init)(
        jax.random.PRNGKey(1), init_data, jnp.zeros((1,))
    )
    tx = make_optimizer(cfg_a.optim, steps_per_epoch=1000, n_epochs=3)
    state_a = create_train_state(model_a, variables, tx)
    state_b = create_train_state(model_b, variables, tx)
    # no donation: both states stay live across interleaved rounds
    step_a = jax.jit(make_train_step(model_a, schedule, cfg_a))
    step_b = jax.jit(make_train_step(model_b, schedule, cfg_b))

    la = float(step_a(state_a, batches[0], jax.random.PRNGKey(2))[1]["total"])
    lb = float(step_b(state_b, batches[0], jax.random.PRNGKey(2))[1]["total"])
    print(f"first-step loss A {la:.4f}  B {lb:.4f}")
    assert abs(la - lb) / max(abs(la), 1.0) < 0.05, (la, lb)

    def run(step, state):
        t0 = time.perf_counter()
        m = None
        for i in range(iters):
            state, m = step(state, batches[i % 4], jax.random.PRNGKey(i))
        v = float(m["total"])
        assert v == v and v > 0  # finite, live
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
        f"median A ({sys.argv[1]}) {ma:.1f} ms/step\n"
        f"median B ({sys.argv[2]}) {mb:.1f} ms/step\n"
        f"speedup {ma / mb:.3f}x"
    )


if __name__ == "__main__":
    main()
