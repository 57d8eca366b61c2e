"""Train-path skip_dead_frames_all study (VERDICT r4 item 4).

Perf A/B (default):

    python scripts/ab_train_sdf.py [B] [iters] [rounds]

A = shipping defaults (training keeps the reference's full-frame decoder
graph); B = SalUNetConfig.skip_dead_frames_train=True (the every-stage
9f->5f dead-frame cut applied inside the training graph too). The cut is
APPROXIMATE: forward and gradients differ only through the stage-1..3 av
gates' time-means (5 surviving frames instead of 9) — so no loss-equality
assert; the first-step loss delta is printed instead.

Overfit-equivalence gate:

    python scripts/ab_train_sdf.py --overfit [steps]

Trains BOTH variants from the identical init on the synthetic AV blob set
(full-res shapes) and prints side-by-side loss curves plus final
train-set eval scores (CC/SIM/NSS). The lever ships default-ON only if
the curves and final scores are statistically indistinguishable
(docs/PERF.md round 5 records the run).
"""

import dataclasses
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", ".jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from diff_sal_tpu.config import audio_visual_experiment
from diff_sal_tpu.diffusion.schedule import make_schedule
from diff_sal_tpu.models.diff_model import VideoSaliencyModel
from diff_sal_tpu.train.optim import make_optimizer
from diff_sal_tpu.train.train_step import create_train_state, make_train_step


def _configs():
    cfg = audio_visual_experiment()
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, compute_dtype="bfloat16")
    )
    cfg_b = dataclasses.replace(
        cfg,
        model=dataclasses.replace(
            cfg.model,
            decoder=dataclasses.replace(
                cfg.model.decoder, skip_dead_frames_train=True
            ),
        ),
    )
    return cfg, cfg_b


def _rand_batches(B, key, n=4):
    return [
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
        for i in range(n)
    ]


def _init_state(model, cfg, batches):
    init_data = {
        "rgb": batches[0]["rgb"][:1],
        "input": jnp.zeros((1, 224, 384, 1)),
        "audio": batches[0]["audio"][:1],
    }
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(1), init_data, jnp.zeros((1,))
    )
    tx = make_optimizer(cfg.optim, steps_per_epoch=1000, n_epochs=3)
    return create_train_state(model, variables, tx)


def perf(B, iters, rounds):
    cfg, cfg_b = _configs()
    model_a = VideoSaliencyModel(cfg.model)
    model_b = VideoSaliencyModel(cfg_b.model)
    schedule = make_schedule("cosine", num_diffusion_timesteps=1000)
    batches = _rand_batches(B, jax.random.PRNGKey(0))
    state = _init_state(model_a, cfg, batches)
    keys = [jax.random.PRNGKey(i) for i in range(max(iters, 3))]

    step_a = jax.jit(make_train_step(model_a, schedule, cfg))
    step_b = jax.jit(make_train_step(model_b, schedule, cfg_b))
    la = float(step_a(state, batches[0], keys[2])[1]["total"])
    lb = float(step_b(state, batches[0], keys[2])[1]["total"])
    print(f"first-step loss A {la:.6f}  B {lb:.6f}  "
          f"rel delta {abs(la - lb) / max(abs(la), 1e-9):.2e}")

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
        print(f"round {r}: A {res['A'][-1]:.1f} ms/step   "
              f"B {res['B'][-1]:.1f} ms/step")
    ma = sorted(res["A"])[rounds // 2]
    mb = sorted(res["B"])[rounds // 2]
    print(f"median A (full-frame train graph) {ma:.1f} ms/step\n"
          f"median B (skip_dead_frames_train) {mb:.1f} ms/step\n"
          f"speedup {ma / mb:.3f}x")


def overfit(steps):
    from diff_sal_tpu.data.loader import collate
    from diff_sal_tpu.data.synthetic import SyntheticAVDataset
    from diff_sal_tpu.train.losses import eval_scores

    cfg, cfg_b = _configs()
    schedule = make_schedule("cosine", num_diffusion_timesteps=1000)
    ds = SyntheticAVDataset(n=8)
    B = 4
    batches = [
        {
            k: jnp.asarray(v)
            for k, v in collate([ds[i] for i in range(j * B, (j + 1) * B)]).items()
            if k in ("rgb", "salmap", "audio")
        }
        for j in range(len(ds) // B)
    ]
    curves = {}
    for tag, c in (("A", cfg), ("B", cfg_b)):
        model = VideoSaliencyModel(c.model)
        state = _init_state(model, c, batches)
        step = jax.jit(make_train_step(model, schedule, c))
        losses = []
        t0 = time.perf_counter()
        for i in range(steps):
            state, m = step(state, batches[i % len(batches)],
                            jax.random.PRNGKey(i))
            if i % 25 == 0 or i == steps - 1:
                losses.append((i, float(m["total"])))
                print(f"{tag} step {i:4d}  loss {losses[-1][1]:.5f}", flush=True)
        print(f"{tag} trained {steps} steps in {time.perf_counter()-t0:.0f}s")
        # final train-set eval: DDIM NFE=1 sample vs GT
        from diff_sal_tpu.inference import sample_saliency

        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}
        samp = jax.jit(
            lambda v, rgb, audio: sample_saliency(
                model, v, schedule, c.sampling, c.data_transform,
                rgb, audio, jax.random.PRNGKey(0),
            )
        )
        scs = []
        for b in batches:
            pred = samp(variables, b["rgb"], b["audio"])
            s = eval_scores(pred, b["salmap"])
            scs.append({k: float(v) for k, v in s.items()})
        agg = {k: float(np.mean([s[k] for s in scs])) for k in scs[0]}
        print(f"{tag} final eval: " +
              "  ".join(f"{k}={v:.4f}" for k, v in agg.items()))
        curves[tag] = (losses, agg)

    la, lb = curves["A"][0], curves["B"][0]
    print("\nstep   lossA    lossB")
    for (i, a), (_, b) in zip(la, lb):
        print(f"{i:4d}  {a:.5f}  {b:.5f}")
    ea, eb = curves["A"][1], curves["B"][1]
    print("eval  A: " + "  ".join(f"{k}={v:.4f}" for k, v in ea.items()))
    print("eval  B: " + "  ".join(f"{k}={v:.4f}" for k, v in eb.items()))


if __name__ == "__main__":
    if "--overfit" in sys.argv:
        args = [a for a in sys.argv[1:] if a != "--overfit"]
        overfit(int(args[0]) if args else 300)
    else:
        B = int(sys.argv[1]) if len(sys.argv) > 1 else 4
        iters = int(sys.argv[2]) if len(sys.argv) > 2 else 15
        rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 5
        perf(B, iters, rounds)
