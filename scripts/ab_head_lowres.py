"""Within-process A/B of the head_lowres mt_proj restructure on the full
AV inference pipeline, one TPU chip (VERDICT r4 item 3 — the chain runs at
5.7x its ~0.69 ms byte floor, ~4 ms/iter at stake).

    python scripts/ab_head_lowres.py [B] [iters] [rounds]

A = shipping defaults (stock bilinear_resize_sum + XLA conv3x3 768->96);
B = SalUNetConfig.head_lowres=True (conv-at-low-res via
resize_sum_conv_relu_phase, lowres fallback) — SAME param tree, eval-only
lowering. Reports median ms/iter both ways, e2e max|A-B| on the final
saliency maps, and CC/SIM/NSS of B vs A (the fixed-batch metric-delta
contract). Interleaved rounds with per-round host syncs (docs/PERF.md).
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

from diff_sal_tpu.config import (DataTransformConfig, ModelConfig,
                                 SamplingConfig)
from diff_sal_tpu.diffusion.schedule import make_schedule
from diff_sal_tpu.inference import sample_saliency
from diff_sal_tpu.metrics.saliency import CC, NSS, SIM
from diff_sal_tpu.models.diff_model import VideoSaliencyModel


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 5

    base = dataclasses.replace(
        ModelConfig.audio_visual(), compute_dtype="bfloat16"
    )
    cfg_b = dataclasses.replace(
        base, decoder=dataclasses.replace(base.decoder, head_lowres=True)
    )
    model_a = VideoSaliencyModel(base)
    model_b = VideoSaliencyModel(cfg_b)

    key = jax.random.PRNGKey(0)
    rgbs = [
        jax.random.normal(jax.random.fold_in(key, i), (B, 16, 224, 384, 3))
        * 0.5
        for i in range(4)
    ]
    audios = [
        jax.random.normal(jax.random.fold_in(key, 50 + i),
                          (B, 9, 112, 192, 1))
        for i in range(4)
    ]
    ex = (
        {"rgb": rgbs[0][:1], "input": jnp.zeros((1, 224, 384, 1)),
         "audio": audios[0][:1]},
        jnp.zeros((1,)),
    )
    variables = jax.jit(model_a.init)(jax.random.PRNGKey(1), *ex)

    schedule = make_schedule("cosine", num_diffusion_timesteps=1000)
    sampling, dtc = SamplingConfig(), DataTransformConfig()

    def pipe(model):
        @jax.jit
        def f(variables, rgb, audio, rng):
            return sample_saliency(
                model, variables, schedule, sampling, dtc, rgb, audio, rng
            )

        return f

    pa, pb = pipe(model_a), pipe(model_b)
    oa = pa(variables, rgbs[0], audios[0], jax.random.PRNGKey(2))
    ob = pb(variables, rgbs[0], audios[0], jax.random.PRNGKey(2))
    jax.block_until_ready((oa, ob))
    a = np.asarray(oa, np.float32)
    b = np.asarray(ob, np.float32)
    print(f"max|A-B| = {np.abs(a - b).max():.6f}")
    ccs, sims, nss_rel = [], [], []
    for i in range(a.shape[0]):
        sa, sb = a[i, ..., 0], b[i, ..., 0]
        ccs.append(CC(sb, sa))
        sims.append(SIM(sb, sa))
        fix = sa > np.quantile(sa, 0.97)  # pseudo-fixations from A
        na, nb = NSS(sa, fix), NSS(sb, fix)
        nss_rel.append(abs(nb - na) / max(abs(na), 1e-6))
    print(
        f"metric deltas (B vs A, {a.shape[0]} maps): "
        f"CC {np.mean(ccs):.5f}  SIM {np.mean(sims):.5f}  "
        f"NSS rel {100 * np.mean(nss_rel):.3f}%"
    )
    assert float(oa.std()) > 0 and float(ob.std()) > 0

    def run(p, v):
        t0 = time.perf_counter()
        out = None
        for i in range(iters):
            out = p(v, rgbs[i % 4], audios[i % 4], jax.random.PRNGKey(i))
        s = float(out.mean())
        assert 0.0 < s < 1.0, s
        return (time.perf_counter() - t0) / iters * 1000

    res = {"A": [], "B": []}
    for r in range(rounds):
        res["A"].append(run(pa, variables))
        res["B"].append(run(pb, variables))
        print(
            f"round {r}: A {res['A'][-1]:.1f} ms/iter   "
            f"B {res['B'][-1]:.1f} ms/iter"
        )
    ma = sorted(res["A"])[rounds // 2]
    mb = sorted(res["B"])[rounds // 2]
    print(
        f"median A (stock) {ma:.1f} ms/iter = {B / ma * 1000:.1f} c/s\n"
        f"median B (head_lowres) {mb:.1f} ms/iter = {B / mb * 1000:.1f} c/s\n"
        f"speedup {ma / mb:.3f}x"
    )


if __name__ == "__main__":
    main()
