"""Within-process A/B of int8 MLP quantization on the full AV inference
pipeline, one TPU chip (VERDICT r3 item 4).

    python scripts/ab_quant.py w8|w8a8 [B] [iters] [rounds]

A = shipping fp defaults; B = same weights with MViTConfig.mlp_quant set,
the param tree transformed by quantize_like. Reports median ms/iter for
both, the e2e max|A-B| on the final saliency maps, and CC/SIM/NSS of B's
maps against A's (the fixed-batch metric-delta contract from the
shipping-defaults parity bound). Interleaved rounds with per-round host
syncs — the only trustworthy comparison on the axon tunnel (docs/PERF.md).
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
from diff_sal_tpu.ops.quant import quantize_like


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "w8"
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 20
    rounds = int(sys.argv[4]) if len(sys.argv) > 4 else 5

    base = dataclasses.replace(
        ModelConfig.audio_visual(), compute_dtype="bfloat16"
    )
    cfg_q = dataclasses.replace(
        base, visual=dataclasses.replace(base.visual, mlp_quant=mode)
    )
    model_a = VideoSaliencyModel(base)
    model_b = VideoSaliencyModel(cfg_q)

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
    import flax.core

    variables = jax.jit(model_a.init)(jax.random.PRNGKey(1), *ex)
    q_tmpl = jax.eval_shape(model_b.init, jax.random.PRNGKey(1), *ex)
    variables_q = quantize_like(
        flax.core.unfreeze(jax.device_get(variables)),
        flax.core.unfreeze(q_tmpl),
    )
    variables_q = jax.device_put(variables_q)
    n_int8 = sum(
        p.size for p in jax.tree_util.tree_leaves(variables_q)
        if p.dtype == jnp.int8
    )
    print(f"int8 params: {n_int8 / 1e6:.1f}M")

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
    ob = pb(variables_q, rgbs[0], audios[0], jax.random.PRNGKey(2))
    jax.block_until_ready((oa, ob))
    a = np.asarray(oa, np.float32)
    b = np.asarray(ob, np.float32)
    print(f"max|A-B| = {np.abs(a - b).max():.5f}")
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
        res["B"].append(run(pb, variables_q))
        print(
            f"round {r}: A {res['A'][-1]:.1f} ms/iter   "
            f"B {res['B'][-1]:.1f} ms/iter"
        )
    ma = sorted(res["A"])[rounds // 2]
    mb = sorted(res["B"])[rounds // 2]
    print(
        f"median A (fp) {ma:.1f} ms/iter = {B / ma * 1000:.1f} c/s\n"
        f"median B ({mode}) {mb:.1f} ms/iter = {B / mb * 1000:.1f} c/s\n"
        f"speedup {ma / mb:.3f}x"
    )


if __name__ == "__main__":
    main()
