"""Within-process A/B: default jit argument layouts vs XLA AUTO layouts
(jax.experimental.layout) on the full AV inference pipeline.

    python -u scripts/ab_auto_layout.py [B] [iters] [rounds] [what]

what: "inputs" (rgb/audio only), "params" (variables only), "both".

Hypothesis: the stem's 0.79 ms/iter input relayout copy (xplane copy.2091,
(8,16,224,384,3) default {4,3,2,1,0} -> compute-preferred {1,0,4,3,2})
exists only because jit arguments arrive in the default layout; with AUTO
the producer/device_put writes the preferred layout directly. Same for any
param relayouts (conv kernels into conv-emitter layouts).
"""

import dataclasses
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax.experimental.layout import Format, Layout

jax.config.update("jax_compilation_cache_dir", ".jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from diff_sal_tpu.config import DataTransformConfig, ModelConfig, SamplingConfig
from diff_sal_tpu.diffusion.schedule import make_schedule
from diff_sal_tpu.inference import sample_saliency
from diff_sal_tpu.models.diff_model import VideoSaliencyModel


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    what = sys.argv[4] if len(sys.argv) > 4 else "inputs"

    cfg = dataclasses.replace(
        ModelConfig.audio_visual(), compute_dtype="bfloat16"
    )
    cfg = dataclasses.replace(
        cfg,
        visual=dataclasses.replace(
            cfg.visual, use_pallas_attention=True, cls_stream=True
        ),
    )
    model = VideoSaliencyModel(cfg)
    key = jax.random.PRNGKey(0)
    rgbs = [
        jax.random.normal(jax.random.fold_in(key, i), (B, 16, 224, 384, 3))
        * 0.5
        for i in range(4)
    ]
    audios = [
        jax.random.normal(jax.random.fold_in(key, 50 + i), (B, 9, 112, 192, 1))
        for i in range(4)
    ]
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(1),
        {"rgb": rgbs[0][:1], "input": jnp.zeros((1, 224, 384, 1)),
         "audio": audios[0][:1]},
        jnp.zeros((1,)),
    )
    schedule = make_schedule("cosine", num_diffusion_timesteps=1000)
    sampling, dtc = SamplingConfig(), DataTransformConfig()

    def f(variables, rgb, audio, rng):
        return sample_saliency(
            model, variables, schedule, sampling, dtc, rgb, audio, rng
        )

    # A: default layouts
    pa = jax.jit(f)
    oa = pa(variables, rgbs[0], audios[0], jax.random.PRNGKey(2))
    jax.block_until_ready(oa)

    # B: AUTO layouts
    auto = Format(Layout.AUTO)
    df = Format()
    in_fmt = (
        jax.tree_util.tree_map(lambda _: auto if what in ("params", "both")
                               else df, variables),
        auto if what in ("inputs", "both") else df,
        auto if what in ("inputs", "both") else df,
        df,
    )
    pb = jax.jit(f, in_shardings=in_fmt)
    lowered = pb.lower(variables, rgbs[0], audios[0], jax.random.PRNGKey(2))
    compiled = lowered.compile()
    fmts = compiled.input_formats[0]
    vb, r0, a0, _ = jax.device_put(
        (variables, rgbs[0], audios[0], jax.random.PRNGKey(2)), fmts
    )
    rbs = [jax.device_put(r, fmts[1]) for r in rgbs]
    abs_ = [jax.device_put(a, fmts[2]) for a in audios]
    rng2 = jax.device_put(jax.random.PRNGKey(2), fmts[3])
    rngs = [jax.device_put(jax.random.PRNGKey(i), fmts[3]) for i in range(iters)]
    ob = compiled(vb, rbs[0], abs_[0], rng2)
    jax.block_until_ready(ob)
    d = float(jnp.abs(oa.astype(jnp.float32) - ob.astype(jnp.float32)).max())
    print(f"max|A-B| = {d:.5f}")
    assert d < 0.05, d

    def run(p, v, rs, aus, rgs):
        t0 = time.perf_counter()
        out = None
        for i in range(iters):
            out = p(v, rs[i % 4], aus[i % 4], rgs[i])
        s = float(out.mean())
        assert 0.0 < s < 1.0, s
        return (time.perf_counter() - t0) / iters * 1000

    rngs_a = [jax.random.PRNGKey(i) for i in range(iters)]
    res = {"A": [], "B": []}
    for r in range(rounds):
        res["A"].append(run(pa, variables, rgbs, audios, rngs_a))
        res["B"].append(run(compiled, vb, rbs, abs_, rngs))
        print(
            f"round {r}: A {res['A'][-1]:.1f} ms/iter   "
            f"B {res['B'][-1]:.1f} ms/iter"
        )
    ma = sorted(res["A"])[rounds // 2]
    mb = sorted(res["B"])[rounds // 2]
    print(
        f"median A (default) {ma:.1f} ms/iter = {B / ma * 1000:.1f} c/s\n"
        f"median B (auto {what}) {mb:.1f} ms/iter = {B / mb * 1000:.1f} c/s\n"
        f"speedup {ma / mb:.3f}x"
    )


if __name__ == "__main__":
    main()
