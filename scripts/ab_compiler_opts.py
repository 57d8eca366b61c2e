"""Within-process A/B of XLA compiler options on the full AV inference
pipeline (same model, same inputs; two .lower().compile() calls).

    python scripts/ab_compiler_opts.py '{"xla_tpu_scoped_vmem_limit_kib":"49152"}' [B] [iters] [rounds]
"""

import dataclasses
import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from diff_sal_tpu.config import DataTransformConfig, ModelConfig, SamplingConfig
from diff_sal_tpu.diffusion.schedule import make_schedule
from diff_sal_tpu.inference import sample_saliency
from diff_sal_tpu.models.diff_model import VideoSaliencyModel


def main():
    opts = json.loads(sys.argv[1])
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 20
    rounds = int(sys.argv[4]) if len(sys.argv) > 4 else 5

    cfg = dataclasses.replace(
        ModelConfig.audio_visual(), compute_dtype="bfloat16"
    )
    cfg = dataclasses.replace(
        cfg,
        visual=dataclasses.replace(cfg.visual, use_pallas_attention=True),
    )
    model = VideoSaliencyModel(cfg)
    schedule = make_schedule("cosine", num_diffusion_timesteps=1000)
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
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(1),
        {"rgb": rgbs[0][:1], "input": jnp.zeros((1, 224, 384, 1)),
         "audio": audios[0][:1]},
        jnp.zeros((1,)),
    )

    def pipeline(variables, rgb, audio, rng):
        return sample_saliency(
            model, variables, schedule, SamplingConfig(),
            DataTransformConfig(), rgb, audio, rng,
        )

    lowered = jax.jit(pipeline).lower(
        variables, rgbs[0], audios[0], jax.random.PRNGKey(2)
    )
    t0 = time.perf_counter()
    f_a = lowered.compile()
    print(f"# compile A {time.perf_counter() - t0:.0f}s", flush=True)
    t0 = time.perf_counter()
    f_b = lowered.compile(compiler_options=opts)
    print(f"# compile B {time.perf_counter() - t0:.0f}s", flush=True)

    oa = f_a(variables, rgbs[0], audios[0], jax.random.PRNGKey(2))
    ob = f_b(variables, rgbs[0], audios[0], jax.random.PRNGKey(2))
    import numpy as np
    d = np.abs(np.asarray(oa, np.float32) - np.asarray(ob, np.float32)).max()
    print(f"max|A-B| = {d:.5f}")

    def run(f):
        t0 = time.perf_counter()
        out = None
        for i in range(iters):
            out = f(variables, rgbs[i % 4], audios[i % 4],
                    jax.random.PRNGKey(i))
            if i % 10 == 9:
                float(out.mean())
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / iters * 1e3

    res = {"A": [], "B": []}
    for r in range(rounds):
        res["A"].append(run(f_a))
        res["B"].append(run(f_b))
        print(f"round {r}: A {res['A'][-1]:.1f} ms/iter   "
              f"B {res['B'][-1]:.1f} ms/iter", flush=True)
    ma = sorted(res["A"])[rounds // 2]
    mb = sorted(res["B"])[rounds // 2]
    print(f"median A (default) {ma:.1f} ms/iter = {B / ma * 1e3:.1f} c/s\n"
          f"median B ({opts})  {mb:.1f} ms/iter = {B / mb * 1e3:.1f} c/s\n"
          f"speedup {ma / mb:.3f}x")


if __name__ == "__main__":
    main()
