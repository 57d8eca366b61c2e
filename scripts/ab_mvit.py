"""Within-process A/B of two MViTConfig variants on the full AV inference
pipeline, one TPU chip.

    python scripts/ab_mvit.py 'lane_pad=False' 'lane_pad=True' [B] [iters] [rounds]

Each of the first two args is a comma-separated list of MViTConfig field
overrides (values parsed with ast.literal_eval). Both variants share ONE
param tree (init'd from variant A) — the A/B is layout-only, so outputs
must agree to bf16 tolerance before timing starts. Interleaved rounds with
per-round host syncs — the only trustworthy comparison on the axon tunnel
(docs/PERF.md measurement integrity).
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

from diff_sal_tpu.config import DataTransformConfig, ModelConfig, SamplingConfig
from diff_sal_tpu.diffusion.schedule import make_schedule
from diff_sal_tpu.inference import sample_saliency
from diff_sal_tpu.models.diff_model import VideoSaliencyModel


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
    B = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    iters = int(sys.argv[4]) if len(sys.argv) > 4 else 20
    rounds = int(sys.argv[5]) if len(sys.argv) > 5 else 5

    base = dataclasses.replace(
        ModelConfig.audio_visual(), compute_dtype="bfloat16"
    )

    def mk(ov):
        # "decoder."-prefixed overrides hit SalUNetConfig; bare ones MViTConfig
        dec = {k[8:]: v for k, v in ov.items() if k.startswith("decoder.")}
        vis = {k: v for k, v in ov.items() if not k.startswith("decoder.")}
        cfg = dataclasses.replace(
            base,
            visual=dataclasses.replace(
                base.visual, use_pallas_attention=True, cls_stream=True, **vis
            ),
            decoder=dataclasses.replace(base.decoder, **dec),
        )
        return VideoSaliencyModel(cfg)

    model_a, model_b = mk(ov_a), mk(ov_b)
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
    variables = jax.jit(model_a.init)(
        jax.random.PRNGKey(1),
        {"rgb": rgbs[0][:1], "input": jnp.zeros((1, 224, 384, 1)),
         "audio": audios[0][:1]},
        jnp.zeros((1,)),
    )
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
    d = float(jnp.abs(oa.astype(jnp.float32) - ob.astype(jnp.float32)).max())
    print(f"max|A-B| = {d:.5f}")
    assert d < 0.05, d
    assert float(oa.std()) > 0

    def run(p):
        t0 = time.perf_counter()
        out = None
        for i in range(iters):
            out = p(variables, rgbs[i % 4], audios[i % 4],
                    jax.random.PRNGKey(i))
        s = float(out.mean())
        assert 0.0 < s < 1.0, s
        return (time.perf_counter() - t0) / iters * 1000

    res = {"A": [], "B": []}
    for r in range(rounds):
        res["A"].append(run(pa))
        res["B"].append(run(pb))
        print(
            f"round {r}: A {res['A'][-1]:.1f} ms/iter   "
            f"B {res['B'][-1]:.1f} ms/iter"
        )
    ma = sorted(res["A"])[rounds // 2]
    mb = sorted(res["B"])[rounds // 2]
    print(
        f"median A ({sys.argv[1]}) {ma:.1f} ms/iter = {B / ma * 1000:.1f} c/s\n"
        f"median B ({sys.argv[2]}) {mb:.1f} ms/iter = {B / mb * 1000:.1f} c/s\n"
        f"speedup {ma / mb:.3f}x"
    )


if __name__ == "__main__":
    main()
