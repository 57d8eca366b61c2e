"""Bisect the round-4 dpm++2m NFE=5 10x collapse (VERDICT r4 item 2:
55.0 -> 5.7 clips/s in BENCH_r03 -> BENCH_r04 while NFE=2 improved).

    python scripts/bisect_nfe5.py [B] [iters]

Measures DPM-Solver++ multistep-2 NFE=5 throughput under four configs:
  base      shipping defaults (skip_dead_frames_all=True, fused_tail=True)
  no_sdfa   skip_dead_frames_all=False (the round-4 default flip)
  no_sdf    skip_dead_frames=False too (full-frame decoder graph)
  no_pallas use_pallas_attention=False

plus DDIM NFE=1 and dpm++ NFE=2 under base for the within-run ratio.
Each config: warmup call, then `iters` timed with rotated inputs and a
final host sync + liveness check (axon-tunnel discipline, docs/PERF.md).
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

from diff_sal_tpu.config import (DataTransformConfig, ModelConfig,
                                 SamplingConfig)
from diff_sal_tpu.diffusion.schedule import make_schedule
from diff_sal_tpu.inference import sample_saliency
from diff_sal_tpu.models.diff_model import VideoSaliencyModel


def dpm(nfe):
    return SamplingConfig(
        sample_type="dpmsolver++",
        timesteps=nfe,
        dpm_solver_method="multistep",
        dpm_solver_order=2,
        skip_type="logSNR",
    )


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 20

    base = dataclasses.replace(
        ModelConfig.audio_visual(), compute_dtype="bfloat16"
    )
    base = dataclasses.replace(
        base, visual=dataclasses.replace(base.visual,
                                         use_pallas_attention=True)
    )
    variants = {
        "base": base,
        "no_sdfa": dataclasses.replace(
            base,
            decoder=dataclasses.replace(base.decoder,
                                        skip_dead_frames_all=False),
        ),
        "no_sdf": dataclasses.replace(
            base,
            decoder=dataclasses.replace(
                base.decoder,
                skip_dead_frames_all=False,
                skip_dead_frames=False,
            ),
        ),
        "no_pallas": dataclasses.replace(
            base,
            visual=dataclasses.replace(base.visual,
                                       use_pallas_attention=False),
        ),
    }

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
    model0 = VideoSaliencyModel(base)
    variables = jax.jit(model0.init)(
        jax.random.PRNGKey(1),
        {"rgb": rgbs[0][:1], "input": jnp.zeros((1, 224, 384, 1)),
         "audio": audios[0][:1]},
        jnp.zeros((1,)),
    )
    schedule = make_schedule("cosine", num_diffusion_timesteps=1000)
    dtc = DataTransformConfig()

    def measure(tag, cfg, sampling):
        model = VideoSaliencyModel(cfg)

        @jax.jit
        def f(variables, rgb, audio, rng):
            return sample_saliency(
                model, variables, schedule, sampling, dtc, rgb, audio, rng
            )

        t_c = time.perf_counter()
        out = f(variables, rgbs[0], audios[0], jax.random.PRNGKey(2))
        jax.block_until_ready(out)
        compile_s = time.perf_counter() - t_c
        t0 = time.perf_counter()
        for i in range(iters):
            out = f(variables, rgbs[i % 4], audios[i % 4],
                    jax.random.PRNGKey(i))
            if i % 5 == 4:
                m = float(out.mean())
                assert 0.0 < m < 1.0, m
        jax.block_until_ready(out)
        ms = (time.perf_counter() - t0) / iters * 1000
        assert float(out.std()) > 0
        print(
            f"{tag:30s} {ms:8.1f} ms/iter  {B / ms * 1000:7.1f} clips/s  "
            f"(warm+compile {compile_s:.1f}s)",
            flush=True,
        )
        return ms

    measure("base ddim_nfe1", base, SamplingConfig())
    measure("base dpmpp2m_nfe2", base, dpm(2))
    for tag, cfg in variants.items():
        measure(f"{tag} dpmpp2m_nfe5", cfg, dpm(5))
    # repeat base NFE=5 at the end: a tunnel/host transient shows up as a
    # first-vs-last mismatch on the identical program
    measure("base dpmpp2m_nfe5 (repeat)", base, dpm(5))


if __name__ == "__main__":
    main()
