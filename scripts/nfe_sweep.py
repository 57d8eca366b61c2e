"""Few-step sampler sweep (BASELINE config #5): throughput at NFE 1/2/5 for
DDIM and DPM-Solver++ multistep order 2.

    python scripts/nfe_sweep.py [batch]
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

from diff_sal_tpu.config import DataTransformConfig, ModelConfig, SamplingConfig
from diff_sal_tpu.diffusion.schedule import make_schedule
from diff_sal_tpu.inference import sample_saliency
from diff_sal_tpu.models.diff_model import VideoSaliencyModel


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    cfg = dataclasses.replace(
        ModelConfig.audio_visual(), compute_dtype="bfloat16"
    )
    cfg = dataclasses.replace(
        cfg, visual=dataclasses.replace(cfg.visual, use_pallas_attention=True)
    )
    model = VideoSaliencyModel(cfg)
    key = jax.random.PRNGKey(0)
    N = 20
    rgbs = [
        jax.random.normal(jax.random.fold_in(key, i), (B, 16, 224, 384, 3))
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
    dt = DataTransformConfig()

    configs = [
        ("ddim_nfe1", SamplingConfig()),
        ("ddim_nfe2", dataclasses.replace(SamplingConfig(), timesteps=2)),
        ("ddim_nfe5", dataclasses.replace(SamplingConfig(), timesteps=5)),
        ("dpm++2m_nfe2", SamplingConfig(
            sample_type="dpmsolver++", timesteps=2, dpm_solver_order=2,
            dpm_solver_method="multistep", denoise=True)),
        ("dpm++2m_nfe5", SamplingConfig(
            sample_type="dpmsolver++", timesteps=5, dpm_solver_order=2,
            dpm_solver_method="multistep", denoise=True)),
    ]
    for name, scfg in configs:
        pipe = jax.jit(
            lambda v, r, a, rng, scfg=scfg: sample_saliency(
                model, v, schedule, scfg, dt, r, a, rng
            )
        )
        out = pipe(variables, rgbs[0], audios[0], jax.random.PRNGKey(9))
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for i in range(N):
            out = pipe(
                variables, rgbs[i % 4], audios[i % 4],
                jax.random.fold_in(key, 100 + i),
            )
        jax.block_until_ready(out)
        dt_s = (time.perf_counter() - t0) / N
        print(
            f"{name}: {dt_s*1e3:.2f} ms/iter -> {B/dt_s:.1f} clips/s/chip",
            flush=True,
        )


if __name__ == "__main__":
    main()
