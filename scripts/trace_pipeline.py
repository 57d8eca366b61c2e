"""Capture an xplane trace of the full AV inference pipeline on TPU.

    python scripts/trace_pipeline.py [batch] [outdir]
    python tools/analyze_trace.py <outdir> 40
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


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/jaxtrace"
    cfg = dataclasses.replace(
        ModelConfig.audio_visual(), compute_dtype="bfloat16"
    )
    ov = {}
    if len(sys.argv) > 3:
        for part in sys.argv[3].split(","):
            k, v = part.split("=", 1)
            ov[k.strip()] = ast.literal_eval(v.strip())
    cfg = dataclasses.replace(
        cfg,
        visual=dataclasses.replace(
            cfg.visual, use_pallas_attention=True, **ov
        ),
    )
    model = VideoSaliencyModel(cfg)
    key = jax.random.PRNGKey(0)
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

    @jax.jit
    def pipeline(variables, rgb, audio, rng):
        return sample_saliency(
            model, variables, schedule, SamplingConfig(),
            DataTransformConfig(), rgb, audio, rng,
        )

    out = pipeline(variables, rgbs[0], audios[0], jax.random.PRNGKey(2))
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(20):
        out = pipeline(variables, rgbs[i % 4], audios[i % 4],
                       jax.random.PRNGKey(i))
    jax.block_until_ready(out)
    print(f"pre-trace: {(time.perf_counter() - t0) / 20 * 1e3:.1f} ms/iter")

    with jax.profiler.trace(outdir):
        for i in range(5):
            out = pipeline(variables, rgbs[i % 4], audios[i % 4],
                           jax.random.PRNGKey(100 + i))
        jax.block_until_ready(out)
    print("trace written to", outdir)


if __name__ == "__main__":
    main()
