"""Per-component TPU timing: MViT / VGGish+AudioAttn / SalUNet / full
pipeline, f32 vs bf16. Run on the real chip:

    python scripts/profile_components.py [batch]
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


def timeit(fn, *args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    for dtype in ("float32", "bfloat16"):
        cfg = dataclasses.replace(
            ModelConfig.audio_visual(), compute_dtype=dtype
        )
        model = VideoSaliencyModel(cfg)
        rgb = jnp.zeros((B, 16, 224, 384, 3))
        audio = jnp.zeros((B, 9, 112, 192, 1))
        x = jnp.zeros((B, 224, 384, 1))
        t = jnp.zeros((B,))
        variables = jax.jit(model.init)(
            jax.random.PRNGKey(0),
            {"rgb": rgb[:1], "input": x[:1], "audio": audio[:1]},
            t[:1],
        )
        enc_v = jax.jit(
            lambda v, r: model.apply(v, r, method=VideoSaliencyModel.encode_visual)
        )
        enc_a = jax.jit(
            lambda v, a: model.apply(v, a, method=VideoSaliencyModel.encode_audio)
        )
        feats = enc_v(variables, rgb)
        afeat = enc_a(variables, audio)
        den = jax.jit(
            lambda v, x, t, fs, af: model.apply(
                v, x, t, fs, af, method=VideoSaliencyModel.denoise
            )
        )
        schedule = make_schedule("cosine", num_diffusion_timesteps=1000)
        pipe = jax.jit(
            lambda v, r, a, rng: sample_saliency(
                model, v, schedule, SamplingConfig(), DataTransformConfig(),
                r, a, rng,
            )
        )
        t_v = timeit(enc_v, variables, rgb)
        t_a = timeit(enc_a, variables, audio)
        t_d = timeit(den, variables, x, t, feats, afeat)
        t_p = timeit(pipe, variables, rgb, audio, jax.random.PRNGKey(0))
        print(
            f"{dtype}: B={B} mvit {t_v*1e3:.1f}ms  audio {t_a*1e3:.1f}ms  "
            f"denoise {t_d*1e3:.1f}ms  pipeline {t_p*1e3:.1f}ms  "
            f"-> {B/t_p:.1f} clips/s",
            flush=True,
        )


if __name__ == "__main__":
    main()
