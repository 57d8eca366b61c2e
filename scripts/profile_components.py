"""Per-component TPU timing with varying inputs (defeats any upstream
memoization): MViT / VGGish+AudioAttn / SalUNet denoise / full pipeline.

    python scripts/profile_components.py [batch] [dtype]
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


def timeit(fn, args_list, iters=8):
    out = fn(*args_list[0])
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(iters):
        out = fn(*args_list[i % len(args_list)])
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    dtype = sys.argv[2] if len(sys.argv) > 2 else "bfloat16"
    cfg = dataclasses.replace(ModelConfig.audio_visual(), compute_dtype=dtype)
    model = VideoSaliencyModel(cfg)
    key = jax.random.PRNGKey(0)
    mk = lambda i, shape: jax.random.normal(  # noqa: E731
        jax.random.fold_in(key, i), shape, jnp.float32
    )
    rgbs = [mk(i, (B, 16, 224, 384, 3)) for i in range(4)]
    audios = [mk(i + 10, (B, 9, 112, 192, 1)) for i in range(4)]
    xs = [mk(i + 20, (B, 224, 384, 1)) for i in range(4)]
    t = jnp.zeros((B,))
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(1),
        {"rgb": rgbs[0][:1], "input": xs[0][:1], "audio": audios[0][:1]},
        t[:1],
    )
    enc_v = jax.jit(
        lambda v, r: model.apply(v, r, method=VideoSaliencyModel.encode_visual)
    )
    enc_a = jax.jit(
        lambda v, a: model.apply(v, a, method=VideoSaliencyModel.encode_audio)
    )
    feats = enc_v(variables, rgbs[0])
    afeat = enc_a(variables, audios[0])
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
    t_v = timeit(enc_v, [(variables, r) for r in rgbs])
    t_a = timeit(enc_a, [(variables, a) for a in audios])
    t_d = timeit(den, [(variables, x, t, feats, afeat) for x in xs])
    t_p = timeit(
        pipe,
        [(variables, r, a, jax.random.fold_in(key, 99 + i))
         for i, (r, a) in enumerate(zip(rgbs, audios))],
    )
    print(
        f"{dtype}: B={B} mvit {t_v*1e3:.1f}ms  audio {t_a*1e3:.1f}ms  "
        f"denoise {t_d*1e3:.1f}ms  pipeline {t_p*1e3:.1f}ms  "
        f"-> {B/t_p:.1f} clips/s",
        flush=True,
    )


if __name__ == "__main__":
    main()
