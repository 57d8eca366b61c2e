"""Benchmark: audio-visual saliency inference throughput, clips/sec/chip.

End-to-end per clip (the BASELINE north star): VGGish on 9 log-mel examples
+ AudioAttnNet, MViT-small on 16 frames @ 224x384, SalUNet denoising at the
configured NFE, inverse transform — one jitted program, batched.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: the reference repo publishes no throughput numbers
(BASELINE.md); the denominator is a modeled estimate of the CUDA reference
on one RTX 4090 — ~0.25 TFLOP/clip at 35% utilization of 82 TFLOP/s fp16
=> ~115 clips/s — kept fixed across rounds so the ratio is comparable.
"""

import json
import time

REF_CLIPS_PER_SEC_4090_EST = 115.0


def main():
    import dataclasses
    import os

    import jax

    # persistent compile cache: repeated bench runs skip the ~3 min compile
    cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    import jax.numpy as jnp

    from diff_sal_tpu.config import (
        DataTransformConfig,
        ModelConfig,
        SamplingConfig,
    )
    from diff_sal_tpu.diffusion.schedule import make_schedule
    from diff_sal_tpu.inference import sample_saliency
    from diff_sal_tpu.models.diff_model import VideoSaliencyModel

    # throughput is flat in batch (compute-bound per clip); B=2 compiles
    # fastest
    B = int(os.environ.get("BENCH_BATCH", 2))
    dtype = os.environ.get("BENCH_DTYPE", "bfloat16")
    use_pallas = os.environ.get("BENCH_PALLAS", "1") == "1"
    cfg = dataclasses.replace(ModelConfig.audio_visual(), compute_dtype=dtype)
    if use_pallas:
        cfg = dataclasses.replace(
            cfg,
            visual=dataclasses.replace(cfg.visual, use_pallas_attention=True),
        )
    model = VideoSaliencyModel(cfg)
    key = jax.random.PRNGKey(0)
    # rotate distinct inputs so no caching layer can shortcut real work
    n_inputs = 4
    rgbs = [
        jax.random.normal(jax.random.fold_in(key, i), (B, 16, 224, 384, 3)) * 0.5
        for i in range(n_inputs)
    ]
    audios = [
        jax.random.normal(jax.random.fold_in(key, 50 + i), (B, 9, 112, 192, 1))
        for i in range(n_inputs)
    ]
    rgb, audio = rgbs[0], audios[0]

    variables = jax.jit(model.init)(
        jax.random.PRNGKey(1),
        {"rgb": rgb[:1], "input": jnp.zeros((1, 224, 384, 1)), "audio": audio[:1]},
        jnp.zeros((1,)),
    )
    schedule = make_schedule("cosine", num_diffusion_timesteps=1000)
    sampling = SamplingConfig()  # ddim, NFE=1 (shipping default)
    dt_cfg = DataTransformConfig()

    @jax.jit
    def pipeline(variables, rgb, audio, rng):
        return sample_saliency(
            model, variables, schedule, sampling, dt_cfg, rgb, audio, rng
        )

    # warmup / compile (fall back to the XLA attention path if the Pallas
    # kernel fails to compile in this environment)
    import sys

    t_c = time.perf_counter()
    try:
        out = pipeline(variables, rgb, audio, jax.random.PRNGKey(2))
        jax.block_until_ready(out)
    except Exception as e:  # noqa: BLE001
        if not use_pallas:
            raise
        print(f"# pallas path failed ({type(e).__name__}); falling back",
              file=sys.stderr)
        cfg = dataclasses.replace(
            cfg, visual=dataclasses.replace(cfg.visual,
                                            use_pallas_attention=False)
        )
        model = VideoSaliencyModel(cfg)

        @jax.jit
        def pipeline(variables, rgb, audio, rng):
            return sample_saliency(
                model, variables, schedule, sampling, dt_cfg, rgb, audio, rng
            )

        out = pipeline(variables, rgb, audio, jax.random.PRNGKey(2))
        jax.block_until_ready(out)
    print(f"# compile+warmup {time.perf_counter() - t_c:.1f}s", file=sys.stderr)

    iters = 100
    means = []
    t0 = time.perf_counter()
    for i in range(iters):
        out = pipeline(
            variables, rgbs[i % n_inputs], audios[i % n_inputs],
            jax.random.PRNGKey(i),
        )
        if i % 10 == 9:
            # periodic host sync: guards against any async layer silently
            # dropping work (costs ~5% overhead, keeps the number honest)
            means.append(float(out.mean()))
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    # sanity: outputs are real saliency maps, not a DCE'd stub
    o = out
    assert o.shape == (B, 224, 384, 1) and float(o.min()) >= 0.0
    assert float(o.max()) <= 1.0 and float(o.std()) > 0.0
    assert all(0.0 < m < 1.0 for m in means), means

    n_chips = jax.device_count()
    clips_per_sec = B * iters / dt / n_chips
    print(
        json.dumps(
            {
                "metric": "av_saliency_inference_throughput",
                "value": round(clips_per_sec, 3),
                "unit": "clips/sec/chip",
                "vs_baseline": round(clips_per_sec / REF_CLIPS_PER_SEC_4090_EST, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
