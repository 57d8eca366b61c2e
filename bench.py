"""Benchmark: audio-visual saliency inference throughput, clips/sec/chip.

End-to-end per clip (the BASELINE north star): VGGish on 9 log-mel examples
+ AudioAttnNet, MViT-small on 16 frames @ 224x384, SalUNet denoising at the
configured NFE, inverse transform — one jitted program, batched.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "config",
"sweep"}. The headline `value` is the shipping inference config (DDIM,
timesteps=1 => NFE=1, reference cfgs/diffusion.yml:63-66) at the best batch
size of a {2,4,8} sweep; `sweep` additionally reports the DPM-Solver++
multistep-2 path (reference cfgs/diffusion.yml:67-77) at NFE 2 and 5 —
BASELINE.json's "few-step sampler sweep (1/2/5 NFE)" config.

vs_baseline: the reference repo publishes no throughput numbers
(BASELINE.md); the denominator is a modeled estimate of the CUDA reference
on one RTX 4090 — ~0.25 TFLOP/clip at 35% utilization of 82 TFLOP/s fp16
=> ~115 clips/s — kept fixed across rounds so the ratio is comparable.

Env knobs: BENCH_BATCH (skip the batch sweep), BENCH_DTYPE, BENCH_PALLAS,
BENCH_FAST=1 (headline only, no sampler sweep), BENCH_ITERS.
"""

import json
import os
import sys
import time

REF_CLIPS_PER_SEC_4090_EST = 115.0


def _measure_once(pipeline, variables, rgbs, audios, B, iters):
    """Honest timing: rotate distinct inputs, sync every 10 iters, assert
    live outputs (the axon tunnel can silently drop executions — PERF.md)."""
    import jax

    out = pipeline(variables, rgbs[0], audios[0], jax.random.PRNGKey(2))
    jax.block_until_ready(out)
    n_inputs = len(rgbs)
    means = []
    t0 = time.perf_counter()
    for i in range(iters):
        out = pipeline(
            variables, rgbs[i % n_inputs], audios[i % n_inputs],
            jax.random.PRNGKey(i),
        )
        if i % 10 == 9:
            means.append(float(out.mean()))
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    o = out
    assert o.shape[0] == B and float(o.min()) >= 0.0 and float(o.max()) <= 1.0
    assert float(o.std()) > 0.0
    assert all(0.0 < m < 1.0 for m in means), means
    n_chips = jax.device_count()
    return B * iters / dt / n_chips


def _measure(pipeline, variables, rgbs, audios, B, iters):
    """Two back-to-back timing rounds, best-of — a one-shot number can be
    polluted by a host hiccup or tunnel stall (VERDICT r4: sweep entries
    were one-shot and drifted across rounds). Total device work unchanged:
    each round runs iters/2."""
    per_round = max(iters // 2, 10)
    rates = [
        _measure_once(pipeline, variables, rgbs, audios, B, per_round)
        for _ in range(2)
    ]
    spread = (max(rates) - min(rates)) / max(rates)
    if spread > 0.10:
        print(
            f"# WARNING timing spread {spread:.1%} between rounds "
            f"({[round(r, 1) for r in rates]}) — host/tunnel noise",
            file=sys.stderr,
        )
    return max(rates)


def main():
    import dataclasses

    import jax

    # persistent compile cache: repeated bench runs skip the ~2 min compiles
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

    dtype = os.environ.get("BENCH_DTYPE", "bfloat16")
    use_pallas = os.environ.get("BENCH_PALLAS", "1") == "1"
    fast = os.environ.get("BENCH_FAST", "0") == "1"
    iters = int(os.environ.get("BENCH_ITERS", 100))
    batches = (
        [int(os.environ["BENCH_BATCH"])]
        if "BENCH_BATCH" in os.environ
        else [2, 4, 8]
    )

    cfg = dataclasses.replace(ModelConfig.audio_visual(), compute_dtype=dtype)
    cfg = dataclasses.replace(
        cfg,
        visual=dataclasses.replace(cfg.visual,
                                   use_pallas_attention=use_pallas),
    )
    model = VideoSaliencyModel(cfg)
    schedule = make_schedule("cosine", num_diffusion_timesteps=1000)
    dt_cfg = DataTransformConfig()
    key = jax.random.PRNGKey(0)
    n_inputs = 4

    def make_inputs(B):
        rgbs = [
            jax.random.normal(
                jax.random.fold_in(key, i), (B, 16, 224, 384, 3)
            ) * 0.5
            for i in range(n_inputs)
        ]
        audios = [
            jax.random.normal(
                jax.random.fold_in(key, 50 + i), (B, 9, 112, 192, 1)
            )
            for i in range(n_inputs)
        ]
        return rgbs, audios

    rgb1, audio1 = make_inputs(1)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(1),
        {"rgb": rgb1[0], "input": jnp.zeros((1, 224, 384, 1)),
         "audio": audio1[0]},
        jnp.zeros((1,)),
    )

    def make_pipeline(sampling):
        @jax.jit
        def pipeline(variables, rgb, audio, rng):
            return sample_saliency(
                model, variables, schedule, sampling, dt_cfg, rgb, audio, rng
            )

        return pipeline

    ddim = SamplingConfig()  # ddim, NFE=1 (reference shipping default)

    # fall back to the XLA attention path if the Pallas kernel fails to
    # compile in this environment
    pipeline = make_pipeline(ddim)
    t_c = time.perf_counter()
    try:
        rgbs, audios = make_inputs(batches[0])
        out = pipeline(variables, rgbs[0], audios[0], jax.random.PRNGKey(2))
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
        pipeline = make_pipeline(ddim)
        out = pipeline(variables, rgbs[0], audios[0], jax.random.PRNGKey(2))
        jax.block_until_ready(out)
    print(f"# compile+warmup {time.perf_counter() - t_c:.1f}s",
          file=sys.stderr)

    # --- batch sweep on the shipping config -------------------------------
    sweep = {}
    best_B, best = batches[0], 0.0
    for B in batches:
        rgbs, audios = make_inputs(B)
        cps = _measure(pipeline, variables, rgbs, audios, B,
                       max(iters // max(B // 2, 1), 30))
        sweep[f"ddim_nfe1_b{B}"] = round(cps, 3)
        print(f"# ddim NFE=1 B={B}: {cps:.1f} clips/s/chip", file=sys.stderr)
        if cps > best:
            best_B, best = B, cps

    # --- DPM-Solver++ multistep-2 NFE sweep at the best batch -------------
    warns = []
    if not fast:
        rgbs, audios = make_inputs(best_B)
        for nfe in (2, 5):
            dpm = SamplingConfig(
                sample_type="dpmsolver++",
                timesteps=nfe,
                dpm_solver_method="multistep",
                dpm_solver_order=2,
                skip_type="logSNR",
            )
            p = make_pipeline(dpm)
            cps = _measure(p, variables, rgbs, audios, best_B,
                           max(30, iters // (2 * nfe)))
            sweep[f"dpmpp2m_nfe{nfe}_b{best_B}"] = round(cps, 3)
            print(f"# dpm++2m NFE={nfe} B={best_B}: {cps:.1f} clips/s/chip",
                  file=sys.stderr)
            # cross-config sanity (VERDICT r4 item 2): NFE=k costs ~k
            # decoder calls on top of the shared encoder, so throughput
            # must sit well above headline/(k+2); a miss means a shipped
            # sampler config regressed (round 4 shipped a silent 10x
            # NFE=5 collapse this guard would have caught)
            floor = best / (nfe + 2)
            if cps < floor:
                msg = (
                    f"dpmpp2m_nfe{nfe}_b{best_B}={cps:.1f} clips/s is below "
                    f"the sanity floor {floor:.1f} (= headline/(NFE+2)) — "
                    f"sampler-path regression or measurement fault"
                )
                warns.append(msg)
                print(f"# WARNING {msg}", file=sys.stderr)

    result = {
        "metric": "av_saliency_inference_throughput",
        "value": round(best, 3),
        "unit": "clips/sec/chip",
        "vs_baseline": round(best / REF_CLIPS_PER_SEC_4090_EST, 3),
        "baseline_model": "modeled 115 clips/s, 1x RTX 4090 — "
        "NOT a measured number (reference publishes none); see "
        "BASELINE.md",
        "config": f"ddim_nfe1_b{best_B}_{dtype}",
        "sweep": sweep,
    }
    if warns:
        result["warnings"] = warns
    print(json.dumps(result))


if __name__ == "__main__":
    main()
