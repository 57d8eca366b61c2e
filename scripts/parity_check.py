"""Checkpoint parity harness.

    python scripts/parity_check.py <converted_ckpt_dir> \
        [--reference_npz acts.npz] [--audio]

Loads converted reference weights (see scripts/import_reference_ckpt.py),
runs deterministic fixed-seed inputs through the model, prints output
statistics, and — when given a reference activation dump (an .npz produced
by running the same inputs through the PyTorch reference with
`np.savez(pred=..., feats0=..., ...)`) — reports per-tensor max/mean deltas.

This is the ≤1%-CC/NSS/SIM-parity entry point once the released Google-Drive
checkpoints are available (BASELINE.md).
"""

import argparse
import sys

sys.path.insert(0, ".")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt_dir")
    ap.add_argument("--reference_npz", default=None)
    ap.add_argument("--audio", action="store_true", default=True)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from diff_sal_tpu.config import ModelConfig
    from diff_sal_tpu.models.diff_model import VideoSaliencyModel
    from diff_sal_tpu.train.checkpoint import CheckpointManager, partial_load

    cfg = ModelConfig.audio_visual() if args.audio else ModelConfig.visual_only()
    model = VideoSaliencyModel(cfg)

    rng = np.random.RandomState(0)
    rgb = jnp.asarray(rng.randn(1, 16, 224, 384, 3).astype(np.float32) * 0.5)
    audio = jnp.asarray(rng.randn(1, 9, 112, 192, 1).astype(np.float32))
    x = jnp.asarray(rng.randn(1, 224, 384, 1).astype(np.float32))
    t = jnp.asarray([0.0])

    data = {"rgb": rgb, "input": x}
    if args.audio:
        data["audio"] = audio
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), data, t)

    restored = CheckpointManager(args.ckpt_dir).restore()
    if restored is None:
        raise SystemExit(f"no checkpoint in {args.ckpt_dir}")
    params, loaded, skipped = partial_load(
        variables["params"], restored.get("params", restored)
    )
    print(f"loaded {loaded} leaves, kept {skipped} at init")
    stats = restored.get("batch_stats")
    vars2 = {"params": params,
             "batch_stats": stats or variables.get("batch_stats", {})}

    pred = jax.jit(lambda v, d, t: model.apply(v, d, t))(vars2, data, t)
    pred = np.asarray(pred)
    print(f"pred: shape {pred.shape} mean {pred.mean():.5f} std "
          f"{pred.std():.5f} min {pred.min():.5f} max {pred.max():.5f}")

    feats = model.apply(vars2, rgb, method=VideoSaliencyModel.encode_visual)
    for i, f in enumerate(feats):
        f = np.asarray(f)
        print(f"feat{i}: {f.shape} mean {f.mean():+.5f} std {f.std():.5f}")

    if args.reference_npz:
        ref = np.load(args.reference_npz)
        for name, ours in [("pred", pred)] + [
            (f"feats{i}", np.asarray(f)) for i, f in enumerate(feats)
        ]:
            if name not in ref:
                continue
            want = ref[name]
            # reference dumps are NC(T)HW; ours are channel-last
            if want.ndim == ours.ndim and want.shape != ours.shape:
                want = np.moveaxis(want, 1, -1)
            d = np.abs(ours - want)
            print(f"{name}: max|d| {d.max():.6f} mean|d| {d.mean():.6f} "
                  f"(ref scale {np.abs(want).max():.4f})")


if __name__ == "__main__":
    main()
