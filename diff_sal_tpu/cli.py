"""Command-line entry points.

Replaces the reference CLIs (`train_dhf1k.py`, `train_av_data.py`,
`compute_metrics.py`, `recompute_overall_metrics.py` + `util/opts.py`
argparse surface) with one `python -m diff_sal_tpu.cli <command>`:

  train-visual   DHF1k/Hollywood2/UCF visual pretraining
  train-av       6-dataset 3-split audio-visual fine-tune
  test           inference + prediction dumping on a test split
  eval-metrics   offline metric CSV over dumped predictions
  bench          the throughput benchmark (same as bench.py)

There is no torchrun/DDP launch step: one process drives all local TPU
devices via the mesh; multi-host runs initialize jax.distributed before
main (reference's init_distributed_mode, train_dhf1k.py:38-61).
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _common(p: argparse.ArgumentParser):
    p.add_argument("--path_data", default="VideoSalPrediction/DHF1k_extracted")
    p.add_argument("--workdir", default="experiments/run")
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--n_epochs", type=int, default=None)
    p.add_argument("--len_snippet", type=int, default=32)
    p.add_argument("--n_threads", type=int, default=8)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--resume_training", action="store_true")
    p.add_argument("--pretrain_path", default=None)
    p.add_argument("--no_mesh", action="store_true")
    p.add_argument("--wandb", action="store_true")
    p.add_argument("--bf16", action="store_true",
                   help="bfloat16 mixed-precision compute (params stay f32)")
    p.add_argument("--pallas", action="store_true",
                   help="fused Pallas attention kernels (TPU; 2x train step)")
    p.add_argument("--log_freq", type=int, default=None)
    p.add_argument("--decode", default="pil", choices=["pil", "cv2"],
                   help="frame decode backend: pil (reference parity) or "
                        "cv2 (2-3x faster)")
    p.add_argument("--fresh_eval_noise", action="store_true",
                   help="draw fresh starting noise per evaluation (reference "
                        "behavior) instead of the deterministic default")


def _make_cfg(args, audio_visual: bool):
    import dataclasses

    from diff_sal_tpu.config import audio_visual_experiment, visual_experiment

    cfg = audio_visual_experiment() if audio_visual else visual_experiment()
    cfg = dataclasses.replace(
        cfg,
        optim=dataclasses.replace(cfg.optim, lr=args.lr),
        training=dataclasses.replace(
            cfg.training, batch_size=args.batch_size, seed=args.seed
        ),
    )
    if getattr(args, "bf16", False):
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, compute_dtype="bfloat16")
        )
    if getattr(args, "pallas", False):
        cfg = dataclasses.replace(
            cfg,
            model=dataclasses.replace(
                cfg.model,
                visual=dataclasses.replace(
                    cfg.model.visual, use_pallas_attention=True
                ),
            ),
        )
    if getattr(args, "log_freq", None):
        cfg = dataclasses.replace(
            cfg, training=dataclasses.replace(cfg.training,
                                              log_freq=args.log_freq)
        )
    if getattr(args, "fresh_eval_noise", False):
        cfg = dataclasses.replace(
            cfg, training=dataclasses.replace(cfg.training,
                                              eval_fixed_rng=False)
        )
    return cfg


def cmd_train_visual(args):
    from diff_sal_tpu.data.loader import Loader
    from diff_sal_tpu.data.video_datasets import (
        DHF1KDataset,
        HollywoodDataset,
        UCFDataset,
    )
    from diff_sal_tpu.train.trainer import Trainer

    cfg = _make_cfg(args, audio_visual=False)
    bs = cfg.training.batch_size
    if args.packed_root:
        # decode-free uint8 memmap pipeline (data/packed.py; pack once with
        # pack_dhf1k_tree). Normalization happens on device.
        from diff_sal_tpu.data.packed import PackedVideoDataset

        train_ds = PackedVideoDataset(
            args.packed_root, args.len_snippet, "train"
        )
        val_ds = (
            PackedVideoDataset(args.packed_val_root, args.len_snippet, "val")
            if args.packed_val_root
            else None
        )
    else:
        ds_cls = {"dhf1k": DHF1KDataset, "holly": HollywoodDataset,
                  "ucf": UCFDataset}[args.data_type]
        train_ds = ds_cls(args.path_data, args.len_snippet, "train",
                          decode=args.decode)
        # "val" for every data_type: Holly/UCF map it to the `testing` tree
        # WITH GT maps — the reference's get_val_loader builds mode="val"
        # datasets for all three (cfgs/visual.py:96-104), and holly/ucf
        # "test" mode would drop the GT the score needs
        val_ds = ds_cls(args.path_data, args.len_snippet, "val",
                        decode=args.decode)
    train_loader = Loader(train_ds, bs, shuffle=True, num_workers=args.n_threads)
    val_loader = (
        Loader(val_ds, bs, shuffle=False, num_workers=args.n_threads)
        if val_ds is not None
        else None
    )
    t = Trainer(
        cfg, args.workdir, steps_per_epoch=len(train_loader),
        n_epochs=args.n_epochs, use_mesh=not args.no_mesh,
    )
    t.init_state(next(iter(train_loader)))
    if args.pretrain_path:
        from diff_sal_tpu.train.checkpoint import CheckpointManager

        src = CheckpointManager(args.pretrain_path).restore_best()
        if src:
            t.warm_start(src["params"])
    if args.resume_training:
        t.resume()
    t.fit(train_loader, val_loader)


def cmd_train_av(args):
    from diff_sal_tpu.train.trainer import train_av_splits

    with open(args.dataset_json) as f:
        data_config = json.load(f)
    cfg = _make_cfg(args, audio_visual=True)
    visual_params = None
    if args.pretrain_path:
        from diff_sal_tpu.train.checkpoint import CheckpointManager

        src = CheckpointManager(args.pretrain_path).restore_best()
        visual_params = src["params"] if src else None
    train_av_splits(
        cfg, data_config, args.workdir, visual_params,
        splits=args.splits.split(","),
        loader_kwargs=dict(num_workers=args.n_threads),
        packed_root=args.packed_root,
    )


def cmd_pack(args):
    """One-time packing pass: decode the source tree once into uint8/float32
    memmaps at the training resolution (data/packed.py). 'dhf1k' packs a
    frames/+maps/ tree; 'av' packs the 6-dataset corpus named by
    --dataset_json (frames, eyeMaps, and 16 kHz-resampled waves)."""
    if args.corpus == "dhf1k":
        from diff_sal_tpu.data.packed import pack_dhf1k_tree

        pack_dhf1k_tree(args.src, args.dst, decode=args.decode)
    else:
        from diff_sal_tpu.data.packed import pack_av_tree

        with open(args.dataset_json) as f:
            data_config = json.load(f)
        # dataset.json carries sample_size as [W, H] (reference schema)
        sw, sh = data_config.get("sample_size", [384, 224])
        pack_av_tree(
            data_config, args.dst, img_size=(sh, sw), decode=args.decode
        )
    print(f"packed -> {args.dst}")


def cmd_test(args):
    """Visual test entry for any of the three datasets (reference `test()`
    scores whatever loader the config built — diffusion_trainer.py:714-765
    via get_val_loader; Holly/UCF val datasets read the `testing` trees,
    holly2wood_dataset.py:35-45). Loads best.pth-equivalent when present,
    else the latest checkpoint, and dumps '<vid>/<gid>.png' predictions."""
    from diff_sal_tpu.data.loader import Loader
    from diff_sal_tpu.data.video_datasets import (
        DHF1KDataset,
        HollywoodDataset,
        UCFDataset,
    )
    from diff_sal_tpu.train.trainer import Trainer

    cfg = _make_cfg(args, audio_visual=False)
    ds_cls = {"dhf1k": DHF1KDataset, "holly": HollywoodDataset,
              "ucf": UCFDataset}[args.data_type]
    ds = ds_cls(args.path_data, args.len_snippet, "val", decode=args.decode)
    loader = Loader(ds, cfg.training.batch_size, shuffle=False,
                    num_workers=args.n_threads)
    t = Trainer(cfg, args.workdir, steps_per_epoch=1,
                use_mesh=not args.no_mesh)
    t.init_state(next(iter(loader)))
    try:
        t.restore_best()  # reference test() loads weights/best.pth (:722-729)
    except FileNotFoundError:
        t.resume()
    scores = t.evaluate(loader, save_images_dir=args.out_dir)
    print(json.dumps({k: round(v, 4) for k, v in scores.items()}))


def cmd_test_av(args):
    """AV inference entry (reference test_av_data, diffusion_trainer.py:
    823-896): per split, load that split's best weights, run the exhaustive
    (step-1) 6-dataset test loaders, dump predictions to the
    '{split}_results/<ds>/<vid>/pred_sal_%06d.jpg' contract and print the
    nss+cc+sim scores. Optionally scores the dumps offline to CSV."""
    from diff_sal_tpu.data.av_dataset import build_av_datasets
    from diff_sal_tpu.data.loader import Loader
    from diff_sal_tpu.train.trainer import Trainer

    with open(args.dataset_json) as f:
        data_config = json.load(f)
    cfg = _make_cfg(args, audio_visual=True)
    all_scores = {}
    for split in args.splits.split(","):
        ds = build_av_datasets(data_config, split, train=False, exhaustive=True)
        loader = Loader(
            ds, cfg.training.batch_size, shuffle=False, drop_last=False,
            pad_last=True, num_workers=args.n_threads,
        )
        t = Trainer(
            cfg, os.path.join(args.workdir, split), steps_per_epoch=1,
            use_mesh=not args.no_mesh,
        )
        t.init_state(next(iter(loader)))
        t.restore_best()
        result_dir = os.path.join(args.workdir, f"{split}_results")
        scores = t.evaluate(
            loader, save_images_dir=result_dir if args.save_img else None
        )
        all_scores[split] = {k: round(v, 4) for k, v in scores.items()}
        print(json.dumps({split: all_scores[split]}))
        if args.save_img and args.gt_root:
            from diff_sal_tpu.metrics.offline import evaluate_predictions

            res = evaluate_predictions(
                result_dir, args.gt_root, "av", processes=args.processes
            )
            for task, vals in res.items():
                print(split, task, vals)
    print(json.dumps(all_scores))


def cmd_eval_metrics(args):
    from diff_sal_tpu.metrics.offline import evaluate_predictions

    vid_list = None
    if args.data_type == "dhf1k":
        vid_list = list(range(601, 701))
    res = evaluate_predictions(
        args.prediction_path, args.gt_root, args.data_type, vid_list,
        processes=args.processes,
    )
    for task, vals in res.items():
        print(task, vals)


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(prog="diff_sal_tpu")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("train-visual")
    _common(p)
    p.add_argument("--data_type", default="dhf1k",
                   choices=["dhf1k", "holly", "ucf"])
    p.add_argument("--packed_root", default=None,
                   help="packed uint8 memmap tree (data/packed.py)")
    p.add_argument("--packed_val_root", default=None)
    p.set_defaults(fn=cmd_train_visual)

    p = sub.add_parser("train-av")
    _common(p)
    p.add_argument("--dataset_json", default="cfgs/dataset.json")
    p.add_argument("--splits", default="split1,split2,split3")
    p.add_argument("--packed_root", default=None,
                   help="packed AV memmap tree (pack with `pack av`); "
                        "frames+mel move on device")
    p.set_defaults(fn=cmd_train_av)

    p = sub.add_parser("pack")
    p.add_argument("corpus", choices=["dhf1k", "av"])
    p.add_argument("--src", default=None, help="dhf1k source tree")
    p.add_argument("--dst", required=True)
    p.add_argument("--dataset_json", default="cfgs/dataset.json")
    p.add_argument("--decode", default="cv2", choices=["pil", "cv2"])
    p.set_defaults(fn=cmd_pack)

    p = sub.add_parser("test")
    _common(p)
    p.add_argument("--data_type", default="dhf1k",
                   choices=["dhf1k", "holly", "ucf"])
    p.add_argument("--out_dir", default="results")
    p.set_defaults(fn=cmd_test)

    p = sub.add_parser("test-av")
    _common(p)
    p.add_argument("--dataset_json", default="cfgs/dataset.json")
    p.add_argument("--splits", default="split1,split2,split3")
    p.add_argument("--save_img", action="store_true")
    p.add_argument("--gt_root", default=None,
                   help="score dumped images offline to CSV when given")
    p.add_argument("--processes", type=int, default=8)
    p.set_defaults(fn=cmd_test_av)

    p = sub.add_parser("eval-metrics")
    p.add_argument("prediction_path")
    p.add_argument("data_type", choices=["dhf1k", "holly", "ucf", "av"])
    p.add_argument("--gt_root", required=True)
    p.add_argument("--processes", type=int, default=8)
    p.set_defaults(fn=cmd_eval_metrics)
    return parser


def _setup_compile_cache():
    """Persistent XLA compile cache next to the package — repeated CLI runs
    skip the multi-minute full-model compiles."""
    import jax

    cache = os.environ.get(
        "DIFF_SAL_COMPILE_CACHE",
        os.path.join(os.path.dirname(os.path.dirname(__file__)),
                     ".jax_cache"),
    )
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass  # older jax without the knobs


def main(argv=None):
    args = build_parser().parse_args(argv)
    _setup_compile_cache()
    args.fn(args)


if __name__ == "__main__":
    main()
