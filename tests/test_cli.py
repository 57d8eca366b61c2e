"""CLI surface smoke tests (argument wiring only — heavy paths are covered
by trainer/e2e tests)."""

import pytest

from diff_sal_tpu.cli import build_parser


def test_parser_commands_exist():
    parser = build_parser()
    for cmd in ("train-visual", "train-av", "test", "eval-metrics"):
        with pytest.raises(SystemExit):
            parser.parse_args([cmd, "--help"])


def test_train_visual_args_parse():
    args = build_parser().parse_args(
        ["train-visual", "--data_type", "ucf", "--batch_size", "2",
         "--lr", "0.001", "--no_mesh"]
    )
    assert args.data_type == "ucf"
    assert args.batch_size == 2
    assert args.lr == 0.001
    assert args.no_mesh is True
    assert args.fn.__name__ == "cmd_train_visual"


def test_train_av_defaults():
    args = build_parser().parse_args(["train-av"])
    assert args.splits == "split1,split2,split3"
    assert args.dataset_json == "cfgs/dataset.json"


def test_eval_metrics_requires_gt_root():
    with pytest.raises(SystemExit):
        build_parser().parse_args(["eval-metrics", "some/path", "dhf1k"])


def test_perf_flags_plumb_into_config():
    from diff_sal_tpu.cli import _make_cfg

    args = build_parser().parse_args(
        ["train-visual", "--bf16", "--pallas", "--log_freq", "7"]
    )
    cfg = _make_cfg(args, audio_visual=False)
    assert cfg.model.compute_dtype == "bfloat16"
    assert cfg.model.visual.use_pallas_attention is True
    assert cfg.training.log_freq == 7
    assert args.decode == "pil"  # parity default


def test_test_av_args_parse():
    args = build_parser().parse_args(
        ["test-av", "--splits", "split2", "--save_img"]
    )
    assert args.splits == "split2"
    assert args.save_img is True
    assert args.fn.__name__ == "cmd_test_av"
