"""Auxiliary subsystems: EMA, alternative audio features, offline metric
driver, logging utilities, checkpoint partial-load."""

import pytest
import os

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from diff_sal_tpu.audio.features import raw_feature, spec_feature
from diff_sal_tpu.train.checkpoint import partial_load
from diff_sal_tpu.train.ema import ema_init, ema_update
from diff_sal_tpu.utils.logging import (
    AverageMeter,
    AverageMeterDict,
    TSVLogger,
    normalize_to_uint8,
    save_saliency_image,
)


def test_ema_update_math():
    p = {"a": jnp.ones(3), "b": {"c": jnp.zeros(2)}}
    ema = ema_init(p)
    newp = {"a": jnp.full(3, 2.0), "b": {"c": jnp.ones(2)}}
    out = ema_update(ema, newp, decay=0.9)
    np.testing.assert_allclose(np.asarray(out["a"]), 1.1, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out["b"]["c"]), 0.1, rtol=1e-6)


def test_spec_feature_shape():
    wave = np.random.RandomState(0).randn(20000) * 0.1
    s = spec_feature(wave, 22050)
    assert s.shape == (1, 257, 219)
    # standardized
    assert abs(s.mean()) < 1e-5
    np.testing.assert_allclose(s.std(), 1.0, atol=1e-3)


def test_raw_feature_shape():
    wave = np.ones(100)
    r = raw_feature(wave)
    assert r.shape == (1, 1, 35280)
    assert r.sum() == 100


def test_partial_load_shapes_mismatch():
    target = {"x": np.zeros((2, 2)), "y": np.zeros(3)}
    source = {"x": np.ones((2, 2)), "y": np.ones(4)}  # y mismatched
    merged, loaded, skipped = partial_load(target, source)
    assert loaded == 1 and skipped == 1
    np.testing.assert_array_equal(merged["x"], 1.0)
    np.testing.assert_array_equal(merged["y"], 0.0)


def test_meters_and_tsv(tmp_path):
    m = AverageMeter()
    m.update(1.0)
    m.update(3.0)
    assert m.avg == 2.0
    d = AverageMeterDict()
    d.update({"a": 1.0}, n=2)
    d.update({"a": 4.0}, n=1)
    assert d.averages()["a"] == 2.0

    log = TSVLogger(str(tmp_path / "t.log"), ["epoch", "loss"])
    log.log({"epoch": 0, "loss": 0.5})
    log.close()
    lines = open(tmp_path / "t.log").read().splitlines()
    assert lines[0] == "epoch\tloss" and lines[1] == "0\t0.5"


def test_normalize_and_save_image(tmp_path):
    x = np.linspace(0, 1, 12).reshape(3, 4)
    u8 = normalize_to_uint8(x)
    assert u8.dtype == np.uint8 and u8.min() == 0 and u8.max() == 255
    p = str(tmp_path / "sub" / "img.png")
    save_saliency_image(p, x[..., None])
    assert os.path.exists(p)


def test_offline_evaluator_roundtrip(tmp_path):
    from diff_sal_tpu.metrics.offline import evaluate_predictions

    # GT layout (dhf1k-style): gt_root/0601/{maps,fixation}/0001.png
    rng = np.random.RandomState(0)
    gt_v = tmp_path / "gt" / "0601"
    (gt_v / "maps").mkdir(parents=True)
    (gt_v / "fixation").mkdir(parents=True)
    pred_v = tmp_path / "preds" / "task" / "601"
    pred_v.mkdir(parents=True)
    for i in (1, 2):
        m = rng.rand(24, 32)
        Image.fromarray((m * 255).astype(np.uint8)).save(
            gt_v / "maps" / ("%04d.png" % i)
        )
        fix = (rng.rand(24, 32) < 0.1).astype(np.uint8) * 255
        Image.fromarray(fix).save(gt_v / "fixation" / ("%04d.png" % i))
        Image.fromarray((m * 255).astype(np.uint8)).save(
            pred_v / ("%d.png" % i)
        )
    res = evaluate_predictions(
        str(tmp_path / "preds"), str(tmp_path / "gt"), "dhf1k",
        vid_list=[601], processes=2,
    )
    assert "task" in res
    auc_j, auc_s, cc, nss, sim = res["task"]
    assert cc > 0.99  # prediction == GT map
    assert os.path.exists(str(tmp_path / "preds") + "_metrics.csv")


@pytest.mark.slow
def test_dpm_solver_in_pipeline_small_model():
    """DPM-Solver wired through sample_saliency on a tiny model."""
    import dataclasses

    from diff_sal_tpu.config import (
        DataTransformConfig,
        MViTConfig,
        ModelConfig,
        SalUNetConfig,
        SamplingConfig,
    )
    from diff_sal_tpu.diffusion.schedule import make_schedule
    from diff_sal_tpu.inference import sample_saliency
    from diff_sal_tpu.models.diff_model import VideoSaliencyModel

    hw = (64, 96)
    cfg = ModelConfig(
        visual=MViTConfig.tiny(spatial_size=hw), decoder=SalUNetConfig(img_size=hw)
    )
    model = VideoSaliencyModel(cfg)
    rgb = jnp.zeros((1, 16, *hw, 3))
    variables = model.init(
        jax.random.PRNGKey(0),
        {"rgb": rgb, "input": jnp.zeros((1, *hw, 1))},
        jnp.zeros((1,)),
    )
    schedule = make_schedule("cosine", num_diffusion_timesteps=1000)
    sampling = SamplingConfig(
        sample_type="dpmsolver", timesteps=3, dpm_solver_order=2,
        dpm_solver_method="multistep", denoise=True,
    )
    out = sample_saliency(
        model, variables, schedule, sampling, DataTransformConfig(), rgb
    )
    o = np.asarray(out)
    assert o.shape == (1, *hw, 1)
    assert np.isfinite(o).all() and o.min() >= 0 and o.max() <= 1


@pytest.mark.slow
def test_ema_in_train_state():
    """Optional EMA wired through the train step (reference ships a dead EMA
    helper; ours is functional behind training.ema)."""
    import dataclasses

    from diff_sal_tpu.config import (
        ExperimentConfig, MViTConfig, ModelConfig, SalUNetConfig,
        TrainingConfig,
    )
    from diff_sal_tpu.diffusion.schedule import make_schedule
    from diff_sal_tpu.models.diff_model import VideoSaliencyModel
    from diff_sal_tpu.train.optim import make_optimizer
    from diff_sal_tpu.train.train_step import create_train_state, make_train_step

    hw = (64, 96)
    cfg = ExperimentConfig(
        model=ModelConfig(
            visual=MViTConfig.tiny(spatial_size=hw),
            decoder=SalUNetConfig(img_size=hw),
        ),
        training=TrainingConfig(batch_size=1, ema=True, ema_rate=0.5),
    )
    model = VideoSaliencyModel(cfg.model)
    schedule = make_schedule("cosine", num_diffusion_timesteps=10)
    rgb = jax.random.normal(jax.random.PRNGKey(0), (1, 16, *hw, 3)) * 0.2
    salmap = jax.random.uniform(jax.random.PRNGKey(1), (1, *hw, 1))
    variables = model.init(
        jax.random.PRNGKey(2),
        {"rgb": rgb, "input": jnp.zeros((1, *hw, 1))},
        jnp.zeros((1,)),
    )
    tx = make_optimizer(cfg.optim, 10, 1)
    state = create_train_state(model, variables, tx, use_ema=True)
    step = jax.jit(make_train_step(model, schedule, cfg))
    new_state, _ = step(state, {"rgb": rgb, "salmap": salmap},
                        jax.random.PRNGKey(3))
    # shadow moved halfway (rate 0.5) between old and new params
    p0 = jax.tree.leaves(state.params)[0]
    p1 = jax.tree.leaves(new_state.params)[0]
    e1 = jax.tree.leaves(new_state.ema_params)[0]
    np.testing.assert_allclose(
        np.asarray(e1), 0.5 * np.asarray(p0) + 0.5 * np.asarray(p1), atol=1e-6
    )


def test_aggregate_results(tmp_path):
    from diff_sal_tpu.metrics.offline import aggregate_results

    d = tmp_path / "results"
    d.mkdir()
    (d / "run1.csv").write_text("Task,CC\na,0.5\n")
    (d / "run2.csv").write_text("Task,CC\nb,0.7\n")
    out = aggregate_results(str(d), str(tmp_path / "all.csv"))
    import pandas as pd

    df = pd.read_csv(out)
    assert len(df) == 2 and set(df["source"]) == {"run1.csv", "run2.csv"}
