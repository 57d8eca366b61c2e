"""Trainer orchestration: fit on a synthetic dataset, checkpoints, best
selection, resume, image dumping + offline scoring round trip."""

import dataclasses
import os

import jax
import numpy as np
import pytest

from diff_sal_tpu.config import (
    ExperimentConfig,
    MViTConfig,
    ModelConfig,
    SalUNetConfig,
    TrainingConfig,
)
from diff_sal_tpu.data.loader import Loader
from diff_sal_tpu.data.synthetic import SyntheticVisualDataset
from diff_sal_tpu.train.trainer import Trainer


HW = (64, 96)


def tiny_cfg():
    return ExperimentConfig(
        model=ModelConfig(
            visual=MViTConfig.tiny(spatial_size=HW),
            decoder=SalUNetConfig(img_size=HW),
        ),
        training=TrainingConfig(batch_size=2, n_epochs=1, log_freq=2),
    )


@pytest.mark.slow
def test_fit_eval_checkpoint_roundtrip(tmp_path):
    cfg = tiny_cfg()
    ds = SyntheticVisualDataset(n=4, img_size=HW, frames=16)
    train_loader = Loader(ds, 2, shuffle=True, num_workers=0)
    val_loader = Loader(ds, 2, shuffle=False, num_workers=0)

    workdir = str(tmp_path / "run")
    t = Trainer(cfg, workdir, steps_per_epoch=len(train_loader), use_mesh=True)
    t.init_state(next(iter(train_loader)))
    t.fit(train_loader, val_loader)

    # checkpoints + logs + best marker exist
    assert t.ckpt.latest_step() == 0
    assert t.ckpt.best() is not None
    assert os.path.exists(os.path.join(workdir, "train.log"))

    # image dumping + offline pairing
    out_dir = str(tmp_path / "preds" / "task0")
    scores = t.evaluate(val_loader, save_images_dir=out_dir)
    assert np.isfinite(scores["total"])
    dumped = []
    for root, _, files in os.walk(out_dir):
        dumped += [os.path.join(root, f) for f in files]
    assert len(dumped) == 4

    # resume into a fresh trainer
    t2 = Trainer(cfg, workdir, steps_per_epoch=len(train_loader), use_mesh=True)
    t2.init_state(next(iter(train_loader)))
    t2.resume()
    assert t2.epoch == 1
    l1 = jax.tree.leaves(t.state.params)
    l2 = jax.tree.leaves(t2.state.params)
    for a, b in zip(l1, l2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_warm_start_partial(tmp_path):
    cfg = tiny_cfg()
    ds = SyntheticVisualDataset(n=2, img_size=HW, frames=16)
    loader = Loader(ds, 2, shuffle=False, num_workers=0)
    t = Trainer(cfg, str(tmp_path / "w"), steps_per_epoch=1, use_mesh=False)
    state = t.init_state(next(iter(loader)))
    # warm start from itself: every leaf loads
    import copy

    src = jax.tree.map(lambda x: x + 1.0, state.params)
    t.warm_start(src)
    one = np.asarray(jax.tree.leaves(t.state.params)[0])
    orig = np.asarray(jax.tree.leaves(state.params)[0])
    np.testing.assert_allclose(one, orig + 1.0)
