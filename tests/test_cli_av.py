"""End-to-end `test-av` CLI on a synthetic on-disk 6-dataset AV tree
(reference test_av_data, diffusion_trainer.py:823-935): per-split best
weights load, exhaustive step-1 loaders, image dumping to the
'{split}_results/<ds>/<vid>/pred_sal_%06d.jpg' contract."""

import dataclasses
import json
import os

import numpy as np
import pytest
from PIL import Image

from diff_sal_tpu.data.av_dataset import AV_DATASET_NAMES

HW = (64, 96)
N_FRAMES = 4  # exhaustive windows per video = N_FRAMES - 1


@pytest.fixture(scope="module")
def av_tree(tmp_path_factory):
    """One tiny video per AV dataset + a cfgs/dataset.json-schema config."""
    root = tmp_path_factory.mktemp("av6")
    rng = np.random.RandomState(7)
    from scipy.io import wavfile

    config = {
        "sample_size": [HW[1], HW[0]],
        "audio_size": [48, 32],  # 16x the (2, 3) coarsest grid of 64x96
        "sample_duration": 16,
        "with_audio": True,
        "split1": {},
    }
    for name in AV_DATASET_NAMES:
        vid = f"{name}_v1"
        base = root / name
        (base / "video" / vid).mkdir(parents=True)
        (base / "ann" / vid / "maps").mkdir(parents=True)
        (base / "audio" / vid).mkdir(parents=True)
        for i in range(1, N_FRAMES + 1):
            Image.fromarray(
                rng.randint(0, 255, (36, 64, 3), dtype=np.uint8)
            ).save(base / "video" / vid / ("img_%05d.jpg" % i))
            Image.fromarray(
                rng.randint(1, 255, (36, 64), dtype=np.uint8)
            ).save(base / "ann" / vid / "maps" / ("eyeMap_%05d.jpg" % i))
        sr = 22050
        wave = (rng.randn(sr * 2) * 3000).astype(np.int16)
        wavfile.write(base / "audio" / vid / f"{vid}.wav", sr, wave)
        fold = base / "fold_test.txt"
        with open(fold, "w") as f:
            f.write(f"{vid} {N_FRAMES} 20.0\n")
        config[f"video_path_{name}"] = str(base / "video")
        config[f"salmap_path_{name}"] = str(base / "ann")
        config[f"audio_path_{name}"] = str(base / "audio")
        config["split1"][f"annotation_path_{name}_test"] = str(fold)
        config["split1"][f"annotation_path_{name}_train"] = str(fold)
    cfg_path = root / "dataset.json"
    with open(cfg_path, "w") as f:
        json.dump(config, f)
    return root, str(cfg_path)


def _tiny_av_cfg(args, audio_visual):
    from diff_sal_tpu.config import (
        AudioAttnConfig,
        ExperimentConfig,
        MViTConfig,
        ModelConfig,
        SalUNetConfig,
        TrainingConfig,
        VGGishConfig,
    )

    assert audio_visual
    return ExperimentConfig(
        model=ModelConfig(
            visual=MViTConfig.tiny(spatial_size=HW),
            audio=VGGishConfig(),
            spatiotemp=AudioAttnConfig(),
            decoder=SalUNetConfig(img_size=HW),
        ),
        training=TrainingConfig(batch_size=2, n_epochs=1, log_freq=1),
    )


@pytest.mark.slow
def test_test_av_end_to_end(av_tree, tmp_path, monkeypatch):
    root, cfg_path = av_tree
    workdir = str(tmp_path / "run")

    import diff_sal_tpu.cli as cli
    from diff_sal_tpu.data.av_dataset import build_av_datasets
    from diff_sal_tpu.data.loader import Loader
    from diff_sal_tpu.train.trainer import Trainer

    monkeypatch.setattr(cli, "_make_cfg", _tiny_av_cfg)

    # seed a "best" checkpoint for split1 (what train-av would have left)
    with open(cfg_path) as f:
        data_config = json.load(f)
    cfg = _tiny_av_cfg(None, True)
    ds = build_av_datasets(data_config, "split1", train=False, exhaustive=True)
    assert len(ds) == 6 * (N_FRAMES - 1)
    item = ds[0]
    assert item["audio"].shape == (9, 32, 48, 1)
    loader = Loader(ds, 2, shuffle=False, num_workers=0)
    t = Trainer(cfg, os.path.join(workdir, "split1"), steps_per_epoch=1)
    t.init_state(next(iter(loader)))
    t._save(0)
    t.ckpt.update_best(0, 1.0)

    cli.main(
        [
            "test-av",
            "--workdir", workdir,
            "--dataset_json", cfg_path,
            "--splits", "split1",
            "--batch_size", "2",
            "--n_threads", "0",
            "--save_img",
        ]
    )

    result_dir = os.path.join(workdir, "split1_results")
    dumped = []
    for r, _, files in os.walk(result_dir):
        dumped += [os.path.join(r, f) for f in files]
    # every dataset dumped under <ds>/<vid>/pred_sal_%06d.jpg
    assert dumped, "no images dumped"
    rels = [os.path.relpath(p, result_dir) for p in dumped]
    for name in AV_DATASET_NAMES:
        mine = [p for p in rels if p.startswith(name + os.sep)]
        assert mine, f"no dumps for {name}"
        for p in mine:
            parts = p.split(os.sep)
            assert len(parts) == 3 and parts[2].startswith("pred_sal_")
            assert parts[2].endswith(".jpg")
