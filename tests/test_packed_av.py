"""Packed AV pipeline tests (data/packed.py pack_av_tree/PackedAVDataset):
window/metadata parity with the host AVSaliencyDataset, on-device STAViS
normalization equality, device-mel vs host-mel tolerance, and the
wave-carrying jitted train step."""

import json

import numpy as np
import pytest
from PIL import Image

from diff_sal_tpu.data.av_dataset import AVSaliencyDataset
from diff_sal_tpu.data.packed import PackedAVDataset, pack_av_tree


@pytest.fixture(scope="module")
def av_tree(tmp_path_factory):
    """Two-video single-dataset ('avad') corpus + dataset.json-style config
    with a split1 train/test fold split."""
    root = tmp_path_factory.mktemp("packed_av_src")
    rng = np.random.RandomState(7)
    from scipy.io import wavfile

    n_frames = {"v001": 40, "v002": 30}
    for vid, n in n_frames.items():
        (root / "video" / vid).mkdir(parents=True)
        (root / "ann" / vid / "maps").mkdir(parents=True)
        (root / "audio" / vid).mkdir(parents=True)
        for i in range(1, n + 1):
            Image.fromarray(
                rng.randint(0, 255, (36, 64, 3), dtype=np.uint8)
            ).save(root / "video" / vid / ("img_%05d.jpg" % i))
            Image.fromarray(
                rng.randint(1, 255, (36, 64), dtype=np.uint8)
            ).save(root / "ann" / vid / "maps" / ("eyeMap_%05d.jpg" % i))
        sr = 22050
        dur = int(sr * (n / 20.0 + 1))
        wave = (rng.randn(dur) * 3000).astype(np.int16)
        wavfile.write(root / "audio" / vid / f"{vid}.wav", sr, wave)
    with open(root / "fold_train.txt", "w") as f:
        f.write("v001 40 20.0\n")
    with open(root / "fold_test.txt", "w") as f:
        f.write("v002 30 20.0\n")
    config = {
        "video_path_avad": str(root / "video"),
        "salmap_path_avad": str(root / "ann"),
        "audio_path_avad": str(root / "audio"),
        "split1": {
            "annotation_path_avad_train": str(root / "fold_train.txt"),
            "annotation_path_avad_test": str(root / "fold_test.txt"),
        },
    }
    return root, config


@pytest.fixture(scope="module")
def packed_root(av_tree, tmp_path_factory):
    root, config = av_tree
    dst = tmp_path_factory.mktemp("packed_av_dst")
    pack_av_tree(
        config, str(dst), img_size=(64, 96), datasets=["avad"], decode="pil"
    )
    return str(dst)


def _host_ds(av_tree, train=True, **kw):
    root, config = av_tree
    flag = "train" if train else "test"
    return AVSaliencyDataset(
        config["video_path_avad"],
        config["split1"][f"annotation_path_avad_{flag}"],
        config["salmap_path_avad"],
        config["audio_path_avad"],
        name="avad",
        img_size=(64, 96),
        resample_zero_gt=False,
        **kw,
    )


def test_packed_matches_host_windows_and_metadata(av_tree, packed_root):
    root, config = av_tree
    host = _host_ds(av_tree)
    packed = PackedAVDataset(
        packed_root, config, "split1", train=True,
        datasets=["avad"], resample_zero_gt=False,
    )
    assert len(packed) == len(host) > 0
    for i in range(len(packed)):
        hi, pi = host[i], packed[i]
        assert pi["video_id"] == hi["video_id"]
        assert pi["gt_index"] == hi["gt_index"]
        assert pi["rgb"].shape == (16, 64, 96, 3)
        assert pi["rgb"].dtype == np.uint8
        assert pi["wave"].shape == (25600,)
        # same uint8 map source, same resize -> same salmap
        np.testing.assert_allclose(pi["salmap"], hi["salmap"], atol=1 / 255.0)


def test_packed_rgb_device_normalization_matches_host(av_tree, packed_root):
    import jax.numpy as jnp

    from diff_sal_tpu.data.transforms import normalize_rgb_u8

    root, config = av_tree
    host = _host_ds(av_tree)
    packed = PackedAVDataset(
        packed_root, config, "split1", train=True,
        datasets=["avad"], resample_zero_gt=False,
    )
    hi, pi = host[0], packed[0]
    dev = np.asarray(normalize_rgb_u8(jnp.asarray(pi["rgb"]), stats="stavis"))
    np.testing.assert_allclose(dev, hi["rgb"].astype(np.float32), atol=2e-2)


def test_packed_wave_device_mel_close_to_host_audio(av_tree, packed_root):
    """The packed path resamples-then-pads (host: pads-then-resamples); the
    log-mel examples must agree up to the resampler's boundary tails."""
    import jax.numpy as jnp

    from diff_sal_tpu.audio.mel import device_audio_frontend

    root, config = av_tree
    host = _host_ds(av_tree)
    packed = PackedAVDataset(
        packed_root, config, "split1", train=True,
        datasets=["avad"], resample_zero_gt=False,
    )
    hi, pi = host[0], packed[0]
    dev = np.asarray(
        device_audio_frontend(jnp.asarray(pi["wave"][None]), hw=(112, 192))
    )[0]
    ref = hi["audio"]
    assert dev.shape == ref.shape == (9, 112, 192, 1)
    # high structural agreement; tails of the anti-alias filter differ
    corr = np.corrcoef(dev.ravel(), ref.ravel())[0, 1]
    assert corr > 0.99, corr
    assert np.mean(np.abs(dev - ref)) < 0.1, np.mean(np.abs(dev - ref))


def test_packed_exhaustive_matches_host(av_tree, packed_root):
    root, config = av_tree
    host = _host_ds(av_tree, train=False, exhaustive_sampling=True)
    packed = PackedAVDataset(
        packed_root, config, "split1", train=False,
        exhaustive_sampling=True, datasets=["avad"], resample_zero_gt=False,
    )
    assert len(packed) == len(host) == 29
    assert packed[5]["gt_index"] == host[5]["gt_index"]


@pytest.mark.slow
def test_train_and_eval_step_with_wave_batch(av_tree, packed_root):
    """The jitted steps consume 'wave' directly: log-mel runs on device."""
    import dataclasses

    import jax

    from diff_sal_tpu.config import (
        ExperimentConfig,
        ModelConfig,
        MViTConfig,
        SalUNetConfig,
        AudioAttnConfig,
        VGGishConfig,
    )
    from diff_sal_tpu.data.loader import Loader
    from diff_sal_tpu.diffusion.schedule import make_schedule
    from diff_sal_tpu.models.diff_model import VideoSaliencyModel
    from diff_sal_tpu.train.optim import make_optimizer
    from diff_sal_tpu.train.train_step import (
        create_train_state,
        make_eval_step,
        make_train_step,
    )

    root, config = av_tree
    packed = PackedAVDataset(
        packed_root, config, "split1", train=True,
        datasets=["avad"], resample_zero_gt=False,
    )
    cfg = ExperimentConfig(
        model=ModelConfig(
            visual=MViTConfig.tiny(spatial_size=(64, 96)),
            audio=VGGishConfig(),
            spatiotemp=AudioAttnConfig(),
            decoder=SalUNetConfig(img_size=(64, 96)),
            uint8_norm="stavis",
        )
    )
    model = VideoSaliencyModel(cfg.model)
    schedule = make_schedule("linear", num_diffusion_timesteps=10)
    loader = Loader(
        packed, 2, shuffle=False, num_workers=0,
        drop_last=False, pad_last=True,
    )
    batch = next(iter(loader))
    assert "wave" in batch and "audio" not in batch

    import jax.numpy as jnp

    from diff_sal_tpu.train.train_step import audio_hw_for, resolve_audio

    db = {k: jnp.asarray(batch[k]) for k in ("rgb", "salmap", "wave")}
    audio0 = resolve_audio(db, audio_hw_for(cfg))
    assert audio0.shape == (2, 9, 32, 48, 1)
    variables = model.init(
        jax.random.PRNGKey(0),
        {"rgb": db["rgb"][:1], "input": jnp.zeros((1, 64, 96, 1)),
         "audio": audio0[:1]},
        jnp.zeros((1,)),
    )
    tx = make_optimizer(cfg.optim, steps_per_epoch=2, n_epochs=1)
    state = create_train_state(model, variables, tx)
    step = jax.jit(make_train_step(model, schedule, cfg))
    state, metrics = step(state, db, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["total"]))
    eval_step = jax.jit(make_eval_step(model, schedule, cfg))
    scores, pred = eval_step(state, db, jax.random.PRNGKey(2))
    assert pred.shape == (2, 64, 96, 1)
    assert np.isfinite(float(scores["total"]))
