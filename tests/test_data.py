"""Data-layer tests on generated fake on-disk datasets (DHF1k layout + AV
fold layout) and the loader's sharding/batching semantics."""

import os

import numpy as np
import pytest
from PIL import Image

from diff_sal_tpu.data.av_dataset import (
    AVSaliencyDataset,
    ConcatDataset,
    median_frame_index,
    temporal_center_crop,
)
from diff_sal_tpu.data.loader import Loader, collate
from diff_sal_tpu.data.synthetic import SyntheticAVDataset, SyntheticVisualDataset
from diff_sal_tpu.data.video_datasets import DHF1KDataset


@pytest.fixture(scope="module")
def dhf1k_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("dhf1k")
    rng = np.random.RandomState(0)
    # 3 "videos" named 1..3 but the split logic needs 600+ names for train;
    # use val-mode style by monkeypatching below; instead create 601 dirs
    # cheaply with 1 real video and symlinks? Simpler: test with mode-specific
    # windows on a tiny custom split via subclassing is overkill — make the
    # videos land in the train split by naming them 1..3 and patching split
    # boundaries is intrusive. We test the item path via direct window
    # injection instead.
    frames = root / "frames" / "1"
    maps = root / "maps" / "1"
    frames.mkdir(parents=True)
    maps.mkdir(parents=True)
    for i in range(1, 41):
        Image.fromarray(
            rng.randint(0, 255, (48, 64, 3), dtype=np.uint8)
        ).save(frames / f"{i}.png")
        Image.fromarray(
            rng.randint(0, 255, (48, 64), dtype=np.uint8)
        ).save(maps / ("%04d.png" % i))
    return root


def test_dhf1k_item_contract(dhf1k_root):
    ds = DHF1KDataset.__new__(DHF1KDataset)
    # construct bookkeeping manually (split logic needs 1000 videos on disk)
    from diff_sal_tpu.data.video_datasets import VideoWindowDataset

    VideoWindowDataset.__init__(ds, 32, "train", (32, 48), 1, 1)
    ds.img_path = os.path.join(str(dhf1k_root), "frames")
    ds.ann_path = os.path.join(str(dhf1k_root), "maps")
    ds.windows = [("1", 0), ("1", 8)]

    item = ds[0]
    assert item["rgb"].shape == (16, 32, 48, 3)
    assert item["salmap"].shape == (32, 48, 1)
    assert 0.0 <= item["salmap"].min() and item["salmap"].max() <= 1.0
    # gt index = center of [1..16] -> 9
    assert item["gt_index"] == 9
    # ImageNet normalization applied: mean roughly centered
    assert abs(item["rgb"].mean()) < 3.0


@pytest.fixture(scope="module")
def av_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("avad")
    rng = np.random.RandomState(1)
    vid = "v001"
    (root / "video" / vid).mkdir(parents=True)
    (root / "ann" / vid / "maps").mkdir(parents=True)
    (root / "audio" / vid).mkdir(parents=True)
    n_frames = 40
    for i in range(1, n_frames + 1):
        Image.fromarray(
            rng.randint(0, 255, (36, 64, 3), dtype=np.uint8)
        ).save(root / "video" / vid / ("img_%05d.jpg" % i))
        Image.fromarray(
            rng.randint(1, 255, (36, 64), dtype=np.uint8)
        ).save(root / "ann" / vid / "maps" / ("eyeMap_%05d.jpg" % i))
    # 2 seconds of 22050 Hz int16 wav
    from scipy.io import wavfile

    sr = 22050
    wave = (rng.randn(sr * 2) * 3000).astype(np.int16)
    wavfile.write(root / "audio" / vid / f"{vid}.wav", sr, wave)
    with open(root / "fold.txt", "w") as f:
        f.write(f"{vid} {n_frames} 20.0\n")
    return root


def test_av_dataset_item_contract(av_root):
    ds = AVSaliencyDataset(
        str(av_root / "video"),
        str(av_root / "fold.txt"),
        str(av_root / "ann"),
        str(av_root / "audio"),
        name="avad",
        img_size=(32, 48),
    )
    assert len(ds) > 0
    item = ds[0]
    assert item["rgb"].shape == (16, 32, 48, 3)
    assert item["salmap"].shape == (32, 48, 1)
    assert item["audio"].shape == (9, 112, 192, 1)
    assert item["video_id"].startswith("avad/")


def test_av_exhaustive_windows(av_root):
    ds = AVSaliencyDataset(
        str(av_root / "video"),
        str(av_root / "fold.txt"),
        str(av_root / "ann"),
        str(av_root / "audio"),
        exhaustive_sampling=True,
        img_size=(32, 48),
    )
    # step 1 from frame 1..n_frames-1 -> 39 windows
    assert len(ds) == 39


def test_temporal_center_crop_and_median():
    idx = list(range(1, 91))
    out = temporal_center_crop(idx, 16)
    assert len(out) == 16
    assert out[0] == 38  # center 45, begin 45-8=37 -> value 38
    # median of 16 consecutive ints x..x+15 is x+7.5 -> ROUND_HALF_UP -> x+8
    assert median_frame_index(out) == out[0] + 8
    # loop padding when short
    short = temporal_center_crop([5, 6, 7], 6)
    assert len(short) == 6


def test_loader_sharding_and_batching():
    ds = SyntheticVisualDataset(n=20, img_size=(16, 24), frames=4)
    l0 = Loader(ds, 4, shuffle=True, seed=1, process_index=0, process_count=2,
                num_workers=2)
    l1 = Loader(ds, 4, shuffle=True, seed=1, process_index=1, process_count=2,
                num_workers=2)
    b0 = list(l0)
    b1 = list(l1)
    assert len(b0) == len(b1) == 2  # 10 per shard, batch 4, drop_last
    ids0 = {v for b in b0 for v in b["video_id"]}
    ids1 = {v for b in b1 for v in b["video_id"]}
    assert ids0.isdisjoint(ids1)
    assert b0[0]["rgb"].shape == (4, 4, 16, 24, 3)


def test_loader_pad_last():
    ds = SyntheticVisualDataset(n=5, img_size=(8, 12), frames=2)
    l = Loader(ds, 4, drop_last=False, pad_last=True, num_workers=0)
    batches = list(l)
    assert len(batches) == 2
    assert batches[1]["rgb"].shape[0] == 4
    # padded entries repeat the final item
    assert batches[1]["video_id"][-1] == batches[1]["video_id"][1]


def test_loader_epoch_reshuffle():
    ds = SyntheticVisualDataset(n=16, img_size=(8, 12), frames=2)
    l = Loader(ds, 4, shuffle=True, seed=0, num_workers=0)
    order0 = [v for b in l for v in b["video_id"]]
    l.set_epoch(1)
    order1 = [v for b in l for v in b["video_id"]]
    assert order0 != order1
    assert sorted(order0) == sorted(order1)


def test_concat_dataset():
    a = SyntheticVisualDataset(n=3, img_size=(8, 12), frames=2, seed=0)
    b = SyntheticAVDataset(n=2, img_size=(8, 12), frames=2, seed=9)
    cat = ConcatDataset([a, b])
    assert len(cat) == 5
    assert "audio" not in cat[0]
    assert "audio" in cat[3]


def test_collate_mixed_types():
    items = [
        {"x": np.ones((2, 2)), "i": 3, "s": "a"},
        {"x": np.zeros((2, 2)), "i": 4, "s": "b"},
    ]
    out = collate(items)
    assert out["x"].shape == (2, 2, 2)
    assert out["i"].tolist() == [3, 4]
    assert out["s"] == ["a", "b"]


def test_packed_dataset_roundtrip(tmp_path):
    """pack_dhf1k_tree -> PackedVideoDataset: decode-free uint8 items whose
    frames match the source (data/packed.py), and the on-device
    normalization matches the host loader's constants."""
    import jax.numpy as jnp

    from diff_sal_tpu.data.packed import PackedVideoDataset, pack_dhf1k_tree
    from diff_sal_tpu.data.transforms import normalize_rgb_u8

    rng = np.random.RandomState(3)
    src = tmp_path / "src"
    n_frames = 40
    for vid in ("1", "2"):
        (src / "frames" / vid).mkdir(parents=True)
        (src / "maps" / vid).mkdir(parents=True)
        for i in range(1, n_frames + 1):
            Image.fromarray(
                rng.randint(0, 255, (32, 48, 3), dtype=np.uint8)
            ).save(src / "frames" / vid / f"{i}.png")
            Image.fromarray(
                rng.randint(0, 255, (32, 48), dtype=np.uint8)
            ).save(src / "maps" / vid / ("%04d.png" % i))

    packed = pack_dhf1k_tree(str(src), str(tmp_path / "dst"),
                             img_size=(32, 48), decode="pil")
    ds = PackedVideoDataset(packed, len_snippet=32, mode="train")
    assert len(ds) == 2  # one 16-frame window per 40-frame video (stride 16)
    item = ds[0]
    assert item["rgb"].dtype == np.uint8
    assert item["rgb"].shape == (16, 32, 48, 3)
    assert item["salmap"].shape == (32, 48, 1)
    assert 0.0 <= item["salmap"].min() and item["salmap"].max() <= 1.0
    # frames identical to the source pixels (img_size == stored size)
    src_img = np.asarray(Image.open(src / "frames" / "1" / "1.png"))
    np.testing.assert_array_equal(item["rgb"][0], src_img)
    # gt_index is 1-based like DHF1KDataset (center of frames 1..16 -> 9)
    assert item["gt_index"] == 9

    # on-device normalization == the host loader's float path
    from diff_sal_tpu.data.video_datasets import IMAGENET_MEAN, IMAGENET_STD

    dev = np.asarray(normalize_rgb_u8(jnp.asarray(item["rgb"])))
    host = (item["rgb"].astype(np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
    np.testing.assert_allclose(dev, host, atol=1e-6)


@pytest.mark.slow
def test_packed_uint8_through_model(tmp_path):
    """encode_visual normalizes uint8 input on device: same pyramid as
    pre-normalized float input."""
    import jax
    import jax.numpy as jnp

    from diff_sal_tpu.config import MViTConfig, ModelConfig, SalUNetConfig
    from diff_sal_tpu.data.transforms import normalize_rgb_u8
    from diff_sal_tpu.models.diff_model import VideoSaliencyModel

    cfg = ModelConfig(
        visual=MViTConfig.tiny(spatial_size=(64, 96)),
        audio=None, spatiotemp=None,
        decoder=SalUNetConfig(img_size=(64, 96)),
    )
    model = VideoSaliencyModel(cfg)
    rng = np.random.RandomState(0)
    rgb_u8 = jnp.asarray(rng.randint(0, 255, (1, 16, 64, 96, 3), np.uint8))
    rgb_f = normalize_rgb_u8(rgb_u8)
    variables = model.init(
        jax.random.PRNGKey(0),
        {"rgb": rgb_f, "input": jnp.zeros((1, 64, 96, 1))}, jnp.zeros((1,)),
    )
    p1 = model.apply(variables, rgb_u8, method=VideoSaliencyModel.encode_visual)
    p2 = model.apply(variables, rgb_f, method=VideoSaliencyModel.encode_visual)
    for a, b in zip(p1, p2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_loader_pad_last_valid_mask():
    """pad_last batches ALL carry a 'valid' mask (all-ones when full) so
    every batch shares one jit signature — a tail-only mask would change the
    pytree structure and trigger a second full eval_step compile."""
    ds = SyntheticVisualDataset(n=5, img_size=(16, 24), frames=4)
    loader = Loader(ds, 2, shuffle=False, drop_last=False, pad_last=True,
                    num_workers=0)
    batches = list(loader)
    assert len(batches) == 3
    np.testing.assert_array_equal(batches[0]["valid"], [1.0, 1.0])
    np.testing.assert_array_equal(batches[1]["valid"], [1.0, 1.0])
    np.testing.assert_array_equal(batches[2]["valid"], [1.0, 0.0])
    # the padded row is a copy of the last real one
    np.testing.assert_array_equal(batches[2]["rgb"][0], batches[2]["rgb"][1])


def test_av_dataset_audio_type_spec_and_ori(av_root):
    """audio_type='spec'/'ori' end-to-end through the dataset (reference
    selects them per config, saliency_db.py:343-368, dataset.json:81):
    channel-last equivalents of the reference shapes (1,257,219) and
    (1,1,35280)."""
    common = dict(
        fold_list_path=str(av_root / "fold.txt"),
        salmap_root=str(av_root / "ann"),
        audio_root=str(av_root / "audio"),
        name="avad",
        img_size=(32, 48),
    )
    spec_ds = AVSaliencyDataset(
        str(av_root / "video"), audio_type="spec", **common
    )
    a = spec_ds[0]["audio"]
    assert a.shape == (257, 219, 1)
    # standardized log-spectrogram: ~zero mean, ~unit std
    assert abs(float(a.mean())) < 0.05 and 0.5 < float(a.std()) < 2.0

    ori_ds = AVSaliencyDataset(
        str(av_root / "video"), audio_type="ori", **common
    )
    a = ori_ds[0]["audio"]
    assert a.shape == (1, 35280, 1)
    assert np.abs(a).max() <= 1.0 and np.abs(a).sum() > 0


def test_build_av_datasets_audio_type_knob(av_root):
    """The dataset.json 'audio_type' key reaches every per-dataset fold."""
    from diff_sal_tpu.data.av_dataset import AV_DATASET_NAMES, build_av_datasets

    config = {
        "sample_size": [48, 32],
        "audio_size": [48, 32],
        "sample_duration": 16,
        "with_audio": True,
        "audio_type": "spec",
        "split1": {},
    }
    for name in AV_DATASET_NAMES:
        config[f"video_path_{name}"] = str(av_root / "video")
        config[f"salmap_path_{name}"] = str(av_root / "ann")
        config[f"audio_path_{name}"] = str(av_root / "audio")
        config["split1"][f"annotation_path_{name}_train"] = str(av_root / "fold.txt")
        config["split1"][f"annotation_path_{name}_test"] = str(av_root / "fold.txt")
    ds = build_av_datasets(config, "split1", train=True)
    assert all(d.audio_type == "spec" for d in ds.datasets)
    assert ds[0]["audio"].shape == (257, 219, 1)


def test_holly_val_mode_reads_testing_tree_with_gt(tmp_path):
    """Holly/UCF 'val' mode = the reference's get_val_loader dataset
    (mode='val', holly2wood_dataset.py:35-45): windows over the `testing`
    tree WITH GT maps — what the generalized `test` CLI scores."""
    from diff_sal_tpu.data.video_datasets import HollywoodDataset

    rng = np.random.RandomState(0)
    vid = "actioncliptest00001"
    base = tmp_path / "testing" / vid
    (base / "images").mkdir(parents=True)
    (base / "maps").mkdir(parents=True)
    for i in range(20):
        name = "frame_%04d.png" % i
        Image.fromarray(
            rng.randint(0, 255, (24, 32, 3), dtype=np.uint8)
        ).save(base / "images" / name)
        Image.fromarray(
            rng.randint(1, 255, (24, 32), dtype=np.uint8)
        ).save(base / "maps" / name)

    ds = HollywoodDataset(str(tmp_path), 16, "val", img_size=(24, 32))
    assert len(ds) > 0
    item = ds[0]
    assert item["rgb"].shape == (16, 24, 32, 3)
    assert item["salmap"].shape == (24, 32, 1)  # GT present in val mode
    assert item["video_id"] == vid
