"""Packed uint8 dataset format: decode-free input pipeline.

The reference re-decodes every PNG frame on every epoch (PIL in dataloader
workers, datasets/dhf1k_data.py) — ~250 ms of CPU per 16-frame clip, which
cannot feed a ~200 ms/step accelerator from few cores. The TPU-first
answer: a one-time packing pass stores each video as a uint8 memmap at the
training resolution; items become pure memmap slices (~2 ms/clip), and the
ImageNet normalization moves INTO the jitted step (uint8 -> bf16 on
device), so the host never touches float pixels.

Layout under <root>/:
    <vid>_frames.npy   (N, H, W, 3) uint8   raw RGB at img_size
    <vid>_maps.npy     (N, H, W)    uint8   saliency maps
    index.json         {"videos": {vid: n_frames}, "img_size": [H, W]}

Items carry "rgb" as uint8; diff_sal_tpu.data.transforms.normalize_rgb
(called inside the model's encode_visual when it sees uint8) applies the
/255 + ImageNet mean/std on device.
"""

from __future__ import annotations

import json
import os
from typing import List, Optional, Tuple

import numpy as np

from diff_sal_tpu.data.video_datasets import (
    VideoWindowDataset,
    center_slice,
)


def pack_dhf1k_tree(
    src_root: str,
    dst_root: str,
    img_size: Tuple[int, int] = (224, 384),
    videos: Optional[List[str]] = None,
    decode: str = "cv2",
) -> str:
    """One-time pack of a DHF1k-layout tree (frames/<vid>/<i>.png +
    maps/<vid>/%04d.png) into uint8 memmaps at img_size."""
    from PIL import Image

    os.makedirs(dst_root, exist_ok=True)
    frames_root = os.path.join(src_root, "frames")
    vids = videos or sorted(os.listdir(frames_root), key=int)
    index = {"videos": {}, "img_size": list(img_size)}

    def _load(path, gray=False):
        if decode == "cv2":
            import cv2

            flag = cv2.IMREAD_GRAYSCALE if gray else cv2.IMREAD_COLOR
            arr = cv2.imread(path, flag)
            if arr is None:  # cv2 returns None instead of raising
                raise FileNotFoundError(path)
            arr = cv2.resize(
                arr, (img_size[1], img_size[0]),
                interpolation=cv2.INTER_LINEAR,
            )
            return arr if gray else arr[:, :, ::-1]
        img = Image.open(path).convert("L" if gray else "RGB")
        return np.asarray(
            img.resize((img_size[1], img_size[0]), Image.BILINEAR)
        )

    for vid in vids:
        fdir = os.path.join(frames_root, vid)
        mdir = os.path.join(src_root, "maps", vid)
        n = len(os.listdir(fdir))
        fr = np.lib.format.open_memmap(
            os.path.join(dst_root, f"{vid}_frames.npy"), mode="w+",
            dtype=np.uint8, shape=(n, *img_size, 3),
        )
        mp = np.lib.format.open_memmap(
            os.path.join(dst_root, f"{vid}_maps.npy"), mode="w+",
            dtype=np.uint8, shape=(n, *img_size),
        )
        for i in range(1, n + 1):
            fr[i - 1] = _load(os.path.join(fdir, f"{i}.png"))
            map_path = os.path.join(mdir, "%04d.png" % i)
            if os.path.exists(map_path):
                mp[i - 1] = _load(map_path, gray=True)
        fr.flush()
        mp.flush()
        index["videos"][vid] = n
    with open(os.path.join(dst_root, "index.json"), "w") as f:
        json.dump(index, f)
    return dst_root


class PackedVideoDataset(VideoWindowDataset):
    """Windowed dataset over a packed tree; same item contract as
    DHF1KDataset except "rgb" is uint8 (H, W fixed at pack time) and the
    normalization happens on device."""

    def __init__(self, packed_root: str, len_snippet: int = 32,
                 mode: str = "train", gt_length: int = 1, alternate: int = 1,
                 videos: Optional[List[str]] = None):
        with open(os.path.join(packed_root, "index.json")) as f:
            index = json.load(f)
        img_size = tuple(index["img_size"])
        super().__init__(len_snippet, mode, img_size, gt_length, alternate)
        self.root = packed_root
        self._frames = {}
        self._maps = {}
        names = videos or sorted(index["videos"], key=int)
        for v in names:
            n = index["videos"][v]
            if mode == "train":
                stride = self.skip_window
            elif mode == "val":
                stride = self.gt_length
            else:
                stride = 1
            for i in range(0, n - alternate * len_snippet, stride):
                self.windows.append((v, i))
            if mode == "test":
                self.windows.append((v, n - len_snippet))

    def _mmap(self, cache, vid, kind):
        if vid not in cache:
            cache[vid] = np.load(
                os.path.join(self.root, f"{vid}_{kind}.npy"), mmap_mode="r"
            )
        return cache[vid]

    def __getitem__(self, idx: int):
        v, start = self.windows[idx]
        fr = self._mmap(self._frames, v, "frames")
        indices = [
            start + self.alternate * i for i in range(self.frame_lens)
        ]
        rgb = np.ascontiguousarray(fr[indices])  # (16, H, W, 3) uint8
        gt_idx = center_slice(indices, self.gt_length)[0]
        item = {"rgb": rgb, "video_id": v, "gt_index": gt_idx + 1}
        if self.mode != "test":
            mp = self._mmap(self._maps, v, "maps")
            item["salmap"] = (
                np.asarray(mp[gt_idx], np.float32) / 255.0
            )[..., None]
        return item


# ---------------------------------------------------------------------------
# Packed audio-visual corpus (DIEM, Coutrot1/2, SumMe, ETMD, AVAD)
# ---------------------------------------------------------------------------
#
# The AV analogue of pack_dhf1k_tree, replacing the hottest host work in
# AVSaliencyDataset (data/av_dataset.py — itself a mirror of reference
# datasets/saliency_db.py:318-398, the per-item PIL decode x16 + numpy mel
# DSP that runs at 3-5 clips/s/core against a ~10 ms/clip device step):
#
#   frames  <ds>__<vid>_frames.npy  (N, H, W, 3) uint8, the reference's
#           two-stage resize (decode -> 320x240 -> img_size) baked in; the
#           STAViS normalization moves on device (normalize_rgb_u8 'stavis')
#   maps    <ds>__<vid>_maps.npy    (N, H, W) uint8 eyeMaps
#   wave    <ds>__<vid>_wave.npy    (L,) float32, resampled to 16 kHz ONCE
#           at pack time; items ship a PACKED_WAVE_LEN=25600-sample padded
#           excerpt ("wave") and the log-mel frontend runs INSIDE the jitted
#           train/eval step (audio/mel.py device_audio_frontend) — the
#           TPU-native replacement for the reference's CPU-worker DSP.
#
# Packing is split-independent: every video named in any fold list is packed
# once; PackedAVDataset rebuilds the step windows per (split, train) from
# the same fold lists at load time.
#
# Deviation note (documented, deliberate): the reference center-pads the
# excerpt to 35280 samples at the file's native rate and resamples inside
# waveform_to_examples (saliency_db.py:477-487) — for the corpus's native
# 22050 Hz that is exactly PACKED_WAVE_LEN after resampling, and
# resample-then-pad differs from pad-then-resample only in the anti-alias
# filter tails at the excerpt boundary (see tests/test_packed_av.py
# tolerance check). Only audio_type='mel' (what the shipped model consumes)
# is supported packed; spec/ori stay on the host path.


def pack_av_tree(
    data_config: dict,
    dst_root: str,
    img_size: Tuple[int, int] = (224, 384),
    datasets: Optional[List[str]] = None,
    decode: str = "cv2",
) -> str:
    """One-time pack of the 6-dataset AV corpus (cfgs/dataset.json schema)
    into uint8/float32 memmaps. Packs the union of videos over every fold
    list of every split."""
    from diff_sal_tpu.audio.mel import SAMPLE_RATE
    from diff_sal_tpu.data.av_dataset import (
        AV_DATASET_NAMES,
        load_wav,
        read_fold_list,
    )

    os.makedirs(dst_root, exist_ok=True)
    names = list(datasets) if datasets else list(AV_DATASET_NAMES)
    with_audio = bool(data_config.get("with_audio", True))
    index = {
        "img_size": list(img_size),
        "sr": SAMPLE_RATE,
        "with_audio": with_audio,
        "videos": {},
    }

    def _load_frame(path, gray=False):
        if decode == "cv2":
            import cv2

            arr = cv2.imread(
                path, cv2.IMREAD_GRAYSCALE if gray else cv2.IMREAD_COLOR
            )
            if arr is None:
                raise FileNotFoundError(path)
            if not gray:
                # reference two-stage FRAME resize: decode -> 320x240 ->
                # img_size (av_dataset._load_rgb); eyeMaps resize directly
                arr = cv2.resize(
                    arr, (320, 240), interpolation=cv2.INTER_LINEAR
                )
            arr = cv2.resize(
                arr, (img_size[1], img_size[0]),
                interpolation=cv2.INTER_LINEAR,
            )
            return arr if gray else arr[:, :, ::-1]
        from PIL import Image

        img = Image.open(path).convert("L" if gray else "RGB")
        img = img.resize((320, 240)) if not gray else img
        return np.asarray(
            img.resize((img_size[1], img_size[0]), Image.BILINEAR)
        )

    for name in names:
        video_root = data_config[f"video_path_{name}"]
        salmap_root = data_config[f"salmap_path_{name}"]
        audio_root = data_config[f"audio_path_{name}"]
        seen = {}
        for split, folds in data_config.items():
            if not (isinstance(folds, dict) and split.startswith("split")):
                continue
            for key in (f"annotation_path_{name}_train",
                        f"annotation_path_{name}_test"):
                if key not in folds:
                    continue
                for vid, n_frames, fps in read_fold_list(folds[key]):
                    seen.setdefault(vid, (n_frames, fps))
        for vid, (n_frames, fps) in sorted(seen.items()):
            vdir = os.path.join(video_root, vid)
            mdir = os.path.join(salmap_root, vid, "maps")
            wav_path = os.path.join(audio_root, vid, vid + ".wav")
            if not (os.path.isdir(vdir) and os.path.isdir(mdir)):
                continue
            if with_audio and not os.path.exists(wav_path):
                continue
            key = f"{name}__{vid}"
            # frames present on disk may stop short of the fold list's count
            n = 0
            while os.path.exists(
                os.path.join(vdir, "img_{:05d}.jpg".format(n + 1))
            ):
                n += 1
            if n == 0:
                continue
            fr = np.lib.format.open_memmap(
                os.path.join(dst_root, f"{key}_frames.npy"), mode="w+",
                dtype=np.uint8, shape=(n, *img_size, 3),
            )
            mp = np.lib.format.open_memmap(
                os.path.join(dst_root, f"{key}_maps.npy"), mode="w+",
                dtype=np.uint8, shape=(n, *img_size),
            )
            for i in range(1, n + 1):
                fr[i - 1] = _load_frame(
                    os.path.join(vdir, "img_{:05d}.jpg".format(i))
                )
                map_path = os.path.join(mdir, "eyeMap_{:05d}.jpg".format(i))
                if os.path.exists(map_path):
                    mp[i - 1] = _load_frame(map_path, gray=True)
            fr.flush()
            mp.flush()
            entry = {"dataset": name, "video": vid, "n": n,
                     "n_frames": int(n_frames), "fps": float(fps)}
            if with_audio:
                wave, sr = load_wav(wav_path)
                if sr != SAMPLE_RATE:
                    from scipy.signal import resample_poly

                    g = int(np.gcd(int(sr), SAMPLE_RATE))
                    wave = resample_poly(wave, SAMPLE_RATE // g, int(sr) // g)
                np.save(
                    os.path.join(dst_root, f"{key}_wave.npy"),
                    np.asarray(wave, np.float32),
                )
                entry["wave_len"] = int(len(wave))
            index["videos"][key] = entry
    with open(os.path.join(dst_root, "index.json"), "w") as f:
        json.dump(index, f)
    return dst_root


class PackedAVDataset:
    """Windowed AV dataset over a packed tree; same windows and metadata as
    AVSaliencyDataset (audio_type='mel'), but items are memmap slices:
    "rgb" uint8 (STAViS normalization on device — set the model's
    uint8_norm='stavis') and "wave" a (25600,) float32 16 kHz excerpt whose
    log-mel runs inside the jitted step."""

    def __init__(
        self,
        packed_root: str,
        data_config: dict,
        split: str,
        train: bool,
        *,
        exhaustive_sampling: bool = False,
        sample_duration: int = 16,
        step_duration: int = 90,
        resample_zero_gt: bool = True,
        datasets: Optional[List[str]] = None,
    ):
        from diff_sal_tpu.audio.mel import SAMPLE_RATE
        from diff_sal_tpu.data.av_dataset import (
            AV_DATASET_NAMES,
            frame_sample_ranges,
            read_fold_list,
        )

        with open(os.path.join(packed_root, "index.json")) as f:
            self.index = json.load(f)
        assert self.index["sr"] == SAMPLE_RATE, self.index["sr"]
        self.root = packed_root
        self.img_size = tuple(self.index["img_size"])
        self.with_audio = bool(self.index.get("with_audio", True))
        self.sample_duration = sample_duration
        self.resample_zero_gt = resample_zero_gt
        if exhaustive_sampling:
            step, step_duration = 1, sample_duration
        else:
            step = max(1, step_duration - sample_duration)

        flag = "train" if train else "test"
        self.samples = []
        self.ranges = {}
        self._mm = {}
        for name in (datasets or AV_DATASET_NAMES):
            fold = data_config[split][f"annotation_path_{name}_{flag}"]
            for vid, n_frames, fps in read_fold_list(fold):
                key = f"{name}__{vid}"
                meta = self.index["videos"].get(key)
                if meta is None or n_frames <= 1:
                    continue
                if self.with_audio:
                    self.ranges[key] = frame_sample_ranges(
                        n_frames, fps, SAMPLE_RATE, meta["wave_len"]
                    )
                for j in range(1, n_frames, step):
                    self.samples.append(
                        (key, list(range(j, min(n_frames + 1, j + step_duration))))
                    )

    def __len__(self):
        return len(self.samples)

    def _load(self, key: str, kind: str):
        ck = (key, kind)
        if ck not in self._mm:
            self._mm[ck] = np.load(
                os.path.join(self.root, f"{key}_{kind}.npy"), mmap_mode="r"
            )
        return self._mm[ck]

    def __getitem__(self, index: int):
        from diff_sal_tpu.audio.mel import PACKED_WAVE_LEN, center_pad_excerpt
        from diff_sal_tpu.data.av_dataset import (
            median_frame_index,
            temporal_center_crop,
        )

        key, frame_indices = self.samples[index]
        meta = self.index["videos"][key]
        indices = temporal_center_crop(frame_indices, self.sample_duration)
        med = median_frame_index(indices)
        n = meta["n"]

        mp = self._load(key, "maps")
        salmap = (
            np.asarray(mp[min(med, n) - 1], np.float32) / 255.0
        )[..., None]
        if salmap.max() == 0 and self.resample_zero_gt:
            # reference quirk (saliency_db.py:390-392), crash-guarded like
            # AVSaliencyDataset
            return self.__getitem__(int(np.random.randint(0, max(index, 1))))

        fr = self._load(key, "frames")
        # fold lists can promise more frames than exist on disk; loop-pad by
        # repeating the last packed frame (av_dataset._load_rgb behavior)
        rows = [min(i, n) - 1 for i in indices]
        item = {
            "rgb": np.ascontiguousarray(fr[rows]),  # (16, H, W, 3) uint8
            "salmap": salmap,
            "video_id": f"{meta['dataset']}/{meta['video']}",
            "gt_index": med,
            "dataset": meta["dataset"],
        }
        if self.with_audio:
            wave = self._load(key, "wave")
            starts, ends = self.ranges[key]
            lo, hi = starts[indices[0]], ends[indices[-1]]
            item["wave"] = center_pad_excerpt(
                np.asarray(wave[lo : hi + 1]), PACKED_WAVE_LEN
            ).astype(np.float32)
        return item
