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
