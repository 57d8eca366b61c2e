"""In-memory synthetic datasets with the exact real-item contract — for
tests, benchmarks and overfit experiments without data on disk."""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


class SyntheticVisualDataset:
    """Items like DHF1KDataset: gaussian-blob saliency maps tied to frame
    content so a model can actually learn the mapping."""

    def __init__(self, n: int = 32, img_size: Tuple[int, int] = (224, 384),
                 frames: int = 16, seed: int = 0, with_audio: bool = False):
        self.n = n
        self.img_size = img_size
        self.frames = frames
        self.seed = seed
        self.with_audio = with_audio

    def __len__(self):
        return self.n

    def __getitem__(self, idx):
        h, w = self.img_size
        rng = np.random.RandomState(self.seed * 100003 + idx)
        cy, cx = rng.randint(h // 4, 3 * h // 4), rng.randint(w // 4, 3 * w // 4)
        yy, xx = np.mgrid[0:h, 0:w]
        blob = np.exp(-(((yy - cy) / (h / 8)) ** 2 + ((xx - cx) / (w / 8)) ** 2))
        rgb = np.broadcast_to(
            blob[None, :, :, None], (self.frames, h, w, 3)
        ).astype(np.float32) + rng.randn(self.frames, h, w, 3).astype(np.float32) * 0.05
        item = {
            "rgb": rgb.astype(np.float32),
            "salmap": blob[..., None].astype(np.float32),
            "video_id": str(idx),
            "gt_index": idx,
        }
        if self.with_audio:
            item["audio"] = rng.randn(9, 112, 192, 1).astype(np.float32)
        return item


class SyntheticAVDataset(SyntheticVisualDataset):
    def __init__(self, *args, **kw):
        super().__init__(*args, with_audio=True, **kw)
