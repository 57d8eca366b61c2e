"""Input-pipeline throughput at training rates (VERDICT round-1 #9).

Generates a synthetic on-disk DHF1k-layout tree (PNG frames + maps at the
storage resolution), then measures Loader items/s for the pil and cv2
decode backends at several worker counts, and reports the implied
data-time : step-time overlap for a given train-step latency.

    python scripts/data_bench.py [n_videos] [frames_per_video] [step_ms]
"""

import os
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def make_tree(root: str, n_videos: int, n_frames: int, hw=(360, 640)):
    from PIL import Image

    rng = np.random.RandomState(0)
    for v in range(1, n_videos + 1):
        fdir = os.path.join(root, "frames", str(v))
        mdir = os.path.join(root, "maps", str(v))
        if os.path.isdir(fdir) and len(os.listdir(fdir)) == n_frames:
            continue
        os.makedirs(fdir, exist_ok=True)
        os.makedirs(mdir, exist_ok=True)
        # natural-image-ish content so PNG sizes are realistic
        base = rng.randint(0, 255, (hw[0] // 8, hw[1] // 8, 3), np.uint8)
        for i in range(1, n_frames + 1):
            img = np.asarray(
                Image.fromarray(base).resize((hw[1], hw[0]), Image.BILINEAR)
            )
            img = np.clip(
                img.astype(np.int16)
                + rng.randint(-20, 20, img.shape, np.int16),
                0, 255,
            ).astype(np.uint8)
            Image.fromarray(img).save(os.path.join(fdir, f"{i}.png"))
            Image.fromarray(img[:, :, 0]).save(
                os.path.join(mdir, "%04d.png" % i)
            )
    # pad the name list so the 600-video train split sees our videos
    return root


def bench(root: str, decode: str, workers: int, batch: int = 4,
          n_batches: int = 12):
    from diff_sal_tpu.data.loader import Loader
    from diff_sal_tpu.data.video_datasets import DHF1KDataset

    class _Subset(DHF1KDataset):
        # bypass the 600-video split bookkeeping: every video is train
        def __init__(self, path_data, **kw):
            super(DHF1KDataset, self).__init__(32, "train", (224, 384), 1, 1,
                                               decode)
            self.img_path = os.path.join(path_data, "frames")
            self.ann_path = os.path.join(path_data, "maps")
            for v in sorted(os.listdir(self.img_path), key=int):
                n = len(os.listdir(os.path.join(self.img_path, v)))
                for i in range(0, n - 32, self.skip_window):
                    self.windows.append((v, i))

    ds = _Subset(root)
    loader = Loader(ds, batch, shuffle=True, num_workers=workers)
    it = iter(loader)
    next(it)  # warm caches / threads
    t0 = time.perf_counter()
    n = 0
    for b in it:
        n += b["rgb"].shape[0]
        if n >= n_batches * batch:
            break
    dt = time.perf_counter() - t0
    return n / dt


def bench_packed(root: str, workers: int, batch: int = 4,
                 n_batches: int = 24):
    from diff_sal_tpu.data.loader import Loader
    from diff_sal_tpu.data.packed import PackedVideoDataset, pack_dhf1k_tree

    packed = os.path.join(root, "_packed")
    if not os.path.exists(os.path.join(packed, "index.json")):
        t0 = time.perf_counter()
        pack_dhf1k_tree(root, packed)
        print(f"# packed tree in {time.perf_counter() - t0:.1f}s")
    ds = PackedVideoDataset(packed)
    loader = Loader(ds, batch, shuffle=True, num_workers=workers)
    it = iter(loader)
    next(it)
    t0 = time.perf_counter()
    n = 0
    for b in it:
        assert b["rgb"].dtype == np.uint8
        n += b["rgb"].shape[0]
        if n >= n_batches * batch:
            break
    return n / (time.perf_counter() - t0)


def main():
    n_videos = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    n_frames = int(sys.argv[2]) if len(sys.argv) > 2 else 80
    step_ms = float(sys.argv[3]) if len(sys.argv) > 3 else 300.0
    root = "/tmp/dhf1k_synth"
    print(f"# generating {n_videos}x{n_frames} tree under {root} ...")
    make_tree(root, n_videos, n_frames)

    B = 4
    need = B / (step_ms / 1e3)  # clips/s to keep the chip fed
    print(f"# train step {step_ms:.0f} ms at B={B} needs {need:.1f} clips/s")
    for decode in ("pil", "cv2"):
        for workers in (0, 4, 8):
            cps = bench(root, decode, workers, batch=B)
            ratio = need / cps * 100.0
            print(
                f"{decode:4s} workers={workers}: {cps:6.2f} clips/s "
                f"(data time = {ratio:5.1f}% of step budget)"
            )
    for workers in (0, 4):
        cps = bench_packed(root, workers, batch=B)
        ratio = need / cps * 100.0
        print(
            f"packed workers={workers}: {cps:6.2f} clips/s "
            f"(data time = {ratio:5.1f}% of step budget)"
        )


if __name__ == "__main__":
    main()
