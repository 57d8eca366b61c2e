"""Pixel-space transforms applied to saliency maps before/after diffusion.

Mirrors reference `datasets/__init__.py:8-35`. Under the default config only
Gaussian dequantization (`x + 0.01 * N(0,1)`) is active on the way in, and
clamp-to-[0,1] on the way out. Jittable; randomness is explicit via a PRNG key.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from diff_sal_tpu.config import DataTransformConfig


def logit_transform(x: jnp.ndarray, lam: float = 1e-6) -> jnp.ndarray:
    x = lam + (1 - 2 * lam) * x
    return jnp.log(x) - jnp.log1p(-x)


def data_transform(
    cfg: DataTransformConfig, x: jnp.ndarray, rng: jax.Array
) -> jnp.ndarray:
    if cfg.uniform_dequantization:
        x = x / 256.0 * 255.0 + jax.random.uniform(rng, x.shape, x.dtype) / 256.0
    if cfg.gaussian_dequantization:
        x = x + jax.random.normal(rng, x.shape, x.dtype) * 0.01
    if cfg.rescaled:
        x = 2 * x - 1.0
    elif cfg.logit_transform:
        x = logit_transform(x)
    return x


def inverse_data_transform(cfg: DataTransformConfig, x: jnp.ndarray) -> jnp.ndarray:
    if cfg.logit_transform:
        x = jax.nn.sigmoid(x)
    elif cfg.rescaled:
        x = (x + 1.0) / 2.0
    return jnp.clip(x, 0.0, 1.0)


def normalize_rgb_u8(
    rgb: jnp.ndarray, dtype=jnp.float32, stats: str = "imagenet"
) -> jnp.ndarray:
    """(..., 3) uint8 -> normalized float, fused on device. The packed input
    pipelines (data/packed.py) ship raw uint8 to the chip so the host never
    touches float pixels. Two stat conventions, sharing the host loaders'
    constants (single sources of truth):

      'imagenet' — /255 + ImageNet mean/std, the DHF1k visual-pretrain
                   convention (data/video_datasets.py),
      'stavis'   — STAViS mean/std in 0-255 space, the 6-dataset AV corpus
                   convention (reference cfgs/dataset.json:74-77 norm_value=1;
                   data/av_dataset.py AV_MEAN/AV_STD).
    """
    if stats == "stavis":
        from diff_sal_tpu.data.av_dataset import AV_MEAN, AV_STD

        mean = jnp.asarray(AV_MEAN, dtype)
        std = jnp.asarray(AV_STD, dtype)
        return (rgb.astype(dtype) - mean) / std
    assert stats == "imagenet", stats
    from diff_sal_tpu.data.video_datasets import IMAGENET_MEAN, IMAGENET_STD

    mean = jnp.asarray(IMAGENET_MEAN, dtype)
    std = jnp.asarray(IMAGENET_STD, dtype)
    return (rgb.astype(dtype) / 255.0 - mean) / std
