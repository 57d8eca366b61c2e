"""diff_sal_tpu — a TPU-native (JAX/XLA/Pallas) audio-visual saliency diffusion framework.

Re-implements the full capability surface of DiffSal (CVPR'24): conditional
diffusion denoising for video saliency prediction, with an MViTv2 video
encoder, VGGish audio encoder, cross-modal Saliency-UNet denoiser, DDIM /
DDPM / DPM-Solver samplers, saliency losses & metrics, and data-parallel
training over a `jax.sharding.Mesh`.

The design is TPU-first: channel-last layouts, static shapes, `lax.scan`
samplers, fused XLA/Pallas compute, and pjit/`NamedSharding` parallelism —
not a port of the reference's PyTorch/CUDA structure.
"""

__version__ = "0.1.0"

from diff_sal_tpu.config import (  # noqa: F401
    DiffusionConfig,
    ModelConfig,
    SamplingConfig,
    TrainingConfig,
)
