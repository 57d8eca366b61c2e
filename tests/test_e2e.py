"""Minimum end-to-end slice (SURVEY.md §7.2 stage 4): random frames ->
MViT -> SalUNet -> DDIM(NFE=1) -> inverse transform -> eval scores.

Runs at a reduced 64x96 resolution on the CPU backend; the full-resolution
path is exercised by the benchmark and graft entry."""

import pytest
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from diff_sal_tpu.config import (
    DataTransformConfig,
    MViTConfig,
    ModelConfig,
    SalUNetConfig,
    SamplingConfig,
)
from diff_sal_tpu.diffusion.schedule import make_schedule
from diff_sal_tpu.inference import sample_saliency
from diff_sal_tpu.models.diff_model import VideoSaliencyModel, param_counts
from diff_sal_tpu.train.losses import eval_scores


def small_visual_model(hw=(64, 96)):
    return ModelConfig(
        visual=MViTConfig.small(spatial_size=hw),
        audio=None,
        spatiotemp=None,
        decoder=SalUNetConfig(img_size=hw),
    )


@pytest.mark.slow
def test_e2e_visual_ddim_nfe1():
    cfg = small_visual_model()
    model = VideoSaliencyModel(cfg)
    rng = jax.random.PRNGKey(0)
    rgb = jax.random.normal(rng, (1, 16, 64, 96, 3)) * 0.1

    variables = model.init(
        jax.random.PRNGKey(1), {"rgb": rgb, "input": jnp.zeros((1, 64, 96, 1))},
        jnp.zeros((1,)),
    )
    counts = param_counts(variables)
    assert counts["visual_net"] > 30  # ~34M MViT-small
    assert counts["decoder_net"] > 10

    schedule = make_schedule("cosine", num_diffusion_timesteps=1000)
    pred = sample_saliency(
        model,
        variables,
        schedule,
        SamplingConfig(),  # ddim, timesteps=1, eta=0
        DataTransformConfig(),
        rgb,
    )
    assert pred.shape == (1, 64, 96, 1)
    p = np.asarray(pred)
    assert np.isfinite(p).all() and p.min() >= 0.0 and p.max() <= 1.0

    gt = jax.random.uniform(jax.random.PRNGKey(2), (1, 64, 96, 1)) + 0.01
    scores = eval_scores(jnp.asarray(p), gt)
    assert np.isfinite(float(scores["total"]))


@pytest.mark.slow
def test_e2e_forward_train_path():
    """Full training forward (model(data, t)) with loss — mirrors the train
    step body."""
    cfg = small_visual_model()
    model = VideoSaliencyModel(cfg)
    rgb = jnp.zeros((1, 16, 64, 96, 3))
    x_t = jnp.zeros((1, 64, 96, 1))
    t = jnp.zeros((1,))
    variables = model.init(jax.random.PRNGKey(0), {"rgb": rgb, "input": x_t}, t)
    out, mutated = model.apply(
        variables,
        {"rgb": rgb, "input": x_t},
        t,
        True,
        mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(3)},
    )
    assert out.shape == (1, 64, 96, 1)
    assert "batch_stats" in mutated


@pytest.mark.slow
def test_decoder_only_random_pyramid_fallback():
    """visual=None substitutes a random feature pyramid at the MViT shapes
    (reference diff_model.py:100-109, decoder-only ablation)."""
    hw = (64, 96)
    cfg = ModelConfig(
        visual=None, audio=None, spatiotemp=None,
        decoder=SalUNetConfig(img_size=hw),
    )
    model = VideoSaliencyModel(cfg)
    rgb = jnp.zeros((2, 16, *hw, 3))
    x_t = jnp.zeros((2, *hw, 1))
    t = jnp.zeros((2,))
    variables = model.init(
        jax.random.PRNGKey(0), {"rgb": rgb, "input": x_t}, t
    )
    assert "visual_net" not in variables["params"]

    pyr = model.apply(
        variables, rgb, method=VideoSaliencyModel.encode_visual,
        rngs={"pyramid": jax.random.PRNGKey(1)},
    )
    assert [p.shape for p in pyr] == [
        (2, 8, 2, 3, 768), (2, 8, 4, 6, 384), (2, 8, 8, 12, 192),
        (2, 8, 16, 24, 96),
    ]
    # fresh randomness per rng, like the reference's torch.randn
    pyr2 = model.apply(
        variables, rgb, method=VideoSaliencyModel.encode_visual,
        rngs={"pyramid": jax.random.PRNGKey(2)},
    )
    assert not np.allclose(np.asarray(pyr[0]), np.asarray(pyr2[0]))

    out = model.apply(
        variables, {"rgb": rgb, "input": x_t}, t,
        rngs={"pyramid": jax.random.PRNGKey(1)},
    )
    assert out.shape == (2, *hw, 1)
    assert np.isfinite(np.asarray(out)).all()
