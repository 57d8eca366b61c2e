"""Full-model converter coverage: export our initialized variables to a
reference-format torch state_dict, convert back, and require bit-identical
pytrees covering every leaf. Combined with the block-level numerical parity
tests (test_torch_parity.py), this pins both the key mapping and the layout
rules for the released-checkpoint import path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diff_sal_tpu.config import MViTConfig, SalUNetConfig
from diff_sal_tpu.models.mvit import MViT
from diff_sal_tpu.models.sal_unet import SalUNet
from diff_sal_tpu.train import convert as cv


def _trees_equal(a, b, path=""):
    assert set(a.keys()) == set(b.keys()), (
        path, sorted(a.keys()), sorted(b.keys())
    )
    for k in a:
        if isinstance(a[k], dict):
            _trees_equal(a[k], b[k], path + "/" + str(k))
        else:
            np.testing.assert_array_equal(
                np.asarray(a[k]), np.asarray(b[k]), err_msg=path + "/" + str(k)
            )


def _to_plain(tree):
    if hasattr(tree, "items"):
        return {k: _to_plain(v) for k, v in tree.items()}
    return np.asarray(tree)


@pytest.mark.slow
def test_mvit_converter_roundtrip():
    cfg = MViTConfig.small(spatial_size=(64, 64))
    m = MViT(cfg)
    variables = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 64, 64, 3)))
    params = _to_plain(variables["params"])
    sd = cv.export_mvit(params, cfg.num_layers)
    back = cv.convert_mvit(sd, cfg.num_layers)["params"]
    _trees_equal(params, back)


@pytest.mark.slow
def test_salunet_converter_roundtrip():
    cfg = SalUNetConfig()
    m = SalUNet(cfg)
    feats = [
        jnp.zeros((1, 8, 7, 12, 768)),
        jnp.zeros((1, 8, 14, 24, 384)),
        jnp.zeros((1, 8, 28, 48, 192)),
        jnp.zeros((1, 8, 56, 96, 96)),
    ]
    variables = m.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 224, 384, 1)),
        jnp.zeros((1,)),
        feats,
        jnp.zeros((1, 9, 7, 12, 512)),
    )
    params = _to_plain(variables["params"])
    stats = _to_plain(variables["batch_stats"])
    sd = cv.export_salunet(params, stats)
    back = cv.convert_salunet(sd)
    _trees_equal(params, back["params"])
    _trees_equal(stats, back["batch_stats"])


def test_split_full_state_dict():
    sd = {
        "module.visual_net.cls_token": np.zeros(3),
        "module.decoder_net.conv_in.weight": np.zeros((96, 1, 3, 3)),
        "module.audio_net.features.0.weight": np.zeros((64, 1, 3, 3)),
        "module.spatiotemp_net.transformer.norm.weight": np.zeros(512),
        "module.fc.0.weight": np.zeros((512, 128)),
    }
    parts = cv.split_diffsal_state_dict(sd)
    assert "cls_token" in parts["visual_net"]
    assert "conv_in.weight" in parts["decoder_net"]
    assert "features.0.weight" in parts["audio_net"]
    assert "transformer.norm.weight" in parts["spatiotemp_net"]
    assert "fc.0.weight" in parts["other"]
