"""Golden-value regression tests: fixed-seed tiny-model outputs pinned to
committed fixtures. Catches silent numerical drift from refactors (layouts,
fusion changes, layer rewrites) that shape tests cannot see.

Regenerate (only when a deliberate numerical change is made):
    python tests/test_golden.py regen
"""

import pytest
import os

import jax
import jax.numpy as jnp
import numpy as np

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def _salunet_output():
    from diff_sal_tpu.config import SalUNetConfig
    from diff_sal_tpu.models.sal_unet import SalUNet

    cfg = SalUNetConfig(img_size=(64, 96))
    m = SalUNet(cfg)
    key = jax.random.PRNGKey(7)
    feats = [
        jax.random.normal(jax.random.fold_in(key, i), s) * 0.5
        for i, s in enumerate(
            [(1, 8, 2, 3, 768), (1, 8, 4, 6, 384), (1, 8, 8, 12, 192),
             (1, 8, 16, 24, 96)]
        )
    ]
    x = jax.random.normal(jax.random.fold_in(key, 10), (1, 64, 96, 1))
    t = jnp.asarray([500.0])
    audio = jax.random.normal(jax.random.fold_in(key, 11), (1, 9, 2, 3, 512))
    v = m.init(jax.random.PRNGKey(0), x, t, feats, audio)
    out = m.apply(v, x, t, feats, audio)
    return np.asarray(out)[0, ::8, ::8, 0]


def _mvit_outputs():
    from diff_sal_tpu.config import MViTConfig
    from diff_sal_tpu.models.mvit import MViT

    cfg = MViTConfig.tiny(spatial_size=(64, 96))
    m = MViT(cfg)
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 16, 64, 96, 3)) * 0.3
    v = m.init(jax.random.PRNGKey(4), x)
    outs = m.apply(v, x)
    return np.concatenate([np.asarray(o).ravel()[::977] for o in outs])


def _schedule_fingerprint():
    from diff_sal_tpu.diffusion.schedule import make_schedule

    sch = make_schedule("cosine", num_diffusion_timesteps=1000)
    return np.stack(
        [np.asarray(sch.sqrt_alphas_hat)[::97],
         np.asarray(sch.posterior_mean_coef1)[::97]]
    )


CASES = {
    "salunet": _salunet_output,
    "mvit": _mvit_outputs,
    "schedule": _schedule_fingerprint,
}


def _check(name, fn):
    path = os.path.join(GOLDEN, f"{name}.npy")
    got = fn()
    want = np.load(path)
    np.testing.assert_allclose(got, want, atol=5e-5, err_msg=name)


@pytest.mark.slow
def test_golden_salunet():
    _check("salunet", _salunet_output)


@pytest.mark.slow
def test_golden_mvit():
    _check("mvit", _mvit_outputs)


def test_golden_schedule():
    _check("schedule", _schedule_fingerprint)


if __name__ == "__main__":
    import sys

    if len(sys.argv) > 1 and sys.argv[1] == "regen":
        os.makedirs(GOLDEN, exist_ok=True)
        for name, fn in CASES.items():
            np.save(os.path.join(GOLDEN, f"{name}.npy"), fn())
            print("wrote", name)
