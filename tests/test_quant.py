"""Int8 quantization (ops/quant.py): numerics, tree transform, model wiring.

The reference has no quantization; this is the TPU deployment lever the
round-4 roofline identifies (docs/PERF.md). Tests pin: per-channel w8
reconstruction error, w8a8 dynamic-row path, quantize_like's structural
mapping, and that an MViT built with mlp_quant consumes the transformed
tree and stays close to the fp forward.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diff_sal_tpu.ops.quant import (QuantDense, quantize_kernel,
                                    quantize_like)


def test_quantize_kernel_reconstruction():
    rng = np.random.default_rng(0)
    w = rng.normal(size=(64, 48)).astype(np.float32) * 0.1
    q, s = quantize_kernel(w)
    assert q.dtype == np.int8 and s.shape == (48,)
    err = np.abs(q.astype(np.float32) * s - w)
    # symmetric per-channel int8: |err| <= scale/2 = max|col|/254
    assert (err <= np.abs(w).max(0) / 254.0 + 1e-7).all()


def test_quantize_kernel_zero_column():
    w = np.zeros((8, 3), np.float32)
    w[:, 0] = 1.0
    q, s = quantize_kernel(w)
    assert (s > 0).all()
    assert (q[:, 1:] == 0).all()


@pytest.mark.parametrize("mode", ["w8", "w8a8"])
def test_quant_dense_matches_fp(mode):
    import flax.linen as nn

    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (32, 96), jnp.float32)
    fp = nn.Dense(128)
    fp_params = fp.init(jax.random.PRNGKey(1), x)
    qd = QuantDense(128, mode=mode)
    q_tmpl = qd.init(jax.random.PRNGKey(2), x)
    q_params = quantize_like(fp_params, q_tmpl)
    assert q_params["params"]["kernel_q"].dtype == jnp.int8
    y_fp = fp.apply(fp_params, x)
    y_q = qd.apply(q_params, x)
    # w8: only weight rounding (~0.4% per channel); w8a8 adds row quant
    tol = 0.02 if mode == "w8" else 0.06
    denom = float(jnp.abs(y_fp).max())
    assert float(jnp.abs(y_q - y_fp).max()) / denom < tol


def test_quantize_like_rejects_mismatch():
    with pytest.raises(AssertionError):
        quantize_like({"a": {"kernel": np.ones((2, 2))}},
                      {"b": {"kernel_q": np.ones((2, 2), np.int8)}})


@pytest.mark.parametrize("mode", ["w8", "w8a8"])
@pytest.mark.slow
def test_mvit_mlp_quant_forward(mode):
    """MViT with mlp_quant consumes a quantize_like tree; the forward stays
    within int8 tolerance of fp on the same weights."""
    from diff_sal_tpu.config import MViTConfig
    from diff_sal_tpu.models.mvit import MViT, _block_plan

    base = MViTConfig.tiny(spatial_size=(32, 48), cls_stream=True)
    cfg_q = dataclasses.replace(base, mlp_quant=mode)
    m_fp, m_q = MViT(base), MViT(cfg_q)
    x = jax.random.normal(
        jax.random.PRNGKey(0),
        (1, base.temporal_size, *base.spatial_size, 3),
    )
    fp_params = m_fp.init(jax.random.PRNGKey(1), x)
    q_tmpl = jax.eval_shape(m_q.init, jax.random.PRNGKey(1), x)
    q_params = quantize_like(fp_params, q_tmpl)
    int8_leaves = [
        p for p in jax.tree_util.tree_leaves(q_params)
        if p.dtype == jnp.int8
    ]
    assert len(int8_leaves) == 2 * len(_block_plan(base))  # fc1+fc2 each
    outs_fp = m_fp.apply(fp_params, x)
    outs_q = m_q.apply(q_params, x)
    for a, b in zip(jax.tree_util.tree_leaves(outs_fp),
                    jax.tree_util.tree_leaves(outs_q)):
        d = float(jnp.abs(a - b).max())
        ref = float(jnp.abs(a).max())
        assert d / max(ref, 1e-6) < 0.08, (d, ref)
