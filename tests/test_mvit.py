"""MViT encoder: block-plan invariants and pyramid shape contract.

The full-resolution forward (224x384x16 frames) is exercised in the e2e
tests; here we verify the static plan matches the reference architecture
derivation exactly and run a reduced-size forward.
"""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from diff_sal_tpu.config import MViTConfig
from diff_sal_tpu.models.mvit import MViT, _block_plan


def test_small_block_plan_matches_reference_architecture():
    plans = _block_plan(MViTConfig.small())
    assert len(plans) == 16
    dims = [(p["in_dims"], p["out_dims"]) for p in plans]
    # channel doubling in attention at layers 1, 3, 14 (downscale_indices)
    assert dims[0] == (96, 96)
    assert dims[1] == (96, 192)
    assert dims[2] == (192, 192)
    assert dims[3] == (192, 384)
    assert dims[13] == (384, 384)
    assert dims[14] == (384, 768)
    assert dims[15] == (768, 768)
    heads = [p["num_heads"] for p in plans]
    assert heads[0] == 1 and heads[1] == 2 and heads[3] == 4 and heads[14] == 8
    # kv stride starts (1,8,8) and halves at each downscale, persisting
    assert plans[0]["stride_kv"] == (1, 8, 8)
    assert plans[1]["stride_kv"] == (1, 4, 4)
    assert plans[2]["stride_kv"] == (1, 4, 4)
    assert plans[3]["stride_kv"] == (1, 2, 2)
    assert plans[13]["stride_kv"] == (1, 2, 2)
    assert plans[14]["stride_kv"] == (1, 1, 1)
    # q stride 2 only at downscale layers
    for i, p in enumerate(plans):
        expected = (1, 2, 2) if i in (1, 3, 14) else (1, 1, 1)
        assert p["stride_q"] == expected
    # scales emitted after layers 0, 2, 13, 15
    emits = {i: p["emit_scale"] for i, p in enumerate(plans) if p["emit_scale"] is not None}
    assert emits == {0: 0, 2: 1, 13: 2, 15: 3}
    # rel-pos table lengths at the 224x224 pretrain grid
    rel = [p["rel_pos_dims"] for p in plans]
    assert rel[0] == (15, 111)
    assert rel[1] == (15, 55)
    assert rel[2] == (15, 55)
    assert rel[3] == (15, 27)
    assert rel[13] == (15, 27)
    assert rel[14] == (15, 27)
    assert rel[15] == (15, 13)


@pytest.mark.slow
def test_mvit_tiny_input_pyramid():
    # Reduced spatial size for CPU test speed: 64x64 input -> grids 16x16.
    cfg = MViTConfig.small(spatial_size=(64, 64), rel_pos_spatial_size=224)
    m = MViT(cfg)
    x = jnp.zeros((1, 16, 64, 64, 3))
    params = m.init(jax.random.PRNGKey(0), x)
    outs = m.apply(params, x)
    assert [o.shape for o in outs] == [
        (1, 8, 2, 2, 768),
        (1, 8, 4, 4, 384),
        (1, 8, 8, 8, 192),
        (1, 8, 16, 16, 96),
    ]


@pytest.mark.slow
def test_mvit_param_count_plausible():
    # MViTv2-small video backbone is ~34M params (Kinetics model zoo).
    cfg = MViTConfig.small(spatial_size=(64, 64))
    m = MViT(cfg)
    params = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 64, 64, 3)))
    n = sum(np.prod(p.shape) for p in jax.tree.leaves(params))
    assert 30e6 < n < 40e6, n


def test_patch_embed_modes_equal():
    """All stem lowerings (conv / patches-matmul / space-to-depth) are
    numerically identical."""
    from diff_sal_tpu.models.mvit import PatchEmbed3D

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 32, 48, 3))
    m_conv = PatchEmbed3D(32, mode="conv")
    m_pat = PatchEmbed3D(32, mode="patches")
    m_s2d = PatchEmbed3D(32, mode="s2d")
    m_stg = PatchEmbed3D(32, mode="s2d_staged")
    m_nd = PatchEmbed3D(32, mode="s2d_nd")
    m_wf = PatchEmbed3D(32, mode="wfold")
    m_pm = PatchEmbed3D(32, mode="s2d_perm")
    # explicit-pad variants (stem_fold_pad=False) must agree too
    m_s2d_ep = PatchEmbed3D(32, mode="s2d", fold_pad=False)
    m_stg_ep = PatchEmbed3D(32, mode="s2d_staged", fold_pad=False)
    v = m_conv.init(jax.random.PRNGKey(1), x)
    o_conv, s_conv = m_conv.apply(v, x)
    o_pat, s_pat = m_pat.apply(v, x)
    o_s2d, s_s2d = m_s2d.apply(v, x)
    o_stg, s_stg = m_stg.apply(v, x)
    o_nd, s_nd = m_nd.apply(v, x)
    o_wf, s_wf = m_wf.apply(v, x)
    o_pm, s_pm = m_pm.apply(v, x)
    assert s_conv == s_pat == s_s2d == s_stg == s_nd == s_wf == (4, 8, 12)
    assert s_pm == (4, 8, 12)
    np.testing.assert_array_equal(np.asarray(o_pm), np.asarray(o_stg))
    np.testing.assert_allclose(np.asarray(o_pat), np.asarray(o_conv), atol=2e-5)
    np.testing.assert_allclose(np.asarray(o_s2d), np.asarray(o_conv), atol=2e-5)
    np.testing.assert_allclose(np.asarray(o_stg), np.asarray(o_conv), atol=2e-5)
    np.testing.assert_allclose(np.asarray(o_nd), np.asarray(o_conv), atol=2e-5)
    np.testing.assert_allclose(np.asarray(o_wf), np.asarray(o_conv), atol=2e-5)
    for m_ep, o_fold in ((m_s2d_ep, o_s2d), (m_stg_ep, o_stg)):
        o_ep, s_ep = m_ep.apply(v, x)
        assert s_ep == s_conv
        # fold_pad moves the alignment pad into the conv padding — bitwise
        # identical math, so exact equality
        np.testing.assert_array_equal(np.asarray(o_ep), np.asarray(o_fold))


@pytest.mark.slow
def test_cls_stream_matches_token_path():
    """The round-3 cls-stream layout (separate cls stream, 128-padded head
    dim, v2 attention) computes the SAME function as the token-concat path
    with the SAME parameter tree — checkpoint-exactness of the layout
    redesign."""
    import dataclasses

    import jax

    from diff_sal_tpu.config import MViTConfig
    from diff_sal_tpu.models.mvit import MViT

    # cls_stream defaults True now — pin the token-concat baseline explicitly
    cfg = MViTConfig.tiny(spatial_size=(32, 48), cls_stream=False)
    m1 = MViT(cfg)
    m2 = MViT(dataclasses.replace(cfg, cls_stream=True, lane_pad=False))

    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 16, 32, 48, 3)) * 0.5
    v1 = m1.init(rng, x)
    # identical param tree (names AND shapes)
    v2 = m2.init(rng, x)
    t1 = jax.tree.map(lambda a: a.shape, v1)
    t2 = jax.tree.map(lambda a: a.shape, v2)
    assert t1 == t2

    out1 = m1.apply(v1, x)
    out2 = m2.apply(v1, x)  # same params through the other path
    assert len(out1) == len(out2)
    for a, b in zip(out1, out2):
        assert a.shape == b.shape
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5,
            err_msg="cls_stream output diverged from token path",
        )


@pytest.mark.slow
def test_lane_pad_matches_unpadded():
    """lane_pad (96->128 finest-scale stream padding, round-3 lever 2)
    computes the SAME function with the SAME param tree as the unpadded
    cls-stream path — pads live in zero weight rows/cols and masked
    LayerNorms only."""
    import dataclasses

    import jax

    from diff_sal_tpu.config import MViTConfig
    from diff_sal_tpu.models.mvit import MViT

    cfg = MViTConfig.tiny(spatial_size=(32, 48), cls_stream=True)
    m1 = MViT(dataclasses.replace(cfg, lane_pad=False))
    m2 = MViT(dataclasses.replace(cfg, lane_pad=True))

    rng = jax.random.PRNGKey(3)
    x = jax.random.normal(rng, (2, 16, 32, 48, 3)) * 0.5
    v1 = m1.init(rng, x)
    v2 = m2.init(rng, x)
    assert jax.tree.map(lambda a: a.shape, v1) == jax.tree.map(
        lambda a: a.shape, v2
    )
    out1 = m1.apply(v1, x)
    out2 = m2.apply(v1, x)  # same params through the padded path
    for a, b in zip(out1, out2):
        assert a.shape == b.shape
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5,
            err_msg="lane_pad output diverged from unpadded path",
        )


@pytest.mark.slow
def test_tokens3d_matches_5d_stream():
    """tokens3d (flat (B,L,C) inter-block stream, 5D only at pool convs)
    computes the SAME function with the SAME param tree as the 5D
    cls-stream path."""
    import dataclasses

    import jax

    from diff_sal_tpu.config import MViTConfig
    from diff_sal_tpu.models.mvit import MViT

    cfg = MViTConfig.tiny(spatial_size=(32, 48), cls_stream=True)
    m1 = MViT(dataclasses.replace(cfg, tokens3d=False))
    m2 = MViT(dataclasses.replace(cfg, tokens3d=True))

    rng = jax.random.PRNGKey(5)
    x = jax.random.normal(rng, (2, 16, 32, 48, 3)) * 0.5
    v1 = m1.init(rng, x)
    v2 = m2.init(rng, x)
    assert jax.tree.map(lambda a: a.shape, v1) == jax.tree.map(
        lambda a: a.shape, v2
    )
    out1 = m1.apply(v1, x)
    out2 = m2.apply(v1, x)  # same params through the flat-stream path
    for a, b in zip(out1, out2):
        assert a.shape == b.shape
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5,
            err_msg="tokens3d output diverged from the 5D stream path",
        )


@pytest.mark.slow
def test_fold_proj_matches_standalone_proj():
    """fold_proj (skip projection columns riding the qkv dot) computes the
    SAME function with the SAME param tree as the standalone proj dot."""
    import dataclasses

    import jax

    from diff_sal_tpu.config import MViTConfig
    from diff_sal_tpu.models.mvit import MViT

    cfg = MViTConfig.tiny(spatial_size=(32, 48), cls_stream=True)
    m1 = MViT(dataclasses.replace(cfg, fold_proj=False))
    m2 = MViT(dataclasses.replace(cfg, fold_proj=True))

    rng = jax.random.PRNGKey(7)
    x = jax.random.normal(rng, (2, 16, 32, 48, 3)) * 0.5
    v1 = m1.init(rng, x)
    v2 = m2.init(rng, x)
    assert jax.tree.map(lambda a: a.shape, v1) == jax.tree.map(
        lambda a: a.shape, v2
    )
    out1 = m1.apply(v1, x)
    out2 = m2.apply(v1, x)  # same params through the folded path
    for a, b in zip(out1, out2):
        assert a.shape == b.shape
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5,
            err_msg="fold_proj output diverged from standalone proj",
        )


@pytest.mark.slow
def test_cls_stream_pallas_kernel_matches_reference_path():
    """cls_stream + use_pallas (v2 kernel, interpret on CPU) equals the
    cls_stream XLA-einsum path."""
    import dataclasses

    import jax

    from diff_sal_tpu.config import MViTConfig
    from diff_sal_tpu.models.mvit import MViT

    cfg = MViTConfig.tiny(spatial_size=(32, 48), cls_stream=True)
    m_ref = MViT(cfg)
    m_pal = MViT(dataclasses.replace(cfg, use_pallas_attention=True))

    rng = jax.random.PRNGKey(1)
    x = jax.random.normal(rng, (1, 16, 32, 48, 3)) * 0.5
    v = m_ref.init(rng, x)
    out_ref = m_ref.apply(v, x)
    out_pal = m_pal.apply(v, x)
    for a, b in zip(out_ref, out_pal):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5)


@pytest.mark.slow
def test_pallas_pool_matches_conv_pool():
    """pool_mode='pallas' (native-layout stencil, ops/pool.py) equals the
    XLA depthwise-conv pools through the full tiny MViT, fwd AND grads.

    Tolerance note: XLA's f32 CPU conv itself deviates ~5e-3 from an exact
    f64 stencil at stride 4/8 (internal fast path); the Pallas kernel is
    exact vs numpy (ops/pool.py docstring), so the comparison tolerance
    absorbs the CONV's error, not the kernel's."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from diff_sal_tpu.config import MViTConfig
    from diff_sal_tpu.models.mvit import MViT

    cfg = MViTConfig.tiny(spatial_size=(32, 48), cls_stream=True)
    m1 = MViT(dataclasses.replace(cfg, pool_mode="conv"))
    m2 = MViT(dataclasses.replace(cfg, pool_mode="pallas"))

    rng = jax.random.PRNGKey(3)
    x = jax.random.normal(rng, (2, 16, 32, 48, 3)) * 0.5
    v = m1.init(rng, x)
    assert (
        jax.tree.map(lambda a: a.shape, v)
        == jax.tree.map(lambda a: a.shape, m2.init(rng, x))
    )
    out1 = m1.apply(v, x)
    out2 = m2.apply(v, x)
    for a, b in zip(out1, out2):
        assert a.shape == b.shape
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-3)

    # gradients flow (custom_vjp: conv-path backward) and match the conv
    # path's gradients
    def loss(m, v):
        return sum(jnp.sum(o**2) for o in m.apply(v, x))

    g1 = jax.grad(lambda v: loss(m1, v))(v)
    g2 = jax.grad(lambda v: loss(m2, v))(v)
    flat1 = jax.tree_util.tree_leaves_with_path(g1)
    flat2 = {
        jax.tree_util.keystr(k): a
        for k, a in jax.tree_util.tree_leaves_with_path(g2)
    }
    for k, a in flat1:
        b = flat2[jax.tree_util.keystr(k)]
        a, b = np.asarray(a), np.asarray(b)
        # leaf-scale tolerance: the two paths differ by forward rounding
        # (XLA's f32 CPU conv fast path is itself ~5e-3 off) amplified
        # through the network, so elementwise atol is meaningless
        tol = 2e-2 * (np.abs(b).max() + 1.0)
        np.testing.assert_allclose(
            a, b, atol=tol,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(k)}",
        )


@pytest.mark.slow
def test_fuse_kv_exact_f64():
    """fuse_kv (pool-through-projection: spatial k/v as one dense strided
    conv with kernel p (x) W_kv, MViTConfig.fuse_kv) is mathematically
    IDENTICAL to the Dense -> depthwise-pool path — in float64 one
    MultiScaleAttention with differing q/kv strides matches fwd AND all
    param grads to ~1e-12 (pure reassociation of an exact rewrite)."""
    import jax
    import jax.numpy as jnp

    from diff_sal_tpu.models.mvit import MultiScaleAttention

    jax.config.update("jax_enable_x64", True)
    try:
        B, T, Hh, Ww, C = 2, 4, 16, 24, 96
        kw = dict(
            out_dims=C, num_heads=1,
            stride_q=(1, 2, 2), stride_kv=(1, 8, 8),
            cls_stream=True, tokens3d=True, flat_dots=True,
            dtype=jnp.float64,
        )
        m1 = MultiScaleAttention(fuse_kv=False, **kw)
        m2 = MultiScaleAttention(fuse_kv=True, **kw)

        rng = jax.random.PRNGKey(0)
        sp = jax.random.normal(rng, (B, T * Hh * Ww, C), dtype=jnp.float64)
        cls = jax.random.normal(
            jax.random.fold_in(rng, 1), (B, 1, C), jnp.float64
        )
        v = m1.init(rng, sp, (T, Hh, Ww), cls)
        # nontrivial pool kernels + biases (zeros-init would hide bugs)
        leaves, treedef = jax.tree_util.tree_flatten(
            jax.tree.map(lambda a: a.astype(jnp.float64), v)
        )
        leaves = [
            jax.random.normal(
                jax.random.fold_in(rng, 100 + i), l.shape, jnp.float64
            ) * 0.3
            for i, l in enumerate(leaves)
        ]
        v = jax.tree_util.tree_unflatten(treedef, leaves)

        def fwd(m, v):
            return m.apply(v, sp, (T, Hh, Ww), cls)

        for a, b in zip(
            jax.tree.leaves(fwd(m1, v)), jax.tree.leaves(fwd(m2, v))
        ):
            if hasattr(a, "shape"):
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), atol=1e-10
                )

        def loss(m, v):
            return sum(
                jnp.sum(o**2)
                for o in jax.tree.leaves(fwd(m, v))
                if hasattr(o, "ndim") and o.ndim
            )

        g1 = jax.grad(lambda v: loss(m1, v))(v)
        g2 = jax.grad(lambda v: loss(m2, v))(v)
        for (k, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(g1),
            jax.tree_util.tree_leaves_with_path(g2),
        ):
            a, b = np.asarray(a), np.asarray(b)
            np.testing.assert_allclose(
                a, b, atol=1e-8 * (np.abs(b).max() + 1.0),
                err_msg=f"grad mismatch at {jax.tree_util.keystr(k)}",
            )
    finally:
        jax.config.update("jax_enable_x64", False)


@pytest.mark.slow
def test_fuse_kv_matches_pool_path():
    """fuse_kv through the full tiny MViT with the SAME param tree: f32
    integration check. Exactness is proven by test_fuse_kv_exact_f64;
    here grads are compared with a reassociation-noise tolerance (the
    fused conv reorders ~50k heavily-cancelling bias-grad terms — observed
    f32 drift up to ~1e-2 relative to the leaf max, ~1e-12 in f64)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from diff_sal_tpu.config import MViTConfig
    from diff_sal_tpu.models.mvit import MViT

    cfg = MViTConfig.tiny(spatial_size=(32, 48), cls_stream=True)
    m1 = MViT(dataclasses.replace(cfg, fuse_kv=False))
    m2 = MViT(dataclasses.replace(cfg, fuse_kv=True))

    rng = jax.random.PRNGKey(7)
    x = jax.random.normal(rng, (2, 16, 32, 48, 3)) * 0.5
    v = m1.init(rng, x)
    assert (
        jax.tree.map(lambda a: a.shape, v)
        == jax.tree.map(lambda a: a.shape, m2.init(rng, x))
    )
    out1 = m1.apply(v, x)
    out2 = m2.apply(v, x)
    for a, b in zip(out1, out2):
        assert a.shape == b.shape
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)

    def loss(m, v):
        return sum(jnp.sum(o**2) for o in m.apply(v, x))

    g1 = jax.grad(lambda v: loss(m1, v))(v)
    g2 = jax.grad(lambda v: loss(m2, v))(v)
    flat1 = jax.tree_util.tree_leaves_with_path(g1)
    flat2 = {
        jax.tree_util.keystr(k): a
        for k, a in jax.tree_util.tree_leaves_with_path(g2)
    }
    for k, a in flat1:
        b = flat2[jax.tree_util.keystr(k)]
        a, b = np.asarray(a), np.asarray(b)
        tol = 3e-2 * (np.abs(b).max() + 0.1)
        np.testing.assert_allclose(
            a, b, atol=tol,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(k)}",
        )


def test_stencil_pool_matches_conv_pool():
    """pool_mode="stencil" (_stencil_depthwise_pool: shifted multiply-adds
    on the native layout) equals the depthwise-conv pool for stride 1 and
    (1,2,2). Measured 0.507x on TPU (docs/PERF.md round 3) — kept only as
    an equality-tested null-result variant."""
    import jax
    import jax.numpy as jnp

    from diff_sal_tpu.models.mvit import (_fused_depthwise_pool,
                                          _stencil_depthwise_pool)

    key = jax.random.PRNGKey(0)
    for stride in [(1, 1, 1), (1, 2, 2)]:
        x = jax.random.normal(key, (2, 4, 8, 12, 2 * 3 * 16))
        ks = [
            jax.random.normal(jax.random.fold_in(key, i), (3, 3, 3, 1, 16))
            * 0.3
            for i in range(2)
        ]
        a, sa = _fused_depthwise_pool(
            x, ks, heads=3, stride=stride, dtype=jnp.float32
        )
        b, sb = _stencil_depthwise_pool(
            x, ks, heads=3, stride=stride, dtype=jnp.float32
        )
        assert sa == sb
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5
        )


def test_phase_max_pool_matches_window():
    """skip_pool="phase" (_phase_max_pool: separable phase-split maxima)
    equals nn.max_pool(kernel=stride+1, stride, pad kernel//2) — the
    strided-skip pool semantics (reference mvit.py:748-763) — bitwise."""
    import flax.linen as nn_
    import jax

    from diff_sal_tpu.models.mvit import _phase_max_pool

    key = jax.random.PRNGKey(0)
    for stride in [(1, 2, 2), (2, 2, 2)]:
        x = jax.random.normal(key, (2, 4, 8, 12, 16))
        kernel = tuple(s + 1 if s > 1 else s for s in stride)
        want = nn_.max_pool(
            x, window_shape=kernel, strides=stride,
            padding=[(k // 2, k // 2) for k in kernel],
        )
        got = _phase_max_pool(x, stride)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.slow
def test_qkv_conv_matches_dot():
    """MViTConfig(qkv_conv=True) — qkv projection emitted as a 1x1x1 conv —
    is bit-exact vs the flat dot path on CPU (same params, same outputs)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from diff_sal_tpu.config import MViTConfig
    from diff_sal_tpu.models.mvit import MViT

    m0 = MViT(MViTConfig())
    m1 = MViT(MViTConfig(qkv_conv=True))
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (1, 16, 64, 96, 3), jnp.float32)
    p0 = m0.init(rng, x)
    y0 = m0.apply(p0, x)
    y1 = m1.apply(p0, x)
    for a, b in zip(
        jax.tree_util.tree_leaves(y0), jax.tree_util.tree_leaves(y1)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_mvit_remat_traces_with_static_sizes():
    """Regression: with cfg.remat the block's returned out_size tuple
    crosses a jax.checkpoint boundary and comes back as TRACERS; the emit
    reshape must use the statically recomputed grid instead (mvit.py
    block loop). Trace-only via eval_shape — no compile needed, and the
    bug fired at trace time (TypeError: Shapes must be 1D sequences of
    concrete values)."""
    cfg = MViTConfig.small(
        spatial_size=(64, 64), rel_pos_spatial_size=224, remat=True
    )
    m = MViT(cfg)
    x = jnp.zeros((1, 16, 64, 64, 3))
    shapes = jax.eval_shape(
        lambda: m.init(jax.random.PRNGKey(0), x)
    )
    outs = jax.eval_shape(
        lambda v: m.apply(v, x), shapes
    )
    assert [tuple(o.shape) for o in outs] == [
        (1, 8, 2, 2, 768),
        (1, 8, 4, 4, 384),
        (1, 8, 8, 8, 192),
        (1, 8, 16, 16, 96),
    ]
