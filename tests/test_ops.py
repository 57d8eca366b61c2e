"""Parity tests for resize / rel-pos ops against PyTorch CPU reference ops.

These pin our static-matmul resize and rel-pos formulations to the exact
semantics the reference model was trained with (bilinear align_corners=False,
linear rel-pos interpolation, nearest integer upsample).
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from diff_sal_tpu.ops.resize import (
    bilinear_resize,
    linear_resize_1d,
    nearest_upsample,
)
from diff_sal_tpu.ops.rel_pos import _rel_coords, resize_rel_pos


@pytest.mark.parametrize(
    "in_hw,out_hw",
    [((7, 12), (14, 24)), ((112, 192), (224, 384)), ((14, 24), (112, 192)),
     ((56, 96), (112, 192)), ((10, 10), (7, 5))],
)
def test_bilinear_matches_torch(in_hw, out_hw):
    rng = np.random.RandomState(0)
    x = rng.randn(2, *in_hw, 3).astype(np.float32)
    ours = np.asarray(bilinear_resize(jnp.asarray(x), out_hw))
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    ref = (
        F.interpolate(xt, size=out_hw, mode="bilinear", align_corners=False)
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_nearest_upsample_matches_torch():
    rng = np.random.RandomState(1)
    x = rng.randn(2, 7, 12, 4).astype(np.float32)
    for f in (2, 4, 8):
        ours = np.asarray(nearest_upsample(jnp.asarray(x), f))
        xt = torch.from_numpy(x).permute(0, 3, 1, 2)
        ref = F.interpolate(xt, scale_factor=f, mode="nearest")
        ref = ref.permute(0, 2, 3, 1).numpy()
        np.testing.assert_array_equal(ours, ref)


@pytest.mark.parametrize("src,dst", [(15, 27), (111, 15), (15, 15), (9, 23)])
def test_linear_1d_matches_torch(src, dst):
    rng = np.random.RandomState(2)
    x = rng.randn(src, 6).astype(np.float32)
    ours = np.asarray(linear_resize_1d(jnp.asarray(x), dst, axis=0))
    xt = torch.from_numpy(x).t().unsqueeze(0)  # (1, C, L)
    ref = F.interpolate(xt, size=dst, mode="linear").squeeze(0).t().numpy()
    np.testing.assert_allclose(ours, ref, atol=3e-5)


def _torch_resize_rel_pos(rel_pos, q_size, k_size):
    """Direct transcription of the rel-pos semantics (mvit.py:331-366) using
    torch ops, as the golden reference."""
    max_rel_dist = int(2 * max(q_size, k_size) - 1)
    if rel_pos.shape[0] != max_rel_dist:
        resized = F.interpolate(
            rel_pos.t().unsqueeze(0), size=max_rel_dist, mode="linear"
        ).squeeze(0).t()
    else:
        resized = rel_pos
    q_ratio = max(k_size / q_size, 1.0)
    k_ratio = max(q_size / k_size, 1.0)
    qc = torch.arange(q_size)[:, None] * q_ratio
    kc = torch.arange(k_size)[None, :] * k_ratio
    rel = (qc - kc) + (k_size - 1) * k_ratio
    return resized[rel.long()]


@pytest.mark.parametrize(
    "L,q,k", [(15, 8, 8), (111, 56, 7), (111, 96, 12), (27, 14, 3), (15, 7, 7)]
)
def test_resize_rel_pos_matches_reference_semantics(L, q, k):
    rng = np.random.RandomState(3)
    table = rng.randn(L, 16).astype(np.float32)
    ours = np.asarray(resize_rel_pos(jnp.asarray(table), q, k))
    ref = _torch_resize_rel_pos(torch.from_numpy(table), q, k).numpy()
    assert ours.shape == (q, k, 16)
    np.testing.assert_allclose(ours, ref, atol=5e-5)


def test_rel_coords_symmetry():
    c = _rel_coords(8, 8)
    assert c.shape == (8, 8)
    assert c[0, 7] == 0 and c[7, 0] == 14 and c[3, 3] == 7


@pytest.mark.slow
def test_fused_layernorm_matches_flax():
    """ops/layernorm.py vs nn.LayerNorm: values, dtypes and grads (the CPU
    path is plain jnp; the kernel itself runs on TPU only)."""
    import flax.linen as nn
    import jax
    import jax.numpy as jnp
    import numpy as np

    from diff_sal_tpu.ops.layernorm import fused_layernorm

    rng = np.random.RandomState(0)
    for shape, dtype in [((4, 43, 96), jnp.float32),
                         ((2, 9, 7, 12, 768), jnp.bfloat16),
                         ((3, 100), jnp.float32)]:
        x = jnp.asarray(rng.randn(*shape), dtype)
        scale = jnp.asarray(rng.randn(shape[-1]).astype(np.float32))
        bias = jnp.asarray(rng.randn(shape[-1]).astype(np.float32))
        got = fused_layernorm(x, scale, bias, 1e-6)
        ln = nn.LayerNorm(epsilon=1e-6)
        want = ln.apply({"params": {"scale": scale, "bias": bias}}, x)
        assert got.dtype == x.dtype
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32),
            atol=6e-2 if dtype == jnp.bfloat16 else 1e-5,
        )

        def f(x, s, b):
            return jnp.sum(fused_layernorm(x, s, b, 1e-6).astype(jnp.float32) ** 2)

        def g(x, s, b):
            return jnp.sum(
                ln.apply({"params": {"scale": s, "bias": b}}, x).astype(
                    jnp.float32
                ) ** 2
            )

        g1 = jax.grad(f, argnums=(0, 1, 2))(x, scale, bias)
        g2 = jax.grad(g, argnums=(0, 1, 2))(x, scale, bias)
        for a, b_ in zip(g1, g2):
            np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(b_, np.float32),
                atol=0.15 if dtype == jnp.bfloat16 else 1e-4, rtol=5e-2,
            )


def test_fused_layernorm_kernel_interpret():
    """Force the pallas kernel (interpret mode) to validate the in-kernel
    math incl. channel padding (C=96 -> 128 lanes)."""
    import jax.numpy as jnp
    import numpy as np

    from diff_sal_tpu.ops.layernorm import _ln_reference, fused_layernorm

    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(37, 96).astype(np.float32))
    scale = jnp.asarray(rng.randn(96).astype(np.float32))
    bias = jnp.asarray(rng.randn(96).astype(np.float32))
    got = fused_layernorm(x, scale, bias, 1e-6, True)
    want = _ln_reference(x, scale, bias, 1e-6)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_bilinear_resize_add_kernel():
    """Fused resize+accumulate kernel (interpret mode) == plain
    bilinear_resize + add, fwd and grads."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from diff_sal_tpu.ops.resize import bilinear_resize, bilinear_resize_add

    rng = np.random.RandomState(0)
    B, h, w, C = 2, 7, 12, 128
    H, W = 16, 24
    acc = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    x = jnp.asarray(rng.randn(B, h, w, C).astype(np.float32))

    got = bilinear_resize_add(acc, x, interpret="force")
    want = acc + bilinear_resize(x, (H, W))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

    def f(acc, x):
        return jnp.sum(bilinear_resize_add(acc, x, interpret="force") ** 2)

    def g(acc, x):
        return jnp.sum((acc + bilinear_resize(x, (H, W))) ** 2)

    g1 = jax.grad(f, argnums=(0, 1))(acc, x)
    g2 = jax.grad(g, argnums=(0, 1))(acc, x)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_fused_layernorm_masked_real_dim():
    """real_dim: masked LN over a zero-padded last axis equals LN on the
    unpadded slice, with the pad lanes staying exactly zero (the
    128-aligned attention layout's checkpoint-exactness contract)."""
    import flax.linen as nn

    from diff_sal_tpu.ops.layernorm import fused_layernorm

    rng = np.random.RandomState(3)
    real, pad = 96, 128
    x_real = jnp.asarray(rng.randn(6, 11, real).astype(np.float32))
    x = jnp.pad(x_real, ((0, 0), (0, 0), (0, pad - real)))
    scale = jnp.asarray(rng.rand(real).astype(np.float32) + 0.5)
    bias = jnp.asarray(rng.randn(real).astype(np.float32) * 0.1)

    ref = nn.LayerNorm(epsilon=1e-6).apply(
        {"params": {"scale": scale, "bias": bias}}, x_real
    )
    for interp in (None, True):  # jnp fallback AND the pallas kernel
        got = fused_layernorm(x, scale, bias, 1e-6, interp, real)
        np.testing.assert_allclose(
            np.asarray(got[..., :real]), np.asarray(ref), atol=2e-5
        )
        assert np.all(np.asarray(got[..., real:]) == 0.0)

    # grads flow to the real channels only
    def loss(x, s, b):
        return jnp.sum(fused_layernorm(x, s, b, 1e-6, None, real) ** 2)

    import jax

    gx, gs, gb = jax.grad(loss, argnums=(0, 1, 2))(x, scale, bias)
    assert gs.shape == (real,) and gb.shape == (real,)
    # pad-lane input grads are nonzero (they feed the mean/var formulas) but
    # harmless: upstream producers are pads/padded matmuls whose VJPs
    # discard them. Real-lane grads must match LN-on-the-slice:
    def loss_ref(xr, s, b):
        import flax.linen as nn

        out = nn.LayerNorm(epsilon=1e-6).apply(
            {"params": {"scale": s, "bias": b}}, xr
        )
        return jnp.sum(out**2)

    gxr = jax.grad(loss_ref)(x_real, scale, bias)
    np.testing.assert_allclose(
        np.asarray(gx[..., :real]), np.asarray(gxr), atol=2e-4
    )


def test_bilinear_resize_sum_kernel():
    """bilinear_resize_sum (single-pass multi-scale resize+sum kernel)
    equals the chained bilinear_resize sum, fwd and grads (Pallas
    interpret mode)."""
    import jax
    import jax.numpy as jnp

    from diff_sal_tpu.ops.resize import bilinear_resize, bilinear_resize_sum

    key = jax.random.PRNGKey(0)
    H, W, C = 16, 24, 128
    xs = [
        jax.random.normal(jax.random.fold_in(key, i), (2, h, w, C))
        for i, (h, w) in enumerate([(2, 3), (4, 6), (8, 12), (16, 24)])
    ]
    want = sum(bilinear_resize(x, (H, W)) for x in xs)
    got = bilinear_resize_sum(xs, (H, W), interpret="force")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)

    def loss(xs):
        return jnp.sum(bilinear_resize_sum(xs, (H, W), interpret="force") ** 2)

    def loss_ref(xs):
        return jnp.sum(sum(bilinear_resize(x, (H, W)) for x in xs) ** 2)

    g = jax.grad(loss)(xs)
    g_ref = jax.grad(loss_ref)(xs)
    for a, b in zip(g, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_fused_layernorm_bwd_kernel():
    """The Pallas LN backward kernel (_ln_bwd_kernel, interpret mode)
    matches autodiff through the reference formulation — full-width,
    masked (real_dim), and short-param variants, f32 and bf16."""
    import jax
    import jax.numpy as jnp

    from diff_sal_tpu.ops.layernorm import _ln_reference, fused_layernorm

    key = jax.random.PRNGKey(0)
    for dtype, real_dim, n_param, rows in [
        (jnp.float32, None, 128, 48),
        (jnp.float32, 96, 128, 48),
        (jnp.float32, 96, 96, 40),  # short params + masked lanes
        (jnp.bfloat16, None, 128, 48),
    ]:
        C = 128
        x = (jax.random.normal(key, (rows, C)) * 2.0).astype(dtype)
        if real_dim:
            x = x.at[..., real_dim:].set(0)
        s = jax.random.normal(jax.random.fold_in(key, 1), (n_param,)) + 1.0
        b = jax.random.normal(jax.random.fold_in(key, 2), (n_param,))
        g = jax.random.normal(jax.random.fold_in(key, 3), (rows, C)).astype(
            dtype
        )

        def loss_kernel(x, s, b):
            return jnp.sum(
                fused_layernorm(x, s, b, 1e-6, True, real_dim) * g
            )

        def loss_ref(x, s, b):
            sp = jnp.pad(s, (0, C - n_param)) if n_param < C else s
            bp = jnp.pad(b, (0, C - n_param)) if n_param < C else b
            return jnp.sum(_ln_reference(x, sp, bp, 1e-6, real_dim) * g)

        g1 = jax.grad(loss_kernel, argnums=(0, 1, 2))(x, s, b)
        g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(x, s, b)
        tol = 2e-2 if dtype == jnp.bfloat16 else 2e-5
        for a, want in zip(g1, g2):
            np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(want, np.float32),
                atol=tol * (np.abs(np.asarray(want, np.float32)).max() + 1),
                err_msg=f"{dtype} real_dim={real_dim} n_param={n_param}",
            )


def test_resize_sum_conv_relu_kernel():
    """resize_sum_conv_relu (fused multi-scale resize+sum -> 3x3 conv ->
    +bias -> relu, ops/resize.py) equals the unfused chain, Pallas
    interpret mode."""
    import jax
    import jax.numpy as jnp

    from diff_sal_tpu.ops.resize import (bilinear_resize,
                                         resize_sum_conv_relu)

    key = jax.random.PRNGKey(0)
    H, W, C, O = 16, 24, 128, 96
    xs = [
        jax.random.normal(jax.random.fold_in(key, i), (2, h, w, C)) * 0.5
        for i, (h, w) in enumerate([(2, 3), (4, 6), (8, 12), (16, 24)])
    ]
    k = jax.random.normal(jax.random.fold_in(key, 9), (3, 3, C, O)) * 0.05
    b = jax.random.normal(jax.random.fold_in(key, 10), (O,)) * 0.1

    acc = sum(bilinear_resize(x, (H, W)) for x in xs)
    want = jax.nn.relu(
        jax.lax.conv_general_dilated(
            acc, k, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + b
    )
    got = resize_sum_conv_relu(xs, (H, W), k, b, interpret="force")
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-4
    )


@pytest.mark.slow
def test_resize_sum_conv_relu_lowres():
    """resize_sum_conv_relu_lowres (conv-at-low-res restructure of the
    decoder head, ops/resize.py) equals the unfused chain — an exact
    linear-algebra rewrite, so f32 agrees to float-associativity noise;
    also checked at an out_hw where no task hits full resolution and with
    a task ALREADY at full resolution (identity resize + pure shifts)."""
    import jax
    import jax.numpy as jnp

    from diff_sal_tpu.ops.resize import (bilinear_resize,
                                         resize_sum_conv_relu_lowres)

    key = jax.random.PRNGKey(3)
    for shapes, out_hw in [
        ([(2, 3), (4, 6), (8, 12), (16, 24)], (32, 48)),
        ([(4, 6), (16, 24)], (16, 24)),
    ]:
        H, W = out_hw
        C, O = 64, 32
        xs = [
            jax.random.normal(jax.random.fold_in(key, i), (2, h, w, C)) * 0.5
            for i, (h, w) in enumerate(shapes)
        ]
        k = jax.random.normal(jax.random.fold_in(key, 9), (3, 3, C, O)) * 0.05
        b = jax.random.normal(jax.random.fold_in(key, 10), (O,)) * 0.1

        acc = sum(bilinear_resize(x, (H, W)) for x in xs)
        want = jax.nn.relu(
            jax.lax.conv_general_dilated(
                acc, k, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + b
        )
        got = resize_sum_conv_relu_lowres(xs, (H, W), k, b)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-4
        )


def test_resize_sum_conv_relu_phase_kernel():
    """resize_sum_conv_relu_phase (conv-at-low-res with the 9-phase shifted
    resize+sum+bias+relu in one Pallas kernel) equals the unfused chain at
    the flagship head geometry, Pallas interpret mode."""
    import jax
    import jax.numpy as jnp

    from diff_sal_tpu.ops.resize import (bilinear_resize,
                                         resize_sum_conv_relu_phase)

    key = jax.random.PRNGKey(5)
    H, W, C, O = 112, 192, 128, 96
    xs = [
        jax.random.normal(jax.random.fold_in(key, i), (2, h, w, C)) * 0.5
        for i, (h, w) in enumerate([(7, 12), (14, 24), (28, 48), (56, 96)])
    ]
    k = jax.random.normal(jax.random.fold_in(key, 9), (3, 3, C, O)) * 0.05
    b = jax.random.normal(jax.random.fold_in(key, 10), (O,)) * 0.1

    acc = sum(bilinear_resize(x, (H, W)) for x in xs)
    want = jax.nn.relu(
        jax.lax.conv_general_dilated(
            acc, k, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + b
    )
    got = resize_sum_conv_relu_phase(xs, (H, W), k, b, interpret="force")
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-4
    )


@pytest.mark.parametrize(
    "R,C,H", [(48, 96, 384), (128, 192, 768), (100, 96, 384)]
)
@pytest.mark.slow
def test_fused_block_tail_kernel(R, C, H):
    """fused_block_tail (add + LN + fc1 -> GELU -> fc2 + add, ops/mlp.py)
    equals the reference composition in Pallas interpret mode, forward and
    backward (reference mvit.py:784-791 tail semantics)."""
    import jax
    import jax.numpy as jnp

    from diff_sal_tpu.ops.mlp import block_tail_reference, fused_block_tail

    key = jax.random.PRNGKey(1)
    ks = jax.random.split(key, 8)
    skip = jax.random.normal(ks[0], (R, C))
    attn = jax.random.normal(ks[1], (R, C))
    scale = jax.random.normal(ks[2], (C,))
    bias = jax.random.normal(ks[3], (C,))
    w1 = jax.random.normal(ks[4], (C, H)) * 0.05
    b1 = jax.random.normal(ks[5], (H,)) * 0.1
    w2 = jax.random.normal(ks[6], (H, C)) * 0.05
    b2 = jax.random.normal(ks[7], (C,)) * 0.1

    for mode in ("tanh", "exact"):
        got = fused_block_tail(
            skip, attn, scale, bias, w1, b1, w2, b2, 1e-6, mode, True
        )
        want = block_tail_reference(
            skip, attn, scale, bias, w1, b1, w2, b2, 1e-6, mode
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-5
        )

    def f_fused(s, a, w):
        return jnp.sum(
            fused_block_tail(
                s, a, scale, bias, w, b1, w2, b2, 1e-6, "tanh", True
            ) ** 2
        )

    def f_ref(s, a, w):
        return jnp.sum(
            block_tail_reference(
                s, a, scale, bias, w, b1, w2, b2, 1e-6, "tanh"
            ) ** 2
        )

    g1 = jax.grad(f_fused, argnums=(0, 1, 2))(skip, attn, w1)
    g2 = jax.grad(f_ref, argnums=(0, 1, 2))(skip, attn, w1)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


@pytest.mark.slow
def test_fused_tail_mvit_param_tree_and_fallback():
    """MViTConfig(fused_tail=True) declares the identical param tree as the
    unfused model, and on CPU (reference fallback) produces identical
    pyramids."""
    import jax
    import jax.numpy as jnp

    from diff_sal_tpu.config import MViTConfig
    from diff_sal_tpu.models.mvit import MViT

    cfg0 = MViTConfig(fused_tail=False)
    cfg1 = MViTConfig(fused_tail=True)
    m0, m1 = MViT(cfg0), MViT(cfg1)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (1, 16, 64, 96, 3), jnp.float32)
    p0 = m0.init(rng, x)
    p1 = m1.init(rng, x)
    assert jax.tree_util.tree_structure(p0) == jax.tree_util.tree_structure(
        p1
    )
    assert all(
        a.shape == b.shape
        for a, b in zip(
            jax.tree_util.tree_leaves(p0), jax.tree_util.tree_leaves(p1)
        )
    )
    y0 = m0.apply(p0, x)
    y1 = m1.apply(p0, x)
    for a, b in zip(
        jax.tree_util.tree_leaves(y0), jax.tree_util.tree_leaves(y1)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_fused_layernorm_packed_rows():
    """The packed-row variant (_ln_pack_kernel: p rows of C=96 riding one
    384-lane row, per-segment stats via one-hot matmuls — measured 0.90x
    at op level, kept default OFF, docs/PERF.md round 3) must match the
    reference per-row LayerNorm."""
    import jax.numpy as jnp
    import numpy as np

    from diff_sal_tpu.ops import layernorm as ln

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(64, 96).astype(np.float32))
    scale = jnp.asarray(rng.randn(96).astype(np.float32))
    bias = jnp.asarray(rng.randn(96).astype(np.float32))
    assert ln._pack_factor(64, 96, None) == 4
    assert ln._pack_factor(64, 128, None) == 0  # already lane-aligned
    assert ln._pack_factor(63, 96, None) == 0  # ragged rows
    assert ln._pack_factor(64, 96, 90) == 0  # masked real_dim
    prev = ln._PACK_ENABLED
    ln._PACK_ENABLED = True
    try:
        got = ln.fused_layernorm(x, scale, bias, 1e-6, True)
    finally:
        ln._PACK_ENABLED = prev
    want = ln._ln_reference(x, scale, bias, 1e-6)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)



@pytest.mark.parametrize("L,C,heads,dt", [
    (84, 768, 2, "float32"),     # stage 0 (L % 8 != 0: row-padding path)
    (336, 384, 2, "bfloat16"),   # stage 1
    (5376, 96, 2, "bfloat16"),   # stage 3 (multi-tile grid)
    (64, 96, 3, "float32"),      # head count that doesn't divide 128
])
def test_cvt_cross_attention_matches_einsum(L, C, heads, dt):
    """Fused decoder CvT attention (kv-resident Pallas kernel) vs the plain
    einsum path of models/sal_unet.py CvTAttention."""
    import jax

    from diff_sal_tpu.ops.attention import (
        cvt_cross_attention,
        reference_cvt_attention,
    )

    Bt, S = 5, 18
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (Bt, L, C), dtype=dt)
    k = jax.random.normal(jax.random.fold_in(key, 1), (Bt, S, C), dtype=dt)
    v = jax.random.normal(jax.random.fold_in(key, 2), (Bt, S, C), dtype=dt)
    scale = C**-0.5
    ref = reference_cvt_attention(q, k, v, heads, scale)
    out = cvt_cross_attention(q, k, v, heads, scale, interpret=True)
    assert out.shape == (Bt, L, C) and out.dtype == q.dtype
    atol = 2e-2 if dt == "bfloat16" else 2e-5
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=atol
    )


@pytest.mark.parametrize(
    "pad,dil", [((1, 1), (1, 1)), ((2, 2), (2, 2))]
)
def test_conv2d_wg_dots_matches_xla_vjp(pad, dil):
    """conv2d_wg_dots (ops/convgrad.py): forward equals
    lax.conv_general_dilated bit-for-bit (same primitive), and BOTH
    gradients match the XLA conv vjp in f32 — covering mt_proj's 3x3
    pad-1 and UpEmbed's dilated 3x3 pad-2 geometry."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    from diff_sal_tpu.ops.convgrad import conv2d_wg_dots

    key = jax.random.PRNGKey(7)
    N, H, W, C, O = 2, 12, 16, 24, 16
    x = jax.random.normal(key, (N, H, W, C)) * 0.5
    k = jax.random.normal(jax.random.fold_in(key, 1), (3, 3, C, O)) * 0.1
    g = jax.random.normal(jax.random.fold_in(key, 2), (N, H, W, O)) * 0.3

    def ref(x, k):
        return lax.conv_general_dilated(
            x, k, (1, 1), [pad, pad], rhs_dilation=dil,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    y0 = ref(x, k)
    y1 = conv2d_wg_dots(x, k, pad, dil)
    np.testing.assert_array_equal(np.asarray(y0), np.asarray(y1))

    def loss_ref(x, k):
        return jnp.sum(ref(x, k) * g)

    def loss_new(x, k):
        return jnp.sum(conv2d_wg_dots(x, k, pad, dil) * g)

    dx0, dk0 = jax.grad(loss_ref, argnums=(0, 1))(x, k)
    dx1, dk1 = jax.grad(loss_new, argnums=(0, 1))(x, k)
    np.testing.assert_allclose(
        np.asarray(dx1), np.asarray(dx0), atol=1e-5, rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(dk1), np.asarray(dk0), atol=1e-4, rtol=1e-5
    )


@pytest.mark.parametrize("stride", [(1, 1, 1), (1, 2, 2)])
def test_depthwise_conv3d_tap_bwd_matches_xla_vjp(stride):
    """depthwise_conv3d (ops/dwconv.py): forward equals the conv primitive
    bit-for-bit and the tap-based custom vjp matches XLA's conv vjp in f32
    — the MViT attention-pool geometry (kernel (3,3,3), SAME-ish padding,
    feature_group_count=C), stride 1 and the q-pool stride (1,2,2)."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    from diff_sal_tpu.ops.dwconv import _dw_tap, depthwise_conv3d

    key = jax.random.PRNGKey(11)
    N, T, H, W, C = 2, 4, 6, 8, 16
    pad = [(1, 1), (1, 1), (1, 1)]
    x = jax.random.normal(key, (N, T, H, W, C)) * 0.5
    k = jax.random.normal(jax.random.fold_in(key, 1), (3, 3, 3, 1, C)) * 0.2

    def ref(x, k):
        return lax.conv_general_dilated(
            x, k, stride, pad,
            dimension_numbers=("NTHWC", "THWIO", "NTHWC"),
            feature_group_count=C,
        )

    y0 = ref(x, k)
    y1 = depthwise_conv3d(x, k, stride, pad, tap_bwd=True)
    np.testing.assert_array_equal(np.asarray(y0), np.asarray(y1))

    g = jax.random.normal(jax.random.fold_in(key, 2), y0.shape) * 0.3

    def loss_ref(x, k):
        return jnp.sum(ref(x, k) * g)

    def loss_tap(x, k):
        return jnp.sum(
            _dw_tap(x, k, tuple(stride), tuple(map(tuple, pad))) * g
        )

    dx0, dk0 = jax.grad(loss_ref, argnums=(0, 1))(x, k)
    dx1, dk1 = jax.grad(loss_tap, argnums=(0, 1))(x, k)
    np.testing.assert_allclose(
        np.asarray(dx1), np.asarray(dx0), atol=1e-5, rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(dk1), np.asarray(dk0), atol=1e-4, rtol=1e-5
    )
