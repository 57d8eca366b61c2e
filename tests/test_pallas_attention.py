"""Correctness of the fused bias-attention Pallas kernel (interpret mode on
CPU) against the reference jnp formulation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diff_sal_tpu.ops.attention import fused_bias_attention


def reference_attention(q, k, v, rel_t, rel_h, rel_w, k_shape, scale):
    """The XLA-path math (mirrors MultiScaleAttention + rel-pos add)."""
    BH, Lq, D = q.shape
    kt, kh, kw = k_shape
    scores = jnp.einsum("blc,btc->blt", q * scale, k)
    # bias for cols >= 1 from decomposed terms; rows' cls handled by zeroed
    # rel rows
    bias_cols = (
        rel_t[:, :, :, None, None]
        + rel_h[:, :, None, :, None]
        + rel_w[:, :, None, None, :]
    ).reshape(BH, Lq, kt * kh * kw)
    bias = jnp.pad(bias_cols, ((0, 0), (0, 0), (1, 0)))
    probs = jax.nn.softmax(scores + bias, axis=-1)
    return jnp.einsum("blt,btc->blc", probs, v)


@pytest.mark.parametrize(
    "q_grid,k_shape,D",
    [((4, 8, 8), (4, 2, 2), 32), ((8, 14, 24), (8, 7, 12), 96)],
)
def test_fused_attention_matches_reference(q_grid, k_shape, D):
    rng = np.random.RandomState(0)
    BH = 2
    Lq = 1 + int(np.prod(q_grid))
    Lk = 1 + int(np.prod(k_shape))
    q = jnp.asarray(rng.randn(BH, Lq, D).astype(np.float32))
    k = jnp.asarray(rng.randn(BH, Lk, D).astype(np.float32))
    v = jnp.asarray(rng.randn(BH, Lk, D).astype(np.float32))
    # rel inputs with zeroed cls row
    def rel(n):
        r = rng.randn(BH, Lq, n).astype(np.float32) * 0.1
        r[:, 0] = 0.0
        return jnp.asarray(r)

    rel_t, rel_h, rel_w = rel(k_shape[0]), rel(k_shape[1]), rel(k_shape[2])
    scale = D**-0.5

    got = fused_bias_attention(
        q, k, v, rel_t, rel_h, rel_w, k_shape, scale=scale, q_tile=256,
        interpret=True,
    )
    want = reference_attention(q, k, v, rel_t, rel_h, rel_w, k_shape, scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


def test_fused_attention_grad_matches():
    rng = np.random.RandomState(1)
    BH, D = 1, 32
    q_grid, k_shape = (2, 4, 4), (2, 2, 2)
    Lq = 1 + int(np.prod(q_grid))
    Lk = 1 + int(np.prod(k_shape))
    q = jnp.asarray(rng.randn(BH, Lq, D).astype(np.float32))
    k = jnp.asarray(rng.randn(BH, Lk, D).astype(np.float32))
    v = jnp.asarray(rng.randn(BH, Lk, D).astype(np.float32))
    zr = lambda n: jnp.asarray(  # noqa: E731
        np.concatenate(
            [np.zeros((BH, 1, n)), rng.randn(BH, Lq - 1, n) * 0.1], axis=1
        ).astype(np.float32)
    )
    rel_t, rel_h, rel_w = zr(2), zr(2), zr(2)

    def f_fused(q, k, v):
        return jnp.sum(
            fused_bias_attention(
                q, k, v, rel_t, rel_h, rel_w, k_shape, scale=0.2, q_tile=64,
                interpret=True,
            )
            ** 2
        )

    def f_ref(q, k, v):
        return jnp.sum(
            reference_attention(q, k, v, rel_t, rel_h, rel_w, k_shape, 0.2)
            ** 2
        )

    g1 = jax.grad(f_fused, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)


@pytest.mark.slow
def test_mvit_pallas_path_matches_xla_path():
    """Integrated check: MViT with use_pallas_attention on (interpret mode on
    CPU) matches the XLA path with identical params."""
    import dataclasses

    from diff_sal_tpu.config import MViTConfig
    from diff_sal_tpu.models.mvit import MViT

    cfg_x = MViTConfig.tiny(spatial_size=(64, 64))
    cfg_p = dataclasses.replace(cfg_x, use_pallas_attention=True)
    m_x, m_p = MViT(cfg_x), MViT(cfg_p)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 64, 64, 3)) * 0.3
    v = m_x.init(jax.random.PRNGKey(1), x)
    # give the rel-pos tables non-zero values so the bias path is exercised
    import jax as _jax

    v = {"params": _jax.tree_util.tree_map_with_path(
        lambda p, l: (
            l + 0.02 * np.sin(np.arange(l.size)).reshape(l.shape).astype(l.dtype)
            if "rel_pos" in _jax.tree_util.keystr(p)
            else l
        ),
        v["params"],
    )}
    o_x = m_x.apply(v, x)
    o_p = m_p.apply(v, x)
    for a, b in zip(o_x, o_p):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_fused_attention_residual_flag():
    """In-kernel residual pooling (out[1:] += q[1:], cls excluded) matches
    the explicit outer add."""
    rng = np.random.RandomState(4)
    BH, D = 2, 32
    q_grid, k_shape = (4, 8, 8), (4, 2, 2)
    Lq = 1 + int(np.prod(q_grid))
    Lk = 1 + int(np.prod(k_shape))
    q = jnp.asarray(rng.randn(BH, Lq, D).astype(np.float32))
    k = jnp.asarray(rng.randn(BH, Lk, D).astype(np.float32))
    v = jnp.asarray(rng.randn(BH, Lk, D).astype(np.float32))

    def zrel(n):
        r = rng.randn(BH, Lq, n).astype(np.float32) * 0.1
        r[:, 0] = 0
        return jnp.asarray(r)

    rel = [zrel(2), zrel(2), zrel(2)]
    plain = fused_bias_attention(
        q, k, v, *rel, k_shape, 0.2, 64, True, False
    )
    fused = fused_bias_attention(
        q, k, v, *rel, k_shape, 0.2, 64, True, True
    )
    want = plain.at[:, 1:].add(q[:, 1:])
    np.testing.assert_allclose(np.asarray(fused), np.asarray(want), atol=1e-5)


def test_fused_attention_bwd_kernel_full():
    """Pallas backward kernel (multi-tile, residual on) matches autodiff
    through the reference formulation for ALL six inputs incl. the
    decomposed rel-pos terms."""
    rng = np.random.RandomState(7)
    BH, D = 2, 32
    q_grid, k_shape = (4, 8, 8), (4, 2, 2)
    Lq = 1 + int(np.prod(q_grid))
    Lk = 1 + int(np.prod(k_shape))
    q = jnp.asarray(rng.randn(BH, Lq, D).astype(np.float32))
    k = jnp.asarray(rng.randn(BH, Lk, D).astype(np.float32))
    v = jnp.asarray(rng.randn(BH, Lk, D).astype(np.float32))

    def zrel(n):
        r = rng.randn(BH, Lq, n).astype(np.float32) * 0.1
        r[:, 0] = 0
        return jnp.asarray(r)

    rels = (zrel(4), zrel(2), zrel(2))
    g = jnp.asarray(rng.randn(BH, Lq, D).astype(np.float32))

    def f_fused(q, k, v, rt, rh, rw):
        out = fused_bias_attention(
            q, k, v, rt, rh, rw, k_shape, 0.2, 64, True, True
        )
        return jnp.sum(out * g)

    def f_ref(q, k, v, rt, rh, rw):
        out = reference_attention(q, k, v, rt, rh, rw, k_shape, 0.2)
        out = out.at[:, 1:].add(q[:, 1:])
        return jnp.sum(out * g)

    g1 = jax.grad(f_fused, argnums=tuple(range(6)))(q, k, v, *rels)
    g2 = jax.grad(f_ref, argnums=tuple(range(6)))(q, k, v, *rels)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)


def test_fused_attention_bwd_bf16_dtypes():
    """bf16 primals get bf16 cotangents (custom_vjp dtype contract) with f32
    rel inputs keeping f32 grads."""
    rng = np.random.RandomState(8)
    BH, D = 1, 32
    k_shape = (2, 2, 2)
    Lq, Lk = 1 + 2 * 4 * 4, 1 + 8
    q = jnp.asarray(rng.randn(BH, Lq, D), jnp.bfloat16)
    k = jnp.asarray(rng.randn(BH, Lk, D), jnp.bfloat16)
    v = jnp.asarray(rng.randn(BH, Lk, D), jnp.bfloat16)
    rels = tuple(
        jnp.asarray(
            np.concatenate(
                [np.zeros((BH, 1, 2)), rng.randn(BH, Lq - 1, 2) * 0.1], 1
            ),
            jnp.float32,
        )
        for _ in range(3)
    )

    def f(q, k, v, rt, rh, rw):
        return jnp.sum(
            fused_bias_attention(
                q, k, v, rt, rh, rw, k_shape, 0.2, 64, True, False
            ).astype(jnp.float32)
        )

    grads = jax.grad(f, argnums=tuple(range(6)))(q, k, v, *rels)
    assert grads[0].dtype == jnp.bfloat16
    assert grads[3].dtype == jnp.float32
    for a in grads:
        assert np.isfinite(np.asarray(a, np.float32)).all()


class TestV2Kernel:
    """fused_bias_attention_v2: packed (B, Lq, H*D) layout, cls-free q,
    concatenated rel bias (round-3 layout redesign)."""

    def _make(self, B=2, H=2, hd=24, k_shape=(2, 3, 4), q_shape=(2, 6, 8),
              seed=0):
        rng = np.random.RandomState(seed)
        D = 128
        Lq = int(np.prod(q_shape))
        Lk = 1 + int(np.prod(k_shape))
        kt, kh, kw = k_shape
        K = kt + kh + kw
        Kp = 128

        def pad_hd(x):  # (B, L, H, hd) -> packed (B, L, H*D), zero pad
            return np.pad(x, ((0, 0), (0, 0), (0, 0), (0, D - hd))).reshape(
                x.shape[0], x.shape[1], -1
            )

        q = rng.randn(B, Lq, H, hd).astype(np.float32) * 0.3
        k = rng.randn(B, Lk, H, hd).astype(np.float32) * 0.3
        v = rng.randn(B, Lk, H, hd).astype(np.float32) * 0.3
        rel = rng.randn(B, Lq, H, K).astype(np.float32) * 0.2
        relp = np.pad(rel, ((0, 0), (0, 0), (0, 0), (0, Kp - K))).reshape(
            B, Lq, -1
        )
        return (q, k, v, rel), (pad_hd(q), pad_hd(k), pad_hd(v), relp)

    @staticmethod
    def _reference(q, k, v, rel, k_shape, scale, residual):
        # plain einsum on the unpacked (B, L, H, hd) arrays
        kt, kh, kw = k_shape
        B, Lq, H, hd = q.shape
        scores = np.einsum("blhc,bthc->bhlt", q * scale, k)
        rel_t = rel[..., :kt]
        rel_h = rel[..., kt : kt + kh]
        rel_w = rel[..., kt + kh :]
        bias = (
            rel_t[:, :, :, :, None, None]
            + rel_h[:, :, :, None, :, None]
            + rel_w[:, :, :, None, None, :]
        ).reshape(B, Lq, H, kt * kh * kw)
        bias = np.pad(bias, ((0, 0), (0, 0), (0, 0), (1, 0)))  # cls col 0
        s = scores + np.moveaxis(bias, 2, 1)
        e = np.exp(s - s.max(-1, keepdims=True))
        p = e / e.sum(-1, keepdims=True)
        out = np.einsum("bhlt,bthc->blhc", p, v)
        if residual:
            out = out + q
        return out

    @pytest.mark.parametrize("residual", [False, True])
    def test_forward_matches_reference(self, residual):
        from diff_sal_tpu.ops.attention import fused_bias_attention_v2

        (q, k, v, rel), (qp, kp, vp, relp) = self._make()
        scale = 0.17
        out = fused_bias_attention_v2(
            jnp.asarray(qp), jnp.asarray(kp), jnp.asarray(vp),
            jnp.asarray(relp), (2, 3, 4), 2, scale, True, residual,
        )
        ref = self._reference(q, k, v, rel, (2, 3, 4), scale, residual)
        B, Lq, H, hd = q.shape
        got = np.asarray(out).reshape(B, Lq, H, 128)
        np.testing.assert_allclose(got[..., :hd], ref, atol=2e-5)
        assert np.abs(got[..., hd:]).max() == 0.0  # pad lanes stay zero

    def test_grads_match_reference(self):
        from diff_sal_tpu.ops.attention import fused_bias_attention_v2

        (q, k, v, rel), (qp, kp, vp, relp) = self._make(B=1, H=2)
        scale = 0.2

        def loss_kernel(qp, kp, vp, relp):
            out = fused_bias_attention_v2(
                qp, kp, vp, relp, (2, 3, 4), 2, scale, True, True,
            )
            return jnp.sum(out**2)

        def loss_ref(q, k, v, rel):
            kt, kh, kw = (2, 3, 4)
            scores = jnp.einsum("blhc,bthc->bhlt", q * scale, k)
            B, Lq, H, hd = q.shape
            rel_t, rel_h, rel_w = (
                rel[..., :kt], rel[..., kt : kt + kh], rel[..., kt + kh :]
            )
            bias = (
                rel_t[:, :, :, :, None, None]
                + rel_h[:, :, :, None, :, None]
                + rel_w[:, :, :, None, None, :]
            ).reshape(B, Lq, H, kt * kh * kw)
            bias = jnp.pad(bias, ((0, 0), (0, 0), (0, 0), (1, 0)))
            p = jax.nn.softmax(scores + jnp.moveaxis(bias, 2, 1), axis=-1)
            out = jnp.einsum("bhlt,bthc->blhc", p, v) + q
            return jnp.sum(out**2)

        gk = jax.grad(loss_kernel, argnums=(0, 1, 2, 3))(
            jnp.asarray(qp), jnp.asarray(kp), jnp.asarray(vp),
            jnp.asarray(relp),
        )
        gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(rel)
        )
        B, Lq, H, hd = q.shape
        Lk = k.shape[1]
        K = 9
        np.testing.assert_allclose(
            np.asarray(gk[0]).reshape(B, Lq, H, 128)[..., :hd],
            np.asarray(gr[0]), atol=3e-5,
        )
        np.testing.assert_allclose(
            np.asarray(gk[1]).reshape(B, Lk, H, 128)[..., :hd],
            np.asarray(gr[1]), atol=3e-5,
        )
        np.testing.assert_allclose(
            np.asarray(gk[2]).reshape(B, Lk, H, 128)[..., :hd],
            np.asarray(gr[2]), atol=3e-5,
        )
        np.testing.assert_allclose(
            np.asarray(gk[3]).reshape(B, Lq, H, 128)[..., :K],
            np.asarray(gr[3]), atol=3e-5,
        )

    def test_ragged_lq_pads(self):
        """Lq without a 128-multiple divisor falls back to row padding."""
        from diff_sal_tpu.ops.attention import fused_bias_attention_v2

        (q, k, v, rel), (qp, kp, vp, relp) = self._make(q_shape=(2, 6, 7))
        out = fused_bias_attention_v2(
            jnp.asarray(qp), jnp.asarray(kp), jnp.asarray(vp),
            jnp.asarray(relp), (2, 3, 4), 2, 0.1, True, False,
        )
        ref = self._reference(q, k, v, rel, (2, 3, 4), 0.1, False)
        got = np.asarray(out).reshape(q.shape[0], q.shape[1], 2, 128)
        np.testing.assert_allclose(got[..., : q.shape[-1]], ref, atol=2e-5)


def test_v2_resident_path_matches_reference():
    """Shapes with lk_pad >= 1024 dispatch to the kv-resident kernel
    variant (grid (B,H), inner q loop — ops/attention.py
    _attn_v2_resident_kernel); it must match the XLA reference exactly
    like the tiled variant."""
    import jax
    import jax.numpy as jnp

    from diff_sal_tpu.ops import attention as attn_mod
    from diff_sal_tpu.ops.attention import (fused_bias_attention_v2,
                                            reference_bias_attention_v2)

    k_shape = (8, 14, 10)  # 1121 keys -> lk_pad 1152 >= 1024
    Lk = 1 + 8 * 14 * 10
    B, H, Lq, hd = 2, 2, 512, 96
    D, Kp = 128, 128
    attn_mod._RESIDENT_ENABLED = True
    try:
        assert attn_mod._use_resident(512, 1152, D, Kp)

        key = jax.random.PRNGKey(3)
        mk = lambda i, shp: jax.random.normal(jax.random.fold_in(key, i), shp) * 0.4  # noqa: E731
        # packed layout with zero pad lanes beyond hd
        q4 = mk(0, (B, Lq, H, hd))
        k4 = mk(1, (B, Lk, H, hd))
        v4 = mk(2, (B, Lk, H, hd))
        pad = lambda x: jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, D - hd))).reshape(  # noqa: E731
            x.shape[0], x.shape[1], -1
        )
        K = sum(k_shape)
        rel = mk(3, (B, Lq, H, K))
        relp = jnp.pad(rel, ((0, 0), (0, 0), (0, 0), (0, Kp - K))).reshape(
            B, Lq, -1
        )
        args = (pad(q4), pad(k4), pad(v4), relp, k_shape, H, 0.13, True, True)
        got = fused_bias_attention_v2(*args)
        want = reference_bias_attention_v2(*args)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-5)
    finally:
        attn_mod._RESIDENT_ENABLED = False


def test_v2_exp2_bf16_softmax_matches_exp2():
    """softmax_mode='exp2_bf16' (the bf16 score-chain variant, PERF.md
    round-3 candidate #3 — measured 0.973x e2e, kept default OFF) must
    agree with the default exp2 mode to bf16 output rounding: the pv dot
    consumes bf16 probs in BOTH modes, so the only extra rounding is
    s - m before exp2."""
    import jax
    import jax.numpy as jnp

    from diff_sal_tpu.ops.attention import fused_bias_attention_v2

    B, H, D, Kp = 2, 2, 128, 128
    kt, kh, kw = 4, 7, 9
    Lk = 1 + kt * kh * kw
    Lq = 300
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    q = (jax.random.normal(ks[0], (B, Lq, H * D)) * 0.5).astype(jnp.bfloat16)
    k = (jax.random.normal(ks[1], (B, Lk, H * D)) * 0.5).astype(jnp.bfloat16)
    v = (jax.random.normal(ks[2], (B, Lk, H * D)) * 0.5).astype(jnp.bfloat16)
    rel = (jax.random.normal(ks[3], (B, Lq, H * Kp)) * 0.1).astype(
        jnp.bfloat16
    )
    args = (q, k, v, rel, (kt, kh, kw), H, 0.09)
    a = fused_bias_attention_v2(*args, None, True, None, "exp2")
    b = fused_bias_attention_v2(*args, None, True, None, "exp2_bf16")
    d = jnp.max(
        jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))
    )
    assert float(d) <= 0.0157, float(d)  # two bf16 ULP at |out|~1
