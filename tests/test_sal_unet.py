"""Shape-contract and behavior tests for the SalUNet decoder stack at the
exact reference dimensions (SURVEY.md §3.5)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diff_sal_tpu.config import SalUNetConfig
from diff_sal_tpu.models.sal_unet import (
    CvTAttention,
    NoiseEncoder,
    SalUNet,
    TimestepMLP,
    TransformerBlock,
    _scrambled_audio_tokens,
)


def _vis_pyramid(B=1, T=8, dtype=jnp.float32):
    rng = np.random.RandomState(0)
    shapes = [(B, T, 7, 12, 768), (B, T, 14, 24, 384), (B, T, 28, 48, 192),
              (B, T, 56, 96, 96)]
    return [jnp.asarray(rng.randn(*s).astype(np.float32), dtype=dtype) for s in shapes]


def test_timestep_mlp_shapes():
    m = TimestepMLP(ch=96)
    params = m.init(jax.random.PRNGKey(0), jnp.zeros((4,)))
    out = m.apply(params, jnp.asarray([0.0, 10.0, 500.0, 999.0]))
    assert out.shape == (4, 384)


def test_timestep_embedding_matches_ddpm_convention():
    from diff_sal_tpu.models.layers import timestep_embedding

    emb = np.asarray(timestep_embedding(jnp.asarray([0.0, 1.0]), 96))
    # t=0: all sines 0, all cosines 1
    np.testing.assert_allclose(emb[0, :48], 0.0, atol=1e-7)
    np.testing.assert_allclose(emb[0, 48:], 1.0, atol=1e-7)
    # t=1, freq_0 = 1 -> sin(1), cos(1)
    np.testing.assert_allclose(emb[1, 0], np.sin(1.0), rtol=1e-6)
    np.testing.assert_allclose(emb[1, 48], np.cos(1.0), rtol=1e-6)


@pytest.mark.slow
def test_noise_encoder_pyramid_shapes():
    m = NoiseEncoder()
    x = jnp.zeros((2, 224, 384, 1))
    temb = jnp.zeros((2, 384))
    params = m.init(jax.random.PRNGKey(0), x, temb)
    outs = m.apply(params, x, temb)
    assert [o.shape for o in outs] == [
        (2, 1, 7, 12, 768),
        (2, 1, 14, 24, 384),
        (2, 1, 28, 48, 192),
    ]


def test_scrambled_audio_tokens_matches_torch_view():
    import torch

    rng = np.random.RandomState(1)
    a = rng.randn(2, 9, 7, 12, 16).astype(np.float32)  # (B,T,H,W,C)
    ours = np.asarray(_scrambled_audio_tokens(jnp.asarray(a)))
    at = torch.from_numpy(a).permute(0, 4, 1, 2, 3).contiguous()  # (B,C,T,H,W)
    ref = at.view(2 * 9, 7 * 12, 16).numpy()
    np.testing.assert_array_equal(ours, ref)


@pytest.mark.parametrize("stride_kv,hw", [(2, (7, 12)), (4, (14, 24)),
                                          (8, (28, 48)), (16, (56, 96))])
def test_cvt_attention_kv_token_count(stride_kv, hw):
    # kv pooling must give 3x6=18 tokens at every scale (attention.py kv conv)
    C = 32
    m = CvTAttention(num_heads=2, kernel_kv=stride_kv, stride_kv=stride_kv)
    tokens = jnp.zeros((2, hw[0] * hw[1], C))
    params = m.init(jax.random.PRNGKey(0), tokens, hw)
    # probe the kv conv output length through the params of norm_k? Easier:
    # run and check output shape is preserved; internal correctness is implied
    # by the conv arithmetic asserted here:
    h_kv = (hw[0] - stride_kv) // stride_kv + 1
    w_kv = (hw[1] - stride_kv) // stride_kv + 1
    assert (h_kv, w_kv) == (3, 6)
    out = m.apply(params, tokens, hw)
    assert out.shape == tokens.shape


def test_cvt_attention_introspection_sow():
    """The attention-map hook mirrors the reference's messages['attn'] store
    (attention.py:103): apply with mutable=['intermediates'] yields the
    post-softmax (B, heads, Lq, Lkv) map; a plain apply returns no extra
    state and the identical output."""
    C, hw = 32, (12, 24)
    m = CvTAttention(num_heads=2, kernel_kv=4, stride_kv=4)
    tokens = jax.random.normal(jax.random.PRNGKey(1), (2, hw[0] * hw[1], C))
    params = m.init(jax.random.PRNGKey(0), tokens, hw)
    out_plain = m.apply(params, tokens, hw)
    out, state = m.apply(params, tokens, hw, mutable=["intermediates"])
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out_plain))
    (attn,) = state["intermediates"]["attn"]
    assert attn.shape == (2, 2, hw[0] * hw[1], 18)
    np.testing.assert_allclose(
        np.asarray(attn).sum(-1), 1.0, atol=1e-5
    )


@pytest.mark.slow
def test_transformer_block_with_audio():
    m = TransformerBlock(num_heads=2, kernel_kv=4, stride_kv=4)
    x = jnp.zeros((1, 9, 14, 24, 64))
    audio = jnp.zeros((1, 9, 7, 12, 512))
    params = m.init(jax.random.PRNGKey(0), x, audio)
    out = m.apply(params, x, audio)
    assert out.shape == x.shape


@pytest.mark.slow
def test_salunet_visual_only_full_shape():
    cfg = SalUNetConfig()
    m = SalUNet(cfg)
    x = jnp.zeros((1, 224, 384, 1))
    t = jnp.zeros((1,))
    feats = _vis_pyramid()
    params = m.init(jax.random.PRNGKey(0), x, t, feats)
    out = m.apply(params, x, t, feats)
    assert out.shape == (1, 224, 384, 1)
    o = np.asarray(out)
    assert (o > 0).all() and (o < 1).all()  # sigmoid head


@pytest.mark.slow
def test_salunet_audio_visual_full_shape():
    cfg = SalUNetConfig()
    m = SalUNet(cfg)
    x = jnp.zeros((1, 224, 384, 1))
    t = jnp.zeros((1,))
    feats = _vis_pyramid()
    audio = jnp.zeros((1, 9, 7, 12, 512))
    params = m.init(jax.random.PRNGKey(0), x, t, feats, audio)
    out = m.apply(params, x, t, feats, audio)
    assert out.shape == (1, 224, 384, 1)


@pytest.mark.slow
def test_salunet_train_mode_mutates_batch_stats():
    cfg = SalUNetConfig()
    m = SalUNet(cfg)
    x = jnp.zeros((1, 224, 384, 1))
    t = jnp.zeros((1,))
    feats = _vis_pyramid()
    variables = m.init(jax.random.PRNGKey(0), x, t, feats)
    out, mutated = m.apply(
        variables,
        x,
        t,
        feats,
        None,
        True,
        mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(1)},
    )
    assert out.shape == (1, 224, 384, 1)
    assert "batch_stats" in mutated


@pytest.mark.slow
def test_salunet_jit_compiles_once():
    cfg = SalUNetConfig()
    m = SalUNet(cfg)
    x = jnp.zeros((1, 224, 384, 1))
    t = jnp.zeros((1,))
    feats = _vis_pyramid()
    params = m.init(jax.random.PRNGKey(0), x, t, feats)
    f = jax.jit(lambda p, x, t, fs: m.apply(p, x, t, fs))
    out1 = f(params, x, t, feats)
    out2 = f(params, x + 1.0, t, feats)
    assert out1.shape == out2.shape == (1, 224, 384, 1)


def test_upembed_phase_matches_dense():
    """UpEmbed(phase=True) — polyphase rewrite of upsample + dilated convs
    (reference common_block.py:176-223) — is EXACT vs the dense path in
    f32, in eval and train mode (incl. identical BatchNorm batch stats),
    with the identical param tree."""
    from diff_sal_tpu.models.sal_unet import UpEmbed

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 4, 14, 24, 384).astype(np.float32))
    m0 = UpEmbed(192, phase=False)
    m1 = UpEmbed(192, phase=True)
    v0 = m0.init(jax.random.PRNGKey(0), x)
    v1 = m1.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(v0) == jax.tree_util.tree_structure(
        v1
    )
    y0 = m0.apply(v0, x)
    y1 = m1.apply(v0, x)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0), atol=2e-4)

    y0t, mut0 = m0.apply(v0, x, train=True, mutable=["batch_stats"])
    y1t, mut1 = m1.apply(v0, x, train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(y1t), np.asarray(y0t), atol=2e-4)
    for a, b in zip(
        jax.tree_util.tree_leaves(mut0), jax.tree_util.tree_leaves(mut1)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_upembed_phase_odd_sizes_and_grad():
    """Phase rewrite stays exact on odd spatial sizes (edge clamping) and
    under the gradient."""
    from diff_sal_tpu.models.sal_unet import UpEmbed

    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(1, 2, 7, 13, 32).astype(np.float32))
    m0 = UpEmbed(16, phase=False)
    m1 = UpEmbed(16, phase=True)
    v = m0.init(jax.random.PRNGKey(0), x)
    y0 = m0.apply(v, x)
    y1 = m1.apply(v, x)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0), atol=2e-4)

    g0 = jax.grad(lambda v: jnp.sum(m0.apply(v, x) ** 2))(v)
    g1 = jax.grad(lambda v: jnp.sum(m1.apply(v, x) ** 2))(v)
    for a, b in zip(
        jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=2e-3)


def test_transformer_block_fused_tail_tree_and_fallback():
    """TransformerBlock(fused_tail=True) declares the identical param tree
    and (on CPU, where the kernel falls back to the reference composition)
    matches the unfused eval output; train mode always takes the module
    path."""
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(1, 2, 14, 24, 192).astype(np.float32))
    au = jnp.asarray(rng.randn(1, 2, 7, 12, 512).astype(np.float32))
    b0 = TransformerBlock(num_heads=2, stride_kv=4, kernel_kv=4)
    b1 = TransformerBlock(num_heads=2, stride_kv=4, kernel_kv=4,
                          fused_tail=True)
    v0 = b0.init(jax.random.PRNGKey(0), x, au)
    v1 = b1.init(jax.random.PRNGKey(0), x, au)
    assert jax.tree_util.tree_structure(v0) == jax.tree_util.tree_structure(
        v1
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(v0), jax.tree_util.tree_leaves(v1)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    y0 = b0.apply(v0, x, au)
    y1 = b1.apply(v0, x, au)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0), atol=1e-5)


def test_cvt_pool_reduce_matches_conv():
    """CvTAttention(pool_reduce=True) — kernel==stride depthwise convs as
    reshape+weighted-reduce — matches the conv path exactly (f32) with the
    identical param tree (reference attention.py:35-60 projections)."""
    rng = np.random.RandomState(6)
    x = jnp.asarray(rng.randn(4, 28 * 48, 192).astype(np.float32))
    au = jnp.asarray(rng.randn(4, 28 * 48, 192).astype(np.float32))
    a0 = CvTAttention(num_heads=2, kernel_kv=8, stride_kv=8)
    a1 = CvTAttention(num_heads=2, kernel_kv=8, stride_kv=8,
                      pool_reduce=True)
    v0 = a0.init(jax.random.PRNGKey(0), x, (28, 48), au)
    v1 = a1.init(jax.random.PRNGKey(0), x, (28, 48), au)
    assert jax.tree_util.tree_structure(v0) == jax.tree_util.tree_structure(
        v1
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(v0), jax.tree_util.tree_leaves(v1)
    ):
        assert a.shape == b.shape
    y0 = a0.apply(v0, x, (28, 48), au)
    y1 = a1.apply(v0, x, (28, 48), au)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0), atol=2e-5)
    # and with self-attention (no audio)
    y0 = a0.apply(v0, x, (28, 48))
    y1 = a1.apply(v0, x, (28, 48))
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0), atol=2e-5)


@pytest.mark.slow
def test_skip_dead_frames_exact():
    """skip_dead_frames: the full SalUNet output is identical — the last
    stage's frames 5-8 never reach ReduceTemp (5-of-9 quirk,
    reference common_block.py:150-173) or anything else."""
    import dataclasses

    cfg0 = dataclasses.replace(
        SalUNetConfig(),
        skip_dead_frames=False,
        skip_dead_frames_all=False,  # the _all cut is approximate; this
        # test asserts the LAST-stage cut alone is exact
    )
    cfg1 = dataclasses.replace(cfg0, skip_dead_frames=True)
    m0, m1 = SalUNet(cfg0), SalUNet(cfg1)
    rng = np.random.RandomState(7)
    feats = _vis_pyramid(B=1, T=8)
    audio = jnp.asarray(rng.randn(1, 9, 7, 12, 512).astype(np.float32))
    x_t = jnp.asarray(rng.randn(1, 224, 384, 1).astype(np.float32))
    t = jnp.asarray([3.0])
    v0 = m0.init(jax.random.PRNGKey(0), x_t, t, feats, audio)
    v1 = m1.init(jax.random.PRNGKey(0), x_t, t, feats, audio)
    assert jax.tree_util.tree_structure(v0) == jax.tree_util.tree_structure(
        v1
    )
    y0 = m0.apply(v0, x_t, t, feats, audio)
    y1 = m1.apply(v0, x_t, t, feats, audio)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0), atol=1e-6)


@pytest.mark.slow
def test_skip_dead_frames_all_close():
    """skip_dead_frames_all cuts frames 5-8 at EVERY stage. All decoder
    compute is frame-local except the av gate's time-mean, so the output
    differs only through the downstream gates averaging 5 frames instead
    of 9 — assert the same param tree and a small bounded output delta
    (the e2e CC/NSS/SIM bound lives in the parity suite / PERF.md)."""
    import dataclasses

    cfg0 = dataclasses.replace(SalUNetConfig(), skip_dead_frames_all=False)
    cfg1 = dataclasses.replace(cfg0, skip_dead_frames_all=True)
    m0, m1 = SalUNet(cfg0), SalUNet(cfg1)
    rng = np.random.RandomState(7)
    feats = _vis_pyramid(B=1, T=8)
    audio = jnp.asarray(rng.randn(1, 9, 7, 12, 512).astype(np.float32))
    x_t = jnp.asarray(rng.randn(1, 224, 384, 1).astype(np.float32))
    t = jnp.asarray([3.0])
    v0 = m0.init(jax.random.PRNGKey(0), x_t, t, feats, audio)
    v1 = m1.init(jax.random.PRNGKey(0), x_t, t, feats, audio)
    assert jax.tree_util.tree_structure(v0) == jax.tree_util.tree_structure(
        v1
    )
    y0 = np.asarray(m0.apply(v0, x_t, t, feats, audio))
    y1 = np.asarray(m1.apply(v0, x_t, t, feats, audio))
    d = np.abs(y1 - y0).max()
    s = np.abs(y0).max()
    assert d > 0  # the gate path really changed
    assert d < 0.05 * max(s, 1.0), (d, s)
    cc = np.corrcoef(y0.ravel(), y1.ravel())[0, 1]
    assert cc > 0.999, cc


@pytest.mark.slow
def test_skip_dead_frames_train_close():
    """skip_dead_frames_train extends the every-stage dead-frame cut into
    the TRAINING graph. Same approximation argument as the eval cut: the
    output (and hence loss/grads) differs only through the stage-1..3 av
    gates' time-means — assert the same param tree and a small bounded
    train-mode output delta. The learning-equivalence gate is the overfit
    study (scripts/ab_train_sdf.py --overfit, docs/PERF.md round 5)."""
    import dataclasses

    # zero the stochastic regularizers so the only train-mode delta is the
    # gate means (DropPath/Dropout masks are shape-dependent and would
    # otherwise differ between the 9f and 5f graphs by construction)
    cfg0 = dataclasses.replace(
        SalUNetConfig(),
        skip_dead_frames_train=False,
        drop_path_rate=(0.0, 0.0, 0.0, 0.0),
        dropout=0.0,
    )
    cfg1 = dataclasses.replace(cfg0, skip_dead_frames_train=True)
    m0, m1 = SalUNet(cfg0), SalUNet(cfg1)
    rng = np.random.RandomState(7)
    feats = _vis_pyramid(B=1, T=8)
    audio = jnp.asarray(rng.randn(1, 9, 7, 12, 512).astype(np.float32))
    x_t = jnp.asarray(rng.randn(1, 224, 384, 1).astype(np.float32))
    t = jnp.asarray([3.0])
    v0 = m0.init(jax.random.PRNGKey(0), x_t, t, feats, audio)
    v1 = m1.init(jax.random.PRNGKey(0), x_t, t, feats, audio)
    assert jax.tree_util.tree_structure(v0) == jax.tree_util.tree_structure(
        v1
    )
    kw = dict(mutable=["batch_stats"], rngs={"dropout": jax.random.PRNGKey(1)})
    y0, _ = m0.apply(v0, x_t, t, feats, audio, True, **kw)
    y1, _ = m1.apply(v0, x_t, t, feats, audio, True, **kw)
    y0, y1 = np.asarray(y0), np.asarray(y1)
    d = np.abs(y1 - y0).max()
    s = np.abs(y0).max()
    assert d > 0  # the gate path really changed
    assert d < 0.05 * max(s, 1.0), (d, s)
    # random-init decoder outputs are near-constant (std ~3% of max), so
    # correlation is ill-conditioned here — a 0.005 absolute delta costs
    # ~0.003 of cc. Bound it loosely; the real learning-equivalence gate
    # is the 300-step overfit study (scripts/ab_train_sdf.py --overfit,
    # docs/PERF.md round 5), which compares trained models end to end.
    cc = np.corrcoef(y0.ravel(), y1.ravel())[0, 1]
    assert cc > 0.99, cc


def test_conv_bn_relu_head_lowres_matches_stock():
    """ConvBNRelu(head_lowres=True) at eval — the BN running-stats fold +
    conv-at-low-res lowering (models/layers.py) — matches the stock
    resize_sum + conv + BN(running stats) + relu path on random params AND
    random batch_stats. The ops-level functions are equality-tested in
    tests/test_ops.py; this covers the module's folding arithmetic
    (ADVICE r4)."""
    import flax

    from diff_sal_tpu.models.layers import ConvBNRelu

    rng = np.random.RandomState(11)
    C, O = 64, 32
    out_hw = (16, 24)
    tasks = [
        jnp.asarray(rng.randn(2, h, w, C).astype(np.float32)) * 0.5
        for (h, w) in [(2, 3), (4, 6), (8, 12), (16, 24)]
    ]
    m0 = ConvBNRelu(features=O)
    m1 = ConvBNRelu(features=O, head_lowres=True)
    v = flax.core.unfreeze(
        m0.init(jax.random.PRNGKey(0), tasks=tasks, out_hw=out_hw)
    )
    # randomize every parameter and the running stats so the eval-time
    # fold (a = scale*rsqrt(var+eps), b = (cbias-mean)*a + bbias) is
    # actually exercised off the init defaults (scale=1, mean=0, var=1)
    v = jax.tree.map(
        lambda x: jnp.asarray(rng.randn(*x.shape).astype(np.float32)) * 0.2,
        v,
    )
    v["batch_stats"]["bn"]["var"] = (
        jnp.abs(v["batch_stats"]["bn"]["var"]) + 0.5
    )
    y0 = m0.apply(v, tasks=tasks, out_hw=out_hw, train=False)
    y1 = m1.apply(v, tasks=tasks, out_hw=out_hw, train=False)
    assert y0.shape == (2, *out_hw, O)
    np.testing.assert_allclose(
        np.asarray(y1), np.asarray(y0), atol=2e-4
    )


@pytest.mark.slow
def test_conv_wg_dots_module_grads_match():
    """SalUNetConfig.conv_wg_dots: UpEmbed and ConvBNRelu with the
    dot-reformulated weight-grad produce the SAME forward values and the
    SAME parameter gradients (float-associativity tolerance) as the stock
    nn.Conv path, with an identical param tree (ops/convgrad.py)."""
    from diff_sal_tpu.models.layers import ConvBNRelu
    from diff_sal_tpu.models.sal_unet import UpEmbed

    rng = np.random.RandomState(3)

    # --- UpEmbed (dilated 3x3 pair, no bias) ---
    x = jnp.asarray(rng.randn(1, 2, 8, 12, 16).astype(np.float32)) * 0.5
    m0 = UpEmbed(embed_dim=16)
    m1 = UpEmbed(embed_dim=16, wg_dots=True)
    v = m0.init(jax.random.PRNGKey(0), x, train=True)
    assert jax.tree_util.tree_structure(
        m1.init(jax.random.PRNGKey(0), x, train=True)
    ) == jax.tree_util.tree_structure(v)

    def loss(m):
        def f(params):
            y, _ = m.apply(
                {"params": params, "batch_stats": v["batch_stats"]},
                x, train=True, mutable=["batch_stats"],
            )
            return jnp.sum(y**2)

        return f

    y0 = m0.apply(v, x)
    y1 = m1.apply(v, x)
    np.testing.assert_array_equal(np.asarray(y0), np.asarray(y1))
    g0 = jax.grad(loss(m0))(v["params"])
    g1 = jax.grad(loss(m1))(v["params"])
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=2e-4, rtol=1e-4
        )

    # --- ConvBNRelu (3x3 pad-1 with bias, tasks path) ---
    tasks = [
        jnp.asarray(rng.randn(2, h, w, 16).astype(np.float32)) * 0.5
        for (h, w) in [(4, 6), (8, 12)]
    ]
    c0 = ConvBNRelu(features=8)
    c1 = ConvBNRelu(features=8, wg_dots=True)
    vc = c0.init(jax.random.PRNGKey(1), tasks=tasks, out_hw=(8, 12))

    def closs(m):
        def f(params):
            y, _ = m.apply(
                {"params": params, "batch_stats": vc["batch_stats"]},
                tasks=tasks, out_hw=(8, 12), train=True,
                mutable=["batch_stats"],
            )
            return jnp.sum(y**2)

        return f

    np.testing.assert_array_equal(
        np.asarray(c0.apply(vc, tasks=tasks, out_hw=(8, 12))),
        np.asarray(c1.apply(vc, tasks=tasks, out_hw=(8, 12))),
    )
    gc0 = jax.grad(closs(c0))(vc["params"])
    gc1 = jax.grad(closs(c1))(vc["params"])
    for a, b in zip(jax.tree.leaves(gc0), jax.tree.leaves(gc1)):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=2e-4, rtol=1e-4
        )
