"""Block-level numerical parity: flax modules vs torch modules built to the
reference architecture, with weights converted through
`diff_sal_tpu.train.convert` layout rules.

This is the strongest parity evidence available without the released
checkpoints (Google-Drive, not fetchable offline): every weight-layout rule
and every intricate block (DDPM ResnetBlock, UpEmbed dilated convs + BN,
CvT cross-attention with its Conv3d-on-T=1 projections and full-dim scale,
VGGish trunk, AudioAttnNet transformer) is validated end-to-end numerically.
"""

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from diff_sal_tpu.train import convert as cv

torch.manual_seed(0)


def j2n(x):
    return np.asarray(x)


def t2n(x):
    return x.detach().numpy()


# ---------------------------------------------------------------------------
# elementary layout rules
# ---------------------------------------------------------------------------


def test_linear_rule():
    lin = nn.Linear(5, 7)
    x = torch.randn(3, 5)
    ours = j2n(
        jnp.asarray(x.numpy()) @ jnp.asarray(cv.linear_kernel(lin.weight))
        + jnp.asarray(cv._np(lin.bias))
    )
    np.testing.assert_allclose(ours, t2n(lin(x)), atol=1e-5)


def test_conv2d_rule():
    import flax.linen as fnn

    conv = nn.Conv2d(3, 8, 3, padding=1)
    x = torch.randn(2, 3, 10, 12)
    m = fnn.Conv(8, (3, 3), padding=1)
    variables = {
        "params": {
            "kernel": jnp.asarray(cv.conv2d_kernel(conv.weight)),
            "bias": jnp.asarray(cv._np(conv.bias)),
        }
    }
    ours = m.apply(variables, jnp.asarray(x.permute(0, 2, 3, 1).numpy()))
    ref = conv(x).permute(0, 2, 3, 1)
    np.testing.assert_allclose(j2n(ours), t2n(ref), atol=1e-4)


def test_conv3d_rule():
    import flax.linen as fnn

    conv = nn.Conv3d(3, 6, (3, 7, 7), stride=(2, 4, 4), padding=(1, 3, 3))
    x = torch.randn(1, 3, 8, 16, 20)
    m = fnn.Conv(6, (3, 7, 7), strides=(2, 4, 4), padding=[(1, 1), (3, 3), (3, 3)])
    variables = {
        "params": {
            "kernel": jnp.asarray(cv.conv3d_kernel(conv.weight)),
            "bias": jnp.asarray(cv._np(conv.bias)),
        }
    }
    ours = m.apply(variables, jnp.asarray(x.permute(0, 2, 3, 4, 1).numpy()))
    ref = conv(x).permute(0, 2, 3, 4, 1)
    np.testing.assert_allclose(j2n(ours), t2n(ref), atol=1e-4)


def test_depthwise_conv3d_center_slice_equivalence():
    """Conv3d k=(3,3,3) pad 1 depthwise on a T=1 input == 2D conv with the
    central temporal kernel slice (the decoder q-projection case)."""
    C = 6
    conv = nn.Conv3d(C, C, 3, padding=1, groups=C, bias=False)
    x = torch.randn(2, C, 1, 7, 12)
    ref = conv(x)  # (2, C, 1, 7, 12)

    import flax.linen as fnn

    m = fnn.Conv(C, (3, 3), padding=1, feature_group_count=C, use_bias=False)
    variables = {
        "params": {
            "kernel": jnp.asarray(cv.depthwise_conv3d_center_slice_to_2d(conv.weight))
        }
    }
    ours = m.apply(variables, jnp.asarray(x[:, :, 0].permute(0, 2, 3, 1).numpy()))
    np.testing.assert_allclose(
        j2n(ours), t2n(ref[:, :, 0].permute(0, 2, 3, 1)), atol=1e-5
    )


# ---------------------------------------------------------------------------
# DDPM ResnetBlock
# ---------------------------------------------------------------------------


class TorchResnetBlock(nn.Module):
    """Reference sal_unet.py:87-142 architecture."""

    def __init__(self, cin, cout, temb_ch=384):
        super().__init__()
        self.norm1 = nn.GroupNorm(32, cin, eps=1e-6)
        self.conv1 = nn.Conv2d(cin, cout, 3, padding=1)
        self.temb_proj = nn.Linear(temb_ch, cout)
        self.norm2 = nn.GroupNorm(32, cout, eps=1e-6)
        self.conv2 = nn.Conv2d(cout, cout, 3, padding=1)
        self.nin = nn.Conv2d(cin, cout, 1) if cin != cout else None

    def forward(self, x, temb):
        h = F.silu(self.norm1(x))
        h = self.conv1(h)
        h = h + self.temb_proj(F.silu(temb))[:, :, None, None]
        h = F.silu(self.norm2(h))
        h = self.conv2(h)
        if self.nin is not None:
            x = self.nin(x)
        return x + h


def test_resnet_block_parity():
    from diff_sal_tpu.models.sal_unet import ResnetBlock

    tm = TorchResnetBlock(64, 96)
    x = torch.randn(2, 64, 14, 24)
    temb = torch.randn(2, 384)
    ref = tm(x, temb)

    params = {
        "norm1": {"scale": cv._np(tm.norm1.weight), "bias": cv._np(tm.norm1.bias)},
        "conv1": {
            "kernel": cv.conv2d_kernel(tm.conv1.weight),
            "bias": cv._np(tm.conv1.bias),
        },
        "temb_proj": {
            "kernel": cv.linear_kernel(tm.temb_proj.weight),
            "bias": cv._np(tm.temb_proj.bias),
        },
        "norm2": {"scale": cv._np(tm.norm2.weight), "bias": cv._np(tm.norm2.bias)},
        "conv2": {
            "kernel": cv.conv2d_kernel(tm.conv2.weight),
            "bias": cv._np(tm.conv2.bias),
        },
        "nin_shortcut": {
            "kernel": cv.conv2d_kernel(tm.nin.weight),
            "bias": cv._np(tm.nin.bias),
        },
    }
    m = ResnetBlock(96)
    ours = m.apply(
        {"params": jax.tree.map(jnp.asarray, params)},
        jnp.asarray(x.permute(0, 2, 3, 1).numpy()),
        jnp.asarray(temb.numpy()),
    )
    np.testing.assert_allclose(
        j2n(ours), t2n(ref.permute(0, 2, 3, 1)), atol=2e-4
    )


# ---------------------------------------------------------------------------
# UpEmbed (bilinear 2x + dilated convs + BN eval)
# ---------------------------------------------------------------------------


class TorchUpEmbed(nn.Module):
    """Reference common_block.py:176-223, up_or_down='up'."""

    def __init__(self, cin, cout):
        super().__init__()
        self.up = nn.Upsample(scale_factor=2, mode="bilinear", align_corners=False)
        self.c1 = nn.Conv2d(cin, cout, 3, padding=2, dilation=2, bias=False)
        self.b1 = nn.BatchNorm2d(cout)
        self.c2 = nn.Conv2d(cout, cout, 3, padding=2, dilation=2, bias=False)
        self.b2 = nn.BatchNorm2d(cout)

    def forward(self, x):
        x = self.up(x)
        x = F.relu(self.b1(self.c1(x)))
        x = F.relu(self.b2(self.c2(x)))
        return x


def test_upembed_parity_eval_mode():
    from diff_sal_tpu.models.sal_unet import UpEmbed

    tm = TorchUpEmbed(32, 16).eval()
    # randomize BN stats so eval mode is actually exercised
    tm.b1.running_mean.normal_()
    tm.b1.running_var.uniform_(0.5, 2.0)
    tm.b2.running_mean.normal_()
    tm.b2.running_var.uniform_(0.5, 2.0)
    x = torch.randn(2, 32, 7, 12)
    with torch.no_grad():
        ref = tm(x)

    variables = {
        "params": {
            "conv0": {"kernel": jnp.asarray(cv.conv2d_kernel(tm.c1.weight))},
            "bn0": {"scale": jnp.asarray(cv._np(tm.b1.weight)),
                    "bias": jnp.asarray(cv._np(tm.b1.bias))},
            "conv1": {"kernel": jnp.asarray(cv.conv2d_kernel(tm.c2.weight))},
            "bn1": {"scale": jnp.asarray(cv._np(tm.b2.weight)),
                    "bias": jnp.asarray(cv._np(tm.b2.bias))},
        },
        "batch_stats": {
            "bn0": {"mean": jnp.asarray(cv._np(tm.b1.running_mean)),
                    "var": jnp.asarray(cv._np(tm.b1.running_var))},
            "bn1": {"mean": jnp.asarray(cv._np(tm.b2.running_mean)),
                    "var": jnp.asarray(cv._np(tm.b2.running_var))},
        },
    }
    m = UpEmbed(16)
    # our UpEmbed takes (B, T, H, W, C)
    ours = m.apply(
        variables, jnp.asarray(x.permute(0, 2, 3, 1).numpy())[:, None]
    )[:, 0]
    np.testing.assert_allclose(j2n(ours), t2n(ref.permute(0, 2, 3, 1)), atol=2e-4)


# ---------------------------------------------------------------------------
# CvT cross-attention
# ---------------------------------------------------------------------------


class TorchCvTAttention(nn.Module):
    """Reference saliency_decoder/attention.py:9-113 with fea_no=1."""

    def __init__(self, dim, heads, k_kv, s_kv):
        super().__init__()
        self.dim = dim
        self.heads = heads
        self.scale = dim**-0.5
        self.conv_q = nn.Conv3d(dim, dim, 3, padding=1, stride=1, bias=False,
                                groups=dim)
        self.norm_q = nn.LayerNorm(dim)
        self.conv_k = nn.Conv3d(dim, dim, (1, k_kv, k_kv), padding=0,
                                stride=(1, s_kv, s_kv), bias=False, groups=dim)
        self.norm_k = nn.LayerNorm(dim)
        self.conv_v = nn.Conv3d(dim, dim, (1, k_kv, k_kv), padding=0,
                                stride=(1, s_kv, s_kv), bias=False, groups=dim)
        self.norm_v = nn.LayerNorm(dim)
        self.proj_q = nn.Linear(dim, dim, bias=True)
        self.proj_k = nn.Linear(dim, dim, bias=True)
        self.proj_v = nn.Linear(dim, dim, bias=True)
        self.proj = nn.Linear(dim, dim)

    def _tokens(self, conv, norm, x):
        y = conv(x)  # (B, C, 1, h, w)
        y = y.flatten(2).transpose(1, 2)  # (B, thw, C)
        return norm(y)

    def forward(self, x_tokens, h, w, audio_tokens=None):
        B, N, C = x_tokens.shape
        x = x_tokens.transpose(1, 2).reshape(B, C, 1, h, w)
        if audio_tokens is not None:
            a = audio_tokens.transpose(1, 2).reshape(B, C, 1, h, w)
            k = self._tokens(self.conv_k, self.norm_k, a)
        else:
            k = self._tokens(self.conv_k, self.norm_k, x)
        q = self._tokens(self.conv_q, self.norm_q, x)
        v = self._tokens(self.conv_v, self.norm_v, x)

        def heads(t):
            return t.reshape(B, -1, self.heads, C // self.heads).permute(
                0, 2, 1, 3
            )

        q = heads(self.proj_q(q))
        k = heads(self.proj_k(k))
        v = heads(self.proj_v(v))
        attn = torch.einsum("bhlk,bhtk->bhlt", q, k) * self.scale
        attn = attn.softmax(-1)
        out = torch.einsum("bhlt,bhtv->bhlv", attn, v)
        out = out.permute(0, 2, 1, 3).reshape(B, -1, C)
        return self.proj(out)


@pytest.mark.parametrize("with_audio", [False, True])
def test_cvt_attention_parity(with_audio):
    from diff_sal_tpu.models.sal_unet import CvTAttention

    C, heads, k_kv = 32, 2, 2
    h, w = 7, 12
    tm = TorchCvTAttention(C, heads, k_kv, k_kv)
    x = torch.randn(3, h * w, C)
    audio = torch.randn(3, h * w, C) if with_audio else None
    with torch.no_grad():
        ref = tm(x, h, w, audio)

    params = {
        "conv_proj_q": {
            "kernel": cv.depthwise_conv3d_center_slice_to_2d(tm.conv_q.weight)
        },
        "norm_q": {"scale": cv._np(tm.norm_q.weight), "bias": cv._np(tm.norm_q.bias)},
        "conv_proj_k": {
            "kernel": cv.depthwise_conv3d_center_slice_to_2d(tm.conv_k.weight)
        },
        "norm_k": {"scale": cv._np(tm.norm_k.weight), "bias": cv._np(tm.norm_k.bias)},
        "conv_proj_v": {
            "kernel": cv.depthwise_conv3d_center_slice_to_2d(tm.conv_v.weight)
        },
        "norm_v": {"scale": cv._np(tm.norm_v.weight), "bias": cv._np(tm.norm_v.bias)},
        "proj_q": {"kernel": cv.linear_kernel(tm.proj_q.weight),
                   "bias": cv._np(tm.proj_q.bias)},
        "proj_k": {"kernel": cv.linear_kernel(tm.proj_k.weight),
                   "bias": cv._np(tm.proj_k.bias)},
        "proj_v": {"kernel": cv.linear_kernel(tm.proj_v.weight),
                   "bias": cv._np(tm.proj_v.bias)},
        "proj": {"kernel": cv.linear_kernel(tm.proj.weight),
                 "bias": cv._np(tm.proj.bias)},
    }
    m = CvTAttention(num_heads=heads, kernel_kv=k_kv, stride_kv=k_kv)
    ours = m.apply(
        {"params": jax.tree.map(jnp.asarray, params)},
        jnp.asarray(x.numpy()),
        (h, w),
        jnp.asarray(audio.numpy()) if with_audio else None,
    )
    np.testing.assert_allclose(j2n(ours), t2n(ref), atol=2e-4)


# ---------------------------------------------------------------------------
# VGGish trunk
# ---------------------------------------------------------------------------


def test_vggish_features_parity():
    from diff_sal_tpu.config import VGGishConfig
    from diff_sal_tpu.models.vggish import VGGishFeatures

    layers = []
    cin = 1
    for v in [64, "M", 128, "M", 256, 256, "M", 512, 512, "M"]:
        if v == "M":
            layers.append(nn.MaxPool2d(2, 2))
        else:
            layers.append(nn.Conv2d(cin, v, 3, padding=1))
            layers.append(nn.ReLU(inplace=True))
            cin = v
    tm = nn.Sequential(*layers).eval()
    x = torch.randn(1, 1, 112, 192) * 0.3
    with torch.no_grad():
        ref = tm(x)
    assert ref.shape == (1, 512, 7, 12)

    sd = {f"features.{i}.weight": m.weight for i, m in enumerate(layers)
          if isinstance(m, nn.Conv2d)}
    sd.update({f"features.{i}.bias": m.bias for i, m in enumerate(layers)
               if isinstance(m, nn.Conv2d)})
    variables = cv.convert_vggish(sd)
    m = VGGishFeatures(VGGishConfig())
    # convert_vggish targets the full VGGish module (features subscope);
    # applying the trunk directly unwraps one level
    ours = m.apply(
        jax.tree.map(jnp.asarray, {"params": variables["params"]["features"]}),
        jnp.asarray(x.permute(0, 2, 3, 1).numpy()),
    )
    np.testing.assert_allclose(
        j2n(ours), t2n(ref.permute(0, 2, 3, 1)), atol=1e-3
    )


# ---------------------------------------------------------------------------
# AudioAttnNet transformer
# ---------------------------------------------------------------------------


class TorchAudioTransformer(nn.Module):
    """Reference audio_attention.py:30-90 effective path (dim 512, 1 layer)."""

    def __init__(self, dim=64, heads=2, dim_head=16, mlp_dim=32):
        super().__init__()
        inner = heads * dim_head
        self.heads = heads
        self.scale = dim_head**-0.5
        self.attn_norm = nn.LayerNorm(dim)
        self.to_qkv = nn.Linear(dim, inner * 3, bias=False)
        self.to_out = nn.Linear(inner, dim)
        self.ff_norm = nn.LayerNorm(dim)
        self.ff1 = nn.Linear(dim, mlp_dim)
        self.ff2 = nn.Linear(mlp_dim, dim)
        self.final = nn.LayerNorm(dim)

    def forward(self, x):
        h = self.attn_norm(x)
        qkv = self.to_qkv(h).chunk(3, dim=-1)
        q, k, v = (
            t.reshape(x.shape[0], -1, self.heads, t.shape[-1] // self.heads)
            .permute(0, 2, 1, 3)
            for t in qkv
        )
        dots = q @ k.transpose(-1, -2) * self.scale
        out = dots.softmax(-1) @ v
        out = out.permute(0, 2, 1, 3).reshape(x.shape[0], -1, self.to_out.in_features)
        x = self.to_out(out) + x
        h = self.ff_norm(x)
        x = self.ff2(F.gelu(self.ff1(h))) + x
        return self.final(x)


def test_audio_attn_parity():
    from diff_sal_tpu.config import AudioAttnConfig
    from diff_sal_tpu.models.audio_attention import AudioAttnNet

    tm = TorchAudioTransformer()
    x = torch.randn(2, 9 * 2 * 3, 64)
    with torch.no_grad():
        ref = tm(x)

    sd = {
        "transformer.layers.0.0.norm.weight": tm.attn_norm.weight,
        "transformer.layers.0.0.norm.bias": tm.attn_norm.bias,
        "transformer.layers.0.0.to_qkv.weight": tm.to_qkv.weight,
        "transformer.layers.0.0.to_out.0.weight": tm.to_out.weight,
        "transformer.layers.0.0.to_out.0.bias": tm.to_out.bias,
        "transformer.layers.0.1.net.0.weight": tm.ff_norm.weight,
        "transformer.layers.0.1.net.0.bias": tm.ff_norm.bias,
        "transformer.layers.0.1.net.1.weight": tm.ff1.weight,
        "transformer.layers.0.1.net.1.bias": tm.ff1.bias,
        "transformer.layers.0.1.net.4.weight": tm.ff2.weight,
        "transformer.layers.0.1.net.4.bias": tm.ff2.bias,
        "transformer.norm.weight": tm.final.weight,
        "transformer.norm.bias": tm.final.bias,
    }
    variables = cv.convert_audio_attn(sd)
    cfg = AudioAttnConfig(dim=64, heads=2, dim_head=16, mlp_dim=32, depth=1)
    m = AudioAttnNet(cfg)
    ours = m.apply(
        jax.tree.map(jnp.asarray, variables),
        jnp.asarray(x.numpy()).reshape(2, 9, 2, 3, 64),
    )
    np.testing.assert_allclose(
        j2n(ours).reshape(2, -1, 64), t2n(ref), atol=2e-4
    )


# ---------------------------------------------------------------------------
# MViT pooled multi-scale attention with decomposed rel-pos
# ---------------------------------------------------------------------------


from test_ops import _torch_resize_rel_pos  # noqa: E402


class TorchMultiScaleAttention(nn.Module):
    """Reference mvit.py:497-650 semantics: fused qkv, per-head depthwise
    Conv3d pooling + LN, decomposed rel-pos bias, residual pooling, proj."""

    def __init__(self, in_dims, out_dims, heads, stride_q, stride_kv,
                 rel_dims, with_cls=True):
        super().__init__()
        self.heads = heads
        self.out_dims = out_dims
        self.head_dim = out_dims // heads
        self.with_cls = with_cls
        self.stride_q, self.stride_kv = stride_q, stride_kv
        self.qkv = nn.Linear(in_dims, out_dims * 3, bias=True)
        self.proj = nn.Linear(out_dims, out_dims)
        hd = self.head_dim

        def pool():
            return nn.Conv3d(hd, hd, 3, stride=1, padding=1, groups=hd,
                             bias=False)

        self.pool_q, self.pool_k, self.pool_v = pool(), pool(), pool()
        self.pool_q.stride = stride_q
        self.pool_k.stride = stride_kv
        self.pool_v.stride = stride_kv
        self.norm_q = nn.LayerNorm(hd, eps=1e-6)
        self.norm_k = nn.LayerNorm(hd, eps=1e-6)
        self.norm_v = nn.LayerNorm(hd, eps=1e-6)
        t_len, hw_len = rel_dims
        self.rel_pos_t = nn.Parameter(torch.randn(t_len, hd) * 0.02)
        self.rel_pos_h = nn.Parameter(torch.randn(hw_len, hd) * 0.02)
        self.rel_pos_w = nn.Parameter(torch.randn(hw_len, hd) * 0.02)

    def _pool(self, x, conv, norm, in_size):
        B, H, L, C = x.shape
        T, Hh, Ww = in_size
        cls, tok = x[:, :, :1], x[:, :, 1:]
        tok = tok.reshape(B * H, T, Hh, Ww, C).permute(0, 4, 1, 2, 3)
        tok = conv(tok)
        out_size = tok.shape[2:]
        tok = tok.reshape(B, H, C, -1).transpose(2, 3)
        out = torch.cat([cls, tok], dim=2)
        return norm(out), tuple(out_size)

    def forward(self, x, in_size):
        B, N, _ = x.shape
        qkv = self.qkv(x).reshape(B, N, 3, self.heads, self.head_dim)
        q, k, v = qkv.permute(2, 0, 3, 1, 4).unbind(0)
        q, q_shape = self._pool(q, self.pool_q, self.norm_q, in_size)
        k, k_shape = self._pool(k, self.pool_k, self.norm_k, in_size)
        v, _ = self._pool(v, self.pool_v, self.norm_v, in_size)

        attn = (q * self.head_dim**-0.5) @ k.transpose(-2, -1)

        # decomposed rel pos (reference mvit.py:369-401)
        Rt = _torch_resize_rel_pos(self.rel_pos_t, q_shape[0], k_shape[0])
        Rh = _torch_resize_rel_pos(self.rel_pos_h, q_shape[1], k_shape[1])
        Rw = _torch_resize_rel_pos(self.rel_pos_w, q_shape[2], k_shape[2])
        qt, qh, qw = q_shape
        kt, kh, kw = k_shape
        r_q = q[:, :, 1:].reshape(B, self.heads, qt, qh, qw, self.head_dim)
        rel_t = torch.einsum("bythwc,tkc->bythwk", r_q, Rt)
        rel_h = torch.einsum("bythwc,hkc->bythwk", r_q, Rh)
        rel_w = torch.einsum("bythwc,wkc->bythwk", r_q, Rw)
        bias = (
            rel_t[..., :, None, None]
            + rel_h[..., None, :, None]
            + rel_w[..., None, None, :]
        ).reshape(B, self.heads, qt * qh * qw, kt * kh * kw)
        attn[:, :, 1:, 1:] = attn[:, :, 1:, 1:] + bias

        attn = attn.softmax(-1)
        out = attn @ v
        out[:, :, 1:] = out[:, :, 1:] + q[:, :, 1:]
        out = out.transpose(1, 2).reshape(B, -1, self.out_dims)
        return self.proj(out)


def test_mvit_attention_parity():
    from diff_sal_tpu.models.mvit import MultiScaleAttention

    in_dims, out_dims, heads = 24, 48, 2
    in_size = (4, 8, 8)
    rel_dims = (2 * 4 - 1, 2 * 8 - 1)
    tm = TorchMultiScaleAttention(in_dims, out_dims, heads, (1, 1, 1),
                                  (1, 2, 2), rel_dims)
    N = 1 + 4 * 8 * 8
    x = torch.randn(2, N, in_dims)
    with torch.no_grad():
        ref = tm(x.clone(), in_size)

    params = {
        "qkv": {"kernel": cv.linear_kernel(tm.qkv.weight),
                "bias": cv._np(tm.qkv.bias)},
        "proj": {"kernel": cv.linear_kernel(tm.proj.weight),
                 "bias": cv._np(tm.proj.bias)},
        "pool_q": {
            "pool": {"kernel": cv.depthwise_conv3d_kernel(tm.pool_q.weight)},
            "norm": {"scale": cv._np(tm.norm_q.weight),
                     "bias": cv._np(tm.norm_q.bias)},
        },
        "pool_k": {
            "pool": {"kernel": cv.depthwise_conv3d_kernel(tm.pool_k.weight)},
            "norm": {"scale": cv._np(tm.norm_k.weight),
                     "bias": cv._np(tm.norm_k.bias)},
        },
        "pool_v": {
            "pool": {"kernel": cv.depthwise_conv3d_kernel(tm.pool_v.weight)},
            "norm": {"scale": cv._np(tm.norm_v.weight),
                     "bias": cv._np(tm.norm_v.bias)},
        },
        "attn" if False else "rel_pos_t": cv._np(tm.rel_pos_t),
        "rel_pos_h": cv._np(tm.rel_pos_h),
        "rel_pos_w": cv._np(tm.rel_pos_w),
    }
    m = MultiScaleAttention(
        out_dims=out_dims, num_heads=heads, stride_q=(1, 1, 1),
        stride_kv=(1, 2, 2), rel_pos_dims=rel_dims,
    )
    ours, _ = m.apply(
        {"params": jax.tree.map(jnp.asarray, params)},
        jnp.asarray(x.numpy()),
        in_size,
    )
    np.testing.assert_allclose(j2n(ours), t2n(ref), atol=5e-4)
