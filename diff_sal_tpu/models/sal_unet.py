"""Saliency-UNet diffusion decoder, TPU-native (flax.linen, channel-last).

Re-implements the behavior of the reference decoder stack
(`models/saliency_decoder/sal_unet.py`, `transformer.py`, `attention.py`,
`common_block.py`) — noise-pyramid encoder, four CvT-style transformer stages
with audio-video gated cross-attention, temporal reduction, multi-scale sum,
and sigmoid head — as pure functional modules over channel-last arrays
(B, T, H, W, C).

Shape contract (AV config, reference §3.5 of SURVEY.md):
  x_t (B, 224, 384, 1), t (B,),
  feat_list  [(B,8,7,12,768), (B,8,14,24,384), (B,8,28,48,192), (B,8,56,96,96)]
  audio_feat (B, 9, 7, 12, 512) or None
  -> pred (B, 224, 384, 1) in (0, 1)

Replicated behavioral quirks (see SURVEY.md §8; each is load-bearing for
checkpoint parity):
  * attention scale is full-dim**-0.5, not head-dim (attention.py:33)
  * only stages 1 and 2 receive backbone skip-adds; stage 3 (and the finest
    video scale back_fea[3]) is never used (transformer.py:265-270)
  * ReduceTemp kernel/stride 5 over 9 frames keeps frames 0-4 only
    (common_block.py:150-173 with temporal_list=[5,5,5,5])
  * the audio-gating reshape mixes (C, T) axes exactly like torch's
    .view(b*t, h*w, c) on a (b,c,t,h,w) tensor (transformer.py:146)
"""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from diff_sal_tpu.config import SalUNetConfig
from diff_sal_tpu.models.layers import (
    ConvBNRelu,
    DropPath,
    FusedLayerNorm,
    MLPHead,
    Mlp,
    gelu_exact,
    gelu_tanh,
    salunet_init,
    timestep_embedding,
)
from diff_sal_tpu.ops.resize import bilinear_resize, nearest_upsample


class TimestepMLP(nn.Module):
    """temb: sinusoid(ch) -> Dense(4ch) -> swish -> Dense(4ch)
    (reference sal_unet.py:230-237, 304-307)."""

    ch: int = 96

    @nn.compact
    def __call__(self, t: jnp.ndarray) -> jnp.ndarray:
        emb = timestep_embedding(t, self.ch)
        emb = nn.Dense(self.ch * 4, kernel_init=salunet_init, name="dense0")(emb)
        emb = jax.nn.silu(emb)
        emb = nn.Dense(self.ch * 4, kernel_init=salunet_init, name="dense1")(emb)
        return emb


class ResnetBlock(nn.Module):
    """DDPM resnet block with timestep conditioning
    (reference sal_unet.py:87-142): GN-swish-conv, +temb, GN-swish-drop-conv,
    1x1 shortcut on channel change."""

    out_channels: int
    dropout: float = 0.1
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, temb, train: bool = False):
        in_ch = x.shape[-1]
        h = nn.GroupNorm(num_groups=32, epsilon=1e-6, dtype=self.dtype,
                         name="norm1")(x)
        h = jax.nn.silu(h)
        h = nn.Conv(
            self.out_channels, (3, 3), padding=1, kernel_init=salunet_init,
            dtype=self.dtype, name="conv1",
        )(h)
        h = h + nn.Dense(
            self.out_channels, kernel_init=salunet_init, dtype=self.dtype,
            name="temb_proj",
        )(jax.nn.silu(temb))[:, None, None, :].astype(h.dtype)
        h = nn.GroupNorm(num_groups=32, epsilon=1e-6, dtype=self.dtype,
                         name="norm2")(h)
        h = jax.nn.silu(h)
        h = nn.Dropout(self.dropout)(h, deterministic=not train)
        h = nn.Conv(
            self.out_channels, (3, 3), padding=1, kernel_init=salunet_init,
            dtype=self.dtype, name="conv2",
        )(h)
        if in_ch != self.out_channels:
            x = nn.Conv(
                self.out_channels, (1, 1), kernel_init=salunet_init,
                dtype=self.dtype, name="nin_shortcut",
            )(x)
        return x + h


class Downsample(nn.Module):
    """Conv stride-2 downsample with the DDPM asymmetric (0,1)x(0,1) pad
    (reference sal_unet.py:47-64)."""

    stride: int = 2
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        return nn.Conv(
            x.shape[-1],
            (3, 3),
            strides=self.stride,
            padding=((0, 1), (0, 1)),
            kernel_init=salunet_init,
            dtype=self.dtype,
            name="conv",
        )(x)


class NoiseEncoder(nn.Module):
    """x_t -> noisy feature pyramid, coarse-first
    (reference `noise_downsample`, sal_unet.py:240-300).

    (B,224,384,1) -> [(B,1,7,12,768), (B,1,14,24,384), (B,1,28,48,192)]
    """

    ch: int = 96
    out_channels: Sequence[int] = (192, 384, 768)
    dropout: float = 0.1
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, temb, train: bool = False) -> List[jnp.ndarray]:
        h = nn.Conv(
            self.ch, (3, 3), padding=1, kernel_init=salunet_init,
            dtype=self.dtype, name="conv_in",
        )(x)
        h = Downsample(stride=4, dtype=self.dtype, name="down1")(h)
        outs = []
        for i, out_c in enumerate(self.out_channels):
            h = ResnetBlock(
                out_c, dropout=self.dropout, dtype=self.dtype, name=f"res{i}"
            )(h, temb, train=train)
            h = Downsample(dtype=self.dtype, name=f"res_down{i}")(h)
            outs.append(h[:, None])  # add T=1 axis
        return outs[::-1]


class _PoolTokens(nn.Module):
    """Depthwise kernel==stride 'conv' as a reshape + f32 weighted reduce.

    Exact rewrite of nn.Conv(C, (k,k), strides=k, padding=0,
    feature_group_count=C, use_bias=False) for inputs divisible by k —
    non-overlapping windows mean every output element is an independent
    weighted window sum. Param tree/shape/init identical to the nn.Conv
    ((k, k, 1, C) 'kernel'), so checkpoints are interchangeable."""

    kernel: int
    features: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x_sp: jnp.ndarray) -> jnp.ndarray:
        k, c = self.kernel, self.features
        w = self.param("kernel", salunet_init, (k, k, 1, c))
        Bt, H, W, _ = x_sp.shape
        dt = self.dtype or x_sp.dtype
        xv = x_sp.astype(dt).reshape(Bt, H // k, k, W // k, k, c)
        wv = w.astype(dt).reshape(1, 1, k, 1, k, c)
        y = jnp.sum(xv * wv, axis=(2, 4), dtype=jnp.float32)
        return y.astype(dt)


class CvTAttention(nn.Module):
    """Cross-modal CvT attention (reference `saliency_decoder/attention.py`).

    Depthwise-conv projections with layer-norm; when audio tokens are given,
    the keys come from audio and queries/values from video — the audio-video
    fusion core (attention.py:88-95). kv projections stride the spatial grid
    ((2,4,8,16) per stage) so k/v are always 3x6=18 tokens; q keeps full
    resolution. The reference's Conv3d projections act on a T=1 grid and
    reduce exactly to 2D convs (the kernel's t-slices +-1 only see zero pad),
    which is what we build.
    """

    num_heads: int
    kernel_q: int = 3
    stride_q: int = 1
    padding_q: int = 1
    kernel_kv: int = 2
    stride_kv: int = 2
    padding_kv: int = 0
    qkv_bias: bool = True
    # kernel==stride kv projections as reshape+reduce (_PoolTokens)
    pool_reduce: bool = False
    # fused Pallas attention (ops/attention.py cvt_cross_attention); falls
    # back to the einsum path when the intermediates collection is mutable
    # (the attn introspection hook needs the materialized scores)
    fused_attn: bool = False
    dtype: Optional[jnp.dtype] = None

    def _conv_tokens(self, x_sp, kernel, stride, padding, name):
        c = x_sp.shape[-1]
        if (
            self.pool_reduce
            and kernel == stride
            and padding == 0
            and x_sp.shape[1] % kernel == 0
            and x_sp.shape[2] % kernel == 0
        ):
            # kernel==stride, pad 0 -> NON-OVERLAPPING weighted pool: a free
            # (H,W)->(H/s,s,W/s,s) reshape + f32 weighted reduce instead of
            # the conv emitter (whose batch-in-sublane layouts force
            # relayout copies on the decoder stream, docs/PERF.md round 3).
            # Identical param tree/init as the nn.Conv it replaces
            # ((k, k, 1, C) depthwise kernel, reference attention.py:35-60).
            y = _PoolTokens(
                kernel=kernel, features=c, dtype=self.dtype,
                name=f"conv_proj_{name}",
            )(x_sp)
        else:
            y = nn.Conv(
                c,
                (kernel, kernel),
                strides=stride,
                padding=padding,
                feature_group_count=c,
                use_bias=False,
                kernel_init=salunet_init,
                dtype=self.dtype,
                name=f"conv_proj_{name}",
            )(x_sp)
        y = y.reshape(y.shape[0], -1, c)
        return FusedLayerNorm(name=f"norm_{name}")(y)

    @nn.compact
    def __call__(
        self,
        tokens: jnp.ndarray,  # (Bt, H*W, C)
        hw: Tuple[int, int],
        audio_tokens: Optional[jnp.ndarray] = None,  # (Bt, H*W, C)
    ) -> jnp.ndarray:
        H, W = hw
        Bt, _, C = tokens.shape
        x_sp = tokens.reshape(Bt, H, W, C)

        q = self._conv_tokens(x_sp, self.kernel_q, self.stride_q, self.padding_q, "q")
        kv_src = (
            audio_tokens.reshape(Bt, H, W, C) if audio_tokens is not None else x_sp
        )
        k = self._conv_tokens(
            kv_src, self.kernel_kv, self.stride_kv, self.padding_kv, "k"
        )
        v = self._conv_tokens(
            x_sp, self.kernel_kv, self.stride_kv, self.padding_kv, "v"
        )

        dense = lambda n: nn.Dense(  # noqa: E731
            C, use_bias=self.qkv_bias, kernel_init=salunet_init,
            dtype=self.dtype, name=n,
        )
        hd = C // self.num_heads
        q = dense("proj_q")(q)
        k = dense("proj_k")(k)
        v = dense("proj_v")(v)

        # Reference quirk: scale by full dim, not head dim (attention.py:33).
        scale = C**-0.5
        if self.fused_attn and not self.is_mutable_collection(
            "intermediates"
        ):
            from diff_sal_tpu.ops.attention import cvt_cross_attention

            out = cvt_cross_attention(q, k, v, self.num_heads, scale)
        else:
            qh = q.reshape(Bt, -1, self.num_heads, hd)
            kh = k.reshape(Bt, -1, self.num_heads, hd)
            vh = v.reshape(Bt, -1, self.num_heads, hd)
            attn = jnp.einsum("blhd,bthd->bhlt", qh, kh) * scale
            attn = jax.nn.softmax(attn, axis=-1)
            # introspection hook mirroring the reference's messages['attn']
            # store (attention.py:103): apply with mutable=['intermediates']
            # (or capture_intermediates) to retrieve per-stage attention
            # maps; a no-op (DCE'd) otherwise.
            self.sow("intermediates", "attn", attn)
            out = jnp.einsum("bhlt,bthd->blhd", attn, vh).reshape(Bt, -1, C)
        return nn.Dense(
            C, kernel_init=salunet_init, dtype=self.dtype, name="proj"
        )(out)


def _scrambled_audio_tokens(ac: jnp.ndarray) -> jnp.ndarray:
    """Replicate torch's `(b, c, t, h, w).view(b*t, h*w, c)` on our
    channel-last audio tensor (B, T, H, W, C) — a deterministic (C, T, H, W)
    axis mix the released checkpoints were trained with
    (reference transformer.py:146)."""
    B, T, H, W, C = ac.shape
    return jnp.transpose(ac, (0, 4, 1, 2, 3)).reshape(B * T, H * W, C)


class TransformerBlock(nn.Module):
    """Gated audio-video fusion + CvT attention + MLP
    (reference transformer.py:76-159)."""

    num_heads: int
    mlp_ratio: float = 2.0
    drop_path_rate: float = 0.15
    kernel_kv: int = 2
    stride_kv: int = 2
    audio_dim: int = 512
    # kernel==stride kv projections as reshape+reduce (_PoolTokens)
    pool_reduce: bool = False
    # fused Pallas attention, eval only (no vjp) — see CvTAttention
    fused_attn: bool = False
    # fused add+norm2+MLP+add tail (ops/mlp.py), eval only — DropPath and
    # Dropout are identity when deterministic, so the tail is exactly the
    # fused composition; training keeps the module path (same param tree)
    fused_tail: bool = False
    # compute attention/MLP for only the first keep_frames frames. EXACT
    # for the LAST decoder stage: ReduceTemp's kernel/stride-5 VALID window
    # over 9 frames consumes frames 0-4 only (common_block.py:150-173
    # quirk) and nothing else reads the final stage's output, so its
    # frames 5-8 are dead compute. The av gate still sees ALL frames (it
    # averages over the full input before the cut).
    keep_frames: Optional[int] = None
    dtype: Optional[jnp.dtype] = None
    act: Callable = gelu_exact

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,  # (B, T, H, W, C) video frames
        audio: Optional[jnp.ndarray],  # (B, Ta, ha, wa, audio_dim) or None
        train: bool = False,
    ) -> jnp.ndarray:
        B, T, H, W, C = x.shape

        audio_tokens = None
        if audio is not None:
            # when an upstream dead-frame cut shortened x (see
            # skip_dead_frames_all), the audio stream follows frame-for-
            # frame; the av gate below then averages the surviving frames
            if audio.shape[1] > T:
                audio = audio[:, :T]
            ac = nn.Conv(
                C, (1, 1), kernel_init=salunet_init, dtype=self.dtype,
                name="align_conv",
            )(audio)  # (B, Ta, ha, wa, C)
            ha, wa = ac.shape[2], ac.shape[3]
            if ha != H and wa != W:
                if H // ha < 1:
                    raise ValueError(
                        f"audio grid ({ha},{wa}) must divide the video grid "
                        f"({H},{W}); use audio inputs 16x the coarsest video "
                        "scale (112x192 for 224x384 video)"
                    )
                ac = nearest_upsample(ac, H // ha, h_axis=2, w_axis=3)
            # av gate: mean over time of (audio*video), softmax over W
            # (reference transformer.py:141-145)
            av = jnp.mean(ac * x, axis=1, keepdims=True)  # (B,1,H,W,C)
            av = jax.nn.softmax(av, axis=3)
            ac = ac * av
            audio_tokens = _scrambled_audio_tokens(ac)

        if self.keep_frames is not None and self.keep_frames < T:
            T = self.keep_frames
            x = x[:, :T]
            if audio_tokens is not None:
                audio_tokens = audio_tokens.reshape(
                    B, -1, H * W, C
                )[:, :T].reshape(B * T, H * W, C)
        tokens = x.reshape(B * T, H * W, C)
        attn_in = FusedLayerNorm(name="norm")(tokens)
        attn_out = CvTAttention(
            num_heads=self.num_heads,
            kernel_kv=self.kernel_kv,
            stride_kv=self.stride_kv,
            pool_reduce=self.pool_reduce,
            fused_attn=self.fused_attn and not train,
            dtype=self.dtype,
            name="attn",
        )(attn_in, (H, W), audio_tokens)
        use_ft = (
            self.fused_tail
            and not train
            and self.act in (gelu_tanh, gelu_exact)
        )
        if use_ft:
            from diff_sal_tpu.models.mvit import _LNParams, _MlpParams
            from diff_sal_tpu.ops.mlp import fused_block_tail

            hidden = int(C * self.mlp_ratio)
            ln_scale, ln_bias = _LNParams(C, name="norm2")()
            (fc1_k, fc1_b), (fc2_k, fc2_b) = _MlpParams(
                C, hidden, C, kernel_init=salunet_init, name="mlp"
            )()
            dt = self.dtype or tokens.dtype
            out = fused_block_tail(
                tokens.reshape(-1, C), attn_out.reshape(-1, C),
                ln_scale, ln_bias, fc1_k.astype(dt), fc1_b,
                fc2_k.astype(dt), fc2_b, 1e-6,
                "tanh" if self.act is gelu_tanh else "exact", None,
            )
            return out.reshape(B, T, H, W, C)
        tokens = attn_out + tokens

        # 2D (rows, C) operands for the MLP dots: XLA:TPU windows
        # 3-free-dim dots with the batch riding the window loop (same
        # finding as MViTConfig.flat_dots, docs/PERF.md round 3)
        mlp_out = Mlp(
            hidden_features=int(C * self.mlp_ratio), act=self.act,
            dtype=self.dtype, name="mlp",
        )(
            FusedLayerNorm(name="norm2")(tokens).reshape(-1, C),
            deterministic=not train,
        ).reshape(B * T, H * W, C)
        tokens = tokens + DropPath(self.drop_path_rate, name="drop_path")(
            mlp_out, deterministic=not train
        )
        return tokens.reshape(B, T, H, W, C)


def _bilinear2x_phases(x: jnp.ndarray) -> jnp.ndarray:
    """The four polyphase components of the exact 2x bilinear upsample
    (PyTorch half-pixel, edge-clamped): u[2j]=.25x[j-1]+.75x[j],
    u[2j+1]=.75x[j]+.25x[j+1] per axis. (Bt,H,W,C) -> (Bt,2,2,H,W,C) with
    axes 1/2 = (h-parity, w-parity)."""
    lo = lambda a, ax: jnp.concatenate(  # noqa: E731  x[j-1], edge clamp
        [jax.lax.slice_in_dim(a, 0, 1, axis=ax),
         jax.lax.slice_in_dim(a, 0, a.shape[ax] - 1, axis=ax)], axis=ax)
    hi = lambda a, ax: jnp.concatenate(  # noqa: E731  x[j+1], edge clamp
        [jax.lax.slice_in_dim(a, 1, a.shape[ax], axis=ax),
         jax.lax.slice_in_dim(a, a.shape[ax] - 1, a.shape[ax], axis=ax)],
        axis=ax)
    he = 0.25 * lo(x, 1) + 0.75 * x
    ho = 0.75 * x + 0.25 * hi(x, 1)
    h2 = jnp.stack([he, ho], axis=1)  # (Bt, 2, H, W, C)
    we = 0.25 * lo(h2, 3) + 0.75 * h2
    wo = 0.75 * h2 + 0.25 * hi(h2, 3)
    return jnp.stack([we, wo], axis=2)  # (Bt, 2, 2, H, W, C)


class UpEmbed(nn.Module):
    """2x bilinear upsample + two dilated 3x3 conv-BN-ReLU, per frame
    (reference common_block.py:176-223, up_or_down='up').

    phase=True: exact polyphase rewrite. A dilation-2 tap on the
    2x-upsampled grid only ever reads samples of its own parity, so the
    whole chain (upsample -> conv -> BN -> relu -> conv -> BN -> relu)
    never mixes the four (h,w)-parity classes: each output phase is a
    plain 3x3/pad-1/dilation-1 conv (SAME weights) over the corresponding
    polyphase plane of the upsample, interleaved back at the end. BN batch
    statistics are over the identical element set, so this is exact in
    train mode too. Measured: XLA's dilated-conv emitters run at 7-24% MFU
    vs 31-38% for the dense dil-1 phase convs (scripts/micro_upembed.py,
    docs/PERF.md round 3)."""

    embed_dim: int
    patch_size: int = 3
    dilation: int = 2
    phase: bool = False
    # weight-grad-as-dots convs (SalUNetConfig.conv_wg_dots,
    # ops/convgrad.py) — forward bits identical, train-path lever
    wg_dots: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        B, T, H, W, C = x.shape
        frames = x.reshape(B * T, H, W, C)
        use_phase = self.phase and self.patch_size == 3 and self.dilation == 2
        if use_phase:
            frames = _bilinear2x_phases(frames).reshape(B * T * 4, H, W, C)
            pad, dil = 1, 1
        else:
            frames = bilinear_resize(frames, (H * 2, W * 2))
            pad, dil = self.dilation, self.dilation
        for i in range(2):
            conv = nn.Conv(
                self.embed_dim,
                (self.patch_size, self.patch_size),
                padding=pad,
                kernel_dilation=dil,
                use_bias=False,
                kernel_init=salunet_init,
                dtype=self.dtype,
                name=f"conv{i}",
            )
            if self.wg_dots and not self.is_initializing():
                from diff_sal_tpu.ops.convgrad import conv2d_wg_dots

                kernel = conv.variables["params"]["kernel"]
                dt = self.dtype or frames.dtype
                frames = conv2d_wg_dots(
                    frames.astype(dt), kernel.astype(dt),
                    (pad, pad), (dil, dil),
                )
            else:
                frames = conv(frames)
            frames = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=self.dtype, name=f"bn{i}",
            )(frames)
            frames = nn.relu(frames)
        if use_phase:
            frames = frames.reshape(B * T, 2, 2, H, W, self.embed_dim)
            frames = frames.transpose(0, 3, 1, 4, 2, 5)
        return frames.reshape(B, T, H * 2, W * 2, self.embed_dim)


class ReduceTemp(nn.Module):
    """Temporal collapse: conv kernel/stride (temporal_dim,1,1), no bias, ReLU
    (reference common_block.py:150-173). With temporal_dim=5 over 9 frames the
    valid window keeps frames 0-4 only — replicated."""

    embed_dim: int = 768
    temporal_dim: int = 5
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = nn.Conv(
            self.embed_dim,
            (self.temporal_dim, 1, 1),
            strides=(self.temporal_dim, 1, 1),
            padding="VALID",
            use_bias=False,
            kernel_init=salunet_init,
            dtype=self.dtype,
            name="conv",
        )(x)
        return nn.relu(y)


class TransformerStage(nn.Module):
    """One decoder stage (reference transformer.py:162-289): optional UpEmbed
    with backbone skip-add (stages 1, 2 only), then a TransformerBlock."""

    stage_idx: int
    embed_dim: int
    num_heads: int
    mlp_ratio: float
    drop_path_rate: float
    kernel_kv: int
    stride_kv: int
    has_patch_embed: bool
    upembed_phase: bool = False
    conv_wg_dots: bool = False
    fused_tail: bool = False
    pool_reduce: bool = False
    fused_attn: bool = False
    # frames >= keep_frames are cut before attn/MLP (see TransformerBlock);
    # last stage by default (exact), every stage with skip_dead_frames_all
    keep_frames: Optional[int] = None
    dtype: Optional[jnp.dtype] = None
    act: Callable = gelu_exact

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        back_fea: Sequence[jnp.ndarray],
        audio: Optional[jnp.ndarray],
        train: bool = False,
    ) -> jnp.ndarray:
        if self.has_patch_embed:
            x = UpEmbed(
                self.embed_dim, phase=self.upembed_phase,
                wg_dots=self.conv_wg_dots, dtype=self.dtype,
                name="patch_embed",
            )(x, train=train)
            # Reference adds backbone skips for stage 1 and 2 only
            # (transformer.py:265-270) — stage 3 gets none, so back_fea[3]
            # is dead. Stage 0 has no patch_embed at all. The skip is
            # frame-local, so when an upstream dead-frame cut shortened x
            # (skip_dead_frames_all) slicing the skip to match is exact.
            if self.stage_idx in (1, 2):
                x = x + back_fea[self.stage_idx][:, : x.shape[1]]
        x = TransformerBlock(
            num_heads=self.num_heads,
            mlp_ratio=self.mlp_ratio,
            drop_path_rate=self.drop_path_rate,
            kernel_kv=self.kernel_kv,
            stride_kv=self.stride_kv,
            pool_reduce=self.pool_reduce,
            fused_attn=self.fused_attn,
            fused_tail=self.fused_tail,
            keep_frames=self.keep_frames,
            dtype=self.dtype,
            act=self.act,
            name="block",
        )(x, audio, train=train)
        return x


class Decoder(nn.Module):
    """Multi-scale up path (reference sal_unet.py:331-491): 4 stages walking
    the pyramid coarse->fine; each stage's output is LayerNormed, temporally
    reduced to one frame at 768 channels, bilinearly upsampled to
    (112, 192) and summed; final conv-BN-ReLU to 96 channels."""

    cfg: SalUNetConfig
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self,
        back_fea: Sequence[jnp.ndarray],
        audio: Optional[jnp.ndarray],
        train: bool = False,
    ) -> jnp.ndarray:
        cfg = self.cfg
        x = back_fea[0]
        B = x.shape[0]
        h, w = x.shape[2], x.shape[3]
        n = cfg.mid_num_stages
        th, tw = h * 2 ** (n - 1) * 2, w * 2 ** (n - 1) * 2

        tasks = []
        for i in range(n):
            x = TransformerStage(
                stage_idx=i,
                embed_dim=cfg.up_channel[i],
                num_heads=cfg.num_heads[i],
                mlp_ratio=cfg.mlp_ratio[i],
                drop_path_rate=cfg.drop_path_rate[i],
                kernel_kv=cfg.kernel_kv[i],
                stride_kv=cfg.stride_kv[i],
                has_patch_embed=cfg.patch_size[i] > 0,
                upembed_phase=cfg.upembed_phase,
                conv_wg_dots=cfg.conv_wg_dots,
                fused_tail=cfg.fused_tail,
                pool_reduce=cfg.pool_reduce,
                fused_attn=cfg.fused_attn,
                keep_frames=(
                    cfg.temporal_list[i]
                    if cfg.skip_dead_frames
                    and (
                        i == n - 1
                        or (
                            cfg.skip_dead_frames_all
                            and (not train or cfg.skip_dead_frames_train)
                        )
                    )
                    else None
                ),
                dtype=self.dtype,
                act=gelu_tanh if cfg.gelu == "tanh" else gelu_exact,
                name=f"stage{i}",
            )(x, back_fea, audio, train=train)

            normed = FusedLayerNorm(name=f"norm_mt{i}")(x)
            task = ReduceTemp(
                embed_dim=cfg.ori_embed_dim,
                temporal_dim=cfg.temporal_list[i],
                dtype=self.dtype,
                name=f"redu_chan{i}",
            )(normed)
            tasks.append(task[:, 0])  # (B, h_i, w_i, 768)

        # multi-scale resize+sum + mt_proj: in eval this lowers through the
        # fully fused resize_sum_conv_relu kernel (BN folded into the conv
        # weights; the (th, tw, 768) accumulator never hits HBM); training
        # uses the single-pass bilinear_resize_sum + plain conv/BN
        # (ops/resize.py, docs/PERF.md round 3)
        return ConvBNRelu(
            cfg.down_embed_dim,
            dtype=self.dtype,
            head_lowres=cfg.head_lowres,
            wg_dots=cfg.conv_wg_dots,
            name="mt_proj",
        )(tasks=tasks, out_hw=(th, tw), train=train)


class SalUNet(nn.Module):
    """Full denoiser f(x_t, t, vis_feats, audio_feats) -> x0_hat
    (reference sal_unet.py:145-328)."""

    cfg: SalUNetConfig
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,  # (B, H, W, 1)
        t: jnp.ndarray,  # (B,)
        feat_list: Sequence[jnp.ndarray],  # coarse-first video pyramid
        audio_feat: Optional[jnp.ndarray] = None,  # (B, 9, 7, 12, 512)
        train: bool = False,
    ) -> jnp.ndarray:
        cfg = self.cfg
        temb = TimestepMLP(ch=cfg.noise_ch, name="temb")(t)
        noisy = NoiseEncoder(
            ch=cfg.noise_ch,
            out_channels=tuple(reversed(cfg.up_channel[:-1])),
            dropout=cfg.dropout,
            dtype=self.dtype,
            name="noise_encoder",
        )(x, temb, train=train)

        feats = list(feat_list)
        if cfg.image_based:
            for i in range(min(len(noisy), len(feats))):
                if feats[i].shape[2:4] == noisy[i].shape[2:4]:
                    feats[i] = jnp.concatenate(
                        [feats[i], noisy[i].astype(feats[i].dtype)], axis=1
                    )

        pred = Decoder(cfg, dtype=self.dtype, name="decoder")(
            feats, audio_feat, train=train
        )
        pred = MLPHead(1, name="logits")(pred.astype(jnp.float32))
        return bilinear_resize(pred, cfg.img_size)
