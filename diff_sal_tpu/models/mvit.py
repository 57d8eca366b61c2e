"""MViTv2 spatio-temporal video encoder, TPU-native (flax.linen).

Re-implements the behavior of the reference encoder (`models/mvit.py`,
MViTv2-small by default): 3D patch embed (k=(3,7,7), s=(2,4,4)), 16
multi-scale blocks with pooled multi-head attention, decomposed (T,H,W)
relative position embeddings, channel/head doubling and spatial 2x
query-pooling at the downscale layers, and a 4-scale output pyramid returned
coarsest-first.

TPU-first design choices:
  * channel-last token layout throughout; pooling convs are depthwise 3D
    convs on (B*heads, T, H, W, C_head) blocks,
  * all shapes static per config — the rel-pos interpolation + gather is a
    precomputed matmul/take (see diff_sal_tpu.ops.rel_pos),
  * attention runs as one batched einsum per block; the cls token rides along
    row/column 0 exactly as in the reference.

Shape trace for rgb (B, 16, 224, 384, 3):
  patch embed -> tokens (B, 1 + 8*56*96, 96)
  pyramid out  -> [(B,8,7,12,768), (B,8,14,24,384), (B,8,28,48,192),
                   (B,8,56,96,96)]   (coarse first, reference mvit.py:1152)
"""

from __future__ import annotations

import functools

from typing import Callable, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from diff_sal_tpu.config import MViTConfig
from diff_sal_tpu.models.layers import (FusedLayerNorm, Mlp, gelu_exact,
                                         gelu_tanh, vit_init)
from diff_sal_tpu.ops.rel_pos import add_decomposed_rel_pos


def _pool_out_size(size: Tuple[int, int, int], stride: Tuple[int, int, int]):
    # conv k=3, pad 1, stride s: out = floor((n + 2 - 3)/s) + 1 == ceil-free
    return tuple((n + 2 - 3) // s + 1 for n, s in zip(size, stride))


class _PatchProjection(nn.Module):
    """The stem conv's parameters + three equivalent lowering strategies.

    With 3 input channels, TPU convolutions run far below peak (the profiled
    stem fusion + its layout copy cost ~3.7 ms/step). Alternatives, all
    mathematically identical with the same param tree as nn.Conv
    (kernel (kt,kh,kw,I,O), bias (O,)):

      'patches' — im2col + one big MXU matmul (+10% e2e over 'conv' on v5e,
        but materializes a 76 MB patches tensor),
      's2d'     — space-to-depth by the stride (2,4,4): the kernel embeds
        into a (4,8,8) grid at offset (1,1,1) (stride-aligned left padding),
        turning the stem into a dense (2,2,2) conv with 96 input channels —
        MXU-aligned, no patches tensor.
    """

    embed_dims: int
    kernel_size: Tuple[int, int, int]
    stride: Tuple[int, int, int]
    padding: Tuple[int, int, int]
    dtype: Optional[jnp.dtype] = None
    mode: str = "s2d"  # conv | patches | s2d
    # physical output width (lane padding): kernel/bias are zero-padded from
    # embed_dims to out_phys inside the op; params stay at embed_dims
    out_phys: Optional[int] = None
    # s2d modes: fold the alignment pad into the block-space conv padding
    # instead of materializing a padded input copy (MViTConfig.stem_fold_pad)
    fold_pad: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_c = x.shape[-1]
        kernel = self.param(
            "kernel", vit_init, self.kernel_size + (in_c, self.embed_dims)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.embed_dims,))
        emb = self.out_phys or self.embed_dims
        if emb != self.embed_dims:
            kernel = jnp.pad(
                kernel, ((0, 0),) * 4 + ((0, emb - self.embed_dims),)
            )
            bias = jnp.pad(bias, (0, emb - self.embed_dims))
        dt = self.dtype or x.dtype
        pad = [(p, p) for p in self.padding]
        if self.mode == "patches":
            patches = jax.lax.conv_general_dilated_patches(
                x.astype(dt),
                filter_shape=self.kernel_size,
                window_strides=self.stride,
                padding=pad,
                dimension_numbers=("NTHWC", "THWIO", "NTHWC"),
            )  # (..., C * prod(kernel)) with (C, kt, kh, kw)-major features
            km = jnp.transpose(kernel, (3, 0, 1, 2, 4)).reshape(
                -1, kernel.shape[-1]
            )
            return patches @ km.astype(dt) + bias.astype(dt)
        if self.mode == "s2d":
            return self._s2d(x, kernel, bias, dt)
        if self.mode == "s2d_staged":
            return self._s2d(x, kernel, bias, dt, staged=True)
        if self.mode == "s2d_perm":
            return self._s2d(x, kernel, bias, dt, staged="perm")
        if self.mode == "s2d_nd":
            return self._s2d_nd(x, kernel, bias, dt)
        if self.mode == "wfold":
            return self._wfold(x, kernel, bias, dt)
        out = jax.lax.conv_general_dilated(
            x.astype(dt),
            kernel.astype(dt),
            window_strides=self.stride,
            padding=pad,
            dimension_numbers=("NTHWC", "THWIO", "NTHWC"),
        )
        return out + bias.astype(dt)

    def _s2d(self, x, kernel, bias, dt, staged=False):
        """Space-to-depth lowering. Requires kernel <= 2*stride - 1 and
        padding == kernel // 2 per axis (true for the (3,7,7)/(2,4,4)/(1,3,3)
        stem), and input dims divisible by the stride.

        staged: False | True | "perm" selects the blockify strategy.
        staged=False blockifies with one 8-D transpose; staged=True walks
        W -> H -> T with per-axis reshapes/transposes whose inner blocks
        grow (3 -> 12 -> 48 lanes) — the 8-D transpose's inner block is a
        fragmented (st, sh, sw, C) and profiles ~5.5 ms/iter at B=4."""
        B = x.shape[0]
        in_c = x.shape[-1]
        strides = self.stride
        for i, (k, s, p) in enumerate(
            zip(self.kernel_size, strides, self.padding)
        ):
            assert k <= 2 * s - 1 and p == k // 2, (k, s, p)
            assert x.shape[1 + i] % s == 0, (x.shape, strides)

        # the one-full-stride left pad that aligns windows to
        # [block_o, block_o+1] is exactly ONE BLOCK of zeros after
        # blockifying — so it can move into the conv's own padding below
        # (padding=((1,0),...) in block space) instead of materializing a
        # padded copy of the 66 MB input (pad.0.clone was 1.6 ms/iter at
        # B=8, docs/PERF.md round 3). fold_pad=False keeps the explicit
        # pad (the measured baseline variant).
        if self.fold_pad:
            xp = x.astype(dt)
        else:
            xp = jnp.pad(
                x.astype(dt),
                ((0, 0),) + tuple((s, 0) for s in strides) + ((0, 0),),
            )
        T, H, W = xp.shape[1:4]
        st, sh, sw = strides
        bt, bh, bw = T // st, H // sh, W // sw
        if staged == "perm":
            # two-transpose blockify with lane-friendly intermediates
            # (round-5; the staged walk's H/T hops write 48-lane
            # intermediates — tile-padded 48->128 — and its W gather has
            # 12-element inner runs; see docs/PERF.md round-4 roofline).
            # Stage 1 moves st inward with CONTIGUOUS (W*c)-sized runs and
            # a full-lane (st*W*c) output — no tile padding at all:
            #   (B,bt,st,H,W*c) -> (B,bt,H,st*W*c)
            xs = xp.reshape(B, bt, st, H, W * in_c)
            xs = jnp.transpose(xs, (0, 1, 3, 2, 4)).reshape(
                B, bt, H, st * W * in_c
            )
            # Stage 2 is the one unavoidable lane->sublane gather (inner
            # runs of sw*c): split lanes (st, bw, sw*c) and rows (bh, sh),
            # emit straight into the FINAL (st, sh, sw, c) channel order —
            # one fragmented hop instead of staged's two:
            #   (B,bt,bh,sh,st,bw,sw*c) -> (B,bt,bh,bw,st*sh*sw*c)
            xs = xs.reshape(B, bt, bh, sh, st, bw, sw * in_c)
            x_s2d = jnp.transpose(xs, (0, 1, 2, 5, 4, 3, 6)).reshape(
                B, bt, bh, bw, st * sh * sw * in_c
            )
        elif staged:
            # W: (B,T,H,W,c) -> (B,T,H,bw,sw*c)   pure trailing reshape
            xs = xp.reshape(B, T, H, bw, sw * in_c)
            # H: split then swap the (sh, bw) pair
            xs = xs.reshape(B, T, bh, sh, bw, sw * in_c)
            xs = jnp.transpose(xs, (0, 1, 2, 4, 3, 5)).reshape(
                B, T, bh, bw, sh * sw * in_c
            )
            # T: split then move st next to channels
            xs = xs.reshape(B, bt, st, bh, bw, sh * sw * in_c)
            x_s2d = jnp.transpose(xs, (0, 1, 3, 4, 2, 5)).reshape(
                B, bt, bh, bw, st * sh * sw * in_c
            )
            # channel order here is (sh, sw, c) per t-slab with t outermost
            # == (st, sh, sw, c), same as the kernel packing below
        else:
            x6 = xp.reshape(B, bt, st, bh, sh, bw, sw, in_c)
            x_s2d = jnp.transpose(x6, (0, 1, 3, 5, 2, 4, 6, 7)).reshape(
                B, bt, bh, bw, st * sh * sw * in_c
            )

        # embed the kernel into a (2s_t, 2s_h, 2s_w) grid at offset
        # (s - k//2 - ... ) == (s - p - 1 + ... ): window rows are
        # [s*o - p .. s*o + p] -> padded rows [s*o + s - p .. s*o + s + p],
        # i.e. offset (s - p) within the two-block (2s) span
        kt, kh, kw = self.kernel_size
        pt, ph, pw = self.padding
        emb = kernel.shape[-1]
        kp = jnp.zeros(
            (2 * st, 2 * sh, 2 * sw, in_c, emb), kernel.dtype
        )
        kp = jax.lax.dynamic_update_slice(
            kp, kernel, (st - pt, sh - ph, sw - pw, 0, 0)
        )
        k6 = kp.reshape(2, st, 2, sh, 2, sw, in_c, emb)
        k_s2d = jnp.transpose(k6, (0, 2, 4, 1, 3, 5, 6, 7)).reshape(
            2, 2, 2, st * sh * sw * in_c, emb
        )
        out = jax.lax.conv_general_dilated(
            x_s2d,
            k_s2d.astype(dt),
            window_strides=(1, 1, 1),
            # fold_pad: the one-block left pad lives in the conv itself
            padding=((1, 0),) * 3 if self.fold_pad else "VALID",
            dimension_numbers=("NTHWC", "THWIO", "NTHWC"),
        )
        return out + bias.astype(dt)

    def _s2d_nd(self, x, kernel, bias, dt):
        """Transpose-free s2d: blockify with a FREE row-major reshape
        (B,T,H,W,C) -> (B,bt,st,bh,sh,bw,sw*C) — no data movement, unlike
        _s2d's materialized block transposes (the roofline's single biggest
        HBM sink: 2.2 GB/iter at B=8, 2.0 GB of it tile padding,
        docs/PERF.md round 4) — and run the stem as ONE conv over FIVE
        spatial dims (bt, st, bh, sh, bw) with the s2d-embedded kernel
        reshaped to (2, st, 2, sh, 2): the "2" axes walk the two-block
        window (padding (1,0) = the alignment pad), the st/sh axes stride
        over in-block phases (output extent 1), and (sw, C) fold into the
        conv features. Same math, same param tree."""
        B = x.shape[0]
        in_c = x.shape[-1]
        st, sh, sw = self.stride
        for i, (k, s, p) in enumerate(
            zip(self.kernel_size, self.stride, self.padding)
        ):
            assert k <= 2 * s - 1 and p == k // 2, (k, s, p)
            assert x.shape[1 + i] % s == 0, (x.shape, self.stride)
        T, H, W = x.shape[1:4]
        bt, bh, bw = T // st, H // sh, W // sw
        x7 = x.astype(dt).reshape(B, bt, st, bh, sh, bw, sw * in_c)

        kt, kh, kw = self.kernel_size
        pt, ph, pw = self.padding
        emb = kernel.shape[-1]
        kp = jnp.zeros((2 * st, 2 * sh, 2 * sw, in_c, emb), kernel.dtype)
        kp = jax.lax.dynamic_update_slice(
            kp, kernel, (st - pt, sh - ph, sw - pw, 0, 0)
        )
        k7 = kp.reshape(2, st, 2, sh, 2, sw * in_c, emb)
        out = jax.lax.conv_general_dilated(
            x7,
            k7.astype(dt),
            window_strides=(1, st, 1, sh, 1),
            padding=((1, 0), (0, 0), (1, 0), (0, 0), (1, 0)),
            dimension_numbers=("NTUHVWC", "TUHVWIO", "NTUHVWC"),
        )  # (B, bt, 1, bh, 1, bw, emb)
        return out.reshape(B, bt, bh, bw, emb) + bias.astype(dt)

    def _wfold(self, x, kernel, bias, dt):
        """Transpose-free lowering: fold ONLY the minor (W) axis into lanes
        — a pure trailing reshape, free in the native layout — and run the
        stem as a dense (kt, kh, 2) conv over (T, H, W/sw) with sw*in_c
        input channels. The W window [sw*o - p .. sw*o + p] spans exactly
        the two lane blocks o-1 and o (kw <= 2*sw - 1), so the folded
        kernel has W-extent 2 with zero weights at the unused phases
        (kt*kh*2*sw*in_c / (kt*kh*kw*in_c) = 8/7 flop overhead for the
        (3,7,7)/(2,4,4) stem). Unlike s2d there are no block transposes of
        the 66 MB input and no alignment-pad copy at all (the T/H/W pads
        ride the conv's own padding): the s2d_staged path's three
        transposes profiled ~2 ms/iter at B=8 (xplane copy.2136/2137,
        docs/PERF.md round 3)."""
        B = x.shape[0]
        in_c = x.shape[-1]
        kt, kh, kw = self.kernel_size
        st, sh, sw = self.stride
        pt, ph, pw = self.padding
        assert kw <= 2 * sw - 1 and pw == kw // 2, (kw, sw, pw)
        W = x.shape[3]
        assert W % sw == 0, (W, sw)
        bw = W // sw
        xw = x.astype(dt).reshape(B, x.shape[1], x.shape[2], bw, sw * in_c)
        # folded kernel (kt, kh, 2, sw*in_c, O):
        #   block 0 (left neighbor): phase q maps to dw = q - (sw - pw)
        #   block 1 (own block):     phase q maps to dw = q + pw
        emb = kernel.shape[-1]
        left = jnp.concatenate(
            [
                jnp.zeros((kt, kh, sw - pw, in_c, emb), kernel.dtype),
                kernel[:, :, : pw],
            ],
            axis=2,
        ).reshape(kt, kh, 1, sw * in_c, emb)
        right = jnp.concatenate(
            [
                kernel[:, :, pw:],
                jnp.zeros((kt, kh, sw - (kw - pw), in_c, emb), kernel.dtype),
            ],
            axis=2,
        ).reshape(kt, kh, 1, sw * in_c, emb)
        k_fold = jnp.concatenate([left, right], axis=2)
        out = jax.lax.conv_general_dilated(
            xw,
            k_fold.astype(dt),
            window_strides=(st, sh, 1),
            padding=[(pt, pt), (ph, ph), (1, 0)],
            dimension_numbers=("NTHWC", "THWIO", "NTHWC"),
        )
        return out + bias.astype(dt)


class PatchEmbed3D(nn.Module):
    """Conv3d video-to-token embed (reference mvit.py:124-247), k=(3,7,7),
    s=(2,4,4), pad=(1,3,3). Input (B, T, H, W, 3) -> (B, T'·H'·W', C)
    (or the unflattened (B, T', H', W', C) for the cls-stream layout)."""

    embed_dims: int = 96
    dtype: Optional[jnp.dtype] = None
    kernel_size: Tuple[int, int, int] = (3, 7, 7)
    stride: Tuple[int, int, int] = (2, 4, 4)
    padding: Tuple[int, int, int] = (1, 3, 3)
    # within-process A/B on v5e: patches > conv by ~10% e2e; s2d avoids the
    # patches tensor entirely (see _PatchProjection)
    mode: str = "s2d"
    flatten: bool = True
    out_phys: Optional[int] = None  # lane-padded output width
    fold_pad: bool = True  # see _PatchProjection.fold_pad

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        x = _PatchProjection(
            self.embed_dims,
            self.kernel_size,
            self.stride,
            self.padding,
            dtype=self.dtype,
            mode=self.mode,
            out_phys=self.out_phys,
            fold_pad=self.fold_pad,
            name="projection",
        )(x)
        out_size = x.shape[1:4]
        if not self.flatten:
            return x, out_size
        return x.reshape(x.shape[0], -1, x.shape[-1]), out_size


class AttentionPool(nn.Module):
    """Depthwise Conv3d pooling + LayerNorm applied per attention head
    (reference `attention_pool` + `build_pooling`, mvit.py:443-575).

    Operates on (B, heads, L, C_head) token blocks; cls token bypasses the
    pool and is re-attached in front.
    """

    stride: Tuple[int, int, int]
    kernel: Tuple[int, int, int] = (3, 3, 3)
    with_cls_token: bool = True
    with_norm: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, in_size: Tuple[int, int, int]):
        B, H, L, C = x.shape
        T, Hh, Ww = in_size
        cls = None
        if self.with_cls_token:
            cls, x = x[:, :, :1], x[:, :, 1:]
        x = x.reshape(B * H, T, Hh, Ww, C)
        conv = nn.Conv(
            C,
            self.kernel,
            strides=self.stride,
            padding=[(k // 2, k // 2) for k in self.kernel],
            feature_group_count=C,
            use_bias=False,
            kernel_init=vit_init,
            dtype=self.dtype,
            name="pool",
        )
        if self.is_initializing():
            x = conv(x)
        else:
            # same conv forward; tap-based grads off-TPU (ops/dwconv.py)
            from diff_sal_tpu.ops.dwconv import depthwise_conv3d

            kernel = conv.variables["params"]["kernel"]
            dt = self.dtype or x.dtype
            x = depthwise_conv3d(
                x.astype(dt),
                kernel.astype(dt),
                self.stride,
                [(k // 2, k // 2) for k in self.kernel],
            )
        out_size = x.shape[1:4]
        x = x.reshape(B, H, -1, C)
        if cls is not None:
            x = jnp.concatenate([cls, x], axis=2)
        if self.with_norm:
            x = FusedLayerNorm(epsilon=1e-6, name="norm")(x)
        return x, out_size


class _DWKernel(nn.Module):
    """Bare depthwise-conv kernel param, path-compatible with nn.Conv
    ('kernel' of shape kernel_size + (1, features))."""

    kernel_size: Tuple[int, int, int]
    features: int

    @nn.compact
    def __call__(self):
        return self.param(
            "kernel", vit_init, tuple(self.kernel_size) + (1, self.features)
        )


class PoolParams(nn.Module):
    """Parameters of one attention pool (depthwise kernel + LayerNorm) with
    the exact AttentionPool param tree (pool/kernel, norm/scale, norm/bias) —
    the conv itself runs FUSED across q/k/v in MultiScaleAttention (one
    grouped conv instead of three separate launches; depthwise channels are
    independent so the math is unchanged).

    padded=True: the norm runs masked over a head_dim zero-padded to the
    128-lane tile (cls-stream layout); params stay at head_dim size."""

    head_dim: int
    kernel_size: Tuple[int, int, int]
    padded: bool = False

    def setup(self):
        self.pool = _DWKernel(self.kernel_size, self.head_dim)
        self.norm = FusedLayerNorm(
            epsilon=1e-6, real_dim=self.head_dim if self.padded else None
        )

    def __call__(self):
        return self.pool()

    def apply_norm(self, x):
        return self.norm(x)


class _DenseParams(nn.Module):
    """Kernel/bias params with nn.Dense's exact tree and inits — for paths
    that fold padding or reshapes into the weight before the matmul."""

    in_features: int
    features: int
    use_bias: bool = True
    kernel_init: Callable = vit_init

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", self.kernel_init, (self.in_features, self.features)
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,))
            if self.use_bias
            else None
        )
        return kernel, bias


class _LNParams(nn.Module):
    """scale/bias params with FusedLayerNorm's exact tree and inits — for
    the fused block tail, whose kernel consumes the raw parameters."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return scale, bias


class _MlpParams(nn.Module):
    """fc1/fc2 kernel+bias params with Mlp's exact tree and inits."""

    in_features: int
    hidden_features: int
    out_features: int
    kernel_init: Callable = vit_init

    @nn.compact
    def __call__(self):
        fc1 = _DenseParams(self.in_features, self.hidden_features,
                           kernel_init=self.kernel_init, name="fc1")()
        fc2 = _DenseParams(self.hidden_features, self.out_features,
                           kernel_init=self.kernel_init, name="fc2")()
        return fc1, fc2


def _fused_depthwise_pool(
    x: jnp.ndarray,  # (B, T, Hh, Ww, n*heads*hd) — channel-folded q/k/v
    kernels: List[jnp.ndarray],  # per part, (kt, kh, kw, 1, hd)
    heads: int,
    stride: Tuple[int, int, int],
    dtype,
):
    """One grouped depthwise conv over channel-concatenated q/k/v parts.

    The reference shares one (kt,kh,kw,1,hd) kernel across all heads
    (mvit.py:497-650: Conv3d(head_dim, head_dim, groups=head_dim) applied to
    a (B*heads, hd, ...) fold), so pooling runs directly on the Dense
    output's (..., part, head, hd)-ordered channels — no pre-pool head
    transposes of the 43k-token tensors. Returns (B, T', H', W', n*heads*hd)
    and the output size."""
    from diff_sal_tpu.ops.dwconv import depthwise_conv3d

    kern = jnp.concatenate(
        [jnp.tile(k, (1, 1, 1, 1, heads)) for k in kernels], axis=-1
    )
    ks = kernels[0].shape[:3]
    # depthwise_conv3d = the same conv primitive forward; off-TPU it swaps
    # the pathological XLA:CPU depthwise-grad lowerings (reduce-window
    # weight-grad, base-dilated data-grad) for tap-based elementwise passes
    # (ops/dwconv.py — found via the round-5 dryrun execution profile)
    out = depthwise_conv3d(
        x.astype(dtype),
        kern.astype(dtype),
        stride,
        [(k // 2, k // 2) for k in ks],
    )
    return out, out.shape[1:4]


def _stencil_depthwise_pool(
    x: jnp.ndarray,  # (B, T, Hh, Ww, n*heads*hd) — channel-folded q/k/v
    kernels: List[jnp.ndarray],  # per part, (kt, kh, kw, 1, hd)
    heads: int,
    stride: Tuple[int, int, int],
    dtype,
):
    """Same math as `_fused_depthwise_pool`, written as kt*kh*kw shifted
    multiply-adds on the NATIVE channel-minor layout (f32 accumulator,
    matching the conv's internal accumulation) instead of a depthwise
    conv. Motivation: XLA's conv emitter prefers batch-in-sublane
    operand layouts, forcing a full relayout copy of every block's qkv
    tensor into the pool (xplane copy.22xx ops, ~0.2 ms x 10 stage-3
    blocks at B=8; docs/PERF.md round 3). The shifted slices read the
    dot-output layout directly and fuse into one output loop fusion."""
    kern = jnp.concatenate(
        [jnp.tile(k[:, :, :, 0, :], (1, 1, 1, heads)) for k in kernels],
        axis=-1,
    ).astype(jnp.float32)
    kt, kh, kw = kern.shape[:3]
    st, sh, sw = stride
    B, T, Hh, Ww, C = x.shape
    xp = jnp.pad(
        x.astype(dtype),
        (
            (0, 0),
            (kt // 2, kt // 2),
            (kh // 2, kh // 2),
            (kw // 2, kw // 2),
            (0, 0),
        ),
    )
    To = (T - 1) // st + 1
    Ho = (Hh - 1) // sh + 1
    Wo = (Ww - 1) // sw + 1
    y = jnp.zeros((B, To, Ho, Wo, C), jnp.float32)
    for i in range(kt):
        for j in range(kh):
            for l in range(kw):
                sl = jax.lax.slice(
                    xp,
                    (0, i, j, l, 0),
                    (
                        B,
                        i + (To - 1) * st + 1,
                        j + (Ho - 1) * sh + 1,
                        l + (Wo - 1) * sw + 1,
                        C,
                    ),
                    (1, st, sh, sw, 1),
                )
                y = y + sl.astype(jnp.float32) * kern[i, j, l]
    return y.astype(dtype), (To, Ho, Wo)


def _pallas_depthwise_pool(
    x: jnp.ndarray,  # (B, T, Hh, Ww, n*heads*D) — channel-folded q/k/v
    kernels: List[jnp.ndarray],  # per part, (kt, kh, kw, 1, D)
    heads: int,
    stride: Tuple[int, int, int],
    dtype,
):
    """Same math as `_fused_depthwise_pool`, lowered through the
    native-layout Pallas stencil (ops/pool.py:depthwise_pool3d) instead of
    an XLA depthwise conv — the conv emitter's batch-in-sublane layout
    preference forced full relayout copies of the qkv activations
    (docs/PERF.md round 3). Requires the 128-padded head dim (D=128), i.e.
    the cls-stream path."""
    from diff_sal_tpu.ops.pool import depthwise_pool3d

    kern = jnp.concatenate(
        [jnp.tile(k[:, :, :, 0, :], (1, 1, 1, heads)) for k in kernels],
        axis=-1,
    ).astype(jnp.float32)
    out = depthwise_pool3d(x.astype(dtype), kern, tuple(stride))
    return out, out.shape[1:4]


class MaxPoolSkip(nn.Module):
    """MaxPool3d on the residual path when the query is strided
    (reference mvit.py:748-763): kernel = stride+1 (where stride>1), padding
    kernel//2, ceil_mode=False."""

    stride: Tuple[int, int, int]
    with_cls_token: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, in_size: Tuple[int, int, int]):
        B, L, C = x.shape
        T, Hh, Ww = in_size
        cls = None
        if self.with_cls_token:
            cls, x = x[:, :1], x[:, 1:]
        x = x.reshape(B, T, Hh, Ww, C)
        kernel = tuple(s + 1 if s > 1 else s for s in self.stride)
        padding = tuple(k // 2 for k in kernel)
        x = nn.max_pool(
            x,
            window_shape=kernel,
            strides=self.stride,
            padding=[(p, p) for p in padding],
        )
        x = x.reshape(B, -1, C)
        if cls is not None:
            x = jnp.concatenate([cls, x], axis=1)
        return x


def _phase_max_axis(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Max-pool kernel 3 / stride 2 / pad 1 along `axis` (even length) via
    the phase split: out[i] = max(x[2i-1], x[2i], x[2i+1]) =
    max(xr[i,0], xr[i,1], xr[i-1,1]) — contiguous slices + two elementwise
    maxima, no reduce-window (whose TPU emitter forces batch-in-sublane
    relayouts of the 43k-token skip tensors; docs/PERF.md round 3)."""
    n = x.shape[axis]
    assert n % 2 == 0, (x.shape, axis)
    xr = x.reshape(x.shape[:axis] + (n // 2, 2) + x.shape[axis + 1:])
    a = jax.lax.index_in_dim(xr, 0, axis + 1, keepdims=False)
    b = jax.lax.index_in_dim(xr, 1, axis + 1, keepdims=False)
    m = jnp.maximum(a, b)
    neg = jnp.full_like(
        jax.lax.slice_in_dim(b, 0, 1, axis=axis), -jnp.inf
    )
    prev = jnp.concatenate(
        [neg, jax.lax.slice_in_dim(b, 0, n // 2 - 1, axis=axis)], axis=axis
    )
    return jnp.maximum(m, prev)


def _phase_max_pool(x: jnp.ndarray, stride: Tuple[int, int, int]):
    """nn.max_pool(kernel=stride+1, stride, pad kernel//2) on (B,T,H,W,C),
    decomposed per axis — exact for the plan's stride pattern (1 or 2 per
    axis; kernel 1 at stride 1 is the identity)."""
    for ax, s in enumerate(stride):
        if s == 1:
            continue
        assert s == 2, stride
        x = _phase_max_axis(x, 1 + ax)
    return x


class MultiScaleAttention(nn.Module):
    """Pooled multi-head attention with decomposed rel-pos
    (reference mvit.py:497-650).

    cls_stream=True switches to the round-3 packed layout: the caller passes
    the SPATIAL tokens as (B, T, H, W, C) plus a separate (B, 1, C) cls
    stream, head_dim is zero-padded to the 128-lane tile inside the qkv
    weights, pooling runs on the un-flattened spatial tensor, and attention
    uses the cls-free v2 kernel (ops/attention.py) — eliminating the cls
    slice/concat relayouts and tile-pad copies of the 43k-token activations
    that dominated the round-2 xplane profile (docs/PERF.md)."""

    out_dims: int
    num_heads: int
    stride_q: Tuple[int, int, int]
    stride_kv: Tuple[int, int, int]
    pool_kernel: Tuple[int, int, int] = (3, 3, 3)
    qkv_bias: bool = True
    rel_pos_embed: bool = True
    residual_pooling: bool = True
    with_cls_token: bool = True
    rel_pos_dims: Tuple[int, int] = (15, 111)  # (t_table_len, hw_table_len)
    dtype: Optional[jnp.dtype] = None
    use_pallas: bool = False
    cls_stream: bool = False
    # lane padding (cls-stream only): logical input width when the incoming
    # stream is zero-padded beyond it, and requested physical output width
    in_dims: Optional[int] = None
    out_phys: Optional[int] = None
    # flat (B, L, C) token stream; 5D only around the pool convs
    tokens3d: bool = False
    # 2D (B*L, C) operands for the qkv/proj dots (see MViTConfig.flat_dots)
    flat_dots: bool = False
    # "conv" | "pallas" | "stencil" attention-pool lowering (MViTConfig.pool_mode)
    pool_mode: str = "conv"
    # fuse the k/v projection THROUGH the attention pool at large kv
    # strides (see MViTConfig.fuse_kv)
    fuse_kv: bool = False
    # "exp2" | "div" kernel softmax formulation (MViTConfig.attn_softmax)
    softmax_mode: str = "exp2"
    # emit the qkv projection as a 1x1x1 conv on the 5D stream so the conv
    # emitter's batch-in-sublane output layout feeds the pool convs without
    # the row-major->conv relayout copy (MViTConfig.qkv_conv)
    qkv_conv: bool = False

    HD_PAD = 128  # padded head dim: one full lane tile

    @nn.compact
    def __call__(self, x: jnp.ndarray, in_size: Tuple[int, int, int],
                 cls: Optional[jnp.ndarray] = None, skip_kb=None):
        if self.cls_stream:
            return self._v2(x, cls, in_size, skip_kb)
        assert skip_kb is None
        B, N, _ = x.shape
        head_dim = self.out_dims // self.num_heads

        C = self.out_dims
        qkv_kernel, qkv_b = _DenseParams(
            x.shape[-1], C * 3, use_bias=self.qkv_bias, name="qkv"
        )()
        dt0 = self.dtype or x.dtype
        qkv = x.astype(dt0) @ qkv_kernel.astype(dt0)
        if qkv_b is not None:
            qkv = qkv + qkv_b.astype(dt0)
        # (B, N, 3C) with channels ordered (part, head, hd)

        # q/k/v pooling runs channel-folded straight off the Dense output:
        # depthwise channels are independent and the reference shares the
        # pool kernel across heads, so pools with a common stride fold into
        # ONE grouped conv over (B, T, H, W, n*C) (k/v always share their
        # stride; q joins when stride_q == stride_kv). No pre-pool
        # (B, heads, N, hd) transposes of the full-resolution tokens, and
        # the param tree is unchanged.
        pq = PoolParams(head_dim, self.pool_kernel, name="pool_q")
        pk = PoolParams(head_dim, self.pool_kernel, name="pool_k")
        pv = PoolParams(head_dim, self.pool_kernel, name="pool_v")
        dt = self.dtype or qkv.dtype
        H = self.num_heads
        T, Hh, Ww = in_size
        cls_qkv = None
        tokens = qkv
        if self.with_cls_token:
            cls_qkv, tokens = qkv[:, :1], qkv[:, 1:]
        sp = tokens.reshape(B, T, Hh, Ww, 3 * C)
        if tuple(self.stride_q) == tuple(self.stride_kv):
            pooled, q_shape = _fused_depthwise_pool(
                sp, [pq(), pk(), pv()], H, self.stride_q, dt
            )
            k_shape = q_shape
            q_sp, k_sp, v_sp = jnp.split(pooled, 3, axis=-1)
        else:
            q_sp, q_shape = _fused_depthwise_pool(
                sp[..., :C], [pq()], H, self.stride_q, dt
            )
            kv_sp, k_shape = _fused_depthwise_pool(
                sp[..., C:], [pk(), pv()], H, self.stride_kv, dt
            )
            k_sp, v_sp = jnp.split(kv_sp, 2, axis=-1)

        def _finish(sp_x, cls_slice, pp):
            t = sp_x.reshape(B, -1, H, head_dim)
            if cls_slice is not None:
                t = jnp.concatenate(
                    [cls_slice.reshape(B, 1, H, head_dim), t], axis=1
                )
            t = pp.apply_norm(t)
            return jnp.swapaxes(t, 1, 2)  # (B, heads, L, hd)

        q = _finish(q_sp, cls_qkv[..., :C] if cls_qkv is not None else None, pq)
        k = _finish(
            k_sp, cls_qkv[..., C : 2 * C] if cls_qkv is not None else None, pk
        )
        v = _finish(
            v_sp, cls_qkv[..., 2 * C :] if cls_qkv is not None else None, pv
        )

        scale = head_dim**-0.5
        rel_pos_t = rel_pos_h = rel_pos_w = None
        if self.rel_pos_embed:
            rel_pos_t = self.param(
                "rel_pos_t", nn.initializers.zeros, (self.rel_pos_dims[0], head_dim)
            )
            rel_pos_h = self.param(
                "rel_pos_h", nn.initializers.zeros, (self.rel_pos_dims[1], head_dim)
            )
            rel_pos_w = self.param(
                "rel_pos_w", nn.initializers.zeros, (self.rel_pos_dims[1], head_dim)
            )

        if (
            self.use_pallas
            and self.rel_pos_embed
            and self.with_cls_token
        ):
            from diff_sal_tpu.ops.attention import fused_bias_attention
            from diff_sal_tpu.ops.rel_pos import resize_rel_pos

            qt, qh, qw = q_shape
            kt, kh, kw = k_shape
            H = self.num_heads
            Rt = resize_rel_pos(rel_pos_t, qt, kt)
            Rh = resize_rel_pos(rel_pos_h, qh, kh)
            Rw = resize_rel_pos(rel_pos_w, qw, kw)
            r_q = q[:, :, 1:].reshape(B, H, qt, qh, qw, head_dim)
            L = qt * qh * qw

            def contract(R, axis_len, eq):
                r = jnp.einsum(eq, r_q, R).reshape(B * H, L, axis_len)
                return jnp.pad(r, ((0, 0), (1, 0), (0, 0)))  # zero cls row

            rel_t = contract(Rt, kt, "bythwc,tkc->bythwk")
            rel_h = contract(Rh, kh, "bythwc,hkc->bythwk")
            rel_w = contract(Rw, kw, "bythwc,wkc->bythwk")
            out = fused_bias_attention(
                q.reshape(B * H, -1, head_dim),
                k.reshape(B * H, -1, head_dim),
                v.reshape(B * H, -1, head_dim),
                rel_t, rel_h, rel_w, k_shape, scale,
                residual=self.residual_pooling,  # fused in-kernel
            ).reshape(B, H, -1, head_dim)
        else:
            attn = jnp.einsum("bhlc,bhtc->bhlt", q * scale, k)
            if self.rel_pos_embed:
                attn = add_decomposed_rel_pos(
                    attn, q, q_shape, k_shape, rel_pos_t, rel_pos_h,
                    rel_pos_w, self.with_cls_token,
                )
            attn = jax.nn.softmax(attn, axis=-1)
            out = jnp.einsum("bhlt,bhtc->bhlc", attn, v)
            if self.residual_pooling:
                if self.with_cls_token:
                    out = out.at[:, :, 1:].add(q[:, :, 1:])
                else:
                    out = out + q

        out = jnp.swapaxes(out, 1, 2).reshape(B, -1, self.out_dims)
        pk, pb = _DenseParams(self.out_dims, self.out_dims, name="proj")()
        out = out.astype(dt) @ pk.astype(dt) + pb.astype(dt)
        return out, q_shape

    # ------------------------------------------------------------------
    # cls-stream (v2) path
    # ------------------------------------------------------------------
    def _v2(self, sp: jnp.ndarray, cls: jnp.ndarray,
            in_size: Tuple[int, int, int], skip_kb=None):
        """sp (B, T, H, W, C_in) — or (B, L, C_in) with tokens3d — normed
        spatial tokens, cls (B, 1, C_in).

        Returns (out_spatial (B,T',H',W',C) or (B,L',C), out_cls (B,1,C),
        q_shape). With skip_kb=(kernel (C_in, Cs), bias (Cs,)) the skip
        projection's columns ride the qkv dot (one matmul, no standalone
        small-K dot) and two extra outputs are appended:
        (skip_sp (B,L,Cs), skip_cls (B,1,Cs)). tokens3d only."""
        assert self.with_cls_token and cls is not None
        B = sp.shape[0]
        C = self.out_dims
        H = self.num_heads
        hd = C // H
        D = self.HD_PAD
        HD = H * D
        dt = self.dtype or sp.dtype
        T, Hh, Ww = in_size
        c_in = self.in_dims or sp.shape[-1]  # logical (checkpoint) width
        in_phys = sp.shape[-1]

        # qkv with head padding folded into the weights: channels ordered
        # (part, head, D) with lanes [hd:D) zero; when the incoming stream
        # is lane-padded, the extra kernel ROWS are zero (the pad lanes are
        # zero so they contribute nothing either way — exact)
        qkv_kernel, qkv_b = _DenseParams(
            c_in, C * 3, use_bias=self.qkv_bias, name="qkv"
        )()
        kp = jnp.pad(
            qkv_kernel.reshape(c_in, 3, H, hd),
            ((0, in_phys - c_in),) + ((0, 0),) * 2 + ((0, D - hd),),
        ).reshape(in_phys, 3 * HD).astype(dt)
        c_skip = 0
        if skip_kb is not None:
            assert self.tokens3d, "fold_proj requires tokens3d"
            sk_k, sk_b = skip_kb  # (c_in, c_skip) logical widths
            c_skip = sk_k.shape[1]
            kp = jnp.concatenate(
                [kp, jnp.pad(sk_k, ((0, in_phys - c_in), (0, 0))).astype(dt)],
                axis=1,
            )
        # pool-through-projection (MViTConfig.fuse_kv): at kv strides with
        # s_h*s_w >= 16 the spatial k/v tokens are computed as ONE dense
        # strided conv with kernel p (x) W instead of dot -> depthwise pool
        # (both linear: pool(Wx) == conv_{p(x)W}(x)); the full-resolution
        # k/v intermediate (176-352 MB at blocks 0-1, B=8) is never
        # materialized and its pool-conv relayout copies disappear. At
        # stride 8 the conv is also FEWER flops than the dot (27/64).
        fuse_kv = (
            self.fuse_kv
            and self.tokens3d
            and skip_kb is None
            and tuple(self.stride_q) != tuple(self.stride_kv)
            and int(np.prod(self.stride_kv)) >= 16
        )
        sp_mat = sp.astype(dt)
        use_qkv_conv = self.qkv_conv and not c_skip
        if self.tokens3d and self.flat_dots and not use_qkv_conv:
            # 2D operand -> plain MXU matmul emission (MViTConfig.flat_dots)
            sp_mat = sp_mat.reshape(-1, in_phys)
        # under fuse_kv the token dot computes only the q columns; cls rows
        # (unpooled) always use the full projection
        if use_qkv_conv:
            qkv_sp = jax.lax.conv_general_dilated(
                sp_mat.reshape(B, T, Hh, Ww, in_phys),
                (kp[:, :HD] if fuse_kv else kp)[None, None, None],
                (1, 1, 1), [(0, 0)] * 3,
                dimension_numbers=("NTHWC", "THWIO", "NTHWC"),
            )
        else:
            qkv_sp = sp_mat @ (kp[:, :HD] if fuse_kv else kp)
        qkv_cls = cls.astype(dt) @ kp
        bp = None
        if qkv_b is not None:
            bp = jnp.pad(
                qkv_b.reshape(3, H, hd), ((0, 0), (0, 0), (0, D - hd))
            ).reshape(-1).astype(dt)
            if c_skip:
                bp = jnp.concatenate([bp, sk_b.astype(dt)])
            qkv_sp = qkv_sp + (bp[:HD] if fuse_kv else bp)
            qkv_cls = qkv_cls + bp
        elif c_skip and sk_b is not None:
            sb = jnp.concatenate(
                [jnp.zeros((3 * HD,), dt), sk_b.astype(dt)]
            )
            qkv_sp = qkv_sp + sb
            qkv_cls = qkv_cls + sb
        skip_sp = skip_cls = None
        if c_skip:
            skip_sp = qkv_sp[..., 3 * HD :].reshape(B, -1, c_skip)
            skip_cls = qkv_cls[..., 3 * HD :]
            qkv_sp = qkv_sp[..., : 3 * HD]
            qkv_cls = qkv_cls[..., : 3 * HD]
        if self.tokens3d and not use_qkv_conv:
            # flat (B, L, 3HD) stream: materialize the 5D view only for the
            # depthwise pool convs so their batch-in-sublane layout
            # preference cannot propagate into the residual-stream matmuls
            qkv_sp = qkv_sp.reshape(B, T, Hh, Ww, qkv_sp.shape[-1])

        pq = PoolParams(hd, self.pool_kernel, padded=True, name="pool_q")
        pk_ = PoolParams(hd, self.pool_kernel, padded=True, name="pool_k")
        pv = PoolParams(hd, self.pool_kernel, padded=True, name="pool_v")

        def pad_pool(kern):  # (kt,kh,kw,1,hd) -> (kt,kh,kw,1,D)
            k = jnp.pad(kern, ((0, 0),) * 3 + ((0, 0), (0, D - hd)))
            # barrier: XLA's simplifier otherwise pushes the zero pad out of
            # the grouped conv and emits an invalid batch-grouped conv for
            # the kernel GRADIENT (output features 96 vs group count 128 —
            # TPU compile error in the train step); the barrier keeps the
            # padded kernel opaque. Runtime cost: none (tiny constant work).
            return jax.lax.optimization_barrier(k)

        if self.pool_mode == "pallas":
            # native-layout stencil kernel (ops/pool.py): no 5D
            # batch-in-sublane relayout copies around the pools
            pool_fn = functools.partial(
                _pallas_depthwise_pool, heads=H, dtype=dt
            )
        elif self.pool_mode == "stencil":
            # shifted multiply-adds in plain XLA on the native layout
            pool_fn = functools.partial(
                _stencil_depthwise_pool, heads=H, dtype=dt
            )
        else:
            pool_fn = functools.partial(
                _fused_depthwise_pool, heads=H, dtype=dt
            )
        if fuse_kv:
            # qkv_sp carries ONLY the q columns here; k/v come from the
            # fused dense conv below
            q_sp, q_shape = pool_fn(
                qkv_sp, [pad_pool(pq())], stride=self.stride_q
            )
            # fused kernel p (x) W: (kt,kh,kw,in_phys,2HD). The pool kernel
            # is shared across heads (like _fused_depthwise_pool); padded
            # lanes stay zero because kp's columns are zero there.
            pcat = jnp.concatenate(
                [
                    jnp.tile(pad_pool(pk_())[:, :, :, 0, :], (1, 1, 1, H)),
                    jnp.tile(pad_pool(pv())[:, :, :, 0, :], (1, 1, 1, H)),
                ],
                axis=-1,
            ).astype(dt)
            kk = pcat[:, :, :, None, :] * kp[:, HD:][None, None, None]
            kv_sp = jax.lax.conv_general_dilated(
                sp.astype(dt).reshape(B, T, Hh, Ww, in_phys),
                kk,
                window_strides=self.stride_kv,
                padding=[(k // 2, k // 2) for k in self.pool_kernel],
                dimension_numbers=("NTHWC", "THWIO", "NTHWC"),
            )
            if bp is not None:
                # the pre-pool bias becomes an edge-attenuated map: pool a
                # batch-1 broadcast of it with the SAME pool kernels (exact
                # zero-padding semantics, 1/B the original pool's cost)
                bias_map = jnp.broadcast_to(
                    bp[HD:], (1, T, Hh, Ww, 2 * HD)
                ).astype(dt)
                bias_pooled, _ = pool_fn(
                    bias_map, [pad_pool(pk_()), pad_pool(pv())],
                    stride=self.stride_kv,
                )
                kv_sp = kv_sp + bias_pooled
            k_shape = kv_sp.shape[1:4]
            k_sp, v_sp = jnp.split(kv_sp, 2, axis=-1)
        elif tuple(self.stride_q) == tuple(self.stride_kv):
            pooled, q_shape = pool_fn(
                qkv_sp, [pad_pool(pq()), pad_pool(pk_()), pad_pool(pv())],
                stride=self.stride_q,
            )
            k_shape = q_shape
            q_sp, k_sp, v_sp = jnp.split(pooled, 3, axis=-1)
        else:
            q_sp, q_shape = pool_fn(
                qkv_sp[..., :HD], [pad_pool(pq())], stride=self.stride_q
            )
            kv_sp, k_shape = pool_fn(
                qkv_sp[..., HD:], [pad_pool(pk_()), pad_pool(pv())],
                stride=self.stride_kv,
            )
            k_sp, v_sp = jnp.split(kv_sp, 2, axis=-1)

        Lq = int(np.prod(q_shape))
        Lk_sp = int(np.prod(k_shape))

        def norm_packed(t, pp):
            # (..., HD) -> masked per-head LN -> (..., HD); reshapes are
            # trailing-dim splits (free)
            shp = t.shape
            t = pp.apply_norm(t.reshape(shp[:-1] + (H, D)))
            return t.reshape(shp)

        q2 = norm_packed(q_sp.reshape(B, Lq, HD), pq)
        k2 = norm_packed(k_sp.reshape(B, Lk_sp, HD), pk_)
        v2 = norm_packed(v_sp.reshape(B, Lk_sp, HD), pv)
        cq, ck, cv = jnp.split(qkv_cls, 3, axis=-1)  # (B, 1, HD)
        cq = norm_packed(cq, pq)
        ck = norm_packed(ck, pk_)
        cv = norm_packed(cv, pv)
        k2 = jnp.concatenate([ck, k2], axis=1)  # cls key/value at row 0
        v2 = jnp.concatenate([cv, v2], axis=1)

        scale = hd**-0.5
        qt, qh, qw = q_shape
        kt, kh, kw = k_shape
        K = kt + kh + kw
        Kp = ((K + 127) // 128) * 128

        rel = None
        if self.rel_pos_embed:
            from diff_sal_tpu.ops.rel_pos import resize_rel_pos

            rel_pos_t = self.param(
                "rel_pos_t", nn.initializers.zeros,
                (self.rel_pos_dims[0], hd),
            )
            rel_pos_h = self.param(
                "rel_pos_h", nn.initializers.zeros,
                (self.rel_pos_dims[1], hd),
            )
            rel_pos_w = self.param(
                "rel_pos_w", nn.initializers.zeros,
                (self.rel_pos_dims[1], hd),
            )

            def table(p, qn, kn):  # (qn, kn, hd) zero-padded to D channels
                return jnp.pad(
                    resize_rel_pos(p, qn, kn), ((0, 0), (0, 0), (0, D - hd))
                ).astype(dt)

            r_q = q2.reshape(B, qt, qh, qw, H, D)
            rel_t = jnp.einsum(
                "bthwnc,tkc->bthwnk", r_q, table(rel_pos_t, qt, kt)
            )
            rel_h = jnp.einsum(
                "bthwnc,hkc->bthwnk", r_q, table(rel_pos_h, qh, kh)
            )
            rel_w = jnp.einsum(
                "bthwnc,wkc->bthwnk", r_q, table(rel_pos_w, qw, kw)
            )
            zpad = jnp.zeros(rel_t.shape[:-1] + (Kp - K,), rel_t.dtype)
            rel = jnp.concatenate([rel_t, rel_h, rel_w, zpad], axis=-1)
            rel = rel.reshape(B, Lq, H * Kp)
        else:
            rel = jnp.zeros((B, Lq, H * Kp), dt)

        from diff_sal_tpu.ops.attention import (
            fused_bias_attention_v2,
            reference_bias_attention_v2,
        )

        attn_fn = (
            fused_bias_attention_v2 if self.use_pallas
            else reference_bias_attention_v2
        )
        out2 = attn_fn(
            q2, k2, v2, rel, (kt, kh, kw), H, scale, None,
            self.residual_pooling, None, self.softmax_mode,
        )  # (B, Lq, HD)

        # cls query row: full attention over [cls | pooled kv], zero bias,
        # no residual (reference excludes the cls row, mvit.py:640-644)
        ck4 = k2.reshape(B, 1 + Lk_sp, H, D)
        cv4 = v2.reshape(B, 1 + Lk_sp, H, D)
        cs = jnp.einsum(
            "bqhd,bkhd->bhqk", cq.reshape(B, 1, H, D) * scale, ck4,
            preferred_element_type=jnp.float32,
        )
        cp = jax.nn.softmax(cs, axis=-1).astype(dt)
        out_cls = jnp.einsum("bhqk,bkhd->bqhd", cp, cv4).reshape(B, 1, HD)

        # proj with the hd->D padding folded into the weight rows, and —
        # when the outgoing stream is lane-padded — zero COLUMNS beyond C
        # so the residual stream stays a full 128-lane tile
        c_out = self.out_phys or C
        proj_kernel, proj_b = _DenseParams(C, C, name="proj")()
        pkr = jnp.pad(
            proj_kernel.reshape(H, hd, C),
            ((0, 0), (0, D - hd), (0, c_out - C)),
        ).reshape(HD, c_out).astype(dt)
        pb = jnp.pad(proj_b, (0, c_out - C)).astype(dt)
        out_mat = out2.astype(dt)
        if self.tokens3d and self.flat_dots:
            out_mat = out_mat.reshape(-1, HD)
        out_sp = out_mat @ pkr + pb
        out_cls = out_cls.astype(dt) @ pkr + pb
        if self.tokens3d:
            out_sp = out_sp.reshape(B, Lq, c_out)
            if c_skip:
                return out_sp, out_cls, q_shape, skip_sp, skip_cls
            return out_sp, out_cls, q_shape
        return out_sp.reshape((B,) + q_shape + (c_out,)), out_cls, q_shape


class PaddedMlp(nn.Module):
    """Mlp with lane padding folded into the weights: fc1 kernel rows are
    zero-padded from in_features to the physical input width, fc2 kernel
    columns from out_features to out_phys. Same param tree as Mlp
    (fc1/fc2 kernel+bias at the logical checkpoint sizes)."""

    in_features: int
    hidden_features: int
    out_features: int
    out_phys: int
    dtype: Optional[jnp.dtype] = None
    act: Callable = gelu_exact

    @nn.compact
    def __call__(self, x):
        dt = self.dtype or x.dtype
        k1, b1 = _DenseParams(
            self.in_features, self.hidden_features, name="fc1"
        )()
        k1 = jnp.pad(
            k1, ((0, x.shape[-1] - self.in_features), (0, 0))
        ).astype(dt)
        h = self.act(x.astype(dt) @ k1 + b1.astype(dt))
        k2, b2 = _DenseParams(
            self.hidden_features, self.out_features, name="fc2"
        )()
        k2 = jnp.pad(
            k2, ((0, 0), (0, self.out_phys - self.out_features))
        ).astype(dt)
        b2 = jnp.pad(b2, (0, self.out_phys - self.out_features)).astype(dt)
        return h @ k2 + b2


class MultiScaleBlock(nn.Module):
    """Pre-norm block with pooled attention + MLP, channel expansion in
    attention, max-pooled residual on strided layers
    (reference mvit.py:653-792)."""

    in_dims: int
    out_dims: int
    num_heads: int
    stride_q: Tuple[int, int, int]
    stride_kv: Tuple[int, int, int]
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    pool_kernel: Tuple[int, int, int] = (3, 3, 3)
    rel_pos_embed: bool = True
    residual_pooling: bool = True
    with_cls_token: bool = True
    rel_pos_dims: Tuple[int, int] = (15, 111)
    dtype: Optional[jnp.dtype] = None
    use_pallas: bool = False
    cls_stream: bool = False
    # lane padding (cls-stream only): physical widths of the in/out streams
    in_phys: Optional[int] = None
    out_phys: Optional[int] = None
    # flat (B, L, C) residual stream (cls-stream only, see MViTConfig)
    tokens3d: bool = False
    # 2D (B*L, C) operands for every Dense dot (see MViTConfig.flat_dots)
    flat_dots: bool = False
    # skip projection rides the qkv dot (see MViTConfig.fold_proj)
    fold_proj: bool = False
    # "conv" | "pallas" | "stencil" attention-pool lowering (MViTConfig.pool_mode)
    pool_mode: str = "conv"
    # fuse k/v projection through the pool at large kv strides
    fuse_kv: bool = False
    # "exp2" | "div" kernel softmax formulation (MViTConfig.attn_softmax)
    softmax_mode: str = "exp2"
    # "window" | "phase" strided-skip max pool (MViTConfig.skip_pool)
    skip_pool_mode: str = "window"
    # qkv projection as 1x1x1 conv (MViTConfig.qkv_conv)
    qkv_conv: bool = False
    # MLP activation (MViTConfig.gelu)
    act: Callable = gelu_exact
    # fused add+norm2+MLP+add block tail (ops/mlp.py, MViTConfig.fused_tail)
    fused_tail: bool = False
    # int8 MLP kernels (MViTConfig.mlp_quant): "none" | "w8" | "w8a8"
    mlp_quant: str = "none"

    @nn.compact
    def __call__(self, x, in_size: Tuple[int, int, int]):
        # cls_stream: x is (spatial (B,T,H,W,C), cls (B,1,C)); modules are
        # shared between the two tensors so the param tree is unchanged
        if self.cls_stream:
            sp, cls = x
        else:
            sp, cls = x, None
        in_phys = self.in_phys or self.in_dims
        out_phys = self.out_phys or self.out_dims
        pad_in = in_phys != self.in_dims
        pad_out = out_phys != self.out_dims
        norm1 = FusedLayerNorm(
            epsilon=1e-6, real_dim=self.in_dims if pad_in else None,
            name="norm1",
        )
        attn = MultiScaleAttention(
            out_dims=self.out_dims,
            num_heads=self.num_heads,
            stride_q=self.stride_q,
            stride_kv=self.stride_kv,
            pool_kernel=self.pool_kernel,
            qkv_bias=self.qkv_bias,
            rel_pos_embed=self.rel_pos_embed,
            residual_pooling=self.residual_pooling,
            with_cls_token=self.with_cls_token,
            rel_pos_dims=self.rel_pos_dims,
            dtype=self.dtype,
            use_pallas=self.use_pallas,
            cls_stream=self.cls_stream,
            pool_mode=self.pool_mode,
            fuse_kv=self.fuse_kv,
            qkv_conv=self.qkv_conv,
            softmax_mode=self.softmax_mode,
            in_dims=self.in_dims if pad_in else None,
            out_phys=out_phys if pad_out else None,
            tokens3d=self.tokens3d,
            flat_dots=self.flat_dots,
            name="attn",
        )
        use_ft = (
            self.fused_tail
            and self.cls_stream
            and self.tokens3d
            and self.flat_dots
            and not (pad_in or pad_out)
            and self.act in (gelu_tanh, gelu_exact)
            and self.mlp_quant == "none"
        )
        if use_ft:
            # same param tree as FusedLayerNorm("norm2") + Mlp("mlp"); the
            # fused kernel consumes the raw parameters
            ln2_scale, ln2_bias = _LNParams(self.out_dims, name="norm2")()
            (fc1_k, fc1_b), (fc2_k, fc2_b) = _MlpParams(
                self.out_dims,
                int(self.out_dims * self.mlp_ratio),
                self.out_dims,
                name="mlp",
            )()
            act_mode = "tanh" if self.act is gelu_tanh else "exact"

            def tail(skip2d, attn2d):
                from diff_sal_tpu.ops.mlp import fused_block_tail

                dt = self.dtype or skip2d.dtype
                return fused_block_tail(
                    skip2d, attn2d, ln2_scale, ln2_bias,
                    fc1_k.astype(dt), fc1_b, fc2_k.astype(dt), fc2_b,
                    1e-6, act_mode, None,
                )

            norm2 = mlp = None
        else:
            norm2 = FusedLayerNorm(
                epsilon=1e-6, real_dim=self.out_dims if pad_out else None,
                name="norm2",
            )
        if use_ft:
            pass
        elif pad_in or pad_out:
            mlp = PaddedMlp(
                in_features=self.out_dims,
                hidden_features=int(self.out_dims * self.mlp_ratio),
                out_features=self.out_dims,
                out_phys=out_phys,
                dtype=self.dtype,
                act=self.act,
                name="mlp",
            )
        else:
            mlp = Mlp(
                hidden_features=int(self.out_dims * self.mlp_ratio),
                out_features=self.out_dims,
                act=self.act,
                kernel_init=vit_init,
                dtype=self.dtype,
                quant=self.mlp_quant,
                name="mlp",
            )
        fold = (
            self.fold_proj
            and self.cls_stream
            and self.tokens3d
            and self.in_dims != self.out_dims
            and not (pad_in or pad_out)
        )
        proj = None
        proj_kb = None
        if fold:
            # same 'proj' param tree; columns ride the qkv dot inside attn
            proj_kb = _DenseParams(
                self.in_dims, self.out_dims, name="proj"
            )()
        elif self.in_dims != self.out_dims:
            if pad_in or pad_out:
                proj_k, proj_bias = _DenseParams(
                    self.in_dims, self.out_dims, name="proj"
                )()

                def proj(t):  # noqa: E306 — padded-weight skip projection
                    dtp = self.dtype or t.dtype
                    k = jnp.pad(
                        proj_k,
                        ((0, in_phys - self.in_dims),
                         (0, out_phys - self.out_dims)),
                    ).astype(dtp)
                    b = jnp.pad(
                        proj_bias, (0, out_phys - self.out_dims)
                    ).astype(dtp)
                    return t.astype(dtp) @ k + b
            else:
                proj = nn.Dense(
                    self.out_dims, kernel_init=vit_init, dtype=self.dtype,
                    name="proj",
                )
        strided = int(np.prod(self.stride_q)) > 1

        if not self.cls_stream:
            x_norm = norm1(sp)
            x_attn, out_size = attn(x_norm, in_size)
            skip = proj(x_norm) if proj is not None else sp
            if strided:
                skip = MaxPoolSkip(
                    self.stride_q, self.with_cls_token, name="pool_skip"
                )(skip, in_size)
            y = skip + x_attn
            return y + mlp(norm2(y)), out_size

        sp_n, cls_n = norm1(sp), norm1(cls)
        if fold:
            attn_sp, attn_cls, out_size, skip_sp, skip_cls = attn(
                sp_n, in_size, cls_n, proj_kb
            )
        else:
            attn_sp, attn_cls, out_size = attn(sp_n, in_size, cls_n)
            if proj is None:
                skip_sp = sp
            elif self.tokens3d and self.flat_dots:
                Bp, Lp, Cp = sp_n.shape
                skip_sp = proj(sp_n.reshape(Bp * Lp, Cp)).reshape(Bp, Lp, -1)
            else:
                skip_sp = proj(sp_n)
            skip_cls = proj(cls_n) if proj is not None else cls
        if strided:
            if self.tokens3d:
                B = skip_sp.shape[0]
                skip_sp = skip_sp.reshape(
                    (B,) + tuple(in_size) + (skip_sp.shape[-1],)
                )
            if self.skip_pool_mode == "phase" and all(
                s in (1, 2) for s in self.stride_q
            ):
                skip_sp = _phase_max_pool(skip_sp, tuple(self.stride_q))
            else:
                kernel = tuple(
                    s + 1 if s > 1 else s for s in self.stride_q
                )
                skip_sp = nn.max_pool(
                    skip_sp,
                    window_shape=kernel,
                    strides=self.stride_q,
                    padding=[(k // 2, k // 2) for k in kernel],
                )
            if self.tokens3d:
                skip_sp = skip_sp.reshape(B, -1, skip_sp.shape[-1])
        if use_ft:
            from diff_sal_tpu.ops.mlp import block_tail_reference

            B2, L2, C2 = skip_sp.shape
            sp = tail(
                skip_sp.reshape(B2 * L2, C2), attn_sp.reshape(B2 * L2, C2)
            ).reshape(B2, L2, C2)
            dt = self.dtype or cls.dtype
            cls = block_tail_reference(
                skip_cls.reshape(-1, C2), attn_cls.reshape(-1, C2),
                ln2_scale, ln2_bias, fc1_k, fc1_b, fc2_k, fc2_b,
                1e-6, act_mode, dt,
            ).reshape(skip_cls.shape)
            return (sp, cls), out_size
        sp = skip_sp + attn_sp
        cls = skip_cls + attn_cls
        if self.tokens3d and self.flat_dots:
            B2, L2, C2 = sp.shape
            sp_n = norm2(sp).reshape(B2 * L2, C2)
            sp = sp + mlp(sp_n).reshape(B2, L2, -1)
        else:
            sp = sp + mlp(norm2(sp))
        cls = cls + mlp(norm2(cls))
        return (sp, cls), out_size


def _block_plan(cfg: MViTConfig):
    """Static per-block plan: dims, heads, strides, token grids and which
    scale (if any) each block emits. Mirrors the constructor loop in
    reference mvit.py:1016-1066 — including the persistent kv-stride halving
    and the train-resolution (224x224) rel-pos table sizing."""
    downscale = set(cfg.downscale_indices)
    stage_of_block = {i - 1: s for s, i in enumerate(cfg.downscale_indices)}
    stage_of_block[cfg.num_layers - 1] = len(cfg.downscale_indices)

    # rel-pos table length uses the 224x224 pretrain grid (56x56 spatial).
    rel_size = cfg.rel_pos_spatial_size // 4

    plans = []
    dims = cfg.embed_dims
    heads = cfg.num_heads
    stride_kv = list(cfg.adaptive_kv_stride)
    t0 = cfg.temporal_size // 2
    size = (t0, cfg.spatial_size[0] // 4, cfg.spatial_size[1] // 4)
    rel_hw_size = rel_size
    for i in range(cfg.num_layers):
        if i in downscale:
            heads *= cfg.head_mul
            stride_q = (1, 2, 2)
            stride_kv = [max(s // 2, 1) for s in stride_kv]
        else:
            stride_q = (1, 1, 1)
        out_dims = dims * cfg.dim_mul if i in downscale else dims
        # rel-table length: 2*max(size//stride_q, size//stride_kv)-1 at the
        # square pretrain resolution (reference mvit.py:586)
        rel_dim = 2 * max(rel_hw_size // stride_q[1], rel_hw_size // stride_kv[1]) - 1
        rel_t_dim = 2 * (cfg.temporal_size // 2) - 1  # 2*T'-1 with T'=T/2 -> 15
        plans.append(
            dict(
                in_dims=dims,
                out_dims=out_dims,
                num_heads=heads,
                stride_q=stride_q,
                stride_kv=tuple(stride_kv),
                in_size=size,
                rel_pos_dims=(rel_t_dim, rel_dim),
                emit_scale=stage_of_block.get(i),
            )
        )
        # q-pool output grid: conv formula (kernel 3, pad 1, stride s) ->
        # (n - 1) // s + 1 == ceil(n / s); plain floor division diverges on
        # odd grids (e.g. 3 -> 2, not 1) and the emit reshape consumes these
        size = tuple((s - 1) // st + 1 for s, st in zip(size, stride_q))
        rel_hw_size = rel_hw_size // stride_q[1]
        dims = out_dims
    return plans


class MViT(nn.Module):
    """MViTv2 encoder returning the coarse-first 4-scale pyramid
    (reference mvit.py:795-1152)."""

    cfg: MViTConfig
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        cfg = self.cfg
        B = x.shape[0]
        cls_stream = cfg.cls_stream and cfg.with_cls_token
        lane_pad = cls_stream and cfg.lane_pad
        tokens3d = cls_stream and cfg.tokens3d

        def phys(c: int) -> int:
            # physical lane width of a C-channel residual stream: sub-tile
            # widths (the finest scale's 96) run zero-padded to one full
            # 128-lane tile (docs/PERF.md round-3 lever 2)
            return 128 if (lane_pad and c < 128) else c

        tokens, size = PatchEmbed3D(
            cfg.embed_dims, dtype=self.dtype, mode=cfg.stem_mode,
            flatten=(not cls_stream) or tokens3d,
            out_phys=phys(cfg.embed_dims) if lane_pad else None,
            fold_pad=cfg.stem_fold_pad,
            name="patch_embed",
        )(x)

        cls_token = self.param(
            "cls_token", nn.initializers.zeros, (1, 1, cfg.embed_dims)
        )
        # cast the f32 param to the token dtype BEFORE use — else the whole
        # 43k-token residual stream silently promotes to f32 (2x HBM traffic
        # on every block residual/norm)
        cls_b = jnp.broadcast_to(
            cls_token.astype(tokens.dtype), (B, 1, cfg.embed_dims)
        )
        if lane_pad and phys(cfg.embed_dims) != cfg.embed_dims:
            cls_b = jnp.pad(
                cls_b,
                ((0, 0), (0, 0), (0, phys(cfg.embed_dims) - cfg.embed_dims)),
            )
        if cls_stream:
            # cls rides a separate (B, 1, C) stream — the 43k-token spatial
            # tensor stays (B, T, H, W, C) end to end, with no cls
            # slice/concat relayouts (round-3 layout redesign, docs/PERF.md)
            tokens = (tokens, cls_b)
        elif cfg.with_cls_token:
            tokens = jnp.concatenate([cls_b, tokens], axis=1)

        block_cls = MultiScaleBlock
        if cfg.remat:
            # in_size (arg index 2 incl. module) is a static python tuple
            block_cls = nn.remat(MultiScaleBlock, static_argnums=(2,))

        outs = []
        for i, plan in enumerate(_block_plan(cfg)):
            tokens = block_cls(
                in_dims=plan["in_dims"],
                out_dims=plan["out_dims"],
                num_heads=plan["num_heads"],
                stride_q=plan["stride_q"],
                stride_kv=plan["stride_kv"],
                mlp_ratio=cfg.mlp_ratio,
                qkv_bias=cfg.qkv_bias,
                pool_kernel=cfg.pool_kernel,
                rel_pos_embed=cfg.rel_pos_embed,
                residual_pooling=cfg.residual_pooling,
                with_cls_token=cfg.with_cls_token,
                rel_pos_dims=plan["rel_pos_dims"],
                dtype=self.dtype,
                use_pallas=cfg.use_pallas_attention,
                cls_stream=cls_stream,
                in_phys=phys(plan["in_dims"]) if lane_pad else None,
                out_phys=phys(plan["out_dims"]) if lane_pad else None,
                tokens3d=tokens3d,
                flat_dots=cfg.flat_dots,
                fold_proj=cfg.fold_proj,
                pool_mode=cfg.pool_mode if cls_stream and tokens3d
                else "conv",
                fuse_kv=cfg.fuse_kv and cls_stream and tokens3d,
                softmax_mode=cfg.attn_softmax,
                skip_pool_mode=cfg.skip_pool,
                qkv_conv=cfg.qkv_conv,
                act=gelu_tanh if cfg.gelu == "tanh" else gelu_exact,
                fused_tail=cfg.fused_tail,
                mlp_quant=cfg.mlp_quant,
                name=f"blocks_{i}",
            )(tokens, size)[0]
            # under cfg.remat the block's returned out_size tuple crosses a
            # jax.checkpoint boundary and its ints come back as TRACERS —
            # unusable for the static emit reshape below. The grid is fully
            # static, so advance it host-side from the RUNTIME size (the one
            # PatchEmbed derived from the actual input — not the plan's
            # config-static in_size, which diverges when the input resolution
            # differs from cfg.spatial_size) with the q-pool's own formula.
            size = _pool_out_size(size, plan["stride_q"])
            stage = plan["emit_scale"]
            if stage is not None and stage in cfg.out_scales:
                c_out = plan["out_dims"]
                norm = FusedLayerNorm(
                    epsilon=1e-6,
                    real_dim=c_out if phys(c_out) != c_out else None,
                    name=f"norm{stage}",
                )
                T, H, W = size
                if cls_stream:
                    # LN is per-token: norming the spatial tensor alone
                    # equals norming [cls | spatial] and dropping cls.
                    # Lane-padded streams slice back to the checkpoint
                    # width at emission (one copy, once — not per block).
                    normed = norm(tokens[0])
                    if phys(c_out) != c_out:
                        normed = normed[..., :c_out]
                    if tokens3d:
                        normed = normed.reshape(B, T, H, W, c_out)
                    outs.append(normed)
                else:
                    normed = norm(tokens)
                    patch = normed[:, 1:] if cfg.with_cls_token else normed
                    outs.append(patch.reshape(B, T, H, W, -1))
        return outs[::-1]
