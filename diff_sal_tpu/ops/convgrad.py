"""Stride-1 2-D convolution with a dot-reformulated WEIGHT gradient.

Motivation (docs/PERF.md round-3 training xplane): XLA's weight-grad
lowering for the decoder's 3x3 convs (mt_proj 768->96 at 112x192, the
UpEmbed dilated pairs — reference sal_unet.py:457-491,
common_block.py:176-223) emits im2col-shaped fusions worth ~8 ms/step at
B=4. The weight gradient of a stride-1 conv is

    dK[a,b,c,o] = sum_{n,i,j} x[n, i + a*d - p, j + b*d - p, c] g[n,i,j,o]

i.e. kh*kw plain (C, N*H*W) x (N*H*W, O) matmuls over shifted views of x —
MXU-shaped dots with no im2col buffer. The forward pass and the data
gradient (a transposed conv, which XLA lowers well) are unchanged, so this
is bit-identical in the forward and float-associativity-identical in the
weight gradient.

Supports exactly what the decoder uses: NHWC, HWIO, stride 1, symmetric
padding, square kernel dilation. Equality-tested against the nn.Conv vjp in
tests/test_ops.py.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

_DN = ("NHWC", "HWIO", "NHWC")


def _conv(x, k, padding: Tuple[int, int], dilation: Tuple[int, int]):
    return lax.conv_general_dilated(
        x,
        k,
        window_strides=(1, 1),
        padding=[(padding[0], padding[0]), (padding[1], padding[1])],
        rhs_dilation=dilation,
        dimension_numbers=_DN,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def conv2d_wg_dots(x, k, padding: Tuple[int, int], dilation: Tuple[int, int]):
    """lax.conv_general_dilated (NHWC/HWIO, stride 1) with the weight-grad
    computed as kh*kw shifted dots instead of XLA's im2col emitter."""
    return _conv(x, k, padding, dilation)


def _fwd(x, k, padding, dilation):
    return _conv(x, k, padding, dilation), (x, k)


def _bwd(padding, dilation, res, g):
    x, k = res
    kh, kw, C, O = k.shape
    ph, pw = padding
    dh, dw = dilation
    N, H, W, _ = x.shape

    # data grad: transposed conv — XLA's native lowering is already good
    dx = lax.conv_general_dilated(
        g,
        jnp.flip(k, (0, 1)).swapaxes(2, 3),  # (kh,kw,O,C), spatially flipped
        window_strides=(1, 1),
        padding=[
            (dh * (kh - 1) - ph, dh * (kh - 1) - ph),
            (dw * (kw - 1) - pw, dw * (kw - 1) - pw),
        ],
        rhs_dilation=dilation,
        dimension_numbers=_DN,
    ).astype(x.dtype)

    # weight grad: kh*kw shifted (C, NHW) x (NHW, O) dots, f32 accumulate
    Ho, Wo = g.shape[1], g.shape[2]
    xp = jnp.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)))
    gm = g.reshape(-1, O)
    taps = []
    for a in range(kh):
        for b in range(kw):
            xs = lax.slice(
                xp,
                (0, a * dh, b * dw, 0),
                (N, a * dh + Ho, b * dw + Wo, C),
            )
            taps.append(
                jnp.dot(
                    xs.reshape(-1, C).T,
                    gm,
                    preferred_element_type=jnp.float32,
                )
            )
    dk = jnp.stack(taps).reshape(kh, kw, C, O).astype(k.dtype)
    return dx, dk


conv2d_wg_dots.defvjp(_fwd, _bwd)
