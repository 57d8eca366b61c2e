"""Depthwise 3-D convolution with a tap-reformulated backward for CPU.

The MViT attention pools are depthwise (3,3,3) convs with
feature_group_count=C (reference mvit.py:443-575). XLA:CPU lowers their
WEIGHT gradient to a reduce-window and their DATA gradient to
base-dilated convolutions — both take scalar-loop paths that measured
~18 s and ~6 s per op per device in the 8-device virtual-mesh dryrun
(docs/PERF.md round 5), completely dominating the train-step execution.

A depthwise conv is C independent stencils, so both gradients are
kt*kh*kw elementwise passes:

    dK[a,b,c,ch] = sum_{n,o} x[n, o*s + (a,b,c) - p, ch] * g[n, o, ch]
    dx[n, i, ch] = sum_{a,b,c} g_dilated[n, i - (a,b,c) + p, ch] * K[a,b,c,ch]

(g_dilated = g interior-padded by the stride). These vectorize on any
backend; on TPU the native conv emitters are already good AND the extra
kt*kh*kw passes over the (B,T,H,W,3*heads*hd) qkv tensor would cost HBM
traffic, so tap_bwd auto-enables only off-TPU (trace-time check; the
forward is the identical conv primitive either way).

Equality-tested against the XLA conv vjp in tests/test_ops.py.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

_DN = ("NTHWC", "THWIO", "NTHWC")


def _conv(x, kern, stride, padding):
    return lax.conv_general_dilated(
        x,
        kern,
        window_strides=stride,
        padding=list(padding),
        dimension_numbers=_DN,
        feature_group_count=x.shape[-1],
    )


def depthwise_conv3d(x, kern, stride, padding, tap_bwd: bool = None):
    """Depthwise conv (NTHWC, kern (kt,kh,kw,1,C), feature_group_count=C).

    tap_bwd=None auto-selects: XLA's native vjp on TPU, the tap-based
    custom vjp elsewhere. The forward value is the same conv primitive
    in both modes (bit-identical)."""
    if tap_bwd is None:
        tap_bwd = jax.default_backend() != "tpu"
    if not tap_bwd:
        return _conv(x, kern, stride, padding)
    return _dw_tap(x, kern, tuple(stride), tuple(map(tuple, padding)))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _dw_tap(x, kern, stride, padding):
    return _conv(x, kern, stride, padding)


def _dw_fwd(x, kern, stride, padding):
    return _conv(x, kern, stride, padding), (x, kern)


def _dw_bwd(stride, padding, res, g):
    x, kern = res
    # accumulate at >= f32 but never BELOW the input precision (an f64
    # trace must get an f64 backward — tests/test_mvit.py fuse_kv f64)
    acc = jnp.promote_types(x.dtype, jnp.float32)
    N = x.shape[0]
    C = x.shape[-1]
    ks = kern.shape[:3]  # (kt, kh, kw)
    ispatial = x.shape[1:4]
    ospatial = g.shape[1:4]

    # padded input once; strided slices per tap for the weight grad
    xp = jnp.pad(
        x,
        ((0, 0), *[(p[0], p[1]) for p in padding], (0, 0)),
    )
    gf = g.astype(acc)
    dk_taps = []
    for a in range(ks[0]):
        for b in range(ks[1]):
            for c in range(ks[2]):
                xs = lax.slice(
                    xp,
                    (0, a, b, c, 0),
                    (
                        N,
                        a + (ospatial[0] - 1) * stride[0] + 1,
                        b + (ospatial[1] - 1) * stride[1] + 1,
                        c + (ospatial[2] - 1) * stride[2] + 1,
                        C,
                    ),
                    (1, *stride, 1),
                )
                dk_taps.append(
                    jnp.sum(xs.astype(acc) * gf, axis=(0, 1, 2, 3))
                )
    dk = jnp.stack(dk_taps).reshape(*ks, 1, C).astype(kern.dtype)

    # data grad: interior-dilate g by the stride, then one shifted
    # multiply-add per tap into the padded-input frame
    gd = lax.pad(
        g,
        jnp.zeros((), g.dtype),
        (
            (0, 0, 0),
            (0, 0, stride[0] - 1),
            (0, 0, stride[1] - 1),
            (0, 0, stride[2] - 1),
            (0, 0, 0),
        ),
    )
    glen = gd.shape[1:4]
    pshape = tuple(
        i + p[0] + p[1] for i, p in zip(ispatial, padding)
    )
    dxp = jnp.zeros((N, *pshape, C), acc)
    for a in range(ks[0]):
        for b in range(ks[1]):
            for c in range(ks[2]):
                tap = (
                    gd.astype(acc)
                    * kern[a, b, c, 0].astype(acc)
                )
                dxp = dxp + lax.pad(
                    tap,
                    jnp.zeros((), acc),
                    (
                        (0, 0, 0),
                        (a, pshape[0] - a - glen[0], 0),
                        (b, pshape[1] - b - glen[1], 0),
                        (c, pshape[2] - c - glen[2], 0),
                        (0, 0, 0),
                    ),
                )
    dx = lax.slice(
        dxp,
        (0, padding[0][0], padding[1][0], padding[2][0], 0),
        (
            N,
            padding[0][0] + ispatial[0],
            padding[1][0] + ispatial[1],
            padding[2][0] + ispatial[2],
            C,
        ),
    ).astype(x.dtype)
    return dx, dk


_dw_tap.defvjp(_dw_fwd, _dw_bwd)
