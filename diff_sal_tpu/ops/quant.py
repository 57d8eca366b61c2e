"""Int8 quantization for the framework's dense dots (VERDICT r3 item 4).

Two eval-time modes, applied per-site via config flags (e.g.
`MViTConfig.mlp_quant`):

  "w8"   — weights stored int8 with per-output-channel scales; the dot
           runs in the activation dtype (XLA fuses the int8->bf16 convert
           into the operand load, so the weight HBM stream halves).
  "w8a8" — weights int8 per-channel + activations quantized per-row
           (dynamic absmax) to int8; the dot runs on the MXU's native
           int8 path (2x bf16 rate on v5e), accumulating int32.

Quantized parameters are produced OUTSIDE jit by `quantize_like`, which
maps an fp param tree onto the structure a quant-enabled model's `init`
declares ("kernel" -> "kernel_q" + "kernel_scale"). Nothing here touches
the training path: quantization is a deployment transform, mirroring how
the reference would export a torch int8 model (there is no quantization
in the reference — this is the TPU-serving lever BASELINE.md's north-star
analysis identifies; see docs/PERF.md round-4 roofline).
"""

from typing import Any, Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

QUANT_MODES = ("none", "w8", "w8a8")


def quantize_kernel(w: np.ndarray):
    """Per-output-channel symmetric int8: w ~= q * scale[None, :]."""
    w = np.asarray(w, np.float32)
    s = np.abs(w).max(axis=tuple(range(w.ndim - 1))) / 127.0
    s = np.where(s == 0.0, 1.0, s).astype(np.float32)
    q = np.clip(np.rint(w / s), -127, 127).astype(np.int8)
    return q, s


def _quant_rows(x: jnp.ndarray):
    """Dynamic per-row absmax int8 quantization of the trailing axis."""
    xf = x.astype(jnp.float32)
    ax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    ax = jnp.maximum(ax, 1e-12)
    q = jnp.clip(jnp.round(xf * (127.0 / ax)), -127, 127).astype(jnp.int8)
    return q, ax * (1.0 / 127.0)


class QuantDense(nn.Module):
    """Drop-in for nn.Dense with int8 kernel storage.

    `init` declares a ZERO int8 kernel — quantized models are never
    trained; real values come from `quantize_like` over an fp tree.
    """

    features: int
    mode: str  # "w8" | "w8a8"
    use_bias: bool = True
    dtype: Optional[Any] = None
    # kept so quantize_like targets share Mlp's signature surface
    kernel_init: Callable = nn.initializers.zeros

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        assert self.mode in ("w8", "w8a8"), self.mode
        cin = x.shape[-1]
        wq = self.param(
            "kernel_q", nn.initializers.zeros, (cin, self.features), jnp.int8
        )
        scale = self.param(
            "kernel_scale", nn.initializers.ones, (self.features,),
            jnp.float32,
        )
        out_dt = self.dtype or x.dtype
        if self.mode == "w8":
            y = jax.lax.dot_general(
                x, wq.astype(x.dtype),
                dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            y = y * scale
        else:
            xq, xs = _quant_rows(x)
            y = jax.lax.dot_general(
                xq, wq,
                dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            y = y.astype(jnp.float32) * xs * scale
        if self.use_bias:
            b = self.param(
                "bias", nn.initializers.zeros, (self.features,), jnp.float32
            )
            y = y + b
        return y.astype(out_dt)


def quantize_like(fp_params, q_template):
    """Map an fp param tree onto a quant model's param structure.

    Wherever `q_template` declares {"kernel_q", "kernel_scale"}, the fp
    tree must hold a {"kernel"} at the same path; it is quantized per
    output channel. All other leaves pass through from the fp tree
    (shapes asserted against the template).
    """

    def rec(fp, tp, path):
        if isinstance(tp, dict):
            if "kernel_q" in tp:
                assert "kernel" in fp, f"no fp kernel at {path}"
                q, s = quantize_kernel(np.asarray(fp["kernel"], np.float32))
                out = {"kernel_q": jnp.asarray(q),
                       "kernel_scale": jnp.asarray(s)}
                if "bias" in tp:
                    out["bias"] = jnp.asarray(fp["bias"], jnp.float32)
                extra = set(tp) - set(out)
                assert not extra, f"unhandled quant leaves {extra} at {path}"
                return out
            assert set(tp) == set(fp), (
                f"tree mismatch at {path}: {set(tp) ^ set(fp)}"
            )
            return {k: rec(fp[k], tp[k], path + (k,)) for k in tp}
        assert jnp.shape(fp) == jnp.shape(tp), path
        return fp

    return jax.tree_util.tree_map(
        lambda x: x, rec(fp_params, q_template, ())
    )
