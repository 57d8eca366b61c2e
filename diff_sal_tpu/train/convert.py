"""PyTorch checkpoint -> flax pytree weight-layout conversion rules.

One-way converters for the released reference checkpoints (MViT Kinetics
`backbone.*`, `vggish.pth`, DiffSal `best.pth` — reference mvit.py:1072-1101,
vggish.py:114-123, model.py:17-22). The layout rules:

  Linear   (O, I)          -> kernel (I, O)
  Conv2d   (O, I, kh, kw)  -> kernel (kh, kw, I, O)
  Conv3d   (O, I, kt, kh, kw) -> (kt, kh, kw, I, O)
  depthwise Conv2d (C, 1, kh, kw)        -> (kh, kw, 1, C)
  depthwise Conv3d (C, 1, kt, kh, kw)    -> (kt, kh, kw, 1, C)
  LayerNorm/GroupNorm weight/bias        -> scale/bias (direct)
  BatchNorm weight/bias/running_mean/var -> scale/bias + batch_stats

Special case: the reference decoder's q/k/v projections are Conv3d acting on
a T=1 grid with temporal kernel 3 (q) or 1 (kv) — only the central temporal
slice ever touches data, so our 2D depthwise conv takes `w[:, :, kt//2]`
(see models/sal_unet.py CvTAttention docstring).

These functions operate on plain dicts of numpy arrays (torch tensors are
accepted and `.numpy()`-ed), so converters run without torch if arrays are
pre-extracted.
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def linear_kernel(w) -> np.ndarray:
    return _np(w).T


def conv2d_kernel(w) -> np.ndarray:
    return _np(w).transpose(2, 3, 1, 0)


def conv3d_kernel(w) -> np.ndarray:
    return _np(w).transpose(2, 3, 4, 1, 0)


def depthwise_conv2d_kernel(w) -> np.ndarray:
    # torch (C, 1, kh, kw) -> flax (kh, kw, 1, C)
    return _np(w).transpose(2, 3, 1, 0)


def depthwise_conv3d_kernel(w) -> np.ndarray:
    return _np(w).transpose(2, 3, 4, 1, 0)


def depthwise_conv3d_center_slice_to_2d(w) -> np.ndarray:
    """(C, 1, kt, kh, kw) Conv3d applied on a T=1 grid -> equivalent 2D
    depthwise kernel from the central temporal slice."""
    w = _np(w)
    kt = w.shape[2]
    return w[:, :, kt // 2].transpose(2, 3, 1, 0)


def bn_variables(prefix: str, sd: Dict) -> Dict[str, Dict[str, np.ndarray]]:
    """BatchNorm params + running stats."""
    return {
        "params": {
            "scale": _np(sd[prefix + ".weight"]),
            "bias": _np(sd[prefix + ".bias"]),
        },
        "batch_stats": {
            "mean": _np(sd[prefix + ".running_mean"]),
            "var": _np(sd[prefix + ".running_var"]),
        },
    }


def ln_params(prefix: str, sd: Dict) -> Dict[str, np.ndarray]:
    return {
        "scale": _np(sd[prefix + ".weight"]),
        "bias": _np(sd[prefix + ".bias"]),
    }


def convert_vggish(sd: Dict) -> Dict:
    """vggish.pth ('features.N.weight/bias' conv indices 0,3,6,8,11,13 +
    'embeddings.{0,2,4}') -> VGGish module variables."""
    conv_layer_ids = [0, 3, 6, 8, 11, 13]
    params = {"features": {}}
    for i, lid in enumerate(conv_layer_ids):
        params["features"][f"conv{i}"] = {
            "kernel": conv2d_kernel(sd[f"features.{lid}.weight"]),
            "bias": _np(sd[f"features.{lid}.bias"]),
        }
    for i, lid in enumerate([0, 2, 4]):
        k = f"embeddings.{lid}.weight"
        if k in sd:
            params[f"fc{i + 1}"] = {
                "kernel": linear_kernel(sd[k]),
                "bias": _np(sd[f"embeddings.{lid}.bias"]),
            }
    return {"params": params}


def convert_audio_attn(sd: Dict, prefix: str = "") -> Dict:
    """AudioAttnNet: transformer layers + final norm. The reference stores
    `transformer.layers.{i}.{0|1}...` (Attention | FeedForward); its dead
    to_patch_embedding / pos_embedding params are dropped."""
    p = prefix
    params = {}
    i = 0
    while f"{p}transformer.layers.{i}.0.norm.weight" in sd:
        att = f"{p}transformer.layers.{i}.0."
        ff = f"{p}transformer.layers.{i}.1."
        params[f"attn{i}"] = {
            "norm": ln_params(att + "norm", sd),
            "to_qkv": {"kernel": linear_kernel(sd[att + "to_qkv.weight"])},
            "to_out": {
                "kernel": linear_kernel(sd[att + "to_out.0.weight"]),
                "bias": _np(sd[att + "to_out.0.bias"]),
            },
        }
        params[f"ff{i}"] = {
            "norm": ln_params(ff + "net.0", sd),
            "fc1": {
                "kernel": linear_kernel(sd[ff + "net.1.weight"]),
                "bias": _np(sd[ff + "net.1.bias"]),
            },
            "fc2": {
                "kernel": linear_kernel(sd[ff + "net.4.weight"]),
                "bias": _np(sd[ff + "net.4.bias"]),
            },
        }
        i += 1
    params["final_norm"] = ln_params(p + "transformer.norm", sd)
    return {"params": params}


def load_torch_state_dict(path: str) -> Dict:
    """Load a .pth into numpy arrays (host-side, torch CPU)."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    sd = obj.get("state_dict", obj) if isinstance(obj, dict) else obj
    return {k: _np(v) for k, v in sd.items()}
