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


# ---------------------------------------------------------------------------
# Full-model converters
# ---------------------------------------------------------------------------


def convert_mvit(sd: Dict, num_layers: int = 16) -> Dict:
    """Kinetics/DiffSal MViT state_dict (keys already stripped of any
    'backbone.'/'visual_net.' prefix — reference mvit.py:1076 strips
    'backbone.') -> MViT module variables.

    Reference module tree: patch_embed.projection, cls_token,
    blocks.{i}.{norm1,attn.{qkv,proj,pool_q/k/v,norm_q/k/v,rel_pos_*},
    norm2,mlp.{fc1,fc2},proj?}, norm{0..3}.
    Rel-pos tables of mismatched length are linearly interpolated
    (mvit.py:1079-1099) by the flax module itself at run time via
    resize_rel_pos, so they are copied verbatim here when lengths match and
    interpolated when not (length taken from `target_lens` if provided).
    """
    params: Dict = {
        "patch_embed": {
            "projection": {
                "kernel": conv3d_kernel(sd["patch_embed.projection.weight"]),
                "bias": _np(sd["patch_embed.projection.bias"]),
            }
        },
        "cls_token": _np(sd["cls_token"]).reshape(1, 1, -1),
    }
    for i in range(num_layers):
        pfx = f"blocks.{i}."
        blk: Dict = {
            "norm1": ln_params(pfx + "norm1", sd),
            "norm2": ln_params(pfx + "norm2", sd),
            "mlp": {
                "fc1": {
                    "kernel": linear_kernel(sd[pfx + "mlp.fc1.weight"]),
                    "bias": _np(sd[pfx + "mlp.fc1.bias"]),
                },
                "fc2": {
                    "kernel": linear_kernel(sd[pfx + "mlp.fc2.weight"]),
                    "bias": _np(sd[pfx + "mlp.fc2.bias"]),
                },
            },
            "attn": {
                "qkv": {
                    "kernel": linear_kernel(sd[pfx + "attn.qkv.weight"]),
                    "bias": _np(sd[pfx + "attn.qkv.bias"]),
                },
                "proj": {
                    "kernel": linear_kernel(sd[pfx + "attn.proj.weight"]),
                    "bias": _np(sd[pfx + "attn.proj.bias"]),
                },
                "rel_pos_t": _np(sd[pfx + "attn.rel_pos_t"]),
                "rel_pos_h": _np(sd[pfx + "attn.rel_pos_h"]),
                "rel_pos_w": _np(sd[pfx + "attn.rel_pos_w"]),
            },
        }
        for p in ("q", "k", "v"):
            blk["attn"][f"pool_{p}"] = {
                "pool": {
                    "kernel": depthwise_conv3d_kernel(
                        sd[pfx + f"attn.pool_{p}.weight"]
                    )
                },
                "norm": ln_params(pfx + f"attn.norm_{p}", sd),
            }
        if pfx + "proj.weight" in sd:
            blk["proj"] = {
                "kernel": linear_kernel(sd[pfx + "proj.weight"]),
                "bias": _np(sd[pfx + "proj.bias"]),
            }
        params[f"blocks_{i}"] = blk
    for s in range(4):
        if f"norm{s}.weight" in sd:
            params[f"norm{s}"] = ln_params(f"norm{s}", sd)
    return {"params": params}


def _upembed_variables(prefix: str, sd: Dict) -> Dict:
    """UpEmbed: proj = [Upsample, conv, BN, ReLU, conv, BN, ReLU]
    (reference common_block.py:196-216) -> conv0/bn0/conv1/bn1."""
    out = {"params": {}, "batch_stats": {}}
    for j, (ci, bi) in enumerate([(1, 2), (4, 5)]):
        out["params"][f"conv{j}"] = {
            "kernel": conv2d_kernel(sd[f"{prefix}.proj.{ci}.weight"])
        }
        bn = bn_variables(f"{prefix}.proj.{bi}", sd)
        out["params"][f"bn{j}"] = bn["params"]
        out["batch_stats"][f"bn{j}"] = bn["batch_stats"]
    return out


def convert_salunet(sd: Dict, num_stages: int = 4) -> Dict:
    """DiffSal best.pth decoder subtree (keys stripped of
    'decoder_net.'/'module.decoder_net.') -> SalUNet module variables."""
    params: Dict = {}
    stats: Dict = {}

    # timestep MLP (reference sal_unet.py:231-237: temb.dense.{0,1})
    params["temb"] = {
        f"dense{j}": {
            "kernel": linear_kernel(sd[f"temb.dense.{j}.weight"]),
            "bias": _np(sd[f"temb.dense.{j}.bias"]),
        }
        for j in (0, 1)
    }

    # noise encoder
    ne: Dict = {
        "conv_in": {
            "kernel": conv2d_kernel(sd["conv_in.weight"]),
            "bias": _np(sd["conv_in.bias"]),
        },
        "down1": {
            "conv": {
                "kernel": conv2d_kernel(sd["down1.conv.weight"]),
                "bias": _np(sd["down1.conv.bias"]),
            }
        },
    }
    for i in range(3):
        rb = f"res_encoder.{i}.0."
        blk = {
            "norm1": {"scale": _np(sd[rb + "norm1.weight"]),
                      "bias": _np(sd[rb + "norm1.bias"])},
            "conv1": {"kernel": conv2d_kernel(sd[rb + "conv1.weight"]),
                      "bias": _np(sd[rb + "conv1.bias"])},
            "temb_proj": {"kernel": linear_kernel(sd[rb + "temb_proj.weight"]),
                          "bias": _np(sd[rb + "temb_proj.bias"])},
            "norm2": {"scale": _np(sd[rb + "norm2.weight"]),
                      "bias": _np(sd[rb + "norm2.bias"])},
            "conv2": {"kernel": conv2d_kernel(sd[rb + "conv2.weight"]),
                      "bias": _np(sd[rb + "conv2.bias"])},
        }
        if rb + "nin_shortcut.weight" in sd:
            blk["nin_shortcut"] = {
                "kernel": conv2d_kernel(sd[rb + "nin_shortcut.weight"]),
                "bias": _np(sd[rb + "nin_shortcut.bias"]),
            }
        ne[f"res{i}"] = blk
        ne[f"res_down{i}"] = {
            "conv": {
                "kernel": conv2d_kernel(sd[f"res_encoder.{i}.1.conv.weight"]),
                "bias": _np(sd[f"res_encoder.{i}.1.conv.bias"]),
            }
        }
    params["noise_encoder"] = ne

    # decoder stages
    dec: Dict = {}
    dec_stats: Dict = {}
    for i in range(num_stages):
        spfx = f"invpt_decoder.mid_stages.{i}."
        stage: Dict = {}
        stage_stats: Dict = {}
        if spfx + "patch_embed.0.proj.1.weight" in sd:
            ue = _upembed_variables(spfx + "patch_embed.0", sd)
            stage["patch_embed"] = ue["params"]
            stage_stats["patch_embed"] = ue["batch_stats"]
        bpfx = spfx + "blocks.0."
        block: Dict = {
            "norm": ln_params(bpfx + "norm", sd),
            "norm2": ln_params(bpfx + "norm2", sd),
            "mlp": {
                "fc1": {"kernel": linear_kernel(sd[bpfx + "mlp.fc1.weight"]),
                        "bias": _np(sd[bpfx + "mlp.fc1.bias"])},
                "fc2": {"kernel": linear_kernel(sd[bpfx + "mlp.fc2.weight"]),
                        "bias": _np(sd[bpfx + "mlp.fc2.bias"])},
            },
        }
        if bpfx + "align_conv.weight" in sd:
            block["align_conv"] = {
                "kernel": conv2d_kernel(sd[bpfx + "align_conv.weight"]),
                "bias": _np(sd[bpfx + "align_conv.bias"]),
            }
        attn: Dict = {}
        for p in ("q", "k", "v"):
            attn[f"conv_proj_{p}"] = {
                "kernel": depthwise_conv3d_center_slice_to_2d(
                    sd[bpfx + f"attn.conv_proj_{p}.conv.weight"]
                )
            }
            # reference names the LayerNorm inside conv_proj 'bn'
            attn[f"norm_{p}"] = ln_params(bpfx + f"attn.conv_proj_{p}.bn", sd)
            attn[f"proj_{p}"] = {
                "kernel": linear_kernel(sd[bpfx + f"attn.proj_{p}.weight"]),
                "bias": _np(sd[bpfx + f"attn.proj_{p}.bias"]),
            }
        attn["proj"] = {
            "kernel": linear_kernel(sd[bpfx + "attn.proj.weight"]),
            "bias": _np(sd[bpfx + "attn.proj.bias"]),
        }
        block["attn"] = attn
        stage["block"] = block
        dec[f"stage{i}"] = stage
        if stage_stats:
            dec_stats[f"stage{i}"] = stage_stats
        dec[f"norm_mt{i}"] = ln_params(f"invpt_decoder.norm_mts.{i}", sd)
        dec[f"redu_chan{i}"] = {
            "conv": {
                "kernel": conv3d_kernel(
                    sd[f"invpt_decoder.redu_chan_up.{i}.proj.0.weight"]
                )
            }
        }
    # mt_proj conv-bn-relu
    dec["mt_proj"] = {
        "conv": {
            "kernel": conv2d_kernel(sd["invpt_decoder.mt_proj.0.weight"]),
            "bias": _np(sd["invpt_decoder.mt_proj.0.bias"]),
        },
        "bn": bn_variables("invpt_decoder.mt_proj.1", sd)["params"],
    }
    dec_stats["mt_proj"] = {
        "bn": bn_variables("invpt_decoder.mt_proj.1", sd)["batch_stats"]
    }
    params["decoder"] = dec
    stats["decoder"] = dec_stats

    params["logits"] = {
        "linear_pred": {
            "kernel": conv2d_kernel(sd["logits.linear_pred.weight"]),
            "bias": _np(sd["logits.linear_pred.bias"]),
        }
    }
    return {"params": params, "batch_stats": stats}


def split_diffsal_state_dict(sd: Dict) -> Dict[str, Dict]:
    """Split a full DiffSal best.pth (module.-prefixed VideoSaliencyModel)
    into per-subnet state dicts keyed like our submodules."""
    out: Dict[str, Dict] = {
        "visual_net": {}, "audio_net": {}, "spatiotemp_net": {},
        "decoder_net": {}, "other": {},
    }
    for k, v in sd.items():
        k2 = k[len("module."):] if k.startswith("module.") else k
        for sub in ("visual_net", "audio_net", "spatiotemp_net", "decoder_net"):
            if k2.startswith(sub + "."):
                out[sub][k2[len(sub) + 1:]] = v
                break
        else:
            out["other"][k2] = v
    return out


def convert_video_saliency_model(sd: Dict, num_mvit_layers: int = 16) -> Dict:
    """Full best.pth -> VideoSaliencyModel variables (params + batch_stats)."""
    parts = split_diffsal_state_dict(sd)
    params: Dict = {}
    stats: Dict = {}
    if parts["visual_net"]:
        params["visual_net"] = convert_mvit(
            parts["visual_net"], num_mvit_layers
        )["params"]
    if parts["audio_net"]:
        params["audio_net"] = convert_vggish(parts["audio_net"])["params"]
    if parts["spatiotemp_net"]:
        params["spatiotemp_net"] = convert_audio_attn(
            parts["spatiotemp_net"]
        )["params"]
    if parts["decoder_net"]:
        dv = convert_salunet(parts["decoder_net"])
        params["decoder_net"] = dv["params"]
        stats["decoder_net"] = dv["batch_stats"]
    return {"params": params, "batch_stats": stats}


# ---------------------------------------------------------------------------
# Inverse: export our variables to a reference-format state_dict
# ---------------------------------------------------------------------------


def _inv_linear(k):
    return _np(k).T


def _inv_conv2d(k):
    return _np(k).transpose(3, 2, 0, 1)


def _inv_conv3d(k):
    return _np(k).transpose(4, 3, 0, 1, 2)


def _inv_dw3d(k):
    return _np(k).transpose(4, 3, 0, 1, 2)


def _inv_dw2d_to_3d_center(k, kt=3):
    """2D depthwise kernel -> torch Conv3d (C,1,kt,kh,kw) with the center
    slice populated (the dead +-1 temporal taps zeroed)."""
    k2 = _np(k).transpose(3, 2, 0, 1)  # (C,1,kh,kw)
    out = np.zeros((k2.shape[0], 1, kt, k2.shape[2], k2.shape[3]), k2.dtype)
    out[:, :, kt // 2] = k2
    return out


def export_mvit(params: Dict, num_layers: int = 16) -> Dict:
    sd: Dict = {
        "patch_embed.projection.weight": _inv_conv3d(
            params["patch_embed"]["projection"]["kernel"]
        ),
        "patch_embed.projection.bias": _np(
            params["patch_embed"]["projection"]["bias"]
        ),
        "cls_token": _np(params["cls_token"]),
    }
    for i in range(num_layers):
        blk = params[f"blocks_{i}"]
        pfx = f"blocks.{i}."
        sd[pfx + "norm1.weight"] = _np(blk["norm1"]["scale"])
        sd[pfx + "norm1.bias"] = _np(blk["norm1"]["bias"])
        sd[pfx + "norm2.weight"] = _np(blk["norm2"]["scale"])
        sd[pfx + "norm2.bias"] = _np(blk["norm2"]["bias"])
        for fc in ("fc1", "fc2"):
            sd[pfx + f"mlp.{fc}.weight"] = _inv_linear(blk["mlp"][fc]["kernel"])
            sd[pfx + f"mlp.{fc}.bias"] = _np(blk["mlp"][fc]["bias"])
        at = blk["attn"]
        sd[pfx + "attn.qkv.weight"] = _inv_linear(at["qkv"]["kernel"])
        sd[pfx + "attn.qkv.bias"] = _np(at["qkv"]["bias"])
        sd[pfx + "attn.proj.weight"] = _inv_linear(at["proj"]["kernel"])
        sd[pfx + "attn.proj.bias"] = _np(at["proj"]["bias"])
        for p in ("t", "h", "w"):
            sd[pfx + f"attn.rel_pos_{p}"] = _np(at[f"rel_pos_{p}"])
        for p in ("q", "k", "v"):
            sd[pfx + f"attn.pool_{p}.weight"] = _inv_dw3d(
                at[f"pool_{p}"]["pool"]["kernel"]
            )
            sd[pfx + f"attn.norm_{p}.weight"] = _np(at[f"pool_{p}"]["norm"]["scale"])
            sd[pfx + f"attn.norm_{p}.bias"] = _np(at[f"pool_{p}"]["norm"]["bias"])
        if "proj" in blk:
            sd[pfx + "proj.weight"] = _inv_linear(blk["proj"]["kernel"])
            sd[pfx + "proj.bias"] = _np(blk["proj"]["bias"])
    for s in range(4):
        if f"norm{s}" in params:
            sd[f"norm{s}.weight"] = _np(params[f"norm{s}"]["scale"])
            sd[f"norm{s}.bias"] = _np(params[f"norm{s}"]["bias"])
    return sd


def export_salunet(params: Dict, batch_stats: Dict, num_stages: int = 4) -> Dict:
    sd: Dict = {}
    for j in (0, 1):
        sd[f"temb.dense.{j}.weight"] = _inv_linear(
            params["temb"][f"dense{j}"]["kernel"]
        )
        sd[f"temb.dense.{j}.bias"] = _np(params["temb"][f"dense{j}"]["bias"])
    ne = params["noise_encoder"]
    sd["conv_in.weight"] = _inv_conv2d(ne["conv_in"]["kernel"])
    sd["conv_in.bias"] = _np(ne["conv_in"]["bias"])
    sd["down1.conv.weight"] = _inv_conv2d(ne["down1"]["conv"]["kernel"])
    sd["down1.conv.bias"] = _np(ne["down1"]["conv"]["bias"])
    for i in range(3):
        rb = ne[f"res{i}"]
        pfx = f"res_encoder.{i}.0."
        for nm in ("norm1", "norm2"):
            sd[pfx + nm + ".weight"] = _np(rb[nm]["scale"])
            sd[pfx + nm + ".bias"] = _np(rb[nm]["bias"])
        for nm in ("conv1", "conv2"):
            sd[pfx + nm + ".weight"] = _inv_conv2d(rb[nm]["kernel"])
            sd[pfx + nm + ".bias"] = _np(rb[nm]["bias"])
        sd[pfx + "temb_proj.weight"] = _inv_linear(rb["temb_proj"]["kernel"])
        sd[pfx + "temb_proj.bias"] = _np(rb["temb_proj"]["bias"])
        if "nin_shortcut" in rb:
            sd[pfx + "nin_shortcut.weight"] = _inv_conv2d(
                rb["nin_shortcut"]["kernel"]
            )
            sd[pfx + "nin_shortcut.bias"] = _np(rb["nin_shortcut"]["bias"])
        sd[f"res_encoder.{i}.1.conv.weight"] = _inv_conv2d(
            ne[f"res_down{i}"]["conv"]["kernel"]
        )
        sd[f"res_encoder.{i}.1.conv.bias"] = _np(
            ne[f"res_down{i}"]["conv"]["bias"]
        )
    dec = params["decoder"]
    dstats = batch_stats.get("decoder", {})
    for i in range(num_stages):
        st = dec[f"stage{i}"]
        spfx = f"invpt_decoder.mid_stages.{i}."
        if "patch_embed" in st:
            pe = st["patch_embed"]
            pe_stats = dstats.get(f"stage{i}", {}).get("patch_embed", {})
            for j, (ci, bi) in enumerate([(1, 2), (4, 5)]):
                sd[spfx + f"patch_embed.0.proj.{ci}.weight"] = _inv_conv2d(
                    pe[f"conv{j}"]["kernel"]
                )
                sd[spfx + f"patch_embed.0.proj.{bi}.weight"] = _np(
                    pe[f"bn{j}"]["scale"]
                )
                sd[spfx + f"patch_embed.0.proj.{bi}.bias"] = _np(
                    pe[f"bn{j}"]["bias"]
                )
                if pe_stats:
                    sd[spfx + f"patch_embed.0.proj.{bi}.running_mean"] = _np(
                        pe_stats[f"bn{j}"]["mean"]
                    )
                    sd[spfx + f"patch_embed.0.proj.{bi}.running_var"] = _np(
                        pe_stats[f"bn{j}"]["var"]
                    )
        bpfx = spfx + "blocks.0."
        blk = st["block"]
        for nm in ("norm", "norm2"):
            sd[bpfx + nm + ".weight"] = _np(blk[nm]["scale"])
            sd[bpfx + nm + ".bias"] = _np(blk[nm]["bias"])
        for fc in ("fc1", "fc2"):
            sd[bpfx + f"mlp.{fc}.weight"] = _inv_linear(blk["mlp"][fc]["kernel"])
            sd[bpfx + f"mlp.{fc}.bias"] = _np(blk["mlp"][fc]["bias"])
        if "align_conv" in blk:
            sd[bpfx + "align_conv.weight"] = _inv_conv2d(
                blk["align_conv"]["kernel"]
            )
            sd[bpfx + "align_conv.bias"] = _np(blk["align_conv"]["bias"])
        at = blk["attn"]
        for p in ("q", "k", "v"):
            kt = 3 if p == "q" else 1
            sd[bpfx + f"attn.conv_proj_{p}.conv.weight"] = _inv_dw2d_to_3d_center(
                at[f"conv_proj_{p}"]["kernel"], kt
            )
            sd[bpfx + f"attn.conv_proj_{p}.bn.weight"] = _np(
                at[f"norm_{p}"]["scale"]
            )
            sd[bpfx + f"attn.conv_proj_{p}.bn.bias"] = _np(at[f"norm_{p}"]["bias"])
            sd[bpfx + f"attn.proj_{p}.weight"] = _inv_linear(
                at[f"proj_{p}"]["kernel"]
            )
            sd[bpfx + f"attn.proj_{p}.bias"] = _np(at[f"proj_{p}"]["bias"])
        sd[bpfx + "attn.proj.weight"] = _inv_linear(at["proj"]["kernel"])
        sd[bpfx + "attn.proj.bias"] = _np(at["proj"]["bias"])
        nm = dec[f"norm_mt{i}"]
        sd[f"invpt_decoder.norm_mts.{i}.weight"] = _np(nm["scale"])
        sd[f"invpt_decoder.norm_mts.{i}.bias"] = _np(nm["bias"])
        sd[f"invpt_decoder.redu_chan_up.{i}.proj.0.weight"] = _inv_conv3d(
            dec[f"redu_chan{i}"]["conv"]["kernel"]
        )
    sd["invpt_decoder.mt_proj.0.weight"] = _inv_conv2d(
        dec["mt_proj"]["conv"]["kernel"]
    )
    sd["invpt_decoder.mt_proj.0.bias"] = _np(dec["mt_proj"]["conv"]["bias"])
    sd["invpt_decoder.mt_proj.1.weight"] = _np(dec["mt_proj"]["bn"]["scale"])
    sd["invpt_decoder.mt_proj.1.bias"] = _np(dec["mt_proj"]["bn"]["bias"])
    mtbn = dstats.get("mt_proj", {}).get("bn")
    if mtbn is not None:
        sd["invpt_decoder.mt_proj.1.running_mean"] = _np(mtbn["mean"])
        sd["invpt_decoder.mt_proj.1.running_var"] = _np(mtbn["var"])
    sd["logits.linear_pred.weight"] = _inv_conv2d(
        params["logits"]["linear_pred"]["kernel"]
    )
    sd["logits.linear_pred.bias"] = _np(params["logits"]["linear_pred"]["bias"])
    return sd
