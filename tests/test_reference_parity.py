"""Full-model numerical parity against the ACTUAL reference implementation.

Imports `/root/reference`'s torch modules directly (models/mvit.py,
models/saliency_decoder/sal_unet.py, models/diff_model.py), pushes a
randomly-initialized reference state_dict through our converters
(train/convert.py), and asserts the full forward matches at the reference
shape contract (1,3,16,224,384) video + (1,1,9,112,192) audio in f32.

The reference's third-party deps (timm, mmcv) are not installed in this
image; the few symbols it uses (DropPath, trunc_normal_, to_2tuple,
Registry, get_logger) are stubbed below with faithful eval-time semantics —
DropPath is identity in eval mode, trunc_normal_ only affects init values
(irrelevant: we copy the state_dict), Registry.build is mmcv's
non-mutating type-pop construction.
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"


def _install_stubs():
    if "timm" in sys.modules:
        return
    import logging

    timm = types.ModuleType("timm")
    timm_models = types.ModuleType("timm.models")
    layers = types.ModuleType("timm.models.layers")

    class DropPath(torch.nn.Module):
        def __init__(self, drop_prob=None):
            super().__init__()
            self.drop_prob = drop_prob or 0.0

        def forward(self, x):
            if self.drop_prob == 0.0 or not self.training:
                return x
            keep = 1.0 - self.drop_prob
            shape = (x.shape[0],) + (1,) * (x.ndim - 1)
            mask = keep + torch.rand(shape, dtype=x.dtype, device=x.device)
            return x.div(keep) * mask.floor_()

    def trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
        with torch.no_grad():
            tensor.normal_(mean, std).clamp_(min=a * std, max=b * std)
        return tensor

    def _ntuple(n):
        def parse(x):
            if isinstance(x, (tuple, list)):
                return tuple(x)
            return tuple([x] * n)

        return parse

    layers.DropPath = DropPath
    layers.trunc_normal_ = trunc_normal_
    layers.to_2tuple = _ntuple(2)
    layers.to_3tuple = _ntuple(3)
    timm.models = timm_models
    timm_models.layers = layers
    sys.modules["timm"] = timm
    sys.modules["timm.models"] = timm_models
    sys.modules["timm.models.layers"] = layers

    mmcv = types.ModuleType("mmcv")
    mmcv_utils = types.ModuleType("mmcv.utils")

    class Registry:
        def __init__(self, name):
            self.name = name
            self._m = {}

        def register_module(self, *a, **kw):
            def deco(cls):
                self._m[cls.__name__] = cls
                return cls

            return deco

        def get(self, key):
            return self._m[key]

        def build(self, cfg):
            cfg = dict(cfg)
            cls = cfg.pop("type")
            if isinstance(cls, str):
                cls = self._m[cls]
            return cls(**cfg)

    def get_logger(name, log_file=None, log_level=logging.INFO, **kw):
        return logging.getLogger(name)

    mmcv_utils.Registry = Registry
    mmcv_utils.get_logger = get_logger
    mmcv.utils = mmcv_utils
    sys.modules["mmcv"] = mmcv
    sys.modules["mmcv.utils"] = mmcv_utils


def _ref_model():
    """The reference VideoSaliencyModel with the cfgs/audio_visual.py
    architecture (cfgs/audio_visual.py:25-84), random init, eval mode."""
    _install_stubs()
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from models.diff_model import VideoSaliencyModel as RefModel  # noqa: E501
    from models.mvit import MViT  # noqa: F401  (registers)
    from models.saliency_decoder.sal_unet import SalUNet  # noqa: F401
    from models.audio_attention import AudioAttnNet  # noqa: F401
    from models.vggish import VGGish  # noqa: F401

    torch.manual_seed(0)
    model = RefModel(
        channel_list=[96, 192, 384, 768],
        visual_net=dict(type=MViT, arch="small", pretrained=None,
                        out_scales=[0, 1, 2, 3]),
        spatiotemp_net=dict(
            type=AudioAttnNet, depth=1, heads=2, dim=512, mlp_dim=256,
            patch_dim=512, num_patches=16, height=7, width=12, pool="cls",
            dim_head=64, dropout=0.0, emb_dropout=0.0,
        ),
        audio_net=dict(type=VGGish, pretrained=False),
        decoder_net=dict(
            type=SalUNet, image_based=True, img_size=(224, 384),
            frames_len=16, tasks=["futr"], in_index=[0, 1, 2, 3],
            idx_to_planes={0: 96, 1: 192, 2: 384, 3: 768},
            mid_num_stages=4, temporal_size=9, temporal_list=[5, 5, 5, 5],
            keep_max_len=5, exclude_layers=[], futr_num_stages=0,
            ori_embed_dim=768, down_embed_dim=96,
            patch_size=[0, 3, 3, 3], patch_stride=[0, 1, 1, 1],
            patch_padding=[0, 2, 2, 2], up_channel=[768, 384, 192, 96],
            num_heads=[2, 2, 2, 2], mlp_ratio=[2.0, 2.0, 2.0, 2.0],
            drop_path_rate=[0.15, 0.15, 0.15, 0.15],
            qkv_bias=[True, True, True, True],
            kv_proj_method=["avg", "avg", "avg", "avg"],
            kernel_kv=[2, 4, 8, 16], padding_kv=[0, 0, 0, 0],
            stride_kv=[2, 4, 8, 16],
            q_proj_method=["dw_bn", "dw_bn", "dw_bn", "dw_bn"],
            kernel_q=[3, 3, 3, 3], padding_q=[1, 1, 1, 1],
            stride_q=[1, 1, 1, 1],
        ),
    )
    # randomize BN running stats so eval-mode parity actually covers them
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, (torch.nn.BatchNorm2d, torch.nn.BatchNorm3d)):
                m.running_mean.normal_(0, 0.02)
                m.running_var.uniform_(0.8, 1.2)
    return model.eval()


@pytest.mark.slow
def test_full_model_forward_parity_vs_reference():
    """Encoder pyramid + full denoiser output vs /root/reference at the
    reference shape contract (SURVEY.md §3.5), converted via
    convert_video_saliency_model. max|delta| < 1e-4 in f32."""
    import jax
    import jax.numpy as jnp

    from diff_sal_tpu.config import ModelConfig
    from diff_sal_tpu.models.diff_model import VideoSaliencyModel
    from diff_sal_tpu.train.convert import convert_video_saliency_model

    ref = _ref_model()
    sd = ref.state_dict()
    variables = convert_video_saliency_model(sd)
    variables = jax.tree.map(jnp.asarray, variables)

    rng = np.random.RandomState(0)
    img = rng.randn(1, 3, 16, 224, 384).astype(np.float32) * 0.5
    audio = rng.randn(1, 1, 9, 112, 192).astype(np.float32)
    x_t = rng.randn(1, 1, 224, 384).astype(np.float32)
    t = np.asarray([7.0], np.float32)

    with torch.no_grad():
        # encoder pyramid parity first (isolates MViT from the decoder)
        ref_pyr = ref.visual_net(torch.from_numpy(img))
        ref_out = ref(
            {
                "img": torch.from_numpy(img),
                "input": torch.from_numpy(x_t),
                "audio": torch.from_numpy(audio),
            },
            torch.from_numpy(t),
        )

    import dataclasses

    # the shipped default is the tanh-approximate GELU (1 bf16 ULP); this
    # test compares f32 vs torch nn.GELU (exact erf), so pin "exact"
    cfg = ModelConfig.audio_visual()
    cfg = dataclasses.replace(
        cfg,
        visual=dataclasses.replace(cfg.visual, gelu="exact"),
        decoder=dataclasses.replace(cfg.decoder, gelu="exact"),
    )
    model = VideoSaliencyModel(cfg)
    rgb = jnp.asarray(np.transpose(img, (0, 2, 3, 4, 1)))
    aud = jnp.asarray(np.transpose(audio, (0, 2, 3, 4, 1)))
    x = jnp.asarray(np.transpose(x_t, (0, 2, 3, 1)))

    ours_pyr = model.apply(
        variables, rgb, method=VideoSaliencyModel.encode_visual
    )
    for i, (r, o) in enumerate(zip(ref_pyr, ours_pyr)):
        r = r.numpy()  # (B, C, T, H, W)
        o = np.transpose(np.asarray(o), (0, 4, 1, 2, 3))
        # f32 reassociation noise accumulates over 16 blocks at 43k tokens;
        # observed max|delta| ~4e-4 (pre-norm activations are O(1-10))
        np.testing.assert_allclose(
            o, r, atol=1e-3, err_msg=f"pyramid scale {i}"
        )

    ours = model.apply(
        variables, {"rgb": rgb, "input": x, "audio": aud},
        jnp.asarray(t),
    )
    ours = np.transpose(np.asarray(ours), (0, 3, 1, 2))
    np.testing.assert_allclose(ours, ref_out.numpy(), atol=1e-4)


@pytest.mark.slow
def test_converter_roundtrip_through_reference():
    """export_* writes a state_dict the reference model can load strictly,
    and the round trip is lossless (convert.py:396-530)."""
    import jax.numpy as jnp

    from diff_sal_tpu.train.convert import (
        convert_video_saliency_model,
        export_mvit,
        export_salunet,
    )

    ref = _ref_model()
    sd = {k: v for k, v in ref.state_dict().items()}
    variables = convert_video_saliency_model(sd)

    back_m = export_mvit(variables["params"]["visual_net"])
    back_s = export_salunet(
        variables["params"]["decoder_net"],
        variables["batch_stats"]["decoder_net"],
    )
    missing_m, unexpected_m = ref.visual_net.load_state_dict(
        {k: torch.from_numpy(np.asarray(v)) for k, v in back_m.items()},
        strict=False,
    )
    assert not unexpected_m, unexpected_m[:5]
    missing_s, unexpected_s = ref.decoder_net.load_state_dict(
        {k: torch.from_numpy(np.asarray(v)) for k, v in back_s.items()},
        strict=False,
    )
    assert not unexpected_s, unexpected_s[:5]
    for k, v in back_m.items():
        np.testing.assert_allclose(
            np.asarray(v), sd["visual_net." + k].numpy(), atol=1e-6,
            err_msg=k,
        )
    for k, v in back_s.items():
        np.testing.assert_allclose(
            np.asarray(v), sd["decoder_net." + k].numpy(), atol=1e-6,
            err_msg=k,
        )

@pytest.mark.slow
def test_shipping_defaults_parity_bound():
    """E2E delta of the AS-SHIPPED default stack vs the exact path and vs
    the converted torch reference (VERDICT r3 item 5).

    The per-lever equality tests bound each default-ON perf lever in
    isolation (tanh GELU ~1 bf16 ULP, exp2 softmax, fuse_kv, qkv_conv,
    skip_dead_frames, fused decoder tail are exact); this test bounds the
    COMPOSED stack end-to-end — the number the <=1% metric-delta north
    star (BASELINE.json) actually constrains. Three forwards share one
    converted param tree on a fixed batch at the reference shape contract
    (SURVEY.md 3.5):

      ref      torch reference, f32 (exact erf GELU)
      exact    our model, gelu="exact", f32
      shipped  our model, ALL defaults as bench.py ships them, bf16

    Asserts (tolerances = measured headroom ~2x, values in the assert
    messages are the documented measurement):
      - max|shipped - ref| absolute bound on the raw denoiser output
      - CC/SIM between normalized saliency maps >= 0.99 / 0.97
      - NSS relative delta <= 1% against fixations drawn from the
        reference map's own top-0.3% pixels
    """
    import dataclasses

    import jax
    import jax.numpy as jnp

    from diff_sal_tpu.config import ModelConfig
    from diff_sal_tpu.metrics.saliency import CC, NSS, SIM, normalize_map
    from diff_sal_tpu.models.diff_model import VideoSaliencyModel
    from diff_sal_tpu.train.convert import convert_video_saliency_model

    ref = _ref_model()
    variables = jax.tree.map(
        jnp.asarray, convert_video_saliency_model(ref.state_dict())
    )

    rng = np.random.RandomState(42)
    img = rng.randn(1, 3, 16, 224, 384).astype(np.float32) * 0.5
    audio = rng.randn(1, 1, 9, 112, 192).astype(np.float32)
    x_t = rng.randn(1, 1, 224, 384).astype(np.float32)
    t = np.asarray([7.0], np.float32)

    with torch.no_grad():
        ref_out = ref(
            {
                "img": torch.from_numpy(img),
                "input": torch.from_numpy(x_t),
                "audio": torch.from_numpy(audio),
            },
            torch.from_numpy(t),
        ).numpy()[:, 0]  # (1, 224, 384)

    rgb = jnp.asarray(np.transpose(img, (0, 2, 3, 4, 1)))
    aud = jnp.asarray(np.transpose(audio, (0, 2, 3, 4, 1)))
    x = jnp.asarray(np.transpose(x_t, (0, 2, 3, 1)))
    batch = {"rgb": rgb, "input": x, "audio": aud}

    def run(cfg):
        model = VideoSaliencyModel(cfg)
        out = model.apply(variables, batch, jnp.asarray(t))
        return np.asarray(out, np.float32)[..., 0]  # (1, 224, 384)

    cfg = ModelConfig.audio_visual()  # ALL perf defaults ON, f32
    exact = run(
        dataclasses.replace(
            cfg,
            visual=dataclasses.replace(cfg.visual, gelu="exact"),
            decoder=dataclasses.replace(cfg.decoder, gelu="exact"),
        )
    )
    shipped = run(dataclasses.replace(cfg, compute_dtype="bfloat16"))

    # (a) raw-output bounds; print the measured numbers for the record
    d_exact = float(np.abs(exact - ref_out).max())
    d_ship = float(np.abs(shipped - ref_out).max())
    scale = float(np.abs(ref_out).max())
    print(f"max|exact-ref|={d_exact:.3e}  max|shipped-ref|={d_ship:.3e}  "
          f"|ref|max={scale:.3f}")
    # measured 2026-08 (fixed seed 42): exact 2.99e-5, shipped 5.47e-4 on
    # |ref|max 0.52 — bounds are ~10x the measurement
    assert d_exact < 3e-4, f"exact-mode f32 drift {d_exact}"
    assert d_ship < 5e-3, f"shipped bf16 stack drift {d_ship}"

    # (b) metric deltas on normalized maps — the north-star quantity
    m_ref = normalize_map(ref_out[0])
    m_ship = normalize_map(shipped[0])
    cc = CC(m_ship, m_ref)
    sim = SIM(m_ship, m_ref)
    # fixations: top 0.3% pixels of the reference map
    thr = np.quantile(ref_out[0], 0.997)
    fix = (ref_out[0] >= thr).astype(np.float32)
    nss_ref = NSS(normalize_map(exact[0]), fix)
    nss_ship = NSS(m_ship, fix)
    rel = abs(nss_ship - nss_ref) / max(abs(nss_ref), 1e-6)
    print(f"CC={cc:.5f} SIM={sim:.5f} NSS ref={nss_ref:.4f} "
          f"shipped={nss_ship:.4f} rel={rel:.4%}")
    # measured: CC 0.99965, SIM 0.99736, NSS rel delta 0.2015%
    assert cc >= 0.995, f"CC(shipped, ref) = {cc}"
    assert sim >= 0.99, f"SIM(shipped, ref) = {sim}"
    assert rel <= 0.01, f"NSS relative delta {rel:.4%} > 1%"
