"""Typed configuration for the whole framework.

Replaces the reference's three-layer config stack (argparse CLI +
`cfgs/diffusion.yml` + mmcv python-file model configs consumed through a
registry — see reference `util/opts.py:5-105`, `cfgs/visual.py`,
`cfgs/audio_visual.py`, `model.py:7-9`) with plain frozen dataclasses.
Every knob of the reference, with the same defaults, is represented here.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple


@dataclasses.dataclass(frozen=True)
class DataTransformConfig:
    """Pixel-space transform knobs (reference `cfgs/diffusion.yml:1-8`,
    `datasets/__init__.py:8-35`)."""

    image_size: int = 224
    width: int = 384
    channels: int = 1
    logit_transform: bool = False
    uniform_dequantization: bool = False
    gaussian_dequantization: bool = True
    rescaled: bool = False


@dataclasses.dataclass(frozen=True)
class DiffusionConfig:
    """Forward-process definition (reference `cfgs/diffusion.yml:24-28`)."""

    beta_schedule: str = "cosine"
    beta_start: float = 0.0001
    beta_end: float = 0.02
    num_diffusion_timesteps: int = 1000


@dataclasses.dataclass(frozen=True)
class LossConfig:
    """Training-loss switches (reference `cfgs/diffusion.yml:39-51`).

    Default config is MSE-only: `(pred - gt)^2.sum((1,2,3)).mean()`
    (reference `models/sal_losses.py:189-192`)."""

    loss_kl: bool = False
    kl_weight: float = 1.0
    loss_mse: bool = True
    mse_weight: float = 1.0
    loss_ce: bool = False
    ce_weight: float = 1.0
    loss_cc: bool = False
    cc_weight: float = -0.1
    loss_sim: bool = False
    sim_weight: float = -0.1
    loss_nss: bool = False
    nss_weight: float = -0.1


@dataclasses.dataclass(frozen=True)
class OptimConfig:
    """Adam + MultiStepLR recipe (reference `cfgs/diffusion.yml:53-60`,
    `util/utils.py:116-123`)."""

    optimizer: str = "adam"
    lr: float = 1e-4
    beta1: float = 0.9
    weight_decay: float = 0.0
    eps: float = 1e-8
    amsgrad: bool = False
    grad_clip: float = 1.0
    # MultiStepLR milestones are fractions of total epochs: [0.5E, 0.75E], gamma 0.1
    milestone_fracs: Tuple[float, ...] = (0.5, 0.75)
    gamma: float = 0.1


@dataclasses.dataclass(frozen=True)
class TrainingConfig:
    """Training-loop knobs (reference `cfgs/diffusion.yml:30-37`)."""

    batch_size: int = 48
    n_epochs: int = 3
    n_epochs_for_av_data: int = 4
    snapshot_freq: int = 5000
    validation_freq: int = 10000
    log_freq: int = 200
    training_target: str = "x0"  # "x0" | "noise"
    # Reference quirk: one shared scalar t per batch
    # (diffusion_trainer.py:111-114). Set False for per-sample t (improvement).
    shared_timestep_per_batch: bool = True
    seed: int = 0
    # parameter EMA (reference ships a dead helper with ema: false,
    # cfgs/diffusion.yml:21 — ours works, same default)
    ema: bool = False
    ema_rate: float = 0.9999
    # Eval noise draws: True (default) fixes the eval rng so repeated
    # evaluations rank checkpoints on identical noise (deterministic model
    # selection); False draws fresh starting noise per evaluation like the
    # reference's per-batch randn (diffusion_trainer.py:118-120). Only
    # matters for samplers with NFE>1 or non-zero starting-noise influence.
    eval_fixed_rng: bool = True


@dataclasses.dataclass(frozen=True)
class SamplingConfig:
    """Inference sampler knobs (reference `cfgs/diffusion.yml:63-77`)."""

    batch_size: int = 2
    last_only: bool = True
    skip_type: str = "logSNR"  # logSNR | time_uniform | time_quadratic
    sample_type: str = "ddim"  # ddim | ddpm | dpmsolver | dpmsolver++
    timesteps: int = 1
    dpm_solver_order: int = 2
    denoise: bool = True
    dpm_solver_method: str = "multistep"  # multistep | singlestep
    dpm_solver_type: str = "dpmsolver"
    dpm_solver_atol: float = 0.0078
    dpm_solver_rtol: float = 0.05
    lower_order_final: bool = False
    thresholding: bool = False
    eta: float = 0.0


@dataclasses.dataclass(frozen=True)
class MViTConfig:
    """MViTv2 video encoder (reference `models/mvit.py:795-1152`,
    built from `cfgs/visual.py:27-31` with arch='small')."""

    arch: str = "small"
    embed_dims: int = 96
    num_layers: int = 16
    num_heads: int = 1
    downscale_indices: Tuple[int, ...] = (1, 3, 14)
    spatial_size: Tuple[int, int] = (224, 384)
    temporal_size: int = 16
    in_channels: int = 3
    out_scales: Tuple[int, ...] = (0, 1, 2, 3)
    drop_path_rate: float = 0.0
    pool_kernel: Tuple[int, int, int] = (3, 3, 3)
    dim_mul: int = 2
    head_mul: int = 2
    adaptive_kv_stride: Tuple[int, int, int] = (1, 8, 8)
    rel_pos_embed: bool = True
    residual_pooling: bool = True
    dim_mul_in_attention: bool = True
    with_cls_token: bool = True
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    # rel-pos table sizes are computed from this training-time resolution
    # (reference hardcodes PatchEmbed3D(input_size=(16, 224, 224)), mvit.py:989-996)
    rel_pos_spatial_size: int = 224
    # fused Pallas attention (ops/attention.py): streams q tiles against
    # VMEM-resident k/v with on-the-fly rel-pos bias; TPU only
    use_pallas_attention: bool = False
    # round-3 packed layout: cls token on a separate (B,1,C) stream, spatial
    # tokens stay (B,T,H,W,C) end-to-end, head_dim zero-padded to the
    # 128-lane tile inside the attention weights (masked pool-norms keep it
    # checkpoint-exact). Kills the cls slice/concat relayouts + tile pads
    # that were ~38% of the round-2 inference iteration (docs/PERF.md).
    # Accepted round 3 on a 5-round interleaved A/B: 129.5 -> 95.4 ms/iter
    # (1.358x) on the full AV inference pipeline, B=8 bf16.
    cls_stream: bool = True
    # round-3 lever 2 (docs/PERF.md): zero-pad sub-128-channel residual
    # streams (the finest scale's C=96) to the full 128-lane tile end to
    # end — pads are folded into the weights (zero rows/cols) and the
    # LayerNorms run masked (real_dim), so the function is checkpoint-exact
    # while every elementwise/norm op on the 43k-token tensors runs on
    # full lane tiles with no relayout pad/slice copies. cls-stream only.
    # Measured perf-neutral after the cls-stream rewrite (docs/PERF.md
    # round-3 null result) — kept equality-tested, default off.
    lane_pad: bool = False
    # keep the cls-stream inter-block token stream flat (B, L, C) and
    # reshape to (B, T, H, W, C) only at the depthwise pool convs: the
    # conv ops prefer batch-in-sublane layouts which otherwise propagate
    # through the residual stream and push every Dense/MLP dot into XLA's
    # convolution emitters at 6-40% MFU (round-3 HLO finding, docs/PERF.md;
    # measured 1.031x on the full pipeline, B=8)
    tokens3d: bool = True
    # flatten (B, L, C) -> (B*L, C) around every Dense-style dot in the
    # cls-stream path: XLA:TPU emits the 3-free-dim dots through a windowed
    # emitter at ~20% MFU (batch rides the window loop, xplane
    # add_add_fusion ~0.59 ms where ideal is 0.13); a 2D dot takes the
    # plain MXU matmul path. tokens3d only. Measured 1.044x on the full
    # pipeline (93.3 -> 89.4 ms/iter, B=8).
    flat_dots: bool = True
    # MLP activation: "exact" = erf GELU (reference torch nn.GELU default,
    # mvit.py:673-792) | "tanh" = tanh approximation. The exact erfc costs
    # ~40 VPU ops/element on ~660M MLP hidden elements per batch — one of
    # the largest single VPU costs in the round-3 trace; tanh measured
    # 1.081x on the full pipeline (89.7 -> 83.0 ms/iter B=8) and is within
    # 1 bf16 ULP of exact on the bf16 compute path (max|A-B| = 0.0039).
    # f32 parity tests vs torch pin "exact" (docs/PERF.md).
    gelu: str = "tanh"
    # fold the skip projection's columns into the qkv dot at the channel-
    # expansion blocks (1/3/14): the standalone (L,96)@(96,192) proj emits
    # "OutputBatchInLanes" with a TRANSPOSED output, cascading a ~2 ms
    # relayout copy at block 1 (HLO backend_config evidence, docs/PERF.md).
    # cls-stream + tokens3d only; same param tree.
    fold_proj: bool = False
    # attention-pool lowering: "conv" (XLA depthwise conv) | "pallas"
    # (native-layout stencil kernel, ops/pool.py — kills the
    # batch-in-sublane relayout copies the conv emitter forces around
    # every pool; docs/PERF.md round 3). cls_stream+tokens3d only.
    pool_mode: str = "conv"
    # pool-through-projection: at blocks whose kv stride has s_h*s_w >= 16
    # (blocks 0-2 of the small plan), compute spatial k/v as ONE dense
    # strided conv with kernel p (x) W_kv instead of Dense -> depthwise
    # pool — the full-resolution k/v tokens (176-352 MB at B=8) are never
    # materialized. Same param tree; cls_stream+tokens3d only.
    # Measured 1.032x inference A/B at B=8 (docs/PERF.md round 3).
    fuse_kv: bool = True
    # attention-kernel softmax formulation: "exp2" (hardware exp2 +
    # post-dot row normalization — the kernel was VPU-bound on the f32
    # softmax; same math to fp rounding) | "exp2_bf16" (exp2 with the
    # score chain in bf16 — measured 0.973x null, kept tested) | "div"
    # (classic softmax). Validated where consumed (ops/attention.py).
    attn_softmax: str = "exp2"
    # fused block tail (ops/mlp.py): residual add + norm2 + fc1 -> GELU ->
    # fc2 + residual add in ONE Pallas pass — the (R, 4C) MLP hidden
    # activations (~2.6 GB/iter at B=8) never touch HBM and the ~13
    # C-sized HBM passes per block become 3. Same param tree; cls_stream +
    # tokens3d + flat_dots, unpadded streams only (falls back otherwise).
    fused_tail: bool = False
    # qkv projection emitted as a 1x1x1 conv on the 5D stream: the conv
    # emitter's batch-in-sublane output layout feeds the pool convs
    # without the row-major -> conv-layout relayout copy of the (B,L,3HD)
    # qkv tensor (~0.4 ms/block at stage 3, xplane copy.2384). Measured
    # 1.019x inference / 1.011x train (docs/PERF.md round 3)
    qkv_conv: bool = True
    # int8 quantization of the block MLP fc1/fc2 kernels (eval-time
    # deployment transform, ops/quant.py): "none" | "w8" (int8 weights,
    # per-out-channel scales, bf16 MACs) | "w8a8" (+ dynamic per-row
    # activation quant, native int8 MXU). Quantized trees come from
    # quantize_like over an fp tree; forces the plain-Mlp block tail.
    mlp_quant: str = "none"
    # strided-skip max pool lowering: "window" (nn.max_pool) | "phase"
    # (separable phase-split max). Exact equivalents; measured 0.944x for
    # phase at B=8 (docs/PERF.md round 3) — reduce-window wins, default
    # stays window.
    skip_pool: str = "window"
    # stem lowering: conv | patches | s2d | s2d_staged | s2d_perm | s2d_nd
    # | wfold (see PatchEmbed3D; s2d_perm = two-transpose blockify with
    # lane-friendly intermediates, round 5)
    stem_mode: str = "s2d_staged"
    # s2d stems: fold the window-alignment pad into the block-space conv's
    # own padding instead of materializing a padded copy of the input
    # (pad.0.clone was 1.6 ms/iter at B=8; docs/PERF.md round 3)
    stem_fold_pad: bool = True
    # rematerialize each block in the backward pass (trade FLOPs for HBM) —
    # enables the reference's 4x(batch 12) recipe on a single 16 GB chip
    remat: bool = False

    @classmethod
    def small(cls, **kw) -> "MViTConfig":
        return cls(arch="small", num_layers=16, downscale_indices=(1, 3, 14), **kw)

    @classmethod
    def tiny(cls, **kw) -> "MViTConfig":
        return cls(arch="tiny", num_layers=10, downscale_indices=(1, 3, 8), **kw)

    @classmethod
    def dryrun(cls, **kw) -> "MViTConfig":
        """Cold-compile-cheap profile for the multi-chip dryrun and fast
        tests: 7 blocks with downscales at (1, 3, 5) — the SAME structural
        kinds as the 16-block `small` plan (plain block before the first
        downscale, three downscale blocks with dim/head doubling and the
        persistent adaptive kv-stride halving, post-downscale plain blocks,
        scale emits at blocks 0/2/4/6 feeding all four pyramid scales)
        with less than half the attention/MLP graph to compile. Not a
        training config — a structural proxy (VERDICT r4 item 1)."""
        return cls(arch="dryrun", num_layers=7, downscale_indices=(1, 3, 5), **kw)

    @classmethod
    def base(cls, **kw) -> "MViTConfig":
        return cls(arch="base", num_layers=24, downscale_indices=(2, 5, 21), **kw)

    @classmethod
    def large(cls, **kw) -> "MViTConfig":
        return cls(
            arch="large",
            embed_dims=144,
            num_layers=48,
            num_heads=2,
            downscale_indices=(2, 8, 44),
            **kw,
        )


@dataclasses.dataclass(frozen=True)
class AudioAttnConfig:
    """AudioAttnNet transformer over audio tokens
    (reference `cfgs/audio_visual.py:34-48`, `models/audio_attention.py:93-143`).

    Note the reference's patch-embedding + temporal pos-embedding results are
    discarded (audio_attention.py:132-139); the effective compute is a 1-layer
    pre-norm transformer over the raw 512-d features — that is what we build."""

    dim: int = 512
    depth: int = 1
    heads: int = 2
    dim_head: int = 64
    mlp_dim: int = 256
    dropout: float = 0.0


@dataclasses.dataclass(frozen=True)
class VGGishConfig:
    """VGGish audio encoder conv stack (reference `models/vggish.py:96-128`)."""

    layers: Tuple = (64, "M", 128, "M", 256, 256, "M", 512, 512, "M")
    in_channels: int = 1


@dataclasses.dataclass(frozen=True)
class SalUNetConfig:
    """Saliency-UNet diffusion decoder
    (reference `cfgs/audio_visual.py:50-82`, `models/saliency_decoder/sal_unet.py`)."""

    img_size: Tuple[int, int] = (224, 384)
    frames_len: int = 1
    image_based: bool = True
    in_index: Tuple[int, ...] = (0, 1, 2, 3)
    idx_to_planes: Tuple[int, ...] = (96, 192, 384, 768)
    mid_num_stages: int = 4
    temporal_size: int = 9
    temporal_list: Tuple[int, ...] = (5, 5, 5, 5)
    ori_embed_dim: int = 768
    down_embed_dim: int = 96
    patch_size: Tuple[int, ...] = (0, 3, 3, 3)
    patch_stride: Tuple[int, ...] = (0, 1, 1, 1)
    patch_padding: Tuple[int, ...] = (0, 2, 2, 2)
    up_channel: Tuple[int, ...] = (768, 384, 192, 96)
    num_heads: Tuple[int, ...] = (2, 2, 2, 2)
    mlp_ratio: Tuple[float, ...] = (2.0, 2.0, 2.0, 2.0)
    drop_path_rate: Tuple[float, ...] = (0.15, 0.15, 0.15, 0.15)
    qkv_bias: Tuple[bool, ...] = (True, True, True, True)
    kernel_kv: Tuple[int, ...] = (2, 4, 8, 16)
    padding_kv: Tuple[int, ...] = (0, 0, 0, 0)
    stride_kv: Tuple[int, ...] = (2, 4, 8, 16)
    kernel_q: Tuple[int, ...] = (3, 3, 3, 3)
    padding_q: Tuple[int, ...] = (1, 1, 1, 1)
    stride_q: Tuple[int, ...] = (1, 1, 1, 1)
    audio_dim: int = 512
    # noise-encoder channels (reference sal_unet.py:228-259)
    noise_ch: int = 96
    dropout: float = 0.1
    # MLP activation: "tanh" approximation is within 1 bf16 ULP of the
    # exact erf GELU and saves the erfc VPU chain (see MViTConfig.gelu);
    # parity tests against torch in f32 pin "exact".
    gelu: str = "tanh"
    # UpEmbed polyphase rewrite: the dilation-2 convs on the 2x-upsampled
    # grid never mix (h,w) parities, so each stage runs as dense dil-1
    # convs over the four polyphase planes folded into batch + one
    # interleave — exact (BN stats included), equality-tested
    # (tests/test_sal_unet.py). XLA's dilated-conv emitters measured
    # 7-24% MFU vs 31-38% dense (scripts/micro_upembed.py).
    upembed_phase: bool = False
    # fused add+norm2+MLP+add TransformerBlock tail (ops/mlp.py), eval
    # only (DropPath/Dropout are identity when deterministic); measured
    # 1.008x e2e, faster in 5/5 interleaved rounds (docs/PERF.md round 3)
    fused_tail: bool = True
    # CvT kv projections (kernel==stride, pad 0) as reshape + f32 weighted
    # reduce instead of the depthwise conv emitter (models/sal_unet.py
    # _PoolTokens — exact, same param tree)
    pool_reduce: bool = False
    # skip the LAST stage's dead frames: ReduceTemp (kernel/stride 5 VALID
    # over 9) consumes frames 0-4 only and nothing else reads the final
    # stage's output, so its attention/MLP over frames 5-8 is dead compute
    # — EXACT (tests/test_sal_unet.py::test_skip_dead_frames_exact);
    # measured 1.022x e2e, faster in 5/5 rounds (docs/PERF.md round 3)
    skip_dead_frames: bool = True
    # extend the dead-frame cut to EVERY stage, not just the last (EVAL
    # path only — training keeps the reference's full-frame graph): each
    # stage's ReduceTemp (kernel/stride-5 VALID over 9 frames) consumes
    # frames 0-4 only, and all decoder compute is frame-local EXCEPT the
    # av gate's time-mean — so cutting frames 5-8 (frame 8 is the
    # concatenated noise-pyramid frame) at stage 0's output is exact for
    # every consumer but the downstream gates, which then average 5 frames
    # instead of 9 (the stage-0 gate stays exact). APPROXIMATE (unlike
    # skip_dead_frames alone): measured 1.099x e2e (70.3 -> 63.9 ms/iter
    # B=8), max|Δ| 0.0039 on the final saliency map; end-to-end
    # CC/SIM/NSS deltas vs the torch reference measured in
    # tests/test_reference_parity.py::test_shipping_defaults_parity_bound
    # (docs/PERF.md round 4). Sized for the shipping batch: at B=2/B=4 the
    # 9f->5f token cut deepens MXU padding waste and measured SLOWER
    # (BENCH r3->r4 sweep, docs/PERF.md round 5) — small-batch serving
    # should set this False.
    skip_dead_frames_all: bool = True
    # TRAIN-path extension of skip_dead_frames_all: apply the every-stage
    # dead-frame cut inside the training graph too (requires
    # skip_dead_frames_all=True). APPROXIMATE in the same way as the eval
    # cut — forward AND gradients differ only through the stage-1..3 av
    # gates' time-means (5 surviving frames instead of 9); everything
    # else in the decoder is frame-local, so the cut frames contribute
    # exactly zero gradient in the full graph as well. Measured 1.069x on
    # the B=4 bf16 train step (209.8 -> 196.2, 5/5 rounds); the overfit-
    # equivalence gate PASSED (scripts/ab_train_sdf.py --overfit, 300
    # steps on the synthetic AV set: loss curves track within ~0.1%
    # throughout, final eval A total=4.7154 vs B 4.7477 — B no worse on
    # every metric; docs/PERF.md round 5) per VERDICT r4 item 4 —
    # default ON. NOTE: the torch reference trains the full-frame graph;
    # set False for bit-faithful reference training dynamics.
    skip_dead_frames_train: bool = True
    # fused Pallas CvT cross-attention (ops/attention.py
    # cvt_cross_attention): k/v (18 tokens) resident in VMEM, q streamed in
    # row tiles, scores/softmax never hit HBM. Eval path only (no vjp;
    # training and the intermediates introspection hook use the einsum
    # path). Equality-tested vs the einsum path (tests/test_ops.py).
    fused_attn: bool = False
    # TRAIN-path lever: compute the weight gradients of the decoder's
    # stride-1 convs (mt_proj 3x3 768->96, the UpEmbed dilated pairs) as
    # kh*kw shifted MXU dots instead of XLA's im2col weight-grad emitter
    # (~8 ms/step of im2col fusions in the round-3 train xplane). Forward
    # bits identical; weight grads equal up to float associativity
    # (ops/convgrad.py, tests/test_ops.py).
    conv_wg_dots: bool = False
    # restructured mt_proj head (EVAL only, BN running stats folded):
    # conv3x3 and bilinear resize are both linear, so the 9-tap channel
    # contraction runs at each task's LOW resolution (~3x fewer MACs —
    # the tasks sum to ~TH*TW/3 pixels) and the 3x3 shifts ride the
    # resize matrices; the (TH,TW,768) accumulator never exists. Lowers
    # through ops/resize.py resize_sum_conv_relu_phase (Pallas), with
    # resize_sum_conv_relu_lowres as its non-Pallas fallback. Exact
    # rewrite up to float associativity, equality-tested
    # (tests/test_ops.py). Measured 0.978x e2e at B=8 (docs/PERF.md
    # round 5) — the micro win does not survive in-pipeline; default OFF.
    head_lowres: bool = False


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Top-level VideoSaliencyModel composition (reference
    `models/diff_model.py:8-114`, `cfgs/visual.py` vs `cfgs/audio_visual.py`)."""

    channel_list: Tuple[int, ...] = (768, 384, 192, 96)
    visual: Optional[MViTConfig] = dataclasses.field(default_factory=MViTConfig.small)
    audio: Optional[VGGishConfig] = None
    spatiotemp: Optional[AudioAttnConfig] = None
    decoder: SalUNetConfig = dataclasses.field(default_factory=SalUNetConfig)
    # compute dtype for the heavy math; params always live in float32
    compute_dtype: str = "float32"
    # on-device normalization stats for uint8 (packed-pipeline) rgb input:
    # 'imagenet' (DHF1k visual pretrain) or 'stavis' (AV corpus,
    # cfgs/dataset.json:74-77) — see data/transforms.py normalize_rgb_u8
    uint8_norm: str = "imagenet"

    @classmethod
    def visual_only(cls, **kw) -> "ModelConfig":
        """The DHF1k visual pretrain model (cfgs/visual.py)."""
        return cls(visual=MViTConfig.small(), audio=None, spatiotemp=None, **kw)

    @classmethod
    def audio_visual(cls, **kw) -> "ModelConfig":
        """The 6-dataset AV fine-tune model (cfgs/audio_visual.py)."""
        return cls(
            visual=MViTConfig.small(),
            audio=VGGishConfig(),
            spatiotemp=AudioAttnConfig(),
            **kw,
        )


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Device-mesh / parallelism layout.

    The reference implements exactly one strategy — data parallelism via DDP
    over NCCL (reference `train_dhf1k.py:38-61`, `model.py:13-15`). We map it
    to a `jax.sharding.Mesh` with a 'data' axis; gradients all-reduce via XLA
    `psum` over ICI. A 'model' axis is provisioned for tensor-parallel
    extensions."""

    data_axis: str = "data"
    model_axis: str = "model"
    num_data: int = -1  # -1 => all devices
    num_model: int = 1


@dataclasses.dataclass(frozen=True)
class ExperimentConfig:
    """Everything needed for one run."""

    model: ModelConfig = dataclasses.field(default_factory=ModelConfig.visual_only)
    data_transform: DataTransformConfig = dataclasses.field(
        default_factory=DataTransformConfig
    )
    diffusion: DiffusionConfig = dataclasses.field(default_factory=DiffusionConfig)
    loss: LossConfig = dataclasses.field(default_factory=LossConfig)
    optim: OptimConfig = dataclasses.field(default_factory=OptimConfig)
    training: TrainingConfig = dataclasses.field(default_factory=TrainingConfig)
    sampling: SamplingConfig = dataclasses.field(default_factory=SamplingConfig)
    mesh: MeshConfig = dataclasses.field(default_factory=MeshConfig)


def visual_experiment(**kw) -> ExperimentConfig:
    return ExperimentConfig(model=ModelConfig.visual_only(), **kw)


def audio_visual_experiment(**kw) -> ExperimentConfig:
    return ExperimentConfig(model=ModelConfig.audio_visual(), **kw)
