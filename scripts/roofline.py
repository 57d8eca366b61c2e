"""End-to-end HBM roofline accounting for the AV inference pipeline
(VERDICT r3 item 2): how many bytes must cross HBM per iteration, what
throughput ceiling that implies on this chip, and how close the measured
program runs to it.

    python scripts/roofline.py [B] [--ms <measured_ms_per_iter>] [--measure]

Byte model: the optimized HLO's ENTRY computation is the scheduled thunk
list; every instruction's HBM traffic is modeled as sum(operand bytes) +
output bytes (fusion internals stay in VMEM/registers; operands read once
per use — no inter-op cache on TPU, so per-use reads ARE the hardware
behavior). Parameters/constants/GTE/bitcast/tuple are free. This OVERCOUNTS
ops whose producers XLA managed to keep in VMEM across thunks (rare at
these sizes) and ignores DMA inefficiency (padding to tile granularity) —
both noted in the output.

Cross-check: XLA's own `compiled.cost_analysis()['bytes accessed']`.

Chip model (v5e): HBM ~819 GB/s, bf16 MXU ~197 TFLOP/s (int8 ~394).
"""

import dataclasses
import re
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", ".jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from diff_sal_tpu.config import DataTransformConfig, ModelConfig, SamplingConfig
from diff_sal_tpu.diffusion.schedule import make_schedule
from diff_sal_tpu.inference import sample_saliency
from diff_sal_tpu.models.diff_model import VideoSaliencyModel

HBM_GBPS = 819.0  # v5e HBM bandwidth
BF16_TFLOPS = 197.0  # v5e bf16 MXU peak

_DTYPE_BYTES = {
    "f64": 8, "f32": 4, "bf16": 2, "f16": 2, "f8e4m3fn": 1, "f8e5m2": 1,
    "s64": 8, "s32": 4, "s16": 2, "s8": 1,
    "u64": 8, "u32": 4, "u16": 2, "u8": 1, "pred": 1,
}

_LEAF_RE = re.compile(r"(\w+)\[([\d,]*)\](\{[^{}]*\})?")
_FREE_OPS = (
    "parameter", "constant", "get-tuple-element", "bitcast", "tuple",
    "after-all", "partition-id", "replica-id",
)
_NAME_RE = re.compile(r"^\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*")


PHYSICAL = True  # account tile-padding (T(8,128) etc.) in buffer bytes


def _ceil_to(n: int, m: int) -> int:
    return -(-n // m) * m


def shape_hbm_bytes(
    shape_str: str, first_leaf_only: bool = False, raw: bool = False
) -> int:
    """HBM bytes of an HLO shape string (tuples sum leaves).

    Leaves whose layout carries a scoped memory space — `S(1)` VMEM /
    `S(2)` SMEM, e.g. `f32[512,512]{1,0:T(8,128)S(1)}` — live on-chip and
    cost no HBM traffic, so they count 0 unless `raw=True`.

    With PHYSICAL on, the two minor-most dims are rounded up to the tile
    recorded in the layout (`T(8,128)`, with `(2,1)` sublane packing for
    sub-32-bit types widening the sublane tile) — buffers are stored tiled
    in HBM, so DMA moves the padded footprint, not the logical one.
    """
    total = 0
    for i, (dt, dims, layout) in enumerate(_LEAF_RE.findall(shape_str)):
        if first_leaf_only and i > 0:
            break
        if dt not in _DTYPE_BYTES:
            continue
        if not raw and layout and re.search(r"S\(\d+\)", layout):
            continue  # scoped (VMEM/SMEM) buffer — not HBM traffic
        sizes = [int(d) for d in dims.split(",") if d]
        if PHYSICAL and layout and sizes:
            lm = re.match(r"\{([\d,]*)(?::.*?T\((\d+),(\d+)\)(?:\((\d+),\d+\))?)?", layout)
            if lm and lm.group(2):
                perm = [int(p) for p in lm.group(1).split(",") if p]
                sub, lane = int(lm.group(2)), int(lm.group(3))
                if lm.group(4):
                    sub *= int(lm.group(4))  # packed sublanes widen the tile
                if perm:
                    sizes[perm[0]] = _ceil_to(sizes[perm[0]], lane)
                    if len(perm) > 1:
                        sizes[perm[1]] = _ceil_to(sizes[perm[1]], sub)
        n = 1
        for d in sizes:
            n *= d
        total += n * _DTYPE_BYTES[dt]
    return total


def _scan_shape(s: str, pos: int):
    """Scan one HLO shape (leaf with optional layout, or tuple) starting at
    `pos`; returns (shape_str, end_pos)."""
    if s[pos] == "(":  # tuple — scan to matching close paren
        d = 0
        for i in range(pos, len(s)):
            if s[i] == "(":
                d += 1
            elif s[i] == ")":
                d -= 1
                if d == 0:
                    return s[pos : i + 1], i + 1
        return s[pos:], len(s)
    m = re.compile(r"\w+\[[\d,]*\]").match(s, pos)
    if not m:
        return "", pos
    end = m.end()
    if end < len(s) and s[end] == "{":  # layout (no nested braces)
        close = s.find("}", end)
        if close != -1:
            end = close + 1
    return s[pos:end], end


def parse_entry(hlo: str):
    """Yield (name, opcode, out_bytes, in_bytes) for ENTRY instructions.

    out/in bytes count HBM-resident buffers only (S(n)-scoped leaves are
    free); copy-start counts only its destination leaf as the write (the
    other tuple elements alias the source / are context).
    """
    shapes = {}  # name -> shape string (with layouts)
    opcodes = {}
    comp_root = {}  # computation name -> raw bytes of its root output
    parsed_lines = []
    comp_re = re.compile(r"^%([\w.\-]+)\s*\(.*\)\s*->\s*(.+?)\s*\{\s*$")
    for ln in hlo.splitlines():
        cm = comp_re.match(ln)
        if cm:
            comp_root[cm.group(1)] = shape_hbm_bytes(cm.group(2), raw=True)
        m = _NAME_RE.match(ln)
        if not m:
            parsed_lines.append((ln, None))
            continue
        shape, end = _scan_shape(ln, m.end())
        om = re.compile(r"\s*([\w\-]+)\(").match(ln, end)
        if not om:
            parsed_lines.append((ln, None))
            continue
        name, opcode = m.group(1), om.group(1)
        shapes[name] = shape
        opcodes[name] = opcode
        parsed_lines.append((ln, (name, shape, opcode, om.end())))

    in_entry = False
    depth = 0
    out = []
    for ln, parsed in parsed_lines:
        if not in_entry:
            if ln.startswith("ENTRY "):
                in_entry = True
                depth = ln.count("{") - ln.count("}")
            continue
        depth += ln.count("{") - ln.count("}")
        if depth <= 0:
            break
        if not parsed:
            continue
        name, shape, opcode, body_pos = parsed
        if opcode in _FREE_OPS or opcode in ("async-done", "copy-done",
                                             "async-update"):
            continue
        # operand list: scan to the matching close paren
        d, end = 1, body_pos
        for i in range(body_pos, len(ln)):
            if ln[i] == "(":
                d += 1
            elif ln[i] == ")":
                d -= 1
                if d == 0:
                    end = i
                    break
        ops = re.findall(r"%?([\w.\-]+)", ln[body_pos:end])

        if opcode == "async-start":
            # async DMA (e.g. a batch-slice prefetch into VMEM): reads the
            # called computation's root-sized region from HBM; the write is
            # free when the destination is scoped (S(n)), else root-sized.
            cm = re.search(r"calls=%([\w.\-]+)", ln[end:])
            moved = comp_root.get(cm.group(1), 0) if cm else 0
            written = 0 if re.search(r"S\(\d+\)", shape) else moved
            out.append((name, opcode, written, moved))
            continue
        if opcode == "copy-start":
            # (dest, src-alias, context): reads src (== dest size); write
            # free when dest is scoped (cross-program prefetch to VMEM)
            moved = shape_hbm_bytes(shape, first_leaf_only=True, raw=True)
            written = shape_hbm_bytes(shape, first_leaf_only=True)
            out.append((name, opcode, written, moved))
            continue

        out_b = shape_hbm_bytes(shape)
        if opcode in ("slice", "dynamic-slice"):
            # a slice DMA reads only the region it outputs
            in_b = shape_hbm_bytes(shape, raw=True)
        elif opcode == "dynamic-update-slice":
            # in-place update: reads the update operand, writes that region
            upd = ops[1] if len(ops) > 1 else None
            in_b = shape_hbm_bytes(shapes.get(upd, ""), raw=True)
            out_b = in_b
        else:
            in_b = 0
            for o in ops:
                if o in shapes and opcodes.get(o) not in (
                    "copy-start", "async-start"
                ):
                    in_b += shape_hbm_bytes(shapes[o])
        out.append((name, opcode, out_b, in_b))
    return out


def category(name: str) -> str:
    key = re.sub(r"\.\d+$", "", name.rstrip("."))
    key = re.sub(r"\.clone$", "", key)
    return key


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    B = int(args[0]) if args else 8
    ms_meas = None
    if "--ms" in sys.argv:
        ms_meas = float(sys.argv[sys.argv.index("--ms") + 1])
    if "--hlo" in sys.argv:  # offline mode: account a saved HLO dump
        hlo = open(sys.argv[sys.argv.index("--hlo") + 1]).read()
        report(hlo, B, None, None, ms_meas)
        return

    cfg = dataclasses.replace(
        ModelConfig.audio_visual(), compute_dtype="bfloat16"
    )
    cfg = dataclasses.replace(
        cfg,
        visual=dataclasses.replace(cfg.visual, use_pallas_attention=True),
    )
    model = VideoSaliencyModel(cfg)
    key = jax.random.PRNGKey(0)
    rgb = jax.random.normal(key, (B, 16, 224, 384, 3)) * 0.5
    audio = jax.random.normal(jax.random.fold_in(key, 1), (B, 9, 112, 192, 1))
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(1),
        {"rgb": rgb[:1], "input": jnp.zeros((1, 224, 384, 1)),
         "audio": audio[:1]},
        jnp.zeros((1,)),
    )
    schedule = make_schedule("cosine", num_diffusion_timesteps=1000)

    def pipeline(variables, rgb, audio, rng):
        return sample_saliency(
            model, variables, schedule, SamplingConfig(),
            DataTransformConfig(), rgb, audio, rng,
        )

    t0 = time.perf_counter()
    compiled = (
        jax.jit(pipeline)
        .lower(variables, rgb, audio, jax.random.PRNGKey(2))
        .compile()
    )
    print(f"# compiled in {time.perf_counter() - t0:.1f}s")

    # --- XLA's own aggregate cost model ---------------------------------
    xla_bytes = xla_flops = None
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        xla_bytes = ca.get("bytes accessed")
        xla_flops = ca.get("flops")
    except Exception as e:  # noqa: BLE001
        print(f"# cost_analysis unavailable: {type(e).__name__}: {e}")

    if "--measure" in sys.argv and jax.default_backend() == "tpu":
        rgbs = [jax.random.normal(jax.random.fold_in(key, i),
                                  (B, 16, 224, 384, 3)) * 0.5
                for i in range(4)]
        auds = [jax.random.normal(jax.random.fold_in(key, 50 + i),
                                  (B, 9, 112, 192, 1)) for i in range(4)]
        out = compiled(variables, rgbs[0], auds[0], jax.random.PRNGKey(2))
        jax.block_until_ready(out)
        iters = 30
        t0 = time.perf_counter()
        for i in range(iters):
            out = compiled(variables, rgbs[i % 4], auds[i % 4],
                           jax.random.PRNGKey(i))
            if i % 10 == 9:
                assert 0.0 < float(out.mean()) < 1.0
        jax.block_until_ready(out)
        ms_meas = (time.perf_counter() - t0) / iters * 1e3
        print(f"measured: {ms_meas:.2f} ms/iter (end-block, incl. dispatch)")

    report(compiled.as_text(), B, xla_bytes, xla_flops, ms_meas)


def report(hlo, B, xla_bytes, xla_flops, ms_meas):
    rows = parse_entry(hlo)
    total_bytes = sum(o + i for _, _, o, i in rows)
    n_ops = len(rows)

    import collections
    cats = collections.Counter()
    for name, opcode, ob, ib in rows:
        cats[category(name)] += ob + ib
    print(f"\n== modeled HBM traffic (ENTRY walk, {n_ops} scheduled ops) ==")
    print(f"total: {total_bytes / 1e9:.3f} GB/iter at B={B}")
    if xla_bytes is not None:
        print(f"XLA cost_analysis 'bytes accessed': {xla_bytes / 1e9:.3f} GB"
              f"   flops: {xla_flops / 1e12:.3f} TFLOP")
    print("-- by category (GB/iter):")
    for n, b in cats.most_common(25):
        print(f"  {b / 1e9:8.3f}  {n}")
    print("-- top instructions (GB):")
    for name, opcode, ob, ib in sorted(
        rows, key=lambda r: -(r[2] + r[3])
    )[:25]:
        print(f"  {(ob + ib) / 1e9:8.3f}  (out {ob / 1e9:.3f})  {name}")

    global PHYSICAL
    PHYSICAL = False
    logical_rows = {r[0]: r for r in parse_entry(hlo)}
    PHYSICAL = True
    logical_total = sum(o + i for _, _, o, i in logical_rows.values())
    print(f"\n== tile-padding waste: physical {total_bytes / 1e9:.3f} GB vs "
          f"logical {logical_total / 1e9:.3f} GB "
          f"({total_bytes / max(logical_total, 1):.2f}x) ==")
    waste = []
    for name, opcode, ob, ib in rows:
        lr = logical_rows.get(name)
        if lr:
            waste.append((ob + ib - lr[2] - lr[3], name))
    print("-- top padding-waste instructions (GB wasted):")
    for w, name in sorted(waste, reverse=True)[:15]:
        print(f"  {w / 1e9:8.3f}  {name}")

    # --- floors and ceiling ----------------------------------------------
    hbm_floor_ms = total_bytes / (HBM_GBPS * 1e9) * 1e3
    print(f"\n== roofline (v5e: {HBM_GBPS:.0f} GB/s HBM, "
          f"{BF16_TFLOPS:.0f} TFLOP/s bf16) ==")
    print(f"HBM floor: {hbm_floor_ms:.2f} ms/iter "
          f"-> ceiling {B / hbm_floor_ms * 1e3:.1f} clips/s/chip")
    if xla_flops is not None:
        mxu_floor_ms = xla_flops / (BF16_TFLOPS * 1e12) * 1e3
        print(f"MXU floor: {mxu_floor_ms:.2f} ms/iter "
              f"-> ceiling {B / mxu_floor_ms * 1e3:.1f} clips/s/chip")
    if ms_meas:
        print(f"achieved vs model: {total_bytes / (ms_meas * 1e-3) / 1e9:.0f} "
              f"GB/s effective ({total_bytes / (ms_meas * 1e-3) / 1e9 / HBM_GBPS * 100:.0f}% "
              f"of HBM peak); measured/floor = {ms_meas / hbm_floor_ms:.2f}x")


if __name__ == "__main__":
    main()
