"""Micro-bench the fused v2 bias-attention kernel on the MViT block
shapes, sweeping the q-tile scratch budget (ops/attention.py
_QTILE_BUDGET_BYTES) — the block-1 kernel is the largest single custom
call in the shipping program (~2.5 ms/iter at B=8, docs/PERF.md round 4)
and its softmax is VPU-bound, so per-step overhead amortization via
bigger q tiles is the remaining knob.

    python scripts/micro_attn.py [B]

Prints ms per call for each (block, budget) pair plus max|Δ| vs the
einsum reference at the default budget.
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", ".jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from diff_sal_tpu.ops import attention as A

# (name, Lq, k_shape, H) for the shipping MViT-small plan at 224x384
# input: block 0 (Lq 8*56*96, kv (8,14,24)? no — block-0 kv stride (1,8,8)
# over (8,56,96) -> (8,7,12)), block 1 (q pooled to (8,28,48), kv stride 4
# -> (8,14,24)), stage-3 block (q (8,14,24) -> kv stride 2 -> (8,7,12)).
SHAPES = [
    ("block0", (8, 56, 96), (8, 7, 12), 1),
    ("block1", (8, 28, 48), (8, 14, 24), 2),
    ("stage3", (8, 14, 24), (8, 7, 12), 4),
]

BUDGETS_MB = [10, 20, 32, 48, 64]


def bench(fn, args, iters=30):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(iters):
        out = fn(*args)
        if i % 10 == 9:
            float(jnp.asarray(out).ravel()[0])
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1000


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    key = jax.random.PRNGKey(0)
    for name, qs, ks, H in SHAPES:
        Lq = int(np.prod(qs))
        Lk = 1 + int(np.prod(ks))
        D = 128
        HD = H * D
        K = sum(ks)
        Kp = ((K + 127) // 128) * 128
        ks_ = [jax.random.fold_in(key, i) for i in range(4)]
        q = jax.random.normal(ks_[0], (B, Lq, HD), jnp.bfloat16)
        k = jax.random.normal(ks_[1], (B, Lk, HD), jnp.bfloat16)
        v = jax.random.normal(ks_[2], (B, Lk, HD), jnp.bfloat16)
        rel = jax.random.normal(ks_[3], (B, Lq, H * Kp), jnp.bfloat16) * 0.1
        rel = rel * (jnp.arange(H * Kp) % Kp < K).astype(rel.dtype)
        scale = 0.1
        args = (q, k, v, rel, tuple(ks), H, scale, None, True, None, "exp2")

        ref = A.reference_bias_attention_v2(*args)
        rows = []
        for mb in BUDGETS_MB:
            A._QTILE_BUDGET_BYTES = mb * 1024 * 1024
            q_tile, lq_pad = A._pick_q_tile(Lq, ((Lk + 127) // 128) * 128)
            fn = jax.jit(
                lambda *a: A.fused_bias_attention_v2(*a),
            )
            out = fn(*args)
            err = float(
                jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32)))
            )
            ms = bench(fn, args)
            rows.append((mb, q_tile, ms, err))
            print(
                f"{name}  budget {mb:3d} MB  q_tile {q_tile:5d}  "
                f"{ms:7.3f} ms  max|d| {err:.2e}",
                flush=True,
            )
        A._QTILE_BUDGET_BYTES = 10 * 1024 * 1024
        best = min(rows, key=lambda r: r[2])
        print(f"{name}  BEST budget {best[0]} MB  q_tile {best[1]}  "
              f"{best[2]:.3f} ms\n")


if __name__ == "__main__":
    main()
