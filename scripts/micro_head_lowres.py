"""Micro A/B of the decoder head lowerings at the real flagship shapes:

  stock:  bilinear_resize_sum (Pallas) + XLA conv3x3 768->96 + bias + relu
  lowres: resize_sum_conv_relu_lowres (conv-at-low-res restructure)

    python scripts/micro_head_lowres.py [iters] [rounds]
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", ".jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from diff_sal_tpu.ops.resize import (
    bilinear_resize_sum,
    resize_sum_conv_relu_lowres,
    resize_sum_conv_relu_phase,
)

B, TH, TW, CIN, COUT = 8, 112, 192, 768, 96
SHAPES = [(7, 12), (14, 24), (28, 48), (56, 96)]
DT = jnp.bfloat16


def stock(xs, k, b):
    acc = bilinear_resize_sum(xs, (TH, TW))
    y = jax.lax.conv_general_dilated(
        acc, k, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return jnp.maximum(y + b.astype(y.dtype), 0)


def lowres(xs, k, b):
    return resize_sum_conv_relu_lowres(xs, (TH, TW), k, b)


def phase(xs, k, b):
    return resize_sum_conv_relu_phase(xs, (TH, TW), k, b)


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    key = jax.random.PRNGKey(0)
    xs = [
        (jax.random.normal(jax.random.fold_in(key, i), (B, h, w, CIN)) * 0.3
         ).astype(DT)
        for i, (h, w) in enumerate(SHAPES)
    ]
    k = (jax.random.normal(jax.random.fold_in(key, 99), (3, 3, CIN, COUT))
         * 0.02).astype(DT)
    b = jax.random.normal(jax.random.fold_in(key, 100), (COUT,), jnp.float32)

    fns = {"stock": jax.jit(stock), "lowres": jax.jit(lowres),
           "phase": jax.jit(phase)}
    outs = {n: f(xs, k, b) for n, f in fns.items()}
    scale = float(jnp.abs(outs["stock"].astype(jnp.float32)).max())
    for other in ("lowres", "phase"):
        d = jnp.abs(outs["stock"].astype(jnp.float32)
                    - outs[other].astype(jnp.float32))
        print(f"max|stock - {other}| {float(d.max()):.3e} (scale {scale:.3f})")

    acc = {n: [] for n in fns}
    for r in range(rounds):
        for n, f in fns.items():
            f(xs, k, b)[0, 0, 0, 0].block_until_ready()
            t0 = time.perf_counter()
            for _ in range(iters):
                y = f(xs, k, b)
            y.block_until_ready()
            acc[n].append((time.perf_counter() - t0) / iters * 1e3)
    for n in fns:
        ms = min(acc[n])
        print(f"{n:8s} {ms:.3f} ms/iter  (rounds: "
              + " ".join(f"{v:.3f}" for v in acc[n]) + ")")


if __name__ == "__main__":
    main()
