"""Microbench: XLA:TPU emission of the MViT MLP fc2 dot at stage-3 shapes.

    python scripts/micro_dot.py

Variants (all compute y = x @ W + r, bf16):
  a) 3D free-dims dot:   (8,2688,1536) @ (1536,384) + (8,2688,384)
  b) 2D flattened dot:   (21504,1536)  @ (1536,384) + (21504,384)
  c) 3D, reshaped around the dot inside the jitted fn

Honest timing on the axon tunnel: rotating inputs, host sync EVERY iter
(float(mean)), so dropped executions cannot fake speed (docs/PERF.md).
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", ".jax_cache")


def bench(f, args_list, iters=30):
    o = f(*args_list[0])
    jax.block_until_ready(o)
    t0 = time.perf_counter()
    acc = 0.0
    for i in range(iters):
        o = f(*args_list[i % len(args_list)])
        acc += float(o.mean())  # hard sync every iter
    dt = (time.perf_counter() - t0) / iters * 1e3
    return dt, acc


def main():
    B, L, K, N = 8, 2688, 1536, 384
    key = jax.random.PRNGKey(0)
    n_in = 4
    xs3 = [
        jax.random.normal(jax.random.fold_in(key, i), (B, L, K), jnp.bfloat16)
        for i in range(n_in)
    ]
    rs3 = [
        jax.random.normal(jax.random.fold_in(key, 9 + i), (B, L, N),
                          jnp.bfloat16)
        for i in range(n_in)
    ]
    xs2 = [x.reshape(-1, K) for x in xs3]
    rs2 = [r.reshape(-1, N) for r in rs3]
    W = jax.random.normal(jax.random.fold_in(key, 99), (K, N), jnp.bfloat16)

    @jax.jit
    def f3(x, w, r):
        return x @ w + r

    @jax.jit
    def f2(x, w, r):
        return x @ w + r

    @jax.jit
    def f3r(x, w, r):
        y = x.reshape(-1, K) @ w
        return y.reshape(B, L, N) + r

    flop = 2 * B * L * K * N
    for name, f, a, b in [
        ("3D dot ", f3, xs3, rs3),
        ("2D dot ", f2, xs2, rs2),
        ("3D+resh", f3r, xs3, rs3),
    ]:
        dt, _ = bench(f, list(zip(a, [W] * n_in, b)))
        # sync-every-iter includes ~0.?ms tunnel latency; report raw
        print(f"{name}: {dt:7.3f} ms/iter  ({flop / dt / 1e9:.0f} GFLOP/s)")


if __name__ == "__main__":
    main()
