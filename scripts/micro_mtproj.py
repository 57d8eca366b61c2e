"""Micro-bench of mt_proj lowerings: 3x3 conv 768->96 on (8,112,192,768).

The xplane trace shows the stock conv at ~5% MFU (the conv emitter puts
batch=8 in sublanes, so the MXU runs 8/128 rows). Variants:

  a) stock nn.Conv-style lax conv, NHWC
  b) batch folded into H: zero-pad each image by one row top+bottom,
     reshape to (1, B*(H+2), W, C), conv with VALID H padding / SAME W,
     then reshape+slice the per-image valid rows back out — exact
  c) im2col-by-rows: y = sum_dy vshift(x) @ W2[dy] with W2[dy] the
     (3*Cin, Cout) horizontal im2col of kernel row dy... (skipped: 793 MB
     intermediate)
  d) 9 shifted 2D dots accumulated (flat (B*H*W, Cin) operands)

    python scripts/micro_mtproj.py [iters]
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

B, H, W, CIN, COUT = 8, 112, 192, 768, 96
DT = jnp.bfloat16


def conv_stock(x, k):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def conv_foldh(x, k):
    # zero row between images, batch folded into H
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0)))
    xp = xp.reshape(1, B * (H + 2), W, CIN)
    y = jax.lax.conv_general_dilated(
        xp, k, (1, 1), [(0, 0), (1, 1)],  # VALID in H, SAME in W
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )  # (1, B*(H+2)-2, W, COUT)
    y = jnp.pad(y, ((0, 0), (0, 2), (0, 0), (0, 0)))
    y = y.reshape(B, H + 2, W, COUT)
    return y[:, :H]


def conv_dots(x, k):
    # 9 shifted flat dots; boundary handled by padding then slicing
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    y = jnp.zeros((B, H, W, COUT), DT)
    for dy in range(3):
        for dx in range(3):
            xs = jax.lax.dynamic_slice(
                xp, (0, dy, dx, 0), (B, H, W, CIN)
            ).reshape(-1, CIN)
            y = y + (xs @ k[dy, dx]).reshape(B, H, W, COUT)
    return y


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    key = jax.random.PRNGKey(0)
    xs = [
        (jax.random.normal(jax.random.fold_in(key, i), (B, H, W, CIN)) * 0.2
         ).astype(DT)
        for i in range(4)
    ]
    k = (jax.random.normal(jax.random.fold_in(key, 99), (3, 3, CIN, COUT))
         * 0.02).astype(DT)

    fns = {
        "stock": jax.jit(conv_stock),
        "foldh": jax.jit(conv_foldh),
        "dots": jax.jit(conv_dots),
    }
    ref = np.asarray(fns["stock"](xs[0], k), np.float32)
    for name, fn in fns.items():
        out = np.asarray(fn(xs[0], k), np.float32)
        d = np.abs(out - ref).max()
        print(f"{name}: max|d|={d:.4f}")
        assert d < 0.2, name

    flops = B * H * W * 9 * CIN * COUT * 2
    for r in range(3):
        for name, fn in fns.items():
            out = fn(xs[0], k)
            jax.block_until_ready(out)
            t0 = time.perf_counter()
            for i in range(iters):
                out = fn(xs[i % 4], k)
                if i % 10 == 9:
                    float(out.mean())
            jax.block_until_ready(out)
            dt = (time.perf_counter() - t0) / iters
            print(
                f"round {r} {name:6s}: {dt * 1e3:7.3f} ms  "
                f"{flops / dt / 1e12:6.1f} TFLOP/s"
            )


if __name__ == "__main__":
    main()
