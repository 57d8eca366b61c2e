"""Micro A/B: UpEmbed's dilation-2 3x3 conv on the 2x-upsampled grid vs
the exact phase rewrite's dilation-1 3x3 conv on 4 phase planes folded
into batch (same FLOPs, different emitter shapes).

    python -u scripts/micro_upembed.py

Shapes: the four decoder UpEmbed stages at B=8 (Bt = B*T with T=4 frames
after ReduceTemp; see models/sal_unet.py TransformerStage).
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", ".jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

# (Bt, H2, W2, Cin, Cout): conv input is the 2x-upsampled grid (H2, W2)
STAGES = [
    (32, 14, 24, 768, 384),
    (32, 28, 48, 384, 192),
    (32, 56, 96, 192, 96),
    (32, 112, 192, 96, 96),  # stage 3 second conv keeps 96
]


def conv(x, k, dil):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), [(dil, dil), (dil, dil)],
        rhs_dilation=(dil, dil),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def timeit(dil, xs, k, iters=200):
    """On-device fori_loop with a serializing data dependency (each
    iteration's kernel is scaled by the previous output's corner element),
    ONE host sync at the end — per-iter syncs cost a ~38 ms tunnel round
    trip and back-to-back dispatches get silently dropped (docs/PERF.md
    measurement integrity)."""
    stack = jnp.stack(xs)  # (4, Bt, H, W, C)

    @jax.jit
    def run(stack, k):
        def body(i, c):
            x = jax.lax.dynamic_index_in_dim(
                stack, i % stack.shape[0], keepdims=False
            )
            kk = k * (1.0 + c * 1e-12).astype(k.dtype)
            out = conv(x, kk, dil)
            # consume the WHOLE output — slicing one element lets XLA
            # narrow the conv to a single output window
            return jnp.sum(out.astype(jnp.float32)) * 1e-9

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    c = run(stack, k)
    c.block_until_ready()
    t0 = time.perf_counter()
    c = run(stack, k)
    assert float(c) == float(c), "NaN"
    return (time.perf_counter() - t0) / iters * 1000


def main():
    key = jax.random.PRNGKey(0)
    for Bt, H2, W2, Cin, Cout in STAGES:
        xs_up = [
            jax.random.normal(
                jax.random.fold_in(key, i), (Bt, H2, W2, Cin), jnp.bfloat16
            )
            for i in range(4)
        ]
        xs_ph = [
            jax.random.normal(
                jax.random.fold_in(key, 10 + i),
                (Bt * 4, H2 // 2, W2 // 2, Cin), jnp.bfloat16,
            )
            for i in range(4)
        ]
        k = jax.random.normal(key, (3, 3, Cin, Cout), jnp.bfloat16) * 0.05

        t_dil = timeit(2, xs_up, k)
        t_ph = timeit(1, xs_ph, k)
        gflop = Bt * H2 * W2 * 9 * Cin * Cout * 2 / 1e9
        # v5e bf16 peak ~394 TFLOP/s
        print(
            f"Bt={Bt} up=({H2},{W2}) C={Cin}->{Cout}: "
            f"dil2 {t_dil:.3f} ms ({gflop / t_dil:.0f} GF/ms, "
            f"{gflop / t_dil / 394:.0%} MFU)  "
            f"phase-dil1 {t_ph:.3f} ms ({gflop / t_ph / 394:.0%} MFU)  "
            f"ratio {t_dil / t_ph:.3f}x"
        )


if __name__ == "__main__":
    main()
