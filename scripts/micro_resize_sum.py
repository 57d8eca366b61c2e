"""Op-level TPU A/B: chained bilinear_resize_add vs single-pass
bilinear_resize_sum on the decoder's exact multi-scale shapes
(B=8, C=768, scales (7,12)/(14,24)/(28,48)/(56,96) -> (112,192)).

    python scripts/micro_resize_sum.py [iters]
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

from diff_sal_tpu.ops.resize import (bilinear_resize, bilinear_resize_add,
                                     bilinear_resize_sum)

B, C = 8, 768
SCALES = [(7, 12), (14, 24), (28, 48), (56, 96)]
OUT = (112, 192)


@jax.jit
def chained(xs):
    acc = bilinear_resize(xs[0], OUT)
    for x in xs[1:]:
        acc = bilinear_resize_add(acc, x)
    return acc


@jax.jit
def single(xs):
    return bilinear_resize_sum(xs, OUT)


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    key = jax.random.PRNGKey(0)
    inputs = [
        [
            (jax.random.normal(jax.random.fold_in(key, 10 * j + i),
                               (B, h, w, C)) * 0.3).astype(jnp.bfloat16)
            for i, (h, w) in enumerate(SCALES)
        ]
        for j in range(3)
    ]
    a = np.asarray(chained(inputs[0]), np.float32)
    b = np.asarray(single(inputs[0]), np.float32)
    print(f"max|d| = {np.abs(a - b).max():.5f}")
    assert np.abs(a - b).max() < 0.05

    for r in range(3):
        for name, fn in (("chained", chained), ("single", single)):
            out = fn(inputs[0])
            jax.block_until_ready(out)
            t0 = time.perf_counter()
            for i in range(iters):
                out = fn(inputs[i % 3])
                if i % 10 == 9:
                    float(out.mean())
            jax.block_until_ready(out)
            dt = (time.perf_counter() - t0) / iters * 1e3
            print(f"round {r} {name:8s}: {dt:7.3f} ms")


if __name__ == "__main__":
    main()
