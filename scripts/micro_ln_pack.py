"""Op-level within-process A/B of the packed vs unpacked fused LayerNorm
forward on the decoder's hot shape ((B*T*H*W, 96) bf16 — the xplane's
0.37 ms/call LNs, ~2x their HBM floor from 96->128 lane padding).

    python scripts/micro_ln_pack.py [R] [C] [iters] [rounds]
"""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from diff_sal_tpu.ops import layernorm as ln

R = int(sys.argv[1]) if len(sys.argv) > 1 else 387072
C = int(sys.argv[2]) if len(sys.argv) > 2 else 96
iters = int(sys.argv[3]) if len(sys.argv) > 3 else 50
rounds = int(sys.argv[4]) if len(sys.argv) > 4 else 5

key = jax.random.PRNGKey(0)
xs = [
    (jax.random.normal(jax.random.fold_in(key, i), (R, C)) * 2 + 0.3
     ).astype(jnp.bfloat16)
    for i in range(4)
]
s = jax.random.normal(jax.random.fold_in(key, 9), (C,)) * 0.1 + 1.0
b = jax.random.normal(jax.random.fold_in(key, 10), (C,)) * 0.1


def run(pack):
    ln._PACK_ENABLED = pack
    return jax.jit(lambda x: ln.fused_layernorm(x, s, b)).lower(xs[0]).compile()

f_off, f_on = run(False), run(True)
a0, b0 = f_off(xs[0]), f_on(xs[0])
print("max|off-on| =", float(jnp.max(jnp.abs(
    a0.astype(jnp.float32) - b0.astype(jnp.float32)))))

ta = tb = 0.0
for r in range(rounds):
    for f, label in ((f_off, "a"), (f_on, "b")):
        o = None
        t0 = time.perf_counter()
        for i in range(iters):
            o = f(xs[i % 4])
        float(o.astype(jnp.float32).mean())  # sync + liveness
        dt = (time.perf_counter() - t0) / iters * 1e3
        if label == "a":
            ta += dt
        else:
            tb += dt
        print(f"round {r} {label}: {dt:.3f} ms/call")
print(f"mean unpacked {ta/rounds:.3f} ms  packed {tb/rounds:.3f} ms  "
      f"speedup {ta/tb:.3f}x")
