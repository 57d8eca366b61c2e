"""Probe: where does the dryrun train-step cold-compile time go?

Times jit compile (cold, throwaway cache-less) of grad-of-loss for each
component at the dryrun shapes (64x96, B=2 CPU):
  mvit    MViTConfig.dryrun (7 blocks, remat on/off)
  decoder SalUNet 4-stage at 64x96
  vggish  VGGish trunk
Run on the virtual-CPU backend like the dryrun itself.

    JAX_PLATFORMS=cpu python scripts/probe_dryrun_compile.py [which ...]
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")

from diff_sal_tpu.config import MViTConfig, SalUNetConfig, VGGishConfig
from diff_sal_tpu.models.mvit import MViT
from diff_sal_tpu.models.sal_unet import SalUNet
from diff_sal_tpu.models.vggish import VGGish

HW = (64, 96)
B = 2


def bench_compile(tag, loss_fn, params):
    t0 = time.perf_counter()
    lowered = jax.jit(jax.grad(loss_fn)).lower(params)
    t1 = time.perf_counter()
    compiled = lowered.compile()
    t2 = time.perf_counter()
    del compiled
    print(f"{tag:24s} lower {t1 - t0:6.1f}s  compile {t2 - t1:6.1f}s",
          flush=True)


def probe_mvit(remat: bool):
    cfg = MViTConfig.dryrun(spatial_size=HW, remat=remat)
    m = MViT(cfg)
    x = jnp.zeros((B, 16, *HW, 3))
    params = jax.jit(m.init)(jax.random.PRNGKey(0), x)

    def loss(p):
        outs = m.apply(p, x)
        return sum(jnp.sum(o.astype(jnp.float32) ** 2) for o in outs)

    bench_compile(f"mvit7 remat={remat}", loss, params)


def probe_mvit16(remat: bool):
    cfg = MViTConfig.small(spatial_size=HW, remat=remat)
    m = MViT(cfg)
    x = jnp.zeros((B, 16, *HW, 3))
    params = jax.jit(m.init)(jax.random.PRNGKey(0), x)

    def loss(p):
        outs = m.apply(p, x)
        return sum(jnp.sum(o.astype(jnp.float32) ** 2) for o in outs)

    bench_compile(f"mvit16 remat={remat}", loss, params)


def probe_decoder():
    cfg = SalUNetConfig(img_size=HW)
    m = SalUNet(cfg)
    t0 = 16 // 2
    feats = [
        jnp.zeros((B, t0, HW[0] // s, HW[1] // s, c))
        for s, c in [(32, 768), (16, 384), (8, 192), (4, 96)]
    ]
    audio = jnp.zeros((B, 9, HW[0] // 32, HW[1] // 32, 512))
    x_t = jnp.zeros((B, *HW, 1))
    t = jnp.zeros((B,))
    variables = jax.jit(m.init)(jax.random.PRNGKey(0), x_t, t, feats, audio)

    def loss(v):
        y, _ = m.apply(
            v, x_t, t, feats, audio, train=True,
            rngs={"dropout": jax.random.PRNGKey(1)},
            mutable=["batch_stats"],
        )
        return jnp.sum(y.astype(jnp.float32) ** 2)

    bench_compile("decoder", loss, variables)


def probe_vggish():
    m = VGGish(VGGishConfig())
    a = jnp.zeros((B * 9, HW[0] // 2, HW[1] // 2, 1))
    params = jax.jit(m.init)(jax.random.PRNGKey(0), a)

    def loss(p):
        return jnp.sum(m.apply(p, a).astype(jnp.float32) ** 2)

    bench_compile("vggish", loss, params)


PROBES = {
    "mvit": lambda: probe_mvit(True),
    "mvit_noremat": lambda: probe_mvit(False),
    "mvit16": lambda: probe_mvit16(True),
    "decoder": probe_decoder,
    "vggish": probe_vggish,
}

if __name__ == "__main__":
    which = sys.argv[1:] or ["mvit", "mvit_noremat", "decoder", "vggish"]
    for w in which:
        PROBES[w]()
