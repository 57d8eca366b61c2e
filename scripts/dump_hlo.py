"""Dump the optimized TPU HLO of the full AV inference pipeline and print
selected instructions (default: the add_add fusions), to chase layout
problems the xplane categories only hint at.

    python scripts/dump_hlo.py [batch] [regex] [mvit overrides k=v,k=v]
"""

import ast
import dataclasses
import re
import sys

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


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    pat = re.compile(sys.argv[2] if len(sys.argv) > 2 else r"add_add_fusion")
    cfg = dataclasses.replace(
        ModelConfig.audio_visual(), compute_dtype="bfloat16"
    )
    ov = {}
    if len(sys.argv) > 3:
        for part in sys.argv[3].split(","):
            k, v = part.split("=", 1)
            ov[k.strip()] = ast.literal_eval(v.strip())
    cfg = dataclasses.replace(
        cfg,
        visual=dataclasses.replace(
            cfg.visual, use_pallas_attention=True, **ov
        ),
    )
    model = VideoSaliencyModel(cfg)
    key = jax.random.PRNGKey(0)
    rgb = jax.random.normal(key, (B, 16, 224, 384, 3))
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

    compiled = (
        jax.jit(pipeline)
        .lower(variables, rgb, audio, jax.random.PRNGKey(2))
        .compile()
    )
    hlo = compiled.as_text()
    out_path = "/tmp/pipeline_hlo.txt"
    with open(out_path, "w") as f:
        f.write(hlo)
    print(f"full HLO -> {out_path} ({len(hlo.splitlines())} lines)")
    # print the computation bodies of matching fusions
    lines = hlo.splitlines()
    for i, ln in enumerate(lines):
        if pat.search(ln) and "= " in ln and "fusion(" in ln:
            print(ln.strip()[:400])


if __name__ == "__main__":
    main()
