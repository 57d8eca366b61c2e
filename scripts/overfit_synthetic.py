"""End-to-end learning check: overfit the synthetic blob dataset on the
current backend (TPU or CPU) and print the loss curve.

    python scripts/overfit_synthetic.py [steps]
"""

import sys
import time

sys.path.insert(0, ".")

import dataclasses

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", ".jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from diff_sal_tpu.config import (
    ExperimentConfig,
    MViTConfig,
    ModelConfig,
    OptimConfig,
    SalUNetConfig,
    TrainingConfig,
)
from diff_sal_tpu.data.loader import Loader, collate
from diff_sal_tpu.data.synthetic import SyntheticVisualDataset
from diff_sal_tpu.diffusion.schedule import make_schedule
from diff_sal_tpu.models.diff_model import VideoSaliencyModel
from diff_sal_tpu.train.losses import eval_scores
from diff_sal_tpu.train.optim import make_optimizer
from diff_sal_tpu.train.train_step import create_train_state, make_train_step


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    hw = (64, 96)
    cfg = ExperimentConfig(
        model=ModelConfig(
            visual=MViTConfig.tiny(spatial_size=hw),
            decoder=SalUNetConfig(img_size=hw),
        ),
        optim=OptimConfig(lr=3e-4),
        training=TrainingConfig(batch_size=4, shared_timestep_per_batch=False),
    )
    model = VideoSaliencyModel(cfg.model)
    schedule = make_schedule("cosine", num_diffusion_timesteps=1000)
    ds = SyntheticVisualDataset(n=4, img_size=hw, frames=16)
    batch = collate([ds[i] for i in range(4)])
    batch = {k: jnp.asarray(v) for k, v in batch.items() if k in ("rgb", "salmap")}

    variables = model.init(
        jax.random.PRNGKey(0),
        {"rgb": batch["rgb"][:1], "input": jnp.zeros((1, *hw, 1))},
        jnp.zeros((1,)),
    )
    tx = make_optimizer(cfg.optim, steps_per_epoch=steps, n_epochs=10)
    state = create_train_state(model, variables, tx)
    step = jax.jit(make_train_step(model, schedule, cfg))

    t0 = time.time()
    for i in range(steps):
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
        if i % 10 == 0 or i == steps - 1:
            print(f"step {i}: loss {float(metrics['total']):.2f} "
                  f"({time.time()-t0:.0f}s)", flush=True)
    print("final loss:", float(metrics["total"]))


if __name__ == "__main__":
    main()
