"""Device mesh + sharding layout.

The reference's only parallelism is data parallelism over NCCL DDP
(`train_dhf1k.py:38-61`, `model.py:13-15`, DistributedSamplers in
`datasets/prepare_data.py`). The TPU-native equivalent: a
`jax.sharding.Mesh` with ('data', 'model') axes; batches are sharded on
'data', parameters replicated (model=1 by default, the axis is provisioned
for tensor-parallel extension). Under `jit`, XLA inserts the gradient
all-reduce (`psum`) over ICI automatically — there is no explicit NCCL-style
collective code, by design.

Eval-metric reduction note: the reference logs only rank-0's shard
(diffusion_trainer.py:684,746 — quirk SURVEY.md §8.5). Here eval metrics are
computed on the global (sharded) batch inside jit, so the reduction is
correct by construction.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    num_data: int = -1,
    num_model: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if num_data == -1:
        num_data = len(devices) // num_model
    assert num_data * num_model <= len(devices), (
        f"mesh {num_data}x{num_model} needs more than {len(devices)} devices"
    )
    grid = np.asarray(devices[: num_data * num_model]).reshape(num_data, num_model)
    return Mesh(grid, axis_names=("data", "model"))


def make_mesh_for_batch(
    batch_size: int, num_model: int = 1, devices: Optional[Sequence] = None
) -> Mesh:
    """Largest data-parallel mesh whose size divides the global batch —
    small test/debug batches degrade gracefully to fewer devices."""
    import math

    devices = list(devices if devices is not None else jax.devices())
    avail = len(devices) // num_model
    num_data = math.gcd(batch_size, avail)
    if num_data < avail:
        import warnings

        warnings.warn(
            f"batch_size={batch_size} is not divisible by the {avail} "
            f"available data-parallel devices; using only {num_data} of "
            f"them. Pick a batch size that is a multiple of {avail} to use "
            "every chip.",
            stacklevel=2,
        )
    return make_mesh(num_data, num_model, devices)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading axis sharded over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Device-put a host batch pytree with the leading axis sharded on
    'data'."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def tensor_parallel_param_shardings(params, mesh: Mesh, min_dim: int = 256):
    """Sharding pytree putting large kernels' output-feature axis on the
    'model' mesh axis (replicating everything else).

    This is the tensor-parallel entry point the ('data', 'model') mesh
    provisions: annotate parameters with these shardings under `jit` and
    GSPMD partitions the matmuls and inserts the collectives — no explicit
    psum code, in contrast to the reference's NCCL DDP which replicates all
    parameters (model.py:13-15; the reference has no TP at all, SURVEY.md
    §2.6). Kernels qualify when their LAST axis (flax puts output features
    last for Dense and Conv alike) is divisible by the model-axis size and
    at least `min_dim` wide — small norms/biases stay replicated where
    sharding would only add latency.
    """
    n_model = mesh.shape["model"]
    repl = NamedSharding(mesh, P())

    def rule(x):
        if (
            n_model > 1
            and hasattr(x, "ndim")
            and x.ndim >= 2
            and x.shape[-1] >= min_dim
            and x.shape[-1] % n_model == 0
        ):
            return NamedSharding(
                mesh, P(*([None] * (x.ndim - 1) + ["model"]))
            )
        return repl

    return jax.tree.map(rule, params)
