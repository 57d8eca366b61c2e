"""Multi-host initialization — the `jax.distributed` analogue of the
reference's torchrun rendezvous (`init_distributed_mode`,
train_dhf1k.py:38-61).

On a multi-host TPU slice, call `initialize()` before any JAX computation;
every host then sees the global device set and `make_mesh()` spans the
slice. Single-host (and the CI/virtual-device case) is a no-op. Rank-0-only
printing mirrors the reference's builtins monkeypatch without the
monkeypatch.
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize jax.distributed from args or the standard env vars
    (COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID); no-op when
    single-process and nothing is configured."""
    coordinator_address = coordinator_address or os.environ.get(
        "COORDINATOR_ADDRESS"
    )
    if coordinator_address is None and num_processes is None:
        return  # single host
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def is_main_process() -> bool:
    return jax.process_index() == 0


def main_print(*args, **kwargs) -> None:
    """Print on the coordinator only (reference setup_for_distributed,
    train_dhf1k.py:22-35)."""
    if is_main_process():
        print(*args, **kwargs)


def process_info() -> dict:
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }
