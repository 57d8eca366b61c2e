"""Checkpointing: orbax-native save/restore + best-checkpoint bookkeeping.

Preserves the reference's checkpoint contract
(`torch.save({"state_dict", "optim_dict", "epoch", "step"})` per epoch,
best model selected by max val nss+cc+sim — diffusion_trainer.py:263-280,
408-428): each save carries {params, batch_stats, opt_state, epoch, step},
`best` is a pointer updated on score improvement, and resume restores all of
it. Cross-stage transfer (AV warm-start from the visual best, strict=0 —
model.py:17-22) maps to a partial pytree merge.
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: Optional[int] = None):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )
        self._best_file = os.path.join(self.directory, "best.json")

    def save(self, step: int, state: Any, metrics: Optional[dict] = None):
        self._mgr.save(
            step, args=ocp.args.StandardSave(state), metrics=metrics or {}
        )
        self._mgr.wait_until_finished()

    def restore(self, step: Optional[int] = None, template: Any = None):
        step = self._mgr.latest_step() if step is None else step
        if step is None:
            return None
        if template is not None:
            return self._mgr.restore(
                step, args=ocp.args.StandardRestore(template)
            )
        return self._mgr.restore(step)

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    # -- best-model bookkeeping (max nss+cc+sim, reference :276-280) --------
    def update_best(self, step: int, score: float) -> bool:
        best = self.best()
        if best is None or score > best["score"]:
            with open(self._best_file, "w") as f:
                json.dump({"step": int(step), "score": float(score)}, f)
            return True
        return False

    def best(self) -> Optional[dict]:
        if not os.path.exists(self._best_file):
            return None
        with open(self._best_file) as f:
            return json.load(f)

    def restore_best(self, template: Any = None):
        b = self.best()
        if b is None:
            return None
        return self.restore(b["step"], template)


def partial_load(target_params, source_params):
    """strict=0-style warm start: copy leaves whose path+shape match
    (reference model.py:17-22). Returns (merged, n_loaded, n_skipped)."""
    flat_t = dict(jax.tree_util.tree_flatten_with_path(target_params)[0])
    flat_s = dict(jax.tree_util.tree_flatten_with_path(source_params)[0])
    loaded = skipped = 0
    merged = {}
    for path, leaf in flat_t.items():
        src = flat_s.get(path)
        if src is not None and np.shape(src) == np.shape(leaf):
            merged[path] = src
            loaded += 1
        else:
            merged[path] = leaf
            skipped += 1
    treedef = jax.tree_util.tree_structure(target_params)
    leaves = [merged[p] for p, _ in jax.tree_util.tree_flatten_with_path(
        target_params)[0]]
    return jax.tree_util.tree_unflatten(treedef, leaves), loaded, skipped
