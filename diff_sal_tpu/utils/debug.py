"""Debug / sanitizer toggles (SURVEY.md §5 — the reference has no race or
NaN tooling; JAX purity plus these switches cover that ground).

`nan_guard()` enables jax_debug_nans for a scope; `check_finite(tree)` is a
host-side assertion helper; `tree_norms` summarizes pytree magnitudes for
quick divergence triage.
"""

from __future__ import annotations

import contextlib
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np


@contextlib.contextmanager
def nan_guard(enabled: bool = True):
    """Raise on the first NaN produced inside the scope (uncompiled ops +
    debug-mode jit)."""
    if not enabled:
        yield
        return
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


def check_finite(tree: Any, name: str = "tree") -> None:
    bad = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = np.asarray(leaf)
        if not np.isfinite(arr).all():
            bad.append(
                (jax.tree_util.keystr(path), int(np.isnan(arr).sum()),
                 int(np.isinf(arr).sum()))
            )
    if bad:
        lines = "\n".join(f"  {p}: nan={n} inf={i}" for p, n, i in bad[:20])
        raise FloatingPointError(f"non-finite values in {name}:\n{lines}")


def tree_norms(tree: Any) -> Dict[str, float]:
    """Per-top-level-key L2 norms — cheap divergence triage."""
    out = {}
    if hasattr(tree, "items"):
        for k, v in tree.items():
            leaves = jax.tree.leaves(v)
            out[str(k)] = float(
                jnp.sqrt(sum(jnp.sum(jnp.square(l)) for l in leaves))
            )
    return out
