"""Exponential moving average of parameters.

The reference ships a classic shadow-param EMA helper that is never
instantiated (`models/diffusion_decoder/ema.py`, config `ema: false` —
SURVEY.md §5). Here it is a working, optional feature: a pure pytree update
usable inside the jitted train step, off by default to match the reference.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp


def ema_init(params) -> Any:
    return jax.tree.map(jnp.asarray, params)


def ema_update(ema_params, new_params, decay: float = 0.9999):
    """shadow = decay * shadow + (1 - decay) * new  (reference ema.py:15-25)."""
    return jax.tree.map(
        lambda e, p: decay * e + (1.0 - decay) * p, ema_params, new_params
    )


def swap_in_ema(state, ema_params):
    """Return a state whose params are the EMA shadow (for eval)."""
    return state.replace(params=ema_params)
