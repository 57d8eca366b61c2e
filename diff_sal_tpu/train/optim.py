"""Optimizer factory: Adam + MultiStepLR + global-norm grad clip.

Mirrors reference `util/utils.py:116-123` + `cfgs/diffusion.yml:53-60`:
Adam(lr=1e-4, betas=(0.9, 0.999), eps=1e-8, wd=0), MultiStepLR with
milestones at [0.5E, 0.75E] epochs and gamma=0.1, clip_grad_norm 1.0.
"""

from __future__ import annotations

import optax

from diff_sal_tpu.config import OptimConfig


def multistep_lr(
    base_lr: float,
    steps_per_epoch: int,
    n_epochs: int,
    milestone_fracs=(0.5, 0.75),
    gamma: float = 0.1,
) -> optax.Schedule:
    """Piecewise-constant schedule at epoch-fraction milestones."""
    boundaries = {
        int(frac * n_epochs * steps_per_epoch): gamma for frac in milestone_fracs
    }
    return optax.piecewise_constant_schedule(base_lr, boundaries)


def make_optimizer_and_schedule(
    cfg: OptimConfig, steps_per_epoch: int, n_epochs: int
):
    """(optimizer, lr schedule) — the schedule is returned so callers log
    the SAME function the optimizer applies (no re-derivation drift)."""
    schedule = multistep_lr(
        cfg.lr, steps_per_epoch, n_epochs, cfg.milestone_fracs, cfg.gamma
    )
    tx = [optax.clip_by_global_norm(cfg.grad_clip)] if cfg.grad_clip else []
    if cfg.optimizer.lower() == "adam":
        if cfg.weight_decay:
            opt = optax.adamw(
                schedule, b1=cfg.beta1, b2=0.999, eps=cfg.eps,
                weight_decay=cfg.weight_decay,
            )
        else:
            opt = optax.adam(schedule, b1=cfg.beta1, b2=0.999, eps=cfg.eps)
    else:
        raise NotImplementedError(cfg.optimizer)
    return optax.chain(*tx, opt), schedule


def make_optimizer(
    cfg: OptimConfig, steps_per_epoch: int, n_epochs: int
) -> optax.GradientTransformation:
    return make_optimizer_and_schedule(cfg, steps_per_epoch, n_epochs)[0]
