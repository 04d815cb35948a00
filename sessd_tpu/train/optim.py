"""Optimizer + schedule: fastai-style one-cycle Adam with true weight decay.

Reproduces the reference recipe exactly (SURVEY §2 P41 — hard part #3):
- OneCycle (learning_schedules_fastai.py:77-96): two cosine phases over
  total_steps with boundary at pct_start; lr goes lr_max/div -> lr_max ->
  lr_max/div/1e4; Adam beta1 ("momentum") goes moms[0] -> moms[1] -> moms[0].
- true weight decay (fastai_optim.py:155-177): p *= (1 - wd*lr) before the
  Adam step == AdamW with decay scaled by lr (optax.adamw semantics).
- gradient clipping at global L2 norm 35 (hooks/optimizer.py:56-65,
  optimizer_config in examples/second/configs/config.py).
"""
from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np
import optax


def annealing_cos(start: float, end: float, pct):
    cos_out = jnp.cos(jnp.pi * pct) + 1.0
    return end + (start - end) / 2.0 * cos_out


@dataclass(frozen=True)
class OneCycleConfig:
    lr_max: float = 3e-3
    moms: tuple = (0.95, 0.85)
    div_factor: float = 10.0
    pct_start: float = 0.4
    total_steps: int = 1
    wd: float = 0.01
    beta2: float = 0.99
    eps: float = 1e-8
    grad_clip_norm: float = 35.0


def one_cycle_lr(cfg: OneCycleConfig):
    low = cfg.lr_max / cfg.div_factor
    a1 = int(cfg.total_steps * cfg.pct_start)

    def sched(step):
        step = jnp.minimum(step, cfg.total_steps)
        up = annealing_cos(low, cfg.lr_max, step / jnp.maximum(a1, 1))
        down = annealing_cos(cfg.lr_max, low / 1e4,
                             (step - a1) / jnp.maximum(cfg.total_steps - a1, 1))
        return jnp.where(step < a1, up, down)

    return sched


def one_cycle_mom(cfg: OneCycleConfig):
    a1 = int(cfg.total_steps * cfg.pct_start)

    def sched(step):
        step = jnp.minimum(step, cfg.total_steps)
        up = annealing_cos(cfg.moms[0], cfg.moms[1], step / jnp.maximum(a1, 1))
        down = annealing_cos(cfg.moms[1], cfg.moms[0],
                             (step - a1) / jnp.maximum(cfg.total_steps - a1, 1))
        return jnp.where(step < a1, up, down)

    return sched


def build_optimizer(cfg: OneCycleConfig) -> optax.GradientTransformation:
    lr = one_cycle_lr(cfg)
    mom = one_cycle_mom(cfg)
    inner = optax.inject_hyperparams(optax.adamw)(
        learning_rate=lr,
        b1=mom,
        b2=cfg.beta2,
        eps=cfg.eps,
        weight_decay=cfg.wd,
    )
    return optax.chain(optax.clip_by_global_norm(cfg.grad_clip_norm), inner)
