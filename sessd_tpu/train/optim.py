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


def build_legacy_schedule(policy: str, base_lr: float, steps_per_epoch: int,
                          total_steps: int, *, gamma: float = 0.1,
                          milestones=(), power: float = 1.0,
                          min_lr: float = 0.0, warmup: str | None = None,
                          warmup_iters: int = 500,
                          warmup_ratio: float = 1.0 / 3.0):
    """The reference's legacy LrUpdaterHook policies (SURVEY §2 P11,
    det3d/torchie/trainer/hooks/lr_updater.py): fixed / step / exp / poly /
    cosine, each with the hooks' optional warmup ramp. By-epoch policies
    (step, exp) quantize to epoch granularity exactly like the hooks'
    before_train_epoch updates."""
    spe = max(int(steps_per_epoch), 1)
    ms = jnp.asarray(sorted(int(m) for m in milestones), jnp.int32)

    def base(step):
        ep = step // spe
        if policy == "fixed":
            return jnp.full(step.shape if hasattr(step, "shape") else (),
                            base_lr, jnp.float32)
        if policy == "step":
            k = jnp.sum(ep >= ms) if ms.size else 0
            return base_lr * gamma ** k
        if policy == "exp":
            return base_lr * gamma ** ep
        if policy == "poly":
            pct = jnp.clip(step / max(total_steps, 1), 0.0, 1.0)
            return base_lr * (1.0 - pct) ** power
        if policy == "cosine":
            pct = jnp.clip(step / max(total_steps, 1), 0.0, 1.0)
            return annealing_cos(base_lr, min_lr, pct)
        raise ValueError(f"unknown lr policy {policy!r}")

    def sched(step):
        step = jnp.asarray(step)
        lr = base(step)
        if warmup is None:
            return lr
        pct = jnp.clip(step / max(warmup_iters, 1), 0.0, 1.0)
        if warmup == "constant":
            wlr = lr * warmup_ratio
        elif warmup == "linear":
            wlr = lr * (1.0 - (1.0 - pct) * (1.0 - warmup_ratio))
        elif warmup == "exp":
            wlr = lr * warmup_ratio ** (1.0 - pct)
        else:
            raise ValueError(f"unknown warmup {warmup!r}")
        return jnp.where(step < warmup_iters, wlr, lr)

    return sched


def build_optimizer_with_schedule(lr_fn, wd: float = 0.01, b1: float = 0.9,
                                  b2: float = 0.99, eps: float = 1e-8,
                                  grad_clip_norm: float = 35.0):
    """AdamW + global-norm clip around an arbitrary lr schedule (the
    non-one-cycle optimizer path of the reference's torchie trainer)."""
    inner = optax.inject_hyperparams(optax.adamw)(
        learning_rate=lr_fn, b1=b1, b2=b2, eps=eps, weight_decay=wd)
    return optax.chain(optax.clip_by_global_norm(grad_clip_norm), inner)


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
