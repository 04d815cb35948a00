"""Checkpointing with orbax — the one-atomic-pytree replacement for the
reference's paired .pth files + symlinks (trainer/checkpoint.py:42-220,
trainer_sessd.py:212-246): student, EMA teacher, BN stats, optimizer state
and step live in a single TrainState tree per checkpoint directory.
"""
from __future__ import annotations

import pathlib
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def _manager(work_dir, max_to_keep=None) -> ocp.CheckpointManager:
    path = pathlib.Path(work_dir).resolve() / "checkpoints"
    path.mkdir(parents=True, exist_ok=True)
    kw = {"create": True}
    if jax.process_count() > 1:
        # the Trainer saves from host 0 only (the reference's .pth-on-rank-0
        # semantics, trainer/checkpoint.py:42-61); restrict orbax's internal
        # barriers to that process or its directory sync hangs waiting for
        # hosts that never call save (orbax then requires the root dir to
        # pre-exist — the mkdir above — and create=False)
        kw["multiprocessing_options"] = ocp.options.MultiprocessingOptions(
            primary_host=jax.process_index(),
            active_processes={jax.process_index()})
        kw["create"] = False
    options = ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, **kw)
    return ocp.CheckpointManager(path, options=options)


def save_checkpoint(work_dir, state, epoch: int, metadata: Optional[dict] = None):
    """Save the full TrainState at an epoch boundary (CheckpointHook)."""
    mgr = _manager(work_dir)
    state_np = jax.tree_util.tree_map(np.asarray, state)
    mgr.save(epoch, args=ocp.args.Composite(
        state=ocp.args.StandardSave(state_np),
    ))
    mgr.wait_until_finished()
    mgr.close()


def latest_epoch(work_dir) -> Optional[int]:
    mgr = _manager(work_dir)
    step = mgr.latest_step()
    mgr.close()
    return step


def load_checkpoint(work_dir, state_template, epoch: Optional[int] = None):
    """Restore into the structure of ``state_template``; returns (state, epoch)."""
    mgr = _manager(work_dir)
    if epoch is None:
        epoch = mgr.latest_step()
    if epoch is None:
        mgr.close()
        return None, None
    template_np = jax.tree_util.tree_map(np.asarray, state_template)
    restored = mgr.restore(epoch, args=ocp.args.Composite(
        state=ocp.args.StandardRestore(template_np)))
    mgr.close()
    return restored["state"], epoch


def _restart_schedule(opt_state):
    """Reset the schedule-driving count of an ``optax.inject_hyperparams``
    chain to 0 while keeping the inner Adam moments (and their
    bias-correction counts). This reproduces the reference's warm-start
    semantics exactly: ``optimizer.load_state_dict`` restores per-param
    Adam state, but the LR comes from a scheduler stepped by the trainer's
    ``global_step``, which restarts at 0 (trainer_sessd.py:212-217,341-342)
    — without this, a warm-started one-cycle would resume thousands of
    steps into (or past) its anneal at lr ~ lr_max/div/1e4."""
    import jax.numpy as jnp

    def fix(s):
        if hasattr(s, "count") and hasattr(s, "hyperparams"):
            kw = {"count": jnp.zeros_like(s.count)}
            # optax >= 0.2 wraps each schedule as stateful with its own
            # count (WrappedScheduleState) — those drive the lr/momentum
            # evaluation, so they are the ones that must restart
            hs = getattr(s, "hyperparams_states", None)
            if hs is not None:
                kw["hyperparams_states"] = {
                    k: (v._replace(count=jnp.zeros_like(v.count))
                        if hasattr(v, "count") else v)
                    for k, v in hs.items()}
            return s._replace(**kw)
        return s

    return tuple(fix(s) for s in opt_state)


def load_params_only(work_dir, state_template, epoch: Optional[int] = None):
    """Warm start: initialize student AND teacher params from a pretrained
    checkpoint (load_checkpoint_from_scratch, trainer_sessd.py:212-217):
    params into both nets, Adam moments restored, schedule restarted."""
    state, ep = load_checkpoint(work_dir, state_template, epoch)
    if state is None:
        return None
    return state_template._replace(
        params=state.params,
        ema_params=state.params,
        batch_stats=state.batch_stats,
        ema_batch_stats=state.batch_stats,
        opt_state=_restart_schedule(state.opt_state),
    )
