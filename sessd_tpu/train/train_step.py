"""The SE-SSD training step — teacher forward + student forward + all losses
+ EMA update in ONE jitted function.

This replaces the reference's trainer/hook/DDP/apex machinery
(trainer_sessd.py:248-360): the teacher is not a second process-wrapped
module but a second parameter pytree living in the train state; the EMA
update (alpha = min(1 - 1/(step+1), 0.999), trainer_sessd.py:315-318) is a
tree_map; gradient all-reduce across the data mesh axis is emitted by XLA
under pjit.
"""
from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .losses import LossConfig, consistency_loss, detection_loss


class TrainState(NamedTuple):
    step: jnp.ndarray
    params: Any              # student
    batch_stats: Any         # student BN running stats
    ema_params: Any          # teacher
    ema_batch_stats: Any     # teacher BN running stats
    opt_state: Any


def sigmoid_rampup(epoch, rampup_epochs: float = 15.0):
    """Consistency-weight ramp (trainer_sessd.py:305-312)."""
    current = jnp.clip(epoch, 0.0, rampup_epochs)
    phase = 1.0 - current / rampup_epochs
    return jnp.exp(-5.0 * phase * phase)


def create_train_state(model, optimizer, sample_batch, batch_size, rng=None):
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    variables = model.init(
        rng,
        sample_batch["voxels"].reshape((-1,) + sample_batch["voxels"].shape[2:]),
        _coords_with_batch(sample_batch["coords"]),
        sample_batch["num_points"].reshape(-1),
        sample_batch["voxel_mask"].reshape(-1),
        batch_size,
        train=False,
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        ema_params=jax.tree_util.tree_map(jnp.copy, params),
        ema_batch_stats=jax.tree_util.tree_map(jnp.copy, batch_stats),
        opt_state=optimizer.init(params),
    )


def _coords_with_batch(coords_zyx):
    """[B, V, 3] (z, y, x) -> [B*V, 4] (b, z, y, x)."""
    b, v, _ = coords_zyx.shape
    bi = jax.lax.broadcasted_iota(jnp.int32, (b, v, 1), 0)
    return jnp.concatenate([bi, coords_zyx], axis=-1).reshape(b * v, 4)


def _flatten_voxels(batch, suffix=""):
    vox = batch["voxels" + suffix]
    b, v = vox.shape[:2]
    return (
        vox.reshape((b * v,) + vox.shape[2:]),
        _coords_with_batch(batch["coords" + suffix]),
        batch["num_points" + suffix].reshape(b * v),
        batch["voxel_mask" + suffix].reshape(b * v),
    )


PACK_POS_CAP = 1024  # >> max positive anchors/sample (~200 at 15 GT-AUG cars)


def pack_batch(batch: dict, pos_cap: int = PACK_POS_CAP) -> dict:
    """Host-side wire compression of a train batch (numpy, in place on a
    copy). The full-scale batch ships ~52 MB/step to the device; through
    the axon tunnel (~60 MB/s) that is most of the step time, and on any
    host it is wasted PCIe. Exactness notes per field:

    - reg_targets [B, A, 7] f32 (15.8 MB/chain) are nonzero ONLY at
      positive anchors (target_ops.py semantics; guarded below) -> ship
      (indices, values) of the <= pos_cap positives and scatter on device.
    - labels [B, A] int32 in {-1, 0, 1..C} -> int8.
    - voxel point coords f32 -> f16: the backbone consumes the VFE mean in
      bfloat16 (8-bit mantissa) anyway, f16's 10-bit mantissa is strictly
      finer than what the model sees after the cast.
    - coords [B, V, 3] grid indices < 1600 -> int16; num_points <= 5 -> u8.

    Falls back to dense reg_targets for a chain whose positives exceed
    pos_cap (exactness first). Unpacked by ``unpack_batch`` inside the
    jitted step.
    """
    out = dict(batch)
    for sfx in ("", "_raw"):
        lk, rk = "labels" + sfx, "reg_targets" + sfx
        if lk not in out:
            continue
        labels = np.asarray(out[lk])
        out[lk] = labels.astype(np.int8)
        if rk in out:
            rt = np.asarray(out[rk])
            b, a = labels.shape
            n_pos = int((labels > 0).sum(axis=1).max()) if b else 0
            if n_pos > pos_cap:
                continue  # dense fallback, still exact
            idx = np.full((b, pos_cap), a, np.int32)  # a = OOB pad
            val = np.zeros((b, pos_cap, rt.shape[-1]), np.float32)
            for i in range(b):
                pos = np.flatnonzero(labels[i] > 0)
                idx[i, :len(pos)] = pos
                val[i, :len(pos)] = rt[i, pos]
            del out[rk]
            out[rk + "_idx"] = idx
            out[rk + "_val"] = val
        for k, dt in (("voxels" + sfx, np.float16),
                      ("coords" + sfx, np.int16),
                      ("num_points" + sfx, np.uint8)):
            if k in out:
                out[k] = np.asarray(out[k]).astype(dt)
    return out


def unpack_batch(batch: dict) -> dict:
    """In-graph inverse of ``pack_batch`` (no-op on unpacked batches)."""
    out = dict(batch)
    for sfx in ("", "_raw"):
        ik = f"reg_targets{sfx}_idx"
        if ik in out:
            idx = out.pop(ik)
            val = out.pop(f"reg_targets{sfx}_val")
            a = out["labels" + sfx].shape[-1]
            code = val.shape[-1]
            # pad rows carry idx == a (out of bounds): dropped by scatter
            dense = jnp.zeros(idx.shape[:-1] + (a, code), jnp.float32)
            out[f"reg_targets{sfx}"] = jax.vmap(
                lambda d, i, v: d.at[i].set(v, mode="drop"))(dense, idx, val)
        lk = "labels" + sfx
        if lk in out and out[lk].dtype != jnp.int32:
            out[lk] = out[lk].astype(jnp.int32)
        vk = "voxels" + sfx
        if vk in out and out[vk].dtype != jnp.float32:
            out[vk] = out[vk].astype(jnp.float32)
        ck = "coords" + sfx
        if ck in out and out[ck].dtype != jnp.int32:
            out[ck] = out[ck].astype(jnp.int32)
        nk = "num_points" + sfx
        if nk in out and out[nk].dtype != jnp.int32:
            out[nk] = out[nk].astype(jnp.int32)
    return out


def _squeeze_rulebooks(rb):
    """Loader-built rulebooks (data/rulebooks.py) carry a leading
    ``num_shards`` axis that shard_map reduces to 1 per device — drop it.
    Chains without the axis (perm ndim == 1) pass through unchanged."""
    if rb is None or rb["perm"].ndim == 1:
        return rb
    return jax.tree_util.tree_map(lambda a: jnp.squeeze(a, 0), rb)


def make_train_step(model, optimizer, loss_cfg: LossConfig = LossConfig(),
                    ema_decay_cap: float = 0.999,
                    compute_teacher_metrics: bool = True,
                    axis_name: str | None = None,
                    teacher_model=None,
                    enable_ssl: bool = True):
    """Builds the jittable train_step(state, batch, consistency_weight).

    batch (all leading dim B):
        voxels [B, V, P, F], coords [B, V, 3] zyx, num_points [B, V],
        voxel_mask [B, V], + the same four with the ``_raw`` suffix
        (teacher inputs, un-augmented), anchors [B, A, 7],
        labels/reg_targets (+ _raw) [B, A(, 7)],
        transformation: flipped/noise_rotation/noise_scale [B].

    teacher_model: optional second module for the TEACHER forward only.
    The teacher is inference-shaped (no grads flow through it), so it may
    run a different execution plan (dense_from_stage / conv_impl) than the
    student; the param tree is invariant under plan choice
    (tests/test_backbone_hybrid.py), so the EMA pytree applies unchanged.

    enable_ssl=False builds the CIA-SSD supervised-only step (the
    reference's teacherless trainer.py path, SURVEY P4): no teacher
    forward, no consistency loss, and the batch needs no ``*_raw`` keys or
    ``transformation`` (pair with PipelineConfig.produce_raw=False). The
    EMA params are still maintained (one tree saxpy — negligible) so the
    pretrain checkpoint carries a usable EMA snapshot; ema_batch_stats
    mirrors the student's.
    """
    tea_model = teacher_model if teacher_model is not None else model

    def apply(params, batch_stats, inputs, batch_size, rulebooks=None,
              module=model):
        kw = {} if rulebooks is None else {"rulebooks": rulebooks}
        preds, updates = module.apply(
            {"params": params, "batch_stats": batch_stats},
            *inputs, batch_size, train=True, mutable=["batch_stats"], **kw,
        )
        return preds, updates["batch_stats"]

    def train_step(state: TrainState, batch, consistency_weight):
        batch = unpack_batch(batch)  # no-op unless pack_batch compressed it
        b = batch["voxels"].shape[0]
        stu_inputs = _flatten_voxels(batch)
        # optional loader-built (host C++) rulebook chains — they are pure
        # functions of the batch's voxel coords, so building them in the
        # data path removes all device-side sorts/LUT lookups from the step
        rb_stu = _squeeze_rulebooks(batch.get("rulebooks"))

        if enable_ssl:
            tea_inputs = _flatten_voxels(batch, "_raw")
            rb_tea = _squeeze_rulebooks(batch.get("rulebooks_raw"))
            # teacher forward (no grad; BN in batch-stats mode like
            # model_ema.train() at trainer_sessd.py:321)
            preds_tea, new_ema_stats = apply(
                state.ema_params, state.ema_batch_stats, tea_inputs, b,
                rb_tea, module=tea_model)
            preds_tea = jax.lax.stop_gradient(preds_tea)
        else:
            preds_tea = None

        def loss_fn(params):
            preds_stu, new_stats = apply(params, state.batch_stats,
                                         stu_inputs, b, rb_stu)
            sup_loss, metrics = detection_loss(preds_stu[0], batch, loss_cfg)
            if enable_ssl:
                cons, cons_dir = consistency_loss(
                    preds_stu[0], preds_tea[0], batch["anchors"],
                    batch["transformation"], loss_cfg.consistency)
                total = sup_loss + consistency_weight * cons
                metrics = dict(metrics, consistency_loss=cons,
                               consistency_dir_loss=cons_dir, loss=total)
            else:
                total = sup_loss
                metrics = dict(metrics, loss=total)
            return total, (new_stats, metrics)

        grads, (new_stats, metrics) = jax.grad(loss_fn, has_aux=True)(state.params)
        if axis_name is not None:
            # data-parallel gradient all-reduce (mean), emitted by XLA over
            # ICI — the DDP/allreduce_grads equivalent (SURVEY §2.3)
            grads = jax.lax.pmean(grads, axis_name)
        updates, new_opt_state = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)

        # EMA teacher update (trainer_sessd.py:315-318)
        alpha = jnp.minimum(1.0 - 1.0 / (state.step.astype(jnp.float32) + 1.0),
                            ema_decay_cap)
        new_ema = jax.tree_util.tree_map(
            lambda e, p: alpha * e + (1.0 - alpha) * p, state.ema_params, new_params)
        if not enable_ssl:
            new_ema_stats = new_stats

        if enable_ssl and compute_teacher_metrics:
            tea_loss, tea_metrics = detection_loss(
                preds_tea[0], batch, loss_cfg,
                labels_key="labels_raw", reg_targets_key="reg_targets_raw",
                include_odiou=False)
            metrics.update({k + "_ema": v for k, v in tea_metrics.items()})
            metrics["loss_ema"] = tea_loss

        metrics["grad_norm"] = optax.global_norm(grads)
        if axis_name is not None:
            metrics = jax.lax.pmean(metrics, axis_name)

        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            ema_params=new_ema,
            ema_batch_stats=new_ema_stats,
            opt_state=new_opt_state,
        )
        return new_state, metrics

    return train_step
