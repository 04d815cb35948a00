"""Trainer: the epoch loop around the jitted SE-SSD step.

Replaces the reference's Trainer + hook framework + apis/train_sessd
(trainer_sessd.py:54-512, train_sessd.py:253-323). Responsibilities that
were hooks are now inline code in one readable loop: one-cycle stepping is
inside the optimizer, EMA is inside the jitted step, checkpointing is
orbax, the val workflow runs the fixed-shape predict path + host AP.
"""
from __future__ import annotations

import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import builder
from ..models.predict import predict_batch
from ..parallel.mesh import (DATA_AXIS, make_mesh, make_sharded_train_step,
                             replicate, shard_batch)
from ..utils import checkpoint as ckpt
from ..utils.logging import LogBuffer, TextLogger, get_root_logger
from .train_step import (TrainState, create_train_state, make_train_step,
                         pack_batch, sigmoid_rampup)


def _device_batch(batch: dict, anchors: Optional[np.ndarray] = None) -> dict:
    """Strip host-only fields; inject the shared anchor grid [B, A, 7]."""
    drop = {"metadata", "calib", "frustum", "gt_boxes", "num_gt"}
    out = {k: v for k, v in batch.items() if k not in drop}
    if anchors is not None and "anchors" not in out:
        b = batch["voxels"].shape[0]
        out["anchors"] = np.broadcast_to(
            anchors.astype(np.float32), (b,) + anchors.shape)
    return out


class Trainer:
    def __init__(self, cfg, work_dir: Optional[str] = None, seed: int = 0,
                 distributed: bool = True):
        self.cfg = cfg
        self.work_dir = work_dir or cfg.work_dir
        self.seed = seed
        self.logger = get_root_logger(self.work_dir)

        # multi-host: each process loads its own slice of every epoch
        # (the jax replacement for DistributedSampler, sampler.py:74-222);
        # tools/train.py calls jax.distributed.initialize() beforehand
        self.num_hosts = jax.process_count()
        self.host_id = jax.process_index()

        self.train_dataset = builder.build_dataset(cfg, "train", seed=seed)
        self.val_dataset = builder.build_dataset(cfg, "val", seed=seed)
        self.train_loader = builder.build_dataloader(
            cfg, self.train_dataset, shuffle=True, seed=seed,
            num_shards=self.num_hosts, shard_index=self.host_id)
        self.val_loader = builder.build_dataloader(cfg, self.val_dataset,
                                                   shuffle=False, seed=seed)

        steps_per_epoch = len(self.train_loader)
        self.optimizer, self.lr_fn = builder.build_optimizer_from_cfg(
            cfg, steps_per_epoch)
        self.loss_cfg = builder.build_loss_config(cfg)
        self.predict_cfg = builder.build_predict_config(cfg)

        if distributed and self.num_hosts > 1:
            # global mesh over all hosts' devices; every host feeds its
            # per-host batch slice (samples_per_gpu rows each)
            self.mesh = make_mesh()
        elif distributed:
            bs = cfg.data["samples_per_gpu"]
            n_dev = len(jax.devices())
            k = max(d for d in range(1, min(n_dev, bs) + 1) if bs % d == 0)
            self.mesh = make_mesh(jax.devices()[:k]) if k > 1 else None
        else:
            self.mesh = None
        axis = DATA_AXIS if self.mesh is not None else None
        self.model = builder.build_detector(cfg, axis_name=axis)
        init_model = builder.build_detector(cfg, axis_name=None)
        if hasattr(init_model, "conv_impl"):
            # keep init off the Pallas path: the CPU backend can't run it,
            # and the param tree is identical across execution plans
            init_model = init_model.clone(conv_impl="gather")

        sample = next(iter(builder.build_dataloader(
            cfg, self.val_dataset, shuffle=False, seed=seed)))
        sample = _device_batch(sample)
        init_batch = {k: np.asarray(v) for k, v in sample.items()
                      if k in ("voxels", "coords", "num_points", "voxel_mask")}
        if hasattr(init_model, "sparse_shape"):
            # parameter shapes depend only on channel dims, never on the
            # grid or row capacities — init against a tiny grid (seconds)
            # instead of tracing the full-scale forward (minutes)
            tiny = (41, 32, 32)
            init_model = init_model.clone(sparse_shape=tiny,
                                          stage_capacity=(128,) * 5)
            init_batch = {
                "voxels": init_batch["voxels"][:, :64],
                "coords": np.minimum(init_batch["coords"][:, :64],
                                     np.int32(tiny) - 1),
                "num_points": init_batch["num_points"][:, :64],
                "voxel_mask": init_batch["voxel_mask"][:, :64],
            }
        # init on the CPU backend: tracing/compiling model.init against a
        # remote TPU takes minutes; the weights are then shipped once
        try:
            cpu = jax.local_devices(backend="cpu")[0]
        except RuntimeError:
            cpu = None
        if cpu is not None and jax.local_devices()[0].platform != "cpu":
            with jax.default_device(cpu):
                self.state = create_train_state(
                    init_model, self.optimizer, init_batch,
                    batch_size=cfg.data["samples_per_gpu"])
            self.state = jax.device_put(
                jax.tree_util.tree_map(np.asarray, self.state),
                jax.local_devices()[0])
        else:
            self.state = create_train_state(
                init_model, self.optimizer, init_batch,
                batch_size=cfg.data["samples_per_gpu"])

        # the teacher forward is inference-shaped (no grads), so it may run
        # a different execution plan than the student (param tree invariant
        # under plan — test_backbone_hybrid.py / test_teacher_plan.py)
        teacher_model = None
        tplan = {k: cfg[f"teacher_{k}"] for k in ("dense_from_stage",
                                                  "conv_impl")
                 if cfg.get(f"teacher_{k}") is not None}
        if tplan and hasattr(self.model, "dense_from_stage"):
            teacher_model = self.model.clone(**tplan)
        # enable_ssl=False -> the CIA-SSD supervised-only step (no teacher
        # forward, no consistency, no *_raw batch keys — SURVEY P4)
        self.enable_ssl = bool(cfg.get("my_paras", {}).get("enable_ssl", True))
        step = make_train_step(self.model, self.optimizer, self.loss_cfg,
                               ema_decay_cap=cfg.get("ema_decay_cap", 0.999),
                               axis_name=axis, teacher_model=teacher_model,
                               enable_ssl=self.enable_ssl)
        if self.mesh is not None:
            self.train_step = make_sharded_train_step(step, self.mesh)
            self.state = replicate(self.state, self.mesh)
        else:
            self.train_step = jax.jit(step)

        # loader-built host rulebooks (data/rulebooks.py): the sparse
        # backbone's gather maps are pure functions of the batch coords, so
        # the C++ builder computes them in the prefetch workers and the
        # jitted step skips all device-side sorts/LUT lookups
        if (cfg.data.get("host_rulebooks", True)
                and hasattr(self.model, "stage_capacity")):
            from ..data.rulebooks import make_train_rulebook_transform
            n_shards = (self.mesh.local_mesh.size
                        if self.mesh is not None else 1)
            self.train_loader.batch_transform = make_train_rulebook_transform(
                self.model.sparse_shape, self.model.stage_capacity,
                num_shards=n_shards,
                suffixes=("", "_raw") if self.enable_ssl else ("",))

        self.epoch = 0
        # AP-vs-epoch trajectory: every validate() appends a summary row
        # here, so a training run leaves a machine-readable record of how
        # AP evolved (VERDICT r4: the 480-step acceptance was blind —
        # "needs more steps" vs "plateaued" was indistinguishable)
        self.val_history: list = []
        self._snapshot_run_context()
        self.anchors_np = self.train_dataset.anchors.astype(np.float32)
        self.anchors = jnp.asarray(self.anchors_np)
        self._anchors_dev = None  # [B, A, 7] device-resident train constant
        self._eval_fn = None
        # host rulebooks for eval batches: enables the fused serving plan.
        # Under a (single-host) mesh the chains are built per shard with a
        # leading shard axis, exactly like the training transform.
        self._eval_rb = (cfg.data.get("host_rulebooks", True)
                         and hasattr(self.model, "stage_capacity"))
        self._eval_rb_shards = (self.mesh.size
                                if self.mesh is not None
                                and self.num_hosts == 1 else 1)

    # ------------------------------------------------------------------
    def _snapshot_run_context(self):
        """Record the exact run recipe into work_dir (host 0 only): config
        source text + git revision + library versions. The TPU-idiomatic
        twin of the reference's source-tree backup
        (/root/reference/tools/train.py:85-92), which copies det3d/ into
        work_dir — here the framework is pip-shaped, so the config text and
        the repo SHA pin the run just as reproducibly."""
        if self.host_id != 0:
            return
        try:
            import os
            import subprocess

            os.makedirs(self.work_dir, exist_ok=True)
            text = getattr(self.cfg, "text", "")
            if text:
                with open(f"{self.work_dir}/config_snapshot.py", "w") as f:
                    f.write(text)
            try:
                sha = subprocess.run(
                    ["git", "rev-parse", "HEAD"], capture_output=True,
                    text=True, timeout=10,
                    cwd=str(__import__("pathlib").Path(__file__).parent),
                ).stdout.strip()
            except Exception:
                sha = ""
            with open(f"{self.work_dir}/run_env.txt", "w") as f:
                f.write(f"git_sha: {sha}\n")
                f.write(f"jax: {jax.__version__}\n")
                f.write(f"devices: {[str(d) for d in jax.devices()]}\n")
                f.write(f"num_hosts: {self.num_hosts}\n")
        except Exception as e:  # observability only — never block training
            self.logger.debug(f"run-context snapshot failed: {e}")

    # ------------------------------------------------------------------
    def resume(self):
        state, epoch = ckpt.load_checkpoint(self.work_dir, self.state)
        if state is not None:
            self.state = (replicate(state, self.mesh) if self.mesh is not None
                          else state)
            self.epoch = epoch
            self.logger.info(f"resumed from epoch {epoch}")

    def load_from(self, pretrained_dir):
        state = ckpt.load_params_only(pretrained_dir, self.state)
        if state is not None:
            self.state = (replicate(state, self.mesh) if self.mesh is not None
                          else state)
            self.logger.info(f"warm start (student+teacher) from {pretrained_dir}")

    # ------------------------------------------------------------------
    def _compile_and_sync(self, db, cw):
        """AOT-compile the train step, then (multi-host) rendezvous on the
        coordination-service barrier BEFORE the first collective executes.

        Gloo's pair connect timeout is short and not configurable; when one
        host compiles much slower than another (cold cache, heterogeneous
        hosts), the faster host's first psum would time out waiting for the
        peer. The coordination barrier rides the already-established gRPC
        channel with a long timeout, so compile-time skew is absorbed here
        instead. (The torch reference gets this behavior from NCCL's
        30-minute default timeout.)"""
        self._step_compiled = True
        if self.num_hosts <= 1:
            return
        self.train_step.lower(self.state, db, jnp.float32(cw)).compile()
        from jax._src import distributed as _dist
        client = getattr(_dist.global_state, "client", None)
        if client is not None:
            client.wait_at_barrier("sessd_post_compile", 3_600_000)
        self.logger.info("all hosts compiled; starting training")

    # ------------------------------------------------------------------
    def run(self):
        cfg = self.cfg
        total_epochs = cfg.total_epochs
        iters_per_epoch = len(self.train_loader)
        text = TextLogger(self.logger, cfg.log_config.get("interval", 10),
                          total_iters=total_epochs * iters_per_epoch,
                          json_path=f"{self.work_dir}/log.json")
        buf = LogBuffer()
        from ..utils.logging import TensorBoardLogger, device_memory_stats

        tb = (TensorBoardLogger(f"{self.work_dir}/tb")
              if cfg.log_config.get("tensorboard", False) else None)
        lr_fn = self.lr_fn
        rampup = cfg.get("consistency_rampup_epochs", 15.0)
        # host-mirrored global step: int(state.step) is a device readback
        # (~190 ms RTT through the axon tunnel) — never pay it per step
        host_step = int(jax.device_get(self.state.step))
        # interval accumulators for amortized timing (the loop below only
        # synchronizes with the device at log cadence)
        t_int, int_data, int_n = time.time(), 0.0, 0

        while self.epoch < total_epochs:
            self.train_loader.set_epoch(self.epoch)
            cw = float(sigmoid_rampup(self.epoch, rampup)) if cfg.my_paras.get(
                "enable_ssl", True) else 0.0
            t_data = time.time()
            for it, batch in enumerate(self.train_loader):
                self._log_train_fallbacks(batch)
                self._check_train_saturation(batch)
                if cfg.data.get("pack_targets", True):
                    # wire compression (sparse reg_targets, int8 labels,
                    # f16 voxels — see train_step.pack_batch): ~52 -> ~9 MB
                    # H2D per step at full scale
                    batch = pack_batch(batch)
                if self.mesh is not None:
                    db = _device_batch(batch, self.anchors_np)
                    db = shard_batch(db, self.mesh)
                else:
                    # anchors are a CONSTANT grid: stage them on device once
                    # instead of shipping ~B*A*7 floats every step (15.8 MB
                    # at full scale — seconds through the axon tunnel, and
                    # wasted PCIe on any host)
                    db = _device_batch(batch)
                    if self._anchors_dev is None or (
                            self._anchors_dev.shape[0]
                            != batch["voxels"].shape[0]):
                        b = batch["voxels"].shape[0]
                        self._anchors_dev = jax.device_put(
                            np.broadcast_to(
                                self.anchors_np.astype(np.float32),
                                (b,) + self.anchors_np.shape).copy())
                    db["anchors"] = self._anchors_dev
                data_time = time.time() - t_data
                if not getattr(self, "_step_compiled", False):
                    self._compile_and_sync(db, cw)
                    t_int, int_data, int_n = time.time(), 0.0, 0
                self.state, metrics = self.train_step(
                    self.state, db, jnp.float32(cw))
                host_step += 1
                int_data += data_time
                int_n += 1
                if text.will_log():
                    # the ONLY per-interval device synchronization: one bulk
                    # readback of all ~30 scalar metrics. Anything per-step
                    # (per-scalar float(), int(state.step), lr_fn on the
                    # device, memory_stats) costs a ~190 ms RTT through the
                    # axon tunnel and would dominate the step; between log
                    # points the loop free-runs and XLA queues the steps.
                    metrics = jax.device_get(metrics)
                    now = time.time()
                    step_time = max((now - t_int) / int_n
                                    - int_data / int_n, 0.0)
                    buf.update({k: v for k, v in metrics.items()
                                if np.ndim(v) == 0})
                    avg = buf.average(10)
                    mem = device_memory_stats()
                    if mem.get("peak_bytes_in_use"):
                        avg["peak_hbm_gb"] = mem["peak_bytes_in_use"] / 2 ** 30
                    text.step(self.epoch + 1, it, iters_per_epoch, avg,
                              lr=float(jax.device_get(lr_fn(host_step))),
                              data_time=int_data / int_n, step_time=step_time)
                    if tb is not None:
                        tb.log(avg, host_step)
                    t_int, int_data, int_n = time.time(), 0.0, 0
                else:
                    text.step(self.epoch + 1, it, iters_per_epoch, {})
                t_data = time.time()
            self.epoch += 1
            if getattr(self, "_sat_batches", 0):
                self.logger.warning(
                    "epoch %d: %d batch(es) hit train cap saturation "
                    "(truncated voxels — see the first warning above)",
                    self.epoch, self._sat_batches)
                self._sat_batches = 0
            if (self.host_id == 0 and self.epoch
                    % self.cfg.checkpoint_config.get("interval", 1) == 0):
                ckpt.save_checkpoint(self.work_dir, jax.device_get(self.state),
                                     self.epoch)
                self.logger.info(f"saved checkpoint at epoch {self.epoch}")
            # mid-training AP signal (VERDICT r1: don't wait 60 epochs)
            val_interval = cfg.get("val_interval", 0)
            if (val_interval and self.epoch % val_interval == 0
                    and self.epoch < total_epochs):
                self.validate()
        # final val (workflow [("train", N), ("val", 1)])
        results = self.validate()
        return results

    # ------------------------------------------------------------------
    def _build_eval_fn(self, use_ema: bool = False):
        model = builder.build_detector(self.cfg, axis_name=None)
        # with host-built rulebooks the all-sparse serving plan applies
        # (fused Pallas convs on TPU, ~7x the hybrid device-rulebook eval)
        model_rb = (model.clone(dense_from_stage=5)
                    if hasattr(model, "dense_from_stage") else model)
        predict_cfg = self.predict_cfg
        anchors = self.anchors

        def eval_fn(params, batch_stats, voxels, coords, num_points, mask,
                    frustum, rulebooks=None):
            b, v = voxels.shape[:2]
            bi = jax.lax.broadcasted_iota(jnp.int32, (b, v, 1), 0)
            coords4 = jnp.concatenate([bi, coords], axis=-1).reshape(b * v, 4)
            m = model if rulebooks is None else model_rb
            kw = {} if rulebooks is None else {"rulebooks": rulebooks}
            preds = m.apply(
                {"params": params, "batch_stats": batch_stats},
                voxels.reshape((b * v,) + voxels.shape[2:]), coords4,
                num_points.reshape(-1), mask.reshape(-1), b, train=False,
                **kw)
            return predict_batch(preds[0], anchors, frustum, predict_cfg)

        if self.mesh is not None and self.num_hosts == 1:
            # per-shard inference; fixed-shape detection buffers come back
            # sharded along batch — the lax.all_gather equivalent of the
            # reference's pickled eval gather (SURVEY §2.3)
            from jax.sharding import PartitionSpec as P

            plain = jax.jit(jax.shard_map(
                eval_fn, mesh=self.mesh,
                in_specs=(P(), P(), P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS),
                          P(DATA_AXIS), P(DATA_AXIS)),
                out_specs=P(DATA_AXIS),
                check_vma=False,
            ))

            def eval_fn_rb(params, batch_stats, voxels, coords, num_points,
                           mask, frustum, rulebooks):
                # per-shard chain arrives as a [1, ...] slice of the
                # leading shard axis (data/rulebooks.py layout)
                rb = jax.tree_util.tree_map(lambda a: jnp.squeeze(a, 0),
                                            rulebooks)
                return eval_fn(params, batch_stats, voxels, coords,
                               num_points, mask, frustum, rulebooks=rb)

            with_rb = jax.jit(jax.shard_map(
                eval_fn_rb, mesh=self.mesh,
                in_specs=(P(), P(), P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS),
                          P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS)),
                out_specs=P(DATA_AXIS),
                check_vma=False,
            ))

            def run(args, rb=None):
                return plain(*args) if rb is None else with_rb(*args, rb)

            return run

        jitted = jax.jit(eval_fn)

        def run(args, rb=None):
            return jitted(*args) if rb is None else jitted(*args, rb)

        return run


    def _batch_rulebooks(self, batch):
        """Host C++ chain for a padded eval batch (None -> in-graph)."""
        if not self._eval_rb:
            return None
        if self._eval_rb_shards > 1:
            from ..data.rulebooks import build_sharded_batch_rulebooks

            rb = build_sharded_batch_rulebooks(
                batch["coords"], batch["voxel_mask"],
                self.model.sparse_shape, self.model.stage_capacity,
                self._eval_rb_shards)
        else:
            from ..data.rulebooks import build_batch_rulebooks

            rb = build_batch_rulebooks(
                batch["coords"], batch["voxel_mask"],
                self.model.sparse_shape, self.model.stage_capacity)
        self._log_eval_fallbacks(rb, batch)
        # accuracy guard (cheap numpy, every eval batch): a FULL id table
        # means truncated voxels -> silently degraded detections
        sent = np.iinfo(np.int32).max
        shards = self._eval_rb_shards
        local_b = batch["coords"].shape[0] // shards
        for i, cap in enumerate(self.model.stage_capacity):
            arr = np.asarray(rb["ids"][i])
            occ = (arr < sent).sum(axis=-1) if arr.ndim > 1 else \
                np.asarray([(arr < sent).sum()])
            if (occ >= cap * local_b).any() and not getattr(
                    self, "_eval_sat_warned", False):
                self.logger.warning(
                    "EVAL CAP SATURATION at stage %d (%d/%d rows): stage id "
                    "table full — voxels may have been truncated (the "
                    "builder reports no overflow count, so an exactly-full "
                    "table also trips this); if truncated, detections are "
                    "degraded — raise model.stage_capacity for this data "
                    "density", i, int(occ.max()), cap * local_b)
                self._eval_sat_warned = True
        return rb

    def _log_eval_fallbacks(self, rb, batch):
        """One-time span telemetry: warn if any eval conv will silently
        trip the in-graph gather fallback (serve.fallback_telemetry — the
        ~7x slowdown the windows are tuned against)."""
        if rb is None or getattr(self, "_eval_fb_logged", False):
            return
        try:
            from ..serve import fallback_telemetry, window_config_from_detector

            lb = batch["coords"].shape[0] // self._eval_rb_shards
            caps = [c * lb for c in self.model.stage_capacity]
            chain = rb
            if self._eval_rb_shards > 1:  # inspect shard 0's chain
                chain = jax.tree_util.tree_map(lambda a: a[0], rb)
            tel = fallback_telemetry(
                chain, caps, window_config_from_detector(self.model))
            msg = (f"eval span telemetry: fallback_convs="
                   f"{tel['fallback_convs']} patched_blocks="
                   f"{tel['patched_blocks']}")
            if tel["fallback_convs"]:
                self.logger.warning(
                    msg + " — some eval convs run the slow gather fallback; "
                    "raise the windows/patch_max for this batch size")
            else:
                self.logger.info(msg)
            self._eval_fb_logged = True
        except Exception:  # telemetry must never break eval
            self.logger.debug("eval span telemetry failed", exc_info=True)

    def _check_train_saturation(self, batch):
        """Per-batch capacity guard on the loader-built train chains.

        A stage whose id table is FULL has TRUNCATED voxels — the rest of
        that sample's scene silently contributes ZERO features (r4 found
        whole batch samples zeroed this way: scenes whose stage-1
        downsample occupancy exceeded the per-sample cap collapsed 3 of 4
        samples to empty, training on 1/4 of the data with no signal).
        Unlike span fallbacks (a perf problem), saturation is an ACCURACY
        bug, so it is checked on every batch (a few numpy sums over the
        int32 id tables, ~us) and warned loudly."""
        sent = np.iinfo(np.int32).max
        hit = []
        for name in ("rulebooks", "rulebooks_raw"):
            rb = batch.get(name)
            if rb is None:
                continue
            ids = rb["ids"]
            sharded = np.asarray(rb["perm"]).ndim > 1
            shards = np.asarray(rb["perm"]).shape[0] if sharded else 1
            local_b = batch["coords"].shape[0] // shards
            for i, cap in enumerate(self.model.stage_capacity):
                arr = np.asarray(ids[i])
                # per-shard occupancy: [shards] counts
                occ = (arr < sent).sum(axis=-1) if sharded else \
                    np.asarray([(arr < sent).sum()])
                if (occ >= cap * local_b).any():
                    hit.append((name, i, int(occ.max()), cap * local_b))
        self._sat_batches = getattr(self, "_sat_batches", 0)
        if hit:
            self._sat_batches += 1
            if not getattr(self, "_sat_warned", False):
                detail = ", ".join(
                    f"{n} stage {i}: {o}/{c} rows" for n, i, o, c in hit)
                self.logger.warning(
                    "TRAIN CAP SATURATION: %s — stage id table full; voxels "
                    "past a full stage are silently dropped (those samples "
                    "train on truncated or EMPTY features; an exactly-full "
                    "table with zero drops also trips this — the builder "
                    "reports no overflow count). Raise model.stage_capacity "
                    "for this data density. Counting saturated batches; "
                    "per-epoch totals follow.", detail)
                self._sat_warned = True

    def _log_train_fallbacks(self, batch):
        """One-time span telemetry on the loader-built TRAIN chains (both
        the augmented student and the raw teacher rulebooks): a block whose
        source span exceeds window_large trips the whole conv to the slow
        in-graph gather fallback with no runtime signal — the unaugmented
        teacher chains are the densest (measured subm1 spans to ~2160), so
        they are the ones to watch."""
        if getattr(self, "_train_fb_logged", False):
            return
        rbs = {k: batch.get(k) for k in ("rulebooks", "rulebooks_raw")}
        if all(v is None for v in rbs.values()):
            return
        try:
            from ..serve import fallback_telemetry, window_config_from_detector

            wcfg = window_config_from_detector(self.model)
            b = batch["coords"].shape[0]
            for name, rb in rbs.items():
                if rb is None:
                    continue
                sharded = rb["perm"].ndim > 1
                shards = rb["perm"].shape[0] if sharded else 1
                caps = [c * (b // shards)
                        for c in self.model.stage_capacity]
                # all shards (one-time host numpy, negligible): a dense
                # scene on ANY shard past window_large means every step
                # pays the fallback
                fb = pb = 0
                for s in range(shards):
                    chain = jax.tree_util.tree_map(
                        lambda a: np.asarray(a[s] if sharded else a), rb)
                    tel = fallback_telemetry(chain, caps, wcfg)
                    fb += tel["fallback_convs"]
                    pb += tel["patched_blocks"]
                msg = (f"train span telemetry [{name}] (first batch only, "
                       f"{shards} shard(s)): fallback_convs={fb} "
                       f"patched_blocks={pb}")
                if fb:
                    self.logger.warning(
                        msg + " — these convs run the slow gather fallback "
                        "every step; raise subm_windows/down_windows or "
                        "patch_max on the detector")
                else:
                    self.logger.info(msg)
            # only disarm after a successful pass: a transient first-batch
            # failure must not permanently disable the guard
            self._train_fb_logged = True
        except Exception:  # telemetry must never break training
            self.logger.debug("train span telemetry failed", exc_info=True)

    def predict_samples(self, indices, use_ema: bool = False):
        """Per-sample debug evaluation — the ``test_v2`` affordance
        (tools/test.py:55-118): run inference on hand-picked val-set
        indices and return the detection dicts (lidar frame), aligned with
        ``indices``. Used by ``tools/test.py --eval_ids``."""
        from ..data.loader import _stack_examples

        if self._eval_fn is None:
            self._eval_fn = self._build_eval_fn()
        params = self.state.ema_params if use_ema else self.state.params
        stats = self.state.ema_batch_stats if use_ema else self.state.batch_stats
        params = jax.device_get(params)
        stats = jax.device_get(stats)
        full_b = self.cfg.data["samples_per_gpu"]

        examples = [self.val_dataset.get_sensor_data(int(i)) for i in indices]
        detections = []
        for off in range(0, len(examples), full_b):
            chunk = examples[off:off + full_b]
            batch = _stack_examples(chunk)
            nb = batch["voxels"].shape[0]
            if nb < full_b:
                batch = dict(batch, **{
                    k: np.concatenate(
                        [batch[k], np.zeros((full_b - nb,) + batch[k].shape[1:],
                                            batch[k].dtype)])
                    for k in ("voxels", "coords", "num_points", "voxel_mask",
                              "frustum")})
            args = (
                params, stats,
                jnp.asarray(batch["voxels"]), jnp.asarray(batch["coords"]),
                jnp.asarray(batch["num_points"]), jnp.asarray(batch["voxel_mask"]),
                jnp.asarray(batch["frustum"]))
            rb = self._batch_rulebooks(batch)
            dets = self._eval_fn(args, rb)
            dets = jax.device_get(dets)
            for i in range(nb):
                valid = dets["valid"][i]
                detections.append({
                    "box3d_lidar": dets["box3d_lidar"][i][valid],
                    "scores": dets["scores"][i][valid],
                    "label_preds": dets["label_preds"][i][valid],
                    "metadata": batch["metadata"][i],
                })
        return detections

    def _validate_multihost(self, use_ema: bool, max_batches: Optional[int]):
        """Sharded multi-host eval: each host runs inference on its
        contiguous per-host slice of the val split (same padded-equal
        sharding as training loaders), then the fixed-shape detection
        buffers + image ids are all-gathered over the coordination backend
        (multihost_utils.process_allgather — variable-size pickled gathers
        don't exist on TPU, so buffers are post_max_size-padded with valid
        masks). Host 0 merges by dataset index and computes AP; other hosts
        participate in the gather and return None.

        ALL hosts must call this with the same max_batches (collective)."""
        from jax.experimental import multihost_utils

        if self._eval_fn is None:
            self._eval_fn = self._build_eval_fn()
        params = self.state.ema_params if use_ema else self.state.params
        stats = self.state.ema_batch_stats if use_ema else self.state.batch_stats
        params = jax.device_get(params)
        stats = jax.device_get(stats)

        loader = getattr(self, "_mh_val_loader", None)
        if loader is None:
            loader = builder.build_dataloader(
                self.cfg, self.val_dataset, shuffle=False, seed=self.seed,
                num_shards=self.num_hosts, shard_index=self.host_id)
            self._mh_val_loader = loader

        full_b = self.cfg.data["samples_per_gpu"]
        ids, boxes, scores, labels, valids = [], [], [], [], []
        for bi, batch in enumerate(loader):
            if max_batches is not None and bi >= max_batches:
                break
            nb = batch["voxels"].shape[0]
            if nb < full_b:
                pad = full_b - nb
                batch = dict(batch, **{
                    k: np.concatenate(
                        [batch[k], np.zeros((pad,) + batch[k].shape[1:],
                                            batch[k].dtype)])
                    for k in ("voxels", "coords", "num_points", "voxel_mask",
                              "frustum")})
            args = (
                params, stats,
                jnp.asarray(batch["voxels"]), jnp.asarray(batch["coords"]),
                jnp.asarray(batch["num_points"]), jnp.asarray(batch["voxel_mask"]),
                jnp.asarray(batch["frustum"]))
            rb = self._batch_rulebooks(batch)
            dets = jax.device_get(self._eval_fn(args, rb))
            for i, meta in enumerate(batch["metadata"]):
                ids.append(np.int32(meta["image_idx"]))
                boxes.append(dets["box3d_lidar"][i])
                scores.append(dets["scores"][i])
                labels.append(dets["label_preds"][i])
                valids.append(dets["valid"][i])

        # identical per-host sample count (same formula as the loader's
        # padded-equal sharding), so the gather shapes agree everywhere
        cap = -(-len(self.val_dataset) // self.num_hosts)
        if max_batches is not None:
            cap = min(cap, max_batches * full_b)
        post = boxes[0].shape[0]
        code = boxes[0].shape[1]

        def fix(lst, shape, dtype, fill=0):
            a = np.full((cap,) + shape, fill, dtype)
            n = min(len(lst), cap)
            if n:
                a[:n] = np.stack(lst[:n]).astype(dtype)
            return a

        local = (
            fix(ids, (), np.int32, -1),
            fix(boxes, (post, code), np.float32),
            fix(scores, (post,), np.float32),
            fix(labels, (post,), np.int32),
            fix(valids, (post,), bool),
        )
        g_ids, g_boxes, g_scores, g_labels, g_valid = (
            np.asarray(a) for a in multihost_utils.process_allgather(local))
        if self.host_id != 0:
            return None

        id_to_index = {int(info["image"]["image_idx"]): i
                       for i, info in enumerate(self.val_dataset.infos)}
        dets_by_index = {}
        for h in range(self.num_hosts):
            for r in range(cap):
                iid = int(g_ids[h, r])
                if iid < 0 or iid not in id_to_index:
                    continue
                di = id_to_index[iid]
                if di in dets_by_index:  # wrap-padded duplicate shard rows
                    continue
                v = g_valid[h, r]
                dets_by_index[di] = {
                    "box3d_lidar": g_boxes[h, r][v],
                    "scores": g_scores[h, r][v],
                    "label_preds": g_labels[h, r][v],
                    "metadata": {"image_idx": iid},
                }
        n_eval = (len(self.val_dataset) if max_batches is None
                  else min(len(self.val_dataset), len(dets_by_index)))
        empty = {"box3d_lidar": np.zeros((0, code), np.float32),
                 "scores": np.zeros((0,), np.float32),
                 "label_preds": np.zeros((0,), np.int32),
                 "metadata": None}
        detections = [dets_by_index.get(i, empty) for i in range(n_eval)]
        results, _ = self.val_dataset.evaluation(detections)
        if results is not None:
            from ..data.kitti_eval import format_results

            self.logger.info("\n" + format_results(results))
        self._record_val(results, use_ema)
        return results

    def validate(self, use_ema: bool = False, max_batches: Optional[int] = None):
        """Run the student over the val split and compute official AP
        (trainer_sessd.py:362-415 val workflow).

        Multi-host: every host evaluates its val-split shard; the
        fixed-shape detection buffers are gathered to all hosts and host 0
        merges + computes AP (the TPU equivalent of the reference's
        per-rank eval + pickled all_gather, tools/dist_test.py,
        trainer/utils.py:115-157)."""
        if self.num_hosts > 1:
            return self._validate_multihost(use_ema, max_batches)
        if self._eval_fn is None:
            self._eval_fn = self._build_eval_fn()
        params = self.state.ema_params if use_ema else self.state.params
        stats = self.state.ema_batch_stats if use_ema else self.state.batch_stats
        params = jax.device_get(params)
        stats = jax.device_get(stats)

        full_b = self.cfg.data["samples_per_gpu"]
        detections = []
        for bi, batch in enumerate(self.val_loader):
            if max_batches is not None and bi >= max_batches:
                break
            nb = batch["voxels"].shape[0]
            if nb < full_b:  # pad the trailing batch to the static shape
                pad = full_b - nb
                batch = dict(batch, **{
                    k: np.concatenate(
                        [batch[k], np.zeros((pad,) + batch[k].shape[1:],
                                            batch[k].dtype)])
                    for k in ("voxels", "coords", "num_points", "voxel_mask",
                              "frustum")})
            args = (
                params, stats,
                jnp.asarray(batch["voxels"]), jnp.asarray(batch["coords"]),
                jnp.asarray(batch["num_points"]), jnp.asarray(batch["voxel_mask"]),
                jnp.asarray(batch["frustum"]))
            rb = self._batch_rulebooks(batch)
            dets = self._eval_fn(args, rb)
            dets = jax.device_get(dets)
            for i, meta in enumerate(batch["metadata"]):
                valid = dets["valid"][i]
                detections.append({
                    "box3d_lidar": dets["box3d_lidar"][i][valid],
                    "scores": dets["scores"][i][valid],
                    "label_preds": dets["label_preds"][i][valid],
                    "metadata": meta,
                })
            # eval progress (the reference shows a ProgressBar,
            # trainer_sessd.py:370-371) — one log line every ~25 batches
            if bi % 25 == 24:
                self.logger.info(
                    f"eval {len(detections)}/{len(self.val_dataset)} samples")
        detections = detections[: len(self.val_dataset)]
        results, _ = self.val_dataset.evaluation(detections)
        if results is not None:
            from ..data.kitti_eval import format_results

            self.logger.info("\n" + format_results(results))
        self._record_val(results, use_ema)
        return results

    def _record_val(self, results, use_ema: bool):
        """Append a compact AP row to ``val_history`` (trajectory record)."""
        if results is None:
            return
        try:
            row = {"epoch": self.epoch, "step": int(self.state.step),
                   "ema": bool(use_ema)}
            for cls, tables in results.items():
                row[cls] = {m: {d: {k: round(float(v), 2)
                                    for k, v in tables[m][d].items()}
                                for d in tables[m]}
                            for m in tables}
            self.val_history.append(row)
        except Exception:  # record-keeping must never break training
            self.logger.debug("val_history record failed", exc_info=True)
