"""Bisect the SESSD warm-start NaN (calibration run, ACCEPTANCE.json r5).

The CIA stage trains clean; the warm-started SE-SSD stage logs
loss=grad_norm=NaN by the first log point (iter 20). This driver rebuilds
the SESSD trainer from the kept calibration artifacts, warm-starts from
the kept CIA checkpoint, and steps MANUALLY with a full metrics readback
every step, printing the first step at which any term goes non-finite.

Modes bisect the suspect set:
  base    exactly the calibration configuration
  nopack  pack_targets off (dense f32 wire format)
  nocons  consistency graph structurally removed (returns 0.0)
  noteam  teacher metrics (detection_loss on preds_tea) removed
  cw0     consistency_weight=0.0 (graph still present -> tests the
          0-cotangent-times-inf VJP leak)
  nowarm  random init (no warm start)

Usage: python scripts/repro_sessd_nan.py [mode] [steps=24] [tmpdir]
"""
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

MODE = sys.argv[1] if len(sys.argv) > 1 else "base"
STEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 24
TMP = sys.argv[3] if len(sys.argv) > 3 else "/tmp/accept_54sn0b0a"


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    from sessd_tpu.train import losses, train_step as ts, trainer as tr
    from sessd_tpu.config import Config

    if MODE == "nocons":
        def _zero_cons(*a, **k):
            return jnp.float32(0.0), jnp.float32(0.0)
        ts.consistency_loss = _zero_cons
    if MODE == "noteam":
        _orig = ts.make_train_step
        def _no_team(*a, **k):
            k["compute_teacher_metrics"] = False
            return _orig(*a, **k)
        ts.make_train_step = _no_team
        tr.make_train_step = _no_team

    cfg = Config.fromfile(f"{TMP}/cfg_sessd.py")
    cfg.work_dir = f"/tmp/repro_sessd_{MODE}"
    cfg.data["pack_targets"] = MODE != "nopack"

    trainer = tr.Trainer(cfg, work_dir=cfg.work_dir)
    if MODE != "nowarm":
        trainer.load_from(f"{TMP}/work_cia")

    leaves = jax.tree_util.tree_leaves(jax.device_get(trainer.state.params))
    print(f"[{MODE}] warm params finite: "
          f"{all(np.isfinite(a).all() for a in leaves)}", flush=True)

    cw = 0.0 if MODE == "cw0" else float(ts.sigmoid_rampup(0.0, 15.0))
    print(f"[{MODE}] consistency_weight={cw:.5f}", flush=True)

    anchors_np = trainer.anchors_np
    anchors_dev = None
    trainer.train_loader.set_epoch(0)
    step = 0
    for batch in trainer.train_loader:
        if cfg.data["pack_targets"]:
            batch = ts.pack_batch(batch)
        db = tr._device_batch(batch)
        b = batch["voxels"].shape[0]
        if anchors_dev is None or anchors_dev.shape[0] != b:
            anchors_dev = jax.device_put(np.broadcast_to(
                anchors_np.astype(np.float32),
                (b,) + anchors_np.shape).copy())
        db["anchors"] = anchors_dev
        trainer.state, metrics = trainer.train_step(
            trainer.state, db, jnp.float32(cw))
        m = {k: float(v) for k, v in jax.device_get(metrics).items()
             if np.ndim(v) == 0}
        step += 1
        bad = sorted(k for k, v in m.items() if not np.isfinite(v))
        line = {k: round(m[k], 4) for k in
                ("loss", "grad_norm", "consistency_loss", "cls_loss_reduced",
                 "loc_loss_reduced", "ious_loss", "iou_pred_loss")
                if k in m}
        print(f"[{MODE}] step {step}: {line}", flush=True)
        if bad:
            print(f"[{MODE}] FIRST NON-FINITE at step {step}: {bad}",
                  flush=True)
            st = jax.device_get(trainer.state)
            for name in ("params", "ema_params", "opt_state", "batch_stats"):
                lv = jax.tree_util.tree_leaves(getattr(st, name))
                nf = sum(0 if np.isfinite(a).all() else 1 for a in lv
                         if np.issubdtype(np.asarray(a).dtype, np.floating))
                print(f"[{MODE}]   {name}: {nf} non-finite leaves", flush=True)
            return 1
        if step >= STEPS:
            break
    print(f"[{MODE}] CLEAN after {step} steps", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
