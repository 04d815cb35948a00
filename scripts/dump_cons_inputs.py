"""Dump the consistency-loss inputs at the SESSD warm start (step-1 batch)
so the NaN gradient can be bisected on CPU. Saves preds_stu/preds_tea
(task-0 head outputs), anchors, and the transformation record to
/tmp/cons_inputs.npz.
"""
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

TMP = sys.argv[1] if len(sys.argv) > 1 else "/tmp/accept_54sn0b0a"


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    from sessd_tpu.config import Config
    from sessd_tpu.train import train_step as ts, trainer as tr

    cfg = Config.fromfile(f"{TMP}/cfg_sessd.py")
    cfg.work_dir = "/tmp/repro_sessd_dump"
    trainer = tr.Trainer(cfg, work_dir=cfg.work_dir)
    trainer.load_from(f"{TMP}/work_cia")

    model = trainer.model
    trainer.train_loader.set_epoch(0)
    batch = next(iter(trainer.train_loader))
    b = batch["voxels"].shape[0]

    @jax.jit
    def fwd(params, stats, batch):
        stu = ts._flatten_voxels(batch)
        tea = ts._flatten_voxels(batch, "_raw")
        ps, _ = model.apply({"params": params, "batch_stats": stats}, *stu,
                            b, train=True, mutable=["batch_stats"])
        pt, _ = model.apply({"params": params, "batch_stats": stats}, *tea,
                            b, train=True, mutable=["batch_stats"])
        return ps[0], pt[0]

    db = tr._device_batch(batch)
    ps, pt = jax.device_get(fwd(trainer.state.params,
                                trainer.state.batch_stats, db))
    out = {f"stu_{k}": np.asarray(v) for k, v in ps.items()}
    out.update({f"tea_{k}": np.asarray(v) for k, v in pt.items()})
    out["anchors"] = trainer.anchors_np
    for k in ("flipped", "noise_rotation", "noise_scale"):
        out[k] = np.asarray(batch["transformation"][k])
    np.savez("/tmp/cons_inputs.npz", **out)
    print("saved:", {k: v.shape for k, v in out.items()}, flush=True)


if __name__ == "__main__":
    main()
