"""Error decomposition of a kept acceptance run (SESSD_ACCEPT_KEEP=1).

Loads a stage checkpoint from the kept tmp dir, runs the serving path over
the held-out val split and matches detections to lidar GT boxes. Reports
per-dimension error statistics (center / size / yaw), match IoUs, recall
and FP counts — a systematic bias (e.g. z off by h/2, width always over)
is a bug; diffuse errors mean under-training.

Usage: python scripts/analyze_accept.py /tmp/accept_XXXX [cia|sessd]
"""
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))


def main(tmp, tag="sessd", max_frames=32, use_ema=False):
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    from sessd_tpu.config import Config
    from sessd_tpu.core.rotated_iou_np import iou_bev_matrix
    from sessd_tpu.train.trainer import Trainer

    cfg = Config.fromfile(f"{tmp}/cfg_{tag}.py")
    trainer = Trainer(cfg, work_dir=cfg.work_dir)
    trainer.resume()
    print(f"[analyze] resumed {tag} at epoch {trainer.epoch}", flush=True)

    # lidar-frame GT per image_idx (val batches carry no GT; the eval path
    # reads camera annos from the infos — mirror that here)
    from sessd_tpu.core import box_np
    gt_by_idx = {}
    for info in trainer.val_dataset.infos:
        annos, calib = info["annos"], info["calib"]
        keep = np.array([n == "Car" for n in annos["name"]], bool)
        cam = np.concatenate([
            annos["location"][keep], annos["dimensions"][keep],
            annos["rotation_y"][keep][:, None]], axis=1)
        gt = box_np.box_camera_to_lidar(
            cam, calib["R0_rect"], calib["Tr_velo_to_cam"])
        gt[:, 2] += gt[:, 5] / 2  # bottom -> gravity center (pipeline.py:144)
        gt_by_idx[info["image"]["image_idx"]] = gt

    if trainer._eval_fn is None:
        trainer._eval_fn = trainer._build_eval_fn(use_ema)
    params = jax.device_get(
        trainer.state.ema_params if use_ema else trainer.state.params)
    stats = jax.device_get(
        trainer.state.ema_batch_stats if use_ema else trainer.state.batch_stats)

    import jax.numpy as jnp

    errs, ious, n_gt, n_det, n_match = [], [], 0, 0, 0
    scores_matched, scores_fp = [], []
    full_b = cfg.data["samples_per_gpu"]
    for bi, batch in enumerate(trainer.val_loader):
        if bi * full_b >= max_frames:
            break
        nb = batch["voxels"].shape[0]
        if nb < full_b:
            pad = full_b - nb
            batch = dict(batch, **{
                k: np.concatenate([batch[k],
                                   np.zeros((pad,) + batch[k].shape[1:],
                                            batch[k].dtype)])
                for k in ("voxels", "coords", "num_points", "voxel_mask",
                          "frustum")})
        args = (params, stats,
                jnp.asarray(batch["voxels"]), jnp.asarray(batch["coords"]),
                jnp.asarray(batch["num_points"]),
                jnp.asarray(batch["voxel_mask"]), jnp.asarray(batch["frustum"]))
        rb = trainer._batch_rulebooks(batch)
        dets = jax.device_get(trainer._eval_fn(args, rb))
        for i in range(nb):
            valid = dets["valid"][i]
            boxes = dets["box3d_lidar"][i][valid]
            scores = dets["scores"][i][valid]
            gt = gt_by_idx[batch["metadata"][i]["image_idx"]]
            n_gt += len(gt)
            n_det += len(boxes)
            if not len(gt) or not len(boxes):
                scores_fp.extend(scores.tolist())
                continue
            # match greedily by BEV center distance
            d2 = ((boxes[:, None, 0] - gt[None, :, 0]) ** 2
                  + (boxes[:, None, 1] - gt[None, :, 1]) ** 2)
            matched_det = set()
            iou_m = iou_bev_matrix(boxes[:, [0, 1, 3, 4, 6]],
                                   gt[:, [0, 1, 3, 4, 6]])
            for j in range(len(gt)):
                k = int(np.argmin(d2[:, j]))
                if d2[k, j] > 4.0 or k in matched_det:
                    continue
                matched_det.add(k)
                n_match += 1
                db, g = boxes[k], gt[j]
                dyaw = (db[6] - g[6] + np.pi / 2) % np.pi - np.pi / 2
                errs.append([db[0] - g[0], db[1] - g[1], db[2] - g[2],
                             db[3] - g[3], db[4] - g[4], db[5] - g[5], dyaw])
                ious.append(iou_m[k, j])
                scores_matched.append(scores[k])
            for k in range(len(boxes)):
                if k not in matched_det:
                    scores_fp.append(float(scores[k]))

    errs = np.array(errs) if errs else np.zeros((0, 7))
    ious = np.array(ious)
    print(f"\nframes={min(max_frames, (bi + 1) * full_b)} gt={n_gt} "
          f"det={n_det} matched(<2m)={n_match} "
          f"recall={n_match / max(n_gt, 1):.3f}")
    names = ["dx", "dy", "dz", "dw", "dl", "dh", "dyaw"]
    if len(errs):
        print("matched-box errors (mean / std / |mean|):")
        for d, nm in enumerate(names):
            print(f"  {nm:>5}: {errs[:, d].mean():+.3f} / "
                  f"{errs[:, d].std():.3f}")
        print(f"BEV IoU of matches: mean {ious.mean():.3f}, "
              f"p50 {np.median(ious):.3f}, "
              f">=0.7: {(ious >= 0.7).mean():.3f}")
        hist, edges = np.histogram(np.abs(errs[:, 6]),
                                   bins=[0, .1, .2, .4, .8, 1.2, 1.6])
        print("  |dyaw| histogram", dict(zip(
            [f"<{e:.1f}" for e in edges[1:]], hist.tolist())))
    if scores_matched:
        fp_mean = float(np.mean(scores_fp)) if scores_fp else 0.0
        print(f"scores: matched mean {float(np.mean(scores_matched)):.3f}, "
              f"FP mean {fp_mean:.3f}, n_fp {len(scores_fp)}")
    np.savez(f"/tmp/analyze_{tag}_errs.npz", errs=errs, ious=ious,
             scores_matched=np.asarray(scores_matched, np.float64),
             scores_fp=np.asarray(scores_fp, np.float64))


if __name__ == "__main__":
    tmp = sys.argv[1]
    tag = sys.argv[2] if len(sys.argv) > 2 else "sessd"
    main(tmp, tag)
