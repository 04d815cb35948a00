"""Golden the COMPOSED SE-SSD loss against the reference's own torch code.

Executes the reference's `MultiGroupHead.loss()` (mg_head_sessd.py:706-808),
`consistency_loss()` (:618-703) and `get_model_ema_loss()` (:810-889) on one
fixed synthetic batch on CPU, recording every scalar loss term AND the
gradients of (supervised_total + 0.5 * consistency) w.r.t. the student's
prediction tensors. The CUDA IoU calls (iou3d_utils.boxes_iou_bev_gpu,
boxes_aligned_iou3d_gpu — used only for matching/detached targets, never
for gradients) are monkeypatched with the independently-oracled numpy twins
from sessd_tpu.core.rotated_iou_np.

The head is built by the reference's own builder from its own config file,
so loss weights / sigmas / norm types are the reference's, not ours.

Inputs are synthetic but structured: labels/reg_targets come from our
(r1-goldened) target assigner on random GT boxes; student GT = globally
transformed teacher GT with a recorded per-sample transformation, and
predictions are planted near their respective targets so the consistency
matching (score>=0.3, IoU>0.7) finds real pairs.

Output: tests/goldens/ref_sessd_loss.npz (committed artifact).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import ref_stubs

ref_stubs.install()
sys.path.insert(0, "/root/reference")

import torch  # noqa: E402

from sessd_tpu.core.anchors import create_anchors_3d_range  # noqa: E402
from sessd_tpu.core.target_assign import create_targets  # noqa: E402
from sessd_tpu.core import rotated_iou_np as rnp  # noqa: E402

ANCHOR_RANGE = [0.0, -8.0, -1.0, 17.6, 8.0, -1.0]
GRID_HW = (20, 22)
B = 2
CONSISTENCY_WEIGHT = 0.5


def install_iou_stubs():
    """Replace the CUDA IoU entry points with numpy-twin-backed versions.

    Semantics per iou3d_utils.py: boxes are [x, y, z, w, l, h, ry] velo,
    real-center; BEV IoU clamps the union at 1e-7 (:163), aligned 3D IoU
    multiplies BEV overlap by the z-interval overlap (:215-244).
    """
    from det3d.core.iou3d import iou3d_utils

    def to7(t):
        return t.detach().cpu().numpy().astype(np.float32)

    def boxes_iou_bev_gpu(a, b, **kw):
        bev5 = lambda x: x[:, [0, 1, 3, 4, 6]]
        ov = rnp.overlap_bev_matrix(bev5(to7(a)), bev5(to7(b)))
        area_a = (to7(a)[:, 3] * to7(a)[:, 4])[:, None]
        area_b = (to7(b)[:, 3] * to7(b)[:, 4])[None, :]
        iou = ov / np.clip(area_a + area_b - ov, 1e-7, None)
        return torch.from_numpy(iou.astype(np.float32))

    def boxes_aligned_iou3d_gpu(a, b, **kw):
        an, bn = to7(a), to7(b)
        n = an.shape[0]
        ov = np.array([rnp.overlap_bev_matrix(
            an[i:i + 1, [0, 1, 3, 4, 6]], bn[i:i + 1, [0, 1, 3, 4, 6]])[0, 0]
            for i in range(n)], np.float32)
        hmin = np.maximum(an[:, 2] - an[:, 5] / 2, bn[:, 2] - bn[:, 5] / 2)
        hmax = np.minimum(an[:, 2] + an[:, 5] / 2, bn[:, 2] + bn[:, 5] / 2)
        inter = ov * np.clip(hmax - hmin, 0, None)
        vol_a = an[:, 3] * an[:, 4] * an[:, 5]
        vol_b = bn[:, 3] * bn[:, 4] * bn[:, 5]
        iou = inter / np.clip(vol_a + vol_b - inter, 1e-7, None)
        return torch.from_numpy(iou[:, None].astype(np.float32))

    iou3d_utils.boxes_iou_bev_gpu = boxes_iou_bev_gpu
    iou3d_utils.boxes_aligned_iou3d_gpu = boxes_aligned_iou3d_gpu


def transform_boxes(boxes, flipped, rot, scale):
    """Global flip/rotate/scale replay (preprocess.py flip/rot/scale on GT
    boxes; mirrors mg_head_sessd.py:666-674)."""
    b = boxes.copy()
    if flipped:
        b[:, 1] = -b[:, 1]
        b[:, 6] = -b[:, 6] + np.pi
    c, s = np.cos(rot), np.sin(rot)
    x = b[:, 0] * c - b[:, 1] * s
    y = b[:, 0] * s + b[:, 1] * c
    b[:, 0], b[:, 1] = x, y
    b[:, 6] += rot
    b[:, :6] *= scale
    return b


def make_batch(rng):
    h, w = GRID_HW
    anchors = create_anchors_3d_range(
        [1, h, w], ANCHOR_RANGE, sizes=[1.6, 3.9, 1.56],
        rotations=[0, np.pi / 2]).reshape(-1, 7).astype(np.float32)
    a = anchors.shape[0]

    flipped = np.array([False, True])
    noise_rot = np.array([0.06, -0.04], np.float32)
    noise_scale = np.array([1.03, 0.97], np.float32)

    def rand_gt(n):
        g = np.zeros((n, 7), np.float32)
        g[:, 0] = rng.uniform(3, 15, n)
        g[:, 1] = rng.uniform(-6, 6, n)
        g[:, 2] = rng.uniform(-1.2, -0.8, n)
        g[:, 3] = rng.uniform(1.5, 1.8, n)
        g[:, 4] = rng.uniform(3.5, 4.3, n)
        g[:, 5] = rng.uniform(1.4, 1.7, n)
        g[:, 6] = rng.uniform(-np.pi, np.pi, n)
        return g

    batch = {"anchors": np.tile(anchors[None], (B, 1, 1))}
    for key in ("labels", "reg_targets", "labels_raw", "reg_targets_raw"):
        batch[key] = []
    for i in range(B):
        gt_raw = rand_gt(6)
        gt_stu = transform_boxes(gt_raw, flipped[i], noise_rot[i],
                                 noise_scale[i])
        t_stu = create_targets(anchors, gt_stu)
        t_raw = create_targets(anchors, gt_raw)
        batch["labels"].append(t_stu["labels"])
        batch["reg_targets"].append(t_stu["bbox_targets"])
        batch["labels_raw"].append(t_raw["labels"])
        batch["reg_targets_raw"].append(t_raw["bbox_targets"])
    for key in ("labels", "reg_targets", "labels_raw", "reg_targets_raw"):
        batch[key] = np.stack(batch[key])
    batch["transformation"] = {
        "flipped": flipped, "noise_rotation": noise_rot,
        "noise_scale": noise_scale}

    def plant_preds(labels, reg_targets):
        pos = (labels > 0)[..., None]
        box = (reg_targets * pos
               + rng.normal(0, 0.05, (B, a, 7))).astype(np.float32)
        cls = np.where(pos, rng.normal(2.0, 0.7, (B, a, 1)),
                       rng.normal(-4.0, 1.0, (B, a, 1))).astype(np.float32)
        borderline = rng.random((B, a, 1)) < 0.03
        cls = np.where(borderline,
                       rng.uniform(-1.5, 0.5, (B, a, 1)), cls).astype(np.float32)
        iou = rng.uniform(-1, 1, (B, a, 1)).astype(np.float32)
        dirp = rng.normal(0, 1.0, (B, a, 2)).astype(np.float32)
        return box, cls, iou, dirp

    stu = plant_preds(batch["labels"], batch["reg_targets"])
    tea = plant_preds(batch["labels_raw"], batch["reg_targets_raw"])
    return batch, stu, tea


def main():
    from det3d.models import build_detector
    from det3d.torchie import Config

    install_iou_stubs()
    cfg = Config.fromfile("/root/reference/examples/second/configs/config.py")
    model = build_detector(cfg.model, train_cfg=cfg.train_cfg,
                           test_cfg=cfg.test_cfg)
    head = model.bbox_head

    rng = np.random.default_rng(7)
    batch, stu, tea = make_batch(rng)

    t = torch.from_numpy
    stu_t = [t(x).requires_grad_(True) for x in stu]
    tea_t = [t(x) for x in tea]
    preds_stu = [{"box_preds": stu_t[0], "cls_preds": stu_t[1],
                  "iou_preds": stu_t[2], "dir_cls_preds": stu_t[3]}]
    preds_tea = [{"box_preds": tea_t[0], "cls_preds": tea_t[1],
                  "iou_preds": tea_t[2], "dir_cls_preds": tea_t[3]}]

    example = {
        "anchors": [t(batch["anchors"])],
        "anchors_raw": [t(batch["anchors"])],
        "labels": [t(batch["labels"].astype(np.int64))],
        "reg_targets": [t(batch["reg_targets"])],
        "labels_raw": [t(batch["labels_raw"].astype(np.int64))],
        "reg_targets_raw": [t(batch["reg_targets_raw"])],
        "metadata": [{} for _ in range(B)],
        "annos_raw": [{} for _ in range(B)],
        "transformation": [
            {"flipped": bool(batch["transformation"]["flipped"][i]),
             "noise_rotation": float(batch["transformation"]["noise_rotation"][i]),
             "noise_scale": float(batch["transformation"]["noise_scale"][i])}
            for i in range(B)],
    }

    ret = head.loss(example, preds_stu, preds_tea)
    total = ret["loss"][0] + CONSISTENCY_WEIGHT * ret["consistency_loss"][0]
    total.backward()

    scalars = {}
    for k in ("loss", "cls_loss_reduced", "loc_loss_reduced",
              "dir_loss_reduced", "iou_pred_loss", "ious_loss",
              "consistency_loss", "cls_pos_loss", "cls_neg_loss",
              "num_pos", "num_neg",
              "loss_ema", "cls_loss_reduced_ema", "loc_loss_reduced_ema",
              "dir_loss_reduced_ema", "iou_pred_loss_ema"):
        v = ret[k][0]
        if torch.is_tensor(v):
            v = v.detach().cpu().numpy()
        scalars[k] = np.float32(np.asarray(v).reshape(()))
        print(f"  {k}: {float(scalars[k]):.6f}")

    out = {
        "anchors": batch["anchors"],
        "labels": batch["labels"],
        "reg_targets": batch["reg_targets"],
        "labels_raw": batch["labels_raw"],
        "reg_targets_raw": batch["reg_targets_raw"],
        "flipped": batch["transformation"]["flipped"],
        "noise_rotation": batch["transformation"]["noise_rotation"],
        "noise_scale": batch["transformation"]["noise_scale"],
        "stu_box": stu[0], "stu_cls": stu[1], "stu_iou": stu[2],
        "stu_dir": stu[3],
        "tea_box": tea[0], "tea_cls": tea[1], "tea_iou": tea[2],
        "tea_dir": tea[3],
        "consistency_weight": np.float32(CONSISTENCY_WEIGHT),
        "grad_box": stu_t[0].grad.numpy(),
        "grad_cls": stu_t[1].grad.numpy(),
        "grad_iou": stu_t[2].grad.numpy(),
        "grad_dir": stu_t[3].grad.numpy(),
        "post_center_range": np.asarray(
            cfg.test_cfg.post_center_limit_range, np.float32),
    }
    out.update({f"scalar_{k}": v for k, v in scalars.items()})

    dest = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "goldens", "ref_sessd_loss.npz")
    np.savez_compressed(dest, **out)
    print("wrote", dest, f"{os.path.getsize(dest) / 1e6:.2f} MB")


if __name__ == "__main__":
    main()
