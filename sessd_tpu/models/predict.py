"""Inference decode path — fixed-shape JAX port of
``MultiGroupHead.predict`` / ``get_task_detections``
(mg_head_sessd.py:893-1057), runnable entirely inside one jit:

    sigmoid score threshold (0.3)
    -> IoU-aware confidence rectification: score *= ((iou_pred+1)/2)^4
    -> rotated NMS (pre 1000 / post 100 / IoU 0.01)
    -> camera-frustum cull (points_in_convex_polygon on box centers)
    -> direction-classifier heading flip by pi
    -> post_center_range mask

Instead of compacting variable-length detections, every stage ANDs into a
validity mask over a fixed [max_det] buffer; hosts slice by the mask.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import box_jax
from ..core.nms import rotate_nms


class PredictConfig(NamedTuple):
    score_threshold: float = 0.3
    nms_pre_max_size: int = 1000
    nms_post_max_size: int = 100
    # two-level NMS capacity: when every sample in the batch has at most
    # this many above-threshold boxes (the typical case — KITTI scenes pass
    # ~30-200 of the 70k anchors at 0.3), an exact small path runs the
    # [pre, pre] rotated-IoU matrix at this capacity instead of
    # nms_pre_max_size; a lax.cond falls back to the full capacity
    # otherwise (the wconv two-level-window pattern). 0 disables.
    nms_pre_small: int = 256
    nms_iou_threshold: float = 0.01
    iou_rectify_pow: float = 4.0
    post_center_range: tuple = (0.0, -40.0, -5.0, 70.4, 40.0, 5.0)
    use_dir_classifier: bool = True
    direction_offset: float = 0.0
    # "rotate_nms" (default) or "rotate_weighted_nms" (the CIA-SSD DI-NMS
    # decode mode kept in SE-SSD, mg_head_sessd.py:999-1022)
    nms_type: str = "rotate_nms"


def points_in_frustum(points: jnp.ndarray, surfaces: jnp.ndarray) -> jnp.ndarray:
    """[N, 3] points vs [S, 4, 3] convex-polyhedron surfaces -> [N] bool.

    JAX port of geometry.points_in_convex_polygon_3d_jit (geometry.py:215-278):
    inside iff strictly below every surface plane (normal from the first
    three vertices).
    """
    sv0 = surfaces[:, 0, :] - surfaces[:, 1, :]
    sv1 = surfaces[:, 1, :] - surfaces[:, 2, :]
    normal = jnp.cross(sv0, sv1)  # [S, 3]
    d = jnp.sum(normal * surfaces[:, 0, :], axis=-1)  # [S]
    sign = points @ normal.T - d[None, :]  # [N, S]
    return ~jnp.any(sign >= 0, axis=-1)


def predict_single(preds, anchors, frustum_surfaces, cfg: PredictConfig):
    """One sample.

    preds: dict of [A, .] arrays; anchors [A, 7];
    frustum_surfaces [6, 4, 3] or None.
    Returns dict(box3d_lidar [D, 7], scores [D], label_preds [D], valid [D])
    with D = nms_post_max_size.
    """
    boxes = box_jax.second_box_decode(preds["box_preds"], anchors)  # [A, 7]
    # per-anchor best class (mg_head_sessd.py:957-963: top_scores/top_labels
    # = max/argmax over sigmoid class scores; class-agnostic NMS follows).
    # Single-class reduces to sigmoid(cls[..., 0]) / labels all-zero.
    scores_all = jax.nn.sigmoid(preds["cls_preds"])  # [A, C]
    scores = jnp.max(scores_all, axis=-1)
    top_labels = jnp.argmax(scores_all, axis=-1).astype(jnp.int32)

    keep = scores >= cfg.score_threshold
    iou_r = jnp.clip((preds["iou_preds"][..., 0] + 1.0) * 0.5, 0.0, 1.0)
    scores = scores * jnp.power(iou_r, cfg.iou_rectify_pow)
    nms_scores = jnp.where(keep, scores, -jnp.inf)

    boxes5 = boxes[:, jnp.array([0, 1, 3, 4, 6])]
    if cfg.nms_type == "rotate_weighted_nms":
        from ..core.nms import rotate_weighted_nms

        dir_labels_all = jnp.argmax(preds["dir_cls_preds"], axis=-1)
        # reference call site (mg_head_sessd.py:1001-1018): raw iou_preds
        # (pre-rectification), per-box anchors, enable_centerness pow 2
        merged, dirs, labels, w_scores, valid = rotate_weighted_nms(
            boxes, boxes5, dir_labels_all,
            top_labels, nms_scores,
            preds["iou_preds"][..., 0], anchors,
            pre_max_size=cfg.nms_pre_max_size,
            post_max_size=cfg.nms_post_max_size,
            iou_threshold=cfg.nms_iou_threshold,
        )
        out_boxes, out_scores, out_valid = merged, w_scores, valid
        sel = jnp.zeros((cfg.nms_post_max_size,), jnp.int32)
        out_labels = labels
        dir_sel = dirs
    else:
        sel, valid = rotate_nms(
            boxes5, nms_scores,
            pre_max_size=cfg.nms_pre_max_size,
            post_max_size=cfg.nms_post_max_size,
            iou_threshold=cfg.nms_iou_threshold,
        )
        out_boxes = boxes[sel]
        out_scores = scores[sel]
        out_valid = valid
        out_labels = top_labels[sel]
        dir_sel = None

    if frustum_surfaces is not None:
        out_valid = out_valid & points_in_frustum(out_boxes[:, :3], frustum_surfaces)

    if cfg.use_dir_classifier:
        dir_labels = (dir_sel if dir_sel is not None
                      else jnp.argmax(preds["dir_cls_preds"], axis=-1)[sel])
        opp = ((out_boxes[:, 6] - cfg.direction_offset) > 0) ^ (dir_labels == 1)
        out_boxes = out_boxes.at[:, 6].add(jnp.where(opp, jnp.pi, 0.0))

    pcr = jnp.asarray(cfg.post_center_range)
    in_range = jnp.all(out_boxes[:, :3] >= pcr[:3], axis=-1) & jnp.all(
        out_boxes[:, :3] <= pcr[3:], axis=-1)
    out_valid = out_valid & in_range

    return {
        "box3d_lidar": jnp.where(out_valid[:, None], out_boxes, 0.0),
        "scores": jnp.where(out_valid, out_scores, 0.0),
        "label_preds": jnp.where(out_valid, out_labels, 0),
        "valid": out_valid,
    }


def predict_batch(preds, anchors, frustum_surfaces, cfg: PredictConfig = PredictConfig()):
    """preds: task-0 dict of [B, A, .]; anchors [A, 7] or [B, A, 7];
    frustum_surfaces [B, 6, 4, 3] or None.

    Two-level NMS: the decision between the small and full pre-NMS
    capacities hoists OUTSIDE the batch vmap (a vmapped lax.cond lowers to
    a select that executes both branches); the branch choice is one scalar
    over the whole batch, so the cond stays a real cond.
    """
    if anchors.ndim == 2:
        anchors = jnp.broadcast_to(anchors, preds["box_preds"].shape[:1] + anchors.shape)

    def run(c):
        if frustum_surfaces is None:
            return jax.vmap(lambda p, a: predict_single(p, a, None, c))(
                preds, anchors)
        return jax.vmap(lambda p, a, fr: predict_single(p, a, fr, c))(
            preds, anchors, frustum_surfaces)

    small = cfg.nms_pre_small
    n_anchors = preds["box_preds"].shape[1]
    if (cfg.nms_type == "rotate_nms" and small
            and small < min(cfg.nms_pre_max_size, n_anchors)):
        # exact: when <= small boxes pass the score threshold, top_k(small)
        # contains every candidate the full path would consider
        counts = jnp.sum(
            jnp.max(jax.nn.sigmoid(preds["cls_preds"]), axis=-1)
            >= cfg.score_threshold, axis=-1)
        return jax.lax.cond(
            jnp.max(counts) <= small,
            lambda: run(cfg._replace(nms_pre_max_size=small)),
            lambda: run(cfg))
    return run(cfg)
