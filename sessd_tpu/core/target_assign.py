"""Anchor target assignment (host numpy, vectorized).

Port of the reference semantics:
- nearest-BEV-IoU similarity (region_similarity.NearestIouSimilarity via
  box_np_ops.rbbox2d_to_near_bbox + iou_jit),
- create_target_np matching rules (det3d/core/anchor/target_ops.py:28-200):
  label 1 for anchors with max-IoU >= matched_threshold, plus force-matching
  the argmax anchor(s) of every gt; label 0 below unmatched_threshold;
  -1 (don't care) in between; reg targets = SECOND encoding of the matched gt.
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from . import box_np


def limit_period(val, offset=0.5, period=np.pi):
    return val - np.floor(val / period + offset) * period


def rbbox2d_to_near_bbox(rbboxes: np.ndarray) -> np.ndarray:
    """[N, 5] (x, y, w, l, r) -> nearest axis-aligned [N, 4] (x1, y1, x2, y2).

    Swaps w/l when the heading is closer to +-pi/2 (box_np_ops semantics).
    """
    rots = rbboxes[..., -1]
    rots_0_pi_div_2 = np.abs(limit_period(rots, 0.5, np.pi))
    cond = (rots_0_pi_div_2 > np.pi / 4)[..., None]
    bboxes_center = np.where(cond, rbboxes[:, [0, 1, 3, 2]], rbboxes[:, :4])
    centers, dims = bboxes_center[:, :2], bboxes_center[:, 2:]
    return np.concatenate([centers - dims / 2, centers + dims / 2], axis=-1)


def nearest_iou_similarity(boxes1_rbv: np.ndarray, boxes2_rbv: np.ndarray) -> np.ndarray:
    """[N, 5] x [M, 5] -> [N, M] axis-aligned IoU of the nearest bboxes."""
    b1 = rbbox2d_to_near_bbox(boxes1_rbv)
    b2 = rbbox2d_to_near_bbox(boxes2_rbv)
    return box_np.iou_2d_aligned_matrix(b1, b2)


def create_targets(
    anchors: np.ndarray,  # [A, 7]
    gt_boxes: np.ndarray,  # [M, 7]
    gt_classes: np.ndarray | None = None,  # [M] int, starting at 1
    matched_threshold: float = 0.6,
    unmatched_threshold: float = 0.45,
    box_code_size: int = 7,
):
    """Returns dict(labels [A], bbox_targets [A, code], reg_weights [A])."""
    num = anchors.shape[0]
    labels = np.full((num,), -1, dtype=np.int32)
    gt_ids = np.full((num,), -1, dtype=np.int32)
    if gt_classes is None and len(gt_boxes) > 0:
        gt_classes = np.ones((gt_boxes.shape[0],), dtype=np.int32)

    if len(gt_boxes) > 0:
        # exact prefilter: the aligned IoU is zero unless the near-bboxes
        # intersect; 4 compares per (anchor, gt) select the ~few-thousand
        # candidate anchors out of 70k before the arithmetic-heavy IoU
        # (the overlap matrix is identical — zero rows stay zero)
        b1 = rbbox2d_to_near_bbox(anchors[:, [0, 1, 3, 4, 6]])
        b2 = rbbox2d_to_near_bbox(gt_boxes[:, [0, 1, 3, 4, 6]])
        hit = ((b1[:, None, 2] > b2[None, :, 0])
               & (b1[:, None, 0] < b2[None, :, 2])
               & (b1[:, None, 3] > b2[None, :, 1])
               & (b1[:, None, 1] < b2[None, :, 3]))  # [A, M]
        cand = np.flatnonzero(hit.any(axis=1))
        overlap = np.zeros((num, len(gt_boxes)), anchors.dtype)
        if len(cand):
            overlap[cand] = box_np.iou_2d_aligned_matrix(b1[cand], b2)
        anchor_to_gt_argmax = overlap.argmax(axis=1)
        anchor_to_gt_max = overlap[np.arange(num), anchor_to_gt_argmax]
        gt_to_anchor_max = overlap.max(axis=0)
        # gts that match nothing must not force-match anchor 0
        gt_to_anchor_max[gt_to_anchor_max == 0] = -1

        # force match: all anchors tied at each gt's best IoU (target_ops.py:139-146)
        anchors_with_max_overlap = np.where(overlap == gt_to_anchor_max[None, :])[0]
        gt_inds_force = anchor_to_gt_argmax[anchors_with_max_overlap]
        labels[anchors_with_max_overlap] = gt_classes[gt_inds_force]
        gt_ids[anchors_with_max_overlap] = gt_inds_force

        pos = anchor_to_gt_max >= matched_threshold
        labels[pos] = gt_classes[anchor_to_gt_argmax[pos]]
        gt_ids[pos] = anchor_to_gt_argmax[pos]

        bg = anchor_to_gt_max < unmatched_threshold
        fg_inds = np.where(labels > 0)[0]
        labels[bg] = 0
        # re-apply force matches that fell below unmatched_threshold
        labels[anchors_with_max_overlap] = gt_classes[gt_inds_force]
    else:
        labels[:] = 0
        fg_inds = np.array([], dtype=np.int64)

    fg_inds = np.where(labels > 0)[0]
    bbox_targets = np.zeros((num, box_code_size), dtype=anchors.dtype)
    if len(gt_boxes) > 0 and len(fg_inds) > 0:
        bbox_targets[fg_inds] = box_np.second_box_encode(
            gt_boxes[gt_ids[fg_inds]], anchors[fg_inds]
        )

    reg_weights = np.zeros((num,), dtype=anchors.dtype)
    reg_weights[labels > 0] = 1.0

    return {
        "labels": labels,
        "bbox_targets": bbox_targets,
        "reg_weights": reg_weights,
        "positive_gt_id": gt_ids[fg_inds],
    }


@dataclass
class TargetAssigner:
    """Single-task assigner (target_assigner.py:68-136 / assign_v2)."""

    matched_threshold: float = 0.6
    unmatched_threshold: float = 0.45
    box_code_size: int = 7

    def assign(self, anchors: np.ndarray, gt_boxes: np.ndarray,
               gt_classes: np.ndarray | None = None):
        """anchors [A, 7] flattened; gt boxes already class-filtered.

        With the SE-SSD ``enable_similar_type`` setting, assign_v2 flattens
        all gt classes to 1 before matching (target_assigner.py:90-94);
        callers should pass gt_classes=None to get the same behavior.
        """
        gt_boxes = gt_boxes.copy()
        if len(gt_boxes):
            gt_boxes[:, -1] = limit_period(gt_boxes[:, -1], offset=0.5, period=2 * np.pi)
        return create_targets(
            anchors,
            gt_boxes,
            gt_classes=gt_classes,
            matched_threshold=self.matched_threshold,
            unmatched_threshold=self.unmatched_threshold,
            box_code_size=self.box_code_size,
        )
