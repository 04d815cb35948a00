"""Tests for anchor generation and target assignment."""
import numpy as np

from sessd_tpu.core.anchors import AnchorGeneratorRange, create_anchors_3d_range
from sessd_tpu.core.target_assign import (
    TargetAssigner,
    limit_period,
    nearest_iou_similarity,
    rbbox2d_to_near_bbox,
)

KITTI_RANGE = [0, -40.0, -1.0, 70.4, 40.0, -1.0]


def test_anchor_grid_shape_and_centers():
    anchors = create_anchors_3d_range([1, 200, 176], KITTI_RANGE)
    assert anchors.shape == (1, 200, 176, 1, 2, 7)
    flat = anchors.reshape(-1, 7)
    assert flat.shape == (70400, 7)
    # first anchor: x=0.2, y=-39.8, z=-1, sizes (1.6, 3.9, 1.56), rot 0
    np.testing.assert_allclose(flat[0], [0.2, -39.8, -1.0, 1.6, 3.9, 1.56, 0.0], atol=1e-5)
    # second anchor differs only in rotation
    np.testing.assert_allclose(flat[1], [0.2, -39.8, -1.0, 1.6, 3.9, 1.56, np.pi / 2], atol=1e-4)
    # x advances fastest after rot: anchor index 2 -> x=0.6
    np.testing.assert_allclose(flat[2][0], 0.6, atol=1e-5)
    # last x center = 70.4 - 0.2
    np.testing.assert_allclose(flat[:, 0].max(), 70.2, atol=1e-4)
    np.testing.assert_allclose(flat[:, 1].max(), 39.8, atol=1e-4)


def test_limit_period():
    np.testing.assert_allclose(limit_period(np.array([3 * np.pi / 2]), 0.5, 2 * np.pi),
                               [-np.pi / 2], atol=1e-9)
    np.testing.assert_allclose(limit_period(np.array([np.pi + 0.1]), 0.5, np.pi),
                               [0.1], atol=1e-9)


def test_near_bbox_swaps_extents():
    rb = np.array([[0.0, 0.0, 2.0, 4.0, 0.0], [0.0, 0.0, 2.0, 4.0, np.pi / 2]])
    near = rbbox2d_to_near_bbox(rb)
    np.testing.assert_allclose(near[0], [-1, -2, 1, 2], atol=1e-6)
    np.testing.assert_allclose(near[1], [-2, -1, 2, 1], atol=1e-6)


def test_assignment_positive_and_negative():
    anchors = create_anchors_3d_range([1, 200, 176], KITTI_RANGE).reshape(-1, 7)
    gt = np.array([[30.0, 5.0, -1.0, 1.6, 3.9, 1.56, 0.0]], dtype=np.float32)
    out = TargetAssigner().assign(anchors, gt)
    labels = out["labels"]
    assert (labels > 0).sum() >= 1
    # the best-matching anchor must be positive and its target ~0 offsets
    pos = np.where(labels > 0)[0]
    best_iou = nearest_iou_similarity(anchors[:, [0, 1, 3, 4, 6]], gt[:, [0, 1, 3, 4, 6]])
    assert best_iou.argmax() in pos
    # most anchors are negative, a band is don't-care
    assert (labels == 0).sum() > 60000
    # reg targets of positives decode back to the gt box
    from sessd_tpu.core.box_np import second_box_decode

    dec = second_box_decode(out["bbox_targets"][pos], anchors[pos])
    np.testing.assert_allclose(dec, np.repeat(gt, len(pos), axis=0), atol=1e-4)
    np.testing.assert_array_equal(out["reg_weights"][pos], 1.0)


def test_assignment_force_match_low_iou():
    # a tiny gt box below matched_threshold everywhere still gets 1 positive
    anchors = create_anchors_3d_range([1, 200, 176], KITTI_RANGE).reshape(-1, 7)
    gt = np.array([[30.1, 5.3, -1.0, 0.5, 0.5, 0.5, 0.3]], dtype=np.float32)
    out = TargetAssigner().assign(anchors, gt)
    assert (out["labels"] > 0).sum() >= 1


def test_assignment_empty_gt():
    anchors = create_anchors_3d_range([1, 200, 176], KITTI_RANGE).reshape(-1, 7)
    out = TargetAssigner().assign(anchors, np.zeros((0, 7), dtype=np.float32))
    assert (out["labels"] == 0).all()
    assert (out["bbox_targets"] == 0).all()


def _create_targets_dense(anchors, gt_boxes, gt_classes, matched_threshold,
                          unmatched_threshold, box_code_size=7):
    """Dense-matrix oracle of the reference matching rules
    (det3d target_ops.py:28-200): the literal [A, M] overlap formulation
    the candidate-space create_targets must reproduce element-exactly."""
    from sessd_tpu.core import box_np
    from sessd_tpu.core.target_assign import rbbox2d_to_near_bbox

    num = anchors.shape[0]
    labels = np.full((num,), -1, dtype=np.int32)
    gt_ids = np.full((num,), -1, dtype=np.int32)
    if gt_classes is None and len(gt_boxes) > 0:
        gt_classes = np.ones((gt_boxes.shape[0],), dtype=np.int32)
    if len(gt_boxes) > 0:
        b1 = rbbox2d_to_near_bbox(anchors[:, [0, 1, 3, 4, 6]])
        b2 = rbbox2d_to_near_bbox(gt_boxes[:, [0, 1, 3, 4, 6]])
        overlap = box_np.iou_2d_aligned_matrix(b1, b2)
        anchor_to_gt_argmax = overlap.argmax(axis=1)
        anchor_to_gt_max = overlap[np.arange(num), anchor_to_gt_argmax]
        gt_to_anchor_max = overlap.max(axis=0)
        gt_to_anchor_max[gt_to_anchor_max == 0] = -1
        awmo = np.where(overlap == gt_to_anchor_max[None, :])[0]
        gt_inds_force = anchor_to_gt_argmax[awmo]
        labels[awmo] = gt_classes[gt_inds_force]
        gt_ids[awmo] = gt_inds_force
        pos = anchor_to_gt_max >= matched_threshold
        labels[pos] = gt_classes[anchor_to_gt_argmax[pos]]
        gt_ids[pos] = anchor_to_gt_argmax[pos]
        bg = anchor_to_gt_max < unmatched_threshold
        labels[bg] = 0
        labels[awmo] = gt_classes[gt_inds_force]
    else:
        labels[:] = 0
    fg_inds = np.where(labels > 0)[0]
    bbox_targets = np.zeros((num, box_code_size), dtype=anchors.dtype)
    if len(gt_boxes) > 0 and len(fg_inds) > 0:
        bbox_targets[fg_inds] = box_np.second_box_encode(
            gt_boxes[gt_ids[fg_inds]], anchors[fg_inds])
    reg_weights = np.zeros((num,), dtype=anchors.dtype)
    reg_weights[labels > 0] = 1.0
    return {"labels": labels, "bbox_targets": bbox_targets,
            "reg_weights": reg_weights, "positive_gt_id": gt_ids[fg_inds]}


def test_candidate_space_matches_dense_oracle():
    """Fuzz the candidate-space create_targets against the dense [A, M]
    oracle: random gt clouds including off-grid boxes (no candidates),
    tiny boxes (force-match only), duplicates (exact IoU ties), and
    boxes straddling threshold bands."""
    from sessd_tpu.core.target_assign import anchor_lattice, create_targets

    anchors = create_anchors_3d_range([1, 60, 50], KITTI_RANGE).reshape(-1, 7)
    lat = anchor_lattice([1, 60, 50], KITTI_RANGE)
    rng = np.random.RandomState(0)
    for trial in range(20):
        m = rng.randint(0, 9)
        gt = np.zeros((m, 7), np.float64)
        gt[:, 0] = rng.uniform(-5, 75, m)     # some outside [0, 70.4]
        gt[:, 1] = rng.uniform(-45, 45, m)
        gt[:, 2] = rng.uniform(-1.5, -0.5, m)
        gt[:, 3] = rng.uniform(0.3, 4.5, m)   # tiny through huge
        gt[:, 4] = rng.uniform(0.3, 4.5, m)
        gt[:, 5] = rng.uniform(1.0, 2.0, m)
        gt[:, 6] = rng.uniform(-np.pi, np.pi, m)
        if m >= 2 and trial % 3 == 0:
            gt[1] = gt[0]  # exact duplicate: force-match IoU ties
        classes = None if trial % 2 else rng.randint(1, 3, m).astype(np.int32)
        for thr in ((0.6, 0.45), (0.2, 0.1)):
            want = _create_targets_dense(anchors, gt, classes, *thr)
            for lattice in (None, lat):  # compare + slab candidate paths
                got = create_targets(anchors, gt, classes, *thr,
                                     lattice=lattice)
                np.testing.assert_array_equal(got["labels"], want["labels"])
                np.testing.assert_array_equal(got["positive_gt_id"],
                                              want["positive_gt_id"])
                np.testing.assert_allclose(got["bbox_targets"],
                                           want["bbox_targets"], rtol=1e-12)
                np.testing.assert_array_equal(got["reg_weights"],
                                              want["reg_weights"])
