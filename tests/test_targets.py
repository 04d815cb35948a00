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
