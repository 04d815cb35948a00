"""SA-DA pyramid geometry: the prefiltered points_in_pyramids_mask must be
element-identical to the unfiltered surface-sign formulation (the prefilters
are exactness-preserving bounds, not approximations)."""
import numpy as np

from sessd_tpu.core import box_np
from sessd_tpu.data.sa_da import (_SURF_IDX, get_pyramids,
                                  points_in_pyramids_mask)


def _brute_mask(points, pyramids):
    verts = pyramids.reshape(-1, 5, 3)
    surfaces = verts[:, _SURF_IDX, :].reshape(-1, 5, 3, 3)
    surfaces4 = np.concatenate([surfaces, surfaces[:, :, 2:3, :]], axis=2)
    return box_np.points_in_convex_polygon_3d(points[:, :3], surfaces4)


def test_pyramid_mask_matches_bruteforce():
    rng = np.random.RandomState(0)
    for trial in range(8):
        n_boxes = rng.randint(1, 14)
        boxes = np.zeros((n_boxes, 7))
        boxes[:, 0] = rng.uniform(0, 70, n_boxes)
        boxes[:, 1] = rng.uniform(-40, 40, n_boxes)
        boxes[:, 2] = rng.uniform(-1.5, -0.5, n_boxes)
        boxes[:, 3:6] = np.abs(rng.normal([1.6, 3.9, 1.56], 0.3, (n_boxes, 3)))
        boxes[:, 6] = rng.uniform(-np.pi, np.pi, n_boxes)
        pyr = get_pyramids(boxes).reshape(-1, 15)
        k = rng.randint(1, len(pyr) + 1)
        sel = pyr[rng.choice(len(pyr), k, replace=False)]
        # scene-wide points plus points packed around the boxes (on and
        # near the pyramid boundaries)
        p_far = np.concatenate([rng.uniform(0, 70, (4000, 1)),
                                rng.uniform(-40, 40, (4000, 1)),
                                rng.uniform(-2.5, 1.5, (4000, 1))], axis=1)
        centers = boxes[rng.randint(0, n_boxes, 2000), :3]
        p_near = centers + rng.normal(0, 1.5, (2000, 3))
        pts = np.concatenate([p_far, p_near])
        got = points_in_pyramids_mask(pts, sel)
        want = _brute_mask(pts, sel)
        np.testing.assert_array_equal(got, want)
        if trial == 0:
            assert want.any(), "test must exercise interior points"


def test_pyramid_mask_empty_inputs():
    pts = np.zeros((5, 4))
    assert points_in_pyramids_mask(pts, np.zeros((0, 15))).shape == (5, 0)
    assert points_in_pyramids_mask(np.zeros((0, 4)),
                                   np.zeros((3, 15))).shape == (0, 3)
