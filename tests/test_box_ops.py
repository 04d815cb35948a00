"""Golden tests for box encode/decode/corner math (np vs jax vs analytic)."""
import numpy as np
import pytest

from sessd_tpu.core import box_np


def random_boxes(rng, n):
    boxes = np.zeros((n, 7))
    boxes[:, 0] = rng.uniform(0, 70, n)
    boxes[:, 1] = rng.uniform(-40, 40, n)
    boxes[:, 2] = rng.uniform(-3, 1, n)
    boxes[:, 3] = rng.uniform(1.2, 2.2, n)  # w
    boxes[:, 4] = rng.uniform(3.0, 5.0, n)  # l
    boxes[:, 5] = rng.uniform(1.2, 2.0, n)  # h
    boxes[:, 6] = rng.uniform(-np.pi, np.pi, n)
    return boxes


def test_encode_decode_roundtrip(rng):
    boxes = random_boxes(rng, 128)
    anchors = random_boxes(rng, 128)
    enc = box_np.second_box_encode(boxes, anchors)
    dec = box_np.second_box_decode(enc, anchors)
    np.testing.assert_allclose(dec, boxes, rtol=1e-10, atol=1e-10)


def test_encode_zero_offset(rng):
    anchors = random_boxes(rng, 16)
    enc = box_np.second_box_encode(anchors, anchors)
    np.testing.assert_allclose(enc, 0.0, atol=1e-12)


def test_corners_axis_aligned():
    # w=2 (x extent), l=4 (y extent), r=0
    boxes = np.array([[10.0, 5.0, 0.0, 2.0, 4.0, 1.5, 0.0]])
    corners = box_np.box3d_to_bev_corners(boxes)[0]
    assert corners.shape == (4, 2)
    xs = np.sort(np.unique(np.round(corners[:, 0], 6)))
    ys = np.sort(np.unique(np.round(corners[:, 1], 6)))
    np.testing.assert_allclose(xs, [9.0, 11.0])
    np.testing.assert_allclose(ys, [3.0, 7.0])


def test_corners_rotation_90deg():
    # rotating by pi/2 swaps the BEV extents
    boxes = np.array([[0.0, 0.0, 0.0, 2.0, 4.0, 1.5, np.pi / 2]])
    corners = box_np.box3d_to_bev_corners(boxes)[0]
    standup = box_np.corner_to_standup_nd(corners[None])[0]
    np.testing.assert_allclose(standup, [-2.0, -1.0, 2.0, 1.0], atol=1e-6)


def test_jax_matches_np(rng):
    import jax.numpy as jnp
    from sessd_tpu.core import box_jax

    boxes = random_boxes(rng, 64)
    anchors = random_boxes(rng, 64)
    enc_np = box_np.second_box_encode(boxes, anchors)
    enc_j = np.asarray(box_jax.second_box_encode(jnp.asarray(boxes), jnp.asarray(anchors)))
    np.testing.assert_allclose(enc_j, enc_np, rtol=1e-4, atol=1e-4)

    dec_np = box_np.second_box_decode(enc_np, anchors)
    dec_j = np.asarray(box_jax.second_box_decode(jnp.asarray(enc_np), jnp.asarray(anchors)))
    np.testing.assert_allclose(dec_j, dec_np, rtol=1e-5, atol=1e-4)

    corners_np = box_np.box3d_to_bev_corners(boxes)
    corners_j = np.asarray(box_jax.bev_corners(jnp.asarray(boxes)))
    np.testing.assert_allclose(corners_j, corners_np, rtol=1e-4, atol=1e-4)


def test_points_in_rbbox():
    boxes = np.array([[0.0, 0.0, 0.0, 2.0, 4.0, 2.0, 0.0]])
    pts = np.array(
        [
            [0.0, 0.0, 0.0, 1.0],   # center -> in
            [0.9, 1.9, 0.9, 1.0],   # corner inside
            [1.1, 0.0, 0.0, 1.0],   # outside x (w/2 = 1)
            [0.0, 2.1, 0.0, 1.0],   # outside y (l/2 = 2)
            [0.0, 0.0, 1.1, 1.0],   # outside z
        ]
    )
    mask = box_np.points_in_rbbox(pts, boxes)[:, 0]
    np.testing.assert_array_equal(mask, [True, True, False, False, False])


def test_points_in_rbbox_rotated():
    boxes = np.array([[0.0, 0.0, 0.0, 2.0, 4.0, 2.0, np.pi / 2]])
    # after 90deg rotation, the long axis lies along x
    pts = np.array([[1.9, 0.0, 0.0], [0.0, 1.9, 0.0]])
    mask = box_np.points_in_rbbox(pts, boxes)[:, 0]
    np.testing.assert_array_equal(mask, [True, False])


def test_camera_lidar_roundtrip(rng):
    rect = np.eye(4)
    rect[:3, :3] = np.array([[0.999, 0.01, 0], [-0.01, 0.999, 0], [0, 0, 1.0]])
    velo2cam = np.eye(4)
    velo2cam[:3, :3] = np.array([[0, -1, 0], [0, 0, -1], [1, 0, 0]], dtype=np.float64)
    velo2cam[:3, 3] = [0.1, -0.05, -0.3]
    cam_boxes = np.concatenate(
        [
            rng.uniform(-10, 10, (32, 1)),
            rng.uniform(0.5, 3, (32, 1)),
            rng.uniform(5, 70, (32, 1)),
            rng.uniform(3, 5, (32, 1)),   # l
            rng.uniform(1.2, 2, (32, 1)),  # h
            rng.uniform(1.4, 2, (32, 1)),  # w
            rng.uniform(-np.pi, np.pi, (32, 1)),
        ],
        axis=1,
    )
    lidar = box_np.box_camera_to_lidar(cam_boxes, rect, velo2cam)
    back = box_np.box_lidar_to_camera(lidar, rect, velo2cam)
    np.testing.assert_allclose(back[:, :6], cam_boxes[:, :6], atol=1e-8)
    # angle is recovered modulo 2*pi
    dr = np.mod(back[:, 6] - cam_boxes[:, 6] + np.pi, 2 * np.pi) - np.pi
    np.testing.assert_allclose(dr, 0.0, atol=1e-8)


def test_points_in_rbbox_prefilter_matches_dense():
    """The bounding-sphere prefilter is an exact bound: the output must be
    element-identical to the dense rotation test, including boundary points
    (points exactly on faces/corners)."""
    from sessd_tpu.core.box_np import _points_in_rbbox_dense, points_in_rbbox

    rng = np.random.RandomState(0)
    for trial in range(6):
        n = rng.randint(1, 20)
        boxes = np.zeros((n, 7))
        boxes[:, 0] = rng.uniform(0, 70, n)
        boxes[:, 1] = rng.uniform(-40, 40, n)
        boxes[:, 2] = rng.uniform(-1.5, -0.5, n)
        boxes[:, 3:6] = np.abs(rng.normal([1.6, 3.9, 1.56], 0.4, (n, 3)))
        boxes[:, 6] = rng.uniform(-np.pi, np.pi, n)
        far = np.concatenate([rng.uniform(0, 70, (3000, 1)),
                              rng.uniform(-40, 40, (3000, 1)),
                              rng.uniform(-2.5, 1.5, (3000, 1))], axis=1)
        near = boxes[rng.randint(0, n, 1500), :3] + rng.normal(0, 1.5, (1500, 3))
        # exact corner points: on the sphere AND box boundary
        from sessd_tpu.core.box_np import center_to_corner_box3d
        corners = center_to_corner_box3d(boxes[:, :3], boxes[:, 3:6],
                                         boxes[:, 6], origin=(0.5, 0.5, 0.5),
                                         axis=2).reshape(-1, 3)
        pts = np.concatenate([far, near, corners])
        got = points_in_rbbox(pts, boxes)
        want = _points_in_rbbox_dense(np.ascontiguousarray(pts[:, :3]), boxes)
        np.testing.assert_array_equal(got, want)
        assert want.any()
