"""Golden tests for rotated-box overlap/IoU: analytic cases, a brute-force
rasterization oracle, and np-vs-jax agreement."""
import numpy as np
import pytest

from sessd_tpu.core import rotated_iou_np as rnp


def raster_iou(b1, b2, res=0.05):
    """Monte-Carlo-free oracle: rasterize both boxes on a fine grid."""
    from sessd_tpu.core.box_np import points_in_rbbox

    def to7(b5):
        return np.array([[b5[0], b5[1], 0.0, b5[2], b5[3], 10.0, b5[4]]])

    lo = min(b1[0] - 6, b2[0] - 6), min(b1[1] - 6, b2[1] - 6)
    hi = max(b1[0] + 6, b2[0] + 6), max(b1[1] + 6, b2[1] + 6)
    xs = np.arange(lo[0], hi[0], res)
    ys = np.arange(lo[1], hi[1], res)
    gx, gy = np.meshgrid(xs, ys)
    pts = np.stack([gx.ravel(), gy.ravel(), np.zeros(gx.size)], axis=1)
    m1 = points_in_rbbox(pts, to7(b1))[:, 0]
    m2 = points_in_rbbox(pts, to7(b2))[:, 0]
    inter = np.sum(m1 & m2) * res * res
    union = np.sum(m1 | m2) * res * res
    return inter / max(union, 1e-9), inter


def test_identical_boxes():
    b = np.array([[5.0, 3.0, 1.8, 4.2, 0.3]])
    iou = rnp.iou_bev_matrix(b, b)
    np.testing.assert_allclose(iou, [[1.0]], atol=1e-6)


def test_disjoint_boxes():
    b1 = np.array([[0.0, 0.0, 2.0, 4.0, 0.0]])
    b2 = np.array([[100.0, 100.0, 2.0, 4.0, 1.0]])
    np.testing.assert_allclose(rnp.iou_bev_matrix(b1, b2), [[0.0]], atol=1e-9)


def test_axis_aligned_partial():
    # two unit-height axis-aligned boxes: [0,2]x[0,4] and [1,3]x[0,4]
    b1 = np.array([[1.0, 2.0, 2.0, 4.0, 0.0]])
    b2 = np.array([[2.0, 2.0, 2.0, 4.0, 0.0]])
    inter = rnp.overlap_bev_matrix(b1, b2)[0, 0]
    np.testing.assert_allclose(inter, 4.0, atol=1e-6)  # 1 x 4 overlap
    iou = rnp.iou_bev_matrix(b1, b2)[0, 0]
    np.testing.assert_allclose(iou, 4.0 / 12.0, atol=1e-6)


def test_contained_box():
    b1 = np.array([[0.0, 0.0, 4.0, 4.0, 0.3]])
    b2 = np.array([[0.0, 0.0, 2.0, 2.0, 0.3]])
    inter = rnp.overlap_bev_matrix(b1, b2)[0, 0]
    np.testing.assert_allclose(inter, 4.0, atol=1e-5)
    np.testing.assert_allclose(rnp.iou_bev_matrix(b1, b2)[0, 0], 4.0 / 16.0, atol=1e-5)


def test_cross_45deg():
    # classic plus-sign: two 1x4 boxes crossed at 45 deg about the same center
    b1 = np.array([[0.0, 0.0, 1.0, 4.0, 0.0]])
    b2 = np.array([[0.0, 0.0, 1.0, 4.0, np.pi / 2]])
    inter = rnp.overlap_bev_matrix(b1, b2)[0, 0]
    np.testing.assert_allclose(inter, 1.0, atol=1e-6)  # central 1x1 square


def test_random_vs_raster(rng):
    for _ in range(10):
        b1 = np.array(
            [rng.uniform(-2, 2), rng.uniform(-2, 2), rng.uniform(1, 3),
             rng.uniform(2, 5), rng.uniform(-np.pi, np.pi)]
        )
        b2 = np.array(
            [rng.uniform(-2, 2), rng.uniform(-2, 2), rng.uniform(1, 3),
             rng.uniform(2, 5), rng.uniform(-np.pi, np.pi)]
        )
        iou = rnp.iou_bev_matrix(b1[None], b2[None])[0, 0]
        oracle, _ = raster_iou(b1, b2)
        assert abs(iou - oracle) < 2e-2, (b1, b2, iou, oracle)


def test_jax_matches_np(rng):
    import jax.numpy as jnp
    from sessd_tpu.core import rotated_iou as rj

    boxes1 = np.stack(
        [
            rng.uniform(-5, 5, 40), rng.uniform(-5, 5, 40),
            rng.uniform(1, 3, 40), rng.uniform(2, 5, 40),
            rng.uniform(-np.pi, np.pi, 40),
        ],
        axis=1,
    )
    boxes2 = np.stack(
        [
            rng.uniform(-5, 5, 30), rng.uniform(-5, 5, 30),
            rng.uniform(1, 3, 30), rng.uniform(2, 5, 30),
            rng.uniform(-np.pi, np.pi, 30),
        ],
        axis=1,
    )
    m_np = rnp.iou_bev_matrix(boxes1, boxes2)
    m_j = np.asarray(rj.iou_bev_matrix(jnp.asarray(boxes1, dtype=jnp.float32),
                                       jnp.asarray(boxes2, dtype=jnp.float32)))
    np.testing.assert_allclose(m_j, m_np, atol=2e-3)

    # chunked path agrees with the one-shot path
    m_chunked = np.asarray(
        rj.iou_bev_matrix(jnp.asarray(boxes1, dtype=jnp.float32),
                          jnp.asarray(boxes2, dtype=jnp.float32), row_chunk=8)
    )
    np.testing.assert_allclose(m_chunked, m_j, atol=1e-6)


def test_iou3d(rng):
    # identical boxes -> 1; stacked boxes w/o z overlap -> 0
    b = np.array([[0.0, 0.0, 0.0, 2.0, 4.0, 1.5, 0.4]])
    np.testing.assert_allclose(rnp.iou_3d_matrix(b, b), [[1.0]], atol=1e-6)
    b2 = b.copy()
    b2[0, 2] = 5.0
    np.testing.assert_allclose(rnp.iou_3d_matrix(b, b2), [[0.0]], atol=1e-9)
    # half z overlap of identical footprints -> inter = 0.5, union = 1.5
    b3 = b.copy()
    b3[0, 2] = 0.75
    np.testing.assert_allclose(rnp.iou_3d_matrix(b, b3)[0, 0], 0.5 / 1.5, atol=1e-6)

    import jax.numpy as jnp
    from sessd_tpu.core import rotated_iou as rj

    boxes1 = np.concatenate(
        [rng.uniform(-5, 5, (20, 2)), rng.uniform(-1, 1, (20, 1)),
         rng.uniform(1, 3, (20, 2)), rng.uniform(1, 2, (20, 1)),
         rng.uniform(-np.pi, np.pi, (20, 1))], axis=1)
    boxes2 = np.concatenate(
        [rng.uniform(-5, 5, (20, 2)), rng.uniform(-1, 1, (20, 1)),
         rng.uniform(1, 3, (20, 2)), rng.uniform(1, 2, (20, 1)),
         rng.uniform(-np.pi, np.pi, (20, 1))], axis=1)
    m_np = rnp.iou_3d_matrix(boxes1, boxes2)
    m_j = np.asarray(rj.iou_3d_matrix(jnp.asarray(boxes1, dtype=jnp.float32),
                                      jnp.asarray(boxes2, dtype=jnp.float32)))
    np.testing.assert_allclose(m_j, m_np, atol=2e-3)


def test_rotate_nms_cpu():
    boxes = np.array(
        [
            [0.0, 0.0, 2.0, 4.0, 0.0],
            [0.1, 0.0, 2.0, 4.0, 0.0],   # heavy overlap with #0
            [10.0, 0.0, 2.0, 4.0, 0.5],  # disjoint
        ]
    )
    scores = np.array([0.9, 0.8, 0.7])
    keep = rnp.rotate_nms_cpu(boxes, scores, iou_threshold=0.1)
    np.testing.assert_array_equal(keep, [0, 2])
