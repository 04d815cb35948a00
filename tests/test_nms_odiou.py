"""Tests for jitted rotated NMS (vs host greedy oracle) and ODIoU loss
(value sanity + gradient flow)."""
import numpy as np
import pytest


def make_boxes5(rng, n, spread=20.0):
    return np.stack(
        [
            rng.uniform(-spread, spread, n),
            rng.uniform(-spread, spread, n),
            rng.uniform(1.4, 2.2, n),
            rng.uniform(3.2, 4.8, n),
            rng.uniform(-np.pi, np.pi, n),
        ],
        axis=1,
    ).astype(np.float32)


def test_rotate_nms_matches_host_oracle(rng):
    import jax.numpy as jnp
    from sessd_tpu.core.nms import rotate_nms
    from sessd_tpu.core import rotated_iou_np as rnp

    n = 64
    boxes = make_boxes5(rng, n, spread=12.0)
    scores = rng.uniform(0.0, 1.0, n).astype(np.float32)

    idx, valid = rotate_nms(
        jnp.asarray(boxes), jnp.asarray(scores),
        pre_max_size=n, post_max_size=16, iou_threshold=0.1, row_chunk=16,
    )
    got = np.asarray(idx)[np.asarray(valid)]
    want = rnp.rotate_nms_cpu(boxes.astype(np.float64), scores.astype(np.float64),
                              iou_threshold=0.1, pre_max_size=n, post_max_size=16)
    np.testing.assert_array_equal(np.sort(got), np.sort(want))


def test_rotate_nms_padding_rows_ignored(rng):
    import jax.numpy as jnp
    from sessd_tpu.core.nms import rotate_nms

    boxes = make_boxes5(rng, 8)
    scores = np.full(8, -np.inf, dtype=np.float32)
    scores[2] = 0.5
    idx, valid = rotate_nms(jnp.asarray(boxes), jnp.asarray(scores),
                            pre_max_size=8, post_max_size=4, iou_threshold=0.1,
                            row_chunk=None)
    valid = np.asarray(valid)
    assert valid.sum() == 1
    assert np.asarray(idx)[0] == 2


def test_odiou_identical_boxes_zero():
    import jax.numpy as jnp
    from sessd_tpu.core.odiou import odiou_3d

    b = jnp.asarray([[5.0, 3.0, -1.0, 1.6, 3.9, 1.56, 0.4]])
    od = np.asarray(odiou_3d(b, b))
    np.testing.assert_allclose(od, 0.0, atol=1e-5)


def test_odiou_angle_term():
    import jax.numpy as jnp
    from sessd_tpu.core.odiou import odiou_3d

    g = jnp.asarray([[0.0, 0.0, 0.0, 2.0, 2.0, 2.0, 0.0]])
    q = jnp.asarray([[0.0, 0.0, 0.0, 2.0, 2.0, 2.0, np.pi / 2]])
    # square footprints: iou=1, centers equal -> od = 1.25*(1-|cos(pi/2)|) = 1.25
    od = np.asarray(odiou_3d(g, q))
    np.testing.assert_allclose(od, 1.25, atol=1e-4)


def test_odiou_grad_flows(rng):
    import jax
    import jax.numpy as jnp
    from sessd_tpu.core.odiou import odiou_3d_loss

    g = jnp.asarray(
        np.concatenate(
            [rng.uniform(-5, 5, (8, 2)), rng.uniform(-1, 0, (8, 1)),
             rng.uniform(1.4, 2, (8, 2)), rng.uniform(1.3, 1.8, (8, 1)),
             rng.uniform(-1, 1, (8, 1))], axis=1
        ).astype(np.float32)
    )
    q = g + jnp.asarray(rng.uniform(-0.3, 0.3, (8, 7)).astype(np.float32))
    w = jnp.ones((8,), dtype=jnp.float32)

    val, grad = jax.value_and_grad(lambda q_: odiou_3d_loss(g, q_, w, 4))(q)
    assert np.isfinite(float(val)) and float(val) > 0
    grad = np.asarray(grad)
    assert np.isfinite(grad).all()
    assert np.abs(grad).sum() > 0


def test_min_area_rect_diag_square():
    import jax.numpy as jnp
    from sessd_tpu.core.odiou import min_area_rect_diag

    # unit square (any rotation): diag = sqrt(2)
    pts = jnp.asarray([[[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0]]])
    np.testing.assert_allclose(np.asarray(min_area_rect_diag(pts)), np.sqrt(2), atol=1e-5)
    # rotated square
    ang = 0.7
    c, s = np.cos(ang), np.sin(ang)
    rot = np.array([[c, -s], [s, c]])
    pts2 = jnp.asarray((np.asarray(pts)[0] @ rot.T)[None].astype(np.float32))
    np.testing.assert_allclose(np.asarray(min_area_rect_diag(pts2)), np.sqrt(2), atol=1e-4)
