"""Tests for the RoI / point-set substrate ops."""
import numpy as np
import pytest


def test_points_in_boxes3d_matches_host(rng):
    import jax.numpy as jnp
    from sessd_tpu.core.box_np import points_in_rbbox
    from sessd_tpu.ops.points import points_in_boxes3d

    pts = rng.randn(200, 4).astype(np.float32) * 5
    boxes = np.concatenate(
        [rng.uniform(-3, 3, (5, 3)), rng.uniform(1, 4, (5, 3)),
         rng.uniform(-np.pi, np.pi, (5, 1))], 1).astype(np.float32)
    got = np.asarray(points_in_boxes3d(jnp.asarray(pts), jnp.asarray(boxes)))
    want = points_in_rbbox(pts, boxes)
    np.testing.assert_array_equal(got, want)


def test_roipool3d(rng):
    import jax.numpy as jnp
    from sessd_tpu.ops.roi import roipool3d

    box = np.array([[0, 0, 0, 2, 4, 2, 0]], np.float32)
    pts = np.array([[0, 0, 0], [0.5, 1.0, 0.5], [5, 5, 5], [-0.5, -1, 0]],
                   np.float32)
    feats = np.arange(8, dtype=np.float32).reshape(4, 2)
    pooled, empty = roipool3d(jnp.asarray(pts), jnp.asarray(feats),
                              jnp.asarray(box), num_sampled=8)
    pooled = np.asarray(pooled)
    assert pooled.shape == (1, 8, 5)
    assert not bool(np.asarray(empty)[0])
    # exactly 3 member points pooled, rest zero
    nz = (np.abs(pooled[0]).sum(-1) > 0).sum()
    assert nz == 3
    # the far point (5,5,5) is not among them
    assert not any(np.allclose(row[:3], [5, 5, 5]) for row in pooled[0])


def test_rotated_roi_align_constant_map(rng):
    import jax.numpy as jnp
    from sessd_tpu.ops.roi import rotated_roi_align

    fm = jnp.ones((32, 32, 3)) * 2.5
    rois = jnp.asarray(np.array([[16, 16, 8, 8, 0.7]], np.float32))
    out = rotated_roi_align(fm, rois, out_size=(5, 5))
    np.testing.assert_allclose(np.asarray(out), 2.5, atol=1e-5)


def test_rotated_roi_align_gradient(rng):
    import jax
    import jax.numpy as jnp
    from sessd_tpu.ops.roi import rotated_roi_align

    fm = jnp.asarray(rng.randn(16, 16, 2).astype(np.float32))
    rois = jnp.asarray(np.array([[8, 8, 6, 4, 0.3]], np.float32))
    g = jax.grad(lambda f: rotated_roi_align(f, rois).sum())(fm)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0


def test_points_to_bev(rng):
    import jax.numpy as jnp
    from sessd_tpu.ops.points import points_to_bev

    pts = np.array([[0.5, 0.5, 1.0, 0.7], [0.5, 0.5, 2.0, 0.3],
                    [9.5, 9.5, 0.5, 0.9]], np.float32)
    bev = np.asarray(points_to_bev(jnp.asarray(pts), (0, 0, 0, 10, 10, 3), (10, 10)))
    assert bev.shape == (10, 10, 2)
    np.testing.assert_allclose(bev[0, 0], [2.0, 0.7], atol=1e-6)  # max h, max i
    np.testing.assert_allclose(bev[9, 9], [0.5, 0.9], atol=1e-6)
    assert bev[5, 5].sum() == 0
