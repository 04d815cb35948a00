"""Tests for the JAX PointNet++ operators (FPS / ball query / 3-NN)."""
import numpy as np
import pytest


def test_fps_spreads_points(rng):
    import jax.numpy as jnp
    from sessd_tpu.ops.pointnet import farthest_point_sample

    # two tight clusters far apart: FPS must pick from both
    a = rng.randn(50, 3) * 0.1
    b = rng.randn(50, 3) * 0.1 + 100.0
    xyz = jnp.asarray(np.concatenate([a, b]).astype(np.float32))
    sel = np.asarray(farthest_point_sample(xyz, 4))
    assert len(set(sel.tolist())) == 4
    assert (sel < 50).any() and (sel >= 50).any()


def test_fps_mask(rng):
    import jax.numpy as jnp
    from sessd_tpu.ops.pointnet import farthest_point_sample

    xyz = jnp.asarray(rng.randn(20, 3).astype(np.float32))
    mask = jnp.asarray(np.arange(20) < 10)
    sel = np.asarray(farthest_point_sample(xyz, 5, mask))
    assert (sel < 10).all()


def test_ball_query(rng):
    import jax.numpy as jnp
    from sessd_tpu.ops.pointnet import ball_query

    xyz = jnp.asarray(np.array([[0, 0, 0], [0.1, 0, 0], [5, 5, 5]], np.float32))
    centers = jnp.asarray(np.array([[0, 0, 0], [9, 9, 9]], np.float32))
    idx, valid = ball_query(centers, xyz, radius=0.5, num_neighbors=4)
    idx, valid = np.asarray(idx), np.asarray(valid)
    assert valid[0].all()
    assert set(idx[0].tolist()) == {0, 1}  # short row filled with first hit
    assert not valid[1].any()


def test_three_interpolate_exact(rng):
    import jax.numpy as jnp
    from sessd_tpu.ops.pointnet import three_interpolate, three_nn

    support = jnp.asarray(rng.randn(30, 3).astype(np.float32))
    feats = jnp.asarray(rng.randn(30, 8).astype(np.float32))
    # querying the support points themselves reproduces their features
    d, idx = three_nn(support, support)
    out = np.asarray(three_interpolate(feats, idx, d))
    np.testing.assert_allclose(out, np.asarray(feats), atol=1e-4)
