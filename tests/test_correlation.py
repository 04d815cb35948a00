"""Tests for the correlation / feature-alignment substrate ops."""
import numpy as np
import pytest


def test_correlation_self_peak(rng):
    import jax.numpy as jnp
    from sessd_tpu.ops.correlation import correlation

    f = jnp.asarray(rng.randn(12, 14, 32).astype(np.float32))
    vol = np.asarray(correlation(f, f, max_displacement=2))
    assert vol.shape == (12, 14, 25)
    # zero displacement (center of the 5x5 window) dominates away from edges
    center = 12
    inner = vol[3:-3, 3:-3]
    assert (inner.argmax(-1) == center).mean() > 0.9


def test_correlation_detects_shift(rng):
    import jax.numpy as jnp
    from sessd_tpu.ops.correlation import correlation

    f1 = jnp.asarray(rng.randn(16, 16, 32).astype(np.float32))
    f2 = jnp.roll(f1, (1, 2), axis=(0, 1))  # f2[y+1, x+2] = f1[y, x]
    vol = np.asarray(correlation(f1, f2, max_displacement=3))
    # best displacement should be (dy=1, dx=2) -> index (1+3)*7 + (2+3)
    inner = vol[4:-4, 4:-4]
    assert (inner.argmax(-1) == 4 * 7 + 5).mean() > 0.9


def test_align_feature_identity_and_shift(rng):
    import jax.numpy as jnp
    from sessd_tpu.ops.correlation import align_feature

    f = jnp.asarray(rng.randn(10, 10, 3).astype(np.float32))
    out = np.asarray(align_feature(f, jnp.zeros((10, 10, 2))))
    np.testing.assert_allclose(out, np.asarray(f), atol=1e-6)

    # integer shift: out[y, x] = f[y+1, x]
    flow = jnp.zeros((10, 10, 2)).at[..., 0].set(1.0)
    out = np.asarray(align_feature(f, flow))
    np.testing.assert_allclose(out[:-1], np.asarray(f)[1:], atol=1e-6)


def test_align_feature_grad(rng):
    import jax
    import jax.numpy as jnp
    from sessd_tpu.ops.correlation import align_feature

    f = jnp.asarray(rng.randn(8, 8, 2).astype(np.float32))
    flow = jnp.asarray(rng.uniform(-1, 1, (8, 8, 2)).astype(np.float32))
    g = jax.grad(lambda fl: align_feature(f, fl).sum())(flow)
    assert np.isfinite(np.asarray(g)).all()
