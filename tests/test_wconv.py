"""Pallas windowed one-hot sparse conv vs the plain gather formulation.

On CPU the kernel runs in interpreter mode; the TPU-compiled path is
A/B-checked on hardware by scripts/bench_wconv.py (same math).
"""
import numpy as np
import jax
import jax.numpy as jnp

from sessd_tpu.ops import sparse as sp
from sessd_tpu.ops.pallas.wconv import windowed_conv


def _grid(rng, shape, n):
    b, d, h, w = shape
    lin = rng.choice(b * d * h * w, size=n, replace=False)
    coords = jnp.asarray(np.stack([
        lin // (d * h * w), (lin // (h * w)) % d, (lin // w) % h, lin % w,
    ], 1).astype(np.int32))
    valid = jnp.asarray(rng.uniform(size=n) > 0.1)
    return sp.grid_from_coords(coords, valid, shape, capacity=n + 4)


def test_windowed_conv_matches_plain():
    rng = np.random.RandomState(0)
    grid, _ = _grid(rng, (1, 5, 40, 30), 300)
    x = jnp.asarray(rng.randn(grid.capacity, 8).astype(np.float32))
    x = jnp.where(grid.mask[:, None], x, 0.0)
    w = jnp.asarray(rng.randn(27, 8, 6).astype(np.float32))
    rb = sp.subm_rulebook(grid)

    ref = sp.sparse_conv_apply(x, rb, w, grid.mask)
    out = windowed_conv(x, rb, w, grid.mask, window=128, block=32,
                        interpret=True)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                               rtol=1e-5, atol=1e-5)


def test_windowed_conv_fallback_on_wide_span():
    """A rulebook whose spans exceed the window must still be exact
    (lax.cond fallback to the plain gather)."""
    rng = np.random.RandomState(1)
    n = 260
    x = jnp.asarray(rng.randn(n, 4).astype(np.float32))
    w = jnp.asarray(rng.randn(27, 4, 4).astype(np.float32))
    rb = jnp.asarray(rng.randint(0, n, (n, 27)).astype(np.int32))  # random: huge spans
    mask = jnp.ones((n,), bool)
    ref = sp.sparse_conv_apply(x, rb, w, mask)
    out = windowed_conv(x, rb, w, mask, window=128, block=32, interpret=True)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                               rtol=1e-5, atol=1e-5)


def test_windowed_conv_grad_matches_plain():
    rng = np.random.RandomState(2)
    grid, _ = _grid(rng, (1, 5, 30, 24), 240)
    x = jnp.asarray(rng.randn(grid.capacity, 8).astype(np.float32))
    x = jnp.where(grid.mask[:, None], x, 0.0)
    w = jnp.asarray(rng.randn(27, 8, 6).astype(np.float32))
    rb = sp.subm_rulebook(grid)
    t = jnp.asarray(rng.randn(grid.capacity, 6).astype(np.float32))

    def loss_plain(x, w):
        return jnp.sum(sp.sparse_conv_apply(x, rb, w, grid.mask) * t)

    def loss_win(x, w):
        return jnp.sum(windowed_conv(x, rb, w, grid.mask, window=128,
                                     block=32, interpret=True) * t)

    gx_p, gw_p = jax.grad(loss_plain, argnums=(0, 1))(x, w)
    gx_w, gw_w = jax.grad(loss_win, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_w),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw_p), np.asarray(gw_w),
                               rtol=1e-4, atol=1e-4)
