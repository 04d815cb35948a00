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


def test_fused_two_level_windows_exact():
    """The two-level fused kernel (small window + rare wide blocks flagged
    per (offset, block)) must equal the plain gather formulation even when
    many blocks exceed the small window."""
    import jax
    import jax.numpy as jnp
    from sessd_tpu.ops.pallas.wconv import (cols_for, fused_conv_affine_t,
                                            prep_rulebook)

    rng = np.random.RandomState(0)
    n_in, cin, cout, k = 1000, 16, 32, 27
    cols_in = cols_for(n_in)
    n_out = n_in
    # rulebook: mostly local rows (small spans) with a sprinkling of
    # far-away sources so some (offset, block) pairs exceed the small
    # window but not the large one
    base = np.arange(n_out)[:, None] + rng.randint(-40, 40, (n_out, k))
    far = rng.rand(n_out, k) < 0.02
    base = np.where(far, rng.randint(0, n_in, (n_out, k)), base)
    rb = np.where((base >= 0) & (base < n_in), base, n_in).astype(np.int32)

    feats = rng.randn(cin, cols_in).astype(np.float32) * 0.3
    feats[:, n_in:] = 0.0
    w2t = (rng.randn(cout, k * cin) * 0.05).astype(np.float32)
    bias = (rng.randn(cout, 1) * 0.1).astype(np.float32)

    window, window_large = 256, cols_in
    rb_t, lo, lo_l, pb, pvalid, span_ok = prep_rulebook(
        jnp.asarray(rb), n_in, cols_in, window=window,
        window_large=window_large)
    assert int(np.asarray(pvalid).sum()) > 0, "test must exercise patches"
    assert bool(span_ok)

    out = fused_conv_affine_t(
        jnp.asarray(feats), rb_t, lo, lo_l, pb, pvalid, span_ok,
        jnp.asarray(w2t), jnp.asarray(bias), n_in,
        window=window, window_large=window_large, relu=True, interpret=True)

    # reference: gather formulation
    fp = feats.T  # [cols_in, Cin]
    rb_pad = np.full((out.shape[1], k), n_in, np.int32)
    rb_pad[:n_out] = rb
    g = fp[rb_pad].reshape(out.shape[1], k * cin)
    want = g @ w2t.T + bias[:, 0][None, :]
    want = np.maximum(want, 0.0)
    valid = (rb_pad != n_in).any(1)
    want = np.where(valid[:, None], want, 0.0).T
    np.testing.assert_allclose(np.asarray(out), want, rtol=2e-4, atol=2e-4)

    # the streaming twin (features in HBM, double-buffered window DMAs —
    # the batch>4 serving path) must produce identical columns
    out_s = fused_conv_affine_t(
        jnp.asarray(feats), rb_t, lo, lo_l, pb, pvalid, span_ok,
        jnp.asarray(w2t), jnp.asarray(bias), n_in,
        window=window, window_large=window_large, relu=True, interpret=True,
        stream=True)
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(out),
                               rtol=1e-6, atol=1e-6)
