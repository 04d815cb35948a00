"""Pillar-sparse/z-dense engine (ops/pillar.py) vs the voxel-row sparse
engine (ops/sparse.py): both must produce identical sparse conv results —
they are execution plans for the same operator (spconv, scn.py:92-189)."""
import numpy as np
import jax.numpy as jnp
import pytest

from sessd_tpu.ops import sparse as sp
from sessd_tpu.ops import pillar as pl


def _random_grid(rng, shape, n, c):
    b, d, h, w = shape
    m = b * d * h * w
    lin = rng.choice(m, size=n, replace=False)
    bb = lin // (d * h * w)
    z = (lin // (h * w)) % d
    y = (lin // w) % h
    x = lin % w
    coords = jnp.asarray(np.stack([bb, z, y, x], 1).astype(np.int32))
    valid = jnp.asarray(rng.uniform(size=n) > 0.15)
    feats = jnp.asarray(rng.randn(n, c).astype(np.float32))
    grid, perm = sp.grid_from_coords(coords, valid, shape, capacity=n + 8)
    feats_sorted = jnp.where(grid.mask[:, None], feats[perm], 0.0)
    return grid, feats_sorted


def test_pillars_from_grid_roundtrip():
    rng = np.random.RandomState(0)
    shape = (2, 9, 13, 11)
    grid, x = _random_grid(rng, shape, 70, 5)
    pillars, cols, occ = pl.pillars_from_grid(grid, x, capacity=80)
    # dense scatter through both layouts must agree
    d_s = sp.to_dense(x, grid)
    d_p = pl.pillar_to_dense(cols, pillars)
    np.testing.assert_allclose(np.asarray(d_s), np.asarray(d_p), atol=0)
    # occupancy matches the voxel set
    d_o = sp.to_dense(jnp.ones_like(x[:, :1]), grid)[..., 0]
    d_po = pl.pillar_to_dense(occ[..., None], pillars)[..., 0]
    np.testing.assert_array_equal(np.asarray(d_o) > 0, np.asarray(d_po) > 0)


def test_subm_conv_matches_sparse_engine():
    rng = np.random.RandomState(1)
    shape = (2, 9, 13, 11)
    grid, x = _random_grid(rng, shape, 70, 5)
    w = jnp.asarray(rng.randn(27, 5, 6).astype(np.float32))

    rb = sp.subm_rulebook(grid)
    out_s = sp.sparse_conv_apply(x, rb, w, grid.mask)

    pillars, cols, occ = pl.pillars_from_grid(grid, x, capacity=80)
    rb9 = pl.bev_rulebook(pillars)
    out_p = pl.pillar_conv(cols, rb9, w) * occ[..., None]

    d_s = sp.to_dense(out_s, grid)
    d_p = pl.pillar_to_dense(out_p, pillars)
    np.testing.assert_allclose(np.asarray(d_s), np.asarray(d_p),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("kernel,stride,padding", [
    ((3, 3, 3), (2, 2, 2), (1, 1, 1)),   # stage 1/2 transitions
    ((3, 3, 3), (2, 2, 2), (0, 1, 1)),   # stage 3 transition
    ((3, 1, 1), (2, 1, 1), (0, 0, 0)),   # stage 4 z-collapse
])
def test_downsample_matches_sparse_engine(kernel, stride, padding):
    rng = np.random.RandomState(2)
    shape = (2, 9, 13, 11)
    b, d, h, w_ = shape
    grid, x = _random_grid(rng, shape, 90, 4)
    kd, kh, kw = kernel
    wgt = jnp.asarray(rng.randn(kd * kh * kw, 4, 6).astype(np.float32))

    out_grid, rbd = sp.downsample_rulebook(grid, kernel, stride, padding,
                                           out_capacity=256)
    out_s = sp.sparse_conv_apply(x, rbd, wgt, out_grid.mask)
    d_s = sp.to_dense(out_s, out_grid)

    od = (d + 2 * padding[0] - kd) // stride[0] + 1
    pillars, cols, occ = pl.pillars_from_grid(grid, x, capacity=100)
    opil = pl.downsample_pillars(pillars, (kh, kw), stride[1:], padding[1:],
                                 out_capacity=128, out_depth=od)
    rb = pl.bev_rulebook(pillars, opil, (kh, kw), stride[1:], padding[1:])
    out_p, cover = pl.pillar_conv(cols, rb, wgt, kernel,
                                  z_stride=stride[0], z_pad=padding[0],
                                  occ=occ)
    d_p = pl.pillar_to_dense(out_p * cover[..., None], opil)
    assert d_p.shape == d_s.shape
    np.testing.assert_allclose(np.asarray(d_s), np.asarray(d_p),
                               rtol=1e-5, atol=1e-5)
    # covered-site sets agree exactly
    d_cov = pl.pillar_to_dense(cover[..., None], opil)[..., 0]
    d_exist = sp.to_dense(jnp.ones_like(out_s[:, :1]), out_grid)[..., 0]
    np.testing.assert_array_equal(np.asarray(d_cov) > 0, np.asarray(d_exist) > 0)


def test_chained_two_stages():
    """subm -> strided -> subm through both engines stays equal (the real
    backbone composition pattern)."""
    rng = np.random.RandomState(3)
    shape = (1, 9, 16, 14)
    grid, x = _random_grid(rng, shape, 80, 4)
    w1 = jnp.asarray(rng.randn(27, 4, 8).astype(np.float32))
    wd = jnp.asarray(rng.randn(27, 8, 8).astype(np.float32))
    w2 = jnp.asarray(rng.randn(27, 8, 8).astype(np.float32))

    # sparse engine
    rb = sp.subm_rulebook(grid)
    a = sp.sparse_conv_apply(x, rb, w1, grid.mask)
    g2, rbd = sp.downsample_rulebook(grid, (3, 3, 3), (2, 2, 2), (1, 1, 1), 128)
    b_ = sp.sparse_conv_apply(a, rbd, wd, g2.mask)
    rb2 = sp.subm_rulebook(g2)
    c_ = sp.sparse_conv_apply(b_, rb2, w2, g2.mask)
    d_s = sp.to_dense(c_, g2)

    # pillar engine
    pillars, cols, occ = pl.pillars_from_grid(grid, x, capacity=96)
    a_p = pl.pillar_conv(cols, pl.bev_rulebook(pillars), w1) * occ[..., None]
    opil = pl.downsample_pillars(pillars, out_capacity=96, out_depth=5)
    rbx = pl.bev_rulebook(pillars, opil, (3, 3), (2, 2), (1, 1))
    b_p, cover = pl.pillar_conv(a_p, rbx, wd, z_stride=2, z_pad=1, occ=occ)
    b_p = b_p * cover[..., None]
    c_p = pl.pillar_conv(b_p, pl.bev_rulebook(opil), w2) * cover[..., None]
    d_p = pl.pillar_to_dense(c_p, opil)
    np.testing.assert_allclose(np.asarray(d_s), np.asarray(d_p),
                               rtol=1e-4, atol=1e-4)
