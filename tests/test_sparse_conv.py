"""Sparse conv engine vs a dense-convolution oracle (lax.conv)."""
import numpy as np
import pytest


def _setup(rng, shape=(2, 5, 8, 7), cin=3, n_active=40, cap=64):
    import jax.numpy as jnp
    from sessd_tpu.ops.sparse import grid_from_coords

    b, d, h, w = shape
    # unique random sites
    all_sites = rng.permutation(b * d * h * w)[:n_active]
    bb = all_sites // (d * h * w)
    z = (all_sites // (h * w)) % d
    y = (all_sites // w) % h
    x = all_sites % w
    coords = np.stack([bb, z, y, x], axis=1).astype(np.int32)
    coords_padded = np.zeros((cap, 4), dtype=np.int32)
    coords_padded[:n_active] = coords
    valid = np.arange(cap) < n_active
    feats = np.zeros((cap, cin), dtype=np.float32)
    feats[:n_active] = rng.randn(n_active, cin).astype(np.float32)

    grid, perm = grid_from_coords(jnp.asarray(coords_padded), jnp.asarray(valid), shape)
    feats_sorted = jnp.asarray(feats)[perm]
    feats_sorted = jnp.where(grid.mask[:, None], feats_sorted, 0.0)

    dense = np.zeros(shape + (cin,), dtype=np.float32)
    dense[bb, z, y, x] = feats[:n_active]
    return grid, feats_sorted, dense


def _dense_conv(dense, weights, stride, padding):
    import jax
    import jax.numpy as jnp

    return np.asarray(
        jax.lax.conv_general_dilated(
            jnp.asarray(dense),
            jnp.asarray(weights),
            window_strides=stride,
            padding=[(p, p) for p in padding],
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )
    )


def test_subm_conv_matches_dense(rng):
    import jax.numpy as jnp
    from sessd_tpu.ops.sparse import subm_rulebook, sparse_conv_apply, to_dense

    cin, cout = 3, 5
    grid, feats, dense = _setup(rng, cin=cin)
    wts = rng.randn(3, 3, 3, cin, cout).astype(np.float32) * 0.3

    rb = subm_rulebook(grid, (3, 3, 3))
    out = sparse_conv_apply(feats, rb, jnp.asarray(wts.reshape(27, cin, cout)), grid.mask)
    got = np.asarray(to_dense(out, grid._replace()))

    want_full = _dense_conv(dense, wts, (1, 1, 1), (1, 1, 1))
    # submanifold: only active sites hold values
    active = np.asarray(to_dense(jnp.ones_like(feats[:, :1]), grid)) > 0
    want = np.where(active, want_full, 0.0)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_downsample_conv_matches_dense(rng):
    import jax.numpy as jnp
    from sessd_tpu.ops.sparse import downsample_rulebook, sparse_conv_apply, to_dense

    cin, cout = 3, 4
    grid, feats, dense = _setup(rng, shape=(2, 6, 9, 8), cin=cin, n_active=50, cap=64)
    wts = rng.randn(3, 3, 3, cin, cout).astype(np.float32) * 0.3

    out_grid, rb = downsample_rulebook(grid, (3, 3, 3), (2, 2, 2), (1, 1, 1),
                                       out_capacity=256)
    out = sparse_conv_apply(feats, rb, jnp.asarray(wts.reshape(27, cin, cout)),
                            out_grid.mask)
    got = np.asarray(to_dense(out, out_grid))

    want_full = _dense_conv(dense, wts, (2, 2, 2), (1, 1, 1))
    assert got.shape == want_full.shape
    # only sites whose window covers an input voxel are present
    occ = (np.abs(dense).sum(-1, keepdims=True) > 0).astype(np.float32)
    cover = _dense_conv(occ, np.ones((3, 3, 3, 1, 1), np.float32), (2, 2, 2), (1, 1, 1))
    want = np.where(cover > 0, want_full, 0.0)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_downsample_asymmetric_padding_and_stride(rng):
    """The backbone's quirky stages: padding (0,1,1) and kernel (3,1,1)
    stride (2,1,1) (scn.py:134,149)."""
    import jax.numpy as jnp
    from sessd_tpu.ops.sparse import downsample_rulebook, sparse_conv_apply, to_dense

    cin, cout = 2, 3
    grid, feats, dense = _setup(rng, shape=(1, 11, 12, 10), cin=cin, n_active=60, cap=80)

    # stage: kernel 3, stride 2, padding (0,1,1)
    wts = rng.randn(3, 3, 3, cin, cout).astype(np.float32) * 0.3
    og, rb = downsample_rulebook(grid, (3, 3, 3), (2, 2, 2), (0, 1, 1), out_capacity=256)
    got = np.asarray(to_dense(
        sparse_conv_apply(feats, rb, jnp.asarray(wts.reshape(27, cin, cout)), og.mask), og))
    want_full = _dense_conv(dense, wts, (2, 2, 2), (0, 1, 1))
    assert got.shape == want_full.shape
    occ = (np.abs(dense).sum(-1, keepdims=True) > 0).astype(np.float32)
    cover = _dense_conv(occ, np.ones((3, 3, 3, 1, 1), np.float32), (2, 2, 2), (0, 1, 1))
    np.testing.assert_allclose(got, np.where(cover > 0, want_full, 0.0), atol=1e-4)

    # stage: kernel (3,1,1), stride (2,1,1), padding 0
    wts2 = rng.randn(3, 1, 1, cin, cout).astype(np.float32) * 0.3
    og2, rb2 = downsample_rulebook(grid, (3, 1, 1), (2, 1, 1), (0, 0, 0), out_capacity=256)
    got2 = np.asarray(to_dense(
        sparse_conv_apply(feats, rb2, jnp.asarray(wts2.reshape(3, cin, cout)), og2.mask), og2))
    want_full2 = _dense_conv(dense, wts2, (2, 1, 1), (0, 0, 0))
    assert got2.shape == want_full2.shape
    cover2 = _dense_conv(occ, np.ones((3, 1, 1, 1, 1), np.float32), (2, 1, 1), (0, 0, 0))
    np.testing.assert_allclose(got2, np.where(cover2 > 0, want_full2, 0.0), atol=1e-4)


def test_out_capacity_overflow_keeps_lowest_ids(rng):
    import jax.numpy as jnp
    from sessd_tpu.ops.sparse import downsample_rulebook

    grid, feats, dense = _setup(rng, shape=(1, 6, 9, 8), cin=2, n_active=50, cap=64)
    og, _ = downsample_rulebook(grid, (3, 3, 3), (2, 2, 2), (1, 1, 1), out_capacity=8)
    ids = np.asarray(og.ids)
    assert (ids[:8] < np.iinfo(np.int32).max).all()
    assert (np.diff(ids) > 0).all()  # sorted unique
