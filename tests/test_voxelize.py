"""Voxelizer tests: exact binning semantics + host/device agreement."""
import numpy as np

from sessd_tpu.ops.voxelize import KITTI_VOXELIZER, VoxelizerSpec, voxelize_np

SMALL = VoxelizerSpec(
    point_cloud_range=(0.0, 0.0, 0.0, 4.0, 4.0, 2.0),
    voxel_size=(1.0, 1.0, 1.0),
    max_points=2,
    max_voxels=8,
)


def test_basic_binning():
    pts = np.array(
        [
            [0.5, 0.5, 0.5, 1.0],   # voxel (0,0,0)
            [0.6, 0.4, 0.2, 2.0],   # same voxel
            [0.7, 0.3, 0.1, 3.0],   # same voxel -> dropped (max_points=2)
            [3.5, 3.5, 1.5, 4.0],   # voxel (1,3,3) zyx
            [9.0, 0.0, 0.0, 5.0],   # out of range
        ],
        dtype=np.float32,
    )
    voxels, coords, num_points = voxelize_np(pts, SMALL)
    assert voxels.shape == (2, 2, 4)
    np.testing.assert_array_equal(num_points, [2, 1])
    np.testing.assert_array_equal(coords[0], [0, 0, 0])
    np.testing.assert_array_equal(coords[1], [1, 3, 3])
    np.testing.assert_allclose(voxels[0, 0], pts[0])
    np.testing.assert_allclose(voxels[0, 1], pts[1])
    np.testing.assert_allclose(voxels[1, 0], pts[3])
    np.testing.assert_allclose(voxels[1, 1], 0.0)


def test_fcfs_voxel_order():
    # voxel order = first appearance, not id order
    pts = np.array([[3.5, 3.5, 1.5, 1.0], [0.5, 0.5, 0.5, 2.0]], dtype=np.float32)
    _, coords, _ = voxelize_np(pts, SMALL)
    np.testing.assert_array_equal(coords[0], [1, 3, 3])
    np.testing.assert_array_equal(coords[1], [0, 0, 0])


def test_max_voxels_cap():
    spec = VoxelizerSpec((0, 0, 0, 4, 4, 2), (1, 1, 1), max_points=1, max_voxels=2)
    pts = np.stack([np.arange(4) + 0.5, np.zeros(4), np.zeros(4), np.zeros(4)], axis=1).astype(np.float32)
    voxels, coords, num_points = voxelize_np(pts, spec)
    assert voxels.shape[0] == 2
    np.testing.assert_array_equal(coords[:, 2], [0, 1])  # first two x bins


def test_kitti_grid():
    assert KITTI_VOXELIZER.grid_size == (1408, 1600, 40)
    assert KITTI_VOXELIZER.sparse_shape == (41, 1600, 1408)


def test_device_matches_host(rng):
    import jax
    import jax.numpy as jnp
    from sessd_tpu.ops.voxelize import voxelize_jax

    spec = VoxelizerSpec((0, -10, -2, 20, 10, 2), (0.25, 0.25, 0.5), max_points=4, max_voxels=2048)
    pts = np.stack(
        [
            rng.uniform(-1, 21, 2000),
            rng.uniform(-11, 11, 2000),
            rng.uniform(-2.5, 2.5, 2000),
            rng.uniform(0, 1, 2000),
        ],
        axis=1,
    ).astype(np.float32)
    h_vox, h_coords, h_np = voxelize_np(pts, spec)

    fn = jax.jit(lambda p: voxelize_jax(p, spec))
    d_vox, d_coords, d_np, d_nv = map(np.asarray, fn(jnp.asarray(pts)))
    nv = int(d_nv)
    assert nv == len(h_coords)

    # compare per-voxel (device orders by id; host by first appearance)
    def keyed(coords, vox, npts, n):
        out = {}
        for i in range(n):
            out[tuple(coords[i])] = (npts[i], vox[i][: npts[i]])
        return out

    hk = keyed(h_coords, h_vox, h_np, len(h_coords))
    dk = keyed(d_coords, d_vox, d_np, nv)
    assert set(hk) == set(dk)
    for k in hk:
        hn, hv = hk[k]
        dn, dv = dk[k]
        assert hn == dn, k
        np.testing.assert_allclose(np.sort(hv, axis=0), np.sort(dv, axis=0), atol=1e-6)


def test_device_point_padding(rng):
    import jax.numpy as jnp
    from sessd_tpu.ops.voxelize import voxelize_jax

    spec = SMALL
    pts = np.zeros((10, 4), dtype=np.float32)
    pts[0] = [0.5, 0.5, 0.5, 1.0]
    pts[1:] = [3.5, 3.5, 1.5, 9.0]  # would be a voxel, but we mark rows invalid
    voxels, coords, num_points, nv = voxelize_jax(jnp.asarray(pts), spec, num_valid_points=1)
    assert int(nv) == 1
    np.testing.assert_array_equal(np.asarray(coords)[0], [0, 0, 0])


def test_native_voxelizer_matches_numpy(rng):
    from sessd_tpu.utils.native import get_native
    from sessd_tpu.ops.voxelize import voxelize_host

    native = get_native()
    assert native is not None, "native build failed"
    spec = VoxelizerSpec((0, -10, -2, 20, 10, 2), (0.25, 0.25, 0.5),
                         max_points=4, max_voxels=512)
    pts = np.stack(
        [rng.uniform(-1, 21, 3000), rng.uniform(-11, 11, 3000),
         rng.uniform(-2.5, 2.5, 3000), rng.uniform(0, 1, 3000)], axis=1
    ).astype(np.float32)
    hv, hc, hn = voxelize_np(pts, spec)
    nv, nc, nn = native.voxelize(pts, spec.point_cloud_range, spec.voxel_size,
                                 spec.max_points, spec.max_voxels)
    np.testing.assert_array_equal(nc, hc)
    np.testing.assert_array_equal(nn, hn)
    np.testing.assert_allclose(nv, hv, atol=0)
    fv, fc, fn = voxelize_host(pts, spec)
    np.testing.assert_array_equal(fc, hc)
