"""HostPreprocessor glue (serve.py): voxelize + mean-VFE + int16 rulebook
chain must match the device-side equivalents on a real-ish scene.
(The rulebook builder itself is parity-tested in test_host_rulebooks; the
fused device consumer in test_backbone_fused.)"""
import numpy as np
import pytest

from sessd_tpu.utils.native import get_native


@pytest.fixture(scope="module")
def prep_out():
    from sessd_tpu.ops.voxelize import KITTI_VOXELIZER
    from sessd_tpu.serve import HostPreprocessor
    from sessd_tpu.utils.synth_scene import make_scene

    if get_native() is None:
        pytest.skip("no native toolchain")
    prep = HostPreprocessor(KITTI_VOXELIZER)
    pts = np.asarray(make_scene(seed=0)[0])
    return prep, pts, prep(pts)


def test_host_preprocessor_shapes_dtypes(prep_out):
    prep, pts, out = prep_out
    caps = prep.caps
    assert out["feats"].shape == (caps[0], 4)
    assert out["feats"].dtype == np.float32
    rb = out["rulebooks"]
    # serving capacities < 2^15 -> gather maps ship int16, ids int32
    assert rb["perm"].dtype == np.int16 and rb["perm"].shape == (caps[0],)
    assert all(a.dtype == np.int16 for a in rb["subm"])
    assert all(a.dtype == np.int16 for a in rb["down"])
    assert all(a.dtype == np.int32 for a in rb["ids"])
    assert [a.shape[0] for a in rb["ids"]] == list(caps)
    assert [a.shape for a in rb["subm"]] == [(c, 27) for c in caps[:4]]


def test_host_preprocessor_vfe_matches_device(prep_out):
    """feats = per-voxel point mean, matching VoxelFeatureExtractorV3 on the
    same (host-voxelized) inputs."""
    prep, pts, out = prep_out
    spec = prep.spec
    native = get_native()
    voxels, coords, npts = native.voxelize(
        pts, spec.point_cloud_range, spec.voxel_size, spec.max_points,
        prep.caps[0])
    want = voxels[..., :4].sum(1) / np.maximum(npts, 1)[:, None]
    n = coords.shape[0]
    np.testing.assert_allclose(out["feats"][:n], want, rtol=1e-6)
    assert not out["feats"][n:].any()


def test_host_preprocessor_rulebooks_match_builder(prep_out):
    """The chain equals a direct build_rulebooks call on the same coords."""
    prep, pts, out = prep_out
    spec = prep.spec
    native = get_native()
    from sessd_tpu.data.rulebooks import DOWNS

    _, coords_zyx, _ = native.voxelize(
        pts, spec.point_cloud_range, spec.voxel_size, spec.max_points,
        prep.caps[0])
    n = coords_zyx.shape[0]
    coords = np.zeros((prep.caps[0], 4), np.int32)
    coords[:n, 1:] = coords_zyx
    valid = np.zeros((prep.caps[0],), bool)
    valid[:n] = True
    d, h, w = spec.sparse_shape
    want = native.build_rulebooks(coords, valid, (1, d, h, w), prep.caps,
                                  DOWNS, out_dtype=np.int16)
    rb = out["rulebooks"]
    np.testing.assert_array_equal(rb["perm"], want["perm"])
    for key in ("ids", "subm", "down"):
        for a, b in zip(rb[key], want[key]):
            np.testing.assert_array_equal(a, b)
