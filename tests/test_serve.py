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


def test_scratch_ring_reuse_and_aliasing_window():
    """The buffer ring must (a) return results identical to fresh builds,
    (b) keep the last `ring` results mutually un-aliased, and (c) reuse
    buffers after `ring` calls (the documented aliasing contract — fresh
    50-80 MB mmaps per call THP-stall for seconds on churned heaps)."""
    from sessd_tpu.ops.voxelize import KITTI_VOXELIZER
    from sessd_tpu.serve import HostPreprocessor
    from sessd_tpu.utils.synth_scene import make_scene

    prep = HostPreprocessor(KITTI_VOXELIZER, ring=2)
    fresh = HostPreprocessor(KITTI_VOXELIZER, ring=1)
    scenes = [np.asarray(make_scene(seed=s)[0]) for s in range(3)]

    outs = [prep(p)["rulebooks"] for p in scenes[:2]]
    # (b) within the ring window: both results valid simultaneously
    for out, pts in zip(outs, scenes[:2]):
        want = fresh(pts)["rulebooks"]
        np.testing.assert_array_equal(out["perm"], want["perm"])
        for key in ("ids", "subm", "down"):
            for a, b in zip(out[key], want[key]):
                np.testing.assert_array_equal(a, b)
    # (c) the third call reuses the first call's buffers (same base memory)
    out3 = prep(scenes[2])["rulebooks"]
    assert out3["subm"][0].base is outs[0]["subm"][0].base


def test_fallback_telemetry_realistic_and_overdense():
    """Host span telemetry (serve.fallback_telemetry) must report zero
    whole-conv fallbacks on realistic scenes with the shipped windows, and
    must fire on an adversarial scene (a sparse voxel layer above a dense
    one: the subm dz taps of a 256-output block then span the whole dense
    plane, far past window_large)."""
    from sessd_tpu.models.detector import VoxelNet
    from sessd_tpu.ops.voxelize import KITTI_VOXELIZER
    from sessd_tpu.serve import (HostPreprocessor, fallback_telemetry,
                                 window_config_from_detector)
    from sessd_tpu.utils.synth_scene import make_scene

    prep = HostPreprocessor(KITTI_VOXELIZER)
    wcfg = window_config_from_detector(
        VoxelNet(sparse_shape=KITTI_VOXELIZER.sparse_shape))

    tel = fallback_telemetry(
        prep(np.asarray(make_scene(seed=0)[0]))["rulebooks"],
        prep.caps, wcfg)
    assert tel["fallback_convs"] == 0
    # two-level windows: a handful of long-span blocks route to the patch
    # kernel instead of falling back
    assert 0 < tel["patched_blocks"] < 64

    # ids are z-minor ((b*H + y)*W + x)*D + z (native/rulebook.cpp:14), so
    # a SPARSE y-row between two x-dense multi-z rows is the span killer: a
    # 256-output block straddling the sparse row covers its full x range,
    # and its dy taps then source the adjacent dense row end to end
    # (~1408 x * 3 z = 4224 cells >> window_large)
    # voxel-center coordinates (off-center points round into neighbouring
    # rows in f32 and collapse the pattern)
    xc = (np.arange(1408) + 0.5) * 0.05
    yc = lambda idx: -40.0 + (idx + 0.5) * 0.05
    zc = np.array([-2.95, -2.85, -2.75])
    dense_rows, sparse_rows = [], []
    for yi in (800, 802):  # dense rows flanking the sparse one
        gx, gz = np.meshgrid(xc, zc)
        dense_rows.append(np.stack(
            [gx.ravel(), np.full(gx.size, yc(yi)), gz.ravel(),
             np.zeros(gx.size)], 1))
    xsp = xc[::50]  # sparse row between them (y index 801)
    sparse_rows.append(np.stack(
        [xsp, np.full(xsp.size, yc(801)), np.full(xsp.size, -2.85),
         np.zeros(xsp.size)], 1))
    pts = np.concatenate(dense_rows + sparse_rows).astype(np.float32)
    tel2 = fallback_telemetry(prep(pts)["rulebooks"], prep.caps, wcfg)
    assert tel2["fallback_convs"] >= 1
    assert any(c["fallback"] for c in tel2["convs"].values())


def test_cap_saturation_telemetry():
    """fallback_telemetry flags stages whose id table filled to capacity
    (voxel truncation = accuracy risk) and stays quiet with headroom."""
    from sessd_tpu.models.detector import VoxelNet
    from sessd_tpu.ops.voxelize import KITTI_VOXELIZER
    from sessd_tpu.serve import (HostPreprocessor, fallback_telemetry,
                                 window_config_from_detector)
    from sessd_tpu.utils.synth_scene import make_scene

    wcfg = window_config_from_detector(
        VoxelNet(sparse_shape=KITTI_VOXELIZER.sparse_shape))
    pts = np.asarray(make_scene(seed=0)[0])

    roomy = HostPreprocessor(KITTI_VOXELIZER)
    tel = fallback_telemetry(roomy(pts)["rulebooks"], roomy.caps, wcfg)
    assert tel["cap_saturated_stages"] == []

    # stage-0 capacity below the scene's ~17k voxels -> truncation flagged
    tiny = HostPreprocessor(KITTI_VOXELIZER,
                            stage_capacity=(4096, 4608, 4096, 4096, 4096))
    tel2 = fallback_telemetry(tiny(pts)["rulebooks"], tiny.caps, wcfg)
    assert 0 in tel2["cap_saturated_stages"]


def test_batch8_window_config_no_fallbacks():
    """serving_window_config(8): over-window block counts and worst-case
    spans STACK with the batch (chains concatenate scenes at non-256-aligned
    capacity boundaries, so straddle blocks grow spans past the batch-4
    maxima). The b>4 config must keep every conv off the whole-conv gather
    fallback on realistic scenes — measured b8 n_over up to 54 and spans to
    2135 trip five of eight convs under the b<=4 config."""
    from sessd_tpu.models.backbone import SpMiddleFHD
    from sessd_tpu.ops.voxelize import KITTI_VOXELIZER
    from sessd_tpu.serve import (SERVING_CAPS, HostPreprocessor,
                                 fallback_telemetry, serving_window_config)
    from sessd_tpu.utils.synth_scene import make_scene

    b = 8
    prep = HostPreprocessor(KITTI_VOXELIZER, SERVING_CAPS)
    scenes = [np.asarray(make_scene(seed=s)[0]) for s in range(4)] * 2
    rb = prep.batch(scenes[:b])["rulebooks"]
    caps_b = [c * b for c in SERVING_CAPS]

    cfg = serving_window_config(b)
    assert cfg["patch_max"] >= 96  # ~1.7x the measured worst n_over
    tel = fallback_telemetry(
        rb, caps_b, SpMiddleFHD(stage_capacity=SERVING_CAPS, **cfg))
    assert tel["fallback_convs"] == 0
    assert tel["patched_blocks"] > 0  # two-level windows doing real work

    # and the b<=4 config genuinely does NOT survive batch 8 (guards the
    # telemetry's sensitivity, not just the config's safety)
    tel4 = fallback_telemetry(
        rb, caps_b,
        SpMiddleFHD(stage_capacity=SERVING_CAPS, **serving_window_config(4)))
    assert tel4["fallback_convs"] >= 1
