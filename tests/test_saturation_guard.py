"""Capacity-saturation guards (r4): a stage whose id table fills up has
TRUNCATED voxels — samples past the cut silently train/eval on empty
features. Found in r4: uniform-random synthetic ground points dilated ~3.5x
under the strided downsample, saturated stage 1, and zeroed 3 of 4 batch
samples in the acceptance run with no signal anywhere.

Covers: (a) the trainer's per-batch train-chain guard fires on a saturated
chain and stays quiet on a healthy one; (b) ray-cast synthetic frames keep
all stage occupancies under the training caps (the realism property the
fix depends on); (c) isolated uniform-random points DO dilate past their
own stage-0 count (the sharpness half — if this stops tripping, the guard
has no failure mode left to catch).
"""
import logging
import pickle
import types

import numpy as np
import pytest

from sessd_tpu.utils.native import get_native

DOWNS = [((3, 3, 3), (2, 2, 2), (1, 1, 1)),
         ((3, 3, 3), (2, 2, 2), (1, 1, 1)),
         ((3, 3, 3), (2, 2, 2), (0, 1, 1)),
         ((3, 1, 1), (2, 1, 1), (0, 0, 0))]
TRAIN_CAPS = (20000, 22000, 18000, 12000, 8000)


def _chain(coords3, caps, shape=(41, 1600, 1408)):
    native = get_native()
    if native is None:
        pytest.skip("no native toolchain")
    n = coords3.shape[0]
    cap0 = caps[0]
    coords = np.zeros((cap0, 4), np.int32)
    coords[:n, 1:] = coords3[:cap0]
    valid = np.zeros(cap0, bool)
    valid[:min(n, cap0)] = True
    return native.build_rulebooks(coords, valid, (1,) + shape,
                                  list(caps), DOWNS)


def _occupancies(points, caps=(20000, 200000, 200000, 200000, 200000)):
    import jax

    jax.config.update("jax_platforms", "cpu")
    from sessd_tpu.ops.voxelize import KITTI_VOXELIZER as spec

    native = get_native()
    if native is None:
        pytest.skip("no native toolchain")
    v, c, n = native.voxelize(points, spec.point_cloud_range,
                              spec.voxel_size, spec.max_points, caps[0])
    rb = _chain(c, caps)
    sent = np.iinfo(np.int32).max
    return [int((np.asarray(rb["ids"][i]) < sent).sum()) for i in range(5)]


def test_raycast_frames_fit_train_caps(tmp_path):
    """The r4 data fix: ray-cast synthetic scenes must match the
    real-KITTI occupancy profile the capacities were sized for."""
    from kitti_synth import make_kitti_root

    root = tmp_path / "kitti"
    make_kitti_root(root, num_frames=2, num_cars=10, pts_per_car=400,
                    ground_points=16000)
    for i in range(2):
        pts = np.fromfile(root / "training" / "velodyne" / f"{i:06d}.bin",
                          np.float32).reshape(-1, 4)
        occ = _occupancies(pts)
        assert all(o < 0.95 * c for o, c in zip(occ, TRAIN_CAPS)), occ


def test_isolated_points_dilate_past_caps():
    """Sharpness: isolated uniform-random points MUST still dilate ~3.5x
    and exceed the stage-1 cap — otherwise the guard guards nothing."""
    rng = np.random.RandomState(0)
    g = 16000
    pts = np.stack([rng.uniform(4, 60, g), rng.uniform(-30, 30, g),
                    rng.uniform(-1.9, -1.6, g), rng.uniform(0, 1, g)],
                   1).astype(np.float32)
    occ = _occupancies(pts)
    assert occ[1] > TRAIN_CAPS[1], occ  # 16k isolated pts -> ~58k stage-1


def test_trainer_saturation_guard_fires(caplog):
    """Trainer._check_train_saturation: loud on a truncated chain, quiet on
    a healthy one (unbound call on a stub; no Trainer construction)."""
    from sessd_tpu.train.trainer import Trainer

    rng = np.random.RandomState(1)
    shape = (41, 64, 64)
    tiny_caps = (64, 64, 64, 64, 64)

    def batch_for(n_pts):
        c = np.stack([rng.randint(0, shape[0], n_pts),
                      rng.randint(0, shape[1] // 2, n_pts) * 2,
                      rng.randint(0, shape[2] // 2, n_pts) * 2], 1)
        c = np.unique(c, axis=0).astype(np.int32)
        rb = _chain(c, tiny_caps, shape=shape)
        return {"coords": np.zeros((1, tiny_caps[0], 3), np.int32),
                "rulebooks": rb}

    stub = types.SimpleNamespace(
        model=types.SimpleNamespace(stage_capacity=tiny_caps),
        logger=logging.getLogger("sat_test"))

    # healthy: few isolated-but-sparse voxels, no stage fills
    caplog.set_level(logging.WARNING, logger="sat_test")
    Trainer._check_train_saturation(stub, batch_for(8))
    assert stub._sat_batches == 0 and not caplog.records

    # saturated: enough even-aligned voxels that stage-1 dilation fills 64
    Trainer._check_train_saturation(stub, batch_for(60))
    assert stub._sat_batches == 1
    assert any("SATURATION" in r.message for r in caplog.records)


def test_probe_batch_regression():
    """The exact r4 failure shape: 4 samples x ~19k isolated-point voxels
    at per-sample caps (20000, 22000, ...) must be flagged as saturated by
    serve.saturated_stages (stage 1 fills: ~66k candidates vs 88k rows
    leaves samples 2-3 empty)."""
    native = get_native()
    if native is None:
        pytest.skip("no native toolchain")
    from sessd_tpu.serve import saturated_stages

    rng = np.random.RandomState(2)
    b, per = 4, 19000
    shape = (41, 1600, 1408)
    rows = []
    for bi in range(b):
        c = np.stack([np.full(per, bi),
                      rng.randint(0, 41, per),
                      rng.randint(0, 800, per) * 2,
                      rng.randint(0, 704, per) * 2], 1).astype(np.int32)
        rows.append(np.unique(c, axis=0))
    coords = np.concatenate(rows)
    caps = [c * b for c in TRAIN_CAPS]
    pad = caps[0] - coords.shape[0]
    coords = np.concatenate([coords, np.zeros((pad, 4), np.int32)])
    valid = np.ones(caps[0], bool)
    valid[-pad:] = False
    rb = native.build_rulebooks(coords, valid, (b,) + shape, caps, DOWNS)
    assert 1 in saturated_stages(rb, caps)
    # and the truncation really does starve the last sample: rows fill in
    # id order (= batch-major), so sample 3 keeps only the leftover slice
    sent = np.iinfo(np.int32).max
    ids1 = np.asarray(rb["ids"][1], np.int64)
    cell = 21 * 800 * 704
    b_hist = np.bincount(ids1[ids1 != sent] // cell, minlength=b)
    assert b_hist[3] < b_hist[0] // 2, b_hist
