"""Guard: the default Pallas windows must cover realistic TRAINING chains.

Found in r3: the unaugmented teacher scenes of the full-scale training batch
(utils.synth_scene.make_scene, batched x4 at the training stage capacities)
reach stage-1 source spans past the old window_large of 2048 — silently
tripping stage-1 convs to the whole-conv gather fallback (~7x) on every
step, with no runtime signal. The serving A/Bs had measured "zero
fallbacks" only because their scenes (seeds 0-3) happened to stay under
2048. (r5: the ray-caster box-convention fix changed scene geometry, so
the sharpness seeds were re-scanned — seeds 116-119 trip the old config
via down1 span 2085 > 2048; the r3 seeds 100-103 peak at 2040 now.)

These tests pin (a) that the shipped SpMiddleFHD window defaults clear those
chains, (b) that the telemetry is sharp enough to have caught the original
bug (the old windows DO trip it), and (c) that Trainer's one-time train-chain
telemetry logs/warns accordingly.
"""
import logging
from types import SimpleNamespace

import numpy as np
import pytest

from sessd_tpu.utils.native import get_native

pytestmark = pytest.mark.skipif(get_native() is None,
                                reason="native toolchain unavailable")

SPARSE_SHAPE = (41, 1600, 1408)
OLD_WINDOWS = dict(subm_windows=(896, 2048, 1280, 768),
                   down_windows=(1024, 2048, 1792, 768))


@pytest.fixture(scope="module")
def raw_chain_b4():
    """Batched x4 rulebook chain over the raw (teacher) ray-cast scenes."""
    from sessd_tpu.data.rulebooks import build_batch_rulebooks
    from sessd_tpu.models import VoxelNet
    from sessd_tpu.ops.voxelize import KITTI_VOXELIZER
    from sessd_tpu.utils.synth_scene import make_scene

    native = get_native()
    spec = KITTI_VOXELIZER
    model = VoxelNet(sparse_shape=SPARSE_SHAPE)
    v = model.stage_capacity[0]
    coords = np.zeros((4, v, 3), np.int32)
    mask = np.zeros((4, v), bool)
    for i, seed in enumerate(range(116, 120)):
        pts = np.asarray(make_scene(seed=seed)[0])
        _, czyx, _ = native.voxelize(pts, spec.point_cloud_range,
                                     spec.voxel_size, spec.max_points, v)
        n = czyx.shape[0]
        coords[i, :n] = czyx
        mask[i, :n] = True
    rb = build_batch_rulebooks(coords, mask, SPARSE_SHAPE,
                               model.stage_capacity)
    caps = [c * 4 for c in model.stage_capacity]
    return rb, caps, coords, mask


def test_default_windows_cover_raw_training_chains(raw_chain_b4):
    from sessd_tpu.models import VoxelNet
    from sessd_tpu.serve import fallback_telemetry, window_config_from_detector

    rb, caps, _, _ = raw_chain_b4
    tel = fallback_telemetry(
        rb, caps, window_config_from_detector(
            VoxelNet(sparse_shape=SPARSE_SHAPE)))
    assert tel["fallback_convs"] == 0, tel["convs"]


def test_old_large_windows_did_trip_the_fallback(raw_chain_b4):
    """Sharpness: the pre-r3 windows fall back on these chains — if this
    stops failing-on-old-config, the scenes no longer exercise the regime
    and the guard above is vacuous."""
    from sessd_tpu.models import VoxelNet
    from sessd_tpu.serve import fallback_telemetry, window_config_from_detector

    rb, caps, _, _ = raw_chain_b4
    tel = fallback_telemetry(
        rb, caps, window_config_from_detector(
            VoxelNet(sparse_shape=SPARSE_SHAPE, **OLD_WINDOWS)))
    assert tel["fallback_convs"] >= 1
    tripped = [c for c in tel["convs"].values() if c["fallback"]]
    assert tripped and max(c["max_span"] for c in tripped) > 2048


def test_trainer_train_chain_telemetry(raw_chain_b4, caplog):
    from sessd_tpu.models import VoxelNet
    from sessd_tpu.train.trainer import Trainer

    rb, caps, coords, mask = raw_chain_b4
    batch = {"coords": coords, "voxel_mask": mask,
             "rulebooks": rb, "rulebooks_raw": None}

    logger = logging.getLogger("test_train_tel")
    ns = SimpleNamespace(model=VoxelNet(sparse_shape=SPARSE_SHAPE),
                         logger=logger)
    with caplog.at_level(logging.INFO, logger="test_train_tel"):
        Trainer._log_train_fallbacks(ns, batch)
    assert ns._train_fb_logged
    assert any("train span telemetry [rulebooks]" in r.message
               and "fallback_convs=0" in r.message for r in caplog.records)

    # a model whose windows are too small must WARN
    caplog.clear()
    ns2 = SimpleNamespace(
        model=VoxelNet(sparse_shape=SPARSE_SHAPE, **OLD_WINDOWS),
        logger=logger)
    with caplog.at_level(logging.INFO, logger="test_train_tel"):
        Trainer._log_train_fallbacks(ns2, batch)
    assert any(r.levelno == logging.WARNING
               and "gather fallback" in r.message for r in caplog.records)

    # one-time: a second call is a no-op
    caplog.clear()
    Trainer._log_train_fallbacks(ns, batch)
    assert not caplog.records
