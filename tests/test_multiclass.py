"""Multi-class (Car / Pedestrian / Cyclist) capability smoke tests.

The reference framework's surface includes multi-class SECOND-style
configs: one anchor generator per class with per-class match thresholds
(det3d/core/anchor/target_assigner.py:68-136 loops per generator), a head
with num_anchor_per_loc = 2 * num_class (mg_head_sessd.py:196-230), one-hot
background-as-zeros cls targets (mg_head_sessd.py:735-737) and per-anchor
argmax class labels in predict (mg_head_sessd.py:957-963). These tests pin
that path end to end on a tiny grid: assignment -> loss -> predict -> the
shipped 3-class config building a jittable model.
"""
import numpy as np
import pytest

FM = (1, 16, 22)
SPECS = (
    dict(class_name="Car", sizes=(1.6, 3.9, 1.56),
         anchor_range=(0, -40.0, -1.0, 70.4, 40.0, -1.0),
         matched_threshold=0.6, unmatched_threshold=0.45),
    dict(class_name="Pedestrian", sizes=(0.6, 0.8, 1.73),
         anchor_range=(0, -40.0, -0.6, 70.4, 40.0, -0.6),
         matched_threshold=0.35, unmatched_threshold=0.2),
    dict(class_name="Cyclist", sizes=(0.6, 1.76, 1.73),
         anchor_range=(0, -40.0, -0.6, 70.4, 40.0, -0.6),
         matched_threshold=0.35, unmatched_threshold=0.2),
)


def _pipeline():
    from sessd_tpu.data.pipeline import Pipeline, PipelineConfig

    cfg = PipelineConfig(
        class_names=("Car", "Pedestrian", "Cyclist"),
        enable_similar_type=False,
        feature_map_size=FM,
        anchor_specs=SPECS,
    )
    return Pipeline(cfg, mode="val")


def test_multiclass_anchor_layout():
    """Anchors stack per class on the size axis: [D, H, W, C, R, 7] so the
    flattened per-cell order is (class-major, rotation-minor) — the head's
    na = 2 * num_class channel layout."""
    p = _pipeline()
    assert p._anchor_grid_shape == FM + (3, 2)
    grid = p.anchors.reshape(FM + (3, 2, 7))
    # class slices carry each class's sizes (w, l, h at dims 3:6)
    for c, spec in enumerate(SPECS):
        np.testing.assert_allclose(grid[0, 0, 0, c, 0, 3:6], spec["sizes"])
    # rotation minor within a cell
    np.testing.assert_allclose(grid[0, 0, 0, 0, 1, 6], np.pi / 2, atol=1e-4)
    # per-class z centers differ (Car -1.0, Ped/Cyc -0.6)
    assert grid[0, 0, 0, 0, 0, 2] == pytest.approx(-1.0)
    assert grid[0, 0, 0, 1, 0, 2] == pytest.approx(-0.6)


def test_multiclass_target_assignment():
    """Each class's gts match only that class's anchor slice, labels carry
    class index + 1, and reg targets appear only at positives."""
    p = _pipeline()
    # boxes sit exactly on anchor centers (x stride 3.2 from 1.6; y stride
    # 5.0 from -38.4 — the reference's x-stride y-offset quirk,
    # box_np_ops.py:801-804): tiny ped/cyc boxes otherwise have zero IoU
    # with every anchor of this coarse test lattice
    gt_boxes = np.array([
        [30.0, 5.0, -1.0, 1.6, 3.9, 1.56, 0.0],      # Car (big: overlaps)
        [17.6, -3.4, -0.6, 0.6, 0.8, 1.73, 0.0],     # Pedestrian
        [33.6, 21.6, -0.6, 0.6, 1.76, 1.73, 1.57],   # Cyclist
    ], np.float64)
    gt_names = np.array(["Car", "Pedestrian", "Cyclist"])
    out = p._targets("", gt_boxes, gt_names)
    labels = out["labels"].reshape(FM + (3, 2))
    regs = out["reg_targets"].reshape(FM + (3, 2, 7))
    for c in range(3):
        sl = labels[..., c, :]
        pos = sl > 0
        assert pos.sum() >= 1, f"class {c} got no positive anchors"
        # positives in slice c carry label c+1 only
        assert set(np.unique(sl[pos])) == {c + 1}
        # reg targets nonzero exactly where assigned
        assert np.abs(regs[..., c, :, :][pos]).sum() > 0
    # a Car gt must not label Pedestrian/Cyclist slices at the car location
    # (coarse check: each class's positive count is small and local)
    assert (labels > 0).sum() <= 3 * 8


def test_multiclass_detection_loss():
    """One-hot background-as-zeros cls targets over 3 classes; loss is
    finite and the cls term decomposes to the single-class formula when the
    positive's class channel is used."""
    import jax.numpy as jnp

    from sessd_tpu.train.losses import LossConfig, detection_loss

    rng = np.random.RandomState(0)
    b, a, c = 2, 64, 3
    labels = np.zeros((b, a), np.int32)
    labels[0, 3] = 1
    labels[0, 10] = 2
    labels[1, 7] = 3
    labels[1, 20] = -1  # don't-care
    anchors = np.tile(
        np.array([10.0, 0.0, -1.0, 1.6, 3.9, 1.56, 0.0], np.float32),
        (b, a, 1))
    batch = {
        "anchors": jnp.asarray(anchors),
        "labels": jnp.asarray(labels),
        "reg_targets": jnp.asarray(
            rng.randn(b, a, 7).astype(np.float32) * 0.1),
    }
    preds = {
        "box_preds": jnp.asarray(rng.randn(b, a, 7).astype(np.float32) * 0.1),
        "cls_preds": jnp.asarray(rng.randn(b, a, c).astype(np.float32)),
        "dir_cls_preds": jnp.asarray(rng.randn(b, a, 2).astype(np.float32)),
        "iou_preds": jnp.asarray(rng.randn(b, a, 1).astype(np.float32)),
    }
    total, metrics = detection_loss(
        preds, batch, LossConfig(max_positive_anchors=16))
    assert np.isfinite(float(total))
    assert float(metrics["num_pos"]) == pytest.approx(3.0 / b)
    # one-hot targets: exactly one hot channel per positive, none elsewhere
    import jax

    tgt = jax.nn.one_hot(jnp.asarray(labels * (labels >= 0)), c + 1)[..., 1:]
    assert float(jnp.sum(tgt)) == 3.0


def test_multiclass_predict_labels():
    """predict_single takes the per-anchor argmax class; label_preds carry
    it for valid detections (class-agnostic NMS as in the reference)."""
    import jax.numpy as jnp

    from sessd_tpu.core.anchors import create_anchors_3d_range
    from sessd_tpu.models.predict import PredictConfig, predict_single

    anchors = jnp.asarray(
        create_anchors_3d_range([1, 8, 11], [0, -40.0, -1.0, 70.4, 40.0, -1.0])
        .reshape(-1, 7))
    a = anchors.shape[0]
    cls = np.full((a, 3), -10.0, np.float32)
    cls[5, 0] = 4.0    # a Car
    cls[60, 2] = 4.0   # a Cyclist far away in the grid
    preds = {
        "box_preds": jnp.zeros((a, 7), jnp.float32),
        "cls_preds": jnp.asarray(cls),
        "dir_cls_preds": jnp.zeros((a, 2), jnp.float32),
        "iou_preds": jnp.zeros((a, 1), jnp.float32),
    }
    out = predict_single(preds, anchors, None,
                         PredictConfig(nms_pre_max_size=64,
                                       nms_post_max_size=16))
    v = np.asarray(out["valid"])
    lab = np.asarray(out["label_preds"])[v]
    assert v.sum() == 2
    assert set(lab.tolist()) == {0, 2}


def test_3class_config_builds_and_jits(tmp_path):
    """The shipped 3-class config parses, builds pipeline + detector, and
    the forward jits on a tiny grid with cls_preds [B, A, 3]."""
    import pathlib

    import jax
    import jax.numpy as jnp

    from sessd_tpu.builder import (build_detector, build_pipeline_config,
                                   build_voxelizer)
    from sessd_tpu.config import Config

    base = pathlib.Path(__file__).resolve().parents[1] / "sessd_tpu/configs"
    cfg = Config.fromfile(str(base / "se_ssd_kitti_3class.py"))
    pcfg_full = build_pipeline_config(cfg)
    assert pcfg_full.anchor_specs is not None
    assert [s["class_name"] for s in pcfg_full.anchor_specs] == [
        "Car", "Pedestrian", "Cyclist"]
    assert pcfg_full.anchor_specs[1]["matched_threshold"] == pytest.approx(0.35)

    # shrink to a tiny grid for CPU jit (execution plan only; the param
    # tree is grid-independent, see trainer tiny-grid init). 32x32 BEV at
    # ds_factor 8 -> 4x4 feature map.
    cfg.voxel_generator["range"] = [0, -6.4, -3.0, 12.8, 6.4, 1.0]
    cfg.voxel_generator["voxel_size"] = [0.4, 0.4, 0.1]
    cfg.voxel_generator["max_voxel_num"] = 256
    model = build_detector(cfg)
    assert model.tasks[0]["num_class"] == 3

    vox = build_voxelizer(cfg.voxel_generator)
    d, h, w = vox.sparse_shape
    fh, fw = h // 8, w // 8
    n = 64
    rng = np.random.RandomState(0)
    coords = np.stack(
        [np.zeros(n), rng.randint(0, d, n),
         rng.randint(0, h, n), rng.randint(0, w, n)], 1).astype(np.int32)
    args = (jnp.asarray(rng.randn(n, 5, 4).astype(np.float32) * 0.1),
            jnp.asarray(coords), jnp.full((n,), 3, jnp.int32),
            jnp.ones((n,), bool), 1)
    params = model.init(jax.random.PRNGKey(0), *args, train=False)
    preds = jax.jit(model.apply, static_argnums=(5, 6))(
        params, *args, False)[0]
    na = 2 * 3
    assert preds["cls_preds"].shape == (1, fh * fw * na, 3)
    assert preds["box_preds"].shape == (1, fh * fw * na, 7)
    assert preds["iou_preds"].shape == (1, fh * fw * na, 1)
