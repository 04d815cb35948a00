"""Predict-path unit tests: decode/rectify/NMS/dir-flip/range-mask and the
DI-NMS variant."""
import numpy as np
import pytest


def make_preds(rng, a=70400 // 100):
    import jax.numpy as jnp

    # random logits: mostly below threshold, a few confident anchors
    cls = rng.randn(a, 1).astype(np.float32) - 3.0
    hot = rng.choice(a, 12, replace=False)
    cls[hot] = 3.0
    return {
        "box_preds": jnp.asarray(rng.randn(a, 7).astype(np.float32) * 0.1),
        "cls_preds": jnp.asarray(cls),
        "dir_cls_preds": jnp.asarray(rng.randn(a, 2).astype(np.float32)),
        "iou_preds": jnp.asarray(rng.uniform(-1, 1, (a, 1)).astype(np.float32)),
    }, hot


def test_predict_single_shapes_and_masking(rng):
    import jax.numpy as jnp
    from sessd_tpu.core.anchors import create_anchors_3d_range
    from sessd_tpu.models.predict import PredictConfig, predict_single

    anchors = jnp.asarray(
        create_anchors_3d_range([1, 8, 11], [0, -40.0, -1.0, 70.4, 40.0, -1.0])
        .reshape(-1, 7))
    preds, hot = make_preds(rng, a=anchors.shape[0])
    cfg = PredictConfig(nms_pre_max_size=64, nms_post_max_size=16)
    out = predict_single(preds, anchors, None, cfg)
    assert out["box3d_lidar"].shape == (16, 7)
    v = np.asarray(out["valid"])
    assert 0 < v.sum() <= 16
    # invalid rows zeroed
    assert np.all(np.asarray(out["box3d_lidar"])[~v] == 0)
    # scores rectified: score = sigmoid(cls) * ((iou+1)/2)^4 <= sigmoid(cls)
    assert np.asarray(out["scores"]).max() <= 1.0


def test_predict_score_rectification_formula(rng):
    import jax.numpy as jnp
    from sessd_tpu.core.anchors import create_anchors_3d_range
    from sessd_tpu.models.predict import PredictConfig, predict_single

    anchors = jnp.asarray(
        create_anchors_3d_range([1, 4, 4], [0, -40.0, -1.0, 70.4, 40.0, -1.0])
        .reshape(-1, 7))
    a = anchors.shape[0]
    cls = np.full((a, 1), -10.0, np.float32)
    cls[5] = 2.0
    iou = np.zeros((a, 1), np.float32)
    iou[5] = 0.5  # -> ((0.5+1)/2)^4 = 0.75^4
    preds = {
        "box_preds": jnp.zeros((a, 7), jnp.float32),
        "cls_preds": jnp.asarray(cls),
        "dir_cls_preds": jnp.zeros((a, 2), jnp.float32),
        "iou_preds": jnp.asarray(iou),
    }
    out = predict_single(preds, anchors, None,
                         PredictConfig(nms_pre_max_size=16, nms_post_max_size=4))
    want = 1 / (1 + np.exp(-2.0)) * 0.75 ** 4
    got = float(np.asarray(out["scores"])[0])
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_predict_dir_flip(rng):
    import jax.numpy as jnp
    from sessd_tpu.core.anchors import create_anchors_3d_range
    from sessd_tpu.models.predict import PredictConfig, predict_single

    anchors = jnp.asarray(
        create_anchors_3d_range([1, 4, 4], [0, -40.0, -1.0, 70.4, 40.0, -1.0])
        .reshape(-1, 7))
    a = anchors.shape[0]
    cls = np.full((a, 1), -10.0, np.float32)
    cls[0] = 3.0  # anchor 0 has rotation 0 -> decoded ry > 0 with small offset
    box = np.zeros((a, 7), np.float32)
    box[0, 6] = 0.3  # ry offset -> decoded ry = 0.3 > 0
    dirp = np.zeros((a, 2), np.float32)
    dirp[0] = [5.0, 0.0]  # dir label 0, but ry > 0 -> opp -> flip by pi
    preds = {
        "box_preds": jnp.asarray(box),
        "cls_preds": jnp.asarray(cls),
        "dir_cls_preds": jnp.asarray(dirp),
        "iou_preds": jnp.ones((a, 1), jnp.float32),
    }
    out = predict_single(preds, anchors, None,
                         PredictConfig(nms_pre_max_size=16, nms_post_max_size=4))
    ry = float(np.asarray(out["box3d_lidar"])[0, 6])
    np.testing.assert_allclose(ry, 0.3 + np.pi, atol=1e-5)


def test_predict_dinms_mode(rng):
    import jax.numpy as jnp
    from sessd_tpu.core.anchors import create_anchors_3d_range
    from sessd_tpu.models.predict import PredictConfig, predict_single

    anchors = jnp.asarray(
        create_anchors_3d_range([1, 8, 11], [0, -40.0, -1.0, 70.4, 40.0, -1.0])
        .reshape(-1, 7))
    from sessd_tpu.core import box_jax

    a = anchors.shape[0]
    # a tight cluster: 8 confident anchors all decoding to (nearly) the same
    # box, with high iou_preds — exact DI-NMS semantics only keep leaders
    # with cnt = sum(iou * iou_pred) > 2.6, so scattered singletons are
    # (correctly) dropped
    cls = np.full((a, 1), -3.0, np.float32)
    hot = np.arange(16, 24)
    cls[hot] = 3.0
    target = jnp.asarray([[20.0, 5.0, -1.0, 1.6, 3.9, 1.5, 0.3]],
                         jnp.float32)
    enc = box_jax.second_box_encode(
        jnp.tile(target, (len(hot), 1)), anchors[hot])
    box_preds = rng.randn(a, 7).astype(np.float32) * 0.02
    box_preds[hot] = np.asarray(enc) + rng.randn(len(hot), 7) * 0.01
    preds = {
        "box_preds": jnp.asarray(box_preds),
        "cls_preds": jnp.asarray(cls),
        "dir_cls_preds": jnp.asarray(rng.randn(a, 2).astype(np.float32)),
        "iou_preds": jnp.asarray(np.full((a, 1), 0.9, np.float32)),
    }
    cfg = PredictConfig(nms_pre_max_size=64, nms_post_max_size=16,
                        nms_type="rotate_weighted_nms")
    out = predict_single(preds, anchors, None, cfg)
    assert out["box3d_lidar"].shape == (16, 7)
    v = np.asarray(out["valid"])
    assert v.any()
    assert np.isfinite(np.asarray(out["box3d_lidar"])[v]).all()


def test_rotate_weighted_nms_runs(rng):
    import jax.numpy as jnp
    from sessd_tpu.core.nms import rotate_weighted_nms

    # two tight clusters (high mutual IoU + high iou_preds -> cnt > 2.6) and
    # a few scattered boxes that exact DI-NMS must (correctly) drop
    centers = np.array([[10.0, 0.0], [10.0, 0.0], [10.2, 0.1], [9.9, -0.1],
                        [30.0, 8.0], [30.1, 8.1], [29.9, 7.9], [30.0, 8.2],
                        [5.0, -15.0], [50.0, 20.0]], np.float32)
    n = centers.shape[0]
    boxes7 = np.concatenate(
        [centers, np.full((n, 1), -1.0, np.float32),
         np.full((n, 2), 1.6, np.float32), np.full((n, 1), 1.5, np.float32),
         rng.uniform(-0.1, 0.1, (n, 1)).astype(np.float32)], 1)
    boxes5 = boxes7[:, [0, 1, 3, 4, 6]]
    scores = rng.uniform(0.5, 1.0, n).astype(np.float32)
    out = rotate_weighted_nms(
        jnp.asarray(boxes7), jnp.asarray(boxes5),
        jnp.asarray(rng.randint(0, 2, n)), jnp.asarray(np.zeros(n, np.int64)),
        jnp.asarray(scores), jnp.asarray(np.full(n, 0.95, np.float32)),
        jnp.asarray(boxes7), pre_max_size=n, post_max_size=8,
        iou_threshold=0.1, row_chunk=None)
    merged, dirs, labels, out_scores, valid = map(np.asarray, out)
    assert merged.shape == (8, 7)
    assert valid.any()
    assert np.isfinite(merged[valid]).all()


def test_two_level_nms_exact_both_regimes(rng):
    """predict_batch's small-capacity NMS path must be bit-identical to the
    full path when counts fit, and must FALL BACK (cond) when any sample in
    the batch exceeds the small capacity."""
    import jax.numpy as jnp
    from sessd_tpu.core.anchors import create_anchors_3d_range
    from sessd_tpu.models.predict import PredictConfig, predict_batch

    anchors = jnp.asarray(
        create_anchors_3d_range([1, 8, 11], [0, -40.0, -1.0, 70.4, 40.0, -1.0])
        .reshape(-1, 7))
    a = anchors.shape[0]

    def batchify(preds_list):
        return {k: jnp.stack([p[k] for p in preds_list])
                for k in preds_list[0]}

    # regime 1: few above-threshold boxes -> small path engages
    preds = batchify([make_preds(rng, a=a)[0] for _ in range(2)])
    full = PredictConfig(nms_pre_max_size=64, nms_post_max_size=16,
                         nms_pre_small=0)
    two = full._replace(nms_pre_small=32)
    o_full = predict_batch(preds, anchors, None, full)
    o_two = predict_batch(preds, anchors, None, two)
    assert np.asarray(o_full["valid"]).sum() > 0
    np.testing.assert_array_equal(np.asarray(o_full["valid"]),
                                  np.asarray(o_two["valid"]))
    for k in ("box3d_lidar", "scores"):
        # same selections; values may differ at float-fusion level (the two
        # branches are different XLA programs)
        np.testing.assert_allclose(np.asarray(o_full[k]),
                                   np.asarray(o_two[k]), rtol=1e-6, atol=1e-5)

    # regime 2: one sample floods past the small capacity -> exact fallback
    p0, _ = make_preds(rng, a=a)
    hotcls = np.asarray(p0["cls_preds"]).copy()
    hotcls[: 40] = 3.0  # 40 confident anchors > small=32
    p0 = dict(p0, cls_preds=jnp.asarray(hotcls))
    preds = batchify([p0, make_preds(rng, a=a)[0]])
    o_full = predict_batch(preds, anchors, None, full)
    o_two = predict_batch(preds, anchors, None, two)
    np.testing.assert_array_equal(np.asarray(o_full["valid"]),
                                  np.asarray(o_two["valid"]))
    for k in ("box3d_lidar", "scores"):
        np.testing.assert_allclose(np.asarray(o_full[k]),
                                   np.asarray(o_two[k]), rtol=1e-6, atol=1e-5)
