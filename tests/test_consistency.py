"""Semantic tests of the teacher/student consistency loss: the recorded
global transformation must map teacher-frame boxes onto student-frame boxes
exactly, making the loss vanish for a perfectly consistent pair."""
import numpy as np
import pytest


def _random_boxes(rng, n):
    return np.concatenate(
        [rng.uniform(5, 60, (n, 1)), rng.uniform(-20, 20, (n, 1)),
         rng.uniform(-1.5, 0, (n, 1)), rng.uniform(1.5, 1.8, (n, 1)),
         rng.uniform(3.5, 4.5, (n, 1)), rng.uniform(1.4, 1.7, (n, 1)),
         rng.uniform(-np.pi, np.pi, (n, 1))], axis=1).astype(np.float32)


def test_transform_teacher_boxes_matches_host_augmentation(rng):
    import jax.numpy as jnp
    from sessd_tpu.data import augment
    from sessd_tpu.train.losses import _transform_teacher_boxes

    boxes = _random_boxes(rng, 12)
    pts = np.zeros((1, 4), np.float32)

    # apply the host-side student augmentation
    b = boxes.copy()
    b, _, flipped = augment.random_flip(b, pts.copy(), np.random.RandomState(3))
    b, _, rot = augment.global_rotation(b, pts.copy(), np.random.RandomState(4))
    b, _, scale = augment.global_scaling(b, pts.copy(), np.random.RandomState(5))

    got = np.asarray(_transform_teacher_boxes(
        jnp.asarray(boxes), jnp.asarray(flipped), jnp.asarray(np.float32(rot)),
        jnp.asarray(np.float32(scale))))
    # centers and dims must match exactly; angles modulo 2pi
    np.testing.assert_allclose(got[:, :6], b[:, :6], atol=1e-4)
    dr = np.mod(got[:, 6] - b[:, 6] + np.pi, 2 * np.pi) - np.pi
    np.testing.assert_allclose(dr, 0.0, atol=1e-4)


def test_consistency_loss_zero_for_consistent_pair(rng):
    import jax.numpy as jnp
    from sessd_tpu.core import box_jax
    from sessd_tpu.core.anchors import create_anchors_3d_range
    from sessd_tpu.data import augment
    from sessd_tpu.train.losses import ConsistencyConfig, consistency_loss

    anchors = create_anchors_3d_range(
        [1, 10, 10], [0, -40, -1.0, 70.4, 40, -1.0]).reshape(-1, 7).astype(np.float32)
    a = anchors.shape[0]

    # teacher predicts boxes near some anchors; student predicts the SAME
    # boxes after the recorded global transform
    rngs = np.random.RandomState(11)
    tea_boxes = anchors.copy()
    tea_boxes[:, :3] += rngs.uniform(-0.2, 0.2, (a, 3))

    stu_boxes = tea_boxes.copy()
    pts = np.zeros((1, 4), np.float32)
    stu_boxes, _, flipped = augment.random_flip(stu_boxes, pts.copy(),
                                                np.random.RandomState(7))
    stu_boxes, _, rot = augment.global_rotation(stu_boxes, pts.copy(),
                                                np.random.RandomState(8))
    stu_boxes, _, scale = augment.global_scaling(stu_boxes, pts.copy(),
                                                 np.random.RandomState(9))

    import sessd_tpu.core.box_jax as bj

    def enc(boxes):
        return np.asarray(bj.second_box_encode(jnp.asarray(boxes), jnp.asarray(anchors)))

    cls = np.full((1, a, 1), 3.0, np.float32)  # all confident
    dirp = np.zeros((1, a, 2), np.float32)
    iou = np.zeros((1, a, 1), np.float32)
    preds_stu = {"box_preds": jnp.asarray(enc(stu_boxes))[None],
                 "cls_preds": jnp.asarray(cls),
                 "dir_cls_preds": jnp.asarray(dirp), "iou_preds": jnp.asarray(iou)}
    preds_tea = {"box_preds": jnp.asarray(enc(tea_boxes))[None],
                 "cls_preds": jnp.asarray(cls),
                 "dir_cls_preds": jnp.asarray(dirp), "iou_preds": jnp.asarray(iou)}
    trans = dict(flipped=jnp.asarray([flipped]),
                 noise_rotation=jnp.asarray([np.float32(rot)]),
                 noise_scale=jnp.asarray([np.float32(scale)]))
    total, dir_l = consistency_loss(
        preds_stu, preds_tea, jnp.asarray(anchors)[None],
        trans, ConsistencyConfig(top_k=64))
    # box/score/iou terms all ~0: perfectly consistent pair
    assert float(total) < 1e-3, float(total)

    # and a deliberately inconsistent teacher gives a larger loss
    tea2 = tea_boxes.copy()
    tea2[:, 0] += 0.9
    preds_tea2 = dict(preds_tea, box_preds=jnp.asarray(enc(tea2))[None])
    total2, _ = consistency_loss(
        preds_stu, preds_tea2, jnp.asarray(anchors)[None],
        trans, ConsistencyConfig(top_k=64))
    assert float(total2) > float(total) + 1e-3


def test_consistency_grad_finite_with_runaway_dim_logit(rng):
    """Regression (r5 acceptance NaN): background anchors' box regression is
    unconstrained by any loss term, and after a real pretrain a few had dim
    logits ~108 -> exp() inf. The box-space clip bounds the VALUE but its
    zero cotangent times exp's inf residual made the whole gradient NaN on
    the very first warm-started SE-SSD step (finite loss, NaN grads).
    _decode_bounded clamps the logits pre-exp; grads must stay finite and
    the loss value must be unchanged."""
    import jax
    import jax.numpy as jnp
    from sessd_tpu.core.anchors import create_anchors_3d_range
    from sessd_tpu.train.losses import ConsistencyConfig, consistency_loss

    anchors = create_anchors_3d_range(
        [1, 10, 10], [0, -40, -1.0, 70.4, 40, -1.0]).reshape(-1, 7).astype(
            np.float32)
    a = anchors.shape[0]
    rngs = np.random.RandomState(5)
    box = rngs.uniform(-0.1, 0.1, (1, a, 7)).astype(np.float32)
    cls = np.full((1, a, 1), 3.0, np.float32)
    base = {"cls_preds": jnp.asarray(cls),
            "dir_cls_preds": jnp.zeros((1, a, 2), jnp.float32),
            "iou_preds": jnp.zeros((1, a, 1), jnp.float32)}
    trans = dict(flipped=jnp.asarray([False]),
                 noise_rotation=jnp.zeros(1, jnp.float32),
                 noise_scale=jnp.ones(1, jnp.float32))
    cfg = ConsistencyConfig(top_k=64)

    def total(bp_stu):
        ps = dict(base, box_preds=bp_stu)
        pt = dict(base, box_preds=jnp.asarray(box))
        t, _ = consistency_loss(ps, pt, jnp.asarray(anchors)[None], trans, cfg)
        return t

    ref = float(total(jnp.asarray(box)))

    bad = box.copy()
    bad[0, 17, 4] = 108.5  # the observed runaway logit: exp() overflows f32
    val, g = jax.value_and_grad(total)(jnp.asarray(bad))
    assert np.isfinite(np.asarray(g)).all(), "NaN/inf in consistency grad"
    # the runaway anchor decodes to the 30 m clip either way: value unchanged
    np.testing.assert_allclose(float(val), ref, rtol=1e-5)

    # teacher-side runaway must not poison the student grad either
    def total_tea(bp_stu):
        ps = dict(base, box_preds=bp_stu)
        pt = dict(base, box_preds=jnp.asarray(bad))
        t, _ = consistency_loss(ps, pt, jnp.asarray(anchors)[None], trans, cfg)
        return t

    _, g2 = jax.value_and_grad(total_tea)(jnp.asarray(box))
    assert np.isfinite(np.asarray(g2)).all()


def test_detection_loss_grad_finite_with_runaway_dim_logit(rng):
    """Same trap class on the supervised path: a POSITIVE anchor whose pred
    dim logit overflows exp must not NaN the ODIoU/iou-pred gradients."""
    import jax
    import jax.numpy as jnp
    from sessd_tpu.core.anchors import create_anchors_3d_range
    from sessd_tpu.train.losses import LossConfig, detection_loss

    anchors = create_anchors_3d_range(
        [1, 6, 6], [0, -40, -1.0, 70.4, 40, -1.0]).reshape(-1, 7).astype(
            np.float32)
    a = anchors.shape[0]
    labels = np.zeros((1, a), np.int32)
    labels[0, 3] = 1
    reg_t = np.zeros((1, a, 7), np.float32)
    reg_t[0, 3] = [0.1, -0.1, 0.05, 0.02, -0.02, 0.01, 0.1]

    def total(bp):
        preds = {"box_preds": bp,
                 "cls_preds": jnp.zeros((1, a, 1), jnp.float32),
                 "dir_cls_preds": jnp.zeros((1, a, 2), jnp.float32),
                 "iou_preds": jnp.zeros((1, a, 1), jnp.float32)}
        batch = {"anchors": jnp.asarray(anchors)[None],
                 "labels": jnp.asarray(labels),
                 "reg_targets": jnp.asarray(reg_t)}
        t, _ = detection_loss(preds, batch, LossConfig(max_positive_anchors=8))
        return t

    bad = np.zeros((1, a, 7), np.float32)
    bad[0, 3, 5] = 108.5
    _, g = jax.value_and_grad(total)(jnp.asarray(bad))
    assert np.isfinite(np.asarray(g)).all(), "NaN/inf in detection grad"
