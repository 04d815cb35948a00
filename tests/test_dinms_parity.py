"""DI-NMS exact-semantics parity: JAX rotate_weighted_nms vs the literal host
port of IOU_weighted_rotate_non_max_suppression_cpu (nms_cpu.h:174-383) +
its torch wrapper's centerness damping (box_torch_ops.py:552-621)."""
import numpy as np
import jax.numpy as jnp
import pytest

from sessd_tpu.core.nms import rotate_weighted_nms
from sessd_tpu.core.nms_np import centerness_damp, rotate_weighted_nms_np


def _clustered_boxes(rng, n_clusters=6, max_per=6):
    boxes = []
    for _ in range(n_clusters):
        cx, cy = rng.uniform(5, 65), rng.uniform(-30, 30)
        m = rng.randint(2, max_per + 1)
        for _ in range(m):
            boxes.append([
                cx + rng.normal(0, 0.4), cy + rng.normal(0, 0.4),
                rng.uniform(-1.2, -0.8),
                1.6 + rng.normal(0, 0.05), 3.9 + rng.normal(0, 0.08),
                1.5 + rng.normal(0, 0.03),
                rng.uniform(-0.3, 0.3),
            ])
    return np.asarray(boxes, np.float32)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_dinms_matches_host_port(seed):
    rng = np.random.RandomState(seed)
    b7 = _clustered_boxes(rng)
    n = b7.shape[0]
    b5 = b7[:, [0, 1, 3, 4, 6]]
    scores = rng.uniform(0.3, 1.0, n).astype(np.float32)
    iou_preds = rng.uniform(0.1, 1.0, n).astype(np.float32)
    dirs = rng.randint(0, 2, n).astype(np.int32)
    labels = np.zeros(n, np.int32)
    anchors = b7 + rng.normal(0, 0.2, b7.shape).astype(np.float32)

    damped = centerness_damp(b7, anchors, scores)
    ref = rotate_weighted_nms_np(b7, b5, dirs, labels, damped, iou_preds)

    post = 32
    out_b, out_d, out_l, out_s, valid = rotate_weighted_nms(
        jnp.asarray(b7), jnp.asarray(b5), jnp.asarray(dirs),
        jnp.asarray(labels), jnp.asarray(scores), jnp.asarray(iou_preds),
        jnp.asarray(anchors), pre_max_size=n, post_max_size=post)
    out_b, out_d, out_s, valid = map(np.asarray, (out_b, out_d, out_s, valid))

    m = int(valid.sum())
    assert m == len(ref[4]), (m, len(ref[4]))
    # pick order must match; NaN-free boxes
    np.testing.assert_allclose(out_b[:m], ref[0][:m], rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(out_s[:m], ref[3][:m], rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(out_d[:m], ref[1][:m])
    assert np.isfinite(out_b[:m]).all()


def test_dinms_two_labels_and_padding():
    """Label-aware weighting/cnt + label-agnostic suppression + -inf padding
    rows behave like the host port on the valid subset."""
    rng = np.random.RandomState(7)
    b7 = _clustered_boxes(rng, n_clusters=4)
    n = b7.shape[0]
    b5 = b7[:, [0, 1, 3, 4, 6]]
    scores = rng.uniform(0.3, 1.0, n).astype(np.float32)
    iou_preds = rng.uniform(0.2, 1.0, n).astype(np.float32)
    dirs = rng.randint(0, 2, n).astype(np.int32)
    labels = (rng.rand(n) < 0.5).astype(np.int32)
    anchors = b7 + rng.normal(0, 0.2, b7.shape).astype(np.float32)

    damped = centerness_damp(b7, anchors, scores)
    ref = rotate_weighted_nms_np(b7, b5, dirs, labels, damped, iou_preds)

    pad = 16
    bp = np.concatenate([b7, np.zeros((pad, 7), np.float32)])
    b5p = np.concatenate([b5, np.zeros((pad, 5), np.float32)])
    sp_ = np.concatenate([scores, np.full(pad, -np.inf, np.float32)])
    iop = np.concatenate([iou_preds, np.zeros(pad, np.float32)])
    dp = np.concatenate([dirs, np.zeros(pad, np.int32)])
    lp = np.concatenate([labels, np.zeros(pad, np.int32)])
    ap = np.concatenate([anchors, np.zeros((pad, 7), np.float32)])

    out_b, out_d, out_l, out_s, valid = rotate_weighted_nms(
        jnp.asarray(bp), jnp.asarray(b5p), jnp.asarray(dp), jnp.asarray(lp),
        jnp.asarray(sp_), jnp.asarray(iop), jnp.asarray(ap),
        pre_max_size=n + pad, post_max_size=24)
    out_b, out_l, out_s, valid = map(np.asarray, (out_b, out_l, out_s, valid))
    m = int(valid.sum())
    assert m == len(ref[4])
    np.testing.assert_allclose(out_b[:m], ref[0][:m], rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(out_l[:m], ref[2][:m])
    np.testing.assert_allclose(out_s[:m], ref[3][:m], rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_plain_rotate_nms_matches_host_port(seed):
    """Plain rotated NMS index-exact vs the literal port of
    rotate_non_max_suppression_cpu (nms_cpu.h:72-170)."""
    from sessd_tpu.core.nms import rotate_nms
    from sessd_tpu.core.nms_np import rotate_nms_np

    rng = np.random.RandomState(seed)
    b7 = _clustered_boxes(rng, n_clusters=8, max_per=8)
    n = b7.shape[0]
    b5 = b7[:, [0, 1, 3, 4, 6]]
    scores = rng.uniform(0.05, 1.0, n).astype(np.float32)

    for thresh in (0.01, 0.3):
        ref = rotate_nms_np(b5, scores, thresh, pre_max_size=n,
                            post_max_size=100)
        idx, valid = rotate_nms(jnp.asarray(b5), jnp.asarray(scores),
                                pre_max_size=n, post_max_size=100,
                                iou_threshold=thresh)
        idx, valid = np.asarray(idx), np.asarray(valid)
        m = int(valid.sum())
        assert m == len(ref), (m, len(ref), thresh)
        np.testing.assert_array_equal(idx[:m], ref)


def test_plain_rotate_nms_padding_and_premax():
    """-inf-padded rows never surface; pre_max_size truncates by score."""
    from sessd_tpu.core.nms import rotate_nms
    from sessd_tpu.core.nms_np import rotate_nms_np

    rng = np.random.RandomState(11)
    b7 = _clustered_boxes(rng)
    n = b7.shape[0]
    b5 = np.concatenate([b7[:, [0, 1, 3, 4, 6]],
                         np.zeros((16, 5), np.float32)])
    scores = np.concatenate([rng.uniform(0.1, 1.0, n).astype(np.float32),
                             np.full(16, -np.inf, np.float32)])
    ref = rotate_nms_np(b5[:n], scores[:n], 0.1, pre_max_size=12,
                        post_max_size=8)
    idx, valid = rotate_nms(jnp.asarray(b5), jnp.asarray(scores),
                            pre_max_size=12, post_max_size=8,
                            iou_threshold=0.1)
    idx, valid = np.asarray(idx), np.asarray(valid)
    m = int(valid.sum())
    assert m == len(ref)
    np.testing.assert_array_equal(idx[:m], ref)
