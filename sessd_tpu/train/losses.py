"""SE-SSD losses in JAX — focal cls, ODIoU reg, direction, IoU-prediction,
and the teacher/student consistency loss, all fixed-shape.

Ports the semantics of:
- losses.py:147-202 (WeightedSmoothL1, sigma=3, codewise),
- losses.py:365-420 (SigmoidFocalLoss, alpha=.25, gamma=2),
- losses.py:498-531 (WeightedSoftmaxClassificationLoss),
- mg_head_sessd.py:525-705 (prepare_loss_weights / nn_distance /
  consistency_loss) and :706-808 (loss composition).

Where the reference boolean-masks dynamic numbers of positives/detections,
we gather a fixed top-K with validity masks — identical numerics, static
shapes.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import box_jax
from ..core.odiou import odiou_3d
from ..core.rotated_iou import iou_3d, iou_bev_matrix


# ---------------------------------------------------------------------------
# elementary losses
# ---------------------------------------------------------------------------

def smooth_l1(diff: jnp.ndarray, sigma: float = 3.0) -> jnp.ndarray:
    """Elementwise smooth-L1 with the sigma^2 knee (losses.py:184-191)."""
    s2 = sigma ** 2
    ad = jnp.abs(diff)
    return jnp.where(ad <= 1.0 / s2, 0.5 * s2 * ad * ad, ad - 0.5 / s2)


def weighted_smooth_l1(pred, target, weights=None, sigma: float = 3.0):
    """[..., C] codewise loss, scaled by [...]-shaped weights."""
    loss = smooth_l1(pred - target, sigma)
    if weights is not None:
        loss = loss * weights[..., None]
    return loss


def sigmoid_focal_loss(logits, onehot_targets, weights=None,
                       alpha: float = 0.25, gamma: float = 2.0):
    """[..., C] focal loss (losses.py:387-419)."""
    per_entry = jnp.maximum(logits, 0) - logits * onehot_targets + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))
    p = jax.nn.sigmoid(logits)
    p_t = onehot_targets * p + (1 - onehot_targets) * (1 - p)
    mod = jnp.power(1.0 - p_t, gamma)
    aw = onehot_targets * alpha + (1 - onehot_targets) * (1 - alpha)
    loss = mod * aw * per_entry
    if weights is not None:
        loss = loss * weights[..., None]
    return loss


def softmax_ce_loss(logits, onehot_targets, weights=None):
    """[...]-shaped cross entropy (losses.py:515-531)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    ce = -jnp.sum(onehot_targets * logp, axis=-1)
    if weights is not None:
        ce = ce * weights
    return ce


# ---------------------------------------------------------------------------
# target plumbing
# ---------------------------------------------------------------------------

def prepare_loss_weights(labels: jnp.ndarray):
    """labels [B, A] in {-1, 0, 1..} -> (cls_w, reg_w, cared), all [B, A].

    NormByNumPositives (mg_head_sessd.py:525-571): both weights divided by
    the per-sample positive count.
    """
    cared = labels >= 0
    positives = labels > 0
    negatives = labels == 0
    cls_weights = negatives.astype(jnp.float32) + positives.astype(jnp.float32)
    reg_weights = positives.astype(jnp.float32)
    pos_norm = jnp.maximum(jnp.sum(reg_weights, axis=1, keepdims=True), 1.0)
    return cls_weights / pos_norm, reg_weights / pos_norm, cared


def get_direction_target(anchors, reg_targets, dir_offset: float = 0.0):
    """[B, A, 7] -> one-hot [B, A, 2] (mg_head_sessd.py:63-77)."""
    rot_gt = reg_targets[..., -1] + anchors[..., -1]
    d = ((rot_gt - dir_offset) > 0).astype(jnp.int32)
    return jax.nn.one_hot(d, 2, dtype=anchors.dtype)


def gather_positives(labels: jnp.ndarray, k: int):
    """Pick up to K positive anchor indices per sample (static shape).

    Returns (idx [B, K], mask [B, K]).
    """
    score = (labels > 0).astype(jnp.float32)
    vals, idx = jax.lax.top_k(score, k)
    return idx, vals > 0


# ---------------------------------------------------------------------------
# consistency loss (teacher/student)
# ---------------------------------------------------------------------------

class ConsistencyConfig(NamedTuple):
    score_thresh: float = 0.3
    iou_match_thresh: float = 0.7
    top_k: int = 256
    post_center_range: tuple = (0.0, -40.0, -5.0, 70.4, 40.0, 5.0)


def _decode_bounded(preds, anchors):
    """``second_box_decode`` with the dim logits clamped to ±10 BEFORE the
    exp. The box-space clips downstream (±200 m / 30 m) bound the VALUE,
    but on their own they leave a 0·inf VJP: for a logit past ~88.7,
    exp() is inf, the clip passes a zero cotangent, and zero × inf = NaN
    in the gradient while the loss stays finite. Observed at the SE-SSD
    warm start (r5 calibration, ACCEPTANCE.json): the consistency path
    decodes ALL anchors, and a handful of background anchors — whose box
    regression no loss term ever constrains — had drifted to dim logits
    of ~108 after the 2048-step CIA pretrain, so the very first SSL step
    produced finite losses and NaN grads, destroying the Adam state.
    exp(±10) is finite and far outside [1e-2, 30], so the forward is
    bit-identical to the unclamped decode wherever the box-space clip
    binds — this changes gradients only where they were NaN.
    """
    preds = jnp.concatenate([
        preds[..., :3], jnp.clip(preds[..., 3:6], -10.0, 10.0),
        preds[..., 6:]], axis=-1)
    return box_jax.second_box_decode(preds, anchors)


def _transform_teacher_boxes(boxes, flipped, noise_rotation, noise_scale):
    """Replay the student's recorded global augmentation on teacher boxes
    (mg_head_sessd.py:666-674): flip y / mirror heading, rotate about z,
    scale everything but the heading."""
    y = jnp.where(flipped, -boxes[..., 1], boxes[..., 1])
    r = jnp.where(flipped, -boxes[..., 6] + jnp.pi, boxes[..., 6])
    b = jnp.concatenate(
        [boxes[..., 0:1], y[..., None], boxes[..., 2:6], r[..., None]], axis=-1)
    xyz = box_jax.rotation_points_z(b[..., :3], noise_rotation)
    r2 = b[..., 6] + noise_rotation
    b = jnp.concatenate([xyz, b[..., 3:6], r2[..., None]], axis=-1)
    return jnp.concatenate([b[..., :6] * noise_scale, b[..., 6:7]], axis=-1)


def consistency_loss_single(
    boxes_stu, cls_stu, dir_stu, iou_stu,
    boxes_tea, cls_tea, dir_tea, iou_tea,
    flipped, noise_rotation, noise_scale,
    cfg: ConsistencyConfig,
):
    """One sample. All preds are [A, .]; boxes already decoded.

    Mirrors mg_head_sessd.py:618-703 with fixed top-K subsets instead of
    boolean masking. Returns (box_l, cls_l, iou_l, dir_l) scalars.
    """
    pcr = jnp.asarray(cfg.post_center_range)

    def topk_valid(boxes, cls):
        score = jax.nn.sigmoid(cls[..., 0])
        in_range = jnp.all(boxes[:, :3] >= pcr[:3], axis=-1) & jnp.all(
            boxes[:, :3] <= pcr[3:], axis=-1)
        ok = (score >= cfg.score_thresh) & in_range
        vals, idx = jax.lax.top_k(jnp.where(ok, score, -1.0), cfg.top_k)
        return idx, vals > 0

    idx_s, m_s = topk_valid(boxes_stu, cls_stu)
    idx_t, m_t = topk_valid(boxes_tea, cls_tea)

    bs = boxes_stu[idx_s]
    bt = _transform_teacher_boxes(boxes_tea[idx_t], flipped, noise_rotation, noise_scale)

    iou = iou_bev_matrix(bs, bt)  # [K, K]
    iou = jnp.where(m_s[:, None] & m_t[None, :], iou, 0.0)
    best_t = jnp.max(iou, axis=1)
    best_s = jnp.max(iou, axis=0)
    mask1 = (best_t > cfg.iou_match_thresh) & m_s  # student boxes with a match
    mask2 = (best_s > cfg.iou_match_thresh) & m_t  # teacher boxes with a match

    # restrict to matched columns, then argmax per student row (nn_distance)
    iou_r = jnp.where(mask1[:, None] & mask2[None, :], iou, -1.0)
    match_t = jnp.argmax(iou_r, axis=1)  # per student: teacher slot

    n_pairs = jnp.sum(mask1)
    has_pairs = (n_pairs > 0) & (jnp.sum(mask2) > 0)
    denom = jnp.maximum(n_pairs, 1).astype(jnp.float32)

    # box term: smooth-L1 on sin-difference encoding, /7, mean over pairs
    tgt = bt[match_t]
    e1, e2 = box_jax.add_sin_difference(bs, tgt)
    box_l = jnp.sum(smooth_l1(e1 - e2), axis=-1) / 7.0
    box_l = jnp.sum(jnp.where(mask1, box_l, 0.0)) / denom

    # score term
    ss = jax.nn.sigmoid(cls_stu[idx_s][:, 0])
    st = jax.nn.sigmoid(cls_tea[idx_t][match_t][:, 0])
    cls_l = jnp.sum(jnp.where(mask1, smooth_l1(ss - st), 0.0)) / denom

    # iou-prediction term (both mapped to [0, 1])
    is_ = (iou_stu[idx_s][:, 0] + 1.0) * 0.5
    it_ = (iou_tea[idx_t][match_t][:, 0] + 1.0) * 0.5
    iou_l = jnp.sum(jnp.where(mask1, smooth_l1(is_ - it_), 0.0)) / denom

    # dir term: MSE between softmaxed distributions (logged, not summed —
    # mg_head_sessd.py:704 excludes it from the total)
    ds = jax.nn.softmax(dir_stu[idx_s], axis=-1)
    dt = jax.nn.softmax(dir_tea[idx_t][match_t], axis=-1)
    dir_l = jnp.sum(jnp.where(mask1[:, None], (ds - dt) ** 2, 0.0)) / (2.0 * denom)

    zero = jnp.float32(0.0)
    return (
        jnp.where(has_pairs, box_l, zero),
        jnp.where(has_pairs, cls_l, zero),
        jnp.where(has_pairs, iou_l, zero),
        jnp.where(has_pairs, dir_l, zero),
    )


def consistency_loss(preds_stu, preds_tea, anchors, transformation,
                     cfg: ConsistencyConfig = ConsistencyConfig()):
    """Batched consistency loss (mg_head_sessd.py:618-703).

    preds_*: task-0 dicts with [B, A, .] arrays; anchors [B, A, 7];
    transformation: dict of [B]-shaped flipped/noise_rotation/noise_scale.
    Returns (consistency_total, dir_term) scalars; total =
    (box + cls + iou) / batch as in mg_head_sessd.py:704.
    """
    boxes_stu = _decode_bounded(preds_stu["box_preds"], anchors)
    boxes_tea = _decode_bounded(preds_tea["box_preds"], anchors)

    # bound the decoded geometry for the loss: second_box_decode applies
    # exp() to the dim logits, so a random-init net can emit km-sized
    # boxes whose smooth-L1/IoU terms reach 1e9 and blow the first
    # optimizer steps (observed r4, full scale). No realistic box is
    # affected (KITTI dims < 30 m, centers within +-200 m); matches the
    # spirit of the reference's score/range gating (mg_head_sessd.py:635).
    def bound(b):
        return jnp.concatenate([
            jnp.clip(b[..., :3], -200.0, 200.0),
            jnp.clip(b[..., 3:6], 1e-2, 30.0), b[..., 6:]], axis=-1)

    boxes_stu = bound(boxes_stu)
    boxes_tea = bound(boxes_tea)

    f = jax.vmap(consistency_loss_single, in_axes=(0,) * 11 + (None,))
    box_l, cls_l, iou_l, dir_l = f(
        boxes_stu, preds_stu["cls_preds"], preds_stu["dir_cls_preds"], preds_stu["iou_preds"],
        boxes_tea, preds_tea["cls_preds"], preds_tea["dir_cls_preds"], preds_tea["iou_preds"],
        transformation["flipped"], transformation["noise_rotation"],
        transformation["noise_scale"], cfg,
    )
    b = boxes_stu.shape[0]
    total = (jnp.sum(box_l) + jnp.sum(cls_l) + jnp.sum(iou_l)) / b
    return total, jnp.sum(dir_l) / b


# ---------------------------------------------------------------------------
# full head loss
# ---------------------------------------------------------------------------

class LossConfig(NamedTuple):
    cls_loss_weight: float = 1.0
    loc_loss_weight: float = 2.0
    dir_loss_weight: float = 0.2
    focal_alpha: float = 0.25
    focal_gamma: float = 2.0
    smooth_l1_sigma: float = 3.0
    direction_offset: float = 0.0
    max_positive_anchors: int = 256
    # which regression term the TOTAL sums: "odiou" (SE-SSD,
    # mg_head_sessd.py:781) or "smooth_l1" (the sin-encoded SmoothL1 of the
    # plain head, mg_head.py:616-627 — the loss CIA-SSD pretrains with).
    # ODIoU is non-convex in yaw (zero-gradient local optimum at 90 deg for
    # near-square overlaps) and the reference NEVER optimizes it from
    # random init: its SE-SSD always warm-starts from a SmoothL1-trained
    # CIA-SSD checkpoint. Training stage A with ODIoU instead plateaus at
    # BEV IoU ~0.56 with a 90-deg yaw-error subpopulation (r5 calibration,
    # scripts/analyze_accept.py).
    reg_loss: str = "odiou"
    consistency: ConsistencyConfig = ConsistencyConfig()


def detection_loss(preds, batch, cfg: LossConfig = LossConfig(),
                   labels_key="labels", reg_targets_key="reg_targets",
                   include_odiou: bool = True):
    """Supervised SE-SSD loss for one task head (mg_head_sessd.py:706-808).

    total = focal_cls + ODIoU_reg + dir + iou_pred. The plain SmoothL1
    loc loss is computed for metrics parity but (like the reference, which
    sums ``ious_loss`` instead of ``loc_loss_reduced``) is not in the total.

    preds: dict of [B, A, .]; batch: anchors [B, A, 7], labels [B, A],
    reg_targets [B, A, 7].
    Returns (total, metrics dict).
    """
    anchors = batch["anchors"]
    labels = batch[labels_key]
    reg_targets = batch[reg_targets_key]
    b = labels.shape[0]

    cls_w, reg_w, cared = prepare_loss_weights(labels)

    box_preds = preds["box_preds"]
    cls_preds = preds["cls_preds"]

    # background-as-zeros class targets: labels in {0, 1..C} one-hot over
    # C+1 with the background column dropped (mg_head_sessd.py:735-737).
    # For the single-class Car head this is exactly the old 0/1 channel.
    num_class = cls_preds.shape[-1]
    if num_class == 1:
        cls_targets = (labels * cared).astype(jnp.float32)[..., None]
    else:
        cls_targets = jax.nn.one_hot(
            labels * cared, num_class + 1, dtype=jnp.float32)[..., 1:]

    # classification (sigmoid focal, background-as-zeros single class)
    cls_loss = sigmoid_focal_loss(cls_preds, cls_targets, cls_w,
                                  cfg.focal_alpha, cfg.focal_gamma)
    cls_loss_reduced = cfg.cls_loss_weight * jnp.sum(cls_loss) / b

    # localization metric (sin-difference smooth-L1)
    ebp, ert = box_jax.add_sin_difference(box_preds, reg_targets)
    loc_loss = weighted_smooth_l1(ebp, ert, reg_w, cfg.smooth_l1_sigma)
    loc_loss_reduced = cfg.loc_loss_weight * jnp.sum(loc_loss) / b

    # direction classifier
    dir_targets = get_direction_target(anchors, reg_targets, cfg.direction_offset)
    dw = (labels > 0).astype(jnp.float32)
    dw = dw / jnp.maximum(jnp.sum(dw, axis=-1, keepdims=True), 1.0)
    dir_loss = softmax_ce_loss(preds["dir_cls_preds"], dir_targets, dw)
    dir_loss_reduced = cfg.dir_loss_weight * jnp.sum(dir_loss) / b

    # positives gathered to fixed K for the rotated-geometry terms
    pos_idx, pos_mask = gather_positives(labels, cfg.max_positive_anchors)
    take = lambda x: jnp.take_along_axis(x, pos_idx[..., None], axis=1)
    pos_anchors = take(anchors)
    pos_w = jnp.take_along_axis(reg_w, pos_idx, axis=1) * pos_mask
    qboxes = _decode_bounded(take(box_preds), pos_anchors)
    gboxes = box_jax.second_box_decode(take(reg_targets), pos_anchors)
    # bound the PREDICTED geometry only (targets decode to real boxes):
    # exp() dim decode of a random-init net can emit km-sized boxes that
    # blow the IoU/ODIoU terms (see consistency_loss); inactive for any
    # realistic box, and grads pass through in the interior
    qboxes = jnp.concatenate([
        jnp.clip(qboxes[..., :3], -200.0, 200.0),
        jnp.clip(qboxes[..., 3:6], 1e-2, 30.0), qboxes[..., 6:]], axis=-1)

    # IoU prediction head: targets 2*iou3d-1, smooth-L1 (.759-768)
    # clip to [0, 1]: degenerate early-training decodes can blow the
    # clipper's inter/union ratio past 1 (see odiou_3d) — exact otherwise
    iou_t = jnp.clip(jax.lax.stop_gradient(
        iou_3d(jax.lax.stop_gradient(qboxes), gboxes)), 0.0, 1.0)
    iou_targets = (2.0 * iou_t - 1.0)[..., None]
    iou_p = take(preds["iou_preds"])
    iou_pred_loss = jnp.sum(weighted_smooth_l1(iou_p, iou_targets, pos_w)) / b

    # ODIoU regression on positives (.771-777 -> odious.py:845-899)
    if include_odiou:
        od = odiou_3d(gboxes, qboxes)
        ious_loss = 2.0 * jnp.sum(od * pos_w) / b
    else:
        ious_loss = jnp.float32(0.0)

    # regression term of the TOTAL: see LossConfig.reg_loss
    reg_term = ious_loss if cfg.reg_loss == "odiou" else loc_loss_reduced
    total = cls_loss_reduced + reg_term + dir_loss_reduced + iou_pred_loss

    cls_loss_anchor = jnp.sum(cls_loss, axis=-1)  # [B, A] over classes
    pos_sum = jnp.sum((labels > 0).astype(jnp.float32) * cls_loss_anchor) / b
    neg_sum = jnp.sum((labels == 0).astype(jnp.float32) * cls_loss_anchor) / b
    metrics = {
        "cls_loss_reduced": cls_loss_reduced,
        "loc_loss_reduced": loc_loss_reduced,
        "dir_loss_reduced": dir_loss_reduced,
        "iou_pred_loss": iou_pred_loss,
        "ious_loss": ious_loss,
        "cls_pos_loss": pos_sum,
        "cls_neg_loss": neg_sum,
        "num_pos": jnp.sum(labels > 0) / b,
        "num_neg": jnp.sum(labels == 0) / b,
    }
    return total, metrics
