"""Fixed-capacity rotated NMS in JAX — TPU replacement for the reference's
boost-polygon CPU NMS (det3d/ops/nms/nms_cpu.h:72-170, called through
box_torch_ops.rotate_nms at mg_head_sessd.py:986-997).

Everything is static-shape: callers pass score-padded arrays (invalid rows
get score=-inf) and receive a fixed-size index buffer plus a validity mask,
so the whole predict path stays inside one jit.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .rotated_iou import iou_bev_matrix


def rotate_nms(
    boxes5: jnp.ndarray,
    scores: jnp.ndarray,
    *,
    pre_max_size: int = 1000,
    post_max_size: int = 100,
    iou_threshold: float = 0.01,
    row_chunk: int | None = 128,
):
    """Greedy rotated-BEV NMS.

    Args:
        boxes5: [N, 5] (x, y, w, l, r). Padding rows must carry score=-inf.
        scores: [N].
    Returns:
        (indices [post_max_size] into the input arrays, valid [post_max_size]
        bool mask). Exact greedy semantics: boxes are visited in descending
        score order; a box is kept iff no higher-scoring kept box overlaps it
        with IoU > threshold.
    """
    n = boxes5.shape[0]
    pre = min(pre_max_size, n)
    top_scores, order = jax.lax.top_k(scores, pre)
    top_boxes = boxes5[order]
    iou = iou_bev_matrix(top_boxes, top_boxes, row_chunk=_chunk(pre, row_chunk))
    valid_in = top_scores > -jnp.inf

    # overlap[j, i] = "higher-scored valid j can suppress i" (strict lower
    # triangle in score order)
    kept = _greedy_keep(iou, valid_in, iou_threshold)

    # compact kept indices (stable, score-descending order) into post_max_size
    kept_rank = jnp.where(kept, jnp.arange(pre), pre + 1)
    sel = jnp.argsort(kept_rank)[:post_max_size]
    sel_valid = kept[sel]
    return jnp.where(sel_valid, order[sel], 0), sel_valid


def _greedy_keep(iou: jnp.ndarray, valid_in: jnp.ndarray, iou_threshold: float):
    """Exact greedy NMS as a fixpoint instead of an n-step sequential loop.

    With boxes in descending score order, suppressed = F(suppressed) where
    F(s)[i] = exists j<i: !s[j] & overlap[j,i]. F is antitone with a unique
    fixpoint (induction on score rank shows it equals the greedy result);
    iterating from s=F(0) converges in O(suppression-chain depth) matrix
    passes — a handful on real scenes — trading ~1000 tiny sequential ops
    (which cost ~0.5s on TPU) for a few [n, n] VPU passes.
    """
    pre = iou.shape[0]
    tri = jnp.arange(pre)[:, None] < jnp.arange(pre)[None, :]
    overlap = (iou > iou_threshold) & tri & valid_in[:, None]

    def cond(state):
        s, prev, it = state
        return (it < pre) & jnp.any(s != prev)

    def body(state):
        s, _, it = state
        new = jnp.any((~s)[:, None] & overlap, axis=0)
        return new, s, it + 1

    s0 = jnp.zeros((pre,), dtype=bool)
    s1 = jnp.any(overlap, axis=0)
    suppressed, _, _ = jax.lax.while_loop(cond, body, (s1, s0, jnp.int32(0)))
    return (~suppressed) & valid_in


def _chunk(n: int, row_chunk: int | None):
    if row_chunk is None:
        return None
    # pick the largest divisor of n not exceeding row_chunk
    for c in range(min(row_chunk, n), 0, -1):
        if n % c == 0:
            return c
    return None


def rotate_weighted_nms(
    boxes: jnp.ndarray,
    boxes5: jnp.ndarray,
    dir_labels: jnp.ndarray,
    labels: jnp.ndarray,
    scores: jnp.ndarray,
    iou_preds: jnp.ndarray,
    anchors: jnp.ndarray,
    *,
    pre_max_size: int = 1000,
    post_max_size: int = 100,
    iou_threshold: float = 0.01,
    centerness_pow: int = 2,
    nms_cnt_thresh: float = 2.6,
    nms_sigma_dist_interval=(0, 20, 40, 60),
    nms_sigma_square=(0.0009, 0.009, 0.1, 1.0),
    suppressed_thresh: float = 0.3,
    row_chunk: int | None = 128,
):
    """DI-NMS ("distance-interval" IoU-weighted NMS) — TPU re-design of
    ``IOU_weighted_rotate_non_max_suppression_cpu`` (nms_cpu.h:174-383),
    the optional CIA-SSD decode mode kept in SE-SSD (mg_head_sessd.py:999+).

    Kept boxes are replaced by a confidence-weighted average of their
    cluster: weights = score * exp(-(1-iou)^2 / sigma) with sigma chosen by
    the box's distance interval; a centerness factor damps far clusters.
    Returns (boxes [post, 7], dir_labels, labels, scores, valid mask).
    """
    n = boxes5.shape[0]
    pre = min(pre_max_size, n)
    top_scores, order = jax.lax.top_k(scores, pre)
    b5 = boxes5[order]
    b7 = boxes[order]
    iou = iou_bev_matrix(b5, b5, row_chunk=_chunk(pre, row_chunk))
    valid_in = top_scores > -jnp.inf
    kept = _greedy_keep(iou, valid_in, iou_threshold)

    # cluster membership: every box joins the highest-scoring kept box that
    # overlaps it above suppressed_thresh (including itself).
    member = (iou >= suppressed_thresh) & valid_in[None, :]  # [pre(kept), pre(all)]
    member = member & kept[:, None]
    member = member.at[jnp.arange(pre), jnp.arange(pre)].set(kept)

    # sigma by distance interval of the kept box
    dist = jnp.sqrt(b7[:, 0] ** 2 + b7[:, 1] ** 2)
    conds = []
    for k in range(len(nms_sigma_square)):
        lo = nms_sigma_dist_interval[k]
        hi_ok = (
            dist < nms_sigma_dist_interval[k + 1]
            if k + 1 < len(nms_sigma_dist_interval)
            else jnp.ones_like(dist, dtype=bool)
        )
        conds.append((dist >= lo) & hi_ok)
    sigma = jnp.select(conds, [jnp.full_like(dist, s) for s in nms_sigma_square])

    w = top_scores[None, :] * jnp.exp(-((1.0 - iou) ** 2) / sigma[:, None])
    w = jnp.where(member, w, 0.0)
    cnt = jnp.sum(member, axis=1).astype(b7.dtype)
    wsum = jnp.maximum(jnp.sum(w, axis=1), 1e-6)
    merged = (w @ b7) / wsum[:, None]
    # keep the kept box's own heading/dir (cluster averaging of angles is
    # ill-posed); merge centers and sizes only, as the reference does for
    # its "match_high_score_box" path.
    merged = merged.at[:, 6].set(b7[:, 6])

    centerness = (1.0 - jnp.clip(dist / nms_sigma_dist_interval[-1], 0.0, 1.0)) ** centerness_pow
    score_scale = jnp.where(cnt < nms_cnt_thresh, centerness, 1.0)
    out_scores = top_scores * score_scale

    kept_rank = jnp.where(kept, jnp.arange(pre), pre + 1)
    sel = jnp.argsort(kept_rank)[:post_max_size]
    sel_valid = kept[sel]
    return (
        merged[sel],
        dir_labels[order][sel],
        labels[order][sel],
        jnp.where(sel_valid, out_scores[sel], -jnp.inf),
        sel_valid,
    )
