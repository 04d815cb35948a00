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
    anchors: jnp.ndarray | None = None,
    *,
    pre_max_size: int = 1000,
    post_max_size: int = 100,
    iou_threshold: float = 0.01,  # accepted and UNUSED, like the reference
    enable_centerness: bool = True,
    centerness_pow: int = 2,
    nms_cnt_thresh: float = 2.6,
    nms_sigma_dist_interval=(0, 20, 40, 60),
    nms_sigma_square=(0.0009, 0.009, 0.1, 1.0),
    suppressed_thresh: float = 0.3,
    row_chunk: int | None = 128,
):
    """DI-NMS ("distance-interval" IoU-weighted NMS) — exact-semantics TPU
    redesign of ``IOU_weighted_rotate_non_max_suppression_cpu``
    (nms_cpu.h:174-383) + its torch wrapper (box_torch_ops.py:552-621), the
    optional CIA-SSD decode mode kept in SE-SSD (mg_head_sessd.py:999-1022).
    Golden-tested against the literal host port (core/nms_np.py).

    The reference is an inherently sequential pick-max / merge / maybe-recover
    loop; here each pick is ONE while_loop iteration of vectorized [pre] work
    against a precomputed exact rotated-IoU matrix (iterations = number of
    picked leaders, typically tens). Per leader i (descending damped score):

    - cnt      = sum over same-label j of iou(i,j) * iou_preds[j]  (iou > 0)
    - members  = same-label j with iou(i,j) > suppressed_thresh
    - merged   = sum_j exp(-(1-iou)^2/sigma(dist_i)) * iou_preds[j] * box_j
                 (ALL 7 dims, heading included), normalized; sigma by the
                 leader's distance interval, weight 0 past the last interval
                 (where the reference 0/0-NaNs; we keep the leader's box)
    - keep iff cnt > nms_cnt_thresh, with score = max member damped score;
      else recover the boxes this leader suppressed (label-agnostic
      suppression at iou >= suppressed_thresh).

    ``iou_threshold`` is unused by the reference kernel too (suppression runs
    at suppressed_thresh). Returns (boxes [post, 7], dir_labels, labels,
    scores, valid mask).
    """
    n = boxes5.shape[0]
    pre = min(pre_max_size, n)
    top_scores, order = jax.lax.top_k(scores, pre)
    valid_in = top_scores > -jnp.inf
    if enable_centerness and anchors is not None:
        # wrapper pre-damping (box_torch_ops.py:582-586): masked softmax of
        # box-to-anchor BEV distance over the valid pre-NMS set
        d = jnp.sqrt(jnp.sum(
            (boxes[order][:, :2] - anchors[order][:, :2]) ** 2, axis=-1))
        e = jnp.where(valid_in, jnp.exp(d - jnp.max(jnp.where(valid_in, d, -jnp.inf))), 0.0)
        softmax = e / jnp.maximum(jnp.sum(e), 1e-20)
        top_scores = jnp.where(
            valid_in, top_scores * (1.0 - softmax) ** centerness_pow, -jnp.inf)
    b5 = boxes5[order]
    b7 = boxes[order].astype(jnp.float32)
    lab = labels[order]
    iop = iou_preds[order].astype(jnp.float32)
    iou = iou_bev_matrix(b5, b5, row_chunk=_chunk(pre, row_chunk))

    # sigma by the leader's distance-to-origin interval; 0 past the last
    # interval edge (nms_cpu.h:329-335 only assigns inside [d_k, d_k+1))
    dist = jnp.sqrt(b7[:, 0] ** 2 + b7[:, 1] ** 2)
    sigma = jnp.zeros_like(dist)
    for k in range(len(nms_sigma_dist_interval) - 1):
        inside = (dist >= nms_sigma_dist_interval[k]) & (
            dist < nms_sigma_dist_interval[k + 1])
        sigma = jnp.where(inside, nms_sigma_square[k], sigma)

    def body(state):
        suppressed, kept, out_b, out_s = state
        idx = jnp.argmax(jnp.where(suppressed, -jnp.inf, top_scores))
        ov = iou[idx]
        same = lab == lab[idx]
        cnt = jnp.sum(jnp.where((ov > 0) & same & valid_in, ov * iop, 0.0))
        member = (ov > suppressed_thresh) & same & valid_in
        w = jnp.where(member & (sigma[idx] > 0),
                      jnp.exp(-((1.0 - ov) ** 2) / jnp.maximum(sigma[idx], 1e-20)) * iop,
                      0.0)
        wsum = jnp.sum(w)
        merged = jnp.where(wsum != 0, (w @ b7) / jnp.where(wsum != 0, wsum, 1.0),
                           b7[idx])
        score_out = jnp.max(jnp.where(member, top_scores, -jnp.inf))
        keep_it = cnt > nms_cnt_thresh
        newly = (~suppressed) & (ov >= suppressed_thresh)
        suppressed = jnp.where(keep_it, suppressed | newly, suppressed)
        suppressed = suppressed.at[idx].set(True)
        kept = kept.at[idx].set(keep_it)
        out_b = jnp.where(keep_it, out_b.at[idx].set(merged), out_b)
        out_s = jnp.where(keep_it, out_s.at[idx].set(score_out), out_s)
        return suppressed, kept, out_b, out_s

    def cond(state):
        return jnp.any(~state[0])

    state0 = (~valid_in, jnp.zeros((pre,), bool),
              jnp.zeros_like(b7), jnp.full((pre,), -jnp.inf, top_scores.dtype))
    _, kept, out_b, out_s = jax.lax.while_loop(cond, body, state0)

    # picks happen in strictly descending damped-score order (recovery can
    # only restore boxes scored below the current leader), so sorting kept
    # leaders by damped score reproduces the reference pick order
    kept_rank = jnp.where(kept, -top_scores, jnp.inf)
    sel = jnp.argsort(kept_rank)[:post_max_size]
    sel_valid = kept[sel]
    return (
        out_b[sel],
        dir_labels[order][sel],
        labels[order][sel],
        jnp.where(sel_valid, out_s[sel], -jnp.inf),
        sel_valid,
    )
