"""Orientation-aware Distance-IoU (ODIoU) loss in JAX.

TPU re-design of det3d/models/losses/odious.py. The reference spends ~800
lines on hand-written autograd for polygon clipping because torch needed
custom backward passes; under ``jax.grad`` the whole loss is just the forward
math — the rotated-BEV intersection from :mod:`sessd_tpu.core.rotated_iou`
is already differentiable.

Final form (odious.py:845-900):
    odiou = 1 - IoU3d + ||c1-c2||^2 / diag3d^2 + 1.25 * (1 - |cos(dr)|)
    loss  = 2 * sum(odiou * weights) / batch_size
where diag3d^2 = (min-area-bounding-rect diag of the 8 BEV corners)^2
+ (z-intersection height)^2 + 1e-7.
"""
from __future__ import annotations

import jax.numpy as jnp

from .box_jax import bev_corners
from .rotated_iou import overlap_bev, overlap_height


def min_area_rect_diag(points: jnp.ndarray) -> jnp.ndarray:
    """Diagonal of the minimum-area bounding rectangle of [..., P, 2] points.

    The optimum rectangle has an edge collinear with a convex-hull edge
    (rotating calipers); every hull edge connects two input points, so
    evaluating the bounding box at *all* pairwise point-to-point directions
    and taking the min-area one is exact — and unlike the reference's
    convex-hull machinery (odious.py:511-630) it vectorizes cleanly.
    """
    p = points.shape[-2]
    ii, jj = jnp.triu_indices(p, k=1)
    d = points[..., jj, :] - points[..., ii, :]  # [..., C, 2]
    ang = jnp.arctan2(d[..., 1], d[..., 0])  # [..., C]
    c, s = jnp.cos(ang), jnp.sin(ang)
    # rotate all points by -ang for each candidate direction
    px = points[..., None, :, 0]  # [..., 1, P]
    py = points[..., None, :, 1]
    rx = px * c[..., :, None] + py * s[..., :, None]
    ry = -px * s[..., :, None] + py * c[..., :, None]
    w = rx.max(axis=-1) - rx.min(axis=-1)  # [..., C]
    h = ry.max(axis=-1) - ry.min(axis=-1)
    areas = w * h
    best = jnp.argmin(areas, axis=-1)
    bw = jnp.take_along_axis(w, best[..., None], axis=-1)[..., 0]
    bh = jnp.take_along_axis(h, best[..., None], axis=-1)[..., 0]
    return jnp.sqrt(bw ** 2 + bh ** 2)


def ref_mbr_diag(points: jnp.ndarray) -> jnp.ndarray:
    """Reference-compatible bounding-rect diagonal of [..., P, 2] points.

    Emulates odious.py:597-648 exactly rather than computing the true
    minimum-area rectangle, because the released SE-SSD recipe trained
    through these semantics and ``min_area_rect_diag`` differs as a
    *function* (different gradients even where values agree):

    - candidate directions are the convex-hull edge angles only
      (odious.py:610-611), not all pairwise directions;
    - each angle is folded to ``abs(fmod(ang, pi/2))`` (odious.py:612-613).
      The fold by pi/2 is harmless (a rectangle at theta equals one at
      theta+pi/2) but the ``abs`` MIRRORS negative angles — a genuine
      reference quirk that changes the chosen rectangle;
    - the rectangle is the axis-aligned bbox of the points rotated by
      -angle; argmin area wins; diag of that rectangle (odious.py:616-629).

    Known deviation: the reference iterates scipy hull vertices and skips
    the closing edge (odious.py:610 drops last->first); which edge that is
    depends on qhull's arbitrary starting vertex, so we include ALL hull
    edges. The goldens carry a per-pair mask for the rare pairs where the
    dropped edge changes the reference's answer.
    """
    p = points.shape[-2]
    ii, jj = jnp.nonzero(  # all ordered pairs i != j
        ~jnp.eye(p, dtype=bool), size=p * (p - 1))
    a = points[..., ii, :]                       # [..., C, 2]
    e = points[..., jj, :] - a                   # edge vectors
    # hull-edge test: every point left of (or on) the directed edge
    rel = points[..., None, :, :] - a[..., :, None, :]   # [..., C, P, 2]
    cross = e[..., None, 0] * rel[..., 1] - e[..., None, 1] * rel[..., 0]
    center = jnp.mean(points, axis=-2, keepdims=True)
    scale_sq = jnp.maximum(
        jnp.max(jnp.sum((points - center) ** 2, axis=-1), axis=-1), 1e-12)
    eps = 1e-5 * scale_sq[..., None]
    elen_sq = jnp.sum(e * e, axis=-1)
    is_edge = (jnp.all(cross >= -eps[..., None], axis=-1)
               & (elen_sq > 1e-12 * scale_sq[..., None]))
    # zero-length edges (duplicate points, e.g. identical boxes) are masked
    # out above, but atan2's gradient at (0,0) is NaN and 0*NaN poisons the
    # backward pass — substitute a fixed direction for them
    zero_e = elen_sq <= 1e-12 * scale_sq[..., None]
    ex = jnp.where(zero_e, 1.0, e[..., 0])
    ey = jnp.where(zero_e, 0.0, e[..., 1])
    ang = jnp.abs(jnp.fmod(jnp.arctan2(ey, ex), jnp.pi / 2))
    c, s = jnp.cos(ang), jnp.sin(ang)
    px = points[..., None, :, 0]                 # [..., 1, P]
    py = points[..., None, :, 1]
    rx = px * c[..., :, None] + py * s[..., :, None]
    ry = -px * s[..., :, None] + py * c[..., :, None]
    w = rx.max(axis=-1) - rx.min(axis=-1)        # [..., C]
    h = ry.max(axis=-1) - ry.min(axis=-1)
    areas = jnp.where(is_edge, w * h, jnp.inf)
    best = jnp.argmin(areas, axis=-1)
    bw = jnp.take_along_axis(w, best[..., None], axis=-1)[..., 0]
    bh = jnp.take_along_axis(h, best[..., None], axis=-1)[..., 0]
    return jnp.sqrt(bw ** 2 + bh ** 2)


def odiou_3d(gboxes: jnp.ndarray, qboxes: jnp.ndarray) -> jnp.ndarray:
    """Elementwise ODIoU distance of aligned [..., 7] box pairs (no reduction)."""
    indicator = (
        (gboxes[..., 3] > 0) & (gboxes[..., 4] > 0) & (gboxes[..., 5] > 0)
        & (qboxes[..., 3] > 0) & (qboxes[..., 4] > 0) & (qboxes[..., 5] > 0)
    )
    g = jnp.clip(gboxes, -200.0, 200.0)
    q = jnp.clip(qboxes, -200.0, 200.0)

    angle_factor = 1.25 * (1.0 - jnp.abs(jnp.cos(q[..., 6] - g[..., 6])))

    inter_area = overlap_bev(g, q)
    inter_h = overlap_height(g, q)
    vol_inter = inter_area * inter_h
    vol_g = g[..., 3] * g[..., 4] * g[..., 5]
    vol_q = q[..., 3] * q[..., 4] * q[..., 5]
    # clip to the mathematical range: for DEGENERATE sliver boxes (early
    # training decodes exp() of large logits) the polygon clipper's
    # inter_area can exceed the union by float error, the union clamp at
    # 1e-7 then explodes the ratio to ~1e6 and the loss to -1e6 (observed
    # r4: ious_loss=-2.4e6 -> training diverged). Exact for valid geometry
    # (IoU is in [0, 1]); grads pass through unchanged in the interior.
    iou3d = jnp.clip(
        vol_inter / jnp.maximum(vol_g + vol_q - vol_inter, 1e-7), 0.0, 1.0)

    center_dist_sq = jnp.sum((g[..., :3] - q[..., :3]) ** 2, axis=-1)
    corners = jnp.concatenate([bev_corners(g), bev_corners(q)], axis=-2)  # [..., 8, 2]
    diag_bev = ref_mbr_diag(corners)
    # NOTE: the reference combines the BEV diag with the *intersection*
    # height, not the union height (odious.py:880-886).
    diag3d_sq = diag_bev ** 2 + inter_h ** 2 + 1e-7

    od = 1.0 - iou3d + center_dist_sq / diag3d_sq + angle_factor
    return jnp.where(indicator, od, 0.0)


def odiou_3d_loss(gboxes, qboxes, weights, batch_size) -> jnp.ndarray:
    """Reduced ODIoU loss exactly as odious.py:896-899: 2*sum(od*w)/batch."""
    od = odiou_3d(gboxes, qboxes)
    return 2.0 * jnp.sum(od * weights) / batch_size
