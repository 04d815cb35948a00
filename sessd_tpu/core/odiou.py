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
    iou3d = vol_inter / jnp.maximum(vol_g + vol_q - vol_inter, 1e-7)

    center_dist_sq = jnp.sum((g[..., :3] - q[..., :3]) ** 2, axis=-1)
    corners = jnp.concatenate([bev_corners(g), bev_corners(q)], axis=-2)  # [..., 8, 2]
    diag_bev = min_area_rect_diag(corners)
    # NOTE: the reference combines the BEV diag with the *intersection*
    # height, not the union height (odious.py:880-886).
    diag3d_sq = diag_bev ** 2 + inter_h ** 2 + 1e-7

    od = 1.0 - iou3d + center_dist_sq / diag3d_sq + angle_factor
    return jnp.where(indicator, od, 0.0)


def odiou_3d_loss(gboxes, qboxes, weights, batch_size) -> jnp.ndarray:
    """Reduced ODIoU loss exactly as odious.py:896-899: 2*sum(od*w)/batch."""
    od = odiou_3d(gboxes, qboxes)
    return 2.0 * jnp.sum(od * weights) / batch_size
