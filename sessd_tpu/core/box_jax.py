"""JAX box math — device-side twin of :mod:`sessd_tpu.core.box_np`.

Everything is jit-safe (static shapes, no python branching on values) and
differentiable. Boxes are ``[x, y, z, w, l, h, ry]`` gravity-center lidar
boxes; corner/rotation conventions match the reference
(det3d/core/bbox/box_np_ops.py:267-446) — see box_np.py docstring.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# clockwise corner layout, matching box_np_ops.py:288-289
_CORNERS2D = np.array([[0, 0], [0, 1], [1, 1], [1, 0]], dtype=np.float32) - 0.5


def bev_corners(boxes: jnp.ndarray) -> jnp.ndarray:
    """[..., 7] (or [..., 5] = x,y,w,l,r) boxes -> [..., 4, 2] BEV corners."""
    if boxes.shape[-1] == 7:
        xy, wl, r = boxes[..., :2], boxes[..., 3:5], boxes[..., 6]
    else:
        xy, wl, r = boxes[..., :2], boxes[..., 2:4], boxes[..., 4]
    local = wl[..., None, :] * jnp.asarray(_CORNERS2D)  # [..., 4, 2]
    c, s = jnp.cos(r)[..., None], jnp.sin(r)[..., None]
    gx = local[..., 0] * c + local[..., 1] * s
    gy = -local[..., 0] * s + local[..., 1] * c
    return jnp.stack([gx, gy], axis=-1) + xy[..., None, :]


def second_box_encode(boxes: jnp.ndarray, anchors: jnp.ndarray) -> jnp.ndarray:
    """SECOND-style anchor-offset encoding (box_torch_ops.py:23-80)."""
    xa, ya, za, wa, la, ha, ra = jnp.split(anchors, 7, axis=-1)
    xg, yg, zg, wg, lg, hg, rg = jnp.split(boxes, 7, axis=-1)
    diagonal = jnp.sqrt(la ** 2 + wa ** 2)
    return jnp.concatenate(
        [
            (xg - xa) / diagonal,
            (yg - ya) / diagonal,
            (zg - za) / ha,
            jnp.log(wg / wa),
            jnp.log(lg / la),
            jnp.log(hg / ha),
            rg - ra,
        ],
        axis=-1,
    )


def second_box_decode(encodings: jnp.ndarray, anchors: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`second_box_encode` (box_torch_ops.py:83-150)."""
    xa, ya, za, wa, la, ha, ra = jnp.split(anchors, 7, axis=-1)
    xt, yt, zt, wt, lt, ht, rt = jnp.split(encodings, 7, axis=-1)
    diagonal = jnp.sqrt(la ** 2 + wa ** 2)
    return jnp.concatenate(
        [
            xt * diagonal + xa,
            yt * diagonal + ya,
            zt * ha + za,
            jnp.exp(wt) * wa,
            jnp.exp(lt) * la,
            jnp.exp(ht) * ha,
            rt + ra,
        ],
        axis=-1,
    )


def add_sin_difference(boxes1: jnp.ndarray, boxes2: jnp.ndarray):
    """Replace the last (angle) channel with the sin-difference encoding:
    ry1 -> sin(ry1)cos(ry2), ry2 -> cos(ry1)sin(ry2) (mg_head_sessd.py:39-44),
    so that SmoothL1(enc1 - enc2) penalises sin(ry1 - ry2)."""
    rad1 = jnp.sin(boxes1[..., -1:]) * jnp.cos(boxes2[..., -1:])
    rad2 = jnp.cos(boxes1[..., -1:]) * jnp.sin(boxes2[..., -1:])
    b1 = jnp.concatenate([boxes1[..., :-1], rad1], axis=-1)
    b2 = jnp.concatenate([boxes2[..., :-1], rad2], axis=-1)
    return b1, b2


def rotation_points_z(points: jnp.ndarray, angle) -> jnp.ndarray:
    """Rotate [..., 3] points about z by scalar angle — out = p @ Rz^T with
    the reference convention (box_torch_ops.py:331-336)."""
    c, s = jnp.cos(angle), jnp.sin(angle)
    x = points[..., 0] * c + points[..., 1] * s
    y = -points[..., 0] * s + points[..., 1] * c
    return jnp.stack([x, y, points[..., 2]], axis=-1)


def corner_to_standup_bev(corners: jnp.ndarray) -> jnp.ndarray:
    """[..., 4, 2] corners -> [..., 4] (x1, y1, x2, y2)."""
    return jnp.concatenate([corners.min(axis=-2), corners.max(axis=-2)], axis=-1)
