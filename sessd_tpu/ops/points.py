"""Point-set utilities — JAX equivalents of the points_op CPU extension
(SURVEY §2.2 N4: pts_in_boxes3d, points_to_bev_kernel, points_bound_kernel).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def points_in_boxes3d(points: jnp.ndarray, boxes: jnp.ndarray) -> jnp.ndarray:
    """[P, >=3] x [R, 7] gravity-center boxes -> bool [P, R]
    (points_op.pts_in_boxes3d)."""
    shifted = points[:, None, :3] - boxes[None, :, :3]
    c, s = jnp.cos(boxes[:, 6]), jnp.sin(boxes[:, 6])
    lx = shifted[..., 0] * c[None] - shifted[..., 1] * s[None]
    ly = shifted[..., 0] * s[None] + shifted[..., 1] * c[None]
    half = boxes[:, 3:6] * 0.5
    return (
        (jnp.abs(lx) <= half[None, :, 0])
        & (jnp.abs(ly) <= half[None, :, 1])
        & (jnp.abs(shifted[..., 2]) <= half[None, :, 2])
    )


def points_to_bev(points: jnp.ndarray, pc_range, bev_shape,
                  with_intensity: bool = True) -> jnp.ndarray:
    """Rasterize points into a BEV height/intensity map
    (points_op.points_to_bev_kernel).

    bev_shape: (ny, nx). Returns [ny, nx, 2]: max height + max intensity
    (zeros where empty).
    """
    ny, nx = bev_shape
    x0, y0, z0, x1, y1, z1 = pc_range
    xi = jnp.floor((points[:, 0] - x0) / (x1 - x0) * nx).astype(jnp.int32)
    yi = jnp.floor((points[:, 1] - y0) / (y1 - y0) * ny).astype(jnp.int32)
    ok = (xi >= 0) & (xi < nx) & (yi >= 0) & (yi < ny) & (points[:, 2] >= z0) & (
        points[:, 2] <= z1)
    flat = jnp.where(ok, yi * nx + xi, ny * nx)
    hmap = jnp.full((ny * nx + 1,), -jnp.inf)
    hmap = hmap.at[flat].max(jnp.where(ok, points[:, 2], -jnp.inf))
    out = [jnp.where(jnp.isfinite(hmap[:-1]), hmap[:-1], 0.0).reshape(ny, nx)]
    if with_intensity and points.shape[1] > 3:
        imap = jnp.zeros((ny * nx + 1,))
        imap = imap.at[flat].max(jnp.where(ok, points[:, 3], 0.0))
        out.append(imap[:-1].reshape(ny, nx))
    return jnp.stack(out, axis=-1)


def points_bound_filter(points: jnp.ndarray, pc_range) -> jnp.ndarray:
    """bool [P] mask of points inside the range (points_bound_kernel)."""
    x0, y0, z0, x1, y1, z1 = pc_range
    return (
        (points[:, 0] >= x0) & (points[:, 0] < x1)
        & (points[:, 1] >= y0) & (points[:, 1] < y1)
        & (points[:, 2] >= z0) & (points[:, 2] < z1)
    )
