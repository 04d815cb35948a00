"""RoI operators for two-stage detectors — JAX equivalents of the Det3D
substrate's CUDA extensions (SURVEY §2.2 N9 roipool3d, N10 rroi_align,
N12 box2d_iou_rotated).

These are not on the SE-SSD inference path but complete the framework's
capability surface for RCNN-style heads.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.rotated_iou import iou_bev_matrix


def box2d_iou_rotated(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """[N, 5] x [M, 5] (cx, cy, w, h, angle) rotated IoU matrix — the
    detectron2-style op (ops/box2d_iou_rotated)."""
    return iou_bev_matrix(boxes1, boxes2)


def roipool3d(points: jnp.ndarray, point_feats: jnp.ndarray, boxes: jnp.ndarray,
              num_sampled: int, extra_w: float = 0.0) -> tuple:
    """Rotated 3D RoI pooling (ops/roipool3d): for each box gather up to
    ``num_sampled`` member points (xyz + features), zero-padded.

    points [P, 3]; point_feats [P, C]; boxes [R, 7] gravity-center.
    Returns (pooled [R, num_sampled, 3+C], empty_mask [R]).
    """
    shifted = points[None, :, :] - boxes[:, None, :3]  # [R, P, 3]
    c, s = jnp.cos(boxes[:, 6:7]), jnp.sin(boxes[:, 6:7])
    lx = shifted[..., 0] * c + shifted[..., 1] * s
    ly = -shifted[..., 0] * s + shifted[..., 1] * c
    half = boxes[:, 3:6] * 0.5 + extra_w
    inside = (
        (jnp.abs(lx) <= half[:, 0:1])
        & (jnp.abs(ly) <= half[:, 1:2])
        & (jnp.abs(shifted[..., 2]) <= half[:, 2:3])
    )  # [R, P]
    # top-k by membership (stable: first points win), gather xyz+feats
    p = points.shape[0]
    k = min(num_sampled, p)
    score = inside.astype(jnp.float32) * (1.0 + jnp.arange(p)[None, ::-1])
    _, idx = jax.lax.top_k(score, k)
    member = jnp.take_along_axis(inside, idx, axis=1)
    feats = jnp.concatenate([points, point_feats], axis=-1)  # [P, 3+C]
    pooled = feats[idx]  # [R, k, 3+C]
    pooled = jnp.where(member[..., None], pooled, 0.0)
    if k < num_sampled:
        pooled = jnp.pad(pooled, ((0, 0), (0, num_sampled - k), (0, 0)))
    return pooled, ~inside.any(axis=1)


def rotated_roi_align(feature_map: jnp.ndarray, rois: jnp.ndarray,
                      out_size: tuple = (7, 7), spatial_scale: float = 1.0,
                      samples: int = 2) -> jnp.ndarray:
    """Rotated RoIAlign on a BEV map (ops/rroi_align).

    feature_map [H, W, C]; rois [R, 5] (cx, cy, w, h, angle) in pixel
    coords * 1/spatial_scale. Bilinear sampling on a rotated grid with
    ``samples``^2 points per output bin. Differentiable.
    """
    h, w, c = feature_map.shape
    oh, ow = out_size
    r = rois.shape[0]

    # sampling offsets within the roi, in roi-local units [-0.5, 0.5)
    ys = (jnp.arange(oh * samples) + 0.5) / (oh * samples) - 0.5
    xs = (jnp.arange(ow * samples) + 0.5) / (ow * samples) - 0.5
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")  # [ohs, ows]

    cx = rois[:, 0] * spatial_scale
    cy = rois[:, 1] * spatial_scale
    rw = rois[:, 2] * spatial_scale
    rh = rois[:, 3] * spatial_scale
    ang = rois[:, 4]
    ca, sa = jnp.cos(ang), jnp.sin(ang)

    lx = gx[None] * rw[:, None, None]
    ly = gy[None] * rh[:, None, None]
    px = lx * ca[:, None, None] - ly * sa[:, None, None] + cx[:, None, None]
    py = lx * sa[:, None, None] + ly * ca[:, None, None] + cy[:, None, None]

    # bilinear sample
    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    dx = px - x0
    dy = py - y0

    def at(yy, xx):
        yy = jnp.clip(yy, 0, h - 1).astype(jnp.int32)
        xx = jnp.clip(xx, 0, w - 1).astype(jnp.int32)
        return feature_map[yy, xx]  # [..., C]

    v = (
        at(y0, x0) * ((1 - dy) * (1 - dx))[..., None]
        + at(y0, x0 + 1) * ((1 - dy) * dx)[..., None]
        + at(y0 + 1, x0) * (dy * (1 - dx))[..., None]
        + at(y0 + 1, x0 + 1) * (dy * dx)[..., None]
    )
    inb = ((px >= -1) & (px <= w) & (py >= -1) & (py <= h))[..., None]
    v = jnp.where(inb, v, 0.0)
    # average the samples per output bin
    v = v.reshape(r, oh, samples, ow, samples, c).mean(axis=(2, 4))
    return v
