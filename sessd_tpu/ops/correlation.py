"""Temporal feature correlation + alignment — JAX equivalents of the Det3D
substrate's align_aggregation CUDA extension (SURVEY §2.2 N11: a cost-volume
``correlation`` op and an offset-based ``align_feature`` warp, used by
temporal-aggregation detectors; no registered SE-SSD user).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def correlation(f1: jnp.ndarray, f2: jnp.ndarray, max_displacement: int = 4,
                stride: int = 1) -> jnp.ndarray:
    """Cost volume between two [H, W, C] feature maps.

    out[y, x, k] = <f1[y, x], f2[y+dy, x+dx]> / C for the k-th displacement
    (dy, dx) in the (2d+1)^2 window. Out-of-bounds displacements are zero.
    """
    h, w, c = f1.shape
    d = max_displacement
    f2p = jnp.pad(f2, ((d, d), (d, d), (0, 0)))
    outs = []
    for dy in range(-d, d + 1, stride):
        for dx in range(-d, d + 1, stride):
            shifted = jax.lax.dynamic_slice(f2p, (d + dy, d + dx, 0), (h, w, c))
            outs.append(jnp.sum(f1 * shifted, axis=-1) / c)
    return jnp.stack(outs, axis=-1)


def align_feature(feature: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """Bilinear warp of an [H, W, C] map by a per-pixel [H, W, 2] (dy, dx)
    flow (the align_feature op). Differentiable."""
    h, w, c = feature.shape
    gy, gx = jnp.meshgrid(jnp.arange(h), jnp.arange(w), indexing="ij")
    py = gy + flow[..., 0]
    px = gx + flow[..., 1]
    y0 = jnp.floor(py)
    x0 = jnp.floor(px)
    dy = py - y0
    dx = px - x0

    def at(yy, xx):
        yi = jnp.clip(yy, 0, h - 1).astype(jnp.int32)
        xi = jnp.clip(xx, 0, w - 1).astype(jnp.int32)
        return feature[yi, xi]

    out = (
        at(y0, x0) * ((1 - dy) * (1 - dx))[..., None]
        + at(y0, x0 + 1) * ((1 - dy) * dx)[..., None]
        + at(y0 + 1, x0) * (dy * (1 - dx))[..., None]
        + at(y0 + 1, x0 + 1) * (dy * dx)[..., None]
    )
    inb = ((py >= 0) & (py <= h - 1) & (px >= 0) & (px <= w - 1))[..., None]
    return jnp.where(inb, out, 0.0)
