"""PointNet++ point-set operators in pure JAX.

TPU-native equivalents of the reference's pointnet2 CUDA extension
(det3d/ops/pointnet2/src/*, SURVEY §2.2 N8): farthest point sampling, ball
query, grouping, and 3-NN interpolation — the Det3D substrate capabilities
behind point-based detectors. All fixed-shape, vmap-able over batch.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def farthest_point_sample(xyz: jnp.ndarray, num_samples: int,
                          mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """[N, 3] (+ valid mask) -> [num_samples] indices, greedy FPS.

    Matches pointnet2's furthest_point_sampling: starts from index 0,
    iteratively picks the point with max distance-to-selected-set.
    """
    n = xyz.shape[0]
    big = jnp.float32(1e10)
    d = jnp.full((n,), big)
    if mask is not None:
        d = jnp.where(mask, d, -1.0)

    def body(i, state):
        d, sel = state
        last = sel[i - 1]
        dist = jnp.sum((xyz - xyz[last]) ** 2, axis=-1)
        if mask is not None:
            dist = jnp.where(mask, dist, -1.0)
        d = jnp.minimum(d, dist)
        sel = sel.at[i].set(jnp.argmax(d))
        return d, sel

    sel0 = jnp.zeros((num_samples,), jnp.int32)
    first = 0 if mask is None else jnp.argmax(mask)
    sel0 = sel0.at[0].set(first)
    _, sel = jax.lax.fori_loop(1, num_samples, body, (d, sel0))
    return sel


def ball_query(centers: jnp.ndarray, xyz: jnp.ndarray, radius: float,
               num_neighbors: int, mask: jnp.ndarray | None = None):
    """[M, 3] centers vs [N, 3] points -> ([M, K] indices, [M, K] valid).

    pointnet2 semantics: up to K points within radius; rows short of K
    repeat the first hit; centers with no hit get an all-invalid row.
    """
    d2 = jnp.sum((centers[:, None, :] - xyz[None, :, :]) ** 2, axis=-1)  # [M, N]
    ok = d2 <= radius * radius
    if mask is not None:
        ok = ok & mask[None, :]
    # take the K smallest-index hits: rank hits by index, fill with first hit
    n = xyz.shape[0]
    idxs = jnp.arange(n)[None, :]
    ranked = jnp.where(ok, idxs, n)
    order = jnp.sort(ranked, axis=-1)[:, :num_neighbors]  # [M, K]
    has = order < n
    first = jnp.where(has[:, :1], order[:, :1], 0)
    out = jnp.where(has, order, first)
    # pointnet2 fills short rows with the first hit; a slot is usable iff
    # its center had at least one in-radius point
    valid = jnp.broadcast_to(has[:, :1], has.shape)
    return out, valid


def group_points(features: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """[N, C] features gathered by [M, K] indices -> [M, K, C]."""
    return features[idx]


def three_nn(query: jnp.ndarray, support: jnp.ndarray,
             support_mask: jnp.ndarray | None = None):
    """[M, 3] vs [N, 3] -> ([M, 3] dists, [M, 3] indices) of the 3 nearest."""
    d2 = jnp.sum((query[:, None, :] - support[None, :, :]) ** 2, axis=-1)
    if support_mask is not None:
        d2 = jnp.where(support_mask[None, :], d2, jnp.inf)
    neg, idx = jax.lax.top_k(-d2, 3)
    return jnp.sqrt(jnp.maximum(-neg, 0.0)), idx


def three_interpolate(features: jnp.ndarray, idx: jnp.ndarray,
                      dists: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Inverse-distance-weighted interpolation: [N, C] -> [M, C]."""
    w = 1.0 / jnp.maximum(dists * dists, eps)
    w = w / jnp.sum(w, axis=-1, keepdims=True)
    return jnp.einsum("mk,mkc->mc", w, features[idx])
