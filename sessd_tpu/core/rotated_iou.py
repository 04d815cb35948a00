"""Rotated-box overlap / IoU in pure JAX — the TPU replacement for the
reference's CUDA extensions (det3d/core/iou3d/src/iou3d_kernel.cu and
det3d/ops/nms/nms_gpu.py).

Algorithm: instead of the CUDA kernel's vertex-collection + angular sort
(which maps terribly onto the TPU — minor-dim argsort/gather scalarizes),
the intersection area comes from Green's theorem over clipped edges: the
boundary of A∩B is the union of A-edge parts inside B and B-edge parts
inside A; each part is a parameter interval found by clipping against four
half-planes, and its 0.5*cross(u, v) line-integral contributions sum to the
area. Pure elementwise math — fixed-shape, differentiable, vmap/broadcast
friendly, ~100x faster than the sort formulation on TPU.

Everything broadcasts: ``overlap_bev(a[..., 5], b[..., 5]) -> [...]``.
Pairwise [N, M] matrices are built by the callers via broadcasting (see
:func:`iou_bev_matrix`); chunk the leading axis if N*M is large.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .box_jax import bev_corners

_EPS = 1e-8


def _as_bev5(boxes: jnp.ndarray) -> jnp.ndarray:
    """[..., 7] -> [..., 5] (x, y, w, l, r); [..., 5] passes through."""
    if boxes.shape[-1] == 7:
        return boxes[..., jnp.array([0, 1, 3, 4, 6])]
    return boxes


def _clip_edge_contributions(pa: jnp.ndarray, qa: jnp.ndarray,
                             own_boundary: bool) -> jnp.ndarray:
    """Green's-theorem contribution of polygon P's edges clipped by convex
    polygon Q. pa, qa: [..., 4, 2] CCW corners. Returns [...] signed sum of
    0.5*cross(u, v) over the clipped sub-segments of P's edges.

    ``own_boundary``: whether P-edge segments lying exactly ON Q's boundary
    count as inside. Exactly one of the two passes must claim coincident
    edges or identical boxes would double-count (or drop) them.
    """
    a = pa  # edge starts [..., 4, 2]
    b = jnp.roll(pa, -1, axis=-2)
    d = b - a
    # half-planes of Q: inside iff cross(q1-q0, x-q0) >= 0 (CCW)
    q0 = qa[..., None, :, :]             # [..., 1, 4, 2]
    e = jnp.roll(qa, -1, axis=-2)[..., None, :, :] - q0  # [..., 1, 4, 2]
    ax = a[..., :, None, :]              # [..., 4, 1, 2]
    dx = d[..., :, None, :]
    # signed distance along the edge: s(t) = s0 + t * sd
    s0 = e[..., 0] * (ax[..., 1] - q0[..., 1]) - e[..., 1] * (ax[..., 0] - q0[..., 0])
    sd = e[..., 0] * dx[..., 1] - e[..., 1] * dx[..., 0]  # [..., 4, 4]
    t_at0 = -s0 / jnp.where(jnp.abs(sd) < _EPS, 1.0, sd)
    lo = jnp.where(sd > _EPS, t_at0, 0.0)
    hi = jnp.where(sd < -_EPS, t_at0, 1.0)
    # parallel-to-plane edges: feasible iff on the inside; boundary-coincident
    # edges belong to exactly one pass (see own_boundary)
    tol = -1e-6 if own_boundary else 1e-6
    infeasible = (jnp.abs(sd) <= _EPS) & (s0 < tol)
    t0 = jnp.clip(jnp.max(lo, axis=-1), 0.0, 1.0)  # [..., 4]
    t1 = jnp.clip(jnp.min(hi, axis=-1), 0.0, 1.0)
    ok = (t1 > t0) & ~jnp.any(infeasible, axis=-1)
    u = a + t0[..., None] * d
    v = a + t1[..., None] * d
    contrib = 0.5 * (u[..., 0] * v[..., 1] - u[..., 1] * v[..., 0])
    return jnp.sum(jnp.where(ok, contrib, 0.0), axis=-1)


def overlap_bev(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Intersection area of rotated BEV boxes; broadcasts over leading dims.

    boxes: [..., 5] (x, y, w, l, r) or [..., 7] full boxes.
    TPU-native equivalent of ``boxes_overlap_bev_gpu`` (iou3d.cpp exports).

    Sort-free formulation: the boundary of A∩B consists of the parts of A's
    edges inside B plus the parts of B's edges inside A; by Green's theorem
    the area is the sum of 0.5*cross(u, v) over those ordered sub-segments,
    each found by clipping an edge's parameter range against the other
    box's four half-planes. No vertex gathering, no angular argsort — pure
    elementwise VPU math (the argsort variant cost ~0.7ms/1M pairs *per
    pair batch* on TPU due to scalarized minor-dim gathers).
    """
    b1 = _as_bev5(boxes1)
    b2 = _as_bev5(boxes2)
    # bev_corners yields clockwise rings; reverse to CCW for positive areas
    c1 = bev_corners(b1)[..., ::-1, :]
    c2 = bev_corners(b2)[..., ::-1, :]
    area = (_clip_edge_contributions(c1, c2, own_boundary=True)
            + _clip_edge_contributions(c2, c1, own_boundary=False))
    return jnp.maximum(area, 0.0)


def iou_bev(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Rotated BEV IoU; broadcasts (twin of ``boxes_iou_bev_gpu``)."""
    b1 = _as_bev5(boxes1)
    b2 = _as_bev5(boxes2)
    inter = overlap_bev(b1, b2)
    a1 = b1[..., 2] * b1[..., 3]
    a2 = b2[..., 2] * b2[..., 3]
    return inter / jnp.maximum(a1 + a2 - inter, 1e-7)


def overlap_height(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """z-extent overlap of gravity-center boxes [..., 7]; broadcasts."""
    zmax1 = boxes1[..., 2] + boxes1[..., 5] * 0.5
    zmin1 = boxes1[..., 2] - boxes1[..., 5] * 0.5
    zmax2 = boxes2[..., 2] + boxes2[..., 5] * 0.5
    zmin2 = boxes2[..., 2] - boxes2[..., 5] * 0.5
    return jnp.maximum(jnp.minimum(zmax1, zmax2) - jnp.maximum(zmin1, zmin2), 0.0)


def iou_3d(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Rotated 3D IoU of [..., 7] boxes; broadcasts (twin of
    ``boxes_iou3d_gpu`` / ``boxes_aligned_iou3d_gpu`` when used elementwise)."""
    inter_bev = overlap_bev(boxes1, boxes2)
    inter_h = overlap_height(boxes1, boxes2)
    inter = inter_bev * inter_h
    v1 = boxes1[..., 3] * boxes1[..., 4] * boxes1[..., 5]
    v2 = boxes2[..., 3] * boxes2[..., 4] * boxes2[..., 5]
    return inter / jnp.maximum(v1 + v2 - inter, 1e-7)


def _pairwise(fn, boxes1, boxes2, row_chunk: int | None = None):
    """Lift an elementwise-broadcasting box fn to an [N, M] matrix.

    row_chunk bounds peak memory (the candidate-vertex buffers are
    [chunk, M, 24, 2]); None computes the full matrix at once.
    """
    n = boxes1.shape[0]
    if row_chunk is None or row_chunk >= n:
        return fn(boxes1[:, None, :], boxes2[None, :, :])
    assert n % row_chunk == 0, "row_chunk must divide N for a static scan"
    rows = boxes1.reshape(n // row_chunk, row_chunk, boxes1.shape[-1])
    out = jax.lax.map(lambda r: fn(r[:, None, :], boxes2[None, :, :]), rows)
    return out.reshape(n, boxes2.shape[0])


def iou_bev_matrix(boxes1, boxes2, row_chunk=None):
    """[N, .] x [M, .] -> [N, M] rotated BEV IoU (``boxes_iou_bev_gpu``)."""
    return _pairwise(iou_bev, boxes1, boxes2, row_chunk)


def overlap_bev_matrix(boxes1, boxes2, row_chunk=None):
    return _pairwise(overlap_bev, boxes1, boxes2, row_chunk)


def iou_3d_matrix(boxes1, boxes2, row_chunk=None):
    """[N, 7] x [M, 7] -> [N, M] rotated 3D IoU (``boxes_iou3d_gpu``)."""
    return _pairwise(iou_3d, boxes1, boxes2, row_chunk)
