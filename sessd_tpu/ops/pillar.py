"""Pillar-sparse / z-dense execution engine for the 3D sparse backbone.

The voxel-row sparse engine (ops/sparse.py) pays XLA's dynamic-gather cost
*per voxel row*: a 3^3 submanifold conv gathers N*27 rows of C floats, and
the TPU scalar core issues each row individually (~7 ns/row — the measured
r1 forward wall). Ground-heavy lidar scenes are ~1.4 voxels per occupied
BEV pillar, so this module re-lays the sparse tensor as

    columns [P, D, C]   — dense in z over occupied BEV pillars,
    occ     [P, D]      — exact voxel occupancy inside each column,
    PillarSet ids [P]   — sorted linearized (b, y, x) pillar ids.

A 3x3x3 sparse conv then becomes: ONE gather of 9 neighbor *columns*
(P*9 rows of D*C contiguous bytes) followed by a dense `lax.conv` over the
(neighbor, z) axes on the MXU. Unoccupied sites hold zeros, so the dense
arithmetic is exactly the submanifold sum over occupied neighbors; outputs
are re-masked by occupancy. Strided convs downsample z inside the conv
(stride on the z axis) and xy by re-generating the pillar set, with the
spconv covered-output rule applied as an occupancy mask computed from a
broadcast ones-channel in the same gather.

MEASURED CAVEAT (r2, v5e): XLA's dynamic gather throughput is per-ELEMENT
(~3.3G elem/s), not per-row, so gathering z-dense columns moves ~9x more
elements than the voxel-row engine and is ~10x slower in practice
(scripts/bench_pillar_prims.py). This module is kept as a correct, tested
alternative execution plan; the production path is the fused Pallas
windowed kernel (ops/pallas/wconv.py) over voxel rows. The pillar layout
becomes attractive again only with a column-granular Pallas gather.

This replaces the same reference component (spconv, scn.py:92-189) as
ops/sparse.py — it is an execution plan, not a different model: parameters
keep the [K, Cin, Cout] layout with row-major (dz, dy, dx) kernel offsets.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .sparse import SENTINEL, SparseGrid


class PillarSet(NamedTuple):
    """Static-shape sorted BEV pillar index set.

    ids: [P] int32, sorted ascending, SENTINEL-padded; id = (b*H + y)*W + x.
    shape: python tuple (B, H, W); depth: static z extent D of the columns.
    """

    ids: jnp.ndarray
    shape: Tuple[int, int, int]
    depth: int

    @property
    def mask(self) -> jnp.ndarray:
        return self.ids < SENTINEL

    @property
    def capacity(self) -> int:
        return self.ids.shape[0]


def pillars_from_grid(grid: SparseGrid, features: jnp.ndarray, capacity: int):
    """Re-lay a sorted z-minor SparseGrid as pillar columns.

    grid.ids are z-minor (((b*H + y)*W + x)*D + z), so pillar ids = ids // D
    are already sorted — no new sort. Returns (pillars, cols [P, D, C],
    occ [P, D] float mask).
    """
    b, d, h, w = grid.shape
    n = grid.capacity
    pid = jnp.where(grid.mask, grid.ids // d, SENTINEL)
    z = grid.ids % d
    is_new = jnp.concatenate([grid.mask[:1], pid[1:] != pid[:-1]]) & grid.mask
    prow = jnp.cumsum(is_new) - 1  # [N] pillar row per voxel
    ok = grid.mask & (prow < capacity)

    ids = jnp.full((capacity + 1,), SENTINEL, dtype=jnp.int32)
    ids = ids.at[jnp.where(is_new & ok, prow, capacity)].set(pid)[:capacity]

    c = features.shape[-1]
    dest = jnp.where(ok, prow * d + z, capacity * d)
    cols = jnp.zeros((capacity * d + 1, c), features.dtype)
    cols = cols.at[dest].set(jnp.where(ok[:, None], features, 0.0))[:-1]
    occ = jnp.zeros((capacity * d + 1,), features.dtype)
    occ = occ.at[dest].set(jnp.where(ok, 1.0, 0.0))[:-1]
    return (PillarSet(ids=ids, shape=(b, h, w), depth=d),
            cols.reshape(capacity, d, c), occ.reshape(capacity, d))


def _bev_lut(pillars: PillarSet) -> jnp.ndarray:
    """Dense BEV id -> pillar row LUT (capacity = miss)."""
    b, h, w = pillars.shape
    total = b * h * w
    cap = pillars.capacity
    dt = jnp.int16 if cap < 2 ** 15 - 1 else jnp.int32
    lut = jnp.full((total + 1,), cap, dtype=dt)
    sid = jnp.where(pillars.mask, pillars.ids, total)
    return lut.at[sid].set(jnp.arange(cap, dtype=dt))[:total]


def _kernel_offsets_2d(kernel: Tuple[int, int]) -> np.ndarray:
    kh, kw = kernel
    yy, xx = np.meshgrid(np.arange(kh), np.arange(kw), indexing="ij")
    return np.stack([yy.ravel(), xx.ravel()], 1).astype(np.int32)


def bev_rulebook(in_pillars: PillarSet, out_pillars: PillarSet | None = None,
                 kernel=(3, 3), stride=(1, 1), padding=(1, 1)) -> jnp.ndarray:
    """[P_out, KhKw] gather rows into the input pillar array (cap = miss).

    For submanifold convs (out_pillars=None) the offsets are centered; for
    strided convs, output site o reads input i = o*s - p + k per axis —
    the same coordinate rule as ops/sparse.downsample_rulebook.
    """
    b, h, w = in_pillars.shape
    offs = _kernel_offsets_2d(kernel)
    if out_pillars is None:
        out_pillars = in_pillars
        offs = offs - (np.asarray(kernel, np.int32) - 1) // 2
        sy = sx = 1
        py = px = 0
        oh, ow = h, w
    else:
        sy, sx = stride
        py, px = padding
        _, oh, ow = out_pillars.shape

    oid = out_pillars.ids
    ox = oid % ow
    oy = (oid // ow) % oh
    ob = oid // (ow * oh)
    iy = oy[:, None] * sy - py + offs[None, :, 0]
    ix = ox[:, None] * sx - px + offs[None, :, 1]
    inb = ((iy >= 0) & (iy < h) & (ix >= 0) & (ix < w)
           & out_pillars.mask[:, None])
    qid = (ob[:, None] * h + iy) * w + ix
    lut = _bev_lut(in_pillars)
    safe = jnp.where(inb, qid, 0)
    return jnp.where(inb, lut[safe].astype(jnp.int32), in_pillars.capacity)


def downsample_pillars(pillars: PillarSet, kernel=(3, 3), stride=(2, 2),
                       padding=(1, 1), out_capacity: int | None = None,
                       out_depth: int | None = None) -> PillarSet:
    """Strided-conv output pillar set (xy only; z downsampling happens
    inside pillar_conv). A BEV output site exists iff its window covers at
    least one input pillar and lies inside the strided output extent."""
    b, h, w = pillars.shape
    kh, kw = kernel
    sy, sx = stride
    py, px = padding
    oh = (h + 2 * py - kh) // sy + 1
    ow = (w + 2 * px - kw) // sx + 1
    out_capacity = out_capacity or pillars.capacity
    offs = _kernel_offsets_2d(kernel)

    x = pillars.ids % w
    y = (pillars.ids // w) % h
    bb = pillars.ids // (w * h)

    def axis_out(inp, k_off, s, p, odim):
        num = inp + p - k_off
        ok = (num % s == 0) & (num >= 0)
        o = num // s
        return o, ok & (o >= 0) & (o < odim)

    oy, oky = axis_out(y[:, None], offs[None, :, 0], sy, py, oh)
    ox, okx = axis_out(x[:, None], offs[None, :, 1], sx, px, ow)
    ok = oky & okx & pillars.mask[:, None]
    cand = jnp.where(ok, (bb[:, None] * oh + oy) * ow + ox, SENTINEL).reshape(-1)

    cs = jnp.sort(cand)
    is_new = jnp.concatenate([jnp.array([True]), cs[1:] != cs[:-1]]) & (cs < SENTINEL)
    pos = jnp.cumsum(is_new) - 1
    dest = jnp.where(is_new & (pos < out_capacity), pos, out_capacity)
    out_ids = jnp.full((out_capacity + 1,), SENTINEL, dtype=jnp.int32)
    out_ids = out_ids.at[dest].set(cs)[:out_capacity]
    return PillarSet(ids=out_ids, shape=(b, oh, ow),
                     depth=out_depth if out_depth is not None else pillars.depth)


def reorder_kernel(weights: jnp.ndarray, kernel_shape: Tuple[int, int, int]):
    """[kd*kh*kw, Cin, Cout] row-major (dz, dy, dx) -> [kh*kw, kd, Cin, Cout]
    so the gathered-neighbor axis (dy, dx) leads and z-taps follow."""
    kd, kh, kw = kernel_shape
    cin, cout = weights.shape[1], weights.shape[2]
    w5 = weights.reshape(kd, kh, kw, cin, cout)
    return jnp.transpose(w5, (1, 2, 0, 3, 4)).reshape(kh * kw, kd, cin, cout)


def pillar_conv(cols: jnp.ndarray, rulebook: jnp.ndarray, weights: jnp.ndarray,
                kernel_shape: Tuple[int, int, int] = (3, 3, 3),
                z_stride: int = 1, z_pad: int = 1,
                occ: jnp.ndarray | None = None):
    """Sparse 3D conv over pillar columns.

    cols: [P_in, D, Cin] (zeros at unoccupied sites — the submanifold
    invariant); rulebook: [P_out, KhKw] rows into cols (P_in = miss);
    weights: [kd*kh*kw, Cin, Cout] in the backbone's row-major (dz, dy, dx)
    layout. If ``occ`` ([P_in, D]) is given, it rides the gather as an extra
    ones-weighted channel and the covered-output mask [P_out, D_out]
    (spconv's strided-output existence rule) is returned alongside.

    Returns out [P_out, D_out, Cout] (unmasked) or (out, cover) with occ.
    """
    p_in, d, cin = cols.shape
    kd, kh, kw = kernel_shape
    cout = weights.shape[-1]
    w = reorder_kernel(weights, kernel_shape)  # [KhKw, kd, Cin, Cout]

    src = cols
    if occ is not None:
        src = jnp.concatenate([cols, occ[..., None].astype(cols.dtype)], -1)
    padded = jnp.concatenate(
        [src, jnp.zeros((1,) + src.shape[1:], src.dtype)], axis=0)
    g = padded[rulebook]  # [P_out, KhKw, D, Cin(+1)]
    if z_pad:
        g = jnp.pad(g, ((0, 0), (0, 0), (z_pad, z_pad), (0, 0)))

    if occ is not None:
        # occ channel feeds no real output; cover output reads only occ
        w_ext = jnp.concatenate(
            [w, jnp.zeros((kh * kw, kd, 1, cout), w.dtype)], axis=2)
        cover_col = jnp.concatenate(
            [jnp.zeros((kh * kw, kd, cin, 1), w.dtype),
             jnp.ones((kh * kw, kd, 1, 1), w.dtype)], axis=2)
        w = jnp.concatenate([w_ext, cover_col], axis=-1)  # [.., Cin+1, Cout+1]

    out = jax.lax.conv_general_dilated(
        g, w, window_strides=(1, z_stride), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )[:, 0].astype(cols.dtype)  # [P_out, D_out, Cout(+1)]

    if occ is not None:
        return out[..., :cout], (out[..., cout] > 0.5).astype(cols.dtype)
    return out


def pillar_to_dense(cols: jnp.ndarray, pillars: PillarSet) -> jnp.ndarray:
    """Scatter pillar columns into a dense [B, D, H, W, C] grid."""
    b, h, w = pillars.shape
    p, d, c = cols.shape
    total = b * h * w
    idx = jnp.where(pillars.mask, pillars.ids, total)
    dense = jnp.zeros((total + 1, d * c), cols.dtype)
    dense = dense.at[idx].set(
        jnp.where(pillars.mask[:, None], cols.reshape(p, d * c), 0.0))
    dense = dense[:total].reshape(b, h, w, d, c)
    return jnp.transpose(dense, (0, 3, 1, 2, 4))
