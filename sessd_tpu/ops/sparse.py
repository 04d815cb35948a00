"""TPU-native sparse 3D convolution engine — the spconv replacement.

The reference's backbone (det3d/models/backbones/scn.py:92-189) runs on the
spconv CUDA library (SubMConv3d / SparseConv3d with indice-key rulebook
caching). This module re-designs that for XLA:

- A sparse tensor is (features [N, C], ids [N]) where ids are linearized
  ``((b*H + y)*W + x)*D + z`` (z-minor) voxel coordinates, **sorted ascending**, with
  ``SENTINEL`` (int32 max) marking padding rows. All shapes are static.
- Rulebooks are built **on device** with vectorized ``searchsorted`` over the
  sorted ids — no dense occupancy grid, no host round-trip, no CUDA hash
  tables. A rulebook is just an int32 gather map [N_out, K] into the input
  rows (missing neighbors point at a zero row).
- The convolution itself is gather + one MXU matmul:
  ``gathered [N, K*Cin] @ W [K*Cin, Cout]`` — an implicit GEMM, which is the
  shape XLA tiles best on TPU.
- Submanifold convs at the same resolution share one rulebook (the
  functional analogue of spconv's ``indice_key``).

Strided ("spatial") sparse conv follows spconv's output-coordinate rule:
an output site exists iff its kernel window covers >= 1 input voxel and it
lies inside ``out_dim = floor((in + 2*pad - k)/stride) + 1``. Output sets are
computed by candidate generation + sort/unique-compaction to a fixed cap.
"""
from __future__ import annotations

from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

SENTINEL = np.int32(np.iinfo(np.int32).max)


class SparseGrid(NamedTuple):
    """Static-shape sparse voxel index set.

    ids: [N] int32, sorted ascending, SENTINEL-padded.
    shape: python tuple (B, D, H, W) — static.
    """

    ids: jnp.ndarray
    shape: Tuple[int, int, int, int]

    @property
    def mask(self) -> jnp.ndarray:
        return self.ids < SENTINEL

    @property
    def capacity(self) -> int:
        return self.ids.shape[0]


def linearize(coords_bzyx: jnp.ndarray, shape) -> jnp.ndarray:
    """[N, 4] (b, z, y, x) int coords -> linear ids.

    Z-MINOR order (b, y, x, z): spatially neighboring voxels — including
    depth neighbors — sit close together in the sorted id sequence, which
    keeps the per-block source spans of rulebook columns small (the property
    the windowed one-hot conv relies on). With z-major order a dz=+-1
    neighbor lives a whole z-slice away (~half the list for ground-heavy
    lidar scenes).
    """
    b, d, h, w = shape
    c = coords_bzyx
    return ((c[..., 0] * h + c[..., 2]) * w + c[..., 3]) * d + c[..., 1]


def delinearize(ids: jnp.ndarray, shape):
    """linear ids -> (b, z, y, x); garbage for SENTINEL rows (mask them)."""
    b, d, h, w = shape
    z = ids % d
    x = (ids // d) % w
    y = (ids // (d * w)) % h
    bb = ids // (d * w * h)
    return bb, z, y, x


def grid_from_coords(coords_bzyx: jnp.ndarray, valid: jnp.ndarray, shape,
                     capacity: int | None = None):
    """Build a sorted SparseGrid (+ row permutation) from (b, z, y, x) coords.

    Returns (grid, perm) where ``perm`` gathers the *input rows* into grid
    order: features_sorted = features[perm] (padding rows gather row 0 and
    must be masked by grid.mask).
    """
    n = coords_bzyx.shape[0]
    capacity = capacity or n
    assert int(np.prod(shape)) < 2 ** 31, "int32 id space overflow"
    ids = jnp.where(valid, linearize(coords_bzyx, shape), SENTINEL)
    order = jnp.argsort(ids, stable=True)
    ids_sorted = ids[order][:capacity]
    if ids_sorted.shape[0] < capacity:  # pad up to the static capacity
        pad = capacity - ids_sorted.shape[0]
        ids_sorted = jnp.concatenate(
            [ids_sorted, jnp.full((pad,), SENTINEL, dtype=ids_sorted.dtype)])
        order = jnp.concatenate([order, jnp.zeros((pad,), order.dtype)])
    return SparseGrid(ids=ids_sorted, shape=shape), order[:capacity]


def _kernel_offsets(kernel: Sequence[int]) -> np.ndarray:
    """[K, 3] (dz, dy, dx) offsets in row-major order."""
    kd, kh, kw = kernel
    zz, yy, xx = np.meshgrid(np.arange(kd), np.arange(kh), np.arange(kw), indexing="ij")
    return np.stack([zz.ravel(), yy.ravel(), xx.ravel()], axis=1).astype(np.int32)


# dense occupancy-LUT lookups beat searchsorted when the LUT fits a memory
# budget: memset+scatter+gather vs a 500k-element co-sort + verify gather
LUT_BUDGET_BYTES = 2 * 1024 ** 3


def _lookup(grid: SparseGrid, nid: jnp.ndarray, inb: jnp.ndarray) -> jnp.ndarray:
    """Map neighbor ids [N, K] -> input rows (grid.capacity = miss)."""
    total = int(np.prod(grid.shape))
    # int16 halves LUT memset+gather bytes when row indices fit
    dt = jnp.int16 if grid.capacity < 2 ** 15 - 1 else jnp.int32
    isize = 2 if dt == jnp.int16 else 4
    if total * isize <= LUT_BUDGET_BYTES:
        # dense LUT: one scatter of the N active rows, one gather of the
        # N*K queries — no sorts, no separate verification pass
        lut = jnp.full((total + 1,), grid.capacity, dtype=dt)
        sid = jnp.where(grid.mask, grid.ids, total)
        lut = lut.at[sid].set(jnp.arange(grid.capacity, dtype=dt))[:total]
        safe = jnp.where(inb, nid, 0)
        return jnp.where(inb, lut[safe].astype(jnp.int32), grid.capacity)
    # sorted-id binary search fallback for giant grids; method='sort' (one
    # co-sort) is ~5x faster than the default binary-scan lowering on TPU
    q = jnp.where(inb, nid, SENTINEL)
    pos = jnp.searchsorted(grid.ids, q.reshape(-1), method="sort").reshape(q.shape)
    pos = jnp.clip(pos, 0, grid.capacity - 1)
    hit = (grid.ids[pos] == q) & inb
    return jnp.where(hit, pos, grid.capacity)


def subm_rulebook(grid: SparseGrid, kernel=(3, 3, 3)) -> jnp.ndarray:
    """Submanifold rulebook: [N, K] gather rows (capacity row = missing).

    Output sites == input sites (SubMConv3d semantics); neighbor k of voxel
    n is the voxel at ``coord + offset_k - kernel//2``, resolved by a dense
    occupancy LUT (or sorted-id binary search for giant grids).
    """
    b, d, h, w = grid.shape
    offs = _kernel_offsets(kernel)
    center = (np.asarray(kernel, dtype=np.int32) - 1) // 2
    offs = offs - center  # [K, 3] centered (dz, dy, dx)

    bb, z, y, x = delinearize(grid.ids, grid.shape)
    nz = z[:, None] + offs[None, :, 0]  # [N, K]
    ny = y[:, None] + offs[None, :, 1]
    nx = x[:, None] + offs[None, :, 2]
    inb = (
        (nz >= 0) & (nz < d) & (ny >= 0) & (ny < h) & (nx >= 0) & (nx < w)
        & grid.mask[:, None]
    )
    nid = ((bb[:, None] * h + ny) * w + nx) * d + nz
    return _lookup(grid, nid, inb)


def sparse_conv_apply(features: jnp.ndarray, rulebook: jnp.ndarray,
                      weights: jnp.ndarray, out_mask: jnp.ndarray) -> jnp.ndarray:
    """Implicit-GEMM sparse conv (plain dynamic-gather formulation).

    features: [N_in, Cin]; rulebook: [N_out, K] rows into features
    (N_in == missing); weights: [K, Cin, Cout]. Returns [N_out, Cout].
    """
    n_in, cin = features.shape
    k = rulebook.shape[1]
    cout = weights.shape[-1]
    padded = jnp.concatenate([features, jnp.zeros((1, cin), features.dtype)], axis=0)
    gathered = padded[rulebook]  # [N_out, K, Cin]
    out = jax.lax.dot_general(
        gathered.reshape(-1, k * cin),
        weights.reshape(k * cin, cout),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return jnp.where(out_mask[:, None], out, 0.0).astype(features.dtype)


def sparse_conv_apply_windowed(
    features: jnp.ndarray, rulebook: jnp.ndarray, weights: jnp.ndarray,
    out_mask: jnp.ndarray, *, block: int = 128, window: int = 1024,
) -> jnp.ndarray:
    """Sparse conv via windowed one-hot MXU matmuls instead of dynamic gathers.

    XLA's dynamic gather costs ~7 ns/row on TPU (scalar core), making the
    implicit-GEMM gather the forward bottleneck. This formulation exploits a
    structural property of our rulebooks: with sorted voxel ids, each kernel
    -offset column of the rulebook is MONOTONE over output rows — so the K
    source rows feeding a block of `block` consecutive outputs live in a
    small contiguous index window. Per (offset, block): dynamic-slice the
    [window, Cin] span (a contiguous chunk copy, fast) and multiply by a
    one-hot [block, window] selector on the MXU.

    Exactness: if any block's span exceeds `window` (possible only for
    pathological voxel distributions), lax.cond falls back to the plain
    gather path for the whole conv — results are always exact.
    """
    n_in, cin = features.shape
    n_out, k = rulebook.shape
    cout = weights.shape[-1]
    if n_in + 1 <= window:
        return sparse_conv_apply(features, rulebook, weights, out_mask)
    n_pad = (n_out + block - 1) // block * block
    rb = jnp.pad(rulebook, ((0, n_pad - n_out), (0, 0)),
                 constant_values=n_in)  # pad rows = miss
    nblocks = n_pad // block

    padded = jnp.concatenate([features, jnp.zeros((1, cin), features.dtype)], axis=0)

    idx = rb.T.reshape(k, nblocks, block)  # [K, nb, B]
    valid = idx < n_in
    big = jnp.int32(n_in + window)
    lo = jnp.min(jnp.where(valid, idx, big), axis=-1)  # [K, nb]
    hi = jnp.max(jnp.where(valid, idx, -1), axis=-1)
    has = jnp.any(valid, axis=-1)
    lo = jnp.where(has, lo, 0)
    span_ok = jnp.all(jnp.where(has, hi - lo < window, True))
    lo = jnp.clip(lo, 0, n_in + 1 - window)

    iota_w = jnp.arange(window)

    def fast(_):
        # one batched matmul over all (offset, block) pairs — no scan
        win = jax.vmap(jax.vmap(
            lambda l: jax.lax.dynamic_slice(padded, (l, 0), (window, cin))
        ))(lo)  # [K, nb, W, Cin]
        rel = idx - lo[..., None]  # [K, nb, B]
        onehot = ((rel[..., None] == iota_w) & valid[..., None]).astype(
            features.dtype)  # [K, nb, B, W]
        gathered = jax.lax.dot_general(
            onehot.reshape(k * nblocks, block, window),
            win.reshape(k * nblocks, window, cin),
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).astype(features.dtype)  # [K*nb, B, Cin]
        g = gathered.reshape(k, n_pad, cin).transpose(1, 0, 2).reshape(
            n_pad, k * cin)
        out = jax.lax.dot_general(
            g, weights.reshape(k * cin, cout),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return out[:n_out]

    def slow(_):
        gathered = padded[rulebook]
        return jax.lax.dot_general(
            gathered.reshape(-1, k * cin), weights.reshape(k * cin, cout),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    out = jax.lax.cond(span_ok, fast, slow, None)
    return jnp.where(out_mask[:, None], out, 0.0).astype(features.dtype)


def _conv_out_dim(in_dim: int, k: int, s: int, p: int) -> int:
    return (in_dim + 2 * p - k) // s + 1


def downsample_out_shape(shape, kernel, stride, padding):
    """Static output grid shape of a strided sparse conv (B unchanged)."""
    b, d, h, w = shape
    return (b,
            _conv_out_dim(d, kernel[0], stride[0], padding[0]),
            _conv_out_dim(h, kernel[1], stride[1], padding[1]),
            _conv_out_dim(w, kernel[2], stride[2], padding[2]))


def downsample_rulebook(
    grid: SparseGrid,
    kernel=(3, 3, 3),
    stride=(2, 2, 2),
    padding=(1, 1, 1),
    out_capacity: int | None = None,
):
    """Strided sparse conv coordinate generation + rulebook.

    Returns (out_grid, rulebook [M, K]) with out_grid over the downsampled
    shape. Matches spconv SparseConv3d coordinate semantics: output site o
    (per axis) receives input i = o*s - p + k_off, and o exists iff any
    covered i is active and o is in bounds.
    """
    b, d, h, w = grid.shape
    kd, kh, kw = kernel
    sd, sh, sw = stride
    pd, ph, pw = padding
    od, oh, ow = (_conv_out_dim(d, kd, sd, pd), _conv_out_dim(h, kh, sh, ph),
                  _conv_out_dim(w, kw, sw, pw))
    out_shape = (b, od, oh, ow)
    out_capacity = out_capacity or grid.capacity
    offs = _kernel_offsets(kernel)  # [K, 3] in 0..k-1

    bb, z, y, x = delinearize(grid.ids, grid.shape)

    def axis_out(inp, k_off, s, p, odim):
        num = inp + p - k_off
        ok = (num % s == 0) & (num >= 0)
        o = num // s
        ok = ok & (o >= 0) & (o < odim)
        return o, ok

    oz, okz = axis_out(z[:, None], offs[None, :, 0], sd, pd, od)
    oy, oky = axis_out(y[:, None], offs[None, :, 1], sh, ph, oh)
    ox, okx = axis_out(x[:, None], offs[None, :, 2], sw, pw, ow)
    ok = okz & oky & okx & grid.mask[:, None]  # [N, K]
    cand = ((bb[:, None] * oh + oy) * ow + ox) * od + oz
    cand = jnp.where(ok, cand, SENTINEL).reshape(-1)  # [N*K]

    # unique + compact to fixed capacity (sorted order preserved)
    cs = jnp.sort(cand)
    is_new = jnp.concatenate([jnp.array([True]), cs[1:] != cs[:-1]]) & (cs < SENTINEL)
    pos = jnp.cumsum(is_new) - 1
    dest = jnp.where(is_new & (pos < out_capacity), pos, out_capacity)
    out_ids = jnp.full((out_capacity + 1,), SENTINEL, dtype=jnp.int32)
    out_ids = out_ids.at[dest].set(cs)[:out_capacity]
    out_grid = SparseGrid(ids=out_ids, shape=out_shape)

    # reverse rulebook: input row feeding output o at kernel offset k is
    # i = o*s - p + k_off per axis
    obb, ozz, oyy, oxx = delinearize(out_grid.ids, out_shape)
    iz = ozz[:, None] * sd - pd + offs[None, :, 0]
    iy = oyy[:, None] * sh - ph + offs[None, :, 1]
    ix = oxx[:, None] * sw - pw + offs[None, :, 2]
    inb = (
        (iz >= 0) & (iz < d) & (iy >= 0) & (iy < h) & (ix >= 0) & (ix < w)
        & out_grid.mask[:, None]
    )
    iid = ((obb[:, None] * h + iy) * w + ix) * d + iz
    rulebook = _lookup(grid, iid, inb)
    return out_grid, rulebook


def to_dense(features: jnp.ndarray, grid: SparseGrid) -> jnp.ndarray:
    """Scatter [N, C] features into a dense [B, D, H, W, C] grid."""
    b, d, h, w = grid.shape
    c = features.shape[-1]
    total = b * d * h * w
    # grid ids are z-minor; the dense layout is [B, D, H, W] (z-major)
    bb, z, y, x = delinearize(grid.ids, grid.shape)
    std = ((bb * d + z) * h + y) * w + x
    flat_idx = jnp.where(grid.mask, std, total)
    dense = jnp.zeros((total + 1, c), dtype=features.dtype)
    dense = dense.at[flat_idx].set(jnp.where(grid.mask[:, None], features, 0.0))
    return dense[:total].reshape(b, d, h, w, c)
