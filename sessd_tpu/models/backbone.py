"""Sparse 3D middle backbone — TPU re-design of SpMiddleFHD (scn.py:92-189).

Stage plan (channels / resolution, input sparse shape (41, 1600, 1408)):
    2 x subm(4->16, 16->16)                       @ (41, 1600, 1408)
    spconv s2 p1 (16->32), 2 x subm(32)           @ (21,  800,  704)
    spconv s2 p1 (32->64), 3 x subm(64)           @ (11,  400,  352)
    spconv s2 p(0,1,1) (64->64), 3 x subm(64)     @ ( 5,  200,  176)
    spconv k(3,1,1) s(2,1,1) (64->64)             @ ( 2,  200,  176)
    -> dense [B, 2, 200, 176, 64] -> BEV [B, 200, 176, 128]

Each resolution builds ONE rulebook shared by its submanifold convs (the
functional analogue of spconv's indice_key reuse). All capacities are static
per-stage multiples of the per-sample budget; overflowing voxels (rare) are
dropped lowest-id-last.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops import sparse as sp
from .layers import MaskedBatchNorm


def _kaiming(k, cin):
    # torch kaiming_uniform default for convs: U(-b, b), b = sqrt(6 / fan_in)
    fan_in = k * cin
    return nn.initializers.variance_scaling(2.0, "fan_in", "uniform", in_axis=-2, out_axis=-1)


class SparseConvBlock(nn.Module):
    """One sparse conv (subm or strided) + masked BN + ReLU."""

    features: int
    kernel_volume: int
    use_norm: bool = True
    use_relu: bool = True
    axis_name: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats, rulebook, out_mask, train: bool):
        cin = feats.shape[-1]
        w = self.param(
            "kernel",
            _kaiming(self.kernel_volume, cin),
            (self.kernel_volume, cin, self.features),
            jnp.float32,
        )
        x = sp.sparse_conv_apply(feats, rulebook, w.astype(self.dtype), out_mask)
        if self.use_norm:
            x = MaskedBatchNorm(axis_name=self.axis_name, dtype=self.dtype)(x, out_mask, train)
        else:
            b = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            x = x + b.astype(self.dtype)
        if self.use_relu:
            x = nn.relu(x)
        return x


class SpMiddleFHD(nn.Module):
    """Sparse middle extractor; returns BEV features [B, H, W, C*D]."""

    num_input_features: int = 4
    use_norm: bool = True
    axis_name: Optional[str] = None
    dtype: jnp.dtype = jnp.float32
    # per-sample voxel capacity at each resolution; the dilation of strided
    # sparse convs grows the active set before it shrinks
    stage_capacity: Tuple[int, ...] = (20000, 26000, 26000, 18000, 12000)

    @nn.compact
    def __call__(self, voxel_features, coords_bzyx, valid, batch_size: int,
                 sparse_shape, train: bool = False):
        """
        Args:
            voxel_features: [B*V, C] padded voxel features.
            coords_bzyx: [B*V, 4] int (batch, z, y, x).
            valid: [B*V] bool.
            sparse_shape: (D, H, W) static, e.g. (41, 1600, 1408).
        """
        d, h, w = sparse_shape
        # the stage chain needs D: d -> .. -> 2 (41 -> 21 -> 11 -> 5 -> 2)
        d3 = ((d - 1) // 2 + 1 - 1) // 2 + 1
        d4 = (d3 - 3) // 2 + 1
        assert (d4 - 3) // 2 + 1 >= 1, (
            f"sparse depth {d} collapses before the final stage; the "
            f"SpMiddleFHD geometry needs a 40+1-deep z grid (scn.py:106-149)")
        shape = (batch_size, d, h, w)
        caps = [c * batch_size for c in self.stage_capacity]

        grid, perm = sp.grid_from_coords(coords_bzyx, valid, shape, capacity=caps[0])
        x = voxel_features[perm]
        x = jnp.where(grid.mask[:, None], x, 0.0)

        def subm(x, grid, rb, feats):
            return SparseConvBlock(feats, rb.shape[1], self.use_norm,
                                   axis_name=self.axis_name, dtype=self.dtype)(
                x, rb, grid.mask, train)

        # --- stage 0 @ (41, 1600, 1408), 16ch
        rb = sp.subm_rulebook(grid)
        x = subm(x, grid, rb, 16)
        x = subm(x, grid, rb, 16)

        # --- downsample to (21, 800, 704), 32ch
        grid1, rbd = sp.downsample_rulebook(grid, (3, 3, 3), (2, 2, 2), (1, 1, 1), caps[1])
        x = SparseConvBlock(32, 27, self.use_norm, axis_name=self.axis_name,
                            dtype=self.dtype)(x, rbd, grid1.mask, train)
        rb = sp.subm_rulebook(grid1)
        x = subm(x, grid1, rb, 32)
        x = subm(x, grid1, rb, 32)

        # --- downsample to (11, 400, 352), 64ch
        grid2, rbd = sp.downsample_rulebook(grid1, (3, 3, 3), (2, 2, 2), (1, 1, 1), caps[2])
        x = SparseConvBlock(64, 27, self.use_norm, axis_name=self.axis_name,
                            dtype=self.dtype)(x, rbd, grid2.mask, train)
        rb = sp.subm_rulebook(grid2)
        x = subm(x, grid2, rb, 64)
        x = subm(x, grid2, rb, 64)
        x = subm(x, grid2, rb, 64)

        # --- downsample to (5, 200, 176) with padding (0, 1, 1) (scn.py:134)
        grid3, rbd = sp.downsample_rulebook(grid2, (3, 3, 3), (2, 2, 2), (0, 1, 1), caps[3])
        x = SparseConvBlock(64, 27, self.use_norm, axis_name=self.axis_name,
                            dtype=self.dtype)(x, rbd, grid3.mask, train)
        rb = sp.subm_rulebook(grid3)
        x = subm(x, grid3, rb, 64)
        x = subm(x, grid3, rb, 64)
        x = subm(x, grid3, rb, 64)

        # --- final z-collapse: kernel (3,1,1) stride (2,1,1) (scn.py:149)
        grid4, rbd = sp.downsample_rulebook(grid3, (3, 1, 1), (2, 1, 1), (0, 0, 0), caps[4])
        x = SparseConvBlock(64, 3, self.use_norm, axis_name=self.axis_name,
                            dtype=self.dtype)(x, rbd, grid4.mask, train)

        dense = sp.to_dense(x, grid4)  # [B, 2, H', W', 64]
        b, dd, hh, ww, c = dense.shape
        # channel order c*D + d matches the reference's [N, C, D, H, W] ->
        # [N, C*D, H, W] view (scn.py:186-188), so torch checkpoints map 1:1
        return jnp.transpose(dense, (0, 2, 3, 4, 1)).reshape(b, hh, ww, c * dd)
