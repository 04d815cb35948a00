"""PointPillars family (readers/pillar_encoder.py:17-230, necks/rpn_v1.py:24-116).

PillarFeatureNet decorates each pillar's points with cluster- and
center-offsets, runs PFN layers (linear+BN+relu+max), and the scatter stage
writes pillar features into a dense BEV canvas. The RPN neck is the classic
multi-scale conv/deconv stack. All NHWC, static-capacity, mask-aware.

Note: the reference's ``f_center`` decoration drops the point coordinates
(pillar_encoder.py:129-136 zeroes them), and its PFN max-pool runs over the
PADDED point rows (the decorated features are masked once before the PFN,
pillar_encoder.py:147-151, but after linear+BN+relu the padded rows carry
the BN affine of zero and participate in the max). We implement the standard
PointPillars decoration (point minus pillar center) and a mask-exact max by
default — ``ref_compat=True`` reproduces both reference quirks bit-exactly
(golden-tested against the reference's own torch modules in
tests/test_pillars_goldens.py).
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from .layers import ConvBnRelu, MaskedBatchNorm
from .head import MultiGroupHead


class PFNLayer(nn.Module):
    units: int
    last: bool = True
    axis_name: Optional[str] = None
    dtype: jnp.dtype = jnp.float32
    # reproduce the reference's unmasked max-pool (pillar_encoder.py:51):
    # padded rows carry relu(BN(0)) and participate in the max
    ref_compat: bool = False

    @nn.compact
    def __call__(self, x, point_mask, pillar_mask, train: bool):
        """x: [V, P, C]; point_mask: [V, P]; pillar_mask: [V]."""
        v, p, _ = x.shape
        units = self.units if self.last else self.units // 2
        x = nn.Dense(units, use_bias=False, dtype=self.dtype)(x)
        flat_mask = (point_mask & pillar_mask[:, None]).reshape(v * p)
        x = MaskedBatchNorm(axis_name=self.axis_name, dtype=self.dtype)(
            x.reshape(v * p, units), flat_mask, train).reshape(v, p, units)
        x = nn.relu(x)
        if self.ref_compat:
            x_max = jnp.max(x, axis=1, keepdims=True)
        else:
            x = jnp.where(point_mask[..., None], x, -jnp.inf)
            x_max = jnp.max(x, axis=1, keepdims=True)
            x_max = jnp.where(jnp.isfinite(x_max), x_max, 0.0)
        if self.last:
            return x_max[:, 0, :]
        x = jnp.where(point_mask[..., None], x, 0.0)
        return jnp.concatenate([x, jnp.broadcast_to(x_max, x.shape)], axis=-1)


class PillarFeatureNet(nn.Module):
    num_input_features: int = 4
    num_filters: Tuple[int, ...] = (64,)
    voxel_size: Tuple[float, float] = (0.2, 0.2)
    pc_range: Tuple[float, ...] = (0.0, -40.0, -3.0, 70.4, 40.0, 1.0)
    axis_name: Optional[str] = None
    dtype: jnp.dtype = jnp.float32
    # reproduce the reference's f_center quirk (pillar_encoder.py:129-136:
    # the point xy is zeroed, leaving just the negated pillar center) and
    # its unmasked PFN max-pool
    ref_compat: bool = False

    @nn.compact
    def __call__(self, voxels, num_points, coords_bzyx, pillar_mask, train: bool = False):
        """voxels [V, P, F], num_points [V], coords (b, z, y, x) -> [V, C]."""
        v, p, _ = voxels.shape
        point_mask = jnp.arange(p)[None, :] < num_points[:, None]
        pm = point_mask[..., None].astype(voxels.dtype)

        cnt = jnp.maximum(num_points, 1).astype(voxels.dtype)[:, None, None]
        mean = jnp.sum(voxels[:, :, :3] * pm, axis=1, keepdims=True) / cnt
        f_cluster = voxels[:, :, :3] - mean

        vx, vy = self.voxel_size
        px = coords_bzyx[:, 3].astype(voxels.dtype) * vx + (vx / 2 + self.pc_range[0])
        py = coords_bzyx[:, 2].astype(voxels.dtype) * vy + (vy / 2 + self.pc_range[1])
        if self.ref_compat:
            zero = jnp.zeros_like(voxels[:, :, 0])
            f_center = jnp.stack(
                [zero - px[:, None], zero - py[:, None]], axis=-1)
        else:
            f_center = jnp.stack(
                [voxels[:, :, 0] - px[:, None], voxels[:, :, 1] - py[:, None]], axis=-1)

        x = jnp.concatenate(
            [voxels[:, :, : self.num_input_features], f_cluster, f_center], axis=-1)
        x = x * pm

        for i, f in enumerate(self.num_filters):
            x = PFNLayer(f, last=(i == len(self.num_filters) - 1),
                         axis_name=self.axis_name, dtype=self.dtype,
                         ref_compat=self.ref_compat)(
                x, point_mask, pillar_mask, train)
        return jnp.where(pillar_mask[:, None], x, 0.0)


def pillar_scatter(features, coords_bzyx, pillar_mask, batch_size: int, ny: int, nx: int):
    """Scatter [V, C] pillar features into [B, ny, nx, C] (PointPillarsScatter)."""
    c = features.shape[-1]
    flat = coords_bzyx[:, 0] * (ny * nx) + coords_bzyx[:, 2] * nx + coords_bzyx[:, 3]
    total = batch_size * ny * nx
    flat = jnp.where(pillar_mask, flat, total)
    canvas = jnp.zeros((total + 1, c), features.dtype)
    canvas = canvas.at[flat].set(jnp.where(pillar_mask[:, None], features, 0.0))
    return canvas[:total].reshape(batch_size, ny, nx, c)


class RPN(nn.Module):
    """Multi-scale conv/deconv neck (necks/rpn_v1.py:24-116)."""

    layer_nums: Tuple[int, ...] = (3, 5, 5)
    ds_strides: Tuple[int, ...] = (2, 2, 2)
    ds_filters: Tuple[int, ...] = (64, 128, 256)
    us_strides: Tuple[int, ...] = (1, 2, 4)
    us_filters: Tuple[int, ...] = (128, 128, 128)
    axis_name: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(axis_name=self.axis_name, dtype=self.dtype)
        ups = []
        for i, n in enumerate(self.layer_nums):
            x = ConvBnRelu(self.ds_filters[i], (3, 3),
                           strides=(self.ds_strides[i],) * 2, **kw)(x, train)
            for _ in range(n):
                x = ConvBnRelu(self.ds_filters[i], (3, 3), **kw)(x, train)
            s = self.us_strides[i]
            if s > 1:
                up = ConvBnRelu(self.us_filters[i], (s, s), strides=(s, s),
                                transpose=True, **kw)(x, train)
            else:
                up = ConvBnRelu(self.us_filters[i], (1, 1), **kw)(x, train)
            ups.append(up)
        return jnp.concatenate(ups, axis=-1)


class PointPillars(nn.Module):
    """Full PointPillars detector (detectors/point_pillars.py:5-54)."""

    num_input_features: int = 4
    grid_size: Tuple[int, int] = (496, 432)  # (ny, nx)
    voxel_size: Tuple[float, float] = (0.16, 0.16)
    pc_range: Tuple[float, ...] = (0.0, -39.68, -3.0, 69.12, 39.68, 1.0)
    tasks: Sequence[dict] = (dict(num_class=1, class_names=("Car",)),)
    axis_name: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, voxels, coords_bzyx, num_points, valid, batch_size: int,
                 train: bool = False):
        feats = PillarFeatureNet(
            num_input_features=self.num_input_features,
            voxel_size=self.voxel_size, pc_range=self.pc_range,
            axis_name=self.axis_name, dtype=self.dtype, name="reader",
        )(voxels, num_points, coords_bzyx, valid, train)
        ny, nx = self.grid_size
        bev = pillar_scatter(feats, coords_bzyx, valid, batch_size, ny, nx)
        bev = RPN(axis_name=self.axis_name, dtype=self.dtype, name="neck")(bev, train)
        return MultiGroupHead(tasks=tuple(self.tasks), dtype=self.dtype, name="head")(bev)
