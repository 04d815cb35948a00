"""Voxel feature encoders (readers).

``VoxelFeatureExtractorV3`` — parameter-free per-voxel point mean
(readers/voxel_encoder.py:197-210): features = sum(points) / num_points.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn


class VoxelFeatureExtractorV3(nn.Module):
    """Mean of the (up to max_points) points in each voxel.

    voxels: [V, P, F]; num_points: [V] -> [V, num_input_features].
    """

    num_input_features: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, voxels: jnp.ndarray, num_points: jnp.ndarray) -> jnp.ndarray:
        s = jnp.sum(voxels[:, :, : self.num_input_features], axis=1)
        denom = jnp.maximum(num_points, 1).astype(voxels.dtype)[:, None]
        return (s / denom).astype(self.dtype)
