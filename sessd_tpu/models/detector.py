"""VoxelNet detector assembly (detectors/voxelnet_sessd.py:5-43).

reader (mean VFE) -> sparse middle backbone -> SSFA neck -> multi-group head.
The module is purely functional feature extraction; the SE-SSD training
semantics (teacher on raw voxels, student on augmented ones, EMA) live in
the jitted train step — there is no ``is_ema`` flag because teacher and
student are just two parameter pytrees applied to two input pytrees.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from .backbone import SpMiddleFHD
from .head import MultiGroupHead
from .ssfa import SSFA
from .vfe import VoxelFeatureExtractorV3


class VoxelNet(nn.Module):
    num_input_features: int = 4
    sparse_shape: Tuple[int, int, int] = (41, 1600, 1408)
    tasks: Sequence[dict] = (dict(num_class=1, class_names=("Car",)),)
    use_norm: bool = True
    axis_name: Optional[str] = None
    dtype: jnp.dtype = jnp.float32
    stage_capacity: Tuple[int, ...] = (20000, 22000, 18000, 12000, 8000)
    dense_from_stage: int = 2
    conv_impl: str = "auto"
    # per-stage Pallas window overrides (None = backbone defaults)
    subm_windows: tuple = None
    down_windows: tuple = None
    subm_windows_small: tuple = None
    down_windows_small: tuple = None
    fused_block: int = 0  # pallas grid block override (0 = backbone default)
    patch_max: int = 0  # patch-kernel capacity override (0 = backbone default)
    # rematerialize backbone blocks in backward (required for f32 batch-4 on
    # 16G HBM; bf16 compute fits without it and steps faster)
    backbone_remat: bool = True

    @nn.compact
    def __call__(self, voxels, coords_bzyx, num_points, valid, batch_size: int,
                 train: bool = False, rulebooks=None):
        """Returns the list of per-task prediction dicts.

        voxels: [B*V, P, F]; coords_bzyx: [B*V, 4]; num_points: [B*V];
        valid: [B*V] bool. ``rulebooks``: optional host-precomputed rulebook
        chain (see SpMiddleFHD) — skips all device rulebook construction.
        """
        feats = VoxelFeatureExtractorV3(self.num_input_features, dtype=self.dtype)(
            voxels, num_points)
        bev = SpMiddleFHD(
            num_input_features=self.num_input_features,
            use_norm=self.use_norm,
            axis_name=self.axis_name,
            dtype=self.dtype,
            stage_capacity=self.stage_capacity,
            dense_from_stage=self.dense_from_stage,
            conv_impl=self.conv_impl,
            remat=self.backbone_remat,
            name="backbone",
            **({"subm_windows": tuple(self.subm_windows)}
               if self.subm_windows else {}),
            **({"down_windows": tuple(self.down_windows)}
               if self.down_windows else {}),
            **({"subm_windows_small": tuple(self.subm_windows_small)}
               if self.subm_windows_small else {}),
            **({"down_windows_small": tuple(self.down_windows_small)}
               if self.down_windows_small else {}),
            **({"fused_block": self.fused_block} if self.fused_block else {}),
            **({"patch_max": self.patch_max} if self.patch_max else {}),
        )(feats, coords_bzyx, valid, batch_size, self.sparse_shape, train,
          rulebooks=rulebooks)
        bev = SSFA(axis_name=self.axis_name, dtype=self.dtype, name="neck")(bev, train)
        preds = MultiGroupHead(tasks=tuple(self.tasks), dtype=self.dtype, name="head")(bev)
        return preds
