"""Multi-group detection head — conv predictors (mg_head_sessd.py:425-461,
Head module mg_head_sessd.py:196-230).

Per task: 1x1 convs over the [B, H, W, 128] BEV map producing
    box:  [B, H, W, num_anchors*7]
    cls:  [B, H, W, num_anchors*num_class]
    dir:  [B, H, W, num_anchors*2]
    iou:  [B, H, W, num_anchors*1]
NHWC outputs flatten to [B, H*W*num_anchors, .] in exactly the anchor-grid
order (y, x, rot) used by the flattened anchors.

The loss/predict logic lives in sessd_tpu/train/losses.py and
sessd_tpu/models/predict.py — keeping the module purely structural.
"""
from __future__ import annotations

from dataclasses import field
from typing import Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn


class TaskHead(nn.Module):
    num_anchor_per_loc: int = 2
    num_class: int = 1
    box_code_size: int = 7
    use_dir: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> dict:
        def conv1x1(feats, name):
            return nn.Conv(feats, (1, 1), use_bias=True, dtype=self.dtype, name=name,
                           kernel_init=nn.initializers.variance_scaling(
                               2.0, "fan_in", "uniform"))(x)

        na = self.num_anchor_per_loc
        b, h, w, _ = x.shape
        out = {
            "box_preds": conv1x1(na * self.box_code_size, "conv_box").reshape(
                b, h * w * na, self.box_code_size),
            "cls_preds": conv1x1(na * self.num_class, "conv_cls").reshape(
                b, h * w * na, self.num_class),
            "iou_preds": conv1x1(na * 1, "conv_iou").reshape(b, h * w * na, 1),
        }
        if self.use_dir:
            out["dir_cls_preds"] = conv1x1(na * 2, "conv_dir").reshape(b, h * w * na, 2)
        return out


class MultiGroupHead(nn.Module):
    """List of task heads (SE-SSD runs a single Car task)."""

    tasks: Sequence[dict] = field(default_factory=lambda: [{"num_class": 1, "class_names": ["Car"]}])
    box_code_size: int = 7
    use_dir: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> list:
        rets = []
        for t in self.tasks:
            rets.append(
                TaskHead(
                    num_anchor_per_loc=2 * t["num_class"],
                    num_class=t["num_class"],
                    box_code_size=self.box_code_size,
                    use_dir=self.use_dir,
                    dtype=self.dtype,
                    name=f"task_{len(rets)}",
                )(x)
            )
        return rets
