"""SSFA — spatial-semantic feature aggregation neck (rpn_v1.py:119-235),
as dense NHWC XLA convs (TPU-native layout).

Two branches from the 128-ch BEV map: a spatial branch at full resolution
and a stride-2 semantic branch at 256 ch; 1x1 transforms; the semantic
branch is deconvolved back and fused twice; a per-pixel 2-way softmax
attention mixes the two outputs.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from .layers import ConvBnRelu, batch_norm_2d


class SSFA(nn.Module):
    num_input_features: int = 128
    axis_name: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        kw = dict(axis_name=self.axis_name, dtype=self.dtype)

        # bottom_up_block_0: 3x conv 128 (first with explicit zero-pad 1)
        x0 = ConvBnRelu(128, (3, 3), **kw)(x, train)
        x0 = ConvBnRelu(128, (3, 3), **kw)(x0, train)
        x0 = ConvBnRelu(128, (3, 3), **kw)(x0, train)

        # bottom_up_block_1: stride-2 then 2x conv 256
        x1 = ConvBnRelu(256, (3, 3), strides=(2, 2), **kw)(x0, train)
        x1 = ConvBnRelu(256, (3, 3), **kw)(x1, train)
        x1 = ConvBnRelu(256, (3, 3), **kw)(x1, train)

        t0 = ConvBnRelu(128, (1, 1), **kw)(x0, train)   # trans_0
        t1 = ConvBnRelu(256, (1, 1), **kw)(x1, train)   # trans_1

        # deconv blocks: 3x3 stride-2 transpose back to full resolution
        # (crop to the skip size — torch's output_padding arithmetic for odd
        # BEV extents; identical for the 200x176 KITTI map)
        h, w = x0.shape[1], x0.shape[2]
        m0 = ConvBnRelu(128, (3, 3), strides=(2, 2), transpose=True, **kw)(
            t1, train)[:, :h, :w, :] + t0
        m1 = ConvBnRelu(128, (3, 3), strides=(2, 2), transpose=True, **kw)(
            t1, train)[:, :h, :w, :]

        o0 = ConvBnRelu(128, (3, 3), **kw)(m0, train)   # conv_0
        o1 = ConvBnRelu(128, (3, 3), **kw)(m1, train)   # conv_1

        # attention logits: 1x1 conv to 1 ch + BN, no relu (w_0 / w_1)
        w0 = ConvBnRelu(1, (1, 1), use_relu=False, **kw)(o0, train)
        w1 = ConvBnRelu(1, (1, 1), use_relu=False, **kw)(o1, train)
        att = nn.softmax(jnp.concatenate([w0, w1], axis=-1), axis=-1)

        return o0 * att[..., 0:1] + o1 * att[..., 1:2]
