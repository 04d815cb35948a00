"""Shared flax building blocks: masked batch norm for sparse voxel features
and NHWC conv/BN/ReLU helpers for the dense BEV stages.

Norm semantics follow the reference defaults: BatchNorm(eps=1e-3,
momentum=0.01) (scn.py:103, rpn_v1.py:131) — torch momentum 0.01 equals flax
momentum 0.99. Cross-device stats sync (the reference's syncbn/apex, SURVEY
§2.3) is an ``axis_name`` psum here, not a custom kernel.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


class MaskedBatchNorm(nn.Module):
    """BatchNorm over valid rows of a padded [N, C] feature list.

    The reference applies BN1d to spconv's dense feature list (real voxels
    only); our fixed-capacity layout carries padding rows, so statistics are
    computed under the mask.
    """

    momentum: float = 0.99
    epsilon: float = 1e-3
    axis_name: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray, train: bool,
                 affine_only: bool = False):
        """Normal mode: normalize x. ``affine_only`` (serving fast path):
        create the same variables but return the folded inference affine
        (s, b) with y = x*s + b == (x - mean)*rsqrt(var+eps)*scale + bias;
        ``x`` is then only used for its channel count."""
        c = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones((c,), jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        if affine_only:
            assert not train
            s = jax.lax.rsqrt(ra_var.value + self.epsilon) * scale
            return s, bias - ra_mean.value * s

        if train:
            m = mask.astype(jnp.float32)[:, None]
            cnt = jnp.maximum(jnp.sum(m), 1.0)
            xf = x.astype(jnp.float32)
            mean = jnp.sum(xf * m, axis=0) / cnt
            var = jnp.sum(((xf - mean) ** 2) * m, axis=0) / cnt
            if self.axis_name is not None:
                # sync-BN across the data mesh axis via E[x], E[x^2] psums
                total = jax.lax.psum(cnt, self.axis_name)
                gmean = jax.lax.psum(mean * cnt, self.axis_name) / total
                ex2 = jax.lax.psum((var + mean ** 2) * cnt, self.axis_name) / total
                mean, var = gmean, ex2 - gmean ** 2
            if not self.is_initializing():
                ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mean
                ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * var
        else:
            mean, var = ra_mean.value, ra_var.value

        inv = jax.lax.rsqrt(var + self.epsilon) * scale
        out = (x.astype(jnp.float32) - mean) * inv + bias
        return out.astype(self.dtype)


def batch_norm_2d(x, *, train: bool, axis_name=None, dtype=jnp.float32, name=None):
    """Standard flax BatchNorm for NHWC tensors with reference hyperparams."""
    return nn.BatchNorm(
        use_running_average=not train,
        momentum=0.99,
        epsilon=1e-3,
        axis_name=axis_name,
        dtype=dtype,
        name=name,
    )(x)


class ConvBnRelu(nn.Module):
    """Conv2D(NHWC) + BN + ReLU, the SSFA building block (rpn_v1.py:135-210)."""

    features: int
    kernel: tuple = (3, 3)
    strides: tuple = (1, 1)
    padding: str | tuple = "SAME"
    use_relu: bool = True
    transpose: bool = False
    axis_name: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        # torch-style symmetric padding k//2 (flax "SAME" pads right-only for
        # even extents at stride 2, which would misalign converted weights)
        pad = self.padding
        if pad == "SAME" and not self.transpose:
            pad = tuple((k // 2, k // 2) for k in self.kernel)
        if self.transpose:
            # torch ConvTranspose2d(k, s, padding=p, output_padding=s-1)
            # == flax VALID transpose cropped by p at the start, size s*in
            # (validated in tests/test_convert_torch.py)
            h, w = x.shape[1], x.shape[2]
            x = nn.ConvTranspose(
                self.features, self.kernel, strides=self.strides, padding="VALID",
                use_bias=False, dtype=self.dtype,
                kernel_init=nn.initializers.xavier_uniform(),
            )(x)
            # odd kernels mirror torch padding=k//2 (+output_padding=s-1);
            # even kernels (k==s upsamplers) are torch padding=0, no crop
            p0 = self.kernel[0] // 2 if self.kernel[0] % 2 else 0
            p1 = self.kernel[1] // 2 if self.kernel[1] % 2 else 0
            x = x[:, p0 : p0 + h * self.strides[0], p1 : p1 + w * self.strides[1], :]
        else:
            x = nn.Conv(
                self.features, self.kernel, strides=self.strides, padding=pad,
                use_bias=False, dtype=self.dtype,
                kernel_init=nn.initializers.xavier_uniform(),
            )(x)
        x = batch_norm_2d(x, train=train, axis_name=self.axis_name, dtype=self.dtype)
        if self.use_relu:
            x = nn.relu(x)
        return x
