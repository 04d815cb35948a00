"""Numeric validation of every torch->flax layer mapping used by the
checkpoint converter, against real torch modules on CPU."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")


def test_conv2d_mapping(rng):
    import jax.numpy as jnp
    from flax import linen as nn

    from sessd_tpu.utils.convert_torch import conv2d_kernel

    t = torch.nn.Conv2d(8, 16, 3, padding=1, bias=False)
    x = rng.randn(2, 8, 10, 12).astype(np.float32)
    want = t(torch.from_numpy(x)).detach().numpy()

    fx = nn.Conv(16, (3, 3), padding="SAME", use_bias=False)
    kernel = conv2d_kernel(t.weight.detach().numpy())
    got = fx.apply({"params": {"kernel": kernel}},
                   jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    got = np.transpose(np.asarray(got), (0, 3, 1, 2))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_conv2d_stride2_mapping(rng):
    import jax.numpy as jnp
    from flax import linen as nn

    from sessd_tpu.utils.convert_torch import conv2d_kernel

    t = torch.nn.Conv2d(4, 6, 3, stride=2, padding=1, bias=False)
    x = rng.randn(1, 4, 16, 20).astype(np.float32)
    want = t(torch.from_numpy(x)).detach().numpy()
    # ConvBnRelu uses symmetric k//2 padding (see layers.py) — replicate here
    fx = nn.Conv(6, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)), use_bias=False)
    got = fx.apply({"params": {"kernel": conv2d_kernel(t.weight.detach().numpy())}},
                   jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    got = np.transpose(np.asarray(got), (0, 3, 1, 2))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_conv_transpose2d_mapping(rng):
    import jax.numpy as jnp
    from flax import linen as nn

    from sessd_tpu.utils.convert_torch import conv_transpose2d_kernel

    # the SSFA deconv: k=3, s=2, padding=1, output_padding=1 (rpn_v1.py:180)
    t = torch.nn.ConvTranspose2d(6, 4, 3, stride=2, padding=1,
                                 output_padding=1, bias=False)
    x = rng.randn(1, 6, 8, 10).astype(np.float32)
    want = t(torch.from_numpy(x)).detach().numpy()  # [1, 4, 16, 20]

    # replicate ConvBnRelu's transpose path: VALID + crop [p : p + s*in]
    fx = nn.ConvTranspose(4, (3, 3), strides=(2, 2), padding="VALID",
                          use_bias=False)
    kernel = conv_transpose2d_kernel(t.weight.detach().numpy())
    got = fx.apply({"params": {"kernel": kernel}},
                   jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    got = np.asarray(got)[:, 1:1 + 16, 1:1 + 20, :]
    got = np.transpose(got, (0, 3, 1, 2))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_bn_mapping(rng):
    import jax.numpy as jnp

    from sessd_tpu.models.layers import MaskedBatchNorm
    from sessd_tpu.utils.convert_torch import bn_params

    t = torch.nn.BatchNorm1d(8, eps=1e-3, momentum=0.01)
    t.weight.data = torch.from_numpy(rng.randn(8).astype(np.float32))
    t.bias.data = torch.from_numpy(rng.randn(8).astype(np.float32))
    t.running_mean = torch.from_numpy(rng.randn(8).astype(np.float32))
    t.running_var = torch.from_numpy(rng.rand(8).astype(np.float32) + 0.5)
    t.eval()
    x = rng.randn(32, 8).astype(np.float32)
    want = t(torch.from_numpy(x)).detach().numpy()

    sd = {"bn.weight": t.weight.detach().numpy(),
          "bn.bias": t.bias.detach().numpy(),
          "bn.running_mean": t.running_mean.numpy(),
          "bn.running_var": t.running_var.numpy()}
    p, s = bn_params("bn", sd)
    m = MaskedBatchNorm()
    got = m.apply({"params": p, "batch_stats": s}, jnp.asarray(x),
                  jnp.ones(32, bool), train=False)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)


def test_sparse_conv_kernel_mapping(rng):
    """spconv weight reshape preserves the (kz, ky, kx) raster order by
    checking a dense conv oracle through our sparse engine."""
    import jax.numpy as jnp

    from sessd_tpu.ops.sparse import (grid_from_coords, sparse_conv_apply,
                                      subm_rulebook, to_dense)
    from sessd_tpu.utils.convert_torch import sparse_conv_kernel

    w5 = rng.randn(3, 3, 3, 2, 4).astype(np.float32)  # [kd, kh, kw, cin, cout]
    shape = (1, 5, 6, 7)
    n = 20
    sites = rng.permutation(np.prod(shape))[:n]
    z, y, x = (sites // 42) % 5, (sites // 7) % 6, sites % 7
    coords = np.stack([np.zeros(n, np.int64), z, y, x], 1).astype(np.int32)
    feats = rng.randn(n, 2).astype(np.float32)

    grid, perm = grid_from_coords(jnp.asarray(coords), jnp.ones(n, bool), shape)
    fs = jnp.asarray(feats)[perm]
    rb = subm_rulebook(grid)
    out = sparse_conv_apply(fs, rb, jnp.asarray(sparse_conv_kernel(w5)), grid.mask)
    got = np.asarray(to_dense(out, grid))

    import jax

    dense = np.zeros(shape + (2,), np.float32)
    dense[0, z, y, x] = feats
    want = np.asarray(jax.lax.conv_general_dilated(
        jnp.asarray(dense), jnp.asarray(w5), (1, 1, 1), [(1, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC")))
    active = np.zeros(shape + (1,), bool)
    active[0, z, y, x] = True
    np.testing.assert_allclose(got, np.where(active, want, 0.0), atol=1e-4)
