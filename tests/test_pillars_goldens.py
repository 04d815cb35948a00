"""PointPillars numerical parity against the reference's own torch code.

tests/goldens/ref_pillars.npz was produced by scripts/make_pillars_goldens.py:
the reference PillarFeatureNet -> PointPillarsScatter -> RPN chain
(det3d/models/readers/pillar_encoder.py:17-230, necks/rpn_v1.py:24-116) ran
on CPU with deterministic weights (regenerated here from (name, shape)) on a
fixed cropped ray-cast scene. These tests pin our PFN (incl. the reference's
f_center and unmasked-max quirks under ref_compat=True), the BEV scatter,
and the multi-scale RPN neck, stage by stage and as a chain. VERDICT r3
item #2 (PointPillars to flagship standard).
"""
import os

import jax.numpy as jnp
import numpy as np
import pytest

from tests.golden_utils import reference_state_dict

GOLDEN = os.path.join(os.path.dirname(__file__), "goldens", "ref_pillars.npz")
PC_RANGE = (0.0, -9.6, -3.0, 19.2, 9.6, 1.0)
NY = NX = 96


@pytest.fixture(scope="module")
def golden():
    return np.load(GOLDEN)


@pytest.fixture(scope="module")
def sd(golden):
    return reference_state_dict(golden["sd_names"], golden["sd_shapes"])


def _bn(sd, prefix):
    return ({"scale": jnp.asarray(sd[prefix + ".weight"]),
             "bias": jnp.asarray(sd[prefix + ".bias"])},
            {"mean": jnp.asarray(sd[prefix + ".running_mean"]),
             "var": jnp.asarray(sd[prefix + ".running_var"])})


@pytest.fixture(scope="module")
def pfn_variables(sd):
    p_bn, s_bn = _bn(sd, "reader.pfn_layers.0.norm")
    params = {"PFNLayer_0": {
        "Dense_0": {"kernel": jnp.asarray(sd["reader.pfn_layers.0.linear.weight"].T)},
        "MaskedBatchNorm_0": p_bn,
    }}
    stats = {"PFNLayer_0": {"MaskedBatchNorm_0": s_bn}}
    return {"params": params, "batch_stats": stats}


@pytest.fixture(scope="module")
def rpn_variables(sd):
    from sessd_tpu.utils.convert_torch import (conv2d_kernel,
                                               conv_transpose2d_kernel)

    layer_nums = (3, 5, 5)
    params, stats = {}, {}
    k = 0

    def add(kernel_name, kernel, bn_prefix):
        nonlocal k
        p_bn, s_bn = _bn(sd, bn_prefix)
        params[f"ConvBnRelu_{k}"] = {kernel_name: {"kernel": jnp.asarray(kernel)},
                                     "BatchNorm_0": p_bn}
        stats[f"ConvBnRelu_{k}"] = {"BatchNorm_0": s_bn}
        k += 1

    for i, n in enumerate(layer_nums):
        # strided conv (Sequential: 0 ZeroPad, 1 Conv, 2 BN, 3 ReLU)
        add("Conv_0", conv2d_kernel(sd[f"neck.blocks.{i}.1.weight"]),
            f"neck.blocks.{i}.2")
        for j in range(n):  # conv at 4+3j, bn at 5+3j
            add("Conv_0", conv2d_kernel(sd[f"neck.blocks.{i}.{4 + 3 * j}.weight"]),
                f"neck.blocks.{i}.{5 + 3 * j}")
        w = sd[f"neck.deblocks.{i}.0.weight"]  # ConvTranspose2d [in, out, k, k]
        if i == 0:  # us_stride 1: ours is a 1x1 conv; k=1 transpose == conv
            add("Conv_0", np.transpose(w, (2, 3, 0, 1)), "neck.deblocks.0.1")
        else:
            add("ConvTranspose_0", conv_transpose2d_kernel(w),
                f"neck.deblocks.{i}.1")
    return {"params": params, "batch_stats": stats}


def _our_pfn(golden, pfn_variables):
    from sessd_tpu.models.pillars import PillarFeatureNet

    model = PillarFeatureNet(num_input_features=4, num_filters=(64,),
                             voxel_size=(0.2, 0.2), pc_range=PC_RANGE,
                             ref_compat=True)
    n = golden["voxels"].shape[0]
    coords = jnp.concatenate(
        [jnp.zeros((n, 1), jnp.int32), jnp.asarray(golden["coords_zyx"])], 1)
    return model.apply(pfn_variables, jnp.asarray(golden["voxels"]),
                       jnp.asarray(golden["num_points"]), coords,
                       jnp.ones((n,), bool), False)


def test_pfn_matches_reference(golden, pfn_variables):
    ours = np.asarray(_our_pfn(golden, pfn_variables))
    ref = golden["pfn_out"]
    scale = np.abs(ref).max() + 1e-6
    err = np.abs(ours - ref).max() / scale
    assert err < 1e-5, f"PFN rel err {err:.2e}"


def test_pfn_quirks_are_load_bearing(golden, pfn_variables):
    """Sharpness: the default (standard-decoration, masked-max) PFN must
    NOT match the reference bit-for-bit — otherwise ref_compat tests
    nothing. Documented deviation, models/pillars.py module docstring."""
    from sessd_tpu.models.pillars import PillarFeatureNet

    model = PillarFeatureNet(num_input_features=4, num_filters=(64,),
                             voxel_size=(0.2, 0.2), pc_range=PC_RANGE)
    n = golden["voxels"].shape[0]
    coords = jnp.concatenate(
        [jnp.zeros((n, 1), jnp.int32), jnp.asarray(golden["coords_zyx"])], 1)
    ours = np.asarray(model.apply(
        pfn_variables, jnp.asarray(golden["voxels"]),
        jnp.asarray(golden["num_points"]), coords, jnp.ones((n,), bool), False))
    assert np.abs(ours - golden["pfn_out"]).max() > 1e-3


def test_scatter_matches_reference(golden):
    from sessd_tpu.models.pillars import pillar_scatter

    n = golden["pfn_out"].shape[0]
    coords = jnp.concatenate(
        [jnp.zeros((n, 1), jnp.int32), jnp.asarray(golden["coords_zyx"])], 1)
    canvas = pillar_scatter(jnp.asarray(golden["pfn_out"]), coords,
                            jnp.ones((n,), bool), 1, NY, NX)
    ref = golden["canvas"].transpose(0, 2, 3, 1)  # NCHW -> NHWC
    np.testing.assert_allclose(np.asarray(canvas), ref, atol=1e-6)


def test_rpn_matches_reference(golden, rpn_variables):
    from sessd_tpu.models.pillars import RPN

    model = RPN(layer_nums=(3, 5, 5), ds_strides=(2, 2, 2),
                ds_filters=(64, 128, 256), us_strides=(1, 2, 4),
                us_filters=(128, 128, 128))
    x = jnp.asarray(golden["canvas"].transpose(0, 2, 3, 1))
    ours = np.asarray(model.apply(rpn_variables, x, train=False))
    ref = golden["rpn_out"].transpose(0, 2, 3, 1)
    assert ours.shape == ref.shape, (ours.shape, ref.shape)
    scale = np.abs(ref).max() + 1e-6
    err = np.abs(ours - ref).max() / scale
    assert err < 2e-4, f"RPN rel err {err:.2e}"


def test_full_chain_matches_reference(golden, pfn_variables, rpn_variables):
    from sessd_tpu.models.pillars import RPN, pillar_scatter

    feats = _our_pfn(golden, pfn_variables)
    n = feats.shape[0]
    coords = jnp.concatenate(
        [jnp.zeros((n, 1), jnp.int32), jnp.asarray(golden["coords_zyx"])], 1)
    canvas = pillar_scatter(feats, coords, jnp.ones((n,), bool), 1, NY, NX)
    model = RPN(layer_nums=(3, 5, 5), ds_strides=(2, 2, 2),
                ds_filters=(64, 128, 256), us_strides=(1, 2, 4),
                us_filters=(128, 128, 128))
    ours = np.asarray(model.apply(rpn_variables, canvas, train=False))
    ref = golden["rpn_out"].transpose(0, 2, 3, 1)
    scale = np.abs(ref).max() + 1e-6
    err = np.abs(ours - ref).max() / scale
    assert err < 5e-4, f"chain rel err {err:.2e}"
