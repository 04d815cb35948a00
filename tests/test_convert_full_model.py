"""Full-model converter test: a synthetic torch state_dict laid out exactly
like the reference's VoxelNet checkpoint (scn.py Sequential indices, SSFA
module names, head convs) maps onto our param tree, and the model runs."""
import numpy as np
import pytest


def make_reference_state_dict(rng):
    """Shapes/keys of the reference SE-SSD checkpoint (backbone.middle_conv
    Sequential of 14 conv+BN blocks, neck.* SSFA modules, bbox_head.tasks.0)."""
    sd = {}

    # (cin, cout, kernel_shape) per backbone block, in Sequential order
    specs = [
        (4, 16, (3, 3, 3)), (16, 16, (3, 3, 3)),           # subm0 x2
        (16, 32, (3, 3, 3)),                                # spconv s2
        (32, 32, (3, 3, 3)), (32, 32, (3, 3, 3)),           # subm1 x2
        (32, 64, (3, 3, 3)),                                # spconv s2
        (64, 64, (3, 3, 3)), (64, 64, (3, 3, 3)), (64, 64, (3, 3, 3)),
        (64, 64, (3, 3, 3)),                                # spconv s2 p(0,1,1)
        (64, 64, (3, 3, 3)), (64, 64, (3, 3, 3)), (64, 64, (3, 3, 3)),
        (64, 64, (3, 1, 1)),                                # spconv (3,1,1)
    ]
    for i, (cin, cout, k) in enumerate(specs):
        sd[f"backbone.middle_conv.{3 * i}.weight"] = rng.randn(*k, cin, cout).astype(np.float32) * 0.1
        bn = f"backbone.middle_conv.{3 * i + 1}"
        sd[bn + ".weight"] = rng.rand(cout).astype(np.float32) + 0.5
        sd[bn + ".bias"] = rng.randn(cout).astype(np.float32) * 0.1
        sd[bn + ".running_mean"] = rng.randn(cout).astype(np.float32) * 0.1
        sd[bn + ".running_var"] = rng.rand(cout).astype(np.float32) + 0.5

    def conv_bn(conv_name, bn_name, cin, cout, k=3, transpose=False):
        if transpose:
            sd[conv_name + ".weight"] = rng.randn(cin, cout, k, k).astype(np.float32) * 0.1
        else:
            sd[conv_name + ".weight"] = rng.randn(cout, cin, k, k).astype(np.float32) * 0.1
        sd[bn_name + ".weight"] = rng.rand(cout).astype(np.float32) + 0.5
        sd[bn_name + ".bias"] = rng.randn(cout).astype(np.float32) * 0.1
        sd[bn_name + ".running_mean"] = rng.randn(cout).astype(np.float32) * 0.1
        sd[bn_name + ".running_var"] = rng.rand(cout).astype(np.float32) + 0.5

    conv_bn("neck.bottom_up_block_0.1", "neck.bottom_up_block_0.2", 128, 128)
    conv_bn("neck.bottom_up_block_0.4", "neck.bottom_up_block_0.5", 128, 128)
    conv_bn("neck.bottom_up_block_0.7", "neck.bottom_up_block_0.8", 128, 128)
    conv_bn("neck.bottom_up_block_1.0", "neck.bottom_up_block_1.1", 128, 256)
    conv_bn("neck.bottom_up_block_1.3", "neck.bottom_up_block_1.4", 256, 256)
    conv_bn("neck.bottom_up_block_1.6", "neck.bottom_up_block_1.7", 256, 256)
    conv_bn("neck.trans_0.0", "neck.trans_0.1", 128, 128, k=1)
    conv_bn("neck.trans_1.0", "neck.trans_1.1", 256, 256, k=1)
    conv_bn("neck.deconv_block_0.0", "neck.deconv_block_0.1", 256, 128, transpose=True)
    conv_bn("neck.deconv_block_1.0", "neck.deconv_block_1.1", 256, 128, transpose=True)
    conv_bn("neck.conv_0.0", "neck.conv_0.1", 128, 128)
    conv_bn("neck.conv_1.0", "neck.conv_1.1", 128, 128)
    conv_bn("neck.w_0.0", "neck.w_0.1", 128, 1, k=1)
    conv_bn("neck.w_1.0", "neck.w_1.1", 128, 1, k=1)

    for name, cout in [("conv_box", 14), ("conv_cls", 2), ("conv_iou", 2),
                       ("conv_dir", 4)]:
        sd[f"bbox_head.tasks.0.{name}.weight"] = rng.randn(cout, 128, 1, 1).astype(np.float32) * 0.1
        sd[f"bbox_head.tasks.0.{name}.bias"] = rng.randn(cout).astype(np.float32) * 0.1
    return sd


def test_full_checkpoint_conversion_runs(rng):
    import jax
    import jax.numpy as jnp
    from sessd_tpu.models import VoxelNet
    from sessd_tpu.utils.convert_torch import convert_state_dict

    sd = make_reference_state_dict(rng)
    # DDP-style 'module.' prefixes must be stripped too
    sd = {"module." + k: v for k, v in sd.items()}
    params, stats = convert_state_dict(sd)

    model = VoxelNet(sparse_shape=(41, 32, 32), stage_capacity=(128,) * 5)
    n = 96
    voxels = jnp.asarray(rng.randn(n, 5, 4).astype(np.float32))
    coords = jnp.asarray(np.stack(
        [np.zeros(n), rng.randint(0, 41, n), rng.randint(0, 32, n),
         rng.randint(0, 32, n)], 1).astype(np.int32))
    num_points = jnp.asarray(rng.randint(1, 6, n).astype(np.int32))
    valid = jnp.ones(n, dtype=bool)

    # the converted tree must be structurally identical to a fresh init
    ref = model.init(jax.random.PRNGKey(0), voxels, coords, num_points, valid,
                     1, train=False)
    ref_shapes = jax.tree_util.tree_map(lambda a: a.shape, ref["params"])
    got_shapes = jax.tree_util.tree_map(lambda a: np.asarray(a).shape, params)
    assert jax.tree_util.tree_structure(ref_shapes) == \
        jax.tree_util.tree_structure(got_shapes)
    for a, b in zip(jax.tree_util.tree_leaves(ref_shapes),
                    jax.tree_util.tree_leaves(got_shapes)):
        assert a == b

    preds = model.apply({"params": params, "batch_stats": stats},
                        voxels, coords, num_points, valid, 1, train=False)
    assert np.isfinite(np.asarray(preds[0]["box_preds"])).all()
