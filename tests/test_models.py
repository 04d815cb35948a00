"""Model assembly smoke tests: shapes, jit-compilability, batch-stats."""
import numpy as np
import pytest


def make_inputs(rng, batch=2, v=64, p=5, f=4, sparse_shape=(41, 32, 32)):
    import jax.numpy as jnp

    d, h, w = sparse_shape
    n = batch * v
    voxels = rng.randn(n, p, f).astype(np.float32)
    coords = np.stack(
        [
            rng.randint(0, batch, n),
            rng.randint(0, d, n),
            rng.randint(0, h, n),
            rng.randint(0, w, n),
        ],
        axis=1,
    ).astype(np.int32)
    num_points = rng.randint(1, p + 1, n).astype(np.int32)
    valid = np.ones(n, dtype=bool)
    valid[-5:] = False
    return (jnp.asarray(voxels), jnp.asarray(coords), jnp.asarray(num_points),
            jnp.asarray(valid))


@pytest.fixture(scope="module")
def voxelnet_setup():
    import jax
    from sessd_tpu.models import VoxelNet

    rng = np.random.RandomState(1)
    model = VoxelNet(sparse_shape=(41, 32, 32), stage_capacity=(128,) * 5)
    voxels, coords, num_points, valid = make_inputs(rng)
    variables = model.init(jax.random.PRNGKey(0), voxels, coords, num_points,
                           valid, 2, train=False)
    return model, variables, (voxels, coords, num_points, valid)


def test_voxelnet_shapes(voxelnet_setup):
    model, variables, inputs = voxelnet_setup
    preds = model.apply(variables, *inputs, 2, train=False)
    assert isinstance(preds, list) and len(preds) == 1
    p = preds[0]
    # BEV (41,32,32) -> H' = W' = 4; 2 anchors per loc
    assert p["box_preds"].shape == (2, 4 * 4 * 2, 7)
    assert p["cls_preds"].shape == (2, 32, 1)
    assert p["dir_cls_preds"].shape == (2, 32, 2)
    assert p["iou_preds"].shape == (2, 32, 1)
    assert np.isfinite(np.asarray(p["box_preds"])).all()


def test_voxelnet_jit_and_batchstats(voxelnet_setup):
    import jax

    model, variables, inputs = voxelnet_setup

    @jax.jit
    def fwd_train(variables, voxels, coords, num_points, valid):
        return model.apply(variables, voxels, coords, num_points, valid, 2,
                           train=True, mutable=["batch_stats"])

    preds, updates = fwd_train(variables, *inputs)
    assert "batch_stats" in updates
    # running stats must move away from init after a train-mode pass
    leaves = jax.tree_util.tree_leaves(updates["batch_stats"])
    assert any(np.abs(np.asarray(l)).sum() > 0 for l in leaves)


def test_pointpillars_shapes(rng):
    import jax
    from sessd_tpu.models import PointPillars

    model = PointPillars(grid_size=(32, 32), voxel_size=(2.2, 2.5),
                         pc_range=(0, -40, -3, 70.4, 40, 1))
    import jax.numpy as jnp

    n, p = 128, 20
    voxels = jnp.asarray(rng.randn(n, p, 4).astype(np.float32))
    coords = jnp.asarray(
        np.stack([rng.randint(0, 2, n), np.zeros(n), rng.randint(0, 32, n),
                  rng.randint(0, 32, n)], axis=1).astype(np.int32))
    num_points = jnp.asarray(rng.randint(1, p, n).astype(np.int32))
    valid = jnp.asarray(np.ones(n, dtype=bool))
    variables = model.init(jax.random.PRNGKey(0), voxels, coords, num_points,
                           valid, 2, train=False)
    preds = model.apply(variables, voxels, coords, num_points, valid, 2, train=False)
    # RPN: strides 2,2,2 then upsample 1,2,4 -> output at 1/2 resolution
    assert preds[0]["box_preds"].shape == (2, 16 * 16 * 2, 7)
