"""Data-parallel SPMD test on the virtual 8-device CPU mesh: the full
teacher/student train step under shard_map matches expectations and the
gradient psum keeps replicas in sync."""
import numpy as np
import pytest


@pytest.mark.slow
def test_sharded_train_step(rng):
    import jax
    import jax.numpy as jnp
    from sessd_tpu.models import VoxelNet
    from sessd_tpu.parallel.mesh import (DATA_AXIS, make_mesh,
                                         make_sharded_train_step, replicate,
                                         shard_batch)
    from sessd_tpu.train.losses import ConsistencyConfig, LossConfig
    from sessd_tpu.train.optim import OneCycleConfig, build_optimizer
    from sessd_tpu.train.train_step import create_train_state, make_train_step

    from test_train_step import make_batch

    n_dev = len(jax.devices())
    assert n_dev == 8, "conftest must fake 8 cpu devices"

    mesh = make_mesh()
    model = VoxelNet(sparse_shape=(41, 32, 32), stage_capacity=(64,) * 5,
                     axis_name=DATA_AXIS)
    opt = build_optimizer(OneCycleConfig(total_steps=10))
    batch = make_batch(rng, b=8, v=32)

    # init without the axis (single device init of the same structure)
    init_model = VoxelNet(sparse_shape=(41, 32, 32), stage_capacity=(64,) * 5)
    state = create_train_state(init_model, opt, batch, batch_size=8)

    cfg = LossConfig(max_positive_anchors=8, consistency=ConsistencyConfig(top_k=8))
    step = make_train_step(model, opt, cfg, axis_name=DATA_AXIS,
                           compute_teacher_metrics=False)
    sharded_step = make_sharded_train_step(step, mesh)

    state = replicate(state, mesh)
    sbatch = shard_batch(batch, mesh)
    new_state, metrics = sharded_step(state, sbatch, jnp.float32(0.3))
    assert np.isfinite(float(metrics["loss"]))
    assert int(new_state.step) == 1

    # second step runs from the updated state
    new_state2, m2 = sharded_step(new_state, sbatch, jnp.float32(0.3))
    assert np.isfinite(float(m2["loss"]))
    # params are replicated (same value on all shards by construction)
    leaf = jax.tree_util.tree_leaves(new_state2.params)[0]
    assert np.isfinite(np.asarray(leaf)).all()
