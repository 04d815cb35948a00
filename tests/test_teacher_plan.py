"""Teacher-plan split: the teacher forward may run a different execution
plan (dense_from_stage / conv_impl) than the student inside one train step.

The reference runs teacher and student through the SAME module graph
(trainer_sessd.py:248-273); here the teacher is inference-shaped (no grads
flow through it), so it is free to use a cheaper plan. Correctness hinges
on the plan-invariance of the param tree and outputs
(tests/test_backbone_hybrid.py); this test pins the composition: a full
train step with teacher_model at a different dense_from_stage must match
the default step numerically.
"""
import numpy as np
import pytest


@pytest.mark.slow
def test_teacher_plan_split_matches_default(rng):
    import jax
    import jax.numpy as jnp
    from sessd_tpu.models import VoxelNet
    from sessd_tpu.train.losses import ConsistencyConfig, LossConfig
    from sessd_tpu.train.optim import OneCycleConfig, build_optimizer
    from sessd_tpu.train.train_step import create_train_state, make_train_step

    from test_train_step import make_batch

    batch = make_batch(rng, b=2, v=64)
    model = VoxelNet(sparse_shape=(41, 32, 32), stage_capacity=(128,) * 5,
                     dense_from_stage=3)
    opt = build_optimizer(OneCycleConfig(lr_max=3e-3, total_steps=100))
    state = create_train_state(model, opt, batch, batch_size=2)
    cfg = LossConfig(max_positive_anchors=8,
                     consistency=ConsistencyConfig(top_k=8))

    step_ref = jax.jit(make_train_step(model, opt, cfg))
    step_split = jax.jit(make_train_step(
        model, opt, cfg, teacher_model=model.clone(dense_from_stage=5)))

    s_ref, m_ref = step_ref(state, batch, jnp.float32(0.5))
    s_split, m_split = step_split(state, batch, jnp.float32(0.5))

    np.testing.assert_allclose(float(m_ref["loss"]), float(m_split["loss"]),
                               rtol=1e-4)
    np.testing.assert_allclose(float(m_ref["consistency_loss"]),
                               float(m_split["consistency_loss"]),
                               rtol=1e-4, atol=1e-5)
    # the updated states must agree leaf-wise (teacher EMA included)
    for a, b2 in zip(jax.tree_util.tree_leaves(s_ref.params),
                     jax.tree_util.tree_leaves(s_split.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b2),
                                   rtol=1e-4, atol=1e-5)
    for a, b2 in zip(jax.tree_util.tree_leaves(s_ref.ema_batch_stats),
                     jax.tree_util.tree_leaves(s_split.ema_batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b2),
                                   rtol=1e-4, atol=1e-5)


def test_trainer_cfg_teacher_plan_keys(tmp_path):
    """builder/trainer honor teacher_dense_from_stage / teacher_conv_impl."""
    from sessd_tpu.train.trainer import Trainer  # noqa: F401 — import side
    # the wiring is a clone() of the student model; just check clone keeps
    # the param-relevant fields and changes only the plan
    from sessd_tpu.models import VoxelNet

    m = VoxelNet(sparse_shape=(41, 32, 32), stage_capacity=(128,) * 5,
                 dense_from_stage=3)
    t = m.clone(dense_from_stage=5, conv_impl="gather")
    assert t.dense_from_stage == 5 and t.conv_impl == "gather"
    assert t.sparse_shape == m.sparse_shape
    assert t.stage_capacity == m.stage_capacity
