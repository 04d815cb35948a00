"""Gradient-sanity: the full SE-SSD step overfits a single synthetic batch
(supervised losses decrease over a few dozen steps)."""
import numpy as np
import pytest


@pytest.mark.slow
def test_overfit_single_batch(rng):
    import jax
    import jax.numpy as jnp
    from sessd_tpu.models import VoxelNet
    from sessd_tpu.train.losses import ConsistencyConfig, LossConfig
    from sessd_tpu.train.optim import OneCycleConfig, build_optimizer
    from sessd_tpu.train.train_step import create_train_state, make_train_step

    from test_train_step import make_batch

    batch = make_batch(rng, b=2, v=64)
    model = VoxelNet(sparse_shape=(41, 32, 32), stage_capacity=(128,) * 5)
    # constant lr, no cycle games for the overfit check
    opt = build_optimizer(OneCycleConfig(lr_max=3e-3, total_steps=10000,
                                         pct_start=0.01))
    state = create_train_state(model, opt, batch, batch_size=2)
    cfg = LossConfig(max_positive_anchors=8, consistency=ConsistencyConfig(top_k=8))
    step = jax.jit(make_train_step(model, opt, cfg, compute_teacher_metrics=False))

    losses = []
    for i in range(30):
        state, metrics = step(state, batch, jnp.float32(0.0))
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    first = np.mean(losses[:5])
    last = np.mean(losses[-5:])
    assert last < 0.7 * first, (first, last)
    # classification and regression terms individually improved
    assert float(metrics["cls_loss_reduced"]) < first
