"""End-to-end train-step test: teacher+student+EMA on a tiny synthetic batch."""
import numpy as np
import pytest


def make_batch(rng, b=2, v=64, p=5, f=4, a=32, sparse_shape=(41, 32, 32)):
    import jax.numpy as jnp
    from sessd_tpu.core.anchors import create_anchors_3d_range

    d, h, w = sparse_shape

    def vox():
        voxels = rng.randn(b, v, p, f).astype(np.float32) * 0.1
        coords = np.stack(
            [rng.randint(0, d, (b, v)), rng.randint(0, h, (b, v)),
             rng.randint(0, w, (b, v))], axis=-1).astype(np.int32)
        num_points = rng.randint(1, p + 1, (b, v)).astype(np.int32)
        mask = np.ones((b, v), dtype=bool)
        return voxels, coords, num_points, mask

    voxels, coords, num_points, mask = vox()
    voxels_r, coords_r, num_points_r, mask_r = vox()

    anchors = create_anchors_3d_range([1, 4, 4], [0, -40, -1.0, 70.4, 40, -1.0]).reshape(-1, 7)
    assert anchors.shape[0] == a
    anchors_b = np.broadcast_to(anchors, (b, a, 7)).copy()

    labels = rng.choice([-1, 0, 1], size=(b, a), p=[0.1, 0.7, 0.2]).astype(np.int32)
    reg_targets = (rng.randn(b, a, 7) * 0.05).astype(np.float32)

    batch = dict(
        voxels=jnp.asarray(voxels), coords=jnp.asarray(coords),
        num_points=jnp.asarray(num_points), voxel_mask=jnp.asarray(mask),
        voxels_raw=jnp.asarray(voxels_r), coords_raw=jnp.asarray(coords_r),
        num_points_raw=jnp.asarray(num_points_r), voxel_mask_raw=jnp.asarray(mask_r),
        anchors=jnp.asarray(anchors_b.astype(np.float32)),
        labels=jnp.asarray(labels), reg_targets=jnp.asarray(reg_targets),
        labels_raw=jnp.asarray(labels), reg_targets_raw=jnp.asarray(reg_targets),
        transformation=dict(
            flipped=jnp.asarray(rng.rand(b) > 0.5),
            noise_rotation=jnp.asarray(rng.uniform(-0.7, 0.7, b).astype(np.float32)),
            noise_scale=jnp.asarray(rng.uniform(0.95, 1.05, b).astype(np.float32)),
        ),
    )
    return batch


def test_one_cycle_schedule():
    import jax.numpy as jnp
    from sessd_tpu.train.optim import OneCycleConfig, one_cycle_lr, one_cycle_mom

    cfg = OneCycleConfig(lr_max=3e-3, total_steps=1000)
    lr, mom = one_cycle_lr(cfg), one_cycle_mom(cfg)
    np.testing.assert_allclose(float(lr(0)), 3e-4, rtol=1e-5)
    np.testing.assert_allclose(float(lr(400)), 3e-3, rtol=1e-4)
    np.testing.assert_allclose(float(lr(1000)), 3e-5 * 1e-3, rtol=1e-3, atol=1e-9)
    # midpoint of phase 1: halfway in cosine = mean of endpoints
    np.testing.assert_allclose(float(lr(200)), (3e-4 + 3e-3) / 2, rtol=1e-4)
    np.testing.assert_allclose(float(mom(0)), 0.95, rtol=1e-5)
    np.testing.assert_allclose(float(mom(400)), 0.85, rtol=1e-4)
    np.testing.assert_allclose(float(mom(1000)), 0.95, rtol=1e-4)


def test_sigmoid_rampup():
    from sessd_tpu.train.train_step import sigmoid_rampup

    np.testing.assert_allclose(float(sigmoid_rampup(0)), np.exp(-5.0), rtol=1e-5)
    np.testing.assert_allclose(float(sigmoid_rampup(15)), 1.0, rtol=1e-6)
    np.testing.assert_allclose(float(sigmoid_rampup(30)), 1.0, rtol=1e-6)


@pytest.mark.slow
def test_train_step_runs_and_learns(rng):
    import jax
    import jax.numpy as jnp
    from sessd_tpu.models import VoxelNet
    from sessd_tpu.train.losses import ConsistencyConfig, LossConfig
    from sessd_tpu.train.optim import OneCycleConfig, build_optimizer
    from sessd_tpu.train.train_step import create_train_state, make_train_step

    model = VoxelNet(sparse_shape=(41, 32, 32), stage_capacity=(128,) * 5)
    opt = build_optimizer(OneCycleConfig(total_steps=100))
    batch = make_batch(rng)
    state = create_train_state(model, opt, batch, batch_size=2)

    cfg = LossConfig(max_positive_anchors=8,
                     consistency=ConsistencyConfig(top_k=16))
    step_fn = jax.jit(make_train_step(model, opt, cfg))

    w0 = np.asarray(jax.tree_util.tree_leaves(state.params)[0]).copy()
    state1, metrics = step_fn(state, batch, jnp.float32(0.5))
    assert np.isfinite(float(metrics["loss"]))
    for k in ["cls_loss_reduced", "ious_loss", "dir_loss_reduced",
              "iou_pred_loss", "consistency_loss", "loss_ema"]:
        assert np.isfinite(float(metrics[k])), k

    w1 = np.asarray(jax.tree_util.tree_leaves(state1.params)[0])
    assert np.abs(w1 - w0).sum() > 0  # student moved

    # EMA at step 0: alpha = 0 -> teacher == new student
    e1 = np.asarray(jax.tree_util.tree_leaves(state1.ema_params)[0])
    np.testing.assert_allclose(e1, w1, atol=1e-7)

    state2, m2 = step_fn(state1, batch, jnp.float32(0.5))
    # EMA at step 1: alpha = 0.5 -> halfway between old teacher and student
    e2 = np.asarray(jax.tree_util.tree_leaves(state2.ema_params)[0])
    w2 = np.asarray(jax.tree_util.tree_leaves(state2.params)[0])
    np.testing.assert_allclose(e2, 0.5 * e1 + 0.5 * w2, atol=1e-6)
    assert int(state2.step) == 2


def test_legacy_lr_schedules():
    """P11 legacy LrUpdaterHook policies (lr_updater.py): fixed/step/exp/
    poly/cosine semantics + linear warmup, built from the config surface."""
    import jax.numpy as jnp
    from sessd_tpu.train.optim import build_legacy_schedule

    spe, total = 10, 100
    # step: gamma^(milestones passed), epoch-granular
    s = build_legacy_schedule("step", 1.0, spe, total, gamma=0.1,
                              milestones=(3, 7))
    assert float(s(jnp.int32(0))) == pytest.approx(1.0)
    assert float(s(jnp.int32(29))) == pytest.approx(1.0)    # epoch 2
    assert float(s(jnp.int32(30))) == pytest.approx(0.1)    # epoch 3
    assert float(s(jnp.int32(75))) == pytest.approx(0.01)   # epoch 7
    # exp: gamma^epoch
    s = build_legacy_schedule("exp", 2.0, spe, total, gamma=0.5)
    assert float(s(jnp.int32(25))) == pytest.approx(2.0 * 0.5 ** 2)
    # poly: (1 - t)^power
    s = build_legacy_schedule("poly", 1.0, spe, total, power=2.0)
    assert float(s(jnp.int32(50))) == pytest.approx(0.25)
    # cosine: annealing to min_lr
    s = build_legacy_schedule("cosine", 1.0, spe, total, min_lr=0.1)
    assert float(s(jnp.int32(0))) == pytest.approx(1.0)
    assert float(s(jnp.int32(100))) == pytest.approx(0.1)
    assert float(s(jnp.int32(50))) == pytest.approx(0.55)
    # linear warmup ramps into the base schedule
    s = build_legacy_schedule("fixed", 1.0, spe, total, warmup="linear",
                              warmup_iters=10, warmup_ratio=0.1)
    assert float(s(jnp.int32(0))) == pytest.approx(0.1)
    assert float(s(jnp.int32(5))) == pytest.approx(0.55)
    assert float(s(jnp.int32(10))) == pytest.approx(1.0)
    assert float(s(jnp.int32(99))) == pytest.approx(1.0)


def test_builder_legacy_lr_policy():
    """lr_config.type='step' flows through build_optimizer_from_cfg."""
    from sessd_tpu.config import Config
    from sessd_tpu import builder

    cfg = Config(dict(
        total_epochs=10,
        optimizer=dict(type="adam", lr=0.01, wd=0.01, amsgrad=False),
        optimizer_config=dict(grad_clip=dict(max_norm=35)),
        lr_config=dict(type="step", lr=0.01, step=(5,), gamma=0.1),
    ))
    opt, lr_fn = builder.build_optimizer_from_cfg(cfg, steps_per_epoch=10)
    import jax.numpy as jnp
    assert float(lr_fn(jnp.int32(0))) == pytest.approx(0.01)
    assert float(lr_fn(jnp.int32(60))) == pytest.approx(0.001)
    assert opt is not None


def test_tiny_grid_init_param_tree_matches_full():
    """Trainer inits against a tiny grid (fast); parameter/batch-stats
    trees must be identical to a full-grid init — shapes depend only on
    channel dims, never on sparse_shape or capacities."""
    import jax
    from sessd_tpu.models import VoxelNet

    rng = jax.random.PRNGKey(0)

    def init(sparse_shape, caps, v):
        model = VoxelNet(sparse_shape=sparse_shape, stage_capacity=caps,
                         conv_impl="gather")
        voxels = np.zeros((v, 5, 4), np.float32)
        coords = np.zeros((v, 4), np.int32)
        return model.init(rng, voxels, coords,
                          np.ones((v,), np.int32), np.zeros((v,), bool), 1,
                          train=False)

    tiny = init((41, 32, 32), (128,) * 5, 64)
    full = init((41, 128, 128), (600, 640, 500, 400, 300), 600)
    ts = jax.tree_util.tree_map(lambda a: (a.shape, a.dtype), tiny)
    fs = jax.tree_util.tree_map(lambda a: (a.shape, a.dtype), full)
    assert jax.tree_util.tree_structure(ts) == jax.tree_util.tree_structure(fs)
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(ts),
            jax.tree_util.tree_leaves_with_path(fs)):
        assert a == b, (jax.tree_util.keystr(pa), a, b)
