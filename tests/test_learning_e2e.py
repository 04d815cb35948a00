"""System-level learning test: train the full SE-SSD step on two synthetic
frames and assert the detector learns precise localization (observed: BEV
IoU ~0.79 on a gt after 200 CPU steps).

~30 min on CPU, so gated behind SESSD_RUN_LEARNING_TEST=1 — the fast
gradient check lives in test_overfit.py; this is the long-form evidence that
targets, losses, optimizer, EMA, predict and the box geometry all line up.
"""
import os
import pickle

import numpy as np
import pytest

from kitti_synth import make_kitti_root

pytestmark = pytest.mark.skipif(
    os.environ.get("SESSD_RUN_LEARNING_TEST") != "1",
    reason="long-running; set SESSD_RUN_LEARNING_TEST=1",
)


@pytest.mark.slow
def test_training_learns_localization(tmp_path, rng):
    import jax
    import jax.numpy as jnp
    from sessd_tpu.core.rotated_iou_np import iou_bev_matrix
    from sessd_tpu.data import kitti_common as kc
    from sessd_tpu.data.dataset import KittiDataset
    from sessd_tpu.data.loader import _stack_examples
    from sessd_tpu.data.pipeline import PipelineConfig
    from sessd_tpu.models import VoxelNet
    from sessd_tpu.models.predict import PredictConfig, predict_batch
    from sessd_tpu.ops.voxelize import VoxelizerSpec
    from sessd_tpu.train.losses import ConsistencyConfig, LossConfig
    from sessd_tpu.train.optim import OneCycleConfig, build_optimizer
    from sessd_tpu.train.train_step import create_train_state, make_train_step
    from sessd_tpu.train.trainer import _device_batch

    root = tmp_path / "kitti"
    gt_by_frame = make_kitti_root(root, num_frames=2, num_cars=2)
    infos = kc.create_kitti_info(root, [0, 1], num_workers=2)
    with open(root / "infos.pkl", "wb") as f:
        pickle.dump(infos, f)

    vox = VoxelizerSpec((0.0, -40.0, -3.0, 70.4, 40.0, 1.0),
                        (0.4, 0.4, 0.1), max_points=5, max_voxels=3000)
    cfg = PipelineConfig(
        voxelizer=vox, feature_map_size=(1, 25, 22),
        gt_loc_noise=(0.05, 0.05, 0.02), gt_rot_noise=(-0.05, 0.05),
        global_rot_noise=(-0.1, 0.1), global_scale_noise=(0.99, 1.01),
        sa_dropout=None, sa_sparsity=(0.0, 50), sa_swap=(0.0, 50))
    train_ds = KittiDataset(str(root), str(root / "infos.pkl"), mode="train",
                            pipeline_cfg=cfg)
    val_ds = KittiDataset(str(root), str(root / "infos.pkl"), mode="val",
                          pipeline_cfg=cfg)
    anchors_np = train_ds.anchors.astype(np.float32)

    model = VoxelNet(sparse_shape=vox.sparse_shape, stage_capacity=(3000,) * 5)
    steps = 200
    opt = build_optimizer(OneCycleConfig(lr_max=2e-3, total_steps=steps,
                                         pct_start=0.3))
    lcfg = LossConfig(max_positive_anchors=64,
                      consistency=ConsistencyConfig(top_k=32))
    step = jax.jit(make_train_step(model, opt, lcfg,
                                   compute_teacher_metrics=False))

    def make_batch(seed):
        exs = [train_ds.get_sensor_data(i, rng=np.random.RandomState(seed * 2 + i))
               for i in range(2)]
        return _device_batch(_stack_examples(exs), anchors_np)

    state = create_train_state(model, opt, make_batch(0), batch_size=2)
    losses = []
    for s in range(steps):
        state, metrics = step(state, make_batch(s), jnp.float32(0.2))
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-10:]) < 0.3 * np.mean(losses[:10])

    pcfg = PredictConfig(nms_pre_max_size=128, nms_post_max_size=16,
                         score_threshold=0.001)
    anchors = jnp.asarray(anchors_np)

    @jax.jit
    def eval_fn(params, stats, voxels, coords, num_points, mask):
        b, v = voxels.shape[:2]
        bi = jax.lax.broadcasted_iota(jnp.int32, (b, v, 1), 0)
        c4 = jnp.concatenate([bi, coords], axis=-1).reshape(b * v, 4)
        preds = model.apply({"params": params, "batch_stats": stats},
                            voxels.reshape((b * v,) + voxels.shape[2:]), c4,
                            num_points.reshape(-1), mask.reshape(-1), b,
                            train=False)
        return predict_batch(preds[0], anchors, None, pcfg)

    exs = [val_ds.get_sensor_data(i) for i in range(2)]
    batch = _stack_examples(exs)
    dets = jax.device_get(eval_fn(
        state.params, state.batch_stats,
        jnp.asarray(batch["voxels"]), jnp.asarray(batch["coords"]),
        jnp.asarray(batch["num_points"]), jnp.asarray(batch["voxel_mask"])))

    best = 0.0
    for i in range(2):
        v = dets["valid"][i]
        boxes = dets["box3d_lidar"][i][v]
        if len(boxes):
            m = iou_bev_matrix(gt_by_frame[i][:, [0, 1, 3, 4, 6]],
                               boxes[:, [0, 1, 3, 4, 6]])
            best = max(best, float(m.max()))
    # with only ~2 positive anchors per frame (coarse 0.4m test grid) the
    # observed best IoU after 200 steps is ~0.79; require solid localization
    assert best > 0.5, best
