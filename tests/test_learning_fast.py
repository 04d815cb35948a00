"""Fast always-on learning tier: ~30 full SE-SSD train steps on two tiny
synthetic frames must (a) drive the composed loss down and (b) improve the
best post-NMS BEV IoU against ground truth over the untrained net.

This is the ungated stand-in for the long-form system test in
test_learning_e2e.py (200 steps, env-gated): same stack — pipeline, targets,
teacher/student jitted step, EMA, predict — at a coarser grid and fewer
steps, with thresholds set ~2x below observed values. VERDICT r3 item #1.
"""
import pickle

import numpy as np
import pytest


@pytest.mark.slow
def test_loss_slope_and_postnms_iou_improve(tmp_path, rng):
    import jax
    import jax.numpy as jnp

    from kitti_synth import make_kitti_root

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

    # coarse 0.8 m grid: 88x96 BEV (both divisible by the ds factor 8),
    # feature map 12x11 — small enough that the whole test (compile +
    # 30 CPU steps + 2 evals) stays ~2 min
    vox = VoxelizerSpec((0.0, -38.4, -3.0, 70.4, 38.4, 1.0),
                        (0.8, 0.8, 0.1), max_points=5, max_voxels=1200)
    cfg = PipelineConfig(
        voxelizer=vox, feature_map_size=(1, 12, 11),
        anchor_range=(0.0, -38.4, -1.0, 70.4, 38.4, -1.0),
        gt_loc_noise=(0.05, 0.05, 0.02), gt_rot_noise=(-0.05, 0.05),
        global_rot_noise=(-0.1, 0.1), global_scale_noise=(0.99, 1.01),
        sa_dropout=None, sa_sparsity=(0.0, 50), sa_swap=(0.0, 50),
        matched_threshold=0.45, unmatched_threshold=0.3)
    train_ds = KittiDataset(str(root), str(root / "infos.pkl"), mode="train",
                            pipeline_cfg=cfg)
    val_ds = KittiDataset(str(root), str(root / "infos.pkl"), mode="val",
                          pipeline_cfg=cfg)
    anchors_np = train_ds.anchors.astype(np.float32)

    model = VoxelNet(sparse_shape=vox.sparse_shape, stage_capacity=(1200,) * 5)
    steps = 30
    opt = build_optimizer(OneCycleConfig(lr_max=2e-3, total_steps=steps,
                                         pct_start=0.3))
    lcfg = LossConfig(max_positive_anchors=32,
                      consistency=ConsistencyConfig(top_k=16))
    step = jax.jit(make_train_step(model, opt, lcfg,
                                   compute_teacher_metrics=False))

    def make_batch(seed):
        exs = [train_ds.get_sensor_data(i, rng=np.random.RandomState(seed * 2 + i))
               for i in range(2)]
        return _device_batch(_stack_examples(exs), anchors_np)

    state = create_train_state(model, opt, make_batch(0), batch_size=2)

    pcfg = PredictConfig(nms_pre_max_size=64, nms_post_max_size=8,
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

    def best_iou(state):
        exs = [val_ds.get_sensor_data(i) for i in range(2)]
        batch = _stack_examples(exs)
        dets = jax.device_get(eval_fn(
            state.params, state.batch_stats,
            jnp.asarray(batch["voxels"]), jnp.asarray(batch["coords"]),
            jnp.asarray(batch["num_points"]), jnp.asarray(batch["voxel_mask"])))
        best = 0.0
        for i in range(2):
            boxes = dets["box3d_lidar"][i][dets["valid"][i]]
            if len(boxes):
                m = iou_bev_matrix(gt_by_frame[i][:, [0, 1, 3, 4, 6]],
                                   boxes[:, [0, 1, 3, 4, 6]])
                best = max(best, float(m.max()))
        return best

    iou_before = best_iou(state)
    losses = []
    for s in range(steps):
        state, metrics = step(state, make_batch(s), jnp.float32(0.2))
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all(), losses

    # loss slope: observed ratio ~0.2 at 30 steps; require < 0.6
    head, tail = np.mean(losses[:5]), np.mean(losses[-5:])
    assert tail < 0.6 * head, (head, tail)

    # post-NMS localization must improve over the untrained net
    # (observed: ~0.0-0.1 before, >0.4 after 30 steps; require +0.1 and 0.25)
    iou_after = best_iou(state)
    assert iou_after > iou_before + 0.1, (iou_before, iou_after)
    assert iou_after > 0.25, (iou_before, iou_after)
