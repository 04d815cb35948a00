"""Full-system smoke test: synthetic KITTI -> Trainer -> 1 tiny epoch ->
checkpoint -> resume -> validate. Exercises config parsing, builders, the
sharded train step, orbax checkpointing and the eval loop together."""
import pickle

import numpy as np
import pytest

from kitti_synth import make_kitti_root

TINY_CONFIG = """
import itertools
tasks = [dict(num_class=1, class_names=["Car"])]
class_names = ["Car"]
box_coder = dict(type="ground_box3d_coder", n_dim=7)
my_paras = dict(batch_size=2, enable_ssl=True)
model = dict(
    type="VoxelNet",
    reader=dict(type="VoxelFeatureExtractorV3", num_input_features=4),
    backbone=dict(type="SpMiddleFHD", num_input_features=4, ds_factor=8),
    neck=dict(type="SSFA", num_input_features=128),
    bbox_head=dict(
        type="MultiGroupHead", mode="3d", in_channels=128, tasks=tasks,
        box_coder=box_coder, encode_background_as_zeros=True,
        loss_norm=dict(type="NormByNumPositives"),
        loss_cls=dict(type="SigmoidFocalLoss", alpha=0.25, gamma=2.0, loss_weight=1.0),
        use_sigmoid_score=True,
        loss_bbox=dict(type="WeightedSmoothL1Loss", sigma=3.0, codewise=True, loss_weight=2.0),
        encode_rad_error_by_sin=True,
        loss_aux=dict(type="WeightedSoftmaxClassificationLoss", loss_weight=0.2),
        direction_offset=0.0,
    ),
)
target_assigner = dict(
    type="iou",
    anchor_generators=[dict(
        type="anchor_generator_range", sizes=[1.6, 3.9, 1.56],
        anchor_ranges=[0, -40.0, -1.0, 70.4, 40.0, -1.0], rotations=[0, 1.57],
        matched_threshold=0.6, unmatched_threshold=0.45, class_name="Car")],
    sample_positive_fraction=-1, sample_size=512,
    region_similarity_calculator=dict(type="nearest_iou_similarity"),
    tasks=tasks,
)
assigner = dict(box_coder=box_coder, target_assigner=target_assigner,
                out_size_factor=8, enable_similar_type=True)
train_cfg = dict(assigner=assigner)
test_cfg = dict(
    nms=dict(use_rotate_nms=True, nms_pre_max_size=100, nms_post_max_size=20,
             nms_iou_threshold=0.01),
    score_threshold=0.3,
    post_center_limit_range=[0, -40.0, -5.0, 70.4, 40.0, 5.0],
    max_per_img=20,
)
voxel_generator = dict(
    range=[0, -40.0, -3.0, 70.4, 40.0, 1.0],
    voxel_size=[0.4, 0.4, 0.1],
    max_points_in_voxel=5, max_voxel_num=2000,
)
data_root = "{ROOT}"
db_sampler = dict(type="GT-AUG", enable=True,
                  db_info_path=data_root + "/dbinfos_train.pkl",
                  sample_groups=[dict(Car=5)],
                  db_prep_steps=[dict(filter_by_min_num_points=dict(Car=5)),
                                 dict(filter_by_difficulty=[-1])],
                  rate=1.0)
train_preprocessor = dict(mode="train", shuffle_points=True,
                          gt_loc_noise=[0.2, 0.2, 0.1], gt_rot_noise=[-0.2, 0.2],
                          global_rot_noise=[-0.3, 0.3], global_scale_noise=[0.95, 1.05],
                          remove_points_after_sample=True, db_sampler=db_sampler,
                          class_names=class_names, enable_similar_type=True)
data = dict(
    samples_per_gpu=2, workers_per_gpu=2,
    train=dict(type="KittiDataset", root_path=data_root,
               info_path=data_root + "/infos.pkl", class_names=class_names),
    val=dict(type="KittiDataset", root_path=data_root,
             info_path=data_root + "/infos.pkl", class_names=class_names),
)
optimizer = dict(type="adam", wd=0.01, fixed_wd=True)
optimizer_config = dict(grad_clip=dict(max_norm=35, norm_type=2))
lr_config = dict(type="one_cycle", lr_max=0.003, moms=[0.95, 0.85],
                 div_factor=10.0, pct_start=0.4)
checkpoint_config = dict(interval=1)
log_config = dict(interval=1)
total_epochs = 1
work_dir = "{WORK}"
load_from = None
resume_from = None
workflow = [("train", 1), ("val", 1)]
"""


@pytest.mark.slow
def test_trainer_end_to_end(tmp_path):
    root = tmp_path / "kitti"
    work = tmp_path / "work"
    from sessd_tpu.data import kitti_common as kc

    make_kitti_root(root, num_frames=4, num_cars=2)
    infos = kc.create_kitti_info(root, list(range(4)), num_workers=2)
    with open(root / "infos.pkl", "wb") as f:
        pickle.dump(infos, f)
    kc.create_reduced_point_cloud(root, root / "infos.pkl")
    kc.create_groundtruth_database(root, root / "infos.pkl",
                                   dbinfo_path=root / "dbinfos_train.pkl",
                                   used_classes=("Car",))

    cfg_path = tmp_path / "cfg.py"
    cfg_path.write_text(
        TINY_CONFIG.replace("{ROOT}", str(root)).replace("{WORK}", str(work)))

    from sessd_tpu.config import Config
    from sessd_tpu.train.trainer import Trainer

    cfg = Config.fromfile(cfg_path)
    assert cfg.total_epochs == 1
    trainer = Trainer(cfg, work_dir=str(work), distributed=True)
    results = trainer.run()
    assert int(trainer.state.step) == len(trainer.train_loader)
    # AP on an untrained net is ~0 but evaluation must complete
    assert results is not None and "Car" in results

    # resume from the saved checkpoint
    trainer2 = Trainer(cfg, work_dir=str(work), distributed=True)
    trainer2.resume()
    assert trainer2.epoch == 1
    assert int(np.asarray(trainer2.state.step)) == len(trainer.train_loader)

    # per-sample debug eval (test_v2 / tools/test.py --eval_ids):
    # hand-picked indices -> detections -> KITTI label lines
    from sessd_tpu.data.kitti_common import annos_to_kitti_label

    dets = trainer2.predict_samples([0, 2])
    assert len(dets) == 2
    annos = trainer2.val_dataset.convert_detection_to_kitti_annos(
        dets, indices=[0, 2])
    for anno in annos:
        lines = annos_to_kitti_label(anno)
        assert len(lines) == len(anno["name"])
        for line in lines:
            assert len(line.split(" ")) == 16  # KITTI label format + score

    # the single-process eval path (tools/test.py: distributed=False) uses
    # host rulebooks + the all-sparse serving plan; same checkpoint must
    # yield the same detections as the sharded eval (which, when the native
    # lib is present, now ALSO uses per-shard host rulebook chains — this
    # comparison is the sharded-vs-single host-rb equivalence test)
    trainer3 = Trainer(cfg, work_dir=str(work), distributed=False)
    trainer3.resume()
    if trainer3._eval_rb:
        dets3 = trainer3.predict_samples([0, 2])
        for a, b in zip(dets, dets3):
            assert a["box3d_lidar"].shape == b["box3d_lidar"].shape
            np.testing.assert_allclose(a["box3d_lidar"], b["box3d_lidar"],
                                       rtol=1e-4, atol=1e-4)
            np.testing.assert_allclose(a["scores"], b["scores"],
                                       rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_cia_pretrain_then_sessd_warmstart(tmp_path):
    """The reference's two-stage recipe end-to-end at tiny scale: CIA-SSD
    supervised-only pretrain (enable_ssl=False — no teacher forward, no
    ``*_raw`` batch keys, trainer.py path SURVEY P4) -> SE-SSD warm start
    from its checkpoint (load_checkpoint_from_scratch semantics,
    trainer_sessd.py:212-217: student AND teacher from the pretrained
    params, optimizer state restored, step reset)."""
    import jax

    root = tmp_path / "kitti"
    from sessd_tpu.data import kitti_common as kc

    make_kitti_root(root, num_frames=2, num_cars=2)
    infos = kc.create_kitti_info(root, [0, 1], num_workers=2)
    with open(root / "infos.pkl", "wb") as f:
        pickle.dump(infos, f)
    kc.create_reduced_point_cloud(root, root / "infos.pkl")
    kc.create_groundtruth_database(root, root / "infos.pkl",
                                   dbinfo_path=root / "dbinfos_train.pkl",
                                   used_classes=("Car",))

    from sessd_tpu.config import Config
    from sessd_tpu.train.trainer import Trainer

    work_cia = tmp_path / "work_cia"
    cfg_cia = tmp_path / "cfg_cia.py"
    cfg_cia.write_text(
        TINY_CONFIG.replace("{ROOT}", str(root))
        .replace("{WORK}", str(work_cia))
        .replace("enable_ssl=True", "enable_ssl=False"))
    trainer = Trainer(Config.fromfile(cfg_cia), work_dir=str(work_cia),
                      distributed=False)
    # the CIA pipeline must not produce the teacher twin at all
    batch = next(iter(trainer.train_loader))
    assert "voxels_raw" not in batch
    assert "rulebooks_raw" not in batch
    assert "transformation" not in batch
    results = trainer.run()
    assert results is not None and "Car" in results
    assert len(trainer.val_history) == 1
    steps = int(np.asarray(trainer.state.step))
    assert steps == len(trainer.train_loader)

    # warm start SE-SSD from the CIA checkpoint
    work_se = tmp_path / "work_se"
    cfg_se = tmp_path / "cfg_se.py"
    cfg_se.write_text(
        TINY_CONFIG.replace("{ROOT}", str(root))
        .replace("{WORK}", str(work_se)))
    t2 = Trainer(Config.fromfile(cfg_se), work_dir=str(work_se),
                 distributed=False)
    t2.load_from(str(work_cia))
    pre = jax.device_get(trainer.state.params)
    post = jax.device_get(t2.state.params)
    post_ema = jax.device_get(t2.state.ema_params)
    jax.tree_util.tree_map(np.testing.assert_allclose, pre, post)
    # teacher initialized from the SAME pretrained params
    jax.tree_util.tree_map(np.testing.assert_allclose, post, post_ema)
    # schedule restarts: step back to 0
    assert int(np.asarray(t2.state.step)) == 0
    # one SSL step must run from the warm-started state
    t2.cfg.total_epochs = 1
    res2 = t2.run()
    assert res2 is not None and int(np.asarray(t2.state.step)) > 0
