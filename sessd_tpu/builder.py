"""Builders: reference-schema config dicts -> framework objects.

The TPU-side replacement for the reference's Registry + build_from_cfg
machinery (det3d/utils/registry.py, det3d/models/builder.py,
det3d/builder.py:242-470): plain constructor dispatch, no global mutable
registries.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from .data.augment import GroundTruthSampler
from .data.dataset import KittiDataset
from .data.loader import DataLoader
from .data.pipeline import PipelineConfig
from .models import PointPillars, VoxelNet
from .models.predict import PredictConfig
from .ops.voxelize import VoxelizerSpec
from .train.losses import ConsistencyConfig, LossConfig
from .train.optim import (OneCycleConfig, build_legacy_schedule,
                          build_optimizer, build_optimizer_with_schedule,
                          one_cycle_lr)

_DTYPES = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}


def build_voxelizer(cfg) -> VoxelizerSpec:
    return VoxelizerSpec(
        point_cloud_range=tuple(cfg["range"]),
        voxel_size=tuple(cfg["voxel_size"]),
        max_points=cfg.get("max_points_in_voxel", 5),
        max_voxels=cfg.get("max_voxel_num", 20000),
    )


def _feature_map_size(voxelizer: VoxelizerSpec, out_size_factor: int = 8):
    nx, ny, nz = voxelizer.grid_size
    return (1, ny // out_size_factor, nx // out_size_factor)


def build_detector(cfg, axis_name=None):
    """cfg: the full config (uses model + voxel_generator sections)."""
    m = cfg.model
    dtype = _DTYPES[cfg.get("precision", "float32")]
    voxelizer = build_voxelizer(cfg.voxel_generator)
    if m["type"] == "VoxelNet":
        # bf16 halves activation HBM: the full-scale B=4 step fits without
        # backbone remat and runs ~14% faster (measured scripts/train_ab.py)
        # dense_from_stage=3 keeps stage 2 sparse in TRAINING too: the
        # masked-dense stage-2 convs dominate the fwd+bwd step (954.9 ->
        # 584.7 ms full-scale B=4 bf16+hostrb, scripts/breakdown_train.py);
        # the plan is equivalence-guarded (test_backbone_hybrid.py), params
        # identical, so this is a pure execution-plan default
        kw = {}
        if cfg.get("stage_capacity") is not None:
            # per-sample sparse row capacities — raise for denser-than-KITTI
            # data (a FULL stage id table silently truncates voxels; the
            # trainer warns via _check_train_saturation)
            kw["stage_capacity"] = tuple(int(c) for c in cfg["stage_capacity"])
        return VoxelNet(
            num_input_features=m["reader"].get("num_input_features", 4),
            sparse_shape=voxelizer.sparse_shape,
            tasks=tuple(dict(t) for t in m["bbox_head"]["tasks"]),
            axis_name=axis_name,
            dtype=dtype,
            backbone_remat=cfg.get("backbone_remat", dtype == jnp.float32),
            dense_from_stage=cfg.get("dense_from_stage", 3),
            **kw,
        )
    if m["type"] == "PointPillars":
        nx, ny, _ = voxelizer.grid_size
        return PointPillars(
            num_input_features=m["reader"].get("num_input_features", 4),
            grid_size=(ny, nx),
            voxel_size=tuple(voxelizer.voxel_size[:2]),
            pc_range=tuple(voxelizer.point_cloud_range),
            tasks=tuple(dict(t) for t in m["bbox_head"]["tasks"]),
            axis_name=axis_name,
            dtype=dtype,
        )
    raise ValueError(f"unknown detector type {m['type']}")


def build_pipeline_config(cfg) -> PipelineConfig:
    voxelizer = build_voxelizer(cfg.voxel_generator)
    gens = cfg.target_assigner["anchor_generators"]
    ag = gens[0]
    tp = cfg.get("train_preprocessor", {})
    out_size_factor = cfg.assigner.get("out_size_factor", 8) if "assigner" in cfg else 8
    anchor_specs = None
    if len(gens) > 1:
        # one generator per class -> the multi-class anchor/assigner path
        anchor_specs = tuple(
            dict(class_name=g["class_name"], sizes=tuple(g["sizes"]),
                 anchor_range=tuple(g["anchor_ranges"]),
                 matched_threshold=g.get("matched_threshold", 0.6),
                 unmatched_threshold=g.get("unmatched_threshold", 0.45))
            for g in gens)
    return PipelineConfig(
        anchor_specs=anchor_specs,
        class_names=tuple(cfg.class_names),
        enable_similar_type=bool(cfg.assigner.get("enable_similar_type", True))
        if "assigner" in cfg else True,
        voxelizer=voxelizer,
        feature_map_size=_feature_map_size(voxelizer, out_size_factor),
        anchor_range=tuple(ag["anchor_ranges"]),
        anchor_sizes=tuple(ag["sizes"]),
        anchor_rotations=(0.0, np.pi / 2),
        matched_threshold=ag.get("matched_threshold", 0.6),
        unmatched_threshold=ag.get("unmatched_threshold", 0.45),
        gt_loc_noise=tuple(tp.get("gt_loc_noise", (1.0, 1.0, 0.5))),
        gt_rot_noise=tuple(tp.get("gt_rot_noise", (-0.785, 0.785))),
        global_rot_noise=tuple(tp.get("global_rot_noise", (-0.785, 0.785))),
        global_scale_noise=tuple(tp.get("global_scale_noise", (0.95, 1.05))),
        remove_points_after_sample=tp.get("remove_points_after_sample", True),
        sa_dropout=tp.get("sa_dropout", 0.25),
        sa_sparsity=tuple(tp.get("sa_sparsity", (0.05, 50))),
        sa_swap=tuple(tp.get("sa_swap", (0.1, 50))),
        shuffle_points=tp.get("shuffle_points", True),
        # CIA-SSD (enable_ssl=False) has no teacher: skip the raw twin's
        # voxelization + target assignment (halves per-sample host cost)
        produce_raw=bool(cfg.get("my_paras", {}).get("enable_ssl", True)),
    )


def build_sampler(cfg, seed: int = 0) -> Optional[GroundTruthSampler]:
    db = cfg.get("db_sampler")
    if db is None or not db.get("enable", True):
        return None
    groups = {}
    for g in db["sample_groups"]:
        groups.update(g)
    min_points, removed_difficulty = {}, (-1,)
    for step in db.get("db_prep_steps", []):
        if "filter_by_min_num_points" in step:
            min_points.update(step["filter_by_min_num_points"])
        if "filter_by_difficulty" in step:
            removed_difficulty = tuple(step["filter_by_difficulty"])
    return GroundTruthSampler(
        db_info_path=db["db_info_path"],
        root_path=cfg.data_root,
        sample_groups=groups,
        min_points=min_points,
        removed_difficulty=removed_difficulty,
        rate=db.get("rate", 1.0),
        seed=seed,
    )


def build_dataset(cfg, split: str, seed: int = 0) -> KittiDataset:
    dcfg = cfg.data[split]
    mode = "train" if split == "train" else "val"
    sampler = build_sampler(cfg, seed) if mode == "train" else None
    return KittiDataset(
        root_path=dcfg["root_path"],
        info_path=dcfg["info_path"],
        class_names=dcfg.get("class_names", cfg.class_names),
        mode=mode,
        pipeline_cfg=build_pipeline_config(cfg),
        sampler=sampler,
    )


def build_dataloader(cfg, dataset, shuffle: bool, seed: int = 0,
                     num_shards: int = 1, shard_index: int = 0) -> DataLoader:
    return DataLoader(
        dataset,
        batch_size=cfg.data["samples_per_gpu"],
        shuffle=shuffle,
        seed=seed,
        num_workers=cfg.data.get("workers_per_gpu", 4),
        drop_last=shuffle,
        num_shards=num_shards,
        shard_index=shard_index,
        # "process" spawns per-worker dataset replicas (the reference's
        # DataLoader worker model) — the pure-python augmentation then
        # scales past one core; "thread" is the 1-core-safe default
        worker_type=cfg.data.get("worker_type", "thread"),
    )


def build_optimizer_from_cfg(cfg, steps_per_epoch: int):
    """Returns (optax optimizer, lr_fn(step) -> lr for logging).

    ``lr_config.type``: "one_cycle" (the SE-SSD/CIA-SSD recipe) or a legacy
    LrUpdaterHook policy — fixed/step/exp/poly/cosine (+ warmup) — per
    SURVEY §2 P11 (det3d/torchie/trainer/hooks/lr_updater.py)."""
    lr = cfg.lr_config
    total = cfg.total_epochs * steps_per_epoch
    wd = cfg.optimizer.get("wd", 0.01)
    clip = cfg.optimizer_config["grad_clip"]["max_norm"]
    policy = lr.get("type", lr.get("policy", "one_cycle"))
    if policy == "one_cycle":
        ocfg = OneCycleConfig(
            lr_max=lr["lr_max"],
            moms=tuple(lr["moms"]),
            div_factor=lr["div_factor"],
            pct_start=lr["pct_start"],
            total_steps=total,
            wd=wd,
            grad_clip_norm=clip,
        )
        return build_optimizer(ocfg), one_cycle_lr(ocfg)
    lr_fn = build_legacy_schedule(
        policy, lr.get("lr", cfg.optimizer.get("lr", 3e-3)), steps_per_epoch,
        total, gamma=lr.get("gamma", 0.1), milestones=lr.get("step", ()),
        power=lr.get("power", 1.0), min_lr=lr.get("min_lr", 0.0),
        warmup=lr.get("warmup"), warmup_iters=lr.get("warmup_iters", 500),
        warmup_ratio=lr.get("warmup_ratio", 1.0 / 3.0))
    opt = build_optimizer_with_schedule(lr_fn, wd=wd, grad_clip_norm=clip)
    return opt, lr_fn


def build_loss_config(cfg) -> LossConfig:
    h = cfg.model["bbox_head"]
    tc = cfg.test_cfg
    return LossConfig(
        cls_loss_weight=h["loss_cls"].get("loss_weight", 1.0),
        loc_loss_weight=h["loss_bbox"].get("loss_weight", 2.0),
        dir_loss_weight=h["loss_aux"].get("loss_weight", 0.2),
        focal_alpha=h["loss_cls"].get("alpha", 0.25),
        focal_gamma=h["loss_cls"].get("gamma", 2.0),
        smooth_l1_sigma=h["loss_bbox"].get("sigma", 3.0),
        direction_offset=h.get("direction_offset", 0.0),
        reg_loss=h.get("reg_loss", "odiou"),
        consistency=ConsistencyConfig(
            score_thresh=tc.get("score_threshold", 0.3),
            post_center_range=tuple(tc["post_center_limit_range"]),
        ),
    )


def build_predict_config(cfg) -> PredictConfig:
    tc = cfg.test_cfg
    return PredictConfig(
        score_threshold=tc["score_threshold"],
        nms_pre_max_size=tc["nms"]["nms_pre_max_size"],
        nms_post_max_size=tc["nms"]["nms_post_max_size"],
        nms_iou_threshold=tc["nms"]["nms_iou_threshold"],
        nms_pre_small=tc["nms"].get("nms_pre_small", 256),
        post_center_range=tuple(tc["post_center_limit_range"]),
        use_dir_classifier=cfg.model["bbox_head"].get("loss_aux") is not None,
        direction_offset=cfg.model["bbox_head"].get("direction_offset", 0.0),
        nms_type=tc["nms"].get("nms_type", "rotate_nms"),
    )
