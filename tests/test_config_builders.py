"""The shipped configs parse and every builder constructs from them."""
import numpy as np
import pytest

from sessd_tpu import builder
from sessd_tpu.config import Config

CONFIGS = [
    "sessd_tpu/configs/se_ssd_kitti_car.py",
    "sessd_tpu/configs/cia_ssd_kitti_car.py",
    "sessd_tpu/configs/point_pillars_kitti_car.py",
    "sessd_tpu/configs/se_ssd_kitti_car_bf16.py",
]


@pytest.mark.parametrize("path", CONFIGS)
def test_config_parses_and_builds(path):
    cfg = Config.fromfile(path)
    assert cfg.model["type"] in ("VoxelNet", "PointPillars")
    assert "nms" in cfg.test_cfg

    model = builder.build_detector(cfg)
    assert model is not None

    vox = builder.build_voxelizer(cfg.voxel_generator)
    assert vox.max_voxels > 0

    pcfg = builder.build_pipeline_config(cfg)
    assert pcfg.feature_map_size[1] > 0

    lcfg = builder.build_loss_config(cfg)
    assert lcfg.loc_loss_weight == 2.0

    predcfg = builder.build_predict_config(cfg)
    assert predcfg.nms_post_max_size == cfg.test_cfg["nms"]["nms_post_max_size"]

    opt, lr_fn = builder.build_optimizer_from_cfg(cfg, steps_per_epoch=10)
    # one-cycle starts at lr_max / div_factor
    import jax.numpy as jnp
    lr0 = float(lr_fn(jnp.int32(0)))
    assert lr0 == pytest.approx(
        cfg.lr_config["lr_max"] / cfg.lr_config["div_factor"], rel=1e-5)
    # schedule has decayed to ~lr_max/div/1e4 by the end of training
    assert float(lr_fn(jnp.int32(cfg.total_epochs * 10))) < lr0


def test_se_ssd_config_matches_reference_surface():
    cfg = Config.fromfile(CONFIGS[0])
    # the reference's headline hyperparameters (examples/second/configs)
    assert cfg.voxel_generator["voxel_size"] == [0.05, 0.05, 0.1]
    assert cfg.voxel_generator["max_voxel_num"] == 20000
    ag = cfg.target_assigner["anchor_generators"][0]
    assert ag["sizes"] == [1.6, 3.9, 1.56]
    assert ag["matched_threshold"] == 0.6
    assert cfg.test_cfg["score_threshold"] == 0.3
    assert cfg.lr_config["lr_max"] == 0.003
    assert cfg.total_epochs == 60
    assert cfg.my_paras["enable_ssl"] is True

    cia = Config.fromfile(CONFIGS[1])
    assert cia.my_paras["enable_ssl"] is False


def test_bf16_config_disables_remat():
    cfg = Config.fromfile("sessd_tpu/configs/se_ssd_kitti_car_bf16.py")
    import jax.numpy as jnp
    m = builder.build_detector(cfg)
    assert m.dtype == jnp.bfloat16 and m.backbone_remat is False
    m32 = builder.build_detector(Config.fromfile(CONFIGS[0]))
    assert m32.dtype == jnp.float32 and m32.backbone_remat is True
