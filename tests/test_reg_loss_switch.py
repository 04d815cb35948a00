"""LossConfig.reg_loss selects the total's regression term: "odiou"
(SE-SSD, mg_head_sessd.py:781) vs "smooth_l1" (plain head / CIA-SSD,
mg_head.py:616-627 — the loss the warm-start producer trains with)."""
import numpy as np


def _case():
    import jax.numpy as jnp
    from sessd_tpu.core.anchors import create_anchors_3d_range

    anchors = create_anchors_3d_range(
        [1, 6, 6], [0, -40, -1.0, 70.4, 40, -1.0]).reshape(-1, 7).astype(
            np.float32)
    a = anchors.shape[0]
    labels = np.zeros((1, a), np.int32)
    labels[0, 3] = 1
    labels[0, 11] = 1
    rng = np.random.RandomState(0)
    reg_t = np.zeros((1, a, 7), np.float32)
    reg_t[0, [3, 11]] = rng.uniform(-0.2, 0.2, (2, 7)).astype(np.float32)
    preds = {"box_preds": jnp.asarray(
                 rng.uniform(-0.3, 0.3, (1, a, 7)).astype(np.float32)),
             "cls_preds": jnp.zeros((1, a, 1), jnp.float32),
             "dir_cls_preds": jnp.zeros((1, a, 2), jnp.float32),
             "iou_preds": jnp.zeros((1, a, 1), jnp.float32)}
    batch = {"anchors": jnp.asarray(anchors)[None],
             "labels": jnp.asarray(labels),
             "reg_targets": jnp.asarray(reg_t)}
    return preds, batch


def test_reg_loss_switch_changes_only_the_reg_term():
    from sessd_tpu.train.losses import LossConfig, detection_loss

    preds, batch = _case()
    t_od, m_od = detection_loss(preds, batch,
                                LossConfig(max_positive_anchors=8))
    t_sl, m_sl = detection_loss(
        preds, batch, LossConfig(max_positive_anchors=8,
                                 reg_loss="smooth_l1"))
    # metrics identical (both terms always computed for parity logging)
    for k in ("cls_loss_reduced", "loc_loss_reduced", "ious_loss",
              "iou_pred_loss", "dir_loss_reduced"):
        np.testing.assert_allclose(float(m_od[k]), float(m_sl[k]), rtol=1e-6)
    # totals differ by exactly (ious_loss - loc_loss_reduced)
    np.testing.assert_allclose(
        float(t_od) - float(t_sl),
        float(m_od["ious_loss"]) - float(m_od["loc_loss_reduced"]),
        rtol=1e-5, atol=1e-6)


def test_builder_wires_reg_loss():
    from sessd_tpu import builder
    from sessd_tpu.config import Config
    import os

    root = os.path.join(os.path.dirname(__file__), "..", "sessd_tpu",
                        "configs")
    cfg_cia = Config.fromfile(os.path.join(root, "cia_ssd_kitti_car.py"))
    assert builder.build_loss_config(cfg_cia).reg_loss == "smooth_l1"
    cfg_sessd = Config.fromfile(os.path.join(root, "se_ssd_kitti_car.py"))
    assert builder.build_loss_config(cfg_sessd).reg_loss == "odiou"
