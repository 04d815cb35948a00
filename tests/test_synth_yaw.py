"""Regression: the ray-cast scene generator's box convention must match the
framework's (core/box_np.py — width along x / length along y at yaw 0,
clockwise-positive yaw).

Until r5, _ray_box_t used its own convention (length along x, CCW-positive
yaw), so a car placed at yaw θ produced points occupying the framework box
at yaw π/2 − θ: every synthetic KITTI label's yaw was wrong by
(2θ − π/2) mod π, uniformly diffuse. Yaw regression was unlearnable and the
train→AP acceptance capped at AP40 3D moderate ≈ 12 (bbox AP ~60, BEV/3D
collapsed — the session-3 error decomposition showed dyaw p50 0.52 rad with
dims/z tight). These tests fail decisively under the old convention.
"""
import numpy as np
import pytest

from sessd_tpu.core import box_np
from sessd_tpu.utils.synth_scene import GROUND_Z, raycast_points


def _contained_frac(points, box, inflate=1.12):
    b = np.asarray(box, np.float64).copy()
    b[3:6] *= inflate
    return float(box_np.points_in_rbbox(points[:, :3], b[None]).mean())


@pytest.mark.parametrize("yaw", [0.0, 0.4, np.pi / 4, 1.2, np.pi / 2,
                                 2.0, np.pi - 0.1, -0.7, -np.pi / 2, -2.4])
def test_raycast_car_points_fit_framework_box(yaw):
    """Every above-ground return from a single-car scene must lie inside the
    (slightly inflated) framework box at the LABEL yaw."""
    rng = np.random.RandomState(int(abs(yaw) * 1000) + 3)
    h = 1.55
    # gravity-center framework box
    box = np.array([18.0, 2.0, GROUND_Z + h / 2, 1.62, 3.9, h, yaw])
    rc = box.copy()
    rc[2] -= h / 2  # raycaster takes bottom-face z
    pts = raycast_points(rng, [rc], (), ())
    car = pts[pts[:, 2] > GROUND_Z + 0.15]  # drop ground returns
    assert len(car) > 100, "car collected too few returns"
    frac = _contained_frac(car, box)
    assert frac > 0.95, f"yaw {yaw}: only {frac:.2f} of returns fit the label box"

    # sharpness: the old (l-along-x, CCW) convention corresponds to the
    # framework box at yaw pi/2 - yaw; away from the self-symmetric angles
    # it must fit clearly worse
    wrong = box.copy()
    wrong[6] = np.pi / 2 - yaw
    d = abs(((yaw - wrong[6]) + np.pi / 2) % np.pi - np.pi / 2)
    if d > 0.3:  # not degenerate-symmetric
        assert _contained_frac(car, wrong) < frac - 0.1


def test_kitti_synth_label_yaw_beats_perp(tmp_path):
    """End-to-end: labels written by make_frame, parsed back through the
    KITTI pipeline, must fit the points better than mirrored/perpendicular
    yaw hypotheses on aggregate."""
    import kitti_synth
    from sessd_tpu.data import kitti_common as kc

    n = 8
    for idx in range(n):
        kitti_synth.make_frame(str(tmp_path), idx, np.random.RandomState(500 + idx),
                               num_cars=1, pts_per_car=400)
    infos = kc.create_kitti_info(str(tmp_path), list(range(n)), training=True)

    adv = []
    for idx, info in enumerate(infos):
        annos = info["annos"]
        if len(annos["name"]) == 0 or annos["name"][0] != "Car":
            continue
        rect = info["calib"]["R0_rect"]
        trv2c = info["calib"]["Tr_velo_to_cam"]
        cam = np.concatenate([annos["location"], annos["dimensions"],
                              annos["rotation_y"][..., None]], axis=1)
        b = box_np.box_camera_to_lidar(cam, rect, trv2c)[0]
        b[2] += b[5] / 2
        pts = np.fromfile(tmp_path / "training" / "velodyne" / f"{idx:06d}.bin",
                          np.float32).reshape(-1, 4)
        diag = 0.5 * np.hypot(b[3], b[4])
        near = pts[(np.hypot(pts[:, 0] - b[0], pts[:, 1] - b[1]) < diag * 1.05)
                   & (np.abs(pts[:, 2] - b[2]) < b[5] / 2 + 0.1)]
        if len(near) < 40:
            continue

        def frac(dy):
            o = b.copy()
            o[6] += dy
            o[3:6] *= 1.1
            return float(box_np.points_in_rbbox(near, o[None]).mean())

        adv.append(frac(0.0) - max(frac(np.pi / 2), frac(-2 * b[6])))
    assert len(adv) >= 5
    # label must win on aggregate and never lose decisively
    assert np.mean(adv) > 0.15, f"label-yaw advantage too small: {adv}"
    assert min(adv) > -0.05, f"a car fits a wrong yaw decisively better: {adv}"
