"""Evaluator tests: C++ kernel vs python fallback, and AP sanity cases."""
import numpy as np
import pytest

from sessd_tpu.data import kitti_eval as ke


def make_anno(rng, n, cls="Car", score=None, perfect_of=None, shift=0.0):
    if perfect_of is not None:
        a = {k: (v.copy() if isinstance(v, np.ndarray) else v)
             for k, v in perfect_of.items()}
        a["score"] = rng.uniform(0.5, 1.0, len(a["name"]))
        a["location"] = a["location"] + shift
        return a
    loc = np.stack([rng.uniform(-20, 20, n), rng.uniform(0.5, 2.5, n),
                    rng.uniform(5, 60, n)], axis=1)
    dims = np.stack([rng.uniform(3.2, 4.6, n), rng.uniform(1.4, 1.8, n),
                     rng.uniform(1.5, 1.9, n)], axis=1)  # l, h, w
    rot = rng.uniform(-np.pi, np.pi, n)
    bbox = np.stack([rng.uniform(0, 500, n), rng.uniform(0, 200, n)], axis=1)
    bbox = np.concatenate([bbox, bbox + [100, 80]], axis=1)
    anno = {
        "name": np.array([cls] * n),
        "truncated": np.zeros(n),
        "occluded": np.zeros(n, dtype=np.int64),
        "alpha": rng.uniform(-np.pi, np.pi, n),
        "bbox": bbox,
        "dimensions": dims,
        "location": loc,
        "rotation_y": rot,
        "score": np.zeros(n) if score is None else np.full(n, score),
    }
    return anno


def test_native_kernel_matches_python(rng):
    from sessd_tpu.utils.native import get_native

    native = get_native()
    assert native is not None, "g++ build failed"
    for trial in range(20):
        ng, nd = rng.randint(1, 12), rng.randint(1, 15)
        overlaps = rng.uniform(0, 1, (nd, ng))
        gt_datas = np.concatenate(
            [rng.uniform(0, 300, (ng, 4)), rng.uniform(-3, 3, (ng, 1))], axis=1)
        gt_datas[:, 2:4] += gt_datas[:, 0:2] + 30
        dt_datas = np.concatenate(
            [rng.uniform(0, 300, (nd, 4)), rng.uniform(-3, 3, (nd, 1)),
             rng.uniform(0, 1, (nd, 1))], axis=1)
        dt_datas[:, 2:4] += dt_datas[:, 0:2] + 30
        ig = rng.choice([-1, 0, 1], ng)
        idt = rng.choice([-1, 0, 1], nd)
        dc = rng.uniform(0, 300, (rng.randint(0, 3), 4))
        dc[:, 2:4] += dc[:, 0:2]
        for compute_fp in (False, True):
            for aos in (False, True):
                thr = float(rng.uniform(0, 1))
                a = ke.compute_statistics_py(overlaps, gt_datas, dt_datas, ig, idt,
                                             dc, 0, 0.5, thr, compute_fp, aos)
                b = native.compute_statistics(overlaps, gt_datas, dt_datas, ig, idt,
                                              dc, 0, 0.5, thr, compute_fp, aos)
                assert a[:3] == b[:3], (trial, compute_fp, aos)
                np.testing.assert_allclose(a[3], b[3], atol=1e-9)
                np.testing.assert_allclose(a[4], b[4], atol=1e-12)


def test_perfect_detections_ap100(rng):
    gt_annos, dt_annos = [], []
    for _ in range(10):
        gt = make_anno(rng, 6)
        gt["bbox"][:, 3] = gt["bbox"][:, 1] + 80  # tall enough for easy
        dt = make_anno(rng, 0, perfect_of=gt)
        gt_annos.append(gt)
        dt_annos.append(dt)
    res = ke.get_official_eval_result(gt_annos, dt_annos, classes=("Car",))
    for metric in ("bbox", "bev", "3d"):
        for d in (0, 1, 2):
            assert res["Car"][metric][d]["AP11"] > 99.9, (metric, d)
            assert res["Car"][metric][d]["AP40"] > 99.9, (metric, d)


def test_no_detections_ap0(rng):
    gt_annos, dt_annos = [], []
    for _ in range(5):
        gt = make_anno(rng, 4)
        gt["bbox"][:, 3] = gt["bbox"][:, 1] + 80
        gt_annos.append(gt)
        dt_annos.append(make_anno(rng, 0))
    res = ke.get_official_eval_result(gt_annos, dt_annos, classes=("Car",),
                                      compute_aos=False)
    assert res["Car"]["3d"][1]["AP11"] == 0.0


def test_shifted_detections_low_3d_ap(rng):
    # detections offset by 3m: bbox AP can stay (same 2d boxes), 3d AP dies
    gt_annos, dt_annos = [], []
    for _ in range(8):
        gt = make_anno(rng, 5)
        gt["bbox"][:, 3] = gt["bbox"][:, 1] + 80
        dt = make_anno(rng, 0, perfect_of=gt, shift=np.array([3.0, 0, 0]))
        gt_annos.append(gt)
        dt_annos.append(dt)
    res = ke.get_official_eval_result(gt_annos, dt_annos, classes=("Car",),
                                      compute_aos=False)
    assert res["Car"]["3d"][1]["AP11"] < 10.0
    # 40 gts can only fill 40 of 41 recall points -> 10/11 of full AP11
    assert res["Car"]["bbox"][1]["AP11"] > 90.0


def test_count_valid_gt_difficulty_gates():
    import numpy as np

    from sessd_tpu.data.kitti_eval import count_valid_gt

    def anno(heights, occluded=0, truncated=0.0, name="Car"):
        n = len(heights)
        bbox = np.zeros((n, 4), np.float32)
        bbox[:, 3] = np.asarray(heights, np.float32)  # y2 - y1 = height
        return {
            "name": np.array([name] * n),
            "bbox": bbox,
            "occluded": np.full((n,), occluded, np.int64),
            "truncated": np.full((n,), truncated, np.float32),
        }

    # two cars with 50 px boxes (pass every gate), one 30 px (fails the
    # easy 40 px MIN_HEIGHT gate), one occluded=2 (moderate gate fails too)
    gt_annos = [anno([50.0, 50.0, 30.0]), anno([50.0], occluded=2)]
    counts = count_valid_gt(gt_annos, classes=("Car",))["Car"]
    assert counts == {"easy": 2, "moderate": 3, "hard": 4}
