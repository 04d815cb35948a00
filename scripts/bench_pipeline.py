"""Training input-pipeline throughput (VERDICT r1 #4).

Builds a realistic-scale synthetic KITTI root (~19k points/frame, 12 cars),
runs the full augmentation pipeline (GT-AUG paste + per-object noise +
global transforms + SA-DA + double voxelization + double target assignment)
through the DataLoader and reports scenes/sec — to compare against the
train-step rate (2.34 scenes/sec/chip at r1). Pure CPU; no TPU needed.
"""
import os
import pickle
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import numpy as np

from kitti_synth import make_kitti_root
from sessd_tpu.data import kitti_common as kc


def main(num_frames=32, workers=int(os.environ.get("WORKERS", "4"))):
    tmp = tempfile.mkdtemp(prefix="pipe_bench_")
    try:
        root = os.path.join(tmp, "kitti")
        t0 = time.perf_counter()
        make_kitti_root(root, num_frames=num_frames, num_cars=12,
                        pts_per_car=400, ground_points=16000)
        infos = kc.create_kitti_info(root, list(range(num_frames)), num_workers=4)
        info_path = os.path.join(root, "infos.pkl")
        with open(info_path, "wb") as f:
            pickle.dump(infos, f)
        kc.create_reduced_point_cloud(root, info_path)
        kc.create_groundtruth_database(
            root, info_path, dbinfo_path=os.path.join(root, "dbinfos_train.pkl"),
            used_classes=("Car",))
        print(f"data prep: {time.perf_counter() - t0:.1f}s")

        sys.path.insert(0, os.path.join(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))))
        from test_trainer_e2e import TINY_CONFIG  # reuse the full config
        cfg_text = TINY_CONFIG.replace("{ROOT}", root).replace("{WORK}", tmp)
        # full-scale voxel grid + capacities (the tiny config shrinks them)
        cfg_text = cfg_text.replace("voxel_size=[0.4, 0.4, 0.1]",
                                    "voxel_size=[0.05, 0.05, 0.1]")
        cfg_text = cfg_text.replace("max_voxel_num=2000", "max_voxel_num=20000")
        cfg_path = os.path.join(tmp, "cfg.py")
        with open(cfg_path, "w") as f:
            f.write(cfg_text)

        from sessd_tpu import builder
        from sessd_tpu.config import Config

        cfg = Config.fromfile(cfg_path)
        cfg.data["workers_per_gpu"] = workers
        dataset = builder.build_dataset(cfg, "train", seed=0)
        loader = builder.build_dataloader(cfg, dataset, shuffle=True, seed=0)
        if os.environ.get("RULEBOOKS", "1") == "1":
            # the production loader also builds the C++ rulebook chains
            # (student + teacher) per batch — include that cost
            from sessd_tpu.data.rulebooks import make_train_rulebook_transform
            model = builder.build_detector(cfg)
            loader.batch_transform = make_train_rulebook_transform(
                model.sparse_shape, model.stage_capacity)
            print("rulebook transform:",
                  "on" if loader.batch_transform else "native unavailable")

        # warm epoch (imports, caches)
        n = 0
        for batch in loader:
            n += batch["voxels"].shape[0]
        t0 = time.perf_counter()
        epochs = 3
        n = 0
        for e in range(epochs):
            loader.set_epoch(e + 1)
            for batch in loader:
                n += batch["voxels"].shape[0]
        dt = time.perf_counter() - t0
        print(f"pipeline throughput: {n / dt:.2f} scenes/sec "
              f"({workers} workers, {n} scenes in {dt:.1f}s)")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
