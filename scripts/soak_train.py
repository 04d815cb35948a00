"""Full-scale end-to-end training soak on the real TPU.

Builds a realistic-scale synthetic KITTI root, then drives the REAL
Trainer — loader with the C++ rulebook batch_transform, bf16 train step
(no remat), one-cycle AdamW, checkpointing, mid-train validation through
the fused serving-plan eval, official AP — for a couple of epochs at the
full KITTI grid (0.05 m voxels, 20k voxels, batch 4). This is the whole
production stack on hardware, not a unit path. Run alone on the TPU.
"""
import os
import pickle
import shutil
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))


def main(num_frames=24, epochs=2):
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from kitti_synth import make_kitti_root
    from test_trainer_e2e import TINY_CONFIG

    from sessd_tpu.config import Config
    from sessd_tpu.data import kitti_common as kc
    from sessd_tpu.train.trainer import Trainer

    tmp = tempfile.mkdtemp(prefix="soak_")
    try:
        root = os.path.join(tmp, "kitti")
        t0 = time.perf_counter()
        make_kitti_root(root, num_frames=num_frames, num_cars=10,
                        pts_per_car=400, ground_points=16000)
        infos = kc.create_kitti_info(root, list(range(num_frames)),
                                     num_workers=2)
        with open(os.path.join(root, "infos.pkl"), "wb") as f:
            pickle.dump(infos, f)
        kc.create_reduced_point_cloud(root, os.path.join(root, "infos.pkl"))
        kc.create_groundtruth_database(
            root, os.path.join(root, "infos.pkl"),
            dbinfo_path=os.path.join(root, "dbinfos_train.pkl"),
            used_classes=("Car",))
        print(f"data prep: {time.perf_counter() - t0:.1f}s", flush=True)

        text = TINY_CONFIG.replace("{ROOT}", root).replace(
            "{WORK}", os.path.join(tmp, "work"))
        # full-scale geometry + production dtype
        text = text.replace("voxel_size=[0.4, 0.4, 0.1]",
                            "voxel_size=[0.05, 0.05, 0.1]")
        text = text.replace("max_voxel_num=2000", "max_voxel_num=20000")
        text = text.replace("samples_per_gpu=2", "samples_per_gpu=4")
        text = text.replace("total_epochs = 1", f"total_epochs = {epochs}")
        text += 'precision = "bfloat16"\nval_interval = 1\n'
        cfg_path = os.path.join(tmp, "cfg.py")
        with open(cfg_path, "w") as f:
            f.write(text)

        cfg = Config.fromfile(cfg_path)
        t0 = time.perf_counter()
        trainer = Trainer(cfg, work_dir=os.path.join(tmp, "work"))
        print(f"trainer init: {time.perf_counter() - t0:.1f}s", flush=True)
        assert trainer.train_loader.batch_transform is not None, \
            "host rulebook transform must be active"
        assert trainer._eval_rb or trainer.mesh is not None

        t0 = time.perf_counter()
        results = trainer.run()
        dt = time.perf_counter() - t0
        steps = int(jax.device_get(trainer.state.step))
        n_scenes = steps * cfg.data["samples_per_gpu"]
        print(f"trained {steps} steps ({n_scenes} scenes) + {epochs}x val "
              f"in {dt:.1f}s", flush=True)
        import json

        def clean(x):
            if isinstance(x, dict):
                return {k: clean(v) for k, v in x.items()}
            try:
                return round(float(x), 2)
            except (TypeError, ValueError):
                return str(x)[:60]

        print("AP results:", json.dumps(clean(results or {})))
        print("SOAK OK")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
