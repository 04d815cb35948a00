#!/usr/bin/env python
"""Offline KITTI preparation: info pkls, reduced clouds, GT database
(tools/create_data.py equivalent)."""
import argparse
import pickle
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def read_split(path):
    with open(path) as f:
        return [int(l.strip()) for l in f if l.strip()]


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("root", help="KITTI object root (with training/)")
    parser.add_argument("--splits_dir", default=None,
                        help="dir with train.txt/val.txt (ImageSets)")
    parser.add_argument("--out_dir", default=None)
    args = parser.parse_args()

    from sessd_tpu.data import kitti_common as kc

    root = Path(args.root)
    out = Path(args.out_dir or root)
    splits_dir = Path(args.splits_dir) if args.splits_dir else root / "ImageSets"

    for split in ("train", "val"):
        ids_file = splits_dir / f"{split}.txt"
        if not ids_file.exists():
            print(f"skip {split}: {ids_file} missing")
            continue
        ids = read_split(ids_file)
        print(f"building infos for {split} ({len(ids)} frames)")
        infos = kc.create_kitti_info(root, ids, training=True)
        info_path = out / f"kitti_infos_{split}.pkl"
        with open(info_path, "wb") as f:
            pickle.dump(infos, f)
        print(f"reducing point clouds for {split}")
        kc.create_reduced_point_cloud(root, info_path)
        if split == "train":
            print("building GT database")
            kc.create_groundtruth_database(
                root, info_path,
                dbinfo_path=out / "dbinfos_train.pkl")
    print("done")


if __name__ == "__main__":
    main()
