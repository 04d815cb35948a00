"""Batch loader: seeded shuffling, per-host sharding, threaded prefetch.

Replaces the reference's torch DataLoader + DistributedGroupSampler +
collate_kitti stack (SURVEY §2 P13-P15). Because every example is already a
fixed-capacity dict of numpy arrays, collation is a plain ``np.stack`` — the
reference's ragged concat/pad logic (collate.py:154-230) disappears.

Sharding follows the JAX multi-host model: each host iterates only its
``process_index``-th slice of the epoch permutation; the device mesh sees
[local_batch, ...] arrays (SURVEY §2.3 TPU-native equivalents).
"""
from __future__ import annotations

import concurrent.futures
import threading
from typing import Iterator, Optional

import numpy as np


def _stack_examples(examples) -> dict:
    out = {}
    for k, v in examples[0].items():
        if k in ("metadata", "calib"):
            out[k] = [e[k] for e in examples]
        elif isinstance(v, dict):
            out[k] = _stack_examples([e[k] for e in examples])
        else:
            out[k] = np.stack([np.asarray(e[k]) for e in examples])
    return out


class DataLoader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        seed: int = 0,
        num_workers: int = 4,
        drop_last: bool = True,
        num_shards: int = 1,
        shard_index: int = 0,
        prefetch: int = 2,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.num_workers = max(num_workers, 1)
        self.drop_last = drop_last
        self.num_shards = num_shards
        self.shard_index = shard_index
        self.prefetch = prefetch
        self.epoch = 0

    def set_epoch(self, epoch: int):
        """Epoch-seeded reshuffle (the DistSamplerSeedHook equivalent)."""
        self.epoch = epoch

    def _epoch_indices(self) -> np.ndarray:
        n = len(self.dataset)
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self.epoch)
            idx = rng.permutation(n)
        else:
            idx = np.arange(n)
        # pad so every shard sees the same number of samples
        per_shard = -(-n // self.num_shards)
        if self.num_shards > 1:
            pad = per_shard * self.num_shards - n
            if pad:
                idx = np.concatenate([idx, idx[:pad]])
            idx = idx[self.shard_index :: self.num_shards]
        return idx

    def __len__(self):
        n = len(self._epoch_indices())
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self) -> Iterator[dict]:
        indices = self._epoch_indices()
        nb = len(self)
        batches = [indices[i * self.batch_size : (i + 1) * self.batch_size]
                   for i in range(nb)]

        def load_one(args):
            pos, idx = args
            # deterministic per-(epoch, sample) rng
            rng = np.random.RandomState(
                (self.seed * 1_000_003 + self.epoch * 131_071 + int(idx)) % (2 ** 31))
            return self.dataset.get_sensor_data(int(idx), rng=rng)

        with concurrent.futures.ThreadPoolExecutor(self.num_workers) as ex:
            pending = []
            it = iter(batches)

            def submit_next():
                try:
                    b = next(it)
                except StopIteration:
                    return False
                pending.append([ex.submit(load_one, (i, idx)) for i, idx in enumerate(b)])
                return True

            for _ in range(self.prefetch + 1):
                if not submit_next():
                    break
            while pending:
                futs = pending.pop(0)
                submit_next()
                yield _stack_examples([f.result() for f in futs])
