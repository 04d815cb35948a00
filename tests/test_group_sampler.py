"""Group-aware batching (GroupSampler / DistributedGroupSampler semantics,
det3d/datasets/loader/sampler.py:98-222): batches never mix groups, every
sample appears, shards see disjoint group-pure batches."""
import numpy as np

from sessd_tpu.data.loader import DataLoader


class _Tiny:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def get_sensor_data(self, idx, rng=None):
        return {"x": np.asarray([idx], np.int64)}


def _batches(loader):
    return [b["x"][:, 0] for b in loader]


def test_batches_are_group_pure():
    n, bs = 23, 4
    flags = (np.arange(n) % 3 == 0).astype(np.int64)  # two uneven groups
    dl = DataLoader(_Tiny(n), batch_size=bs, shuffle=True, seed=3,
                    num_workers=1, group_flags=flags)
    for epoch in range(2):
        dl.set_epoch(epoch)
        seen = []
        for idx in _batches(dl):
            assert len(set(flags[idx])) == 1, idx  # one group per batch
            seen.extend(idx.tolist())
        # every sample appears at least once (groups pad by wrapping)
        assert set(seen) >= set(range(n))


def test_group_sharding_is_disjoint_and_pure():
    n, bs, shards = 30, 3, 2
    flags = (np.arange(n) >= 14).astype(np.int64)
    per_shard = []
    for s in range(shards):
        dl = DataLoader(_Tiny(n), batch_size=bs, shuffle=True, seed=0,
                        num_workers=1, group_flags=flags,
                        num_shards=shards, shard_index=s)
        got = _batches(dl)
        for idx in got:
            assert len(set(flags[idx])) == 1
        per_shard.append(got)
    # same number of batches per shard; union covers the dataset
    assert len(per_shard[0]) == len(per_shard[1])
    allseen = set()
    for got in per_shard:
        for idx in got:
            allseen.update(idx.tolist())
    assert allseen >= set(range(n))


def test_no_flags_unchanged():
    dl = DataLoader(_Tiny(10), batch_size=2, shuffle=True, seed=0,
                    num_workers=1)
    seen = sorted(np.concatenate(_batches(dl)).tolist())
    assert seen == list(range(10))
