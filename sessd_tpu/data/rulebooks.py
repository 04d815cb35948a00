"""Loader-side (host C++) rulebook construction for TRAINING batches.

The sparse backbone's rulebook chain (permutation, per-stage voxel ids,
subm/down gather maps) is a pure function of the batch's voxel coords —
the reference leaves this work to spconv's on-GPU hash tables per forward
(det3d/models/backbones/scn.py:92-189 via spconv), but on TPU the
construction is scalar-core bound (~49 ms of a 67 ms forward, measured).
Building it in the data path with native/rulebook.cpp removes every
device-side sort/LUT lookup from the jitted train step; the arrays ride
into the batch dict and shard over the data mesh axis like any other leaf.

Sharding layout: every rulebook leaf is stacked with a leading
``num_shards`` axis. `shard_map` splits that axis over the mesh, so each
device sees a [1, ...] view of the chain built for ITS local sub-batch
(grid (local_b, D, H, W), capacities scaled by local_b);
train_step squeezes the unit axis before handing it to the model.
"""
from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import numpy as np

# strided-transition geometry of SpMiddleFHD (models/backbone.py stage plan)
DOWNS = [
    ((3, 3, 3), (2, 2, 2), (1, 1, 1)),
    ((3, 3, 3), (2, 2, 2), (1, 1, 1)),
    ((3, 3, 3), (2, 2, 2), (0, 1, 1)),
    ((3, 1, 1), (2, 1, 1), (0, 0, 0)),
]


def _tree_stack(dicts):
    """Stack a list of rulebook dicts leaf-wise along a new leading axis."""
    out = {}
    for k, v in dicts[0].items():
        if isinstance(v, (list, tuple)):
            out[k] = [np.stack([d[k][i] for d in dicts]) for i in range(len(v))]
        else:
            out[k] = np.stack([d[k] for d in dicts])
    return out


def make_train_rulebook_transform(
    sparse_shape: Tuple[int, int, int],
    stage_capacity: Sequence[int],
    num_shards: int = 1,
    downs=tuple(DOWNS),
    suffixes: Sequence[str] = ("", "_raw"),
) -> Optional[Callable[[dict], dict]]:
    """Returns a batch->batch transform adding ``rulebooks``/``rulebooks_raw``
    (one chain per student/teacher input set), or None when the native
    library is unavailable (the device falls back to in-graph construction).
    """
    from ..utils.native import get_native

    native = get_native()
    if native is None:
        return None
    caps = [int(c) for c in stage_capacity]

    def transform(batch: dict) -> dict:
        out = dict(batch)
        for suffix in suffixes:
            coords = np.asarray(batch["coords" + suffix])      # [B, V, 3] zyx
            mask = np.asarray(batch["voxel_mask" + suffix])    # [B, V]
            b, v, _ = coords.shape
            assert b % num_shards == 0, (b, num_shards)
            lb = b // num_shards
            bidx = np.repeat(np.arange(lb, dtype=np.int32), v)[:, None]
            # int16 gather maps when the per-shard capacities fit (halves
            # the fill/transfer bytes; the backbone upcasts in-graph)
            odt = np.int16 if max(caps) * lb < 2 ** 15 else np.int32
            shards = []
            for s in range(num_shards):
                c = coords[s * lb:(s + 1) * lb].reshape(-1, 3)
                m = mask[s * lb:(s + 1) * lb].reshape(-1)
                bzyx = np.concatenate([bidx, c.astype(np.int32)], axis=1)
                shards.append(native.build_rulebooks(
                    bzyx, m, (lb,) + tuple(sparse_shape),
                    [cap * lb for cap in caps], list(downs), out_dtype=odt))
            out["rulebooks" + suffix] = _tree_stack(shards)
        return out

    return transform
