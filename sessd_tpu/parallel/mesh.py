"""Device mesh + data-parallel SPMD plumbing.

The TPU-native replacement for the reference's entire distributed stack
(SURVEY §2.3: NCCL process groups, DDP, MegDataParallel, syncbn, pickled
all_gather): ONE mesh axis ("data"), `shard_map` over it, `psum` for
gradients and BN moments, `all_gather` for eval outputs. No process
boundaries, no serialization — XLA emits the collectives over ICI.

The sparse backbone sorts voxel ids across its *local* sub-batch only, so
shard_map (not plain jit-with-sharding) is the right tool: each shard runs
the full model on its [local_b, ...] slice with no cross-device data motion
except the gradient psum.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Place host batch arrays with the leading axis split over the mesh.

    Multi-host: each process passes its LOCAL shard (the host-sharded
    DataLoader slice); the global array is assembled across processes —
    the jax equivalent of DistributedSampler + DDP input scatter
    (sampler.py:74-222, SURVEY §2.3).
    """
    sh = NamedSharding(mesh, P(DATA_AXIS))

    def put(x):
        x = np.asarray(x)
        if jax.process_count() > 1:
            return jax.make_array_from_process_local_data(sh, x)
        return jax.device_put(x, sh)
    return jax.tree_util.tree_map(put, batch)


def replicate(tree, mesh: Mesh):
    sh = NamedSharding(mesh, P())
    if jax.process_count() > 1:
        # identical host values on every process -> a replicated global array
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                sh, np.asarray(x)), tree)
    return jax.device_put(tree, sh)


def make_sharded_train_step(train_step_fn, mesh: Mesh):
    """Wrap a single-shard train_step into an SPMD step over the data axis.

    ``train_step_fn(state, batch, cw) -> (state, metrics)`` must already
    psum its gradients? No — it is written for one shard; we take its grads
    implicitly: the wrapped function executes it per-shard and the caller's
    optimizer update happens inside, so instead we require train_step_fn to
    have been built with ``axis_name=DATA_AXIS`` gradient psum (see
    make_train_step(..., axis_name=...)). This wrapper only provides the
    shard_map plumbing and replication specs.
    """
    state_spec = P()          # replicated train state
    batch_spec = P(DATA_AXIS)  # batch split on leading dim
    scalar_spec = P()

    sharded = jax.shard_map(
        train_step_fn,
        mesh=mesh,
        in_specs=(state_spec, batch_spec, scalar_spec),
        out_specs=(state_spec, scalar_spec),
        check_vma=False,
    )
    return jax.jit(sharded)


def all_gather_detections(dets: dict, axis_name: str = DATA_AXIS) -> dict:
    """Gather fixed-shape per-shard detection buffers across the mesh —
    the TPU equivalent of the pickled dist.all_gather at
    trainer/utils.py:115-157."""
    return jax.tree_util.tree_map(
        lambda x: jax.lax.all_gather(x, axis_name, axis=0, tiled=True), dets)
