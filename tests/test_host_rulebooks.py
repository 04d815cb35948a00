"""Host (C++) rulebook builder vs the device (ops/sparse.py) chain: exact
array equality for ids, perm, submanifold and downsample rulebooks."""
import numpy as np
import jax.numpy as jnp
import pytest

from sessd_tpu.ops import sparse as sp
from sessd_tpu.utils.native import get_native

DOWNS = [
    ((3, 3, 3), (2, 2, 2), (1, 1, 1)),
    ((3, 3, 3), (2, 2, 2), (1, 1, 1)),
    ((3, 3, 3), (2, 2, 2), (0, 1, 1)),
    ((3, 1, 1), (2, 1, 1), (0, 0, 0)),
]


def _device_chain(coords, valid, shape, caps):
    grid, perm = sp.grid_from_coords(jnp.asarray(coords), jnp.asarray(valid),
                                     shape, caps[0])
    out = {"perm": np.asarray(perm), "ids": [np.asarray(grid.ids)],
           "subm": [np.asarray(sp.subm_rulebook(grid))], "down": []}
    for i, (dk, dstr, dp) in enumerate(DOWNS):
        grid, rbd = sp.downsample_rulebook(grid, dk, dstr, dp, caps[i + 1])
        out["ids"].append(np.asarray(grid.ids))
        out["down"].append(np.asarray(rbd))
        if i < 3:
            out["subm"].append(np.asarray(sp.subm_rulebook(grid)))
    return out


def _coords(rng, n, shape, batch=1):
    b, d, h, w = shape
    seen = set()
    rows = []
    while len(rows) < n:
        c = (rng.randint(batch), rng.randint(d), rng.randint(h), rng.randint(w))
        if c not in seen:
            seen.add(c)
            rows.append(c)
    return np.asarray(rows, np.int32)


@pytest.mark.parametrize("batch,cap_slack", [(1, 30), (2, 30), (1, 0)])
def test_host_rulebooks_match_device(batch, cap_slack):
    native = get_native()
    if native is None:
        pytest.skip("no native toolchain")
    rng = np.random.RandomState(0)
    shape = (batch, 21, 160, 144)  # small but deep enough for 4 downsamples
    n = 600 * batch
    caps = [n + cap_slack, n + cap_slack, n, n // 2 + 40, n // 4 + 20]
    coords = _coords(rng, n, shape, batch)
    # per-sample valid-prefix layout like the batched pipelines produce:
    # pad each sample's block to cap0/batch with invalid rows
    per = caps[0] // batch
    full = np.zeros((caps[0], 4), np.int32)
    valid = np.zeros((caps[0],), bool)
    for bi in range(batch):
        rows = coords[coords[:, 0] == bi]
        full[bi * per: bi * per + len(rows)] = rows
        valid[bi * per: bi * per + len(rows)] = True

    dev = _device_chain(full, valid, shape, caps)
    host = native.build_rulebooks(full, valid, shape, caps, DOWNS)

    np.testing.assert_array_equal(host["perm"], dev["perm"])
    for i in range(5):
        np.testing.assert_array_equal(host["ids"][i], dev["ids"][i], err_msg=f"ids[{i}]")
    for i in range(4):
        np.testing.assert_array_equal(host["subm"][i], dev["subm"][i], err_msg=f"subm[{i}]")
        np.testing.assert_array_equal(host["down"][i], dev["down"][i], err_msg=f"down[{i}]")


def test_host_rulebooks_downsample_truncation():
    """When unique downsample outputs exceed capacity, the smallest ids are
    kept — identical to the device compaction."""
    native = get_native()
    if native is None:
        pytest.skip("no native toolchain")
    rng = np.random.RandomState(1)
    shape = (1, 21, 64, 64)
    n = 400
    caps = [n, 150, 80, 40, 20]  # tight: forces truncation at every stage
    coords = _coords(rng, n, shape)
    valid = np.ones((n,), bool)
    dev = _device_chain(coords, valid, shape, caps)
    host = native.build_rulebooks(coords, valid, shape, caps, DOWNS)
    for i in range(5):
        np.testing.assert_array_equal(host["ids"][i], dev["ids"][i], err_msg=f"ids[{i}]")
    for i in range(4):
        np.testing.assert_array_equal(host["down"][i], dev["down"][i], err_msg=f"down[{i}]")


def test_host_rulebooks_int16_matches_int32():
    """out_dtype=int16 (direct C++ int16 writes, serving path) is value-
    identical to the int32 chain."""
    native = get_native()
    if native is None:
        pytest.skip("no native toolchain")
    rng = np.random.RandomState(3)
    shape = (1, 41, 64, 64)
    caps = [400, 420, 380, 300, 200]
    coords = _coords(rng, 400, shape)
    valid = np.ones((400,), bool)
    rb32 = native.build_rulebooks(coords, valid, shape, caps, DOWNS)
    rb16 = native.build_rulebooks(coords, valid, shape, caps, DOWNS,
                                  out_dtype=np.int16)
    assert rb16["perm"].dtype == np.int16
    np.testing.assert_array_equal(rb16["perm"], rb32["perm"])
    for a, b in zip(rb16["ids"], rb32["ids"]):
        np.testing.assert_array_equal(a, b)
    for key in ("subm", "down"):
        for a, b in zip(rb16[key], rb32[key]):
            assert a.dtype == np.int16
            np.testing.assert_array_equal(a, b)


def test_train_transform_concurrent_batches():
    """The loader's prefetch pool runs the rulebook batch_transform for
    several in-flight batches CONCURRENTLY (loader.py assemble futures).
    Scratch buffers must therefore be acquired per build, not fixed per
    shard — a fixed ring raced: one thread's C++ overwrote a set another
    thread was still reading, corrupting perm (observed as an
    IndexError: perm entry >= n in utils/native.py glue)."""
    import concurrent.futures

    from sessd_tpu.data.rulebooks import (build_batch_rulebooks,
                                          make_train_rulebook_transform)

    native = get_native()
    if native is None:
        pytest.skip("no native toolchain")
    rng = np.random.RandomState(7)
    shape = (21, 80, 72)
    caps = (500, 520, 480, 360, 240)
    tf = make_train_rulebook_transform(shape, caps, num_shards=1,
                                       suffixes=("",))

    def make_batch(seed):
        r = np.random.RandomState(seed)
        b = 2
        # DIFFERENT valid counts per batch: stale cross-batch scratch reads
        # then show up as out-of-range perm entries
        batches_c = np.zeros((b, caps[0], 3), np.int32)
        batches_m = np.zeros((b, caps[0]), bool)
        for bi in range(b):
            n = r.randint(caps[0] // 2, caps[0])
            c = _coords(r, n, (1,) + shape)[:, 1:]
            batches_c[bi, :n] = c
            batches_m[bi, :n] = True
        return {"coords": batches_c, "voxel_mask": batches_m}

    batches = [make_batch(s) for s in range(8)]
    want = []
    for bt in batches:  # sequential scratch-free ground truth
        rb = build_batch_rulebooks(bt["coords"], bt["voxel_mask"], shape,
                                   caps)
        want.append(rb)

    with concurrent.futures.ThreadPoolExecutor(4) as ex:
        for _ in range(3):  # several rounds to let interleavings vary
            got = list(ex.map(tf, [dict(bt) for bt in batches]))
            for g, w in zip(got, want):
                rb = g["rulebooks"]
                np.testing.assert_array_equal(rb["perm"][0], w["perm"])
                for a, b_ in zip(rb["ids"], w["ids"]):
                    np.testing.assert_array_equal(a[0], b_)
                for key in ("subm", "down"):
                    for a, b_ in zip(rb[key], w[key]):
                        np.testing.assert_array_equal(a[0], b_)
