"""ODIoU parity vs the reference's OWN torch autograd code.

Goldens (tests/goldens/ref_odiou.npz, built by scripts/make_odiou_goldens.py)
are per-pair values AND input gradients of odious.py:845-900 (odiou_3D) run
on CPU over six box-pair regimes, plus one composed weighted reduction.

Each battery carries a `clean` mask: pairs whose reference MBR diag does not
depend on which hull edge the reference's qhull-order-dependent loop drops
(odious.py:610 skips the closing edge; the dropped edge is an arbitrary
qhull internal — see core/odiou.ref_mbr_diag). Clean pairs must match
tightly in value and gradient; unclean pairs get a loose value bound only.
"""
import os

import numpy as np
import pytest

import jax

from sessd_tpu.core.odiou import odiou_3d, odiou_3d_loss

GOLDEN = os.path.join(os.path.dirname(__file__), "goldens", "ref_odiou.npz")

# value rtol per battery: near-identical boxes amplify f32 tie noise in the
# MBR argmin; coords near the +-200 clamp lose mantissa in the corner math
VAL_RTOL = {
    "general": 1e-3,
    "near_identical": 1e-2,
    "disjoint": 1e-3,
    "contained": 1e-3,
    "large_coords": 5e-2,
    "fold_boundary": 1e-3,
}
# gradients: measured worst clean-pair deviation is ~0.03 absolute
# (argmin ties between equal-area rectangles flip which corners carry the
# gradient); typical magnitudes are O(0.1-3), so atol=0.05 still catches
# any systematic error or sign flip on a load-bearing component
GRAD_ATOL = 0.05
GRAD_RTOL = 0.02


@pytest.fixture(scope="module")
def golden():
    return np.load(GOLDEN, allow_pickle=True)


@pytest.fixture(scope="module")
def grad_fn():
    return jax.jit(jax.vmap(jax.grad(
        lambda g, q: odiou_3d(g, q), argnums=(0, 1))))


@pytest.mark.parametrize("name", list(VAL_RTOL))
def test_values(golden, name):
    g, q = golden[f"{name}_g"], golden[f"{name}_q"]
    clean = golden[f"{name}_clean"]
    ref = golden[f"{name}_val"]
    ours = np.asarray(odiou_3d(g, q))
    rtol = VAL_RTOL[name]
    err = np.abs(ours - ref) / (np.abs(ref) + 1e-4)
    assert err[clean].max() <= rtol, (
        f"{name}: clean value err {err[clean].max():.2e} > {rtol}")
    if (~clean).any():
        # dropped-edge pairs: the reference's own answer is qhull-order
        # dependent; bound the drift instead of matching it
        assert err[~clean].max() <= 0.1


@pytest.mark.parametrize("name", list(VAL_RTOL))
def test_gradients(golden, grad_fn, name):
    g, q = golden[f"{name}_g"], golden[f"{name}_q"]
    clean = golden[f"{name}_clean"]
    dg, dq = grad_fn(g, q)
    for ours, ref in ((np.asarray(dg), golden[f"{name}_dg"]),
                      (np.asarray(dq), golden[f"{name}_dq"])):
        bound = GRAD_ATOL + GRAD_RTOL * np.abs(ref[clean])
        diff = np.abs(ours[clean] - ref[clean])
        assert (diff <= bound).all(), (
            f"{name}: grad mismatch max {(diff - bound).max():.4f} "
            f"above bound at {np.unravel_index((diff - bound).argmax(), diff.shape)}")


def test_composed_loss(golden):
    g, q = golden["composed_g"], golden["composed_q"]
    w = golden["composed_w"]
    bs = float(golden["composed_batch_size"])
    ref = float(golden["composed_loss"])

    f = lambda a, b: odiou_3d_loss(a, b, w, bs)
    ours = float(f(g, q))
    assert abs(ours - ref) / abs(ref) <= 1e-3

    dg, dq = jax.grad(f, argnums=(0, 1))(g, q)
    # the sum averages out per-pair argmin-tie noise -> tighter bound
    for o, r in ((np.asarray(dg), golden["composed_dg"]),
                 (np.asarray(dq), golden["composed_dq"])):
        assert (np.abs(o - r) <= 5e-3 + 0.02 * np.abs(r)).all()


def test_indicator_zeroes_degenerate_pairs():
    """Degenerate (non-positive dim) pairs must contribute exactly zero.

    Not goldenable: the reference's own forward raises a shape error when
    any indicator is false (odious.py:895 adds a [n_valid] slice to the
    full-length angle_factor), so this only ever runs all-valid batches
    there; we keep the masked semantics and pin them here.
    """
    g = np.array([[0, 0, 0, 2, 2, 2, 0.3], [1, 1, 1, 0.0, 2, 2, 0.1]],
                 np.float32)
    q = np.array([[0.2, 0, 0, 2, 2, 2, 0.2], [1, 1, 1, 2, 2, 2, 0.1]],
                 np.float32)
    od = np.asarray(odiou_3d(g, q))
    assert od[1] == 0.0
    assert od[0] > 0.0
    dg = np.asarray(jax.grad(lambda a: odiou_3d(a, q).sum())(g))
    assert np.isfinite(dg).all()
    assert (dg[1] == 0).all()
