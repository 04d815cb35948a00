"""Golden ODIoU values + input gradients from the reference's own torch code.

Runs /root/reference/det3d/models/losses/odious.py (pure torch autograd +
scipy — no CUDA) over batteries of box-pair regimes and records, per pair,
the elementwise odiou value and d(odiou)/d(gbox), d(odiou)/d(qbox), plus one
composed weighted-loss battery (the exact odiou_3D.forward reduction,
odious.py:845-900).

Per-pair values/grads are extracted by calling forward on single pairs with
weight=1, batch_size=2: loss = 2*od*1/2 = od.

The reference's MBR-diag iterates scipy hull vertices and drops the closing
edge (odious.py:610) — WHICH edge is dropped depends on qhull's arbitrary
starting vertex (verified unstable across inputs), so our emulation
(core/odiou.ref_mbr_diag) includes all hull edges. Each battery therefore
carries a `clean` mask, computed from an implementation-independent numpy
mirror: a pair is clean iff including vs excluding the closing edge yields
the same diag. On clean pairs the JAX port must match the reference tightly
(values AND gradients); on the rest only a loose value bound applies.

Output: tests/goldens/ref_odiou.npz (committed artifact).
"""
import importlib.util
import os

import numpy as np
import torch
from scipy.spatial import ConvexHull

SPEC = importlib.util.spec_from_file_location(
    "ref_odious", "/root/reference/det3d/models/losses/odious.py")
REF = importlib.util.module_from_spec(SPEC)
SPEC.loader.exec_module(REF)


def ref_corners8(g, q):
    """The 8 BEV corner points exactly as odious.py:864-869 stacks them."""
    rbc = REF.rbbox_to_corners()
    cg = rbc(torch.tensor(g[:, [0, 1, 3, 4, 6]]))
    cq = rbc(torch.tensor(q[:, [0, 1, 3, 4, 6]]))
    cg1 = torch.stack((cg[:, [0, 2, 4, 6]], cg[:, [1, 3, 5, 7]]), 2)
    cq1 = torch.stack((cq[:, [0, 2, 4, 6]], cq[:, [1, 3, 5, 7]]), 2)
    return torch.cat((cg1, cq1), 1).numpy()  # [N, 8, 2]


def np_mbr_diag(pts, include_closing):
    """Numpy mirror of odious.py:597-630 (mbr via hull-edge angles)."""
    hull = ConvexHull(pts.astype(np.float64))
    hp = pts[hull.vertices]
    edges = (np.roll(hp, -1, 0) - hp) if include_closing else hp[1:] - hp[:-1]
    ang = np.abs(np.fmod(np.arctan2(edges[:, 1], edges[:, 0]), np.pi / 2))
    best = (np.inf, np.nan)
    for t in ang:
        c, s = np.cos(t), np.sin(t)
        rx = pts[:, 0] * c + pts[:, 1] * s
        ry = -pts[:, 0] * s + pts[:, 1] * c
        w = rx.max() - rx.min()
        h = ry.max() - ry.min()
        if w * h < best[0]:
            best = (w * h, float(np.hypot(w, h)))
    return best[1]


def clean_mask(g, q):
    """Pairs whose reference diag does not depend on the dropped edge."""
    pts = ref_corners8(np.clip(g, -200, 200), np.clip(q, -200, 200))
    mask = np.zeros(len(g), bool)
    for i in range(len(g)):
        a = np_mbr_diag(pts[i], False)
        b = np_mbr_diag(pts[i], True)
        mask[i] = abs(a - b) <= 1e-6 * max(abs(a), 1.0)
    return mask


def per_pair(g, q):
    n = len(g)
    vals = np.zeros(n, np.float32)
    dg = np.zeros((n, 7), np.float32)
    dq = np.zeros((n, 7), np.float32)
    for i in range(n):
        tg = torch.tensor(g[i:i + 1], requires_grad=True)
        tq = torch.tensor(q[i:i + 1], requires_grad=True)
        loss = REF.odiou_3D().forward(tg, tq, torch.ones(1), 2.0)
        loss.backward()
        vals[i] = float(loss.detach())
        dg[i] = tg.grad.numpy()[0]
        dq[i] = tq.grad.numpy()[0]
    return vals, dg, dq


def make_batteries(rng):
    def base(n, lo=-20, hi=20):
        g = np.zeros((n, 7), np.float32)
        g[:, :3] = rng.uniform(lo, hi, (n, 3))
        g[:, 3:6] = rng.uniform(0.5, 4.0, (n, 3))
        g[:, 6] = rng.uniform(-np.pi, np.pi, n)
        return g

    out = {}
    g = base(64)
    q = g.copy()
    q[:, :3] += rng.normal(0, 0.5, (64, 3)).astype(np.float32)
    q[:, 3:6] *= rng.uniform(0.8, 1.2, (64, 3)).astype(np.float32)
    q[:, 6] += rng.normal(0, 0.3, 64).astype(np.float32)
    out["general"] = (g, q)

    g = base(32)
    q = g + rng.normal(0, 0.01, (32, 7)).astype(np.float32)
    out["near_identical"] = (g, q)

    g = base(32)
    q = base(32)
    q[:, :2] = g[:, :2] + rng.uniform(6, 30, (32, 2)) * np.sign(
        rng.normal(size=(32, 2)))
    out["disjoint"] = (g, q)

    g = base(16)
    q = g.copy()
    q[:, 3:6] *= rng.uniform(0.3, 0.6, (16, 3)).astype(np.float32)
    q[:, :3] += rng.normal(0, 0.1, (16, 3)).astype(np.float32)
    q[:, 6] += rng.normal(0, 0.2, 16).astype(np.float32)
    out["contained"] = (g, q)

    # past the odious.py:855 clamp range on some coordinates
    g = base(16, -300, 300)
    q = g.copy()
    q[:, :3] += rng.normal(0, 1.0, (16, 3)).astype(np.float32)
    q[:, 6] += rng.normal(0, 0.3, 16).astype(np.float32)
    out["large_coords"] = (g, q)

    # rotations near the abs(fmod(ang, pi/2)) fold boundaries
    g = base(32)
    g[:, 6] = (rng.integers(-2, 3, 32) * (np.pi / 2)
               + rng.normal(0, 0.02, 32)).astype(np.float32)
    q = g.copy()
    q[:, :3] += rng.normal(0, 0.3, (32, 3)).astype(np.float32)
    q[:, 6] += rng.normal(0, 0.05, 32).astype(np.float32)
    out["fold_boundary"] = (g, q)
    return out


def main():
    rng = np.random.default_rng(2024)
    arrays = {}
    names = []
    for name, (g, q) in make_batteries(rng).items():
        vals, dg, dq = per_pair(g, q)
        clean = clean_mask(g, q)
        frac = clean.mean()
        print(f"{name}: n={len(g)} clean={frac:.2%}")
        assert frac >= 0.6, f"{name}: clean fraction too low ({frac})"
        names.append(name)
        arrays[f"{name}_g"] = g
        arrays[f"{name}_q"] = q
        arrays[f"{name}_val"] = vals
        arrays[f"{name}_dg"] = dg
        arrays[f"{name}_dq"] = dq
        arrays[f"{name}_clean"] = clean

    # composed weighted reduction on the clean subset of `general`
    g, q = arrays["general_g"], arrays["general_q"]
    clean = arrays["general_clean"]
    gc, qc = g[clean], q[clean]
    w = rng.uniform(0.1, 2.0, len(gc)).astype(np.float32)
    tg = torch.tensor(gc, requires_grad=True)
    tq = torch.tensor(qc, requires_grad=True)
    loss = REF.odiou_3D().forward(tg, tq, torch.tensor(w), 3.0)
    loss.backward()
    arrays["composed_g"] = gc
    arrays["composed_q"] = qc
    arrays["composed_w"] = w
    arrays["composed_batch_size"] = np.float32(3.0)
    arrays["composed_loss"] = np.float32(loss.detach())
    arrays["composed_dg"] = tg.grad.numpy()
    arrays["composed_dq"] = tq.grad.numpy()
    arrays["battery_names"] = np.array(names)

    dest = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "goldens", "ref_odiou.npz")
    np.savez_compressed(dest, **arrays)
    print("wrote", dest, f"{os.path.getsize(dest) / 1e3:.1f} KB")


if __name__ == "__main__":
    main()
