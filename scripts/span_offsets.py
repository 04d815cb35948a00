"""Measure PER-OFFSET window spans of the fused serving path's rulebooks.

The Pallas one-hot conv's GEMM FLOPs scale with the window width, and the
kernel's K-loop is Python-unrolled — each kernel offset can use its own
static window. Spans differ by offset class (ids are z-minor: dz taps query
near-consecutive ids; dy taps cross whole y-rows), so summing per-offset
widths instead of K * W_max can cut backbone GEMM FLOPs substantially in
the FLOP-bound batched regime.

For every conv in the serving chain this script reports, per offset, the
exact per-block spans (prep_rulebook semantics: 128-aligned lo, block=256)
over realistic ray-cast scenes at batch 1 and batch 4, then greedily picks
per-offset 128-multiple windows minimizing

    sum_k W_k * nb  +  |union over-blocks| * K * W_large      (FLOP proxy)

subject to the union of over-span blocks staying within a patch budget.
Run on CPU (host numpy only, no TPU needed).
"""
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from sessd_tpu.ops.voxelize import KITTI_VOXELIZER  # noqa: E402
from sessd_tpu.serve import HostPreprocessor  # noqa: E402
from sessd_tpu.utils.synth_scene import make_scene  # noqa: E402

BLOCK = 256
CAPS = (20000, 22000, 18000, 12000, 8000)


def per_offset_spans(rb: np.ndarray, n_in: int, block: int = BLOCK):
    """[K, nb] spans with prep_rulebook's exact lo/hi semantics."""
    n_out, k = rb.shape
    cols_out = -(-n_out // block) * block
    idx = np.full((cols_out, k), n_in, np.int64)
    idx[:n_out] = rb
    idx = idx.T.reshape(k, cols_out // block, block)
    valid = idx < n_in
    has = valid.any(-1)
    lo = np.where(valid, idx, n_in + 1).min(-1).astype(np.int64) & ~np.int64(127)
    hi = np.where(valid, idx, -1).max(-1)
    return np.where(has, hi - lo, 0), has  # [K, nb], [K, nb]


def roundup128(x):
    return int(-(-int(x + 1) // 128) * 128)  # smallest 128-mult > x


def greedy_windows(spans, w_large, budget, k_total):
    """spans [K, nb] pooled over chains; minimize the FLOP proxy.

    A patched block pays K * w_large ONCE and then every offset may shrink
    past it — the union cost is non-additive across offsets — so pick the
    patch SET first: greedily remove the block that most reduces
    sum_k(max remaining span_k), tracking total cost
        nb * sum_k(W_k)  +  P * K * w_large
    at every P <= budget, and keep the best P.
    """
    k, nb = spans.shape
    s = spans.copy()
    alive = np.ones(nb, bool)

    def widths():
        live = s[:, alive]
        w = np.array([roundup128(live[i].max(initial=0)) if live.size
                      else 128 for i in range(k)])
        return np.maximum(w, 128)

    best = None
    patched = []
    for p in range(budget + 1):
        w = widths()
        cost = nb * int(w.sum()) + p * k_total * w_large
        if best is None or cost < best[0]:
            best = (cost, w, p)
        if p == budget or alive.sum() == 0:
            break
        # remove the block with the largest drop in sum_k W_k; only blocks
        # holding some offset's current max can have a nonzero gain
        live_idx = np.nonzero(alive)[0]
        am = live_idx[np.argmax(s[:, alive], axis=1)]
        cand = np.unique(am)
        cur_w = w
        gains = np.zeros(len(cand))
        for j, b in enumerate(cand):
            alive[b] = False
            gains[j] = cur_w.sum() - widths().sum()
            alive[b] = True
        bsel = cand[int(np.argmax(gains))]
        alive[bsel] = False
        patched.append(int(bsel))
    _, w, p = best
    over = int((spans >= w[:, None]).any(0).sum())
    return w, over


def analyze(name, rbs, n_in, w_large, budget, cur_small):
    spans = np.concatenate([per_offset_spans(np.asarray(rb), n_in)[0]
                            for rb in rbs], axis=1)
    k, nb = spans.shape
    w, over = greedy_windows(spans, w_large, budget, k)
    cost = nb * int(w.sum()) + over * k * w_large
    cur_over = int((spans >= cur_small).any(0).sum())
    cur_cost = nb * k * cur_small + cur_over * k * w_large
    print(f"{name}: K={k} nb={nb} max_span={spans.max()} "
          f"cur W={cur_small} over={cur_over} cost={cur_cost / 1e6:.2f}M")
    print(f"  per-offset max: {spans.max(1).tolist()}")
    print(f"  chosen W: {w.tolist()}")
    print(f"  sum(Wk)={int(w.sum())} over={over} cost={cost / 1e6:.2f}M "
          f"({cost / cur_cost:.2%} of current)")
    return w


def main():
    spec = KITTI_VOXELIZER
    prep = HostPreprocessor(spec, CAPS)
    scenes = [np.asarray(make_scene(seed=s)[0]) for s in range(4)]
    for pts in scenes[:prep.ring]:
        prep(pts)

    subm_large = (896, 2048, 1280, 768)
    down_large = (1024, 2048, 1792, 768)
    for label, chains, scale, subm_cur, down_cur in (
            ("batch1", [prep(p)["rulebooks"] for p in scenes], 1,
             (384, 512, 384, 256), (640, 768, 256, 256)),
            ("batch4", [prep.batch([scenes[(i + j) % 4] for j in range(4)])
                        ["rulebooks"] for i in range(2)], 4,
             (384, 512, 384, 384), (640, 1024, 768, 384))):
        print(f"=== {label} ===")
        budget = 16 * scale
        for i in range(4):
            analyze(f"{label} subm{i}",
                    [np.asarray(c["subm"][i]) for c in chains],
                    CAPS[i] * scale, subm_large[i], budget, subm_cur[i])
        for i in range(4):
            analyze(f"{label} down{i}",
                    [np.asarray(c["down"][i]) for c in chains],
                    CAPS[i] * scale, down_large[i], budget, down_cur[i])


if __name__ == "__main__":
    main()
