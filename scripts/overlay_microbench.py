"""Single-core microbench of the `_pair_intersection` refinement kernel —
the candidates->refine stage's per-batch cost, no Spark involved.

Load mirrors the concave_clip gate at sf0.1: axis-rect subjects against a
small set of DISTINCT concave L-shaped ref rings, each ref repeated
thousands of times across the batch (exactly what a cell-join candidates
stream looks like).  Prints pairs/s for the 22k-pair load plus a 10x
ring-complexity variant (48-vertex staircase refs), per VERDICT r3 item 5.

Usage: python scripts/overlay_microbench.py [n_pairs]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ndjson_spatial_spark.operators import spatial as SP  # noqa: E402


def l_ring(x0, y0, w=6000.0, h=6000.0, notch=0.5):
    """Concave L: w x h square minus a notch*w x notch*h top-right bite."""
    nw, nh = w * notch, h * notch
    xs = [x0, x0 + w, x0 + w, x0 + w - nw, x0 + w - nw, x0, x0]
    ys = [y0, y0, y0 + h - nh, y0 + h - nh, y0 + h, y0 + h, y0]
    return np.array(xs), np.array(ys)


def staircase_ring(x0, y0, steps=12, w=6000.0, h=6000.0):
    """Concave staircase with 4*steps vertices (10x the L's complexity)."""
    xs, ys = [x0], [y0]
    sw, sh = w / steps, h / steps
    # bottom edge to the right, staircase back up-left
    xs.append(x0 + w)
    ys.append(y0)
    for s in range(steps):
        xs.append(x0 + w - s * sw)
        ys.append(y0 + (s + 1) * sh)
        xs.append(x0 + w - (s + 1) * sw)
        ys.append(y0 + (s + 1) * sh)
    xs.append(x0)
    ys.append(y0)
    return np.array(xs, np.float64), np.array(ys, np.float64)


def geom_row(gt, xs, ys):
    return {"geom_type": gt, "x": list(map(float, xs)),
            "y": list(map(float, ys)),
            "ring_offsets": [0, len(xs)], "part_offsets": [0, 1]}


def build_batch(n_pairs, ring_fn, n_refs=25, seed=7):
    rng = np.random.default_rng(seed)
    refs = [ring_fn(float(k * 1543 % 40000), float(k * 2719 % 40000))
            for k in range(n_refs)]
    a_rows, b_rows = [], []
    for i in range(n_pairs):
        rx, ry = refs[i % n_refs]
        # subject rect overlapping the ref's bbox area
        sx0 = rx.min() + rng.uniform(-2000, 6000)
        sy0 = ry.min() + rng.uniform(-2000, 6000)
        w = rng.uniform(500, 4000)
        h = rng.uniform(500, 4000)
        sxs = np.array([sx0, sx0 + w, sx0 + w, sx0, sx0])
        sys_ = np.array([sy0, sy0, sy0 + h, sy0 + h, sy0])
        a_rows.append(geom_row("Polygon", sxs, sys_))
        b_rows.append(geom_row("Polygon", rx, ry))
    cols = ["geom_type", "x", "y", "ring_offsets", "part_offsets"]
    a = pd.DataFrame({c: [r[c] for r in a_rows] for c in cols})
    b = pd.DataFrame({c: [r[c] for r in b_rows] for c in cols})
    return a, b


def run(label, a, b):
    fn = SP._pair_intersection.func  # unwrap the pandas_udf
    fn(a.head(50), b.head(50))      # warm memos
    t0 = time.perf_counter()
    out = fn(a, b)
    dt = time.perf_counter() - t0
    hits = sum(1 for g in out["geom_type"] if g is not None)
    print(f"{label}: {len(a)} pairs in {dt:.3f}s = "
          f"{len(a) / dt:,.0f} pairs/s/core ({hits} non-empty)")
    return len(a) / dt


def hexagon_ring(x0, y0, r=3000.0):
    """Convex non-rect ring (case C load: general-edge S-H batch)."""
    ang = np.linspace(0, 2 * np.pi, 7)[:-1]
    return x0 + r * np.cos(ang) + r, y0 + r * np.sin(ang) + r


def build_poly_batch(n_pairs, subj_fn, ref_fn, n_refs=25, seed=7):
    """Non-rect subjects (pentagons) against ref_fn rings."""
    rng = np.random.default_rng(seed)
    refs = [ref_fn(float(k * 1543 % 40000), float(k * 2719 % 40000))
            for k in range(n_refs)]
    a_rows, b_rows = [], []
    for i in range(n_pairs):
        rx, ry = refs[i % n_refs]
        cx = rx.min() + rng.uniform(-2000, 6000)
        cy = ry.min() + rng.uniform(-2000, 6000)
        sxs, sys_ = subj_fn(cx, cy, rng.uniform(800, 3000))
        a_rows.append(geom_row("Polygon", sxs, sys_))
        b_rows.append(geom_row("Polygon", rx, ry))
    cols = ["geom_type", "x", "y", "ring_offsets", "part_offsets"]
    a = pd.DataFrame({c: [r[c] for r in a_rows] for c in cols})
    b = pd.DataFrame({c: [r[c] for r in b_rows] for c in cols})
    return a, b


def pentagon(cx, cy, r):
    ang = np.linspace(0, 2 * np.pi, 6)[:-1] + 0.3
    return cx + r * np.cos(ang), cy + r * np.sin(ang)


def run_scalar_equiv(label, a, b):
    """The pre-round-5 path for non-rect pairs: per-row
    _clip_ring_by_ring (what the dispatch loop used to fall through to)."""
    t0 = time.perf_counter()
    hits = 0
    for i in range(len(a)):
        sx = np.asarray(a["x"][i]); sy = np.asarray(a["y"][i])
        cx = np.asarray(b["x"][i]); cy = np.asarray(b["y"][i])
        if SP._clip_ring_by_ring(sx, sy, cx, cy):
            hits += 1
    dt = time.perf_counter() - t0
    print(f"{label}: {len(a)} pairs in {dt:.3f}s = "
          f"{len(a) / dt:,.0f} pairs/s/core ({hits} non-empty) [scalar]")
    return len(a) / dt


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 22_000
    a, b = build_batch(n, l_ring)
    run("rect x concave-L  ", a, b)
    a, b = build_batch(n, staircase_ring)
    run("rect x staircase48", a, b)
    # round-5 batched shapes vs their scalar (pre-round-5) equivalents
    a, b = build_poly_batch(n, pentagon, hexagon_ring)
    run("pent x hexagon    ", a, b)
    run_scalar_equiv("pent x hexagon    ", a, b)
    a, b = build_poly_batch(n, pentagon, l_ring)
    run("pent x concave-L  ", a, b)
    run_scalar_equiv("pent x concave-L  ", a, b)
    a, b = build_poly_batch(n, pentagon, staircase_ring)
    run("pent x staircase48", a, b)
    run_scalar_equiv("pent x staircase48", a, b)


if __name__ == "__main__":
    main()
