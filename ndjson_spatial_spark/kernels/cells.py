"""Hierarchical spatial cell index (quadkey on web-mercator), from scratch.

No h3/s2 library ships in this sandbox, so the engine uses a Z-order
(Morton-interleaved) quadkey over the web-mercator unit square — the same
family of prefix-hierarchical cell ids H3/S2 provide (BASELINE.json north
star: "batched H3/S2 cell encoding ... into a sorted cell-index column").

Cell id layout (uint64, stored as Spark LongType):

    bits 58..62 : resolution r (0..29)
    bits 0..2r-1: Morton-interleaved (tx, ty) tile coordinates at level r

Properties used by the engine:
  - parent(cell, r') is a right-shift: ids share prefixes along the hierarchy
    (partition pruning / tile assignment = prefix arithmetic);
  - sorted cell ids cluster spatially (Z-order locality) so the cell-index
    column range-partitions well at 10^12-doc scale;
  - ring-k neighborhoods (kNN expanding search) are de-interleave,
    offset, re-interleave — pure numpy bit ops, no per-row Python.

XYZ web-map tiles at zoom z are exactly the level-z cells (tile_x = tx,
tile_y = ty), which is what the raster<->vector tile-assignment operator
(SURVEY §2.7 north-rule additions) uses.

All functions are vectorized numpy; planar/mercator math is closed-form
(EPSG:4326 <-> EPSG:3857), matching SURVEY §2.6 G4 parity scope.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "lonlat_to_mercator",
    "mercator_to_lonlat",
    "unit_xy",
    "cell_id",
    "cell_parent",
    "cell_resolution",
    "cell_tile_xy",
    "cell_neighbors_ring",
    "point_cells",
    "bbox_cells",
    "cover_ancestors",
    "MAX_RES",
    "EARTH_RADIUS",
    "MERC_MAX",
]

EARTH_RADIUS = 6378137.0
MERC_MAX = np.pi * EARTH_RADIUS  # 20037508.342789244
MAX_RES = 29
_RES_SHIFT = 58

# ---------------------------------------------------------------- mercator

def lonlat_to_mercator(lon, lat):
    """EPSG:4326 -> EPSG:3857 (spherical web-mercator), vectorized."""
    lon = np.asarray(lon, np.float64)
    lat = np.clip(np.asarray(lat, np.float64), -85.05112878, 85.05112878)
    x = EARTH_RADIUS * np.radians(lon)
    y = EARTH_RADIUS * np.log(np.tan(np.pi / 4.0 + np.radians(lat) / 2.0))
    return x, y


def mercator_to_lonlat(x, y):
    """EPSG:3857 -> EPSG:4326, vectorized."""
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    lon = np.degrees(x / EARTH_RADIUS)
    lat = np.degrees(2.0 * np.arctan(np.exp(y / EARTH_RADIUS)) - np.pi / 2.0)
    return lon, lat


def unit_xy(x, y):
    """Mercator meters -> unit square [0,1)² with y flipped (XYZ tile style)."""
    u = (np.asarray(x, np.float64) + MERC_MAX) / (2.0 * MERC_MAX)
    v = (MERC_MAX - np.asarray(y, np.float64)) / (2.0 * MERC_MAX)
    return np.clip(u, 0.0, np.nextafter(1.0, 0.0)), np.clip(
        v, 0.0, np.nextafter(1.0, 0.0)
    )


# ---------------------------------------------------------------- morton

def _part1by1(v: np.ndarray) -> np.ndarray:
    """Spread the low 32 bits of v so there is a zero bit between each."""
    v = v.astype(np.uint64) & np.uint64(0xFFFFFFFF)
    v = (v | (v << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
    v = (v | (v << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
    v = (v | (v << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    v = (v | (v << np.uint64(2))) & np.uint64(0x3333333333333333)
    v = (v | (v << np.uint64(1))) & np.uint64(0x5555555555555555)
    return v


def _compact1by1(v: np.ndarray) -> np.ndarray:
    v = v.astype(np.uint64) & np.uint64(0x5555555555555555)
    v = (v | (v >> np.uint64(1))) & np.uint64(0x3333333333333333)
    v = (v | (v >> np.uint64(2))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    v = (v | (v >> np.uint64(4))) & np.uint64(0x00FF00FF00FF00FF)
    v = (v | (v >> np.uint64(8))) & np.uint64(0x0000FFFF0000FFFF)
    v = (v | (v >> np.uint64(16))) & np.uint64(0xFFFFFFFF)
    return v


def _morton(tx: np.ndarray, ty: np.ndarray) -> np.ndarray:
    return _part1by1(tx) | (_part1by1(ty) << np.uint64(1))


def _unmorton(m: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    return _compact1by1(m), _compact1by1(m >> np.uint64(1))


# ---------------------------------------------------------------- cell ids

def cell_id(tx, ty, res: int) -> np.ndarray:
    """(tile_x, tile_y, resolution) -> int64 cell id (vectorized)."""
    if not 0 <= res <= MAX_RES:
        raise ValueError(f"resolution {res} out of range 0..{MAX_RES}")
    tx = np.asarray(tx, np.uint64)
    ty = np.asarray(ty, np.uint64)
    cid = (np.uint64(res) << np.uint64(_RES_SHIFT)) | _morton(tx, ty)
    return cid.astype(np.int64)


def cell_resolution(cid) -> np.ndarray:
    c = np.asarray(cid, np.int64).astype(np.uint64)
    return ((c >> np.uint64(_RES_SHIFT)) & np.uint64(0x1F)).astype(np.int64)


def cell_tile_xy(cid) -> tuple[np.ndarray, np.ndarray]:
    c = np.asarray(cid, np.int64).astype(np.uint64)
    m = c & ((np.uint64(1) << np.uint64(_RES_SHIFT)) - np.uint64(1))
    tx, ty = _unmorton(m)
    return tx.astype(np.int64), ty.astype(np.int64)


def cell_parent(cid, parent_res: int) -> np.ndarray:
    """Coarsen cell ids to parent_res — a shift + re-tag (prefix property)."""
    c = np.asarray(cid, np.int64).astype(np.uint64)
    res = (c >> np.uint64(_RES_SHIFT)) & np.uint64(0x1F)
    m = c & ((np.uint64(1) << np.uint64(_RES_SHIFT)) - np.uint64(1))
    shift = (np.uint64(2) * (res - np.uint64(parent_res))).astype(np.uint64)
    pm = m >> shift
    out = (np.uint64(parent_res) << np.uint64(_RES_SHIFT)) | pm
    return out.astype(np.int64)


def cell_neighbors_ring(cid, k: int) -> np.ndarray:
    """All cells at exactly Chebyshev ring k around each cell.

    Returns shape (n, 8k) for k >= 1 (ring 0 would be the cell itself);
    out-of-grid neighbors are -1 (callers filter).  Used by the kNN
    expanding-ring search (SURVEY §2.3 J6).
    """
    if k < 1:
        raise ValueError("ring k must be >= 1")
    tx, ty = cell_tile_xy(cid)
    res = cell_resolution(cid)
    n = np.uint64(1)
    size = (np.uint64(1) << res.astype(np.uint64)).astype(np.int64)
    offs = []
    for dx in range(-k, k + 1):
        for dy in range(-k, k + 1):
            if max(abs(dx), abs(dy)) == k:
                offs.append((dx, dy))
    nx = tx[:, None] + np.array([o[0] for o in offs])[None, :]
    ny = ty[:, None] + np.array([o[1] for o in offs])[None, :]
    valid = (nx >= 0) & (ny >= 0) & (nx < size[:, None]) & (ny < size[:, None])
    res_b = np.broadcast_to(res[:, None], nx.shape)
    flat = (
        (res_b.astype(np.uint64) << np.uint64(_RES_SHIFT))
        | _morton(np.maximum(nx, 0).astype(np.uint64), np.maximum(ny, 0).astype(np.uint64))
    ).astype(np.int64)
    return np.where(valid, flat, -1)


# ------------------------------------------------------------ assignment

def point_cells(x, y, res: int) -> np.ndarray:
    """Mercator points -> level-`res` cell ids (one per point)."""
    u, v = unit_xy(x, y)
    scale = float(1 << res)
    tx = np.floor(u * scale).astype(np.uint64)
    ty = np.floor(v * scale).astype(np.uint64)
    return cell_id(tx, ty, res)


def bbox_cells(minx, miny, maxx, maxy, res: int, cap: int = 4096,
               min_res: int = 0):
    """Covering cells of a mercator bbox at `res` (per-row list of ids).

    A bbox cover is a SUPERSET of the exact geometry cover — correct for
    candidate-join pruning (exact refinement removes false positives).
    Per-row output is capped: a bbox spanning more than `cap` cells is
    coarsened to the parent resolution until it fits (keeps explode()
    fan-out bounded for continent-sized geometries — the hot-cell/skew
    guard rail at scale).  Coarsening stops at `min_res`; a cover may then
    exceed `cap` (bounded by the 4^min_res grid).  Equi-join callers pair
    that floor with ancestor terms at levels [min_res, res) so covers at
    MIXED resolutions still meet (operators/spatial.py); min_res=0 keeps
    the unbounded-coarsening behavior for non-join covers.

    Returns (list_of_int64_arrays, res_used array).  The count/coarsen
    pass and the Morton encoding are fully vectorized; per-row Python is
    two bounded tile/repeat fills.
    """
    minx = np.asarray(minx, np.float64)
    miny = np.asarray(miny, np.float64)
    maxx = np.asarray(maxx, np.float64)
    maxy = np.asarray(maxy, np.float64)
    n = len(minx)
    if n == 0:
        return [], np.empty(0, np.int64)
    u0, v0 = unit_xy(minx, maxy)  # note: v flips, so maxy -> v0
    u1, v1 = unit_xy(maxx, miny)
    r = np.full(n, res, np.int64)

    def _ranges(idx):
        scale = np.ldexp(1.0, r[idx])
        return (
            (u0[idx] * scale).astype(np.int64),
            (u1[idx] * scale).astype(np.int64),
            (v0[idx] * scale).astype(np.int64),
            (v1[idx] * scale).astype(np.int64),
        )

    tx0, tx1, ty0, ty1 = _ranges(np.arange(n))
    cnt = (tx1 - tx0 + 1) * (ty1 - ty0 + 1)
    while True:
        over = np.flatnonzero((cnt > cap) & (r > min_res))
        if len(over) == 0:
            break
        r[over] -= 1
        a, b, c, d = _ranges(over)
        tx0[over], tx1[over], ty0[over], ty1[over] = a, b, c, d
        cnt[over] = (b - a + 1) * (d - c + 1)

    offs = np.empty(n + 1, np.int64)
    offs[0] = 0
    np.cumsum(cnt, out=offs[1:])
    total = int(offs[-1])
    # ragged grid fill, no per-row loop: position-within-row j decomposes
    # into (x varies fastest) dx = j % nx, dy = j // nx — same enumeration
    # order as tile/repeat per row
    j = np.arange(total, dtype=np.int64) - np.repeat(offs[:-1], cnt)
    nx_rep = np.repeat(tx1 - tx0 + 1, cnt)
    txs = (np.repeat(tx0, cnt) + j % nx_rep).astype(np.uint64)
    tys = (np.repeat(ty0, cnt) + j // nx_rep).astype(np.uint64)
    res_rep = np.repeat(r.astype(np.uint64), cnt)
    cids = ((res_rep << np.uint64(_RES_SHIFT)) | _morton(txs, tys)).astype(np.int64)
    return np.split(cids, offs[1:-1]), r


def cover_ancestors(covers, res_used, levels):
    """Per-row unique ancestor cells of each cover at the given levels.

    `levels` is an iterable of resolutions; row i only emits levels
    strictly below res_used[i] (a cover never needs ancestors at or above
    its own resolution).  Returns a list of int64 arrays (possibly empty).

    Part of the covering+ancestor-terms equi-join scheme (the same design
    the public S2 library documents as S2RegionTermIndexer): a cover
    coarsened by the `cap` guard in :func:`bbox_cells` still meets the
    other side's fine cover through these ancestor terms
    (operators/spatial.py builds the join).
    """
    lv = sorted({int(l) for l in levels})
    out = []
    for i, cov in enumerate(covers):
        ru = int(res_used[i])
        want = [l for l in lv if l < ru]
        if not want or len(cov) == 0:
            out.append(np.empty(0, np.int64))
            continue
        out.append(np.concatenate(
            [np.unique(cell_parent(cov, l)) for l in want]
        ))
    return out
