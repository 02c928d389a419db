r"""Grouped geometry dissolve — the PostGIS ``ST_Union(geom)`` AGGREGATE
(GEOS CascadedUnion) the pairwise ``st_boolean('union')`` scalar can't
express: collapse all polygons of a group into one dissolved
Polygon/MultiPolygon.

The reference reaches GEOS only through pairwise intersection
(ndjson-spatial/src/intersection.rs:133); the dissolve aggregate is an
engine extension completing the boolean-ops suite (same scope rules as
st_boolean: single-part exterior rings; other rows are skipped).

Plan (the 100 TB shape): ONE shuffle on the group key into an
Arrow-batched ``applyInPandas``; within a group the union is built as the
disjoint-decomposition fold

    U = A1 ⊎ (A2 \ A1) ⊎ (A3 \ {A1,A2}) ⊎ ...

(each ring minus all PREVIOUS rings — exact on decompositions), with a
bbox pre-filter so disjoint inputs never pay a kernel call: the fold is
O(k) in the number of actually-overlapping pairs, O(n) for scattered
inputs.  Per-group cost is serial (the same contract as the PostGIS
aggregate); for adversarially huge groups, pre-aggregate by a spatial
sub-key (e.g. cell_index) and re-dissolve — documented boundary.
"""

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.geo import GEOM_TYPE, _assemble_boolean_parts
from ..kernels import geometry as KG

__all__ = ["union_agg"]


def _dissolve_group(rings):
    """rings: list of (x, y) float arrays (closed exterior rings).
    Returns (geom_type, xs, ys, ring_offsets, part_offsets) or None."""
    pieces = []
    boxes = []
    opened = []
    for rx, ry in rings:
        ox, oy = KG._open_ccw(rx, ry)
        opened.append((np.asarray(ox, np.float64),
                       np.asarray(oy, np.float64)))
        boxes.append((rx.min(), ry.min(), rx.max(), ry.max()))
    for i, (ox, oy) in enumerate(opened):
        cur = [KG._np_pair(ox, oy)]
        bx0, by0, bx1, by1 = boxes[i]
        for j in range(i):
            if not cur:
                break
            qx0, qy0, qx1, qy1 = boxes[j]
            # bbox-disjoint previous rings can't remove anything
            if qx1 <= bx0 or qx0 >= bx1 or qy1 <= by0 or qy0 >= by1:
                continue
            qx, qy = rings[j]
            cur = KG.polygon_difference_rings(cur, qx, qy)
        pieces.extend(cur)
    if not pieces:
        return None
    dissolved = KG.dissolve_rings(pieces)
    assembled = (_assemble_boolean_parts(dissolved)
                 if dissolved is not None else None)
    if assembled is None:
        # raw interior-disjoint decomposition (area-exact fallback,
        # same contract as st_boolean)
        xs, ys, ro, po = [], [], [0], [0]
        for rx, ry in pieces:
            xs.extend(float(v) for v in rx)
            ys.extend(float(v) for v in ry)
            ro.append(len(xs))
            po.append(len(ro) - 1)
        gtype = "Polygon" if len(pieces) == 1 else "MultiPolygon"
        return gtype, xs, ys, ro, po
    xs, ys, ro, po, gtype = assembled
    return gtype, xs, ys, ro, po


def union_agg(
    df: DataFrame,
    group_cols: list[str] | tuple[str, ...],
    geom_col: str = "geom",
) -> DataFrame:
    """Dissolve all single-part polygon geometries of each group into one
    Polygon/MultiPolygon (PostGIS ``ST_Union`` aggregate semantics; holes
    emerge naturally when inputs enclose a void).  Rows whose geometry is
    null, non-Polygon, or holed are skipped (st_boolean's documented
    scope); a group with no usable rows is dropped.

    Output: one row per group — ``*group_cols, geom_col``.
    """
    group_cols = list(group_cols)
    if not group_cols:
        raise ValueError("group_cols must be non-empty")
    in_schema = df.schema
    out_schema = T.StructType(
        [in_schema[c] for c in group_cols]
        + [T.StructField(geom_col, GEOM_TYPE, True)]
    )
    n_keys = len(group_cols)

    def fn(key, pdf):
        g = pdf[geom_col]
        rings = []
        for i in range(len(pdf)):
            row = g.iat[i]
            if row is None or row["geom_type"] != "Polygon":
                continue
            ro = list(row["ring_offsets"])
            if len(ro) != 2:
                continue  # holed inputs out of scope (documented)
            rings.append((np.asarray(row["x"], np.float64),
                          np.asarray(row["y"], np.float64)))
        if not rings:
            return pd.DataFrame(columns=[*group_cols, geom_col])
        out = _dissolve_group(rings)
        if out is None:
            return pd.DataFrame(columns=[*group_cols, geom_col])
        gtype, xs, ys, ro, po = out
        rec = {group_cols[k]: [key[k]] for k in range(n_keys)}
        rec[geom_col] = [{
            "geom_type": gtype, "x": xs, "y": ys,
            "ring_offsets": ro, "part_offsets": po,
        }]
        return pd.DataFrame(rec)

    return df.groupBy(*group_cols).applyInPandas(fn, out_schema)
