"""Spatial column functions: GeoJSON <-> struct geometry + scalar kernels.

The engine's canonical geometry column (SURVEY §1.2) is

    GEOM_TYPE = struct<geom_type: string,
                       x: array<double>, y: array<double>,
                       ring_offsets: array<int>, part_offsets: array<int>>

Conversion from GeoJSON happens ONCE at ingestion (SURVEY §2.6 G5); every
interior operator works on flat Arrow buffers via the numpy kernels in
``kernels/geometry.py``.  All functions here are pandas UDFs (Arrow-batched):
JSON parsing is per-row inside a batch (unavoidable), the math is batch-
vectorized numpy.

Reference parity (file:line in /root/reference):
  st_area      ndjson-spatial/src/area.rs:54-121 (planar, None geom -> 0.0)
  st_centroid  ndjson-spatial/src/centroid.rs:22-87 (geometry REPLACED)
  st_bbox      ndjson-common/src/common.rs:21-61 (quirky ordering)
  st_transform ndjson-spatial/src/transform.rs:27-109 (EPSG:4326<->3857 scope)
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.pandas.functions import pandas_udf

from ..kernels import cells as KC
from ..kernels import geometry as KG

__all__ = [
    "GEOM_TYPE", "parse_geojson", "st_asgeojson", "st_area", "st_centroid",
    "st_bbox", "st_transform", "st_point", "geom_to_batch",
]

GEOM_TYPE = T.StructType(
    [
        T.StructField("geom_type", T.StringType()),
        T.StructField("x", T.ArrayType(T.DoubleType())),
        T.StructField("y", T.ArrayType(T.DoubleType())),
        T.StructField("ring_offsets", T.ArrayType(T.IntegerType())),
        T.StructField("part_offsets", T.ArrayType(T.IntegerType())),
    ]
)


def _flatten_coords(gtype: str, coords):
    """GeoJSON coordinates -> (x, y, ring_offsets, part_offsets)."""
    xs: list[float] = []
    ys: list[float] = []
    ro = [0]
    po = [0]

    def add_ring(pts):
        xs.extend(float(p[0]) for p in pts)
        ys.extend(float(p[1]) for p in pts)
        ro.append(len(xs))

    if gtype == "Point":
        add_ring([coords])
        po.append(1)
    elif gtype in ("MultiPoint", "LineString"):
        add_ring(coords)
        po.append(1)
    elif gtype in ("MultiLineString", "Polygon"):
        for ring in coords:
            add_ring(ring)
        if gtype == "Polygon":
            po.append(len(ro) - 1)  # all rings one part (ring 0 exterior)
        else:
            po.extend(range(1, len(ro)))  # each line its own part
    elif gtype == "MultiPolygon":
        for poly in coords:
            for ring in poly:
                add_ring(ring)
            po.append(len(ro) - 1)
    else:
        raise ValueError(f"unsupported geometry type: {gtype}")
    return xs, ys, ro, po


def _parse_batch(s: pd.Series) -> pd.DataFrame:
    gt, X, Y, RO, PO = [], [], [], [], []
    for v in s:
        if v is None or (isinstance(v, float) and np.isnan(v)):
            gt.append(None); X.append(None); Y.append(None)
            RO.append(None); PO.append(None)
            continue
        try:
            g = json.loads(v)
            if g.get("type") == "Feature":  # tolerate full features
                g = g.get("geometry") or {}
            xs, ys, ro, po = _flatten_coords(g["type"], g["coordinates"])
            gt.append(g["type"]); X.append(xs); Y.append(ys)
            RO.append(ro); PO.append(po)
        except Exception:
            gt.append(None); X.append(None); Y.append(None)
            RO.append(None); PO.append(None)
    return pd.DataFrame(
        {"geom_type": gt, "x": X, "y": Y, "ring_offsets": RO, "part_offsets": PO}
    )


parse_geojson = pandas_udf(_parse_batch, returnType=GEOM_TYPE)
parse_geojson.__doc__ = "GeoJSON geometry string -> canonical geometry struct."


def geom_to_batch(pdf: pd.DataFrame):
    """Struct-column pandas DataFrame -> (BatchGeometry, valid_mask).

    Null geometries are excluded from the batch; valid_mask maps batch rows
    back to input rows.
    """
    valid = pdf["x"].notna().to_numpy()
    sub = pdf[valid]
    bg = KG.BatchGeometry(
        list(sub["x"]), list(sub["y"]),
        list(sub["ring_offsets"]), list(sub["part_offsets"]),
    )
    return bg, valid


@pandas_udf(T.DoubleType())
def st_area(geom: pd.DataFrame) -> pd.Series:
    """Planar area (area.rs:59-62); null geometry -> 0.0 (area.rs:99).

    Non-polygon geometries -> null: the reference hard-errors and kills the
    whole stream on a non-polygon row (area.rs:63-97); a distributed engine
    must not fail the job for one row, so the engine's observable is a null
    area (filterable, countable in lineage) — divergence documented.
    """
    out = np.zeros(len(geom))
    bg, valid = geom_to_batch(geom)
    if bg.n_rows:
        out[valid] = KG.batch_area(bg)
    is_poly = geom["geom_type"].isin(["Polygon", "MultiPolygon"]).to_numpy()
    null_mask = valid & ~is_poly
    res = pd.Series(out)
    res[null_mask] = None
    return res


@pandas_udf(GEOM_TYPE)
def st_centroid(geom: pd.DataFrame) -> pd.DataFrame:
    """Area-weighted centroid; REPLACES the geometry with a Point
    (centroid.rs:34-51, math :53-87)."""
    n = len(geom)
    res = pd.DataFrame(
        {
            "geom_type": [None] * n, "x": [None] * n, "y": [None] * n,
            "ring_offsets": [None] * n, "part_offsets": [None] * n,
        }
    )
    bg, valid = geom_to_batch(geom)
    if bg.n_rows:
        cx, cy = KG.batch_centroid(bg)
        idx = np.flatnonzero(valid)
        for j, i in enumerate(idx):
            res.iat[i, 0] = "Point"
            res.iat[i, 1] = [float(cx[j])]
            res.iat[i, 2] = [float(cy[j])]
            res.iat[i, 3] = [0, 1]
            res.iat[i, 4] = [0, 1]
    return res


@pandas_udf(T.ArrayType(T.DoubleType()))
def st_bbox(geom: pd.DataFrame) -> pd.Series:
    """Reference bbox: Point [x,y,x,y], others [minx,maxx,miny,maxy]
    (ndjson-common/src/common.rs:21-61 quirk, kept for fixture parity)."""
    out = [None] * len(geom)
    bg, valid = geom_to_batch(geom)
    if bg.n_rows:
        is_pt = (geom.loc[valid, "geom_type"] == "Point").to_numpy()
        bb = KG.batch_bbox(bg, is_pt)
        for j, i in enumerate(np.flatnonzero(valid)):
            out[i] = [float(v) for v in bb[j]]
    return pd.Series(out)


@pandas_udf(GEOM_TYPE)
def _st_to_3857(geom: pd.DataFrame) -> pd.DataFrame:
    return _reproject(geom, KC.lonlat_to_mercator)


@pandas_udf(GEOM_TYPE)
def _st_to_4326(geom: pd.DataFrame) -> pd.DataFrame:
    return _reproject(geom, KC.mercator_to_lonlat)


def _reproject(geom: pd.DataFrame, fn) -> pd.DataFrame:
    out = geom.copy()
    for i in range(len(geom)):
        xs = geom["x"].iat[i]
        if xs is None:
            continue
        nx, ny = fn(np.asarray(xs), np.asarray(geom["y"].iat[i]))
        out["x"].iat[i] = [float(v) for v in nx]
        out["y"].iat[i] = [float(v) for v in ny]
    return out


def st_transform(geom_col, from_epsg: int, to_epsg: int):
    """CRS reprojection (transform.rs:27-109); parity scope EPSG:4326<->3857
    (SURVEY §2.6 G4 — closed-form web-mercator; no pyproj in env)."""
    if (from_epsg, to_epsg) == (4326, 3857):
        return _st_to_3857(geom_col)
    if (from_epsg, to_epsg) == (3857, 4326):
        return _st_to_4326(geom_col)
    if from_epsg == to_epsg:
        return geom_col
    raise ValueError(f"unsupported CRS pair {from_epsg}->{to_epsg}")


@pandas_udf(T.StringType())
def st_asgeojson(geom: pd.DataFrame) -> pd.Series:
    """Canonical struct -> GeoJSON geometry string (sink-side only)."""
    out = []
    for i in range(len(geom)):
        gt = geom["geom_type"].iat[i]
        if gt is None:
            out.append(None)
            continue
        xs = geom["x"].iat[i]
        ys = geom["y"].iat[i]
        ro = list(geom["ring_offsets"].iat[i])
        po = list(geom["part_offsets"].iat[i])
        rings = [
            [[float(xs[k]), float(ys[k])] for k in range(ro[r], ro[r + 1])]
            for r in range(len(ro) - 1)
        ]
        if gt == "Point":
            coords = rings[0][0]
        elif gt in ("MultiPoint", "LineString"):
            coords = rings[0]
        elif gt == "Polygon":
            coords = rings
        elif gt == "MultiLineString":
            coords = rings
        elif gt == "MultiPolygon":
            coords = [rings[po[p]:po[p + 1]] for p in range(len(po) - 1)]
        else:
            out.append(None)
            continue
        out.append(json.dumps({"type": gt, "coordinates": coords}))
    return pd.Series(out)


def st_point(x_col, y_col):
    """Build a Point geometry struct from two double columns (pure Catalyst,
    no UDF — points are the high-volume case at scale)."""
    return F.struct(
        F.lit("Point").alias("geom_type"),
        F.array(x_col.cast("double")).alias("x"),
        F.array(y_col.cast("double")).alias("y"),
        F.array(F.lit(0), F.lit(1)).alias("ring_offsets"),
        F.array(F.lit(0), F.lit(1)).alias("part_offsets"),
    )
