"""Raster <-> vector conversion at fixed zoom levels (north rule:
"raster<->vector tile assignment").  assign_tiles covers the vector->tile
direction; this module adds the raster PAYLOAD in both directions:

  rasterize_tiles   vector -> raster: per (row, zoom-z tile) a
                    tile_px x tile_px boolean pixel-coverage mask
                    (pixel-center-in-geometry for polygons, containing
                    pixel for points, strict pixel-rect intersection for
                    lines) + set-pixel count — the tile-served heatmap /
                    coverage-grid shape.
  vectorize_mask    raster -> vector: bbox of the set pixels back to a
                    pixel-snapped rect geometry, PURE Catalyst (array
                    ops on the mask — no Python).

Plan shape: candidates come from assign_tiles (exact tile set, bounded
fan-out via the cover cap), so the mask UDF runs once per TRUE
(geometry, tile) pair; within a batch rows group by geometry identity and
each geometry fills all its tiles' pixel grids in single vectorized
kernel calls (same discipline as the tile refinement).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.pandas.functions import pandas_udf

from ..kernels import cells as KC
from ..kernels import geometry as KG
from .spatial import assign_tiles

__all__ = ["rasterize_tiles", "vectorize_mask"]


def _make_mask_udf(zoom: int, tile_px: int):
    size = 2.0 * KC.MERC_MAX / (1 << zoom)
    p = size / tile_px
    schema = T.StructType([
        T.StructField("mask", T.ArrayType(T.BooleanType())),
        T.StructField("n_pixels", T.IntegerType()),
    ])

    @pandas_udf(schema)
    def mask_udf(geom: pd.DataFrame, tile_x: pd.Series,
                 tile_y: pd.Series) -> pd.DataFrame:
        n = len(tile_x)
        out_mask = [None] * n
        out_cnt = np.zeros(n, np.int32)
        gts = geom["geom_type"].to_numpy()
        Xs = geom["x"].to_numpy()
        Ys = geom["y"].to_numpy()
        ROs = geom["ring_offsets"].to_numpy()
        POs = geom["part_offsets"].to_numpy()
        txv = tile_x.to_numpy(np.int64)
        tyv = tile_y.to_numpy(np.int64)
        # pixel-center offsets within a tile (row-major, y from tile TOP)
        ci = (np.arange(tile_px, dtype=np.float64) + 0.5) * p

        groups: dict = {}
        for i in range(n):
            if gts[i] is None:
                continue
            key = (gts[i], np.asarray(Xs[i], np.float64).tobytes(),
                   np.asarray(Ys[i], np.float64).tobytes())
            groups.setdefault(key, []).append(i)

        for (gt, _, _), idx in groups.items():
            rows = np.asarray(idx)
            i0 = rows[0]
            xs = np.asarray(Xs[i0], np.float64)
            ys = np.asarray(Ys[i0], np.float64)
            tx0 = txv[rows] * size - KC.MERC_MAX          # tile left
            ty1 = KC.MERC_MAX - tyv[rows] * size          # tile top
            # per tile: centers cx[t, i] = tx0[t] + ci[i],
            #           cy[t, j] = ty1[t] - ci[j]
            if gt in ("Point", "MultiPoint"):
                # containing pixel per point (NOT the LineString branch:
                # MultiPoint has no segments, so rect-intersection against
                # the fictitious connecting polyline would mark pixels the
                # points never touch).  Point = 1-element special case.
                ii = np.floor((xs[None, :] - tx0[:, None]) / p).astype(np.int64)
                jj = np.floor((ty1[:, None] - ys[None, :]) / p).astype(np.int64)
                ok = (ii >= 0) & (ii < tile_px) & (jj >= 0) & (jj < tile_px)
                for t, r in enumerate(rows):
                    m = np.zeros(tile_px * tile_px, bool)
                    sel = ok[t]
                    m[jj[t][sel] * tile_px + ii[t][sel]] = True
                    out_mask[r] = m.tolist()
                    out_cnt[r] = int(m.sum())
                continue
            if gt in ("Polygon", "MultiPolygon"):
                # ALL tiles' centers in ONE even-odd PIP call
                cx = (tx0[:, None] + ci[None, :])            # (T, px)
                cy = (ty1[:, None] - ci[None, :])            # (T, px)
                # full center grids: for tile t, point (j, i) =
                # (cx[t, i], cy[t, j]) — flattened j-major to match the
                # row-major mask convention
                fx = np.broadcast_to(cx[:, None, :],
                                     (len(rows), tile_px, tile_px)).ravel()
                fy = np.broadcast_to(cy[:, :, None],
                                     (len(rows), tile_px, tile_px)).ravel()
                inside = KG.points_in_polygon(
                    fx, fy, xs, ys,
                    np.asarray(ROs[i0], np.int64),
                    np.asarray(POs[i0], np.int64),
                ).reshape(len(rows), tile_px * tile_px)
                for t, r in enumerate(rows):
                    out_mask[r] = inside[t].tolist()
                    out_cnt[r] = int(inside[t].sum())
                continue
            # LineString-ish: pixel rect strict-intersection, all pixels
            # of all the geometry's tiles in one kernel call per ring
            shape = (len(rows), tile_px, tile_px)
            px0 = np.broadcast_to(
                tx0[:, None, None]
                + (np.arange(tile_px, dtype=np.float64)[None, None, :]) * p,
                shape)
            py1 = np.broadcast_to(
                ty1[:, None, None]
                - (np.arange(tile_px, dtype=np.float64)[None, :, None]) * p,
                shape)
            rx0 = px0.ravel()
            rx1 = rx0 + p
            ry1 = py1.ravel()
            ry0 = ry1 - p
            hit = np.zeros(len(rx0), bool)
            ro_ = np.asarray(ROs[i0], np.int64)
            for rr in range(len(ro_) - 1):
                hit |= KG.polyline_intersects_rects(
                    xs[ro_[rr]:ro_[rr + 1]], ys[ro_[rr]:ro_[rr + 1]],
                    rx0, ry0, rx1, ry1)
            hit = hit.reshape(len(rows), tile_px * tile_px)
            for t, r in enumerate(rows):
                out_mask[r] = hit[t].tolist()
                out_cnt[r] = int(hit[t].sum())
        return pd.DataFrame({"mask": out_mask, "n_pixels": out_cnt})

    return mask_udf


def rasterize_tiles(
    df: DataFrame, zoom: int, tile_px: int = 16, geom_col: str = "geom",
) -> DataFrame:
    """Vector -> raster: one row per (input row, zoom-z tile the geometry
    intersects) with a row-major tile_px x tile_px boolean `mask` (index
    j*tile_px+i; i left->right, j from tile TOP) and `n_pixels` set-pixel
    count.  Pixel semantics: center-in-geometry for polygons, containing
    pixel for points, strict rect intersection for lines."""
    tiled = assign_tiles(df, [zoom], geom_col=geom_col)
    m = _make_mask_udf(zoom, tile_px)(
        F.col(geom_col), F.col("tile_x"), F.col("tile_y"))
    return (
        tiled.withColumn("__m", m)
        .withColumn("mask", F.col("__m.mask"))
        .withColumn("n_pixels", F.col("__m.n_pixels"))
        .drop("__m")
    )


def vectorize_mask(
    mask_col, tile_x, tile_y, zoom: int, tile_px: int = 16,
):
    """Raster -> vector, PURE Catalyst: bbox of the set pixels as a
    pixel-snapped axis-rect geometry struct (null when the mask is empty).
    The inverse of rasterize_tiles up to pixel resolution: rasterizing an
    axis rect and vectorizing the union of its tile masks yields the rect
    expanded to the covering pixel grid."""
    size = 2.0 * KC.MERC_MAX / (1 << zoom)
    p = size / tile_px
    # 0-based indices of set pixels (JVM array ops — sequence + filter)
    idx = F.filter(
        F.sequence(F.lit(0), F.lit(tile_px * tile_px - 1)),
        lambda q: F.element_at(mask_col, q + 1),
    )
    ii = F.transform(idx, lambda q: q % tile_px)
    jj = F.transform(idx, lambda q: F.floor(q / tile_px))
    tx0 = tile_x * F.lit(size) - F.lit(KC.MERC_MAX)
    ty1 = F.lit(KC.MERC_MAX) - tile_y * F.lit(size)
    x0 = tx0 + F.array_min(ii).cast("double") * F.lit(p)
    x1 = tx0 + (F.array_max(ii).cast("double") + 1.0) * F.lit(p)
    y1 = ty1 - F.array_min(jj).cast("double") * F.lit(p)
    y0 = ty1 - (F.array_max(jj).cast("double") + 1.0) * F.lit(p)
    geom = F.struct(
        F.lit("Polygon").alias("geom_type"),
        F.array(x0, x1, x1, x0, x0).alias("x"),
        F.array(y0, y0, y1, y1, y0).alias("y"),
        F.array(F.lit(0), F.lit(5)).alias("ring_offsets"),
        F.array(F.lit(0), F.lit(1)).alias("part_offsets"),
    )
    return F.when(F.size(idx) > 0, geom)
