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

__all__ = ["rasterize_tiles", "vectorize_mask", "zonal_stats",
           "focal_stats", "resample", "local_op", "slope_gradient"]


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


def zonal_stats(
    cells_df: DataFrame,
    zones_df: DataFrame,
    zone_id_col: str,
    value_col: str = "value",
    cell_size: float = 1.0,
    x_col: str = "cx",
    y_col: str = "cy",
    geom_col: str = "geom",
    res: int | None = None,
) -> DataFrame:
    """Zonal statistics — the raster-analytics reduction (GDAL/PostGIS
    ST_SummaryStats-over-zones, GeoTrellis zonal ops): per zone polygon,
    count/sum/min/max/mean of the raster cells whose CENTER falls inside
    the zone (the standard pixel-center rule, matching rasterize_tiles'
    polygon convention).

    Input raster model: the relational normal form — one row per cell,
    integer cell indices (``x_col``, ``y_col``) + ``value_col``; cell
    center = (index + 0.5) * ``cell_size``.

    Plan (the 100 TB shape): cell centers become Point geometries and run
    through spatial_intersection_join's candidates -> refine pipeline
    (cell-index equi-join, bbox/PIP fast paths, never a cross join);
    the reduction is ONE partial-combined hash aggregate on the zone id.
    The mean is emitted as exact-integer sum over exact count (one
    division, no float accumulation order to diverge).
    """
    from ..functions.geo import st_point
    from .spatial import spatial_intersection_join

    pts = cells_df.select(
        F.col(value_col).cast("long").alias("__zs_val"),
        st_point(
            (F.col(x_col) + F.lit(0.5)) * F.lit(float(cell_size)),
            (F.col(y_col) + F.lit(0.5)) * F.lit(float(cell_size)),
        ).alias(geom_col),
    )
    hits = spatial_intersection_join(
        pts, zones_df.select(zone_id_col, geom_col), res=res,
        keep_ref_cols=(zone_id_col,))
    return hits.groupBy(zone_id_col).agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.sum("__zs_val").alias("sum_val"),
        F.min("__zs_val").alias("min_val"),
        F.max("__zs_val").alias("max_val"),
        (F.sum("__zs_val") / F.count(F.lit(1))).alias("mean_val"),
    )


def focal_stats(
    cells_df: DataFrame,
    radius: int = 1,
    value_col: str = "value",
    x_col: str = "cx",
    y_col: str = "cy",
) -> DataFrame:
    """Focal (moving-window) statistics — the GDAL/GeoTrellis focal-ops
    reduction: for every cell PRESENT in the (sparse, relational-form)
    raster, count/sum/min/max/mean of the existing cells within Chebyshev
    distance ``radius`` (the (2r+1)^2 window, center included; missing
    cells are skipped — GDAL's ignore-NODATA mode).

    Plan (the 100 TB shape): each cell EXPLODES over its (2r+1)^2 window
    offsets as a contribution to that target position (a plan-time
    literal array — pure Catalyst, no Python), one partial-combined hash
    aggregate on the target index, then an equi-join back to the input
    keys to keep only existing cells.  The aggregate output is already
    hash-partitioned on the join key, so the join adds one exchange on
    the (smaller) input side only.  Fan-out is the window size (9 for
    r=1) — linear in the raster, never quadratic.
    """
    if radius < 1:
        raise ValueError("radius must be >= 1")
    k = 2 * radius + 1
    offs = F.array(*[
        F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
        for dx in range(-radius, radius + 1)
        for dy in range(-radius, radius + 1)
    ])
    contrib = (
        cells_df.select(
            F.col(x_col).cast("long").alias("__fx"),
            F.col(y_col).cast("long").alias("__fy"),
            F.col(value_col).cast("long").alias("__fv"),
        )
        .withColumn("__o", F.explode(offs))
        .select(
            (F.col("__fx") + F.col("__o.dx")).alias("__tx"),
            (F.col("__fy") + F.col("__o.dy")).alias("__ty"),
            "__fv",
        )
    )
    agg = contrib.groupBy("__tx", "__ty").agg(
        F.count(F.lit(1)).alias("focal_n"),
        F.sum("__fv").alias("focal_sum"),
        F.min("__fv").alias("focal_min"),
        F.max("__fv").alias("focal_max"),
        (F.sum("__fv") / F.count(F.lit(1))).alias("focal_mean"),
    )
    keys = cells_df.select(
        F.col(x_col).cast("long").alias(x_col),
        F.col(y_col).cast("long").alias(y_col),
        F.col(value_col).cast("long").alias(value_col),
    )
    return keys.join(
        agg,
        (F.col(x_col) == F.col("__tx")) & (F.col(y_col) == F.col("__ty")),
        "inner",
    ).drop("__tx", "__ty")


def resample(
    cells_df: DataFrame,
    factor: int,
    value_col: str = "value",
    x_col: str = "cx",
    y_col: str = "cy",
) -> DataFrame:
    """Raster resampling to a ``factor``-times-coarser grid (GDAL
    gdalwarp -tr / average|sum|min|max resampling over the relational
    raster form): output cell (cx', cy') = floor(cx/f), floor(cy/f)
    aggregates its up-to-f^2 constituent fine cells.  ONE
    partial-combined hash aggregate — the map side pre-combines, the
    exchange carries O(output cells).  mean = exact-integer sum over
    exact count (same tie-proof convention as zonal_stats)."""
    if factor < 1:
        raise ValueError("factor must be >= 1")
    fx = F.floor(F.col(x_col).cast("long") / F.lit(factor)).alias(x_col)
    fy = F.floor(F.col(y_col).cast("long") / F.lit(factor)).alias(y_col)
    v = F.col(value_col).cast("long")
    return (
        cells_df.select(fx, fy, v.alias("__rv"))
        .groupBy(x_col, y_col)
        .agg(
            F.count(F.lit(1)).alias("n_cells"),
            F.sum("__rv").alias("sum_val"),
            F.min("__rv").alias("min_val"),
            F.max("__rv").alias("max_val"),
            (F.sum("__rv") / F.count(F.lit(1))).alias("mean_val"),
        )
    )


_LOCAL_OPS = {
    "add": lambda a, b: a + b,
    "sub": lambda a, b: a - b,
    "mul": lambda a, b: a * b,
    "min": lambda a, b: F.least(a, b),
    "max": lambda a, b: F.greatest(a, b),
}


def local_op(
    a_df: DataFrame,
    b_df: DataFrame,
    op: str = "add",
    how: str = "inner",
    fill: int = 0,
    value_col: str = "value",
    x_col: str = "cx",
    y_col: str = "cy",
) -> DataFrame:
    """Local map algebra over two rasters (the GDAL raster-calculator /
    GeoTrellis local-ops cell-wise combine): align on the cell index and
    emit ``op`` of the two values.  ``how="inner"`` keeps cells present
    in BOTH rasters; ``how="outer"`` keeps either, substituting ``fill``
    for the missing side (explicit NODATA-fill semantics — F.least/
    F.greatest skip nulls silently, so nulls are filled BEFORE the op).

    Plan: one equi-shuffle join on the cell index (sort-merge or
    broadcast by size, Catalyst's choice) — the canonical co-located
    raster overlay; at 100 TB both sides bucket/cluster by the same
    index so the exchange is avoidable entirely.
    """
    if op not in _LOCAL_OPS:
        raise ValueError(f"op must be one of {sorted(_LOCAL_OPS)}")
    if how not in ("inner", "outer"):
        raise ValueError("how must be 'inner' or 'outer'")
    av = (
        a_df.select(
            F.col(x_col).cast("long").alias(x_col),
            F.col(y_col).cast("long").alias(y_col),
            F.col(value_col).cast("long").alias("__va"),
        )
    )
    bv = (
        b_df.select(
            F.col(x_col).cast("long").alias(x_col),
            F.col(y_col).cast("long").alias(y_col),
            F.col(value_col).cast("long").alias("__vb"),
        )
    )
    j = av.join(bv, [x_col, y_col], "inner" if how == "inner" else "full")
    va = F.coalesce(F.col("__va"), F.lit(int(fill)))
    vb = F.coalesce(F.col("__vb"), F.lit(int(fill)))
    return j.select(
        x_col, y_col, _LOCAL_OPS[op](va, vb).alias(value_col)
    )


def slope_gradient(
    cells_df: DataFrame,
    cell_size: float = 1.0,
    value_col: str = "value",
    x_col: str = "cx",
    y_col: str = "cy",
) -> DataFrame:
    """Horn-method terrain gradient (Horn 1981, the GDAL ``gdaldem
    slope`` operator) over a DEM in relational raster form.  For each
    cell with a COMPLETE 8-neighborhood (GDAL edge cells -> dropped):

        dzdx_num = (c + 2f + i) - (a + 2d + g)      [integer-exact]
        dzdy_num = (g + 2h + i) - (a + 2b + c)
        grad2_num = dzdx_num^2 + dzdy_num^2

    with a..i the 3x3 window values (row-major, center e).  The numerators
    are EXACT integers on integer DEMs (the oracle-stable core);
    ``slope_deg`` = atan(sqrt(grad2_num) / (8*cell_size)) in degrees is
    emitted for users as the standard derived float.

    Plan: same contribution-explode shape as focal_stats (each cell
    scatters to the 8 targets it serves, with its Horn weight for each
    axis — plan-time literal offsets, pure Catalyst), one hash aggregate,
    completeness enforced by ``count == 8``.
    """
    import math

    # Horn weights as seen FROM the target: neighbor at relative (ox,oy)
    # (ox east, oy north) carries wx into dz/dx and wy into dz/dy.
    # a=( -1,+1) b=(0,+1) c=(+1,+1) / d=(-1,0) f=(+1,0) /
    # g=(-1,-1) h=(0,-1) i=(+1,-1)
    w = {
        (-1, 1): (-1, -1), (0, 1): (0, -2), (1, 1): (1, -1),
        (-1, 0): (-2, 0), (1, 0): (2, 0),
        (-1, -1): (-1, 1), (0, -1): (0, 2), (1, -1): (1, 1),
    }
    offs = F.array(*[
        F.struct(F.lit(ox).alias("ox"), F.lit(oy).alias("oy"),
                 F.lit(wx).alias("wx"), F.lit(wy).alias("wy"))
        for (ox, oy), (wx, wy) in w.items()
    ])
    contrib = (
        cells_df.select(
            F.col(x_col).cast("long").alias("__sx"),
            F.col(y_col).cast("long").alias("__sy"),
            F.col(value_col).cast("long").alias("__sv"),
        )
        .withColumn("__o", F.explode(offs))
        .select(
            # a neighbor at source + (ox,oy) relative to the target means
            # the SOURCE contributes to target = source - (ox,oy)
            (F.col("__sx") - F.col("__o.ox")).alias("__tx"),
            (F.col("__sy") - F.col("__o.oy")).alias("__ty"),
            (F.col("__sv") * F.col("__o.wx")).alias("__cx_w"),
            (F.col("__sv") * F.col("__o.wy")).alias("__cy_w"),
        )
    )
    agg = (
        contrib.groupBy("__tx", "__ty")
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.sum("__cx_w").alias("dzdx_num"),
            F.sum("__cy_w").alias("dzdy_num"),
        )
        .where(F.col("__n") == 8)
        .drop("__n")
    )
    grad2 = (F.col("dzdx_num") * F.col("dzdx_num")
             + F.col("dzdy_num") * F.col("dzdy_num"))
    denom = 8.0 * float(cell_size)
    return agg.select(
        F.col("__tx").alias(x_col),
        F.col("__ty").alias(y_col),
        "dzdx_num",
        "dzdy_num",
        grad2.alias("grad2_num"),
        (F.atan(F.sqrt(grad2.cast("double")) / F.lit(denom))
         * F.lit(180.0 / math.pi)).alias("slope_deg"),
    )
