"""Raster <-> vector tile payloads (north rule: raster<->vector tile
assignment — assign_tiles is the vector->tile direction, rasterize_tiles/
vectorize_mask add the pixel-grid payload both ways)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from ndjson_spatial_spark.kernels import cells as KC
from ndjson_spatial_spark.operators.raster import (
    rasterize_tiles,
    vectorize_mask,
)

M = KC.MERC_MAX
ZOOM = 3
SIZE = 2.0 * M / (1 << ZOOM)
PX = 16
P = SIZE / PX


def geom_row(gt, xs, ys, ro=None, po=None):
    return {
        "geom_type": gt,
        "x": [float(v) for v in xs],
        "y": [float(v) for v in ys],
        "ring_offsets": ro or [0, len(xs)],
        "part_offsets": po or [0, 1],
    }


def make_df(spark, rows):
    from ndjson_spatial_spark.functions.geo import GEOM_TYPE
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("geom", GEOM_TYPE),
    ])
    return spark.createDataFrame(
        [(i, r) for i, r in enumerate(rows)], schema)


class TestRasterize:
    def test_point_sets_exactly_one_pixel(self, spark):
        # point in the middle of tile (4, 4)'s pixel (2, 3)
        tx0 = 4 * SIZE - M
        ty1 = M - 4 * SIZE
        px = tx0 + (3 + 0.5) * P
        py = ty1 - (2 + 0.5) * P
        df = make_df(spark, [geom_row("Point", [px], [py])])
        out = rasterize_tiles(df, ZOOM).collect()
        assert len(out) == 1
        r = out[0]
        assert r.n_pixels == 1
        assert r.mask[2 * PX + 3] is True

    def test_multipoint_marks_containing_pixels_only(self, spark):
        # r4 advice: MultiPoint must NOT route through the LineString
        # branch (which would mark pixels crossed by fictitious connecting
        # segments).  Two points in opposite corners of tile (4,4): mask =
        # exactly their two containing pixels, not the diagonal.
        tx0 = 4 * SIZE - M
        ty1 = M - 4 * SIZE
        xs = [tx0 + 0.5 * P, tx0 + 15.5 * P]
        ys = [ty1 - 0.5 * P, ty1 - 15.5 * P]
        df = make_df(spark, [geom_row(
            "MultiPoint", xs, ys, ro=[0, 2], po=[0, 1])])
        rows = [r for r in rasterize_tiles(df, ZOOM).collect()
                if r.tile_x == 4 and r.tile_y == 4]
        assert len(rows) == 1
        r = rows[0]
        assert r.n_pixels == 2
        assert r.mask[0 * PX + 0] and r.mask[15 * PX + 15]

    def test_rect_pixel_count_closed_form(self, spark):
        # axis rect spanning part of one tile: count = nx * ny where
        # nx = #pixel centers with x0 < cx < x1
        tx0 = 2 * SIZE - M
        ty1 = M - 5 * SIZE
        x0, x1 = tx0 + 1.25 * P, tx0 + 6.75 * P     # centers i=1..6 -> 6
        y1, y0 = ty1 - 0.25 * P, ty1 - 3.9 * P      # centers j=0..3 -> 4
        df = make_df(spark, [geom_row(
            "Polygon", [x0, x1, x1, x0, x0], [y0, y0, y1, y1, y0])])
        rows = rasterize_tiles(df, ZOOM).collect()
        assert len(rows) == 1
        assert rows[0].n_pixels == 24
        m = np.array(rows[0].mask).reshape(PX, PX)
        assert m[0:4, 1:7].all() and m.sum() == 24

    def test_rect_spanning_tiles_counts_partition(self, spark):
        # rect spanning two tiles horizontally: per-tile counts sum to the
        # total pixel-center count over the whole rect
        tx0 = 3 * SIZE - M
        ty1 = M - 3 * SIZE
        x0, x1 = tx0 + 10.5 * P + 1.0, tx0 + SIZE + 5.5 * P - 1.0
        y1, y0 = ty1 - 2.4 * P, ty1 - 7.6 * P
        df = make_df(spark, [geom_row(
            "Polygon", [x0, x1, x1, x0, x0], [y0, y0, y1, y1, y0])])
        rows = rasterize_tiles(df, ZOOM).collect()
        assert len(rows) == 2
        total = sum(r.n_pixels for r in rows)
        # x centers: tile A i=11..15 (5), tile B i=0..4 (5); y j=2..7 (6)
        assert total == (5 + 5) * 6

    def test_line_marks_crossed_pixels(self, spark):
        # horizontal segment through pixel row j=8 of one tile
        tx0 = 1 * SIZE - M
        ty1 = M - 1 * SIZE
        y = ty1 - 8.5 * P
        df = make_df(spark, [geom_row(
            "LineString", [tx0 + 0.2 * P, tx0 + 15.8 * P], [y, y])])
        rows = rasterize_tiles(df, ZOOM).collect()
        assert len(rows) == 1
        m = np.array(rows[0].mask).reshape(PX, PX)
        assert m[8].all() and rows[0].n_pixels == 16

    def test_vectorize_roundtrip_pixel_snapped(self, spark):
        # rasterize an in-tile rect, vectorize the mask: bbox of set
        # pixels = the rect expanded outward to pixel-center grid lines
        tx0 = 6 * SIZE - M
        ty1 = M - 6 * SIZE
        x0, x1 = tx0 + 4.25 * P, tx0 + 9.75 * P     # centers i=4..9
        y1, y0 = ty1 - 5.25 * P, ty1 - 10.75 * P    # centers j=5..10
        df = make_df(spark, [geom_row(
            "Polygon", [x0, x1, x1, x0, x0], [y0, y0, y1, y1, y0])])
        out = rasterize_tiles(df, ZOOM).withColumn(
            "vec", vectorize_mask(F.col("mask"), F.col("tile_x"),
                                  F.col("tile_y"), ZOOM)).collect()
        v = out[0].vec
        assert v.geom_type == "Polygon"
        assert min(v.x) == pytest.approx(tx0 + 4 * P)
        assert max(v.x) == pytest.approx(tx0 + 10 * P)
        assert max(v.y) == pytest.approx(ty1 - 5 * P)
        assert min(v.y) == pytest.approx(ty1 - 11 * P)

    def test_empty_mask_vectorizes_null(self, spark):
        df = spark.range(1).select(
            F.array(*[F.lit(False)] * (PX * PX)).alias("mask"),
            F.lit(0).cast("long").alias("tile_x"),
            F.lit(0).cast("long").alias("tile_y"),
        )
        out = df.withColumn("vec", vectorize_mask(
            F.col("mask"), F.col("tile_x"), F.col("tile_y"), ZOOM)).collect()
        assert out[0].vec is None
