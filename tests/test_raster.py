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


class TestZonalStats:
    def test_zonal_stats_matches_bruteforce(self, spark):
        import itertools

        from pyspark.sql import functions as F

        from ndjson_spatial_spark.functions.geo import parse_geojson
        from ndjson_spatial_spark.operators.raster import zonal_stats

        # 20x20 grid, cell_size 10 -> centers at 5, 15, ..., 195
        cells = [(cx, cy, (cx * 7 + cy * 13) % 23)
                 for cx, cy in itertools.product(range(20), repeat=2)]
        cdf = spark.createDataFrame(cells, "cx long, cy long, value long")
        zones = [(1, 0, 0, 50, 50), (2, 30, 30, 120, 90),
                 (3, 500, 500, 600, 600)]  # zone 3 empty
        zdf = spark.createDataFrame(
            [(zid,
              f'{{"type":"Polygon","coordinates":[[[{x0},{y0}],'
              f'[{x1},{y0}],[{x1},{y1}],[{x0},{y1}],[{x0},{y0}]]]}}')
             for zid, x0, y0, x1, y1 in zones],
            "zone_id long, gj string",
        ).select("zone_id", parse_geojson(F.col("gj")).alias("geom"))
        got = {r.zone_id: (r.n_cells, r.sum_val, r.min_val, r.max_val,
                           r.mean_val)
               for r in zonal_stats(cdf, zdf, "zone_id",
                                    cell_size=10.0).collect()}
        for zid, x0, y0, x1, y1 in zones:
            vals = [v for cx, cy, v in cells
                    if x0 < (cx + 0.5) * 10 < x1
                    and y0 < (cy + 0.5) * 10 < y1]
            if not vals:
                assert zid not in got
                continue
            assert got[zid] == (len(vals), sum(vals), min(vals),
                                max(vals), sum(vals) / len(vals)), zid


class TestRasterAnalytics:
    def _cells(self, spark, n=400, w=20):
        import itertools
        rows = [(cx, cy, (cx * 7 + cy * 13) % 23)
                for cx, cy in itertools.product(range(w), repeat=2)]
        return rows, spark.createDataFrame(
            rows, "cx long, cy long, value long")

    def test_focal_stats_sparse_bruteforce(self, spark):
        from ndjson_spatial_spark.operators.raster import focal_stats
        # sparse: keep only cells where (cx+cy) % 3 != 0
        rows, _ = self._cells(spark)
        rows = [r for r in rows if (r[0] + r[1]) % 3 != 0]
        df = spark.createDataFrame(rows, "cx long, cy long, value long")
        got = {(r.cx, r.cy): (r.focal_n, r.focal_sum, r.focal_min,
                              r.focal_max, r.focal_mean)
               for r in focal_stats(df, radius=1).collect()}
        byk = {(cx, cy): v for cx, cy, v in rows}
        assert len(got) == len(rows)
        for cx, cy, v in rows:
            nb = [byk[(cx + dx, cy + dy)]
                  for dx in (-1, 0, 1) for dy in (-1, 0, 1)
                  if (cx + dx, cy + dy) in byk]
            assert got[(cx, cy)] == (len(nb), sum(nb), min(nb), max(nb),
                                     sum(nb) / len(nb)), (cx, cy)

    def test_resample_bruteforce(self, spark):
        from ndjson_spatial_spark.operators.raster import resample
        rows, df = self._cells(spark)
        got = {(r.cx, r.cy): (r.n_cells, r.sum_val, r.min_val, r.max_val,
                              r.mean_val)
               for r in resample(df, factor=4).collect()}
        agg: dict = {}
        for cx, cy, v in rows:
            agg.setdefault((cx // 4, cy // 4), []).append(v)
        assert len(got) == len(agg)
        for k, vs in agg.items():
            assert got[k] == (len(vs), sum(vs), min(vs), max(vs),
                              sum(vs) / len(vs)), k

    def test_local_op_inner_outer(self, spark):
        from ndjson_spatial_spark.operators.raster import local_op
        a = spark.createDataFrame(
            [(0, 0, 5), (0, 1, 7), (2, 2, 9)],
            "cx long, cy long, value long")
        b = spark.createDataFrame(
            [(0, 0, 3), (2, 2, 1), (4, 4, 8)],
            "cx long, cy long, value long")
        inner = {(r.cx, r.cy): r.value
                 for r in local_op(a, b, "mul", "inner").collect()}
        assert inner == {(0, 0): 15, (2, 2): 9}
        outer = {(r.cx, r.cy): r.value
                 for r in local_op(a, b, "max", "outer", fill=0).collect()}
        assert outer == {(0, 0): 5, (0, 1): 7, (2, 2): 9, (4, 4): 8}
        import pytest as _pt
        with _pt.raises(ValueError):
            local_op(a, b, "pow")
        with _pt.raises(ValueError):
            local_op(a, b, "add", how="left")

    def test_slope_gradient_horn_bruteforce(self, spark):
        import math
        from ndjson_spatial_spark.operators.raster import slope_gradient
        rows, df = self._cells(spark)
        byk = {(cx, cy): v for cx, cy, v in rows}
        out = {(r.cx, r.cy): r for r in
               slope_gradient(df, cell_size=30.0).collect()}
        # edges dropped: exactly the interior
        assert len(out) == 18 * 18
        for (cx, cy), r in out.items():
            g = lambda dx, dy: byk[(cx + dx, cy + dy)]
            a, b, c = g(-1, 1), g(0, 1), g(1, 1)
            d, f = g(-1, 0), g(1, 0)
            gg, h, i = g(-1, -1), g(0, -1), g(1, -1)
            dzdx = (c + 2 * f + i) - (a + 2 * d + gg)
            dzdy = (gg + 2 * h + i) - (a + 2 * b + c)
            assert (r.dzdx_num, r.dzdy_num) == (dzdx, dzdy), (cx, cy)
            assert r.grad2_num == dzdx * dzdx + dzdy * dzdy
            want = math.degrees(
                math.atan(math.sqrt(dzdx * dzdx + dzdy * dzdy) / 240.0))
            assert abs(r.slope_deg - want) < 1e-9

    def test_slope_incomplete_neighborhood_dropped(self, spark):
        from ndjson_spatial_spark.operators.raster import slope_gradient
        # a plus-shape: center lacks corner neighbors -> no output rows
        df = spark.createDataFrame(
            [(1, 1, 5), (0, 1, 1), (2, 1, 2), (1, 0, 3), (1, 2, 4)],
            "cx long, cy long, value long")
        assert slope_gradient(df).count() == 0
