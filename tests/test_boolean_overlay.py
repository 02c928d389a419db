"""Boolean overlay (st_boolean: union/difference/symdifference) — round-5."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from ndjson_spatial_spark.functions.geo import st_area, st_boolean, st_point
from ndjson_spatial_spark.kernels.geometry import (
    _signed_area,
    polygon_boolean,
)


def _poly_row(xs, ys):
    return ("Polygon", [float(v) for v in xs], [float(v) for v in ys],
            [0, len(xs)], [0, 1])


GEOM_DDL = ("geom_type string, x array<double>, y array<double>, "
            "ring_offsets array<int>, part_offsets array<int>")


def _pairs_df(spark, pairs):
    rows = [(i, _poly_row(*a), _poly_row(*b))
            for i, (a, b) in enumerate(pairs)]
    return spark.createDataFrame(
        rows, f"id int, ga struct<{GEOM_DDL}>, gb struct<{GEOM_DDL}>")


RECT_A = ([0, 10, 10, 0], [0, 0, 10, 10])          # area 100
RECT_B = ([5, 15, 15, 5], [5, 5, 15, 15])          # area 100, overlap 25
RECT_IN = ([3, 6, 6, 3], [3, 3, 6, 6])             # inside A, area 9
RECT_FAR = ([100, 104, 104, 100], [0, 0, 4, 4])    # disjoint, area 16
L_SHAPE = ([0, 6, 6, 3, 3, 0], [0, 0, 3, 3, 6, 6])  # concave, area 27


def test_boolean_areas_match_inclusion_exclusion(spark):
    df = _pairs_df(spark, [(RECT_A, RECT_B)])
    for op, want in (("union", 175.0), ("difference", 75.0),
                     ("symdifference", 150.0), ("intersection", 25.0)):
        out = df.select(
            st_area(st_boolean(op)(F.col("ga"), F.col("gb"))).alias("a")
        ).collect()
        assert out[0].a == pytest.approx(want), op


def test_difference_with_interior_hole(spark):
    df = _pairs_df(spark, [(RECT_A, RECT_IN)])
    row = df.select(
        st_boolean("difference")(F.col("ga"), F.col("gb")).alias("g")
    ).select(F.col("g.geom_type").alias("t"),
             F.size("g.ring_offsets").alias("nring"),
             st_area("g").alias("a")).collect()[0]
    # one shell + one hole ring, area 100 - 9 (st_area subtracts holes)
    assert row.t == "Polygon" and row.nring == 3
    assert row.a == pytest.approx(91.0)


def test_union_disjoint_is_multipolygon(spark):
    df = _pairs_df(spark, [(RECT_A, RECT_FAR)])
    row = df.select(
        st_boolean("union")(F.col("ga"), F.col("gb")).alias("g")
    ).select(F.col("g.geom_type").alias("t"), st_area("g").alias("a")) \
     .collect()[0]
    assert row.t == "MultiPolygon" and row.a == pytest.approx(116.0)


def test_concave_union_dissolves_to_single_ring(spark):
    # L-shape union a rect filling its notch -> one 6x6 square
    notch = ([3, 6, 6, 3], [3, 3, 6, 6])
    df = _pairs_df(spark, [(L_SHAPE, notch)])
    row = df.select(
        st_boolean("union")(F.col("ga"), F.col("gb")).alias("g")
    ).select(F.col("g.geom_type").alias("t"),
             F.size("g.ring_offsets").alias("nring"),
             st_area("g").alias("a")).collect()[0]
    assert row.t == "Polygon" and row.nring == 2
    assert row.a == pytest.approx(36.0)


def test_empty_and_invalid_inputs_are_null(spark):
    # disjoint intersection -> null; non-polygon input -> null
    df = _pairs_df(spark, [(RECT_A, RECT_FAR)])
    assert df.select(
        st_boolean("intersection")(F.col("ga"), F.col("gb")).alias("g")
    ).where(F.col("g.geom_type").isNotNull()).count() == 0
    pt = df.select(st_point(F.lit(1.0), F.lit(2.0)).alias("ga"),
                   F.col("gb"))
    assert pt.select(
        st_boolean("union")(F.col("ga"), F.col("gb")).alias("g")
    ).where(F.col("g.geom_type").isNotNull()).count() == 0
    with pytest.raises(ValueError):
        st_boolean("xor")


def test_boolean_kernel_randomized_area_identities():
    """2100-case randomized sweep: rect x rect, L x rect (both roles),
    L x L — every op's area equals the closed-form inclusion-exclusion."""
    import random

    random.seed(7)

    def rect(x0, y0, w, h):
        return [x0, x0 + w, x0 + w, x0], [y0, y0, y0 + h, y0 + h]

    def rect_ix(a, b):
        ax0, ay0, aw, ah = a
        bx0, by0, bw, bh = b
        return (max(0, min(ax0 + aw, bx0 + bw) - max(ax0, bx0))
                * max(0, min(ay0 + ah, by0 + bh) - max(ay0, by0)))

    def area(pieces):
        return sum(abs(_signed_area(np.asarray(x), np.asarray(y)))
                   for x, y in pieces)

    def lshape(x0, y0, s):
        return ([x0, x0 + 2 * s, x0 + 2 * s, x0 + s, x0 + s, x0],
                [y0, y0, y0 + s, y0 + s, y0 + 2 * s, y0 + 2 * s])

    def l_rects(x0, y0, s):
        return [(x0, y0, 2 * s, s), (x0, y0 + s, s, s)]

    for _ in range(200):
        a = (random.randint(0, 20), random.randint(0, 20),
             random.randint(1, 15), random.randint(1, 15))
        b = (random.randint(0, 12), random.randint(0, 12),
             random.randint(1, 6))
        A, B = a[2] * a[3], 3 * b[2] ** 2
        nI = sum(rect_ix(a, q) for q in l_rects(*b))
        ra, lb = rect(*a), lshape(*b)
        for op, want in (("union", A + B - nI), ("difference", A - nI),
                         ("symdifference", A + B - 2 * nI),
                         ("intersection", nI)):
            got = area(polygon_boolean(ra[0], ra[1], lb[0], lb[1], op))
            assert got == pytest.approx(want, abs=1e-9), (op, a, b)
        # concave as the SUBJECT of the difference
        got = area(polygon_boolean(lb[0], lb[1], ra[0], ra[1],
                                   "difference"))
        assert got == pytest.approx(B - nI, abs=1e-9), (a, b)


# ------------------------------------------------- polygon buffer (r5) --
class TestPolygonBuffer:
    def _one(self, spark, geom_row, ddl="ga", **kw):
        from ndjson_spatial_spark.functions.geo import st_buffer

        df = spark.createDataFrame(
            [(geom_row,)], f"ga struct<{GEOM_DDL}>")
        return df.select(st_buffer(F.col("ga"), **kw).alias("g")).collect()[0].g

    def test_square_miter_dilation_exact_vertices(self, spark):
        g = self._one(spark, _poly_row(*RECT_A), distance=2.0,
                      join_style="miter")
        assert g.geom_type == "Polygon"
        pts = sorted(zip(g.x[:-1], g.y[:-1]))
        assert pts == [(-2.0, -2.0), (-2.0, 12.0), (12.0, -2.0),
                       (12.0, 12.0)]

    def test_square_round_dilation_area(self, spark):
        import numpy as np

        g = self._one(spark, _poly_row(*RECT_A), distance=2.0,
                      join_style="round", quad_segs=8)
        x, y = np.asarray(g.x), np.asarray(g.y)
        area = 0.5 * abs(np.dot(x[:-1], y[1:]) - np.dot(x[1:], y[:-1]))
        # grown rect + full 32-gon disk split across the 4 corners
        want = 100 + 2 * 2 * 20 + (32 / 2) * 4 * np.sin(2 * np.pi / 32)
        assert area == pytest.approx(want, rel=1e-12)

    def test_square_erosion_exact(self, spark):
        g = self._one(spark, _poly_row(*RECT_A), distance=-2.0)
        pts = sorted(zip(g.x[:-1], g.y[:-1]))
        assert pts == [(2.0, 2.0), (2.0, 8.0), (8.0, 2.0), (8.0, 8.0)]

    def test_erosion_to_empty_is_null(self, spark):
        g = self._one(spark, _poly_row(*RECT_A), distance=-6.0)
        assert g.geom_type is None

    def test_lshape_miter_dilation_area(self, spark):
        import numpy as np

        g = self._one(spark, _poly_row(*L_SHAPE), distance=1.0,
                      join_style="miter")
        x, y = np.asarray(g.x), np.asarray(g.y)
        area = 0.5 * abs(np.dot(x[:-1], y[1:]) - np.dot(x[1:], y[:-1]))
        # A + P*r + (n_convex - n_reflex) * r^2 = 27 + 24 + 4
        assert area == pytest.approx(55.0, rel=1e-12)

    def test_concave_erosion_and_holes_are_null(self, spark):
        assert self._one(spark, _poly_row(*L_SHAPE),
                         distance=-1.0).geom_type is None
        holed = ("Polygon",
                 [0.0, 10.0, 10.0, 0.0, 3.0, 6.0, 6.0, 3.0],
                 [0.0, 0.0, 10.0, 10.0, 3.0, 3.0, 6.0, 6.0],
                 [0, 4, 8], [0, 2])
        df = spark.createDataFrame([(holed,)], f"ga struct<{GEOM_DDL}>")
        from ndjson_spatial_spark.functions.geo import st_buffer

        out = df.select(st_buffer(F.col("ga"), 1.0).alias("g")).collect()
        assert out[0].g.geom_type is None

    def test_negative_distance_nulls_points_and_lines(self, spark):
        from ndjson_spatial_spark.functions.geo import st_buffer, st_point

        df = spark.range(1).select(st_point(F.lit(1.0), F.lit(2.0))
                                   .alias("ga"))
        assert df.select(st_buffer(F.col("ga"), -1.0).alias("g")) \
            .where(F.col("g.geom_type").isNotNull()).count() == 0
