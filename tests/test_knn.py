"""Nearest-distance / kNN tests (FIXTURES.md F6).

Expected distances computed by brute force in numpy; the operator's
expanding-ring + safety-pass result must match exactly (squared distances,
nearest_distance.rs:64-75).
"""

import json

import numpy as np
import pytest
from pyspark.sql import functions as F

from ndjson_spatial_spark.functions.geo import parse_geojson
from ndjson_spatial_spark.operators.knn import (
    nearest_distance,
    nearest_k,
    with_distance_property,
)


def pts_df(spark, rows):
    """rows: (id, x, y) -> df(id, geom)."""
    data = [(i, json.dumps({"type": "Point", "coordinates": [x, y]}))
            for i, x, y in rows]
    return (
        spark.createDataFrame(data, ["id", "geojson"])
        .withColumn("geom", parse_geojson("geojson"))
        .drop("geojson")
    )


@pytest.fixture(scope="module")
def grids():
    rng = np.random.default_rng(42)
    # ref: 100 jittered grid points in [0, 100km]^2
    g = np.stack(np.meshgrid(np.linspace(0, 1e5, 10), np.linspace(0, 1e5, 10)), -1)
    ref = g.reshape(-1, 2) + rng.uniform(-2000, 2000, (100, 2))
    # stream: 30 random + coincident + far outlier
    stream = rng.uniform(0, 1e5, (30, 2))
    stream = np.vstack([stream, ref[13], [9.9e5, 9.9e5]])
    return stream, ref


def brute_force(stream, ref):
    d = ((stream[:, None, :] - ref[None, :, :]) ** 2).sum(-1)
    return d.min(axis=1)


class TestNearestDistance:
    def test_matches_brute_force(self, spark, grids):
        stream, ref = grids
        s_df = pts_df(spark, [(i, float(x), float(y)) for i, (x, y) in enumerate(stream)])
        r_df = pts_df(spark, [(1000 + i, float(x), float(y)) for i, (x, y) in enumerate(ref)])
        out = nearest_distance(s_df, r_df, res=9, max_rings=3)
        got = {r.id: r.distance for r in out.collect()}
        expected = brute_force(stream, ref)
        assert len(got) == len(stream)
        for i, e in enumerate(expected):
            assert got[i] == pytest.approx(e, rel=1e-12), f"row {i}"

    def test_coincident_point_zero(self, spark, grids):
        stream, ref = grids
        s_df = pts_df(spark, [(30, float(ref[13][0]), float(ref[13][1]))])
        r_df = pts_df(spark, [(i, float(x), float(y)) for i, (x, y) in enumerate(ref)])
        out = nearest_distance(s_df, r_df, res=9).collect()
        assert out[0].distance == 0.0

    def test_far_outlier_resolved_by_fallback(self, spark, grids):
        _, ref = grids
        s_df = pts_df(spark, [(0, 9.9e5, 9.9e5)])
        r_df = pts_df(spark, [(i, float(x), float(y)) for i, (x, y) in enumerate(ref)])
        out = nearest_distance(s_df, r_df, res=12, max_rings=2).collect()
        expected = brute_force(np.array([[9.9e5, 9.9e5]]), ref)[0]
        assert out[0].distance == pytest.approx(expected, rel=1e-12)

    def test_ring_candidate_not_nearest_safety_pass(self, spark):
        # stream point near its cell's corner: same-cell candidate exists but
        # the true nearest sits in the adjacent cell — the safety pass must
        # catch it. Cell size at res=9 is ~78 km; build the geometry so the
        # in-cell point is farther than the out-of-cell point.
        from ndjson_spatial_spark.kernels.cells import MERC_MAX
        cell = 2 * MERC_MAX / 512  # res 9
        # pick a cell boundary at x=0 (origin is a corner)
        s_df = pts_df(spark, [(0, 1000.0, 1000.0)])  # just NE of origin corner
        r_df = pts_df(spark, [
            (1, cell * 0.9, cell * 0.9),   # same cell, far
            (2, -1000.0, 1000.0),          # adjacent cell, near (d2=4e6)
        ])
        out = nearest_distance(s_df, r_df, res=9, max_rings=3).collect()
        assert out[0].distance == pytest.approx(4e6)

    def test_non_point_stream_rows_skipped(self, spark):
        poly = json.dumps({"type": "Polygon", "coordinates":
                           [[[0, 0], [1, 0], [1, 1], [0, 1], [0, 0]]]})
        df = spark.createDataFrame(
            [(0, poly), (1, json.dumps({"type": "Point", "coordinates": [0.0, 0.0]}))],
            ["id", "geojson"],
        ).withColumn("geom", parse_geojson("geojson")).drop("geojson")
        r_df = pts_df(spark, [(9, 3.0, 4.0)])
        out = nearest_distance(df, r_df, res=9).collect()
        assert [r.id for r in out] == [1]
        assert out[0].distance == pytest.approx(25.0)

    def test_nearest_k_matches_bruteforce(self, spark, grids):
        stream, ref = grids
        k = 4
        s_df = pts_df(spark, [(i, float(x), float(y)) for i, (x, y) in enumerate(stream)])
        r_df = pts_df(spark, [(1000 + i, float(x), float(y)) for i, (x, y) in enumerate(ref)])
        out = nearest_k(s_df, r_df, k=k, res=9, max_rings=2)
        got = {}
        for r in out.collect():
            got.setdefault(r.id, []).append((r.rank, r.distance))
        d = ((stream[:, None, :] - ref[None, :, :]) ** 2).sum(-1)
        for i in range(len(stream)):
            expected = sorted(d[i])[:k]
            mine = [dist for _, dist in sorted(got[i])]
            assert len(mine) == k
            for a, b in zip(mine, expected):
                assert a == pytest.approx(b, rel=1e-12), f"row {i}"

    def test_null_properties_quirk(self, spark):
        # nearest_distance.rs:83-85: null properties -> no distance written
        s_df = pts_df(spark, [(0, 0.0, 0.0), (1, 10.0, 10.0)]).withColumn(
            "properties",
            F.when(F.col("id") == 0, F.create_map(F.lit("name"), F.lit("a"))),
        )
        r_df = pts_df(spark, [(9, 3.0, 4.0)])
        out = with_distance_property(nearest_distance(s_df, r_df, res=9))
        rows = {r.id: r.properties for r in out.collect()}
        assert rows[0]["distance"] == "25.0"
        assert rows[1] is None


class TestJoinDwithin:
    def test_pairs_within_radius_exact(self, spark):
        # known layout: ref at origin cluster; stream points at measured
        # distances straddling the radius
        import json

        from pyspark.sql import functions as F

        from ndjson_spatial_spark.functions.geo import parse_geojson
        from ndjson_spatial_spark.operators.knn import join_dwithin

        def pt(pid, x, y):
            return (pid, json.dumps({"type": "Point", "coordinates": [x, y]}))

        stream = spark.createDataFrame(
            [pt("in1", 30.0, 40.0),     # d=50
             pt("in2", 0.0, 99.0),      # d=99
             pt("edge", 100.0, 0.0),    # d=100 == radius (inclusive)
             pt("out", 0.0, 100.5)],    # d=100.5
            ["sid", "gj"]).select(
                "sid", parse_geojson("gj").alias("geom"))
        ref = spark.createDataFrame(
            [pt("r0", 0.0, 0.0), pt("far", 10000.0, 10000.0)],
            ["rid", "gj"]).select("rid", parse_geojson("gj").alias("geom"))
        out = join_dwithin(stream, ref, radius=100.0)
        got = {(r.sid, r.rid): r.distance2 for r in out.collect()}
        assert got == {("in1", "r0"): 2500.0, ("in2", "r0"): 9801.0,
                       ("edge", "r0"): 10000.0}

    def test_matches_brute_force_on_random_points(self, spark):
        import numpy as np
        from pyspark.sql import functions as F

        from ndjson_spatial_spark.functions.geo import st_point
        from ndjson_spatial_spark.operators.knn import join_dwithin

        rng = np.random.default_rng(5)
        sp = [(int(i), float(x), float(y)) for i, (x, y) in enumerate(
            rng.integers(0, 5000, (200, 2)))]
        rp = [(int(i), float(x), float(y)) for i, (x, y) in enumerate(
            rng.integers(0, 5000, (60, 2)))]
        stream = spark.createDataFrame(sp, ["sid", "x", "y"]).select(
            "sid", "x", "y", st_point(F.col("x"), F.col("y")).alias("geom"))
        ref = spark.createDataFrame(rp, ["rid", "rx", "ry"]).select(
            "rid", "rx", "ry",
            st_point(F.col("rx"), F.col("ry")).alias("geom"))
        R = 700.0
        out = join_dwithin(stream.select("sid", "geom"),
                           ref.select("rid", "geom"), radius=R)
        got = {(r.sid, r.rid) for r in out.collect()}
        want = {(s[0], r[0]) for s in sp for r in rp
                if (s[1] - r[1]) ** 2 + (s[2] - r[2]) ** 2 <= R * R}
        assert got == want
