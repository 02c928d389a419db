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
