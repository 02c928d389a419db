"""Grouped dissolve aggregate (operators/overlay.union_agg)."""

import json

import pytest
from pyspark.sql import functions as F

from ndjson_spatial_spark.functions.geo import parse_geojson, st_area
from ndjson_spatial_spark.operators.overlay import union_agg


def _rect_gj(x0, y0, x1, y1):
    return json.dumps({"type": "Polygon", "coordinates": [[
        [x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]]]})


def _df(spark, rows):
    return spark.createDataFrame(rows, ["grp", "gj"]).select(
        "grp", parse_geojson("gj").alias("geom"))


def _union_rows(spark, rows):
    u = union_agg(_df(spark, rows), ["grp"])
    g = F.col("geom")
    return {
        r.grp: r
        for r in u.select(
            "grp",
            (F.size(g["part_offsets"]) - 1).alias("n_parts"),
            st_area(g).alias("area"),
            F.array_min(g["x"]).alias("xmin"),
            F.array_max(g["x"]).alias("xmax"),
        ).collect()
    }


class TestUnionAgg:
    def test_rect_sets_match_lattice_bruteforce(self, spark):
        # three groups: overlapping chain / two separated clusters /
        # identical duplicates
        layouts = {
            0: [(0, 0, 70, 70), (30, 30, 100, 100), (60, 0, 130, 70)],
            1: [(0, 0, 50, 50), (200, 200, 260, 260), (210, 210, 240, 280)],
            2: [(10, 10, 40, 40), (10, 10, 40, 40)],
        }
        rows = [(grp, _rect_gj(*r)) for grp, rs in layouts.items()
                for r in rs]
        got = _union_rows(spark, rows)
        for grp, rs in layouts.items():
            covered = {(i, j)
                       for x0, y0, x1, y1 in rs
                       for i in range(x0 // 10, x1 // 10)
                       for j in range(y0 // 10, y1 // 10)}
            # components by overlap (strict interior overlap in these
            # fixtures; no edge-touch cases here)
            parent = {k: k for k in range(len(rs))}

            def find(a):
                while parent[a] != a:
                    a = parent[a]
                return a

            for i, a in enumerate(rs):
                for j2, b in enumerate(rs[:i]):
                    if a[0] < b[2] and b[0] < a[2] \
                            and a[1] < b[3] and b[1] < a[3]:
                        parent[find(i)] = find(j2)
            n_comp = len({find(k) for k in range(len(rs))})
            r = got[grp]
            assert r.n_parts == n_comp, grp
            assert r.area == len(covered) * 100.0, grp
            assert r.xmin == min(x0 for x0, _, _, _ in rs)
            assert r.xmax == max(x1 for _, _, x1, _ in rs)

    def test_frame_of_rects_creates_hole(self, spark):
        # four rects forming a square annulus around an uncovered void
        rows = [(0, _rect_gj(*r)) for r in [
            (0, 0, 100, 20), (0, 80, 100, 100),
            (0, 0, 20, 100), (80, 0, 100, 100)]]
        u = union_agg(_df(spark, rows), ["grp"]).collect()[0].geom
        # one part, two rings (shell + hole), area = frame only
        assert list(u["part_offsets"]) == [0, 2]
        # area via st_area on the assembled geometry
        got_area = [r.a for r in
                    union_agg(_df(spark, rows), ["grp"])
                    .select(st_area(F.col("geom")).alias("a"))
                    .collect()][0]
        assert got_area == 100 * 100 - 60 * 60

    def test_skips_out_of_scope_rows_and_empty_groups(self, spark):
        rows = [
            (0, _rect_gj(0, 0, 10, 10)),
            (0, json.dumps({"type": "Point", "coordinates": [1, 1]})),
            (1, json.dumps({"type": "LineString",
                            "coordinates": [[0, 0], [1, 1]]})),
        ]
        got = _union_rows(spark, rows)
        assert set(got) == {0}
        assert got[0].n_parts == 1 and got[0].area == 100.0

    def test_validation(self, spark):
        with pytest.raises(ValueError):
            union_agg(_df(spark, [(0, _rect_gj(0, 0, 1, 1))]), [])
