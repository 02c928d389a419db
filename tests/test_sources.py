"""Source/sink parity tests (SURVEY §2.1 S1-S7, FIXTURES.md F10)."""

import json

import pytest
from pyspark.sql import types as T

from ndjson_spatial_spark.sources.ndjson import (
    from_csv,
    from_geojson,
    from_json_split,
    read_ndjson,
    to_geojson,
)


@pytest.fixture()
def tmpfile(tmp_path):
    def write(name, content):
        p = tmp_path / name
        p.write_text(content)
        return str(p)

    return write


class TestReadNdjson:
    def test_basic(self, spark, tmpfile):
        p = tmpfile("a.ndjson", '{"a": 1}\n{"a": 2}\n')
        assert sorted(r.a for r in read_ndjson(spark, p).collect()) == [1, 2]

    def test_trailing_comma_stripped(self, spark, tmpfile):
        # ndjson-common/src/ndjson.rs:117-122
        p = tmpfile("b.ndjson", '{"a": 1},\n{"a": 2}\n')
        assert sorted(r.a for r in read_ndjson(spark, p).collect()) == [1, 2]

    def test_blank_lines_skipped(self, spark, tmpfile):
        p = tmpfile("c.ndjson", '{"a": 1}\n\n{"a": 2}\n')
        assert read_ndjson(spark, p).count() == 2

    def test_explicit_schema_with_corrupt(self, spark, tmpfile):
        p = tmpfile("d.ndjson", '{"a": 1}\nnot json\n')
        schema = T.StructType([T.StructField("a", T.LongType(), True)])
        df = read_ndjson(spark, p, schema=schema)
        vals = sorted((r.a is not None) for r in df.collect())
        assert vals == [False, True]  # corrupt row nulls out, row count kept


class TestFromJsonSplit:
    def test_split_array_under_selector(self, spark, tmpfile):
        # S1: ndjson/src/from_json.rs:21-29
        doc = json.dumps({"meta": 1, "items": [{"x": 1}, {"x": 2}, {"x": 3}]})
        p = tmpfile("doc.json", doc)
        out = from_json_split(spark, p, "items")
        assert sorted(r.x for r in out.collect()) == [1, 2, 3]

    def test_root_array_split(self, spark, tmpfile):
        # selector grammar allows bare `d` = root array
        # (json_selector_parser.rs:216-233)
        doc = json.dumps([{"x": 1}, {"x": 2}])
        p = tmpfile("rootarr.json", doc)
        out = from_json_split(spark, p, None)
        assert sorted(r.x for r in out.collect()) == [1, 2]

    def test_indexed_selector_root_array(self, spark, tmpfile):
        # d[1].items: index into the root array, then split the inner array
        doc = json.dumps([
            {"items": [{"x": 9}]},
            {"items": [{"x": 1}, {"x": 2}]},
        ])
        p = tmpfile("idx.json", doc)
        out = from_json_split(spark, p, "d[1].items")
        assert sorted(r.x for r in out.collect()) == [1, 2]

    def test_indexed_selector_nested(self, spark, tmpfile):
        doc = json.dumps({"a": [{"b": [{"x": 5}, {"x": 6}]}]})
        p = tmpfile("nested.json", doc)
        out = from_json_split(spark, p, "d.a[0].b")
        assert sorted(r.x for r in out.collect()) == [5, 6]


class TestFromGeojson:
    def test_featurecollection_to_rows(self, spark, tmpfile):
        # S2: selector fixed to `features` (from_geojson.rs:25)
        fc = json.dumps({
            "type": "FeatureCollection",
            "features": [
                {"type": "Feature", "properties": {"name": "a"},
                 "geometry": {"type": "Point", "coordinates": [1.0, 2.0]}},
                {"type": "Feature", "properties": {"name": "b"},
                 "geometry": {"type": "Point", "coordinates": [3.0, 4.0]}},
            ],
        })
        p = tmpfile("fc.geojson", fc)
        out = from_geojson(spark, p)
        assert out.count() == 2
        assert sorted(r.properties.name for r in out.collect()) == ["a", "b"]


class TestToGeojson:
    def test_single_featurecollection(self, spark):
        # S3: to_geojson.rs:21-51 (bbox omitted)
        df = spark.createDataFrame([(1, "x"), (2, "y")], ["id", "v"])
        out = to_geojson(df).collect()
        assert len(out) == 1
        parsed = json.loads(out[0].geojson)
        assert parsed["type"] == "FeatureCollection"
        assert sorted(f["id"] for f in parsed["features"]) == [1, 2]


class TestFromCsv:
    def test_per_cell_inference_fixture(self, spark, tmpfile):
        # F10: inference cascade (infer_json.rs:3-26)
        csv = "i,neg,f,empty,b,zero_pad,float_int,s\n42,-7,3.5,,true,01,1.0,hello\n"
        p = tmpfile("x.csv", csv)
        df = from_csv(spark, p)
        row = df.collect()[0]
        dt = dict(df.dtypes)
        assert row.i == 42 and dt["i"] in ("int", "bigint")
        assert row.neg == -7
        assert row.f == 3.5 and dt["f"] == "double"
        assert row.empty is None
        assert row.b is True and dt["b"] == "boolean"
        # '01' fails the int round-trip (to_string() != item) but the f64
        # parse has NO round-trip guard (infer_json.rs:14-16) -> float 1.0
        assert row.zero_pad == 1.0 and dt["zero_pad"] == "double"
        assert row.float_int == 1.0 and dt["float_int"] == "double"
        assert row.s == "hello"

    def test_custom_delimiter(self, spark, tmpfile):
        p = tmpfile("y.csv", "a|b\n1|x\n")
        row = from_csv(spark, p, delimiter="|").collect()[0]
        assert row.a == 1 and row.b == "x"


class TestWkt:
    """WKT ingestion/sink (round-4 engine extension): same canonical
    struct + corrupt-row convention as parse_geojson."""

    CASES = [
        "POINT (30 10)",
        "LINESTRING (30 10, 10 30, 40 40)",
        "POLYGON ((35 10, 45 45, 15 40, 10 20, 35 10), "
        "(20 30, 35 35, 30 20, 20 30))",
        "MULTIPOINT ((10 40), (40 30), (20 20), (30 10))",
        "MULTILINESTRING ((10 10, 20 20, 10 40), "
        "(40 40, 30 30, 40 20, 30 10))",
        "MULTIPOLYGON (((30 20, 45 40, 10 40, 30 20)), "
        "((15 5, 40 10, 10 20, 5 10, 15 5)))",
        "GEOMETRYCOLLECTION (POINT (40 10), "
        "LINESTRING (10 10, 20 20, 10 40), "
        "POLYGON ((40 40, 20 45, 45 30, 40 40)))",
    ]

    def test_all_types_round_trip(self, spark):
        from pyspark.sql import functions as F

        from ndjson_spatial_spark.functions.wkt import parse_wkt, st_aswkt

        df = spark.createDataFrame([(w,) for w in self.CASES], ["w"]) \
            .withColumn("geom", parse_wkt("w"))
        assert df.where(F.col("geom.geom_type").isNull()).count() == 0
        rt = df.select("geom", parse_wkt(st_aswkt("geom")).alias("g2")) \
            .collect()
        for r in rt:
            assert r.geom == r.g2

    def test_wkt_equals_geojson_parse(self, spark):
        import json

        from ndjson_spatial_spark.functions.geo import parse_geojson
        from ndjson_spatial_spark.functions.wkt import parse_wkt

        gj = json.dumps({"type": "Polygon", "coordinates":
                         [[[35.0, 10.0], [45.0, 45.0], [15.0, 40.0],
                           [10.0, 20.0], [35.0, 10.0]],
                          [[20.0, 30.0], [35.0, 35.0], [30.0, 20.0],
                           [20.0, 30.0]]]})
        wkt = self.CASES[2]
        df = spark.createDataFrame([(gj, wkt)], ["gj", "wkt"])
        r = df.select(parse_geojson("gj").alias("a"),
                      parse_wkt("wkt").alias("b")).collect()[0]
        assert r.a == r.b

    def test_multipoint_both_spellings(self, spark):
        from ndjson_spatial_spark.functions.wkt import parse_wkt

        df = spark.createDataFrame(
            [("MULTIPOINT ((10 40), (40 30))", "MULTIPOINT (10 40, 40 30)")],
            ["a", "b"])
        r = df.select(parse_wkt("a").alias("a"),
                      parse_wkt("b").alias("b")).collect()[0]
        assert r.a == r.b

    def test_malformed_rows_null(self, spark):
        from pyspark.sql import functions as F

        from ndjson_spatial_spark.functions.wkt import parse_wkt

        bad = ["", "garbage", "POINT Z (1 2 3)", "POINT (1)",
               "POLYGON ((1 2, 3 4)", "POINT EMPTY", None]
        df = spark.createDataFrame([(w,) for w in bad], "w string") \
            .withColumn("geom", parse_wkt("w"))
        assert df.where(F.col("geom.geom_type").isNotNull()).count() == 0
