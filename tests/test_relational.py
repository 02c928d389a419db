"""Relational operator parity tests — each fixture ports an inline reference
unit test (FIXTURES.md F1-F4; file:line cites in test docstrings)."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ndjson_spatial_spark.operators.relational import (
    aggregate,
    ndjson_filter,
    ndjson_join,
    pick_field,
    sort_rows,
)


class TestFilter:
    """ndjson/src/filter.rs:120-220 fixtures (F1)."""

    def test_i64_gt(self, spark):
        df = spark.createDataFrame([(1,), (-45,), (40250,)], ["a"])
        got = sorted(r.a for r in ndjson_filter(df, "d.a > 1").collect())
        assert got == [40250]

    def test_i64_le(self, spark):
        df = spark.createDataFrame([(1,), (-45,), (40250,)], ["a"])
        got = sorted(r.a for r in ndjson_filter(df, "d.a <= 1").collect())
        assert got == [-45, 1]

    def test_f64_mixed_int_rows(self, spark):
        # int rows compared against float literal (filter.rs f64 cases)
        df = spark.createDataFrame([(10.4,), (-34.58,), (24.0,), (54.0,)], ["a"])
        got = sorted(r.a for r in ndjson_filter(df, "d.a < 24.1").collect())
        assert got == [-34.58, 10.4, 24.0]

    def test_bool_eq(self, spark):
        df = spark.createDataFrame([(True, "foo"), (False, "bar")], ["a", "b"])
        got = [r.b for r in ndjson_filter(df, "d.a == true").collect()]
        assert got == ["foo"]

    def test_null_eq(self, spark):
        schema = T.StructType([T.StructField("a", T.BooleanType(), True)])
        df = spark.createDataFrame([(None,), (False,)], schema)
        assert ndjson_filter(df, "d.a == null").count() == 1
        assert ndjson_filter(df, "d.a != null").count() == 1

    def test_missing_field_drops_row(self, spark):
        # missing path => row dropped (filter.rs:65-69); null models missing
        schema = T.StructType([T.StructField("a", T.LongType(), True)])
        df = spark.createDataFrame([(1,), (None,)], schema)
        assert ndjson_filter(df, "d.a > 0").count() == 1
        assert ndjson_filter(df, "d.a != 1").count() == 0

    def test_string_unquoted(self, spark):
        df = spark.createDataFrame(
            [("Virtual Currency", 1), ("Coin", 2)], ["product", "n"]
        )
        got = ndjson_filter(df, "d.product == Virtual Currency").collect()
        assert [r.n for r in got] == [1]

    def test_nested_selector(self, spark):
        df = spark.createDataFrame(
            [Row(properties=Row(AREA=5.0)), Row(properties=Row(AREA=50.0))]
        )
        got = ndjson_filter(df, "d.properties.AREA >= 30.0").collect()
        assert [r.properties.AREA for r in got] == [50.0]


class TestPickField:
    """ndjson/src/pick_field.rs:24-64 (F1)."""

    def test_project_and_skip_missing(self, spark):
        schema = T.StructType([T.StructField("foo", T.LongType(), True),
                               T.StructField("bar", T.LongType(), True)])
        df = spark.createDataFrame([(1, 9), (2, 9), (5, 9), (None, 9)], schema)
        out = pick_field(df, "d.foo")
        assert out.columns == ["foo"]
        assert sorted(r.foo for r in out.collect()) == [1, 2, 5]


class TestJoin:
    """ndjson/src/join.rs:158-267 fixtures (F2)."""

    def make(self, spark):
        stream = spark.createDataFrame(
            [Row(foo=1, bar=2, bub=None), Row(foo=1, bar=2, bub=2)]
        )
        ref = spark.createDataFrame([Row(foo=1, baz=3), Row(foo=1, baz=2)])
        return stream, ref

    def test_non_unique_key_fanout(self, spark):
        # one output row per (stream, ref) match: 2 stream x 2 ref = 4
        stream, ref = self.make(spark)
        out = ndjson_join(stream, ref, ["d.foo"], ["d.foo"])
        assert out.count() == 4

    def test_ref_overwrites_stream_on_collision(self, spark):
        # merged object: ref fields win (join.rs:88-97)
        stream = spark.createDataFrame([Row(foo=1, shared=10)])
        ref = spark.createDataFrame([Row(foo=1, shared=99, extra=7)])
        row = ndjson_join(stream, ref, ["d.foo"], ["d.foo"]).collect()[0]
        assert row.shared == 99 and row.extra == 7

    def test_null_stream_key_never_matches(self, spark):
        # join.rs:82-85
        schema = T.StructType([T.StructField("foo", T.LongType(), True),
                               T.StructField("bar", T.LongType(), True)])
        stream = spark.createDataFrame([(None, 1), (1, 2)], schema)
        ref = spark.createDataFrame([Row(foo=1, baz=3)])
        out = ndjson_join(stream, ref, ["d.foo"], ["d.foo"])
        assert out.count() == 1

    def test_multi_field_joins_on_first_only(self, spark):
        # reader-exhaustion quirk: multi-field == first-field-only (J3)
        stream = spark.createDataFrame([Row(k1=1, k2=100)])
        ref = spark.createDataFrame([Row(k1=1, k2=999, v="hit")])
        out = ndjson_join(stream, ref, ["d.k1", "d.k2"], ["d.k1", "d.k2"])
        rows = out.collect()
        assert len(rows) == 1 and rows[0].v == "hit"

    def test_geo_shaped_join(self, spark):
        # join_geo fixtures (join.rs:211-267): string key, array ref col
        stream = spark.createDataFrame(
            [Row(country="USA", state="California", county="Alameda", color=None)],
            schema=T.StructType([
                T.StructField("country", T.StringType()),
                T.StructField("state", T.StringType()),
                T.StructField("county", T.StringType()),
                T.StructField("color", T.StringType(), True),
            ]),
        )
        ref = spark.createDataFrame(
            [Row(county="Alameda", country="USA", state="California",
                 brand=[1, 2, 3, 4])]
        )
        out = ndjson_join(stream, ref, ["d.county"], ["d.county"])
        row = out.collect()[0]
        assert row.brand == [1, 2, 3, 4] and row.color is None

    def test_broadcast_plan(self, spark):
        stream, ref = self.make(spark)
        plan = ndjson_join(stream, ref, ["d.foo"], ["d.foo"])._jdf.queryExecution().executedPlan().toString()
        assert "Broadcast" in plan


class TestAggregate:
    """ndjson/src/aggregate.rs:210-306 fixtures (F3)."""

    def df(self, spark):
        return spark.createDataFrame(
            [("bar", 2), ("bar", 5), ("baz", 3)], ["foo", "quz"]
        )

    def test_sum_always_float(self, spark):
        out = aggregate(self.df(spark), ["d.foo"], "sum", "d.quz")
        rows = out.collect()
        assert out.columns == ["foo", "quz_sum"]
        assert [(r.foo, r.quz_sum) for r in rows] == [("bar", 7.0), ("baz", 3.0)]
        assert dict(out.dtypes)["quz_sum"] == "double"

    def test_min_type_preserving(self, spark):
        out = aggregate(self.df(spark), ["d.foo"], "min", "d.quz")
        assert [(r.foo, r.quz_min) for r in out.collect()] == [("bar", 2), ("baz", 3)]
        assert dict(out.dtypes)["quz_min"] == "bigint"

    def test_max(self, spark):
        out = aggregate(self.df(spark), ["d.foo"], "max", "d.quz")
        assert [(r.foo, r.quz_max) for r in out.collect()] == [("bar", 5), ("baz", 3)]

    def test_count_counts_rows(self, spark):
        out = aggregate(self.df(spark), ["d.foo"], "count", "d.quz")
        assert [(r.foo, r.quz_count) for r in out.collect()] == [("bar", 2), ("baz", 1)]

    def test_nested_selector_naming(self, spark):
        # d.foo.bar group / d.foo.baz sum -> foo_bar, foo_baz_sum (A5)
        df = spark.createDataFrame([Row(foo=Row(bar="quz", baz=4))])
        out = aggregate(df, ["d.foo.bar"], "sum", "d.foo.baz")
        assert out.columns == ["foo_bar", "foo_baz_sum"]
        assert out.collect()[0].foo_baz_sum == 4.0

    def test_output_sorted_by_group_key(self, spark):
        df = spark.createDataFrame([("z", 1), ("a", 2), ("m", 3)], ["foo", "quz"])
        out = aggregate(df, ["d.foo"], "count", "d.quz")
        assert [r.foo for r in out.collect()] == ["a", "m", "z"]


class TestSort:
    """ndjson/src/sort.rs:41-93 fixtures (F4)."""

    def test_single_key_asc(self, spark):
        df = spark.createDataFrame([(4, 7), (3, 4)], ["bar", "foo"])
        out = sort_rows(df, ["d.bar"])
        assert [r.bar for r in out.collect()] == [3, 4]

    def test_multi_key(self, spark):
        df = spark.createDataFrame(
            [(1, 9), (1, 2), (0, 5)], ["foo", "bar"]
        )
        out = sort_rows(df, ["d.foo", "d.bar"])
        assert [(r.foo, r.bar) for r in out.collect()] == [(0, 5), (1, 2), (1, 9)]

    def test_desc(self, spark):
        df = spark.createDataFrame([(3, 4), (4, 7)], ["bar", "foo"])
        out = sort_rows(df, ["d.bar:desc"])
        assert [r.bar for r in out.collect()] == [4, 3]

    def test_short_direction_suffixes(self, spark):
        df = spark.createDataFrame([(3,), (4,)], ["bar"])
        assert [r.bar for r in sort_rows(df, ["d.bar:d"]).collect()] == [4, 3]
        assert [r.bar for r in sort_rows(df, ["d.bar:a"]).collect()] == [3, 4]

    def test_missing_field_sorts_after_ascending(self, spark):
        # Ok < Err ordering (sort.rs:17-34): nulls last asc, first desc
        schema = T.StructType([T.StructField("bar", T.LongType(), True)])
        df = spark.createDataFrame([(None,), (3,), (1,)], schema)
        assert [r.bar for r in sort_rows(df, ["d.bar"]).collect()] == [1, 3, None]
        assert [r.bar for r in sort_rows(df, ["d.bar:desc"]).collect()] == [None, 3, 1]


class TestVariantJoinKeys:
    def test_posint_float_string_keys_never_cross_match(self, spark):
        # reference OrderedValue join-key equality (ndjson/src/join.rs:
        # 108-137): PosInt(1) != Float(1.0) != String("1"); null stream
        # keys never match (join.rs:82-85)
        from ndjson_spatial_spark.operators.relational import ndjson_join

        stream = spark.createDataFrame(
            [("a", "1"), ("b", "1.0"), ("c", '"1"'), ("d", "2"),
             ("e", None)],
            ["sid", "k"])
        ref = spark.createDataFrame(
            [("r-int", "1"), ("r-float", "1.0"), ("r-str", '"1"'),
             ("r-two", "2.0"), ("r-null", None)],
            ["rid", "k"])
        out = ndjson_join(stream, ref, ["d.k"], ["d.k"], variant_keys=True)
        got = {(r.sid, r.rid) for r in out.collect()}
        assert got == {("a", "r-int"), ("b", "r-float"), ("c", "r-str")}

    def test_default_join_keeps_sql_equality(self, spark):
        # without the opt-in, typed equality treats 1 == 1.0 (documented
        # SURVEY 1.1 divergence)
        from ndjson_spatial_spark.operators.relational import ndjson_join

        stream = spark.createDataFrame([("a", 1.0)], ["sid", "k"])
        ref = spark.createDataFrame([("r", 1.0)], ["rid", "k"])
        out = ndjson_join(stream, ref, ["d.k"], ["d.k"])
        assert [(r.sid, r.rid) for r in out.collect()] == [("a", "r")]


class TestSessionize:
    def test_gap_splits_sessions(self, spark):
        import datetime as dt

        from ndjson_spatial_spark.operators.relational import sessionize

        base = dt.datetime(2024, 1, 1)
        rows = [
            (1, base, 1.0),
            (1, base + dt.timedelta(minutes=10), 2.0),
            (1, base + dt.timedelta(minutes=50), 4.0),   # 40min gap -> new
            (2, base, 8.0),
        ]
        df = spark.createDataFrame(rows, ["user_id", "ts", "value"])
        got = {(r.user_id, r.session_seq): (r.n_events, r.value_sum)
               for r in sessionize(df, gap_minutes=30).collect()}
        assert got[(1, 1)] == (2, 3.0)
        assert got[(1, 2)] == (1, 4.0)
        assert got[(2, 1)] == (1, 8.0)

    def test_exact_gap_boundary_stays_in_session(self, spark):
        import datetime as dt

        from ndjson_spatial_spark.operators.relational import sessionize

        base = dt.datetime(2024, 1, 1)
        df = spark.createDataFrame(
            [(1, base, 1.0), (1, base + dt.timedelta(minutes=30), 1.0)],
            ["user_id", "ts", "value"])
        out = sessionize(df, gap_minutes=30).collect()
        assert len(out) == 1 and out[0].n_events == 2  # strict > gap

    def test_table_without_value_column(self, spark):
        # r4 advice: value aggregation must be optional — any events-shaped
        # table (user, ts) sessionizes; value_sum simply absent
        import datetime as dt

        from ndjson_spatial_spark.operators.relational import sessionize

        base = dt.datetime(2024, 1, 1)
        df = spark.createDataFrame(
            [(1, base), (1, base + dt.timedelta(minutes=50))],
            ["user_id", "ts"])
        out = sessionize(df, gap_minutes=30)
        assert "value_sum" not in out.columns
        assert sorted(r.session_seq for r in out.collect()) == [1, 2]
        # custom value column name
        df2 = df.withColumn("amount", F.lit(2.0))
        out2 = sessionize(df2, gap_minutes=30, value_col="amount")
        assert {r.value_sum for r in out2.collect()} == {2.0}


class TestCrossTypeSort:
    """OrderedValue total order (ndjson/src/join.rs:108-123): the derived
    Rust enum order String < Bool < Number < Null < Array < Object with
    the PosInt < NegInt < Float numeric quirk, emulated over VariantType."""

    def test_ordered_value_sequence(self, spark):
        from ndjson_spatial_spark.operators.relational import (
            sort_rows_cross_type,
        )

        rows = [
            ("neg", "-3"),        # NegInt
            ("arr", "[0]"),       # Array
            ("nul", "null"),      # Null
            ("big", "18446744073709551615"),  # u64 -> PosInt (after 7!)
            ("flt", "1.5"),       # Float
            ("obj", '{"a":0}'),   # Object
            ("tru", "true"),      # Bool
            ("pos", "7"),         # PosInt
            ("str", '"zzz"'),     # String
            ("fls", "false"),     # Bool false < true
            ("f2", "-99.5"),      # Float (negative float still after NegInt)
            ("i30", "3.0"),       # decimal literal -> serde f64 -> Float
        ]
        df = spark.createDataFrame(rows, ["tag", "j"])
        got = [r.tag for r in sort_rows_cross_type(df, "j").collect()]
        assert got == [
            "str",           # String
            "fls", "tru",    # Bool: false < true
            "pos", "big",    # PosInt by value (7 < 2^64-1)
            "neg",           # NegInt — AFTER every PosInt (the quirk)
            "f2", "flt", "i30",  # Float by value: -99.5 < 1.5 < 3.0
            "nul", "arr", "obj",
        ]

    def test_float_order_within_rank(self, spark):
        from ndjson_spatial_spark.operators.relational import (
            sort_rows_cross_type,
        )

        df = spark.createDataFrame(
            [("a", "-99.5"), ("b", "3.0"), ("c", "1.5")], ["tag", "j"])
        got = [r.tag for r in sort_rows_cross_type(df, "j").collect()]
        assert got == ["a", "c", "b"]  # -99.5 < 1.5 < 3.0
