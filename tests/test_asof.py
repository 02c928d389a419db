"""As-of join semantics (operators/asof.py) — pandas.merge_asof /
DuckDB ASOF JOIN contract: nearest at-or-before (backward) or
at-or-after (forward) right row per key, LEFT semantics, optional
tolerance.  The sf-scale gate (`asof` in __spark_entry__) certifies
against DuckDB's native ASOF LEFT JOIN; these tests pin the parameter
surface on tiny hand-computed frames.
"""

import pytest
from pyspark.sql import functions as F

from ndjson_spatial_spark.operators.asof import asof_join


def _mk(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


@pytest.fixture(scope="module")
def frames(spark):
    left = _mk(
        spark,
        [
            ("u1", 10.0, "a"),
            ("u1", 25.0, "b"),
            ("u1", 5.0, "c"),   # before every right row
            ("u2", 50.0, "d"),
            ("u3", 99.0, "e"),  # key with no right rows at all
        ],
        "k string, t double, lab string",
    )
    right = _mk(
        spark,
        [
            ("u1", 8.0, 100),
            ("u1", 10.0, 200),   # exactly simultaneous with left 'a'
            ("u1", 20.0, 300),
            ("u2", 60.0, 400),   # after u2's only left row
        ],
        "k string, t double, payload int",
    )
    return left, right


def _by_lab(df):
    return {r["lab"]: r.asDict() for r in df.collect()}


def test_backward_basic(frames):
    left, right = frames
    out = _by_lab(asof_join(left, right, on="t", by="k"))
    # equal timestamps match (<= convention)
    assert out["a"]["payload_right"] == 200 and out["a"]["t_right"] == 10.0
    assert out["b"]["payload_right"] == 300
    # left row before all right rows -> null
    assert out["c"]["payload_right"] is None
    # right row strictly after -> no backward match
    assert out["d"]["payload_right"] is None
    # key absent from right entirely -> null, row still present
    assert out["e"]["payload_right"] is None
    assert len(out) == 5


def test_forward(frames):
    left, right = frames
    out = _by_lab(asof_join(left, right, on="t", by="k",
                            direction="forward"))
    assert out["a"]["payload_right"] == 200     # >= convention at ties
    assert out["b"]["payload_right"] is None    # nothing at/after 25
    assert out["c"]["payload_right"] == 100     # nearest after 5 is 8
    assert out["d"]["payload_right"] == 400
    assert out["e"]["payload_right"] is None


def test_tolerance(frames):
    left, right = frames
    out = _by_lab(asof_join(left, right, on="t", by="k", tolerance=4.0))
    # 'b' at 25 matched 20 (delta 5) -> nulled by tolerance 4
    assert out["b"]["payload_right"] is None
    assert out["b"]["t_right"] is None
    # 'a' delta 0 survives
    assert out["a"]["payload_right"] == 200


def test_no_keys_global_asof(spark):
    left = _mk(spark, [(15.0, "x"), (1.0, "y")], "t double, lab string")
    right = _mk(spark, [(10.0, 7), (14.0, 8)], "t double, v int")
    out = _by_lab(asof_join(left, right, on="t"))
    assert out["x"]["v_right"] == 8
    assert out["y"]["v_right"] is None


def test_multi_key(spark):
    left = _mk(spark, [("a", 1, 10.0, "p"), ("a", 2, 10.0, "q")],
               "k1 string, k2 int, t double, lab string")
    right = _mk(spark, [("a", 1, 9.0, 1), ("a", 2, 8.0, 2)],
                "k1 string, k2 int, t double, v int")
    out = _by_lab(asof_join(left, right, on="t", by=["k1", "k2"]))
    assert out["p"]["v_right"] == 1
    assert out["q"]["v_right"] == 2


def test_timestamp_tolerance_seconds(spark):
    left = spark.createDataFrame(
        [("u", "2024-01-01 00:10:00", "x")],
        "k string, ts string, lab string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    right = spark.createDataFrame(
        [("u", "2024-01-01 00:00:00", 5)],
        "k string, ts string, v int",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    ok = _by_lab(asof_join(left, right, on="ts", by="k", tolerance=600))
    assert ok["x"]["v_right"] == 5           # 600 s away, inside bound
    cut = _by_lab(asof_join(left, right, on="ts", by="k", tolerance=599))
    assert cut["x"]["v_right"] is None


def test_bad_direction(frames):
    left, right = frames
    with pytest.raises(ValueError):
        asof_join(left, right, on="t", direction="nearest")


def test_single_shuffle_plan(frames):
    """The 100 TB contract: ONE exchange on the keys (the union is
    shuffled once for the window), no join node, no cross product."""
    left, right = frames
    plan = asof_join(left, right, on="t", by="k")._jdf.queryExecution() \
        .executedPlan().toString()
    assert plan.count("Exchange") == 1
    assert "CartesianProduct" not in plan and "SortMergeJoin" not in plan
