"""Interval-overlap join semantics (operators/interval.py) — the binned
equi-join plan must be exact and bin-width-independent: each overlapping
pair emitted exactly once (max-start-bin trick), nulls/inverted bounds
never match, `closed` toggles endpoint touching.  The sf-scale gate
(`interval` in __spark_entry__) certifies against DuckDB's native
inequality range join (IEJoin); these tests pin the parameter surface
and the no-duplicate guarantee on hand-computed frames.
"""

import pytest

from ndjson_spatial_spark.operators.interval import interval_join


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [
            ("u1", 0.0, 10.0, "a"),      # spans many bins
            ("u1", 9.5, 12.0, "b"),
            ("u1", 100.0, 101.0, "c"),   # overlaps nothing
            ("u2", 0.0, 10.0, "d"),      # same span, other key
            ("u1", None, 5.0, "n"),      # null start: never matches
            ("u1", 8.0, 2.0, "inv"),     # inverted: never matches
        ],
        "k string, s double, e double, lab string",
    )
    right = spark.createDataFrame(
        [
            ("u1", 4.0, 5.0, 1),     # inside 'a'
            ("u1", 10.0, 20.0, 2),   # touches 'a' endpoint, overlaps 'b'
            ("u1", -5.0, -1.0, 3),   # before everything
            ("u2", 9.0, 30.0, 4),    # overlaps 'd'
        ],
        "k string, s double, e double, v int",
    )
    return left, right


def _pairs(df):
    return sorted((r["lab"], r["v_right"]) for r in df.collect())


EXPECT_BOTH = [("a", 1), ("a", 2), ("b", 2), ("d", 4)]


def test_overlap_closed_both(frames):
    left, right = frames
    out = interval_join(left, right, ("s", "e"), ("s", "e"), by="k",
                        bin_width=3.0)
    assert _pairs(out) == EXPECT_BOTH
    # all left/right columns present, right suffixed
    assert "lab" in out.columns and "v_right" in out.columns


def test_closed_neither_drops_touching(frames):
    left, right = frames
    out = interval_join(left, right, ("s", "e"), ("s", "e"), by="k",
                        bin_width=3.0, closed="neither")
    # a-2 touched only at e==s==10 -> dropped under strict overlap
    assert _pairs(out) == [("a", 1), ("b", 2), ("d", 4)]


@pytest.mark.parametrize("w", [0.7, 1.0, 5.0, 1000.0])
def test_bin_width_independent_and_duplicate_free(frames, w):
    """A pair spanning k shared bins must appear exactly once for every
    bin width — the max(start)-bin dedup is the whole correctness
    argument for the zero-extra-shuffle plan."""
    left, right = frames
    out = interval_join(left, right, ("s", "e"), ("s", "e"), by="k",
                        bin_width=w)
    assert _pairs(out) == EXPECT_BOTH


def test_no_keys_global_join(spark):
    left = spark.createDataFrame([(0.0, 2.0, "x")],
                                 "s double, e double, lab string")
    right = spark.createDataFrame([(1.0, 3.0, 1), (2.5, 4.0, 2)],
                                  "s double, e double, v int")
    out = interval_join(left, right, ("s", "e"), ("s", "e"), bin_width=1.0)
    assert _pairs(out) == [("x", 1)]


def test_negative_coordinates(spark):
    """floor-division binning must stay consistent below zero."""
    left = spark.createDataFrame([(-10.0, -4.0, "x")],
                                 "s double, e double, lab string")
    right = spark.createDataFrame([(-5.0, -1.0, 1), (-20.0, -11.0, 2)],
                                  "s double, e double, v int")
    out = interval_join(left, right, ("s", "e"), ("s", "e"), bin_width=3.0)
    assert _pairs(out) == [("x", 1)]


def test_timestamp_bounds(spark):
    from pyspark.sql import functions as F

    left = spark.createDataFrame(
        [("2024-01-01 00:00:00", "2024-01-01 01:00:00", "x")],
        "s string, e string, lab string",
    ).select(F.col("s").cast("timestamp").alias("s"),
             F.col("e").cast("timestamp").alias("e"), "lab")
    right = spark.createDataFrame(
        [("2024-01-01 00:30:00", "2024-01-01 02:00:00", 1),
         ("2024-01-01 01:00:01", "2024-01-01 02:00:00", 2)],
        "s string, e string, v int",
    ).select(F.col("s").cast("timestamp").alias("s"),
             F.col("e").cast("timestamp").alias("e"), "v")
    out = interval_join(left, right, ("s", "e"), ("s", "e"),
                        bin_width=600.0)
    assert _pairs(out) == [("x", 1)]


def test_bad_params(frames):
    left, right = frames
    with pytest.raises(ValueError):
        interval_join(left, right, ("s", "e"), ("s", "e"), closed="left")
    with pytest.raises(ValueError):
        interval_join(left, right, ("s", "e"), ("s", "e"), bin_width=0)


def test_equi_join_plan_no_range_scan(frames):
    """The 100 TB contract: the physical plan is a plain equi-join on
    (key, bin) — never a broadcast nested loop / cartesian range join."""
    left, right = frames
    plan = interval_join(left, right, ("s", "e"), ("s", "e"), by="k",
                         bin_width=3.0)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
