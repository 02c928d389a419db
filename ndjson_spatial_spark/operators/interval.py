"""Interval-overlap (range) join — the temporal/genomic operator Spark
has no native equivalent for (DuckDB runs it as an IEJoin, PostgreSQL
via `&&` on ranges, Apache Sedona only for the spatial case).

The distributed plan (the 100 TB shape) is BINNING, not an inequality
cross-join and not a sort-merge interval sweep:

    1. each side explodes its interval [s, e] to the fixed-width bins it
       covers: ``sequence(floor(s/w), floor(e/w))`` — pure Catalyst,
    2. equi-join on (keys..., bin) — ONE hash/sort-merge shuffle pair on
       a perfectly partitionable key,
    3. refine with the exact predicate ``ls <= re AND rs <= le``,
    4. de-duplicate WITHOUT a distinct: a pair overlapping across k
       shared bins is emitted only in the bin containing
       ``max(ls, rs)`` (that bin is always shared when the intervals
       overlap), so the join output is exact with ZERO extra shuffles.

Cost: input inflation is len/w per row (pick w ~ the median interval
length), the join itself is a plain equi-shuffle that AQE can split on
hot bins.  An inequality-only formulation would force a broadcast
nested-loop or cartesian plan — O(n·m) at scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["interval_join"]


def interval_join(
    left: DataFrame,
    right: DataFrame,
    left_bounds: tuple[str, str],
    right_bounds: tuple[str, str],
    by: str | list[str] | None = None,
    bin_width: float = 3600.0,
    closed: str = "both",
    suffix: str = "_right",
) -> DataFrame:
    """Inner-join rows whose [start, end] intervals overlap, optionally
    within the same ``by`` key(s).

    ``left_bounds`` / ``right_bounds`` name the (start, end) columns
    (numeric or castable to double; timestamps cast via epoch seconds).
    ``closed``: "both" treats touching endpoints (le == rs) as
    overlapping (SQL ``ls <= re AND rs <= le``); "neither" uses strict
    inequalities.  Right columns come back suffixed.  Rows with null or
    inverted bounds never match (SQL three-valued logic).

    ``bin_width`` trades inflation for join selectivity — set it near
    the typical interval length; correctness is bin-width-independent.
    """
    if closed not in ("both", "neither"):
        raise ValueError(f"closed must be both/neither: {closed}")
    if bin_width <= 0:
        raise ValueError(f"bin_width must be positive: {bin_width}")
    keys = [by] if isinstance(by, str) else list(by or [])

    def _num(col: Column, dtype: str) -> Column:
        if dtype.startswith("timestamp"):
            return col.cast("timestamp").cast("double")
        return col.cast("double")

    def _binned(df: DataFrame, bounds: tuple[str, str], tag: str) -> DataFrame:
        s_col, e_col = bounds
        dt = dict(df.dtypes)
        s = _num(F.col(s_col), dt[s_col])
        e = _num(F.col(e_col), dt[e_col])
        w = F.lit(float(bin_width))
        out = df.select(
            F.struct(*df.columns).alias(f"__{tag}"),
            s.alias(f"__{tag}s"),
            e.alias(f"__{tag}e"),
            *[F.col(k).alias(f"__k_{k}") for k in keys],
        )
        # null / inverted bounds produce an empty sequence -> row drops,
        # matching the never-matches contract without a separate filter
        return out.withColumn(
            "__bin",
            F.explode(
                F.when(
                    F.col(f"__{tag}s") <= F.col(f"__{tag}e"),
                    F.sequence(
                        F.floor(F.col(f"__{tag}s") / w),
                        F.floor(F.col(f"__{tag}e") / w),
                    ),
                )
            ),
        )

    l = _binned(left, left_bounds, "l")   # noqa: E741
    r = _binned(right, right_bounds, "r")

    cond = l["__bin"] == r["__bin"]
    for k in keys:
        cond = cond & (l[f"__k_{k}"] == r[f"__k_{k}"])
    j = l.join(r, cond, "inner")

    ls, le = F.col("__ls"), F.col("__le")
    rs, re_ = F.col("__rs"), F.col("__re")
    if closed == "both":
        overlap = (ls <= re_) & (rs <= le)
    else:
        overlap = (ls < re_) & (rs < le)
    # emit each overlapping pair exactly once: only in the bin holding
    # max(start_l, start_r) — always a shared bin when they overlap
    once = l["__bin"] == F.floor(
        F.greatest(ls, rs) / F.lit(float(bin_width))
    )

    rcols = right.columns
    return j.where(overlap & once).select(
        *[F.col(f"__l.{c}").alias(c) for c in left.columns],
        *[F.col(f"__r.{c}").alias(f"{c}{suffix}") for c in rcols],
    )
