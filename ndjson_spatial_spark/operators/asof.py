"""As-of (time-travel) join — the classic event/quote temporal operator
Spark has no native equivalent for (pandas.merge_asof / DuckDB ASOF JOIN /
kdb aj semantics).

The distributed plan (the 100 TB shape) is the union + carry-forward
window, NOT a per-key loop and NOT a range cross-join:

    1. tag both sides and UNION them (right rows carry their payload in
       one struct column, left rows carry null),
    2. one window per key: ``last(payload, ignorenulls=True)`` over
       (partition by keys, order by time, side) — right rows sort BEFORE
       left rows at equal timestamps, so an exactly-simultaneous right
       row is matched (the <= convention DuckDB/pandas use),
    3. keep only left rows; unpack the carried struct.

Cost: ONE shuffle on the join keys (both sides co-partitioned by the
union), one in-partition sort — the same exchange count as a plain
groupBy, independent of time-skew, and AQE-splittable on hot keys.  A
range-join rewrite would be O(candidates); this is O(n log n) per key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join"]


def _epoch(col: Column, dtype: str) -> Column:
    # TIMESTAMP_NTZ refuses a direct double cast; hop through timestamp
    # (the tz shift cancels in differences)
    if dtype.startswith("timestamp"):
        return col.cast("timestamp").cast("double")
    return col.cast("double")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: str | list[str] | None = None,
    direction: str = "backward",
    tolerance: float | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """For every left row, attach the nearest right row at-or-before
    (``direction="backward"``) or at-or-after (``"forward"``) its ``on``
    timestamp, within the same ``by`` key(s).  Left rows with no match
    get nulls (LEFT-join semantics, like pandas.merge_asof).

    ``tolerance`` (seconds for timestamp columns, plain units for
    numeric ones) nulls out matches farther than the bound — applied
    AFTER the window, so it never changes which row is nearest.

    Right-side columns come back suffixed; the matched right timestamp
    is always available as ``{on}{suffix}``.  Ties among right rows with
    identical (key, timestamp) are broken by the later row in the
    window's total order (right rows with unique timestamps — the normal
    case — are deterministic)."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward/forward: {direction}")
    keys = [by] if isinstance(by, str) else list(by or [])
    on_type = dict(right.dtypes)[on]

    rcols = [c for c in right.columns if c != on and c not in keys]
    payload = F.struct(
        F.col(on).alias(f"{on}{suffix}"),
        *[F.col(c).alias(f"{c}{suffix}") for c in rcols],
    )
    r = right.select(
        *keys,
        F.col(on).alias("__t"),
        payload.alias("__p"),
        F.lit(0).alias("__side"),
    )
    payload_type = r.schema["__p"].dataType
    l = left.select(  # noqa: E741
        F.struct(*left.columns).alias("__row"),
        F.col(on).alias("__t"),
        *[F.col(k) for k in keys],
        F.lit(None).cast(payload_type).alias("__p"),
        F.lit(1).alias("__side"),
    )
    r = r.withColumn("__row", F.lit(None).cast(l.schema["__row"].dataType))
    u = l.unionByName(r)

    tcol = F.col("__t") if direction == "backward" else F.col("__t").desc()
    w = (
        Window.partitionBy(*keys)
        .orderBy(tcol, F.col("__side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = u.withColumn("__match", F.last("__p", ignorenulls=True).over(w))
    out = u.where(F.col("__side") == 1)

    if tolerance is not None:
        delta = F.abs(
            _epoch(F.col("__t"), on_type)
            - _epoch(F.col(f"__match.{on}{suffix}"), on_type)
        )
        out = out.withColumn(
            "__match",
            F.when(delta <= F.lit(float(tolerance)), F.col("__match")),
        )

    return out.select(
        *[F.col(f"__row.{c}").alias(c) for c in left.columns],
        F.col(f"__match.{on}{suffix}").alias(f"{on}{suffix}"),
        *[F.col(f"__match.{c}{suffix}").alias(f"{c}{suffix}") for c in rcols],
    )
