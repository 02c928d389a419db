"""Relational operators: filter, pick-field, join, aggregate, sort.

Each operator reproduces the OBSERVABLE semantics of its reference
counterpart (file:line cited per function) while compiling to plain Catalyst
plans — predicate pushdown, partial aggregation, broadcast joins and AQE skew
handling all come for free because nothing here leaves the DataFrame API.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..expr import (
    compile_filter,
    parse_selector,
    selector_column,
    selector_output_name,
)

__all__ = ["ndjson_filter", "pick_field", "ndjson_join", "aggregate",
           "sort_rows", "variant_sort_key", "sort_rows_cross_type",
           "sessionize"]


def ndjson_filter(df: DataFrame, expression: str) -> DataFrame:
    """`ndjson filter <expr>` (ndjson/src/filter.rs:28-72).

    Keeps rows where `<selector> <cmp> <literal>` holds.  Missing/null fields
    and type mismatches drop the row (filter.rs:65-69,
    json_selector_parser.rs:103-161) — Spark's null-propagating comparisons
    give the same keep/drop set on typed columns.  The compiled predicate is
    a plain Column, so Catalyst pushes it into the scan.
    """
    return df.filter(compile_filter(expression))


def pick_field(df: DataFrame, selector: str) -> DataFrame:
    """`ndjson pick-field <sel>` (ndjson/src/pick_field.rs:24-44).

    Projects a single field; rows missing the field are silently skipped
    (pick_field.rs:33-40).  Column pruning reaches the scan (ReadSchema).
    """
    name = selector_output_name(selector)
    col = selector_column(selector)
    return df.select(col.alias(name)).where(F.col(name).isNotNull())


def ndjson_join(
    stream: DataFrame,
    ref: DataFrame,
    stream_fields: Sequence[str],
    ref_fields: Sequence[str],
    broadcast_ref: bool = True,
    variant_keys: bool = False,
) -> DataFrame:
    """`ndjson join --ref f --ref-fields .. --stream-fields ..`
    (ndjson/src/join.rs:28-106).

    Observable reference semantics reproduced:
      - inner equi-join, one output row per (stream row, matching ref row);
      - joins on the FIRST field pair only — the reference's per-field map
        build exhausts its reader after the first field, so passes 2..n see
        empty maps (join.rs:35-64 quirk, SURVEY §2.3 J3).  Composite AND-join
        is the documented extension (pass use_all_fields=True... we instead
        expose it by callers passing a 1-field list vs n-field list to
        Spark's on=[...] directly).
      - NULL stream keys never match (join.rs:82-85) — SQL semantics agree;
      - merged row = stream fields overwritten by ref fields on name
        collision (join.rs:88-97): ref takes precedence.

    The ref side is the reference's in-memory build side; `broadcast()` is
    the faithful scale analogue.  At 10^12 docs with a large ref side the
    planner falls back to a hash-partitioned shuffle join; hot-key salting
    lives in plans/salting.py.

    `variant_keys=True` (round-4, opt-in): the selected key columns are
    RAW JSON STRINGS (schema-on-read) and equality follows the reference's
    OrderedValue variant semantics (join.rs:108-137): `1` (PosInt) never
    equals `1.0` (Float) never equals `"1"` (String).  Implemented as
    equality on (variant rank, canonical serialization) of `parse_json`
    of each key — pure Catalyst, broadcast-join-compatible.  Null/missing
    stream keys still never match (join.rs:82-85).  Typed columns keep
    SQL equality (the engine's documented SURVEY §1.1 divergence).
    """
    s_sel = parse_selector(stream_fields[0])
    r_sel = parse_selector(ref_fields[0])
    s_key = selector_column(s_sel)
    r_key = selector_column(r_sel)

    ref_cols = set(ref.columns)
    stream_cols = set(stream.columns)
    overlap = stream_cols & ref_cols

    s = stream.alias("s")
    r = ref.alias("r")
    if broadcast_ref:
        r = F.broadcast(r)

    s_key_q = F.col("s." + ".".join(s_sel.field_names))
    r_key_q = F.col("r." + ".".join(r_sel.field_names))
    if variant_keys:
        sv = F.parse_json(s_key_q)
        rv = F.parse_json(r_key_q)
        s_rank = variant_sort_key(sv)["rank"]
        r_rank = variant_sort_key(rv)["rank"]
        s_can = F.try_variant_get(sv, "$", "string")
        r_can = F.try_variant_get(rv, "$", "string")
        cond = (s_rank == r_rank) & (s_can == r_can) & (s_rank != 5)
        joined = s.join(r, on=cond, how="inner")
    else:
        joined = s.join(r, on=s_key_q == r_key_q, how="inner")

    # column-level merge with REF precedence on collisions (join.rs:88-97)
    out_cols: list[Column] = []
    for c in stream.columns:
        if c in overlap:
            out_cols.append(F.col(f"r.{c}").alias(c))
        else:
            out_cols.append(F.col(f"s.{c}").alias(c))
    for c in ref.columns:
        if c not in overlap:
            out_cols.append(F.col(f"r.{c}").alias(c))
    return joined.select(*out_cols)


def aggregate(
    df: DataFrame,
    group_by: Sequence[str],
    agg: str,
    agg_selector: str,
) -> DataFrame:
    """`ndjson agg -g <sel...> -a <count|sum|min|max> <sel>`
    (ndjson/src/aggregate.rs:28-206).

    Output parity details:
      - group key columns named by joining selector segments with `_`
        (aggregate.rs:34-41): d.foo.bar -> foo_bar;
      - agg column named `<segments>_<agg>`: d.quz + sum -> quz_sum;
      - `count` counts ROWS in the group, not non-null values of the
        selector (aggregate.rs:59-74);
      - `sum` is always a FLOAT, non-numeric values filtered, empty -> 0.0
        (aggregate.rs:75-99, test expects 7.0 at :228-233);
      - `min`/`max` preserve the column's type (aggregate.rs:100-196);
      - output rows sorted ascending by group key — the reference
        sort-aggregates (aggregate.rs:43-49), so group order is key order.

    Catalyst plans this as partial hash-agg per partition -> shuffle on the
    group key -> final agg; the trailing orderBy is a separate range-
    partitioned sort for output parity (drop it for unordered consumers).
    """
    keys = [parse_selector(g) for g in group_by]
    key_cols = [selector_column(k).alias(selector_output_name(k)) for k in keys]
    key_names = [selector_output_name(k) for k in keys]
    val_sel = parse_selector(agg_selector)
    val_col = selector_column(val_sel)
    out_name = f"{selector_output_name(val_sel)}_{agg}"

    if agg == "count":
        agg_col = F.count(F.lit(1)).alias(out_name)
    elif agg == "sum":
        agg_col = F.coalesce(F.sum(val_col.cast("double")), F.lit(0.0)).alias(out_name)
    elif agg == "min":
        agg_col = F.min(val_col).alias(out_name)
    elif agg == "max":
        agg_col = F.max(val_col).alias(out_name)
    else:
        raise ValueError(f"unsupported aggregation: {agg}")

    out = df.groupBy(*key_cols).agg(agg_col)
    return out.orderBy(*[F.col(k).asc() for k in key_names])


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: float = 30.0,
    value_col: str | None = "value",
) -> DataFrame:
    """Gap-based sessionization of an event stream (engine extension — the
    telemetry/training-data companion to the windowed rollups): per user,
    a new session starts when the time since the previous event exceeds
    `gap_minutes`.  Pure Catalyst window functions — one shuffle on the
    user key, running-sum session ids, then a partial+final hash
    aggregate per (user, session).

    Output: user, session_seq (1-based), n_events, value_sum (rounded
    6dp — double addition order is non-deterministic across plans),
    start_ts, end_ts.  `value_col` names the summed measure; pass None
    (or a column absent from the frame) to skip the value_sum output so
    the operator works on any events-shaped table."""
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(ts_col)
    prev = F.lag(ts_col).over(w)

    def epoch(c):
        # NTZ timestamps don't cast to double directly; the tz shift of
        # the timestamp cast cancels in the difference
        return c.cast("timestamp").cast("double")

    brk = F.when(
        prev.isNull() | ((epoch(F.col(ts_col)) - epoch(prev))
                         > gap_minutes * 60.0),
        1,
    ).otherwise(0)
    sid = F.sum(brk).over(w)
    aggs = [F.count(F.lit(1)).alias("n_events")]
    if value_col is not None and value_col in df.columns:
        aggs.append(F.round(F.sum(value_col), 6).alias("value_sum"))
    aggs += [F.min(ts_col).alias("start_ts"), F.max(ts_col).alias("end_ts")]
    return (
        df.withColumn("__sid", sid)
        .groupBy(user_col, "__sid")
        .agg(*aggs)
        .withColumn("session_seq", F.col("__sid").cast("int"))
        .drop("__sid")
    )


def variant_sort_key(v) -> "F.Column":
    """The reference's OrderedValue TOTAL ORDER over mixed-type JSON values
    (ndjson/src/join.rs:108-123, the derived Rust enum order):

        String < Bool < Number < Null < Array < Object
        Number: PosInt < NegInt < Float   (join.rs:118-123 — ALL
        non-negative integers sort before ALL negative integers before
        ALL non-integer floats; a quirk of the derived variant order)

    The engine's typed columns deliberately don't reproduce this (SURVEY
    §1.1); this opt-in key emulates it faithfully for schema-on-read data
    via Spark 4 VariantType: `parse_json(raw)` preserves per-row types,
    `schema_of_variant` classifies them.  Returns a sortable struct
    (rank, skey, nkey):

      rank  0=String 1=Bool 2=PosInt 3=NegInt 4=Float 5=Null
            6=Array 7=Object  (serde_json: integer literals beyond int64
            surface as DECIMAL(p,0) and classify PosInt when >= 0, Float
            when below int64 min — matching as_u64/as_i64/as_f64 fallback)
      skey  the string value (strings), or canonical serialization
            (arrays/objects — a documented approximation of the
            reference's recursive element-wise order)
      nkey  numeric value as double (bools 0/1, numbers; >2^53 magnitudes
            compare approximately, documented)

    Sort with orderBy(key.rank, key.skey asc_nulls_first, key.nkey
    asc_nulls_first) — null subkey patterns are constant within a rank,
    so the flags never decide between a null and a value."""
    t = F.schema_of_variant(v)
    s = F.try_variant_get(v, "$", "string")
    lng = F.try_variant_get(v, "$", "long")
    d = F.try_variant_get(v, "$", "double")
    is_int = t == "BIGINT"
    is_dec0 = t.startswith("DECIMAL") & t.endswith(",0)")
    # parse_json normalizes "3.0" to DECIMAL(1,0) — but a DECIMAL(p,0)
    # whose value FITS int64 can only have come from a decimal-point
    # literal (plain integer literals parse as BIGINT), and serde parses
    # those as Float.  Beyond int64: non-negative up to u64 max is serde
    # PosInt; everything else falls to Float (as_u64/as_i64 both fail).
    beyond_i64 = (d < -9.223372036854776e18) | (d > 9.223372036854776e18)
    rank = (
        F.when(t == "STRING", 0)
        .when(t == "BOOLEAN", 1)
        .when((is_int & (lng >= 0))
              | (is_dec0 & beyond_i64 & (d >= 0)
                 & (d <= 1.8446744073709552e19)), 2)
        .when(is_int, 3)
        .when(t.startswith("DECIMAL") | t.isin("DOUBLE", "FLOAT"), 4)
        .when(t == "VOID", 5)
        .when(t.startswith("ARRAY"), 6)
        .otherwise(7)
    )
    skey = F.when(rank.isin(0, 6, 7), s)
    nkey = F.when(rank == 1, lng.cast("double")).when(rank.isin(2, 3, 4), d)
    return F.struct(rank.alias("rank"), skey.alias("skey"),
                    nkey.alias("nkey"))


def sort_rows_cross_type(df: DataFrame, json_col: str) -> DataFrame:
    """Stable sort by the OrderedValue order of a raw-JSON column — the
    schema-on-read form of `ndjson sort` on a mixed-type field.  Adds no
    output columns; Spark range-partitions the sort like sort_rows."""
    k = variant_sort_key(F.parse_json(F.col(json_col)))
    return df.orderBy(
        k["rank"].asc(), k["skey"].asc_nulls_first(),
        k["nkey"].asc_nulls_first(),
    )


def sort_rows(df: DataFrame, keys: Sequence[str]) -> DataFrame:
    """`ndjson sort -f d.x[:asc|:desc] ...` (ndjson/src/sort.rs:12-39).

    Multi-key stable sort; missing-field rows sort AFTER present rows when
    ascending (Rust's Ok < Err derived ordering, sort.rs:17-34) and BEFORE
    when descending (direction flip swaps operands) — i.e. nulls_last on
    asc, nulls_first on desc.  Spark executes this as a range-partitioned
    total sort (sampling-based partitioner), the distributed analogue of the
    reference's in-memory sort.
    """
    cols = []
    for k in keys:
        direction = "asc"
        base = k
        for suffix, d in ((":desc", "desc"), (":d", "desc"), (":asc", "asc"), (":a", "asc")):
            if k.endswith(suffix):
                base, direction = k[: -len(suffix)], d
                break
        c = selector_column(base)
        cols.append(c.asc_nulls_last() if direction == "asc" else c.desc_nulls_first())
    return df.orderBy(*cols)
