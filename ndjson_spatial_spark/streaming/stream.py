"""Structured Streaming surface.

The reference has NO streaming semantics (SURVEY §2.7) — its "streams" are
Unix pipes.  The engine nevertheless exposes the operators that make sense
over unbounded input as Structured Streaming transforms, because the target
deployment (continuous document ingestion at 10^12-doc scale) is a stream:

  - streaming_filter / streaming_pick_field: stateless, identical Columns
    as the batch operators (the same compiled expression works on a
    streaming DataFrame);
  - streaming_geometry_extract: the documents-table span explode + parse —
    stateless, so watermark-free;
  - streaming_cell_counts: event-time windowed aggregation of geometry
    cells with late-data watermarking — the streaming analogue of the tile
    rollup.

Everything returns an unstarted streaming DataFrame; callers attach
writeStream with their sink + checkpoint dir.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..expr import compile_filter, selector_column, selector_output_name
from ..functions.cells_fn import st_cell_of_point
from ..functions.geo import parse_geojson, st_centroid
from ..sources.documents import DOCS_SCHEMA

__all__ = [
    "read_documents_stream",
    "streaming_filter",
    "streaming_pick_field",
    "streaming_geometry_extract",
    "streaming_cell_counts",
    "streaming_dedup_first_seen",
    "streaming_sessionize",
    "streaming_spatial_tag",
]


def read_documents_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 16
) -> DataFrame:
    """File-source stream of interleaved documents (parquet drops into
    `path`); schema pinned to the input_hint shape + an event_time column
    if present in the files."""
    return (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def streaming_filter(sdf: DataFrame, expression: str) -> DataFrame:
    """Stateless: the batch expression compiler output is a plain Column, so
    it applies to a streaming plan unchanged."""
    return sdf.filter(compile_filter(expression))


def streaming_pick_field(sdf: DataFrame, selector: str) -> DataFrame:
    name = selector_output_name(selector)
    return sdf.select(selector_column(selector).alias(name)).where(
        F.col(name).isNotNull()
    )


def streaming_geometry_extract(sdf: DataFrame) -> DataFrame:
    """documents stream -> geometry stream (doc_id, offset, geom).
    Stateless explode+parse; span-sequence invariant untouched upstream."""
    return (
        sdf.select("doc_id", F.explode("spans").alias("span"))
        .where(F.col("span.kind") == "geometry")
        .select(
            "doc_id",
            F.col("span.offset").alias("offset"),
            parse_geojson(F.col("span.text")).alias("geom"),
        )
    )


def streaming_dedup_first_seen(
    sdf: DataFrame,
    key_col: str = "doc_id",
    ttl_minutes: int | None = None,
) -> DataFrame:
    """Custom STATEFUL operator via applyInPandasWithState: emit only the
    FIRST row seen per key across the whole stream — streaming exact dedup,
    the continuous-ingestion analogue of `exact_dedup` for a training-data
    pipeline that must not admit re-crawled documents twice.

    State per key is one boolean.  With `ttl_minutes` set, a
    processing-time timeout expires idle keys so unbounded key spaces keep
    bounded state (late re-arrivals after the TTL count as fresh — size it
    to the re-crawl horizon); note registered timers make the engine
    schedule periodic no-data cleanup batches, which is normal for a
    continuous deployment but means a finite/backfill run never
    terminates — pass None (the default) there.  Output mode: append.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout
    from pyspark.sql import types as T

    out_schema = sdf.schema
    state_schema = T.StructType([T.StructField("seen", T.BooleanType())])
    ttl_ms = None if ttl_minutes is None else ttl_minutes * 60 * 1000

    def dedup_fn(key, pdf_iter, state):
        if state.hasTimedOut:
            state.remove()
            return
        first_time = not state.exists
        state.update((True,))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        emitted = not first_time
        # ALWAYS drain the batch iterator: returning early leaves the JVM
        # side blocked writing remaining Arrow batches (deadlock)
        for pdf in pdf_iter:
            if not emitted and len(pdf) > 0:
                yield pdf.iloc[:1]
                emitted = True

    timeout = (GroupStateTimeout.NoTimeout if ttl_ms is None
               else GroupStateTimeout.ProcessingTimeTimeout)
    return sdf.groupBy(key_col).applyInPandasWithState(
        dedup_fn, out_schema, state_schema, "append", timeout,
    )


def streaming_spatial_tag(
    geoms: DataFrame,
    ref: DataFrame,
    geom_col: str = "geom",
    res: int | None = None,
    **kwargs,
) -> DataFrame:
    """STREAM-STATIC spatial intersection join: tag a continuous geometry
    stream against a static (broadcast) reference table — the streaming
    form of the engine's core operator (continuous ingestion enriched
    against administrative boundaries).

    Structured Streaming executes inner stream-static joins statelessly
    per micro-batch, so the full candidates->refinement plan
    (cell-term explode -> broadcast equi-join -> min-common-term dedup ->
    exact overlay) applies unchanged and needs no watermark; results are
    exactly the batch operator's output over the union of micro-batches
    (oracle-gated in __spark_entry__.streaming_spatial)."""
    from ..operators.spatial import spatial_intersection_join

    return spatial_intersection_join(
        geoms, ref, geom_col=geom_col, res=res, broadcast_ref=True, **kwargs
    )


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str = "l_ts",
    right_ts: str = "r_ts",
    horizon: str = "30 minutes",
    watermark: str = "10 minutes",
    how: str = "inner",
) -> DataFrame:
    """STREAM-STREAM event-time interval join: pair every left event with
    the right-stream events of the same key whose timestamp falls in
    ``[left_ts, left_ts + horizon]`` — the attribution-window join
    (impression->click, view->purchase) that needs BOTH sides buffered.

    The production mechanics this encodes (Structured Streaming's
    stream-stream join contract): each side carries a watermark, and the
    time-RANGE predicate is what lets the engine compute how long a
    buffered row can still find partners — left rows expire
    ``horizon + watermark`` after their event time, right rows
    ``watermark`` after theirs, so state is bounded at any scale instead
    of growing with the stream.  Without the range condition Spark must
    keep every row forever (it warns and the job eventually OOMs).

    Column names of the two inputs must be disjoint (rename upstream —
    the engine convention that keeps the joined schema unambiguous).
    ``how='leftOuter'`` emits unmatched left rows (null right) only when
    state eviction runs, which Spark performs while processing LATER
    micro-batches — on a finite availableNow replay the last windows'
    nulls are therefore never flushed on their own (verified
    empirically; a continuous stream flushes them as data keeps
    arriving).  Round-5: to get the FULL leftOuter contract from a
    finite replay, append sentinel tail rows (``append_sentinel_file``)
    on BOTH sides timestamped past every real row's expiry
    (``max_ts + horizon + watermark`` plus margin) under keys no real
    row uses, then filter the sentinel keys from the output — the
    sentinel batches advance the watermark and run the eviction that
    emits the null-side rows (gated end-to-end by
    ``streaming_join_outer``).  PITFALL (root-caused): the sentinel-key
    filter must run on the SINK output, not inside the streaming plan —
    Catalyst propagates it through the join equality to both file scans
    and the parquet row-group stats then prune the sentinel file itself,
    so the watermark never advances.  Inner join output is complete on
    finite replays without sentinels.

    Pitfall (debugged, pinned in test_scale_discipline): Spark's
    stateful late-row filter drops input rows with event time <= the
    current watermark, and the INITIAL watermark is epoch 0 — so a row
    timestamped exactly 1970-01-01T00:00:00 on a watermarked side is
    silently treated as late in the very first batch.  Synthetic
    second-offset test data must be shifted off epoch 0; real event
    times are unaffected.
    """
    dup = set(left.columns) & set(right.columns)
    if dup:
        raise ValueError(f"column names must be disjoint, got {sorted(dup)}")
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    cond = (
        (F.col(left_key) == F.col(right_key))
        & (F.col(right_ts) >= F.col(left_ts))
        & (F.col(right_ts) <= F.col(left_ts) + F.expr(f"INTERVAL {horizon}"))
    )
    return lw.join(rw, cond, how)


def append_sentinel_file(spark, src_dir: str, df: DataFrame,
                         mtime: float) -> None:
    """Write `df` (sentinel tail rows) as one extra parquet file inside a
    file-source stage directory, with an mtime AFTER every existing file
    so FileStreamSource replays it last (the source orders files by
    modification time).  Used to flush watermark-gated state — leftOuter
    null rows, final session timeouts — from finite availableNow
    replays; see stream_stream_interval_join."""
    import glob
    import os
    import shutil
    import tempfile

    tmp = tempfile.mkdtemp(prefix="sentinel_")
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = next(p for p in sorted(os.listdir(tmp)) if p.startswith("part-"))
    k = len(glob.glob(os.path.join(src_dir, "part-*")))
    dst = os.path.join(src_dir, f"part-{90000 + k}-sentinel.parquet")
    shutil.copyfile(os.path.join(tmp, part), dst)
    os.utime(dst, (mtime, mtime))
    shutil.rmtree(tmp, ignore_errors=True)


def streaming_cell_counts(
    geoms: DataFrame,
    res: int,
    event_time_col: str = "event_time",
    window: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Windowed per-cell geometry counts with late-data watermarking — the
    streaming tile rollup.  Geometry is reduced to its centroid cell (one
    cell per doc keeps state bounded; full covers would multiply state)."""
    pts = geoms.withColumn("__c", st_centroid(F.col("geom")))
    cells = pts.withColumn(
        "cell",
        st_cell_of_point(
            F.element_at("__c.x", 1), F.element_at("__c.y", 1), res
        ),
    )
    return (
        cells.withWatermark(event_time_col, watermark)
        .groupBy(F.window(F.col(event_time_col), window).alias("w"), "cell")
        .agg(F.count(F.lit(1)).alias("n_geoms"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "cell",
            "n_geoms",
        )
    )


def streaming_sessionize(
    sdf: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: float = 30.0,
    watermark: str = "10 minutes",
    value_col: str = "value",
) -> DataFrame:
    """STATEFUL streaming sessionization (round-4): the continuous form of
    `relational.sessionize` via applyInPandasWithState + EVENT-TIME
    timeout.  Per user, events fold into an open session held in state;
    a session EMITS when (a) a later event arrives past the gap (closing
    it in-batch) or (b) the event-time watermark passes session_end + gap
    (the timeout path — no later event can reopen it, so emission is
    exactly-once and append-mode safe).  Output columns match the batch
    operator (user, session_seq, n_events, value_sum, start_ts, end_ts);
    over a drained stream the emitted sessions are exactly the batch
    sessions whose close time the final watermark passed (late-data
    semantics pinned by tests).  State per user is one open session
    (5 scalars) — bounded regardless of stream length."""
    import pandas as pd
    from pyspark.sql import types as T
    from pyspark.sql.streaming.state import GroupStateTimeout

    # state keeps session bounds as INTEGER MICROSECONDS (exact — float
    # seconds cannot hold a ns-precision epoch in 53 bits)
    gap_us = int(round(float(gap_minutes) * 60.0 * 1_000_000))
    out_schema = T.StructType([
        T.StructField(user_col, sdf.schema[user_col].dataType),
        T.StructField("session_seq", T.IntegerType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("value_sum", T.DoubleType()),
        T.StructField("start_ts", T.TimestampType()),
        T.StructField("end_ts", T.TimestampType()),
    ])
    state_schema = T.StructType([
        T.StructField("seq", T.IntegerType()),
        T.StructField("start", T.LongType()),
        T.StructField("end", T.LongType()),
        T.StructField("n", T.LongType()),
        T.StructField("vsum", T.DoubleType()),
    ])

    def emit_df(key, closed):
        return pd.DataFrame({
            user_col: [key for _ in closed],
            "session_seq": [c[0] for c in closed],
            "n_events": [c[3] for c in closed],
            "value_sum": [round(c[4], 6) for c in closed],
            "start_ts": pd.to_datetime([c[1] for c in closed], unit="us"),
            "end_ts": pd.to_datetime([c[2] for c in closed], unit="us"),
        })

    def fn(key, pdf_iter, state):
        if state.hasTimedOut:
            seq, start, end, n, vsum = state.get
            # TOMBSTONE (seq, -1, ...): a later event of this user must
            # continue the session numbering, not restart at 1 — remove()
            # here would lose the count.  No new timeout: the tombstone is
            # 5 scalars per ever-seen user (add a processing-time TTL wrap
            # for truly unbounded user spaces).
            state.update((int(seq), -1, -1, 0, 0.0))
            yield emit_df(key[0], [(seq, start, end, n, vsum)])
            return
        parts = [p for p in pdf_iter]          # ALWAYS drain (Arrow)
        pdf = pd.concat(parts) if parts else pd.DataFrame()
        closed = []
        cur = list(state.get) if state.exists else None
        base = 0
        if cur is not None and cur[1] == -1:   # tombstone: closed earlier
            base = cur[0]
            cur = None
        if len(pdf):
            pdf = pdf.sort_values(ts_col)
            usecs = pdf[ts_col].astype("int64").to_numpy() // 1000
            vals = (pdf[value_col].astype(float).to_numpy()
                    if value_col in pdf.columns else [0.0] * len(pdf))
            for t, v in zip(usecs, vals):
                if cur is None:
                    cur = [base + 1, t, t, 1, float(v)]
                elif t - cur[2] > gap_us:
                    closed.append(tuple(cur))
                    cur = [cur[0] + 1, t, t, 1, float(v)]
                else:
                    # min/max guards: a cross-batch straggler within the
                    # watermark tolerance may be OLDER than the open
                    # session's bounds — fold it without regressing them
                    cur[1] = min(cur[1], t)
                    cur[2] = max(cur[2], t)
                    cur[3] += 1
                    cur[4] += float(v)
        if cur is not None:
            close_ms = int((cur[2] + gap_us) // 1000)
            wm = state.getCurrentWatermarkMs()
            if close_ms <= wm:
                # the watermark already passed end+gap (a burst of events
                # far apart inside ONE batch): the session is closeable NOW
                # — a timeout in the past would be rejected by the engine
                closed.append(tuple(cur))
                state.update((int(cur[0]), -1, -1, 0, 0.0))
            else:
                state.update((int(cur[0]), int(cur[1]), int(cur[2]),
                              int(cur[3]), float(cur[4])))
                # close when the watermark passes end + gap (ms epoch)
                state.setTimeoutTimestamp(close_ms)
        if closed:
            yield emit_df(key[0], closed)

    return (
        sdf.withWatermark(ts_col, watermark)
        .groupBy(user_col)
        .applyInPandasWithState(
            fn, out_schema, state_schema, "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )


def streaming_kmv_distinct(
    sdf: DataFrame,
    col: str,
    k: int = 64,
    shards: int = 1,
) -> DataFrame:
    """Running KMV distinct-count sketch over a stream (round-5; the
    continuous analogue of operators/sketch.kmv_distinct): per hash-shard,
    a stateful group holds the k smallest distinct hashes seen so far —
    bounded state of k longs per shard — and every micro-batch emits the
    shard's updated signature.  Because the sketch is a bounded
    semilattice (merge = union + re-prune), the final emitted signatures
    after a finite replay equal the batch sketch over the same data
    REGARDLESS of micro-batch boundaries — exactly oracle-able.

    Sharding: keys are ``hash % shards``, so shards partition the hash
    space and the global k-minimum set is recovered by unioning the
    shard signatures and re-pruning (operators/sketch.kmv_merge_estimate)
    — at scale this spreads the state update across `shards` tasks
    instead of funnelling every row through one.

    Output rows: ``(shard, seq, sig)`` where seq increments per emitted
    batch (take each shard's max-seq row as its latest signature).
    """
    import pandas as pd
    from pyspark.sql import types as T
    from pyspark.sql.streaming.state import GroupStateTimeout

    from ..operators.sketch import kmv_hash

    hashed = sdf.select(kmv_hash(F.col(col)).alias("__h")).select(
        (F.col("__h") % shards).alias("shard"), "__h")
    out_schema = T.StructType([
        T.StructField("shard", T.LongType()),
        T.StructField("seq", T.LongType()),
        T.StructField("sig", T.ArrayType(T.LongType())),
    ])
    state_schema = T.StructType([
        T.StructField("sig", T.ArrayType(T.LongType())),
        T.StructField("seq", T.LongType()),
    ])

    def fn(key, pdf_iter, state):
        if state.exists:
            sig, seq = state.get
            cur = set(sig)
        else:
            cur, seq = set(), 0
        for pdf in pdf_iter:
            cur.update(int(v) for v in pdf["__h"])
        kept = sorted(cur)[:k]
        seq += 1
        state.update((kept, seq))
        yield pd.DataFrame({"shard": [key[0]], "seq": [seq],
                            "sig": [kept]})

    return hashed.groupBy("shard").applyInPandasWithState(
        fn, out_schema, state_schema, "update",
        GroupStateTimeout.NoTimeout,
    )


def streaming_heavy_hitters(
    sdf: DataFrame,
    col: str,
    capacity: int = 64,
    shards: int = 1,
) -> DataFrame:
    """Streaming heavy hitters via Misra-Gries summaries (Misra & Gries
    1982; merge rule per Agarwal et al. PODS'12): per value-shard, a
    stateful group holds at most ``capacity`` (value, count) counters —
    bounded state regardless of stream length.  Each micro-batch folds
    its local counts in, then applies the MG reduction (subtract the
    (capacity+1)-th largest count from all, drop non-positive), which is
    a deterministic function of the value MULTISET — batch boundaries
    and arrival order cannot change the result.

    Guarantee: reported count is a lower bound within n/(capacity+1) of
    the true count; every value with true count above that threshold is
    present.  In the EXACT regime (capacity >= distinct values per
    shard) no reduction ever fires and the counts are exact — the
    gate's oracle-able configuration.

    Output rows: ``(shard, seq, keys, counts)``; take each shard's
    max-seq row and merge with ``heavy_hitters_merge``.
    """
    import pandas as pd
    from pyspark.sql import types as T
    from pyspark.sql.streaming.state import GroupStateTimeout

    hashed = sdf.select(F.col(col).cast("long").alias("__v")).select(
        (F.pmod(F.col("__v"), F.lit(shards))).alias("shard"), "__v")
    out_schema = T.StructType([
        T.StructField("shard", T.LongType()),
        T.StructField("seq", T.LongType()),
        T.StructField("keys", T.ArrayType(T.LongType())),
        T.StructField("counts", T.ArrayType(T.LongType())),
    ])
    state_schema = T.StructType([
        T.StructField("keys", T.ArrayType(T.LongType())),
        T.StructField("counts", T.ArrayType(T.LongType())),
        T.StructField("seq", T.LongType()),
    ])

    def fn(key, pdf_iter, state):
        if state.exists:
            ks, cs, seq = state.get
            d = dict(zip(ks, cs))
        else:
            d, seq = {}, 0
        for pdf in pdf_iter:
            for v, c in pdf["__v"].value_counts().items():
                d[int(v)] = d.get(int(v), 0) + int(c)
        if len(d) > capacity:
            thr = sorted(d.values(), reverse=True)[capacity]
            d = {k: v - thr for k, v in d.items() if v - thr > 0}
        seq += 1
        keys = sorted(d)
        counts = [d[k] for k in keys]
        state.update((keys, counts, seq))
        yield pd.DataFrame({"shard": [key[0]], "seq": [seq],
                            "keys": [keys], "counts": [counts]})

    return hashed.groupBy("shard").applyInPandasWithState(
        fn, out_schema, state_schema, "update",
        GroupStateTimeout.NoTimeout,
    )


def heavy_hitters_merge(latest: DataFrame) -> DataFrame:
    """Merge per-shard Misra-Gries summaries (each shard's max-seq row)
    into (value, count) rows.  Value-sharding makes shard key spaces
    disjoint, so the merge is a concatenation."""
    return latest.select(
        F.explode(F.arrays_zip("keys", "counts")).alias("kc")
    ).select(
        F.col("kc")["keys"].alias("value"),
        F.col("kc")["counts"].alias("cnt"),
    )
