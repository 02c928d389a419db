"""Sources & sinks: NDJSON / GeoJSON / CSV ingestion and emission.

Reference counterparts (SURVEY §2.1):
  S1 `ndjson from-json <sel>`        -> from_json_split
  S2 `ndjson-spatial from-geojson`   -> from_geojson
  S3 `ndjson-spatial to-geojson`     -> to_geojson
  S4 `ndjson from-csv [delimiter]`   -> from_csv
  S7 line readers                    -> read_ndjson

The reference SAX-streams giant JSON files single-threaded
(ndjson-common/src/from.rs:24-46); the engine instead reads distributed —
text lines for NDJSON (splittable, scales linearly with executors) and
multiLine JSON + explode for whole-document arrays (one file = one task, so
callers at 100 TB pre-shard giant arrays; NDJSON is the scale path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["read_ndjson", "from_json_split", "from_geojson", "to_geojson",
           "from_csv", "write_ndjson"]


def read_ndjson(
    spark: SparkSession,
    path: str,
    schema=None,
    keep_corrupt: bool = False,
) -> DataFrame:
    """NDJSON -> DataFrame (reference readers ndjson-common/src/ndjson.rs:88-135).

    Reference quirks honored: a trailing comma on a line is stripped
    (ndjson.rs:117-122) and blank lines are skipped (the reference HALTS at
    the first empty line, ndjson.rs:114-116 — a pipe artifact; distributed
    reads have no line order, so the engine skips instead and documents the
    divergence).  Malformed lines: reference errors per-line; engine uses
    PERMISSIVE mode with `_corrupt_record` so bad rows are countable lineage
    instead of job failures.
    """
    lines = (
        spark.read.text(path)
        .where(F.trim(F.col("value")) != "")
        .select(F.regexp_replace(F.col("value"), r",\s*$", "").alias("value"))
    )
    reader_opts = {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt_record"}
    if schema is not None:
        df = lines.select(
            F.from_json(F.col("value"), schema, reader_opts).alias("j"), "value"
        )
        out = df.select("j.*")
        if keep_corrupt:
            out = df.select("j.*", F.col("value").alias("_raw"))
        return out
    # no schema: sample-infer via the JSON datasource on the cleaned lines
    rdd = lines.rdd.map(lambda r: r.value)
    return spark.read.json(rdd)


def from_json_split(
    spark: SparkSession, path: str, selector: str = None
) -> DataFrame:
    """S1 `ndjson from-json d.<sel>`: one huge JSON document -> one row per
    element of the array under the selector (ndjson/src/from_json.rs:21-29,
    generic_split ndjson-common/src/from.rs:24-46).

    selector accepts the reference's full selector grammar
    (ndjson-common/src/json_selector_parser.rs:216-243): a dotted path
    below the root ("features", "d.a.b") or an INDEXED path ("d[5].x",
    "d.a[2].b").  None/''/'d' means the root itself is the array (Spark's
    multiLine JSON reader already yields one row per root-array element).
    Indexed paths navigate the raw document with a JVM-side JsonPath
    extraction (one task per file, like the reference's single-threaded
    SAX pass); plain paths stay on the columnar fast path.
    """
    if selector in (None, "", "d"):
        # root array: the multiLine reader splits it natively
        return spark.read.option("multiLine", "true").json(path)

    sel = selector[2:] if selector.startswith("d.") else selector
    if "[" in selector or selector.startswith("d["):
        from ..expr import parse_selector

        steps = parse_selector(
            selector if selector.startswith("d") else f"d.{selector}"
        ).steps
        jpath = "$" + "".join(
            f".{v}" if kind == "key" else f"[{v}]" for kind, v in steps
        )
        raw = spark.read.option("wholetext", "true").text(path)
        arr = F.get_json_object(F.col("value"), jpath)
        sample = raw.select(arr.alias("a")).limit(1).collect()[0]["a"]
        if sample is None:
            raise ValueError(f"selector {selector!r} matches nothing in {path}")
        elem_schema = spark.read.json(
            spark.sparkContext.parallelize([sample])
        ).schema
        from pyspark.sql import types as T

        return (
            raw.select(F.explode(
                F.from_json(arr, T.ArrayType(elem_schema))
            ).alias("element"))
            .select("element.*")
        )

    df = spark.read.option("multiLine", "true").json(path)
    return df.select(F.explode(F.col(sel)).alias("element")).select("element.*")


def from_geojson(spark: SparkSession, path: str) -> DataFrame:
    """S2 `ndjson-spatial from-geojson`: FeatureCollection -> one Feature per
    row — from_json_split with the selector fixed to `features`
    (ndjson-spatial/src/from_geojson.rs:21-28, selector at :25)."""
    return from_json_split(spark, path, "features")


def to_geojson(df: DataFrame, feature_cols: list[str] | None = None) -> DataFrame:
    """S3 `ndjson-spatial to-geojson`: collect ALL rows into one
    FeatureCollection (bbox omitted, ndjson-spatial/src/to_geojson.rs:21-51).

    Returns a 1-row DataFrame with a `geojson` string column.  Inherently a
    global gather (the reference materializes everything in memory too,
    to_geojson.rs:22-38); at scale emit NDJSON instead (write_ndjson).
    """
    cols = feature_cols or df.columns
    rows = df.select(F.to_json(F.struct(*[F.col(c) for c in cols])).alias("f"))
    return rows.agg(
        F.concat(
            F.lit('{"type":"FeatureCollection","features":['),
            F.concat_ws(",", F.collect_list("f")),
            F.lit("]}"),
        ).alias("geojson")
    )


def from_csv(
    spark: SparkSession, path: str, delimiter: str = ","
) -> DataFrame:
    """S4 `ndjson from-csv` (ndjson/src/from_csv.rs:6-44).

    Header-derived keys + the REFERENCE's inference cascade with exact
    round-trip guards (int -> float -> empty->null -> bool -> string,
    ndjson-common/src/infer_json.rs:3-26): '01' must stay a string (casting
    back would yield '1'), '1.0' becomes float.  The reference infers
    per-CELL; a typed column can't mix types, so the engine lifts the rule
    to per-column (a column is int iff every non-empty cell round-trips as
    int, etc.) — identical on homogeneous fixture columns.

    Cost model: one extra Catalyst aggregation pass over the file to decide
    types (any schema inference pays a scan); all conformity checks are
    JVM-side expressions, no Python.
    """
    raw = (
        spark.read.option("header", "true")
        .option("delimiter", delimiter)
        .csv(path)  # all columns as strings
    )
    checks = []
    for c in raw.columns:
        s = F.col(c)
        nonempty = s.isNotNull() & (s != "")
        int_ok = F.bool_and(
            ~nonempty | (s.try_cast("bigint").isNotNull()
                         & (s.try_cast("bigint").cast("string") == s))
        ).alias(f"{c}__int")
        # float round-trip guard is numeric-equality (the reference accepts
        # any f64 parse; '1.0' -> 1.0), so just parseability:
        float_ok = F.bool_and(
            ~nonempty | s.try_cast("double").isNotNull()
        ).alias(f"{c}__float")
        bool_ok = F.bool_and(~nonempty | s.isin("true", "false")).alias(f"{c}__bool")
        checks.extend([int_ok, float_ok, bool_ok])
    flags = raw.agg(*checks).collect()[0].asDict()
    out_cols = []
    for c in raw.columns:
        s = F.when(F.col(c) == "", None).otherwise(F.col(c))
        if flags[f"{c}__int"]:
            out_cols.append(s.cast("bigint").alias(c))
        elif flags[f"{c}__float"]:
            out_cols.append(s.cast("double").alias(c))
        elif flags[f"{c}__bool"]:
            out_cols.append(s.cast("boolean").alias(c))
        else:
            out_cols.append(s.alias(c))
    return raw.select(*out_cols)


def write_ndjson(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """NDJSON sink: one JSON object per line, distributed (no single-file
    collect).  The scale-safe inverse of read_ndjson."""
    df.write.mode(mode).json(path)
