"""Cardinality sketching for corpus statistics at scale.

KMV (k-minimum-values) distinct-count sketch — Bar-Yossef et al.
(RANDOM 2002) / Beyer et al. (SIGMOD 2007 "distinct sampling"): hash
every value into a fixed universe, keep the k smallest DISTINCT hashes;
with U the universe size and h_k the k-th smallest kept hash, the
unbiased estimator is ``(k-1) * U / (h_k + 1)``.  When fewer than k
distinct hashes exist the sketch IS the exact distinct count.

Scale shape (why this instead of COUNT(DISTINCT) at 100 TB): the
exact distinct forces a full shuffle of every distinct value; the KMV
pipeline is a narrow hash projection + a PER-BATCH bounded-state prune
(each Arrow batch emits at most k rows, independent of batch size) + an
exact distinct/top-k over the O(k · n_batches) survivors — the wide
stage sees kilobytes.  Pruning never changes the answer: the global
k smallest distinct hashes survive any per-batch k-smallest prune, so
the result is a pure function of the value set (partitioning-proof,
exactly oracle-able).  Signatures from disjoint corpora merge by union
+ re-prune (the sketch is a bounded semilattice — the property that
makes it work as a partial aggregate).

The default hash is a multiplicative Knuth hash into 2^32 — overflow
free in BIGINT on both engines, so a SQL oracle can replay it exactly;
production deployments over arbitrary strings should swap in
``F.xxhash64`` (documented trade: that choice is not SQL-replayable).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["kmv_hash", "kmv_distinct"]

_U = 1 << 32  # hash universe


def kmv_hash(col: Column) -> Column:
    """Knuth multiplicative hash of a non-negative integer column into
    [0, 2^32): ``(x * 2654435761 + 104729) mod 2^32``.  All intermediate
    values fit in a signed 64-bit integer for x < 2^31, so the identical
    expression runs overflow-free in Spark AND DuckDB BIGINT.

    Round-6 (advisor note): the reduction is ``pmod`` so a negative input
    still lands in [0, 2^32) instead of silently producing a negative
    "hash" (Spark's ``%`` keeps the dividend sign; non-negative inputs are
    unchanged).  Inputs >= 2^31 overflow the long multiply — under ANSI
    mode that is a loud runtime error, the documented domain boundary."""
    return F.pmod(col.cast("long") * F.lit(2654435761) + F.lit(104729),
                  F.lit(_U))


def kmv_distinct(
    df: DataFrame,
    col: str,
    k: int = 64,
    hash_col: Column | None = None,
) -> DataFrame:
    """KMV distinct-count sketch of ``df[col]``.

    Returns ONE row: ``(n_kept, kth_hash, estimate)`` where n_kept =
    min(k, true distinct), kth_hash = the largest kept hash, and
    estimate = ``(k-1)*2^32/(kth_hash+1)`` (or exactly n_kept when the
    value set is smaller than k).  The estimate is one IEEE division of
    exact integers — bit-deterministic across engines.
    """
    if k < 2:
        raise ValueError("k must be >= 2")
    h = kmv_hash(F.col(col)) if hash_col is None else hash_col
    hashed = df.select(h.alias("__h"))

    def prune(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # bounded state: each Arrow batch emits its k smallest distinct
        # hashes — at most k rows out per batch regardless of batch size
        for pdf in batches:
            u = pdf["__h"].drop_duplicates().nsmallest(k)
            yield pd.DataFrame({"__h": u})

    pruned = hashed.mapInPandas(prune, schema=T.StructType(
        [T.StructField("__h", T.LongType())]))
    mins = pruned.distinct().orderBy("__h").limit(k)
    return mins.agg(
        F.count(F.lit(1)).cast("int").alias("n_kept"),
        F.max("__h").alias("kth_hash"),
    ).select(
        "n_kept",
        "kth_hash",
        F.when(
            F.col("n_kept") < k, F.col("n_kept").cast("double")
        ).otherwise(
            F.lit(float(k - 1)) * F.lit(float(_U))
            / (F.col("kth_hash") + F.lit(1)).cast("double")
        ).alias("estimate"),
    )


def kmv_merge_estimate(signatures: DataFrame, k: int) -> DataFrame:
    """Merge per-shard/per-partition KMV signatures (``sig`` =
    array<long> of each shard's k smallest distinct hashes) into the
    global sketch row ``(n_kept, kth_hash, estimate)`` — union the
    signatures, re-prune to the k global minima, apply the estimator.
    This IS the KMV semilattice merge, and the reason the sketch works
    as a partial aggregate / streaming state."""
    mins = (
        signatures.select(F.explode("sig").alias("__h"))
        .distinct().orderBy("__h").limit(k)
    )
    return mins.agg(
        F.count(F.lit(1)).cast("int").alias("n_kept"),
        F.max("__h").alias("kth_hash"),
    ).select(
        "n_kept",
        "kth_hash",
        F.when(
            F.col("n_kept") < k, F.col("n_kept").cast("double")
        ).otherwise(
            F.lit(float(k - 1)) * F.lit(float(_U))
            / (F.col("kth_hash") + F.lit(1)).cast("double")
        ).alias("estimate"),
    )
