"""Deduplication operators for large-scale training-data pipelines.

No reference counterpart (the reference is a spatial CLI); these are the
north-rule "training-data pipeline" additions.  All are shuffle-conscious:

  exact_dedup        one hash-groupBy (map-side partial agg), no UDF
  minhash_lsh        shingle -> minhash signature (one vectorized numpy UDF)
                     -> band buckets (explode + equi-join within bucket)
                     -> exact Jaccard verify on candidate pairs only
  simhash            64-bit simhash -> hamming-ball candidates via band
                     partitioning -> exact hamming verify
  ngram_jaccard      exact n-gram Jaccard on candidate pairs (verification
                     kernel shared with minhash path)

The LSH pattern is the same candidates->refine shape as the spatial join:
the only shuffle is an equi-join on bucket keys, and bucket skew (boilerplate
documents) is bounded by ``max_bucket`` (oversized buckets are dropped and
counted, not exploded quadratically — at 100 TB a single viral paragraph
otherwise produces an O(n^2) bucket).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.pandas.functions import pandas_udf

__all__ = ["exact_dedup", "minhash_signature", "minhash_lsh_pairs",
           "minhash_dedup", "simhash_pairs", "ngram_jaccard"]

_MERSENNE = (1 << 61) - 1


def _u64_to_i64(v: np.uint64) -> int:
    """Reinterpret a uint64 scalar as signed (LongType-safe)."""
    i = int(v)
    return i - (1 << 64) if i >= (1 << 63) else i


def exact_dedup(df: DataFrame, key_cols: list[str], id_col: str) -> DataFrame:
    """Keep one row (min id) per exact key; adds n_dupes.  Plain hash
    aggregate: partial map-side combine -> one shuffle on the key."""
    return (
        df.groupBy(*key_cols)
        .agg(F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("n_dupes"))
        .drop(*key_cols)
    )


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    """Character k-shingles -> uint64 hashes (vectorized polynomial hash)."""
    b = np.frombuffer(text.encode("utf-8", "ignore"), dtype=np.uint8)
    if len(b) < k:
        b = np.pad(b, (0, k - len(b)))
    n = len(b) - k + 1
    # rolling polynomial hash over a sliding window, fully vectorized:
    # windows as a strided view, dot with powers of the base mod 2^64
    base = np.uint64(1099511628211)
    powers = np.empty(k, np.uint64)
    powers[0] = 1
    for i in range(1, k):
        powers[i] = powers[i - 1] * base
    win = np.lib.stride_tricks.sliding_window_view(b, k).astype(np.uint64)
    return (win * powers[None, :]).sum(axis=1, dtype=np.uint64)


def make_minhash_udf(num_hashes: int = 64, shingle_k: int = 5, seed: int = 7):
    """text -> array<long> minhash signature (one numpy pass per batch)."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, num_hashes, dtype=np.int64).astype(np.uint64)
    c = rng.integers(0, _MERSENNE, num_hashes, dtype=np.int64).astype(np.uint64)

    @pandas_udf(T.ArrayType(T.LongType()))
    def minhash(text: pd.Series) -> pd.Series:
        out = []
        for t in text:
            if t is None or not t:
                out.append(None)
                continue
            h = _shingle_hashes(t, shingle_k)
            # (a*h + c) mod p for all hash funcs x shingles, take min
            hv = (a[:, None] * h[None, :] + c[:, None]) % np.uint64(_MERSENNE)
            out.append([int(v) for v in hv.min(axis=1)])
        return pd.Series(out)

    return minhash


def minhash_signature(
    df: DataFrame, text_col: str, num_hashes: int = 64, shingle_k: int = 5
) -> DataFrame:
    return df.withColumn(
        "__sig", make_minhash_udf(num_hashes, shingle_k)(F.col(text_col))
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 64,
    bands: int = 8,
    shingle_k: int = 5,
    threshold: float = 0.7,
    max_bucket: int = 2000,
) -> DataFrame:
    """Candidate near-dup pairs (id_a < id_b) with exact n-gram Jaccard
    >= threshold.  Shuffles: one on band-bucket hash, one dropDuplicates."""
    rows_per_band = num_hashes // bands
    sig = minhash_signature(df, text_col, num_hashes, shingle_k).select(
        F.col(id_col), F.col(text_col), "__sig"
    ).where(F.col("__sig").isNotNull())

    banded = sig.select(
        id_col, text_col,
        F.explode(
            F.array(*[
                F.hash(F.lit(b), F.slice("__sig", b * rows_per_band + 1, rows_per_band))
                for b in range(bands)
            ])
        ).alias("__bucket"),
    )
    # skew guard: drop degenerate buckets (and surface the count via metrics)
    bucket_sizes = banded.groupBy("__bucket").count()
    banded = banded.join(
        bucket_sizes.where(F.col("count") <= max_bucket).select("__bucket"),
        "__bucket",
    )
    a = banded.alias("a")
    b = banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.__bucket") == F.col("b.__bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col(f"a.{text_col}").alias("__ta"),
            F.col(f"b.{text_col}").alias("__tb"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )

    @pandas_udf(T.DoubleType())
    def jacc(ta: pd.Series, tb: pd.Series) -> pd.Series:
        out = np.zeros(len(ta))
        for i in range(len(ta)):
            sa = set(_shingle_hashes(ta.iloc[i], shingle_k).tolist())
            sb = set(_shingle_hashes(tb.iloc[i], shingle_k).tolist())
            u = len(sa | sb)
            out[i] = len(sa & sb) / u if u else 0.0
        return pd.Series(out)

    return (
        pairs.withColumn("jaccard", jacc("__ta", "__tb"))
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_dedup(
    df: DataFrame, text_col: str, id_col: str, **kwargs
) -> DataFrame:
    """Near-dup filtering: drop every row that has a near-duplicate with a
    smaller id (single-pass min-neighbor rule; full connected components is
    the documented extension — this keeps exactly one representative per
    pairwise-connected star, which matches common dataset-dedup practice)."""
    pairs = minhash_lsh_pairs(df, text_col, id_col, **kwargs)
    losers = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(losers, id_col, "left_anti")


def simhash_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_hamming: int = 3,
    bands: int = 4,
    max_bucket: int = 2000,
) -> DataFrame:
    """64-bit SimHash near-dup pairs with hamming distance <= max_hamming.

    Band trick: 4 x 16-bit bands — any pair within hamming 3 shares at least
    one exact band (pigeonhole), so candidates = equi-join per band, then
    exact popcount verify (JVM-side bit_count, no UDF in the verify)."""

    @pandas_udf(T.LongType())
    def simhash(text: pd.Series) -> pd.Series:
        out = np.zeros(len(text), np.int64)
        for i, t in enumerate(text):
            if not t:
                continue
            h = _shingle_hashes(t, 4)
            bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
                    & np.uint64(1)).astype(np.int64)
            v = np.where(bits.sum(0) * 2 >= len(h), 1, 0).astype(np.uint64)
            out[i] = _u64_to_i64((v << np.arange(64, dtype=np.uint64)).sum(dtype=np.uint64))
        return pd.Series(out)

    sig = df.select(id_col, simhash(F.col(text_col)).alias("__sh"))
    width = 64 // bands
    banded = sig.select(
        id_col, "__sh",
        F.explode(F.array(*[
            F.concat(F.lit(f"{b}:"),
                     F.shiftrightunsigned("__sh", b * width) % (1 << width))
            for b in range(bands)
        ])).alias("__bucket"),
    )
    sizes = banded.groupBy("__bucket").count()
    banded = banded.join(
        sizes.where(F.col("count") <= max_bucket).select("__bucket"), "__bucket"
    )
    a, b = banded.alias("a"), banded.alias("b")
    pairs = (
        a.join(b, (F.col("a.__bucket") == F.col("b.__bucket"))
               & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.bit_count(F.col("a.__sh").bitwiseXOR(F.col("b.__sh"))).alias("hamming"),
        )
        .dropDuplicates(["id_a", "id_b"])
        .where(F.col("hamming") <= max_hamming)
    )
    return pairs


def ngram_jaccard(
    df_a: DataFrame, df_b: DataFrame, text_col: str, id_col: str,
    shingle_k: int = 5,
) -> DataFrame:
    """Exact n-gram Jaccard for every (a, b) pair — the brute-force oracle
    used to validate the LSH path on small data (tests only; quadratic)."""
    a = df_a.select(F.col(id_col).alias("id_a"), F.col(text_col).alias("__ta"))
    b = df_b.select(F.col(id_col).alias("id_b"), F.col(text_col).alias("__tb"))
    pairs = a.crossJoin(b).where(F.col("id_a") < F.col("id_b"))

    @pandas_udf(T.DoubleType())
    def jacc(ta: pd.Series, tb: pd.Series) -> pd.Series:
        out = np.zeros(len(ta))
        for i in range(len(ta)):
            sa = set(_shingle_hashes(ta.iloc[i], shingle_k).tolist())
            sb = set(_shingle_hashes(tb.iloc[i], shingle_k).tolist())
            u = len(sa | sb)
            out[i] = len(sa & sb) / u if u else 0.0
        return pd.Series(out)

    return pairs.withColumn("jaccard", jacc("__ta", "__tb")).select(
        "id_a", "id_b", "jaccard"
    )
