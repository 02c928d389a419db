"""Deterministic sampling operators for training-data pipelines.

Reproducibility is the point: a training-data sample must be a pure
function of the corpus (re-runnable, auditable, resumable), never of the
cluster layout or an RNG stream.  Both operators therefore key off a
CONTENT hash (default: the engine's document fingerprint,
operators/text.fingerprint) rather than ``rand()``:

  * ``stratified_sample`` — exact k docs per stratum (the smallest-hash
    k, ties broken by id), e.g. "200k docs per language".
  * ``mixture_sample`` — per-stratum hash-threshold downsampling to
    target mixture weights (the data-mixture rebalancing stage).
  * ``hash_threshold_sample`` — Bernoulli-style p-fraction keep via a
    hash threshold (the MOD-sharding idiom of web-corpus pipelines);
    membership of a document is stable across runs AND across corpus
    versions (adding documents never evicts previously kept ones).

Reference scope note: the reference engine (ndjson-spatial) has no
sampling stage; these are engine extensions under the training-data
mandate (SURVEY §2.7-class additions).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .text import fingerprint

__all__ = ["stratified_sample", "mixture_sample", "hash_threshold_sample"]

_HASH_COL = "__strat_hash"


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    k: int,
    hash_col: Column | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    prefilter_fraction: float | None = 0.02,
) -> DataFrame:
    """EXACT deterministic k-per-stratum sample: for every value of
    ``strata_col`` keep the ``k`` rows with the smallest
    ``(hash, id)`` — a pure function of the corpus (no RNG, no
    partitioning dependence).  Output = input columns + ``rank`` (1..k).

    Plan (the 100 TB shape): the naive plan is ONE shuffle on the
    stratum key feeding a window sort — but it shuffles the ENTIRE
    corpus to rank it.  This implementation prunes first with a
    provably-exact sample-derived threshold:

      1. sample ``prefilter_fraction`` of rows (map-side, no shuffle)
         and take the k-th smallest hash PER STRATUM of that sample
         (a tiny shuffle of the sample only);
      2. the k-th smallest of a SUBSET is >= the k-th smallest of the
         full stratum, so ``hash <= threshold`` can never drop a true
         top-k row — the prune is a correctness-preserving filter, not
         an approximation (strata with < k sampled rows get no filter);
      3. broadcast the per-stratum thresholds, filter map-side, then
         run the exact window rank on the ~k/fraction survivors.

    The wide exchange therefore carries O(k / fraction) rows per
    stratum instead of the whole corpus; the hash itself is computed
    map-side either way.  Pick ``prefilter_fraction`` so a stratum's
    expected sample count >> k (e.g. 100·k / min_stratum_rows); pass
    ``None`` to disable the prune (tiny inputs).
    """
    if k <= 0:
        raise ValueError("k must be positive")
    h = hash_col if hash_col is not None else fingerprint(F.col(text_col))
    hashed = df.withColumn(_HASH_COL, h)

    if prefilter_fraction:
        # round-6: sample the RAW frame and hash only the survivors — the
        # Bernoulli sample keys off (seed, partition, row position), not
        # the columns, so the selected rows are identical, but the content
        # hash (the expensive pandas UDF) runs over fraction*n rows in the
        # threshold branch instead of the whole corpus (guide §4: pass the
        # Python boundary as few rows as possible).
        sampled = df.sample(
            fraction=float(prefilter_fraction), seed=0x5EED
        ).withColumn(_HASH_COL, h)
        w_s = Window.partitionBy(strata_col).orderBy(_HASH_COL, id_col)
        thresholds = (
            sampled.withColumn("__rn", F.row_number().over(w_s))
            .where(F.col("__rn") == k)
            .select(F.col(strata_col).alias("__strat_key"),
                    F.col(_HASH_COL).alias("__strat_thresh"))
        )
        hashed = (
            hashed.join(
                F.broadcast(thresholds),
                hashed[strata_col] == F.col("__strat_key"),
                "left",
            )
            .where(F.col("__strat_thresh").isNull()
                   | (F.col(_HASH_COL) <= F.col("__strat_thresh")))
            .drop("__strat_key", "__strat_thresh")
        )

    w = Window.partitionBy(strata_col).orderBy(_HASH_COL, id_col)
    return (
        hashed.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .drop(_HASH_COL)
    )


def mixture_sample(
    df: DataFrame,
    strata_col: str,
    target_weights: dict,
    total: int,
    hash_col: Column | None = None,
    text_col: str = "text",
    modulus: int = 1_000_000,
) -> DataFrame:
    """Deterministic data-mixture rebalancing: downsample each stratum so
    the output approximates ``total`` rows distributed per
    ``target_weights`` (e.g. ``{"en": .5, "code": .3, "other": .2}``) —
    the mixture-weights stage of a training-data pipeline, made
    reproducible by hash-threshold membership instead of RNG.

    Per stratum s: keep_fraction = min(1, total*w_s / n_s) and a row
    survives iff its content-hash residue mod ``modulus`` falls under
    keep_fraction * modulus.  Strata absent from ``target_weights`` are
    dropped; strata smaller than their target keep everything (the
    operator never upsamples — repeat-epoch weighting belongs to the
    trainer).  Output proportions are approximate (hash-Bernoulli), but
    membership is a pure function of (corpus counts, content), so reruns
    and incremental runs agree.

    Plan (the 100 TB shape): ONE count aggregate over the stratum key
    (map-side combined, rows = #strata), thresholds broadcast back, then
    a map-side filter — the corpus itself is never shuffled.
    """
    if total <= 0:
        raise ValueError("total must be positive")
    wsum = float(sum(target_weights.values()))
    if wsum <= 0:
        raise ValueError("target_weights must sum to > 0")
    h = hash_col if hash_col is not None else fingerprint(F.col(text_col))
    counts = df.groupBy(strata_col).agg(F.count("*").alias("__n"))
    w = F.create_map(
        *[F.lit(x) for kv in target_weights.items() for x in kv]
    )[F.col(strata_col)].cast("double")
    # NB F.least SKIPS nulls (returns the smallest NON-null), so an
    # unlisted stratum's null weight must be gated explicitly or it
    # would inherit the full-modulus cut and sail through.
    thresholds = counts.select(
        F.col(strata_col).alias("__mix_key"),
        F.when(
            w.isNotNull(),
            F.floor(F.least(
                F.lit(float(modulus)),
                w / wsum * float(total) / F.col("__n") * float(modulus),
            ))
        ).alias("__mix_cut"),
    ).where(F.col("__mix_cut").isNotNull())
    residue = (h % modulus + modulus) % modulus
    return (
        df.withColumn("__mix_res", residue)
        .join(F.broadcast(thresholds),
              F.col(strata_col) == F.col("__mix_key"))
        .where(F.col("__mix_res") < F.col("__mix_cut"))
        .drop("__mix_key", "__mix_cut", "__mix_res")
    )


def hash_threshold_sample(
    df: DataFrame,
    fraction: float,
    hash_col: Column | None = None,
    text_col: str = "text",
    modulus: int = 1_000_000,
) -> DataFrame:
    """Deterministic ~``fraction`` sample: keep rows whose content hash
    lands below ``fraction * modulus`` in the non-negative residue ring
    — the standard shard-stable sampling idiom (a document's membership
    never changes as the corpus grows, so incremental pipeline runs are
    consistent).

    Plan: a single map-side filter — the hash UDF plus pure-Catalyst
    modular arithmetic, ZERO shuffles; at any scale this is a scan.
    """
    if not (0.0 < fraction <= 1.0):
        raise ValueError("fraction must be in (0, 1]")
    h = hash_col if hash_col is not None else fingerprint(F.col(text_col))
    cutoff = int(fraction * modulus)
    residue = (h % modulus + modulus) % modulus
    return df.where(residue < cutoff)
