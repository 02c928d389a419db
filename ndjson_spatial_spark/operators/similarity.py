"""Similarity search over embedding columns (array<float>).

Two paths (north-rule training-data additions):

  cosine_topk      brute-force exact top-k — the baseline.  Dot products are
                   computed JVM-side (F.aggregate over zip_with — stays in
                   codegen, no Python), queries broadcast, top-k via window.
  lsh_topk         random-hyperplane LSH bucketing — the scale path.  Probes
                   only same-bucket (+ multiprobe neighbor buckets) vectors:
                   recall<1.0 by design, verified against the brute-force
                   baseline in tests.
  cosine_near_dup  all pairs with cosine >= threshold via LSH buckets —
                   embedding near-dup dedup.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.pandas.functions import pandas_udf

__all__ = ["cosine_topk", "lsh_topk", "ivf_topk", "cosine_near_dup",
           "quantize_embeddings", "dequantize", "semantic_dedup"]


def quantize_embeddings(df, vec_col: str = "embedding",
                        levels: int = 127):
    """Symmetric per-vector int8 quantization — the standard 4x shrink for
    embedding tables at 100 TB (Faiss SQ8 shape): scale = max|x|/levels,
    q_i = round(x_i / scale) in [-levels, levels].  PURE Catalyst (array
    transforms, whole-stage codegen — no UDF): adds `q` (array<int>) and
    `q_scale` (double).  Zero vectors quantize to all-zero with scale 0.

    Dot products on dequantized values approximate the float ones with
    relative error ~1/(2*levels) per component (pytest pins cosine top-k
    agreement); the oracle re-derives the whole quantizer closed-form in
    DuckDB list arithmetic."""
    v = F.col(vec_col)
    scale = F.array_max(F.transform(v, lambda x: F.abs(x))) / float(levels)
    q = F.when(
        scale > 0,
        F.transform(v, lambda x: F.round(x / scale).cast("int")),
    ).otherwise(F.transform(v, lambda x: F.lit(0)))
    return df.withColumn("q_scale", scale).withColumn("q", q)


def dequantize(q_col="q", scale_col="q_scale"):
    """q, scale -> array<double> reconstruction (pure Catalyst)."""
    return F.transform(F.col(q_col),
                       lambda x: x.cast("double") * F.col(scale_col))


def _norm_col(vec: str):
    return F.sqrt(
        F.aggregate(
            F.col(vec), F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )


def _dot_cols(a: str, b: str):
    return F.aggregate(
        F.zip_with(F.col(a), F.col(b), lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str | None = None,
) -> DataFrame:
    """Exact brute-force cosine top-k: (query_id, vec_id, cosine, rank).

    Plan: broadcast the (small) query set, one narrow pass over the corpus
    computing dots JVM-side, then a window top-k partitioned by query — the
    only shuffle is the top-k, keyed by query id (tiny).  At 100 TB this is
    the scan-bound baseline; lsh_topk is the sublinear path.
    """
    query_id_col = query_id_col or id_col
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("__qv")
    ).withColumn("__qn", _norm_col("__qv"))
    c = corpus.select(
        F.col(id_col), F.col(vec_col).alias("__cv")
    ).withColumn("__cn", _norm_col("__cv"))

    joined = c.crossJoin(F.broadcast(q))
    sim = joined.withColumn(
        "cosine",
        F.when(
            (F.col("__qn") > 0) & (F.col("__cn") > 0),
            _dot_cols("__cv", "__qv") / (F.col("__qn") * F.col("__cn")),
        ).otherwise(F.lit(0.0)),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col(id_col))
    return (
        sim.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", id_col, F.round("cosine", 9).alias("cosine"), "rank")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def _make_bucket_udf(dim: int, n_planes: int, seed: int):
    H = _hyperplanes(dim, n_planes, seed)

    @pandas_udf(T.IntegerType())
    def bucket(vec: pd.Series) -> pd.Series:
        M = np.stack([np.asarray(v, np.float64) for v in vec])
        signs = (M @ H.T) > 0
        return pd.Series(
            (signs * (1 << np.arange(n_planes))[None, :]).sum(axis=1).astype(np.int32)
        )

    return bucket


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str | None = None,
    n_planes: int = 8,
    n_tables: int = 4,
    seed: int = 11,
) -> DataFrame:
    """Approximate cosine top-k via random-hyperplane LSH.

    Each vector lands in `n_tables` sign-pattern buckets; candidates are
    same-bucket pairs (equi-join on (table, bucket) — the single shuffle),
    reranked exactly.  Expected candidate fraction ~ n_tables / 2^n_planes
    of the corpus per query; recall tested >= 0.6 on gaussian data and
    tunable via n_planes/n_tables.
    """
    query_id_col = query_id_col or id_col

    def with_buckets(df, idc, vc):
        parts = []
        for t in range(n_tables):
            b = _make_bucket_udf(dim, n_planes, seed + t)
            parts.append(
                df.select(
                    F.col(idc), F.col(vc),
                    F.lit(t).alias("__table"), b(F.col(vc)).alias("__bucket"),
                )
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    c = with_buckets(corpus, id_col, vec_col).withColumnsRenamed(
        {id_col: "__cid", vec_col: "__cv"}
    )
    q = with_buckets(
        queries.select(F.col(query_id_col).alias("query_id"), F.col(vec_col)),
        "query_id", vec_col,
    ).withColumnsRenamed({vec_col: "__qv"})

    cand = (
        c.join(F.broadcast(q), ["__table", "__bucket"])
        .dropDuplicates(["query_id", "__cid"])
        .withColumn("__cn", _norm_col("__cv"))
        .withColumn("__qn", _norm_col("__qv"))
    )
    sim = cand.withColumn(
        "cosine",
        F.when(
            (F.col("__qn") > 0) & (F.col("__cn") > 0),
            _dot_cols("__cv", "__qv") / (F.col("__qn") * F.col("__cn")),
        ).otherwise(F.lit(0.0)),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("__cid"))
    return (
        sim.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", F.col("__cid").alias(id_col),
                F.round("cosine", 9).alias("cosine"), "rank")
    )


def _train_centroids(vectors: np.ndarray, nlist: int, iters: int,
                     seed: int) -> np.ndarray:
    """Spherical k-means on a driver-side sample (plan-time constant, like
    auto_resolution's sample scan).  Unit-normalized input and centroids;
    assignment by max dot = min cosine distance."""
    rng = np.random.default_rng(seed)
    V = vectors / np.maximum(np.linalg.norm(vectors, axis=1, keepdims=True), 1e-12)
    C = V[rng.choice(len(V), size=min(nlist, len(V)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(V @ C.T, axis=1)
        for j in range(len(C)):
            members = V[assign == j]
            if len(members) == 0:
                C[j] = V[rng.integers(len(V))]  # re-seed empty cell
            else:
                m = members.sum(axis=0)
                C[j] = m / max(np.linalg.norm(m), 1e-12)
    return C


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str | None = None,
    nlist: int = 64,
    nprobe: int = 8,
    train_sample: int = 20_000,
    train_iters: int = 8,
    seed: int = 5,
) -> DataFrame:
    """Approximate cosine top-k via an IVF (inverted-file) index — the
    classic coarse-quantizer ANN design (Faiss IVFFlat structure, here as
    DataFrame plans):

      train   spherical k-means centroids on a deterministic driver-side
              sample (one bounded collect);
      index   ONE vectorized pass assigns every corpus vector to its
              nearest centroid (`__cell` column — at scale this is the
              partition/bucketing key, so probes are partition-pruned);
      search  each query explodes to its `nprobe` nearest cells, candidate
              join on the cell id (broadcast queries — the same shape as
              the spatial cell join), exact cosine rerank, window top-k.

    Candidates per query ~ (nprobe / nlist) of the corpus; recall is
    tested against the brute-force baseline.  Unlike lsh_topk the probe
    order adapts to the data distribution (trained cells), which is the
    standard scale path for clustered real embeddings.
    """
    query_id_col = query_id_col or id_col
    # deterministic training sample (crc-keyed so any parallelism sees the
    # same rows), bounded collect
    sample_rows = (
        corpus.select(F.col(vec_col))
        .where(F.crc32(F.col(id_col).cast("string")) % 7 == 0)
        .limit(train_sample)
        .collect()
    )
    if not sample_rows:
        sample_rows = corpus.select(F.col(vec_col)).limit(train_sample).collect()
    V = np.stack([np.asarray(r[0], np.float64) for r in sample_rows])
    C = _train_centroids(V, nlist, train_iters, seed)

    @pandas_udf(T.IntegerType())
    def assign_cell(vec: pd.Series) -> pd.Series:
        M = np.stack([np.asarray(v, np.float64) for v in vec])
        M = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
        return pd.Series(np.argmax(M @ C.T, axis=1).astype(np.int32))

    @pandas_udf(T.ArrayType(T.IntegerType()))
    def probe_cells(vec: pd.Series) -> pd.Series:
        M = np.stack([np.asarray(v, np.float64) for v in vec])
        M = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
        sims = M @ C.T
        order = np.argsort(-sims, axis=1)[:, :nprobe]
        return pd.Series([[int(c) for c in row] for row in order])

    c = corpus.select(
        F.col(id_col).alias("__cid"), F.col(vec_col).alias("__cv")
    ).withColumn("__cell", assign_cell("__cv"))
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("__qv")
    ).withColumn("__cell", F.explode(probe_cells("__qv")))

    cand = (
        c.join(F.broadcast(q), "__cell")
        .withColumn("__cn", _norm_col("__cv"))
        .withColumn("__qn", _norm_col("__qv"))
    )
    sim = cand.withColumn(
        "cosine",
        F.when(
            (F.col("__qn") > 0) & (F.col("__cn") > 0),
            _dot_cols("__cv", "__qv") / (F.col("__qn") * F.col("__cn")),
        ).otherwise(F.lit(0.0)),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("__cid"))
    return (
        sim.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", F.col("__cid").alias(id_col),
                F.round("cosine", 9).alias("cosine"), "rank")
    )


def _train_pq(V: np.ndarray, m: int, nbits: int, iters: int = 10
              ) -> np.ndarray:
    """Product-quantizer codebooks: plain Lloyd k-means per subspace on a
    driver-side sample.  Initialization is DISTINCT-FIRST (the first
    2^nbits unique subvectors, padded by repetition when the sample has
    fewer distinct values) — deterministic, and on data whose subspaces
    take at most 2^nbits distinct values the codebooks converge to those
    values EXACTLY, which is what makes the planted-prototype oracle
    bit-checkable.  Empty clusters keep their previous centroid."""
    n, dim = V.shape
    dsub = dim // m
    K = 1 << nbits
    books = np.zeros((m, K, dsub))
    for j in range(m):
        S = V[:, j * dsub:(j + 1) * dsub]
        uniq = np.unique(S, axis=0)
        init = uniq[:K]
        if len(init) < K:
            init = np.vstack(
                [init, np.tile(init[:1], (K - len(init), 1))])
        C = init.copy()
        for _ in range(iters):
            d = ((S[:, None, :] - C[None, :, :]) ** 2).sum(-1)
            a = d.argmin(1)
            for c in range(K):
                pts = S[a == c]
                if len(pts):
                    C[c] = pts.mean(0)
        books[j] = C
    return books


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str | None = None,
    nlist: int = 16,
    nprobe: int = 16,
    m: int = 4,
    nbits: int = 4,
    train_sample: int = 20_000,
    train_iters: int = 8,
    seed: int = 5,
    refine_factor: int | None = None,
    by_residual: bool = False,
) -> DataFrame:
    """Approximate L2 top-k via IVF-PQ — the memory-bound 100 TB ANN
    design (Faiss IVFPQ shape, ``by_residual=False`` variant): vectors
    are stored as ``m`` one-byte-ish codes instead of ``dim`` floats, so
    a billion-vector index fits where raw vectors cannot, and scoring is
    table lookups instead of dot products.

      train   coarse centroids (spherical k-means, shared with ivf_topk)
              + per-subspace PQ codebooks (_train_pq), one bounded
              driver-side sample;
      index   ONE vectorized pass emits (cell, codes[m]) per vector —
              at scale codes are the ONLY per-vector payload that moves;
      search  queries explode to nprobe nearest cells; every query's ADC
              table (m x 2^nbits squared distances to its subvectors) is
              precomputed driver-side from the collected (small,
              broadcast-class) query set, and candidate scoring is a
              vectorized np.take sum over the codes — O(m) lookups per
              candidate, never O(dim);
      rank    window top-k by approximate distance ASC (id tie-break).

    Asymmetric Distance Computation: approx ||q-v||^2 = sum_j
    T_q[j, code_j(v)].  Exact when each subspace's data takes <= 2^nbits
    distinct values (codebooks converge to them — the oracle regime);
    on real data it is the standard PQ approximation, traded for ~
    (4*dim)/m bytes -> m bytes of index per vector.

    ``by_residual=True`` (round-5, VERDICT r4 item 9 — the standard
    Faiss-IVFPQ accuracy upgrade): codes encode ``v - anchor(cell)``
    instead of ``v``, where the anchor is the per-cell mean of the raw
    training vectors (the L2-scale analogue of Faiss's coarse centroid
    under this engine's cosine cells — the unit-norm spherical centroid
    itself is useless as a residual base), so the codebooks only have to
    cover the within-cell spread rather than the whole space — higher
    recall at equal m (pinned by test on clustered data).  ADC tables
    become per-(query, probed cell), built from the query's residual
    against that cell's anchor; table count stays bounded at
    |queries| * nprobe, driver-side like the flat variant.
    """
    query_id_col = query_id_col or id_col
    if dim % m != 0:
        raise ValueError("dim must be divisible by m")
    # train on the WHOLE corpus when it fits the budget (guarantees the
    # codebooks see every distinct subvector — the exactness regime);
    # fall back to the crc-keyed deterministic sample at scale
    head = corpus.select(F.col(vec_col)).limit(train_sample + 1).collect()
    if len(head) <= train_sample:
        sample_rows = head
    else:
        sample_rows = (
            corpus.select(F.col(vec_col))
            .where(F.crc32(F.col(id_col).cast("string")) % 7 == 0)
            .limit(train_sample)
            .collect()
        ) or head[:train_sample]
    V = np.stack([np.asarray(r[0], np.float64) for r in sample_rows])
    C = _train_centroids(V, nlist, train_iters, seed)
    anchors = None
    if by_residual:
        # cell ASSIGNMENT stays spherical (shared with ivf_topk), but
        # residuals must be taken against a point at the data's scale —
        # the unit-norm spherical centroid is useless as a residual
        # anchor (v - unit_c ~ v).  Anchor = per-cell mean of the raw
        # training vectors (Faiss uses the L2 coarse centroid; the raw
        # mean is its analogue under cosine cells).
        Vn = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True),
                            1e-12)
        asg = np.argmax(Vn @ C.T, axis=1)
        anchors = np.zeros_like(C)
        for c_ in range(len(C)):
            mem = V[asg == c_]
            anchors[c_] = mem.mean(0) if len(mem) else C[c_]
        books = _train_pq(V - anchors[asg], m, nbits, train_iters)
    else:
        books = _train_pq(V, m, nbits, train_iters)
    dsub = dim // m

    # ONE vectorized indexing pass: cell assignment + PQ codes together
    # (round-5; previously two separate UDF passes over every vector)
    @pandas_udf("cell int, codes array<int>")
    def encode(vec: pd.Series) -> pd.DataFrame:
        M = np.stack([np.asarray(v, np.float64) for v in vec])
        Mn = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True),
                            1e-12)
        cells = np.argmax(Mn @ C.T, axis=1).astype(np.int32)
        R = M - anchors[cells] if by_residual else M
        codes = np.empty((len(M), m), np.int32)
        for j in range(m):
            S = R[:, j * dsub:(j + 1) * dsub]
            d = ((S[:, None, :] - books[j][None, :, :]) ** 2).sum(-1)
            codes[:, j] = d.argmin(1)
        return pd.DataFrame(
            {"cell": cells,
             "codes": [[int(c) for c in row] for row in codes]})

    # queries are broadcast-class by contract (like cosine_topk): collect
    # once, precompute every ADC table driver-side — per query (flat) or
    # per (query, probed cell) (residual)
    q_rows = queries.select(
        F.col(query_id_col).alias("qid"), F.col(vec_col).alias("qv")
    ).collect()
    qcells = []
    for r in q_rows:
        qv = np.asarray(r.qv, np.float64)
        qn = qv / max(float(np.linalg.norm(qv)), 1e-12)
        order = np.argsort(-(qn @ C.T))[:nprobe]
        qcells.extend((r.qid, int(c)) for c in order)

    def adc_table(qv, cell):
        base = qv - anchors[cell] if by_residual else qv
        tab = np.empty((m, 1 << nbits))
        for j in range(m):
            diff = books[j] - base[j * dsub:(j + 1) * dsub][None, :]
            tab[j] = (diff ** 2).sum(-1)
        return tab

    qv_by_id = {r.qid: np.asarray(r.qv, np.float64) for r in q_rows}
    if by_residual:
        tables = {(qid, cell): adc_table(qv_by_id[qid], cell)
                  for qid, cell in qcells}
    else:
        tables = {(r.qid, -1): adc_table(qv_by_id[r.qid], -1)
                  for r in q_rows}

    @pandas_udf(T.DoubleType())
    def adc_score(qid: pd.Series, cell: pd.Series,
                  codes: pd.Series) -> pd.Series:
        out = np.empty(len(qid))
        cm = np.stack([np.asarray(c, np.int64) for c in codes])
        qa = qid.to_numpy()
        ca = (cell.to_numpy() if by_residual
              else np.full(len(qid), -1, np.int64))
        pairs = np.stack([qa, ca], axis=1)
        for q, c in {tuple(p) for p in pairs.tolist()}:
            sel = (qa == q) & (ca == c)
            tab = tables[(q, c)]
            out[sel] = sum(
                np.take(tab[j], cm[sel, j]) for j in range(m))
        return pd.Series(out)

    qdf = corpus.sparkSession.createDataFrame(
        qcells, ["query_id", "__cell"])

    c = corpus.select(
        F.col(id_col).alias("__cid"), F.col(vec_col).alias("__cv")
    ).withColumn("__enc", encode("__cv")) \
        .select("__cid", F.col("__enc.cell").alias("__cell"),
                F.col("__enc.codes").alias("__codes"))
    cand = c.join(F.broadcast(qdf), "__cell")
    scored = cand.withColumn(
        "approx_dist",
        adc_score(F.col("query_id"), F.col("__cell"), F.col("__codes")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("approx_dist").asc(), F.col("__cid").asc())
    if refine_factor is None:
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", F.col("__cid").alias(id_col),
                    F.round("approx_dist", 9).alias("approx_dist"),
                    "rank")
        )
    # REFINE stage (Faiss IndexRefineFlat shape): ADC keeps only the
    # top k*refine_factor candidate IDS; their raw vectors are fetched
    # by a broadcast-semi-shaped join and the FINAL top-k uses exact L2
    # — the standard recall repair, paying O(k*refine_factor) exact
    # distances per query instead of O(candidates)
    short = (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k * refine_factor)
        .select("query_id", "__cid")
    )
    qvec = corpus.sparkSession.createDataFrame(
        [(r.qid, [float(x) for x in r.qv]) for r in q_rows],
        ["query_id", "__qv"])
    exact = (
        short.join(corpus.select(F.col(id_col).alias("__cid"),
                                 F.col(vec_col).alias("__cv")), "__cid")
        .join(F.broadcast(qvec), "query_id")
        .withColumn(
            "exact_dist",
            F.aggregate(
                F.zip_with("__cv", "__qv",
                           lambda a, b: (a - b) * (a - b)),
                F.lit(0.0), lambda acc, x: acc + x))
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("exact_dist").asc(), F.col("__cid").asc())
    return (
        exact.withColumn("rank", F.row_number().over(w2))
        .where(F.col("rank") <= k)
        .select("query_id", F.col("__cid").alias(id_col),
                F.round("exact_dist", 9).alias("exact_dist"), "rank")
    )


def cosine_near_dup(
    df: DataFrame,
    threshold: float,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    n_tables: int = 6,
    seed: int = 23,
    max_bucket: int = 5000,
) -> DataFrame:
    """Embedding near-duplicate pairs (id_a < id_b, cosine >= threshold) via
    LSH buckets + exact rerank.  Higher n_tables => higher recall (pairs at
    cosine ~threshold disagree on few hyperplanes)."""
    parts = []
    for t in range(n_tables):
        b = _make_bucket_udf(dim, n_planes, seed + t)
        parts.append(
            df.select(F.col(id_col), F.col(vec_col),
                      F.lit(t).alias("__table"), b(F.col(vec_col)).alias("__bucket"))
        )
    banded = parts[0]
    for p in parts[1:]:
        banded = banded.unionByName(p)
    sizes = banded.groupBy("__table", "__bucket").count()
    banded = banded.join(
        sizes.where(F.col("count") <= max_bucket).select("__table", "__bucket"),
        ["__table", "__bucket"],
    )
    a, b_ = banded.alias("a"), banded.alias("b")
    pairs = (
        a.join(
            b_,
            (F.col("a.__table") == F.col("b.__table"))
            & (F.col("a.__bucket") == F.col("b.__bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col(f"a.{vec_col}").alias("__va"),
            F.col(f"b.{vec_col}").alias("__vb"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    sim = pairs.withColumn(
        "cosine",
        _dot_cols("__va", "__vb")
        / (F.sqrt(F.aggregate(F.col("__va"), F.lit(0.0),
                              lambda acc, x: acc + x.cast("double") * x.cast("double")))
           * F.sqrt(F.aggregate(F.col("__vb"), F.lit(0.0),
                                lambda acc, x: acc + x.cast("double") * x.cast("double")))),
    )
    return sim.where(F.col("cosine") >= threshold).select(
        "id_a", "id_b", F.round("cosine", 9).alias("cosine")
    )


def semantic_dedup(
    df: DataFrame,
    eps: float,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: "np.ndarray | list | None" = None,
    nlist: int = 64,
    train_sample: int = 20_000,
    train_iters: int = 8,
    seed: int = 5,
    eps_ratio: "tuple[int, int] | None" = None,
    max_cluster: int = 100_000,
) -> DataFrame:
    """SemDeDup semantic deduplication (Abbas et al. 2023, arXiv:2303.09540):
    cluster embeddings with k-means, then inside each cluster drop every
    vector that has a semantic near-duplicate (cosine >= eps) that sits
    FARTHER from the cluster centroid — i.e. per duplicate group, keep the
    member with the largest centroid distance (the paper's "low centroid
    similarity" representative; ties break to the lower id).

    Scale shape (the paper's own at 100 TB): the O(n^2) pairwise cosine is
    confined to each cluster — one cluster-keyed shuffle, per-cluster work
    bounded by `max_cluster` (oversized clusters pass through un-deduped
    rather than detonating an executor; at scale raise nlist instead).
    Centroids are a plan-time broadcast constant (driver k-means on a
    bounded sample, same Faiss-shaped trainer as ivf_topk), so assignment
    is pure Catalyst — no Python in the per-vector path.

    `eps_ratio=(p, q)` switches the duplicate test to exact integer
    arithmetic — `q^2*dot^2 >= p^2*|u|^2*|v|^2 and dot >= 0` — which is
    bit-exact on integer-valued embeddings (the gate regime; float cosine
    thresholds are 1-ulp fragile across engines).

    Returns kept rows: (id_col, cluster, d2c) where d2c is squared L2
    distance to the assigned centroid.
    """
    if centroids is None:
        sample = (
            df.select(vec_col)
            .where(F.crc32(F.col(id_col).cast("string")) % 100 < 50)
            .limit(train_sample)
            .collect()
        )
        V = np.array([r[0] for r in sample], dtype=np.float64)
        centroids = _train_centroids(V, nlist, train_iters, seed)
    C = np.asarray(centroids, dtype=np.float64)

    vec = F.col(vec_col)
    # Squared L2 to each centroid, ranked lexicographically by (d2, cid):
    # array_min over structs gives (min distance, tie -> lowest cluster id).
    dists = []
    for cid, c in enumerate(C):
        lit_c = F.array(*[F.lit(float(x)) for x in c])
        # (a-b)*(a-b), NOT **2 (advisor note): pow(v, 2.0) is not
        # guaranteed bit-equal to v*v once centroids are non-integer
        # means, and d2 drives keep/drop precedence — same discipline as
        # kmeans_lloyd
        d2 = F.aggregate(
            F.zip_with(vec, lit_c,
                       lambda x, y: (x.cast("double") - y)
                       * (x.cast("double") - y)),
            F.lit(0.0), lambda acc, x: acc + x,
        )
        dists.append(F.struct(d2.alias("d2"), F.lit(cid).alias("cid")))
    best = F.array_min(F.array(*dists))
    norm2 = F.aggregate(vec, F.lit(0.0),
                        lambda acc, x: acc + x.cast("double") * x.cast("double"))
    assigned = df.select(
        F.col(id_col),
        vec.alias("__v"),
        best["cid"].alias("cluster"),
        best["d2"].alias("d2c"),
        norm2.alias("__n2"),
    )
    sizes = assigned.groupBy("cluster").count()
    small = assigned.join(
        F.broadcast(sizes.where(F.col("count") <= max_cluster).select("cluster")),
        "cluster",
    )
    a, b = small.alias("a"), small.alias("b")
    dot = F.aggregate(
        F.zip_with(F.col("a.__v"), F.col("b.__v"),
                   lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x,
    )
    if eps_ratio is not None:
        p, q = eps_ratio
        is_dup = (dot >= 0) & (
            F.lit(float(q * q)) * dot * dot
            >= F.lit(float(p * p)) * F.col("a.__n2") * F.col("b.__n2")
        )
    else:
        is_dup = dot / F.sqrt(F.col("a.__n2") * F.col("b.__n2")) >= F.lit(eps)
    # b is dropped when a duplicate `a` sits farther from the centroid
    # (keep-the-far-one), ties to the lower id.
    precedence = (F.col("a.d2c") > F.col("b.d2c")) | (
        (F.col("a.d2c") == F.col("b.d2c"))
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
    )
    drops = (
        a.join(b, (F.col("a.cluster") == F.col("b.cluster"))
               & (F.col(f"a.{id_col}") != F.col(f"b.{id_col}")))
        .where(is_dup & precedence)
        .select(F.col(f"b.{id_col}").alias(id_col))
        .distinct()
    )
    kept = assigned.join(drops, id_col, "left_anti")
    return kept.select(id_col, "cluster", "d2c")
