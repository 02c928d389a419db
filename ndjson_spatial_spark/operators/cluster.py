"""Density-based spatial clustering (DBSCAN) on point sets.

No reference counterpart (ndjson-spatial has joins/nearest but no
clustering); this is a north-rule spatial-analytics extension built on
the engine's own primitives: eps-grid candidate generation (the same
cell-join shape as spatial_intersection_join) and the large-star /
small-star connected-components kernel (operators/dedup.py).

Determinism: classic DBSCAN's border-point assignment is visit-order
dependent; this implementation defines the deterministic variant —
a border point joins the cluster of its MINIMUM-labelled core neighbor —
so the labelling is a pure function of the point set (gate-able).

Scale design (the 100 TB shape): candidate pairs come from ONE equi-join
on eps-grid cells (each point replicated to its 3x3 neighbor cells on
one side only, so the join is a single shuffle keyed on the cell id and
never a cross join); neighbor counts partial-combine before their
shuffle; core-core edges feed the O(log n)-round CC kernel; the border
assignment is one more cell-keyed broadcast-size join.  Grid density
governs skew exactly as in the spatial join — eps is the cell size, so a
cell holds only points within one eps of each other.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import connected_components

#: cluster label for noise points (neither core nor border)
NOISE = -1


def dbscan(
    df: DataFrame,
    eps: float,
    min_pts: int,
    id_col: str = "id",
    x_col: str = "x",
    y_col: str = "y",
    contract_duplicates: bool = True,
) -> DataFrame:
    """DBSCAN (Ester et al., KDD 1996) with deterministic border
    assignment.  Returns one row per input point:

      ``id_col, x, y, is_core (int 0/1), cluster`` — ``cluster`` is the
      smallest point id in the point's density-connected component of
      CORE points (borders inherit their minimum core neighbor's label),
      or ``NOISE`` (-1).

    Neighborhood is CLOSED (d <= eps) and includes the point itself in
    the |N_eps| >= min_pts core test (the original paper's convention).
    All distance tests use squared distance, so integer coordinates stay
    exact end-to-end.

    ``contract_duplicates`` (round-6, guide §2.2/§2.3 — shuffle fewer
    rows, kill duplicate-key skew at the source): coincident points are
    contracted to ONE node per distinct (x, y) carrying a multiplicity
    BEFORE the 3x3 cell-replication join, and labels are expanded back
    at the end.  Exactness: co-located points have identical
    eps-neighborhoods, so they share degree (weighted by multiplicity),
    coreness, and cluster label; the node id is the position's MINIMUM
    point id, so CC component minima and border min-label assignment are
    unchanged (the minimum of a set equals the minimum over per-position
    minima).  Real point corpora duplicate heavily (rounded GPS,
    lattice-snapped sensors) — k coincident points otherwise cost k^2
    candidate pairs in their cell, the exact hot-cell blowup the salted
    spatial join exists for.  Cost when all points are unique: one extra
    exchange of the (x, y, m) node set — strictly narrower than the 9x
    replicated join input it feeds.  Pass False for the uncontracted
    plan.
    """
    eps2 = float(eps) * float(eps)
    raw_pts = df.select(
        F.col(id_col).alias("pid"),
        F.col(x_col).cast("double").alias("px"),
        F.col(y_col).cast("double").alias("py"),
    )
    if contract_duplicates:
        # node = distinct position; id = min pid there; __m = multiplicity
        # (partial-aggregates map-side, so duplicate-heavy partitions
        # shrink before the exchange)
        pts = raw_pts.groupBy("px", "py").agg(
            F.min("pid").alias("pid"), F.count(F.lit(1)).alias("__m"))
    else:
        pts = raw_pts.withColumn("__m", F.lit(1).cast("long"))
    cx = F.floor(F.col("px") / F.lit(float(eps)))
    cy = F.floor(F.col("py") / F.lit(float(eps)))

    # LEFT side: each point replicated to its 3x3 neighbor cells (one-sided
    # replication keeps the join a single equi-shuffle on the cell key)
    # composite key shift 2^32 (round-6, advisor note): the previous 2^21
    # aliased distant cells once |floor(y/eps)| exceeded 2^20 (small eps /
    # large extents), silently inflating candidate pairs; 2^32 is
    # collision-free for |cell coordinate| < 2^31 — the practical domain.
    off = F.expr("explode(array(-1, 0, 1))")
    left = (
        pts.withColumn("__dx", off).withColumn("__dy", off)
        .select(
            F.col("pid").alias("a"), F.col("px").alias("ax"),
            F.col("py").alias("ay"),
            ((cx.cast("long") + F.col("__dx")) * F.lit(1 << 32)
             + cy.cast("long") + F.col("__dy")).alias("__cell"),
        )
    )
    right = pts.select(
        F.col("pid").alias("b"), F.col("px").alias("bx"),
        F.col("py").alias("by"), F.col("__m").alias("__bm"),
        (cx.cast("long") * F.lit(1 << 32) + cy.cast("long")).alias("__cell"),
    )
    # explicit products (not pow): plain double mul is exact on integer
    # coords and replays bit-identically in the SQL oracle
    d2 = ((F.col("ax") - F.col("bx")) * (F.col("ax") - F.col("bx"))
          + (F.col("ay") - F.col("by")) * (F.col("ay") - F.col("by")))
    # includes the self pair (a == b) from the (0, 0) offset.  Round-6
    # restructure: nbrs previously fed THREE lazily re-evaluated consumers
    # (degree count, core-core edges, border assignment) — exchange reuse
    # shared the cell-join shuffle but each consumer re-ran the join +
    # distance filter.  Now the candidate join is evaluated exactly TWICE:
    # once for the degree/core pass and once to materialize `tagged` (the
    # core-b adjacency with a's coreness flag), which then serves BOTH the
    # CC edge set and the border assignment from its localCheckpoint —
    # measured ~12.0s stable vs 13.3-27s on the 200k-point bench, output
    # bit-identical.  (A plain .persist() of nbrs re-measured SLOWER both
    # rounds — the checkpoint of the already-filtered tagged set is the
    # cheaper materialization.)
    nbrs = (
        left.join(right, "__cell")
        .where(d2 <= F.lit(eps2))
        .select("a", "b", "__bm")
    )
    # debug/test hook (same precedent as connected_components.last_rounds):
    # the candidate join's lazy plan, inspectable after the call even
    # though the materialized tail hides it behind checkpoint scans
    dbscan.last_candidates = nbrs

    # degree = |closed eps-neighborhood| in POINTS: the self pair from the
    # (0, 0) offset contributes the node's own multiplicity (the point
    # itself + its co-located twins), every neighbor node its multiplicity
    deg = nbrs.groupBy("a").agg(F.sum("__bm").alias("__deg"))
    cores = deg.where(F.col("__deg") >= F.lit(int(min_pts))) \
        .select(F.col("a").alias("pid")).localCheckpoint()

    tagged = (
        nbrs.join(cores.select(F.col("pid").alias("b")), "b")
        .join(cores.select(F.col("pid").alias("a"))
              .withColumn("__ac", F.lit(1)), "a", "left")
        .select("a", "b", F.coalesce("__ac", F.lit(0)).alias("__ac"))
    ).localCheckpoint()

    core_edges = tagged.where((F.col("__ac") == 1) & (F.col("a") < F.col("b"))) \
        .select("a", "b")
    # (v, comp).  dedup_edges=False (round-6): the cell join emits each
    # unordered pair exactly once (b's single home cell meets exactly one
    # of a's 9 replica cells) and a < b excludes self pairs, so CC's input
    # distinct would be a pure extra shuffle of the edge set.
    comp = connected_components(core_edges, "a", "b", dedup_edges=False)
    core_labels = (
        cores.join(comp, cores.pid == comp.v, "left")
        .select("pid", F.coalesce("comp", "pid").alias("cluster"))
    )  # isolated cores (all neighbors non-core) label themselves

    # border points: non-core with >= 1 core neighbor -> min core label
    # (__ac == 0 rows of `tagged` are exactly the non-core-a, core-b pairs)
    border_labels = (
        tagged.where(F.col("__ac") == 0)
        .join(core_labels.withColumnRenamed("pid", "b"), "b")
        .groupBy(F.col("a").alias("pid"))
        .agg(F.min("cluster").alias("cluster"))
    )
    labels = core_labels.withColumn("is_core", F.lit(1)).unionByName(
        border_labels.withColumn("is_core", F.lit(0)))
    if contract_duplicates:
        # expand node labels back to every original point via the position
        # (labels <= one row per node; co-located points share coreness and
        # cluster by the contraction argument in the docstring)
        pos_labels = (
            pts.join(labels, "pid", "left")
            .select("px", "py", "is_core", "cluster")
        )
        carrier, key = raw_pts, ["px", "py"]
    else:
        pos_labels, carrier, key = labels, pts, ["pid"]
    return (
        carrier.join(pos_labels, key, "left")
        .select(
            F.col("pid").alias(id_col),
            F.col("px").alias(x_col), F.col("py").alias(y_col),
            F.coalesce("is_core", F.lit(0)).alias("is_core"),
            F.coalesce("cluster", F.lit(NOISE)).alias("cluster"),
        )
    )


def kmeans_lloyd(
    df: DataFrame,
    dim: int,
    init_centroids,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Distributed Lloyd k-means over an embedding column — the scale
    path for clustering 100 TB of vectors (MLlib's shape): each
    iteration is ONE partial-combined aggregate over the corpus
    (assign = argmin over broadcast centroid literals, pure Catalyst;
    recompute = per-(cluster, dimension) sum/count via posexplode), and
    the k x dim new centroids come back to the driver as plan-time
    constants for the next iteration — no per-row Python anywhere, no
    iterative shuffle growth.  Empty clusters keep their previous
    centroid (the standard Lloyd fallback).

    Determinism: assignment ties break to the lowest cluster id
    (lexicographic struct min); on integer-valued embeddings every sum
    is exact in f64 and the mean is one correctly-rounded division, so
    the whole trajectory is bit-reproducible and SQL-replayable.

    Returns (assignments DataFrame (id_col, cluster, d2), final
    centroids list).
    """
    C = [list(map(float, c)) for c in init_centroids]

    def assign_cols(frame):
        vec = F.col(vec_col)
        dists = []
        for cid, c in enumerate(C):
            lit_c = F.array(*[F.lit(x) for x in c])
            # (a-b)*(a-b), NOT **2: pow(v, 2.0) is not guaranteed
            # bit-equal to v*v once centroids are non-integer means
            d2 = F.aggregate(
                F.zip_with(vec, lit_c,
                           lambda x, y: (x.cast("double") - y)
                           * (x.cast("double") - y)),
                F.lit(0.0), lambda acc, x: acc + x)
            dists.append(F.struct(d2.alias("d2"), F.lit(cid).alias("cid")))
        best = F.array_min(F.array(*dists))
        return frame.select(
            F.col(id_col), vec.alias("__v"),
            best["cid"].alias("cluster"), best["d2"].alias("d2"))

    for _ in range(iters):
        assigned = assign_cols(df)
        sums = (
            assigned.select("cluster", F.posexplode("__v").alias("pos", "x"))
            .groupBy("cluster", "pos")
            .agg(F.sum(F.col("x").cast("double")).alias("s"),
                 F.count(F.lit(1)).alias("n"))
            .collect()
        )
        newC = [list(c) for c in C]
        for r in sums:
            newC[r["cluster"]][r["pos"]] = r["s"] / r["n"]
        C = newC

    out = assign_cols(df).select(id_col, "cluster", "d2")
    return out, C
