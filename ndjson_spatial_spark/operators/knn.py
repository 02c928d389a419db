"""Nearest-distance / kNN join via expanding cell-ring search.

Reference: `ndjson-spatial nearest-distance --ref f`
(ndjson-spatial/src/nearest_distance.rs:27-94) — an in-memory R-tree k=1
nearest-neighbor over reference POINTS, probed per stream POINT, writing the
SQUARED euclidean distance (`distance_2`, :64-75) into the stream feature.

Engine realization (SURVEY §2.3 J6, §7 phase 3):

  ring 0   : equi-join stream cell == ref cell, min(d2) per stream row
  ring k   : unresolved rows explode their 8k ring-k cells and re-join
  safety   : a candidate found at ring k is not necessarily nearest — one
             final join over the disk of radius sqrt(best_d2) guarantees it
             (any closer point lies in that disk's cell cover)
  fallback : rows still unresolved after max_rings brute-force against the
             broadcast ref (reference semantics: ref always fits memory —
             it builds an R-tree over the whole file)

Every stage is a DataFrame equi-join on cell ids; the driver loop only
escalates ring radius (bounded iterations), never touches row data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.cells_fn import make_disk_cells, st_cell_of_point

__all__ = ["nearest_distance", "nearest_k", "join_dwithin",
           "with_distance_property"]


def _points_xy(df: DataFrame, geom_col: str, xn: str, yn: str) -> DataFrame:
    """Project point rows to flat x/y columns (pure Catalyst; non-point rows
    silently skipped, nearest_distance.rs:46-55)."""
    return df.where(F.col(f"{geom_col}.geom_type") == "Point").withColumns(
        {
            xn: F.element_at(F.col(f"{geom_col}.x"), 1),
            yn: F.element_at(F.col(f"{geom_col}.y"), 1),
        }
    )


def nearest_distance(
    stream: DataFrame,
    ref: DataFrame,
    geom_col: str = "geom",
    res: int = 12,
    max_rings: int = 2,
    out_col: str = "distance",
    broadcast_ref: bool = True,
) -> DataFrame:
    """Stream point rows + SQUARED distance to the nearest ref point.

    Output: the stream's point rows (non-points dropped, matching the
    reference's silent skip) with `out_col` (double) appended.  The
    reference's "null properties -> distance silently not added" quirk
    (nearest_distance.rs:83-85) is a SINK concern: apply
    ``with_distance_property`` when emitting NDJSON.

    Plan shape (3 bounded phases, no unbounded driver loop — each phase is
    ONE cell equi-join against the broadcast ref):
      A. disk probe of radius R0 = max_rings * cellsize -> min d2 per row.
         Correctness: every unexplored cell lies fully outside the R0
         square, so any point there is farther than R0 — a hit with
         d <= R0 is the true nearest.
      B. rows with no hit in A brute-force against the broadcast ref
         (isolated points; the reference holds the whole ref in RAM too).
      C. hits with d > R0 re-probe at radius d (disk cover join) — the
         safety pass that makes ring candidates exact.
    """
    from ..kernels.cells import MERC_MAX

    sid = "__sid"
    s = _points_xy(stream, geom_col, "__sx", "__sy").withColumn(
        sid, F.monotonically_increasing_id()
    )
    s = s.persist()

    r = _points_xy(ref, geom_col, "__rx", "__ry").select("__rx", "__ry")
    r = r.withColumn("__cell", st_cell_of_point(F.col("__rx"), F.col("__ry"), res))
    if broadcast_ref:
        r = F.broadcast(r)

    d2 = (
        (F.col("__sx") - F.col("__rx")) ** 2 + (F.col("__sy") - F.col("__ry")) ** 2
    ).alias("__d2")

    def best_of(cand: DataFrame) -> DataFrame:
        return cand.groupBy(sid).agg(F.min("__d2").alias("__best_d2"))

    cellsize = 2.0 * MERC_MAX / (1 << res)
    r0 = float(max_rings) * cellsize
    # phase A's radius is the fixed r0, so size its cap to never coarsen
    # (coarsened disk cells would miss the ref's level-res cells entirely)
    disk_cells = make_disk_cells(res, cap=max(4096, (2 * max_rings + 2) ** 2))
    probe = s.select(sid, "__sx", "__sy")

    # phase A: one disk join
    candA = probe.withColumn(
        "__dcell",
        F.explode(disk_cells(F.col("__sx"), F.col("__sy"), F.lit(r0))["cells"]),
    )
    bestA = best_of(
        candA.join(r, candA["__dcell"] == r["__cell"]).select(sid, d2)
    ).persist()

    # phase B: brute-force the misses (rare when res fits ref density)
    missed = probe.join(bestA, sid, "left_anti")
    bestB = best_of(
        missed.crossJoin(r.select("__rx", "__ry")).select(sid, d2)
    )

    # phase C: safety re-probe where the A-hit exceeds the guaranteed
    # radius.  A re-probe disk too large to cover at level res (its cover
    # would be cap-coarsened and never equi-match the ref cells) falls back
    # to brute force instead — correctness over candidate pruning.
    needs_check = bestA.where(F.col("__best_d2") > r0 * r0).join(probe, sid)
    with_disk = needs_check.withColumn(
        "__disk",
        disk_cells(F.col("__sx"), F.col("__sy"), F.sqrt(F.col("__best_d2"))),
    )
    checked = (
        with_disk.where(~F.col("__disk.coarse"))
        .withColumn("__dcell", F.explode("__disk.cells"))
        .join(r, F.col("__dcell") == r["__cell"])
        .select(sid, d2)
    )
    checked_brute = (
        with_disk.where(F.col("__disk.coarse"))
        .select(sid, "__sx", "__sy")
        .crossJoin(r.select("__rx", "__ry"))
        .select(sid, d2)
    )

    final = (
        bestA.select(sid, "__best_d2")
        .unionByName(bestB)
        .unionByName(best_of(checked.unionByName(checked_brute)))
        .groupBy(sid)
        .agg(F.min("__best_d2").alias(out_col))
    )

    out = s.join(final, sid, "inner")
    return out.select(*stream.columns, F.col(out_col))


def nearest_k(
    stream: DataFrame,
    ref: DataFrame,
    k: int,
    geom_col: str = "geom",
    res: int = 12,
    max_rings: int = 2,
    broadcast_ref: bool = True,
) -> DataFrame:
    """kNN extension (SURVEY §2.5 O2): the reference only does k=1; the
    engine generalizes with the same 3-phase shape.

    Output: stream point rows x k, with (rank:int, distance:double —
    SQUARED, matching the k=1 operator).  Correctness: a disk probe of
    radius R0 guarantees the true k-nearest only for rows whose k-th
    candidate lies within R0; other rows re-probe at their k-th candidate
    distance (or brute-force when fewer than k candidates exist).
    """
    from pyspark.sql import Window

    from ..kernels.cells import MERC_MAX

    sid = "__sid"
    s = _points_xy(stream, geom_col, "__sx", "__sy").withColumn(
        sid, F.monotonically_increasing_id()
    ).persist()

    r = _points_xy(ref, geom_col, "__rx", "__ry").select("__rx", "__ry")
    r = r.withColumn("__cell", st_cell_of_point(F.col("__rx"), F.col("__ry"), res))
    if broadcast_ref:
        r = F.broadcast(r)

    d2 = (
        (F.col("__sx") - F.col("__rx")) ** 2 + (F.col("__sy") - F.col("__ry")) ** 2
    ).alias("__d2")
    # rank by squared distance; equidistant neighbors rank arbitrarily but
    # the returned DISTANCE multiset is deterministic
    w = Window.partitionBy(sid).orderBy(F.col("__d2"))

    def topk(cand: DataFrame) -> DataFrame:
        return (
            cand.withColumn("__rk", F.row_number().over(w))
            .where(F.col("__rk") <= k)
        )

    cellsize = 2.0 * MERC_MAX / (1 << res)
    r0 = float(max_rings) * cellsize
    # fixed-radius probe: cap sized so the disk cover never coarsens
    disk_cells = make_disk_cells(res, cap=max(4096, (2 * max_rings + 2) ** 2))
    probe = s.select(sid, "__sx", "__sy")

    candA = probe.withColumn(
        "__dcell",
        F.explode(disk_cells(F.col("__sx"), F.col("__sy"), F.lit(r0))["cells"]),
    ).join(r, F.col("__dcell") == r["__cell"]).select(sid, d2)
    bestA = topk(candA).persist()

    # rows guaranteed complete: k candidates found AND k-th within R0
    kth = bestA.groupBy(sid).agg(
        F.count(F.lit(1)).alias("__n"), F.max("__d2").alias("__kd2")
    )
    complete = kth.where((F.col("__n") >= k) & (F.col("__kd2") <= r0 * r0))
    incomplete = probe.join(complete, sid, "left_anti")

    # incomplete rows: brute force against the broadcast ref (covers both
    # the <k-candidates case and the k-th-beyond-R0 safety case)
    brute = topk(
        incomplete.crossJoin(r.select("__rx", "__ry")).select(sid, d2)
    )

    final = (
        bestA.join(complete.select(sid), sid, "left_semi")
        .unionByName(brute)
        .select(sid, F.col("__rk").alias("rank"), F.col("__d2").alias("distance"))
    )
    out = s.join(final, sid, "inner")
    return out.select(*stream.columns, "rank", "distance")


def with_distance_property(
    df: DataFrame, properties_col: str = "properties", out_col: str = "distance"
) -> DataFrame:
    """Reference quirk (nearest_distance.rs:83-85): rows whose `properties`
    is null do NOT get the distance written.  For map-typed properties
    columns, merge the distance in (stringified map value) only when the
    map is non-null."""
    return df.withColumn(
        properties_col,
        F.when(
            F.col(properties_col).isNotNull(),
            F.map_concat(
                F.col(properties_col),
                F.create_map(F.lit(out_col), F.col(out_col).cast("string")),
            ),
        ).otherwise(F.col(properties_col)),
    )


def join_dwithin(
    stream: DataFrame,
    ref: DataFrame,
    radius: float,
    geom_col: str = "geom",
    res: int | None = None,
    out_col: str = "distance2",
    broadcast_ref: bool = True,
) -> DataFrame:
    """Distance-RANGE join (round-4 engine extension): one output row per
    (stream point, ref point) pair within `radius` — the ST_DWithin-class
    operator Spark has no native equivalent for, built from the same cell
    machinery as the kNN join.

    Plan: the cell resolution is chosen so a cell side is at least
    `radius` (cover of the radius-disk <= ~9 cells/row, bounded fan-out);
    stream rows explode their disk cover, ref points carry their single
    level-`res` cell, one equi-join (broadcast or hash-partitioned)
    produces candidates, and a pure-JVM `dx*dx + dy*dy <= radius^2`
    refines exactly.  A pair can meet only once (the ref's one cell
    appears once in the stream's distinct disk cover) — no dedup shuffle.
    `out_col` carries the SQUARED distance, the reference's distance_2
    convention (nearest_distance.rs:64-75).  Point rows only (non-points
    silently skipped, the reference's nearest-distance scope)."""
    from ..kernels.cells import MERC_MAX

    if res is None:
        # largest res whose cell side still covers the radius
        import math

        res = max(0, min(24, int(math.floor(
            math.log2((2.0 * MERC_MAX) / max(radius, 1e-9))))))
    s = _points_xy(stream, geom_col, "__sx", "__sy")
    r = _points_xy(ref, geom_col, "__rx", "__ry").withColumn(
        "__rcell", st_cell_of_point(F.col("__rx"), F.col("__ry"), res)
    ).drop(geom_col)
    disk = make_disk_cells(res)
    s = s.withColumn(
        "__disk", disk(F.col("__sx"), F.col("__sy"), F.lit(float(radius)))
    ).withColumn("__scell", F.explode("__disk.cells")).drop("__disk")
    if broadcast_ref:
        r = F.broadcast(r)
    j = s.join(r, F.col("__scell") == F.col("__rcell"))
    dx = F.col("__sx") - F.col("__rx")
    dy = F.col("__sy") - F.col("__ry")
    d2 = dx * dx + dy * dy
    out = j.where(d2 <= F.lit(float(radius) * float(radius))) \
        .withColumn(out_col, d2)
    return out.drop("__sx", "__sy", "__rx", "__ry", "__scell", "__rcell")
