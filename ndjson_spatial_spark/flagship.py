"""Flagship documents pipeline: spatial-join + tile-assignment over the
interleaved text+media documents table (the BASELINE.json headline metric).

Hybrid plan: bbox-shaped geometries (points + axis rects — the dominant
web shapes, and 100% of the synthetic corpus) take the pure-Catalyst fast
path (operators/bbox_fast.py): flat columns end to end, zero Python
workers, zero intermediate materialization, every stage inside whole-stage
codegen.  General shapes route through the exact struct operators
(operators/spatial.py) and the outputs union — same results, pinned by
tests/test_bbox_fast.py equivalence tests against the struct pipeline.

Scan budget on the docs table: refs build + fast stream + (when enabled)
one general-shape pass — all embarrassingly-parallel columnar scans; the
struct cover UDF in the general branch only ever sees the (usually empty)
non-bbox rows because the shape filter precedes it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .functions.geo import parse_geojson
from .operators.bbox_fast import (
    assign_tiles_bbox,
    bbox_intersection_join,
    flat_bbox,
    is_bbox_shape,
)
from .operators.spatial import assign_tiles, spatial_intersection_join

__all__ = ["docs_tile_pipeline", "geojson_bbox_cols"]

_OUT = ["doc_id", "zoom", "tile_x", "tile_y", "tile_id"]


def geojson_bbox_cols(text):
    """Pure-Catalyst GeoJSON classifier + bbox extractor for the dominant
    web shapes.  Returns a dict of column expressions:

      __gt    JSON $.type (JVM get_json_object)
      __fast  TRUE iff the geometry is a Point or a closed single-ring
              axis-aligned rectangle Polygon (exactly `_is_axis_rect`'s
              contract re-expressed over the raw JSON arrays)
      __bminx/__bminy/__bmaxx/__bmaxy/__bpt   flat bbox (null unless fast)

    This is what lets the flagship run with ZERO Python workers: the
    round-2 stage isolation measured the Arrow parse UDF as the one
    inverse-scaling stage at high thread counts (2.1s@8 -> 10.2s@32 for
    identical work), while every pure-JVM stage scaled.  Non-fast rows
    (Multi*, lines, odd polygons, malformed JSON) are parsed by the full
    parse_geojson UDF on the rare general branch only.
    """
    gt = F.get_json_object(text, "$.type")
    pt = F.from_json(text, "coordinates array<double>")["coordinates"]
    pg = F.from_json(text, "coordinates array<array<array<double>>>")["coordinates"]
    ring = pg[0]
    xs = F.transform(ring, lambda p: p[0])
    ys = F.transform(ring, lambda p: p[1])
    minx, maxx = F.array_min(xs), F.array_max(xs)
    miny, maxy = F.array_min(ys), F.array_max(ys)
    is_point = (gt == "Point") & (F.size(pt) == 2)
    is_rect = (
        (gt == "Polygon")
        & (F.size(pg) == 1)
        & (F.size(ring) == 5)
        & F.forall(xs, lambda v: (v == minx) | (v == maxx))
        & F.forall(ys, lambda v: (v == miny) | (v == maxy))
        & (maxx > minx)
        & (maxy > miny)
    )
    return {
        "__gt": gt,
        "__fast": F.coalesce(is_point | is_rect, F.lit(False)),
        "__bminx": F.when(is_point, pt[0]).otherwise(minx),
        "__bmaxx": F.when(is_point, pt[0]).otherwise(maxx),
        "__bminy": F.when(is_point, pt[1]).otherwise(miny),
        "__bmaxy": F.when(is_point, pt[1]).otherwise(maxy),
        "__bpt": F.coalesce(is_point, F.lit(False)),
    }


def docs_tile_pipeline(
    docs: DataFrame,
    res: int = 9,
    zooms=(6, 9),
    ref_mod: int = 29,
) -> DataFrame:
    """documents -> (doc_id, zoom, tile_x, tile_y, tile_id) tile assignments.

    refs = a deterministic ~1/ref_mod sample of the corpus' polygon spans
    (parallelism-independent: keyed on crc32(doc_id), so N- and 4N-core
    runs see identical refs — the two-cluster-size scaling requirement).

    Scan budget: ONE pre-pass over the docs table caches the (small) union
    of ref-sample rows + general-shape rows and counts the latter — so the
    all-bbox common case plans the pure fast path and pays exactly two
    scans total (pre-pass + fast stream), with no materialization of the
    big stream anywhere and NO Python workers at all (classification and
    bbox extraction are Catalyst JSON expressions, see geojson_bbox_cols).
    When general shapes exist, their (rare) rows parse with the full UDF
    and run the exact struct operators; the full stream additionally joins
    any general-shape refs.
    """
    spans = (
        docs.select("doc_id", F.explode("spans").alias("span"))
        .where(F.col("span.kind") == "geometry")
        .select("doc_id", F.col("span.text").alias("__gj"))
        .withColumns(geojson_bbox_cols(F.col("__gj")))
    )
    is_ref = (F.col("__gt") == "Polygon") & (
        F.crc32(F.col("doc_id")) % ref_mod == 0
    )
    # one scan: ref sample + general-shape rows (both small by construction)
    pre = spans.where(is_ref | ~F.col("__fast")).withColumn(
        "__ref", is_ref
    ).cache()
    n_general = pre.where(~F.col("__fast")).count()  # triggers the cache

    refs_fast = (
        pre.where(F.col("__ref") & F.col("__fast"))
        .select(
            F.col("__bminx").alias("__rminx"), F.col("__bminy").alias("__rminy"),
            F.col("__bmaxx").alias("__rmaxx"), F.col("__bmaxy").alias("__rmaxy"),
            F.col("__bpt").alias("__rpt"),
        )
    )
    s_fast = spans.where(F.col("__fast")).select(
        "doc_id", "__bminx", "__bminy", "__bmaxx", "__bmaxy", "__bpt"
    )
    t_fast = assign_tiles_bbox(
        bbox_intersection_join(s_fast, refs_fast, res=res), list(zooms)
    ).select(*_OUT)
    if n_general == 0:
        return t_fast

    # general branch: only here does the full parse UDF run, and only over
    # the small cached pre-pass rows / the rare general refs
    refs = pre.where("__ref").select(parse_geojson("__gj").alias("geom"))
    s_gen = pre.where(~F.col("__fast")).select(
        "doc_id", parse_geojson("__gj").alias("geom")
    )
    j_gen = spatial_intersection_join(s_gen, refs, res=res).select(
        "doc_id", "geom"
    )
    # general-shape REFS join the full (fast-shaped) stream through the
    # struct path — requires one parse pass over the fast stream
    refs_gen = refs.where(~is_bbox_shape(F.col("geom")))
    if refs_gen.limit(1).count() > 0:
        s_fast_struct = spans.where(F.col("__fast")).select(
            "doc_id", parse_geojson("__gj").alias("geom")
        )
        j_cross = spatial_intersection_join(
            s_fast_struct, refs_gen, res=res
        ).select("doc_id", "geom")
        j_gen = j_gen.unionByName(j_cross)
    t_gen = assign_tiles(j_gen, list(zooms)).select(*_OUT)
    return t_fast.unionByName(t_gen)
