"""Pure-Catalyst bbox fast path: equivalence with the struct operators and
no-Python plan guarantees (the flagship's scaling path)."""

import pytest
from pyspark.sql import functions as F

from ndjson_spatial_spark.operators.bbox_fast import (
    assign_tiles_bbox,
    bbox_intersection_join,
    flat_bbox,
    is_bbox_shape,
)
from ndjson_spatial_spark.operators.spatial import (
    assign_tiles,
    spatial_intersection_join,
)
from ndjson_spatial_spark.sources.documents import (
    extract_geometry_spans,
    synth_documents,
)


def _flat(spark, rows):
    """rows: (id, minx, miny, maxx, maxy, is_pt) -> stream-flat frame."""
    return spark.createDataFrame(
        rows, ["id", "__bminx", "__bminy", "__bmaxx", "__bmaxy", "__bpt"]
    )


def _flat_ref(spark, rows):
    return spark.createDataFrame(
        rows, ["__rminx", "__rminy", "__rmaxx", "__rmaxy", "__rpt"]
    )


M = 100000.0


class TestBboxJoin:
    def test_rect_rect_overlap_and_dedup(self, spark):
        # both spread over many cells at res 8 -> pair meets many times,
        # must emit exactly once with the exact overlap bbox
        s = _flat(spark, [("a", 0.0, 0.0, 30 * M, 30 * M, False)])
        r = _flat_ref(spark, [(10 * M, 10 * M, 50 * M, 50 * M, False)])
        out = bbox_intersection_join(s, r, res=8).collect()
        assert len(out) == 1
        row = out[0]
        assert (row["__iminx"], row["__iminy"], row["__imaxx"], row["__imaxy"]) \
            == (10 * M, 10 * M, 30 * M, 30 * M)
        assert not row["__ipt"]

    def test_point_semantics_closed_rect(self, spark):
        s = _flat(spark, [
            ("on_edge", 0.0, 0.0, 0.0, 0.0, True),
            ("inside", M, M, M, M, True),
            ("outside", -M, -M, -M, -M, True),
        ])
        r = _flat_ref(spark, [(0.0, 0.0, 2 * M, 2 * M, False)])
        got = {r_["id"] for r_ in bbox_intersection_join(s, r, res=8).collect()}
        assert got == {"on_edge", "inside"}

    def test_touching_rects_excluded(self, spark):
        s = _flat(spark, [("t", 0.0, 0.0, M, M, False)])
        r = _flat_ref(spark, [(M, 0.0, 2 * M, M, False)])
        assert bbox_intersection_join(s, r, res=8).count() == 0

    def test_no_python_in_plan(self, spark):
        s = _flat(spark, [("a", 0.0, 0.0, M, M, False)])
        r = _flat_ref(spark, [(0.0, 0.0, M, M, False)])
        joined = bbox_intersection_join(s, r, res=8)
        tiled = assign_tiles_bbox(joined, [6, 9])
        plan = tiled._jdf.queryExecution().executedPlan().toString()
        assert "Python" not in plan, plan
        assert "BroadcastHashJoin" in plan


class TestEquivalenceWithStructOperators:
    @pytest.fixture(scope="class")
    def pipelines(self, spark):
        docs = synth_documents(spark, n_docs=2000, seed=11, partitions=4)
        geoms = extract_geometry_spans(docs).cache()
        geoms.count()
        refs = geoms.where(
            (F.col("geom.geom_type") == "Polygon")
            & (F.crc32(F.col("doc_id")) % 7 == 0)
        ).select("geom")
        return geoms, refs

    def _struct_result(self, geoms, refs):
        joined = spatial_intersection_join(geoms, refs, res=9).select(
            "doc_id", "geom"
        )
        tiled = assign_tiles(joined, [6, 9])
        return sorted(
            (r["doc_id"], r["zoom"], r["tile_x"], r["tile_y"], r["tile_id"])
            for r in tiled.select(
                "doc_id", "zoom", "tile_x", "tile_y", "tile_id").collect()
        )

    def _bbox_result(self, geoms, refs):
        flat = flat_bbox(geoms.select("doc_id", "geom")).drop("geom")
        rflat = flat_bbox(refs, prefix="__r").drop("geom")
        joined = bbox_intersection_join(flat, rflat, res=9)
        tiled = assign_tiles_bbox(joined, [6, 9])
        return sorted(
            (r["doc_id"], r["zoom"], r["tile_x"], r["tile_y"], r["tile_id"])
            for r in tiled.select(
                "doc_id", "zoom", "tile_x", "tile_y", "tile_id").collect()
        )

    def test_all_synth_shapes_are_bbox(self, spark, pipelines):
        geoms, _ = pipelines
        n_all = geoms.count()
        n_fast = geoms.where(is_bbox_shape(F.col("geom"))).count()
        assert n_all == n_fast and n_all > 0

    def test_join_plus_tiles_identical(self, spark, pipelines):
        geoms, refs = pipelines
        want = self._struct_result(geoms, refs)
        got = self._bbox_result(geoms, refs)
        assert len(want) > 100
        assert got == want

    def test_hybrid_pipeline_matches_struct(self, spark, pipelines):
        from ndjson_spatial_spark.flagship import docs_tile_pipeline
        from ndjson_spatial_spark.sources.documents import synth_documents

        docs = synth_documents(spark, n_docs=1000, seed=11, partitions=4)
        got = sorted(map(tuple, docs_tile_pipeline(
            docs, res=9, zooms=(6, 9), ref_mod=7).collect()))
        geoms = extract_geometry_spans(docs)
        refs = geoms.where(
            (F.col("geom.geom_type") == "Polygon")
            & (F.crc32(F.col("doc_id")) % 7 == 0)
        ).select("geom")
        joined = spatial_intersection_join(geoms, refs, res=9).select(
            "doc_id", "geom")
        want = sorted(map(tuple, assign_tiles(joined, [6, 9]).select(
            "doc_id", "zoom", "tile_x", "tile_y", "tile_id").collect()))
        assert got == want and len(got) > 0

    def test_hybrid_routes_general_shapes(self, spark):
        # inject a triangle (non-bbox) geometry span: the hybrid must route
        # it through the struct path and still match the pure struct result
        import json as _json
        from ndjson_spatial_spark.flagship import docs_tile_pipeline
        from ndjson_spatial_spark.sources.documents import (
            DOCS_SCHEMA, synth_documents)

        # world-scale triangle: deterministically intersects many refs and
        # exercises the struct path's cap-coarsening on the way
        tri = _json.dumps({"type": "Polygon", "coordinates": [[
            [-1.2e7, -1.2e7], [1.2e7, -1.2e7], [-1.2e7, 1.2e7],
            [-1.2e7, -1.2e7]]]})
        extra = spark.createDataFrame(
            [("docTRI", [("geometry", tri, None, 1)])], DOCS_SCHEMA)
        docs = synth_documents(spark, n_docs=400, seed=3, partitions=2) \
            .unionByName(extra)
        got = sorted(map(tuple, docs_tile_pipeline(
            docs, res=9, zooms=(6,), ref_mod=5).collect()))
        geoms = extract_geometry_spans(docs)
        refs = geoms.where(
            (F.col("geom.geom_type") == "Polygon")
            & (F.crc32(F.col("doc_id")) % 5 == 0)
        ).select("geom")
        joined = spatial_intersection_join(geoms, refs, res=9).select(
            "doc_id", "geom")
        want = sorted(map(tuple, assign_tiles(joined, [6]).select(
            "doc_id", "zoom", "tile_x", "tile_y", "tile_id").collect()))
        assert any(r[0] == "docTRI" for r in got)
        assert got == want

    def test_flagship_fast_plan_is_python_free(self, spark, tmp_path):
        # the whole fast-path plan (classify + bbox-extract + join + tiles)
        # must contain no Python eval nodes when reading a parquet corpus —
        # the round-2 scaling fix (the Arrow parse stage inverse-scaled)
        from ndjson_spatial_spark.flagship import docs_tile_pipeline
        from ndjson_spatial_spark.sources.documents import synth_documents

        pq = str(tmp_path / "docs.parquet")
        synth_documents(spark, n_docs=300, seed=9, partitions=2) \
            .write.parquet(pq)
        tiles = docs_tile_pipeline(spark.read.parquet(pq), ref_mod=7)
        plan = tiles._jdf.queryExecution().executedPlan().toString()
        assert "Python" not in plan, plan

    def test_shuffle_path_identical(self, spark, pipelines):
        geoms, refs = pipelines
        flat = flat_bbox(geoms.select("doc_id", "geom")).drop("geom")
        rflat = flat_bbox(refs, prefix="__r").drop("geom")
        bcast = sorted(map(tuple, bbox_intersection_join(
            flat, rflat, res=9).select("doc_id", "__iminx", "__ipt").collect()))
        shuf = sorted(map(tuple, bbox_intersection_join(
            flat, rflat, res=9, broadcast_ref=False
        ).select("doc_id", "__iminx", "__ipt").collect()))
        salted = sorted(map(tuple, bbox_intersection_join(
            flat, rflat, res=9, broadcast_ref=False, salt_hot_cells=True,
            hot_threshold=5, target_per_salt=5,
        ).select("doc_id", "__iminx", "__ipt").collect()))
        assert bcast == shuf == salted
