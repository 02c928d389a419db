"""Interleaved documents table tests (FIXTURES.md F9): generation
determinism, geometry extraction, span-sequence invariant."""

import pytest
from pyspark.sql import functions as F

from ndjson_spatial_spark.operators.spatial import spatial_intersection_join
from ndjson_spatial_spark.sources.documents import (
    extract_geometry_spans,
    span_signature,
    synth_documents,
)


@pytest.fixture(scope="module")
def docs(spark):
    return synth_documents(spark, n_docs=2000, seed=42).cache()


class TestSynth:
    def test_deterministic_across_partitioning(self, spark):
        # the scaling benchmark needs byte-identical input at any parallelism
        a = synth_documents(spark, n_docs=500, seed=42, partitions=2)
        b = synth_documents(spark, n_docs=500, seed=42, partitions=8)
        sig_a = sorted(r.sig for r in span_signature(a).collect())
        sig_b = sorted(r.sig for r in span_signature(b).collect())
        assert sig_a == sig_b

    def test_shape(self, docs):
        assert docs.count() == 2000
        kinds = {
            r.kind
            for r in docs.select(F.explode("spans").alias("s"))
            .select(F.col("s.kind").alias("kind")).distinct().collect()
        }
        assert kinds == {"text", "media", "geometry"}

    def test_offsets_strictly_increasing(self, docs):
        bad = docs.select(
            F.exists(
                F.zip_with(
                    F.slice("spans", 1, F.size("spans") - 1),
                    F.slice("spans", 2, F.size("spans") - 1),
                    lambda a, b: b["offset"] <= a["offset"],
                ),
                lambda x: x,
            ).alias("bad")
        ).where("bad")
        assert bad.count() == 0

    def test_geometry_fraction(self, docs):
        n_geo = extract_geometry_spans(docs).select("doc_id").distinct().count()
        assert 0.2 < n_geo / 2000 < 0.4


class TestExtraction:
    def test_extracted_geoms_parse(self, docs):
        g = extract_geometry_spans(docs)
        assert g.where(F.col("geom.geom_type").isNull()).count() == 0
        types = {r.t for r in g.select(F.col("geom.geom_type").alias("t")).distinct().collect()}
        assert types == {"Point", "Polygon"}

    def test_extraction_is_exact(self, docs):
        # every geometry span extracted, nothing else
        expected = docs.select(F.explode("spans").alias("s")).where(
            F.col("s.kind") == "geometry"
        ).count()
        assert extract_geometry_spans(docs).count() == expected


class TestSpanInvariant:
    def test_pipeline_preserves_span_sequence(self, spark, docs):
        """Run the flagship spatial pipeline, then verify the documents
        table's span sequences are untouched (per-row invariant,
        BASELINE.json input_hint)."""
        before = {r.doc_id: r.sig for r in span_signature(docs).collect()}
        geoms = extract_geometry_spans(docs)
        ref = geoms.where(F.col("geom.geom_type") == "Polygon").limit(50)
        joined = spatial_intersection_join(
            geoms, ref.select("geom"), res=7
        )
        # join result references doc_ids; the docs table itself re-hashed:
        joined.count()  # force execution
        after = {r.doc_id: r.sig for r in span_signature(docs).collect()}
        assert before == after
