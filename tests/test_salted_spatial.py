"""Non-broadcast + salted spatial join paths must produce identical results
to the broadcast path (the 100 TB configuration, north rule)."""

import json

import pytest
from pyspark.sql import functions as F

from ndjson_spatial_spark.functions.geo import parse_geojson
from ndjson_spatial_spark.operators.spatial import spatial_intersection_join
from ndjson_spatial_spark.sources.documents import (
    extract_geometry_spans,
    synth_documents,
)


@pytest.fixture(scope="module")
def geoms(spark):
    docs = synth_documents(spark, n_docs=1500, seed=42, hot_frac=0.6)
    return extract_geometry_spans(docs).cache()


@pytest.fixture(scope="module")
def refs(geoms):
    return geoms.where(
        (F.col("geom.geom_type") == "Polygon")
        & (F.crc32(F.col("doc_id")) % 11 == 0)
    ).select("geom")


def result_set(df):
    return sorted(
        (r.doc_id, r.offset, round(sum(r.geom.x), 6), round(sum(r.geom.y), 6))
        for r in df.collect()
    )


class TestJoinStrategies:
    def test_shuffle_join_matches_broadcast(self, spark, geoms, refs):
        bc = spatial_intersection_join(geoms, refs, res=7, broadcast_ref=True)
        sh = spatial_intersection_join(geoms, refs, res=7, broadcast_ref=False)
        assert result_set(bc) == result_set(sh)

    def test_salted_join_matches_broadcast(self, spark, geoms, refs):
        bc = spatial_intersection_join(geoms, refs, res=7, broadcast_ref=True)
        salted = spatial_intersection_join(
            geoms, refs, res=7, broadcast_ref=False, salt_hot_cells=True,
            hot_threshold=50, target_per_salt=50,
        )
        assert result_set(bc) == result_set(salted)

    def test_sketch_samples_the_stream_and_shuffles_stay_keyed(
            self, spark, geoms, refs):
        """100 TB plan shape: the frequency sketch reads a SAMPLE of the
        stream (never a second full pass over the exploded terms — the
        widest intermediate in the job), and every wide shuffle in the
        salted path is keyed on the cell term (the join's salted key or
        the sketch aggregate) — no stray repartitions."""
        salted = spatial_intersection_join(
            geoms, refs, res=7, broadcast_ref=False, salt_hot_cells=True,
            hot_threshold=50, target_per_salt=50,
        )
        plan = salted._jdf.queryExecution().executedPlan().toString()
        assert "Sample 0.0, 0.05" in plan
        hash_ex = [ln for ln in plan.splitlines()
                   if "Exchange hashpartitioning" in ln]
        for ln in hash_ex:
            assert "__term" in ln, ln

    def test_salting_actually_triggers(self, spark, geoms):
        """With hot_frac=0.6 clusters and a low threshold, the sketch must
        find hot cells (guards against the salt plan silently being empty)."""
        from ndjson_spatial_spark.functions.cells_fn import make_st_cells
        from ndjson_spatial_spark.plans.salting import (
            key_frequency_sketch,
            salt_plan,
        )
        st_cells = make_st_cells(7, cap=256)
        cells = geoms.withColumn("__cell", F.explode(st_cells(F.col("geom"))))
        plan = salt_plan(
            key_frequency_sketch(cells.select("__cell"), "__cell"),
            "__cell", hot_threshold=50, target_per_salt=50,
        )
        assert plan.count() >= 1
