"""Iceberg-API table layer: snapshots, time travel, append semantics, and
the flagship pipeline reading/writing through it (SURVEY §7 phase 0)."""

import pytest
from pyspark.sql import functions as F

from ndjson_spatial_spark.flagship import docs_tile_pipeline
from ndjson_spatial_spark.sources.documents import synth_documents
from ndjson_spatial_spark.sources.table import TableCatalog


@pytest.fixture()
def catalog(spark, tmp_path):
    return TableCatalog(spark, str(tmp_path / "warehouse"))


class TestCatalog:
    def test_write_read_roundtrip(self, spark, catalog):
        df = spark.range(10).withColumn("v", F.col("id") * 2)
        sid = catalog.write("ns.t", df)
        assert sid == 1
        got = catalog.read("ns.t")
        assert got.count() == 10
        assert catalog.row_count("ns.t") == 10

    def test_append_and_time_travel(self, spark, catalog):
        catalog.write("ns.t", spark.range(5))
        catalog.write("ns.t", spark.range(5, 8), mode="append")
        assert catalog.read("ns.t").count() == 8
        assert catalog.read("ns.t", snapshot_id=1).count() == 5
        assert catalog.row_count("ns.t") == 8
        snaps = catalog.snapshots("ns.t")
        assert [s["id"] for s in snaps] == [1, 2]
        assert snaps[1]["operation"] == "append"

    def test_overwrite_resets(self, spark, catalog):
        catalog.write("ns.t", spark.range(5))
        catalog.write("ns.t", spark.range(100, 103), mode="overwrite")
        assert catalog.read("ns.t").count() == 3
        assert catalog.row_count("ns.t") == 3
        # old snapshot still readable (no eager cleanup, like Iceberg)
        assert catalog.read("ns.t", snapshot_id=1).count() == 5

    def test_missing_table_and_snapshot(self, spark, catalog):
        with pytest.raises(ValueError):
            catalog.read("ns.absent")
        catalog.write("ns.t", spark.range(1))
        with pytest.raises(ValueError):
            catalog.read("ns.t", snapshot_id=9)

    def test_table_names(self, spark, catalog):
        catalog.write("raw.documents", spark.range(1))
        catalog.write("out.tiles", spark.range(1))
        assert catalog.table_names() == ["out.tiles", "raw.documents"]


class TestFlagshipThroughCatalog:
    def test_docs_in_tiles_out(self, spark, catalog):
        docs = synth_documents(spark, n_docs=300, seed=5, partitions=4)
        catalog.write("raw.documents", docs)
        tiles = docs_tile_pipeline(catalog.read("raw.documents"))
        sid = catalog.write("out.tiles", tiles)
        got = catalog.read("out.tiles", snapshot_id=sid)
        assert got.count() > 0
        assert set(got.columns) == {"doc_id", "zoom", "tile_x", "tile_y", "tile_id"}
        assert catalog.row_count("out.tiles") == got.count()
