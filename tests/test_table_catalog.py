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


class TestMaintenance:
    def test_compact_preserves_content_and_reduces_files(
            self, spark, catalog):
        import os

        for i in range(6):  # 6 append commits of 4 partitions = 24 files
            catalog.write("ns.t", spark.range(i * 10, i * 10 + 10)
                          .repartition(4),
                          mode="append" if i else "overwrite")
        before = sorted(r.id for r in catalog.read("ns.t").collect())
        sid = catalog.compact("ns.t", target_bytes=1 << 30)
        snaps = catalog.snapshots("ns.t")
        assert snaps[-1]["id"] == sid
        assert snaps[-1]["operation"] == "replace"
        after = sorted(r.id for r in catalog.read("ns.t").collect())
        assert after == before
        ddir = snaps[-1]["data_dirs"][-1]
        n_files = len([f for f in os.listdir(ddir)
                       if f.endswith(".parquet")])
        assert n_files == 1  # 1 GiB target swallows everything
        # prior snapshots still time-travelable
        assert catalog.read("ns.t", snapshot_id=1).count() == 10

    def test_compact_with_stats_keeps_pruning(self, spark, catalog):
        catalog.write("ns.c", spark.range(1000).withColumn(
            "cell", F.col("id") % 100).repartition(8), mode="overwrite",
            stats_cols=["cell"])
        catalog.compact("ns.c", target_bytes=4_000, stats_cols=["cell"])
        got = catalog.scan("ns.c", "cell", 5, 10)
        assert got.count() == 60
        st = catalog.last_scan
        # range-clustered rewrite -> disjoint per-file ranges -> pruning
        assert st["files_total"] > 1 and st["pruned"] > 0

    def test_expire_snapshots_removes_dead_dirs_only(self, spark, catalog):
        import os

        catalog.write("ns.t", spark.range(5))
        catalog.write("ns.t", spark.range(5, 9), mode="append")
        catalog.write("ns.t", spark.range(100, 103), mode="overwrite")
        snaps = catalog.snapshots("ns.t")
        shared = snaps[0]["data_dirs"][0]  # referenced by snaps 1 AND 2
        removed = catalog.expire_snapshots("ns.t", keep_last=1)
        # snap-1's dir was also dropped with snap-2 gone; snap-3's lives
        assert removed == 2
        assert not os.path.isdir(shared)
        assert catalog.read("ns.t").count() == 3
        assert [s["id"] for s in catalog.snapshots("ns.t")] == [3]
        with pytest.raises(ValueError):
            catalog.read("ns.t", snapshot_id=1)

    def test_expire_keeps_shared_dirs_of_kept_snapshots(
            self, spark, catalog):
        import os

        catalog.write("ns.t", spark.range(5))
        catalog.write("ns.t", spark.range(5, 9), mode="append")
        shared = catalog.snapshots("ns.t")[0]["data_dirs"][0]
        removed = catalog.expire_snapshots("ns.t", keep_last=1)
        # the kept append snapshot still references snapshot 1's dir
        assert removed == 0
        assert os.path.isdir(shared)
        assert catalog.read("ns.t").count() == 9


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


class TestManifestPruning:
    """Round-4: per-file column stats in the snapshot manifest + file-level
    skipping on range scans (the Iceberg manifest-stats analogue), written
    through the Z-order clustered layout."""

    def test_scan_prunes_files_and_matches_full_filter(self, spark, catalog):
        # 8 files with disjoint id ranges via repartitionByRange + sort
        df = (spark.range(8000).withColumn("v", F.col("id") % 7)
              .repartitionByRange(8, "id").sortWithinPartitions("id"))
        catalog.write("ns.clustered", df, stats_cols=["id"])
        snap = catalog.snapshots("ns.clustered")[-1]
        assert all("id" in s for s in snap["file_stats"].values())
        got = catalog.scan("ns.clustered", "id", 2000, 2999)
        rows = got.count()
        assert rows == 1000
        st = catalog.last_scan
        assert st["files_total"] >= 8
        assert st["files_scanned"] < st["files_total"]
        assert st["pruned"] >= st["files_total"] // 2
        # same rows as an unpruned filter
        full = catalog.read("ns.clustered").where(F.col("id").between(2000, 2999))
        assert got.select("id").exceptAll(full.select("id")).isEmpty()
        assert full.select("id").exceptAll(got.select("id")).isEmpty()

    def test_scan_without_stats_reads_everything(self, spark, catalog):
        catalog.write("ns.plain", spark.range(100))
        out = catalog.scan("ns.plain", "id", 10, 20)
        assert out.count() == 11
        assert catalog.last_scan["pruned"] == 0

    def test_empty_range_scans_zero_files(self, spark, catalog):
        df = (spark.range(1000).repartitionByRange(4, "id")
              .sortWithinPartitions("id"))
        catalog.write("ns.z", df, stats_cols=["id"])
        out = catalog.scan("ns.z", "id", 5000, 6000)
        assert out.count() == 0
        assert catalog.last_scan["files_scanned"] == 0


class TestClusteredDocsLayout:
    def test_cluster_docs_preserves_rows_and_prunes(self, spark, catalog):
        from ndjson_spatial_spark.plans.layout import cluster_docs_by_cell

        docs = synth_documents(spark, n_docs=400, seed=7, partitions=4)
        clustered = cluster_docs_by_cell(docs, partitions=8)
        catalog.write("ns.docs", clustered, stats_cols=["cell_id"])
        back = catalog.read("ns.docs")
        assert back.count() == 400
        assert "cell_id" in back.columns
        # pipeline output unchanged by the layout (extra column ignored)
        a = docs_tile_pipeline(docs, res=9, zooms=(6,), ref_mod=13) \
            .groupBy().count().collect()[0][0]
        b = docs_tile_pipeline(back, res=9, zooms=(6,), ref_mod=13) \
            .groupBy().count().collect()[0][0]
        assert a == b
        # a mid-range cell probe prunes files
        stats = catalog.snapshots("ns.docs")[-1]["file_stats"]
        cells = [s["cell_id"] for s in stats.values()]
        lo_all = min(c[0] for c in cells)
        hi_all = max(c[1] for c in cells)
        span = hi_all - lo_all
        catalog.scan("ns.docs", "cell_id",
                     lo_all + 7 * span // 16, lo_all + 8 * span // 16).count()
        assert catalog.last_scan["pruned"] > 0


class TestMergeInto:
    def _staged(self, spark, catalog):
        df = spark.range(1000).select(
            F.col("id").alias("k"), (F.col("id") * 3).alias("v"))
        catalog.write("ns.m", df.repartitionByRange(8, "k")
                      .sortWithinPartitions("k"), stats_cols=["k"])
        return catalog

    def test_upsert_updates_and_inserts(self, spark, catalog):
        self._staged(spark, catalog)
        upd = spark.createDataFrame(
            [(5, -1), (6, -2), (2000, 7)], ["k", "v"])
        catalog.merge_into("ns.m", upd, key="k")
        got = {r["k"]: r["v"] for r in catalog.read("ns.m").collect()}
        assert len(got) == 1001
        assert got[5] == -1 and got[6] == -2 and got[2000] == 7
        assert got[7] == 21  # untouched
        assert catalog.row_count("ns.m") == 1001

    def test_merge_prunes_untouched_files(self, spark, catalog):
        self._staged(spark, catalog)
        upd = spark.createDataFrame([(5, -1), (6, -2)], ["k", "v"])
        catalog.merge_into("ns.m", upd, key="k")
        lm = catalog.last_merge
        # updates hit one range-partitioned file; the other 7 carry over
        assert lm["files_total"] == 8
        assert lm["rewritten"] == 1 and lm["carried"] == 7

    def test_delete_semantics(self, spark, catalog):
        self._staged(spark, catalog)
        upd = spark.createDataFrame([(0, 0), (999, 0), (5000, 0)],
                                    ["k", "v"])
        catalog.merge_into("ns.m", upd, key="k", when_matched="delete")
        got = catalog.read("ns.m")
        assert got.count() == 998
        assert got.where(F.col("k").isin(0, 999, 5000)).count() == 0

    def test_merge_snapshot_time_travel_and_scan(self, spark, catalog):
        self._staged(spark, catalog)
        upd = spark.createDataFrame([(5, -1)], ["k", "v"])
        sid = catalog.merge_into("ns.m", upd, key="k")
        # time travel to pre-merge
        old = catalog.read("ns.m", snapshot_id=sid - 1)
        assert old.where("k = 5").collect()[0]["v"] == 15
        # stats-pruned scan over the merged snapshot (carried + new files)
        hits = catalog.scan("ns.m", "k", 5, 6)
        assert sorted(r["v"] for r in hits.collect()) == [-1, 18]

    def test_expire_keeps_carried_merge_files(self, spark, catalog):
        self._staged(spark, catalog)
        upd = spark.createDataFrame([(5, -1)], ["k", "v"])
        catalog.merge_into("ns.m", upd, key="k")
        removed = catalog.expire_snapshots("ns.m", keep_last=1)
        # snap-1's dir backs 7 carried files -> must NOT be deleted
        assert removed == 0
        got = {r["k"]: r["v"] for r in catalog.read("ns.m").collect()}
        assert len(got) == 1000 and got[5] == -1 and got[900] == 2700
