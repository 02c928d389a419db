"""Isolate which flagship stage scales inversely at high thread counts."""

import json
import os
import subprocess
import sys

RUNNER = r"""
import json, os, sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from ndjson_spatial_spark.session import get_spark, warm_python_workers
from ndjson_spatial_spark.functions.geo import parse_geojson
from ndjson_spatial_spark.operators.bbox_fast import (
    flat_bbox, bbox_intersection_join, assign_tiles_bbox, is_bbox_shape)

cpus = int(sys.argv[1]); n_docs = int(sys.argv[2])
pq = f"/tmp/spark_graft_docs_{n_docs}.parquet"
spark = get_spark("stages", master=f"local[{cpus}]", shuffle_partitions=cpus,
                  extra_conf={"spark.ui.showConsoleProgress": "false"})
spark.range(1_000_000).select(F.sum("id")).collect()
warm_python_workers(spark, cpus)
sz = sum(os.path.getsize(os.path.join(pq, f)) for f in os.listdir(pq)
         if f.endswith(".parquet"))
spark.conf.set("spark.sql.files.maxPartitionBytes", str(max(1 << 20, sz // (cpus * 3))))
spark.conf.set("spark.sql.files.openCostInBytes", "65536")

docs = spark.read.parquet(pq)
spans = docs.select("doc_id", F.explode("spans").alias("span")) \
            .where(F.col("span.kind") == "geometry")

def t(label, df):
    t0 = time.perf_counter()
    n = df.count()
    print(f"STAGE {label} cpus={cpus} {round(time.perf_counter()-t0,2)}s rows={n}", flush=True)

t("A_scan_explode", spans)
geoms = spans.select("doc_id", parse_geojson(F.col("span.text")).alias("geom"))
t("B_parse", geoms)
flat = flat_bbox(geoms).drop("geom")
t("C_flat", flat)
is_ref = (F.col("geom.geom_type") == "Polygon") & (F.crc32(F.col("doc_id")) % 290 == 0)
refs = flat_bbox(geoms.where(is_ref).select("geom"), prefix="__r").drop("geom")
joined = bbox_intersection_join(flat, refs, res=9)
t("D_join", joined)
t("E_tiles", assign_tiles_bbox(joined, [6, 9]))
"""

def run(cpus, n_docs):
    out = subprocess.run([sys.executable, "-c", RUNNER, str(cpus), str(n_docs)],
                         capture_output=True, text=True, timeout=1800,
                         env=dict(os.environ, SPARK_GRAFT_DRIVER_MEM="48g"))
    print(out.stdout)
    if out.returncode != 0:
        print(out.stderr[-2000:])

if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    for cpus in (8, 32):
        run(cpus, n)
