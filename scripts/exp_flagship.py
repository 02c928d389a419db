"""Round-2 experiment: old struct flagship vs new hybrid bbox flagship,
at two parallelism levels, from a staged parquet docs table."""

import json
import os
import subprocess
import sys
import time

RUNNER = r"""
import sys, time, os
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from ndjson_spatial_spark.session import get_spark, warm_python_workers
from ndjson_spatial_spark.sources.documents import synth_documents, extract_geometry_spans
from ndjson_spatial_spark.operators.spatial import spatial_intersection_join, assign_tiles
from ndjson_spatial_spark.flagship import docs_tile_pipeline

cpus = int(sys.argv[1]); n_docs = int(sys.argv[2]); variant = sys.argv[3]
pq = f"/tmp/graft_docs_{n_docs}.parquet"
spark = get_spark("exp", master=f"local[{cpus}]", shuffle_partitions=cpus,
                  extra_conf={"spark.ui.showConsoleProgress": "false"})
spark.range(1_000_000).select(F.sum("id")).collect()
warm_python_workers(spark, cpus)
if not os.path.exists(pq):
    synth_documents(spark, n_docs=n_docs, seed=42, partitions=64).write.parquet(pq)
docs = spark.read.parquet(pq)

t0 = time.perf_counter()
if variant == "old":
    geoms = extract_geometry_spans(docs).cache()
    refs = geoms.where((F.col("geom.geom_type") == "Polygon")
                       & (F.crc32(F.col("doc_id")) % 29 == 0)).select("geom")
    joined = spatial_intersection_join(geoms, refs, res=9).select(
        "doc_id", "geom").localCheckpoint(eager=True)
    rows = assign_tiles(joined, [6, 9]).count()
elif variant == "hybrid":
    rows = docs_tile_pipeline(docs).count()
else:  # fastonly
    rows = docs_tile_pipeline(docs, include_general=False).count()
dt = time.perf_counter() - t0
print(f"RESULT {json.dumps({'variant': variant, 'cpus': cpus, 'rows': rows, 'sec': round(dt,2)})}")
""".replace("{json", "{__import__('json')", 1)

def run(cpus, n_docs, variant):
    out = subprocess.run([sys.executable, "-c", RUNNER, str(cpus), str(n_docs), variant],
                         capture_output=True, text=True, timeout=1800)
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[7:])
    raise RuntimeError(out.stderr[-2000:])

if __name__ == "__main__":
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    for variant in ("old", "hybrid", "fastonly"):
        for cpus in (8, 32):
            print(f"load={os.getloadavg()[0]:.1f}", run(cpus, n_docs, variant), flush=True)
