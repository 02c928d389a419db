"""Two-cluster-size scaling evidence (north rule / driver note).

Runs the SAME flagship workload (spatial-join + tile-assignment over the
interleaved documents table, byte-identical input by construction — see
synth_documents' parallelism-independent generation) at local[N] and
local[4N], in SEPARATE processes (one SparkSession each), and reports
throughput at both plus scaling efficiency = speedup / 4.

Usage:
    python scripts/scaling.py [--n 8] [--docs 200000] [--out BENCH.md]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

RUNNER = r"""
import json, sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from ndjson_spatial_spark.session import get_spark, warm_python_workers
from ndjson_spatial_spark.sources.documents import synth_documents, extract_geometry_spans
from ndjson_spatial_spark.operators.spatial import spatial_intersection_join, assign_tiles

cpus = int(sys.argv[1])
n_docs = int(sys.argv[2])
spark = get_spark("scaling", master=f"local[{cpus}]", shuffle_partitions=cpus,
                  extra_conf={"spark.ui.showConsoleProgress": "false"})
spark.range(1_000_000).select(F.sum("id")).collect()  # warm the JVM
warm_python_workers(spark, cpus)                      # warm Arrow workers

repeats = int(sys.argv[3]) if len(sys.argv) > 3 else 1
best = None
rows = None
for rep in range(repeats):
    t0 = time.perf_counter()
    # staged pipeline (each stage materialized once, as the checkpointed
    # production pipeline would; avoids re-deriving upstream stages in
    # every downstream lineage)
    tp = t0
    def ph(label):
        global tp
        now = time.perf_counter()
        print(f"REP-PHASE cpus={cpus} rep={rep} {label} {round(now - tp, 2)}s",
              file=sys.stderr, flush=True)
        tp = now
    docs = synth_documents(spark, n_docs=n_docs, seed=42, partitions=cpus * 2)
    geoms = extract_geometry_spans(docs).cache()
    geoms.count(); ph("extract")
    refs = geoms.where((F.col("geom.geom_type") == "Polygon")
                       & (F.crc32(F.col("doc_id")) % 29 == 0)).select("geom")
    # localCheckpoint staging: measured faster AND better-scaling than the
    # columnar cache or parquet for nested geometry structs on this box
    joined = spatial_intersection_join(geoms, refs, res=9).select(
        "doc_id", "geom"
    ).localCheckpoint(eager=True)
    ph("join")
    tiled = assign_tiles(joined, [6, 9])
    rows = tiled.count(); ph("tiles")
    elapsed = time.perf_counter() - t0
    print(f"REP cpus={cpus} rep={rep} {round(elapsed, 2)}s", file=sys.stderr)
    best = elapsed if best is None else min(best, elapsed)
    geoms.unpersist()
    joined.unpersist()
# best-of-k: the sandbox shares its host and shows multi-x wall-clock
# variance; min is the least-interfered estimate of the true cost
print("RESULT " + json.dumps({"cpus": cpus, "rows": rows,
                              "elapsed_sec": round(best, 3),
                              "docs_per_sec": round(n_docs / best, 1)}))
"""


def wait_for_quiet(max_load: float = 4.0, timeout_s: int = 900) -> float:
    """Block until the 1-min load average drops below max_load (the sandbox
    shares its host; measuring scaling during co-tenant bursts is
    meaningless).  Returns the load at release."""
    t0 = time.time()
    while True:
        load = os.getloadavg()[0]
        if load < max_load or time.time() - t0 > timeout_s:
            return load
        time.sleep(15)


def run_at(cpus: int, n_docs: int, repeats: int = 1, mem: str = "48g") -> dict:
    env = dict(os.environ, SPARK_GRAFT_DRIVER_MEM=mem)
    out = subprocess.run(
        [sys.executable, "-c", RUNNER, str(cpus), str(n_docs), str(repeats)],
        capture_output=True, text=True, timeout=3600, env=env,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"no RESULT line (rc={out.returncode}):\n{out.stderr[-3000:]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--docs", type=int, default=200_000)
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    # interleave configs (N, 4N, N, 4N, ...) so slow phases of the shared
    # host hit both configs symmetrically; take best per config
    small = None
    big = None
    for _ in range(args.repeats):
        load = wait_for_quiet()
        s = run_at(args.n, args.docs, 1)
        print(f"local[{args.n}] (load {load:.1f}): {s}", file=sys.stderr)
        small = s if small is None or s["elapsed_sec"] < small["elapsed_sec"] else small
        load = wait_for_quiet()
        b = run_at(args.n * 4, args.docs, 1)
        print(f"local[{args.n * 4}] (load {load:.1f}): {b}", file=sys.stderr)
        big = b if big is None or b["elapsed_sec"] < big["elapsed_sec"] else big

    assert small["rows"] == big["rows"], (
        f"identical input must give identical output: {small['rows']} vs {big['rows']}"
    )
    speedup = small["elapsed_sec"] / big["elapsed_sec"]
    efficiency = speedup / 4.0
    report = {
        "workload": f"flagship spatial-join + tile-assignment, {args.docs} docs",
        "n_cpus": args.n, "n4_cpus": args.n * 4,
        "rows": small["rows"],
        "throughput_n": small["docs_per_sec"],
        "throughput_4n": big["docs_per_sec"],
        "elapsed_n_sec": small["elapsed_sec"],
        "elapsed_4n_sec": big["elapsed_sec"],
        "speedup": round(speedup, 3),
        "scaling_efficiency": round(efficiency, 3),
    }
    print(json.dumps(report))
    if args.out:
        stamp = time.strftime("%Y-%m-%d %H:%M:%S")
        with open(args.out, "a") as f:
            f.write(
                f"\n## Scaling run {stamp}\n\n"
                f"| config | elapsed (s) | throughput (docs/s) |\n|---|---|---|\n"
                f"| local[{args.n}] (N) | {small['elapsed_sec']} | {small['docs_per_sec']} |\n"
                f"| local[{args.n * 4}] (4N) | {big['elapsed_sec']} | {big['docs_per_sec']} |\n\n"
                f"Workload: {report['workload']}; identical output rows "
                f"({report['rows']}) at both sizes.\n"
                f"**Speedup {report['speedup']}x, scaling efficiency "
                f"{report['scaling_efficiency']}** (target >= 0.8).\n"
            )


if __name__ == "__main__":
    main()
