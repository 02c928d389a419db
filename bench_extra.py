"""Round-6 optimization measurement harness (bench.py is FROZEN; this
sidecar adds per-workload isolation per the optimization guide §1):

  * times each workload with the SAME .count() methodology as bench.py,
    plus an optional noop-sink run (guide §1.4) that materializes every
    column so column pruning cannot flatter a plan;
  * captures .explain("formatted") per workload into plans/r06/ as
    <name>_<tag>.txt (tag = "before"/"after" from argv);
  * labels jobs (guide §1.5) so the event log / UI is attributable.

Usage:
  python bench_extra.py before [workload ...]     # subset defaults to all
  python bench_extra.py after  [workload ...]
  NOOP=1 python bench_extra.py ...                # also time noop sink
  REPS=N python bench_extra.py ...                # attempts per workload
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import bench as B  # noqa: E402  (frozen harness: reuse its workloads)
from pyspark.sql import functions as F  # noqa: E402
from ndjson_spatial_spark.session import get_spark, warm_python_workers  # noqa: E402

PLAN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "plans", "r06")


def main():
    tag = sys.argv[1] if len(sys.argv) > 1 else "probe"
    names = sys.argv[2:] or list(B.WORKLOADS)
    reps = int(os.environ.get("REPS", "2"))
    do_noop = os.environ.get("NOOP", "0") == "1"
    os.makedirs(PLAN_DIR, exist_ok=True)

    spark = get_spark(
        "bench_extra", master=f"local[{B.CPUS}]",
        shuffle_partitions=B.CPUS,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.range(1_000_000).select(F.sum("id")).collect()
    warm_python_workers(spark, B.CPUS)
    B.staged_docs(spark)  # stage outside the timed region, like bench.main

    results = {}
    for name in names:
        fn = B.WORKLOADS[name]
        df = fn(spark, B.SF_DIR)
        # plan capture
        if tag in ("before", "after"):
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode
                .fromString("formatted"))
            with open(os.path.join(PLAN_DIR, f"{name}_{tag}.txt"), "w") as fh:
                fh.write(plan)
        secs = []
        for k in range(reps):
            spark.sparkContext.setJobDescription(f"{name}[{tag}][{k}]")
            t0 = time.perf_counter()
            n = fn(spark, B.SF_DIR).count()
            secs.append(round(time.perf_counter() - t0, 3))
        nsec = []
        if do_noop:
            for k in range(reps):
                spark.sparkContext.setJobDescription(f"{name}[noop][{k}]")
                t0 = time.perf_counter()
                fn(spark, B.SF_DIR).write.format("noop") \
                    .mode("overwrite").save()
                nsec.append(round(time.perf_counter() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        results[name] = {"count_sec": secs, "rows": n, "noop_sec": nsec,
                         "load1": round(os.getloadavg()[0], 2)}
        print(f"# {name}: count={secs} noop={nsec} rows={n} "
              f"load1={results[name]['load1']}", file=sys.stderr, flush=True)

    import json
    print(json.dumps({"tag": tag, "results": results}))


if __name__ == "__main__":
    main()
