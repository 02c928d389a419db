"""spark-submit entry point (north rule: "runs via spark-submit --py-files
on multi-executor clusters").

Usage:
    zip -r engine.zip ndjson_spatial_spark
    spark-submit --py-files engine.zip ndjson_spatial_spark/cli.py \
        --job flagship --docs 50000 --out /tmp/flagship_out

On a cluster the SparkSession comes from spark-submit's conf (master,
executors); get_spark's builder only fills local-mode defaults when no
master is configured.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--job", choices=["flagship", "bench_suite"], default="flagship")
    ap.add_argument("--docs", type=int, default=50_000)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default=None, help="parquet output dir (else count only)")
    ap.add_argument("--checkpoint-dir", default=None,
                    help="enable stage manifests under this dir")
    args = ap.parse_args(argv)

    # absolute imports: spark-submit runs this file as a top-level script,
    # resolving the package from --py-files
    from ndjson_spatial_spark.flagship import docs_tile_pipeline
    from ndjson_spatial_spark.plans.checkpoint import StagedPipeline
    from ndjson_spatial_spark.session import get_spark, warm_python_workers
    from ndjson_spatial_spark.sources.documents import synth_documents

    spark = get_spark("ndjson-spatial-spark")
    warm_python_workers(spark)

    t0 = time.time()
    if args.job == "flagship":
        def build_docs():
            return synth_documents(spark, n_docs=args.docs, seed=42)

        if args.checkpoint_dir:
            pipe = StagedPipeline(spark, args.checkpoint_dir)
            docs = pipe.stage("synth", build_docs,
                              params={"docs": args.docs, "seed": 42})
        else:
            docs = build_docs()
        # hybrid-planned pipeline: pure-Catalyst bbox fast path + struct
        # general branch (flagship.py)
        out_df = docs_tile_pipeline(docs, res=9, zooms=(6, 9)) \
            .select("doc_id", "zoom", "tile_id")
    else:
        import importlib
        entrymod = importlib.import_module("__spark_entry__")
        out_df = entrymod.entry(spark)

    if args.out:
        out_df.write.mode("overwrite").parquet(args.out)
        n = spark.read.parquet(args.out).count()
    else:
        n = out_df.count()
    print(json.dumps({"job": args.job, "rows": n,
                      "elapsed_sec": round(time.time() - t0, 3)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
