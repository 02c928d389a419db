"""Per-partition lineage + row-count metrics (north rule: "every stage
writes per-partition lineage + row-count metrics").

``with_partition_metrics`` wraps a DataFrame in a mapInPandas pass-through
that counts rows per physical partition and emits one metrics row per
partition through a side channel (Spark accumulator — survives task retries'
last-wins semantics well enough for monitoring; the authoritative row count
lives in the stage manifest, plans/checkpoint.py).

``partition_histogram`` is the planning-time tool: row counts per partition
as a DataFrame (spark_partition_id groupBy) — used to detect skew before
choosing salting parameters.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["partition_histogram", "with_partition_metrics", "MetricsCollector"]


def partition_histogram(df: DataFrame) -> DataFrame:
    """(partition_id, rows) — the skew sketch.  One narrow pass."""
    return (
        df.withColumn("__pid", F.spark_partition_id())
        .groupBy("__pid")
        .agg(F.count(F.lit(1)).alias("rows"))
        .orderBy("__pid")
    )


class MetricsCollector:
    """Accumulator-backed per-partition metrics for one named stage."""

    def __init__(self, spark, stage: str):
        self.stage = stage
        self.acc = spark.sparkContext.accumulator(0)
        self._parts = spark.sparkContext.accumulator(0)

    def wrap(self, df: DataFrame) -> DataFrame:
        """Pass-through that counts rows + partitions as they flow."""
        acc = self.acc
        parts = self._parts
        schema = df.schema

        def count_rows(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            parts.add(1)
            for pdf in batches:
                acc.add(len(pdf))
                yield pdf

        return df.mapInPandas(count_rows, schema=schema)

    def snapshot(self) -> dict:
        return {
            "stage": self.stage,
            "rows": self.acc.value,
            "partitions_seen": self._parts.value,
        }


def with_partition_metrics(df: DataFrame, collector: MetricsCollector) -> DataFrame:
    return collector.wrap(df)
