"""S6 `ndjson-dataset` — embedded sample dataset tool.

The reference ships a 150-row iris NDJSON and a binary that emits it
(ndjson/src/bin/ndjson-dataset.rs:9-26, data ndjson/iris.ndjson).  The
engine's analogue GENERATES a deterministic sample table of the same shape
(150 rows, 3 classes, 4 float features) rather than embedding copied data —
the tool's purpose (a ready-made table to smoke-test pipelines against) is
preserved; the literal values are not, and tests assert shape + determinism,
not iris values.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

__all__ = ["sample_dataset"]

SCHEMA = T.StructType([
    T.StructField("class", T.StringType()),
    T.StructField("petal_length", T.DoubleType()),
    T.StructField("petal_width", T.DoubleType()),
    T.StructField("sepal_length", T.DoubleType()),
    T.StructField("sepal_width", T.DoubleType()),
])

_CLASSES = ("setosa-like", "versicolor-like", "virginica-like")
# per-class feature means (petal_l, petal_w, sepal_l, sepal_w)
_MEANS = ((1.5, 0.25, 5.0, 3.4), (4.3, 1.3, 5.9, 2.8), (5.5, 2.0, 6.6, 3.0))


def sample_dataset(spark: SparkSession, rows_per_class: int = 50,
                   seed: int = 42) -> DataFrame:
    """150-row (by default) three-class sample table, deterministic."""
    rng = np.random.default_rng(seed)
    data = []
    for ci, cls in enumerate(_CLASSES):
        m = _MEANS[ci]
        feats = rng.normal(m, 0.25, size=(rows_per_class, 4)).round(1)
        for r in feats:
            data.append((cls, float(r[0]), float(r[1]), float(r[2]), float(r[3])))
    return spark.createDataFrame(data, SCHEMA)
