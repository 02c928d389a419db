"""Z-order clustered storage layout (the Iceberg sort-order / Delta
OPTIMIZE ZORDER shape for a 100 TB spatial table).

The engine's cell ids ARE Morton (Z-order) codes over web-mercator space
(kernels/cells.py), so spatial clustering is just: range-repartition on the
cell id, sort within partitions, write.  Every output file then carries a
tight, near-disjoint cell range; cell-keyed scans (the candidates stage of
every spatial join) prune whole files from parquet min/max statistics, and
neighboring geometries land in neighboring row groups (locality for the
broadcast-join probe side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.cells_fn import st_cell_of_point
from ..functions.geo import st_centroid

__all__ = ["cluster_by_cell"]


def cluster_by_cell(
    df: DataFrame,
    geom_col: str = "geom",
    res: int = 12,
    partitions: int | None = None,
    cell_col: str = "cell_id",
) -> DataFrame:
    """Return `df` with a level-`res` Morton `cell_col` (centroid cell),
    range-partitioned and sorted on it — write the result to get a
    Z-order clustered table:

        cat.write("geoms", cluster_by_cell(geoms))

    Range partitioning gives files DISJOINT cell ranges (up to sampled
    boundary keys); the in-partition sort tightens row-group min/max so a
    `WHERE cell_id BETWEEN a AND b` scan (or a cell equi-join probe over
    a pruned id set) skips non-overlapping files entirely."""
    c = st_centroid(F.col(geom_col))
    with_cell = df.withColumn(
        cell_col,
        st_cell_of_point(
            F.element_at(c["x"], 1), F.element_at(c["y"], 1), res
        ),
    )
    n = partitions or df.sparkSession.sparkContext.defaultParallelism
    return (
        with_cell.repartitionByRange(n, F.col(cell_col))
        .sortWithinPartitions(cell_col)
    )
