"""ndjson-spatial-spark: PySpark-native spatial-join + tiling engine with the
capability surface of boydjohnson/ndjson-spatial (see SURVEY.md, COVERAGE.md).
"""

from .session import get_spark, warm_python_workers  # noqa: F401

__version__ = "0.2.0"

__all__ = ["get_spark", "warm_python_workers", "__version__"]
