"""S6 sample-dataset tool + F8-style end-to-end relational pipeline."""

from ndjson_spatial_spark.operators.relational import (
    aggregate,
    ndjson_filter,
    sort_rows,
)
from ndjson_spatial_spark.sources.datasets import sample_dataset


class TestSampleDataset:
    def test_shape_and_determinism(self, spark):
        a = sample_dataset(spark)
        assert a.count() == 150
        assert a.columns == ["class", "petal_length", "petal_width",
                             "sepal_length", "sepal_width"]
        assert a.select("class").distinct().count() == 3
        b = sample_dataset(spark)
        assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))

    def test_f8_pipeline(self, spark):
        """FIXTURES.md F8: filter -> agg -> sort over the sample dataset
        (the reference README's canonical shell pipeline shape)."""
        ds = sample_dataset(spark)
        out = sort_rows(
            aggregate(
                ndjson_filter(ds, "d.petal_length >= 1.4"),
                ["d.class"], "sum", "d.petal_width",
            ),
            ["d.class"],
        )
        rows = out.collect()
        assert out.columns == ["class", "petal_width_sum"]
        assert [r["class"] for r in rows] == sorted(r["class"] for r in rows)
        assert all(isinstance(r.petal_width_sum, float) for r in rows)
