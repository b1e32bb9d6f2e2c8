"""salted_join: result-equivalence with the plain join under heavy skew."""

import pytest
from pyspark.sql import functions as F

from nl_railtraffic_etl_pipeline_spark.operators.skew import salted_join


@pytest.fixture(scope="module")
def skewed(spark):
    # 10k rows, 90% on one key — the shape AQE skew-split targets, built
    # deterministically.
    fact = spark.range(10_000).select(
        F.when(F.col("id") % 10 < 9, F.lit(1))
        .otherwise(F.col("id") % 100)
        .alias("k"),
        F.col("id").alias("payload"),
    )
    dim = spark.range(100).select(
        F.col("id").alias("k"), F.concat(F.lit("d"), F.col("id")).alias("name")
    )
    return fact, dim


@pytest.mark.parametrize("how", ["inner", "left", "left_semi", "left_anti"])
def test_salted_join_matches_plain(spark, skewed, how):
    fact, dim = skewed
    got = salted_join(fact, dim, ["k"], salt=8, how=how)
    want = fact.join(dim, ["k"], how)
    assert got.columns == want.columns
    assert got.exceptAll(want).isEmpty() and want.exceptAll(got).isEmpty()


def test_salted_join_rejects_right(spark, skewed):
    fact, dim = skewed
    with pytest.raises(ValueError):
        salted_join(fact, dim, ["k"], how="right")
