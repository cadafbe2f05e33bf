"""Approximate-aggregate error bounds (the ClickHouse uniq()/quantile()
analogues declared in agg_approx_distinct_and_quantiles)."""

import pyspark.sql.functions as F

from clickhousedatamocker_spark.queries import REGISTRY
from tests.conftest import SF_DIR


def test_approx_distinct_within_rsd(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    row = REGISTRY["agg_approx_distinct_and_quantiles"].fn(spark, SF_DIR).first()
    exact_orders = li.select("l_orderkey").distinct().count()
    exact_parts = li.select("l_partkey").distinct().count()
    # rsd=0.02 → generous 5x cushion still catches a broken sketch
    assert abs(row["uniq_orders"] - exact_orders) / exact_orders < 0.10
    assert abs(row["uniq_parts"] - exact_parts) / exact_parts < 0.10


def test_approx_quantiles_bracket_exact(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    row = REGISTRY["agg_approx_distinct_and_quantiles"].fn(spark, SF_DIR).first()
    q50, q95, q99 = row["price_p50"], row["price_p95"], row["price_p99"]
    assert q50 < q95 < q99
    exact = li.approxQuantile("l_extendedprice", [0.5, 0.95, 0.99], 0.0)
    for got, want in zip((q50, q95, q99), exact):
        assert abs(got - want) / want < 0.05
