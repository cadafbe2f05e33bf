"""salted_join semantic-equality and guard tests (the oracle-checked
join_salted_skew query covers the inner-join aggregate path at fixture
scale; here: row-level equality, skewed keys, left joins, the guard)."""

import pyspark.sql.functions as F
import pytest

from clickhousedatamocker_spark.operators.skew import salted_join


@pytest.fixture()
def skewed_pair(spark):
    # 90% of fact rows share one hot key
    fact = spark.range(2000).select(
        F.when(F.col("id") < 1800, F.lit(7)).otherwise(F.col("id") % 50).alias("k"),
        (F.col("id") * 3).alias("payload"),
    )
    dim = spark.range(40).select(F.col("id").alias("k"), F.concat(F.lit("d"), F.col("id")).alias("name"))
    return fact, dim


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_inner_equals_plain(spark, skewed_pair):
    fact, dim = skewed_pair
    assert _rows(salted_join(fact, dim, ["k"], salt=8)) == _rows(fact.join(dim, ["k"]))


def test_left_equals_plain(spark, skewed_pair):
    fact, dim = skewed_pair
    got = salted_join(fact, dim, ["k"], how="left", salt=4)
    assert _rows(got) == _rows(fact.join(dim, ["k"], "left"))


def test_hot_key_scatters_across_salts(spark, skewed_pair):
    fact, _ = skewed_pair
    salted = fact.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(8)).cast("int")
    )
    n_salts = salted.filter(F.col("k") == 7).select("__salt").distinct().count()
    assert n_salts == 8  # the hot key really spreads over all reducer sub-keys


def test_unsupported_join_types_guarded(spark, skewed_pair):
    fact, dim = skewed_pair
    with pytest.raises(ValueError):
        salted_join(fact, dim, ["k"], how="full")
    with pytest.raises(ValueError):
        salted_join(fact, dim, ["k"], how="right")
