"""Distributed Bloom-filter membership (operators/membership.py) and its
contamination-prefilter composition (operators/contamination.py).

The load-bearing laws: NO false negatives (exact, not statistical),
partition-independence of the built bitmap, merge(build(A), build(B)) ==
build(A ∪ B) bit-for-bit, and prefilter→exact == exact end-to-end.
"""

import numpy as np
import pyspark.sql.functions as F
import pytest

from clickhousedatamocker_spark.operators.membership import (
    bloom_contains,
    bloom_merge,
    bloom_params,
    bloom_stats,
    build_bloom,
)
from tests.conftest import SF_DIR


def test_bloom_params_shape():
    m, k = bloom_params(10_000, 0.01)
    # textbook optimum: ~9.59 bits/key, k ~ 7 at 1%
    assert 9.0 * 10_000 < m < 10.5 * 10_000
    assert k == 7
    with pytest.raises(ValueError):
        bloom_params(0, 0.01)
    with pytest.raises(ValueError):
        bloom_params(10, 1.5)


def test_bloom_no_false_negatives_and_fpp(spark):
    """Every inserted key probes True (hard law); non-members probe True at
    ~the sized rate (checked with 3x headroom at n=5000 probes)."""
    members = spark.range(0, 4000).withColumnRenamed("id", "key")
    model = build_bloom(members, "key", expected_items=4000, fpp=0.01, seed=3)
    assert model["n_added"] == 4000

    probed = bloom_contains(members, model, "key")
    assert probed.filter(~F.col("maybe_member")).count() == 0  # no false negatives

    outsiders = spark.range(1_000_000, 1_005_000).withColumnRenamed("id", "key")
    fp = bloom_contains(outsiders, model, "key").filter(F.col("maybe_member")).count()
    assert fp / 5000 < 0.03, fp  # sized for 1%

    st = bloom_stats(model)
    assert abs(st["est_items"] - 4000) / 4000 < 0.1
    assert 0 < st["fill_ratio"] < 0.6


def test_bloom_partition_independence_and_nulls(spark):
    """Same keys, any partitioning → bit-identical bitmap; NULL keys are
    skipped on build and probe False."""
    keys = spark.range(0, 1000).select(
        F.when(F.col("id") % 50 == 0, F.lit(None)).otherwise(F.col("id")).alias("key")
    )
    a = build_bloom(keys.repartition(1), "key", expected_items=1000, fpp=0.01)
    b = build_bloom(keys.repartition(7), "key", expected_items=1000, fpp=0.01)
    assert a["bitmap"] == b["bitmap"]
    assert a["n_added"] == b["n_added"] == 980

    probed = bloom_contains(keys, a, "key").filter(F.col("key").isNull())
    assert all(not r["maybe_member"] for r in probed.collect())


def test_bloom_merge_identity(spark):
    """Slab-wise build + merge == one-shot build over the union, exactly."""
    lo = spark.range(0, 600).withColumnRenamed("id", "key")
    hi = spark.range(600, 1400).withColumnRenamed("id", "key")
    m_bits, k = bloom_params(1400, 0.01)
    kw = dict(m_bits=m_bits, k=k, seed=11)
    merged = bloom_merge(
        build_bloom(lo, "key", **kw), build_bloom(hi, "key", **kw)
    )
    whole = build_bloom(lo.unionByName(hi), "key", **kw)
    assert merged["bitmap"] == whole["bitmap"]
    assert merged["n_added"] == 1400

    with pytest.raises(ValueError):
        bloom_merge(merged, build_bloom(lo, "key", m_bits=m_bits, k=k, seed=12))


def test_bloom_string_keys(spark):
    """xxhash64 hashes strings natively — the gram-digest use case."""
    docs = spark.createDataFrame(
        [(f"gram number {i}",) for i in range(500)], "g: string"
    )
    model = build_bloom(docs, "g", expected_items=500, fpp=0.01)
    probed = bloom_contains(docs, model, "g")
    assert probed.filter(~F.col("maybe_member")).count() == 0


def test_contamination_prefilter_equals_exact(spark):
    """prefilter → exact check == exact check (survivor rows identical;
    dropped docs are exactly the contaminated=False ones for min_overlap)."""
    from clickhousedatamocker_spark.operators.contamination import (
        contamination_check,
        contamination_prefilter,
        gram_bloom,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    # plant: the test set is 5 real documents (verbatim leakage) + 1 unseen
    test = docs.filter(F.col("doc_id") < 5).unionByName(
        spark.createDataFrame(
            [(99999, "completely unseen evaluation prompt text " * 4)],
            "doc_id: long, text: string",
        )
    )
    exact = contamination_check(docs, test, n=8, min_overlap=1)
    truly = {r["doc_id"] for r in exact.filter("contaminated").collect()}
    assert {0, 1, 2, 3, 4} <= truly

    model = gram_bloom(test, n=8, fpp=0.001)
    pre = contamination_prefilter(docs, model, n=8, min_overlap=1)
    pre_ids = {r["doc_id"] for r in pre.select("doc_id").collect()}
    # no false negatives: every truly contaminated doc survives the prefilter
    assert truly <= pre_ids

    confirmed = contamination_check(pre, test, n=8, min_overlap=1)
    got = {r["doc_id"] for r in confirmed.filter("contaminated").collect()}
    assert got == truly


def test_bloom_probe_plan_is_map_only(spark):
    """The probe must not shuffle or join: no Exchange in the plan."""
    keys = spark.range(0, 100).withColumnRenamed("id", "key")
    model = build_bloom(keys, "key", expected_items=100, fpp=0.01)
    plan = bloom_contains(keys, model, "key")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Join" not in plan
