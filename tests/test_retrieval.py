"""BM25 retrieval (operators/retrieval.py): DuckDB formula parity, the
persisted term-bucket index, and the partition-pruned query plan."""

import os

import duckdb
import pytest
from pyspark.sql import functions as F

from clickhousedatamocker_spark.operators.retrieval import (
    bm25_oracle_sql,
    bm25_postings,
    bm25_query_indexed,
    bm25_search,
    build_bm25_index,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
QUERY = "the model data of training"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_bm25_matches_duckdb(spark, docs):
    got = [(r["doc_id"], r["score"]) for r in bm25_search(docs, QUERY, k=15).collect()]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    want = con.execute(bm25_oracle_sql(QUERY, k=15)).fetchall()
    assert got == [(d, s) for d, s in want]
    assert len(got) == 15 and got[0][1] >= got[-1][1] > 0


def test_bm25_postings_shape(spark, docs):
    postings, n, avgdl = bm25_postings(docs)
    assert n == docs.count() and avgdl > 0
    # tf sums back to each doc's length: losslessness of the explode+agg
    back = (
        postings.groupBy("doc_id")
        .agg(F.sum("tf").alias("s"), F.first("dl").alias("dl"))
        .filter("s <> dl")
        .count()
    )
    assert back == 0


def test_bm25_ranks_planted_doc_first(spark):
    rows = [(i, "filler words nothing relevant here at all") for i in range(50)]
    rows.append((99, "zebra quagga zebra okapi zebra"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    top = bm25_search(df, "zebra okapi", k=3).first()
    assert top["doc_id"] == 99


def test_bm25_indexed_identity_and_pruned_plan(spark, docs, tmp_path):
    path = str(tmp_path / "bm25_index")
    meta = build_bm25_index(docs, path, n_buckets=32)
    assert meta["n_docs"] == docs.count()

    indexed = bm25_query_indexed(spark, path, QUERY, k=15)
    direct = bm25_search(docs, QUERY, k=15)
    assert [tuple(r) for r in indexed.collect()] == [tuple(r) for r in direct.collect()]

    plan = indexed._jdf.queryExecution().executedPlan().toString()
    pf = [ln for ln in plan.split("\n") if "PartitionFilters" in ln]
    assert pf and any("bucket" in ln for ln in pf), "bucket filter not pushed"
    # the term IN-filter reaches the parquet scan too (PushedFilters)
    assert "PushedFilters" in plan and "term" in plan


def test_bm25_index_add_matches_oneshot(spark, docs, tmp_path):
    """Incremental index maintenance: build on half the corpus, add the
    other half -> query results AND sidecar stats identical to a one-shot
    build over everything (avgdl merges losslessly via exact total_dl)."""
    from clickhousedatamocker_spark.operators.retrieval import bm25_index_add

    half_a = docs.filter(F.col("doc_id") % 2 == 0)
    half_b = docs.filter(F.col("doc_id") % 2 == 1)

    inc_path = str(tmp_path / "bm25_inc")
    build_bm25_index(half_a, inc_path, n_buckets=32)
    meta_inc = bm25_index_add(spark, inc_path, half_b)

    full_path = str(tmp_path / "bm25_full")
    meta_full = build_bm25_index(docs, full_path, n_buckets=32)

    assert meta_inc["n_docs"] == meta_full["n_docs"]
    assert meta_inc["total_dl"] == meta_full["total_dl"]
    assert meta_inc["avgdl"] == meta_full["avgdl"]

    got = [tuple(r) for r in bm25_query_indexed(spark, inc_path, QUERY, k=15).collect()]
    want = [tuple(r) for r in bm25_query_indexed(spark, full_path, QUERY, k=15).collect()]
    assert got == want and len(got) == 15

    # the pruned-read property survives increments
    plan = (
        bm25_query_indexed(spark, inc_path, QUERY, k=15)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert any("PartitionFilters" in ln and "bucket" in ln for ln in plan.split("\n"))


def test_bm25_empty_query_refuses(spark, docs, tmp_path):
    with pytest.raises(ValueError, match="no tokens"):
        bm25_search(docs, "   ")
