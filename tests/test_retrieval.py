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


# ---------------------------------------------------------------------------
# Hybrid retrieval: RRF fusion of BM25 + cosine rankings


def _query_vec(spark):
    """A deterministic query vector: the embedding of vec_id 0."""
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    return [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]


def test_hybrid_matches_duckdb_twin(spark, docs):
    from clickhousedatamocker_spark.operators.retrieval import (
        hybrid_oracle_sql,
        hybrid_search,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    qv = _query_vec(spark)
    got = [
        (r["doc_id"], r["rrf_score"], r["n_lists"], r["rank"])
        for r in hybrid_search(docs, emb, QUERY, qv, k=12, depth=30)
        .orderBy("rank")
        .collect()
    ]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'")
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM '{SF_DIR}/embeddings.parquet'")
    want = con.execute(hybrid_oracle_sql(QUERY, qv, k=12, depth=30)).fetchall()
    assert len(got) == 12
    for g, w in zip(got, want):
        assert g[0] == w[0] and g[2] == w[2] and g[3] == w[3], (g, w)
        assert g[1] == pytest.approx(w[1], abs=1e-9), (g, w)


def test_rrf_fuse_laws(spark):
    """RRF invariants: a doc in both lists beats rank-worse docs in one
    list; weights scale contributions; missing docs contribute nothing."""
    from clickhousedatamocker_spark.operators.retrieval import rrf_fuse

    a = spark.createDataFrame([(1, 1), (2, 2), (3, 3)], "doc_id long, rank int")
    b = spark.createDataFrame([(2, 1), (4, 2)], "doc_id long, rank int")
    out = {r["doc_id"]: r for r in rrf_fuse([a, b], k_rrf=60).collect()}
    assert out[2]["n_lists"] == 2 and out[1]["n_lists"] == 1
    # doc 2: 1/62 + 1/61 > doc 1: 1/61 -> doc 2 ranks first
    assert out[2]["rank"] == 1 and out[1]["rank"] == 2
    assert out[2]["rrf_score"] == pytest.approx(1 / 62 + 1 / 61, abs=1e-9)
    # weighted: doubling list b's weight flips nothing here but scales score
    w2 = {r["doc_id"]: r for r in rrf_fuse([a, b], k_rrf=60, weights=[1.0, 2.0]).collect()}
    assert w2[4]["rrf_score"] == pytest.approx(2 / 62, abs=1e-9)
    with pytest.raises(ValueError):
        rrf_fuse([])
    with pytest.raises(ValueError):
        rrf_fuse([a, b], weights=[1.0])


def test_hybrid_rescues_vocabulary_mismatch(spark):
    """The canonical hybrid win: a relevant doc that shares NO query terms
    (pure vector hit) still surfaces in the fused top-k."""
    from clickhousedatamocker_spark.operators.retrieval import hybrid_search

    docs = spark.createDataFrame(
        [
            (0, "training data quality for models"),
            (1, "cooking recipes and baking bread"),
            (2, "corpus curation methods overview"),
        ],
        "doc_id long, text string",
    )
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),
            (1, [0.9, 0.1]),   # vector-close to the query despite alien text
            (2, [0.0, 1.0]),
        ],
        "vec_id long, embedding array<double>",
    )
    out = hybrid_search(docs, emb, "training data", [1.0, 0.05], k=3, depth=3)
    ids = {r["doc_id"] for r in out.collect()}
    assert 1 in ids  # pure-vector doc fused in


def test_cosine_rank_plan_no_shuffle_before_topk(spark):
    """The cosine branch must be scan -> project -> TakeOrderedAndProject:
    no Exchange other than the top-k's own singlePartition gather."""
    from clickhousedatamocker_spark.operators.retrieval import cosine_rank

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    plan = (
        cosine_rank(emb, _query_vec(spark), depth=10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan, plan
    assert "BatchEvalPython" not in plan, plan
