"""1-bit binary quantization (operators/bq.py): packing parity vs numpy,
DuckDB xengine twin (exact integer arithmetic), two-stage rerank recall,
and the all-JVM plan pins."""

import duckdb
import numpy as np
import pyspark.sql.functions as F
import pytest

from clickhousedatamocker_spark.operators.bq import (
    bq_encode,
    bq_topk,
    bq_topk_rerank,
    bq_train,
    bq_xengine_oracle_sql,
    zero_centers,
)
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def emb(spark):
    return (
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .filter(F.col("embedding").isNotNull())
        .persist()
    )


def test_bq_packing_matches_numpy(spark):
    """Sign-bit packing, including the 2's-complement top bit and the
    multi-word (d > 64) path."""
    rows = [
        (1, [0.5, -0.2] * 65),  # alternating, 130-d -> 3 words
        (2, [-1.0] * 130),
        (3, [1.0] * 130),
        (4, [0.0] * 130),  # zeros are NOT > 0 -> all bits clear
    ]
    df = spark.createDataFrame(rows, "vec_id: long, embedding: array<double>")
    got = {r["vec_id"]: list(r["code"]) for r in bq_encode(df, zero_centers(130)).collect()}

    def pack(v):
        words = []
        for w in range((len(v) + 63) // 64):
            x = 0
            for i, val in enumerate(v[w * 64 : (w + 1) * 64]):
                if val > 0:
                    x |= 1 << i
            words.append(x - (1 << 64) if x >= (1 << 63) else x)
        return words

    for vid, v in rows:
        assert got[vid] == pack(v), vid
    # trained centers move the threshold: a constant-positive dim under a
    # higher center packs to 0
    model = bq_train(df)
    enc = {r["vec_id"]: list(r["code"]) for r in bq_encode(df, model).collect()}
    assert enc[2] != enc[3]  # all-neg vs all-pos still separate


def test_bq_topk_matches_duckdb(spark, emb):
    """Ranking twin: same packed words, xor + bit_count, same tiebreak."""
    q = emb.filter(F.col("vec_id") < 5)
    m = zero_centers(64)
    got = [
        (r["query_id"], r["rank"], r["neighbor_id"], r["hamming"])
        for r in bq_topk(bq_encode(emb, m), bq_encode(q, m), k=10)
        .orderBy("query_id", "rank")
        .collect()
    ]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{SF_DIR}/embeddings.parquet'"
    )
    want = [tuple(r) for r in con.execute(bq_xengine_oracle_sql(64, k=10, n_queries=5)).fetchall()]
    assert got == want
    assert len(got) == 50
    assert all(0 <= h <= 64 for *_, h in got)


def test_bq_rerank_recall(spark, emb):
    """Two-stage recall vs exact cosine on the fixture (near-random 64-d —
    the hardest case for 1-bit codes): shortlist 50 and 100 bounds pinned
    at observed-minus-margin."""
    from clickhousedatamocker_spark.operators.similarity import brute_force_topk

    q = emb.filter(F.col("vec_id") < 5)
    exact = {(r["query_id"], r["neighbor_id"]) for r in brute_force_topk(emb, q, k=10).collect()}
    model = bq_train(emb)
    for shortlist, floor in ((50, 0.6), (100, 0.75)):
        got = {
            (r["query_id"], r["neighbor_id"])
            for r in bq_topk_rerank(emb, q, model, k=10, shortlist=shortlist).collect()
        }
        recall = len(got & exact) / len(exact)
        assert recall >= floor, (shortlist, recall)


def test_bq_plan_all_jvm(spark, emb):
    """The Hamming scan must stay in codegen: no Python eval, no cartesian
    product; the query side broadcasts."""
    q = emb.filter(F.col("vec_id") < 5)
    m = zero_centers(64)
    plan = (
        bq_topk(bq_encode(emb, m), bq_encode(q, m), k=10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "Broadcast" in plan


def test_bq_train_centers(spark):
    df = spark.createDataFrame(
        [(i, [float(i), -1.0]) for i in range(5)], "vec_id: long, embedding: array<double>"
    )
    m = bq_train(df)
    assert m["center"] == pytest.approx([2.0, -1.0])
    with pytest.raises(ValueError, match="no vectors"):
        bq_train(df.filter(F.col("vec_id") > 99))
