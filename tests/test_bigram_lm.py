"""Bigram-LM perplexity quality gate (operators/text_analysis.py):
training determinism, exact agreement with a pure-Python scorer, and the
gibberish-vs-natural separation property the gate exists for."""

import math

import pyspark.sql.functions as F
import pytest

from clickhousedatamocker_spark.operators.text_analysis import (
    score_bigram_logprob,
    train_bigram_lm,
)
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def model(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    return train_bigram_lm(docs, vocab_size=512, max_bigrams=8192)


def test_training_is_deterministic(spark, model):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    again = train_bigram_lm(docs, vocab_size=512, max_bigrams=8192)
    assert again["log_unigram"] == model["log_unigram"]
    assert again["log_bigram"] == model["log_bigram"]


def test_scores_match_python_reimplementation(spark, model):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(100)
    got = {r["doc_id"]: r for r in score_bigram_logprob(docs, model).collect()}

    lb, lu = model["log_bigram"], model["log_unigram"]
    la, loov = model["log_alpha"], model["log_oov"]
    for row in docs.select("doc_id", "text").collect():
        t = row["text"].split(" ")
        grams = list(zip(t, t[1:]))
        # same left-to-right accumulation order as the Spark aggregate fold
        acc = 0.0
        for a, b in grams:
            acc += lb.get((a, b), la + lu.get(b, loov))
        r = got[row["doc_id"]]
        assert r["n_scored_tokens"] == len(grams)
        if grams:
            assert r["mean_logprob"] == pytest.approx(acc / len(grams), abs=1e-12)
        else:
            assert r["mean_logprob"] is None


def test_gibberish_scores_below_natural_text(spark, model):
    """The gate's purpose: corpus-like text scores high, hash-gibberish
    scores at the OOV floor — with a wide margin."""
    natural = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(20)
    gibberish = spark.range(20).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            *[F.sha2(F.concat(F.col("id").cast("string"), F.lit(f":{i}")), 256) for i in range(6)],
        ).alias("text"),
    )
    nat = [r["mean_logprob"] for r in score_bigram_logprob(natural, model).collect()]
    gib = [r["mean_logprob"] for r in score_bigram_logprob(gibberish, model).collect()]
    assert min(nat) > max(gib) + 2.0  # > 2 nats of separation
    # gibberish bigrams all back off to alpha * OOV
    expected_floor = model["log_alpha"] + model["log_oov"]
    assert all(g == pytest.approx(expected_floor, abs=1e-9) for g in gib)


def test_scoring_plan_is_zero_shuffle(spark, model):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = (
        score_bigram_logprob(docs, model)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan  # model ships as map literals; row-local score
    assert "BatchEvalPython" not in plan  # no Python on the row path
