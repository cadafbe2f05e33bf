"""fastText-style quality classifier (operators/classifier.py).

Reference strategy mirrors test_importance.py: hashing is shared between
the Spark path and the pure-numpy reference (the reference reads the
collected bucket arrays), so the tests isolate the model math — full-batch
GD trajectory, the two lookup paths, the NULL/empty contract — and pin the
cross-engine scoring twin value-exact against DuckDB."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from clickhousedatamocker_spark.operators import classifier as qc
from clickhousedatamocker_spark.operators.importance import _with_gram_buckets

NB = 64

_POS = [
    "the theory of gradient descent converges under convexity",
    "distributed systems require careful consistency reasoning",
    "the proof follows by induction on the tree height",
    "empirical results confirm the theoretical convergence bound",
    "we analyze the algorithm under adversarial noise models",
    "the lemma establishes a lower bound on sample complexity",
]
_NEG = [
    "click here buy now limited offer best price",
    "winner winner free prize claim your reward today",
    "cheap deals cheap deals act fast buy buy",
    "subscribe like share follow for more daily content",
    "amazing trick doctors hate this one weird secret",
    "hot singles in your area click the banner",
]


@pytest.fixture(scope="module")
def labeled(spark):
    rows = [(i, t, 1) for i, t in enumerate(_POS)] + [
        (100 + i, t, 0) for i, t in enumerate(_NEG)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, label int")


def _bucket_map(df, nb=NB, xengine=False):
    rows = (
        _with_gram_buckets(df.select("doc_id", "text"), "text", nb, "b", xengine)
        .select("doc_id", "b")
        .collect()
    )
    return {r["doc_id"]: (None if r["b"] is None else list(r["b"])) for r in rows}


def _numpy_gd(buckets, labels, nb, epochs, lr, l2=0.0, feature="mean"):
    """The exact full-batch trajectory train_text_classifier runs."""
    ids = sorted(buckets)
    w = np.zeros(nb)
    bias = 0.0
    n = len(ids)
    for _ in range(epochs):
        grad = np.zeros(nb)
        gb = 0.0
        for d in ids:
            bs = buckets[d]
            if bs:
                lk = w[np.asarray(bs, dtype=np.int64)]
                m = bias + (lk.mean() if feature == "mean" else lk.sum())
            else:
                m = bias
            r = 1.0 / (1.0 + math.exp(-m)) - labels[d]
            if bs:
                for b in bs:
                    grad[b] += r / len(bs) if feature == "mean" else r
            gb += r
        w -= lr * (grad / n + l2 * w)
        bias -= lr * (gb / n)
    return w, bias


@pytest.mark.parametrize("feature", ["mean", "count"])
def test_training_matches_numpy_reference(spark, labeled, feature):
    weights, bias = qc.train_text_classifier(
        labeled, "label", num_buckets=NB, epochs=5, lr=0.5, l2=0.01, feature=feature
    )
    buckets = _bucket_map(labeled)
    labels = {r["doc_id"]: r["label"] for r in labeled.select("doc_id", "label").collect()}
    w_ref, b_ref = _numpy_gd(buckets, labels, NB, epochs=5, lr=0.5, l2=0.01, feature=feature)
    assert bias == pytest.approx(b_ref, abs=1e-9)
    assert np.allclose(np.asarray(weights), w_ref, atol=1e-9)


@pytest.mark.parametrize("feature", ["mean", "count"])
def test_training_handles_empty_text_docs(spark, labeled, feature):
    """Real corpora contain empty/whitespace-only documents. Their gram
    array is empty (__n=0): training must not throw DIVIDE_BY_ZERO under
    ANSI mode (round-6 advisory, high — reproduced before the guard) and
    the trajectory must still match numpy, where such docs contribute
    their residual to the bias gradient only."""
    extra = spark.createDataFrame(
        [(900, "", 1), (901, "   ", 0), (902, "\t\n", 1)],
        "doc_id long, text string, label int",
    )
    df = labeled.unionByName(extra)
    weights, bias = qc.train_text_classifier(
        df, "label", num_buckets=NB, epochs=4, lr=0.5, feature=feature
    )
    buckets = _bucket_map(df)
    labels = {r["doc_id"]: r["label"] for r in df.select("doc_id", "label").collect()}
    w_ref, b_ref = _numpy_gd(buckets, labels, NB, epochs=4, lr=0.5, feature=feature)
    assert bias == pytest.approx(b_ref, abs=1e-9)
    assert np.allclose(np.asarray(weights), w_ref, atol=1e-9)


def test_ovr_label_guard_is_bounded(spark):
    """>100 distinct labels refuse BEFORE the label set materializes: the
    distinct probe is LIMIT 101 (round-6 verdict finding #2), so a
    mistakenly high-cardinality label column (e.g. a URL) never collects
    its full value set to the driver."""
    rows = [(i, f"some text {i}", f"https://example.com/page/{i}") for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, text string, label string")
    with pytest.raises(ValueError, match="more than 100 classes"):
        qc.train_text_classifier_ovr(df, "label", num_buckets=NB, epochs=1)


def test_sampled_training_still_separates_marker(spark):
    """train-small/score-big: training on a deterministic Lehmer-hash
    sample (train_fraction / max_train_docs) still separates the planted
    marker when scored over the FULL corpus, and the sample is replayable
    (same weights on re-run)."""
    base = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (i, base + (" marker" if i % 3 == 0 else " filler"), 1 if i % 3 == 0 else 0)
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, label int")
    kw = dict(num_buckets=256, epochs=15, lr=2.0, feature="count", train_fraction=0.4)
    w1, b1 = qc.train_text_classifier(df, "label", **kw)
    w2, b2 = qc.train_text_classifier(df, "label", **kw)
    # deterministic sample + deterministic GD (within-bucket float
    # summation order is the only wiggle — same tolerance as the parity test)
    assert b1 == pytest.approx(b2, abs=1e-9)
    assert np.allclose(np.asarray(w1), np.asarray(w2), atol=1e-9)
    got = {
        r["doc_id"]: r["quality_prob"]
        for r in qc.classifier_score(df, w1, b1, feature="count").collect()
    }
    pos = [got[i] for i in range(300) if i % 3 == 0]
    neg = [got[i] for i in range(300) if i % 3 != 0]
    assert min(pos) > 0.5 > max(neg), (min(pos), max(neg))
    # max_train_docs caps by the N smallest sample keys — a distributed
    # top-N, deterministic and partitioning-independent
    w3, b3 = qc.train_text_classifier(
        df, "label", num_buckets=256, epochs=15, lr=2.0, feature="count",
        max_train_docs=120,
    )
    w4, b4 = qc.train_text_classifier(
        df.repartition(7), "label", num_buckets=256, epochs=15, lr=2.0,
        feature="count", max_train_docs=120,
    )
    assert b3 == pytest.approx(b4, abs=1e-8)
    assert np.allclose(np.asarray(w3), np.asarray(w4), atol=1e-8)
    # missing id column refuses loudly
    with pytest.raises(ValueError, match="id column"):
        qc.train_text_classifier(
            df.drop("doc_id"), "label", num_buckets=NB, epochs=1, train_fraction=0.5
        )


def test_count_features_learn_a_planted_marker(spark):
    """The conditioning rationale for feature='count': a single marker
    token decides the class; count features separate it in a handful of
    epochs where mean features would need |w| ~ n_grams/Δ."""
    base = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (i, base + (" marker" if i % 3 == 0 else " filler"), 1 if i % 3 == 0 else 0)
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, label int")
    w, b = qc.train_text_classifier(
        df, "label", num_buckets=256, epochs=15, lr=2.0, feature="count"
    )
    got = {
        r["doc_id"]: r["quality_prob"]
        for r in qc.classifier_score(df, w, b, feature="count").collect()
    }
    pos = [got[i] for i in range(60) if i % 3 == 0]
    neg = [got[i] for i in range(60) if i % 3 != 0]
    assert min(pos) > 0.5 > max(neg), (min(pos), max(neg))


def test_trained_classifier_separates_planted_labels(spark, labeled):
    weights, bias = qc.train_text_classifier(
        labeled, "label", num_buckets=256, epochs=40, lr=2.0
    )
    got = {
        r["doc_id"]: r["quality_prob"]
        for r in qc.classifier_score(labeled, weights, bias, out_col="quality_prob").collect()
    }
    pos = [got[i] for i in range(len(_POS))]
    neg = [got[100 + i] for i in range(len(_NEG))]
    assert min(pos) > 0.5 > max(neg), (pos, neg)
    # and classifier_select keeps exactly the positive class at 0.5
    kept = qc.classifier_select(labeled, weights, bias, threshold=0.5)
    assert sorted(r["doc_id"] for r in kept.select("doc_id").collect()) == list(
        range(len(_POS))
    )


def test_score_null_empty_and_bias_only(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta"), (2, ""), (3, "   "), (4, None)],
        "doc_id long, text string",
    )
    w = [0.0] * NB
    got = {
        r["doc_id"]: r["quality_prob"]
        for r in qc.classifier_score(df, w, bias=1.0).collect()
    }
    sig1 = 1.0 / (1.0 + math.exp(-1.0))
    # zero weights: every non-NULL doc scores sigmoid(bias); NULL text -> NULL
    assert got[1] == pytest.approx(sig1, abs=1e-12)
    assert got[2] == pytest.approx(sig1, abs=1e-12)
    assert got[3] == pytest.approx(sig1, abs=1e-12)
    assert got[4] is None


def test_score_literal_equals_arrow(spark, labeled, monkeypatch):
    weights = qc.pseudo_weights(NB)
    lit = {
        r["doc_id"]: r["quality_prob"]
        for r in qc.classifier_score(labeled, weights, 0.25).collect()
    }
    monkeypatch.setattr(qc, "_LITERAL_MODEL_MAX", 1)
    arrow = {
        r["doc_id"]: r["quality_prob"]
        for r in qc.classifier_score(labeled, weights, 0.25).collect()
    }
    for d in lit:
        assert arrow[d] == pytest.approx(lit[d], abs=1e-12)


def test_training_literal_equals_arrow_path(spark, labeled, monkeypatch):
    w_lit, b_lit = qc.train_text_classifier(
        labeled, "label", num_buckets=NB, epochs=3, lr=1.0
    )
    monkeypatch.setattr(qc, "_LITERAL_MODEL_MAX", 1)
    w_ar, b_ar = qc.train_text_classifier(
        labeled, "label", num_buckets=NB, epochs=3, lr=1.0
    )
    assert b_ar == pytest.approx(b_lit, abs=1e-9)
    assert np.allclose(np.asarray(w_ar), np.asarray(w_lit), atol=1e-9)


def test_score_plan_zero_shuffle_no_python(spark, labeled):
    scored = qc.classifier_score(labeled, qc.pseudo_weights(NB), 0.0)
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan, plan


def test_xengine_score_matches_duckdb_twin(spark):
    import duckdb

    docs = "/root/testdata/sf0.001/documents.parquet"
    sdf = spark.read.parquet(docs)
    weights = qc.pseudo_weights(NB, scale=2.0)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{docs}'")
    for feature in ("mean", "count"):
        got = {
            r["doc_id"]: r["p"]
            for r in qc.classifier_score(
                sdf, weights, bias=-0.5, out_col="__p", use_xengine_hash=True,
                feature=feature,
            )
            .select("doc_id", F.round("__p", 6).alias("p"))
            .collect()
        }
        want = {
            d: p
            for d, p in con.execute(
                qc.classifier_score_oracle_sql(NB, bias=-0.5, scale=2.0, feature=feature)
            ).fetchall()
        }
        assert set(got) == set(want)
        for d in want:
            assert got[d] == pytest.approx(want[d], abs=1.5e-6), (feature, d)


def test_pseudo_weights_are_bounded_and_deterministic():
    w = qc.pseudo_weights(1000, scale=3.0)
    assert len(w) == 1000
    assert all(-3.0 <= x <= 3.0 for x in w)
    assert w == qc.pseudo_weights(1000, scale=3.0)
    # spread: not all one sign (a degenerate vector would make the
    # cross-engine twin trivially insensitive to the hash)
    assert any(x > 0 for x in w) and any(x < 0 for x in w)


def test_ovr_multiclass_separates_planted_vocab(spark):
    """3-class planted vocabularies: one-vs-rest training + argmax
    prediction recovers every training label; probabilities surface
    under the prefix; NULL text predicts NULL."""
    vocab = {
        "sci": "theorem proof lemma convergence bound entropy",
        "spam": "buy cheap deal offer prize winner",
        "news": "minister parliament election vote policy debate",
    }
    rows = []
    for ci, (lbl, words) in enumerate(sorted(vocab.items())):
        for i in range(8):
            ws = words.split()
            rows.append((ci * 100 + i, " ".join(ws[i % 3 :] + ws[: i % 3]), lbl))
    rows.append((999, None, None))
    df = spark.createDataFrame(rows, "doc_id long, text string, label string")
    models = qc.train_text_classifier_ovr(
        df, "label", num_buckets=256, epochs=30, lr=2.0
    )
    assert sorted(models) == ["news", "sci", "spam"]
    out = qc.classifier_predict_class(df, models, prob_prefix="p_")
    got = {r["doc_id"]: r for r in out.collect()}
    for d, _t, lbl in rows[:-1]:
        assert got[d]["predicted_class"] == lbl, (d, got[d])
        assert got[d][f"p_{lbl}"] > 0.5
    assert got[999]["predicted_class"] is None


def test_ovr_refuses_unbounded_label_sets(spark):
    df = spark.createDataFrame(
        [(i, "x y z", f"c{i}") for i in range(101)],
        "doc_id long, text string, label string",
    )
    with pytest.raises(ValueError, match="one-vs-rest"):
        qc.train_text_classifier_ovr(df, "label", num_buckets=16, epochs=1)


def test_ovr_binary_model_matches_direct_training(spark, labeled):
    """Each OvR member IS train_text_classifier on (label == class)."""
    df = labeled.withColumn("cls", F.when(F.col("label") == 1, "good").otherwise("bad"))
    models = qc.train_text_classifier_ovr(df, "cls", num_buckets=NB, epochs=3, lr=0.5)
    w_direct, b_direct = qc.train_text_classifier(
        df, F.col("cls") == "good", num_buckets=NB, epochs=3, lr=0.5
    )
    w_ovr, b_ovr = models["good"]
    assert b_ovr == pytest.approx(b_direct, abs=1e-12)
    assert np.allclose(np.asarray(w_ovr), np.asarray(w_direct), atol=1e-12)


def test_predict_class_single_featurization_and_arrow_identity(spark, monkeypatch):
    """The multiclass scorer featurizes once: exactly ONE split() in the
    literal plan regardless of class count; forcing the Arrow path yields
    identical predictions and margins."""
    rows = [
        (1, "theorem proof lemma", "sci"),
        (2, "buy cheap prize", "spam"),
        (3, "minister vote policy", "news"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, label string")
    models = qc.train_text_classifier_ovr(df, "label", num_buckets=NB, epochs=15, lr=2.0)
    out = qc.classifier_predict_class(df, models, prob_prefix="p_")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert plan.count("split(text") <= 1, plan
    lit = {r["doc_id"]: (r["predicted_class"], round(r["p_sci"], 9)) for r in out.collect()}
    monkeypatch.setattr(qc, "_LITERAL_MODEL_MAX", 1)
    arrow = {
        r["doc_id"]: (r["predicted_class"], round(r["p_sci"], 9))
        for r in qc.classifier_predict_class(df, models, prob_prefix="p_").collect()
    }
    assert arrow == lit
    # mixed num_buckets refuses
    bad = dict(models)
    bad["sci"] = ([0.0] * (NB * 2), 0.0)
    with pytest.raises(ValueError, match="num_buckets"):
        qc.classifier_predict_class(df, bad)


def test_predict_class_handles_dotted_labels(spark):
    """Domain labels routinely contain dots (en.wikipedia.org) — internal
    margin columns are index-named so F.col never parses a label as
    struct access."""
    rows = [
        (1, "theorem proof lemma", "en.wikipedia.org"),
        (2, "buy cheap prize", "spam.example.com"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, label string")
    models = qc.train_text_classifier_ovr(df, "label", num_buckets=NB, epochs=15, lr=2.0)
    out = qc.classifier_predict_class(df, models).collect()
    got = {r["doc_id"]: r["predicted_class"] for r in out}
    assert got == {1: "en.wikipedia.org", 2: "spam.example.com"}


def test_ovr_rare_class_survives_sampling(spark):
    """Round-7 advisory: the distinct-label probe runs on the UNSAMPLED
    docs, so a class whose every row falls outside the training sample
    still gets a model entry (and prediction can emit that label's
    probability) instead of silently vanishing from the dict."""
    rows = [(i, "common words here", "big") for i in range(40)]
    # one rare-class doc with a doc_id chosen to fall OUTSIDE the
    # max_train_docs=10 sample for the seeded Lehmer ranking (any id works:
    # with 41 docs and a 10-doc cap the rare doc is likely excluded; pin it
    # by trying ids until the sample misses it)
    from clickhousedatamocker_spark.operators.classifier import _sample_training_docs

    rare_id = None
    for cand in range(1000, 1100):
        df = spark.createDataFrame(
            rows + [(cand, "rare vocabulary", "tiny")],
            "doc_id long, text string, label string",
        )
        sampled_ids = {
            r["doc_id"]
            for r in _sample_training_docs(df, None, 10, "doc_id").collect()
        }
        if cand not in sampled_ids:
            rare_id = cand
            break
    assert rare_id is not None
    df = spark.createDataFrame(
        rows + [(rare_id, "rare vocabulary", "tiny")],
        "doc_id long, text string, label string",
    )
    models = qc.train_text_classifier_ovr(
        df, "label", num_buckets=64, epochs=2, max_train_docs=10
    )
    assert sorted(models) == ["big", "tiny"]
