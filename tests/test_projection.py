"""PCA projection (operators/projection.py) + soft-dedup weights.

Verification strategy mirrors the PQ/classifier modules: the distributed
moment pass is pinned against a single-machine numpy PCA of the same
rows (1e-8), projection's literal and Arrow paths must agree exactly,
and plan/laws pin the scale shape (zero shuffle on the projection pass,
partitioning-independent training)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from clickhousedatamocker_spark.operators import projection as P

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def _numpy_pca(X, k):
    mean = X.mean(axis=0)
    cov = (X.T @ X) / X.shape[0] - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return mean, comps, evals[order]


def test_pca_train_matches_numpy(spark, emb):
    X = np.vstack(
        [np.asarray(r["embedding"], dtype=np.float64) for r in emb.collect()]
    )
    model = P.pca_train(emb, k=8)
    mean, comps, ev = _numpy_pca(X, 8)
    assert model["n"] == X.shape[0]
    assert np.allclose(model["mean"], mean, atol=1e-8)
    assert np.allclose(model["explained_variance"], ev, atol=1e-8)
    got = np.asarray(model["components"])
    # eigenvectors are unique up to sign; sign-fixing makes them comparable
    # directly unless an eigenvalue is (near-)degenerate — compare via
    # absolute dot products, which also catches ordering mistakes
    dots = np.abs((got @ comps.T).diagonal())
    assert np.allclose(dots, 1.0, atol=1e-6), dots


def test_pca_train_is_partitioning_independent(spark, emb):
    m1 = P.pca_train(emb, k=4)
    m2 = P.pca_train(emb.repartition(13), k=4)
    assert np.allclose(m1["mean"], m2["mean"], atol=1e-9)
    assert np.allclose(m1["explained_variance"], m2["explained_variance"], atol=1e-9)
    assert np.allclose(m1["components"], m2["components"], atol=1e-7)


def test_pca_project_literal_equals_arrow(spark, emb, monkeypatch):
    model = P.pca_train(emb, k=8)
    lit = {
        r["vec_id"]: r["projected"]
        for r in P.pca_project(emb, model).select("vec_id", "projected").collect()
    }
    monkeypatch.setattr(P, "_LITERAL_PCA_MAX", 0)  # force the Arrow path
    arr = {
        r["vec_id"]: r["projected"]
        for r in P.pca_project(emb, model).select("vec_id", "projected").collect()
    }
    assert lit.keys() == arr.keys()
    for k in lit:
        assert np.allclose(lit[k], arr[k], atol=1e-9)


def test_pca_projection_is_centered_numpy_exact(spark, emb):
    """projected == components @ (x - mean), checked row-for-row."""
    model = P.pca_train(emb, k=6)
    C = np.asarray(model["components"])
    mu = np.asarray(model["mean"])
    rows = P.pca_project(emb, model).select("vec_id", "embedding", "projected").collect()
    for r in rows[:50]:
        want = C @ (np.asarray(r["embedding"], dtype=np.float64) - mu)
        assert np.allclose(r["projected"], want, atol=1e-9)
    # k == output dim for every row
    assert all(len(r["projected"]) == 6 for r in rows)


def test_pca_projection_preserves_topk_neighbors_reasonably(spark, emb):
    """The use case: ANN over the projected space. With k=32 of 64 dims
    the top-10 cosine neighbors of a query should substantially survive
    projection (recall >= 0.5 on the fixture — PCA keeps the dominant
    variance directions)."""
    from clickhousedatamocker_spark.operators.similarity import brute_force_topk

    model = P.pca_train(emb, k=32)
    proj = P.pca_project(emb, model).select(
        "vec_id", F.col("projected").alias("embedding")
    )
    q_raw = emb.filter(F.col("vec_id") < 3)
    q_proj = proj.filter(F.col("vec_id") < 3)
    raw = brute_force_topk(emb, q_raw, k=10)
    low = brute_force_topk(proj, q_proj, k=10)
    raw_n = {(r["query_id"], r["neighbor_id"]) for r in raw.collect()}
    low_n = {(r["query_id"], r["neighbor_id"]) for r in low.collect()}
    recall = len(raw_n & low_n) / len(raw_n)
    assert recall >= 0.5, recall


def test_pca_project_plan_zero_shuffle(spark, emb):
    model = P.pca_train(emb, k=4)
    plan = (
        P.pca_project(emb, model)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan  # literal path: no Python at all


def test_pca_validates(spark, emb):
    with pytest.raises(ValueError, match="k must be"):
        P.pca_train(emb, k=0)
    with pytest.raises(ValueError, match="exceeds embedding dim"):
        P.pca_train(emb, k=65)
    model = P.pca_train(emb, k=4)
    ratios = P.pca_explained_ratio(model)
    # normalized by the TRUE total variance (trace), not the retained top-k
    # mass: for k < d the cumulative ratio must stay strictly below 1.0
    expected_last = sum(model["explained_variance"]) / model["total_variance"]
    assert len(ratios) == 4 and ratios[-1] == pytest.approx(expected_last)
    assert ratios[-1] < 1.0
    assert all(b >= a - 1e-12 for a, b in zip(ratios, ratios[1:]))
    # full-rank model captures the whole trace
    full = P.pca_explained_ratio(P.pca_train(emb, k=64))
    assert full[-1] == pytest.approx(1.0, abs=1e-9)


def test_dedup_soft_weights_law(spark):
    """sum(weight) == n_singletons + n_clusters; members of one cluster
    share 1/size; singletons weigh exactly 1.0."""
    from clickhousedatamocker_spark.operators.dedup import dedup_soft_weights

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(10)], "doc_id long, text string"
    )
    # clusters: {0,1,2} (chain), {3,4}; singletons 5..9
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (3, 4)], "id_a long, id_b long"
    )
    got = {
        r["doc_id"]: r["dedup_weight"]
        for r in dedup_soft_weights(docs, pairs).collect()
    }
    assert len(got) == 10
    for i in (0, 1, 2):
        assert got[i] == pytest.approx(1 / 3)
    for i in (3, 4):
        assert got[i] == pytest.approx(1 / 2)
    for i in range(5, 10):
        assert got[i] == 1.0
    assert sum(got.values()) == pytest.approx(5 + 2)  # singletons + clusters
