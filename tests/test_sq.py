"""SQ8 scalar quantization (operators/sq.py): numpy parity of the encode
contract, round-trip error bound (half a step per dimension), compression
factor, recall of the asymmetric search, and plan shape."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from clickhousedatamocker_spark.operators import sq

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


@pytest.fixture(scope="module")
def model(spark, emb):
    return sq.sq_train(emb)


def test_sq_train_matches_numpy(spark, emb, model):
    X = np.vstack([np.asarray(r["embedding"], dtype=np.float64) for r in emb.collect()])
    assert np.allclose(model["lo"], X.min(axis=0), atol=1e-12)
    assert np.allclose(model["hi"], X.max(axis=0), atol=1e-12)


def test_sq_encode_matches_numpy_and_roundtrip_bound(spark, emb, model):
    lo = np.asarray(model["lo"])
    step = np.where(
        np.asarray(model["hi"]) > lo, (np.asarray(model["hi"]) - lo) / 255.0, 1.0
    )
    rows = sq.sq_decode(sq.sq_encode(emb, model), model).select(
        "vec_id", "embedding", "code", "vec"
    ).collect()
    assert rows
    for r in rows[:100]:
        x = np.asarray(r["embedding"], dtype=np.float64)
        want_codes = np.clip(np.round((x - lo) / step), 0, 255).astype(np.int64)
        got_codes = np.frombuffer(bytes(r["code"]), dtype=np.uint8).astype(np.int64)
        assert len(got_codes) == len(x)  # d bytes per vector: 8x vs float64
        # Spark's round() is HALF_UP, numpy's is banker's — allow the
        # boundary levels to differ by one code step
        assert np.abs(got_codes - want_codes).max() <= 1
        # the real contract: reconstruction error <= one step per dim
        err = np.abs(np.asarray(r["vec"]) - x)
        assert (err <= step + 1e-9).all()


def test_sq_topk_recall_vs_exact(spark, emb, model):
    from clickhousedatamocker_spark.operators.similarity import brute_force_topk

    codes = sq.sq_encode(emb, model).select("vec_id", "code")
    q = emb.filter(F.col("vec_id") < 5)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(emb, q, k=10).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in sq.sq_topk(codes, q, model, k=10).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.8, recall  # SQ8 is near-lossless vs PQ's 64x


def test_sq_extreme_codes_roundtrip(spark, model):
    """Bytes 0 and 255 survive the string-packing path: a vector pinned at
    the per-dimension lo encodes to all-NUL bytes (ISO-8859-1 strings keep
    NULs), a vector at hi to all-0xFF."""
    d = len(model["lo"])
    df = spark.createDataFrame(
        [(0, [float(x) for x in model["lo"]]), (1, [float(x) for x in model["hi"]])],
        "vec_id long, embedding array<double>",
    )
    rows = {r["vec_id"]: bytes(r["code"]) for r in sq.sq_encode(df, model).collect()}
    assert rows[0] == b"\x00" * d
    assert rows[1] == b"\xff" * d
    dec = {
        r["vec_id"]: list(r["vec"])
        for r in sq.sq_decode(sq.sq_encode(df, model), model).collect()
    }
    assert np.allclose(dec[0], model["lo"], atol=1e-9)
    # hi decodes exactly for non-degenerate dims (lo + 255*step == hi)
    hi_ok = [
        abs(g - h) < 1e-9
        for g, h, l in zip(dec[1], model["hi"], model["lo"])
        if h > l
    ]
    assert all(hi_ok) and hi_ok


def test_sq_paths_are_jvm_side(spark, emb, model):
    plan = (
        sq.sq_encode(emb, model)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "EvalPython" not in plan
    with pytest.raises(ValueError, match="no vectors"):
        sq.sq_train(emb.filter(F.lit(False)))


def test_sq_encode_input_contract(spark, model):
    """Round-7 advisory: NULL vectors and vectors with a NULL element
    encode to a NULL code (never a silently-shortened one); a vector whose
    length differs from the trained d fails loudly instead of decoding to
    a lo-filled tail."""
    d = len(model["lo"])
    ok = [0.5 * (l + h) for l, h in zip(model["lo"], model["hi"])]
    with_null_elem = list(ok)
    with_null_elem[3] = None
    df = spark.createDataFrame(
        [(0, ok), (1, None), (2, with_null_elem)],
        "vec_id long, embedding array<double>",
    )
    rows = {r["vec_id"]: r["code"] for r in sq.sq_encode(df, model).collect()}
    assert rows[0] is not None and len(bytes(rows[0])) == d
    assert rows[1] is None
    assert rows[2] is None

    short = spark.createDataFrame(
        [(0, [1.0, 2.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(Exception, match="vector length != trained d"):
        sq.sq_encode(short, model).collect()
