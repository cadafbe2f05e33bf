"""Index small-file compaction (operators/index_maint.py).

The steady-state contract (round-6 verdict "What's missing" #2): many
incremental appends accumulate tiny parquet files per bucket;
optimize_index rewrites each over-threshold leaf directory to a bounded
file count with the table-compaction atomic-swap discipline, and query
results are IDENTICAL before/after — compaction moves bytes, not rows.
"""

import pytest
from pyspark.sql import functions as F

from clickhousedatamocker_spark.operators.index_maint import (
    index_file_stats,
    optimize_index,
)

N_INCREMENTS = 50


def _docs(spark, start, n):
    rows = [
        (
            i,
            f"alpha beta gamma shared doc{i} tok{i % 7} corpus words more text",
        )
        for i in range(start, start + n)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bm25_index_compaction_steady_state(spark, tmp_path):
    """50 increments -> compact -> query identity + file count drops."""
    from clickhousedatamocker_spark.operators.retrieval import (
        bm25_index_add,
        bm25_index_stats,
        bm25_query_indexed,
        build_bm25_index,
    )

    path = str(tmp_path / "bm25idx")
    build_bm25_index(_docs(spark, 0, 10), path, n_buckets=8)
    for b in range(N_INCREMENTS):
        bm25_index_add(spark, path, _docs(spark, 100 + 4 * b, 4))

    query = "alpha shared tok3 corpus"
    before = sorted(
        tuple(r) for r in bm25_query_indexed(spark, path, query, k=25).collect()
    )
    files_before = index_file_stats(spark, path).agg(F.sum("n_files")).first()[0]
    assert files_before > 8, "increments should have accumulated small files"

    res = optimize_index(spark, path)
    assert res["dirs_compacted"] > 0
    assert res["files_after"] < res["files_before"] == files_before

    after = sorted(
        tuple(r) for r in bm25_query_indexed(spark, path, query, k=25).collect()
    )
    assert after == before and after, "compaction must not change query results"

    stats = bm25_index_stats(spark, path).collect()
    assert all(r["n_files"] == 1 for r in stats), stats
    # postings survived intact
    files_now = index_file_stats(spark, path).agg(F.sum("n_files")).first()[0]
    assert files_now == res["files_after"] <= 8


def test_minhash_index_compaction_steady_state(spark, tmp_path):
    """Append-mode signature growth -> compact -> incremental dedup
    identity + file count drops."""
    from clickhousedatamocker_spark.operators.dedup import (
        build_dedup_index,
        dedup_index_stats,
        incremental_dedup_pairs,
    )

    path = str(tmp_path / "dedupidx")
    build_dedup_index(_docs(spark, 0, 10), path)
    for b in range(N_INCREMENTS):
        build_dedup_index(_docs(spark, 100 + 4 * b, 4), path, mode="append")

    # a batch containing exact copies of indexed docs (ids shifted)
    batch = _docs(spark, 0, 5).withColumn("doc_id", F.col("doc_id") + 900000)
    before = sorted(
        (r["index_id"], r["new_id"], r["est_jaccard"])
        for r in incremental_dedup_pairs(spark, path, batch, threshold=0.5).collect()
    )
    assert before, "exact copies must match the index"

    s0 = dedup_index_stats(spark, path).first()
    assert s0["n_files"] > N_INCREMENTS // 2, "appends should accumulate files"
    res = optimize_index(spark, path)
    assert res["dirs_compacted"] == 1 and res["files_after"] < res["files_before"]

    after = sorted(
        (r["index_id"], r["new_id"], r["est_jaccard"])
        for r in incremental_dedup_pairs(spark, path, batch, threshold=0.5).collect()
    )
    assert after == before
    s1 = dedup_index_stats(spark, path).first()
    assert s1["n_signatures"] == s0["n_signatures"]  # rows conserved
    assert s1["n_files"] < s0["n_files"]


def test_ann_index_compaction_and_file_stats(spark, tmp_path):
    """ann_index_stats now reports per-bucket file counts; compaction
    preserves query results and drops counts to 1 per bucket."""
    from clickhousedatamocker_spark.operators.similarity import (
        ann_index_add,
        ann_index_stats,
        ann_query_indexed,
        build_ann_index,
        ivf_train,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    first = emb.filter(F.col("vec_id") % 2 == 0)
    cb = ivf_train(first, "vec_id", "embedding", 8, seed=42)
    path = str(tmp_path / "annidx")
    build_ann_index(first, path, n_centroids=8, centroids=cb)
    rest = emb.filter(F.col("vec_id") % 2 == 1)
    for chunk in range(10):
        ann_index_add(spark, path, rest.filter(F.col("vec_id") % 20 == 2 * chunk + 1))

    q = emb.filter(F.col("vec_id") < 5)
    before = sorted(
        tuple(r) for r in ann_query_indexed(spark, path, q, k=10, nprobe=3).collect()
    )
    s0 = ann_index_stats(spark, path).collect()
    assert any(r["n_files"] > 1 for r in s0)

    res = optimize_index(spark, path)
    assert res["files_after"] < res["files_before"]
    after = sorted(
        tuple(r) for r in ann_query_indexed(spark, path, q, k=10, nprobe=3).collect()
    )
    assert after == before and after

    s1 = ann_index_stats(spark, path).collect()
    assert all(r["n_files"] == 1 for r in s1)
    assert sum(r["n_vectors"] for r in s1) == sum(r["n_vectors"] for r in s0)


def test_bm25_auto_compact_keeps_files_bounded(spark, tmp_path):
    """auto_compact_at: the add path itself keeps every bucket under the
    threshold — no separate maintenance job — and queries stay identical."""
    from clickhousedatamocker_spark.operators.retrieval import (
        bm25_index_add,
        bm25_query_indexed,
        build_bm25_index,
    )
    from clickhousedatamocker_spark.operators.index_maint import (
        _IndexFS,
        _leaf_data_dirs,
        _parquet_files,
    )

    path = str(tmp_path / "bm25auto")
    build_bm25_index(_docs(spark, 0, 10), path, n_buckets=4)
    for b in range(12):
        bm25_index_add(spark, path, _docs(spark, 100 + 4 * b, 4), auto_compact_at=5)
    fs = _IndexFS(spark, path)
    assert all(len(_parquet_files(fs, d)) < 5 for d in _leaf_data_dirs(fs, path))
    got = bm25_query_indexed(spark, path, "alpha shared", k=60).count()
    assert got == 10 + 12 * 4  # every doc contains both terms

    import pytest as _pytest

    # an invalid knob refuses BEFORE any side effect: a post-write raise
    # would invite a retry that double-adds the batch's postings
    n_before = spark.read.parquet(path).count()
    with _pytest.raises(ValueError, match="auto_compact_at"):
        bm25_index_add(spark, path, _docs(spark, 900, 1), auto_compact_at=1)
    assert spark.read.parquet(path).count() == n_before


def test_optimize_index_validates(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        optimize_index(spark, str(tmp_path / "nope"))
    with pytest.raises(ValueError, match="max_files_per_dir"):
        optimize_index(spark, str(tmp_path), max_files_per_dir=0)


def test_parallel_compaction_matches_sequential(spark, tmp_path):
    """parallelism=4: leaves compact from a thread pool (per-leaf staging
    tags, independent renames) — same files-after bound and identical
    query results as the sequential pass."""
    from clickhousedatamocker_spark.operators.retrieval import (
        bm25_index_add,
        bm25_query_indexed,
        build_bm25_index,
    )

    paths = {}
    for mode in ("seq", "par"):
        path = str(tmp_path / f"bm25{mode}")
        build_bm25_index(_docs(spark, 0, 10), path, n_buckets=8)
        for b in range(10):
            bm25_index_add(spark, path, _docs(spark, 100 + 4 * b, 4))
        paths[mode] = path
    res_seq = optimize_index(spark, paths["seq"], parallelism=1)
    res_par = optimize_index(spark, paths["par"], parallelism=4)
    assert res_par["dirs_compacted"] == res_seq["dirs_compacted"]
    assert res_par["files_after"] == res_seq["files_after"]
    q = "alpha shared tok3 corpus"
    a = sorted(tuple(r) for r in bm25_query_indexed(spark, paths["seq"], q, k=30).collect())
    b = sorted(tuple(r) for r in bm25_query_indexed(spark, paths["par"], q, k=30).collect())
    assert a == b
    with pytest.raises(ValueError, match="parallelism"):
        optimize_index(spark, paths["par"], parallelism=0)
