"""Index deletes (tombstones) + crash recovery (operators/index_maint.py).

Round-7 verdict task 5: real pipelines remove documents (takedowns,
re-crawls); every incremental index needs delete → query-excludes →
compact → files-drop. And the round-7 advisory: leftover .trash.* /
.compact.* artifacts from an interrupted compaction must self-heal on the
next access instead of silently dropping a bucket from whole-index reads.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from clickhousedatamocker_spark.operators.index_maint import (
    _IndexFS,
    index_file_stats,
    optimize_index,
    read_tombstones,
    recover_index,
)


def _docs(spark, start, n):
    rows = [
        (i, f"alpha beta gamma shared doc{i} tok{i % 7} corpus words more text")
        for i in range(start, start + n)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _vecs(spark, start, n, d=8):
    rng = np.random.default_rng(7)
    rows = [(i, [float(x) for x in rng.normal(size=d)]) for i in range(start, start + n)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


# ------------------------------------------------------------------- BM25
def test_bm25_delete_excludes_then_purges(spark, tmp_path):
    from clickhousedatamocker_spark.operators.retrieval import (
        bm25_index_delete,
        bm25_query_indexed,
        build_bm25_index,
    )

    path = str(tmp_path / "bm25del")
    build_bm25_index(_docs(spark, 0, 20), path, n_buckets=4)
    before = {r["doc_id"] for r in bm25_query_indexed(spark, path, "alpha shared", k=30).collect()}
    assert {3, 7} <= before
    assert bm25_index_delete(spark, path, [3, 7]) == 2
    after = {r["doc_id"] for r in bm25_query_indexed(spark, path, "alpha shared", k=30).collect()}
    assert after == before - {3, 7}
    # compaction purges physically and clears the tombstone set
    res = optimize_index(spark, path)
    assert res["tombstones_purged"] == 2
    assert read_tombstones(spark, path) is None
    assert spark.read.parquet(path).filter(F.col("doc_id").isin([3, 7])).count() == 0
    again = {r["doc_id"] for r in bm25_query_indexed(spark, path, "alpha shared", k=30).collect()}
    assert again == after


# -------------------------------------------------------------------- ANN
def test_ann_delete_excludes_then_purges(spark, tmp_path):
    from clickhousedatamocker_spark.operators.similarity import (
        ann_index_delete,
        ann_query_indexed,
        build_ann_index,
    )

    path = str(tmp_path / "anndel")
    build_ann_index(_vecs(spark, 0, 60), path, n_centroids=4)
    q = _vecs(spark, 0, 60).filter(F.col("vec_id") < 2)
    before = {
        (r["query_id"], r["neighbor_id"])
        for r in ann_query_indexed(spark, path, q, k=5, nprobe=4).collect()
    }
    victims = sorted({n for _, n in before})[:2]
    assert ann_index_delete(spark, path, victims) == 2
    after = {
        (r["query_id"], r["neighbor_id"])
        for r in ann_query_indexed(spark, path, q, k=5, nprobe=4).collect()
    }
    assert not any(n in victims for _, n in after)
    res = optimize_index(spark, path)
    assert res["tombstones_purged"] == 2
    assert spark.read.parquet(path).filter(F.col("vec_id").isin(victims)).count() == 0
    # files bounded after the purge-rewrite
    assert index_file_stats(spark, path).agg(F.max("n_files")).first()[0] <= 1


# ----------------------------------------------------------------- MinHash
def test_dedup_index_delete_stops_matching(spark, tmp_path):
    """A tombstoned doc must stop matching future batches: incremental
    admission against the index pairs a fresh near-dup only with LIVE
    index entries."""
    from clickhousedatamocker_spark.operators.dedup import (
        build_dedup_index,
        dedup_index_delete,
        incremental_dedup_pairs,
        read_index_signatures,
    )

    base = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog again and again"),
            (2, "completely unrelated content about spark query planning"),
        ],
        "doc_id long, text string",
    )
    path = str(tmp_path / "mhdel")
    build_dedup_index(base, path)
    batch = spark.createDataFrame(
        [(10, "the quick brown fox jumps over the lazy dog again and again")],
        "doc_id long, text string",
    )
    hits = incremental_dedup_pairs(spark, path, batch, threshold=0.5)
    assert {(r["index_id"], r["new_id"]) for r in hits.collect()} == {(1, 10)}
    assert dedup_index_delete(spark, path, [1]) == 1
    assert incremental_dedup_pairs(spark, path, batch, threshold=0.5).count() == 0
    assert read_index_signatures(spark, path).count() == 1  # doc 2 only
    res = optimize_index(spark, path)
    assert res["tombstones_purged"] == 1
    import os

    assert spark.read.parquet(os.path.join(path, "signatures")).count() == 1


# ------------------------------------------------------------ crash repair
def test_recover_restores_missing_bucket_from_trash(spark, tmp_path):
    """Crash between the two swap renames leaves the leaf missing and a
    .trash.* sibling: a whole-index read would silently drop the bucket
    (round-7 advisory); the next access restores it."""
    from clickhousedatamocker_spark.operators.retrieval import (
        bm25_query_indexed,
        build_bm25_index,
    )

    path = str(tmp_path / "bm25crash")
    build_bm25_index(_docs(spark, 0, 20), path, n_buckets=4)
    full = sorted(
        tuple(r) for r in bm25_query_indexed(spark, path, "alpha shared", k=30).collect()
    )
    fs = _IndexFS(spark, path)
    leaf = f"{path}/bucket=1"
    fs.rename(leaf, f"{path}/.trash.bucket=1.deadbeef")
    rep = recover_index(spark, path)
    assert rep["restored"] == 1 and fs.is_dir(leaf)
    # roll-forward case: trash left behind AFTER a completed swap
    fs.write_text(f"{path}/.trash.bucket=2.cafe0001/marker", "x")
    fs.write_text(f"{path}/.compact.bucket=2.cafe0001/part-0.parquet", "junk")
    rep = recover_index(spark, path)
    assert rep["dropped_trash"] == 1 and rep["dropped_staging"] == 1
    assert sorted(
        tuple(r) for r in bm25_query_indexed(spark, path, "alpha shared", k=30).collect()
    ) == full


def test_recover_replays_flat_layout_manifest(spark, tmp_path):
    """Flat-layout crash mid move-in: the manifest WAL replays the
    compaction to completion — never both generations, never a partial new
    one."""
    import json

    path = str(tmp_path / "flatidx")
    df = spark.createDataFrame([(i, i * 10) for i in range(40)], "id long, v long")
    for chunk in range(4):
        df.filter((F.col("id") % 4) == chunk).coalesce(1).write.mode("append").parquet(path)
    fs = _IndexFS(spark, path)
    # stage a compacted generation by hand, write the manifest, then
    # "crash" after moving only ONE new file in and deleting nothing
    staging = f"{str(tmp_path)}/.compact.flatidx.feed0001"
    spark.read.parquet(path).coalesce(1).write.mode("overwrite").parquet(staging)
    new_files = [n for n, d, _ in fs.listdir(staging) if n.endswith(".parquet")]
    old_files = [n for n, d, _ in fs.listdir(path) if n.endswith(".parquet")]
    manifest = f"{str(tmp_path)}/.compact-manifest.flatidx.feed0001"
    fs.write_text(
        manifest,
        json.dumps({"target": path, "staging": staging, "new": new_files, "old": old_files + ["_SUCCESS"]}),
    )
    fs.rename(f"{staging}/{new_files[0]}", f"{path}/{new_files[0]}")  # partial move
    rep = recover_index(spark, path)
    assert rep["replayed_manifests"] == 1
    assert not fs.exists(staging) and not fs.exists(manifest)
    got = sorted((r["id"], r["v"]) for r in spark.read.parquet(path).collect())
    assert got == [(i, i * 10) for i in range(40)]
    data_files = [n for n, d, _ in fs.listdir(path) if n.endswith(".parquet")]
    assert len(data_files) == len(new_files)


def test_stream_admission_respects_tombstones(spark, tmp_path):
    """Deletes propagate to the STREAMING admission path: a near-dup of a
    tombstoned index entry is admitted (the dead doc no longer matches),
    while a near-dup of a live entry stays rejected — the takedown
    semantics real crawl pipelines need."""
    from pyspark.sql import functions as F

    from clickhousedatamocker_spark.operators.dedup import (
        build_dedup_index,
        dedup_index_delete,
    )
    from clickhousedatamocker_spark.streaming.windows import (
        stream_incremental_near_dedup,
    )

    base = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog again and again"),
            (2, "completely unrelated content about spark query planning today"),
        ],
        "doc_id long, text string",
    )
    index = str(tmp_path / "mhidx")
    build_dedup_index(base, index)
    assert dedup_index_delete(spark, index, [1]) == 1

    src = str(tmp_path / "src")
    batch = spark.createDataFrame(
        [
            # near-dup of the TOMBSTONED doc 1 -> must now be admitted
            (10, "the quick brown fox jumps over the lazy dog again and again"),
            # near-dup of the LIVE doc 2 -> still rejected
            (11, "completely unrelated content about spark query planning today"),
        ],
        "doc_id long, text string",
    )
    batch.coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema(batch.schema).parquet(src)
    sink = str(tmp_path / "sink")
    q = stream_incremental_near_dedup(
        spark, stream, index, sink, str(tmp_path / "ckpt"), threshold=0.9
    )
    q.awaitTermination(240)
    kept = {r["doc_id"] for r in spark.read.parquet(sink).select("doc_id").collect()}
    assert kept == {10}


def test_optimize_refuses_mismatched_tombstone_column(spark, tmp_path):
    """A tombstone column the index schema doesn't carry would filter
    nothing while the tombstone set still cleared — the delete intent
    vanishing silently. optimize_index refuses loudly and keeps the
    tombstones."""
    from clickhousedatamocker_spark.operators.index_maint import write_tombstones
    from clickhousedatamocker_spark.operators.retrieval import build_bm25_index

    path = str(tmp_path / "bm25bad")
    build_bm25_index(_docs(spark, 0, 10), path, n_buckets=2)
    write_tombstones(spark, path, [1, 2], "wrong_id_col")
    with pytest.raises(ValueError, match="wrong_id_col"):
        optimize_index(spark, path)
    assert read_tombstones(spark, path) is not None  # intent preserved
