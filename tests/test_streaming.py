"""Structured-Streaming tier tests.

Strategy: drive each streaming operator with a FILE source over the events
fixture split into 3 chunks (3 micro-batches via availableNow), land results
in a memory sink, and assert equality with the batch-mode run of the SAME
helper — the incremental == batch law that defines correct streaming aggs.
The rate-source ingest harness is exercised end-to-end with tiny thresholds.
"""

import os
import time

import pyspark.sql.functions as F
import pytest

from tests.conftest import SF_DIR


def _events(spark):
    from clickhousedatamocker_spark.sources.tables import load_table

    return load_table(spark, SF_DIR, "events")


@pytest.fixture(scope="module")
def chunked_events(spark, tmp_path_factory):
    """events fixture (ts converted to proper timestamps) written as 3
    parquet chunk-files in one dir — 3 micro-batches under availableNow."""
    d = str(tmp_path_factory.mktemp("stream_src"))
    ev = _events(spark)
    for i in range(3):
        ev.filter(F.pmod(F.col("event_id"), F.lit(3)) == i).coalesce(1).write.mode(
            "append"
        ).parquet(d)
    return d


def _run_stream(spark, src_dir, transform, out_name, schema, output_mode="complete"):
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src_dir)
    q = (
        transform(stream)
        .writeStream.format("memory")
        .queryName(out_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(out_name)


def _norm(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_tumbling_stream_equals_batch(spark, chunked_events):
    from clickhousedatamocker_spark.streaming.windows import tumbling_counts

    ev = _events(spark)
    fn = lambda df: tumbling_counts(df, ts_col="ts", duration="1 hour")  # noqa: E731
    got = _run_stream(spark, chunked_events, fn, "tumble_out", ev.schema)
    want = fn(ev)
    cols = ["window_start", "window_end", "n_events"]
    assert _norm(got, cols) == _norm(want, cols)


def test_sliding_stream_equals_batch(spark, chunked_events):
    from clickhousedatamocker_spark.streaming.windows import sliding_counts

    ev = _events(spark)
    fn = lambda df: sliding_counts(df, ts_col="ts", duration="1 hour", slide="30 minutes")  # noqa: E731
    got = _run_stream(spark, chunked_events, fn, "slide_out", ev.schema)
    cols = ["window_start", "window_end", "n_events"]
    assert _norm(got, cols) == _norm(fn(ev), cols)


def test_session_stream_equals_batch(spark, chunked_events):
    from clickhousedatamocker_spark.streaming.windows import session_agg

    ev = _events(spark)
    # watermark=None: the chunk files are NOT time-ordered, and session-window
    # state drops watermark-late input even in complete mode (unlike
    # tumbling/sliding, whose complete-mode state keeps all windows alive)
    fn = lambda df: session_agg(df, ts_col="ts", gap="10 minutes", key_col="user_id", watermark=None)  # noqa: E731
    got = _run_stream(spark, chunked_events, fn, "sess_out", ev.schema)
    cols = ["user_id", "session_start", "session_end", "n_events"]
    assert _norm(got, cols) == _norm(fn(ev), cols)


def test_stateful_running_profile(spark, chunked_events):
    from clickhousedatamocker_spark.streaming.stateful import (
        user_running_profile,
        user_running_profile_batch,
    )

    ev = _events(spark)
    sel = lambda df: user_running_profile(df.select("user_id", "ts", "value"))  # noqa: E731
    got = _run_stream(spark, chunked_events, sel, "state_out", ev.schema, output_mode="update")
    # update mode re-emits a row per user per batch; the LAST emission per
    # user carries the final running totals == the batch aggregation
    final = (
        got.groupBy("user_id")
        .agg(F.max(F.struct("n_events", "total_value", "first_ts", "last_ts")).alias("s"))
        .select("user_id", "s.n_events", "s.total_value", "s.first_ts", "s.last_ts")
    )
    want = user_running_profile_batch(ev.select("user_id", "ts", "value"))
    cols = ["user_id", "n_events", "first_ts", "last_ts"]
    assert _norm(final, cols) == _norm(want, cols)
    # float sums: compare with tolerance
    g = {r["user_id"]: r["total_value"] for r in final.collect()}
    w = {r["user_id"]: r["total_value"] for r in want.collect()}
    assert all(abs(g[u] - w[u]) < 1e-6 for u in w)


def test_stream_dedup_across_microbatches(spark, tmp_path):
    """Duplicated event_ids spanning micro-batches collapse to one row each
    (state persists across batches within the watermark)."""
    from clickhousedatamocker_spark.streaming.windows import stream_exact_dedup

    ev = _events(spark).limit(200)
    d = str(tmp_path / "dup_src")
    # chunk 1: all 200; chunk 2: the same 200 again (cross-batch duplicates)
    ev.coalesce(1).write.mode("append").parquet(d)
    ev.coalesce(1).write.mode("append").parquet(d)

    fn = lambda df: stream_exact_dedup(df, ["event_id"], ts_col="ts")  # noqa: E731
    got = _run_stream(spark, d, fn, "dedup_out", ev.schema, output_mode="append")
    assert got.count() == 200
    assert got.select("event_id").distinct().count() == 200
    # batch form agrees
    assert fn(ev.unionByName(ev)).count() == 200


def test_streaming_ingest_harness(spark, tmp_path):
    from clickhousedatamocker_spark.config import HarnessConfig
    from clickhousedatamocker_spark.streaming.ingest import run_streaming_harness

    cfg = HarnessConfig(
        batch_size=5000,
        parts_to_delay_insert=5,
        parts_to_throw_insert=10,
        insert_interval_s=1,
        base_time="2026-01-01 12:00:00",
    )
    t0 = time.monotonic()
    res = run_streaming_harness(spark, str(tmp_path / "wh"), cfg, timeout_s=90)
    assert res.batches >= 1
    assert res.rows_inserted > 0
    assert res.throw_triggered, res
    assert res.final_active_parts >= 10
    # checkpoint dir exists (restartable stream)
    assert os.path.isdir(str(tmp_path / "wh" / "_streaming_checkpoint"))
    assert time.monotonic() - t0 < 90


def test_attribution_join_stream_equals_batch(spark, tmp_path):
    """Stream-stream interval join (click->purchase attribution): 3
    time-ordered micro-batches produce the same pairs as the batch range
    join. Chunks are split by event time (not round-robin) because a
    stream-stream join legitimately drops rows later than the watermark —
    monotone chunking is how a real source delivers."""
    from clickhousedatamocker_spark.streaming.joins import attribution_join

    ev = _events(spark)
    d = str(tmp_path / "attr_src")
    b1, b2 = ev.selectExpr(
        "percentile_approx(ts, 0.33) p1", "percentile_approx(ts, 0.66) p2"
    ).first()
    for lo, hi in [(None, b1), (b1, b2), (b2, None)]:
        chunk = ev
        if lo is not None:
            chunk = chunk.filter(F.col("ts") > lo)
        if hi is not None:
            chunk = chunk.filter(F.col("ts") <= hi)
        chunk.coalesce(1).write.mode("append").parquet(d)

    fn = lambda df: attribution_join(df, df, lookback="30 minutes")  # noqa: E731
    got = _run_stream(spark, d, fn, "attr_out", ev.schema, output_mode="append")
    want = fn(ev)
    cols = ["user_id", "conv_ts", "conv_value", "attr_ts"]
    assert want.count() > 0  # non-vacuous: fixture contains attributable pairs
    assert _norm(got, cols) == _norm(want, cols)


def test_enrich_with_dim_stream_equals_batch(spark, chunked_events):
    """Stream-static enrichment: per-event dim lookup over 3 micro-batches
    equals the batch broadcast join, and the stream side is never shuffled."""
    from clickhousedatamocker_spark.streaming.joins import enrich_with_dim

    ev = _events(spark)
    dim = spark.createDataFrame(
        [(i, f"segment_{i % 4}") for i in range(200)], ["uid", "segment"]
    )
    fn = lambda df: enrich_with_dim(df, dim, "user_id", "uid").select(  # noqa: E731
        "event_id", "user_id", "segment"
    )
    got = _run_stream(spark, chunked_events, fn, "enrich_out", ev.schema, output_mode="append")
    want = fn(ev)
    cols = ["event_id", "user_id", "segment"]
    assert _norm(got, cols) == _norm(want, cols)

    plan = want._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan


def test_materialized_view_maintained_by_stream(spark, tmp_path, chunked_events):
    """MVs are maintained inside streaming ingest for free: foreachBatch
    routes through Engine.insert, so each micro-batch appends its rollup
    partials; the re-aggregated view equals the full-table rollup."""
    from clickhousedatamocker_spark.engine import Engine
    from clickhousedatamocker_spark.schema import TableSpec

    ev = _events(spark)
    engine = Engine(spark, str(tmp_path / "wh"))
    engine.create_table(TableSpec(name="ev_sink", schema=ev.schema))
    engine.sql(
        "CREATE MATERIALIZED VIEW mv_type_counts AS "
        "SELECT event_type, count() AS n, sum(value) AS tv FROM ev_sink GROUP BY event_type"
    )

    stream = spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1).parquet(chunked_events)
    q = (
        stream.writeStream.foreachBatch(lambda df, _eid: engine.insert("ev_sink", df) and None)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        r["event_type"]: (r["n"], round(r["tv"], 6))
        for r in engine.sql(
            "SELECT event_type, sum(n) AS n, sum(tv) AS tv FROM mv_type_counts GROUP BY event_type"
        ).collect()
    }
    want = {
        r["event_type"]: (r["n"], round(r["tv"], 6))
        for r in engine.sql(
            "SELECT event_type, count() AS n, sum(value) AS tv FROM ev_sink GROUP BY event_type"
        ).collect()
    }
    assert got == want and len(got) >= 3
    # partials from >1 micro-batch are visible pre-aggregation
    assert engine.sql("SELECT count(*) AS c FROM mv_type_counts").first()["c"] > len(got)


def test_stream_incremental_near_dedup(spark, tmp_path):
    """Crawl-ingest admission: micro-batch 2 repeats half of micro-batch 1's
    documents (new ids) — the repeats are dropped against the index the
    first batch appended, fresh docs pass, and the index grows so a THIRD
    batch repeating batch-2 content is also caught."""
    from clickhousedatamocker_spark.operators.dedup import build_dedup_index
    from clickhousedatamocker_spark.streaming.windows import stream_incremental_near_dedup

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")

    src = str(tmp_path / "src")
    # batch 1: docs 0-49 verbatim. batch 2: docs 100-149 (fresh) + copies of
    # docs 0-24 under new ids 500000+. batch 3: copies of docs 100-124 under
    # new ids 600000+ (dups only against what batch 2 added).
    b1 = docs.filter(F.col("doc_id") < 50)
    b2 = docs.filter((F.col("doc_id") >= 100) & (F.col("doc_id") < 150)).unionByName(
        docs.filter(F.col("doc_id") < 25).withColumn("doc_id", F.col("doc_id") + 500000)
    )
    b3 = docs.filter((F.col("doc_id") >= 100) & (F.col("doc_id") < 125)).withColumn(
        "doc_id", F.col("doc_id") + 600000
    )
    for b in (b1, b2, b3):
        b.coalesce(1).write.mode("append").parquet(src)

    index = str(tmp_path / "index")
    sink = str(tmp_path / "sink")
    # seed an EMPTY index (schema + params) so batch 1 checks against nothing
    build_dedup_index(docs.limit(0), index)

    stream = spark.readStream.schema(docs.schema).option("maxFilesPerTrigger", 1).parquet(src)
    q = stream_incremental_near_dedup(
        spark, stream, index, sink, str(tmp_path / "ckpt"), threshold=0.9
    )
    q.awaitTermination(240)

    kept = {r["doc_id"] for r in spark.read.parquet(sink).select("doc_id").collect()}

    # stream == offline law: replaying the same batches through the offline
    # operators (index check + within-batch self check, like admit) yields
    # the identical set (deterministic hashes, no RNG)
    from clickhousedatamocker_spark.operators.dedup import (
        incremental_dedup_pairs,
        minhash_signatures,
        signature_est_pairs,
    )

    index2 = str(tmp_path / "index_offline")
    build_dedup_index(docs.limit(0), index2)
    expected = set()
    for b in (b1, b2, b3):
        sig = minhash_signatures(b, "doc_id", "text", 32, 3)
        dup_ids = {
            r["new_id"]
            for r in incremental_dedup_pairs(
                spark, index2, b, threshold=0.9, signatures=sig
            ).collect()
        } | {
            r["id_b"]
            for r in signature_est_pairs(
                sig, sig, 32, 8, "doc_id", 0.9, self_pairs=True
            ).collect()
        }
        fresh = b.filter(~F.col("doc_id").isin(list(dup_ids) or [-1]))
        expected |= {r["doc_id"] for r in fresh.select("doc_id").collect()}
        build_dedup_index(fresh, index2, mode="append")
    assert kept == expected

    # the planted cross-batch copies (ids >= 500000) were all rejected
    assert not any(d >= 500000 for d in kept), "cross-batch duplicates admitted"
    # batch 1 mostly admitted (the index was empty when it arrived; the few
    # drops are the fixture's NATURAL within-batch near-dups, e.g. doc 12,
    # which the self-dedup step correctly rejects in favor of a smaller id)
    assert len(kept & set(range(50))) >= 45
    # the index accumulated exactly the admitted docs
    idx_ids = {
        r["doc_id"]
        for r in spark.read.parquet(f"{index}/signatures").select("doc_id").collect()
    }
    assert idx_ids == kept


def test_stream_embedding_near_dup_admission(spark, tmp_path):
    """Semantic admission: batch 2 re-submits half of batch 1's vectors
    under new ids — rejected against the index batch 1 appended; fresh
    vectors pass; within-batch exact re-submissions keep the smallest id.
    Stream == offline law: replaying the batches through the offline
    operators yields the identical admitted set."""
    from clickhousedatamocker_spark.operators.similarity import (
        ann_index_add,
        ann_query_indexed,
        build_ann_index,
        embedding_near_dup_pairs,
        ivf_train,
    )
    from clickhousedatamocker_spark.streaming.windows import (
        stream_embedding_near_dup_admission,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select("vec_id", "embedding")
    seed = emb.filter(F.col("vec_id") < 100)
    codebook = ivf_train(seed, n_centroids=8, n_iters=2)

    # batch 1: vectors 100-149 + an exact within-batch clone of 100 as 900001.
    # batch 2: vectors 200-249 (fresh) + clones of 100-119 as 910000+ (dups
    # against what batch 1 added).
    b1 = emb.filter((F.col("vec_id") >= 100) & (F.col("vec_id") < 150)).unionByName(
        emb.filter(F.col("vec_id") == 100).withColumn("vec_id", F.lit(900001))
    )
    b2 = emb.filter((F.col("vec_id") >= 200) & (F.col("vec_id") < 250)).unionByName(
        emb.filter(F.col("vec_id") < 120)
        .filter(F.col("vec_id") >= 100)
        .withColumn("vec_id", F.col("vec_id") + 910000)
    )
    src = str(tmp_path / "esrc")
    for b in (b1, b2):
        b.coalesce(1).write.mode("append").parquet(src)

    index = str(tmp_path / "eindex")
    build_ann_index(seed, index, centroids=codebook)
    sink = str(tmp_path / "esink")
    stream = spark.readStream.schema(emb.schema).option("maxFilesPerTrigger", 1).parquet(src)
    q = stream_embedding_near_dup_admission(
        spark, stream, index, sink, str(tmp_path / "eckpt"), threshold=0.999
    )
    q.awaitTermination(240)
    kept = {r["vec_id"] for r in spark.read.parquet(sink).select("vec_id").collect()}

    # offline replay with the same primitives == the streamed result
    index2 = str(tmp_path / "eindex2")
    build_ann_index(seed, index2, centroids=codebook)
    expected = set()
    for b in (b1, b2):
        dup = {
            r["query_id"]
            for r in ann_query_indexed(spark, index2, b, k=1, nprobe=4)
            .filter(F.col("cosine") >= 0.999)
            .collect()
        } | {
            r["id_b"]
            for r in embedding_near_dup_pairs(
                b, threshold=0.999, num_planes=4, num_tables=8
            ).collect()
        }
        fresh = b.filter(~F.col("vec_id").isin(list(dup)))
        expected |= {r["vec_id"] for r in fresh.select("vec_id").collect()}
        ann_index_add(spark, index2, fresh)
    assert kept == expected
    # the planted dups were rejected; the fresh vectors admitted
    assert 900001 not in kept
    assert not any(v >= 910000 for v in kept)
    assert {v for v in kept if 200 <= v < 250} == set(range(200, 250))


def test_stream_bm25_index_maintenance(spark, tmp_path):
    """BM25 index under stream: three micro-batches append into a seeded
    index; the streamed index must answer queries IDENTICALLY to a one-shot
    build over (seed + all batches) — increment == one-shot, under the
    foreachBatch wrapper."""
    from clickhousedatamocker_spark.operators.retrieval import (
        bm25_query_indexed,
        build_bm25_index,
    )
    from clickhousedatamocker_spark.streaming.windows import stream_bm25_index_maintenance

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    seed = docs.filter(F.col("doc_id") < 20)
    b1 = docs.filter((F.col("doc_id") >= 20) & (F.col("doc_id") < 30))
    b2 = docs.filter((F.col("doc_id") >= 30) & (F.col("doc_id") < 40))
    b3 = docs.filter((F.col("doc_id") >= 40) & (F.col("doc_id") < 50))

    src = str(tmp_path / "src")
    for b in (b1, b2, b3):
        b.coalesce(1).write.mode("append").parquet(src)

    index = str(tmp_path / "bm25_idx")
    build_bm25_index(seed, index, n_buckets=16)

    stream = spark.readStream.schema(docs.schema).option("maxFilesPerTrigger", 1).parquet(src)
    q = stream_bm25_index_maintenance(
        spark, stream, index, str(tmp_path / "sink"), str(tmp_path / "ckpt")
    )
    q.awaitTermination(240)

    full_index = str(tmp_path / "bm25_full")
    build_bm25_index(docs.filter(F.col("doc_id") < 50), full_index, n_buckets=16)

    query = "the data model of system training"
    got = [tuple(r) for r in bm25_query_indexed(spark, index, query, k=10).collect()]
    want = [tuple(r) for r in bm25_query_indexed(spark, full_index, query, k=10).collect()]
    assert got == want and len(got) == 10
    # the sink holds exactly the streamed docs, epoch-partitioned
    sunk = spark.read.parquet(str(tmp_path / "sink"))
    assert sunk.count() == 30 and "__epoch" in sunk.columns


def test_stream_quality_gate_equals_batch(spark, tmp_path):
    """Stateless law: the pretrained classifier gate admits exactly the
    same docs under micro-batched streaming as in one batch pass — scoring
    is a row-local projection, so no state/watermark is involved."""
    from clickhousedatamocker_spark.operators.classifier import (
        train_text_classifier,
    )
    from clickhousedatamocker_spark.streaming.windows import stream_quality_gate

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    # plant a learnable marker (fixture text is label-free) and train offline
    labeled = docs.withColumn("__y", (F.col("doc_id") % 3 == 0).cast("int")).withColumn(
        "text",
        F.when(
            F.col("__y") == 1, F.concat("text", F.lit(" qmk qmk qmk"))
        ).otherwise(F.col("text")),
    )
    w, b = train_text_classifier(
        labeled, "__y", num_buckets=512, epochs=12, lr=0.08, l2=0.02, feature="count"
    )
    planted = labeled.drop("__y")

    src = str(tmp_path / "src")
    for lo, hi in ((0, 15), (15, 30), (30, 50)):
        planted.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi)).coalesce(
            1
        ).write.mode("append").parquet(src)
    batch_in = spark.read.parquet(src)

    stream = (
        spark.readStream.schema(batch_in.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    sink = str(tmp_path / "sink")
    q = (
        stream_quality_gate(stream, w, b, feature="count", prob_col="p")
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)

    got = {
        (r["doc_id"], round(r["p"], 9))
        for r in spark.read.parquet(sink).collect()
    }
    want = {
        (r["doc_id"], round(r["p"], 9))
        for r in stream_quality_gate(batch_in, w, b, feature="count", prob_col="p").collect()
    }
    assert got == want and len(got) > 0


def test_stream_pack_token_sequences_equals_batch_full_sequences(spark, tmp_path):
    """Continuous packing law: when batches arrive in id order, the
    streamed operator emits EXACTLY the batch layout's full sequences
    (same shard assignment, same in-shard order), withholding only each
    shard's final partial tail in state — so a continuous corpus build
    loses nothing at micro-batch boundaries."""
    from clickhousedatamocker_spark.operators.corpus import pack_token_sequences
    from clickhousedatamocker_spark.streaming.stateful import (
        stream_pack_token_sequences,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    # 3 id-ordered chunks -> 3 micro-batches in arrival == id order
    src = str(tmp_path / "pack_src")
    n = docs.count()
    for lo, hi in ((0, n // 3), (n // 3, 2 * n // 3), (2 * n // 3, 10**9)):
        (
            docs.orderBy("doc_id")
            .filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
            .coalesce(1)
            .write.mode("append")
            .parquet(src)
        )

    got = _run_stream(
        spark,
        src,
        lambda df: stream_pack_token_sequences(df, seq_len=128, n_shards=4),
        "packed_stream",
        docs.schema,
        output_mode="append",
    )
    want = pack_token_sequences(docs, seq_len=128, n_shards=4).filter(
        F.col("n_tokens") == 128
    )
    got_rows = _norm(got, ["shard", "n_tokens", "text"])
    want_rows = _norm(want, ["shard", "n_tokens", "text"])
    assert got_rows == want_rows and got_rows
    # every emitted sequence is exactly seq_len; seq_ids run 0..k-1/shard
    per_shard = {}
    for r in got.collect():
        assert r["n_tokens"] == 128
        per_shard.setdefault(r["shard"], []).append(r["seq_id"])
    for ids in per_shard.values():
        assert sorted(ids) == list(range(len(ids)))


def test_stream_weighted_reservoir_equals_batch(spark, tmp_path):
    """The streaming A-ES reservoir reproduces the batch sampler exactly:
    every globally-selected row is in its shard's running top-n at all
    times (keys are static), so it is emitted at least once, and nothing
    emitted can outrank the true top-n — the global cut over all emitted
    rows equals weighted_sample on the same data. Also pins the bounded-
    state contract: no emission exceeds n rows per shard."""
    from clickhousedatamocker_spark.operators.corpus import weighted_sample
    from clickhousedatamocker_spark.streaming.stateful import stream_weighted_reservoir

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "n_chars"
    )
    src = str(tmp_path / "docs_chunks")
    for lo, hi in ((0, 170), (170, 340), (340, 10**9)):
        docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi)).coalesce(
            1
        ).write.mode("append").parquet(src)

    fn = lambda df: stream_weighted_reservoir(  # noqa: E731
        df, n=15, weight_col="n_chars", salt=2, n_shards=4
    )
    got = _run_stream(
        spark, src, fn, "reservoir_out", docs.schema, output_mode="update"
    )
    emitted = got.collect()
    assert emitted, "stream emitted nothing"
    # bounded state: each (shard) emission is at most n rows — count the
    # largest per-shard, per-key-set emission via distinct rows per shard
    per_shard = {}
    for r in emitted:
        per_shard.setdefault(r["shard"], set()).add(r["doc_id"])
    # a shard may emit more than n DISTINCT ids across batches (evictions),
    # but the final global cut must match the batch sampler:
    uniq = {}
    for r in emitted:
        uniq[r["doc_id"]] = r["aes_key"]
    top = sorted(uniq.items(), key=lambda t: (-t[1], t[0]))[:15]
    got_ids = sorted(d for d, _ in top)
    want_ids = sorted(
        r["doc_id"]
        for r in weighted_sample(docs, 15, weight_col="n_chars", salt=2).collect()
    )
    assert got_ids == want_ids


def test_stream_time_decayed_equals_batch(spark, tmp_path):
    """Streaming exponentialTimeDecayed* == the batch operator on the same
    rows when each key's events arrive in nondecreasing time order across
    micro-batches: state (five doubles at the frontier) carries exactly,
    so outputs match to float-association noise (segment boundaries
    differ between one full scan and three carry-seeded scans)."""
    import os
    import time as _time

    from clickhousedatamocker_spark.operators.ema import exponential_time_decayed
    from clickhousedatamocker_spark.streaming.stateful import stream_time_decayed

    ev = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .filter(F.col("user_id") <= 15)
        .select("user_id", "value", "ts")
    )
    lo, hi = [
        r["p"]
        for r in ev.selectExpr(
            "explode(percentile(unix_timestamp(ts), array(0.33, 0.66))) AS p"
        ).collect()
    ]
    src = str(tmp_path / "ev_time_chunks")
    t_ev = F.unix_timestamp("ts")
    chunks = [t_ev <= lo, (t_ev > lo) & (t_ev <= hi), t_ev > hi]
    stamped: set[str] = set()
    for i, cond in enumerate(chunks):
        ev.filter(cond).coalesce(1).write.mode("append").parquet(src)
        # strictly increasing mtimes: FileStreamSource must discover the
        # chunks in time order for the operator's ordered-arrival contract
        for f in os.listdir(src):
            p = os.path.join(src, f)
            if p not in stamped and not f.startswith("_"):
                os.utime(p, (_time.time() - 100 + i * 10,) * 2)
                stamped.add(p)

    x = 1800.0
    fn = lambda df: stream_time_decayed(df, x, "value", "ts", "user_id")  # noqa: E731
    got = _run_stream(spark, src, fn, "etd_stream_out", ev.schema, output_mode="append")
    want = exponential_time_decayed(
        ev.withColumn("t", F.unix_timestamp("ts").cast("double")),
        x, "value", "t", ["user_id"],
    )
    g = sorted(
        (r["key"], r["t"], r["v"], r["etd_sum"], r["etd_count"], r["etd_avg"], r["etd_max"])
        for r in got.collect()
    )
    w = sorted(
        (r["user_id"], r["t"], r["value"], r["etd_sum"], r["etd_count"], r["etd_avg"], r["etd_max"])
        for r in want.collect()
    )
    assert len(g) == len(w) and len(g) > 0
    for a, b in zip(g, w):
        assert a[0] == b[0] and a[1] == b[1]
        assert a[2] == pytest.approx(b[2], rel=1e-12)
        for i in range(3, 7):
            assert a[i] == pytest.approx(b[i], rel=1e-9), (a[0], a[1], i)


def test_stream_time_decayed_drops_late_rows(spark, tmp_path):
    """A row older than its key's processed frontier is dropped (no exact
    answer exists for it with O(1) state) — everything else still matches
    the batch operator run WITHOUT the late row."""
    import os
    import time as _time

    from clickhousedatamocker_spark.operators.ema import exponential_time_decayed
    from clickhousedatamocker_spark.streaming.stateful import stream_time_decayed

    on_time = spark.createDataFrame(
        [(1, 10.0, 100.0), (1, 20.0, 200.0)], "user_id long, value double, ts double"
    )
    late = spark.createDataFrame(
        [(1, 99.0, 150.0), (1, 5.0, 250.0)], "user_id long, value double, ts double"
    )
    src = str(tmp_path / "late_chunks")
    stamped: set[str] = set()
    for i, df in enumerate((on_time, late)):
        df.coalesce(1).write.mode("append").parquet(src)
        for f in os.listdir(src):
            p = os.path.join(src, f)
            if p not in stamped and not f.startswith("_"):
                os.utime(p, (_time.time() - 100 + i * 10,) * 2)
                stamped.add(p)

    fn = lambda df: stream_time_decayed(df, 50.0, "value", "ts", "user_id")  # noqa: E731
    got = _run_stream(
        spark, src, fn, "etd_late_out", on_time.schema, output_mode="append"
    )
    rows = {r["t"]: r for r in got.collect()}
    assert set(rows) == {100.0, 200.0, 250.0}  # the t=150 late row is gone
    keep = on_time.unionByName(
        spark.createDataFrame([(1, 5.0, 250.0)], on_time.schema)
    )
    want = {
        r["ts"]: r
        for r in exponential_time_decayed(keep, 50.0, "value", "ts", ["user_id"]).collect()
    }
    for t, r in rows.items():
        assert r["etd_sum"] == pytest.approx(want[t]["etd_sum"], rel=1e-9)
        assert r["etd_max"] == pytest.approx(want[t]["etd_max"], rel=1e-9)


def test_stream_time_decayed_null_time_rows_survive(spark, tmp_path):
    """Round-9 review finding: NULL-time rows must come back with NULL
    outputs (batch parity) — only LATE rows are dropped."""
    from clickhousedatamocker_spark.streaming.stateful import stream_time_decayed

    df = spark.createDataFrame(
        [(1, 10.0, 100.0), (1, 7.0, None), (1, 20.0, 200.0)],
        "user_id long, value double, ts double",
    )
    src = str(tmp_path / "nullt_chunks")
    df.coalesce(1).write.parquet(src)
    fn = lambda d: stream_time_decayed(d, 50.0, "value", "ts", "user_id")  # noqa: E731
    got = _run_stream(spark, src, fn, "etd_nullt_out", df.schema, output_mode="append")
    rows = got.collect()
    assert len(rows) == 3
    nt = [r for r in rows if r["t"] is None]
    assert len(nt) == 1 and nt[0]["v"] == 7.0
    for c in ("etd_sum", "etd_count", "etd_avg", "etd_max"):
        assert nt[0][c] is None
