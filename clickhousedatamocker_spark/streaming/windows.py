"""Event-time window aggregations, batch/stream polymorphic.

Each helper is a plain DataFrame transform built only from built-in
operators (``F.window`` / ``F.session_window`` + hash aggregation), so:

- applied to ``spark.readStream...`` it is an incremental, watermarked,
  late-data-correct streaming aggregation (state store backed);
- applied to a batch DataFrame it is an ordinary groupBy — which is what
  the DuckDB oracle checks (queries/streaming_q.py registers batch-mode
  equivalents of each).

Watermarks bound state at scale: a 100 TB/day stream with a 2-hour
watermark keeps only ~2h of window state per key in the store. Watermarks
are a no-op on batch inputs, so the same function serves both.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _maybe_watermark(df: DataFrame, ts_col: str, watermark: str | None) -> DataFrame:
    if watermark and df.isStreaming:
        return df.withWatermark(ts_col, watermark)
    return df


def tumbling_counts(
    events: DataFrame,
    ts_col: str = "ts",
    duration: str = "1 hour",
    watermark: str | None = "2 hours",
    group_cols: list[str] | None = None,
    aggs: list[Column] | None = None,
) -> DataFrame:
    """Non-overlapping fixed windows: count + sum(value) per window
    (per extra group col if given)."""
    df = _maybe_watermark(events, ts_col, watermark)
    aggs = aggs or [F.count(F.lit(1)).alias("n_events")]
    keys = [F.window(ts_col, duration).alias("w"), *(group_cols or [])]
    out = df.groupBy(*keys).agg(*aggs)
    return out.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        *[c for c in out.columns if c != "w"],
    )


def sliding_counts(
    events: DataFrame,
    ts_col: str = "ts",
    duration: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str | None = "2 hours",
    aggs: list[Column] | None = None,
) -> DataFrame:
    """Overlapping windows (each event lands in duration/slide windows)."""
    df = _maybe_watermark(events, ts_col, watermark)
    aggs = aggs or [F.count(F.lit(1)).alias("n_events")]
    out = df.groupBy(F.window(ts_col, duration, slide).alias("w")).agg(*aggs)
    return out.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        *[c for c in out.columns if c != "w"],
    )


def stream_incremental_near_dedup(
    spark,
    stream_df,
    index_path: str,
    sink_path: str,
    checkpoint: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
):
    """Always-on crawl ingest with near-dup admission: each micro-batch is
    checked against the persisted MinHash index (operators/dedup.py
    build_dedup_index) AND against itself (the same page fetched twice in
    one batch keeps only the smallest id); survivors append to the sink
    and to the index — so later batches dedup against earlier ones.

    Delivery semantics: the SINK write is idempotent under epoch retries —
    rows land in an ``__epoch=<id>`` partition written with dynamic
    partition overwrite, so a foreachBatch re-run replaces its own epoch
    instead of duplicating it. The index append is at-least-once (a retry
    may re-append the same signatures); duplicate index entries are
    semantically harmless for admission — they produce the same rejections
    — at the cost of index bloat, and they never reach the sink.

    Cost: the batch's signatures are computed ONCE (persisted across the
    index check, the self check, and the index append); the index is
    scanned, never shuffled (the batch side broadcasts), matching the
    offline operator's plan discipline. Returns the StreamingQuery.
    """
    from clickhousedatamocker_spark.operators.dedup import (
        build_dedup_index,
        incremental_dedup_pairs,
        load_dedup_params,
        minhash_signatures,
        signature_est_pairs,
    )

    def admit(batch_df, epoch_id):
        params = load_dedup_params(index_path)
        num_hashes, bands, n = params["num_hashes"], params["bands"], params["n"]
        batch_df = batch_df.persist()
        sig = minhash_signatures(batch_df, id_col, text_col, num_hashes, n).persist()
        try:
            index_dups = incremental_dedup_pairs(
                spark, index_path, batch_df, id_col, text_col, threshold, signatures=sig
            ).select(F.col("new_id").alias(id_col))
            # within-batch: of each near-dup pair keep the smaller id
            self_dups = signature_est_pairs(
                sig, sig, num_hashes, bands, id_col, threshold, self_pairs=True
            ).select(F.col("id_b").alias(id_col))
            dup_ids = index_dups.unionByName(self_dups).distinct()
            fresh = batch_df.join(dup_ids, id_col, "left_anti").persist()
            try:
                fresh.withColumn("__epoch", F.lit(int(epoch_id))).write.option(
                    "partitionOverwriteMode", "dynamic"
                ).mode("overwrite").partitionBy("__epoch").parquet(sink_path)
                fresh_sig = sig.join(fresh.select(id_col), id_col, "left_semi")
                build_dedup_index(
                    fresh, index_path, id_col, text_col, num_hashes, bands, n,
                    mode="append", signatures=fresh_sig,
                )
            finally:
                fresh.unpersist()
        finally:
            sig.unpersist()
            batch_df.unpersist()

    return (
        stream_df.writeStream.foreachBatch(admit)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def stream_exact_dedup(
    events: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """Exactly-once-by-key over a stream: the streaming member of the dedup
    ladder (operators/dedup.py). ``dropDuplicatesWithinWatermark`` keeps
    per-key state only until the watermark passes — state is O(keys within
    the watermark horizon), not O(stream) — which is the only form that
    survives an unbounded 100 TB/day stream. On a batch DataFrame this is
    plain ``dropDuplicates`` (its batch semantics)."""
    if events.isStreaming:
        return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)
    return events.dropDuplicates(keys)


def session_agg(
    events: DataFrame,
    ts_col: str = "ts",
    gap: str = "10 minutes",
    key_col: str = "user_id",
    watermark: str | None = "2 hours",
    aggs: list[Column] | None = None,
) -> DataFrame:
    """Dynamic-gap session windows per key (``F.session_window``): a session
    extends while consecutive events arrive within ``gap``."""
    df = _maybe_watermark(events, ts_col, watermark)
    aggs = aggs or [F.count(F.lit(1)).alias("n_events")]
    out = df.groupBy(F.session_window(ts_col, gap).alias("w"), key_col).agg(*aggs)
    return out.select(
        F.col("w.start").alias("session_start"),
        F.col("w.end").alias("session_end"),
        *[c for c in out.columns if c != "w"],
    )


def stream_embedding_near_dup_admission(
    spark,
    stream_df,
    index_path: str,
    sink_path: str,
    checkpoint: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    nprobe: int = 4,
    self_planes: int = 4,
    self_tables: int = 8,
    dim: int = 64,
):
    """Always-on embedding-level near-dup admission — the semantic sibling
    of :func:`stream_incremental_near_dedup`: each micro-batch queries the
    persisted IVF ANN index (operators/similarity.py build_ann_index) for
    its nearest existing neighbor and is rejected at cosine ≥ threshold;
    within-batch near-dups keep the smallest id (OR-amplified LSH blocking
    + exact verify — approximate by design, like the offline operator).
    Survivors append to the sink AND to the index (ann_index_add:
    codebook-pure assignment, O(batch)) so later batches dedup against
    earlier ones.

    Same delivery contract as the MinHash admission: idempotent
    epoch-partitioned sink (dynamic partition overwrite), at-least-once
    index append (duplicate index vectors re-produce the same rejections,
    never reach the sink). The index must exist (seed it from the initial
    corpus with build_ann_index) — its codebook, not the stream, defines
    the bucket geometry, so every batch pays zero training."""
    from clickhousedatamocker_spark.operators.similarity import (
        ann_index_add,
        ann_query_indexed,
        embedding_near_dup_pairs,
    )

    def admit(batch_df, epoch_id):
        batch_df = batch_df.persist()
        try:
            index_dups = (
                ann_query_indexed(
                    spark, index_path, batch_df, id_col, vec_col, k=1, nprobe=nprobe
                )
                .filter(F.col("cosine") >= threshold)
                .select(F.col("query_id").alias(id_col))
                .distinct()
            )
            self_dups = (
                embedding_near_dup_pairs(
                    batch_df, id_col, vec_col, threshold,
                    num_planes=self_planes, num_tables=self_tables, dim=dim,
                )
                .select(F.col("id_b").alias(id_col))
                .distinct()
            )
            dup_ids = index_dups.unionByName(self_dups).distinct()
            fresh = batch_df.join(dup_ids, id_col, "left_anti").persist()
            try:
                fresh.withColumn("__epoch", F.lit(int(epoch_id))).write.option(
                    "partitionOverwriteMode", "dynamic"
                ).mode("overwrite").partitionBy("__epoch").parquet(sink_path)
                ann_index_add(spark, index_path, fresh.select(id_col, vec_col), id_col, vec_col)
            finally:
                fresh.unpersist()
        finally:
            batch_df.unpersist()

    return (
        stream_df.writeStream.foreachBatch(admit)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def stream_bm25_index_maintenance(
    spark,
    stream_df,
    index_path: str,
    sink_path: str,
    checkpoint: str,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Always-on BM25 index maintenance — the retrieval member of the
    index-under-stream trio (MinHash dedup admission, ANN admission,
    BM25): each micro-batch of documents appends to the epoch-partitioned
    corpus sink AND into the persisted term-bucket postings index
    (operators/retrieval.py ``bm25_index_add``: O(batch) bucket append +
    lossless sidecar merge), so queries served from the index see every
    admitted document without ever paying a rebuild.

    Same delivery contract as the sibling wrappers: idempotent
    epoch-partitioned sink (dynamic partition overwrite). The index append
    is at-least-once — re-adding an epoch after a crash between sink write
    and index append would double those postings, so exactly-once
    deployments should stage per-epoch postings and reconcile; documented
    trade, identical to ann_index_add's contract. The index must exist
    (seed it with build_bm25_index) — its bucket count, not the stream,
    defines the partition geometry."""
    from clickhousedatamocker_spark.operators.retrieval import bm25_index_add

    def admit(batch_df, epoch_id):
        batch_df = batch_df.persist()
        try:
            batch_df.withColumn("__epoch", F.lit(int(epoch_id))).write.option(
                "partitionOverwriteMode", "dynamic"
            ).mode("overwrite").partitionBy("__epoch").parquet(sink_path)
            bm25_index_add(
                spark, index_path, batch_df.select(id_col, text_col), text_col, id_col
            )
        finally:
            batch_df.unpersist()

    return (
        stream_df.writeStream.foreachBatch(admit)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def stream_quality_gate(
    stream_df: DataFrame,
    weights: list[float],
    bias: float,
    threshold: float = 0.5,
    text_col: str = "text",
    feature: str = "mean",
    prob_col: str | None = None,
) -> DataFrame:
    """Pretrained-classifier admission over a document stream — the
    always-on form of the operators/classifier.py gate (train offline with
    ``train_text_classifier``, serve the frozen weights here).

    Scoring is a row-local projection (literal weight array small / Arrow
    broadcast large), so the streaming plan is STATELESS: no watermark, no
    state store, each micro-batch scores independently and the stream
    result equals the batch result on the same rows (law pinned by
    tests/test_streaming.py). Keep ``prob_col`` to land the probability
    with each admitted doc (audit trail); None drops it."""
    from clickhousedatamocker_spark.operators.classifier import classifier_score

    out = prob_col or "__qp"
    scored = classifier_score(
        stream_df, weights, bias, text_col, out, feature=feature
    ).filter(F.col(out) >= threshold)
    return scored if prob_col else scored.drop(out)
