#!/usr/bin/env python3
"""sf1 scale smoke — run the 7 graded TPC-H queries + MinHash-LSH dedup at
10x the bench scale factor and record the result in SCALE_SMOKE.md.

Why this exists (round-4 verdict, ask #7): "plans you'd want at 100x" was
argued from plan shape only (broadcast bans, exchange counts, pushdown
asserts). One actual decade of scale validates the claims empirically —
AQE coalescing/skew splits fire for real, the SHUFFLE_HASH q3/q5/q10 joins
have to move 6 M lineitem rows, and the MinHash bucket join sees 50 k docs.

Data: a deterministic 10x scale-up of /root/testdata/sf0.1 written to
$SPARK_GRAFT_SF1_DIR (default /tmp/spark_graft_sf1). We must not write to
/root/testdata, and the driver only generates sf<=0.1, so the decade is
derived, TPC-H-style:

- dimension tables (region, nation, customer, supplier, part) are copied
  unchanged — a real SF step grows facts ~linearly while dims grow slower;
  keeping dims fixed yields 10x fact rows per dim key, which is exactly the
  fan-in growth that stresses the join side we care about (the linear side).
- fact tables (orders, lineitem, events) are replicated 10x via a
  crossJoin with spark.range(10) — a single distributed op, no driver loop —
  with their unique keys shifted by replica*KEY_OFFSET so key uniqueness
  and FK integrity both hold (o_orderkey/l_orderkey shift together;
  custkey/suppkey/partkey stay in the original dim range).
- documents are replicated 10x with doc_id shifted AND a per-replica suffix
  token appended to the text, so the MinHash corpus is 10x *near*-dup
  structure rather than a degenerate pile of exact clones (exact clones
  would make every band bucket trivially dense and understate real work).
- embeddings are replicated 10x with id shifted (present for dir
  completeness; ANN is not part of this smoke).

Run:  python scale_smoke.py            # build (if absent) + smoke + report
      python scale_smoke.py --rebuild  # force data rebuild
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

KEY_OFFSET = 10_000_000  # > max sf0.1 orderkey (149 999) with headroom
REPLICAS = 10
DIMS = ("region", "nation", "customer", "supplier", "part")
SMOKE_KEYS = (
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q10_returned_items",
    "q18_large_volume_customers",
    "dedup_minhash_lsh_pairs",
    # LLM-op tier at a decade of scale: zero-shuffle text profiling, the
    # broadcast-query brute-force ANN baseline, and the cross-document
    # duplicated-span signal (its gram space grows with corpus tokens —
    # the stress case for the shuffle-hash gram join)
    "text_analysis_profile",
    "similarity_topk_bruteforce",
    "crossdoc_dup_span_profile",
    # the span-REMOVAL sibling: same gram joins plus the per-doc
    # interval fold + token rebuild on the edited rows
    "dedup_span_removal_profile",
    # round-5 additions: SemDeDup (cluster count scales with the corpus, so
    # the 10x replica clones stress real dup-group collapse), DSIR (two
    # model-training shuffles + row-local scoring + global top-k), and the
    # BPE tokenizer (distributed word-count pass + Arrow encode)
    "dedup_semantic_profile",
    "dsir_selection_profile",
    # the TRAINED variant: scale interest is the distributed word-count
    # pass + merge learning (the graded bpe_tokenize_profile encodes under
    # a small fixed table — cheaper, but not the scaling story)
    "bpe_tokenize_trained_profile",
    # round-6: hybrid BM25+cosine RRF — the postings build is the linear
    # part (explode+agg over corpus tokens); fusion stays candidate-sized
    "hybrid_retrieval_rrf",
    # round-7 (verdict ask #2): the composed select->dedup->pack chain —
    # the biggest bench key and the closest thing to the product's real
    # end-to-end path; its per-stage split runs separately below so a
    # superlinear stage can't hide inside the composite
    "pipeline_select_dedup_pack",
    # round-8 (verdict ask #7): the quantization/projection tier at a
    # decade — SQ8 encode+decode+rank and PQ argmin-encode+ADC are
    # row-local scans + the same broadcast-query rank window as brute
    # force (expect ~linear); the PCA projection profile is a zero-shuffle
    # posexplode + 8-way aggregate (expect ~linear). dedup_semantic_profile
    # above already exercises the r7 BLAS pair path.
    "similarity_topk_sq8",
    "similarity_topk_pq",
    "embedding_pca_profile",
    # round-8 session additions: A-ES weighted reservoir (one top-n, no
    # corpus shuffle — expect ~linear in the scan), epoch mixture (CASE +
    # explode, linear in OUTPUT rows), and the Bloom-prefiltered
    # decontamination chain (bitmap build + map-only probe + exact confirm
    # on the sliver — the corpus side should stay ~linear)
    "sample_weighted_reservoir_profile",
    "mixture_epochs_profile",
    "contamination_bloom_prefilter_profile",
    # 1-bit BQ Hamming scan — compare directly against
    # similarity_topk_bruteforce at the same decade
    "similarity_topk_bq",
    # round-9: the exponential time-decay tier. Cost at sf0.1 is dominated
    # by per-GROUP Arrow dispatch (1500 tiny users); at sf1 the group count
    # grows 10x with the same group size, so ~10x is the honest expectation
    # — the number to watch is that it stays LINEAR in groups, not worse
    "ema_time_decay_profile",
    # round-11: the global shuffle-shard export — one hash exchange +
    # per-shard external sort + a 5-column aggregate; expect ~linear in
    # corpus rows (the permutation never touches the driver)
    "shuffle_shard_export_profile",
)


def _pipeline_staged(spark, sf_dir: str) -> dict[str, float]:
    """Per-stage wall times of the composed pipeline at ``sf_dir``:
    select (DSIR model pair + score + top-50% cut), pairs (MinHash-LSH
    over the selected slice), components+canonical (CC + anti-join), and
    pack+report. Each stage materializes before the next is timed, so a
    stage's number is its own work (the selected slice is persisted
    exactly as the registry query persists it)."""
    import time as _t

    from pyspark.sql import functions as F

    from clickhousedatamocker_spark.operators.corpus import pack_token_sequences
    from clickhousedatamocker_spark.operators.dedup import (
        fuzzy_dedup_canonical,
        minhash_lsh_pairs,
    )
    from clickhousedatamocker_spark.operators.importance import (
        dsir_select,
        train_hashed_ngram_model_pair,
    )

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    out: dict[str, float] = {}

    t0 = _t.perf_counter()
    tm, bm = train_hashed_ngram_model_pair(docs, F.col("source") == "src0", num_buckets=4096)
    selected = dsir_select(docs, tm, bm, keep_fraction=0.5).persist()
    n_sel = selected.count()
    out["select_sec"] = round(_t.perf_counter() - t0, 3)

    t0 = _t.perf_counter()
    pairs = minhash_lsh_pairs(selected, threshold=0.5).persist()
    n_pairs = pairs.count()
    out["pairs_sec"] = round(_t.perf_counter() - t0, 3)

    t0 = _t.perf_counter()
    survivors = fuzzy_dedup_canonical(selected, pairs).persist()
    n_surv = survivors.count()
    out["components_sec"] = round(_t.perf_counter() - t0, 3)

    t0 = _t.perf_counter()
    (
        pack_token_sequences(survivors, seq_len=512, n_shards=16)
        .groupBy("shard")
        .agg(F.count(F.lit(1)).alias("n_sequences"), F.sum("n_tokens").alias("n_tokens"))
        .collect()
    )
    out["pack_sec"] = round(_t.perf_counter() - t0, 3)

    for c in (survivors, pairs, selected):
        c.unpersist()
    out["n_selected"] = n_sel
    out["n_pairs"] = n_pairs
    out["n_survivors"] = n_surv
    return out


def _replicate(spark, src: str, dst: str, shifts: dict[str, int], text_col: str | None = None,
               n_replicas: int = REPLICAS):
    """Nx a fact table: crossJoin with range(n_replicas), shift key columns."""
    from pyspark.sql import functions as F

    df = spark.read.parquet(src)
    r = spark.range(n_replicas).withColumnRenamed("id", "__replica")
    out = df.crossJoin(r)
    for col, step in shifts.items():
        out = out.withColumn(col, F.col(col) + F.col("__replica") * F.lit(step))
    if text_col is not None:
        # per-replica token: replicas stay near-dups of each other, not clones
        out = out.withColumn(
            text_col, F.concat(F.col(text_col), F.lit(" repl"), F.col("__replica"))
        )
    out.drop("__replica").write.mode("overwrite").parquet(dst)


def build_sf1(spark, src_dir: str, dst_dir: str) -> None:
    os.makedirs(dst_dir, exist_ok=True)
    for t in DIMS:
        # dims unchanged: copy the parquet file verbatim (no Spark round-trip)
        shutil.copy(os.path.join(src_dir, f"{t}.parquet"), os.path.join(dst_dir, f"{t}.parquet"))
    j = os.path.join
    _replicate(spark, j(src_dir, "orders.parquet"), j(dst_dir, "orders.parquet"),
               {"o_orderkey": KEY_OFFSET})
    _replicate(spark, j(src_dir, "lineitem.parquet"), j(dst_dir, "lineitem.parquet"),
               {"l_orderkey": KEY_OFFSET})
    _replicate(spark, j(src_dir, "events.parquet"), j(dst_dir, "events.parquet"),
               {"event_id": KEY_OFFSET})
    _replicate(spark, j(src_dir, "documents.parquet"), j(dst_dir, "documents.parquet"),
               {"doc_id": KEY_OFFSET}, text_col="text")
    _replicate(spark, j(src_dir, "embeddings.parquet"), j(dst_dir, "embeddings.parquet"),
               {"vec_id": KEY_OFFSET})


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from clickhousedatamocker_spark.session import get_spark
    from clickhousedatamocker_spark.queries import REGISTRY

    src_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    dst_dir = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/spark_graft_sf1")
    load1, load5, _ = os.getloadavg()

    spark = get_spark(app_name="scale_smoke")
    if "--rebuild" in sys.argv or not os.path.exists(os.path.join(dst_dir, "lineitem.parquet")):
        t0 = time.perf_counter()
        build_sf1(spark, src_dir, dst_dir)
        build_s = time.perf_counter() - t0
        print(f"built sf1 at {dst_dir} in {build_s:.1f}s", file=sys.stderr)
    else:
        build_s = 0.0

    results: dict[str, dict] = {}
    for name in SMOKE_KEYS:
        fn = REGISTRY[name].fn
        # sf0.1 reference timing in the SAME process (warm JVM, warm codegen)
        # so the sf1/sf0.1 ratio isolates data volume from fixed overheads
        fn(spark, src_dir).count()  # warm-up
        t0 = time.perf_counter()
        fn(spark, src_dir).count()
        base = time.perf_counter() - t0
        fn(spark, dst_dir).count()  # warm-up: codegen compile, file listing
        t0 = time.perf_counter()
        rows = fn(spark, dst_dir).count()
        elapsed = time.perf_counter() - t0
        results[name] = {
            "rows": rows,
            "sec": round(elapsed, 3),
            "sf0.1_sec": round(base, 3),
            "ratio_10x_data": round(elapsed / base, 1) if base > 0 else None,
        }
        print(f"{name:32s} {elapsed:7.3f}s  ({elapsed / base:4.1f}x of sf0.1)  {rows} rows",
              file=sys.stderr)

    # --- second decade (round-6 verdict ask #6 + round-9 ask #7): the
    # gram-space scalers and the quantization tier. At ONE decade "linear
    # in grams" and "superlinear in docs" are indistinguishable; a second
    # point (30x = sf3) separates them: linear => sf3/sf1 ratio ~= 3.
    # The sf3 dir holds documents.parquet (gram scalers) AND
    # embeddings.parquet (SQ8/PQ/BQ) — nothing else.
    REPLICAS2 = 30
    gram_keys = (
        "crossdoc_dup_span_profile",
        "dedup_span_removal_profile",
        # round-9 (verdict ask #7): the quantization tier's second decade —
        # shortlist growth (rank-window candidates per query) is the effect
        # one decade can hide; ~3x at 3x the sf1 embeddings corpus = linear
        "similarity_topk_sq8",
        "similarity_topk_pq",
        "similarity_topk_bq",
        # round-10 (verdict ask #7): the time-decay tier's second decade —
        # the sf1 row showed 0.5x at 10x (Arrow-dispatch amortization over
        # fixed users); sf3 gives the same two-decade evidence standard.
        # Since r10 the dispatch is key-bucketed, so the expected shape is
        # plain ~3x-at-3x linearity in rows.
        "ema_time_decay_profile",
    )
    dst2 = os.environ.get("SPARK_GRAFT_SF3_DIR", "/tmp/spark_graft_sf3_docs")
    os.makedirs(dst2, exist_ok=True)
    if "--rebuild" in sys.argv or not os.path.exists(os.path.join(dst2, "documents.parquet")):
        t0 = time.perf_counter()
        _replicate(
            spark,
            os.path.join(src_dir, "documents.parquet"),
            os.path.join(dst2, "documents.parquet"),
            {"doc_id": KEY_OFFSET},
            text_col="text",
            n_replicas=REPLICAS2,
        )
        print(f"built sf3 documents at {dst2} in {time.perf_counter() - t0:.1f}s", file=sys.stderr)
    if "--rebuild" in sys.argv or not os.path.exists(os.path.join(dst2, "embeddings.parquet")):
        t0 = time.perf_counter()
        _replicate(
            spark,
            os.path.join(src_dir, "embeddings.parquet"),
            os.path.join(dst2, "embeddings.parquet"),
            {"vec_id": KEY_OFFSET},
            n_replicas=REPLICAS2,
        )
        print(f"built sf3 embeddings at {dst2} in {time.perf_counter() - t0:.1f}s", file=sys.stderr)
    if "--rebuild" in sys.argv or not os.path.exists(os.path.join(dst2, "events.parquet")):
        t0 = time.perf_counter()
        _replicate(
            spark,
            os.path.join(src_dir, "events.parquet"),
            os.path.join(dst2, "events.parquet"),
            {"event_id": KEY_OFFSET},
            n_replicas=REPLICAS2,
        )
        print(f"built sf3 events at {dst2} in {time.perf_counter() - t0:.1f}s", file=sys.stderr)
    decade2: dict[str, dict] = {}
    for name in gram_keys:
        fn = REGISTRY[name].fn
        fn(spark, dst2).count()  # warm-up
        t0 = time.perf_counter()
        rows = fn(spark, dst2).count()
        elapsed = time.perf_counter() - t0
        sf1_sec = results[name]["sec"]
        decade2[name] = {
            "rows": rows,
            "sec": round(elapsed, 3),
            "sf1_sec": sf1_sec,
            "ratio_3x_data": round(elapsed / sf1_sec, 1) if sf1_sec else None,
        }
        print(
            f"{name:32s} sf3 {elapsed:7.3f}s  ({elapsed / sf1_sec:4.1f}x of sf1)  {rows} rows",
            file=sys.stderr,
        )

    # --- per-stage split of the composed pipeline (round-7 ask #2): the
    # composite ratio above can hide one superlinear stage behind three
    # linear ones; time each stage at both SFs and ratio them separately.
    staged: dict[str, dict] = {}
    for label, d in (("sf0.1", src_dir), ("sf1", dst_dir)):
        _pipeline_staged(spark, d)  # warm-up (codegen + file listing)
        staged[label] = _pipeline_staged(spark, d)
        print(f"pipeline stages @ {label}: {staged[label]}", file=sys.stderr)
    stage_ratios = {
        k: round(staged["sf1"][k] / staged["sf0.1"][k], 1)
        for k in ("select_sec", "pairs_sec", "components_sec", "pack_sec")
        if staged["sf0.1"][k] > 0
    }

    total = round(sum(r["sec"] for r in results.values()), 3)
    out = {
        "sf": 1.0,
        "derived_from": src_dir,
        "replicas": REPLICAS,
        "build_sec": round(build_s, 1),
        "total_sec": total,
        "loadavg_1m": round(load1, 2),
        "loadavg_5m": round(load5, 2),
        "queries": results,
        "gram_second_decade_sf3": decade2,
        "pipeline_stages": staged,
        "pipeline_stage_ratios_10x": stage_ratios,
    }
    print(json.dumps(out))

    lines = [
        "# SCALE_SMOKE — sf1 (10x bench SF), steady-state single run",
        "",
        f"Derived 10x from `{src_dir}` (see `scale_smoke.py` docstring for the",
        "key-shifted replication scheme). local[`$SPARK_GRAFT_CPUS`], AQE on,",
        f"warm-up run excluded. Load at start: {load1:.2f} (1 m) / {load5:.2f} (5 m).",
        "",
        "| query | sf0.1 sec | sf1 sec | ratio (10x data) | sf1 rows |",
        "|---|---|---|---|---|",
    ]
    for name, r in results.items():
        lines.append(
            f"| {name} | {r['sf0.1_sec']} | {r['sec']} | {r['ratio_10x_data']}x | {r['rows']} |"
        )
    lines += [
        "",
        "## Second decade (sf3: documents+embeddings at 30x sf0.1)",
        "",
        "Separates 'linear in grams' from 'superlinear in docs' for the gram",
        "scalers, and exposes shortlist growth for the quantization tier: a",
        "linear operator shows ~3x at 3x the sf1 corpus.",
        "",
        "| query | sf1 sec | sf3 sec | ratio (3x data) | sf3 rows |",
        "|---|---|---|---|---|",
    ]
    for name, r in decade2.items():
        lines.append(
            f"| {name} | {r['sf1_sec']} | {r['sec']} | {r['ratio_3x_data']}x | {r['rows']} |"
        )
    lines += [
        "",
        "## Composed pipeline per-stage split (select -> pairs -> components -> pack)",
        "",
        "Stage-level ratios so a superlinear stage can't hide inside the",
        "composite. Counts: sf1 selects "
        f"{staged['sf1']['n_selected']} docs, finds {staged['sf1']['n_pairs']} near-dup pairs, "
        f"keeps {staged['sf1']['n_survivors']} survivors "
        f"(sf0.1: {staged['sf0.1']['n_selected']}/{staged['sf0.1']['n_pairs']}/"
        f"{staged['sf0.1']['n_survivors']}).",
        "",
        "| stage | sf0.1 sec | sf1 sec | ratio (10x data) |",
        "|---|---|---|---|",
    ]
    for k, label in (
        ("select_sec", "DSIR select (model pair + score + top-50% cut)"),
        ("pairs_sec", "MinHash-LSH pairs over the selected slice"),
        ("components_sec", "connected components + canonical anti-join"),
        ("pack_sec", "512-token packing + per-shard report"),
    ):
        lines.append(
            f"| {label} | {staged['sf0.1'][k]} | {staged['sf1'][k]} | "
            f"{stage_ratios.get(k, '—')}x |"
        )
    lines += [
        "",
        f"**Total: {total} s** (build: {build_s:.1f} s, one-time).",
        "",
        "Both timings share one warm JVM/codegen, so the ratio isolates data",
        "volume. Ratios at or under ~10x on 10x data = linear or better (AQE",
        "coalescing + partial aggregation absorbing the decade); MinHash runs",
        "super-linear *by construction* here — the replicas are near-dups, so",
        "true candidate-pair output grows faster than the corpus.",
    ]
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "SCALE_SMOKE.md"), "w") as f:
        f.write("\n".join(lines) + "\n")


if __name__ == "__main__":
    main()
