#!/usr/bin/env python3
"""Benchmark harness — run headline queries + the reference ingest operating
point at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

The reference's baseline (BASELINE.md): generate+append a 100k-row batch into
the 24-way hourly-partitioned table in <1 s steady-state; monitoring queries
run alongside each second. `ingest_100k_batch` measures exactly that cycle
(generate -> admission check -> partitioned append -> parts/metrics query).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import tempfile
import time


# median-of-5 (the r7→r8 ask): min-of-3 under-samples the host's noise
# band — r7's shared keys drifted +0–47% with a PASSING load gate and no
# code cause, so the estimator now (a) takes the median, which tracks the
# typical run instead of the luckiest, and (b) publishes a calibration
# ratio so the judge can separate ambient-machine drift from regressions
_TIMED_RUNS = 5

# FOUR discarded warm-ups per key (r11 optimization round, declared
# protocol change — see OPTIMIZATION_r11.md): the r9 JIT-tiering finding
# quantified — whole-stage-codegen methods are invoked ~once per ROW, and
# at sf0.1 row counts (2k-100k rows/key) one execution sits below the C2
# tier-up threshold (~10-15k invocations), so run profiles keep falling
# through run ~3-5 (this round's raw arrays: crossdoc 6.2→5.0→3.6→1.9→1.6
# within one bench; sq8 9.2→...→3.0 across 7). Two warm-ups left the
# median straddling the ramp; four start the timed runs at steady state,
# which is the number the reference's steady-state envelope is about.
# conditions.warmup_runs_per_key records the value per artifact.
_WARMUP_RUNS = 4

# Calibration reference: median seconds for the fixed pure-CPU key (an
# 8-deep xxhash64 chain folded over spark.range(100M), 32 fixed
# partitions — no IO, no shuffle, size-independent of SF; the chain makes
# per-row compute dominate task-scheduling overhead) measured on a quiet
# box at r8 (observed plateau 0.49-0.60 s across JIT warm-up; the pinned
# value is the mid-plateau). Every bench run re-times the same key FIRST
# and LAST; the ratio vs this constant is the machine-speed correction
# behind "queries_normalized". Self-noise of the yardstick is ~±15%
# (JIT tiering + scheduler), so read the ratio coarsely: it exists to
# catch the r7 failure mode — 25-50% ambient drift (CPU frequency, IO
# co-tenancy) that a PASSING loadavg gate cannot see — not to resolve
# single-digit percent.
_CALIB_REF_S = 0.55


def _calibration_seconds(spark) -> float:
    """Median-of-3 of the fixed CPU-bound calibration query."""
    import pyspark.sql.functions as F

    def run() -> None:
        # bit_xor, not sum: summing 100M random 64-bit hashes overflows
        # long under ANSI mode; xor is overflow-free and just as CPU-bound
        h = F.col("id")
        for i in range(8):
            h = F.xxhash64(h, F.lit(i))
        spark.range(0, 100_000_000, 1, 32).select(F.bit_xor(h).alias("h")).collect()

    run()  # codegen warm-up
    run()
    runs = []
    for _ in range(3):
        t0 = time.monotonic()
        run()
        runs.append(time.monotonic() - t0)
    return statistics.median(runs)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)

    # record run conditions BEFORE the bench JVM starts: round-over-round
    # comparisons are only attributable on a quiet box (load ~0, no stray
    # JVMs), so the artifact carries the evidence
    import subprocess

    load1, load5, load15 = os.getloadavg()
    # Ambient-load gate (round-6: ingest "+25%" correlated with loadavg
    # 4.24 vs 2.02 and had no code cause). If the 1-minute load is above
    # the threshold at start, wait for it to drain — up to the deadline —
    # so round-over-round numbers compare like with like; if it never
    # drains, run anyway but stamp the wait + final load into conditions.
    load_gate = float(os.environ.get("SPARK_GRAFT_LOAD_GATE", "3.0"))
    load_wait_s = float(os.environ.get("SPARK_GRAFT_LOAD_WAIT_S", "120"))
    waited = 0.0
    while load1 > load_gate and waited < load_wait_s:
        print(
            f"bench: loadavg_1m {load1:.2f} > gate {load_gate:.2f}; "
            f"waiting for the box to quiesce ({waited:.0f}s)",
            file=sys.stderr,
        )
        time.sleep(10.0)
        waited += 10.0
        load1, load5, load15 = os.getloadavg()
    try:
        pre_java = int(subprocess.run(["pgrep", "-c", "java"], capture_output=True, text=True).stdout.strip() or 0)
    except Exception:
        pre_java = -1
    conditions = {
        "loadavg_1m": round(load1, 2),
        "loadavg_5m": round(load5, 2),
        "loadavg_15m": round(load15, 2),
        "java_procs_before": pre_java,
        "timed_runs_per_key": _TIMED_RUNS,
        # r8 estimator change: median (was min-of-3) — raw values read
        # systematically HIGHER than r1-r7 artifacts for identical code;
        # compare r8+ rounds to each other via queries_normalized
        "estimator": "median",
        "load_gate": load_gate,
        "load_gate_waited_s": round(waited, 1),
        "load_gate_met": load1 <= load_gate,
    }

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from clickhousedatamocker_spark.session import get_spark
    from clickhousedatamocker_spark.queries import REGISTRY

    spark = get_spark(app_name="bench")
    timings: dict[str, float] = {}
    # every timed run, not just the min: the host has a ±30% scheduler noise
    # band, and publishing all samples makes regressions distinguishable
    # from noise in round-over-round comparisons
    all_runs: dict[str, list[float]] = {}

    headline = [name for name, spec in REGISTRY.items() if spec.headline]
    # warm up the JVM/IO path once with the first headline query
    REGISTRY[headline[0]].fn(spark, sf_dir).collect()

    # calibration, FIRST: the machine-speed yardstick for this run
    calib_pre = _calibration_seconds(spark)

    for name in headline:
        # steady-state timing: discarded warm-up runs (whole-stage-codegen
        # compiles once per query shape on a long-lived cluster; C2 JIT
        # tiering needs a couple of executions), then the median of the
        # timed runs (median-of-5: tracks the typical run; see the
        # calibration note at the top)
        for _ in range(_WARMUP_RUNS):
            REGISTRY[name].fn(spark, sf_dir).collect()
        runs = []
        for _ in range(_TIMED_RUNS):
            t0 = time.monotonic()
            REGISTRY[name].fn(spark, sf_dir).collect()
            runs.append(time.monotonic() - t0)
        timings[name] = round(statistics.median(runs), 4)
        all_runs[name] = [round(r, 4) for r in runs]

    # Production twins (xxhash64 / float-hash paths — what a user runs at
    # scale). The registry grades their cross-engine quantized/poly-hash
    # twins against DuckDB oracles; the bench tracks the production
    # operators themselves so perf regressions stay visible despite their
    # rows-only grading.
    from clickhousedatamocker_spark.operators.dedup import minhash_lsh_pairs
    from clickhousedatamocker_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")

    def timed(label: str, mk, dest: dict | None = None) -> None:
        for _ in range(_WARMUP_RUNS):  # warm codegen + JIT tier for this shape
            mk().collect()
        runs = []
        for _ in range(_TIMED_RUNS):
            t0 = time.monotonic()
            mk().collect()
            runs.append(time.monotonic() - t0)
        (dest if dest is not None else timings)[label] = round(statistics.median(runs), 4)
        if dest is None:
            all_runs[label] = [round(r, 4) for r in runs]

    timed("dedup_minhash_lsh_pairs", lambda: minhash_lsh_pairs(docs))
    for twin in ("similarity_topk_lsh", "similarity_topk_ivf", "stream_attribution_join"):
        timed(twin, lambda twin=twin: REGISTRY[twin].fn(spark, sf_dir))
    # round-5 additions: the scale-pinned q18 (all three joins SHUFFLE_HASH
    # after the sf1 smoke caught a 12x superlinear broadcast) and the
    # cross-document duplicated-span signal (rows-only registry entry)
    for extra in (
        "q18_large_volume_customers",
        "crossdoc_dup_span_profile",
        "dedup_span_removal_profile",
        # round-6: the composed select->dedup->pack training-data run
        "pipeline_select_dedup_pack",
        # round-6: keyword+vector RRF fusion (graded query; both branch
        # retrievals and the fusion in one number)
        "hybrid_retrieval_rrf",
        # round-8: the newly-graded quantization tier — SQ8 byte-packed
        # encode+rank, PQ argmin-encode+ADC, and the fixed-components
        # projection profile (all row-local scans + the brute-force rank
        # window; regressions here mean the JVM expression paths slipped)
        "similarity_topk_sq8",
        "similarity_topk_pq",
        "embedding_pca_profile",
        # round-8: 1-bit binary quantization — xor+bit_count Hamming scan,
        # the cheapest first-stage cut in the tier (should sit well under
        # the brute-force key; a regression means the fold/codegen path
        # slipped into interpretation)
        "similarity_topk_bq",
        # round-11: the graded global shuffle-shard export — one hash
        # exchange + per-shard sort + a 5-column aggregate; should sit in
        # the cheapest tier (a regression means the permutation grew a
        # driver dependency or an extra exchange)
        "shuffle_shard_export_profile",
    ):
        timed(extra, lambda extra=extra: REGISTRY[extra].fn(spark, sf_dir))

    # ANN steady state (the r4 verdict's ask): similarity_topk_ivf above
    # retrains k-means fresh per call — one-time cost a serving user never
    # pays twice. These two keys time the QUERY under (a) a pretrained
    # codebook (stable plan literals -> codegen cache hit, zero driver
    # actions) and (b) the persisted partition-pruned index; the build/train
    # costs stay visible in the fresh-train key and the untimed build below.
    from clickhousedatamocker_spark.operators.similarity import (
        ann_query_indexed,
        build_ann_index,
        ivf_topk,
        ivf_train,
    )
    import pyspark.sql.functions as _F

    emb = load_table(spark, sf_dir, "embeddings")
    ann_q = emb.filter(_F.col("vec_id") < 5)
    codebook = ivf_train(emb, n_centroids=8, n_iters=2)  # untimed: train-once
    timed(
        "similarity_topk_ivf_pretrained",
        lambda: ivf_topk(emb, ann_q, k=10, nprobe=3, centroids=codebook).orderBy(
            "query_id", "rank"
        ),
    )
    with tempfile.TemporaryDirectory(prefix="bench_ann_idx_") as idx_path:
        build_ann_index(emb, idx_path, centroids=codebook)  # untimed: build-once
        timed(
            "similarity_ann_query_indexed",
            lambda: ann_query_indexed(spark, idx_path, ann_q, k=10, nprobe=3),
        )

    # text_analysis_profile cost attribution: the headline number includes
    # the presentation ORDER BY (whose range-sampling re-runs the
    # projection) — publish the scan-only and compute-only splits so scope
    # changes stay distinguishable from regressions round-over-round.
    # Diagnostics, NOT counted into the total (they re-measure work the
    # headline entry already paid for).
    import pyspark.sql.functions as F

    breakdown: dict[str, float] = {}

    def timed_diag(label: str, mk) -> None:
        timed(label, mk, dest=breakdown)

    def ta_compute_only():
        df = REGISTRY["text_analysis_profile"].fn(spark, sf_dir)
        return df.select(F.xxhash64(*df.columns).alias("h")).agg(F.bit_xor("h"))

    timed_diag("text_analysis_profile_compute_only", ta_compute_only)
    timed_diag(
        "text_analysis_profile_scan_only",
        lambda: load_table(spark, sf_dir, "documents")
        .select(F.xxhash64("doc_id").alias("h"))
        .agg(F.bit_xor("h")),
    )

    # reference operating point: one 100k-row generated batch appended to the
    # hourly-partitioned table + the per-second monitoring queries
    from clickhousedatamocker_spark.engine import Engine
    from clickhousedatamocker_spark.harness import QUERY_METRICS_SQL, QUERY_PARTS_SQL
    from clickhousedatamocker_spark.schema import test_local_spec
    from clickhousedatamocker_spark.sources.generator import BatchGenerator

    with tempfile.TemporaryDirectory(prefix="bench_wh_") as wh:
        engine = Engine(spark, wh)
        engine.create_table(test_local_spec())
        gen = BatchGenerator(spark, seed=42, base_time="2026-01-01 12:00:00")
        # the reference's <1 s envelope is STEADY-state: its loop runs for
        # minutes. Warm _WARMUP_RUNS inserts (JIT + committer paths), then
        # report the median of FIVE timed ones — the same estimator and
        # run count as every other key (r10 nit: this key logged only 3).
        for b in range(_WARMUP_RUNS):
            engine.insert("test_local", gen.batch_with_partition(100_000, batch_no=b))
        runs = []
        for b in range(_WARMUP_RUNS, _WARMUP_RUNS + _TIMED_RUNS):
            t0 = time.monotonic()
            engine.insert("test_local", gen.batch_with_partition(100_000, batch_no=b))
            runs.append(time.monotonic() - t0)
        timings["ingest_100k_batch"] = round(statistics.median(runs), 4)
        all_runs["ingest_100k_batch"] = [round(r, 4) for r in runs]
        # steady-state monitoring (the reference runs this pair once per
        # second ALONGSIDE ingest): warm the view registration, then time
        for _ in range(_WARMUP_RUNS):
            engine.sql(QUERY_METRICS_SQL).collect()
            engine.sql(QUERY_PARTS_SQL.format(database="default", table="test_local")).collect()
        runs = []
        for _ in range(_TIMED_RUNS):
            t0 = time.monotonic()
            engine.sql(QUERY_METRICS_SQL).collect()
            engine.sql(QUERY_PARTS_SQL.format(database="default", table="test_local")).collect()
            runs.append(time.monotonic() - t0)
        timings["monitoring_queries"] = round(statistics.median(runs), 4)
        all_runs["monitoring_queries"] = [round(r, 4) for r in runs]

    # calibration, LAST: drift between pre and post flags mid-run
    # environment change (thermal throttle, a co-tenant arriving)
    calib_post = _calibration_seconds(spark)
    calib = statistics.median([calib_pre, calib_post])
    ratio = calib / _CALIB_REF_S
    conditions.update(
        {
            "calibration_pre_s": round(calib_pre, 4),
            "calibration_post_s": round(calib_post, 4),
            "calibration_ref_s": _CALIB_REF_S,
            "calibration_ratio": round(ratio, 4),
        }
    )
    # normalized = raw / ratio: what the key WOULD have cost on the
    # reference-speed box. Compare normalized values round-over-round;
    # raw stays the ground truth for the baseline envelope gates.
    normalized = {k: round(v / ratio, 4) for k, v in timings.items()}

    # per-key dispersion (the r10→r11 ask): IQR of the timed runs and the
    # IQR relative to the median, so a round-over-round move can be read
    # against THIS run's own spread instead of re-deriving it from the raw
    # arrays. A key whose delta is inside ~its rel-IQR is noise, not code.
    def _iqr(vals: list[float]) -> float:
        qs = statistics.quantiles(sorted(vals), n=4, method="inclusive")
        return qs[2] - qs[0]

    iqr = {k: round(_iqr(v), 4) for k, v in all_runs.items()}
    iqr_rel = {
        k: round(iqr[k] / timings[k], 4) if timings[k] else 0.0 for k in iqr
    }
    conditions.update(
        {
            "queries_iqr": iqr,
            "queries_iqr_rel": iqr_rel,
            "iqr_rel_max": round(max(iqr_rel.values()), 4),
            "iqr_rel_median": round(statistics.median(iqr_rel.values()), 4),
            "warmup_runs_per_key": _WARMUP_RUNS,
        }
    )

    total = round(sum(timings.values()), 4)
    # Two-artifact emission (the r8 verdict's top task): the driver
    # archives only the LAST ~2 KB of stdout, so the fat record (raw run
    # arrays, breakdown, full conditions) goes to a sidecar file and the
    # ONE stdout line is a compact record — per-key medians, normalized
    # medians, calibration ratio — guaranteed to fit the tail window.
    full_record = {
        "metric": "headline queries + 100k-batch partitioned ingest + monitoring, seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "queries_normalized": normalized,
        "runs": all_runs,
        "breakdown": breakdown,
        "conditions": conditions,
        "sf": sf,
    }
    sidecar = os.environ.get(
        "SPARK_GRAFT_BENCH_RUNS", os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_RUNS.json")
    )
    try:
        with open(sidecar, "w") as f:
            json.dump(full_record, f, indent=1)
    except OSError as e:  # read-only checkout: the stdout line still carries the medians
        print(f"bench: could not write sidecar {sidecar}: {e}", file=sys.stderr)
    compact = {
        "metric": "headline+ingest+monitoring sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "queries_normalized": normalized,
        "calibration_ratio": conditions["calibration_ratio"],
        "load_1m": conditions["loadavg_1m"],
        # dispersion summary (per-key IQR maps live in the sidecar
        # conditions): max and median IQR/median across all keys
        "iqr_rel_max": conditions["iqr_rel_max"],
        "iqr_rel_median": conditions["iqr_rel_median"],
        "sf": sf,
        "runs_file": os.path.basename(sidecar),
    }
    line = json.dumps(compact, separators=(",", ":"))
    if len(line) > 1900:
        # stay under the tail window no matter how many keys future rounds
        # add: drop the normalized map first (ratio lets a reader rebuild
        # it), then raw medians would be next — never reached today.
        compact.pop("queries_normalized")
        line = json.dumps(compact, separators=(",", ":"))
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
