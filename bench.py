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
import sys
import tempfile
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from clickhousedatamocker_spark.session import get_spark
    from clickhousedatamocker_spark.queries import REGISTRY

    spark = get_spark(app_name="bench")
    timings: dict[str, float] = {}
    # every timed run, not just the min: the host has a ±30% scheduler noise
    # band, and publishing both samples makes regressions distinguishable
    # from noise in round-over-round comparisons
    all_runs: dict[str, list[float]] = {}

    headline = [name for name, spec in REGISTRY.items() if spec.headline]
    # warm up the JVM/IO path once with the first headline query
    REGISTRY[headline[0]].fn(spark, sf_dir).collect()

    for name in headline:
        # steady-state timing: one warm-up run (whole-stage-codegen compiles
        # once per query shape on a long-lived cluster), then min of two
        # timed runs — min is the standard steady-state estimator under
        # scheduler noise on a shared host
        REGISTRY[name].fn(spark, sf_dir).collect()
        runs = []
        for _ in range(2):
            t0 = time.monotonic()
            REGISTRY[name].fn(spark, sf_dir).collect()
            runs.append(time.monotonic() - t0)
        timings[name] = round(min(runs), 4)
        all_runs[name] = [round(r, 4) for r in runs]

    # production MinHash-LSH (xxhash64 hash family — what a user runs at
    # scale). The registry grades its cross-engine poly-hash twin against a
    # DuckDB oracle; the bench tracks the production operator itself.
    from clickhousedatamocker_spark.operators.dedup import minhash_lsh_pairs
    from clickhousedatamocker_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    minhash_lsh_pairs(docs).collect()
    runs = []
    for _ in range(2):
        t0 = time.monotonic()
        minhash_lsh_pairs(docs).collect()
        runs.append(time.monotonic() - t0)
    timings["dedup_minhash_lsh_pairs"] = round(min(runs), 4)
    all_runs["dedup_minhash_lsh_pairs"] = [round(r, 4) for r in runs]

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
        # minutes. Warm two inserts (JIT + committer paths), then report the
        # min of two timed ones — the same estimator as the query timings.
        for b in (0, 1):
            engine.insert("test_local", gen.batch_with_partition(100_000, batch_no=b))
        runs = []
        for b in (2, 3):
            t0 = time.monotonic()
            engine.insert("test_local", gen.batch_with_partition(100_000, batch_no=b))
            runs.append(time.monotonic() - t0)
        timings["ingest_100k_batch"] = round(min(runs), 4)
        all_runs["ingest_100k_batch"] = [round(r, 4) for r in runs]
        # steady-state monitoring (the reference runs this pair once per
        # second ALONGSIDE ingest): warm the view registration once, then time
        engine.sql(QUERY_METRICS_SQL).collect()
        engine.sql(QUERY_PARTS_SQL.format(database="default", table="test_local")).collect()
        runs = []
        for _ in range(2):
            t0 = time.monotonic()
            engine.sql(QUERY_METRICS_SQL).collect()
            engine.sql(QUERY_PARTS_SQL.format(database="default", table="test_local")).collect()
            runs.append(time.monotonic() - t0)
        timings["monitoring_queries"] = round(min(runs), 4)
        all_runs["monitoring_queries"] = [round(r, 4) for r in runs]

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline queries + 100k-batch partitioned ingest + monitoring, seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "runs": all_runs,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
