#!/usr/bin/env python3
"""Stage-by-stage profile of the 100k-batch ingest cycle (the reference's
binding <1 s envelope; BASELINE.md).

Splits every timed insert into the stages the carry-over note names:
  admission        — active-parts listing + flow decision (+ any delay sleep)
  generate+write   — the lazy batch generation fused into the partitioned
                     parquet write (the Spark job itself)
  commit-discovery — record_commit's watermark-scoped directory walk
  generate-only    — measured separately via a noop-format write of the
                     same batch (generation without parquet encoding/IO)

Run on a QUIET box:  python tools/profile_ingest.py [n_timed]
Prints one table + a JSON line.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from clickhousedatamocker_spark import get_spark  # noqa: E402
from clickhousedatamocker_spark.engine import Engine  # noqa: E402
from clickhousedatamocker_spark.schema import test_local_spec  # noqa: E402
from clickhousedatamocker_spark.sources.generator import BatchGenerator  # noqa: E402


def main() -> None:
    n_timed = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    load1 = os.getloadavg()[0]
    spark = get_spark(app_name="profile-ingest")
    wh = tempfile.mkdtemp(prefix="profile_ingest_")
    engine = Engine(spark, wh)
    engine.create_table(test_local_spec())
    gen = BatchGenerator(spark, seed=42, base_time="2026-01-01 12:00:00")

    parts = engine.parts

    # instrument the two bookkeeping stages by wrapping the real methods —
    # the insert code path itself stays byte-identical
    timings: dict[str, list[float]] = {
        "admission_s": [], "commit_discovery_s": [], "total_s": [],
        "generate_write_s": [], "generate_only_s": [],
    }
    orig_count = parts.active_parts_count
    orig_commit = parts.record_commit
    stage: dict[str, float] = {}

    def timed_count(*a, **kw):
        t0 = time.monotonic()
        r = orig_count(*a, **kw)
        stage["admission"] = stage.get("admission", 0.0) + time.monotonic() - t0
        return r

    def timed_commit(*a, **kw):
        t0 = time.monotonic()
        r = orig_commit(*a, **kw)
        stage["commit"] = stage.get("commit", 0.0) + time.monotonic() - t0
        return r

    parts.active_parts_count = timed_count
    parts.record_commit = timed_commit

    # steady-state warm-up (same as bench.py)
    for b in (0, 1):
        engine.insert("test_local", gen.batch_with_partition(100_000, batch_no=b))

    for b in range(2, 2 + n_timed):
        stage.clear()
        batch = gen.batch_with_partition(100_000, batch_no=b)
        t0 = time.monotonic()
        engine.insert("test_local", batch)
        total = time.monotonic() - t0
        adm = stage.get("admission", 0.0)
        com = stage.get("commit", 0.0)
        timings["total_s"].append(total)
        timings["admission_s"].append(adm)
        timings["commit_discovery_s"].append(com)
        timings["generate_write_s"].append(total - adm - com)

    # generation WITHOUT the parquet write: same batch expression into the
    # noop sink (runs the full generation + partition shuffle, no encode/IO)
    for b in range(2 + n_timed, 2 + n_timed + 1):  # warm the noop shape
        gen.batch_with_partition(100_000, batch_no=b).write.format("noop").mode(
            "overwrite"
        ).save()
    for b in range(3 + n_timed, 3 + n_timed + n_timed):
        t0 = time.monotonic()
        gen.batch_with_partition(100_000, batch_no=b).write.format("noop").mode(
            "overwrite"
        ).save()
        timings["generate_only_s"].append(time.monotonic() - t0)

    parts.active_parts_count = orig_count
    parts.record_commit = orig_commit

    med = {k: round(statistics.median(v), 4) for k, v in timings.items() if v}
    print(f"{'stage':24s} median   runs (loadavg_1m at start {load1:.2f})")
    for k, v in timings.items():
        if v:
            print(f"{k:24s} {statistics.median(v):7.4f}  {[round(x, 3) for x in v]}")
    med["write_minus_generate_s"] = round(
        med["generate_write_s"] - med["generate_only_s"], 4
    )
    med["loadavg_1m"] = round(load1, 2)
    med["n_timed"] = n_timed
    print(json.dumps(med))
    spark.stop()


if __name__ == "__main__":
    main()
