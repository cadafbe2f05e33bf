#!/usr/bin/env python3
"""Optimization-round helper: time individual registry keys (same
methodology as bench.py — OPT_WARMUPS discarded warm-ups, default 4 to
match bench.py's declared protocol, then the median of OPT_RUNS
collect()s) and/or dump .explain('formatted') plans to plans/<OPT_ROUND>/
(default r12).

Usage:
  python tools/opt_bench.py time KEY [KEY ...]      # per-key medians
  python tools/opt_bench.py plan SUFFIX KEY [...]   # plans/<round>/<key>_<SUFFIX>.txt

Keys resolve against the registry; the bench-only labels
(dedup_minhash_lsh_pairs production twin etc.) are not reproduced here —
use bench.py for the full artifact.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from clickhousedatamocker_spark.queries import REGISTRY  # noqa: E402
from clickhousedatamocker_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WARMUPS = int(os.environ.get("OPT_WARMUPS", "4"))
RUNS = int(os.environ.get("OPT_RUNS", "5"))
ROUND = os.environ.get("OPT_ROUND", "r12")


def main() -> None:
    mode = sys.argv[1]
    spark = get_spark(app_name="opt_bench")
    if mode == "time":
        keys = sys.argv[2:]
        for key in keys:
            fn = REGISTRY[key].fn
            spark.sparkContext.setJobDescription(f"warmup {key}")
            for _ in range(WARMUPS):
                fn(spark, SF_DIR).collect()
            runs = []
            for i in range(RUNS):
                spark.sparkContext.setJobDescription(f"timed {key} #{i}")
                t0 = time.monotonic()
                fn(spark, SF_DIR).collect()
                runs.append(time.monotonic() - t0)
            print(
                f"{key}: median {statistics.median(runs):.4f}s "
                f"runs {[round(r, 4) for r in runs]}"
            )
    elif mode == "plan":
        suffix = sys.argv[2]
        keys = sys.argv[3:]
        outdir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", ROUND)
        os.makedirs(outdir, exist_ok=True)
        for key in keys:
            df = REGISTRY[key].fn(spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            path = os.path.join(outdir, f"{key}_{suffix}.txt")
            with open(path, "w") as fh:
                fh.write(plan)
            print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)")
    else:
        raise SystemExit(f"unknown mode {mode}")
    spark.stop()


if __name__ == "__main__":
    main()
