"""Dev tool: the driver's correctness gate, run locally — every
oracle-backed registry query vs its DuckDB oracle at sf0.01 (rows +
columns + order-insensitive value compare with 9dp float rounding, the
driver's discipline). Run from the repo root before a round closes."""

import math
import os
import sys
import time

os.environ.setdefault("SPARK_GRAFT_CPUS", "16")

import duckdb

from clickhousedatamocker_spark.queries import REGISTRY
from clickhousedatamocker_spark.session import get_spark

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

spark = get_spark(app_name="correctness_dryrun")
spark.sparkContext.setLogLevel("ERROR")
con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")


def canon(v):
    if hasattr(v, "to_pydatetime"):
        v = v.to_pydatetime()
    elif hasattr(v, "item") and type(v).__module__.startswith("numpy"):
        v = v.item()
    if isinstance(v, float):
        return "nan" if math.isnan(v) else repr(round(v, 9))
    return repr(v)


def norm(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(canon(r[i]) for i in order) for r in rows)


n_pass = n_fail = 0
for name, spec in REGISTRY.items():
    if spec.oracle is None:
        continue
    t0 = time.time()
    try:
        sdf = spec.fn(spark, SF_DIR)
        srows = [tuple(r) for r in sdf.collect()]
        rel = con.sql(spec.oracle)
        orows = rel.fetchall()
        cols_ok = sorted(sdf.columns) == sorted(rel.columns)
        vals_ok = norm(srows, sdf.columns) == norm(orows, list(rel.columns))
        ok = cols_ok and len(srows) == len(orows) and vals_ok
    except Exception as e:  # noqa: BLE001
        ok, cols_ok = False, False
        print(f"ERR  {name}: {type(e).__name__}: {str(e).splitlines()[0][:140]}")
    dt = time.time() - t0
    if ok:
        n_pass += 1
        print(f"PASS {name} ({dt:.1f}s)")
    else:
        n_fail += 1
        print(f"FAIL {name} ({dt:.1f}s) cols_ok={cols_ok}")
print(f"\n==== {n_pass} pass / {n_fail} fail ====")
spark.stop()
sys.exit(1 if n_fail else 0)
