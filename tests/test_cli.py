"""python -m clickhousedatamocker_spark — the clickhouse-client-shaped CLI.

One subprocess invocation per JVM is slow (~15 s), so the e2e test packs
create+insert+select into one run and checks cross-invocation persistence
with a second. Statement splitting is unit-tested without Spark."""

import os
import subprocess
import sys

from clickhousedatamocker_spark.__main__ import _split_statements


def test_split_statements_quote_safe():
    assert _split_statements("a; b ;; c") == ["a", "b", "c"]
    assert _split_statements("SELECT ';' AS s; SELECT 1") == ["SELECT ';' AS s", "SELECT 1"]
    assert _split_statements('SELECT ";" ; x') == ['SELECT ";"', "x"]
    assert _split_statements("  ") == []


def _run(wh, *args, input_text=None):
    env = dict(os.environ, PYTHONPATH=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    return subprocess.run(
        [sys.executable, "-m", "clickhousedatamocker_spark", "--warehouse", wh, *args],
        capture_output=True,
        text=True,
        input=input_text,
        env=env,
        timeout=180,
    )


def test_cli_end_to_end_and_persistence(tmp_path):
    wh = str(tmp_path / "wh")
    r = _run(
        wh,
        "-q",
        "CREATE TABLE c (k UInt64, v Float64) ENGINE = MergeTree() ORDER BY k",
        "-q",
        "INSERT INTO c VALUES (1, 1.5), (2, 2.5); SELECT k, v FROM c ORDER BY k",
    )
    assert r.returncode == 0, r.stderr[-500:]
    assert r.stdout.splitlines() == ["1\t1.5", "2\t2.5"]
    # second invocation: same warehouse, fresh process — tables persist;
    # stdin statement flow; error statements exit nonzero with one line
    r2 = _run(wh, input_text="SELECT sum(v) AS s FROM c; SELECT nope FROM c;")
    assert r2.returncode == 1
    assert r2.stdout.splitlines() == ["4.0"]
    assert r2.stderr.strip().splitlines()[-1].startswith("error:")
