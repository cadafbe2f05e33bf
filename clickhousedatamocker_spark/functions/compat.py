"""ClickHouse-SQL → Spark-SQL compatibility shim.

Small textual rewrites so the reference's .sql files (sql/query_metrics.sql,
sql/query_parts.sql) run VERBATIM through ``Engine.sql``:

- ``count()``            → ``count(*)``      (CH allows zero-arg count)
- ``system.metrics``     → ``system_metrics`` (our introspection views)
- ``system.parts``       → ``system_parts``

``toYYYYMMDDhh`` / ``formatReadableSize`` / ``currentDatabase`` need no
rewriting — they are registered as SQL-defined functions
(functions/scalar.py).
"""

from __future__ import annotations

import re

_REWRITES = [
    (re.compile(r"\bcount\(\s*\)", re.IGNORECASE), "count(*)"),
    (re.compile(r"\bsystem\.metrics\b", re.IGNORECASE), "system_metrics"),
    (re.compile(r"\bsystem\.parts\b", re.IGNORECASE), "system_parts"),
]


def translate_ch_sql(sql: str) -> str:
    for pattern, repl in _REWRITES:
        sql = pattern.sub(repl, sql)
    return sql
