"""ClickHouse-SQL → Spark compatibility shim.

Queries: small textual rewrites so the reference's monitoring .sql files
(sql/query_metrics.sql, sql/query_parts.sql) run VERBATIM via ``Engine.sql``:

- ``count()``            → ``count(*)``      (CH allows zero-arg count)
- ``system.metrics``     → ``system_metrics`` (our introspection views)
- ``system.parts``       → ``system_parts``

``toYYYYMMDDhh`` / ``formatReadableSize`` / ``currentDatabase`` need no
rewriting — they are registered as SQL-defined functions
(functions/scalar.py).

DDL: :func:`parse_ch_ddl` parses the reference's DDL dialect — CREATE TABLE
with ENGINE=MergeTree/PARTITION BY/ORDER BY/SETTINGS (create_local.sql),
CREATE TABLE … AS … ENGINE=Distributed (create_distributed.sql), DROP TABLE,
and ALTER … MODIFY SETTING (set_flow_control.sh:35-40) — into catalog calls,
so the COMPLETE reference SQL surface (DDL + queries) runs verbatim.
"""

from __future__ import annotations

import re

from pyspark.sql import types as T

_REWRITES = [
    (re.compile(r"\bcount\(\s*\)", re.IGNORECASE), "count(*)"),
    (re.compile(r"\bsystem\.metrics\b", re.IGNORECASE), "system_metrics"),
    (re.compile(r"\bsystem\.parts\b", re.IGNORECASE), "system_parts"),
]


def translate_ch_sql(sql: str) -> str:
    for pattern, repl in _REWRITES:
        sql = pattern.sub(repl, sql)
    return sql


# -- DDL ---------------------------------------------------------------------

_CH_TYPES: dict[str, T.DataType] = {
    "uint8": T.IntegerType(),
    "uint16": T.IntegerType(),
    "uint32": T.IntegerType(),
    "uint64": T.LongType(),  # 1..10^18 fits signed (SURVEY §1.2)
    "int8": T.IntegerType(),
    "int16": T.IntegerType(),
    "int32": T.IntegerType(),
    "int64": T.LongType(),
    "float32": T.FloatType(),
    "float64": T.DoubleType(),
    "string": T.StringType(),
    "datetime": T.TimestampType(),
    "date": T.DateType(),
    "bool": T.BooleanType(),
}


def _strip(sql: str) -> str:
    sql = re.sub(r"--[^\n]*", "", sql)  # line comments (create_local.sql:1-2)
    return sql.strip().rstrip(";").strip()


def parse_ch_ddl(sql: str) -> dict | None:
    """Parse one ClickHouse DDL statement into a catalog-op description, or
    return None when the statement is not DDL (plain query path)."""
    s = _strip(sql)
    if not s:
        return None

    m = re.match(r"DROP\s+TABLE\s+(IF\s+EXISTS\s+)?(\w+)", s, re.IGNORECASE)
    if m:
        return {"op": "drop", "name": m.group(2), "if_exists": bool(m.group(1))}

    m = re.match(
        r"ALTER\s+TABLE\s+(\w+)\s+MODIFY\s+SETTING\s+(.+)$", s, re.IGNORECASE | re.DOTALL
    )
    if m:
        settings = {}
        for part in m.group(2).split(","):
            k, v = part.split("=")
            settings[k.strip()] = int(v.strip())
        return {"op": "alter_setting", "name": m.group(1), "settings": settings}

    m = re.match(
        r"CREATE\s+TABLE\s+(IF\s+NOT\s+EXISTS\s+)?(\w+)\s+AS\s+(\w+)",
        s,
        re.IGNORECASE,
    )
    if m:
        # the Distributed wrapper adds nothing on Spark (every DataFrame is
        # already executor-partitioned) — a catalog alias preserves the API
        return {
            "op": "alias",
            "name": m.group(2),
            "of": m.group(3),
            "if_not_exists": bool(m.group(1)),
        }

    m = re.match(
        r"CREATE\s+TABLE\s+(IF\s+NOT\s+EXISTS\s+)?(\w+)\s*\((.*)\)\s*ENGINE\s*=\s*MergeTree\(\)\s*(.*)$",
        s,
        re.IGNORECASE | re.DOTALL,
    )
    if m:
        if_not_exists, name, cols_src, tail = (
            bool(m.group(1)),
            m.group(2),
            m.group(3),
            m.group(4),
        )
        fields = []
        for coldef in cols_src.split(","):
            coldef = coldef.strip()
            if not coldef:
                continue
            cname, ctype = coldef.split()[:2]
            dt = _CH_TYPES.get(ctype.lower())
            if dt is None:
                raise NotImplementedError(f"unsupported ClickHouse type {ctype!r}")
            fields.append(T.StructField(cname, dt, False))

        partition_column = None
        pm = re.search(r"PARTITION\s+BY\s+toYYYYMMDDhh\((\w+)\)", tail, re.IGNORECASE)
        if pm:
            if pm.group(1) != "event_time":
                raise NotImplementedError(
                    "hourly partitioning is wired to event_time (the reference's "
                    "only partition expression, create_local.sql:18)"
                )
            partition_column = "event_hour"
        elif re.search(r"PARTITION\s+BY", tail, re.IGNORECASE):
            raise NotImplementedError("only PARTITION BY toYYYYMMDDhh(...) is supported")

        order_columns: list[str] = []
        om = re.search(r"ORDER\s+BY\s+\(([^)]*)\)", tail, re.IGNORECASE)
        if om:
            order_columns = [c.strip() for c in om.group(1).split(",")]

        settings: dict[str, int] = {}
        sm = re.search(r"SETTINGS\s+(.*)$", tail, re.IGNORECASE | re.DOTALL)
        if sm:
            for part in sm.group(1).split(","):
                k, v = part.split("=")
                settings[k.strip()] = int(v.strip())

        return {
            "op": "create",
            "name": name,
            "if_not_exists": if_not_exists,
            "schema": T.StructType(fields),
            "partition_column": partition_column,
            "order_columns": order_columns,
            "settings": settings,
        }

    return None
