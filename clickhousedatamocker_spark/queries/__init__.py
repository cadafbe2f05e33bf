"""Declared query surface — the SURVEY §2 inventory, oracle-checked.

Each entry pairs a Spark implementation (DataFrame API or spark.sql) with an
equivalent DuckDB oracle SQL string. The driver runs both at sf=0.01 and
compares row-count + schema + order-insensitive value hash, so every
implementation here is hash-exact by construction (see queries/base.py for
the float-determinism rules that make that possible).
"""

from clickhousedatamocker_spark.queries.base import REGISTRY, QuerySpec, register

# importing the modules populates REGISTRY
from clickhousedatamocker_spark.queries import relational  # noqa: E402,F401
from clickhousedatamocker_spark.queries import monitoring  # noqa: E402,F401
from clickhousedatamocker_spark.queries import llm  # noqa: E402,F401
from clickhousedatamocker_spark.queries import streaming_q  # noqa: E402,F401

__all__ = ["REGISTRY", "QuerySpec", "register"]
