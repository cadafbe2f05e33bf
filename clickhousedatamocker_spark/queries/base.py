"""Query-registry plumbing + cross-engine determinism helpers.

Float determinism rules (why results hash-match DuckDB exactly):

- Sums of doubles are ORDER-DEPENDENT in the low bits, and Spark/DuckDB
  aggregate in different orders. So every money/measure sum goes through
  DECIMAL (exact, order-independent), and only the final value is cast back
  to double — both engines then round the same exact decimal to the same
  nearest double.
- Averages are expressed as exact-decimal-sum-cast-double / count: one IEEE
  division of identical inputs → identical result.
- double→integer casts differ (Spark truncates, DuckDB rounds); use
  floor(x + 0.5) on both sides instead.
- LIMIT/top-k always carries a unique tiebreaker column in the ORDER BY.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhousedatamocker_spark.sources.tables import load_table


@dataclass
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL; None → driver does rows-only check
    headline: bool = False  # include in bench.py
    description: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None, *, headline: bool = False, description: str = ""):
    """Decorator: register fn(spark, sf_dir) -> DataFrame under ``name``."""

    def deco(fn):
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, headline=headline, description=description)
        return fn

    return deco


# -- Spark-side helpers ----------------------------------------------------

def dec(col: str | Column, precision: int = 18, scale: int = 2) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({precision},{scale})")


def dsum(col: str | Column, precision: int = 18, scale: int = 2) -> Column:
    """Order-independent exact sum, surfaced as double."""
    return F.sum(dec(col, precision, scale)).cast("double")


def davg(col: str | Column, precision: int = 18, scale: int = 2) -> Column:
    """Exact-sum / count as one double division (see module docstring)."""
    return F.sum(dec(col, precision, scale)).cast("double") / F.count(F.lit(1))


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


# -- oracle-side (DuckDB SQL) helpers --------------------------------------

def o_dsum(expr: str, precision: int = 18, scale: int = 2) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL({precision},{scale}))) AS DOUBLE)"


def o_davg(expr: str, precision: int = 18, scale: int = 2) -> str:
    return f"{o_dsum(expr, precision, scale)} / COUNT(*)"
