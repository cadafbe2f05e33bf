"""clickhousedatamocker_spark — a PySpark-native rebuild of the capability
surface of gauss1314/ClickHouseDataMocker.

The reference (see /root/reference, SURVEY.md) is a ClickHouse load-generation
and flow-control observation harness. This package re-expresses every
capability Spark-first:

- deterministic columnar synthetic data generation (``sources.generator``)
- partitioned-table lifecycle + catalog (``plans.catalog``)
- batched partitioned ingest with admission control (``plans.ingest``,
  ``plans.flow_control``)
- system introspection tables (``plans.parts``, ``plans.metrics``)
- the monitoring query surface + scalar functions ``toYYYYMMDDhh`` /
  ``formatReadableSize`` (``functions.scalar``)
- the one-shot orchestration harness (``harness``)
- LLM-data-pipeline extensions: dedup / similarity / text analysis /
  multimodal (``operators``)
"""

from clickhousedatamocker_spark.engine import Engine
from clickhousedatamocker_spark.session import get_spark

__all__ = ["Engine", "get_spark"]
