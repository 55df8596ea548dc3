"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over :mod:`spark_hive_streaming_sink_spark.registry` — every
operator from SURVEY.md §2C registers a named PySpark builder plus
(when SQL-expressible) a DuckDB oracle there.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from spark_hive_streaming_sink_spark import registry
from spark_hive_streaming_sink_spark.operators.relational import q1_pricing_summary


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H-Q1-style pricing summary) on sf0.001."""
    return q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    return registry.oracle_sql()
