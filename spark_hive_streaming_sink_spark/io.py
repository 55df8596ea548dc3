"""Fixture-table loaders.

``load_table`` is the single entry point every query builder uses; it
normalizes the one storage quirk in the driver fixtures (``events.ts``
is parquet TIMESTAMP(NANOS), which Spark reads as nanosecond longs
under ``spark.sql.legacy.parquet.nanosAsLong``) so downstream code sees
a plain ``timestamp`` column identical to what the DuckDB oracle sees
(DuckDB truncates ns → µs on read).

Reads go through ``spark.read.parquet`` so Catalyst keeps predicate
pushdown / column pruning; nothing here materializes data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # events.parquet stores TIMESTAMP(NANOS) which Spark rejects unless
        # this (runtime-settable) conf is on — the caller's session (e.g. the
        # driver harness's) may not have it, so set it here.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # ns → µs with integer division: ns epoch values exceed 2^53 so
        # float division would lose microsecond precision.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def parallelize_scan(df: DataFrame, partitions: int | None = None) -> DataFrame:
    """Spread a small-but-compute-heavy input across the cluster.

    The fixture tables are single-row-group parquet files, which caps
    the scan at one task no matter how many cores exist — so per-row
    CPU-heavy operators (minhash shingling, simhash, per-doc hashing)
    would serialize. This explicit repartition moves only the raw input
    rows (cheap) to unlock full parallelism for the expensive map work.
    On a real cluster the corpus arrives as many files/row groups and
    this becomes a no-op-cost round-robin; never use it in front of
    plain scans/aggregations where Catalyst's split planning is enough.
    """
    if partitions is None:
        partitions = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(partitions)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all fixture tables as temp views (for spark.sql queries)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
