"""Fixture-table loaders.

``load_table`` is the single entry point every query builder uses; it
normalizes the storage quirks in the driver fixtures (timestamp columns
are tz-less parquet TIMESTAMP — NANOS in some fixture generations,
MICROS in others) so downstream code always sees a plain ``timestamp``
column holding the same UTC instants the DuckDB oracle sees; see
``pin_fixture_confs``.

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


def pin_fixture_confs(spark: SparkSession, name: str) -> None:
    """Runtime-settable session confs every fixture read depends on.

    Called by both the batch (``load_table``) and streaming
    (``streaming.ops.stream_table``) read paths because the caller's
    session (e.g. the driver harness's) may not carry them:

    - ``nanosAsLong``: events.parquet has stored TIMESTAMP(NANOS) in some
      fixture generations, which Spark rejects without this flag.
    - ``inferTimestampNTZ=false``: the fixtures store tz-less
      TIMESTAMP(MICROS), which Spark 4 infers as TIMESTAMP_NTZ by default.
      NTZ (a) breaks epoch functions like unix_micros (no NTZ overload)
      and (b) diverges from the DuckDB oracle, which treats naive
      timestamps as UTC instants. With inference off, Spark reads the
      stored micros directly as TIMESTAMP (UTC epoch) — the same instants
      DuckDB sees — and filters on these columns stay eligible for parquet
      predicate pushdown (no cast wrapping the column).
    - session tz UTC so formatted output matches the oracle under any
      caller session.
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    if spark.conf.get("spark.sql.parquet.inferTimestampNTZ.enabled", "true") != "false":
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    if spark.conf.get("spark.sql.session.timeZone") != "UTC":
        spark.conf.set("spark.sql.session.timeZone", "UTC")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    pin_fixture_confs(spark, name)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # ns → µs with integer division: ns epoch values exceed 2^53 so
        # float division would lose microsecond precision.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def parallelize_scan(df: DataFrame, partitions: int | None = None) -> DataFrame:
    """Spread a small-but-compute-heavy input across the cluster —
    only when the scan is actually under-split.

    The fixture tables are single-row-group parquet files, which caps
    the scan at one task no matter how many cores exist — so per-row
    CPU-heavy operators (minhash shingling, simhash, per-doc hashing)
    would serialize. For those, an explicit repartition moves the raw
    input rows once to unlock full parallelism for the expensive map
    work.

    A ``repartition`` is NEVER free — it is a full exchange of the raw
    input, which at corpus scale means shuffling the whole dataset
    before any map work. On a real cluster the corpus arrives as many
    files/row groups and Catalyst's split planning already yields one
    task per split, so this helper checks the scan's actual partition
    count first and returns the input UNCHANGED when it already meets
    the target parallelism — the shuffle exists only in the
    single-file-fixture regime that needs it. Never use it in front of
    plain scans/aggregations where split planning is enough.
    """
    if partitions is None:
        partitions = df.sparkSession.sparkContext.defaultParallelism
    # NOTE (measured ×100, r12): do NOT relax this to "skip when the
    # scan has most of the target parallelism". The dedup family's
    # diamond plans lean on this repartition as their shared
    # ReuseExchange point — skipping it at 25-of-32 partitions blew
    # dedup_minhash_calibration 8.1 → 31.7 s and
    # dedup_containment_pairs 9.6 → 16.0 s, far more than the saved
    # raw-input shuffle. Exchange-reuse breakage above this node comes
    # from non-identical CONSUMER subtrees (join-inferred IsNotNull
    # filters differing per branch) and is fixed by stating those
    # guards explicitly in the op (see text_perplexity_filter_audit).
    if df.rdd.getNumPartitions() >= partitions:
        return df
    return df.repartition(partitions)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all fixture tables as temp views (for spark.sql queries)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
