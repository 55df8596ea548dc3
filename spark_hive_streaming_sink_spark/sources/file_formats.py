"""File-format source surface: CSV and JSON round-trips (SURVEY.md §2C
"sources"; the reference's socket pipeline consumes CSV *lines* —
``HiveStreamingExample.scala:69-73`` — these are the file-based
equivalents). Each query materializes a fixture table in the text
format under /tmp, reads it back through the schema-explicit reader,
and must reproduce the parquet-backed oracle exactly.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from ..io import load_table
from ..registry import register


@register(
    "source_csv_roundtrip",
    oracle="SELECT n_nationkey, n_name, n_regionkey FROM nation",
    tags=("source", "csv"),
)
def source_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV write → schema-explicit CSV read (header, explicit types —
    never schema inference at scale: it costs a full extra pass)."""
    base = tempfile.mkdtemp(prefix="shss_csv_")
    n = load_table(spark, sf_dir, "nation")
    n.write.mode("overwrite").option("header", True).csv(f"{base}/nation")
    return spark.read.schema(
        "n_nationkey int, n_name string, n_regionkey int"
    ).option("header", True).csv(f"{base}/nation")


@register(
    "source_json_roundtrip",
    oracle="""
    SELECT event_id, event_type, value,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
    FROM events
    """,
    tags=("source", "json"),
)
def source_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines write → schema-explicit JSON read, including a nested
    JSON string column re-parsed after the round trip (the reference's
    row-as-JSON wire format, ``HiveStreamDataWriter.scala:96-100``, as
    a *file* format)."""
    base = tempfile.mkdtemp(prefix="shss_json_")
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value", "props"
    )
    ev.write.mode("overwrite").json(f"{base}/events")
    back = spark.read.schema(
        "event_id bigint, event_type string, value double, props string"
    ).json(f"{base}/events")
    return back.select(
        "event_id",
        "event_type",
        "value",
        F.get_json_object("props", "$.k").cast("int").alias("k"),
    )


@register(
    "source_orc_roundtrip",
    oracle="""
    SELECT s_suppkey, s_name, s_nationkey,
           CAST(ROUND(s_acctbal * 100, 0) AS BIGINT) AS acctbal_c
    FROM supplier
    """,
    tags=("source", "orc"),
)
def source_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC write → schema-explicit ORC read. ORC is the reference's
    native destination format (transactional ORC tables,
    ``HiveStreamingExample.scala:26-31``); OSS Spark reads/writes
    non-ACID ORC natively, so the engine's columnar round trip through
    the reference's format family is exercised here. Money goes
    through exact cents after the round trip — bit-identical."""
    base = tempfile.mkdtemp(prefix="shss_orc_")
    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey", "s_acctbal"
    )
    s.write.mode("overwrite").orc(f"{base}/supplier")
    back = spark.read.schema(
        "s_suppkey bigint, s_name string, s_nationkey bigint, s_acctbal double"
    ).orc(f"{base}/supplier")
    return back.select(
        "s_suppkey",
        "s_name",
        "s_nationkey",
        F.round(F.col("s_acctbal") * 100, 0).cast("bigint").alias("acctbal_c"),
    )


@register(
    "source_partitioned_pruned_read",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n,
           CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS DOUBLE) / 100.0
             AS total
    FROM orders
    WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
    GROUP BY o_orderpriority
    """,
    tags=("source", "layout"),
)
def source_partitioned_pruned_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-style partitioned layout end to end: write orders
    partitioned by o_orderpriority (the directory layout the sink's
    dynamic partition routing produces), then read back with a
    partition-column predicate. Catalyst must prune to the two
    matching directories — the scan's PartitionFilters (asserted in
    tests/test_plans.py) are what turn a 100 TB table into a 40 TB
    read before any I/O happens.

    Partition count discipline: o_orderpriority has 5 values — a sane
    partition key. Partitioning by a high-cardinality key (o_orderkey)
    would produce millions of tiny files; that anti-pattern is what
    compact/cluster keys (layout_zorder_cluster) exist for."""
    base = tempfile.mkdtemp(prefix="shss_part_")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    o.write.mode("overwrite").partitionBy("o_orderpriority").parquet(f"{base}/orders")
    back = spark.read.parquet(f"{base}/orders").filter(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    )
    return back.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"),
        (
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint")).cast("double")
            / 100.0
        ).alias("total"),
    )


@register(
    "source_binaryfile_ingest",
    oracle="""
    WITH s AS (SELECT doc_id, regexp_replace(text, '[^ -~]', '', 'g') AS a
               FROM documents WHERE doc_id % 7 = 0),
    d AS (SELECT doc_id, a,
                 GREATEST(1, CAST(FLOOR(SQRT(CAST(length(a)//3 AS DOUBLE))) AS BIGINT)) AS w
          FROM s),
    e AS (SELECT doc_id, a, w, (length(a)//3)//w AS h FROM d WHERE length(a)//3 >= 1),
    p AS (SELECT doc_id, w, h,
                 'P6' || chr(10) || CAST(w AS VARCHAR) || ' ' || CAST(h AS VARCHAR)
                      || chr(10) || '255' || chr(10)
                      || substr(a, 1, CAST(w*h*3 AS INTEGER)) AS payload
          FROM e)
    SELECT doc_id,
           CAST(length(payload) AS BIGINT) AS n_bytes,
           sha256(payload) AS content_sha256
    FROM p
    """,
    tags=("source", "multimodal", "binary"),
)
def source_binaryfile_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The multimodal ingest path real pipelines start from: a
    directory of opaque media files read through Spark's ``binaryFile``
    source (path/length/content per file) — here one real PPM image
    file per document (encoded JVM-side, written executor-side in
    foreachPartition, the distributed-export shape; on a cluster the
    target is the shared object store). Read back, the id is parsed
    from the file name and the content hashed — the oracle reproduces
    every byte from the generating formula, so the whole
    export→ingest loop is hash-checked.

    Scale: binaryFile scans parallelize per-file and prune with
    pathGlobFilter; content hashing is map-side. The anti-pattern this
    replaces is driver-side file loops — nothing here touches the
    driver."""
    from ..functions.multimodal import ppm_payloads

    base = tempfile.mkdtemp(prefix="shss_binfile_")
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 7 == 0)
    payloads = ppm_payloads(d)

    def write_files(rows):
        for r in rows:
            with open(os.path.join(base, f"{r.doc_id}.ppm"), "wb") as f:
                f.write(bytes(r.payload))

    payloads.foreachPartition(write_files)
    back = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.ppm")
        .load(base)
    )
    return back.select(
        F.regexp_extract(F.col("path"), r"(\d+)\.ppm$", 1)
        .cast("bigint")
        .alias("doc_id"),
        F.col("length").alias("n_bytes"),
        F.sha2(F.col("content"), 256).alias("content_sha256"),
    )
