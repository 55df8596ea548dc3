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
