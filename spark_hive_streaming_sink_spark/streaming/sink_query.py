"""End-to-end sink exercise registered as a driver-checked query.

Creates a partitioned warehouse table, streams the events fixture into
it through :func:`write_stream_to_table` (validation → foreachBatch →
idempotent dynamic-partition insert), reads the table back and returns
it — so the driver's DuckDB hash check certifies the whole sink path,
equivalent to the reference's example pipeline
(``HiveStreamingExample.scala:63-90``) but verifiable offline.
"""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from ..registry import register
from .ops import stream_table
from .sink import write_stream_to_table


@register(
    "sink_hive_streaming",
    oracle="SELECT event_id, user_id, value, event_type FROM events",
    tags=("streaming", "sink"),
)
def sink_hive_streaming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream events → partitioned table (dynamic partition routing on
    event_type, mirroring ``HiveStreamDataWriter.scala:73-83``) →
    read back. Row-for-row equality with the source is the sink's
    correctness contract."""
    run_id = uuid.uuid4().hex[:10]
    base = tempfile.mkdtemp(prefix=f"shss_sink_{run_id}_")
    table = f"events_sink_{run_id}"
    spark.sql(
        f"""
        CREATE TABLE {table}
        (event_id BIGINT, user_id BIGINT, value DOUBLE, event_type STRING)
        USING PARQUET PARTITIONED BY (event_type)
        LOCATION '{base}/tbl'
        """
    )
    ev = stream_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "value", "event_type"
    )
    q = write_stream_to_table(
        ev,
        checkpoint_dir=f"{base}/ckpt",
        db="default",
        table=table,
        trigger={"availableNow": True},
    )
    q.awaitTermination()
    # return a reader over the table files (independent of the temp
    # catalog entry), aligned to the oracle's column set
    return spark.table(table).select("event_id", "user_id", "value", "event_type")
