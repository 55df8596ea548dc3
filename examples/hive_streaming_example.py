#!/usr/bin/env python
"""Socket → CSV parse → partitioned-table sink, end to end.

The engine's equivalent of the reference's ``HiveStreamingExample``
(``example/.../HiveStreamingExample.scala:26-92``): read
``id,msg,continent,country`` lines from a socket, parse columnar
(split + cast — no row lambdas, unlike the Scala ``map`` at ``:69-73``),
and stream into a pre-created partitioned table via the validated,
idempotent sink.

Run: ``python examples/hive_streaming_example.py`` — self-contained
(starts its own line server; Ctrl-C to stop, or it stops after the
demo rows land).

Reference usage for comparison (README.md:41-60)::

    socket lines "1,hello,Asia,China"
      → selectExpr("_1 as id", "_2 as msg", "_3 as continent", "_4 as country")
      → writeStream.format("hive-streaming").option("db"...).option("table"...)

Ours::

    parsed.writeStream → write_stream_to_table(df, ckpt, db=..., table=...)
    (or .format("hive-streaming") via the registered Python Data Source)
"""

from __future__ import annotations

import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pyspark.sql.functions as F

from spark_hive_streaming_sink_spark.session import get_spark
from spark_hive_streaming_sink_spark.sources.stream_sources import _LineServer
from spark_hive_streaming_sink_spark.streaming.sink import write_stream_to_table

DEMO_LINES = [
    "1,hello,Asia,China",
    "2,world,Asia,India",
    "3,bonjour,Europe,France",
    "4,hola,America,Mexico",
    "5,hallo,Europe,Germany",
]


def main() -> None:
    spark = get_spark("hive-streaming-example", cpus=4, shuffle_partitions=4)
    base = tempfile.mkdtemp(prefix="hive_streaming_example_")
    # the reference requires the destination to pre-exist
    # (HiveStreamingExample.scala:26-31); partition columns are strings
    spark.sql(
        f"""
        CREATE TABLE alerts (id INT, msg STRING)
        USING PARQUET PARTITIONED BY (continent STRING, country STRING)
        LOCATION '{base}/alerts'
        """
    )
    server = _LineServer(DEMO_LINES)
    parts = F.split(F.col("value"), ",")
    parsed = (
        spark.readStream.format("socket")
        .option("host", "127.0.0.1")
        .option("port", server.port)
        .load()
        .select(
            parts.getItem(0).cast("int").alias("id"),
            parts.getItem(1).alias("msg"),
            parts.getItem(2).alias("continent"),
            parts.getItem(3).alias("country"),
        )
    )
    query = write_stream_to_table(
        parsed,
        checkpoint_dir=f"{base}/ckpt",
        db="default",
        table="alerts",
        trigger={"processingTime": "1 second"},
        query_name="hive-streaming-example",
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            if spark.table("alerts").count() >= len(DEMO_LINES):
                break
            time.sleep(0.5)
    finally:
        query.stop()
        server.close()
    print("Landed rows (partitioned by continent/country):")
    spark.table("alerts").orderBy("id").show(truncate=False)
    spark.stop()


if __name__ == "__main__":
    main()
