#!/usr/bin/env python
"""Rate source → unpartitioned-table sink.

The engine's equivalent of the reference's ``RateStreamingExample``
(``example/.../RateStreamingExample.scala:27-89``): the built-in rate
source generates ``(timestamp, value)`` rows; project ``value`` and
stream into a pre-created single-column table. The reference runs this
with either micro-batch or continuous triggers (``:81``); we run
micro-batch (continuous is incompatible with foreachBatch — documented
deviation, SURVEY.md §7d).

Run: ``python examples/rate_streaming_example.py``
"""

from __future__ import annotations

import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from spark_hive_streaming_sink_spark.session import get_spark
from spark_hive_streaming_sink_spark.streaming.sink import write_stream_to_table


def main() -> None:
    spark = get_spark("rate-streaming-example", cpus=4, shuffle_partitions=4)
    base = tempfile.mkdtemp(prefix="rate_streaming_example_")
    spark.sql(f"CREATE TABLE rate_sink (value BIGINT) USING PARQUET LOCATION '{base}/t'")
    src = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", "50")  # reference example uses 1 row/s (:65)
        .load()
        .select("value")
    )
    query = write_stream_to_table(
        src,
        checkpoint_dir=f"{base}/ckpt",
        db="default",
        table="rate_sink",
        trigger={"processingTime": "1 second"},  # reference: 3000 ms (:81)
        query_name="rate-streaming-example",
    )
    try:
        deadline = time.time() + 30
        while time.time() < deadline:
            # foreachBatch writes run in a cloned session; an unpartitioned
            # table's file listing is cached per reader session — refresh
            # before polling (partitioned tables refresh via partition metadata)
            spark.catalog.refreshTable("rate_sink")
            if spark.table("rate_sink").count() >= 50:
                break
            time.sleep(0.5)
    finally:
        query.stop()
    n = spark.table("rate_sink").count()
    print(f"rate_sink rows landed: {n}")
    spark.table("rate_sink").orderBy("value").show(5)
    spark.stop()


if __name__ == "__main__":
    main()
