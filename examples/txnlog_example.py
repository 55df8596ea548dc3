#!/usr/bin/env python
"""Streaming into a transaction-log table, end to end.

The reference requires a Hive ACID destination
(``HiveStreamingExample.scala:26-31``); the ``table.format=txnlog``
provider maps the same guarantee onto a self-contained Delta-style
commit log (``spark_hive_streaming_sink_spark/streaming/txnlog.py``).
This example drives the full lifecycle:

    1. stream the events fixture into a txnlog destination
       (exactly-once: the commit log is the replay ledger);
    2. snapshot read (format-aware — a naive ``spark.table`` read of a
       log-backed table is EMPTY by design, never partial);
    3. append a second stream run; poll the CHANGE FEED incrementally;
    4. compact the small files (one atomic add+remove commit);
    5. time-travel to every earlier version;
    6. vacuum the retired files.

Run: ``python examples/txnlog_example.py [sf_dir]`` (defaults to the
sf0.001 fixtures).
"""

from __future__ import annotations

import sys
import tempfile
import uuid

from pyspark.sql import SparkSession

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from spark_hive_streaming_sink_spark.streaming.ops import stream_table
from spark_hive_streaming_sink_spark.streaming.sink import write_stream_to_table
from spark_hive_streaming_sink_spark.streaming.txnlog import (
    TxnLogPublisher,
    TxnLogTable,
    compact_txnlog_table,
    read_txnlog_table,
    read_txnlog_table_changes,
)


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("txnlog-example")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    run = uuid.uuid4().hex[:8]
    base = tempfile.mkdtemp(prefix=f"txnlog_example_{run}_")
    table = f"events_txnlog_{run}"
    import os

    os.makedirs(f"{base}/tbl", exist_ok=True)  # quiet Spark's empty-location probe
    spark.sql(
        f"CREATE TABLE {table} (event_id BIGINT, user_id BIGINT, "
        f"value DOUBLE, event_type STRING) USING PARQUET "
        f"LOCATION '{base}/tbl'"
    )

    def stream_once(ckpt: str) -> None:
        ev = stream_table(spark, sf_dir, "events").select(
            "event_id", "user_id", "value", "event_type"
        )
        q = write_stream_to_table(
            ev,
            checkpoint_dir=f"{base}/{ckpt}",
            db="default",
            table=table,
            trigger={"availableNow": True},
            **{"table.format": "txnlog"},
        )
        q.awaitTermination()

    # 1+2: first run lands in the snapshot; naive reads stay empty
    stream_once("ckpt1")
    snap = read_txnlog_table(spark, "default", table)
    print(f"snapshot after run 1: {snap.count()} rows")
    print(f"naive spark.table read: {spark.table(table).count()} rows (by design)")

    # 3: change feed across a second run
    _, watermark = read_txnlog_table_changes(spark, "default", table)
    stream_once("ckpt2")
    changes, watermark = read_txnlog_table_changes(
        spark, "default", table, since_version=watermark
    )
    print(f"change feed delivered {changes.count()} new rows "
          f"(watermark -> v{watermark})")

    # 4: compaction — one atomic add+remove commit
    log = TxnLogTable(spark, f"{base}/tbl")
    before = len(log.snapshot_files())
    res = compact_txnlog_table(spark, "default", table, max_files=1)
    print(f"compaction: {before} files -> {res.get('files_after', before)}")

    # 5: time travel
    for v in log.versions():
        n = read_txnlog_table(spark, "default", table, as_of_version=v).count()
        print(f"  as of v{v}: {n} rows")

    # 6: vacuum the retired dirs (retention 0 here; default is 24h)
    pub = TxnLogPublisher(spark, f"default.{table}", [], "example", f"{base}/tbl")
    print(f"vacuum removed {len(pub.vacuum_orphans(retention_ms=0))} dirs; "
          f"snapshot still {read_txnlog_table(spark, 'default', table).count()} rows")
    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:2])
