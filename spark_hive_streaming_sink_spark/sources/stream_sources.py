"""Streaming-source parity queries (SURVEY.md §2B): the socket and rate
sources the reference's examples are built on, plus the registered
``hive-streaming`` Python Data Source exercised end to end.

The socket pipeline reproduces ``HiveStreamingExample.scala:63-74``
faithfully in columnar form: socket lines → ``split(',')`` +
``getItem`` + ``cast`` (B3 — no Python lambda, unlike the Scala
``map``) → renamed projection (B4) — fed here by an in-process TCP
server serving fixture-derived CSV so the result is oracle-checkable.
"""

from __future__ import annotations

import socket
import tempfile
import threading
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from ..io import load_table
from ..registry import register


class _LineServer:
    """Single-connection TCP server feeding fixed lines to the socket
    source, holding the connection open until closed."""

    def __init__(self, lines: list[str]):
        self.lines = lines
        self.sock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self.sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self.sock.bind(("127.0.0.1", 0))
        self.port = self.sock.getsockname()[1]
        self.sock.listen(1)
        self._stop = threading.Event()
        self.thread = threading.Thread(target=self._serve, daemon=True)
        self.thread.start()

    def _serve(self) -> None:
        try:
            self.sock.settimeout(60)
            conn, _ = self.sock.accept()
            conn.sendall(("\n".join(self.lines) + "\n").encode())
            while not self._stop.is_set():  # keep alive (source reconnects on EOF)
                time.sleep(0.1)
            conn.close()
        except OSError:
            pass

    def close(self) -> None:
        self._stop.set()
        try:
            self.sock.close()
        except OSError:
            pass


@register(
    "source_socket_csv_pipeline",
    oracle="SELECT n_nationkey AS id, upper(n_name) AS name, n_regionkey AS region_id FROM nation",
    tags=("source", "streaming"),
)
def source_socket_csv_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's example pipeline (B1+B3+B4): socket source →
    CSV split/cast/rename — run against a local TCP server serving the
    nation table as CSV lines, collected via memory sink."""
    rows = load_table(spark, sf_dir, "nation").orderBy("n_nationkey").collect()
    lines = [f"{r['n_nationkey']},{r['n_name']},{r['n_regionkey']}" for r in rows]
    server = _LineServer(lines)
    name = "mem_sock_" + uuid.uuid4().hex[:10]
    parts = F.split(F.col("value"), ",")
    parsed = (
        spark.readStream.format("socket")
        .option("host", "127.0.0.1")
        .option("port", server.port)
        .load()
        .select(
            parts.getItem(0).cast("int").alias("id"),
            F.upper(parts.getItem(1)).alias("name"),
            parts.getItem(2).cast("int").alias("region_id"),
        )
    )
    q = (
        parsed.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(processingTime="300 milliseconds")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="shss_sock_"))
        .start()
    )
    try:
        deadline = time.time() + 45
        while time.time() < deadline:
            if spark.table(name).count() >= len(lines):
                break
            time.sleep(0.3)
    finally:
        q.stop()
        server.close()
    return spark.table(name)


@register(
    "source_rate_stream",
    # r14 (VERDICT item 7): the raw per-bucket counts are wall-clock
    # dependent, so the emitted columns are the DETERMINISTIC
    # invariants of the rate source instead — values are the
    # contiguous range 0..N-1, so each parity bucket is non-empty
    # (the run waits for >= 2 rows) and the two bucket counts differ
    # by at most one. DuckDB pins both verdicts to TRUE; a rate-source
    # or sink regression (dropped/duplicated batch) breaks the hash.
    oracle="""
    SELECT CAST(0 AS BIGINT) AS bucket, TRUE AS nonempty,
           TRUE AS balanced
    UNION ALL
    SELECT CAST(1 AS BIGINT), TRUE, TRUE
    """,
    tags=("source", "streaming"),
)
def source_rate_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rate source (B2, ``RateStreamingExample.scala:63-66``): generate
    rows at a fixed rate, project ``value`` (B4's ``select("value")``),
    run briefly, report the per-parity-bucket invariants (non-empty,
    counts within one of each other — exact because the generated
    values are the contiguous range 0..N-1)."""
    name = "mem_rate_" + uuid.uuid4().hex[:10]
    src = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", "100")
        .option("numPartitions", "2")
        .load()
        .select("value", (F.col("value") % 2).alias("bucket"))
    )
    q = (
        src.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(processingTime="250 milliseconds")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="shss_rate_"))
        .start()
    )
    try:
        deadline = time.time() + 30
        # >= 2 rows guarantees both parity buckets are populated
        # (values are contiguous from 0)
        while time.time() < deadline and spark.table(name).count() < 2:
            time.sleep(0.25)
    finally:
        q.stop()
    counts = spark.table(name).groupBy("bucket").agg(
        F.count("*").alias("n")
    )
    from pyspark.sql.window import Window as _W

    # two rows total: min/max over an unpartitioned window of size 2
    lo = F.min("n").over(_W.partitionBy())
    hi = F.max("n").over(_W.partitionBy())
    return counts.select(
        F.col("bucket").cast("bigint").alias("bucket"),
        (F.col("n") >= 1).alias("nonempty"),
        ((hi - lo) <= 1).alias("balanced"),
    )


@register(
    "source_python_datasource_sink",
    oracle="SELECT event_id, user_id, value, event_type FROM events",
    tags=("source", "sink", "streaming"),
)
def source_python_datasource_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end ``format("hive-streaming")`` (A1 parity): register the
    Python Data Source, stream events through it with dynamic partition
    routing on event_type, read the Hive-layout directory back — must be
    row-for-row identical to the source table."""
    from ..streaming.ops import stream_table
    from .hive_streaming_datasource import HiveStreamingDataSource

    spark.dataSource.register(HiveStreamingDataSource)
    base = tempfile.mkdtemp(prefix="shss_pyds_")
    ev = stream_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "value", "event_type"
    )
    q = (
        ev.writeStream.format("hive-streaming")
        .option("path", f"{base}/tbl")
        .option("partition.columns", "event_type")
        .option("db", "default")
        .option("table", "events_pyds")
        .option("checkpointLocation", f"{base}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(f"{base}/tbl").select(
        "event_id", "user_id", "value", F.col("event_type").cast("string").alias("event_type")
    )


@register(
    "source_python_datasource_reader",
    oracle=f"""
    WITH s AS (
      SELECT i AS id, (i * 37) % 1000 AS val,
             'g' || CAST(i % 4 AS VARCHAR) AS tag
      FROM generate_series(0, {4000 - 1}) AS t(i))
    SELECT tag,
           COUNT(*) AS n,
           CAST(SUM(val) AS BIGINT) AS val_sum,
           MIN(id) AS min_id,
           MAX(id) AS max_id
    FROM s GROUP BY tag
    """,
    tags=("source", "streaming"),
)
def source_python_datasource_reader(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python Data Source streaming READER (`format("seq-stream")`) —
    the ingest-side complement of the ``hive-streaming`` writer: a
    deterministic offset-replayable sequence source (Kafka's
    offset+partition contract without a broker) drained with
    availableNow, aggregated, and checked against the generating
    formula restated in SQL. ``partitions()`` splits each offset range
    8 ways, so the read parallelizes like topic-partitions."""
    from ..streaming.ops import run_to_memory
    from .seq_stream_source import SeqStreamDataSource

    spark.dataSource.register(SeqStreamDataSource)
    sdf = spark.readStream.format("seq-stream").load()
    agg = sdf.groupBy("tag").agg(
        F.count("*").alias("n"),
        F.sum("val").cast("bigint").alias("val_sum"),
        F.min("id").alias("min_id"),
        F.max("id").alias("max_id"),
    )
    return run_to_memory(agg, mode="complete")
