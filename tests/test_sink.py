"""Sink-semantics tests mirroring the reference's validations
(SURVEY.md §5, FIXTURES.md §A negative paths)."""

from __future__ import annotations

import os
import tempfile
import uuid

import pytest
import pyspark.sql.functions as F

from spark_hive_streaming_sink_spark.streaming.sink import (
    BatchCommitLedger,
    HiveSinkOptions,
    HiveStreamingSinkError,
    make_batch_writer,
    validate_destination,
    write_stream_to_table,
)
from spark_hive_streaming_sink_spark.streaming.ops import stream_table

from .conftest import SF_DIR


def _mk_table(spark, partitioned=True):
    run_id = uuid.uuid4().hex[:10]
    base = tempfile.mkdtemp(prefix=f"shss_test_{run_id}_")
    table = f"alerts_{run_id}"
    part = "PARTITIONED BY (event_type)" if partitioned else ""
    spark.sql(
        f"CREATE TABLE {table} (event_id BIGINT, user_id BIGINT, value DOUBLE, "
        f"event_type STRING) USING PARQUET {part} LOCATION '{base}/tbl'"
    )
    return table, base


def test_missing_table_rejected(spark):
    # HiveSourceProvider.scala:46-52
    opts = HiveSinkOptions(db="default", table="does_not_exist_xyz")
    with pytest.raises(HiveStreamingSinkError, match="does not exist"):
        validate_destination(spark, ["a", "b"], opts)


def test_schema_name_set_mismatch_rejected(spark):
    # HiveSourceProvider.scala:55-58
    table, _ = _mk_table(spark)
    opts = HiveSinkOptions(db="default", table=table)
    with pytest.raises(HiveStreamingSinkError, match="Schema mismatch"):
        validate_destination(spark, ["event_id", "user_id", "value", "wrong_col"], opts)


def test_non_append_mode_rejected(spark):
    # HiveSourceProvider.scala:42-44
    table, _ = _mk_table(spark)
    opts = HiveSinkOptions(db="default", table=table)
    with pytest.raises(HiveStreamingSinkError, match="Append"):
        validate_destination(
            spark, ["event_id", "user_id", "value", "event_type"], opts, "complete"
        )


def test_missing_required_options():
    # HiveOptions.scala:89-96
    with pytest.raises(HiveStreamingSinkError, match="db"):
        HiveSinkOptions.from_options({"table": "t"})
    with pytest.raises(HiveStreamingSinkError, match="table"):
        HiveSinkOptions.from_options({"db": "d"})


def test_option_defaults_and_names():
    o = HiveSinkOptions.from_options(
        {"db": "d", "table": "t", "batch.size": "5000", "txn.per.batch": "10",
         "metastore": "thrift://localhost:9083", "auto.create.partitions": "false"}
    )
    assert o.batch_size == 5000
    assert o.txn_per_batch == 10
    assert o.auto_create_partitions is False
    assert o.qualified_name == "d.t"


def test_metastore_option_validated_not_silently_ignored():
    # HiveOptions.scala:89-96 requires a thrift metastore URI; the
    # Spark-native sink honors local URIs and fails loudly on remote
    # ones (session catalog is the write path — writing locally while
    # the caller expects a remote Hive would misplace data)
    with pytest.raises(HiveStreamingSinkError, match="thrift://"):
        HiveSinkOptions.from_options({"db": "d", "table": "t", "metastore": "hive:9083"})
    with pytest.raises(HiveStreamingSinkError, match="remote host"):
        HiveSinkOptions.from_options(
            {"db": "d", "table": "t", "metastore": "thrift://warehouse-prod:9083"}
        )
    assert (
        HiveSinkOptions.from_options(
            {"db": "d", "table": "t", "metastore": "thrift://127.0.0.1:9083"}
        ).metastore
        == "thrift://127.0.0.1:9083"
    )


def test_kerberos_options_fail_loudly():
    # HiveOptions.scala:61-75 logs in from principal/keytab per writer;
    # Spark-native auth is cluster-level (spark-submit --principal/--keytab).
    # Accepting-and-ignoring these would silently skip auth on a
    # kerberized cluster, so the sink refuses them with a pointer.
    with pytest.raises(HiveStreamingSinkError, match="--principal/--keytab"):
        HiveSinkOptions.from_options(
            {"db": "d", "table": "t", "principal": "svc@EXAMPLE.COM"}
        )
    with pytest.raises(HiveStreamingSinkError, match="principal, keytab"):
        HiveSinkOptions.from_options(
            {"db": "d", "table": "t",
             "principal": "svc@EXAMPLE.COM", "keytab": "/tmp/svc.keytab"}
        )


def test_batch_replay_idempotent(spark):
    """Same batch id applied twice must not duplicate rows — the
    improvement over the reference's at-least-once (§1.4)."""
    table, base = _mk_table(spark)
    opts = HiveSinkOptions(db="default", table=table)
    part_cols = validate_destination(
        spark, ["event_id", "user_id", "value", "event_type"], opts
    )
    assert part_cols == ["event_type"]
    ledger = BatchCommitLedger(os.path.join(base, "ledger"))
    writer = make_batch_writer(opts, part_cols, ledger, [])
    batch = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select("event_id", "user_id", "value", "event_type")
        .limit(100)
    )
    writer(batch, 0)
    n1 = spark.table(table).count()
    writer(batch, 0)  # replay
    assert spark.table(table).count() == n1 == 100
    writer(batch, 1)  # genuinely new batch appends
    assert spark.table(table).count() == 200


def test_end_to_end_stream_with_partition_routing(spark):
    table, base = _mk_table(spark)
    ev = stream_table(spark, SF_DIR, "events").select(
        "event_id", "user_id", "value", "event_type"
    )
    q = write_stream_to_table(
        ev, checkpoint_dir=f"{base}/ckpt", db="default", table=table
    )
    q.awaitTermination()
    src = spark.read.parquet(f"{SF_DIR}/events.parquet")
    assert spark.table(table).count() == src.count()
    # dynamic partition routing created one directory per event_type
    part_dirs = {d for d in os.listdir(f"{base}/tbl") if d.startswith("event_type=")}
    types = {r[0] for r in src.select("event_type").distinct().collect()}
    assert part_dirs == {f"event_type={t}" for t in types}
    # per-type row counts survive the routing
    got = {
        r["event_type"]: r["cnt"]
        for r in spark.table(table).groupBy("event_type").agg(F.count("*").alias("cnt")).collect()
    }
    want = {
        r["event_type"]: r["cnt"]
        for r in src.groupBy("event_type").agg(F.count("*").alias("cnt")).collect()
    }
    assert got == want


def test_auto_create_partitions_false_rejects_new(spark):
    # HiveOptions.scala:35 — auto.create.partitions=false must reject
    # rows destined for partitions that don't exist yet
    table, base = _mk_table(spark)
    opts = HiveSinkOptions(db="default", table=table, auto_create_partitions=False)
    part_cols = validate_destination(
        spark, ["event_id", "user_id", "value", "event_type"], opts
    )
    ledger = BatchCommitLedger(os.path.join(base, "ledger"))
    writer = make_batch_writer(opts, part_cols, ledger, [])
    batch = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select("event_id", "user_id", "value", "event_type")
        .limit(50)
    )
    with pytest.raises(HiveStreamingSinkError, match="unknown partition"):
        writer(batch, 0)
    # pre-create the partitions -> same batch now lands
    for (t,) in batch.select("event_type").distinct().collect():
        spark.sql(f"ALTER TABLE {table} ADD PARTITION (event_type='{t}')")
    writer(batch, 0)
    assert spark.table(table).count() == 50


def test_sink_to_orc_table(spark):
    """The reference's destinations are ORC tables (DDL at
    HiveStreamingExample.scala:26-31, 'stored as orc'); the sink must
    land micro-batches into ORC-format destinations identically."""
    run_id = uuid.uuid4().hex[:10]
    base = tempfile.mkdtemp(prefix=f"shss_orc_{run_id}_")
    table = f"alerts_orc_{run_id}"
    spark.sql(
        f"CREATE TABLE {table} (event_id BIGINT, user_id BIGINT, value DOUBLE, "
        f"event_type STRING) USING ORC PARTITIONED BY (event_type) LOCATION '{base}/tbl'"
    )
    ev = stream_table(spark, SF_DIR, "events").select(
        "event_id", "user_id", "value", "event_type"
    )
    q = write_stream_to_table(ev, checkpoint_dir=f"{base}/ckpt", db="default", table=table)
    q.awaitTermination()
    src = spark.read.parquet(f"{SF_DIR}/events.parquet")
    assert spark.table(table).count() == src.count()
    # files on disk really are ORC
    import glob
    files = glob.glob(f"{base}/tbl/event_type=*/*.orc")
    assert files, "no .orc data files written"


def test_compaction_reduces_files_preserves_rows(spark):
    from spark_hive_streaming_sink_spark.streaming.sink import compact_table

    table, base = _mk_table(spark)
    opts = HiveSinkOptions(db="default", table=table)
    part_cols = validate_destination(
        spark, ["event_id", "user_id", "value", "event_type"], opts
    )
    ledger = BatchCommitLedger(os.path.join(base, "ledger"))
    writer = make_batch_writer(opts, part_cols, ledger, [])
    src = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "event_id", "user_id", "value", "event_type"
    )
    # simulate 6 micro-batches -> >=6 files per partition
    for i in range(6):
        writer(src.filter(F.col("event_id") % 6 == i), i)
    before = spark.table(table).count()
    import glob
    n_files_before = len(glob.glob(f"{base}/tbl/event_type=*/*.parquet"))
    rewritten = compact_table(spark, "default", table, max_files_per_partition=2)
    assert rewritten, "expected crowded partitions to be rewritten"
    n_files_after = len(glob.glob(f"{base}/tbl/event_type=*/*.parquet"))
    assert n_files_after < n_files_before
    assert spark.table(table).count() == before == src.count()
    # contents identical, not just counts
    got = sorted(tuple(r) for r in spark.table(table).collect())
    want = sorted(tuple(r) for r in src.collect())
    assert got == want


def test_twsip_gating_matches_runtime():
    """stream_transform_with_state registers iff the python protobuf
    dependency (required by transformWithStateInPandas's worker
    channel) is importable — never a registered-but-crashing query."""
    from spark_hive_streaming_sink_spark.registry import queries
    from spark_hive_streaming_sink_spark.streaming.stateful import _twsip_available

    assert ("stream_transform_with_state" in queries()) == _twsip_available()


def test_upsert_across_separate_batches(spark, tmp_path):
    """Cross-batch upsert path: originals land in run 1, amendments in
    run 2 (separate streaming queries → separate micro-batches); the
    merge-with-existing branch must leave exactly the amended rows."""
    import pyspark.sql.functions as F
    from spark_hive_streaming_sink_spark.streaming.ops import stream_table
    from spark_hive_streaming_sink_spark.streaming.sink_query import (
        make_upsert_batch_writer,
    )

    table = "events_upsert_xbatch"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    spark.sql(
        f"""
        CREATE TABLE {table}
        (event_id BIGINT, user_id BIGINT, value DOUBLE, ts_us BIGINT,
         event_type STRING)
        USING PARQUET PARTITIONED BY (event_type)
        LOCATION '{tmp_path}/tbl'
        """
    )
    sf_dir = "/root/testdata/sf0.001"
    writer = make_upsert_batch_writer(table)

    def run(stream_df, ckpt):
        q = (
            stream_df.writeStream.foreachBatch(writer)
            .option("checkpointLocation", str(tmp_path / ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        spark.catalog.refreshTable(table)

    base = stream_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "value", F.unix_micros("ts").alias("ts_us"), "event_type"
    )
    run(base, "ckpt1")
    n_orig = spark.table(table).count()
    amended = base.withColumn("value", F.col("value") + 1000.0).withColumn(
        "ts_us", F.col("ts_us") + 3_600_000_000
    )
    run(amended, "ckpt2")
    final = spark.table(table)
    static = spark.read.parquet(f"{sf_dir}/events.parquet")
    assert n_orig == static.count()
    assert final.count() == static.count()  # upsert, not append
    # every surviving row is the amended copy
    assert final.filter(F.col("value") < 1000.0).count() == 0
    spark.sql(f"DROP TABLE {table}")


def test_restart_from_checkpoint_and_ledger_no_duplicates(spark, tmp_path):
    """Recovery semantics end-to-end: (1) re-running the same bounded
    stream with the SAME checkpoint processes nothing new (Spark's
    offset log); (2) a FRESH checkpoint replays the input but the
    batch-id ledger skips the already-committed batch — either way the
    table never sees duplicate rows (the upgrade over the reference's
    at-least-once, SURVEY.md §1.4)."""
    import pyspark.sql.functions as F
    from spark_hive_streaming_sink_spark.streaming.ops import stream_table
    from spark_hive_streaming_sink_spark.streaming.sink import write_stream_to_table

    table = "events_restart_test"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    spark.sql(
        f"""
        CREATE TABLE {table}
        (event_id BIGINT, user_id BIGINT, value DOUBLE, event_type STRING)
        USING PARQUET PARTITIONED BY (event_type)
        LOCATION '{tmp_path}/tbl'
        """
    )
    sf_dir = "/root/testdata/sf0.001"
    ledger_dir = str(tmp_path / "ledger")

    def run(ckpt):
        ev = stream_table(spark, sf_dir, "events").select(
            "event_id", "user_id", "value", "event_type"
        )
        q = write_stream_to_table(
            ev,
            checkpoint_dir=str(tmp_path / ckpt),
            db="default",
            table=table,
            trigger={"availableNow": True},
            **{"ledger.dir": ledger_dir},
        )
        q.awaitTermination()
        spark.catalog.refreshTable(table)
        return spark.table(table).count()

    expected = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert run("ckpt_a") == expected          # first run lands everything
    assert run("ckpt_a") == expected          # same checkpoint: no-op
    assert run("ckpt_b") == expected          # fresh checkpoint: ledger skips
    spark.sql(f"DROP TABLE {table}")


def test_arrow_writer_null_and_special_partition_values(spark, tmp_path):
    """Rows with NULL partition values must not be silently dropped
    (they route to __HIVE_DEFAULT_PARTITION__ and read back as NULL),
    and values containing '/' or '=' must escape to valid Hive dir
    names that Spark's partition discovery decodes losslessly."""
    import pyarrow as pa

    from spark_hive_streaming_sink_spark.sources.hive_streaming_datasource import (
        HiveStreamingArrowWriter,
        _escape_partition_value,
    )

    assert _escape_partition_value(None) == "__HIVE_DEFAULT_PARTITION__"
    assert _escape_partition_value(float("nan")) == "__HIVE_DEFAULT_PARTITION__"
    assert _escape_partition_value("a/b=c:d") == "a%2Fb%3Dc%3Ad"
    assert _escape_partition_value("plain") == "plain"

    root = str(tmp_path / "tbl")
    w = HiveStreamingArrowWriter(root, ["event_type"], ["event_id", "event_type"])
    batch = pa.record_batch(
        {
            "event_id": pa.array([1, 2, 3, 4], type=pa.int64()),
            "event_type": pa.array(["click", None, "a/b=c", "click"]),
        }
    )
    msg = w.write(iter([batch]))
    rel_dirs = sorted({os.path.dirname(rel) for _, rel in msg.files})
    assert rel_dirs == [
        "event_type=__HIVE_DEFAULT_PARTITION__",
        "event_type=a%2Fb%3Dc",
        "event_type=click",
    ]
    w.commit([msg], batchId=0)

    back = spark.read.parquet(root)
    got = sorted(
        (r.event_id, r.event_type) for r in back.select("event_id", "event_type").collect()
    )
    assert got == [(1, "click"), (2, None), (3, "a/b=c"), (4, "click")]


def test_shared_ledger_dir_no_cross_query_collision(spark, tmp_path):
    """Two queries into two tables sharing one ledger.dir must not skip
    each other's batches (markers are namespaced per destination —
    pre-fix, both wrote <dir>/batch-0 and the second query silently
    dropped its first batch)."""
    sf_dir = "/root/testdata/sf0.001"
    ledger_dir = str(tmp_path / "shared_ledger")
    expected = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    counts = {}
    for i, table in enumerate(["ledger_iso_a", "ledger_iso_b"]):
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        spark.sql(
            f"CREATE TABLE {table} (event_id BIGINT, user_id BIGINT, value DOUBLE, "
            f"event_type STRING) USING PARQUET PARTITIONED BY (event_type) "
            f"LOCATION '{tmp_path}/tbl_{i}'"
        )
        ev = stream_table(spark, sf_dir, "events").select(
            "event_id", "user_id", "value", "event_type"
        )
        q = write_stream_to_table(
            ev,
            checkpoint_dir=str(tmp_path / f"ckpt_{i}"),
            db="default",
            table=table,
            trigger={"availableNow": True},
            **{"ledger.dir": ledger_dir},
        )
        q.awaitTermination()
        spark.catalog.refreshTable(table)
        counts[table] = spark.table(table).count()
        spark.sql(f"DROP TABLE {table}")
    assert counts == {"ledger_iso_a": expected, "ledger_iso_b": expected}


def test_single_writer_per_destination_guard(spark, tmp_path):
    """Two CONCURRENT queries into the SAME table must be refused: each
    holds its own batch-id sequence and ledger scope, so neither ledger
    can see the other's appends (check-then-write race → duplicate
    loads). The guard is per-destination and lifetime-scoped: a second
    writer is fine once the first has stopped."""
    table, base = _mk_table(spark)
    sf_dir = SF_DIR

    def ev():
        return stream_table(spark, sf_dir, "events").select(
            "event_id", "user_id", "value", "event_type"
        )

    q1 = write_stream_to_table(
        ev(),
        checkpoint_dir=f"{base}/ckpt1",
        db="default",
        table=table,
        trigger={"processingTime": "10 seconds"},  # stays active
    )
    try:
        with pytest.raises(HiveStreamingSinkError, match="single-writer"):
            write_stream_to_table(
                ev(),
                checkpoint_dir=f"{base}/ckpt2",
                db="default",
                table=table,
                trigger={"availableNow": True},
            )
    finally:
        q1.stop()
        q1.awaitTermination()
    # sequential reuse after stop: the registry sees isActive == False
    q2 = write_stream_to_table(
        ev(),
        checkpoint_dir=f"{base}/ckpt3",
        db="default",
        table=table,
        trigger={"availableNow": True},
    )
    q2.awaitTermination()
    spark.catalog.refreshTable(table)
    assert spark.table(table).count() > 0
    spark.sql(f"DROP TABLE {table}")


class _FaultInjectedLedger(BatchCommitLedger):
    """Ledger that simulates a crash around the marker write — once.

    ``crash="before"`` dies between the insert's job commit and the
    marker write (the documented at-least-once window,
    streaming/sink.py:183-191); ``crash="after"`` dies once the marker
    is durable but before foreachBatch returns (so Spark's commit log
    never records the batch either).
    """

    def __init__(self, ledger_dir: str, crash: str):
        super().__init__(ledger_dir)
        self.crash = crash
        self.tripped = False

    def record(self, batch_id: int) -> None:
        if self.crash == "before" and not self.tripped:
            self.tripped = True
            raise RuntimeError("injected crash before ledger marker")
        super().record(batch_id)
        if self.crash == "after" and not self.tripped:
            self.tripped = True
            raise RuntimeError("injected crash after ledger marker")


def _run_events_stream(spark, table, ckpt, ledger):
    opts = HiveSinkOptions(db="default", table=table)
    part_cols = validate_destination(
        spark, ["event_id", "user_id", "value", "event_type"], opts
    )
    ev = stream_table(spark, "/root/testdata/sf0.001", "events").select(
        "event_id", "user_id", "value", "event_type"
    )
    q = (
        ev.writeStream.foreachBatch(make_batch_writer(opts, part_cols, ledger, []))
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    spark.catalog.refreshTable(table)
    return spark.table(table).count()


def test_crash_between_publish_and_marker_is_exactly_once(spark, tmp_path):
    """The historical at-least-once window (crash AFTER the batch's
    publish but BEFORE the ledger marker) is CLOSED by the staged
    publish: the replay re-enters publish, finds the durable manifest
    with every target file already renamed into the table, re-appends
    nothing, and then writes the marker — exactly-once contents with no
    dedup-on-replay needed."""
    from pyspark.errors import StreamingQueryException

    table, _ = _mk_table(spark)
    ledger_dir = str(tmp_path / "ledger")
    ckpt = str(tmp_path / "ckpt")
    expected = spark.read.parquet("/root/testdata/sf0.001/events.parquet").count()

    with pytest.raises(StreamingQueryException, match="before ledger marker"):
        _run_events_stream(
            spark, table, ckpt, _FaultInjectedLedger(ledger_dir, crash="before")
        )
    spark.catalog.refreshTable(table)
    # the staged publish already landed; the marker did not
    assert spark.table(table).count() == expected
    assert not BatchCommitLedger(ledger_dir).committed(0)

    # restart from the same checkpoint: Spark replays the batch, the
    # manifest resume skips every already-published file -> no dupes
    total = _run_events_stream(spark, table, ckpt, BatchCommitLedger(ledger_dir))
    assert total == expected, "manifest resume must not duplicate the batch"
    assert spark.table(table).dropDuplicates(["event_id"]).count() == expected
    # marker now durable; a further restart from a fresh checkpoint
    # (same ledger) adds nothing, and the staging dir was reclaimed
    assert BatchCommitLedger(ledger_dir).committed(0)
    assert (
        _run_events_stream(
            spark, table, str(tmp_path / "ckpt2"), BatchCommitLedger(ledger_dir)
        )
        == total
    )


def test_crash_mid_publish_resumes_exactly_once(spark, tmp_path):
    """Hardest crash point: some manifest entries renamed into the
    table, some still staged (a crash inside the publish loop). The
    replay must complete ONLY the missing renames — never re-append
    the already-published files."""
    from pyspark.sql import functions as F

    from spark_hive_streaming_sink_spark.streaming.sink import StagedBatchPublisher

    table, _ = _mk_table(spark)  # partitioned by event_type
    opts = HiveSinkOptions(db="default", table=table)
    part_cols = validate_destination(
        spark, ["event_id", "user_id", "value", "event_type"], opts
    )
    src = spark.read.parquet(f"{SF_DIR}/events.parquet")
    dest_fields = spark.table(opts.qualified_name).schema.fields
    aligned = src.select(
        *[F.col(f.name).cast(f.dataType).alias(f.name) for f in dest_fields]
    ).repartition(*[F.col(c) for c in part_cols])
    expected = src.count()

    publisher = StagedBatchPublisher(spark, opts.qualified_name, part_cols)
    entries = publisher._ensure_staged(aligned, 0)
    assert len(entries) >= 2, "need multiple files to split the crash"
    # simulated crash: only the first half of the renames happened
    publisher._publish_entries(entries[: len(entries) // 2], 0)
    spark.catalog.refreshTable(opts.qualified_name)
    partial = spark.table(opts.qualified_name).count()
    assert 0 < partial < expected

    # replay path: manifest still present -> resume, no duplicates
    publisher.publish(aligned, 0)
    publisher.cleanup(0)
    spark.catalog.refreshTable(opts.qualified_name)
    assert spark.table(opts.qualified_name).count() == expected
    assert (
        spark.table(opts.qualified_name).dropDuplicates(["event_id"]).count()
        == expected
    )
    # and a third publish (late replay after cleanup would be guarded
    # by the ledger in the writer; here we just assert idempotence of
    # the already-published half) — every target already exists
    # because the staging dir is gone, so committed state is final.


def test_crash_after_marker_replays_exactly_once(spark, tmp_path):
    """Other side of the window: once the marker is durable, a crash
    before Spark records the batch in its commit log replays the batch
    on restart but the ledger skips it — no duplicates, exactly-once."""
    from pyspark.errors import StreamingQueryException

    table, _ = _mk_table(spark)
    ledger_dir = str(tmp_path / "ledger")
    ckpt = str(tmp_path / "ckpt")
    expected = spark.read.parquet("/root/testdata/sf0.001/events.parquet").count()

    with pytest.raises(StreamingQueryException, match="after ledger marker"):
        _run_events_stream(
            spark, table, ckpt, _FaultInjectedLedger(ledger_dir, crash="after")
        )
    spark.catalog.refreshTable(table)
    assert spark.table(table).count() == expected
    assert BatchCommitLedger(ledger_dir).committed(0)

    # restart: batch replays (commit log never recorded it) but the
    # ledger marker skips the re-insert
    assert (
        _run_events_stream(spark, table, ckpt, BatchCommitLedger(ledger_dir))
        == expected
    )


def test_continuous_trigger_rejected_with_guidance(spark, tmp_path):
    """B6 closure (permanent): continuous mode is incompatible with the
    foreachBatch exactly-once design — the sink must refuse it loudly
    with the processingTime pointer, not fall through to an unrelated
    Spark planner error."""
    table, _ = _mk_table(spark)
    ev = stream_table(spark, "/root/testdata/sf0.001", "events").select(
        "event_id", "user_id", "value", "event_type"
    )
    with pytest.raises(HiveStreamingSinkError, match="processingTime"):
        write_stream_to_table(
            ev,
            checkpoint_dir=str(tmp_path / "ckpt"),
            db="default",
            table=table,
            trigger={"continuous": "3 seconds"},
        )


def test_null_partition_value_routes_to_default_partition(spark, tmp_path):
    """A NULL partition-column value must land in Hive's default
    partition (__HIVE_DEFAULT_PARTITION__) and read back as NULL —
    the staged publisher registers it via partition recovery since
    ALTER TABLE ADD PARTITION cannot express NULL (adv-gate
    regression, round 9)."""
    from pyspark.sql import functions as F

    from spark_hive_streaming_sink_spark.streaming.sink import StagedBatchPublisher

    table, _ = _mk_table(spark)  # partitioned by event_type
    opts = HiveSinkOptions(db="default", table=table)
    part_cols = validate_destination(
        spark, ["event_id", "user_id", "value", "event_type"], opts
    )
    batch = spark.createDataFrame(
        [(1, 10, 1.5, "click"), (2, 11, 2.5, None)],
        "event_id long, user_id long, value double, event_type string",
    )
    dest_fields = spark.table(opts.qualified_name).schema.fields
    aligned = batch.select(
        *[F.col(f.name).cast(f.dataType).alias(f.name) for f in dest_fields]
    )
    pub = StagedBatchPublisher(spark, opts.qualified_name, part_cols)
    pub.publish(aligned, 0)
    pub.cleanup(0)
    spark.catalog.refreshTable(opts.qualified_name)
    rows = {r["event_id"]: r["event_type"] for r in spark.table(opts.qualified_name).collect()}
    assert rows == {1: "click", 2: None}


def test_staging_path_scoped_per_query(spark, tmp_path):
    """adv-r10 (high): the staging dir carries the ledger scope. A stale
    manifest left by a crashed run under ANOTHER query name (batch ids
    restart at 0 on a fresh checkpoint) must not short-circuit a new
    query's staging and silently drop its batch."""
    from spark_hive_streaming_sink_spark.streaming.sink import StagedBatchPublisher

    table, _ = _mk_table(spark, partitioned=False)
    opts = HiveSinkOptions(db="default", table=table)
    validate_destination(spark, ["event_id", "user_id", "value", "event_type"], opts)
    mk = lambda rows: spark.createDataFrame(
        rows, "event_id long, user_id long, value double, event_type string"
    )

    # query 1 stages batch 0 and crashes between manifest and publish
    pub1 = StagedBatchPublisher(spark, opts.qualified_name, [], scope=f"{table}.q1")
    pub1._ensure_staged(mk([(1, 10, 1.0, "a")]), 0)  # durable manifest, unpublished

    # query 2 (fresh checkpoint, same table, batch ids restart at 0)
    pub2 = StagedBatchPublisher(spark, opts.qualified_name, [], scope=f"{table}.q2")
    assert pub1._staging(0) != pub2._staging(0)
    pub2.publish(mk([(2, 20, 2.0, "b"), (3, 30, 3.0, "c")]), 0)
    pub2.cleanup(0)
    spark.catalog.refreshTable(opts.qualified_name)
    ids = {r.event_id for r in spark.table(opts.qualified_name).collect()}
    assert ids == {2, 3}, "query 2's batch must land, not query 1's stale manifest"

    # query 1's replay still resumes ITS OWN manifest correctly
    pub1.publish(mk([(1, 10, 1.0, "a")]), 0)
    pub1.cleanup(0)
    spark.catalog.refreshTable(opts.qualified_name)
    ids = {r.event_id for r in spark.table(opts.qualified_name).collect()}
    assert ids == {1, 2, 3}


def test_malformed_cast_fails_loudly_not_silent_null(spark, tmp_path):
    """adv-r10 (medium): a batch value the destination type cannot hold
    must FAIL the batch (ANSI-style), not be written as a silent NULL —
    parity with the storeAssignmentPolicy=ANSI behavior of insertInto."""
    table, base = _mk_table(spark, partitioned=False)
    opts = HiveSinkOptions(db="default", table=table)
    ledger = BatchCommitLedger(os.path.join(base, "ledger"))
    writer = make_batch_writer(opts, [], ledger, [])
    bad = spark.createDataFrame(
        [("not-a-number", "10", "1.5", "click")],
        "event_id string, user_id string, value string, event_type string",
    )
    with pytest.raises(Exception, match="not castable"):
        writer(bad, 0)
    spark.catalog.refreshTable(opts.qualified_name)
    assert spark.table(opts.qualified_name).count() == 0
    assert not ledger.committed(0)

    # a fully castable batch of differing types still converts cleanly
    ok = spark.createDataFrame(
        [("7", "10", "1.5", "click")],
        "event_id string, user_id string, value string, event_type string",
    )
    writer(ok, 1)
    spark.catalog.refreshTable(opts.qualified_name)
    rows = spark.table(opts.qualified_name).collect()
    assert [(r.event_id, r.value) for r in rows] == [(7, 1.5)]


def test_table_meta_immune_to_metadata_named_columns(spark):
    """adv-r10 (low): a destination column literally named Location or
    Provider must not poison the parsed table metadata — only rows after
    the '# Detailed Table Information' marker count."""
    from spark_hive_streaming_sink_spark.streaming.sink import _table_meta

    run_id = uuid.uuid4().hex[:10]
    base = tempfile.mkdtemp(prefix=f"shss_meta_{run_id}_")
    table = f"meta_cols_{run_id}"
    spark.sql(
        f"CREATE TABLE {table} (`Location` STRING, `Provider` STRING) "
        f"USING PARQUET LOCATION '{base}/tbl'"
    )
    meta = _table_meta(spark, f"default.{table}")
    assert meta["Location"].rstrip("/").endswith("/tbl")
    assert meta["Provider"].lower() == "parquet"


def test_hive_serde_provider_rejected_at_construction(spark, monkeypatch):
    """adv-r10 (low): Provider 'hive' (SerDe tables) is not path-writable;
    the publisher must refuse at construction with sink-level guidance,
    not fail at stage time with an obscure AnalysisException."""
    import spark_hive_streaming_sink_spark.streaming.sink as sink_mod
    from spark_hive_streaming_sink_spark.streaming.sink import StagedBatchPublisher

    table, _ = _mk_table(spark, partitioned=False)
    real_meta = sink_mod._table_meta(spark, f"default.{table}")
    monkeypatch.setattr(
        sink_mod, "_table_meta", lambda s, q: {**real_meta, "Provider": "hive"}
    )
    with pytest.raises(HiveStreamingSinkError, match="not path-writable"):
        StagedBatchPublisher(spark, f"default.{table}", [])


def test_writer_lease_cross_process_fencing(spark):
    """r10: the single-writer contract is ENFORCED across applications,
    not just documented — a live foreign lease refuses acquire; a stale
    one is taken over; a fenced writer's renew fails before it can
    touch the destination; release frees the destination."""
    import time

    from spark_hive_streaming_sink_spark.streaming.sink import (
        WriterLease,
        _table_location,
    )

    table, _ = _mk_table(spark, partitioned=False)
    loc = _table_location(spark, f"default.{table}")

    mine = WriterLease(spark, loc, ttl_ms=60_000)
    mine.acquire()
    mine.renew()  # own lease renews fine

    # simulate ANOTHER APPLICATION: a lease whose lock carries a foreign
    # process tag (the in-process takeover shortcut must not apply)
    theirs = WriterLease(spark, loc, ttl_ms=60_000)
    fs = theirs._fs()
    raw = spark.sparkContext._jvm.org.apache.commons.io.IOUtils.toString(
        fs.open(theirs._lock), "UTF-8"
    )
    fs.delete(theirs._lock, False)
    out = fs.create(theirs._lock, False)
    out.write(bytearray(raw.replace(
        raw[raw.find('"process"'):], '"process": "elsewhere00"}'
    ).encode()))
    out.close()
    with pytest.raises(HiveStreamingSinkError, match="another application"):
        theirs.acquire()
    # the original owner is FENCED too (the lock body changed owner
    # fields? no — owner survived the rewrite, but process differs);
    # rewrite with a different owner to simulate a full takeover:
    fs.delete(theirs._lock, False)
    out = fs.create(theirs._lock, False)
    out.write(bytearray(b'{"owner": "intruder-1", "process": "elsewhere00"}'))
    out.close()
    with pytest.raises(HiveStreamingSinkError, match="lease lost"):
        mine.renew()

    # stale foreign lock (mtime pushed past the TTL) is taken over
    fs.setTimes(theirs._lock, int(time.time() * 1000) - 3_600_000, -1)
    fresh = WriterLease(spark, loc, ttl_ms=60_000)
    fresh.acquire()
    fresh.renew()
    fresh.release()
    # released: next acquire is immediate
    again = WriterLease(spark, loc, ttl_ms=60_000)
    again.acquire()
    again.release()


def test_writer_lease_same_process_sequential_reuse(spark, tmp_path):
    """A finished availableNow query must not block the next writer in
    the same process: the lease's process tag defers to the in-process
    registry, so sequential write_stream_to_table calls (the
    test-suite / notebook pattern) re-acquire immediately even before
    the termination listener fires."""
    table, base = _mk_table(spark)
    for ckpt in ("ckptA", "ckptB"):
        ev = stream_table(spark, "/root/testdata/sf0.001", "events").select(
            "event_id", "user_id", "value", "event_type"
        )
        q = write_stream_to_table(
            ev,
            checkpoint_dir=str(tmp_path / ckpt),
            db="default",
            table=table,
            trigger={"availableNow": True},
        )
        q.awaitTermination()
    spark.catalog.refreshTable(table)
    expected = spark.read.parquet("/root/testdata/sf0.001/events.parquet").count()
    assert spark.table(table).count() == 2 * expected  # both runs landed


def test_sink_metrics_recorded_per_batch(spark, tmp_path):
    """r10 observability: every committed batch leaves one JSON metrics
    file (provider, file count, byte volume from the manifest listing,
    wall-clock) under <checkpoint>/_sink_metrics — readable with
    spark.read.json; no extra data pass."""
    import json

    table, _ = _mk_table(spark)
    ckpt = str(tmp_path / "ckpt")
    ev = stream_table(spark, "/root/testdata/sf0.001", "events").select(
        "event_id", "user_id", "value", "event_type"
    )
    q = write_stream_to_table(
        ev, checkpoint_dir=ckpt, db="default", table=table,
        trigger={"availableNow": True},
    )
    q.awaitTermination()
    mdir = os.path.join(ckpt, "_sink_metrics")
    files = sorted(os.listdir(mdir))
    assert files == ["batch-0.json"]
    m = json.loads(open(os.path.join(mdir, files[0])).read())
    assert m["provider"] == "native" and m["batch_id"] == 0
    assert m["n_files"] >= 1 and m["bytes"] > 0 and m["wall_ms"] >= 0
    # spark-readable operational feed
    assert spark.read.json(mdir).count() == 1
    # metrics.enabled=false suppresses recording
    table2, _ = _mk_table(spark)
    ev2 = stream_table(spark, "/root/testdata/sf0.001", "events").select(
        "event_id", "user_id", "value", "event_type"
    )
    ckpt2 = str(tmp_path / "ckpt2")
    q2 = write_stream_to_table(
        ev2, checkpoint_dir=ckpt2, db="default", table=table2,
        **{"metrics.enabled": "false"},
    )
    q2.awaitTermination()
    assert not os.path.exists(os.path.join(ckpt2, "_sink_metrics"))


def test_failed_lease_acquire_clears_in_process_claim(spark, tmp_path, monkeypatch):
    """r10 self-review regression: a lease-acquire failure (another
    application holds the destination) must clear the in-process
    _RESERVED claim — otherwise the destination stays wedged in this
    process even after the foreign writer goes away."""
    from spark_hive_streaming_sink_spark.streaming import sink as sink_mod

    table, _ = _mk_table(spark)
    ev = lambda: stream_table(spark, "/root/testdata/sf0.001", "events").select(
        "event_id", "user_id", "value", "event_type"
    )
    calls = {"n": 0}
    real_acquire = sink_mod.WriterLease.acquire

    def failing_acquire(self):
        calls["n"] += 1
        if calls["n"] == 1:
            raise HiveStreamingSinkError("another application (simulated)")
        return real_acquire(self)

    monkeypatch.setattr(sink_mod.WriterLease, "acquire", failing_acquire)
    with pytest.raises(HiveStreamingSinkError, match="another application"):
        write_stream_to_table(
            ev(), checkpoint_dir=str(tmp_path / "c1"), db="default", table=table
        )
    # the claim must be gone: the next attempt proceeds (acquire now
    # succeeds) instead of failing with 'already has an active writer'
    q = write_stream_to_table(
        ev(), checkpoint_dir=str(tmp_path / "c2"), db="default", table=table
    )
    q.awaitTermination()
    spark.catalog.refreshTable(table)
    assert spark.table(table).count() > 0


def test_transform_with_state_when_available(spark):
    """AUTO-ACTIVATING (VERDICT r11 item 8): transformWithStateInPandas
    is implemented but env-gated on the python protobuf package, absent
    in this sandbox. If the runtime ever gains protobuf, this stops
    skipping and certifies the state-API-v2 path against the static
    aggregate it must reproduce."""
    from spark_hive_streaming_sink_spark.streaming.stateful import (
        _twsip_available,
        stream_transform_with_state,
    )

    if not _twsip_available():
        import pytest

        pytest.skip("python protobuf not installed; TWS worker channel unavailable")
    sf_dir = "/root/testdata/sf0.001"
    got = sorted(
        tuple(r) for r in stream_transform_with_state(spark, sf_dir).collect()
    )
    import pyspark.sql.functions as F

    want = sorted(
        tuple(r)
        for r in spark.read.parquet(f"{sf_dir}/events.parquet")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            (
                F.sum(F.round(F.col("value") * 100, 0).cast("bigint")).cast(
                    "double"
                )
                / 100.0
            ).alias("total_value"),
        )
        .collect()
    )
    assert got == want
