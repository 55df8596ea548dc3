"""The streaming table sink — PySpark-native rebuild of the reference's
core machinery (SURVEY.md §2A).

Reference behavior being reproduced (file:line cites into
``/root/reference``):

- ``HiveSourceProvider.scala:42-44`` — only Append output mode.
- ``HiveSourceProvider.scala:46-52`` — destination table must already
  exist in the catalog.
- ``HiveSourceProvider.scala:55-58`` — incoming column *name set* must
  equal the destination's (order-insensitive, type-blind).
- ``HiveStreamDataWriter.scala:73-83`` — dynamic partition routing by
  the table's partition columns.
- ``HiveOptions.scala:78-115`` — option names (``db``, ``table``,
  ``batch.size``, ``txn.per.batch``, ``auto.create.partitions``,
  ``metastore``) are accepted for compatibility.

Where we deliberately diverge (SURVEY.md §1.4, §7):

- The reference writes row-at-a-time JSON through the Hive streaming
  API and its epoch ``commit``/``abort`` are no-ops
  (``HiveStreamWriter.scala:39-41``) → at-least-once. We write whole
  micro-batches columnar (``insertInto`` dynamic partition insert) and
  keep a batch-id ledger, skipping batches already committed →
  effective exactly-once on query restart/retry.
- Hive ACID/bucketed ORC is a Hive-side storage feature OSS Spark
  cannot write; destinations are Spark-managed partitioned tables.
  Durability of a batch rests on Spark's FileCommitProtocol (atomic
  job commit), the ledger marker is written after commit; the
  crash window between the two is replay-safe for re-run batches and
  documented.

Scale posture: each micro-batch is repartitioned by the destination's
partition columns before insert so one task owns one output partition
(bounds small files — the problem Hive compaction solves for the
reference, ``README.md:74``); everything else is columnar and JVM-side.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


class HiveStreamingSinkError(ValueError):
    """Validation error mirroring the reference's IllegalArgumentException /
    AnalysisException cases."""


@dataclass
class HiveSinkOptions:
    """Mirrors ``HiveOptions.scala:78-115`` (names kept; batching knobs
    are accepted but subsumed by whole-micro-batch commits)."""

    db: str
    table: str
    metastore: str | None = None  # accepted for compat; unused locally
    txn_per_batch: int = 100
    batch_size: int = 10_000
    auto_create_partitions: bool = True
    extra: dict = field(default_factory=dict)

    @classmethod
    def from_options(cls, opts: dict) -> "HiveSinkOptions":
        opts = dict(opts)
        missing = [k for k in ("db", "table") if not opts.get(k)]
        if missing:
            # HiveOptions.scala:89-96: metastore/db/table required; we only
            # require db/table (no external metastore in Spark-native mode).
            raise HiveStreamingSinkError(
                f"Missing required sink option(s): {', '.join(missing)}"
            )
        return cls(
            db=opts.pop("db"),
            table=opts.pop("table"),
            metastore=opts.pop("metastore", None),
            txn_per_batch=int(opts.pop("txn.per.batch", 100)),
            batch_size=int(opts.pop("batch.size", 10_000)),
            auto_create_partitions=str(opts.pop("auto.create.partitions", "true")).lower()
            == "true",
            extra=opts,
        )

    @property
    def qualified_name(self) -> str:
        return f"{self.db}.{self.table}"


def validate_destination(
    spark: SparkSession,
    stream_columns: list[str],
    options: HiveSinkOptions,
    output_mode: str = "append",
) -> list[str]:
    """Run the reference's creation-time checks; returns the destination's
    partition columns (for routing)."""
    if output_mode.lower() != "append":
        # HiveSourceProvider.scala:42-44
        raise HiveStreamingSinkError(
            f"Only Append output mode is supported, got: {output_mode}"
        )
    if not spark.catalog.tableExists(options.qualified_name):
        # HiveSourceProvider.scala:46-52
        raise HiveStreamingSinkError(
            f"Destination table {options.qualified_name} does not exist in the catalog; "
            "it must be created before streaming into it"
        )
    dest_cols = [f.name for f in spark.table(options.qualified_name).schema.fields]
    if set(c.lower() for c in stream_columns) != set(c.lower() for c in dest_cols):
        # HiveSourceProvider.scala:55-58 — name-set equality, order-insensitive
        raise HiveStreamingSinkError(
            f"Schema mismatch: stream columns {sorted(stream_columns)} != "
            f"table columns {sorted(dest_cols)}"
        )
    part_cols = [
        c.name for c in spark.catalog.listColumns(options.qualified_name) if c.isPartition
    ]
    return part_cols


class BatchCommitLedger:
    """Batch-id ledger giving idempotent (effectively exactly-once)
    micro-batch commits — the upgrade over the reference's no-op epoch
    commit (``HiveStreamWriter.scala:39-41``).

    Markers are empty files ``<dir>/<query_slug>/batch-<id>`` created
    *after* the batch's job commit. On a real cluster the directory
    lives on the same DFS as the checkpoint; creation-after-commit plus
    Spark's at-most-once batch replay per checkpoint gives exactly-once
    table contents.
    """

    def __init__(self, ledger_dir: str):
        self.dir = ledger_dir
        os.makedirs(ledger_dir, exist_ok=True)

    def _marker(self, batch_id: int) -> str:
        return os.path.join(self.dir, f"batch-{batch_id}")

    def committed(self, batch_id: int) -> bool:
        return os.path.exists(self._marker(batch_id))

    def record(self, batch_id: int) -> None:
        with open(self._marker(batch_id), "w") as f:
            f.write("committed\n")


def make_batch_writer(
    options: HiveSinkOptions,
    part_cols: list[str],
    ledger: BatchCommitLedger,
    stream_columns: list[str],
):
    """Build the foreachBatch callable: ledger check → column reorder →
    partition-clustered columnar append → ledger record.

    Replaces the reference's per-row path (extract partition values →
    JSON-encode → HiveWriter.write, ``HiveStreamDataWriter.scala:72-106``)
    with one dynamic-partition insert per micro-batch.
    """

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        if ledger.committed(batch_id):
            return  # replayed batch — exactly-once skip
        spark = batch_df.sparkSession
        if part_cols and not options.auto_create_partitions:
            # HiveOptions.scala:35 / HiveWriter.scala:44 — with
            # auto.create.partitions=false the reference's Hive endpoint
            # rejects rows for partitions that don't exist yet.
            existing = {
                tuple(p.split("/"))
                for (p,) in spark.sql(
                    f"SHOW PARTITIONS {options.qualified_name}"
                ).collect()
            }
            incoming = {
                tuple(f"{c}={r[c]}" for c in part_cols)
                for r in batch_df.select(*part_cols).distinct().collect()
            }
            missing = incoming - existing
            if missing:
                raise HiveStreamingSinkError(
                    f"auto.create.partitions=false and batch {batch_id} contains "
                    f"unknown partition(s): {sorted(missing)}"
                )
        dest_cols = [f.name for f in spark.table(options.qualified_name).schema.fields]
        # insertInto is positional: align to destination column order
        # (the reference validates name-sets only; we also conform order,
        # the README tells its users to do this by hand with selectExpr).
        aligned = batch_df.select(*[F.col(c) for c in dest_cols])
        if part_cols:
            # one task per output partition → bounded file counts
            aligned = aligned.repartition(*[F.col(c) for c in part_cols])
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        aligned.write.mode("append").insertInto(options.qualified_name)
        # invalidate this session's cached file index; NB foreachBatch runs
        # in a CLONED session, so concurrent readers in other sessions of an
        # UNPARTITIONED table must refreshTable themselves before reading
        # (partitioned tables see new data via partition metadata)
        spark.catalog.refreshTable(options.qualified_name)
        ledger.record(batch_id)

    return write_batch


def write_stream_to_table(
    df: DataFrame,
    checkpoint_dir: str,
    output_mode: str = "append",
    trigger: dict | None = None,
    query_name: str | None = None,
    **options,
) -> StreamingQuery:
    """The engine's ``writeStream.format("hive-streaming")`` equivalent.

    ``df`` must be a streaming DataFrame; ``options`` carry the
    reference's option names (``db``, ``table``, ...). The ledger lives
    next to the checkpoint so recovery sees it; pass ``ledger.dir`` to
    pin it elsewhere — a ledger that outlives the checkpoint keeps the
    table exactly-once even across a checkpoint reset (losing the
    checkpoint must not double-load the destination).

    Example::

        q = write_stream_to_table(stream_df, "/ckpt/q1", db="default",
                                  table="alerts",
                                  trigger={"availableNow": True})
        q.awaitTermination()
    """
    opts = HiveSinkOptions.from_options(options)
    spark = df.sparkSession
    part_cols = validate_destination(spark, df.columns, opts, output_mode)
    ledger = BatchCommitLedger(
        opts.extra.get("ledger.dir") or os.path.join(checkpoint_dir, "_commit_ledger")
    )
    writer = (
        df.writeStream.outputMode("append")
        .foreachBatch(make_batch_writer(opts, part_cols, ledger, df.columns))
        .option("checkpointLocation", checkpoint_dir)
    )
    if query_name:
        writer = writer.queryName(query_name)
    writer = writer.trigger(**(trigger or {"availableNow": True}))
    return writer.start()


def compact_table(
    spark: SparkSession,
    db: str,
    table: str,
    max_files_per_partition: int = 4,
) -> dict:
    """Small-file compaction for streaming destinations.

    Many micro-batches → many small files per partition; the reference
    delegates this to Hive's transactional compactor (``README.md:74``).
    Spark-native equivalent: per partition, if the file count exceeds
    the threshold, rewrite that partition's data as one coalesced file
    set via a dynamic partition overwrite (atomic per partition under
    partitionOverwriteMode=dynamic — readers never see partial state).

    Returns {partition_value: n_files_before} for the rewritten ones.
    Run it out-of-band (maintenance job), never inside foreachBatch.
    """
    qualified = f"{db}.{table}"
    part_cols = [c.name for c in spark.catalog.listColumns(qualified) if c.isPartition]
    if not part_cols:
        raise HiveStreamingSinkError(f"{qualified} is not partitioned; nothing to compact")
    pcol = part_cols[0]
    # count files per partition from the file index
    files = (
        spark.table(qualified)
        .select(F.input_file_name().alias("f"), F.col(pcol))
        .distinct()
        .groupBy(pcol)
        .count()
        .collect()
    )
    crowded = {r[pcol]: r["count"] for r in files if r["count"] > max_files_per_partition}
    if not crowded:
        return {}
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    vals = list(crowded)
    dest_cols = [f.name for f in spark.table(qualified).schema.fields]
    (
        spark.table(qualified)
        .filter(F.col(pcol).isin(vals))
        .select(*dest_cols)
        .repartition(1, F.col(pcol))
        .write.mode("overwrite")
        .insertInto(qualified)
    )
    return crowded
