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


_MAT_ROOT: str | None = None
_MAT_LOCK = __import__("threading").Lock()
_MAT_SEQ = __import__("itertools").count(1)


def materialize_parquet(df: DataFrame) -> DataFrame:
    """File-backed barrier for CORPUS-SIZED intermediates: write ``df``
    to a session-scoped temp parquet directory and read it back.

    Why not ``localCheckpoint``: the block manager stores checkpoint
    blocks executor-locally with serialization + GC interplay whose
    cost at the ~6M-row signature-table scale measured 25-55 s with
    1.8× run-to-run spread (the r11/r12 adjudicated variance class),
    while a columnar parquet write+read of the same relation is
    snappy-compressed sequential IO with predictable cost. It is also
    the fault-tolerance story the in-code notes promise: files survive
    executor loss (stage retries re-read them), exactly like the
    persisted signature table a 100 TB production run would keep,
    whereas a lost executor under localCheckpoint fails the job.

    The read-back is a fresh parquet scan, so downstream consumers get
    real file statistics, column pruning, and scan filters; join
    strategy for corpus-sized tables must still be pinned by hints at
    the call site (same rule as before).

    Keep ``localCheckpoint`` for BOUNDED relations (cluster centroids,
    vocab tables, per-round component labels): for small data the
    block-manager round-trip is cheaper than file IO, and the variance
    class above only bites at corpus scale.

    Set ``SHSS_BARRIER=blocks`` to fall back to ``localCheckpoint``
    (the A/B lever the ×100 adjudication runs use).

    Barrier root (r14, per the r13 advisor): ``SHSS_MAT_DIR`` names the
    root directory when set — on a multi-node cluster point it at
    SHARED storage (HDFS/object store/NFS), because the default,
    ``tempfile.mkdtemp()`` on the driver's local disk, only works in
    local mode where driver and executors share a filesystem. Barrier
    dirs accumulate for the life of the session (removed at interpreter
    exit); a long-running service should periodically clear
    ``SHSS_MAT_DIR`` or recycle sessions.
    """
    import atexit
    import os
    import shutil
    import tempfile

    if os.environ.get("SHSS_BARRIER", "parquet") == "blocks":
        return df.localCheckpoint(eager=True)
    global _MAT_ROOT
    with _MAT_LOCK:
        if _MAT_ROOT is None:
            override = os.environ.get("SHSS_MAT_DIR")
            if override:
                os.makedirs(override, exist_ok=True)
                _MAT_ROOT = tempfile.mkdtemp(prefix="shss_mat_", dir=override)
            else:
                _MAT_ROOT = tempfile.mkdtemp(prefix="shss_mat_")
            atexit.register(shutil.rmtree, _MAT_ROOT, ignore_errors=True)
    path = f"{_MAT_ROOT}/m{next(_MAT_SEQ)}"
    df.write.mode("overwrite").parquet(path)
    return df.sparkSession.read.parquet(path)
