"""Streaming operators (SURVEY.md §2C streaming-only set).

Every query here runs a REAL Structured Streaming query (file source
over the fixture parquet, ``availableNow`` trigger) and lands in a
memory sink; the registered oracle is the *static* SQL equivalent on
the same bounded data — so the driver's hash check verifies streaming
semantics end-to-end, not a batch stand-in. This mirrors the
reference's position as a streaming component (its examples are
socket/rate → sink pipelines, ``HiveStreamingExample.scala:63-88``).

Event-time semantics: tumbling/sliding/session windows + watermarks
generalize the reference's epoch notion (``HiveStreamWriter.scala:39``);
streaming dedup is the cleanup for the at-least-once duplicates the
reference can produce (SURVEY.md §1.4).
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from ..io import load_table, pin_fixture_confs
from ..registry import register
from ._ts_fmt import TS_FMT_SPARK, TS_FMT_DUCK


def stream_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """readStream over one fixture parquet with the same normalization
    as io.load_table (streaming sources need an explicit schema)."""
    pin_fixture_confs(spark, name)
    path = f"{sf_dir}/{name}.parquet"
    raw_schema = spark.read.parquet(path).schema
    import os

    if os.path.isdir(path):
        # Spark-written table: <name>.parquet is a DIRECTORY of part
        # files — stream it directly. The glob branch below would
        # filter on LEAF file names (part-*.parquet), match nothing,
        # and silently stream an EMPTY source (r10 stress finding: the
        # ×10/×100 streaming entries were flat 0.43 s no-ops).
        sdf = spark.readStream.schema(raw_schema).parquet(path)
    else:
        # driver-generated single-file fixture: the file stream source
        # requires a directory; select just this table's file with a
        # glob filter over the fixture dir
        sdf = (
            spark.readStream.schema(raw_schema)
            .option("pathGlobFilter", f"{name}.parquet")
            .parquet(sf_dir)
        )
    if name == "events" and dict(sdf.dtypes).get("ts") == "bigint":
        sdf = sdf.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return sdf


def run_to_memory(sdf: DataFrame, mode: str = "append") -> DataFrame:
    """Execute a bounded streaming query into a memory sink; returns the
    result table. availableNow drains all input then stops."""
    name = "mem_" + uuid.uuid4().hex[:12]
    ckpt = tempfile.mkdtemp(prefix="shss_ckpt_")
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.awaitTermination()
    return sdf.sparkSession.table(name)


@register(
    "stream_tumbling_window",
    oracle=f"""
    SELECT strftime(make_timestamp(epoch_us(ts) - epoch_us(ts) % 21600000000),
                    '{TS_FMT_DUCK}') AS win_start,
           event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    -- Spark's event-time window silently drops NULL-ts rows; the guard
    -- makes the exclusion explicit in BOTH engines
    FROM events WHERE ts IS NOT NULL GROUP BY 1, 2
    """,
    tags=("streaming", "window"),
)
def stream_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 6-hour event-time window aggregation, run as a real
    streaming query (complete mode → memory sink)."""
    ev = stream_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    agg = ev.groupBy(F.window("ts", "6 hours"), "event_type").agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
    )
    res = run_to_memory(agg, mode="complete")
    return res.select(
        F.date_format(F.col("window.start"), TS_FMT_SPARK).alias("win_start"),
        "event_type",
        "n",
        "total_value",
    )


@register(
    "stream_sliding_window",
    oracle=f"""
    SELECT strftime(make_timestamp(epoch_us(ts) - epoch_us(ts) % 21600000000
                                   - k * 21600000000), '{TS_FMT_DUCK}') AS win_start,
           COUNT(*) AS n
    FROM events CROSS JOIN (VALUES (0), (1)) AS shifts(k)
    WHERE ts IS NOT NULL
    GROUP BY 1
    """,
    tags=("streaming", "window"),
)
def stream_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (12h length, 6h slide): every event lands in two
    overlapping windows; oracle enumerates both shifted buckets."""
    ev = stream_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    agg = ev.groupBy(F.window("ts", "12 hours", "6 hours")).agg(F.count("*").alias("n"))
    res = run_to_memory(agg, mode="complete")
    return res.select(
        F.date_format(F.col("window.start"), TS_FMT_SPARK).alias("win_start"), "n"
    )


@register(
    "stream_session_window",
    oracle=f"""
    WITH flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       >= INTERVAL 30 MINUTE
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                  THEN 1 ELSE 0 END AS is_new
      -- NULL ts rows belong to no session (Spark's session_window drops
      -- them); excluded explicitly in BOTH engines
      FROM events WHERE ts IS NOT NULL),
    sessions AS (
      SELECT user_id, ts, value,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM flagged)
    SELECT user_id,
           strftime(MIN(ts), '{TS_FMT_DUCK}') AS session_start,
           strftime(MAX(ts) + INTERVAL 30 MINUTE, '{TS_FMT_DUCK}') AS session_end,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS session_value
    FROM sessions GROUP BY user_id, sid
    """,
    tags=("streaming", "window", "session"),
)
def stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30-min gap) per user — Spark's native
    session_window; the oracle rebuilds sessions with the
    gaps-and-islands pattern. Session end = last event + gap."""
    ev = stream_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    agg = ev.groupBy(F.session_window("ts", "30 minutes"), "user_id").agg(
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("session_value"),
    )
    res = run_to_memory(agg, mode="complete")
    return res.select(
        "user_id",
        F.date_format(F.col("session_window.start"), TS_FMT_SPARK).alias("session_start"),
        F.date_format(F.col("session_window.end"), TS_FMT_SPARK).alias("session_end"),
        "n_events",
        "session_value",
    )


@register(
    "stream_dedup_watermark",
    oracle="""
    SELECT event_type, COUNT(DISTINCT event_id) AS n_unique
    FROM events GROUP BY event_type
    """,
    tags=("streaming", "dedup"),
)
def stream_dedup_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dedup with watermark: the input is the events stream
    UNIONed with itself (simulating the at-least-once duplicates the
    reference's sink can produce, SURVEY.md §1.4); dropDuplicates on
    event_id under a 1-day watermark restores exactly-once counts."""
    a = stream_table(spark, sf_dir, "events")
    b = stream_table(spark, sf_dir, "events")
    deduped = (
        a.unionByName(b)
        .withWatermark("ts", "1 day")
        .dropDuplicates(["event_id"])
        .select("event_id", "event_type")
    )
    res = run_to_memory(deduped, mode="append")
    return res.groupBy("event_type").agg(F.countDistinct("event_id").alias("n_unique"))


@register(
    "stream_static_join",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS seg_value
    FROM events JOIN customer ON user_id = c_custkey
    GROUP BY c_mktsegment
    """,
    tags=("streaming", "join"),
)
def stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream–static enrichment join (the reference's users do this
    upstream of the sink): streaming events joined to the static
    customer dimension. No explicit broadcast hint: customer grows
    linearly with SF (150k×SF), so the planner must pick broadcast vs
    shuffle from its actual size per micro-batch — tiny at test scale
    (auto-broadcast), shuffled at the 100 TB design point."""
    ev = stream_table(spark, sf_dir, "events")
    cust = load_table(spark, sf_dir, "customer")
    joined = ev.join(
        cust, ev.user_id == cust.c_custkey, "inner"
    ).select("event_id", "c_mktsegment", "value")
    res = run_to_memory(joined, mode="append")
    return res.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("seg_value"),
    )


@register(
    "stream_stream_join",
    oracle="""
    SELECT p.user_id, COUNT(*) AS n_pairs
    FROM (SELECT user_id, ts FROM events WHERE event_type = 'purchase') p
    JOIN (SELECT user_id, ts FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id
     AND c.ts BETWEEN p.ts - INTERVAL 2 HOUR AND p.ts
    GROUP BY p.user_id
    """,
    tags=("streaming", "join"),
)
def stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream–stream inner join with watermarks + event-time range
    condition (clicks within 2h before a purchase)."""
    purchases = (
        stream_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select("user_id", F.col("ts").alias("p_ts"))
        .withWatermark("p_ts", "1 day")
    )
    clicks = (
        stream_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "click")
        .select(F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts"))
        .withWatermark("c_ts", "1 day")
    )
    joined = purchases.join(
        clicks,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 2 HOURS"))
        & (F.col("c_ts") <= F.col("p_ts")),
        "inner",
    ).select("user_id", "p_ts", "c_ts")
    res = run_to_memory(joined, mode="append")
    return res.groupBy("user_id").agg(F.count("*").alias("n_pairs"))


@register(
    "stream_dedup_within_watermark",
    oracle="""
    SELECT event_type, COUNT(DISTINCT event_id) AS n_unique
    FROM events GROUP BY event_type
    """,
    tags=("streaming", "dedup"),
)
def stream_dedup_within_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dropDuplicatesWithinWatermark: unlike plain streaming
    dropDuplicates (state grows until event-time eviction of the exact
    key+time), this dedups any duplicates arriving within the watermark
    delay even when their event times differ (the realistic shape of
    the reference's at-least-once retry duplicates, which re-write the
    same rows later in wall-clock time). State per key is bounded by
    the watermark window."""
    a = stream_table(spark, sf_dir, "events")
    b = stream_table(spark, sf_dir, "events")
    deduped = (
        a.unionByName(b)
        .withWatermark("ts", "1 day")
        .dropDuplicatesWithinWatermark(["event_id"])
        .select("event_id", "event_type")
    )
    res = run_to_memory(deduped, mode="append")
    return res.groupBy("event_type").agg(
        F.countDistinct("event_id").alias("n_unique")
    )


@register(
    "stream_json_variant_etl",
    oracle=f"""
    SELECT strftime(date_trunc('hour', ts) - INTERVAL (extract(hour FROM ts) % 6) HOUR,
                    '{TS_FMT_DUCK}') AS win_start,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(len(list_distinct(list(user_id))) AS BIGINT) AS n_users,
           CAST(SUM(CAST(round(value, 6) AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    -- NULL ts rows can't be windowed (Spark drops them silently):
    -- excluded explicitly in BOTH engines
    FROM events WHERE ts IS NOT NULL
    GROUP BY 1, 2
    """,
    tags=("streaming", "json", "variant"),
)
def stream_json_variant_etl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's wire format, end to end, as a real streaming
    query: events serialize to JSON lines (the row-as-JSON model of
    HiveStreamDataWriter.scala:96-100), a file STREAM tails the
    directory, each line parses ONCE to a Spark-4 VARIANT, typed
    variant_get probes extract the fields, and a tumbling event-time
    window aggregates — i.e. Kafka-JSON ETL with the transport swapped
    for files. The oracle is the static SQL over the same bounded
    events, so the whole serialize→stream→parse→window loop is
    hash-checked.

    Scale: JSON encode and VARIANT decode are codegen'd map work; the
    single shuffle is the windowed aggregate, whose (window, type) key
    is naturally unskewed. The VARIANT parse amortizes all four field
    probes — the streaming twin of json_variant_extract."""
    ev = load_table(spark, sf_dir, "events")
    base = tempfile.mkdtemp(prefix="shss_jsonl_")
    ev.select(
        F.to_json(
            F.struct(
                F.col("event_id"),
                F.col("user_id"),
                F.col("event_type"),
                F.date_format("ts", TS_FMT_SPARK).alias("ts_str"),
                F.round("value", 6).alias("value"),
            )
        ).alias("value")
    ).write.mode("overwrite").text(base)
    lines = spark.readStream.schema("value string").text(base)
    v = lines.select(F.parse_json(F.col("value")).alias("j")).select(
        F.variant_get("j", "$.user_id", "bigint").alias("user_id"),
        F.variant_get("j", "$.event_type", "string").alias("event_type"),
        F.to_timestamp(
            F.variant_get("j", "$.ts_str", "string"), TS_FMT_SPARK
        ).alias("ts"),
        F.variant_get("j", "$.value", "double").alias("value"),
    )
    agg = v.filter(F.col("ts").isNotNull()).groupBy(
        F.window("ts", "6 hours"), "event_type"
    ).agg(
        F.count("*").cast("bigint").alias("n"),
        # COUNT(DISTINCT) is unsupported in streaming aggs; a set
        # aggregate is the exact equivalent (bounded by the user
        # cardinality per window) - approx_count_distinct is the
        # unbounded-cardinality alternative
        F.size(F.collect_set("user_id")).cast("bigint").alias("n_users"),
        F.sum(F.round("value", 6).cast("decimal(18,6)"))
        .cast("double")
        .alias("total_value"),
    )
    res = run_to_memory(agg, mode="complete")
    return res.select(
        F.date_format(F.col("window.start"), TS_FMT_SPARK).alias("win_start"),
        "event_type",
        "n",
        "n_users",
        "total_value",
    )


# --------------------------------------------------------------------------
# streaming incremental near-dup dedup: new documents probed against the
# persisted MinHash/LSH index of the existing corpus
# --------------------------------------------------------------------------


def _minhash_band_index(docs: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Build the persisted MinHash/LSH index of the existing corpus:
    (idx_id, band_no, band_key) band table + (doc_id, shingles) exact
    3-gram hashes for the verify stage. Checkpointed once — at 100 TB
    these are the two real index tables incremental ingest probes."""
    from ..functions.dedup import _add_minhash, _dig_col, _hx_frame

    sigs = _add_minhash(
        _hx_frame(docs).withColumn("shingles", _dig_col())
    ).localCheckpoint(eager=True)
    shingles = sigs.select("doc_id", "shingles")
    ok = sigs.filter(F.col("mh0").isNotNull())  # degenerate docs never band
    b0 = F.md5(F.concat_ws("_", *[F.col(f"mh{i}") for i in range(4)]))
    b1 = F.md5(F.concat_ws("_", *[F.col(f"mh{i}") for i in range(4, 8)]))
    bands = ok.select(
        F.col("doc_id").alias("idx_id"), F.lit(0).alias("band_no"), b0.alias("band_key")
    ).unionByName(
        ok.select(
            F.col("doc_id").alias("idx_id"),
            F.lit(1).alias("band_no"),
            b1.alias("band_key"),
        )
    )
    return bands, shingles


def _probe_batch_against_index(
    batch_df: DataFrame,
    batch_id: int,
    idx_bands: DataFrame,
    idx_shingles: DataFrame,
    out_dir: str,
) -> None:
    """One micro-batch of the incremental near-dup probe, written
    idempotently: the batch's verdict parquet lands at a path derived
    from the BATCH ID with overwrite mode, so an at-least-once replay
    of the same epoch (the reference's crash-recovery window,
    HiveStreamDataWriter.scala:102-105) rewrites byte-identical
    results instead of duplicating them — the same ledger idea as
    streaming/sink.py:169-207, expressed as path idempotence.

    Module-level (not a closure) so tests can replay a batch directly."""
    from ..functions.dedup import _add_minhash, _dig_col, _hx_frame

    sigs = _add_minhash(
        _hx_frame(batch_df).withColumn("shingles", _dig_col())
    ).localCheckpoint(eager=True)
    in_sh = sigs.select("doc_id", "shingles")
    ok = sigs.filter(F.col("mh0").isNotNull())  # degenerate docs never band
    b0 = F.md5(F.concat_ws("_", *[F.col(f"mh{i}") for i in range(4)]))
    b1 = F.md5(F.concat_ws("_", *[F.col(f"mh{i}") for i in range(4, 8)]))
    in_bands = ok.select(
        F.col("doc_id").alias("in_id"), F.lit(0).alias("band_no"), b0.alias("band_key")
    ).unionByName(
        ok.select(
            F.col("doc_id").alias("in_id"),
            F.lit(1).alias("band_no"),
            b1.alias("band_key"),
        )
    )
    cand = (
        in_bands.join(idx_bands, ["band_no", "band_key"])
        .select("in_id", "idx_id")
        .distinct()
    )
    a_sh = F.col("a.shingles")
    b_sh = F.col("b.shingles")
    inter = F.size(F.array_intersect(a_sh, b_sh))
    union = F.size(a_sh) + F.size(b_sh) - inter
    ver = (
        cand.join(in_sh.alias("a"), F.col("a.doc_id") == F.col("in_id"))
        .join(idx_shingles.alias("b"), F.col("b.doc_id") == F.col("idx_id"))
        .filter(2 * inter >= union)
        .select("in_id", "idx_id")
    )
    out = (
        batch_df.select("doc_id")
        .join(ver, F.col("in_id") == F.col("doc_id"), "left")
        .groupBy("doc_id")
        .agg(
            F.min("idx_id").alias("matched_id"),
            (F.count("idx_id") > 0).alias("is_near_duplicate"),
        )
    )
    out.write.mode("overwrite").parquet(f"{out_dir}/batch_id={int(batch_id)}")


from ..functions.dedup import (  # noqa: E402  (shared MinHash macros)
    _SQL_DIG,
    _SQL_HX,
    _SQL_MINHASH,
)


@register(
    "stream_dedup_minhash_incremental",
    oracle=f"""
    WITH t AS (SELECT doc_id, string_split(trim(text), ' ') AS toks FROM documents),
    hxt AS (SELECT doc_id, {_SQL_HX} AS hx FROM t),
    sh AS (SELECT doc_id, {_SQL_DIG} AS shingles FROM hxt),
    mh0 AS (SELECT doc_id, {_SQL_MINHASH} FROM hxt),
    -- degenerate docs (NULL minhash: empty/NULL text, <3 tokens) never
    -- band, on either side of the probe
    mh AS (SELECT * FROM mh0 WHERE mh0 IS NOT NULL),
    bands AS (
      SELECT doc_id, 0 AS band_no,
             md5(concat_ws('_', mh0, mh1, mh2, mh3)) AS band_key FROM mh
      UNION ALL
      SELECT doc_id, 1 AS band_no,
             md5(concat_ws('_', mh4, mh5, mh6, mh7)) AS band_key FROM mh),
    cand AS (
      SELECT DISTINCT i.doc_id AS in_id, x.doc_id AS idx_id
      FROM (SELECT * FROM bands WHERE doc_id % 4 = 3) i
      JOIN (SELECT * FROM bands WHERE doc_id % 4 != 3) x
        ON i.band_no = x.band_no AND i.band_key = x.band_key),
    ver AS (
      SELECT c.in_id, c.idx_id
      FROM cand c
      JOIN sh a ON a.doc_id = c.in_id
      JOIN sh b ON b.doc_id = c.idx_id
      WHERE 2 * len(list_intersect(a.shingles, b.shingles))
            >= (len(a.shingles) + len(b.shingles)
                - len(list_intersect(a.shingles, b.shingles))))
    SELECT d.doc_id, MIN(v.idx_id) AS matched_id,
           COUNT(v.idx_id) > 0 AS is_near_duplicate
    FROM (SELECT doc_id FROM documents WHERE doc_id % 4 = 3) d
    LEFT JOIN ver v ON v.in_id = d.doc_id
    GROUP BY d.doc_id
    """,
    tags=("streaming", "llm", "dedup", "incremental"),
)
def stream_dedup_minhash_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming incremental near-dup dedup — the daily-ingest shape of
    dedup_incremental_against_index, upgraded from exact content hashes
    to the MinHash/LSH near-dup index: a REAL Structured Streaming
    query over the incoming documents (doc_id ≡ 3 mod 4 stands in for
    today's batch) probes each micro-batch against the PERSISTED band
    index of the existing corpus via foreachBatch, Jaccard-verifies
    band-collision candidates (>= 0.5 on exact 3-gram shingles), and
    lands per-batch verdicts idempotently (overwrite at a batch-id
    path — the replay discipline the reference's at-least-once commit
    window requires, HiveStreamDataWriter.scala:102-105; cf. the
    ledger in streaming/sink.py:169-207).

    Scale: the index is (band_no, band_key) pairs + 8-byte shingle
    hashes — never the text; each micro-batch shuffles only its own
    signatures against the band-key partitioning, so probe cost is
    batch-sized, not corpus-sized, and candidate verification is
    band-bucket-local exactly as in the batch pipeline."""
    d = load_table(spark, sf_dir, "documents")
    idx_bands, idx_shingles = _minhash_band_index(d.filter(F.col("doc_id") % 4 != 3))

    incoming = stream_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 4 == 3
    )
    out_dir = tempfile.mkdtemp(prefix="shss_incdedup_")
    ckpt = tempfile.mkdtemp(prefix="shss_ckpt_")
    q = (
        incoming.writeStream.foreachBatch(
            lambda bdf, bid: _probe_batch_against_index(
                bdf, bid, idx_bands, idx_shingles, out_dir
            )
        )
        .trigger(availableNow=True)
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.awaitTermination()
    if not any(e.startswith("batch_id=") for e in os.listdir(out_dir)):
        # empty incoming stream -> zero micro-batches landed
        return spark.createDataFrame(
            [], "doc_id long, matched_id long, is_near_duplicate boolean"
        )
    return spark.read.parquet(f"{out_dir}/batch_id=*").select(
        "doc_id", "matched_id", "is_near_duplicate"
    )


@register(
    "stream_windowed_topk",
    oracle=f"""
    WITH counts AS (
      SELECT strftime(make_timestamp(epoch_us(ts) - epoch_us(ts) % 21600000000),
                      '{TS_FMT_DUCK}') AS win_start,
             event_type,
             COUNT(*) AS n
      -- event-time windows drop NULL ts; NULL event_type can't take a
      -- deterministic rank slot cross-engine: both excluded explicitly
      FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
      GROUP BY 1, 2)
    SELECT win_start, event_type, n, rnk FROM (
      SELECT win_start, event_type, n,
             row_number() OVER (PARTITION BY win_start
                                ORDER BY n DESC, event_type) AS rnk
      FROM counts)
    WHERE rnk <= 3
    """,
    tags=("streaming", "window", "topk"),
)
def stream_windowed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trending-now: top-3 event types per 6-hour tumbling window. The
    windowed counts run as a REAL streaming aggregation (complete mode
    → memory sink); the rank is a batch window over the (windows ×
    types) result — the standard split, since per-window top-k isn't
    an incremental streaming operator but the post-aggregation result
    is tiny. Scale: streaming state is one count per (window, type);
    the rank input is windows × types, not events."""
    ev = stream_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("event_type").isNotNull()
    )
    agg = ev.groupBy(F.window("ts", "6 hours"), "event_type").agg(
        F.count("*").alias("n")
    )
    res = run_to_memory(agg, mode="complete")
    from pyspark.sql import Window

    counts = res.select(
        F.date_format(F.col("window.start"), TS_FMT_SPARK).alias("win_start"),
        "event_type",
        "n",
    )
    w = Window.partitionBy("win_start").orderBy(F.col("n").desc(), "event_type")
    return counts.select(
        "win_start", "event_type", "n", F.row_number().over(w).alias("rnk")
    ).filter(F.col("rnk") <= 3)


@register(
    "stream_chained_windowed_aggregates",
    oracle=f"""
    -- two CHAINED stateful aggregations in one streaming query (the
    -- Spark 3.4+ multiple-stateful-operator pipeline): 6h-window
    -- per-user counts roll up into 12h-window corpus activity. Append
    -- mode + watermark means only windows the final watermark closed
    -- are emitted: Spark's watermark is max event time minus the
    -- delay, in MILLISECOND precision — the wm CTE replicates that
    -- exactly (floor to ms, subtract 1h), and the 12h windows with
    -- end <= wm are precisely the rows the no-data final batch
    -- flushes. The tail window past the watermark is withheld by
    -- design in BOTH engines.
    WITH wm AS (
      SELECT (epoch_us(ts) // 1000) - 3600000 AS wm_ms
      FROM events WHERE ts IS NOT NULL
      ORDER BY ts DESC LIMIT 1),
    l1 AS (
      SELECT epoch_us(ts) - epoch_us(ts) % 21600000000 AS w6_us,
             user_id, COUNT(*) AS n
      FROM events WHERE ts IS NOT NULL
      GROUP BY 1, 2),
    l2 AS (
      SELECT w6_us - w6_us % 43200000000 AS w12_us,
             CAST(COUNT(*) AS BIGINT) AS n_user_windows,
             CAST(SUM(n) AS BIGINT) AS n_events
      FROM l1 GROUP BY 1)
    SELECT strftime(make_timestamp(w12_us), '{TS_FMT_DUCK}') AS win_start,
           n_user_windows, n_events
    FROM l2 CROSS JOIN wm
    WHERE (w12_us + 43200000000) // 1000 <= wm.wm_ms
    """,
    tags=("streaming", "window", "stateful"),
)
def stream_chained_windowed_aggregates(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Multiple stateful operators chained in ONE streaming query
    (Spark 3.4+): a 6-hour tumbling per-user count feeds a second
    12-hour tumbling rollup via ``window_time`` — the pattern that
    previously required two queries with an intermediate sink. Append
    mode with a 1h watermark: the final no-data micro-batch flushes
    every 12h window the watermark closed; the tail window stays in
    state (unemittable until more data arrives), and the oracle
    withholds it identically via the exact millisecond-precision
    watermark rule.

    Scale: both aggregations are hash aggregates with partial combine;
    state is bounded by open windows x active users within the
    watermark horizon — the watermark is what makes an infinite stream
    finite-state. One shuffle per level."""
    ev = (
        stream_table(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull())
        .withWatermark("ts", "1 hour")
    )
    lvl1 = ev.groupBy(F.window("ts", "6 hours"), "user_id").agg(
        F.count("*").alias("n")
    )
    lvl2 = lvl1.groupBy(
        F.window(F.window_time("window"), "12 hours")
    ).agg(
        F.count("*").cast("bigint").alias("n_user_windows"),
        F.sum("n").cast("bigint").alias("n_events"),
    )
    res = run_to_memory(lvl2, mode="append")
    return res.select(
        F.date_format(F.col("window.start"), TS_FMT_SPARK).alias("win_start"),
        "n_user_windows",
        "n_events",
    )
