"""Multi-dimensional data-layout operators: Z-order (Morton) cluster
keys for co-clustering a fact table on two query dimensions at once.

At 100 TB a fact table sorted on one column prunes scans on that
column only; interleaving the bits of two (or more) columns into a
single Z-order key and range-partitioning + sorting on it gives every
parquet file a small min/max rectangle in BOTH dimensions, so
row-group stats prune scans filtered on either column. This is the
technique behind Delta/Iceberg ``ZORDER BY`` — here expressed as a
plain Catalyst integer expression (shift/and/or), fully inside
whole-stage codegen: computing the key costs one map-side pass, and
``repartitionByRange(zkey)`` + ``sortWithinPartitions(zkey)`` at
write time does the clustering with a single range shuffle.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, SparkSession
import pyspark.sql.functions as F

from ..io import load_table
from ..registry import register

_BITS = 16  # bits per dimension → 32-bit Z key


def zorder_key(x: Column, y: Column, bits: int = _BITS) -> Column:
    """Morton interleave of the low ``bits`` of two non-negative
    integer columns: x occupies even bit positions, y odd. Pure
    shift/and/or tree — Catalyst folds it into one codegen'd
    expression, no UDF."""
    terms = []
    for i in range(bits):
        terms.append(F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i))
        terms.append(F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1))
    return reduce(lambda a, b: a.bitwiseOR(b), terms)


def _zorder_sql(x: str, y: str, bits: int = _BITS) -> str:
    """The identical interleave in portable SQL (fully parenthesized —
    `<<` / `|` precedence differs between engines)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " | ".join(terms)


@register(
    "layout_zorder_cluster",
    oracle=f"""
    WITH e AS (
      SELECT user_id % 65536 AS ux,
             (epoch_us(ts) // 60000000) % 65536 AS tm
      FROM events),
    z AS (SELECT ux, tm, {_zorder_sql('ux', 'tm')} AS zkey FROM e)
    SELECT zkey >> 22 AS z_bucket,
           COUNT(*) AS n_events,
           MIN(ux) AS min_user, MAX(ux) AS max_user,
           MIN(tm) AS min_minute, MAX(tm) AS max_minute,
           MAX(ux) - MIN(ux) AS user_span,
           MAX(tm) - MIN(tm) AS minute_span
    FROM z GROUP BY z_bucket
    """,
    tags=("layout", "zorder", "scale"),
)
def layout_zorder_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order cluster key over events on (user_id, event-minute),
    verified by its defining property: bucketing on the high bits of
    the interleaved key bounds BOTH dimensions per bucket (each
    ``z_bucket`` row reports its user-id and minute min/max spans —
    tight rectangles, where a single-column sort would leave the other
    dimension's span unbounded). At write time the same key feeds
    ``repartitionByRange(zkey).sortWithinPartitions(zkey)`` so parquet
    row-group min/max stats prune scans filtered on either column.
    The interleave is a pure shift/and/or Catalyst expression — one
    codegen'd map pass plus one aggregate shuffle."""
    e = load_table(spark, sf_dir, "events").select(
        (F.col("user_id") % 65536).alias("ux"),
        (F.expr("unix_micros(ts) div 60000000") % 65536).alias("tm"),
    )
    z = e.select("ux", "tm", zorder_key(F.col("ux"), F.col("tm")).alias("zkey"))
    return (
        z.groupBy(F.shiftright(F.col("zkey"), 22).alias("z_bucket"))
        .agg(
            F.count("*").alias("n_events"),
            F.min("ux").alias("min_user"),
            F.max("ux").alias("max_user"),
            F.min("tm").alias("min_minute"),
            F.max("tm").alias("max_minute"),
            (F.max("ux") - F.min("ux")).alias("user_span"),
            (F.max("tm") - F.min("tm")).alias("minute_span"),
        )
    )


N_SHARDS = 8


@register(
    "layout_shard_export",
    oracle=f"""
    WITH s AS (
      SELECT doc_id, lang, n_chars,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
               % {N_SHARDS} AS shard
      FROM documents)
    SELECT shard,
           COUNT(*) AS n_docs,
           CAST(SUM(doc_id) AS BIGINT) AS id_sum,
           CAST(SUM(n_chars) AS BIGINT) AS chars_sum,
           COUNT(DISTINCT lang) AS n_langs
    FROM s GROUP BY shard
    """,
    tags=("layout", "source"),
)
def layout_shard_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sharded corpus export with STABLE assignment: shard =
    md5(doc_id) mod N — reproducible across runs, engines, and
    cluster sizes (unlike repartition()'s round-robin or hash()'s
    murmur3, neither of which an external consumer can recompute).
    The export actually writes a shard-partitioned parquet tree (the
    layout a training job streams shard-by-shard) and the returned
    stats are computed from the re-read files, so the round trip —
    assign → write → partition-discover → read — is what the oracle
    checks.

    Scale: one partitionBy(shard) write (shard count chosen so each
    file lands near the 128-512 MB sweet spot — at 100 TB that's
    ~10⁵ shards, not 8) and one aggregate over the re-read tree."""
    import tempfile

    base = tempfile.mkdtemp(prefix="shss_shard_")
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        "n_chars",
        (
            F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
            .cast("bigint")
            % N_SHARDS
        ).alias("shard"),
    )
    d.write.mode("overwrite").partitionBy("shard").parquet(f"{base}/docs")
    back = spark.read.parquet(f"{base}/docs")
    return back.groupBy("shard").agg(
        F.count("*").alias("n_docs"),
        F.sum("doc_id").cast("bigint").alias("id_sum"),
        F.sum("n_chars").cast("bigint").alias("chars_sum"),
        F.countDistinct("lang").alias("n_langs"),
    )


N_EPOCHS = 3


@register(
    "layout_epoch_shuffle",
    oracle=f"""
    -- one deterministic permutation per training epoch: shard =
    -- md5(doc_id ':' epoch) — any worker can recompute its shard list
    -- for any epoch with no shuffle-order file to ship around.
    WITH d AS (SELECT doc_id FROM documents WHERE doc_id IS NOT NULL),
    tot AS (SELECT COUNT(*) AS n_total FROM d),
    s AS (
      SELECT doc_id, e.epoch,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':'
                                      || CAST(e.epoch AS VARCHAR)), 1, 8))
                  AS BIGINT) % {N_SHARDS} AS shard,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':0'), 1, 8))
                  AS BIGINT) % {N_SHARDS} AS shard_e0
      FROM d CROSS JOIN (SELECT unnest(generate_series(0, {N_EPOCHS - 1}))
                         AS epoch) e)
    SELECT CAST(epoch AS BIGINT) AS epoch, shard,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(*) * 1000000 // t.n_total AS BIGINT) AS share_ppm,
           CAST(SUM(CASE WHEN shard = shard_e0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_same_as_epoch0
    FROM s CROSS JOIN tot t
    GROUP BY epoch, shard, t.n_total
    """,
    tags=("layout", "llm", "training"),
)
def layout_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-epoch corpus shuffle plan: each training epoch
    assigns every document to a shard by md5(doc_id ':' epoch) — a
    different, reproducible permutation per epoch, recomputable by any
    worker without a materialized shuffle order. The audit reports the
    per-(epoch, shard) balance (share ppm of the corpus) and, per
    cell, how many docs kept their epoch-0 shard — epoch 0 agrees with
    itself 100%; later epochs should agree ~1/N_SHARDS (the
    permutations are independent), so a broken salt (constant epoch
    concatenated wrong) shows up as 100% agreement.

    Scale: one map-side expression per (doc, epoch) — the epoch spine
    is a constant 3-row broadcast, the aggregate shuffles N_EPOCHS *
    N_SHARDS cells; the corpus-count scalar broadcasts. At 100 TB the
    same expression feeds a partitionBy((epoch, shard)) export with
    shard counts sized to the file-size sweet spot."""
    d = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id").isNotNull())
        .select("doc_id")
    )
    tot = d.agg(F.count("*").alias("n_total"))
    epochs = F.array(*[F.lit(i) for i in range(N_EPOCHS)])

    def _shard(epoch_col: Column) -> Column:
        return (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.col("doc_id").cast("string"),
                            F.lit(":"),
                            epoch_col.cast("string"),
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("bigint")
            % N_SHARDS
        )

    s = d.select(
        "doc_id", F.explode(epochs).alias("epoch")
    ).select(
        "doc_id",
        "epoch",
        _shard(F.col("epoch")).alias("shard"),
        _shard(F.lit(0)).alias("shard_e0"),
    )
    return (
        s.groupBy("epoch", "shard")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum(F.when(F.col("shard") == F.col("shard_e0"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_same_as_epoch0"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("epoch").cast("bigint").alias("epoch"),
            "shard",
            "n_docs",
            F.expr("CAST(n_docs * 1000000 div n_total AS BIGINT)").alias(
                "share_ppm"
            ),
            "n_same_as_epoch0",
        )
    )
