"""Continuous aggregate (incremental rollup) via foreachBatch merge —
the hypertable-rollup pattern: a destination table holds the running
aggregate, and each micro-batch folds its partial aggregate into it
with a keyed merge instead of recomputing from raw history.

This is the standard downstream consumer of the reference's sink
(land events → maintain per-key rollups); here the whole loop is one
engine: stream → partial agg → full-outer merge → atomic swap.
"""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from ..io import load_table
from ..registry import register
from .ops import stream_table


@register(
    "stream_continuous_aggregate_merge",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(ROUND(value * 10000, 0) AS BIGINT)) AS DOUBLE) / 10000.0
             AS total_value
    FROM events GROUP BY event_type
    """,
    tags=("streaming", "sink", "rollup"),
)
def stream_continuous_aggregate_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental rollup maintenance: the destination starts seeded
    with the aggregate of the historical half of events (even
    event_ids — "yesterday's rollup"), then a real availableNow stream
    delivers the odd half and foreachBatch MERGES the batch's partial
    aggregate into the stored rollup (full outer join on the group key,
    additive combine, materialize, atomic overwrite). The final table
    must equal the one-shot aggregate over ALL events — which is
    exactly what the oracle states.

    Scale: per batch the work is O(batch) map-side partial aggregation
    plus a join against a rollup whose cardinality is the GROUP-BY key
    space (here 5; at 100 TB maybe 10⁶ — trivially joinable, AQE
    broadcasts the smaller side). Raw history is never rescanned —
    that is the entire point of a continuous aggregate. The
    localCheckpoint before the overwrite materializes the merged
    result so the read and the rewrite of the same path can't race;
    sums ride exact integer ten-thousandths, so merge order can't
    change a bit."""
    base = tempfile.mkdtemp(prefix=f"shss_rollup_{uuid.uuid4().hex[:8]}_")
    dest = f"{base}/rollup"

    def agg(df: DataFrame) -> DataFrame:
        return df.groupBy("event_type").agg(
            F.count("*").alias("n"),
            F.sum(F.round(F.col("value") * 10000, 0).cast("bigint")).alias("units"),
        )

    ev = load_table(spark, sf_dir, "events")
    agg(ev.filter(F.col("event_id") % 2 == 0)).write.mode("overwrite").parquet(dest)

    def merge_batch(batch_df: DataFrame, _batch_id: int) -> None:
        b = agg(batch_df).withColumnRenamed("n", "b_n").withColumnRenamed(
            "units", "b_units"
        )
        cur = batch_df.sparkSession.read.parquet(dest)
        merged = (
            # eqNullSafe, NOT a plain key join: a NULL group key (NULL
            # event_type rows form one GROUP BY group) would never match
            # itself under =, leaving TWO rollup rows for the NULL group
            cur.join(b, cur["event_type"].eqNullSafe(b["event_type"]), "full_outer")
            .select(
                F.coalesce(cur["event_type"], b["event_type"]).alias("event_type"),
                (F.coalesce("n", F.lit(0)) + F.coalesce("b_n", F.lit(0))).alias("n"),
                (
                    F.coalesce("units", F.lit(0)) + F.coalesce("b_units", F.lit(0))
                ).alias("units"),
            )
            .localCheckpoint(eager=True)  # materialize before overwriting source
        )
        merged.write.mode("overwrite").parquet(dest)

    stream = stream_table(spark, sf_dir, "events").filter(F.col("event_id") % 2 == 1)
    ckpt = tempfile.mkdtemp(prefix="shss_ckpt_")
    q = (
        stream.writeStream.foreachBatch(merge_batch)
        .trigger(availableNow=True)
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.awaitTermination()

    out = spark.read.parquet(dest)
    return out.select(
        "event_type",
        "n",
        (F.col("units").cast("double") / 10000.0).alias("total_value"),
    )
