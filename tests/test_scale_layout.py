"""Storage-layout scale mechanisms: bucketed co-located joins (no
shuffle) and partition pruning (scan skips non-matching partitions).
These are the knobs SURVEY.md §4 names for 100 TB joins/scans; the
tests prove the engine actually produces shuffle-free / pruned plans,
not just that the APIs exist."""

from __future__ import annotations

import tempfile
import uuid

import pytest
import pyspark.sql.functions as F

from spark_hive_streaming_sink_spark.io import load_table
from spark_hive_streaming_sink_spark.plans import count_nodes, formatted_plan

from .conftest import SF_DIR


@pytest.fixture(scope="module")
def warehouse_tables(spark):
    """lineitem + orders written bucketed-by-orderkey; events written
    partitioned by event_type."""
    run = uuid.uuid4().hex[:8]
    li = load_table(spark, SF_DIR, "lineitem")
    o = load_table(spark, SF_DIR, "orders")
    ev = load_table(spark, SF_DIR, "events")
    names = {
        "li": f"li_bkt_{run}",
        "o": f"o_bkt_{run}",
        "ev": f"ev_part_{run}",
    }
    (li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
       .format("parquet").saveAsTable(names["li"]))
    (o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
       .format("parquet").saveAsTable(names["o"]))
    ev.write.partitionBy("event_type").format("parquet").saveAsTable(names["ev"])
    return names


def test_bucketed_join_has_no_shuffle(spark, warehouse_tables):
    """Co-located (bucketed) fact-fact join: both sides pre-hashed into
    the same bucket count on the join key → sort-merge join with ZERO
    exchanges. At 100 TB this is the difference between joining in
    place and reshuffling both tables every query."""
    li = spark.table(warehouse_tables["li"])
    o = spark.table(warehouse_tables["o"])
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ path
    try:
        joined = li.join(o, li.l_orderkey == o.o_orderkey).groupBy("o_orderpriority").count()
        assert count_nodes(joined, "Exchange") <= 1  # only the final agg shuffle
        plan = formatted_plan(joined)
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        # correctness too
        got = {r[0]: r[1] for r in joined.collect()}
        plain = (
            load_table(spark, SF_DIR, "lineitem")
            .join(load_table(spark, SF_DIR, "orders"),
                  F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderpriority").count()
        )
        want = {r[0]: r[1] for r in plain.collect()}
        assert got == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_partition_pruning(spark, warehouse_tables):
    """A filter on the partition column must prune at planning time:
    the scan's PartitionFilters carry the predicate and only matching
    directories are read."""
    ev = spark.table(warehouse_tables["ev"]).filter(F.col("event_type") == "click")
    plan = formatted_plan(ev)
    assert "PartitionFilters" in plan
    assert "event_type" in plan.split("PartitionFilters", 1)[1].splitlines()[0]
    src = load_table(spark, SF_DIR, "events").filter(F.col("event_type") == "click")
    assert ev.count() == src.count()


def test_sorted_bucket_scan_avoids_sort(spark, warehouse_tables):
    """sortBy within buckets: the merge join can read pre-sorted bucket
    files (at minimum, correctness of the bucketed round trip)."""
    li = spark.table(warehouse_tables["li"])
    assert li.count() == load_table(spark, SF_DIR, "lineitem").count()


def test_partitioning_invariance_for_order_sensitive_ops(spark, tmp_path):
    """Rewrite the fixture tables into a 7-split layout (different file
    count, different row-to-task assignment) and assert the registered
    results are IDENTICAL — the distributed-determinism property every
    operator claims via hash-gating, rank tie-breaks, and exact
    accumulation. A mismatch here means an op's answer depends on
    partitioning and would silently differ on a 1000-executor cluster."""
    from spark_hive_streaming_sink_spark.io import load_table
    from spark_hive_streaming_sink_spark.registry import QUERIES, queries

    from .conftest import SF_DIR

    queries()
    for t in ["documents", "embeddings", "events", "orders", "lineitem"]:
        load_table(spark, SF_DIR, t).repartition(7).write.mode(
            "overwrite"
        ).parquet(f"{tmp_path}/{t}.parquet")

    names = [
        "dedup_minhash_pairs",       # band self-join over hash buckets
        "dedup_semantic_cluster",    # argmin assignment + pair join
        "agg_histogram_equidepth",   # distributed global rank
        "corpus_stratified_hash_sample",  # hash-gated sampling
        "events_cusum_changepoint",  # ordered cumulative quantization
        "agg_subsample_ci",          # hash-gated replicas
        "text_zipf_rank_frequency",  # global rank + exact moments
        "agg_ks_two_sample",         # global ECDF over value points
    ]
    for name in names:
        b = QUERIES[name].builder
        base = sorted(map(tuple, b(spark, SF_DIR).collect()))
        resh = sorted(map(tuple, b(spark, str(tmp_path)).collect()))
        assert base == resh, f"{name} is partitioning-sensitive"
