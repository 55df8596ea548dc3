"""Dedup clustering: connected components over near-duplicate candidate
pairs — the step that turns pairwise similarity into delete lists.

This is the engine's iterative-algorithm surface (SURVEY.md §2C notes
such ops get a weaker oracle; here DuckDB's recursive CTE reproduces
the same min-label closure, so it IS hash-checked).

Algorithm: iterative min-label propagation on the undirected candidate
graph — each round every node adopts the minimum label among itself and
its neighbors; converges in O(diameter) rounds. At 100 TB this is the
standard large-star/small-star-style DataFrame loop: each round is one
join + one aggregate (shuffle on node id), no driver-side state beyond
the convergence counter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from ..io import load_table, parallelize_scan
from ..registry import register


def connected_components(edges: DataFrame, max_iter: int = 20) -> DataFrame:
    """Min-label connected components over an undirected edge list
    (columns ``src``, ``dst``) → (node, component) with component = min
    node id in the component.

    Each iteration: label(n) ← min(label(n), min over neighbors'
    labels). Stops when no label changes (checked with one count per
    round — the only driver-side action).
    """
    both = edges.select("src", "dst").unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    labels = (
        both.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
    )
    for _ in range(max_iter):
        neighbor_min = (
            both.join(labels, both.dst == labels.node)
            .groupBy(F.col("src").alias("node2"))
            .agg(F.min("component").alias("nbr_min"))
        )
        updated = (
            labels.join(neighbor_min, labels.node == F.col("node2"), "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce("nbr_min", F.col("component"))
                ).alias("component"),
                (F.coalesce("nbr_min", F.col("component")) < F.col("component")).alias(
                    "changed"
                ),
            )
            .localCheckpoint(eager=True)  # truncate the iterative lineage
        )
        n_changed = updated.filter("changed").count()
        labels = updated.select("node", "component")
        if n_changed == 0:
            break
    return labels


@register(
    "dedup_connected_components",
    oracle="""
    WITH RECURSIVE edges AS (
      SELECT a.doc_id AS src, b.doc_id AS dst
      FROM documents a JOIN documents b
        ON b.doc_id = a.doc_id + 1 AND (a.doc_id // 10) = (b.doc_id // 10)),
    undirected AS (
      SELECT src, dst FROM edges UNION SELECT dst, src FROM edges),
    reach(node, lbl) AS (
      SELECT src, src FROM undirected
      UNION
      SELECT u.src, r.lbl FROM undirected u JOIN reach r ON r.node = u.dst)
    SELECT node, MIN(lbl) AS component, COUNT(DISTINCT lbl) AS n_reachable
    FROM reach GROUP BY node
    """,
    tags=("llm", "dedup", "iterative"),
)
def dedup_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over a deterministic candidate-pair graph
    (consecutive doc_ids within blocks of 10 → chains of ≤10 nodes,
    standing in for MinHash candidate pairs). The distributed min-label
    loop must agree with DuckDB's recursive-CTE transitive closure."""
    d = parallelize_scan(load_table(spark, sf_dir, "documents")).select("doc_id")
    a = d.alias("a")
    b = d.alias("b")
    edges = a.join(
        b,
        (F.col("b.doc_id") == F.col("a.doc_id") + 1)
        & (F.floor(F.col("a.doc_id") / 10) == F.floor(F.col("b.doc_id") / 10)),
    ).select(F.col("a.doc_id").alias("src"), F.col("b.doc_id").alias("dst"))
    comp = connected_components(edges)
    # n_reachable for the oracle's sanity column: component size
    sizes = comp.groupBy("component").agg(F.count("*").alias("n_reachable"))
    return comp.join(sizes, "component").select("node", "component", "n_reachable")
