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

import os

from pyspark.sql import Column, DataFrame, SparkSession
import pyspark.sql.functions as F

from ..io import load_table, materialize_parquet, parallelize_scan
from ..registry import register


# Frontier rows the driver will pin as a broadcast inside the
# component loop (exact measured count, not an estimate): (node,
# component) longs at this bound is ~16 MB serialized — fine for any
# executor's broadcast budget on a real cluster. Above it the round
# falls back to the shuffled join (correct at any scale).
_FRONTIER_BCAST_ROWS = 1_000_000

# Rounds of plain frontier-delta propagation before pointer jumping
# kicks in (see connected_components): near-dup graphs converge well
# inside this budget (≤4 rounds measured at ×100), so the common case
# never pays the shortcut self-join; a long-chain graph switches to
# O(log n) label doubling instead of crawling one hop per round.
_SHORTCUT_AFTER = 6


def connected_components(edges: DataFrame, max_iter: int = 30) -> DataFrame:
    """Min-label connected components over an undirected edge list
    (columns ``src``, ``dst``) → (node, component) with component = min
    node id in the component.

    Each iteration: label(n) ← min(label(n), min over neighbors'
    labels). Stops when no label changes (checked with one count per
    round — the only driver-side action). Plain neighbor propagation
    needs ~diameter rounds — fine for near-dup graphs (clouds of
    mutual near-copies), fatal for a pathological long chain. So after
    ``_SHORTCUT_AFTER`` rounds the loop adds POINTER JUMPING to every
    round: the label map composes with itself (label(n) ←
    label(label(n))), halving the remaining chain depth per round —
    the classic PRAM/Pregel shortcutting trick (cf. Rastogi et al.,
    "Finding Connected Components in Map-Reduce in Logarithmic
    Rounds") — so total rounds are O(log n) REGARDLESS of diameter.
    Sound because labels only decrease and label(x) ≤ x is invariant;
    the fixpoint (every node ≤ all its neighbors' labels) is the same,
    so the result is unchanged — only the round count shrinks. If even
    ``max_iter`` rounds pass with labels still changing, the result
    would be silently WRONG (split components → corrupted dedup
    keep-lists), so that case still raises instead of returning.
    """
    # materialize ONCE: every iteration re-reads this edge list, and
    # without the barrier each read re-executes the whole upstream
    # candidate-pair pipeline (shingle → minhash → band join for
    # dedup_lsh_components — measured 21 s → 6 s at sf0.1).
    # File-backed barrier, not localCheckpoint (r14): this is a
    # multi-consumer, CORPUS-SCALING int64 pair table — the exact
    # relation shape the r13 adjudication moved to materialize_parquet
    # for triangle/pagerank after 6.9→18.3 s same-code block-manager
    # swings. The bounded per-round relations below (updated/n1,
    # component labels) stay on localCheckpoint per the barrier policy
    # in io.py. r14 (guide §6): the barrier stores each edge ONCE
    # (half the write volume); the undirected doubling is re-derived
    # from two read-back scans of the same file below.
    e1 = materialize_parquet(edges.select("src", "dst"))
    both = e1.unionByName(
        e1.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    # Frontier-delta propagation (r12): a node's label can only drop
    # when a NEIGHBOR's label dropped in the previous round, so after
    # round 1 the neighbor-min join probes only edges whose dst sits in
    # the changed FRONTIER — not the full edge list. Near-dup graphs
    # converge in a handful of rounds with a collapsing frontier
    # (measured at ×100: rounds 2–3 moved 6.7k/3.5k labels against a
    # 22.9M-edge list), so the late rounds become frontier-sized
    # instead of edge-list-sized. Exact: a node outside the join
    # keeps its label via the left join, identical to the full pass.
    #
    # Per-round join shape (r13, measured ×100 — pre-fix a 6.7k-node
    # frontier round still cost 5.9 s because the FULL 22.9M-row edge
    # list re-shuffled every round):
    # - Round 0 needs no join — and no seed pass — at all (r14, guide
    #   §2.4): labels are the identity, so the neighbor-min IS
    #   min(dst) per src, and the node universe IS that aggregation's
    #   key set (both lists every edge reversed, so every node appears
    #   as src). ONE full-edge groupBy — the only unavoidable
    #   full-edge shuffle in the query — replaces the r12/r13 trio of
    #   seed-label distinct (a second full-edge Exchange) + groupBy +
    #   N-row left join. _nbr is never NULL (every node has >= 1
    #   neighbor), so least(node, _nbr) is exactly the old
    #   least(component, coalesce(nbr_min, component)) at identity
    #   labels.
    # - Later rounds broadcast the frontier while it stays under
    #   _FRONTIER_BCAST_ROWS: the driver KNOWS its exact row count
    #   (last round's count action), so this never broadcasts an
    #   unbounded relation (100 TB rule) — and the probe join runs
    #   map-side over the checkpointed edge partitions with no edge
    #   shuffle; only the matched rows move for the groupBy.
    labels: DataFrame | None = None  # set by round 0's fused pass
    frontier: DataFrame | None = None
    n_changed: int | None = None  # unknown until a round has run
    for it in range(max_iter):
        # Shortcut rounds probe with the FULL label table: pointer
        # jumping moves labels without any neighbor changing, so the
        # frontier-delta invariant no longer holds there.
        shortcut = it >= _SHORTCUT_AFTER
        if n_changed is None:
            n1 = (
                both.groupBy(F.col("src").alias("node"))
                .agg(F.min("dst").alias("_nbr"))
                .select(
                    "node",
                    F.col("node").alias("_old"),
                    F.least(F.col("node"), F.col("_nbr")).alias("_n1"),
                )
            )
        else:
            f = (
                F.broadcast(frontier)
                if not shortcut and n_changed <= _FRONTIER_BCAST_ROWS
                else frontier
            )
            neighbor_min = (
                both.join(f, both.dst == f.node)
                .groupBy(F.col("src").alias("node2"))
                .agg(F.min("component").alias("nbr_min"))
            )
            n1 = labels.join(
                neighbor_min, labels.node == F.col("node2"), "left"
            ).select(
                "node",
                F.col("component").alias("_old"),
                F.least(
                    F.col("component"), F.coalesce("nbr_min", F.col("component"))
                ).alias("_n1"),
            )
        if shortcut:
            # pointer jumping: compose the freshly-computed label map
            # with itself (label(n) ← label(label(n))). Materialize n1
            # first so the self-join reads it instead of re-running the
            # neighbor pass on both sides.
            n1 = n1.localCheckpoint(eager=True)
            a = n1.alias("a")
            b = n1.select(
                F.col("node").alias("_cn"), F.col("_n1").alias("_cc")
            ).alias("b")
            n1 = a.join(b, F.col("a._n1") == F.col("b._cn"), "left").select(
                F.col("a.node").alias("node"),
                F.col("a._old").alias("_old"),
                F.least(
                    F.col("a._n1"), F.coalesce(F.col("b._cc"), F.col("a._n1"))
                ).alias("_n1"),
            )
        updated = (
            n1.select(
                "node",
                F.col("_n1").alias("component"),
                (F.col("_n1") < F.col("_old")).alias("changed"),
            )
            .localCheckpoint(eager=True)  # truncate the iterative lineage
        )
        n_changed = updated.filter("changed").count()
        labels = updated.select("node", "component")
        frontier = (
            labels
            if it + 1 >= _SHORTCUT_AFTER
            else updated.filter("changed").select("node", "component")
        )
        if n_changed == 0:
            break
    if n_changed != 0:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} iterations "
            f"({n_changed} labels still changing): the component graph's "
            "diameter exceeds max_iter — raise max_iter (it must cover the "
            "longest near-dup chain) rather than using these partial labels"
        )
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


# --------------------------------------------------------------------------
# k-means over embeddings (semantic clustering for data curation)
# --------------------------------------------------------------------------

KM_K = 4  # clusters
KM_ITERS = 2  # Lloyd iterations (unrolled in the oracle)
KM_DIM = 64

# Mirrors Spark's zip_with-then-fold exactly (same convention as
# similarity._SQL_DOT): NULL list -> NULL, both-empty -> the 0.0 init
# (list_reduce ERRORS on an empty list), and the series runs over the
# LONGER list so a length mismatch poisons the fold to NULL like
# zip_with's NULL padding (len({v})-only indexing would return a
# finite d2 when v is the shorter side).
_SQL_D2 = (
    "CASE WHEN {v} IS NULL OR {c} IS NULL THEN NULL "
    "WHEN greatest(len({v}), len({c})) = 0 THEN 0.0 "
    "ELSE list_reduce(list_transform(generate_series(1, greatest(len({v}), len({c}))), "
    "i -> ({v}[i] - {c}[i]) * ({v}[i] - {c}[i])), (x, y) -> x + y) END"
)

_SQL_ASSIGN = """
    {out} AS (
      SELECT vec_id, v, cid,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY round(d2, 6), cid) AS rn
      FROM (SELECT e.vec_id, e.v, {cents}.cid,
                   {d2} AS d2
            FROM e CROSS JOIN {cents}))
"""

_SQL_MEANS = """
    {out} AS (
      SELECT cid, i AS dim,
             CAST(SUM(CAST(round(v[i], 6) AS DECIMAL(12,6))) AS DOUBLE)
               / COUNT(*) AS cv
      -- i from each row's own len(v): no hardcoded dimension
      FROM (SELECT cid, v, unnest(generate_series(1, len(v))) AS i
            FROM {assign} WHERE rn = 1)
      GROUP BY cid, i)
"""


def _km_inputs(spark: SparkSession, sf_dir: str):
    """(points, seed centroids) for the shared Lloyd loop."""
    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    cents = e.filter(F.col("vec_id") < KM_K).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("c")
    )
    return e, cents


def _km_d2(v: Column, c: Column) -> Column:
    """Squared L2 as the zip_with fold — pure IEEE +,-,* so the value
    is bit-identical across engines given identical inputs (mirrored
    by _SQL_D2 incl. NULL/empty/ragged poisoning)."""
    return F.aggregate(
        F.zip_with(v, c, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda a, x: a + x,
    )


def _km_ranked(e: DataFrame, cents_df: DataFrame, keep_raw: bool = False) -> DataFrame:
    """Every point's centroids ranked nearest-first MAP-SIDE (r13):
    the K centroids pack into ONE broadcast row and each point sorts
    them by the same total order the former crossJoin + per-vec_id
    row_number window used — (round(d2,6) ASC NULLS LAST, cid), i.e.
    DuckDB's default NULL ordering; the nn flag encodes NULLS LAST and
    two NULL keys tie through to the cid tie-break (d2 is NULL vs a
    non-empty centroid but 0.0 vs an empty one when v itself is empty,
    so the mixed case is reachable — fuzzer — and ordered identically
    on both paths). vec_id is unique in every fixture family (driver,
    adversarial, fuzzer), so the per-vec_id window over K scored rows
    IS a per-row sort of K array elements — no N×K relation, no window
    Exchange, no corpus bytes moved (the old exchange carried v K
    times). Adds `_rc`; `_rc[i]` is the window's rn = i+1 row;
    keep_raw adds the unrounded d2 (silhouette reads raw distances)."""
    cents_row = cents_df.agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("cid").alias("cid"), F.col("c").alias("cv")))
        ).alias("_cents")
    )
    raw = F.transform(
        F.col("_cents"),
        lambda c: F.struct(
            _km_d2(F.col("v"), c.getField("cv")).alias("draw"),
            c.getField("cid").alias("cid"),
        ),
    )

    def key(s: Column) -> Column:
        dr = F.round(s.getField("draw"), 6)
        fields = [
            dr.isNull().cast("int").alias("nn"),
            dr.alias("d"),
            s.getField("cid").alias("cid"),
        ]
        if keep_raw:
            fields.append(s.getField("draw").alias("draw"))
        return F.struct(*fields)

    return (
        e.crossJoin(F.broadcast(cents_row))
        .filter(F.size("_cents") > 0)
        .withColumn("_rc", F.array_sort(F.transform(raw, key)))
        .drop("_cents")
    )


def _km_assign(e: DataFrame, cents_df: DataFrame) -> DataFrame:
    return _km_ranked(e, cents_df).select(
        "vec_id", "v", F.get("_rc", 0).getField("cid").alias("cid")
    )


def _km_means(assigned: DataFrame) -> DataFrame:
    return (
        assigned.select("cid", F.posexplode("v").alias("pos", "val"))
        .groupBy("cid", (F.col("pos") + 1).alias("dim"))
        .agg(
            (
                F.sum(F.round("val", 6).cast("decimal(12,6)")).cast("double")
                / F.count("*")
            ).alias("cv")
        )
    )


def _km_regroup(m: DataFrame) -> DataFrame:
    return m.groupBy("cid").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "cv"))), lambda s: s.cv
        ).alias("c")
    )


@register(
    "cluster_kmeans_embeddings",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
      FROM embeddings),
    c0 AS (SELECT vec_id AS cid, v AS c FROM e WHERE vec_id < {KM_K}),
    {_SQL_ASSIGN.format(out="a1", cents="c0", d2=_SQL_D2.format(v="e.v", c="c0.c"))},
    {_SQL_MEANS.format(out="m1", assign="a1")},
    c1 AS (SELECT cid, list(cv ORDER BY dim) AS c FROM m1 GROUP BY cid),
    {_SQL_ASSIGN.format(out="a2", cents="c1", d2=_SQL_D2.format(v="e.v", c="c1.c"))},
    {_SQL_MEANS.format(out="m2", assign="a2")},
    n2 AS (SELECT cid, COUNT(*) AS n_vecs FROM a2 WHERE rn = 1 GROUP BY cid)
    SELECT m2.cid AS cluster_id, m2.dim, m2.cv, n2.n_vecs
    FROM m2 JOIN n2 ON m2.cid = n2.cid
    """,
    tags=("llm", "clustering", "iterative", "embedding"),
)
def cluster_kmeans_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed k-means (Lloyd's) over the embedding corpus — the
    semantic-clustering pass curation pipelines use for domain
    discovery and cluster-balanced sampling. K=4 deterministic seeds
    (vec_id 0..3), 2 iterations, squared-L2 assignment with
    (round(d2,6), cid) tie-break; means via rounded-decimal exact sums
    so every iteration is bit-identical to the unrolled DuckDB oracle.

    Scale shape: each iteration is (a) one broadcast of K·D centroid
    doubles against the corpus — map-side argmin, no shuffle — and
    (b) one (cid, dim) groupBy whose cardinality is K·D, shuffled as
    partial aggregates. Centroids never leave the cluster (no driver
    collect); lineage stays 2 iterations deep so no checkpoint needed.
    The same loop at K=10k centroids is IVF index construction
    (cf. sim_ivf_topk)."""
    e, cents = _km_inputs(spark, sf_dir)
    for _ in range(KM_ITERS - 1):
        cents = _km_regroup(_km_means(_km_assign(e, cents)))
    final_assign = _km_assign(e, cents)
    m_final = _km_means(final_assign)
    n = final_assign.groupBy("cid").agg(F.count("*").alias("n_vecs"))
    return m_final.join(n, "cid").select(
        F.col("cid").alias("cluster_id"), "dim", "cv", "n_vecs"
    )


# --------------------------------------------------------------------------
# PCA top component via power iteration (embedding dim-reduction)
# --------------------------------------------------------------------------

PCA_ITERS = 2  # power iterations (unrolled in the oracle)

_SQL_SQNORM = "list_reduce(list_transform({z}, q -> q * q), (a, b) -> a + b)"
# dim-agnostic: every series derives from len() of the data, never a
# hardcoded dimension (the adversarial 48-/96-dim fixtures exist to
# catch exactly that). Scalar generate_series accepts column args;
# the TABLE function does not, hence the unnest() subqueries.
_SQL_DOTV = (
    "list_reduce(list_transform(generate_series(1, len(xc)), i -> xc[i] * {v}[i]), "
    "(a, b) -> a + b)"
)
_SQL_ZSTEP = """
    {zout} AS (
      SELECT i AS dim,
             CAST(SUM(CAST(round(y * xc[i], 6) AS DECIMAL(18,6))) AS DOUBLE) AS z
      FROM (SELECT y, xc, unnest(generate_series(1, len(xc))) AS i FROM {yin})
      GROUP BY i),
    {vout} AS (
      SELECT list(z ORDER BY dim) AS z
      FROM {zout})
"""


@register(
    "pca_power_iteration",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS x
      -- NULL embeddings cannot be centered/projected: excluded, both engines
      FROM embeddings WHERE embedding IS NOT NULL),
    md AS (
      SELECT i AS dim,
             CAST(SUM(CAST(round(x[i], 6) AS DECIMAL(12,6))) AS DOUBLE)
               / COUNT(*) AS md
      FROM (SELECT x, unnest(generate_series(1, len(x))) AS i FROM e)
      GROUP BY i),
    mv AS (SELECT list(md ORDER BY dim) AS m FROM md),
    xc AS (
      SELECT vec_id,
             list_transform(generate_series(1, len(x)), i -> x[i] - m[i]) AS xc
      FROM e CROSS JOIN mv),
    v0 AS (
      SELECT list_transform(generate_series(1, len(x)),
                            i -> CASE WHEN i = 1 THEN 1.0 ELSE 0.0 END) AS v
      FROM e LIMIT 1),
    y1 AS (SELECT vec_id, xc, {_SQL_DOTV.format(v="v0.v")} AS y
           FROM xc CROSS JOIN v0),
    {_SQL_ZSTEP.format(zout="z1", yin="y1", vout="zv1")},
    v1 AS (
      SELECT list_transform(z, el -> el / sqrt({_SQL_SQNORM.format(z="z")})) AS v
      FROM zv1),
    y2 AS (SELECT vec_id, xc, {_SQL_DOTV.format(v="v1.v")} AS y
           FROM xc CROSS JOIN v1),
    {_SQL_ZSTEP.format(zout="z2", yin="y2", vout="zv2")},
    fin AS (SELECT z, sqrt({_SQL_SQNORM.format(z="z")}) AS nrm FROM zv2)
    SELECT dim, z[dim] / nrm AS loading, nrm AS growth
    FROM (SELECT z, nrm, unnest(generate_series(1, len(z))) AS dim FROM fin)
    """,
    tags=("llm", "embedding", "iterative", "pca"),
)
def pca_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal component of the embedding corpus via distributed
    power iteration — the dimensionality-reduction / whitening pass of
    embedding-based curation (project onto the top component(s) to
    visualize, de-bias, or compress). Never materializes the 64×64
    covariance: each iteration computes y_i = (x_i − m)·v map-side,
    then z = Σ y_i (x_i − m) as a (dim)-keyed exact-decimal aggregate,
    then normalizes. v₀ = e₁, 2 iterations, both unrolled in the
    DuckDB oracle — loadings match bit-for-bit because every sum is
    integer/decimal-exact and every float op is an identically-ordered
    IEEE expression.

    Scale: per iteration one broadcast of the 64-double v (an
    Aggregate-derived single row) and one 64-key shuffle — O(corpus)
    map work, O(dim) reduce work; the same loop at k components is
    block power iteration. Output 'growth' is ‖z‖ (the Rayleigh-
    quotient numerator — converges to λ₁·n after normalization
    scaling)."""
    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNotNull()  # mirrors the oracle's e CTE guard
    )
    e = emb.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("x")
    )
    md = (
        e.select(F.posexplode("x").alias("pos", "val"))
        .groupBy((F.col("pos") + 1).alias("dim"))
        .agg(
            (
                F.sum(F.round("val", 6).cast("decimal(12,6)")).cast("double")
                / F.count("*")
            ).alias("md")
        )
    )
    mv = md.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "md"))), lambda s: s.md
        ).alias("m")
    )
    xc = e.crossJoin(F.broadcast(mv)).select(
        "vec_id", F.zip_with("x", "m", lambda a, b: a - b).alias("xc")
    )

    # v0 = e1 at the DATA's dimensionality (never hardcode the dim)
    vdf = e.limit(1).select(
        F.transform(
            F.sequence(F.lit(1), F.size("x")),
            lambda i: F.when(i == 1, F.lit(1.0)).otherwise(F.lit(0.0)),
        ).alias("v")
    )

    def dot(a, b):
        return F.aggregate(F.zip_with(a, b, lambda p, q: p * q), F.lit(0.0), lambda acc, t: acc + t)

    zdf = None
    for _ in range(PCA_ITERS):
        y = xc.crossJoin(F.broadcast(vdf)).select(
            "vec_id", "xc", dot(F.col("xc"), F.col("v")).alias("y")
        )
        z = (
            y.select(F.col("y"), F.posexplode("xc").alias("pos", "xcd"))
            .groupBy((F.col("pos") + 1).alias("dim"))
            .agg(
                F.sum(
                    F.round(F.col("y") * F.col("xcd"), 6).cast("decimal(18,6)")
                )
                .cast("double")
                .alias("z")
            )
        )
        zdf = z.agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "z"))), lambda s: s.z
            ).alias("z")
        )
        sqnorm = F.aggregate(
            F.transform("z", lambda q: q * q), F.lit(0.0), lambda acc, t: acc + t
        )
        vdf = zdf.select(
            F.transform("z", lambda el: el / F.sqrt(sqnorm)).alias("v")
        )

    fin = zdf.select(
        "z",
        F.sqrt(
            F.aggregate(
                F.transform("z", lambda q: q * q), F.lit(0.0), lambda acc, t: acc + t
            )
        ).alias("nrm"),
    )
    return fin.select(
        F.posexplode(F.transform("z", lambda el: el / F.col("nrm"))).alias(
            "pos", "loading"
        ),
        F.col("nrm").alias("growth"),
    ).select((F.col("pos") + 1).alias("dim"), "loading", "growth")


# --------------------------------------------------------------------------
# SemDeDup-style semantic dedup: cluster cells + within-cell cosine
# --------------------------------------------------------------------------

SEM_TAU = 0.38  # within-cell cosine threshold for "semantic duplicate"
# cells — must scale with corpus size (K ~ sqrt(N)) so the quadratic
# within-cell term stays bounded; the stress harness raises it via env
# (oracle SQL derives from the same value, so it stays consistent)
SEM_K = int(os.environ.get("SHSS_SEM_K", "16"))

# Same zip_with-mirroring guard as _SQL_D2 (empty list / NULL list /
# ragged pair), dot-product form.
_SQL_DOT_CL = (
    "CASE WHEN {a} IS NULL OR {b} IS NULL THEN NULL "
    "WHEN greatest(len({a}), len({b})) = 0 THEN 0.0 "
    "ELSE list_reduce(list_transform(generate_series(1, greatest(len({a}), len({b}))), "
    "i -> {a}[i] * {b}[i]), (x, y) -> x + y) END"
)


@register(
    "dedup_semantic_cluster",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
      FROM embeddings),
    c0 AS (SELECT vec_id AS cid, v AS c FROM e WHERE vec_id < {SEM_K}),
    {_SQL_ASSIGN.format(out="a1", cents="c0", d2=_SQL_D2.format(v="e.v", c="c0.c"))},
    m AS (SELECT vec_id, v, cid,
                 sqrt({_SQL_DOT_CL.format(a='v', b='v')}) AS nrm
          FROM a1 WHERE rn = 1),
    p AS (SELECT a.cid, b.vec_id AS dup_id, a.vec_id AS partner_id,
                 round({_SQL_DOT_CL.format(a='a.v', b='b.v')} / (a.nrm * b.nrm), 6)
                   AS cos
          FROM m a JOIN m b ON a.cid = b.cid AND a.vec_id < b.vec_id)
    SELECT dup_id, cid AS cluster_id,
           MIN(partner_id) AS keeper_id,
           COUNT(*) AS n_matches,
           MAX(cos) AS best_cos
    FROM p WHERE cos >= {SEM_TAU}
    GROUP BY dup_id, cid
    """,
    tags=("llm", "dedup", "embedding", "clustering"),
)
def dedup_semantic_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): partition the embedding corpus into cluster
    cells, then mark a vector as a semantic duplicate iff some
    lower-id vector in the SAME cell has cosine >= SEM_TAU with it
    (keep-lowest-id rule; the keeper reported is the minimum such
    partner). Pairwise comparison never crosses cell boundaries —
    that is the whole point of the method: at 100 TB you raise K so
    cells hold ~10^3-10^4 vectors and the quadratic term stays local
    while the shuffle is a single exchange on the cell id.

    Cells here are the SEM_K seed centroids (vec_id < SEM_K,
    squared-L2 argmin with the same (round(d2,6), cid) tie-break the
    k-means operator uses) — i.e. an IVF coarse quantizer, which is
    exactly how production SemDeDup assigns cells. SEM_K > KM_K on
    purpose: cell count is the parallelism AND the bound on the
    quadratic term, so it scales with corpus size (sqrt(N) cells is
    the usual rule).

    The assignment argmin is fully MAP-SIDE (r13, _km_ranked): the K
    centroids pack into one broadcast row and each point sorts them by
    the oracle's (round(d2,6) NULLS LAST, cid) key as a projection —
    no N×K relation, no exchange, no materialization at all (the r12
    form aggregated N×K cross-joined rows carrying two full vectors
    into a vec_id exchange and eagerly checkpointed the result for
    what is, since the Arrow-gram rewrite below, a single consumer).

    The within-cell pair scoring is a per-cell Arrow/BLAS gram matrix
    (applyInPandas over the cell id): one (B x D)·(D x B) matmul per
    cell replaces sum(|cell|^2)/2 per-pair zip_with folds — Catalyst's
    higher-order functions are not codegen'd, and the fold-based join
    measured 198 s at x100 where the gram path does the same 1.3e8
    pairs in seconds. The numerator differs from the oracle's
    sequential fold only by float64 summation order (~1e-13 relative),
    six orders of magnitude inside the round(cos, 6) quantum; the
    norms come from the exact JVM fold in the assignment table.
    NaN-valued embedding COMPONENTS are out of scope for this Arrow
    path (Arrow's NaN-is-null convention would return NULL where the
    fold returns NaN) — same caveat as sim_cosine_topk_numpy; no
    fixture or fuzzer produces NaN components.

    Two-level hierarchical assignment (route to sqrt(K) super-cells,
    then argmin within) was measured and REJECTED here: with untrained
    (seed) super-centroids the coarse routing concentrates mass onto
    the super-centroids' own cells — max cell 7 600 vs 2 200 flat at
    x100 (N=200k, K=160) — and since pair work is sum(|cell|^2), the
    skewed cells cost far more than the assignment saved (>10 min vs
    ~240 s). Below-N^1.5 assignment needs a TRAINED balanced coarse
    quantizer; with seed centroids, cheap flat assignment + balanced
    cells is the faster and simpler plan at every measured scale.

    NULL semantics (adversarial-gated): a NULL vector has NULL d2
    against every centroid, lands in cell 0 on both engines, and its
    NULL norm keeps it out of every pair (excluded before the gram —
    a NULL or zero norm, or a NULL component, makes every cosine it
    touches NULL in both engines, and NULL never passes >= SEM_TAU)."""
    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    # .limit(SEM_K) is a no-op on the K seed rows but makes the
    # broadcast subtree provably size-bounded (GlobalLimit) — the
    # invariant test rejects unbounded broadcasts of scaling tables
    cents = (
        e.filter(F.col("vec_id") < SEM_K)
        .limit(SEM_K)
        .select(F.col("vec_id").alias("cid"), F.col("v").alias("c"))
    )
    # Map-side per-row assignment (r13): the r12 form cross-joined the
    # corpus against K broadcast centroids (N×K rows, each carrying TWO
    # full vectors) into a vec_id hash aggregate that shipped every
    # vector through an exchange, then eagerly checkpointed the result
    # — for what is, since the Arrow-gram rewrite, a SINGLE consumer.
    # _km_ranked ranks the K centroids per row as a projection: no N×K
    # relation, no exchange, no checkpoint. The (nn, round(d2,6), cid)
    # sort key reproduces the old coalesce-to-inf argmin exactly on
    # every reachable input and the oracle's NULLS LAST ordering on the
    # mixed per-centroid-NULL case too (stronger than the inf sentinel:
    # no collision with a real +inf d2). ×100: 121.8 s → see
    # tools/stress_x100_r13b.json.
    member = _km_ranked(e, cents).select(
        "vec_id",
        "v",
        F.get("_rc", 0).getField("cid").alias("cid"),
        F.sqrt(
            F.aggregate(
                F.transform("v", lambda x: x * x), F.lit(0.0), lambda a, x: a + x
            )
        ).alias("nrm"),
    )
    import numpy as np
    import pandas as pd

    from .similarity import _np_round_half_up

    # Rows that can never emit a pair: a NULL vector, a NULL component,
    # or a zero/NULL norm makes every cosine it touches NULL in both
    # engines (try_divide / DuckDB x/0), and NULL never passes >= tau.
    scorable = member.filter(
        F.col("v").isNotNull()
        & F.col("nrm").isNotNull()
        & (F.col("nrm") > 0)
        & ~F.exists("v", lambda x: x.isNull())
    ).select("vec_id", "cid", "v", "nrm")

    def cell_pairs(pdf: "pd.DataFrame") -> "pd.DataFrame":
        out = {"dup_id": [], "cluster_id": [], "partner_id": [], "cos": []}
        if len(pdf) >= 2:
            # ragged vectors can't pair (the fold's NULL-padded zip
            # poisons their cosine to NULL): gram per distinct length
            lens = pdf["v"].map(len).to_numpy()
            for L in np.unique(lens):
                sub = pdf[lens == L].sort_values("vec_id")
                n = len(sub)
                if n < 2 or L == 0:
                    continue
                ids = sub["vec_id"].to_numpy()
                cids = sub["cid"].to_numpy()
                V = np.stack(sub["v"].to_numpy()).astype(np.float64)
                nrm = sub["nrm"].to_numpy().astype(np.float64)
                cos = _np_round_half_up((V @ V.T) / np.outer(nrm, nrm), 6)
                a, b = np.triu_indices(n, k=1)  # ids sorted: id[a] < id[b]
                keep = cos[a, b] >= SEM_TAU
                out["dup_id"].append(ids[b[keep]])
                out["cluster_id"].append(cids[b[keep]])
                out["partner_id"].append(ids[a[keep]])
                out["cos"].append(cos[a[keep], b[keep]])
        cat = {
            k: (np.concatenate(v) if v else np.array([], dtype=np.float64))
            for k, v in out.items()
        }
        return pd.DataFrame(cat)

    pairs = scorable.groupBy("cid").applyInPandas(
        cell_pairs, "dup_id long, cluster_id long, partner_id long, cos double"
    )
    return pairs.groupBy("dup_id", "cluster_id").agg(
        F.min("partner_id").alias("keeper_id"),
        F.count("*").alias("n_matches"),
        F.max("cos").alias("best_cos"),
    )


# --------------------------------------------------------------------------
# end-to-end near-dup graph: LSH candidate pairs -> connected components
# --------------------------------------------------------------------------

from .dedup import (  # noqa: E402  (shared MinHash pipeline pieces)
    _SQL_BAND_REPS,
    _SQL_HX,
    _SQL_MINHASH,
    _band_reps,
    _minhash_frame,
)


@register(
    "dedup_lsh_components",
    oracle=f"""
    WITH RECURSIVE t AS (SELECT doc_id, string_split(trim(text), ' ') AS toks FROM documents),
    hxt AS (SELECT doc_id, {_SQL_HX} AS hx FROM t),
    mh0 AS (SELECT doc_id, {_SQL_MINHASH} FROM hxt),
    -- degenerate docs (NULL minhash: empty/NULL text, <3 tokens) must not
    -- band — concat_ws skips NULLs, so they'd all share the md5('') bucket
    -- and merge into one phantom "duplicate" component
    mh AS (SELECT * FROM mh0 WHERE mh0 IS NOT NULL),
    bands AS (
      SELECT doc_id, 0 AS band_no,
             md5(concat_ws('_', mh0, mh1, mh2, mh3)) AS band_key FROM mh
      UNION ALL
      SELECT doc_id, 1 AS band_no,
             md5(concat_ws('_', mh4, mh5, mh6, mh7)) AS band_key FROM mh),
    {_SQL_BAND_REPS.strip()},
    edges AS (
      SELECT DISTINCT a.doc_id AS src, b.doc_id AS dst
      FROM reps a JOIN bands b
        ON a.band_key = b.band_key AND a.band_no = b.band_no
       AND a.doc_id < b.doc_id),
    undirected AS (
      SELECT src, dst FROM edges UNION SELECT dst, src FROM edges),
    reach(node, lbl) AS (
      SELECT src, src FROM undirected
      UNION
      SELECT u.src, r.lbl FROM undirected u JOIN reach r ON r.node = u.dst),
    comp AS (SELECT node, MIN(lbl) AS component FROM reach GROUP BY node)
    SELECT c.node, c.component, s.n_members,
           CAST(c.node != c.component AS BOOLEAN) AS is_duplicate
    FROM comp c
    JOIN (SELECT component, CAST(COUNT(*) AS BIGINT) AS n_members
          FROM comp GROUP BY component) s USING (component)
    """,
    tags=("llm", "dedup", "minhash", "iterative"),
)
def dedup_lsh_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full near-dup delete-list pipeline on REAL candidate pairs:
    MinHash -> LSH band buckets -> bucket-local candidate pairs ->
    connected components -> keep component-min, delete the rest. This
    is the step composition production dedup (e.g. the C4/RefinedWeb
    recipes) actually runs; dedup_connected_components pins the
    component algorithm on a synthetic graph, THIS query pins the
    whole chain end-to-end against a recursive-CTE oracle.

    Scale: signatures are map-side; the pair join is band-bucket-local
    (never corpus x corpus); the component loop is the same
    join+aggregate iteration as connected_components — O(diameter)
    rounds, and near-dup graphs are short-diameter by construction
    (components are clouds of mutual near-copies, not long chains)."""
    d = load_table(spark, sf_dir, "documents")
    # Materialize the signature table BEFORE the degenerate-doc filter
    # (same pattern as dedup_minhash_pairs): filtering a computed mh0
    # without materializing first lets pushdown substitute the whole
    # minhash fold into the filter. Degenerate docs (NULL minhash) must
    # not band — with no Jaccard-verify stage downstream, the shared
    # md5('') bucket would merge every empty/NULL doc into one phantom
    # duplicate component. File-backed barrier, not localCheckpoint:
    # the ~6M-row ×100 signature table hit the 25-55 s block-manager
    # variance class (r12 adjudication); parquet write+read is the
    # predictable, fault-tolerant persisted-signature-table pattern.
    mh = materialize_parquet(_minhash_frame(d)).filter(
        F.col("mh0").isNotNull()
    )
    b0 = mh.select(
        "doc_id",
        F.lit(0).alias("band_no"),
        F.md5(F.concat_ws("_", *[F.col(f"mh{i}") for i in range(4)])).alias(
            "band_key"
        ),
    )
    b1 = mh.select(
        "doc_id",
        F.lit(1).alias("band_no"),
        F.md5(F.concat_ws("_", *[F.col(f"mh{i}") for i in range(4, 8)])).alias(
            "band_key"
        ),
    )
    bands = b0.unionByName(b1)
    rhs = bands.select(
        F.col("doc_id").alias("dst"),
        F.col("band_no").alias("b_no"),
        F.col("band_key").alias("b_key"),
    )
    edges = (
        _band_reps(bands).join(  # star scheme: reps x all members
            rhs,
            (F.col("band_key") == F.col("b_key"))
            & (F.col("band_no") == F.col("b_no"))
            & (F.col("doc_id") < F.col("dst")),
        )
        .select(F.col("doc_id").alias("src"), "dst")
        .distinct()
    )
    comp = connected_components(edges)
    sizes = comp.groupBy("component").agg(
        F.count("*").cast("bigint").alias("n_members")
    )
    return comp.join(sizes, "component").select(
        "node",
        "component",
        "n_members",
        (F.col("node") != F.col("component")).alias("is_duplicate"),
    )


# --------------------------------------------------------------------------
# PageRank over the kNN similarity graph (centrality-based selection)
# --------------------------------------------------------------------------

PR_DAMP = 0.85
PR_SCALE = 1_000_000_000  # ranks as exact integer nano-units


def _pagerank_iter_sql(rin: str, out: str) -> str:
    """One integer-exact PageRank iteration over CTEs edges/deg/{rin}."""
    return f"""
    {out} AS (
      SELECT n.node,
             CAST(round((1.0 - {PR_DAMP}) * {PR_SCALE} / n.n_nodes, 0) AS BIGINT)
             + COALESCE(CAST(SUM(CAST(round({PR_DAMP} * r.r_u / d.deg, 0)
                                      AS BIGINT)) AS BIGINT), 0) AS r_u
      FROM (SELECT node, (SELECT COUNT(*) FROM deg) AS n_nodes
            FROM deg) n
      LEFT JOIN edges e ON e.dst = n.node
      LEFT JOIN {rin} r ON r.node = e.src
      LEFT JOIN deg d ON d.node = e.src
      GROUP BY n.node, n.n_nodes)
    """


def _rnn_oracle() -> str:
    from .similarity import K_NN_GRAPH, _sql_bucket, _sql_dot

    dot_vv = _sql_dot("embedding", "embedding")
    dot_ab = _sql_dot("a.embedding", "b.embedding")
    return f"""
    WITH v AS (SELECT vec_id, embedding,
                      sqrt({dot_vv}) AS nrm,
                      {_sql_bucket('embedding')} AS bucket
               FROM embeddings WHERE embedding IS NOT NULL),
    p AS (SELECT a.vec_id AS src, b.vec_id AS dst,
                 round({dot_ab} / (a.nrm * b.nrm), 6) AS cosine,
                 row_number() OVER (PARTITION BY a.vec_id
                                    ORDER BY round({dot_ab} / (a.nrm * b.nrm), 6)
                                             DESC, b.vec_id) AS rnk
          FROM v a JOIN v b ON a.bucket = b.bucket AND a.vec_id != b.vec_id),
    knn AS (SELECT src, dst, cosine, rnk FROM p WHERE rnk <= {K_NN_GRAPH})
    SELECT f.src, f.dst,
           CAST(f.rnk AS BIGINT) AS rank_fwd,
           CAST(r.rnk AS BIGINT) AS rank_rev,
           CAST(round(f.cosine * 1000000, 0) AS BIGINT) AS cos_ppm
    FROM knn f JOIN knn r ON r.src = f.dst AND r.dst = f.src
    WHERE f.src < f.dst
    """


@register(
    "sim_reciprocal_nearest_neighbors",
    oracle=_rnn_oracle(),
    tags=("llm", "similarity", "embedding", "graph"),
)
def sim_reciprocal_nearest_neighbors(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Reciprocal (mutual) k-nearest-neighbor pairs over the embedding
    corpus: (a, b) such that b is in a's top-k AND a is in b's top-k.
    Mutuality is the classic high-precision filter on a kNN graph —
    RNN pairs seed agglomerative clusterings (Reciprocal Nearest
    Neighbor chains) and are the "definitely related" edge set
    re-rankers trust. One row per unordered pair with both ranks and
    the shared cosine.

    Exactness: cosines round to 6 places (the engine-parity quantum
    shared by the whole kNN family), ranks carry the (cosine DESC,
    vec_id) tie-break, and the output pair is canonical (src < dst).

    Scale (r14, guide §2.4): both directions of a reciprocal pair
    live in the SAME LSH cell (a vector hashes to exactly one
    bucket), so the mutuality test, both ranks and the shared cosine
    are all cell-local facts — _knn_cell_edges(mutual=True) emits the
    finished pairs straight out of the Arrow gram. The r11–r13 form
    checkpointed the N*k edge list and self-joined it on the reversed
    key: one corpus-sized barrier write plus one corpus-sized shuffle
    join, both now gone (zero joins, zero checkpoints — only the
    bucket co-location Exchange remains). Never all-pairs."""
    from .similarity import K_NN_GRAPH, _knn_cell_edges, _norm, _spark_bucket

    emb = load_table(spark, sf_dir, "embeddings")
    v = emb.filter(F.col("embedding").isNotNull()).select(
        "vec_id",
        "embedding",
        _norm(F.col("embedding")).alias("nrm"),
        _spark_bucket(F.col("embedding")).alias("bucket"),
    )
    return _knn_cell_edges(v, K_NN_GRAPH, mutual=True).select(
        "src",
        "dst",
        F.col("rank_fwd").cast("bigint").alias("rank_fwd"),
        F.col("rank_rev").cast("bigint").alias("rank_rev"),
        F.round(F.col("cosine") * 1_000_000, 0).cast("bigint").alias("cos_ppm"),
    )


def _label_disagreement_oracle() -> str:
    from .similarity import K_NN_GRAPH, _sql_bucket, _sql_dot

    dot_vv = _sql_dot("embedding", "embedding")
    dot_ab = _sql_dot("a.embedding", "b.embedding")
    return f"""
    WITH v AS (SELECT vec_id, embedding, label,
                      sqrt({dot_vv}) AS nrm,
                      {_sql_bucket('embedding')} AS bucket
               FROM embeddings
               WHERE embedding IS NOT NULL AND label IS NOT NULL),
    p AS (SELECT a.vec_id AS src, b.vec_id AS dst,
                 a.label AS own, b.label AS nbr,
                 row_number() OVER (PARTITION BY a.vec_id
                                    ORDER BY round({dot_ab} / (a.nrm * b.nrm), 6)
                                             DESC, b.vec_id) AS rnk
          FROM v a JOIN v b ON a.bucket = b.bucket AND a.vec_id != b.vec_id),
    j AS (SELECT src, own, nbr FROM p WHERE rnk <= {K_NN_GRAPH}),
    per AS (
      SELECT src, own, CAST(COUNT(*) AS BIGINT) AS n_nbrs,
             CAST(SUM(CASE WHEN nbr != own THEN 1 ELSE 0 END) AS BIGINT)
               AS n_disagree
      FROM j GROUP BY src, own),
    mj AS (
      SELECT src, nbr AS majority_label FROM (
        SELECT src, nbr,
               row_number() OVER (PARTITION BY src
                                  ORDER BY COUNT(*) DESC, nbr) AS rn
        FROM j GROUP BY src, nbr) WHERE rn = 1)
    SELECT per.src AS vec_id,
           CAST(per.own AS BIGINT) AS label,
           per.n_nbrs, per.n_disagree,
           CAST(round(1000000.0 * per.n_disagree / per.n_nbrs, 0) AS BIGINT)
             AS disagree_ppm,
           CAST(mj.majority_label AS BIGINT) AS majority_label,
           (2 * per.n_disagree > per.n_nbrs) AS is_suspect
    FROM per JOIN mj ON mj.src = per.src
    """


@register(
    "sim_label_knn_disagreement",
    oracle=_label_disagreement_oracle(),
    tags=("llm", "similarity", "quality", "graph"),
)
def sim_label_knn_disagreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-noise screen over the embedding corpus (the Confident
    Learning / Northcutt et al. 2021 signal, kNN-voted form): each
    labeled vector is scored by how many of its k nearest neighbors
    carry a DIFFERENT label; a strict neighbor-majority disagreement
    flags the row as a suspected mislabel, and the neighbor-majority
    label (count-desc, label-asc tie-break) is the suggested fix. This
    is the audit run before a labeled set trains a quality classifier
    — mislabels cluster in embedding space by construction.

    Exactness: the kNN graph is the deterministic cell-local top-k of
    sim_knn_graph_lsh (cosine rounded to 6 places, vec_id tie-break);
    votes are exact counts; the one divide rounds once to ppm.

    Scale (r14, guide §2.4): identical kNN construction — one bucket
    shuffle, Arrow gram per cell — and now the ENTIRE vote pipeline is
    cell-local too (_knn_cell_label_votes): every node's k neighbors
    live in its own cell, so the per-node disagreement count and the
    (votes DESC, label ASC) majority are computed inside the kernel
    and ONE finished row per node leaves the cell. The r13 form
    shipped N*k edge rows out, shuffled them through a corpus-wide
    (node, own, nbr) groupBy, checkpointed the votes, ran a per-node
    row_number window and re-joined the two rollups — all gone: the
    only Exchange left is the bucket co-location shuffle. NULL
    embeddings can't bucket and NULL labels can't vote or be audited:
    both excluded in both engines."""
    from .similarity import (
        K_NN_GRAPH,
        _knn_cell_label_votes,
        _norm,
        _spark_bucket,
    )

    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNotNull() & F.col("label").isNotNull()
    )
    v = emb.select(
        "vec_id",
        "embedding",
        _norm(F.col("embedding")).alias("nrm"),
        _spark_bucket(F.col("embedding")).alias("bucket"),
        "label",
    )
    # every input label is non-NULL here, so n_labeled_nbrs is the
    # node's full neighbor count (the old SUM(votes)); singleton-cell
    # nodes have no edges and were absent from the r13 output — the
    # n_nbrs > 0 filter keeps that contract
    st = _knn_cell_label_votes(v, K_NN_GRAPH).filter(F.col("n_nbrs") > 0)
    nn = F.col("n_labeled_nbrs")
    return st.select(
        F.col("node_id").alias("vec_id"),
        F.col("own_label").cast("bigint").alias("label"),
        nn.alias("n_nbrs"),
        "n_disagree",
        F.round(F.lit(1_000_000.0) * F.col("n_disagree") / nn, 0)
        .cast("bigint")
        .alias("disagree_ppm"),
        F.col("majority_label").cast("bigint").alias("majority_label"),
        (F.lit(2) * F.col("n_disagree") > nn).alias("is_suspect"),
    )


def _pr_oracle() -> str:
    # _sql_dot carries the empty/NULL/ragged-list guard that mirrors
    # Spark's zip_with fold — the raw list_reduce form ERRORS on the
    # empty-list embeddings the fuzzer feeds
    from .similarity import K_NN_GRAPH, _sql_bucket, _sql_dot

    _PR_DOT_VV = _sql_dot("embedding", "embedding")
    _PR_DOT_AB = _sql_dot("a.embedding", "b.embedding")
    return f"""
    WITH v AS (SELECT vec_id, embedding,
                      sqrt({_PR_DOT_VV}) AS nrm,
                      {_sql_bucket('embedding')} AS bucket
               -- NULL embeddings can't be bucketed or scored: excluded
               -- identically in both engines
               FROM embeddings WHERE embedding IS NOT NULL),
    p AS (SELECT a.vec_id AS src, b.vec_id AS dst,
                 row_number() OVER (PARTITION BY a.vec_id
                                    ORDER BY round({_PR_DOT_AB} / (a.nrm * b.nrm), 6)
                                             DESC, b.vec_id) AS rnk
          FROM v a JOIN v b ON a.bucket = b.bucket AND a.vec_id != b.vec_id),
    edges AS (SELECT src, dst FROM p WHERE rnk <= {K_NN_GRAPH}),
    deg AS (SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS deg
            FROM edges GROUP BY src),
    r0 AS (SELECT node,
                  CAST(round(CAST({PR_SCALE} AS DOUBLE)
                             / (SELECT COUNT(*) FROM deg), 0) AS BIGINT) AS r_u
           FROM deg),
    {_pagerank_iter_sql('r0', 'r1').strip().rstrip()},
    {_pagerank_iter_sql('r1', 'r2').strip().rstrip()}
    SELECT r2.node, d.deg AS out_degree,
           COALESCE(i.in_deg, 0) AS in_degree,
           r2.r_u AS rank_nano
    FROM r2
    JOIN deg d ON d.node = r2.node
    LEFT JOIN (SELECT dst, CAST(COUNT(*) AS BIGINT) AS in_deg
               FROM edges GROUP BY dst) i ON i.dst = r2.node
    """


@register(
    "graph_pagerank_knn",
    oracle=_pr_oracle(),
    tags=("llm", "graph", "iterative", "embedding"),
)
def graph_pagerank_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the kNN similarity graph — centrality-based data
    selection: a document whose embedding is linked by many other
    documents' top-k lists is a representative region of the corpus
    (high rank), an orphan is an outlier; curation pipelines use the
    ranking for coreset selection and diversity-aware sampling. Two
    damped iterations over the same LSH-cell-local edges
    sim_knn_graph_lsh builds.

    Determinism: ranks live as exact integer nano-units; each
    contribution rounds r_u*d/deg once (a double op on exact ints,
    identical cross-engine) and sums exactly — the unrolled DuckDB
    oracle reproduces every rank bit-for-bit.

    Scale (r13): each iteration is ONE join of the edge list with the
    rank vector (shuffle on node id — the standard distributed
    PageRank shape) + a bounded-degree aggregate; edges are
    kNN-bounded (N*k, never N^2), cell-local by construction, and
    carry the node's out-degree straight out of the cell (it is the
    cell-local kept-edge count), so the r12 per-iteration deg join —
    a second shuffle of the N*k edge list per iteration — is gone
    (guide §2.4)."""
    from .similarity import K_NN_GRAPH, _knn_cell_topk, _norm, _spark_bucket

    emb = load_table(spark, sf_dir, "embeddings")
    v = emb.filter(F.col("embedding").isNotNull()).select(
        "vec_id",
        "embedding",
        _norm(F.col("embedding")).alias("nrm"),
        _spark_bucket(F.col("embedding")).alias("bucket"),
    )
    # same per-bucket Arrow gram as sim_knn_graph_lsh — only the N*k
    # kept edges leave the cells, never the full pair list; n_nbrs is
    # each src's kept-edge count == the oracle's COUNT(*) deg
    # file-backed barrier (r13): corpus-scaling fixed-width int64
    # triples with four consumers (deg, 2 iterations, in_deg) — the
    # block-manager checkpoint showed its variance class here (×100
    # isolates 6.7-16.5 s on identical code); parquet is the
    # predictable barrier for this shape
    edges = materialize_parquet(
        _knn_cell_topk(v, K_NN_GRAPH, deg=True).select(
            F.col("node_id").alias("src"),
            F.col("neighbor_id").alias("dst"),
            F.col("n_nbrs").alias("deg"),
        )
    )
    # NOT barriered (measured dead end, do not re-try): checkpointing
    # this distinct measured 20.1/22.7 s at ×100 vs 6.7 s without —
    # the severed lineage demoted the downstream rank joins' planning
    # while the re-derived distinct rides the already-checkpointed
    # edge table cheaply
    deg = edges.select(F.col("src").alias("node"), "deg").distinct()
    n_nodes = deg.agg(F.count("*").alias("n_nodes"))
    r = deg.crossJoin(F.broadcast(n_nodes)).select(
        "node",
        F.round(F.lit(float(PR_SCALE)) / F.col("n_nodes"), 0)
        .cast("bigint")
        .alias("r_u"),
    )
    base = F.round((1.0 - PR_DAMP) * PR_SCALE / F.col("n_nodes"), 0).cast("bigint")
    for _ in range(2):
        contrib = (
            edges.join(r.withColumnRenamed("node", "src"), "src")
            .select(
                F.col("dst").alias("node"),
                F.round(PR_DAMP * F.col("r_u") / F.col("deg"), 0)
                .cast("bigint")
                .alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").cast("bigint").alias("in_sum"))
        )
        r = (
            deg.select("node")
            .join(contrib, "node", "left")
            .crossJoin(F.broadcast(n_nodes))
            .select(
                "node",
                (base + F.coalesce("in_sum", F.lit(0))).cast("bigint").alias("r_u"),
            )
        )
    in_deg = edges.groupBy(F.col("dst").alias("node")).agg(
        F.count("*").cast("bigint").alias("in_degree")
    )
    return (
        r.join(deg, "node")
        .join(in_deg, "node", "left")
        .select(
            "node",
            F.col("deg").alias("out_degree"),
            F.coalesce("in_degree", F.lit(0).cast("bigint")).alias("in_degree"),
            F.col("r_u").alias("rank_nano"),
        )
    )


# --------------------------------------------------------------------------
# label propagation over the kNN graph (semi-supervised curation labels)
# --------------------------------------------------------------------------


def _lp_oracle() -> str:
    from .similarity import K_NN_GRAPH, _sql_bucket, _sql_dot

    return f"""
    WITH v AS (SELECT vec_id, embedding, label,
                      sqrt({_sql_dot('embedding', 'embedding')}) AS nrm,
                      {_sql_bucket('embedding')} AS bucket
               -- NULL embeddings have no neighborhood: excluded
               -- identically in both engines
               FROM embeddings WHERE embedding IS NOT NULL),
    p AS (SELECT a.vec_id AS node_id, b.vec_id AS neighbor_id,
                 row_number() OVER (
                   PARTITION BY a.vec_id
                   ORDER BY round({_sql_dot('a.embedding', 'b.embedding')}
                                  / (a.nrm * b.nrm), 6) DESC, b.vec_id) AS rnk
          FROM v a JOIN v b ON a.bucket = b.bucket AND a.vec_id != b.vec_id),
    edges AS (SELECT node_id, neighbor_id FROM p WHERE rnk <= {K_NN_GRAPH}),
    votes AS (SELECT e.node_id, l.label AS cand,
                     CAST(COUNT(*) AS BIGINT) AS n_votes
              FROM edges e JOIN embeddings l ON l.vec_id = e.neighbor_id
              WHERE l.label IS NOT NULL
              GROUP BY e.node_id, l.label),
    win AS (SELECT node_id, cand, n_votes FROM (
              SELECT *, row_number() OVER (PARTITION BY node_id
                                           ORDER BY n_votes DESC, cand) AS rn
              FROM votes)
            WHERE rn = 1)
    SELECT v.vec_id AS node_id, v.label AS old_label,
           w.cand AS new_label, w.n_votes,
           CASE WHEN w.cand IS NOT NULL
                THEN (w.cand IS DISTINCT FROM v.label) END AS changed
    FROM v LEFT JOIN win w ON w.node_id = v.vec_id
    """


@register(
    "graph_label_propagation",
    oracle=_lp_oracle(),
    tags=("llm", "graph", "embedding", "clustering"),
)
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One round of majority-vote label propagation over the kNN
    similarity graph (Zhu & Ghahramani 2002 label propagation /
    Raghavan et al. 2007 LPA, the curation use: spread sparse
    human/classifier domain labels to unlabeled or mislabeled
    neighbors before cluster-balanced sampling). Each node takes the
    majority label among its top-K_NN_GRAPH cosine neighbors'
    CURRENT labels (NULL-label neighbors don't vote; ties break to
    the smallest label; a node with no labeled neighbors keeps NULL
    new_label and a NULL changed verdict).

    Scale shape (r14, guide §2.4): the same per-cell Arrow gram as
    sim_knn_graph_lsh, with the vote count, the (votes DESC, label
    ASC) winner AND the per-node output row all computed inside the
    cell (_knn_cell_label_votes) — one finished row per node leaves
    the kernel, so the r13 corpus-wide (node, cand) groupBy, the
    per-node top-1 window and the node-keyed left join are gone.
    Repeated rounds = re-running this operator on the updated label
    column — each round is the same bounded pass, no state
    accumulates."""
    from .similarity import K_NN_GRAPH, _knn_cell_label_votes, _norm, _spark_bucket

    emb = load_table(spark, sf_dir, "embeddings")
    v = emb.filter(F.col("embedding").isNotNull()).select(
        "vec_id",
        "embedding",
        "label",
        _norm(F.col("embedding")).alias("nrm"),
        _spark_bucket(F.col("embedding")).alias("bucket"),
    )
    # r14 (guide §2.4): the whole vote → majority → rejoin pipeline is
    # cell-local (_knn_cell_label_votes): the kernel emits one row per
    # node — including singleton-cell nodes, which the r13 left join
    # used to re-attach with NULL votes — with the (votes DESC, label
    # ASC) winner already picked. The corpus-wide (node, cand) groupBy
    # Exchange, the per-node row_number window and the node-keyed left
    # join are gone; the only Exchange left is the bucket shuffle.
    st = _knn_cell_label_votes(
        v.select("vec_id", "embedding", "nrm", "bucket", "label"), K_NN_GRAPH
    )
    nl = F.col("majority_label")
    return st.select(
        "node_id",
        F.col("own_label").alias("old_label"),
        nl.alias("new_label"),
        F.col("majority_votes").cast("bigint").alias("n_votes"),
        F.when(nl.isNotNull(), ~nl.eqNullSafe(F.col("own_label"))).alias("changed"),
    )


# --------------------------------------------------------------------------
# triangle counting / local clustering coefficient over the kNN graph
# --------------------------------------------------------------------------


def _tri_oracle() -> str:
    from .similarity import K_NN_GRAPH, _sql_bucket, _sql_dot

    # rank(x) = (degree, id): the degree-ordered orientation below must
    # be expressed identically in both engines
    return f"""
    WITH v AS (SELECT vec_id, embedding,
                      sqrt({_sql_dot('embedding', 'embedding')}) AS nrm,
                      {_sql_bucket('embedding')} AS bucket
               FROM embeddings WHERE embedding IS NOT NULL),
    p AS (SELECT a.vec_id AS node_id, b.vec_id AS neighbor_id,
                 row_number() OVER (
                   PARTITION BY a.vec_id
                   ORDER BY round({_sql_dot('a.embedding', 'b.embedding')}
                                  / (a.nrm * b.nrm), 6) DESC, b.vec_id) AS rnk
          FROM v a JOIN v b ON a.bucket = b.bucket AND a.vec_id != b.vec_id),
    -- MATERIALIZED: deg and o both read und; without the hint DuckDB
    -- re-inlines (and re-scores) the kNN pair CTE per reference
    und AS MATERIALIZED (
            SELECT DISTINCT least(node_id, neighbor_id) AS a,
                            greatest(node_id, neighbor_id) AS b
            FROM p WHERE rnk <= {K_NN_GRAPH}),
    deg AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS degree
            FROM (SELECT a AS node FROM und
                  UNION ALL SELECT b AS node FROM und)
            GROUP BY node),
    o AS (SELECT CASE WHEN da.degree < db.degree
                        OR (da.degree = db.degree AND u.a < u.b)
                      THEN u.a ELSE u.b END AS src,
                 CASE WHEN da.degree < db.degree
                        OR (da.degree = db.degree AND u.a < u.b)
                      THEN u.b ELSE u.a END AS dst
          FROM und u
          JOIN deg da ON da.node = u.a
          JOIN deg db ON db.node = u.b),
    wedge AS (SELECT o1.src AS s, o1.dst AS u, o2.dst AS w
              FROM o o1 JOIN o o2 ON o1.src = o2.src
              JOIN deg du ON du.node = o1.dst
              JOIN deg dw ON dw.node = o2.dst
              WHERE du.degree < dw.degree
                 OR (du.degree = dw.degree AND o1.dst < o2.dst)),
    tri AS (SELECT s, u, w FROM wedge
            JOIN o ON o.src = wedge.u AND o.dst = wedge.w),
    ntri AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS n_triangles
             FROM (SELECT s AS node FROM tri
                   UNION ALL SELECT u AS node FROM tri
                   UNION ALL SELECT w AS node FROM tri)
             GROUP BY node)
    SELECT d.node AS node_id, d.degree,
           COALESCE(n.n_triangles, 0) AS n_triangles,
           CASE WHEN d.degree >= 2
                THEN CAST(round(2000000.0 * COALESCE(n.n_triangles, 0)
                                / (d.degree * (d.degree - 1)), 0) AS BIGINT)
           END AS clustering_ppm
    FROM deg d LEFT JOIN ntri n ON n.node = d.node
    """


@register(
    "graph_triangle_count",
    oracle=_tri_oracle(),
    tags=("llm", "graph", "embedding"),
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count + local clustering coefficient over the kNN
    similarity graph — the graph-density audit curation stacks run on
    embedding neighborhoods: a node whose neighbors are also mutual
    neighbors (high coefficient) sits inside a tight semantic cluster
    (dedup/diversity candidate); a high-degree, low-coefficient node
    is a hub stitching unrelated regions (often boilerplate).

    Algorithm: degree-ordered orientation (Schank's forward /
    node-iterator++, the MapReduce formulation of Suri & Vassilvitskii
    2011): orient every undirected edge from its lower (degree, id)
    endpoint to the higher, enumerate wedges only at each triangle's
    minimum-rank vertex, and close them with one join against the
    oriented edge list. Every triangle is counted exactly once, and
    per-vertex wedge fan-out is bounded by out-degree, which the
    orientation caps at O(sqrt(E)) for ANY degree distribution — the
    hub that breaks naive wedge counting (a node in everyone's top-k
    has in-degree ~N) generates no wedges at all here because hubs
    rank highest and oriented edges point INTO them.

    Scale shape: undirected edges are kNN-bounded (<= N*k after the
    canonical distinct); the wedge join shuffles on the wedge center
    and the closing join on the (u, w) edge key — total work
    O(E^1.5) worst case, far below it on kNN graphs. The edge list is
    localCheckpoint'ed once for its four consumers (degree, both
    orientation sides, closing join); see the fault-tolerance note in
    dedup.py — at production scale this is the persisted edge table.

    Determinism: counts are exact BIGINTs; the coefficient is one
    round(2e6*t/(d*(d-1)), 0) per node (NULL when degree < 2 —
    undefined, not zero). Output covers every node with >= 1 edge."""
    from .similarity import K_NN_GRAPH, _knn_cell_edges, _norm, _spark_bucket

    emb = load_table(spark, sf_dir, "embeddings")
    v = emb.filter(F.col("embedding").isNotNull()).select(
        "vec_id",
        "embedding",
        _norm(F.col("embedding")).alias("nrm"),
        _spark_bucket(F.col("embedding")).alias("bucket"),
    )
    # file-backed barrier, not localCheckpoint (r13): the undirected
    # edge list is a corpus-scaling fixed-width int64 pair table with
    # FOUR consumers (degree, both orientation sides, closing join) —
    # back-to-back ×100 isolates measured the block-manager checkpoint
    # at 6.9/18.3 s on identical code (the adjudicated variance class)
    # where the parquet barrier is predictable sequential IO.
    # r14 (guide §2.4): the undirected dedup happens INSIDE the LSH
    # cell (_knn_cell_edges — an unordered pair exists in exactly one
    # cell), so the corpus-wide least/greatest Exchange + distinct that
    # used to sit between the gram and this barrier is gone: deduped
    # pairs flow straight from the Arrow kernel into the parquet write.
    und = materialize_parquet(_knn_cell_edges(v, K_NN_GRAPH))
    deg = (
        und.select(F.col("a").alias("node"))
        .unionByName(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").cast("bigint").alias("degree"))
    )
    da = deg.select(F.col("node").alias("a"), F.col("degree").alias("dega"))
    db = deg.select(F.col("node").alias("b"), F.col("degree").alias("degb"))
    a_first = (F.col("dega") < F.col("degb")) | (
        (F.col("dega") == F.col("degb")) & (F.col("a") < F.col("b"))
    )
    o = (
        und.join(da, "a")
        .join(db, "b")
        .select(
            F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("src"),
            F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("dst"),
        )
    )
    o1 = o.select(F.col("src").alias("s"), F.col("dst").alias("u"))
    o2 = o.select(F.col("src").alias("s"), F.col("dst").alias("w"))
    du = deg.select(F.col("node").alias("u"), F.col("degree").alias("degu"))
    dw = deg.select(F.col("node").alias("w"), F.col("degree").alias("degw"))
    u_first = (F.col("degu") < F.col("degw")) | (
        (F.col("degu") == F.col("degw")) & (F.col("u") < F.col("w"))
    )
    wedge = (
        o1.join(o2, "s")
        .join(du, "u")
        .join(dw, "w")
        .filter(u_first)
        .select("s", "u", "w")
    )
    tri = wedge.join(
        o.select(F.col("src").alias("u"), F.col("dst").alias("w")), ["u", "w"]
    )
    ntri = (
        tri.select(F.explode(F.array("s", "u", "w")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").cast("bigint").alias("n_triangles"))
    )
    d = F.col("degree")
    t = F.coalesce("n_triangles", F.lit(0).cast("bigint"))
    return deg.join(ntri, "node", "left").select(
        F.col("node").alias("node_id"),
        "degree",
        t.alias("n_triangles"),
        F.when(
            d >= 2,
            F.round(F.lit(2000000.0) * t / (d * (d - 1)), 0).cast("bigint"),
        ).alias("clustering_ppm"),
    )


# --------------------------------------------------------------------------
# simplified-silhouette audit of the fitted k-means model
# --------------------------------------------------------------------------


def _sil_oracle() -> str:
    # the kmeans chain c0 -> c1 -> c2, then score every point against
    # the FINAL centroids (c2): assignment-under-the-final-model
    return f"""
    WITH e AS (
      SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
      FROM embeddings),
    c0 AS (SELECT vec_id AS cid, v AS c FROM e WHERE vec_id < {KM_K}),
    {_SQL_ASSIGN.format(out="a1", cents="c0", d2=_SQL_D2.format(v="e.v", c="c0.c"))},
    {_SQL_MEANS.format(out="m1", assign="a1")},
    c1 AS (SELECT cid, list(cv ORDER BY dim) AS c FROM m1 GROUP BY cid),
    {_SQL_ASSIGN.format(out="a2", cents="c1", d2=_SQL_D2.format(v="e.v", c="c1.c"))},
    {_SQL_MEANS.format(out="m2", assign="a2")},
    c2 AS (SELECT cid, list(cv ORDER BY dim) AS c FROM m2 GROUP BY cid),
    rk AS (
      SELECT e.vec_id, c2.cid,
             {_SQL_D2.format(v="e.v", c="c2.c")} AS d2,
             row_number() OVER (
               PARTITION BY e.vec_id
               ORDER BY round({_SQL_D2.format(v="e.v", c="c2.c")}, 6), c2.cid
             ) AS rn
      FROM e CROSS JOIN c2),
    pp AS (
      SELECT vec_id,
             MAX(CASE WHEN rn = 1 THEN cid END) AS own_cid,
             MAX(CASE WHEN rn = 1 THEN d2 END) AS a2,
             MIN(CASE WHEN rn > 1 THEN d2 END) AS b2
      FROM rk GROUP BY vec_id),
    s AS (
      SELECT own_cid,
             CASE WHEN a2 IS NULL OR b2 IS NULL THEN NULL
                  WHEN greatest(sqrt(a2), sqrt(b2)) = 0 THEN CAST(0 AS BIGINT)
                  ELSE CAST(round(1000000.0 * (sqrt(b2) - sqrt(a2))
                                  / greatest(sqrt(a2), sqrt(b2)), 0) AS BIGINT)
             END AS s_micro
      FROM pp)
    SELECT own_cid AS cluster_id,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           CAST(COUNT(s_micro) AS BIGINT) AS n_scored,
           CASE WHEN COUNT(s_micro) > 0
                THEN CAST(round(1.0 * SUM(s_micro) / COUNT(s_micro), 0) AS BIGINT)
           END AS mean_sil_micro,
           MIN(s_micro) AS min_sil_micro,
           MAX(s_micro) AS max_sil_micro
    FROM s GROUP BY own_cid
    """


@register(
    "cluster_silhouette_audit",
    oracle=_sil_oracle(),
    tags=("llm", "clustering", "audit", "embedding", "iterative"),
)
def cluster_silhouette_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cluster simplified-silhouette audit of the fitted k-means
    model — the standard "are these clusters real?" check curation
    stacks run before trusting cluster-balanced sampling or
    SemDeDup-style per-cluster pruning. Simplified silhouette
    (Hruschka et al.): a(i) = distance to OWN centroid, b(i) = nearest
    OTHER centroid, s = (b - a) / max(a, b) — O(N*K) against centroids
    instead of the O(N^2) pairwise original, which is the only version
    that exists at 100 TB.

    Runs the same deterministic Lloyd loop as cluster_kmeans_embeddings
    (shared _km_* helpers, identical centroid doubles), then ONE more
    broadcast score pass against the final centroids: per point the
    K distances, a window rank, and a vec_id aggregate — no shuffle
    beyond kmeans' own plus one N*K-row window. Everything downstream
    of d2 is IEEE-only arithmetic (sqrt, +, /, no libm transcendentals)
    on engine-identical doubles, so one final round to integer
    micro-units is hash-safe; the per-cluster mean divides exact
    BIGINT sums. Degenerate points (NULL/ragged vectors poison d2 to
    NULL) stay counted in n_vecs — matching kmeans' n_vecs convention —
    but are excluded from n_scored and the mean; a point equal to both
    nearest centroids scores 0 by convention."""
    e, cents = _km_inputs(spark, sf_dir)
    for _ in range(KM_ITERS):
        cents = _km_regroup(_km_means(_km_assign(e, cents)))
    # per-row ranked centroids (r13: was the N×K crossJoin + window +
    # a vec_id groupBy — map-side now; a2/b2 read the UNROUNDED d2 of
    # rank 1 / min of ranks >1, exactly the old rn-keyed aggregate;
    # array_min skips NULL elements like the old MIN aggregate, and an
    # empty rest-slice (K = 1) yields NULL like the empty rn > 1 group)
    rk = _km_ranked(e, cents, keep_raw=True)
    pp = rk.select(
        "vec_id",
        F.get("_rc", 0).getField("cid").alias("own_cid"),
        F.get("_rc", 0).getField("draw").alias("a2"),
        F.array_min(
            F.transform(
                F.slice("_rc", F.lit(2), F.greatest(F.size("_rc") - 1, F.lit(0))),
                lambda s: s.getField("draw"),
            )
        ).alias("b2"),
    )
    sa, sb = F.sqrt("a2"), F.sqrt("b2")
    s_micro = (
        F.when(F.col("a2").isNull() | F.col("b2").isNull(), F.lit(None))
        .when(F.greatest(sa, sb) == 0, F.lit(0))
        .otherwise(F.round(F.lit(1000000.0) * (sb - sa) / F.greatest(sa, sb), 0))
        .cast("bigint")
    )
    s = pp.select("own_cid", s_micro.alias("s_micro"))
    cnt = F.count("s_micro")
    return s.groupBy(F.col("own_cid").alias("cluster_id")).agg(
        F.count("*").cast("bigint").alias("n_vecs"),
        cnt.cast("bigint").alias("n_scored"),
        F.when(cnt > 0, F.round(F.lit(1.0) * F.sum("s_micro") / cnt, 0))
        .cast("bigint")
        .alias("mean_sil_micro"),
        F.min("s_micro").alias("min_sil_micro"),
        F.max("s_micro").alias("max_sil_micro"),
    )


# --------------------------------------------------------------------------
# k-core decomposition over the kNN graph (bounded peeling)
# --------------------------------------------------------------------------

KCORE_K = 2  # minimum within-subgraph degree to survive
KCORE_ROUNDS = 8  # peeling rounds (unrolled in the oracle)


def _kcore_oracle() -> str:
    from .similarity import K_NN_GRAPH, _sql_bucket, _sql_dot

    # MUTUAL-kNN edges: the plain undirected kNN graph gives every node
    # degree >= k by construction (its own k picks), so any core with
    # K <= k keeps everything and K > k dissolves everything — only the
    # mutual graph (both endpoints picked each other) has the degree
    # variance that makes peeling meaningful
    sql = f"""
    WITH v AS (SELECT vec_id, embedding,
                      sqrt({_sql_dot('embedding', 'embedding')}) AS nrm,
                      {_sql_bucket('embedding')} AS bucket
               FROM embeddings WHERE embedding IS NOT NULL),
    -- MATERIALIZED on p: the mutuality test self-joins p, and inlining
    -- re-scores the full within-bucket kNN gram per reference
    p AS MATERIALIZED (
          SELECT a.vec_id AS node_id, b.vec_id AS neighbor_id,
                 row_number() OVER (
                   PARTITION BY a.vec_id
                   ORDER BY round({_sql_dot('a.embedding', 'b.embedding')}
                                  / (a.nrm * b.nrm), 6) DESC, b.vec_id) AS rnk
          FROM v a JOIN v b ON a.bucket = b.bucket AND a.vec_id != b.vec_id),
    und AS MATERIALIZED (
            SELECT p1.node_id AS a, p1.neighbor_id AS b
            FROM p p1 JOIN p p2 ON p2.node_id = p1.neighbor_id
                              AND p2.neighbor_id = p1.node_id
            WHERE p1.rnk <= {K_NN_GRAPH} AND p2.rnk <= {K_NN_GRAPH}
              AND p1.node_id < p1.neighbor_id),
    s0 AS MATERIALIZED (
            SELECT a AS node FROM und UNION SELECT b AS node FROM und)"""
    prev = "s0"
    # every s{r} is referenced TWICE by round r+1 (the x and y joins):
    # without MATERIALIZED, DuckDB re-inlines the whole peeling chain
    # per reference — 2^rounds blowup, minutes at 500 rows (measured)
    for r in range(1, KCORE_ROUNDS + 1):
        sql += f""",
    d{r} AS MATERIALIZED (
             SELECT node, CAST(COUNT(*) AS BIGINT) AS deg
             FROM (SELECT u.a AS node FROM und u
                   JOIN {prev} x ON x.node = u.a JOIN {prev} y ON y.node = u.b
                   UNION ALL
                   SELECT u.b AS node FROM und u
                   JOIN {prev} x ON x.node = u.a JOIN {prev} y ON y.node = u.b)
             GROUP BY node),
    s{r} AS MATERIALIZED (SELECT node FROM d{r} WHERE deg >= {KCORE_K})"""
        prev = f"s{r}"
    sql += f""",
    dfin AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS deg
             FROM (SELECT u.a AS node FROM und u
                   JOIN {prev} x ON x.node = u.a JOIN {prev} y ON y.node = u.b
                   UNION ALL
                   SELECT u.b AS node FROM und u
                   JOIN {prev} x ON x.node = u.a JOIN {prev} y ON y.node = u.b)
             GROUP BY node),
    conv AS (SELECT COALESCE(MIN(deg) >= {KCORE_K}, TRUE) AS converged FROM dfin)
    SELECT d.node AS node_id, d.deg AS core_degree, conv.converged
    FROM dfin d CROSS JOIN conv"""
    return sql


@register(
    "graph_kcore",
    oracle=_kcore_oracle(),
    tags=("llm", "graph", "embedding", "iterative"),
)
def graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core extraction over the MUTUAL-kNN similarity graph —
    iterative peeling: repeatedly delete nodes whose degree WITHIN the
    surviving subgraph falls below K. The surviving core is the
    standard dense-region extractor curation stacks use to find tight
    semantic clusters (aggressive-dedup candidates) and, inverted, to
    find the sparse periphery (diversity-preserving keep set).

    The graph is the MUTUAL kNN graph (keep an edge only when both
    endpoints rank each other in their top-k): the plain undirected
    kNN graph gives every node degree >= k by construction, making
    every core trivial (see the oracle comment); mutuality is also the
    standard density filter in kNN-graph clustering precisely because
    it breaks that floor.

    Semantics: exactly KCORE_ROUNDS peeling rounds (the oracle unrolls
    the same count), then a final degree pass whose min also yields a
    `converged` flag — TRUE means the fixpoint was reached and the
    output IS the true k-core; FALSE tells the caller to raise the
    round count (the honest-convergence discipline of
    connected_components, as a flag rather than an exception, because
    a partial peel is still a valid upper bound on the core).

    Scale shape: the edge list is kNN-bounded (<= N*k) and
    localCheckpoint'ed once; each round is two hash joins against the
    shrinking survivor set plus one degree aggregate — all shuffles on
    node id, survivor sets only ever shrink. Peeling converges in
    O(max peel depth) rounds, which on kNN graphs (bounded degree) is
    small; production runs checkpoint every few rounds (see the
    fault-tolerance note in dedup.py)."""
    from .similarity import K_NN_GRAPH, _knn_cell_edges, _norm, _spark_bucket

    emb = load_table(spark, sf_dir, "embeddings")
    v = emb.filter(F.col("embedding").isNotNull()).select(
        "vec_id",
        "embedding",
        _norm(F.col("embedding")).alias("nrm"),
        _spark_bucket(F.col("embedding")).alias("bucket"),
    )
    # r14 (guide §2.4): mutuality is a cell-local fact (both directions
    # of a reciprocal edge live in the one cell both endpoints hash
    # to), so _knn_cell_edges(mutual=True) replaces the reversed-key
    # self-join of the N*k edge list — the canonical (src < dst) mutual
    # pairs flow straight from the Arrow gram into the checkpoint
    und = (
        _knn_cell_edges(v, K_NN_GRAPH, mutual=True)
        .select(F.col("src").alias("a"), F.col("dst").alias("b"))
        .localCheckpoint(eager=True)
    )
    surv = (
        und.select(F.col("a").alias("node"))
        .unionByName(und.select(F.col("b").alias("node")))
        .distinct()
    )

    def degrees(surviving: DataFrame) -> DataFrame:
        sa = surviving.select(F.col("node").alias("a"))
        sb = surviving.select(F.col("node").alias("b"))
        kept = und.join(sa, "a").join(sb, "b")
        return (
            kept.select(F.col("a").alias("node"))
            .unionByName(kept.select(F.col("b").alias("node")))
            .groupBy("node")
            .agg(F.count("*").cast("bigint").alias("deg"))
        )

    # EXACT early exit (r10, VERDICT r9 item 5): peeling is monotone —
    # a block of rounds that deletes nothing is a fixpoint, and every
    # remaining unrolled round returns the identical set, so stopping
    # is bit-identical to the oracle's full unroll while skipping the
    # dead rounds' jobs. Rounds run in blocks of 2 between
    # checkpoint+count barriers: the per-round eager materialization
    # was the dominant sf0.1 cost (up to 17 sequential driver jobs for
    # an 8-round peel), a 2-round lineage (4 joins + 2 aggregates) is
    # still shallow, and the block count halves the job count. The
    # count compares across the whole block — equal means neither
    # round deleted (monotonicity), i.e. fixpoint.
    n_prev = surv.count()
    r = 0
    while r < KCORE_ROUNDS:
        step = min(2, KCORE_ROUNDS - r)
        for _ in range(step):
            surv = degrees(surv).filter(F.col("deg") >= KCORE_K).select("node")
        # truncate the block's lineage: each block otherwise re-executes
        # every earlier block's joins twice (a/b sides)
        surv = surv.localCheckpoint(eager=True)
        r += step
        n_new = surv.count()
        if n_new == n_prev:
            break
        n_prev = n_new
    dfin = degrees(surv)
    conv = dfin.agg(
        F.coalesce(F.min("deg") >= KCORE_K, F.lit(True)).alias("converged")
    )
    return dfin.crossJoin(F.broadcast(conv)).select(
        F.col("node").alias("node_id"), F.col("deg").alias("core_degree"), "converged"
    )


# --------------------------------------------------------------------------
# link prediction over the kNN graph (resource-allocation index)
# --------------------------------------------------------------------------


# Hub cap for the RA distance-2 expansion: only common neighbors z with
# deg(z) <= cap relay candidate pairs. RA weights a relay by 1/deg(z),
# so super-hubs contribute ~nothing by design — but they dominate the
# expansion COST (sum over z of deg(z)^2). The cap bounds candidates at
# cap * |edges| — linear in the graph — at the documented recall cost
# that a pair whose ONLY common neighbors are super-hubs (RA contribution
# <= n/cap per million) never surfaces. r10 stress measured the uncapped
# expansion superlinear (x10->x100 ratio 10.8x, 32.7 s) on the replicated
# corpus, where identical-copy ties concentrate in-degree on the
# lowest-id replicas.
RA_DEG_CAP = int(os.environ.get("SHSS_RA_DEG_CAP", "64"))


def _link_pred_oracle() -> str:
    from .similarity import K_NN_GRAPH, _sql_bucket, _sql_dot

    dot_vv = _sql_dot("embedding", "embedding")
    dot_ab = _sql_dot("a.embedding", "b.embedding")
    return f"""
    WITH v AS (SELECT vec_id, embedding,
                      sqrt({dot_vv}) AS nrm,
                      {_sql_bucket('embedding')} AS bucket
               FROM embeddings WHERE embedding IS NOT NULL),
    p AS (SELECT a.vec_id AS src, b.vec_id AS dst,
                 row_number() OVER (PARTITION BY a.vec_id
                                    ORDER BY round({dot_ab} / (a.nrm * b.nrm), 6)
                                             DESC, b.vec_id) AS rnk
          FROM v a JOIN v b ON a.bucket = b.bucket AND a.vec_id != b.vec_id),
    edges AS (SELECT src, dst FROM p WHERE rnk <= {K_NN_GRAPH}),
    und AS (SELECT src, dst FROM edges UNION SELECT dst, src FROM edges),
    deg AS (SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS deg
            FROM und GROUP BY src),
    -- hub cap (see the Python docstring): only z with deg <= cap relay
    degok AS (SELECT node, deg FROM deg WHERE deg <= {RA_DEG_CAP}),
    cand AS (
      SELECT a.src AS u, b.dst AS w, a.dst AS z, dz.deg AS zdeg
      FROM und a
      JOIN degok dz ON dz.node = a.dst
      JOIN und b ON a.dst = b.src AND a.src < b.dst),
    miss AS (
      SELECT c.u, c.w, c.z, c.zdeg FROM cand c
      LEFT JOIN und e ON e.src = c.u AND e.dst = c.w
      WHERE e.src IS NULL),
    sc AS (
      SELECT u, w,
             CAST(COUNT(*) AS BIGINT) AS n_common,
             CAST(SUM(CAST(round(1000000.0 / zdeg, 0) AS BIGINT)) AS BIGINT)
               AS ra_micro
      FROM miss GROUP BY u, w)
    SELECT u AS src, w AS dst, n_common, ra_micro, rnk FROM (
      SELECT u, w, n_common, ra_micro,
             row_number() OVER (ORDER BY ra_micro DESC, u, w) AS rnk
      FROM sc)
    WHERE rnk <= 25
    """


@register(
    "graph_link_prediction_ra",
    oracle=_link_pred_oracle(),
    tags=("llm", "graph", "embedding"),
)
def graph_link_prediction_ra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link prediction on the kNN similarity graph by the
    resource-allocation index: for every non-adjacent pair at
    distance 2, RA = sum over common neighbors z of 1/deg(z) — the
    strongest of the classic local link predictors (Zhou, Lu &
    Zhang 2009) — reported as the top-25 predicted links. On a
    document/embedding graph these are the retrieval edges a kNN
    index at slightly higher k would surface first: a cheap recall
    probe without rebuilding the index.

    Exactness: degrees are exact counts over the deduped undirected
    edge set; each 1/deg contribution rounds once to integer
    micro-units and sums exactly (identical cross-engine); the final
    top-25 carries a total-order (score DESC, src, dst) tie-break.

    Scale: edges are kNN-bounded (N*k) and cell-local by
    construction; the distance-2 expansion joins the undirected edge
    list with itself on the shared endpoint, with the relay node
    degree-capped (deg(z) <= SHSS_RA_DEG_CAP, see RA_DEG_CAP above) —
    candidate rows are bounded by cap * |edges|, linear in the graph,
    where the uncapped expansion is sum(deg^2) and measured
    superlinear under replica-concentrated in-degree (r10 stress:
    10.8x on the x10->x100 step). n_common likewise counts capped
    relays — identical in the oracle. The anti-join against existing
    edges is an equi-join on node ids; the top-25 compiles to
    TakeOrdered."""
    from pyspark.sql import Window

    from .similarity import K_NN_GRAPH, _knn_cell_edges, _norm, _spark_bucket

    emb = load_table(spark, sf_dir, "embeddings")
    v = emb.filter(F.col("embedding").isNotNull()).select(
        "vec_id",
        "embedding",
        _norm(F.col("embedding")).alias("nrm"),
        _spark_bucket(F.col("embedding")).alias("bucket"),
    )
    # undirected, deduped; materialized once — it feeds the degree
    # table, both sides of the distance-2 expansion, and the anti-join.
    # File-backed barrier (r13): corpus-scaling int64 pair table with
    # FOUR consumers — the localCheckpoint form measured 6.2/6.3/18.9 s
    # across ×100 isolates (the adjudicated block-manager variance
    # class); parquet is the predictable barrier for this shape.
    # r14 (guide §2.4 + §6): the undirected dedup is cell-local
    # (_knn_cell_edges — an unordered pair lives in exactly one LSH
    # cell), so the union+distinct Exchange ahead of the barrier is
    # gone and the barrier stores each edge ONCE (half the write);
    # both directions are re-derived from the read-back scan below.
    pairs = materialize_parquet(_knn_cell_edges(v, K_NN_GRAPH))
    und = pairs.select(
        F.col("a").alias("src"), F.col("b").alias("dst")
    ).unionByName(pairs.select(F.col("b").alias("src"), F.col("a").alias("dst")))
    deg = und.groupBy(F.col("src").alias("node")).agg(
        F.count("*").cast("bigint").alias("deg")
    )
    # hub cap BEFORE the expansion, so the quadratic term never
    # materializes (see RA_DEG_CAP above)
    deg_ok = deg.filter(F.col("deg") <= RA_DEG_CAP)
    a = (
        und.join(deg_ok, F.col("dst") == F.col("node"))
        .select(F.col("src").alias("u"), F.col("dst").alias("z"), "deg")
    )
    b = und.select(F.col("src").alias("z2"), F.col("dst").alias("w"))
    cand = a.join(b, (F.col("z") == F.col("z2")) & (F.col("u") < F.col("w"))).select(
        "u", "w", "z", "deg"
    )
    miss = cand.join(
        und,
        (F.col("u") == F.col("src")) & (F.col("w") == F.col("dst")),
        "left_anti",
    )
    sc = miss.groupBy("u", "w").agg(
        F.count("*").cast("bigint").alias("n_common"),
        F.sum(
            F.round(F.lit(1_000_000.0) / F.col("deg"), 0).cast("bigint")
        )
        .cast("bigint")
        .alias("ra_micro"),
    )
    top = sc.orderBy(F.col("ra_micro").desc(), "u", "w").limit(25)
    w_rnk = Window.orderBy(F.col("ra_micro").desc(), "u", "w")
    return top.select(
        F.col("u").alias("src"),
        F.col("w").alias("dst"),
        "n_common",
        "ra_micro",
        F.row_number().over(w_rnk).alias("rnk"),
    )
