"""Corpus/embedding monitoring operators — the drift-and-diversity
dashboards a long-running ingestion pipeline watches.

Registered LAST (see ``registry._load_all``): these land after the
sources family in never-judged emission order, so queries that have
waited longer for a driver verdict keep their budget slots.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from ..io import load_table, materialize_parquet, parallelize_scan
from ..registry import register


@register(
    "corpus_ngram_novelty",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(trim(text), ' ') AS toks
               FROM documents),
    sh AS (SELECT doc_id,
                  unnest(list_transform(
                      list_distinct(list_transform(
                          generate_series(1, len(toks)-2),
                          i -> array_to_string(toks[i:i+2], ' '))),
                      s -> CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT)))
                    AS dg
           FROM t),
    totals AS (SELECT doc_id, COUNT(*) AS n_shingles FROM sh GROUP BY doc_id),
    firsts AS (SELECT dg, MIN(doc_id) AS first_doc FROM sh GROUP BY dg),
    novel AS (SELECT first_doc AS doc_id, COUNT(*) AS n_novel
              FROM firsts GROUP BY first_doc)
    SELECT t.doc_id, t.n_shingles,
           COALESCE(n.n_novel, 0) AS n_novel,
           COALESCE(n.n_novel, 0) * 1000000 // t.n_shingles AS novelty_ppm
    FROM totals t LEFT JOIN novel n USING (doc_id)
    """,
    tags=("llm", "curation", "monitoring"),
)
def corpus_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document novelty curve: how many of a document's distinct
    3-gram shingles appear for the FIRST time (no earlier doc_id has
    them) — the diversity-over-ingestion-order metric that shows when
    a crawl stops adding fresh content and starts re-collecting what
    the corpus already has.

    Scale: the scan+shingle+md5 pipeline runs ONCE into a checkpointed
    (doc_id, digest-array) table; per-doc totals are the map-side
    ARRAY LENGTH of that column (no shuffle, no second pipeline run —
    the totals groupBy over the exploded stream re-ran the whole md5
    pipeline: 19.7 s -> 9.6 s warm at the x100 stress point); MIN(doc_id)
    per digest is one map-combined shuffle on the (uniform) digest;
    the novel-count rollup aggregates the much smaller
    first-occurrence set; totals join novel on doc_id. All-integer
    output (ppm by integer division)."""
    d = parallelize_scan(load_table(spark, sf_dir, "documents"))
    from .dedup import _shingles

    # feeds totals AND the digest explode; r13: file-backed barrier —
    # corpus-sized digest-array relation, the block-manager variance
    # class (BASELINE.md r13 barrier A/B). The array SIZE is computed
    # once BEFORE the barrier so the totals branch's parquet read
    # prunes to (doc_id, ns) and never deserializes the digest arrays
    # at all (r13b).
    t = materialize_parquet(
        d.select(
            "doc_id",
            F.transform(
                _shingles(F.col("text")),
                lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("bigint"),
            ).alias("dga"),
        ).withColumn("ns", F.size("dga"))
    )
    # rows = count of DISTINCT SHINGLES (the array is post-distinct),
    # exactly what the oracle's per-doc COUNT over the unnest counts
    totals = t.filter(F.col("ns") > 0).select(
        "doc_id", F.col("ns").cast("bigint").alias("n_shingles")
    )
    sh = t.select("doc_id", F.explode("dga").alias("dg"))
    firsts = sh.groupBy("dg").agg(F.min("doc_id").alias("first_doc"))
    novel = firsts.groupBy(F.col("first_doc").alias("doc_id")).agg(
        F.count("*").alias("n_novel")
    )
    return (
        totals.join(novel, "doc_id", "left")
        .select(
            "doc_id",
            "n_shingles",
            F.coalesce("n_novel", F.lit(0)).alias("n_novel"),
            F.expr(
                "CAST(coalesce(n_novel, 0) * 1000000 div n_shingles AS BIGINT)"
            ).alias("novelty_ppm"),
        )
    )


@register(
    "embed_centroid_drift",
    oracle="""
    WITH dims AS (
      SELECT label, snap, i AS dim,
             CAST(round(val::DOUBLE, 6) AS DECIMAL(12,6)) AS v
      FROM (SELECT label, vec_id % 2 AS snap,
                   unnest(generate_series(1, len(embedding))) AS i,
                   unnest(embedding) AS val
            FROM embeddings)),
    cents AS (
      SELECT label, dim,
             CAST(SUM(CASE WHEN snap = 0 THEN v END) AS DOUBLE)
               / COUNT(CASE WHEN snap = 0 THEN 1 END) AS ca,
             CAST(SUM(CASE WHEN snap = 1 THEN v END) AS DOUBLE)
               / COUNT(CASE WHEN snap = 1 THEN 1 END) AS cb,
             COUNT(CASE WHEN snap = 0 THEN 1 END) AS na,
             COUNT(CASE WHEN snap = 1 THEN 1 END) AS nb
      FROM dims GROUP BY label, dim),
    folded AS (
      SELECT label, MIN(na) AS n_a, MIN(nb) AS n_b,
             list_reduce(
               list_prepend(0.0e0,
                 list((ca - cb) * (ca - cb) ORDER BY dim)),
               (acc, x) -> acc + x) AS ssq
      FROM cents GROUP BY label)
    SELECT label, n_a, n_b, round(sqrt(ssq), 6) AS centroid_l2_drift
    FROM folded
    """,
    tags=("llm", "embedding", "monitoring"),
)
def embed_centroid_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-distribution drift monitor: split the corpus into two
    pseudo-snapshots (vec_id parity stands in for yesterday/today),
    compute each label's centroid in both, and report the L2 distance
    between them — the cheap early-warning that an embedding model or
    upstream content mix changed.

    Exactness: centroids are exact decimal means (the embed_avg_pool
    rule: round components to 6 dp, sum as DECIMAL — order-independent
    — divide once in double); the squared-difference sum folds in dim
    order, so both engines run the identical IEEE sequence. Scale: the
    two snapshots pivot inside ONE aggregate (conditional sums), so
    the corpus scans once and shuffles once on (label, dim) — a
    filter-per-snapshot branch pair would push the snapshot predicate
    below the aggregate and scan the corpus twice; K·D-sized
    everything after."""
    emb = load_table(spark, sf_dir, "embeddings")
    dims = emb.select(
        "label",
        (F.col("vec_id") % 2).alias("snap"),
        F.posexplode("embedding").alias("pos", "val"),
    ).select(
        "label",
        "snap",
        (F.col("pos") + 1).alias("dim"),
        F.round(F.col("val").cast("double"), 6).cast("decimal(12,6)").alias("v"),
    )
    va = F.when(F.col("snap") == 0, F.col("v"))
    vb = F.when(F.col("snap") == 1, F.col("v"))
    paired = dims.groupBy("label", "dim").agg(
        (F.sum(va).cast("double") / F.count(va)).alias("ca"),
        (F.sum(vb).cast("double") / F.count(vb)).alias("cb"),
        F.count(va).alias("na"),
        F.count(vb).alias("nb"),
    )
    ordered_sq = F.transform(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col("dim").alias("d"),
                    ((F.col("ca") - F.col("cb")) * (F.col("ca") - F.col("cb"))).alias(
                        "sq"
                    ),
                )
            )
        ),
        lambda s: s.getField("sq"),
    )
    return (
        paired.groupBy("label")
        .agg(
            F.min("na").alias("n_a"),
            F.min("nb").alias("n_b"),
            F.aggregate(ordered_sq, F.lit(0.0), lambda acc, x: acc + x).alias("ssq"),
        )
        .select(
            "label",
            "n_a",
            "n_b",
            F.round(F.sqrt("ssq"), 6).alias("centroid_l2_drift"),
        )
    )


_SQL_PROBE = (
    "(list_reduce(list_transform(embedding, x -> x::DOUBLE), (a, b) -> a + b)"
    " / sqrt(len(embedding)::DOUBLE))"
)


@register(
    "embed_text_consistency_corr",
    oracle=f"""
    WITH j AS (
      SELECT d.source, CAST(d.n_chars AS DECIMAL(18,0)) AS x,
             CAST(round({_SQL_PROBE}, 4) AS DECIMAL(18,4)) AS y
      FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id),
    m AS (
      SELECT source, COUNT(*) AS n,
             CAST(SUM(x) AS DOUBLE) AS sx,
             CAST(SUM(x * x) AS DOUBLE) AS sxx,
             CAST(SUM(y) AS DOUBLE) AS sy,
             CAST(round(SUM(y * y), 4) AS DOUBLE) AS syy,
             CAST(SUM(x * y) AS DOUBLE) AS sxy
      FROM j GROUP BY source)
    -- degenerate sources (constant length or constant probe) have zero
    -- variance: correlation/slope undefined -> NULL in BOTH engines
    -- (same class the NULL fuzzer caught on events_autocorr_lag1)
    SELECT source, n,
           CASE WHEN (sxx - sx*sx/n) > 0 AND (syy - sy*sy/n) > 0
                THEN round(((sxy - sx*sy/n)/n)
                           / (sqrt((sxx - sx*sx/n)/n)
                              * sqrt((syy - sy*sy/n)/n)), 6)
           END AS corr_chars_probe,
           CASE WHEN (sxx - sx*sx/n) > 0
                THEN round((sxy - sx*sy/n) / (sxx - sx*sx/n), 6)
           END AS beta_probe_per_char
    FROM m
    """,
    tags=("llm", "monitoring", "embedding", "stats"),
)
def embed_text_consistency_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-modality consistency audit: join the text table to its
    embedding table (doc_id = vec_id) and report, per source, the
    Pearson correlation and regression slope between document length
    and the embedding's projection onto a fixed probe direction
    (all-ones/sqrt(D) — the norms themselves carry no signal on a
    unit-normalized corpus, a projection does). A source whose
    correlation suddenly departs from the corpus band is the classic
    symptom of an embedding-job version skew or a text/vector
    misalignment upstream — caught here before it poisons similarity
    search.

    Determinism: the agg_stats recipe — exact decimal moment sums
    (projections quantized to 4 dp first; the scale-8 square sum
    rounds back to 4 dp before its double cast so the unscaled value
    stays under 2^53), then one shared IEEE formula.

    Scale: the doc->vec join is key-to-key on the primary id (bucketed
    tables co-locate it for free); the moment aggregate is map-side
    combinable per source. One scan of each table, no Python."""
    d = load_table(spark, sf_dir, "documents")
    e = load_table(spark, sf_dir, "embeddings")
    probe = F.aggregate(
        F.transform("embedding", lambda v: v.cast("double")),
        F.lit(0.0),
        lambda a, b: a + b,
    ) / F.sqrt(F.size("embedding").cast("double"))
    j = d.join(e, d.doc_id == e.vec_id).select(
        "source",
        F.col("n_chars").cast("decimal(18,0)").alias("x"),
        F.round(probe, 4).cast("decimal(18,4)").alias("y"),
    )
    m = j.groupBy("source").agg(
        F.count("*").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
        F.sum("y").cast("double").alias("sy"),
        F.round(F.sum(F.col("y") * F.col("y")), 4).cast("double").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
    )
    n, sx, sxx, sy, syy, sxy = (
        F.col(c) for c in ["n", "sx", "sxx", "sy", "syy", "sxy"]
    )
    return m.select(
        "source",
        "n",
        # zero-variance guards mirror the oracle (undefined -> NULL)
        F.when(
            ((sxx - sx * sx / n) > 0) & ((syy - sy * sy / n) > 0),
            F.round(
                ((sxy - sx * sy / n) / n)
                / (
                    F.sqrt((sxx - sx * sx / n) / n)
                    * F.sqrt((syy - sy * sy / n) / n)
                ),
                6,
            ),
        ).alias("corr_chars_probe"),
        F.when(
            (sxx - sx * sx / n) > 0,
            F.round((sxy - sx * sy / n) / (sxx - sx * sx / n), 6),
        ).alias("beta_probe_per_char"),
    )


@register(
    "embed_label_purity",
    oracle="""
    WITH c AS (
      SELECT d.source, e.label, CAST(COUNT(*) AS BIGINT) AS n
      FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id
      GROUP BY d.source, e.label),
    t AS (SELECT source, CAST(SUM(n) AS BIGINT) AS n_src,
                 CAST(MAX(n) AS BIGINT) AS n_top,
                 CAST(COUNT(*) AS BIGINT) AS n_labels
          FROM c GROUP BY source)
    SELECT source, n_src, n_labels,
           CAST(round(n_top * 1000000.0 / n_src, 0) AS BIGINT) AS purity_ppm,
           CAST((SELECT MIN(label) FROM c
                 WHERE c.source = t.source AND c.n = t.n_top) AS INT)
             AS majority_label
    FROM t
    """,
    tags=("llm", "monitoring", "embedding"),
)
def embed_label_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-label purity per source: join documents to their
    embedding labels (the cluster/topic assignment an embedding
    pipeline emits) and report each source's majority label and its
    share — the topical-concentration monitor. A source at high purity
    is single-topic (fine for a curated source, alarming for a crawl);
    purity jumps between snapshots flag an upstream labeler change.

    Determinism: counts are exact; the majority label ties to the
    MINIMUM label id (both engines state it identically).

    Scale: one key-to-key join (bucket-co-locatable) + a (source x
    label) aggregate; the purity rollup is |sources|-sized."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    e = load_table(spark, sf_dir, "embeddings")
    c = (
        d.join(e, d.doc_id == e.vec_id)
        .groupBy("source", "label")
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    w = Window.partitionBy("source").orderBy(F.col("n").desc(), "label")
    top = c.withColumn("rn", F.row_number().over(w))
    agg = top.groupBy("source").agg(
        F.sum("n").cast("bigint").alias("n_src"),
        F.count("*").cast("bigint").alias("n_labels"),
        F.max(F.when(F.col("rn") == 1, F.col("n"))).cast("bigint").alias("n_top"),
        F.max(F.when(F.col("rn") == 1, F.col("label"))).cast("int").alias(
            "majority_label"
        ),
    )
    return agg.select(
        "source", "n_src", "n_labels",
        F.round(F.col("n_top") * 1000000.0 / F.col("n_src"), 0)
        .cast("bigint")
        .alias("purity_ppm"),
        "majority_label",
    )
