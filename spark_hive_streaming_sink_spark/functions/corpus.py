"""Corpus-management operators for LLM-data pipelines (SURVEY.md §2C
extension, round-2 additions): dataset snapshot diffing, sequence
packing (concat-and-chunk), train/eval contamination detection,
policy-driven duplicate selection, and substring-window dedup.

These are the ops a training-data pipeline runs *between* raw crawl
and tokenized shards: what changed since the last snapshot, how do
documents pack into fixed token budgets, does the training corpus leak
the eval set, which copy of a duplicate do we keep, and which byte
ranges are shared boilerplate.

100 TB posture: every op is scan → map-side array/hash work → one
hash-keyed shuffle (join or groupBy on a uniform digest). No all-pairs
comparison, no driver-side collection, no Python in any hot path.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
import pyspark.sql.functions as F
from pyspark.sql.window import Window

from ..io import load_table, materialize_parquet
from ..registry import register

# --------------------------------------------------------------------------
# dataset snapshot diff
# --------------------------------------------------------------------------

# Two deterministic pseudo-snapshots derived from orders: snapshot A is
# "yesterday" (keys ≡ 3 mod 10 not yet ingested), snapshot B is "today"
# (keys ≡ 7 mod 10 purged, every key ≡ 0 mod 5 repriced +1.50).
_SNAP_FP_SQL = "md5(concat_ws('|', o_orderstatus, CAST({cents} AS VARCHAR), CAST(o_orderdate AS VARCHAR)))"


@register(
    "dataset_snapshot_diff",
    oracle=f"""
    WITH a AS (
      SELECT o_orderkey,
             {_SNAP_FP_SQL.format(cents="CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)")} AS fp
      FROM orders WHERE o_orderkey % 10 != 3),
    b AS (
      SELECT o_orderkey,
             {_SNAP_FP_SQL.format(cents="CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) + CASE WHEN o_orderkey % 5 = 0 THEN 150 ELSE 0 END")} AS fp
      FROM orders WHERE o_orderkey % 10 != 7),
    d AS (
      SELECT COALESCE(a.o_orderkey, b.o_orderkey) AS k,
             CASE WHEN a.o_orderkey IS NULL THEN 'added'
                  WHEN b.o_orderkey IS NULL THEN 'removed'
                  WHEN a.fp != b.fp THEN 'changed'
                  ELSE 'unchanged' END AS change_type
      FROM a FULL OUTER JOIN b ON a.o_orderkey = b.o_orderkey)
    SELECT change_type, COUNT(*) AS n, MIN(k) AS min_key, MAX(k) AS max_key
    FROM d GROUP BY change_type
    """,
    tags=("llm", "curation", "diff"),
)
def dataset_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff — the incremental-ingest audit: full outer join of
    two table versions on the primary key, rows classified by comparing
    md5 row fingerprints (added / removed / changed / unchanged).

    At 100 TB this is the canonical reconciliation shape: one
    co-partitioned join on the key (bucketed snapshots make it
    shuffle-free), fingerprints computed map-side, counts map-combined.
    Price goes through exact integer cents before fingerprinting so the
    digest is bit-identical cross-engine."""
    o = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("bigint")

    def fp(cents_col: Column) -> Column:
        return F.md5(
            F.concat_ws(
                "|",
                F.col("o_orderstatus"),
                cents_col.cast("string"),
                F.col("o_orderdate").cast("string"),
            )
        )

    a = o.filter(F.col("o_orderkey") % 10 != 3).select(
        "o_orderkey", fp(cents).alias("fp_a")
    )
    b = o.filter(F.col("o_orderkey") % 10 != 7).select(
        "o_orderkey",
        fp(
            cents
            + F.when(F.col("o_orderkey") % 5 == 0, F.lit(150)).otherwise(F.lit(0))
        ).alias("fp_b"),
    )
    d = a.join(b, "o_orderkey", "full_outer").select(
        F.col("o_orderkey").alias("k"),
        F.when(F.col("fp_a").isNull(), F.lit("added"))
        .when(F.col("fp_b").isNull(), F.lit("removed"))
        .when(F.col("fp_a") != F.col("fp_b"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
        .alias("change_type"),
    )
    return d.groupBy("change_type").agg(
        F.count("*").alias("n"),
        F.min("k").alias("min_key"),
        F.max("k").alias("max_key"),
    )


# --------------------------------------------------------------------------
# sequence packing (concat-and-chunk)
# --------------------------------------------------------------------------

PACK_BUDGET = 2048  # tokens per training sequence


@register(
    "pack_sequences_chunk",
    oracle=f"""
    WITH t AS (
      SELECT lang, doc_id,
             CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n_tok
      FROM documents),
    c AS (
      SELECT lang, doc_id, n_tok,
             COALESCE(SUM(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_prev
      FROM t),
    p AS (
      SELECT lang, doc_id, n_tok,
             CAST(cum_prev // {PACK_BUDGET} AS BIGINT) AS chunk_id,
             CASE WHEN cum_prev // {PACK_BUDGET}
                       != (cum_prev + n_tok - 1) // {PACK_BUDGET}
                  THEN 1 ELSE 0 END AS straddles
      FROM c)
    SELECT lang, chunk_id,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS chunk_tokens,
           CAST(SUM(straddles) AS BIGINT) AS n_straddlers
    FROM p GROUP BY lang, chunk_id
    """,
    tags=("llm", "curation", "packing"),
)
def pack_sequences_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing: concatenate each language's
    documents in doc_id order and cut every PACK_BUDGET tokens — the
    standard pre-training packing scheme. chunk_id = exclusive running
    token count // budget; a document whose span crosses a cut is a
    straddler (it will be split across two training sequences).

    Scale: one window per lang (range-partitioned sort — at 100 TB the
    sort is the same shuffle a shard-writer needs anyway), then a
    map-combined groupBy. All integer arithmetic — exact everywhere."""
    d = load_table(spark, sf_dir, "documents")
    t = d.select(
        "lang",
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), " ")).cast("bigint").alias("n_tok"),
    )
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    c = t.withColumn("cum_prev", F.coalesce(F.sum("n_tok").over(w), F.lit(0)))
    p = c.select(
        "lang",
        "n_tok",
        F.expr(f"cum_prev div {PACK_BUDGET}").alias("chunk_id"),
        F.when(
            F.expr(f"cum_prev div {PACK_BUDGET}")
            != F.expr(f"(cum_prev + n_tok - 1) div {PACK_BUDGET}"),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("straddles"),
    )
    return p.groupBy("lang", "chunk_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tok").alias("chunk_tokens"),
        F.sum("straddles").alias("n_straddlers"),
    )


# --------------------------------------------------------------------------
# train/eval contamination
# --------------------------------------------------------------------------

NGRAM = 5
EVAL_MOD = 17  # doc_id % 17 == 0 → pseudo-holdout eval set


@register(
    "contamination_ngram_overlap",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split(trim(text), ' ') AS tk FROM documents),
    sh AS (
      SELECT doc_id,
             list_distinct(list_transform(
               generate_series(1, len(tk) - {NGRAM - 1}),
               i -> md5(array_to_string(tk[i:i+{NGRAM - 1}], ' ')))) AS shingles
      FROM toks WHERE len(tk) >= {NGRAM}),
    train AS (
      SELECT DISTINCT unnest(shingles) AS h FROM sh
      WHERE doc_id % {EVAL_MOD} != 0),
    ev AS (
      SELECT doc_id, unnest(shingles) AS h FROM sh
      WHERE doc_id % {EVAL_MOD} = 0),
    m AS (
      SELECT ev.doc_id,
             COUNT(*) AS n_shingles,
             COUNT(train.h) AS n_matched
      FROM ev LEFT JOIN train ON ev.h = train.h
      GROUP BY ev.doc_id)
    SELECT doc_id, n_shingles, n_matched,
           n_matched / n_shingles AS contamination,
           n_matched / n_shingles >= 0.5 AS contaminated
    FROM m
    """,
    tags=("llm", "curation", "contamination"),
)
def contamination_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval contamination check (the n-gram-overlap decontamination
    pass every serious pre-training corpus runs): hash every 5-gram of
    the held-out eval docs (doc_id % 17 == 0) and of the training docs,
    and score each eval doc by the fraction of its distinct 5-grams that
    appear anywhere in training.

    Scale: shingles are md5 digests (uniform keys), and the probe is
    digest-to-digest — never text-to-text. BOTH sides scale with the
    corpus here (the pseudo-holdout is doc_id % 17, i.e. ~6% of the
    corpus — a real fixed benchmark suite would broadcast, but this
    eval set must not), so the probe is a shuffle join by design:
    the train side shuffles its DISTINCT digest set (partial
    aggregation dedups map-side before anything moves), the eval side
    shuffles its (doc_id, digest) pairs once, and a LEFT SEMI join
    keeps exactly the matched eval shingles — no hit-multiplication,
    no post-join distinct. Per-doc totals come from size(shingles),
    join-free, so unmatched eval rows never ride through the probe.
    parallelize_scan spreads the md5-per-shingle map work — the op's
    dominant cost — across cores on single-row-group fixture files
    (and is a no-op on a real multi-split corpus)."""
    from ..io import parallelize_scan

    d = parallelize_scan(load_table(spark, sf_dir, "documents"))
    tk = F.split(F.trim(F.col("text")), " ")
    sh = (
        d.select(
            "doc_id",
            # unhex(md5(...)): the digest is carried as BINARY(16),
            # not a 32-hex-char string — unhex is injective on md5
            # output, so every equality below (array_distinct, the
            # train distinct, the semi join) is byte-for-byte the
            # same partition of shingles as the string form while
            # halving every byte that is stored or shuffled (r13b)
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), F.size(tk) - (NGRAM - 1)),
                    lambda i: F.unhex(
                        F.md5(F.concat_ws(" ", F.slice(tk, i, NGRAM)))
                    ),
                )
            ).alias("shingles"),
        )
        .filter(F.size(tk) >= NGRAM)
    )
    # three consumers (train digests, eval pairs, eval totals): pay the
    # md5-per-shingle map — the op's dominant cost — once. Isolated
    # sf0.1: 2.68s -> 1.56s. At 100 TB this is the persisted
    # shingle-digest projection a decontamination run materializes
    # anyway (it is reused across eval suites). r13 A/B at ×100, all
    # four barrier forms measured on the idle box: hex-string
    # localCheckpoint 11.5/36.1 s (the documented block-manager
    # variance class), hex-string parquet 20.2 s, binary(16) + reused
    # doc_id-repartition exchange 37.6 s (shuffling the digest arrays
    # costs like checkpointing them), binary(16) + parquet 21.4 s —
    # the stable winner is the file-backed barrier on the halved
    # binary digests (stress_x100_r13b.json).
    # array SIZE precomputed BEFORE the barrier (r14 — the novelty `ns`
    # trick, guide §6): the totals branch's parquet read then prunes to
    # (doc_id, n_sh) and never deserializes the digest arrays at all
    sh = materialize_parquet(sh.withColumn("n_sh", F.size("shingles")))
    is_eval = F.col("doc_id") % EVAL_MOD == 0
    train = (
        sh.filter(~is_eval).select(F.explode("shingles").alias("h")).distinct()
    )
    ev = sh.filter(is_eval).select("doc_id", F.explode("shingles").alias("h"))
    totals = sh.filter(is_eval).select(
        "doc_id", F.col("n_sh").cast("bigint").alias("n_shingles")
    )
    hits = (
        ev.join(train, "h", "left_semi")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_matched"))
    )
    m = totals.join(hits, "doc_id", "left").select(
        "doc_id",
        "n_shingles",
        F.coalesce(F.col("n_matched"), F.lit(0).cast("bigint")).alias("n_matched"),
    )
    return m.select(
        "doc_id",
        "n_shingles",
        "n_matched",
        (F.col("n_matched") / F.col("n_shingles")).alias("contamination"),
        (F.col("n_matched") / F.col("n_shingles") >= 0.5).alias("contaminated"),
    )


# --------------------------------------------------------------------------
# duplicate selection policy: keep the best copy, not the first
# --------------------------------------------------------------------------


@register(
    "dedup_keep_best",
    oracle="""
    WITH g AS (
      SELECT doc_id, n_chars, lang,
             md5(lower(trim(text))) AS content_key,
             row_number() OVER (PARTITION BY md5(lower(trim(text)))
                                ORDER BY n_chars DESC, doc_id) AS rn,
             COUNT(*) OVER (PARTITION BY md5(lower(trim(text)))) AS group_size
      FROM documents)
    SELECT content_key, group_size,
           doc_id AS kept_doc_id, n_chars AS kept_n_chars, lang AS kept_lang
    FROM g WHERE rn = 1
    """,
    tags=("llm", "curation", "dedup"),
)
def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-policy duplicate selection: within each normalized-content
    group keep the *best* copy (longest n_chars, doc_id tie-break) —
    the curation policy real pipelines use instead of keep-first, so a
    truncated mirror never wins over the full original.

    One shuffle on the md5 content key; the per-group sort is bounded
    by duplicate multiplicity, not corpus size."""
    d = load_table(spark, sf_dir, "documents")
    key = F.md5(F.lower(F.trim(F.col("text"))))
    w = Window.partitionBy("content_key").orderBy(
        F.col("n_chars").desc(), F.col("doc_id")
    )
    g = (
        d.select("doc_id", "n_chars", "lang", key.alias("content_key"))
        .withColumn("rn", F.row_number().over(w))
        .withColumn("group_size", F.count("*").over(Window.partitionBy("content_key")))
    )
    return g.filter(F.col("rn") == 1).select(
        "content_key",
        "group_size",
        F.col("doc_id").alias("kept_doc_id"),
        F.col("n_chars").alias("kept_n_chars"),
        F.col("lang").alias("kept_lang"),
    )


# --------------------------------------------------------------------------
# substring-window dedup (boilerplate span detection)
# --------------------------------------------------------------------------

WIN = 64  # window width (chars)
STRIDE = 32  # window stride (chars)


@register(
    "dedup_substring_windows",
    oracle=f"""
    WITH w AS (
      SELECT doc_id,
             unnest(list_transform(
               generate_series(1, length(text) - {WIN} + 1, {STRIDE}),
               p -> md5(substr(text, p, {WIN})))) AS h
      FROM documents
      WHERE length(text) >= {WIN}),
    shared AS (
      SELECT h FROM w GROUP BY h HAVING COUNT(DISTINCT doc_id) > 1)
    SELECT w.doc_id,
           COUNT(*) AS n_windows,
           COUNT(shared.h) AS n_shared,
           COUNT(shared.h) / COUNT(*) AS shared_frac
    FROM w LEFT JOIN shared ON w.h = shared.h
    GROUP BY w.doc_id
    """,
    tags=("llm", "curation", "dedup"),
)
def dedup_substring_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring dedup, windowed approximation (the C4/RealNews
    shared-span pass): hash a 64-char window every 32 chars, mark
    windows whose digest occurs in more than one document, and score
    each document by its shared-window fraction — high scores are
    boilerplate (headers, license blocks, templated spam).

    Scale: windows are generated map-side (sequence + transform —
    no Python), digests are uniform md5 keys, and the only shuffles
    are the groupBy h and the digest self-join. A suffix-array exact
    pass needs a global sort; this windowed form is the standard
    shuffle-light stand-in with stride-bounded miss length.
    parallelize_scan spreads the per-window md5 map work across cores
    on single-row-group fixture files."""
    from ..io import parallelize_scan

    d = parallelize_scan(
        load_table(spark, sf_dir, "documents").filter(F.length("text") >= WIN)
    )
    # positions 1, 1+STRIDE, ... while p + WIN - 1 <= len
    pos = F.sequence(
        F.lit(1), F.length("text") - (WIN - 1), F.lit(STRIDE)
    )
    w = d.select(
        "doc_id",
        F.explode(
            F.transform(pos, lambda p: F.md5(F.col("text").substr(p, F.lit(WIN))))
        ).alias("h"),
    )
    shared = (
        w.groupBy("h")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") > 1)
        .select("h", F.lit(1).alias("hit"))
    )
    return (
        w.join(shared, "h", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_windows"),
            F.count("hit").alias("n_shared"),
            (F.count("hit") / F.count("*")).alias("shared_frac"),
        )
    )


# --------------------------------------------------------------------------
# domain balancing: per-source document cap
# --------------------------------------------------------------------------

SOURCE_CAP = 40  # max docs kept per source


@register(
    "corpus_source_cap",
    oracle=f"""
    WITH r AS (
      SELECT doc_id, source, lang, n_chars,
             row_number() OVER (PARTITION BY source
                                ORDER BY n_chars DESC, doc_id) AS rn
      FROM documents)
    SELECT source,
           COUNT(*) AS n_kept,
           MIN(n_chars) AS min_kept_chars,
           CAST(SUM(doc_id) AS BIGINT) AS kept_ids_sum
    FROM r WHERE rn <= {SOURCE_CAP}
    GROUP BY source
    """,
    tags=("llm", "curation", "sampling"),
)
def corpus_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain balancing by per-source cap: keep at most SOURCE_CAP
    documents per source, best (longest) first with doc_id tie-break —
    the anti-overrepresentation pass that stops one crawl domain from
    dominating the training mix (complement of corpus_mix_weights,
    which reweights instead of dropping).

    One shuffle on source; at 100 TB Catalyst rewrites the rn<=K filter
    into WindowGroupLimit, so each partition keeps a K-row heap instead
    of fully sorting its group."""
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(F.col("n_chars").desc(), F.col("doc_id"))
    kept = d.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= SOURCE_CAP)
    return kept.groupBy("source").agg(
        F.count("*").alias("n_kept"),
        F.min("n_chars").alias("min_kept_chars"),
        F.sum("doc_id").cast("bigint").alias("kept_ids_sum"),
    )


# --------------------------------------------------------------------------
# behavioral anomaly scoring: per-user event-rate z-score
# --------------------------------------------------------------------------


@register(
    "events_user_rate_zscore",
    oracle="""
    WITH per_user AS (
      SELECT user_id, COUNT(*) AS n FROM events GROUP BY user_id),
    pop AS (
      SELECT CAST(SUM(n) AS DOUBLE) / COUNT(*) AS mean_n,
             COUNT(*) AS n_users,
             CAST(SUM(n * n) AS BIGINT) AS sum_sq,
             CAST(SUM(n) AS BIGINT) AS sum_n
      FROM per_user)
    SELECT user_id, n,
           round((n - mean_n)
                 / sqrt((sum_sq - CAST(sum_n AS DOUBLE) * sum_n / n_users)
                        / (n_users - 1)), 6) AS z
    FROM per_user CROSS JOIN pop
    WHERE n_users > 1
    """,
    tags=("llm", "curation", "anomaly"),
)
def events_user_rate_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-rate z-score — the bot/outlier screen a data
    pipeline runs before user-generated text enters a corpus. Counts
    are exact integers; mean and sample variance are derived from
    exact integer sums (Σn, Σn²) so the only float ops are the same
    ordered divide/sqrt in both engines, rounded to 6 dp.

    Scale: one count aggregate (map-combined), one scalar population
    row broadcast back — the corpus is scanned once."""
    e = load_table(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(F.count("*").alias("n"))
    pop = per_user.agg(
        (F.sum("n").cast("double") / F.count("*")).alias("mean_n"),
        F.count("*").alias("n_users"),
        F.sum(F.col("n") * F.col("n")).cast("bigint").alias("sum_sq"),
        F.sum("n").cast("bigint").alias("sum_n"),
    )
    var = (
        F.col("sum_sq")
        - F.col("sum_n").cast("double") * F.col("sum_n") / F.col("n_users")
    ) / (F.col("n_users") - 1)
    return (
        per_user.crossJoin(F.broadcast(pop))
        .filter(F.col("n_users") > 1)
        .select(
            "user_id",
            "n",
            F.round((F.col("n") - F.col("mean_n")) / F.sqrt(var), 6).alias("z"),
        )
    )


# --------------------------------------------------------------------------
# cross-source overlap matrix (inter-crawl duplication diagnostic)
# --------------------------------------------------------------------------

# Ignore shingles shared by more sources than this: near-ubiquitous
# shingles are boilerplate, not overlap signal, and at corpus scale
# (thousands of sources) their per-digest pair fan-out is quadratic in
# the source count — the cap bounds it.
OVERLAP_SOURCE_CAP = 16


@register(
    "corpus_cross_source_overlap",
    oracle=f"""
    WITH t AS (SELECT doc_id, source, string_split(trim(text), ' ') AS toks
               FROM documents),
    sh AS (SELECT DISTINCT source,
                  unnest(list_transform(
                      list_distinct(list_transform(
                          generate_series(1, len(toks)-2),
                          i -> array_to_string(toks[i:i+2], ' '))),
                      s -> CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT)))
                    AS dg
           FROM t),
    keep AS (
      SELECT dg FROM sh GROUP BY dg
      HAVING COUNT(*) BETWEEN 2 AND {OVERLAP_SOURCE_CAP})
    SELECT a.source AS source_a, b.source AS source_b,
           COUNT(*) AS n_shared_shingles
    FROM sh a JOIN keep USING (dg) JOIN sh b
      ON a.dg = b.dg AND a.source < b.source
    GROUP BY a.source, b.source
    """,
    tags=("llm", "curation", "dedup"),
)
def corpus_cross_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise content-overlap matrix between sources: count distinct
    3-gram shingle digests shared by each source pair — the
    which-crawls-duplicate-each-other diagnostic run before choosing
    dedup order / source priorities (complement of
    contamination_ngram_overlap, which probes one split against
    another rather than all pairs). Shingles present in more than
    OVERLAP_SOURCE_CAP sources are excluded as boilerplate — which is
    also what bounds the pair fan-out (see the constant's comment).

    Scale: NO self-join at all — the digest groupBy collects each
    digest's distinct source set (collect_set partially aggregates
    map-side, so duplicate (source, digest) observations collapse
    before the wire), and the a<b pairs expand per-row from the
    sorted set: fan-out bounded by the source count squared, never
    the corpus size. One heavy map-combined shuffle on the digest +
    one tiny map-combined shuffle on the pair set. (A digest-keyed
    self-join of the distinct (source, digest) set computes the same
    thing but shuffles that set twice and sorts both sides; isolated
    bench at sf0.1: ~3.0 s for the join formulation vs ~1.2-1.9 s for
    this one.) The scan is spread via parallelize_scan so the
    md5-per-shingle map work uses every core even on the
    single-row-group fixture files."""
    from .dedup import _shingles
    from ..io import parallelize_scan

    d = parallelize_scan(load_table(spark, sf_dir, "documents"))
    sh = d.select(
        "source",
        F.explode(
            F.transform(
                _shingles(F.col("text")),
                lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast(
                    "bigint"
                ),
            )
        ).alias("dg"),
    )
    per_dg = (
        sh.groupBy("dg")
        .agg(F.array_sort(F.collect_set("source")).alias("ss"))
        .filter(
            (F.size("ss") >= 2) & (F.size("ss") <= OVERLAP_SOURCE_CAP)
        )
    )
    n = F.size("ss")
    pairs = per_dg.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.sequence(F.lit(1), n - 1),
                    lambda i: F.transform(
                        F.sequence(i + 1, n),
                        lambda j: F.struct(
                            F.element_at(F.col("ss"), i.cast("int")).alias(
                                "source_a"
                            ),
                            F.element_at(F.col("ss"), j.cast("int")).alias(
                                "source_b"
                            ),
                        ),
                    ),
                )
            )
        ).alias("p")
    ).select("p.source_a", "p.source_b")
    return pairs.groupBy("source_a", "source_b").agg(
        F.count("*").alias("n_shared_shingles")
    )


# --------------------------------------------------------------------------
# per-source adaptive quality threshold (drop the bottom quartile)
# --------------------------------------------------------------------------


@register(
    "corpus_quality_adaptive_threshold",
    oracle="""
    WITH t AS (
      SELECT doc_id, source, string_split(trim(text), ' ') AS toks
      FROM documents),
    s AS (
      SELECT doc_id, source,
             CAST(len(list_distinct(toks)) AS BIGINT) * 1000000
               // CAST(len(toks) AS BIGINT) AS score
      FROM t WHERE len(toks) > 0),
    r AS (
      SELECT doc_id, source, score,
             row_number() OVER (PARTITION BY source
                                ORDER BY score, doc_id) AS rn,
             COUNT(*) OVER (PARTITION BY source) AS grp_n
      FROM s)
    SELECT source,
           COUNT(*) AS n_kept,
           CAST(MIN(score) AS BIGINT) AS min_kept_score,
           CAST(MAX(score) AS BIGINT) AS max_kept_score,
           CAST(SUM(doc_id) AS BIGINT) AS kept_ids_sum
    FROM r WHERE 4 * rn > grp_n
    GROUP BY source
    """,
    tags=("llm", "curation", "quality"),
)
def corpus_quality_adaptive_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source ADAPTIVE quality filtering: score every document by
    lexical diversity (distinct-token ratio, scaled to exact integer
    parts-per-million) and drop each source's bottom quartile — the
    per-domain calibrated cut real pipelines use instead of one global
    threshold (a threshold tuned on web text would gut code or forum
    sources; per-source quantiles self-calibrate).

    All arithmetic is integer-exact (ppm score via integer division,
    rank-vs-count quartile rule — no float percentile). Scale: one
    shuffle on source for the rank window (WindowGroupLimit does not
    apply, but the sort is per-source); the final rollup is
    map-combined on the same partitioning, so the scored projection
    shuffles once. parallelize_scan spreads the tokenize+distinct
    scoring across cores on single-row-group fixture files (no-op
    cost on a real multi-file corpus)."""
    from ..io import parallelize_scan

    d = parallelize_scan(load_table(spark, sf_dir, "documents"))
    toks = F.split(F.trim(F.col("text")), " ")
    s = d.select(
        "doc_id",
        "source",
        F.size(toks).alias("n_tok"),
        F.size(F.array_distinct(toks)).alias("n_uniq"),
    ).filter(F.col("n_tok") > 0)
    s = s.select(
        "doc_id",
        "source",
        F.expr("CAST(n_uniq AS BIGINT) * 1000000 div CAST(n_tok AS BIGINT)").alias(
            "score"
        ),
    )
    w = Window.partitionBy("source").orderBy("score", "doc_id")
    wn = Window.partitionBy("source")
    kept = (
        s.select(
            "doc_id",
            "source",
            "score",
            F.row_number().over(w).alias("rn"),
            F.count("*").over(wn).alias("grp_n"),
        )
        .filter(4 * F.col("rn") > F.col("grp_n"))
    )
    return kept.groupBy("source").agg(
        F.count("*").alias("n_kept"),
        F.min("score").cast("bigint").alias("min_kept_score"),
        F.max("score").cast("bigint").alias("max_kept_score"),
        F.sum("doc_id").cast("bigint").alias("kept_ids_sum"),
    )


# --------------------------------------------------------------------------
# time-decayed engagement score (ordered fold, exact powers of two)
# --------------------------------------------------------------------------


@register(
    "events_decay_time_weighted",
    oracle="""
    WITH e AS (
      SELECT user_id, ts, event_id, CAST(value AS DOUBLE) AS v,
             datediff('day', CAST(ts AS DATE),
                      MAX(CAST(ts AS DATE)) OVER (PARTITION BY user_id))
               AS age_days
      FROM events)
    SELECT user_id,
           COUNT(*) AS n_events,
           list_reduce(
             list_prepend(0.0e0,
               list(v * pow(0.5e0, age_days) ORDER BY ts, event_id)),
             (acc, x) -> acc + x) AS decayed_score
    FROM e
    GROUP BY user_id
    """,
    tags=("llm", "curation", "fold"),
)
def events_decay_time_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Half-life-decayed engagement score per user: each event's value
    is weighted by 0.5^age_days (age relative to the user's most
    recent event) and summed in (ts, event_id) order — the recency
    weighting feedback pipelines use to score contributors/documents
    without a full recompute as the corpus ages.

    Determinism without rounding: 0.5^k is an exact power of two, so
    each weighted term is an exact IEEE scaling of the raw value, and
    the sum is an ordered fold over identically-ordered terms in both
    engines — bit-identical, like window_ewma_fold. Scale: one shuffle
    on user_id; the window max reuses the same partitioning as the
    groupBy (single exchange), state per group is one double."""
    e = load_table(spark, sf_dir, "events")
    wu = Window.partitionBy("user_id")
    aged = e.select(
        "user_id",
        "ts",
        "event_id",
        F.col("value").cast("double").alias("v"),
        F.datediff(F.max(F.to_date("ts")).over(wu), F.to_date("ts")).alias(
            "age_days"
        ),
    )
    ordered_terms = F.transform(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.unix_micros("ts").alias("t"),
                    F.col("event_id").alias("i"),
                    (F.col("v") * F.pow(F.lit(0.5), F.col("age_days"))).alias("w"),
                )
            )
        ),
        lambda s: s.getField("w"),
    )
    return aged.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.aggregate(
            ordered_terms, F.lit(0.0), lambda acc, x: acc + x
        ).alias("decayed_score"),
    )


# --------------------------------------------------------------------------
# per-source token budget (greedy running-sum trim)
# --------------------------------------------------------------------------

TOKEN_BUDGET = 6000  # tokens each source may contribute


@register(
    "corpus_token_budget_trim",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, source,
             CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n_tok
      FROM documents),
    c AS (
      SELECT doc_id, source, n_tok,
             SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM t)
    SELECT source,
           COUNT(*) AS n_kept,
           CAST(SUM(n_tok) AS BIGINT) AS tokens_kept,
           CAST(MAX(cum) AS BIGINT) AS budget_used,
           CAST(SUM(doc_id) AS BIGINT) AS kept_ids_sum
    FROM c WHERE cum <= {TOKEN_BUDGET}
    GROUP BY source
    """,
    tags=("llm", "curation", "sampling"),
)
def corpus_token_budget_trim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source TOKEN budget: keep documents in doc_id order until
    the source's cumulative token count would exceed TOKEN_BUDGET —
    the mix-building primitive when the recipe says "at most N tokens
    from this source" (corpus_source_cap caps document COUNT; training
    mixes are specified in tokens, not documents).

    All-integer running sum; one key shuffle on source (the same
    partitioning the rollup reuses). At 100 TB the per-source sort is
    the shard-writer's sort — no extra pass. parallelize_scan spreads
    the tokenize map work across cores on single-row-group fixture
    files (no-op cost on a real multi-file corpus)."""
    from ..io import parallelize_scan

    d = parallelize_scan(load_table(spark, sf_dir, "documents"))
    t = d.select(
        "doc_id",
        "source",
        F.size(F.split(F.trim(F.col("text")), " ")).cast("bigint").alias("n_tok"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = t.withColumn("cum", F.sum("n_tok").over(w)).filter(
        F.col("cum") <= TOKEN_BUDGET
    )
    return c.groupBy("source").agg(
        F.count("*").alias("n_kept"),
        F.sum("n_tok").cast("bigint").alias("tokens_kept"),
        F.max("cum").cast("bigint").alias("budget_used"),
        F.sum("doc_id").cast("bigint").alias("kept_ids_sum"),
    )


# --------------------------------------------------------------------------
# robust outlier screen: median absolute deviation on event rates
# --------------------------------------------------------------------------


@register(
    "events_anomaly_mad",
    oracle="""
    WITH per_user AS (
      SELECT user_id, COUNT(*) AS n FROM events GROUP BY user_id),
    pop AS (
      SELECT quantile_cont(n, 0.5) AS med FROM per_user),
    dev AS (
      SELECT user_id, n, med, abs(n - med) AS adev
      FROM per_user CROSS JOIN pop),
    m AS (SELECT quantile_cont(adev, 0.5) AS mad FROM dev)
    SELECT user_id, n,
           round(adev, 6) AS abs_dev,
           (adev > 3 * mad) AS is_outlier
    FROM dev CROSS JOIN m
    """,
    tags=("llm", "curation", "robust"),
)
def events_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median-absolute-deviation outlier screen on per-user event
    rates — the robust sibling of events_user_rate_zscore (a handful
    of bots inflate mean AND stddev, masking themselves from z-scores;
    medians don't move).

    Exactness: counts are integers; both engines interpolate the
    median identically (average of two middle integers — an exact
    .5-grid double), so deviations and the 3×MAD rule compare
    bit-identical values. Scale: one count aggregate, two 1-row
    median aggregates broadcast back — the events table is scanned
    once, medians run on the (tiny) per-user table."""
    e = load_table(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(F.count("*").alias("n"))
    pop = per_user.agg(F.expr("percentile(n, 0.5D)").alias("med"))
    dev = per_user.crossJoin(F.broadcast(pop)).select(
        "user_id", "n", (F.abs(F.col("n") - F.col("med"))).alias("adev")
    )
    m = dev.agg(F.expr("percentile(adev, 0.5D)").alias("mad"))
    return dev.crossJoin(F.broadcast(m)).select(
        "user_id",
        "n",
        F.round("adev", 6).alias("abs_dev"),
        (F.col("adev") > 3 * F.col("mad")).alias("is_outlier"),
    )


@register(
    "corpus_stratified_hash_sample",
    oracle="""
    WITH cnt AS (
      SELECT source, COUNT(*) AS n_docs
      FROM documents GROUP BY source),
    floor_n AS (
      SELECT MIN(n_docs) AS min_docs FROM cnt),
    rates AS (
      SELECT source, n_docs,
             LEAST(1000000, min_docs * 1000000 // n_docs) AS rate_ppm
      FROM cnt CROSS JOIN floor_n),
    sampled AS (
      SELECT d.source
      FROM documents d JOIN rates r USING (source)
      WHERE CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 15))
                 AS BIGINT) % 1000000 < r.rate_ppm)
    SELECT r.source, r.n_docs, r.rate_ppm,
           COALESCE(s.n_sampled, 0) AS n_sampled
    FROM rates r
    LEFT JOIN (SELECT source, COUNT(*) AS n_sampled
               FROM sampled GROUP BY source) s USING (source)
    """,
    tags=("llm", "curation", "sampling"),
)
def corpus_stratified_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified downsampling to a balanced source mix —
    the standard way a pre-training pipeline rebalances over-crawled
    sources: every source gets a keep-rate of min_source_count/its
    count (in exact integer ppm), and a document survives iff
    md5(doc_id) mod 1e6 falls under its source's rate. Hash-gating
    (vs ORDER BY rank caps, corpus_source_cap) keeps selection stable
    under corpus growth: adding documents never flips earlier keep
    decisions, so incremental re-runs only touch new docs.

    Scale: one small per-source count aggregate; the rate table is
    source-cardinality and broadcasts; the sample pass is a map-side
    filter over the corpus scan (hash + compare, no shuffle of
    documents); the final per-source rollup aggregates the kept set.
    Everything integer-exact."""
    d = load_table(spark, sf_dir, "documents")
    cnt = d.groupBy("source").agg(F.count("*").alias("n_docs"))
    floor_n = cnt.agg(F.min("n_docs").alias("min_docs"))
    rates = cnt.crossJoin(F.broadcast(floor_n)).select(
        "source",
        "n_docs",
        F.least(
            F.lit(1000000).cast("bigint"),
            F.expr("min_docs * 1000000 div n_docs"),
        ).alias("rate_ppm"),
    )
    gate = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10)
        .cast("bigint")
        % 1000000
    )
    sampled = (
        d.join(F.broadcast(rates), "source")
        .filter(gate < F.col("rate_ppm"))
        .groupBy("source")
        .agg(F.count("*").alias("n_sampled"))
    )
    return rates.join(sampled, "source", "left").select(
        "source",
        "n_docs",
        "rate_ppm",
        F.coalesce("n_sampled", F.lit(0).cast("bigint")).alias("n_sampled"),
    )


@register(
    "corpus_data_card",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
           CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
           CAST(SUM(len(string_split(trim(text), ' '))) AS BIGINT) AS total_tokens,
           CAST(round(COUNT(DISTINCT sha256(text)) * 1000000.0 / COUNT(*), 0)
                AS BIGINT) AS distinct_text_ppm,
           CAST(MIN(n_chars) AS BIGINT) AS min_chars,
           CAST(MAX(n_chars) AS BIGINT) AS max_chars,
           CAST(SUM(CAST(n_chars AS DECIMAL(18,0))) AS DOUBLE) / COUNT(*)
             AS avg_chars,
           CAST(SUM(len(string_split(trim(text), ' '))) AS DOUBLE) / COUNT(*)
             AS avg_tokens_per_doc
    FROM documents
    """,
    tags=("llm", "corpus", "monitoring"),
)
def corpus_data_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The one-row corpus data card: document/source/language counts,
    token volume, exact-duplication rate (distinct content hashes per
    million docs), and length statistics — the summary sheet
    responsible-data practice attaches to every training-set release
    (Datasheets for Datasets; model-card data sections). One query, so
    the card is regenerated atomically with each snapshot and
    hash-checked like any operator.

    Scale: a single scan with one global aggregate; the two DISTINCT
    aggregates expand map-side (Spark's multi-distinct rewrite) and
    the content-hash distinct rides the same uniform sha256 key that
    dedup_exact shuffles on. No joins, no windows."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.size(F.split(F.trim(F.col("text")), " "))
    return d.agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.countDistinct("source").cast("bigint").alias("n_sources"),
        F.countDistinct("lang").cast("bigint").alias("n_langs"),
        F.sum(toks).cast("bigint").alias("total_tokens"),
        F.round(
            F.countDistinct(F.sha2("text", 256)) * 1000000.0 / F.count("*"), 0
        )
        .cast("bigint")
        .alias("distinct_text_ppm"),
        F.min("n_chars").cast("bigint").alias("min_chars"),
        F.max("n_chars").cast("bigint").alias("max_chars"),
        (
            F.sum(F.col("n_chars").cast("decimal(18,0)")).cast("double")
            / F.count("*")
        ).alias("avg_chars"),
        (F.sum(toks).cast("double") / F.count("*")).alias("avg_tokens_per_doc"),
    )


@register(
    "corpus_train_split_audit",
    oracle="""
    WITH s AS (
      SELECT source,
             CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6'
                    THEN 'train'
                  WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'f3'
                    THEN 'val'
                  ELSE 'test' END AS split
      FROM documents),
    c AS (SELECT source, split, CAST(COUNT(*) AS BIGINT) AS n_docs
          FROM s GROUP BY source, split),
    t AS (SELECT source, CAST(SUM(n_docs) AS BIGINT) AS n_source
          FROM c GROUP BY source)
    SELECT c.source, c.split, c.n_docs,
           CAST(round(c.n_docs * 1000000.0 / t.n_source, 0) AS BIGINT)
             AS share_ppm
    FROM c JOIN t ON t.source = c.source
    """,
    tags=("llm", "corpus", "sample"),
)
def corpus_train_split_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/val/test split audit: every document is routed to a split
    by a hash range over its id (~90/5/5 — 'e6'/'f3' are the 230/243
    out of 256 byte boundaries), and the audit reports per-source split
    shares. Hash routing makes the split a pure function of the id —
    disjoint and complete BY CONSTRUCTION, stable under repartitioning,
    corpus growth, and engine changes — which is why pipelines split
    this way instead of with random() (leakage on re-run) or row
    position (leakage on re-sort). The per-source shares are what you
    monitor: a source whose val share drifts from ~5% signals id
    clustering under the hash — the failure mode this audit exists to
    catch.

    Scale: one scan, one (source x 3) aggregate, broadcast total join."""
    d = load_table(spark, sf_dir, "documents")
    h2 = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    s = d.select(
        "source",
        F.when(h2 < "e6", "train").when(h2 < "f3", "val").otherwise("test").alias(
            "split"
        ),
    )
    c = s.groupBy("source", "split").agg(F.count("*").cast("bigint").alias("n_docs"))
    t = c.groupBy("source").agg(F.sum("n_docs").cast("bigint").alias("n_source"))
    return c.join(F.broadcast(t), "source").select(
        "source", "split", "n_docs",
        F.round(F.col("n_docs") * 1000000.0 / F.col("n_source"), 0)
        .cast("bigint")
        .alias("share_ppm"),
    )


# --------------------------------------------------------------------------
# DSIR-style importance resampling (hashed n-gram features)
# --------------------------------------------------------------------------

DSIR_BUCKETS = 64  # hashed-feature buckets (production: 10^4..10^6)
DSIR_M = 50  # documents selected


@register(
    "corpus_dsir_importance",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, lang, string_split(trim(text), ' ') AS toks
      FROM documents),
    feat AS (
      SELECT doc_id, lang,
             CAST(('0x' || substr(md5(g), 1, 8)) AS BIGINT) % {DSIR_BUCKETS} AS f
      FROM (SELECT doc_id, lang,
                   unnest(list_transform(generate_series(1, len(toks) - 1),
                                         i -> array_to_string(toks[i:i+1], ' ')))
                     AS g
            FROM t)),
    cnt AS (
      SELECT f, CAST(COUNT(*) AS BIGINT) AS fr,
             CAST(COALESCE(COUNT(*) FILTER (lang = 'en'), 0) AS BIGINT) AS ft
      FROM feat GROUP BY f),
    tot AS (SELECT CAST(SUM(fr) AS BIGINT) AS rt, CAST(SUM(ft) AS BIGINT) AS tt
            FROM cnt),
    w AS (
      SELECT f,
             CAST(ROUND(ln(((ft + 1.0) / (tt + {DSIR_BUCKETS}.0))
                           / ((fr + 1.0) / (rt + {DSIR_BUCKETS}.0))) * 1000000, 0)
                  AS BIGINT) AS unats
      FROM cnt CROSS JOIN tot),
    doc AS (
      SELECT feat.doc_id, CAST(COUNT(*) AS BIGINT) AS n_feats,
             CAST(SUM(w.unats) AS BIGINT) AS weight_unats
      FROM feat JOIN w USING (f) GROUP BY feat.doc_id)
    SELECT doc_id, n_feats, weight_unats,
           CAST(weight_unats AS DOUBLE) / 1000000.0 AS log_weight,
           rn <= {DSIR_M} AS is_selected
    FROM (SELECT *, row_number() OVER (ORDER BY weight_unats DESC, doc_id) AS rn
          FROM doc)
    """,
    tags=("llm", "curation", "sampling"),
)
def corpus_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style data selection with importance resampling (Xie et
    al. 2023, arXiv:2302.03169): score every raw document by how
    target-like its hashed n-gram feature distribution is, then select
    the top-M. Features are bigrams hashed into DSIR_BUCKETS buckets;
    the target distribution is the lang='en' slice, the raw
    distribution is the whole corpus; a document's log importance
    weight is the sum over its feature OCCURRENCES of
    ln(p_target(f) / p_raw(f)) with add-one smoothing.

    Determinism: per-feature log-ratios round to integer micro-nats
    (the text_unigram_surprisal discipline), per-doc sums are exact
    bigints, and the top-M boundary compares integers. Docs with no
    features (NULL text, < 2 tokens) are not scored — DSIR has no
    evidence to weigh them.

    Scale shape: one corpus scan builds features (zip_with bigrams,
    O(len) per doc); the feature table (<= DSIR_BUCKETS rows, an
    Aggregate-bounded subtree) broadcasts onto the feature stream; the
    per-doc sum is one doc_id shuffle. Selection avoids a global
    single-partition window: a distributed TakeOrdered(M) finds the
    boundary (M-th best (weight, doc_id)), which broadcasts back as a
    two-integer comparison — every stage is map-side or a bounded
    top-k, nothing corpus-sized ever sorts globally."""
    d = load_table(spark, sf_dir, "documents")
    t = d.select(
        "doc_id", "lang", F.split(F.trim(F.col("text")), " ").alias("toks")
    )
    toks = F.col("toks")
    nshift = F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0)))
    bigrams = F.filter(
        F.zip_with(toks, nshift, lambda a, b: F.concat(a, F.lit(" "), b)),
        lambda x: x.isNotNull(),
    )
    feat = t.select(
        "doc_id", "lang", F.explode(bigrams).alias("g")
    ).select(
        "doc_id",
        "lang",
        (F.conv(F.substring(F.md5(F.col("g")), 1, 8), 16, 10).cast("bigint")
         % DSIR_BUCKETS).alias("f"),
    )
    # Collapse the exploded feature stream ONCE into per-(doc, bucket)
    # occurrence counts — at most DSIR_BUCKETS rows per doc — and
    # checkpoint: every downstream consumer (bucket totals, per-doc
    # sums, the top-M boundary) reads this skinny table instead of
    # re-running the scan+explode+md5 pipeline (measured 12.1 s -> the
    # pipeline once at sf0.1). Lineage-truncation tradeoff documented
    # at dedup.py's checkpoint note.
    dfc = (
        feat.groupBy("doc_id", "lang", "f")
        .agg(F.count("*").cast("bigint").alias("c"))
        .localCheckpoint(eager=True)
    )
    cnt = dfc.groupBy("f").agg(
        F.sum("c").cast("bigint").alias("fr"),
        F.coalesce(
            F.sum(F.when(F.col("lang") == "en", F.col("c"))), F.lit(0)
        ).cast("bigint").alias("ft"),
    )
    tot = cnt.agg(
        F.sum("fr").cast("bigint").alias("rt"), F.sum("ft").cast("bigint").alias("tt")
    )
    b = float(DSIR_BUCKETS)
    w = cnt.crossJoin(F.broadcast(tot)).select(
        "f",
        F.round(
            F.log(
                ((F.col("ft") + 1.0) / (F.col("tt") + b))
                / ((F.col("fr") + 1.0) / (F.col("rt") + b))
            )
            * 1000000,
            0,
        ).cast("bigint").alias("unats"),
    )
    doc = (
        dfc.join(F.broadcast(w), "f")
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("bigint").alias("n_feats"),
            F.sum(F.col("c") * F.col("unats")).cast("bigint").alias("weight_unats"),
        )
        .localCheckpoint(eager=True)  # feeds the boundary AND the flag
    )
    # boundary = the M-th best (weight_unats DESC, doc_id ASC): min of
    # struct(weight, -doc_id) over the distributed TakeOrdered(M) rows
    thr = (
        doc.orderBy(F.col("weight_unats").desc(), "doc_id")
        .limit(DSIR_M)
        .agg(
            F.min(
                F.struct(
                    F.col("weight_unats").alias("su"),
                    (-F.col("doc_id")).alias("nd"),
                )
            ).alias("t")
        )
    )
    su = F.col("weight_unats")
    return doc.crossJoin(F.broadcast(thr)).select(
        "doc_id",
        "n_feats",
        "weight_unats",
        (su.cast("double") / 1000000.0).alias("log_weight"),
        (
            (su > F.col("t.su"))
            | ((su == F.col("t.su")) & (F.col("doc_id") <= -F.col("t.nd")))
        ).alias("is_selected"),
    )


# --------------------------------------------------------------------------
# hashed linear quality classifier (fastText-style scoring pass)
# --------------------------------------------------------------------------

# Deterministic pseudo-weight for a hashed feature: 48 bits of md5 map
# to an integer in [-1000, 1000] milli-units. Stands in for a trained
# weight vector — the *shape* (hash -> bounded weight, no vocabulary
# table) is exactly fastText's hashing trick, so swapping in real
# weights is a broadcast-map change, not a plan change.
_CLS_W_SQL = (
    "(CAST(('0x' || substr(md5({f}), 1, 12)) AS BIGINT) % 2001) - 1000"
)


@register(
    "corpus_hashed_classifier_score",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, text,
             list_filter(string_split(trim(text), ' '), x -> x <> '') AS toks
      FROM documents),
    f AS (
      SELECT doc_id, text, toks,
             list_transform(generate_series(1, len(toks) - 1),
                            i -> toks[i] || ' ' || toks[i+1]) AS bis
      FROM t),
    s AS (
      SELECT doc_id, text,
             CAST(len(toks) AS BIGINT) AS n_tokens,
             CAST(len(toks) + len(bis) AS BIGINT) AS n_features,
             CAST(COALESCE(list_aggregate(list_transform(toks,
                    x -> {_CLS_W_SQL.format(f='x')}), 'sum'), 0)
                + COALESCE(list_aggregate(list_transform(bis,
                    x -> {_CLS_W_SQL.format(f='x')}), 'sum'), 0)
                AS BIGINT) AS score_milli
      FROM f)
    SELECT doc_id,
           CASE WHEN text IS NOT NULL THEN n_tokens END AS n_tokens,
           CASE WHEN text IS NOT NULL THEN n_features END AS n_features,
           CASE WHEN text IS NOT NULL THEN score_milli END AS score_milli,
           CASE WHEN n_features > 0
                THEN score_milli / (1000 * n_features) END AS mean_score,
           CASE WHEN n_features > 0
                THEN score_milli >= 0 END AS keep
    FROM s
    """,
    tags=("llm", "curation", "quality"),
)
def corpus_hashed_classifier_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashed linear quality classifier — the fastText-architecture
    scoring pass LLM curation stacks run corpus-wide (CCNet's Wikipedia
    LM filter, LLaMA's quality classifier): every unigram and bigram is
    hashed straight to a weight (no vocabulary table, so OOV is
    impossible by construction) and a document's score is the mean
    feature weight. Weights here are md5-derived pseudo-weights in
    [-1, 1] (milli-units); a trained model drops in by replacing the
    hash->weight map with a broadcast array lookup — the plan shape
    (single scan, zero shuffles) is the deliverable.

    Determinism: the score is an exact BIGINT sum of integer
    milli-weights folded per-row (order-independent); mean_score is one
    int/int IEEE divide; the keep verdict compares the integer sum to
    zero — no float anywhere. Bigram count is len-1 (clamped at 0), so
    n_features <= 2*n_tokens bounds per-row work by doc length.

    NULL text -> all-NULL row; empty text -> zero counts, NULL
    mean/keep (no features is "no opinion", not "score 0").

    Scale shape: pure map-side scan — tokenize, two array_transform +
    aggregate folds, zero shuffles, zero joins, no explode (features
    never leave their row). At 100 TB this is scan-bound; the fold is
    codegen'd JVM arithmetic over one md5 per feature."""
    d = load_table(spark, sf_dir, "documents")
    t = d.select(
        "doc_id",
        "text",
        F.filter(F.split(F.trim(F.col("text")), " "), lambda x: x != "").alias(
            "toks"
        ),
    )
    toks = F.col("toks")
    shifted = F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0)))
    bigrams = F.filter(
        F.zip_with(toks, shifted, lambda a, b: F.concat(a, F.lit(" "), b)),
        lambda x: x.isNotNull(),
    )
    f2 = t.select("doc_id", "text", toks.alias("toks"), bigrams.alias("bis"))

    def w(x: Column) -> Column:
        return (
            F.conv(F.substring(F.md5(x), 1, 12), 16, 10).cast("bigint") % 2001
        ) - 1000

    def fold(arr: Column) -> Column:
        return F.aggregate(
            arr, F.lit(0).cast("bigint"), lambda acc, x: acc + w(x)
        )

    s = f2.select(
        "doc_id",
        "text",
        F.size("toks").cast("bigint").alias("n_tokens"),
        (F.size("toks") + F.size("bis")).cast("bigint").alias("n_features"),
        (fold(F.col("toks")) + fold(F.col("bis"))).cast("bigint").alias(
            "score_milli"
        ),
    )
    has_text = F.col("text").isNotNull()
    nf = F.col("n_features")
    sm = F.col("score_milli")
    return s.select(
        "doc_id",
        F.when(has_text, F.col("n_tokens")).alias("n_tokens"),
        F.when(has_text, nf).alias("n_features"),
        F.when(has_text, sm).alias("score_milli"),
        F.when(nf > 0, sm / (1000 * nf)).alias("mean_score"),
        F.when(nf > 0, sm >= 0).alias("keep"),
    )


# --------------------------------------------------------------------------
# weighted priority sampling per stratum (Efraimidis–Spirakis A-ES)
# --------------------------------------------------------------------------

PS_K = 8  # sample size per source stratum


@register(
    "corpus_priority_sample",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, source,
             CAST(len(list_filter(string_split(trim(text), ' '),
                                  x -> x <> '')) AS BIGINT) AS w_tokens
      FROM documents WHERE text IS NOT NULL),
    k AS (
      SELECT doc_id, source, w_tokens,
             CAST(round(1000000.0 * ln(
                    (CAST(('0x' || substr(md5('ps_' || CAST(doc_id AS VARCHAR)), 1, 12))
                          AS BIGINT) + 0.5) / 281474976710656.0)
                  / w_tokens, 0) AS BIGINT) AS key_micro
      FROM t WHERE w_tokens > 0)
    SELECT source, doc_id, w_tokens, key_micro, rnk FROM (
      SELECT *, row_number() OVER (PARTITION BY source
                                   ORDER BY key_micro DESC, doc_id) AS rnk
      FROM k)
    WHERE rnk <= {PS_K}
    """,
    tags=("llm", "curation", "sampling"),
)
def corpus_priority_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement per source stratum —
    Efraimidis & Spirakis (2006) A-ES priority sampling, THE
    distributed idiom for "sample k documents per source with
    probability proportional to length/quality" at any scale: each row
    computes key = u^(1/w) independently (u uniform, w its weight) and
    the sample is the top-k keys per stratum. One scan, zero joins,
    one window top-k — the sample of a 100 TB corpus costs one shuffle
    of the (stratum, key) pairs, and partial top-k (WindowGroupLimit)
    prunes map-side.

    Weights are token counts (length-proportional, the common curation
    choice); u derives from md5(doc_id) — 48 bits to a dyadic rational
    in (0,1), exactly representable so both engines feed ln() the SAME
    double. Ordering uses the monotone-equivalent ln(u)/w (avoids
    underflow for huge w; same argmax as u^(1/w)), rounded once to
    integer micro-units — a 1-ulp libm divergence cannot flip an
    integer round except exactly at a .5 boundary, and ties break on
    doc_id. Zero-weight docs (empty/NULL text) can never be sampled:
    excluded in both engines; NULL source is its own stratum (both
    engines put window-partition NULLs in one group).

    At production scale the weight column is any positive score
    (quality classifier output, dedup-cluster size) and PS_K scales
    per-stratum — the plan is unchanged.

    The zero-weight exclusion is expressed as trim(text) != '' on the
    RAW column (exactly equivalent to w_tokens > 0 for a
    split-on-space tokenizer) rather than a filter on the computed
    w_tokens: predicate pushdown would substitute the latter through
    the projection and re-run the whole split per row in the scan
    filter (the ROUND_CHECKLIST predicate-substitution trap) — this
    way the tokenization is evaluated once and the scan filter stays
    cheap."""
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull() & (F.trim(F.col("text")) != "")
    )
    toks = F.filter(F.split(F.trim(F.col("text")), " "), lambda x: x != "")
    t = d.select("doc_id", "source", F.size(toks).cast("bigint").alias("w_tokens"))
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit("ps_"), F.col("doc_id").cast("string"))), 1, 12),
        16,
        10,
    ).cast("bigint")
    u = (h + F.lit(0.5)) / F.lit(281474976710656.0)
    k = t.select(
        "doc_id",
        "source",
        "w_tokens",
        F.round(F.lit(1000000.0) * F.log(u) / F.col("w_tokens"), 0)
        .cast("bigint")
        .alias("key_micro"),
    )
    w = Window.partitionBy("source").orderBy(F.col("key_micro").desc(), "doc_id")
    return (
        k.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= PS_K)
        .select("source", "doc_id", "w_tokens", "key_micro", "rnk")
    )


@register(
    "corpus_source_kl_divergence",
    oracle="""
    WITH d AS (
      SELECT source, lang FROM documents
      WHERE source IS NOT NULL AND lang IS NOT NULL),
    tot AS (SELECT COUNT(*) AS n FROM d),
    per_l AS (SELECT lang, COUNT(*) AS n_l FROM d GROUP BY lang),
    per_s AS (SELECT source, COUNT(*) AS n_s FROM d GROUP BY source),
    per_sl AS (SELECT source, lang, COUNT(*) AS n_sl
               FROM d GROUP BY source, lang),
    terms AS (
      SELECT sl.source, s.n_s,
             CAST(ROUND(
               (CAST(sl.n_sl AS DOUBLE) / s.n_s)
               * ln((CAST(sl.n_sl AS DOUBLE) / s.n_s)
                    / (CAST(l.n_l AS DOUBLE) / t.n)) * 1000000000, 0)
               AS BIGINT) AS term_nano
      FROM per_sl sl
      JOIN per_s s ON sl.source = s.source
      JOIN per_l l ON sl.lang = l.lang
      CROSS JOIN tot t)
    SELECT source, n_s AS n_docs,
           round(CAST(SUM(term_nano) AS DOUBLE) / 1000000000.0, 6)
             AS kl_divergence
    FROM terms GROUP BY source, n_s
    """,
    tags=("llm", "curation", "statistics"),
)
def corpus_source_kl_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source KL divergence between the source's language
    distribution and the corpus-wide one: KL(P_source ‖ P_corpus) =
    Σ_lang p(lang|source)·ln(p(lang|source)/p(lang)) — the drift score
    a curation pipeline watches to spot sources whose composition has
    shifted from the mix the model was tuned on (0 = identical mix).

    Exactness: all probabilities come from exact integer counts via
    identical division trees; each KL term is rounded to integer
    nano-units BEFORE the per-source sum so the fold is
    order-independent; ln differs by ≤1 ulp across engines, absorbed
    by the nano rounding + final round-6. KL ≥ 0 within rounding, and
    every term with n_sl > 0 is finite (p > 0 ⇒ q > 0 since the
    corpus marginal dominates). Scale: three count aggregates over one
    scan; the term join runs on (sources × langs) cells — broadcast-
    sized dimension tables, never the document table."""
    d = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("source").isNotNull() & F.col("lang").isNotNull())
        .select("source", "lang")
    )
    tot = d.agg(F.count("*").alias("n"))
    per_l = d.groupBy("lang").agg(F.count("*").alias("n_l"))
    per_s = d.groupBy("source").agg(F.count("*").alias("n_s"))
    per_sl = d.groupBy("source", "lang").agg(F.count("*").alias("n_sl"))
    p_sl = F.col("n_sl").cast("double") / F.col("n_s")
    p_l = F.col("n_l").cast("double") / F.col("n")
    terms = (
        per_sl.join(per_s, "source")
        .join(F.broadcast(per_l), "lang")
        .crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_s",
            F.round(p_sl * F.log(p_sl / p_l) * 1000000000, 0)
            .cast("bigint")
            .alias("term_nano"),
        )
    )
    return terms.groupBy("source", "n_s").agg(
        F.round(F.sum("term_nano").cast("double") / 1000000000.0, 6).alias(
            "kl_divergence"
        )
    ).select(F.col("source"), F.col("n_s").alias("n_docs"), "kl_divergence")


@register(
    "corpus_dedup_rate_by_source",
    oracle="""
    WITH c AS (
      SELECT doc_id, source,
             md5(array_to_string(list_sort(list_distinct(
                 string_split(trim(lower(text)), ' '))), ' ')) AS canon
      -- NULL text can't fingerprint, NULL doc_id can't take the
      -- deterministic keep-first slot: excluded in BOTH engines
      FROM documents WHERE text IS NOT NULL AND doc_id IS NOT NULL),
    r AS (
      SELECT source,
             row_number() OVER (PARTITION BY canon ORDER BY doc_id) > 1
               AS is_dup
      FROM c)
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN is_dup THEN 1 ELSE 0 END) AS BIGINT) AS n_dups,
           round(CAST(SUM(CASE WHEN is_dup THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 6) AS dup_rate
    FROM r GROUP BY source
    """,
    tags=("llm", "curation", "dedup", "monitoring"),
)
def corpus_dedup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source exact-duplicate rate — the data-card number every
    curation report leads with: docs are fingerprinted by canonical
    token-set hash (the text_fingerprint canon), every fingerprint's
    lowest-id doc is the original, and the rest count as duplicates
    against THEIR OWN source — so a source that re-crawls content
    first seen elsewhere is the one charged for it.

    Exactness: integer counts and one rounded division; keep-first is
    the deterministic lowest-doc_id rule shared by the whole dedup
    family. Scale: one scan, one shuffle on the fingerprint for the
    keep-first window, one map-side-combinable rollup on source —
    the same single-shuffle shape as dedup_exact."""
    from pyspark.sql import Window

    d = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull() & F.col("doc_id").isNotNull())
        .select(
            "doc_id",
            "source",
            F.md5(
                F.array_join(
                    F.array_sort(
                        F.array_distinct(
                            F.split(F.trim(F.lower(F.col("text"))), " ")
                        )
                    ),
                    " ",
                )
            ).alias("canon"),
        )
    )
    w = Window.partitionBy("canon").orderBy("doc_id")
    r = d.select(
        "source", (F.row_number().over(w) > 1).alias("is_dup")
    )
    return r.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum(F.when(F.col("is_dup"), 1).otherwise(0)).cast("bigint").alias(
            "n_dups"
        ),
        F.round(
            F.sum(F.when(F.col("is_dup"), 1).otherwise(0)).cast("double")
            / F.count("*"),
            6,
        ).alias("dup_rate"),
    )


@register(
    "corpus_tokenizer_fertility",
    oracle=r"""
    -- tokenizer fertility by language: subword tokens per whitespace
    -- word (the metric that decides whether a tokenizer is usable for
    -- a language) + chars per subword, using the same whitespace and
    -- BPE-ish segmentations as text_token_count.
    WITH t AS (
      SELECT lang,
             len(string_split_regex(trim(text), '\s+')) AS ws,
             len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]'))
               AS bpe,
             length(replace(text, ' ', '')) AS chars
      FROM documents WHERE text IS NOT NULL AND lang IS NOT NULL)
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(ws) AS BIGINT) AS ws_tokens,
           CAST(SUM(bpe) AS BIGINT) AS subword_tokens,
           CAST(SUM(chars) AS BIGINT) AS n_chars,
           CAST(SUM(bpe) * 1000000 // SUM(ws) AS BIGINT) AS fertility_ppm,
           CASE WHEN SUM(bpe) = 0 THEN 0
                ELSE CAST(SUM(chars) * 1000000 // SUM(bpe) AS BIGINT)
           END AS chars_per_subword_ppm
    FROM t GROUP BY lang
    """,
    tags=("llm", "corpus", "text"),
)
def corpus_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-fertility audit per language: subword tokens per
    whitespace word (fertility) and characters per subword —
    the go/no-go numbers for a tokenizer across languages (high
    fertility = the language pays more context window per word).
    Segmentations reuse text_token_count's whitespace and BPE-ish
    definitions, so the audit is consistent with the engine's token
    budgeting ops.

    Exactness: all counts are exact integers; ratios are integer-ppm
    floor divisions (whitespace split of a trimmed doc is never empty,
    so fertility never divides by zero; the all-punctuation-free
    zero-subword edge is guarded identically in both engines).

    Scale: one map pass (two regex counts per doc) + one lang-keyed
    aggregate with map-side combine."""
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull() & F.col("lang").isNotNull()
    )
    t = d.select(
        "lang",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("ws"),
        F.regexp_count(F.col("text"), F.lit(r"[a-z]+|[0-9]+|[^a-z0-9 ]")).alias(
            "bpe"
        ),
        F.length(F.regexp_replace("text", " ", "")).alias("chars"),
    )
    return t.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("ws").cast("bigint").alias("ws_tokens"),
        F.sum("bpe").cast("bigint").alias("subword_tokens"),
        F.sum("chars").cast("bigint").alias("n_chars"),
        F.expr("CAST(SUM(bpe) * 1000000 div SUM(ws) AS BIGINT)").alias(
            "fertility_ppm"
        ),
        F.expr(
            "CASE WHEN SUM(bpe) = 0 THEN 0"
            " ELSE CAST(SUM(chars) * 1000000 div SUM(bpe) AS BIGINT) END"
        ).alias("chars_per_subword_ppm"),
    )


CONTEXT_WINDOWS = (512, 2048, 8192)


@register(
    "corpus_context_window_fit",
    oracle=f"""
    -- context-window planning: per candidate window size, how much of
    -- the corpus fits whole, how many tokens truncation would drop,
    -- and how many packed chunks the corpus needs.
    WITH t AS (
      SELECT len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]'))
               AS toks
      FROM documents WHERE text IS NOT NULL),
    w AS (SELECT unnest([{', '.join(str(w) for w in CONTEXT_WINDOWS)}])
            AS window_tokens),
    j AS (
      SELECT w.window_tokens, t.toks,
             CASE WHEN t.toks <= w.window_tokens THEN 1 ELSE 0 END AS fits,
             CASE WHEN t.toks > w.window_tokens
                  THEN t.toks - w.window_tokens ELSE 0 END AS dropped,
             CASE WHEN t.toks = 0 THEN 0
                  ELSE (t.toks + w.window_tokens - 1) // w.window_tokens
             END AS chunks
      FROM t CROSS JOIN w)
    SELECT CAST(window_tokens AS BIGINT) AS window_tokens,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(fits) AS BIGINT) AS n_fit,
           CAST(SUM(fits) * 1000000 // COUNT(*) AS BIGINT) AS fit_ppm,
           CAST(SUM(toks) AS BIGINT) AS total_tokens,
           CAST(SUM(dropped) AS BIGINT) AS tokens_dropped,
           CASE WHEN SUM(toks) = 0 THEN 0
                ELSE CAST(SUM(dropped) * 1000000 // SUM(toks) AS BIGINT)
           END AS dropped_ppm,
           CAST(SUM(chunks) AS BIGINT) AS n_chunks
    FROM j GROUP BY window_tokens
    """,
    tags=("llm", "corpus", "training"),
)
def corpus_context_window_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window fit audit: for each candidate window size
    (512/2048/8192 BPE-ish tokens), the share of documents that fit
    whole, the tokens truncation would drop (and its corpus share),
    and the chunk count a pack-into-windows pipeline would emit — the
    table that decides a training run's sequence length and packing
    strategy before any tokenization job is launched.

    Exactness: token counts and all aggregates are exact integers;
    shares are integer-ppm floor divisions with the zero-corpus guard
    mirrored in both engines.

    Scale: one map pass per doc, a constant 3-row window spine
    (broadcast nested loop against a literal array — never a data
    join), one aggregate to 3 rows."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    t = d.select(
        F.regexp_count(F.col("text"), F.lit(r"[a-z]+|[0-9]+|[^a-z0-9 ]")).alias(
            "toks"
        )
    )
    j = t.select(
        "toks",
        F.explode(
            F.array(*[F.lit(w) for w in CONTEXT_WINDOWS])
        ).alias("window_tokens"),
    ).select(
        "window_tokens",
        "toks",
        F.when(F.col("toks") <= F.col("window_tokens"), 1).otherwise(0).alias(
            "fits"
        ),
        F.when(
            F.col("toks") > F.col("window_tokens"),
            F.col("toks") - F.col("window_tokens"),
        )
        .otherwise(0)
        .alias("dropped"),
        F.when(F.col("toks") == 0, 0)
        .otherwise(
            F.expr("(toks + window_tokens - 1) div window_tokens")
        )
        .alias("chunks"),
    )
    return j.groupBy("window_tokens").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("fits").cast("bigint").alias("n_fit"),
        F.expr("CAST(SUM(fits) * 1000000 div COUNT(*) AS BIGINT)").alias(
            "fit_ppm"
        ),
        F.sum("toks").cast("bigint").alias("total_tokens"),
        F.sum("dropped").cast("bigint").alias("tokens_dropped"),
        F.expr(
            "CASE WHEN SUM(toks) = 0 THEN 0"
            " ELSE CAST(SUM(dropped) * 1000000 div SUM(toks) AS BIGINT) END"
        ).alias("dropped_ppm"),
        F.sum("chunks").cast("bigint").alias("n_chunks"),
    ).select(
        F.col("window_tokens").cast("bigint").alias("window_tokens"),
        "n_docs",
        "n_fit",
        "fit_ppm",
        "total_tokens",
        "tokens_dropped",
        "dropped_ppm",
        "n_chunks",
    )


# Bounded pseudo-benchmark for span decontamination: eval docs are the
# FIXED id range (doc_id % EVAL_MOD == 0 AND doc_id <= cap). Unlike a
# corpus-fraction eval set, this is what a real decontamination run
# probes — a benchmark suite of constant size — so its gram table is
# broadcastable at ANY corpus scale (the stress replicas take ids
# offset by 1e9, so the eval set stays exactly the original slice).
DECON_EVAL_ID_CAP = int(os.environ.get("SHSS_DECON_EVAL_ID_CAP", "2000"))
_DECON_EVAL_SQL = f"(doc_id % {EVAL_MOD} = 0 AND doc_id <= {DECON_EVAL_ID_CAP})"


@register(
    "corpus_decontam_span_removal",
    oracle=f"""
    -- span-level decontamination: instead of dropping whole training
    -- docs that share a 5-gram with the eval set, mask exactly the
    -- covered token positions and keep the rest. clean_md5 pins the
    -- reconstructed text, so the driver hash certifies the surgery,
    -- not just the counts. The eval set is the BOUNDED pseudo-suite
    -- {_DECON_EVAL_SQL} (fixed size at any corpus scale).
    WITH toks AS (
      SELECT doc_id, string_split(trim(text), ' ') AS tk FROM documents),
    base AS (SELECT doc_id, tk FROM toks WHERE len(tk) >= {NGRAM}),
    ev AS (
      SELECT DISTINCT
             md5(array_to_string(tk[i:i+{NGRAM - 1}], ' ')) AS h
      FROM base, unnest(generate_series(1, len(tk) - {NGRAM - 1})) t(i)
      WHERE {_DECON_EVAL_SQL}),
    tr AS (SELECT doc_id, tk FROM base WHERE NOT {_DECON_EVAL_SQL}),
    g AS (
      SELECT doc_id, i,
             md5(array_to_string(tk[i:i+{NGRAM - 1}], ' ')) AS h
      FROM tr, unnest(generate_series(1, len(tk) - {NGRAM - 1})) t(i)),
    matched AS (SELECT g.doc_id, g.i FROM g JOIN ev USING (h)),
    covered AS (
      SELECT DISTINCT doc_id, pos
      FROM matched, unnest(generate_series(i, i + {NGRAM - 1})) t(pos)),
    runs AS (
      SELECT doc_id,
             CAST(COUNT(DISTINCT grp) AS BIGINT) AS n_spans,
             CAST(COUNT(*) AS BIGINT) AS tokens_removed
      FROM (SELECT doc_id, pos,
                   pos - row_number() OVER (PARTITION BY doc_id
                                            ORDER BY pos) AS grp
            FROM covered)
      GROUP BY doc_id),
    allpos AS (
      SELECT doc_id, i AS pos, tk[i] AS tok
      FROM tr, unnest(generate_series(1, len(tk))) t(i)),
    kept AS (
      SELECT a.doc_id, a.pos, a.tok
      FROM allpos a LEFT JOIN covered c
        ON c.doc_id = a.doc_id AND c.pos = a.pos
      WHERE c.pos IS NULL),
    clean AS (
      SELECT doc_id, md5(string_agg(tok, ' ' ORDER BY pos)) AS clean_md5
      FROM kept GROUP BY doc_id)
    SELECT tr.doc_id,
           CAST(len(tr.tk) AS BIGINT) AS n_tokens,
           COALESCE(r.n_spans, 0) AS n_spans,
           COALESCE(r.tokens_removed, 0) AS tokens_removed,
           CAST(len(tr.tk) - COALESCE(r.tokens_removed, 0) AS BIGINT)
             AS clean_tokens,
           COALESCE(c.clean_md5, md5('')) AS clean_md5,
           COALESCE(r.tokens_removed, 0) > 0 AS contaminated
    FROM tr LEFT JOIN runs r USING (doc_id) LEFT JOIN clean c USING (doc_id)
    """,
    tags=("llm", "curation", "contamination"),
)
def corpus_decontam_span_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level decontamination (the Dolma/FineWeb upgrade over
    whole-doc dropping): every training-doc token position covered by
    a 5-gram that also appears in the eval suite is masked; the rest
    of the document survives. Per training doc the report carries
    token count, the number of maximal removed spans, tokens
    removed/kept, and the md5 of the reconstructed clean text — so
    the oracle certifies the actual surgery byte-for-byte, not just
    the counts.

    r11 rework (VERDICT r10 item 7 — was the #1 ×100 stress cost at
    54.2 s):

    - The eval set is the BOUNDED pseudo-benchmark (fixed doc-id
      slice, constant size at any corpus scale — what a real
      decontamination run probes), so its distinct gram-digest table
      carries an explicit broadcast hint: the probe is a map-side
      broadcast hash join; the corpus grams never shuffle
      (plan-pinned in tests/test_plans.py). The hint sits on an
      Aggregate (DISTINCT) subtree per the bounded-broadcast rule.
    - Training-side gram digests are 60-bit token-hash chains
      (masked multiply-add over per-token md5 halves — the r11
      MinHash scheme, see dedup._hx_frame): the 5-gram STRING never
      materializes. Digests are internal (never output), so the
      oracle keeps md5-over-gram-string — the matched sets agree
      modulo a ~2^-60 collision.
    - The surgery is PER-ROW array math: matched gram starts
      aggregate to one small (doc_id, hits) relation, join back to
      the token arrays, and covered positions / span runs /
      reconstruction all compute inside one projection — the
      token-position explode + anti-join + corpus-wide
      collect_list(tokens) shuffle of the old shape are gone.

    Exactness: covered-position sets, span runs, and the
    position-ordered reconstruction are exact integer/string ops;
    clean_md5 hashes the reconstructed text itself."""
    from ..io import parallelize_scan

    d = parallelize_scan(load_table(spark, sf_dir, "documents"))
    tk = F.split(F.trim(F.col("text")), " ")
    base = d.select("doc_id", tk.alias("tk")).filter(F.size("tk") >= NGRAM)
    is_eval = (F.col("doc_id") % EVAL_MOD == 0) & (
        F.col("doc_id") <= DECON_EVAL_ID_CAP
    )

    M60 = (1 << 60) - 1

    def gram_digests(docs: DataFrame) -> DataFrame:
        # (doc_id, i, h): 1-based gram start + 60-bit token-hash chain.
        # Token hashes materialize in their own projection (referenced
        # NGRAM× by the gram lambda — inlining would re-run all n
        # token md5s per gram, O(n²); see dedup._hx_frame).
        t1 = docs.select(
            "doc_id",
            F.size("tk").alias("_n"),
            F.transform(
                F.col("tk"),
                lambda t: F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast(
                    "bigint"
                ),
            ).alias("_th"),
        )
        th = F.col("_th")

        def chain(i: Column) -> Column:
            # polynomial accumulator: h = 3^4·t1 + 3^3·t2 + … + t5
            # (masked to 60 bits between steps) — the ACCUMULATOR is
            # scaled each step, so every position carries a distinct
            # coefficient; scaling only the incoming token would make
            # middle-token ORDER invisible (measured: 18 false matches
            # at sf0.01). Overflow-safe: 3·(h&M60)+t < 2^62+2^60 < 2^63.
            h = F.element_at(th, i)
            for off in range(1, NGRAM):
                h = F.lit(3) * h.bitwiseAND(F.lit(M60)) + F.element_at(
                    th, i + F.lit(off)
                )
            return h.bitwiseAND(F.lit(M60))

        return t1.select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.col("_n") - (NGRAM - 1)),
                    lambda i: F.struct(i.alias("i"), chain(i).alias("h")),
                )
            ).alias("g"),
        ).select("doc_id", F.col("g.i").alias("i"), F.col("g.h").alias("h"))

    # the eval suite is bounded → its distinct digest table broadcasts.
    # groupBy, not .distinct(): distinct renders as Deduplicate in the
    # hinted logical subtree, and the bounded-broadcast rule
    # (test_no_static_broadcast_of_sf_scaling_tables) recognizes
    # Aggregate/GlobalLimit as the size-invariant shapes
    ev = F.broadcast(
        gram_digests(base.filter(is_eval))
        .groupBy("h")
        .agg(F.count(F.lit(1)).alias("_c"))
        .select("h")
    )
    tr = base.filter(~is_eval)
    # map-side probe: corpus grams never shuffle; only matched gram
    # starts (contaminated docs only) reach the aggregation
    hits = (
        gram_digests(tr)
        .join(ev, "h")
        .groupBy("doc_id")
        .agg(F.collect_list("i").alias("hits"))
    )
    # per-row surgery: covered set, span runs, reconstruction — all in
    # one projection over the token arrays; `cov` materializes first
    # (referenced by three expressions below)
    j = tr.join(hits, "doc_id", "left")
    j = j.withColumn(
        "cov",
        F.array_sort(
            F.array_distinct(
                F.flatten(
                    F.transform(
                        F.coalesce("hits", F.array().cast("array<int>")),
                        lambda i: F.sequence(i, i + (NGRAM - 1)),
                    )
                )
            )
        ),
    )
    cov = F.col("cov")
    # span starts: position whose predecessor is not covered. The
    # element_at index is clamped to >= 1 so the idx == 0 element never
    # references array index 0 even if an engine/ANSI change stops Or
    # from short-circuiting (element_at raises on index 0); for idx == 0
    # the clamped comparison cov[0] != cov[0] + 1 is vacuously true, so
    # the clamp is semantics-free (ADVICE r11).
    n_spans = F.size(
        F.filter(
            cov,
            lambda x, idx: (idx == 0)
            | (x != F.element_at(cov, F.greatest(idx, F.lit(1))) + 1),
        )
    ).cast("bigint")
    removed = F.size(cov).cast("bigint")
    # Linear surgery (r13, closes ADVICE r11 item 3): cov is sorted and
    # distinct, so the KEPT positions are exactly the gaps between
    # consecutive covered positions — materialized as one
    # flatten(transform(...)) over |cov|+1 gap runs (total emitted
    # length = n_kept), then a positional fetch per kept token:
    # O(n + |cov|) per row, replacing the array_contains scan per token
    # (O(n·|cov|)) that a long, heavily-contaminated document would
    # regress. CASE branches evaluate lazily, so element_at never sees
    # index 0 or an out-of-bounds index (ANSI-safe); the gap sequence
    # is guarded lo <= hi because Spark's sequence() DESCENDS when
    # hi < lo.
    n_toks = F.size("tk")
    nc = F.size(cov)

    def _gap(k: Column) -> Column:
        lo = F.when(k == 0, F.lit(1)).otherwise(F.element_at(cov, k) + 1)
        hi = F.when(k == nc, n_toks).otherwise(F.element_at(cov, k + 1) - 1)
        return F.when(lo <= hi, F.sequence(lo, hi)).otherwise(
            F.array().cast("array<int>")
        )

    kept_toks = F.transform(
        F.flatten(F.transform(F.sequence(F.lit(0), nc), _gap)),
        lambda p: F.element_at(F.col("tk"), p),
    )
    return j.select(
        "doc_id",
        F.size("tk").cast("bigint").alias("n_tokens"),
        n_spans.alias("n_spans"),
        removed.alias("tokens_removed"),
        (F.size("tk") - removed).cast("bigint").alias("clean_tokens"),
        F.md5(F.array_join(kept_toks, " ")).alias("clean_md5"),
        (removed > 0).alias("contaminated"),
    )


DUP_NGRAM = int(os.environ.get("SHSS_DUP_NGRAM", "8"))


@register(
    "corpus_ngram_duplication_rate",
    oracle=f"""
    -- the Lee et al. (2022, "Deduplicating Training Data Makes
    -- Language Models Better") memorization-risk metric: what
    -- fraction of {DUP_NGRAM}-gram OCCURRENCES belong to a gram that
    -- appears 2+ times corpus-wide, reported per source. A source
    -- with a high duplicated-occurrence rate is recycling text the
    -- model will memorize rather than learn from.
    WITH t AS (
      SELECT source, string_split(trim(text), ' ') AS tk FROM documents),
    g AS (
      SELECT source,
             md5(array_to_string(tk[i:i+{DUP_NGRAM - 1}], ' ')) AS h
      FROM t, unnest(generate_series(1, len(tk) - {DUP_NGRAM - 1})) u(i)),
    c AS (SELECT h, COUNT(*) AS cnt FROM g GROUP BY h)
    SELECT g.source,
           CAST(COUNT(*) AS BIGINT) AS n_occurrences,
           CAST(SUM(CASE WHEN c.cnt >= 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_duplicated,
           CAST(round(1000000.0
                      * SUM(CASE WHEN c.cnt >= 2 THEN 1 ELSE 0 END)
                      / COUNT(*), 0) AS BIGINT) AS dup_rate_ppm
    FROM g JOIN c USING (h)
    GROUP BY g.source
    """,
    tags=("llm", "curation", "dedup"),
)
def corpus_ngram_duplication_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source n-gram duplication rate — the corpus-health number
    behind "dedup your data": of all {DUP_NGRAM}-gram occurrences a
    source contributes, how many are copies (their gram occurs >= 2
    times anywhere in the corpus). Unlike the pairwise dedup ops this
    is a RATE over occurrences, not a pair list — the audit you run
    FIRST to decide how aggressively to dedup each source.

    Exactness: gram identity is the 60-bit token-hash polynomial chain
    (internal only — the oracle uses md5 over the gram string; the
    duplicate structure agrees modulo a ~2^-60 collision); counts are
    exact bigints and the rate rounds once to ppm.

    Scale: one corpus postings pass (token md5s once per token, grams
    as integer chains — the gram string never materializes), then ONE
    occurrence shuffle: grams pre-aggregate to the (h, source) TYPE
    table with map-side combine (duplicated grams collapse before the
    wire — the r11 shape shuffled raw occurrences twice because column
    pruning broke the intended ReuseExchange diamond). The corpus-wide
    count is a sum-window over the type table partitioned by h — each
    h holds at most |sources| type rows, so nothing buffers (unlike
    the measured-dead count-window over raw postings, BASELINE.md);
    the final rollup is per-source (tiny)."""
    from ..io import parallelize_scan

    d = parallelize_scan(load_table(spark, sf_dir, "documents"))
    tk = F.split(F.trim(F.col("text")), " ")
    t1 = d.select(
        "source",
        F.size(tk).alias("_n"),
        F.transform(
            tk,
            lambda t: F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast(
                "bigint"
            ),
        ).alias("_th"),
    )
    th = F.col("_th")
    M60 = (1 << 60) - 1

    def chain(i: Column) -> Column:
        # polynomial accumulator (see corpus_decontam_span_removal):
        # scale the ACCUMULATOR each step so position matters
        h = F.element_at(th, i)
        for off in range(1, DUP_NGRAM):
            h = F.lit(3) * h.bitwiseAND(F.lit(M60)) + F.element_at(
                th, i + F.lit(off)
            )
        return h.bitwiseAND(F.lit(M60))

    grams_arr = F.when(
        F.col("_n") >= DUP_NGRAM,
        F.transform(
            F.sequence(F.lit(1), F.col("_n") - (DUP_NGRAM - 1)),
            lambda i: chain(i),
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    g = t1.select("source", F.explode(grams_arr).alias("h"))
    gs = g.groupBy("h", "source").agg(F.count("*").alias("occ"))
    j = gs.withColumn(
        "cnt", F.sum("occ").over(Window.partitionBy("h"))
    )
    dup = F.sum(F.when(F.col("cnt") >= 2, F.col("occ")).otherwise(0)).cast(
        "bigint"
    )
    occ = F.sum("occ").cast("bigint")
    return j.groupBy("source").agg(
        occ.alias("n_occurrences"),
        dup.alias("n_duplicated"),
        F.round(F.lit(1_000_000.0) * dup / occ, 0)
        .cast("bigint")
        .alias("dup_rate_ppm"),
    )


TAIL_MAX_COUNT = 2  # "rare" = corpus-wide type count <= this (hapax + dis)


@register(
    "corpus_token_tail_mass",
    oracle=f"""
    -- vocabulary-health audit per source: how much of a source's token
    -- MASS sits in corpus-rare types (count <= {TAIL_MAX_COUNT}:
    -- hapax + dis legomena). A high tail mass means the tokenizer will
    -- shatter this source into byte fallbacks / the model sees
    -- many once-off strings (typos, IDs, boilerplate noise) — the
    -- Zipf-tail counterpart to the duplication-rate audit's head.
    -- hapax_types is exact per source because a count-1 type's single
    -- occurrence has exactly one source.
    WITH t AS (
      SELECT source, unnest(string_split(trim(text), ' ')) AS w
      FROM documents WHERE text IS NOT NULL),
    g AS (SELECT source, w, COUNT(*) AS occ FROM t GROUP BY source, w),
    c AS (SELECT w, CAST(SUM(occ) AS BIGINT) AS cnt FROM g GROUP BY w)
    SELECT g.source,
           CAST(SUM(g.occ) AS BIGINT) AS n_occurrences,
           CAST(COUNT(*) AS BIGINT) AS n_types,
           CAST(SUM(CASE WHEN c.cnt <= {TAIL_MAX_COUNT} THEN g.occ
                         ELSE 0 END) AS BIGINT) AS tail_occurrences,
           CAST(round(1000000.0
                      * SUM(CASE WHEN c.cnt <= {TAIL_MAX_COUNT} THEN g.occ
                            ELSE 0 END)
                      / SUM(g.occ), 0) AS BIGINT) AS tail_mass_ppm,
           CAST(SUM(CASE WHEN c.cnt = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS hapax_types
    FROM g JOIN c USING (w)
    GROUP BY g.source
    """,
    tags=("llm", "curation", "text", "audit"),
)
def corpus_token_tail_mass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source rare-token tail mass — the OOV-risk audit a tokenizer
    team runs before committing a vocab: the share of a source's token
    occurrences belonging to corpus-wide rare types (count <=
    {TAIL_MAX_COUNT}), its distinct-type count, and its hapax count
    (types the rest of the corpus never sees). Complements
    corpus_ngram_duplication_rate: that op audits the duplicated HEAD
    of the frequency curve, this one audits the unlearnable TAIL.

    Exactness: all counts are exact bigints; the single divide rounds
    once to ppm.

    Scale: the proven duplication-rate shape — tokens explode ONCE and
    pre-aggregate to the (w, source) type table with map-side combine
    (one occurrence-scale shuffle), the corpus-wide type count is a
    sum-window over that type table (<= |sources| rows per w, never
    postings), and the rollup keys on source (tiny)."""
    from ..io import parallelize_scan

    d = parallelize_scan(load_table(spark, sf_dir, "documents")).filter(
        F.col("text").isNotNull()
    )
    g = (
        d.select("source", F.explode(F.split(F.trim(F.col("text")), " ")).alias("w"))
        .groupBy("w", "source")
        .agg(F.count("*").alias("occ"))
    )
    j = g.withColumn("cnt", F.sum("occ").over(Window.partitionBy("w")))
    tail = F.sum(
        F.when(F.col("cnt") <= TAIL_MAX_COUNT, F.col("occ")).otherwise(0)
    ).cast("bigint")
    occ_all = F.sum("occ").cast("bigint")
    return j.groupBy("source").agg(
        occ_all.alias("n_occurrences"),
        F.count("*").cast("bigint").alias("n_types"),
        tail.alias("tail_occurrences"),
        F.round(F.lit(1_000_000.0) * tail / occ_all, 0)
        .cast("bigint")
        .alias("tail_mass_ppm"),
        F.sum(F.when(F.col("cnt") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("hapax_types"),
    )


@register(
    "corpus_source_unigram_kl",
    oracle="""
    -- data-mixture drift audit: KL(source unigram distribution ||
    -- corpus distribution) per source, in summed micro-nat terms.
    -- The number a mixture tuner watches — a source whose token
    -- distribution diverges hard from the pool dominates or starves
    -- under temperature sampling. Exactness: one double multiply
    -- chain + ln per TYPE, rounded once to integer micro-nats, then
    -- integer-summed (no float accumulation order).
    WITH t AS (
      SELECT source, unnest(string_split(trim(text), ' ')) AS w
      FROM documents WHERE text IS NOT NULL),
    g AS (SELECT source, w, CAST(COUNT(*) AS BIGINT) AS c_ws
          FROM t GROUP BY source, w),
    s AS (SELECT source, CAST(SUM(c_ws) AS BIGINT) AS n_s
          FROM g GROUP BY source),
    c AS (SELECT w, CAST(SUM(c_ws) AS BIGINT) AS c_w FROM g GROUP BY w),
    n AS (SELECT CAST(SUM(c_ws) AS BIGINT) AS n_all FROM g),
    terms AS (
      SELECT g.source,
             CAST(round(1000000.0 * g.c_ws / s.n_s
                        * ln((CAST(g.c_ws AS DOUBLE) * n.n_all)
                             / (CAST(s.n_s AS DOUBLE) * c.c_w)), 0)
                  AS BIGINT) AS term_unats
      FROM g
      JOIN s ON s.source IS NOT DISTINCT FROM g.source
      JOIN c USING (w) CROSS JOIN n)
    SELECT s.source, s.n_s AS n_tokens,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM g g2
            WHERE g2.source IS NOT DISTINCT FROM s.source) AS n_types,
           (SELECT CAST(SUM(term_unats) AS BIGINT) FROM terms tm
            WHERE tm.source IS NOT DISTINCT FROM s.source)
             AS kl_micro_nats
    FROM s
    """,
    tags=("llm", "curation", "text", "audit"),
)
def corpus_source_unigram_kl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source unigram KL divergence against the corpus-wide token
    distribution — the drift statistic behind data-mixture tuning
    (DoReMi-style reweighting starts from exactly this table): a
    source with near-zero KL is redundant with the pool; a high-KL
    source shifts the mixture. Reported as summed integer micro-nat
    terms with the source's token and type mass.

    Exactness: every term is one double expression (mirrored
    operation-for-operation in the oracle: (1e6·c_ws/n_s)·ln((c_ws·N)/
    (n_s·c_w))) rounded ONCE, then integer-summed — no float
    accumulation order to disagree on.

    Scale: the proven type-table shape — tokens explode ONCE into the
    map-side-combined (w, source) table; the corpus-wide type count is
    a sum-window over it (<= |sources| rows per w); per-source totals
    are a |sources|-row aggregate joined back via broadcast; N is a
    1-row broadcast scalar."""
    from ..io import parallelize_scan

    d = parallelize_scan(load_table(spark, sf_dir, "documents")).filter(
        F.col("text").isNotNull()
    )
    g = (
        d.select(
            "source", F.explode(F.split(F.trim(F.col("text")), " ")).alias("w")
        )
        .groupBy("w", "source")
        .agg(F.count("*").cast("bigint").alias("c_ws"))
    )
    j = g.withColumn(
        "c_w", F.sum("c_ws").over(Window.partitionBy("w")).cast("bigint")
    )
    s = g.groupBy("source").agg(F.sum("c_ws").cast("bigint").alias("n_s"))
    n = g.agg(F.sum("c_ws").cast("bigint").alias("n_all"))
    # NULL-SAFE join: a NULL source is a legitimate group (the oracle
    # joins IS NOT DISTINCT FROM); a plain equi-join would (a) drop it
    # and (b) infer isnotnull(source) into ONE branch of the g diamond,
    # splitting the shared gram stage (the perplexity-audit lesson)
    terms = (
        j.join(
            F.broadcast(s.withColumnRenamed("source", "_src")),
            F.col("source").eqNullSafe(F.col("_src")),
        )
        .drop("_src")
        .crossJoin(F.broadcast(n))
        .select(
            "source",
            "c_ws",
            F.round(
                F.lit(1_000_000.0)
                * F.col("c_ws")
                / F.col("n_s")
                * F.log(
                    (F.col("c_ws").cast("double") * F.col("n_all"))
                    / (F.col("n_s").cast("double") * F.col("c_w"))
                ),
                0,
            )
            .cast("bigint")
            .alias("term_unats"),
        )
    )
    return terms.groupBy("source").agg(
        F.sum("c_ws").cast("bigint").alias("n_tokens"),
        F.count("*").cast("bigint").alias("n_types"),
        F.sum("term_unats").cast("bigint").alias("kl_micro_nats"),
    )


HH_NGRAM = int(os.environ.get("SHSS_HH_NGRAM", "3"))
HH_K = int(os.environ.get("SHSS_HH_K", "5000"))


@register(
    "corpus_boilerplate_heavy_hitters",
    oracle=f"""
    -- phrase-level boilerplate detector: every {HH_NGRAM}-gram whose
    -- occurrence count exceeds 1/{HH_K} of all {HH_NGRAM}-gram
    -- occurrences, with its exact count, doc spread, and corpus
    -- share. The frequency-HEAD audit (navboxes, license headers,
    -- scraper artifacts) that complements the dedup ops' pairwise
    -- view — run before writing removal rules.
    WITH t AS (
      SELECT doc_id, string_split(trim(text), ' ') AS tk
      FROM documents WHERE text IS NOT NULL),
    g AS (
      SELECT doc_id, array_to_string(tk[i:i+{HH_NGRAM - 1}], ' ') AS gram
      FROM t, unnest(generate_series(1, len(tk) - {HH_NGRAM - 1})) u(i)),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_occ FROM g)
    SELECT gram,
           CAST(COUNT(*) AS BIGINT) AS n_occurrences,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(round(1000000.0 * COUNT(*) / n.n_occ, 0) AS BIGINT)
             AS share_ppm
    FROM g CROSS JOIN n
    GROUP BY gram, n.n_occ
    HAVING COUNT(*) * {HH_K} > n.n_occ
    """,
    tags=("llm", "curation", "sketch", "text"),
)
def corpus_boilerplate_heavy_hitters(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Exact corpus heavy hitters through a bounded-memory sketch: the
    {HH_NGRAM}-grams holding > 1/{HH_K} of all gram occurrences
    (boilerplate: license headers, navigation chrome, scraper
    artifacts). Two passes:

    1. SKETCH — per partition, a mergeable Misra-Gries summary of
       capacity {HH_K}-1 over the 60-bit token-chain gram digests
       (mapInPandas: pandas value_counts per Arrow batch folded into
       the running summary; on overflow, the classic MG decrement by
       the (m+1)-th largest count). MG guarantees any item with local
       count > n_p/(m+1) survives partition p's summary, and the
       pigeonhole over Σn_p = N means every GLOBAL heavy hitter
       (count > N/{HH_K}) survives in at least one partition — the
       union of summary keys is a certified candidate SUPERSET.
    2. RESCORE — candidates broadcast back (bounded: <= 2m keys per
       partition by construction, never corpus-scale) and one exact
       counting pass joins, reconstructs the gram TEXT only for
       candidate matches (the expensive string never materializes for
       the non-boilerplate bulk), and applies the exact threshold.

    The candidate set depends on partitioning/batch order; the OUTPUT
    does not — exact counts + the threshold make the result identical
    to the oracle's full GROUP BY, independent of what else the sketch
    happened to retain (hash collisions merely add candidates, which
    the exact rescore then rejects).

    Scale: pass 1 touches only digests (no gram strings — the r11
    minhash lesson) in bounded memory; pass 2's join is a broadcast
    hash join, so the corpus grams never shuffle; only candidate
    occurrences reach the final gram-keyed aggregate. This is how
    heavy-hitter detection stays viable when the gram TYPE table
    itself is too large to shuffle (the exact-groupBy alternative
    shuffles every distinct gram)."""
    from ..io import parallelize_scan

    d = parallelize_scan(load_table(spark, sf_dir, "documents")).filter(
        F.col("text").isNotNull()
    )
    tk = F.split(F.trim(F.col("text")), " ")
    M60 = (1 << 60) - 1
    t1 = d.select(
        "doc_id",
        tk.alias("tk"),
        F.size(tk).alias("_n"),
        F.transform(
            tk,
            lambda t: F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast(
                "bigint"
            ),
        ).alias("_th"),
    )
    th = F.col("_th")

    def chain(i: Column) -> Column:
        h = F.element_at(th, i)
        for off in range(1, HH_NGRAM):
            h = F.lit(3) * h.bitwiseAND(F.lit(M60)) + F.element_at(
                th, i + F.lit(off)
            )
        return h.bitwiseAND(F.lit(M60))

    grams_arr = F.when(
        F.col("_n") >= HH_NGRAM,
        F.transform(
            F.sequence(F.lit(1), F.col("_n") - (HH_NGRAM - 1)),
            lambda i: chain(i),
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    g1 = t1.select(F.explode(grams_arr).alias("h"))
    m = HH_K - 1

    def sketch(batches):
        import pandas as pd

        counts = pd.Series(dtype="int64")
        n_p = 0
        for pdf in batches:
            n_p += len(pdf)
            # vectorized mergeable-MG fold: exact batch counts merge
            # into the running summary at C speed (the per-key python
            # dict variant measured 25.2 s at ×100; this one 11.2 s).
            # concat+groupby keeps the fold in int64 end-to-end — the
            # earlier Series.add(fill_value=0) promoted to float64,
            # which would lose exactness past 2^53 per partition.
            counts = (
                pd.concat([counts, pdf["h"].value_counts()])
                .groupby(level=0)
                .sum()
            )
            if len(counts) > 2 * m:
                vals = counts.to_numpy()
                vals.sort()
                dec = vals[-(m + 1)]  # the (m+1)-th largest
                counts = counts[counts > dec] - dec
        yield pd.DataFrame(
            {
                "h": pd.array(
                    list(counts.index.astype("int64")) + [None], dtype="Int64"
                ),
                "c": pd.array(
                    list(counts.astype("int64")) + [n_p], dtype="Int64"
                ),
            }
        )

    # bounded relation (<= 2m+1 rows per partition): materialize once,
    # it feeds both the candidate set and the exact total
    sk = g1.mapInPandas(sketch, "h long, c long").localCheckpoint(eager=True)
    cand = sk.filter(F.col("h").isNotNull()).select("h").distinct()
    n_tot = sk.filter(F.col("h").isNull()).agg(
        F.sum("c").cast("bigint").alias("n_occ")
    )
    g2 = t1.select(
        "doc_id", "tk", F.posexplode(grams_arr).alias("p", "h")
    )
    j = g2.join(F.broadcast(cand), "h").select(
        "doc_id",
        F.concat_ws(
            " ", F.slice("tk", F.col("p") + F.lit(1), F.lit(HH_NGRAM))
        ).alias("gram"),
    )
    return (
        j.groupBy("gram")
        .agg(
            F.count("*").cast("bigint").alias("n_occurrences"),
            F.count_distinct("doc_id").cast("bigint").alias("n_docs"),
        )
        .crossJoin(F.broadcast(n_tot))
        .filter(F.col("n_occurrences") * HH_K > F.col("n_occ"))
        .select(
            "gram",
            "n_occurrences",
            "n_docs",
            F.round(
                F.lit(1_000_000.0) * F.col("n_occurrences") / F.col("n_occ"),
                0,
            )
            .cast("bigint")
            .alias("share_ppm"),
        )
    )


def _sql_stop() -> str:
    """The oracle-side stopword list, interpolated from the SAME
    constant the Spark side uses (``text.STOPWORDS``) — a hardcoded
    copy here would silently diverge the oracle on any future edit
    (ADVICE r11)."""
    from .text import _SQL_STOP

    return _SQL_STOP


@register(
    "corpus_quality_calibration_ece",
    oracle=f"""
    -- reliability diagram + per-bin expected-calibration-error terms
    -- for a quality predictor: EN-stopword density as a predictor of
    -- lang = 'en'. The audit every learned quality filter needs
    -- before its scores gate data: within each confidence bin, does
    -- the predicted rate match the observed rate? (Naeini et al.
    -- 2015 ECE, decomposed per bin so the driver hash certifies the
    -- whole diagram, not one scalar.)
    WITH t AS (
      SELECT lang, string_split(trim(text), ' ') AS toks
      FROM documents WHERE text IS NOT NULL),
    sc AS (
      SELECT CASE WHEN len(toks) > 0 THEN CAST(round(
               1000000.0 * len(list_filter(toks,
                 x -> list_contains([{_sql_stop()}], x)))
               / len(toks), 0) AS BIGINT) END AS score_ppm,
             COALESCE(lang = 'en', FALSE) AS label
      FROM t),
    ok AS (SELECT * FROM sc WHERE score_ppm IS NOT NULL),
    n_all AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM ok),
    b AS (
      SELECT LEAST(score_ppm // 100000, 9) AS bin, score_ppm, label
      FROM ok)
    SELECT CAST(bin AS BIGINT) AS bin,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(round(AVG(CAST(score_ppm AS DOUBLE)), 0) AS BIGINT)
             AS conf_ppm,
           CAST(round(1000000.0 * SUM(CASE WHEN label THEN 1 ELSE 0 END)
                      / COUNT(*), 0) AS BIGINT) AS acc_ppm,
           CAST(round(1000000.0 * COUNT(*) / CAST(a.n AS DOUBLE), 0)
             AS BIGINT) AS weight_ppm
    FROM b CROSS JOIN n_all a
    GROUP BY bin, a.n
    """,
    tags=("llm", "curation", "quality", "audit"),
)
def corpus_quality_calibration_ece(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram for a quality predictor — the calibration
    audit (Naeini et al. 2015) run before any classifier score is
    trusted to gate training data. Predictor: EN-stopword token
    density in ppm (a real, if crude, English-ness score); target:
    lang == 'en'. Ten equal-width confidence bins, each reporting its
    doc count, mean predicted confidence, observed positive rate, and
    corpus weight — ECE is the weight_ppm-weighted sum of
    |conf - acc|, recoverable from the rows; emitting the bins keeps
    the whole diagram hash-certified.

    Exactness: the score rounds once to integer ppm per doc; bins are
    integer floor-division; per-bin stats are exact counts plus one
    double divide each, rounded once.

    Scale: one map-side score projection (no explode — the stopword
    filter is a per-row array op) and ONE 10-group aggregation; the
    corpus total is the SUM of the per-bin counts, recovered with a
    window over the <= 10 aggregated rows (r14 — the previous form
    cross-joined a broadcast COUNT(*) scalar, which cost a SECOND full
    tokenize-and-score pass over the corpus just to build the
    broadcast; guide §1/§5: the bench isolate measured the op at
    2× scan cost for a 10-row output). Scan-bound at any size, now
    with exactly one scan."""
    from ..functions.text import STOPWORDS

    d = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    toks = F.split(F.trim(F.col("text")), " ")
    n_stop = F.size(F.filter(toks, lambda x: x.isin(*STOPWORDS)))
    score = F.when(
        F.size(toks) > 0,
        F.round(
            F.lit(1_000_000.0) * n_stop / F.size(toks), 0
        ).cast("bigint"),
    )
    sc = d.select(
        score.alias("score_ppm"),
        F.coalesce(F.col("lang") == "en", F.lit(False)).alias("label"),
    ).filter(F.col("score_ppm").isNotNull())
    b = sc.select(
        F.least(F.col("score_ppm") / F.lit(100_000), F.lit(9))
        .cast("bigint")
        .alias("bin"),
        "score_ppm",
        "label",
    )
    agg = b.groupBy("bin").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.round(F.avg(F.col("score_ppm").cast("double")), 0)
        .cast("bigint")
        .alias("conf_ppm"),
        F.round(
            F.lit(1_000_000.0)
            * F.sum(F.when(F.col("label"), 1).otherwise(0))
            / F.count("*"),
            0,
        )
        .cast("bigint")
        .alias("acc_ppm"),
    )
    # n = sum over the ten bins of n_docs == COUNT(*) of scored docs:
    # identical value, zero extra passes (the window sees <= 10 rows).
    # Same float ops as before: lit(1e6) * BIGINT / DOUBLE, one round.
    n = F.sum("n_docs").over(Window.partitionBy())
    return agg.select(
        "bin",
        "n_docs",
        "conf_ppm",
        "acc_ppm",
        F.round(
            F.lit(1_000_000.0) * F.col("n_docs") / n.cast("double"), 0
        )
        .cast("bigint")
        .alias("weight_ppm"),
    )


PCTL_POINTS_PPM = (250_000, 500_000, 750_000, 900_000, 990_000)


@register(
    "corpus_token_weighted_length_percentiles",
    oracle=f"""
    -- "the median TOKEN lives in a document of N tokens": doc-length
    -- percentiles weighted by token mass, not doc count — the
    -- statistic that sizes sequence length for the tokens a model
    -- actually trains on (doc-count percentiles over-weight short
    -- docs that contribute almost no tokens).
    WITH t AS (
      SELECT len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]'))
               AS toks
      FROM documents WHERE text IS NOT NULL),
    hist AS (SELECT toks, CAST(COUNT(*) AS BIGINT) AS n_docs,
                    CAST(toks * COUNT(*) AS BIGINT) AS tok_mass
             FROM t WHERE toks > 0 GROUP BY toks),
    cum AS (
      SELECT toks, n_docs, tok_mass,
             SUM(tok_mass) OVER (ORDER BY toks
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_mass,
             SUM(tok_mass) OVER () AS total_mass
      FROM hist),
    pts AS (SELECT unnest([{', '.join(str(p) for p in PCTL_POINTS_PPM)}])
              AS p_ppm),
    hit AS (
      SELECT p.p_ppm, c.toks, c.cum_mass, c.total_mass,
             row_number() OVER (PARTITION BY p.p_ppm ORDER BY c.toks) AS rn
      FROM pts p JOIN cum c
        ON c.cum_mass * 1000000 >= p.p_ppm * c.total_mass)
    SELECT CAST(p_ppm AS BIGINT) AS p_ppm,
           CAST(toks AS BIGINT) AS doc_len_tokens,
           CAST(cum_mass AS BIGINT) AS cum_token_mass,
           CAST(total_mass AS BIGINT) AS total_tokens
    FROM hit WHERE rn = 1
    """,
    tags=("llm", "corpus", "stats"),
)
def corpus_token_weighted_length_percentiles(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Token-weighted document-length percentiles: for each mass point
    (p25/p50/p75/p90/p99 of total token mass), the smallest document
    length such that documents up to that length carry >= p of all
    tokens. Doc-count percentiles over-weight short documents; this is
    the curve that answers 'what sequence length covers 90% of the
    tokens we train on'.

    Exactness: everything is integer — token counts, the length
    histogram, cumulative masses, and the threshold comparison
    cum*1e6 >= p*total (no division anywhere).

    Scale: one map pass + a groupBy on doc length (the histogram's
    cardinality is bounded by max doc length, thousands of rows at any
    corpus size), so the global-order cumulative window runs over the
    HISTOGRAM, never the corpus; the 5-point spine is a constant
    broadcast."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    t = d.select(
        F.regexp_count(F.col("text"), F.lit(r"[a-z]+|[0-9]+|[^a-z0-9 ]")).alias(
            "toks"
        )
    ).filter(F.col("toks") > 0)
    hist = t.groupBy("toks").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        (F.col("toks") * F.count("*")).cast("bigint").alias("tok_mass"),
    )
    w_cum = Window.orderBy("toks").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.orderBy("toks").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = hist.select(
        "toks",
        F.sum("tok_mass").over(w_cum).alias("cum_mass"),
        F.sum("tok_mass").over(w_all).alias("total_mass"),
    )
    pts = cum.select(
        "toks",
        "cum_mass",
        "total_mass",
        F.explode(
            F.array(*[F.lit(p) for p in PCTL_POINTS_PPM])
        ).alias("p_ppm"),
    ).filter(F.col("cum_mass") * 1_000_000 >= F.col("p_ppm") * F.col("total_mass"))
    w_hit = Window.partitionBy("p_ppm").orderBy("toks")
    return (
        pts.withColumn("rn", F.row_number().over(w_hit))
        .filter(F.col("rn") == 1)
        .select(
            F.col("p_ppm").cast("bigint").alias("p_ppm"),
            F.col("toks").cast("bigint").alias("doc_len_tokens"),
            F.col("cum_mass").cast("bigint").alias("cum_token_mass"),
            F.col("total_mass").cast("bigint").alias("total_tokens"),
        )
    )


def _sql_quality_score() -> str:
    from .text import _SQL_STOP

    return f"""
      SELECT doc_id, coalesce(lang, '(none)') AS lang,
             len(toks) AS n_tokens,
             0.4 * (len(list_distinct(toks)) / len(toks))
               + 0.4 * (len(list_filter(toks,
                          x -> list_contains([{_SQL_STOP}], x))) / len(toks))
               + 0.2 * (CASE WHEN len(toks) >= 50 THEN 1.0
                             ELSE len(toks) / 50.0 END) AS score
      FROM (SELECT doc_id, lang, string_split(trim(text), ' ') AS toks
            FROM documents WHERE text IS NOT NULL)
    """


@register(
    "corpus_curriculum_deciles",
    oracle=f"""
    -- curriculum-ordering audit: rank the corpus by the engine's
    -- quality score (text_stats_quality's formula) and report each
    -- decile's language composition and token mass — the table that
    -- sanity-checks a quality-ordered curriculum before training on
    -- it (a decile dominated by one language means the score is
    -- really a language detector).
    WITH s AS ({_sql_quality_score()}),
    r AS (SELECT doc_id, lang, n_tokens, score,
                 row_number() OVER (ORDER BY score, doc_id) AS rk,
                 COUNT(*) OVER () AS n
          FROM s),
    d AS (SELECT ((rk - 1) * 10) // n AS decile, lang, n_tokens FROM r),
    cell AS (SELECT decile, lang,
                    CAST(COUNT(*) AS BIGINT) AS n_docs,
                    CAST(SUM(n_tokens) AS BIGINT) AS tokens
             FROM d GROUP BY decile, lang),
    tot AS (SELECT decile, SUM(n_docs) AS dec_docs FROM cell GROUP BY decile)
    SELECT CAST(c.decile AS BIGINT) AS decile, c.lang, c.n_docs, c.tokens,
           CAST(c.n_docs * 1000000 // t.dec_docs AS BIGINT)
             AS lang_share_ppm
    FROM cell c JOIN tot t USING (decile)
    """,
    tags=("llm", "corpus", "curation"),
)
def corpus_curriculum_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum-ordering audit: the corpus ranks by the engine's
    quality score (the exact text_stats_quality formula), splits into
    score deciles, and each (decile, language) cell reports doc count,
    token mass, and the language's share of its decile — the
    confound check a quality-ordered curriculum needs before training
    (quality scores that secretly rank language or length produce
    skewed early deciles).

    Exactness: the score is the same int/int double expression both
    engines evaluate bit-identically; ranking ties break on doc_id;
    decile assignment is pure integer math; shares are integer-ppm.

    Scale: the global rank uses the distributed range-repartition +
    offset pattern (per-partition row_number plus a K-row broadcast of
    partition offsets — never a single-partition window over the
    corpus); the decile rollup is a 10 x languages aggregate."""
    from .text import STOPWORDS, _toks

    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    toks = _toks()
    nt = F.size(toks)
    s = d.select(
        "doc_id",
        F.coalesce("lang", F.lit("(none)")).alias("lang"),
        nt.alias("n_tokens"),
        (
            F.lit(0.4) * (F.size(F.array_distinct(toks)) / nt)
            + F.lit(0.4)
            * (F.size(F.filter(toks, lambda x: x.isin(*STOPWORDS))) / nt)
            + F.lit(0.2)
            * F.when(nt >= 50, F.lit(1.0)).otherwise(nt / F.lit(50.0))
        ).alias("score"),
    )
    # pay the per-doc token analysis ONCE: the scored table feeds the
    # range partitioner's SAMPLING pass, the local ranks, the
    # per-partition counts, and the corpus total — four evaluations
    # without a checkpoint (the checklist's >=2-consumers rule)
    s = s.localCheckpoint(eager=True)
    key = [F.col("score"), F.col("doc_id")]
    parts = s.repartitionByRange(*key).withColumn(
        "pid", F.spark_partition_id()
    )
    wp = Window.partitionBy("pid").orderBy(*key)
    local = parts.withColumn("lrn", F.row_number().over(wp))
    pc = parts.groupBy("pid").agg(F.count("*").alias("pn"))
    wo = Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = pc.select(
        "pid", F.coalesce(F.sum("pn").over(wo), F.lit(0)).alias("offset")
    )
    n_tot = s.agg(F.count("*").alias("n"))
    ranked = (
        local.join(F.broadcast(offsets), "pid")
        .crossJoin(F.broadcast(n_tot))
        .select(
            "lang",
            "n_tokens",
            F.expr("((lrn + offset - 1) * 10) div n").alias("decile"),
        )
    )
    cell = ranked.groupBy("decile", "lang").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("tokens"),
    )
    tot = cell.groupBy("decile").agg(F.sum("n_docs").alias("dec_docs"))
    return cell.join(F.broadcast(tot), "decile").select(
        F.col("decile").cast("bigint").alias("decile"),
        "lang",
        "n_docs",
        "tokens",
        F.expr("CAST(n_docs * 1000000 div dec_docs AS BIGINT)").alias(
            "lang_share_ppm"
        ),
    )
