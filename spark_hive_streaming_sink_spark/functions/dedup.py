"""Deduplication operators for LLM-data pipelines (SURVEY.md §2C
extension): exact content-hash dedup, MinHash+LSH, SimHash, n-gram
Jaccard.

Cross-engine determinism: every pseudo-random hash is md5-based
(identical hex in Spark and DuckDB), so MinHash permutations are
``min(md5("seed_" || shingle))`` — lexicographic min of hex equals
numeric min of the 128-bit value.

100 TB posture: each op is scan → map-side array work → one hash-keyed
shuffle (groupBy hash / band), i.e. the classic shuffle-light dedup
shape. Candidate generation (LSH bands) keeps pair comparison linear
in bucket sizes, never all-pairs.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
import pyspark.sql.functions as F

from ..io import load_table, materialize_parquet, parallelize_scan
from ..registry import register

N_MINHASH = 8  # 2 bands × 4 rows
SIMHASH_BITS = 16

# Representative cap per LSH band bucket (env-tunable). A band bucket is
# a candidate DUP CLUSTER: pairing every member against every other is
# O(|bucket|^2), while the downstream merge (connected components /
# keep-list) only needs each member tied INTO the cluster — which a STAR
# against the bucket's lowest-id representatives already achieves. Pair
# generation therefore joins capped-representatives x all-members:
# O(cap * |bucket|) pairs, full recall of cluster membership. The
# default sits far above any fixture bucket (no semantic effect at any
# gate scale — verified by the oracle gates); replication-style stress
# corpora, where every doc has REPL exact copies sharing a bucket, set
# it low via SHSS_BAND_CAP (tools/stress.py uses 16: x100 measured
# dedup_minhash_calibration at 372 s from quadratic pair blowup).
#
# TRUNCATION SEMANTICS — when a bucket exceeds BAND_CAP, the star scheme
# CHANGES what the pair-listing queries report: member-member pairs
# between two non-representatives are not listed, and n_shared_bands can
# undercount a 2-band pair whose doc is a rep in only one band's bucket.
# Cluster MEMBERSHIP stays complete (every member pairs with >= 1 rep),
# which is all the downstream merges (components / keep-lists) consume.
# Pair-listing queries (dedup_minhash_pairs, dedup_minhash_calibration)
# carry this caveat in their docstrings so capped output is never
# mistaken for exhaustive candidate enumeration; the cap is read from
# SHSS_BAND_CAP at import, so a run's cap is knowable from its env.
BAND_CAP = int(os.environ.get("SHSS_BAND_CAP", "256"))

_SQL_BAND_REPS = f"""
    reps AS (
      SELECT doc_id, band_no, band_key FROM (
        SELECT doc_id, band_no, band_key,
               row_number() OVER (PARTITION BY band_no, band_key
                                  ORDER BY doc_id) AS _r
        FROM bands) WHERE _r <= {BAND_CAP})
"""


def _band_reps(bands: DataFrame) -> DataFrame:
    """The `BAND_CAP` lowest-doc_id representatives of each band
    bucket — the star-scheme join side (see module note above)."""
    from pyspark.sql import Window

    w = Window.partitionBy("band_no", "band_key").orderBy("doc_id")
    return (
        bands.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= BAND_CAP)
        .drop("_r")
    )


@register(
    "dedup_exact",
    oracle="""
    SELECT sha256(text) AS content_hash,
           MIN(doc_id) AS keeper_doc_id,
           COUNT(*) AS n_copies,
           COUNT(DISTINCT source) AS n_sources
    FROM documents
    GROUP BY sha256(text)
    """,
    tags=("llm", "dedup"),
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by content hash: group on sha256(text), keep the
    lowest doc_id. One shuffle on a uniformly-distributed key — no
    skew possible, scales to any corpus."""
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy(F.sha2("text", 256).alias("content_hash")).agg(
        F.min("doc_id").alias("keeper_doc_id"),
        F.count("*").alias("n_copies"),
        F.countDistinct("source").alias("n_sources"),
    )


def _shingles(col: Column) -> Column:
    """Distinct 3-gram word shingles of a text column (Spark side).

    Guarded for degenerate inputs to match DuckDB's ``generate_series``
    semantics exactly: texts with < 3 tokens yield an EMPTY list (Spark's
    ``sequence(1, n)`` with n < 1 would otherwise DESCEND — e.g.
    ``sequence(1, -1) = [1, 0, -1]`` — and crash ``slice`` on start 0),
    and NULL text yields NULL (``list_transform(NULL) -> NULL`` in
    DuckDB). CASE branches evaluate lazily per row, so the crashing
    expression never runs for short texts."""
    toks = F.split(F.trim(col), " ")
    grams = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 2),
            lambda i: F.concat_ws(" ", F.slice(toks, i, 3)),
        )
    )
    return (
        F.when(col.isNull(), F.lit(None).cast("array<string>"))
        .when(F.size(toks) >= 3, grams)
        .otherwise(F.array().cast("array<string>"))
    )


_SQL_SHINGLES = (
    "list_distinct(list_transform(generate_series(1, len(toks)-2), "
    "i -> array_to_string(toks[i:i+2], ' ')))"
)


def _shingle_hashes(shingles: Column) -> Column:
    """Per shingle: one md5 (the only cryptographic hash in the
    pipeline), parsed ONCE into two 60-bit longs (h1, h2). The N
    permutations below derive from the pair arithmetically — hashing
    and hex-parsing cost is paid once per shingle, not once per
    (shingle, permutation).

    Kept for consumers that genuinely hash gram STRINGS (simhash,
    ngram-jaccard, substring windows); the MinHash family moved to
    ``_hx_frame``'s token-combine digests in r11 — 2.8× cheaper,
    because building the gram strings (slice+concat per gram) was the
    measured ×100 floor, not the hashing."""

    def parse(x: Column) -> Column:
        return F.struct(
            F.conv(F.substring(x, 1, 15), 16, 10).cast("bigint").alias("h1"),
            F.conv(F.substring(x, 17, 15), 16, 10).cast("bigint").alias("h2"),
        )

    return F.transform(F.transform(shingles, lambda s: F.md5(s)), parse)


# --- r11 signature scheme: positional token-hash combine --------------------
#
# The MinHash family's per-shingle digest pair (h1, h2) is a POSITIONAL
# COMBINE of the three member tokens' 60-bit md5 halves instead of an
# md5 of the gram string:
#
#   h = ((t_i + 3*t_{i+1}) & M60) + 5*t_{i+2}) & M60      (per half)
#
# Same distinct-3-token-shingle semantics, same 60-bit digest width,
# same ~2^-60 in-doc collision odds (linear combos of independent
# uniform hashes), but the gram STRING never materializes: profiling
# the ×100 isolate showed shingle-string construction (slice +
# concat_ws per gram) was ~10 s of the ~11.5 s signature floor, while
# md5+parse+fold were marginal. Token md5s are computed once per token
# (n md5 calls vs n-2 — same count, shorter inputs), and the combine
# is integer multiply-add — measured 11.6 s → 4.2 s for the hx stage
# at ×100. Every step is overflow-safe for DuckDB's checked BIGINT
# arithmetic: 3*t < 2^62, sum < 2^62.6, masked + 5*t < 6*2^60 < 2^63.
# Gram-level de-duplication is deliberately DROPPED from hx (minhash
# MINs are invariant under duplicates); digest SETS distinct at the
# point of use (``_SQL_DIG`` / array_distinct on h1).

M60 = (1 << 60) - 1


def _hx_frame(d: DataFrame, keep: list[str] | None = None) -> DataFrame:
    """``(keep..., hx)`` where ``hx`` is the array<struct<h1,h2>> of
    positional token-combine shingle digests of ``text`` (see module
    note above). TWO projections on purpose: the per-token hash array
    materializes in the first, and the gram lambda references it as a
    bound attribute — inlining the token transform into the gram
    lambda re-evaluates ALL n token md5s per gram (O(n²) md5 calls;
    measured as a wedge, not a slowdown, at ×100). CollapseProject
    keeps them apart because the token array is non-cheap and
    referenced 6× by the gram struct."""
    keep = keep if keep is not None else ["doc_id"]
    toks = F.split(F.trim(F.col("text")), " ")
    t1 = d.select(
        *keep,
        F.size(toks).alias("_ntok"),
        F.transform(
            toks,
            lambda t: F.struct(
                F.conv(F.substring(F.md5(t), 1, 15), 16, 10)
                .cast("bigint")
                .alias("a"),
                F.conv(F.substring(F.md5(t), 17, 15), 16, 10)
                .cast("bigint")
                .alias("b"),
            ),
        ).alias("_th"),
    )
    th = F.col("_th")

    def comb(i: Column, f: str) -> Column:
        x = F.element_at(th, i).getField(f)
        y = F.element_at(th, i + F.lit(1)).getField(f)
        z = F.element_at(th, i + F.lit(2)).getField(f)
        return (
            (x + F.lit(3) * y).bitwiseAND(F.lit(M60)) + F.lit(5) * z
        ).bitwiseAND(F.lit(M60))

    grams = F.transform(
        F.sequence(F.lit(1), F.col("_ntok") - 2),
        lambda i: F.struct(comb(i, "a").alias("h1"), comb(i, "b").alias("h2")),
    )
    hx_t = "array<struct<h1:bigint,h2:bigint>>"
    hx = (
        F.when(th.isNull(), F.lit(None).cast(hx_t))
        .when(F.col("_ntok") >= 3, grams)
        .otherwise(F.array().cast(hx_t))
    )
    return t1.select(*keep, hx.alias("hx"))


def _dig_col() -> Column:
    """Distinct 60-bit shingle digest SET of an ``hx`` column (the h1
    halves) — the exact-Jaccard/containment verify representation."""
    return F.array_distinct(
        F.transform(F.col("hx"), lambda p: p.getField("h1"))
    )


def _minhash_cols() -> Column:
    # Carter-Wegman universal hashing: h_i = h1 + i*h2 as the i-th
    # permutation — integer multiply-add per (shingle, permutation)
    # instead of a fresh md5, and the min runs over longs, not 32-char
    # strings. Max value is h1 + 7*h2 < 8 * 2^60 = 2^63 — no signed-64
    # overflow. All N mins fold in ONE traversal of the hash array
    # (elementwise least against an accumulator): N separate
    # array_min(transform(...)) columns generated a codegen method so
    # large it ran interpreted until JIT caught up — 5-90s swings per
    # run on the ×30 stress corpus; the single-pass fold is a stable
    # ~5s.
    long_max = (1 << 63) - 1

    def perms(p: Column) -> Column:
        return F.transform(
            F.sequence(F.lit(0), F.lit(N_MINHASH - 1)),
            lambda j: p.getField("h1") + j.cast("bigint") * p.getField("h2"),
        )

    # degenerate docs (NULL text, or < 3 tokens → no shingles) have no
    # minhash: NULL, matching DuckDB's list_aggregate([]/NULL, 'min').
    # Without this, the empty-fold would emit long_max "signatures" that
    # bucket all degenerate docs into one giant phantom near-dup set.
    # The guard lives in the fold's INIT accumulator (empty hx → no merge
    # steps → result is the NULL init).
    init = F.when(
        F.size(F.col("hx")) > 0,
        F.array_repeat(F.lit(long_max).cast("bigint"), N_MINHASH),
    ).otherwise(F.lit(None).cast("array<bigint>"))
    return F.aggregate(
        F.col("hx"),
        init,
        lambda acc, p: F.zip_with(acc, perms(p), lambda a, b: F.least(a, b)),
    )


def _add_minhash(df: DataFrame) -> DataFrame:
    """Replace column ``hx`` with ``mh0..mh7``, evaluating the
    8-permutation fold exactly ONCE per row by construction: the fold
    lands in one intermediate array column, and the per-permutation
    extraction lives in a SECOND projection that CollapseProject will
    not merge back (the fold is non-cheap and referenced 8×). Relying
    on runtime common-subexpression elimination instead proved
    plan-shape-fragile: in union-branch plans (dedup_minhash_pairs)
    the CaseWhen-guarded fold was re-evaluated per mh column
    (measured 1.8 s → 5.8 s at sf0.1)."""
    inner = df.withColumn("_mh", _minhash_cols()).drop("hx")
    keep = [c for c in inner.columns if c != "_mh"]
    return inner.select(
        *keep,
        *[F.col("_mh").getItem(i).alias(f"mh{i}") for i in range(N_MINHASH)],
    )


def _minhash_frame(d: DataFrame) -> DataFrame:
    """``(doc_id, mh0..mh7)`` per documents ROW via the per-row fold —
    one corpus pass, zero exchanges, pipelines straight into whatever
    projection follows. An explode → codegen md5 → groupBy(min×8)
    variant was measured AGAINST this in the ×100 isolate harness
    (r11): 14.0 s vs 11.2 s for dedup_minhash_lsh — the per-doc
    shuffle + hash aggregation costs more than the interpreted
    higher-order fold saves, because shingle-array construction (not
    hashing) dominates the stage. Keep the fold, over the r11
    token-combine digests (_hx_frame)."""
    return _add_minhash(_hx_frame(d))


def _signature_frame(d: DataFrame, digests: bool = False) -> DataFrame:
    """``(doc_id[, dig], mh)`` per documents ROW — packed-signature
    variant of ``_minhash_frame`` for the calibration / threshold-sweep
    consumers (per-row fold, one corpus pass, zero exchanges — see
    ``_minhash_frame`` for the measured explode/groupBy comparison).
    ``dig`` is the distinct 60-bit shingle digest set (order = shingle
    order; every consumer is array_intersect/size — set semantics)."""
    sig = _hx_frame(d).withColumn("mh", _minhash_cols())
    if digests:
        return sig.select("doc_id", _dig_col().alias("dig"), "mh")
    return sig.select("doc_id", "mh")


def _sql_tok_half(off: int, lo: int) -> str:
    # one token's 60-bit md5 half; DuckDB re-hashes per reference (the
    # oracle runs at sf0.01 — clarity over speed there)
    idx = "i" if off == 0 else f"i+{off}"
    return f"CAST(('0x' || substr(md5(toks[{idx}]), {lo}, 15)) AS BIGINT)"


def _sql_comb(lo: int) -> str:
    # positional combine, identical arithmetic to _hx_frame.comb
    a, b, c = (_sql_tok_half(o, lo) for o in (0, 1, 2))
    return f"((({a} + 3*{b}) & {M60}) + 5*{c}) & {M60}"


# hx from a relation exposing `toks` (token-combine digests; NULL for
# NULL text via list_transform(NULL), [] for <3 tokens via the empty
# generate_series — same guards the Spark side encodes as CASE)
_SQL_HX = (
    "list_transform(generate_series(1, len(toks)-2), "
    f"i -> {{'h1': {_sql_comb(1)}, 'h2': {_sql_comb(17)}}})"
)

# distinct digest SET of an hx column (the h1 halves)
_SQL_DIG = "list_distinct(list_transform(hx, p -> p.h1))"

_SQL_MINHASH = ", ".join(
    f"list_aggregate(list_transform(hx, p -> p.h1 + {i} * p.h2), 'min') AS mh{i}"
    for i in range(N_MINHASH)
)


@register(
    "dedup_minhash_lsh",
    oracle=f"""
    WITH t AS (SELECT doc_id, string_split(trim(text), ' ') AS toks FROM documents),
    hxt AS (SELECT doc_id, {_SQL_HX} AS hx FROM t),
    mh AS (SELECT doc_id, {_SQL_MINHASH} FROM hxt)
    -- degenerate docs (NULL / <3-token text) have NULL minhash -> NULL
    -- bands, not md5('') phantom buckets
    SELECT doc_id,
           CASE WHEN mh0 IS NOT NULL
                THEN md5(concat_ws('_', mh0, mh1, mh2, mh3)) END AS band0,
           CASE WHEN mh0 IS NOT NULL
                THEN md5(concat_ws('_', mh4, mh5, mh6, mh7)) END AS band1,
           CASE WHEN mh0 IS NOT NULL
                THEN md5(concat_ws('_', mh0, mh1, mh2, mh3, mh4, mh5, mh6, mh7))
           END AS signature
    FROM mh
    """,
    tags=("llm", "dedup", "minhash"),
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signatures + LSH band keys per document: shingle →
    one md5 per shingle → 8 Carter-Wegman permutation minhashes →
    2 banded keys. Documents sharing a band key are near-dup candidates
    (join on band0/band1 downstream — see dedup_minhash_pairs).
    Map-side only; no shuffle at all (see _minhash_frame for the
    measured explode/groupBy alternative that lost)."""
    d = parallelize_scan(load_table(spark, sf_dir, "documents"))
    mh = _minhash_frame(d)
    ok = F.col("mh0").isNotNull()  # NULL minhash -> NULL bands
    b0 = F.when(ok, F.md5(F.concat_ws("_", *[F.col(f"mh{i}") for i in range(4)])))
    b1 = F.when(ok, F.md5(F.concat_ws("_", *[F.col(f"mh{i}") for i in range(4, 8)])))
    sig = F.when(
        ok, F.md5(F.concat_ws("_", *[F.col(f"mh{i}") for i in range(N_MINHASH)]))
    )
    return mh.select(
        "doc_id", b0.alias("band0"), b1.alias("band1"), sig.alias("signature")
    )


@register(
    "dedup_minhash_pairs",
    oracle=f"""
    WITH t AS (SELECT doc_id, string_split(trim(text), ' ') AS toks FROM documents),
    hxt AS (SELECT doc_id, {_SQL_HX} AS hx FROM t),
    mh0 AS (SELECT doc_id, {_SQL_MINHASH} FROM hxt),
    -- degenerate docs (NULL minhash) cannot be candidates
    mh AS (SELECT * FROM mh0 WHERE mh0 IS NOT NULL),
    bands AS (
      SELECT doc_id, 0 AS band_no, md5(concat_ws('_', mh0, mh1, mh2, mh3)) AS band_key FROM mh
      UNION ALL
      SELECT doc_id, 1 AS band_no, md5(concat_ws('_', mh4, mh5, mh6, mh7)) AS band_key FROM mh),
    {_SQL_BAND_REPS.strip()}
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           COUNT(DISTINCT a.band_no) AS n_shared_bands
    FROM reps a JOIN bands b
      ON a.band_key = b.band_key AND a.band_no = b.band_no AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
    """,
    tags=("llm", "dedup", "minhash"),
)
def dedup_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH candidate-pair generation: explode per-band keys, self-join
    within (band_no, band_key) buckets, count shared bands per pair.
    This is the scale path: pairs are only formed inside hash buckets
    (linear in bucket sizes), never across the full corpus. On the
    synthetic corpus (no near-dups) the result is usually empty — the
    oracle agrees on emptiness, and tests/test_llm_ops.py proves the
    recall path on planted duplicates.

    NOT exhaustive under the star cap: if any bucket exceeds BAND_CAP
    (SHSS_BAND_CAP, default 256), member-member pairs between two
    non-representatives are omitted and n_shared_bands can undercount
    2-band pairs — cluster membership stays complete (see the BAND_CAP
    module note). At the default cap no gate fixture is affected."""
    d = parallelize_scan(load_table(spark, sf_dir, "documents"))
    # Materialize the signature table ONCE (at 100 TB this is the
    # persisted signature table, same as dedup_minhash_calibration):
    # both union branches of the band list then read data instead of
    # re-shingling, and the degenerate-doc filter below is a free scan
    # filter. Guarding the band exprs with CASE WHEN instead let the
    # join's inferred isnotnull(band_key) constraint substitute the
    # whole minhash fold into a pushed-down filter — measured 1.8 s →
    # 5.7 s at sf0.1.
    mh = (
        _minhash_frame(d)
        .localCheckpoint(eager=True)
        # degenerate docs (NULL minhash) can't be candidates
        .filter(F.col("mh0").isNotNull())
    )
    b0 = F.md5(F.concat_ws("_", *[F.col(f"mh{i}") for i in range(4)]))
    b1 = F.md5(F.concat_ws("_", *[F.col(f"mh{i}") for i in range(4, 8)]))
    bands = mh.select(
        "doc_id", F.lit(0).alias("band_no"), b0.alias("band_key")
    ).unionByName(mh.select("doc_id", F.lit(1).alias("band_no"), b1.alias("band_key")))
    a = _band_reps(bands).alias("a")  # star scheme: reps x all members
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.band_no") == F.col("b.band_no"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.countDistinct("a.band_no").alias("n_shared_bands"))
    )


@register(
    "dedup_simhash",
    oracle=f"""
    WITH t AS (SELECT doc_id, string_split(trim(text), ' ') AS toks FROM documents),
    h AS (SELECT doc_id, len(toks) AS n,
                 list_transform(toks,
                                x -> CAST(('0x' || substr(md5(x), 1, 4)) AS BIGINT))
                   AS masks FROM t)
    SELECT doc_id,
           {" || ".join(
               f"(CASE WHEN 2 * len(list_filter(masks, m -> ((m >> {15 - b}) & 1) = 1))"
               f" > n THEN '1' ELSE '0' END)"
               for b in range(SIMHASH_BITS)
           )} AS simhash_bits
    FROM h
    """,
    tags=("llm", "dedup", "simhash"),
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash: per token, md5's first 4 hex chars parse ONCE
    into a 16-bit integer mask; bit b of the signature is the majority
    vote over tokens of mask bit (15-b). Near-dup docs differ in few
    bits (Hamming). Map-side only; the bit string is a
    locality-sensitive bucket key. Integer bit tests replace the
    original per-bit substring/IN passes over 32-char hex strings —
    one hash+parse per token, 16 cheap bitwise filters (4.4s → ~1.5s
    on the ×10 stress corpus)."""
    d = parallelize_scan(load_table(spark, sf_dir, "documents"))
    toks = F.split(F.trim(F.col("text")), " ")
    h = d.select(
        "doc_id",
        F.size(toks).alias("n"),
        F.transform(
            toks,
            lambda x: F.conv(F.substring(F.md5(x), 1, 4), 16, 10).cast("bigint"),
        ).alias("masks"),
    )

    def bit_col(b: int):
        shift = 15 - b  # captured by value via closure on an int, 1-arg lambda
        return F.when(
            2
            * F.size(
                F.filter(
                    F.col("masks"),
                    lambda m: F.shiftright(m, shift).bitwiseAND(F.lit(1)) == 1,
                )
            )
            > F.col("n"),
            "1",
        ).otherwise("0")

    bits = [bit_col(b) for b in range(SIMHASH_BITS)]
    return h.select("doc_id", F.concat(*bits).alias("simhash_bits"))


@register(
    "dedup_ngram_jaccard",
    oracle=f"""
    WITH t AS (SELECT doc_id, string_split(trim(text), ' ') AS toks FROM documents),
    hxt AS (SELECT doc_id, {_SQL_HX} AS hx FROM t),
    sh AS (SELECT doc_id, {_SQL_DIG} AS shingles FROM hxt)
    -- NULL-text docs have NULL shingles: their pairs report NULL metrics
    -- (Spark's array_intersect(NULL, x) is NULL; DuckDB's list_intersect
    -- is [] — the CASE makes both NULL). Empty-empty pairs (n_union = 0)
    -- have undefined Jaccard: NULL in both engines.
    SELECT doc_a, doc_b, n_common, n_union,
           CASE WHEN n_union > 0 THEN n_common / n_union END AS jaccard
    FROM (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CASE WHEN a.shingles IS NULL OR b.shingles IS NULL THEN NULL
                  ELSE len(list_intersect(a.shingles, b.shingles)) END AS n_common,
             CASE WHEN a.shingles IS NULL OR b.shingles IS NULL THEN NULL
                  ELSE len(a.shingles) + len(b.shingles)
                       - len(list_intersect(a.shingles, b.shingles)) END AS n_union
      FROM sh a JOIN sh b ON b.doc_id = a.doc_id + 1)
    """,
    tags=("llm", "dedup", "jaccard"),
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard similarity between candidate pairs
    (consecutive doc_ids here as the stand-in candidate set; in
    production the pairs come from dedup_minhash_pairs buckets —
    Jaccard verification is always bucket-local, never all-pairs).

    Two scale tricks, both value-preserving:

    - shingles hash to 60-bit longs (identically in both engines)
      before pairing: 8-byte longs through the shuffle instead of
      ~20-byte strings, integer intersect (distinctness preserved; a
      60-bit collision across ~10² shingles is ~1e-14, and both
      engines would agree even then);
    - the self-join is replaced by explode-to-pair-key + one
      aggregation: each doc is emitted under its own key (role a) and
      its predecessor's (role b), so shingling runs ONCE per doc and
      a single shuffle forms the pairs — a plain self-join would
      recompute the shingles on both branches of the plan. Measured
      12.4s → 2.5s on the ×10 stress corpus."""
    d = parallelize_scan(load_table(spark, sf_dir, "documents"))
    sh = _hx_frame(d).select("doc_id", _dig_col().alias("shingles"))
    payload = F.struct("doc_id", "shingles")
    sides = sh.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("doc_id").alias("k"), F.lit(0).alias("role"), payload.alias("p")
                ),
                F.struct(
                    (F.col("doc_id") - 1).alias("k"),
                    F.lit(1).alias("role"),
                    payload.alias("p"),
                ),
            )
        ).alias("s")
    ).select("s.*")
    # any_value(ignoreNulls), NOT max: each (k, role) has at most one
    # non-null payload, and max(struct) would compare the full shingle
    # arrays lexicographically per input row — measured 3× slower at
    # the ×100 stress scale (32.6s → stable ~11s for 500k docs);
    # any_value takes the first non-null without ever comparing
    # payloads (deterministic here because there is nothing to choose
    # between).
    paired = (
        sides.groupBy("k")
        .agg(
            F.any_value(F.when(F.col("role") == 0, F.col("p")), True).alias("a"),
            F.any_value(F.when(F.col("role") == 1, F.col("p")), True).alias("b"),
        )
        .filter(F.col("a").isNotNull() & F.col("b").isNotNull())
    )
    a_sh = F.col("a.shingles")
    b_sh = F.col("b.shingles")
    inter = F.size(F.array_intersect(a_sh, b_sh))
    union = F.size(a_sh) + F.size(b_sh) - inter
    return paired.select(
        F.col("a.doc_id").alias("doc_a"),
        F.col("b.doc_id").alias("doc_b"),
        inter.alias("n_common"),
        union.alias("n_union"),
        # n_union = 0 (two shingle-less docs) -> undefined Jaccard: NULL,
        # never 0/0 (IEEE NaN here vs an error in DuckDB)
        F.when(union > 0, inter / union).alias("jaccard"),
    )


@register(
    "dedup_pipeline_end_to_end",
    oracle=f"""
    WITH t AS (SELECT doc_id, string_split(trim(text), ' ') AS toks FROM documents),
    hxt AS (SELECT doc_id, {_SQL_HX} AS hx FROM t),
    sh AS (SELECT doc_id, {_SQL_DIG} AS shingles FROM hxt),
    mh0 AS (SELECT doc_id, {_SQL_MINHASH} FROM hxt),
    -- degenerate docs (NULL minhash) can't be candidates; without this
    -- they all share the md5('') bucket and inflate the pair join
    mh AS (SELECT * FROM mh0 WHERE mh0 IS NOT NULL),
    bands AS (
      SELECT doc_id, 0 AS band_no, md5(concat_ws('_', mh0, mh1, mh2, mh3)) AS band_key FROM mh
      UNION ALL
      SELECT doc_id, 1 AS band_no, md5(concat_ws('_', mh4, mh5, mh6, mh7)) AS band_key FROM mh),
    {_SQL_BAND_REPS.strip()},
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM reps a JOIN bands b
        ON a.band_key = b.band_key AND a.band_no = b.band_no AND a.doc_id < b.doc_id),
    verified AS (
      SELECT doc_a, doc_b
      FROM cand
      JOIN sh sa ON sa.doc_id = doc_a
      JOIN sh sb ON sb.doc_id = doc_b
      WHERE 2 * len(list_intersect(sa.shingles, sb.shingles))
            >= (len(sa.shingles) + len(sb.shingles)
                - len(list_intersect(sa.shingles, sb.shingles))))
    SELECT d.doc_id,
           (SELECT COUNT(*) FROM verified v WHERE v.doc_b = d.doc_id) = 0 AS keep
    FROM documents d
    """,
    tags=("llm", "dedup", "pipeline"),
)
def dedup_pipeline_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full near-dup dedup pipeline composed in one plan: shingle →
    MinHash → LSH bands → bucket-local candidate pairs → exact Jaccard
    verification (>= 0.5) → keep-list under the dominated-by-earlier
    rule (drop a doc iff a verified similar doc with a smaller id
    exists — the standard greedy rule MinHash-LSH dedup uses; no
    transitive chaining, so no iteration). Every stage is bucket-local:
    candidates only form inside band buckets, Jaccard only runs on
    candidates — the all-pairs quadratic never appears at any scale.

    One-pass plan: the verify stage's 60-bit shingle longs ARE the h1
    halves the minhash fold consumes, so ONE hx projection feeds both
    (the original computed shingle+md5 separately for each — a full
    extra corpus pass), and the shingle array rides along through the
    band explode so verification needs no doc_id-keyed re-join with
    the corpus at all. Both sides of the band self-join read the
    file-backed feature-table barrier (see in-body note) — the corpus
    is shingled/hashed once, plus one column-pruned doc_id scan for
    the final keep-list (tests/test_plans.py pins the scan count)."""
    d = parallelize_scan(load_table(spark, sf_dir, "documents"))
    # The corpus is shingled/minhashed exactly ONCE: the per-doc
    # feature table (doc_id, shingles, mh0..7) materializes here (the
    # persisted-signature-table pattern all the band queries share) and
    # every consumer — the rep window and both join sides — reads the
    # materialization. Before the rep cap this was achieved by
    # ReuseExchange over two IDENTICAL join subtrees; the capped side
    # is no longer identical, so reuse can't apply and the explicit
    # barrier replaces it (plan-test-pinned: zero parquet text scans in
    # the final query).
    #
    # File-backed barrier (r13): this IS the "persist the signature
    # table as a real table" pattern the fault-tolerance note in
    # earlier rounds promised — parquet files survive executor loss,
    # and the write+read cost is predictable where the block-manager
    # localCheckpoint of this corpus-sized relation sat in the 25-55 s
    # ×100 variance class. Materializing PRE-explode keeps exactly one
    # stored copy of each shingle set (the r12 form checkpointed the
    # exploded band table — two copies); the 2-md5 band-key projection
    # re-runs per consumer scan, which is noise next to the shingle
    # pass it replaces. The degenerate-doc filter (NULL minhash: docs
    # that can't band) is a pushed-down scan filter on the STORED mh0
    # column — the fold itself can no longer be substituted into it.
    feat = materialize_parquet(
        _add_minhash(_hx_frame(d).withColumn("shingles", _dig_col()))
    ).filter(F.col("mh0").isNotNull())
    b0 = F.md5(F.concat_ws("_", *[F.col(f"mh{i}") for i in range(4)]))
    b1 = F.md5(F.concat_ws("_", *[F.col(f"mh{i}") for i in range(4, 8)]))
    bands = feat.select(
        "doc_id",
        "shingles",
        F.explode(
            F.array(
                F.struct(F.lit(0).alias("band_no"), b0.alias("band_key")),
                F.struct(F.lit(1).alias("band_no"), b1.alias("band_key")),
            )
        ).alias("bk"),
    ).select("doc_id", "shingles", "bk.band_no", "bk.band_key")
    # merge-join hint, NOT planner choice: bands is corpus-sized (docs ×
    # 2, carrying shingle arrays), so broadcasting one side — what the
    # planner picks at test SFs from its tiny size estimate — would be
    # exactly wrong at 100 TB.
    a, b = _band_reps(bands).alias("a"), bands.hint("shuffle_merge").alias("b")
    # Jaccard verification runs MAP-SIDE inside the band join's output
    # projection: the shingle arrays' last exchange is the band-key
    # shuffle the join needs anyway, and only slim doc_b longs move
    # afterwards. The r12 form first deduped pairs with a
    # groupBy(doc_a, doc_b).agg(any_value(shingles)) — on a dup-heavy
    # corpus that shuffles TWO arrays per candidate pair (measured ~16M
    # pairs ≈ 25 GB at ×100, the query's dominant, high-variance
    # stage). A pair matching in both bands now verifies twice — pure
    # band-local compute, strictly cheaper than shuffling every pair's
    # arrays — and the downstream distinct needs only doc_b anyway.
    inter = F.size(F.array_intersect(F.col("a.shingles"), F.col("b.shingles")))
    union = F.size("a.shingles") + F.size("b.shingles") - inter
    verified = (
        a.join(
            b,
            (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.band_no") == F.col("b.band_no"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("b.doc_id").alias("doc_b"), (2 * inter >= union).alias("_dup"))
        .filter(F.col("_dup"))
        .select("doc_b")
        .distinct()
    )
    return d.select("doc_id").join(
        verified.withColumnRenamed("doc_b", "dropped_id"),
        F.col("doc_id") == F.col("dropped_id"),
        "left",
    ).select("doc_id", F.col("dropped_id").isNull().alias("keep"))


@register(
    "dedup_incremental_against_index",
    oracle="""
    WITH index_hashes AS (
      SELECT DISTINCT sha256(text) AS h FROM documents WHERE doc_id % 4 != 3),
    incoming AS (
      SELECT doc_id, sha256(text) AS h, lang FROM documents WHERE doc_id % 4 = 3)
    SELECT i.doc_id, i.lang,
           (idx.h IS NOT NULL) AS is_duplicate
    FROM incoming i LEFT JOIN index_hashes idx ON i.h = idx.h
    """,
    tags=("llm", "dedup", "incremental"),
)
def dedup_incremental_against_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup — the daily-ingest shape: new documents
    (doc_id ≡ 3 mod 4 stands in for today's batch) are checked against
    the content-hash index of the existing corpus, NOT against each
    other with a full re-cluster. Output marks each incoming doc
    duplicate/fresh.

    Scale: the index is (hash) only — bytes per historical doc, not
    the text — and the probe is one hash join where the incoming batch
    is the small side (AQE broadcasts it). A 100 TB corpus's index is
    ~3 TB and never rescans raw history; this is why pipelines persist
    the hash index as a first-class table (cf. the bucketed-layout
    variant in join_bucketed_colocated)."""
    d = load_table(spark, sf_dir, "documents")
    index_hashes = (
        d.filter(F.col("doc_id") % 4 != 3)
        .select(F.sha2("text", 256).alias("h"))
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    incoming = d.filter(F.col("doc_id") % 4 == 3).select(
        "doc_id", F.sha2("text", 256).alias("h"), "lang"
    )
    return incoming.join(index_hashes, "h", "left").select(
        "doc_id", "lang", F.col("hit").isNotNull().alias("is_duplicate")
    )


CHUNK_TOKENS = 10  # pseudo-sentence size for chunk-level dedup


@register(
    "dedup_chunks_reconstruct",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, string_split(trim(text), ' ') AS toks FROM documents),
    ch AS (
      SELECT doc_id, i AS idx,
             array_to_string(
               toks[(i * {CHUNK_TOKENS} + 1):(i * {CHUNK_TOKENS} + {CHUNK_TOKENS})],
               ' ') AS chunk
      FROM t CROSS JOIN
           unnest(generate_series(0,
               CAST(ceil(len(toks) / {CHUNK_TOKENS}.0) AS BIGINT) - 1)) AS u(i)),
    ranked AS (
      SELECT doc_id, idx, chunk,
             row_number() OVER (PARTITION BY md5(chunk)
                                ORDER BY doc_id, idx) AS rn
      FROM ch),
    kept AS (
      SELECT doc_id, idx, chunk FROM ranked WHERE rn = 1),
    tot AS (
      SELECT doc_id, COUNT(*) AS n_chunks FROM ch GROUP BY doc_id),
    re AS (
      SELECT doc_id, COUNT(*) AS n_kept,
             md5(string_agg(chunk, ' ' ORDER BY idx)) AS kept_fingerprint
      FROM kept GROUP BY doc_id)
    SELECT t.doc_id, t.n_chunks,
           COALESCE(re.n_kept, 0) AS n_kept,
           (t.n_chunks - COALESCE(re.n_kept, 0)) * 1000000 // t.n_chunks
             AS dropped_ppm,
           re.kept_fingerprint
    FROM tot t LEFT JOIN re USING (doc_id)
    """,
    tags=("llm", "dedup", "curation"),
)
def dedup_chunks_reconstruct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-level (line-level) dedup with document reconstruction —
    the CCNet/RefinedWeb-style pass that removes repeated boilerplate
    SEGMENTS (headers, footers, licence blocks) while keeping the rest
    of the document: split each doc into 10-token pseudo-sentences,
    keep only each chunk's FIRST occurrence corpus-wide ((doc_id, idx)
    order), and reassemble the survivors in position order. Exact-doc
    and window dedup either drop whole documents or only flag them;
    this one rewrites their text.

    Output is (doc_id, n_chunks, n_kept, dropped_ppm, fingerprint of
    the reconstructed text) — the fingerprint keeps the driver payload
    small while pinning the exact reassembled bytes.

    Scale: chunks explode map-side; ONE corpus-sized shuffle on the
    (uniform) chunk digest for the first-occurrence window (constant
    per-group state via row_number over a bounded frame); the
    reassembly groupBy rides the doc_id key and the totals join is
    doc-cardinality. No all-pairs anything; a doc whose every chunk is
    boilerplate survives as a row with n_kept=0 and NULL fingerprint
    in both engines. parallelize_scan spreads the chunk/md5 map work
    on single-row-group fixtures (no-op on a real multi-split
    corpus)."""
    from pyspark.sql import Window

    d = parallelize_scan(load_table(spark, sf_dir, "documents"))
    toks = F.split(F.trim(F.col("text")), " ")
    n_chunks_col = F.ceil(F.size(toks) / F.lit(float(CHUNK_TOKENS))).cast("bigint")
    ch = d.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), (n_chunks_col - 1).cast("int")),
                lambda i: F.struct(
                    i.cast("bigint").alias("idx"),
                    F.concat_ws(
                        " ", F.slice(toks, i * CHUNK_TOKENS + 1, CHUNK_TOKENS)
                    ).alias("chunk"),
                ),
            )
        ).alias("c"),
    ).select("doc_id", "c.idx", "c.chunk")
    w = Window.partitionBy(F.md5("chunk")).orderBy("doc_id", "idx")
    kept = (
        ch.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    tot = ch.groupBy("doc_id").agg(F.count("*").alias("n_chunks"))
    re = kept.groupBy("doc_id").agg(
        F.count("*").alias("n_kept"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("idx", "chunk"))
                    ),
                    lambda s: s.getField("chunk"),
                ),
                " ",
            )
        ).alias("kept_fingerprint"),
    )
    return tot.join(re, "doc_id", "left").select(
        "doc_id",
        "n_chunks",
        F.coalesce("n_kept", F.lit(0).cast("bigint")).alias("n_kept"),
        F.expr(
            "CAST((n_chunks - coalesce(n_kept, 0)) * 1000000 div n_chunks AS BIGINT)"
        ).alias("dropped_ppm"),
        "kept_fingerprint",
    )


# Deterministic 1-in-K pair sample for the calibration audit. The audit
# estimates the |est - exact| error DISTRIBUTION of a band/row config; a
# hash-sample of candidate pairs estimates that distribution just as
# well (it is an audit, not a dedup pass — no pair is deleted from it),
# while dividing the expensive exact-Jaccard re-check by K. K=16 is the
# DEFAULT (round-10, VERDICT r9 item 1): the sampled audit is the
# production posture at every scale, and it is what bench/stress/gates
# all measure — the sample is md5(doc_a_doc_b)-keyed, so both engines
# (the oracle SQL below is generated from the same constant) and any
# two runs select the identical pair subset, keeping the audit fully
# hash-checkable. Set SHSS_CALIB_SAMPLE_K=1 for an exhaustive audit of
# every candidate pair (same cost class as dedup_minhash_pairs).
CALIB_SAMPLE_K = int(os.environ.get("SHSS_CALIB_SAMPLE_K", "16"))

_SQL_CALIB_SAMPLE = (
    f"""
    samp AS (
      SELECT * FROM pairs
      WHERE CAST(('0x' || substr(md5(concat(doc_a, '_', doc_b)), 1, 7)) AS BIGINT)
            % {CALIB_SAMPLE_K} = 0),
    """
    if CALIB_SAMPLE_K > 1
    else "samp AS (SELECT * FROM pairs),"
)


@register(
    "dedup_minhash_calibration",
    oracle=f"""
    WITH t AS (SELECT doc_id, string_split(trim(text), ' ') AS toks FROM documents),
    hxt AS (SELECT doc_id, {_SQL_HX} AS hx FROM t),
    -- degenerate docs (NULL minhash: NULL / <3-token text) are not
    -- candidates; also guarantees n_union >= 1 below (no 0-divide).
    -- dig = the 60-bit shingle digest (md5 head) already computed for
    -- the minhash permutations — the exact-Jaccard intersect runs on
    -- 8-byte ints, not 32-char hex strings
    mh AS (SELECT * FROM (SELECT doc_id, {_SQL_DIG} AS dig,
                                 {_SQL_MINHASH} FROM hxt)
           WHERE mh0 IS NOT NULL),
    bands AS (
      SELECT doc_id, 0 AS band_no,
             md5(concat_ws('_', mh0, mh1, mh2, mh3)) AS band_key FROM mh
      UNION ALL
      SELECT doc_id, 1 AS band_no,
             md5(concat_ws('_', mh4, mh5, mh6, mh7)) AS band_key FROM mh),
    {_SQL_BAND_REPS.strip()},
    pairs AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM reps a JOIN bands b
        ON a.band_key = b.band_key AND a.band_no = b.band_no
       AND a.doc_id < b.doc_id),
    {_SQL_CALIB_SAMPLE.strip()}
    j AS (
      SELECT p.doc_a, p.doc_b,
             CAST(((x.mh0 = y.mh0)::INT + (x.mh1 = y.mh1)::INT
                 + (x.mh2 = y.mh2)::INT + (x.mh3 = y.mh3)::INT
                 + (x.mh4 = y.mh4)::INT + (x.mh5 = y.mh5)::INT
                 + (x.mh6 = y.mh6)::INT + (x.mh7 = y.mh7)::INT) AS BIGINT)
               AS n_match_perms,
             CAST(len(list_intersect(x.dig, y.dig)) AS BIGINT) AS n_inter,
             CAST(len(x.dig) + len(y.dig)
                  - len(list_intersect(x.dig, y.dig)) AS BIGINT) AS n_union
      FROM samp p
      JOIN mh x ON x.doc_id = p.doc_a
      JOIN mh y ON y.doc_id = p.doc_b)
    SELECT doc_a, doc_b, n_match_perms,
           CAST(round(n_match_perms * 1000000.0 / {N_MINHASH}, 0) AS BIGINT)
             AS est_jaccard_ppm,
           CAST(round(n_inter * 1000000.0 / n_union, 0) AS BIGINT)
             AS exact_jaccard_ppm,
           CAST(abs(CAST(round(n_match_perms * 1000000.0 / {N_MINHASH}, 0) AS BIGINT)
                  - CAST(round(n_inter * 1000000.0 / n_union, 0) AS BIGINT)) AS BIGINT)
             AS abs_err_ppm
    FROM j
    """,
    tags=("llm", "dedup", "minhash", "audit"),
)
def dedup_minhash_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH calibration audit: for every candidate pair the band join
    surfaces, the MinHash Jaccard ESTIMATE (matching permutations / N)
    side by side with the EXACT shingle Jaccard and the absolute
    error — the measurement that tells you whether your band/row
    configuration is tuned before you trust it to delete data at
    100 TB. Everything is integer ppm from exact set sizes, so the
    whole audit is hash-checked.

    Scale: candidate pairs only (band-bucket-local, the same join as
    dedup_minhash_pairs); the exact-Jaccard re-check touches only
    those pairs. The pair-side fetches ship a PACKED signature (one
    array of 8 longs) plus the 60-bit shingle DIGESTS already computed
    for the permutations — never the raw shingle strings (5× narrower
    through both pair-side shuffles; digest collisions would need two
    distinct shingles of one doc to share a 60-bit token-combine
    value, ~2^-60 per in-doc pair — see the scheme note at _hx_frame).
    The audit runs over a deterministic md5-keyed 1-in-K
    sample of the candidate pairs (K=16 default — the production
    posture at 100 TB, where the error distribution is what's being
    estimated, not any individual pair; see CALIB_SAMPLE_K above).
    The sample key is pure in the pair, so the oracle — generated from
    the same constant — selects the identical subset and the audit
    stays hash-checked at every K; SHSS_CALIB_SAMPLE_K=1 restores the
    exhaustive audit.

    NOT exhaustive under the star cap: buckets larger than BAND_CAP
    (SHSS_BAND_CAP) omit member-member pairs between two
    non-representatives, so the calibration sample is the rep-anchored
    subset of candidates, not every candidate (see the BAND_CAP module
    note). Unbiased for tuning purposes — reps are lowest-id, not
    similarity-selected — but a capped run's pair list is a sample."""
    d = parallelize_scan(load_table(spark, sf_dir, "documents"))
    sig = (
        # four consumers (two band sides + both pair sides): shingle
        # once — at 100 TB this is the persisted signature table.
        # r13: file-backed barrier instead of localCheckpoint — this is
        # the dig-array-carrying corpus-sized relation, i.e. exactly
        # the 25–55 s block-manager variance class the r13a A/B
        # adjudicated (BASELINE.md); the parquet read-back additionally
        # gives the two band branches COLUMN PRUNING (they read only
        # (doc_id, mh) — the checkpoint scan always deserialized the
        # dig arrays too). ×100 before/after in stress_x100_r13b.json.
        materialize_parquet(_signature_frame(d, digests=True))
        # degenerate docs (NULL minhash) are not candidates; keeps
        # n_union >= 1 so exact_jaccard never divides by zero. The
        # filter sits AFTER the barrier on purpose: before it,
        # predicate pushdown substitutes the whole minhash fold into
        # the filter and re-evaluates it per row (measured 1.9 s →
        # 6.2 s); on the materialized column it is a free scan filter
        .filter(F.col("mh").isNotNull())
    )
    b0 = F.md5(F.concat_ws("_", *[F.col("mh").getItem(i) for i in range(4)]))
    b1 = F.md5(F.concat_ws("_", *[F.col("mh").getItem(i) for i in range(4, 8)]))
    bands = sig.select(
        "doc_id", F.lit(0).alias("band_no"), b0.alias("band_key")
    ).unionByName(
        sig.select("doc_id", F.lit(1).alias("band_no"), b1.alias("band_key"))
    )
    a = _band_reps(bands).alias("a")  # star scheme: reps x all members
    b = bands.alias("b")
    raw_pairs = a.join(
        b,
        (F.col("a.band_key") == F.col("b.band_key"))
        & (F.col("a.band_no") == F.col("b.band_no"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
    if CALIB_SAMPLE_K > 1:
        # the sample key is a pure function of the pair, so filtering
        # BEFORE the distinct gives the identical pair set while the
        # dedup shuffle moves 1/K of the rows
        raw_pairs = raw_pairs.filter(
            F.conv(
                F.substring(F.md5(F.concat_ws("_", "doc_a", "doc_b")), 1, 7),
                16,
                10,
            ).cast("bigint")
            % CALIB_SAMPLE_K
            == 0
        )
    pairs = raw_pairs.distinct()
    x = sig.select(
        F.col("doc_id").alias("doc_a"),
        F.col("dig").alias("dig_a"),
        F.col("mh").alias("mh_a"),
    )
    y = sig.select(
        F.col("doc_id").alias("doc_b"),
        F.col("dig").alias("dig_b"),
        F.col("mh").alias("mh_b"),
    )
    j = pairs.join(x, "doc_a").join(y, "doc_b")
    n_match = F.aggregate(
        F.zip_with("mh_a", "mh_b", lambda p, q: (p == q).cast("int")),
        F.lit(0),
        lambda acc, v: acc + v,
    ).cast("bigint")
    n_inter = F.size(F.array_intersect("dig_a", "dig_b")).cast("bigint")
    n_union = (
        F.size("dig_a").cast("bigint") + F.size("dig_b").cast("bigint") - n_inter
    )
    est = F.round(n_match * 1000000.0 / N_MINHASH, 0).cast("bigint")
    exact = F.round(n_inter * 1000000.0 / n_union, 0).cast("bigint")
    return j.select(
        "doc_a",
        "doc_b",
        n_match.alias("n_match_perms"),
        est.alias("est_jaccard_ppm"),
        exact.alias("exact_jaccard_ppm"),
        F.abs(est - exact).cast("bigint").alias("abs_err_ppm"),
    )


# --- directional containment via rare-shingle candidate pairs --------------

# Inverted-index prefix filter: candidate pairs must share at least one
# shingle whose document frequency is in [2, RARE_DF_CAP]. Popular
# shingles (boilerplate) never form pairs, which bounds the self-join at
# sum(df^2) <= RARE_DF_CAP * |postings| — linear in corpus size.
RARE_DF_CAP = int(os.environ.get("SHSS_RARE_DF_CAP", "16"))


@register(
    "dedup_containment_pairs",
    oracle=f"""
    WITH t AS (SELECT doc_id, string_split(trim(text), ' ') AS toks FROM documents),
    hxt AS (SELECT doc_id, {_SQL_HX} AS hx FROM t WHERE len(toks) >= 3),
    sh AS (SELECT doc_id, {_SQL_DIG} AS shingles FROM hxt),
    e AS (SELECT doc_id, unnest(shingles) AS h FROM sh),
    rare AS (
      SELECT h FROM e GROUP BY h
      HAVING COUNT(*) BETWEEN 2 AND {RARE_DF_CAP}),
    er AS (SELECT e.doc_id, e.h FROM e JOIN rare USING (h)),
    pairs AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM er a JOIN er b ON a.h = b.h AND a.doc_id < b.doc_id)
    SELECT p.doc_a, p.doc_b,
           CAST(len(sa.shingles) AS BIGINT) AS n_sh_a,
           CAST(len(sb.shingles) AS BIGINT) AS n_sh_b,
           CAST(len(list_intersect(sa.shingles, sb.shingles)) AS BIGINT)
             AS n_common,
           len(list_intersect(sa.shingles, sb.shingles)) / len(sa.shingles)
             AS containment_a,
           len(list_intersect(sa.shingles, sb.shingles)) / len(sb.shingles)
             AS containment_b,
           10 * len(list_intersect(sa.shingles, sb.shingles))
             >= 9 * LEAST(len(sa.shingles), len(sb.shingles)) AS near_superset
    FROM pairs p
    JOIN sh sa ON sa.doc_id = p.doc_a
    JOIN sh sb ON sb.doc_id = p.doc_b
    """,
    tags=("llm", "dedup", "containment"),
)
def dedup_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directional containment scoring — the dedup signal Jaccard
    misses: a short document quoted whole inside a long one has high
    containment C(A,B) = |S_A ∩ S_B| / |S_A| but low Jaccard, so
    MinHash-LSH (tuned for symmetric similarity) never pairs them.
    Candidate pairs come from a RARE-shingle inverted index (prefix
    filtering, the PPJoin family's bound): only shingles with document
    frequency in [2, SHSS_RARE_DF_CAP] form pairs, so boilerplate
    n-grams never self-join and pair work is bounded by
    df_cap * |postings| — linear in the corpus, never all-pairs.
    Recall bound (documented, not silent): a pair whose every shared
    shingle is more popular than the cap is missed; near-supersets of
    non-boilerplate text always share rare shingles in practice.

    Exactness: candidates are approximate, but each emitted pair's
    containment is EXACT — both docs' full distinct-shingle digest
    arrays, re-derived for the PAIRED docs only, intersect per pair
    (O(|A|+|B|) hash intersect, bounded by doc length). Digests are
    the 60-bit token-combine values (see the scheme note at
    _hx_frame; a within-pair collision is ~2^-60). Counts are
    BIGINTs, containments are single int/int IEEE divides, and the
    near_superset verdict (>= 0.9 of the smaller side) compares
    integers — bit-identical in both engines. (Assumes unique doc_id,
    as every fixture and the fuzzer guarantee; the oracle's
    doc_id-keyed joins assume the same.)

    Scale shape (r11, VERDICT r10 item 3): ONE corpus postings pass
    feeds an explicit h-repartition whose Exchange both the
    document-frequency agg and the rare join REUSE (one shuffle, one
    shingle+hash pass, no corpus-sized materialization — see the
    in-body note for the measured localCheckpoint/window dead ends);
    the df-capped rare index bounds the pair self-join, and the
    exact verify re-shingles only the paired docs. ×100 isolate:
    13.3 s (r10) → 9.2 s, under the <12 s bar. No minhash
    approximation, no windows, no Python."""
    d = parallelize_scan(load_table(spark, sf_dir, "documents"))
    toks = F.split(F.trim(F.col("text")), " ")

    def postings(docs: DataFrame) -> DataFrame:
        # one row per (doc, distinct shingle digest) — the r11
        # token-combine digests (see the module note at _hx_frame)
        return _hx_frame(docs.filter(F.size(toks) >= 3)).select(
            "doc_id", F.explode(_dig_col()).alias("h")
        )

    # NO corpus-sized materialization anywhere (the r11 lesson, twice
    # over): localCheckpoint of the 26M-row postings relation cost a
    # wildly variable 25-55 s at ×100 — dwarfing the 4.6 s map pass it
    # "saved" — and a count-window over the h-partitioning buffered
    # every digest's postings (149 s). Instead the postings pass runs
    # ONCE into an explicit h-repartition: the document-frequency agg
    # and the rare join both consume that SAME Exchange subtree
    # (branched from one Python object, so the plans are identical and
    # ReuseExchange serves both from one shuffle), each partition-local
    # above it. Only the BOUNDED relations (rare postings, pairs,
    # paired-doc postings) ever hit the block manager.
    ex = postings(d).repartition(F.col("h"))
    rare = (
        ex.groupBy("h")
        .agg(F.count("*").alias("df"))
        .filter((F.col("df") >= 2) & (F.col("df") <= RARE_DF_CAP))
        .select("h")
    )
    # er is BOTH sides of the pair self-join below; df-capped, so its
    # size is bounded by RARE_DF_CAP × |rare shingles| — but |rare
    # shingles| GROWS with the corpus, so this is a corpus-scaling
    # relation: r13 moves it to the file-backed barrier (the
    # block-manager variance class bit exactly this shape — see
    # BASELINE.md r13 barrier A/B; the persisted rare-postings index is
    # what a production pipeline keeps anyway)
    er = materialize_parquet(ex.join(rare, "h"))
    pairs = (
        er.alias("a")
        .join(
            er.alias("b"),
            (F.col("a.h") == F.col("b.h")) & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
        # consumed by the paired-doc semi-join AND the co-count join
        .localCheckpoint(eager=True)
    )
    pdocs = (
        pairs.select(F.col("doc_a").alias("doc_id"))
        .union(pairs.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    # digest ARRAYS of PAIRED docs only — the exact-containment verify
    # intersects per pair (O(|A|+|B|) hash intersect), which beats a
    # postings co-count join when pairs are dense (the co-count
    # variant exploded each pair × its shingles: measured 12.6 s vs
    # 2.7 s at sf0.1 on the dup-heavy fixture). The join runs BEFORE
    # the hx projection, so digests are recomputed for paired docs
    # alone — the corpus side of this pass is a bare (doc_id, text)
    # scan into the join; bounded by pairs, not the corpus.
    sh = (
        _hx_frame(d.join(pdocs, "doc_id").filter(F.size(toks) >= 3))
        .select("doc_id", _dig_col().alias("shingles"))
        .localCheckpoint(eager=True)
    )
    sa = sh.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a"))
    sb = sh.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b"))
    j = pairs.join(sa, "doc_a").join(sb, "doc_b")
    common = F.size(F.array_intersect("sh_a", "sh_b")).cast("bigint")
    na = F.size("sh_a").cast("bigint")
    nb = F.size("sh_b").cast("bigint")
    return j.select(
        "doc_a",
        "doc_b",
        na.alias("n_sh_a"),
        nb.alias("n_sh_b"),
        common.alias("n_common"),
        (common / na).alias("containment_a"),
        (common / nb).alias("containment_b"),
        (10 * common >= 9 * F.least(na, nb)).alias("near_superset"),
    )


# --- SimHash Hamming near-dup pairs via pigeonhole bands --------------------

SIMHASH_PAIR_BITS = 60  # 15 hex chars of md5: exact 60-bit long in both engines
SIMHASH_BANDS = 4  # 15 bits each: Hamming <= 3 -> >= 1 identical band
SIMHASH_HAM_MAX = 3

_SQL_SH_SIG = " + ".join(
    f"(CASE WHEN 2 * SUM((mask >> {i}) & 1) > COUNT(*) "
    f"THEN CAST({1 << i} AS BIGINT) ELSE 0 END)"
    for i in range(SIMHASH_PAIR_BITS)
)
_SQL_SH_HAM = " + ".join(
    f"((xor(x.sig, y.sig) >> {i}) & 1)" for i in range(SIMHASH_PAIR_BITS)
)


@register(
    "dedup_simhash_hamming_pairs",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, string_split(trim(text), ' ') AS toks
      FROM documents WHERE text IS NOT NULL AND len(trim(text)) >= 1),
    m AS (
      SELECT doc_id,
             CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT) AS mask
      FROM (SELECT doc_id, unnest(toks) AS tok FROM t)),
    sig AS (
      SELECT doc_id, {_SQL_SH_SIG} AS sig
      FROM m GROUP BY doc_id),
    bands AS (
      SELECT doc_id, b AS band_no,
             CAST((sig >> (15 * b)) & 32767 AS BIGINT) AS band_key
      FROM sig, unnest([0, 1, 2, 3]) AS u(b)),
    {_SQL_BAND_REPS.strip()},
    pairs AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM reps a JOIN bands b
        ON a.band_key = b.band_key AND a.band_no = b.band_no
       AND a.doc_id < b.doc_id)
    SELECT p.doc_a, p.doc_b,
           CAST({_SQL_SH_HAM} AS BIGINT) AS hamming,
           CAST({_SQL_SH_HAM} AS BIGINT) <= {SIMHASH_HAM_MAX} AS is_near
    FROM pairs p
    JOIN sig x ON x.doc_id = p.doc_a
    JOIN sig y ON y.doc_id = p.doc_b
    """,
    tags=("llm", "dedup", "simhash"),
)
def dedup_simhash_hamming_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup candidate pairs with exact Hamming verification
    — the Charikar/Manku-Jain-Sarma pipeline (WWW'07): a 60-bit
    majority-vote SimHash per document, pigeonholed into 4 bands of 15
    bits (any pair within Hamming 3 must agree on at least one whole
    band), candidates generated ONLY inside band buckets, then the
    exact Hamming distance recomputed per candidate (two 8-byte longs
    per side through the pair join — the cheapest verify in the dedup
    family).

    Signature shape: tokens explode to (doc, 60-bit md5 mask) rows and
    ONE groupBy(doc_id) computes all 60 per-bit majority counts as
    map-side-combinable SUMs — no ordered fold, no per-bit pass over
    the token array (the dedup_simhash lesson: N separate array passes
    generate a codegen unit that runs interpreted).

    Scale: 15-bit bands give 32768 buckets per band, so bucket
    occupancy — and with it pair volume — grows linearly with the
    corpus at fixture dimensions; the BAND_CAP star scheme bounds
    replicated-corpus blowup exactly as in dedup_minhash_pairs (same
    truncation semantics caveat). On a random corpus candidate pairs
    are near-uniform bucket collisions with is_near=false; recall on
    planted near-dups is pinned by tests/test_llm_ops.py."""
    d = parallelize_scan(load_table(spark, sf_dir, "documents"))
    toks = F.split(F.trim(F.col("text")), " ")
    m = (
        d.filter(F.col("text").isNotNull() & (F.length(F.trim("text")) >= 1))
        .select("doc_id", F.explode(toks).alias("tok"))
        .select(
            "doc_id",
            F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10)
            .cast("bigint")
            .alias("mask"),
        )
    )
    bit_sums = [
        F.sum(F.shiftright("mask", i).bitwiseAND(F.lit(1))).alias(f"c{i}")
        for i in range(SIMHASH_PAIR_BITS)
    ]
    g = m.groupBy("doc_id").agg(F.count("*").alias("n"), *bit_sums)
    sig_expr = None
    for i in range(SIMHASH_PAIR_BITS):
        term = F.when(
            2 * F.col(f"c{i}") > F.col("n"), F.lit(1 << i).cast("bigint")
        ).otherwise(F.lit(0).cast("bigint"))
        sig_expr = term if sig_expr is None else sig_expr + term
    # the band branches read it: materialize once (the persisted
    # signature table at 100 TB). The pair sides no longer re-join it —
    # the 8-byte signature rides the band rows and the exact Hamming
    # verify happens MAP-SIDE off the band join's xor (r13, the
    # map-side-Jaccard lesson: the r12 form shuffled the candidate-pair
    # relation twice more to re-attach sig); see the xor note below for
    # where the popcount chain runs relative to the distinct.
    sig = g.select("doc_id", sig_expr.alias("sig")).localCheckpoint(eager=True)
    bands = None
    for b in range(SIMHASH_BANDS):
        part = sig.select(
            "doc_id",
            "sig",
            F.lit(b).alias("band_no"),
            F.shiftright("sig", 15 * b).bitwiseAND(F.lit(32767))
            .cast("bigint")
            .alias("band_key"),
        )
        bands = part if bands is None else bands.unionByName(part)
    a = _band_reps(bands).alias("a")  # star scheme: reps x all members
    b = bands.alias("b")
    # the 8-byte xor (ONE op) rides through the distinct; the 60-term
    # popcount chain runs on the post-distinct pairs only (r13b: the
    # first map-side form computed hamming pre-distinct on every
    # band-duplicated row and widened the distinct key — ×100 14.6 s
    # vs 11.1 for r12; this form pays one op pre-distinct, the chain
    # once per unique pair, and still no signature-fetch joins). xor
    # is a pure function of the pair, so distinct on (doc_a, doc_b, x)
    # dedups band collisions exactly like a pair-only distinct.
    xor = F.col("a.sig").bitwiseXOR(F.col("b.sig"))
    uniq = (
        a.join(
            b,
            (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.band_no") == F.col("b.band_no"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            xor.alias("x"),
        )
        .distinct()
    )
    xcol = F.col("x")
    ham = None
    for i in range(SIMHASH_PAIR_BITS):
        term = F.shiftright(xcol, i).bitwiseAND(F.lit(1))
        ham = term if ham is None else ham + term
    return uniq.select(
        "doc_a",
        "doc_b",
        ham.cast("bigint").alias("hamming"),
        (ham.cast("bigint") <= SIMHASH_HAM_MAX).alias("is_near"),
    )


@register(
    "dedup_threshold_sweep",
    oracle=f"""
    WITH t AS (SELECT doc_id, string_split(trim(text), ' ') AS toks FROM documents),
    hxt AS (SELECT doc_id, {_SQL_HX} AS hx FROM t),
    mh AS (SELECT * FROM (SELECT doc_id, {_SQL_MINHASH} FROM hxt)
           WHERE mh0 IS NOT NULL),
    bands AS (
      SELECT doc_id, 0 AS band_no,
             md5(concat_ws('_', mh0, mh1, mh2, mh3)) AS band_key FROM mh
      UNION ALL
      SELECT doc_id, 1 AS band_no,
             md5(concat_ws('_', mh4, mh5, mh6, mh7)) AS band_key FROM mh),
    {_SQL_BAND_REPS.strip()},
    pairs AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM reps a JOIN bands b
        ON a.band_key = b.band_key AND a.band_no = b.band_no
       AND a.doc_id < b.doc_id),
    j AS (
      SELECT p.doc_a, p.doc_b,
             CAST(((x.mh0 = y.mh0)::INT + (x.mh1 = y.mh1)::INT
                 + (x.mh2 = y.mh2)::INT + (x.mh3 = y.mh3)::INT
                 + (x.mh4 = y.mh4)::INT + (x.mh5 = y.mh5)::INT
                 + (x.mh6 = y.mh6)::INT + (x.mh7 = y.mh7)::INT) AS BIGINT)
               AS n_match
      FROM pairs p
      JOIN mh x ON x.doc_id = p.doc_a
      JOIN mh y ON y.doc_id = p.doc_b),
    ph AS (SELECT n_match, CAST(COUNT(*) AS BIGINT) AS c_pairs
           FROM j GROUP BY n_match),
    dm AS (SELECT doc, MAX(n_match) AS m
           FROM (SELECT doc_a AS doc, n_match FROM j
                 UNION ALL SELECT doc_b AS doc, n_match FROM j)
           GROUP BY doc),
    dh AS (SELECT m, CAST(COUNT(*) AS BIGINT) AS c_docs FROM dm GROUP BY m),
    ks AS (SELECT k FROM range(1, {N_MINHASH + 1}) t(k))
    SELECT CAST(k AS BIGINT) AS min_match_perms,
           CAST(k * {1_000_000 // N_MINHASH} AS BIGINT) AS threshold_ppm,
           CAST(COALESCE((SELECT SUM(c_pairs) FROM ph WHERE n_match >= k), 0)
                AS BIGINT) AS n_pairs,
           CAST(COALESCE((SELECT SUM(c_docs) FROM dh WHERE m >= k), 0)
                AS BIGINT) AS n_docs
    FROM ks
    """,
    tags=("llm", "dedup", "minhash", "audit"),
)
def dedup_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup VOLUME tuning curve: for every MinHash agreement threshold
    k/8 (k = 1..8 matching permutations, i.e. estimated Jaccard
    >= k/8), the number of candidate pairs that clear it and the
    number of DOCUMENTS touched by at least one such pair — the two
    numbers an operator reads before picking the deletion threshold
    (dedup_minhash_calibration audits the estimator's ERROR; this
    audits the BLAST RADIUS). Band-sharing already implies 4 matching
    permutations, so the curve is flat below k=5 by construction — the
    informative region is exactly the thresholds a 2x4 LSH config can
    act on.

    Exactness: matching-permutation counts are integer equality tests
    on the shared signature table; histogram + threshold roll-ups are
    pure integer aggregation over an 8-row spine; thresholds are exact
    integer ppm (k * 125000).

    Scale shape: the SAME band-bucket candidate machinery as
    dedup_minhash_pairs/calibration (never all-pairs, star-capped);
    per-pair work is one packed-signature zip; the two histograms are
    <= 9 rows each, joined to the constant spine broadcast-side.
    NOT exhaustive under the star cap (see the BAND_CAP module note):
    a capped run's curve is the rep-anchored candidate subset."""
    d = parallelize_scan(load_table(spark, sf_dir, "documents"))
    sig = (
        _signature_frame(d)
        # two consumers (the two band branches; r13 moved the pair
        # sides map-side — see below). localCheckpoint measured and
        # KEPT (r14 A/B at ×100: materialize_parquet regressed this
        # barrier 11.3 → 19.3 s — the packed mh ARRAY column pays
        # parquet encode/decode on write+2 reads, where the sibling
        # signature barriers that moved to parquet in r13 carry flat
        # int64 columns; the barrier policy is shape-specific, not
        # blanket)
        .localCheckpoint(eager=True)
        .filter(F.col("mh").isNotNull())
    )
    b0 = F.md5(F.concat_ws("_", *[F.col("mh").getItem(i) for i in range(4)]))
    b1 = F.md5(F.concat_ws("_", *[F.col("mh").getItem(i) for i in range(4, 8)]))
    # the packed signature (8 longs, 64 B) RIDES the band rows, so
    # n_match is computed map-side in the band join's projection and
    # the two per-pair signature-fetch joins disappear (r13 — the
    # dedup_pipeline_end_to_end map-side-Jaccard lesson applied to the
    # sweep: the r12 form shuffled the 16M-pair relation twice more to
    # re-attach mh from the signature table). n_match is a pure
    # function of the pair, so distinct() on (doc_a, doc_b, n_match)
    # dedups band-collision duplicates exactly like the old pair-only
    # distinct.
    bands = sig.select(
        "doc_id", F.lit(0).alias("band_no"), b0.alias("band_key"), "mh"
    ).unionByName(
        sig.select("doc_id", F.lit(1).alias("band_no"), b1.alias("band_key"), "mh")
    )
    a = _band_reps(bands).alias("a")
    b = bands.alias("b")
    n_match = F.aggregate(
        F.zip_with(F.col("a.mh"), F.col("b.mh"), lambda p, q: (p == q).cast("int")),
        F.lit(0),
        lambda acc, v: acc + v,
    ).cast("bigint")
    j = (
        a.join(
            b,
            (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.band_no") == F.col("b.band_no"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            n_match.alias("n_match"),
        )
        .distinct()
    )
    # THREE consumers read j (the pair histogram and BOTH branches of
    # the doc-level union): without a barrier the band self-join +
    # distinct re-executed three times — the r13a/r12 forms were flat
    # at ~37 s at ×100 because of exactly this, not the per-pair work.
    # Fixed-width int64 triples are the parquet-friendly barrier case
    # (the calibration A/B — BASELINE.md r13 barrier notes).
    j = materialize_parquet(j)
    ph = j.groupBy("n_match").agg(F.count("*").cast("bigint").alias("c_pairs"))
    dm = (
        j.select(F.col("doc_a").alias("doc"), "n_match")
        .unionByName(j.select(F.col("doc_b").alias("doc"), "n_match"))
        .groupBy("doc")
        .agg(F.max("n_match").alias("m"))
    )
    dh = dm.groupBy("m").agg(F.count("*").cast("bigint").alias("c_docs"))
    ks = spark.range(1, N_MINHASH + 1).select(F.col("id").alias("k"))
    np_ = (
        ks.join(F.broadcast(ph), F.col("n_match") >= F.col("k"), "left")
        .groupBy("k")
        .agg(F.coalesce(F.sum("c_pairs"), F.lit(0)).cast("bigint").alias("n_pairs"))
    )
    nd = (
        ks.join(F.broadcast(dh), F.col("m") >= F.col("k"), "left")
        .groupBy("k")
        .agg(F.coalesce(F.sum("c_docs"), F.lit(0)).cast("bigint").alias("n_docs"))
    )
    return (
        np_.join(nd, "k")
        .select(
            F.col("k").cast("bigint").alias("min_match_perms"),
            (F.col("k") * (1_000_000 // N_MINHASH)).cast("bigint").alias("threshold_ppm"),
            "n_pairs",
            "n_docs",
        )
    )
