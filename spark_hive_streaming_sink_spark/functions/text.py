"""Text-analysis operators for LLM-data pipelines (SURVEY.md §2C
extension): quality scoring, language-ID heuristic, token counting,
document fingerprinting.

All pure built-in string/array functions — JVM-side, codegen'd, no
Python in the hot path; at 100 TB these run as a single scan with
map-side-only work (no shuffle at all except the final stats).
"""

from __future__ import annotations

import re as _re

from pyspark.sql import Column, DataFrame, SparkSession
import pyspark.sql.functions as F

from ..io import load_table, parallelize_scan
from ..registry import register

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is")
_SQL_STOP = ", ".join(f"'{w}'" for w in STOPWORDS)
# regex alternation of the stopwords, each escaped so a future stopword
# carrying a regex metacharacter cannot silently change matching (both
# engines receive the identical escaped pattern)
_STOP_ALT = "|".join(_re.escape(w) for w in STOPWORDS)

# marker words per language for the n-gram/stopword language-ID heuristic
LANG_MARKERS = {
    "en": ("the", "a", "and", "of"),
    "de": ("der", "und", "die", "das"),
    "fr": ("le", "et", "la", "les"),
    "es": ("el", "y", "la", "los"),
}


def _toks(col: str = "text") -> Column:
    return F.split(F.trim(F.col(col)), " ")


@register(
    "text_stats_quality",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, lang, n_chars,
             string_split(trim(text), ' ') AS toks FROM documents),
    s AS (
      SELECT doc_id, lang, n_chars,
             len(toks) AS n_tokens,
             len(list_distinct(toks)) AS n_distinct,
             len(list_filter(toks, x -> list_contains([{_SQL_STOP}], x))) AS n_stop,
             CAST(list_sum(list_transform(toks, x -> length(x))) AS BIGINT) AS sum_tok_len
      FROM t)
    SELECT doc_id, lang, n_chars, n_tokens, n_distinct, n_stop,
           sum_tok_len / n_tokens AS avg_token_len,
           n_stop / n_tokens AS stopword_ratio,
           n_distinct / n_tokens AS ttr,
           0.4 * (n_distinct / n_tokens)
             + 0.4 * (n_stop / n_tokens)
             + 0.2 * (CASE WHEN n_tokens >= 50 THEN 1.0 ELSE n_tokens / 50.0 END)
             AS quality_score
    FROM s
    """,
    tags=("llm", "text"),
)
def text_stats_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document quality scoring: token stats, type-token ratio,
    stopword ratio, length factor → weighted score. All ratios are
    int/int double divisions (bit-identical cross-engine).
    parallelize_scan spreads the per-doc token analysis across cores
    on single-row-group fixture files."""
    d = parallelize_scan(load_table(spark, sf_dir, "documents"))
    toks = _toks()
    s = d.select(
        "doc_id",
        "lang",
        "n_chars",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
        F.size(F.filter(toks, lambda x: x.isin(*STOPWORDS))).alias("n_stop"),
        F.aggregate(
            F.transform(toks, lambda x: F.length(x).cast("bigint")),
            F.lit(0).cast("bigint"),
            lambda a, x: a + x,
        ).alias("sum_tok_len"),
    )
    nt = F.col("n_tokens")
    return s.select(
        "doc_id",
        "lang",
        "n_chars",
        "n_tokens",
        "n_distinct",
        "n_stop",
        (F.col("sum_tok_len") / nt).alias("avg_token_len"),
        (F.col("n_stop") / nt).alias("stopword_ratio"),
        (F.col("n_distinct") / nt).alias("ttr"),
        (
            F.lit(0.4) * (F.col("n_distinct") / nt)
            + F.lit(0.4) * (F.col("n_stop") / nt)
            + F.lit(0.2)
            * F.when(nt >= 50, F.lit(1.0)).otherwise(nt / F.lit(50.0))
        ).alias("quality_score"),
    )


def _lang_score_sql(lang: str) -> str:
    markers = ", ".join(f"'{w}'" for w in LANG_MARKERS[lang])
    return f"len(list_filter(toks, x -> list_contains([{markers}], x)))"


@register(
    "text_langid",
    oracle=f"""
    WITH t AS (SELECT doc_id, lang, string_split(trim(text), ' ') AS toks FROM documents),
    s AS (SELECT doc_id, lang,
                 {_lang_score_sql('en')} AS s_en,
                 {_lang_score_sql('de')} AS s_de,
                 {_lang_score_sql('fr')} AS s_fr,
                 {_lang_score_sql('es')} AS s_es
          FROM t)
    SELECT doc_id, lang, s_en, s_de, s_fr, s_es,
           CASE WHEN s_en = 0 AND s_de = 0 AND s_fr = 0 AND s_es = 0 THEN 'unknown'
                WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
                WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
                WHEN s_fr >= s_es THEN 'fr'
                ELSE 'es' END AS predicted,
           (CASE WHEN s_en = 0 AND s_de = 0 AND s_fr = 0 AND s_es = 0 THEN 'unknown'
                WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
                WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
                WHEN s_fr >= s_es THEN 'fr'
                ELSE 'es' END) = lang AS agrees
    FROM s
    """,
    tags=("llm", "text"),
)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word language-ID heuristic (deterministic scores + fixed
    priority tie-break). The fixture text is synthetic English-ish word
    soup for every lang label, so `agrees` is mostly false for non-en —
    the point is the deterministic classification pipeline shape."""
    d = load_table(spark, sf_dir, "documents")
    toks = _toks()
    def score_col(lang: str):
        markers = LANG_MARKERS[lang]  # bound per-lang; lambda stays 1-arg
        return F.size(F.filter(toks, lambda x: x.isin(*markers))).alias(f"s_{lang}")

    scores = d.select("doc_id", "lang", *[score_col(lang) for lang in LANG_MARKERS])
    s_en, s_de, s_fr, s_es = (F.col(c) for c in ["s_en", "s_de", "s_fr", "s_es"])
    pred = (
        F.when((s_en == 0) & (s_de == 0) & (s_fr == 0) & (s_es == 0), "unknown")
        .when((s_en >= s_de) & (s_en >= s_fr) & (s_en >= s_es), "en")
        .when((s_de >= s_fr) & (s_de >= s_es), "de")
        .when(s_fr >= s_es, "fr")
        .otherwise("es")
    )
    return scores.select(
        "doc_id", "lang", "s_en", "s_de", "s_fr", "s_es",
        pred.alias("predicted"),
        (pred == F.col("lang")).alias("agrees"),
    )


@register(
    "text_token_count",
    oracle=r"""
    SELECT doc_id,
           len(string_split_regex(trim(text), '\s+')) AS ws_tokens,
           len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS bpe_ish_tokens,
           length(text) AS n_chars_raw,
           length(replace(text, ' ', '')) AS n_chars_no_space
    FROM documents
    """,
    tags=("llm", "text"),
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace split + a BPE-ish regex segmentation
    (letter runs / digit runs / single punctuation)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("ws_tokens"),
        F.regexp_count(F.col("text"), F.lit(r"[a-z]+|[0-9]+|[^a-z0-9 ]")).alias(
            "bpe_ish_tokens"
        ),
        F.length("text").alias("n_chars_raw"),
        F.length(F.regexp_replace("text", " ", "")).alias("n_chars_no_space"),
    )


@register(
    "text_fingerprint",
    oracle="""
    WITH t AS (SELECT doc_id,
                      array_to_string(list_sort(list_distinct(
                          string_split(trim(lower(text)), ' '))), ' ') AS canon
               FROM documents)
    SELECT doc_id,
           md5(canon) AS fingerprint,
           substr(md5(canon), 1, 8) AS fp_bucket,
           length(canon) AS canon_len
    FROM t
    """,
    tags=("llm", "text", "dedup"),
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-form document fingerprint (lowercase → token set →
    sorted → md5): near-dup candidates share fingerprints regardless of
    token order / repetition. md5 hex is identical cross-engine."""
    d = parallelize_scan(load_table(spark, sf_dir, "documents"))
    # array_join, NOT concat_ws: a NULL text must fingerprint as NULL in
    # both engines (concat_ws would hash the empty string instead)
    canon = F.array_join(
        F.array_sort(F.array_distinct(F.split(F.trim(F.lower(F.col("text"))), " "))),
        " ",
    )
    return d.select(
        "doc_id",
        F.md5(canon).alias("fingerprint"),
        F.substring(F.md5(canon), 1, 8).alias("fp_bucket"),
        F.length(canon).alias("canon_len"),
    )


@register(
    "text_edit_distance",
    oracle="""
    WITH t AS (SELECT doc_id, substr(text, 1, 40) AS head FROM documents)
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           levenshtein(a.head, b.head) AS edit_dist,
           CAST(length(a.head) AS BIGINT) AS len_a,
           CAST(length(b.head) AS BIGINT) AS len_b
    FROM t a JOIN t b ON b.doc_id = a.doc_id + 1
    """,
    tags=("llm", "text"),
)
def text_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Levenshtein edit distance between consecutive documents' 40-char
    heads (bounded-length inputs keep the O(m·n) kernel constant-cost
    per pair — at corpus scale you never levenshtein full documents;
    you shortlist with MinHash/SimHash and verify heads/shingles).
    Builtin JVM levenshtein — no Python in the loop."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.substring("text", 1, 40).alias("head")
    )
    a = d.alias("a")
    b = d.alias("b")
    return a.join(b, F.col("b.doc_id") == F.col("a.doc_id") + 1).select(
        F.col("a.doc_id").alias("doc_a"),
        F.col("b.doc_id").alias("doc_b"),
        F.levenshtein(F.col("a.head"), F.col("b.head")).alias("edit_dist"),
        F.length("a.head").cast("bigint").alias("len_a"),
        F.length("b.head").cast("bigint").alias("len_b"),
    )


@register(
    "text_tfidf_topk",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(trim(text), ' ')) AS tok FROM documents),
    tf AS (
      SELECT doc_id, tok, COUNT(*) AS tf FROM toks
      WHERE length(tok) > 0 GROUP BY doc_id, tok),
    dfreq AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
    nd AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.tok, tf.tf, dfreq.df,
             round(tf.tf * ln(CAST(n_docs AS DOUBLE) / df), 6) AS tfidf
      FROM tf JOIN dfreq USING (tok) CROSS JOIN nd)
    SELECT doc_id, tok, tf, df, tfidf
    FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                                       ORDER BY tfidf DESC, tok) AS rn
          FROM scored)
    WHERE rn <= 3
    """,
    tags=("llm", "text", "tfidf"),
)
def text_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF with top-3 terms per document: term frequency (one
    shuffle on (doc, term)), document frequency (aggregate of the TF
    table — no second corpus scan), corpus size as a broadcast 1-row
    aggregate, then a WindowGroupLimit top-k per doc. The score is
    rounded to 6 decimals in BOTH engines (ln of identical doubles —
    the one non-fixed-point step). The canonical keyword-extraction /
    quality-signal pipeline over a crawl."""
    d = parallelize_scan(load_table(spark, sf_dir, "documents"))
    toks = d.select(
        "doc_id", F.explode(F.split(F.trim(F.col("text")), " ")).alias("tok")
    ).filter(F.length("tok") > 0)
    tf = toks.groupBy("doc_id", "tok").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("tok").agg(F.count("*").alias("df"))
    nd = d.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(dfreq, "tok")
        .join(F.broadcast(nd))
        .select(
            "doc_id",
            "tok",
            "tf",
            "df",
            F.round(
                F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("df")), 6
            ).alias("tfidf"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), "tok")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "tok", "tf", "df", "tfidf")
    )


# PII patterns chosen to parse identically under Java regex (Spark)
# and RE2 (DuckDB): character classes, bounded repeats and \b only —
# no lookaround, no backrefs (RE2 has neither).
_RE_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_RE_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
_RE_PHONE = r"\b\d{3}-\d{4}\b"


@register(
    "text_pii_redact",
    oracle=rf"""
    WITH t AS (
      SELECT doc_id, source,
             -- || , NOT concat(): DuckDB's concat() skips NULL args but
             -- Spark's F.concat propagates NULL — || propagates in both,
             -- so a NULL text yields NULL counts/redaction identically
             text || ' contact user' || CAST(doc_id AS VARCHAR)
                  || '@example.com or 10.0.' || CAST(doc_id % 256 AS VARCHAR)
                  || '.17 tel 555-02' || CAST(doc_id % 90 + 10 AS VARCHAR) AS txt
      FROM documents)
    SELECT doc_id, source,
           len(regexp_extract_all(txt, '{_RE_EMAIL}')) AS n_emails,
           len(regexp_extract_all(txt, '{_RE_IPV4}')) AS n_ips,
           len(regexp_extract_all(txt, '{_RE_PHONE}')) AS n_phones,
           regexp_replace(regexp_replace(regexp_replace(txt,
             '{_RE_EMAIL}', '<EMAIL>', 'g'),
             '{_RE_IPV4}', '<IP>', 'g'),
             '{_RE_PHONE}', '<PHONE>', 'g') AS redacted,
           length(txt) - length(regexp_replace(regexp_replace(regexp_replace(txt,
             '{_RE_EMAIL}', '<EMAIL>', 'g'),
             '{_RE_IPV4}', '<IP>', 'g'),
             '{_RE_PHONE}', '<PHONE>', 'g')) AS chars_removed
    FROM t
    """,
    tags=("llm", "text", "pii"),
)
def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing — the standard pre-training redaction pass
    (emails / IPv4 / phone fragments → placeholder tokens) as pure
    JVM-side regexp_replace: single scan, map-side only, no Python.
    The fixture corpus contains no organic PII, so both engines inject
    a deterministic PII suffix per doc (same concat expression) and
    then count + redact it; at 100 TB the injection disappears and the
    same three regexp_replace calls run directly over the crawl text.
    Patterns restricted to the Java-regex ∩ RE2 common subset."""
    d = load_table(spark, sf_dir, "documents")
    txt = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or 10.0."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(".17 tel 555-02"),
        (F.col("doc_id") % 90 + 10).cast("string"),
    )
    red = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(txt, _RE_EMAIL, "<EMAIL>"), _RE_IPV4, "<IP>"
        ),
        _RE_PHONE,
        "<PHONE>",
    )
    return d.select(
        "doc_id",
        "source",
        F.regexp_count(txt, F.lit(_RE_EMAIL)).alias("n_emails"),
        F.regexp_count(txt, F.lit(_RE_IPV4)).alias("n_ips"),
        F.regexp_count(txt, F.lit(_RE_PHONE)).alias("n_phones"),
        red.alias("redacted"),
        (F.length(txt) - F.length(red)).alias("chars_removed"),
    )


# Gopher/C4-style rule thresholds, tuned so the synthetic corpus
# (10-99 tokens/doc) exercises both keep and drop paths. Every rule is
# an integer cross-multiplication — no float thresholds to diverge on.
_MIN_TOKENS, _MAX_TOKENS = 30, 10_000


@register(
    "text_quality_filter_pipeline",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, lang, source,
             string_split(trim(text), ' ') AS toks FROM documents),
    s AS (
      SELECT doc_id, lang, source,
             len(toks) AS n_tokens,
             len(list_distinct(toks)) AS n_distinct,
             len(list_filter(toks, x -> list_contains([{_SQL_STOP}], x))) AS n_stop,
             len(list_filter(toks, x -> regexp_matches(x, '[^a-z0-9]'))) AS n_symbol,
             CAST(list_sum(list_transform(toks, x -> length(x))) AS BIGINT) AS sum_tok_len
      FROM t),
    r AS (
      SELECT *,
             n_tokens BETWEEN {_MIN_TOKENS} AND {_MAX_TOKENS} AS ok_len,
             3 * n_tokens <= sum_tok_len AND sum_tok_len <= 10 * n_tokens AS ok_avg_tok_len,
             n_stop * 50 >= n_tokens AS ok_stopwords,
             n_symbol * 10 <= n_tokens AS ok_symbols,
             5 * n_distinct >= n_tokens AS ok_ttr
      FROM s)
    SELECT doc_id, lang, source, n_tokens, n_distinct, n_stop, n_symbol,
           ok_len, ok_avg_tok_len, ok_stopwords, ok_symbols, ok_ttr,
           ok_len AND ok_avg_tok_len AND ok_stopwords AND ok_symbols AND ok_ttr AS keep,
           CASE WHEN NOT ok_len THEN 'len'
                WHEN NOT ok_avg_tok_len THEN 'avg_tok_len'
                WHEN NOT ok_stopwords THEN 'stopwords'
                WHEN NOT ok_symbols THEN 'symbols'
                WHEN NOT ok_ttr THEN 'ttr'
                ELSE 'keep' END AS verdict
    FROM r
    """,
    tags=("llm", "text", "quality"),
)
def text_quality_filter_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/C4-style heuristic quality filter: token-count bounds,
    mean-token-length bounds, minimum stopword ratio, maximum
    symbol-token ratio, minimum type-token ratio → keep/drop with the
    first failing rule as the verdict (the audit trail a curation run
    keeps). Every threshold is an integer cross-multiplication
    (``3·n ≤ Σlen ≤ 10·n`` instead of ``3 ≤ avg ≤ 10``), so the
    filter is bit-deterministic and stays inside whole-stage codegen —
    one scan, map-side only, no shuffle."""
    d = load_table(spark, sf_dir, "documents")
    toks = _toks()
    s = d.select(
        "doc_id",
        "lang",
        "source",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
        F.size(F.filter(toks, lambda x: x.isin(*STOPWORDS))).alias("n_stop"),
        F.size(F.filter(toks, lambda x: x.rlike("[^a-z0-9]"))).alias("n_symbol"),
        F.aggregate(
            F.transform(toks, lambda x: F.length(x).cast("bigint")),
            F.lit(0).cast("bigint"),
            lambda a, x: a + x,
        ).alias("sum_tok_len"),
    )
    nt, nd, ns, sym, stl = (
        F.col(c) for c in ["n_tokens", "n_distinct", "n_stop", "n_symbol", "sum_tok_len"]
    )
    rules = s.select(
        "*",
        nt.between(_MIN_TOKENS, _MAX_TOKENS).alias("ok_len"),
        ((3 * nt <= stl) & (stl <= 10 * nt)).alias("ok_avg_tok_len"),
        (ns * 50 >= nt).alias("ok_stopwords"),
        (sym * 10 <= nt).alias("ok_symbols"),
        (5 * nd >= nt).alias("ok_ttr"),
    )
    oks = [F.col(c) for c in ["ok_len", "ok_avg_tok_len", "ok_stopwords", "ok_symbols", "ok_ttr"]]
    keep = oks[0] & oks[1] & oks[2] & oks[3] & oks[4]
    verdict = (
        F.when(~oks[0], "len")
        .when(~oks[1], "avg_tok_len")
        .when(~oks[2], "stopwords")
        .when(~oks[3], "symbols")
        .when(~oks[4], "ttr")
        .otherwise("keep")
    )
    return rules.select(
        "doc_id", "lang", "source", "n_tokens", "n_distinct", "n_stop", "n_symbol",
        *[c for c in ["ok_len", "ok_avg_tok_len", "ok_stopwords", "ok_symbols", "ok_ttr"]],
        keep.alias("keep"),
        verdict.alias("verdict"),
    )


@register(
    "text_repetition_ratio",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(trim(text), ' ')) AS tok FROM documents),
    c AS (SELECT doc_id, tok, COUNT(*) AS cnt FROM toks GROUP BY doc_id, tok),
    top AS (
      SELECT doc_id, tok AS top_tok, cnt AS top_cnt
      FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                                         ORDER BY cnt DESC, tok) AS rn FROM c)
      WHERE rn = 1),
    m AS (
      SELECT doc_id,
             CAST(SUM(cnt) AS BIGINT) AS n_tokens,
             CAST(COALESCE(SUM(cnt) FILTER (cnt > 1), 0) AS BIGINT) AS dup_mass
      FROM c GROUP BY doc_id)
    SELECT m.doc_id, n_tokens, top_tok, top_cnt, dup_mass,
           top_cnt / n_tokens AS top_frac,
           dup_mass / n_tokens AS dup_frac,
           top_cnt * 5 <= n_tokens AS ok_top,
           dup_mass * 2 <= n_tokens AS ok_dup
    FROM m JOIN top ON m.doc_id = top.doc_id
    """,
    tags=("llm", "text", "quality"),
)
def text_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition quality signal (the Gopher "repetitive documents"
    filter): most-frequent-token mass fraction and duplicated-token
    mass fraction per document, with integer-threshold verdicts
    (top token ≤ 20 % of tokens, duplicated mass ≤ 50 %). One shuffle
    on (doc_id, tok) feeds both the argmax (WindowGroupLimit top-1,
    token tie-break) and the per-doc mass sums — the count relation is
    reused, not re-scanned. Ratios are int/int double divisions
    (bit-identical cross-engine)."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(F.split(F.trim(F.col("text")), " ")).alias("tok")
    )
    c = toks.groupBy("doc_id", "tok").agg(F.count("*").alias("cnt"))
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(F.col("cnt").desc(), "tok")
    top = (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col("tok").alias("top_tok"), F.col("cnt").alias("top_cnt"))
    )
    m = c.groupBy("doc_id").agg(
        F.sum("cnt").cast("bigint").alias("n_tokens"),
        F.coalesce(F.sum(F.when(F.col("cnt") > 1, F.col("cnt"))), F.lit(0))
        .cast("bigint")
        .alias("dup_mass"),
    )
    nt = F.col("n_tokens")
    return m.join(top, "doc_id").select(
        "doc_id",
        "n_tokens",
        "top_tok",
        "top_cnt",
        "dup_mass",
        (F.col("top_cnt") / nt).alias("top_frac"),
        (F.col("dup_mass") / nt).alias("dup_frac"),
        (F.col("top_cnt") * 5 <= nt).alias("ok_top"),
        (F.col("dup_mass") * 2 <= nt).alias("ok_dup"),
    )


@register(
    "corpus_mix_weights",
    oracle="""
    WITH g AS (
      SELECT lang, source,
             COUNT(*) AS n_docs,
             CAST(SUM(len(string_split(trim(text), ' '))) AS BIGINT) AS tok_total
      FROM documents GROUP BY lang, source),
    tot AS (SELECT CAST(SUM(tok_total) AS BIGINT) AS corpus_total FROM g)
    SELECT lang, source, n_docs, tok_total, corpus_total,
           tok_total * 1000000 // corpus_total AS weight_ppm,
           -- NULLS FIRST matches Spark's ASC default (DuckDB defaults to
           -- NULLS LAST); tok_total DESC puts NULLs last in both engines
           row_number() OVER (ORDER BY tok_total DESC, lang NULLS FIRST,
                              source NULLS FIRST) AS mix_rank
    FROM g CROSS JOIN tot
    """,
    tags=("llm", "text", "corpus"),
)
def corpus_mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mix weighting: per (lang, source) token totals →
    proportional sampling weight in parts-per-million, exact integer
    division (``tok·10⁶ div total`` — no float in the weight, so the
    mix table is reproducible to the ppm at any corpus size; a
    float-ratio version would drift once token totals pass 2⁵³).
    One narrow aggregate over the corpus scan + a broadcast 1-row
    total; the mix table itself is tiny (|langs|·|sources| rows)."""
    d = load_table(spark, sf_dir, "documents")
    g = d.groupBy("lang", "source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(F.split(F.trim(F.col("text")), " ")))
        .cast("bigint")
        .alias("tok_total"),
    )
    tot = g.agg(F.sum("tok_total").cast("bigint").alias("corpus_total"))
    from pyspark.sql import Window

    w = Window.orderBy(F.col("tok_total").desc(), "lang", "source")
    return (
        g.join(F.broadcast(tot))
        .select(
            "lang",
            "source",
            "n_docs",
            "tok_total",
            "corpus_total",
            F.expr("tok_total * 1000000 div corpus_total").alias("weight_ppm"),
        )
        .withColumn("mix_rank", F.row_number().over(w))
    )


BPE_TOP_K = 30


@register(
    "text_bpe_merge_pairs",
    oracle=f"""
    WITH toks AS (
      SELECT unnest(string_split(trim(text), ' ')) AS w
      FROM documents WHERE text IS NOT NULL),
    vocab AS (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS n
      FROM toks WHERE length(w) >= 2 GROUP BY w),
    pairs AS (
      SELECT substr(w, i, 1) AS sym_left, substr(w, i + 1, 1) AS sym_right, n
      FROM (SELECT w, n, unnest(generate_series(1, length(w) - 1)) AS i
            FROM vocab)),
    agg AS (
      SELECT sym_left, sym_right, CAST(SUM(n) AS BIGINT) AS n_occurrences
      FROM pairs GROUP BY sym_left, sym_right)
    SELECT sym_left, sym_right, n_occurrences, rnk FROM (
      SELECT sym_left, sym_right, n_occurrences,
             row_number() OVER (ORDER BY n_occurrences DESC,
                                sym_left, sym_right) AS rnk
      FROM agg)
    WHERE rnk <= {{BPE_TOP_K}}
    """.format(BPE_TOP_K=BPE_TOP_K),
    tags=("llm", "text", "tokenizer"),
)
def text_bpe_merge_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE training, iteration zero: the corpus-wide frequency of every
    adjacent CHARACTER pair, weighted by word frequency — the statistic
    a byte-pair-encoding trainer maximizes to pick its first merge
    (and re-computes per merge round). Ships the top-{K} candidates
    with a deterministic (count DESC, pair) rank.

    The load-bearing trick is the one production BPE trainers use:
    pairs explode over the WORD-FREQUENCY TABLE (vocab), not the raw
    corpus — each distinct word is decomposed once and its pair counts
    scale by its corpus count, so the quadratic-ish character work is
    bounded by vocab size (~10^6 at 100 TB), not corpus size.

    Determinism: exact integer counts; single-char symbols compare
    with binary collation in both engines. Words need >= 2 chars (an
    explicit filter — it also keeps Spark's sequence() ascending).

    Scale: one token-keyed vocab aggregate (map-side combinable), a
    vocab-bounded explode, one ~|alphabet|^2-cardinality aggregate,
    and a single-partition top-K window over that tiny table."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    toks = d.select(
        F.explode(F.split(F.trim(F.col("text")), " ")).alias("w")
    ).filter(F.length("w") >= 2)
    vocab = toks.groupBy("w").agg(F.count("*").cast("bigint").alias("n"))
    pairs = vocab.select(
        "n",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("w") - 1),
                lambda i: F.struct(
                    F.col("w").substr(i, F.lit(1)).alias("sym_left"),
                    F.col("w").substr(i + 1, F.lit(1)).alias("sym_right"),
                ),
            )
        ).alias("p"),
    ).select("p.sym_left", "p.sym_right", "n")
    agg = pairs.groupBy("sym_left", "sym_right").agg(
        F.sum("n").cast("bigint").alias("n_occurrences")
    )
    w = Window.orderBy(
        F.col("n_occurrences").desc(), "sym_left", "sym_right"
    )
    return (
        agg.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= BPE_TOP_K)
        .select("sym_left", "sym_right", "n_occurrences", "rnk")
    )


BPE_ROUNDS = 4  # unrolled merge rounds for the trainer loop


def _bpe_rounds_oracle(rounds: int) -> str:
    """Generate the unrolled DuckDB mirror of the BPE trainer loop: per
    round, adjacent-pair counts over the CURRENT symbolization of the
    vocab, a deterministic argmax (count DESC, pair), and a left-to-right
    non-overlapping merge application via list_reduce (the [s]-wrapped
    fold makes the accumulator a symbol list whose first element seeds
    the reduction — identical to Spark's empty-init fold, where the
    first symbol is appended unconditionally)."""
    parts = [
        """v0 AS (
      SELECT n, list_transform(generate_series(1, length(w)), i -> substr(w, i, 1)) AS syms
      FROM (SELECT w, CAST(COUNT(*) AS BIGINT) AS n
            FROM (SELECT unnest(string_split(trim(text), ' ')) AS w
                  FROM documents WHERE text IS NOT NULL)
            WHERE length(w) >= 2 GROUP BY w))"""
    ]
    for r in range(rounds):
        parts.append(
            f"""p{r} AS (
      SELECT syms[i] AS sym_left, syms[i + 1] AS sym_right, n
      FROM (SELECT syms, n, unnest(generate_series(1, len(syms) - 1)) AS i
            FROM v{r} WHERE len(syms) >= 2))"""
        )
        parts.append(
            f"""b{r} AS (
      SELECT sym_left, sym_right, CAST(SUM(n) AS BIGINT) AS n_occurrences
      FROM p{r} GROUP BY sym_left, sym_right
      ORDER BY n_occurrences DESC, sym_left, sym_right LIMIT 1)"""
        )
        parts.append(
            f"""v{r + 1} AS (
      SELECT n,
             list_reduce(list_transform(syms, s -> [s]),
               (acc, x) -> CASE WHEN acc[-1] = b.sym_left AND x[1] = b.sym_right
                           THEN list_concat(acc[1:len(acc) - 1],
                                            [b.sym_left || b.sym_right])
                           ELSE list_concat(acc, x) END) AS syms
      FROM v{r}, b{r} b)"""
        )
    sel = "\n    UNION ALL ".join(
        f"SELECT {r} AS merge_round, sym_left, sym_right, n_occurrences FROM b{r}"
        for r in range(rounds)
    )
    return "WITH " + ",\n    ".join(parts) + "\n    " + sel


@register(
    "text_bpe_train_rounds",
    oracle=_bpe_rounds_oracle(BPE_ROUNDS),
    tags=("llm", "text", "tokenizer"),
)
def text_bpe_train_rounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE training, rounds 0..{R-1}: iterate the merge loop that
    text_bpe_merge_pairs only statistics — each round counts adjacent
    symbol pairs over the CURRENT symbolization of the word-frequency
    table, picks the argmax merge (count DESC, then pair — binary
    collation in both engines), applies it to every word left-to-right
    non-overlapping, and recounts. Emits the chosen merge per round:
    the first {R} rows of a real BPE merge table.

    Merge application is a sequential fold (F.aggregate): append each
    symbol unless the accumulator's last symbol is X and the incoming
    is Y, in which case replace the tail with XY. Left-to-right
    non-overlap falls out naturally — a just-merged XY can never equal
    X again (Y is non-empty), exactly the classic trainer's scan. The
    oracle mirrors it with list_reduce over [s]-wrapped symbols.

    Scale: all char-level work is VOCAB-bounded (the load-bearing BPE
    trick — see text_bpe_merge_pairs): each round is one vocab-sized
    fold + an |alphabet|²-ish aggregate + a 1-row argmax broadcast
    (GlobalLimit-bounded). The re-symbolized vocab is localCheckpoint'd
    per round: each round's table feeds both the next round's count
    AND its own merge application, and an uncheckpointed chain would
    re-execute the whole prefix 2^R times. At 100 TB the vocab table
    (~10^6 rows) is a per-round persisted table; rounds beyond the
    unrolled {R} batch the same way production trainers do (count many
    merges per materialization)."""
    from functools import reduce as _reduce

    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    toks = d.select(
        F.explode(F.split(F.trim(F.col("text")), " ")).alias("w")
    ).filter(F.length("w") >= 2)
    vocab = toks.groupBy("w").agg(F.count("*").cast("bigint").alias("n"))
    chars = F.transform(
        F.sequence(F.lit(1), F.length("w")),
        lambda i: F.col("w").substr(i, F.lit(1)),
    )
    cur = vocab.select("n", chars.alias("syms")).localCheckpoint(eager=True)

    def apply_merge(syms: Column, x: Column, y: Column) -> Column:
        return F.aggregate(
            syms,
            F.expr("CAST(array() AS array<string>)"),
            lambda acc, s: F.when(
                # try_element_at: NULL (not an ANSI error) on the empty
                # accumulator; NULL = x is never true, so the first
                # symbol is appended — same seed as the oracle's
                # first-element reduction init
                (F.try_element_at(acc, F.lit(-1)) == x) & (s == y),
                F.concat(
                    F.slice(acc, 1, F.size(acc) - 1), F.array(F.concat(x, y))
                ),
            ).otherwise(F.concat(acc, F.array(s))),
        )

    outs = []
    for r in range(BPE_ROUNDS):
        pr = cur.filter(F.size("syms") >= 2).select(
            "n",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("syms") - 1),
                    lambda i: F.struct(
                        F.element_at("syms", i).alias("sym_left"),
                        F.element_at("syms", i + 1).alias("sym_right"),
                    ),
                )
            ).alias("p"),
        ).select("p.sym_left", "p.sym_right", "n")
        best = (
            pr.groupBy("sym_left", "sym_right")
            .agg(F.sum("n").cast("bigint").alias("n_occurrences"))
            .orderBy(F.col("n_occurrences").desc(), "sym_left", "sym_right")
            .limit(1)
        )
        outs.append(
            best.select(
                F.lit(r).alias("merge_round"),
                "sym_left",
                "sym_right",
                "n_occurrences",
            )
        )
        if r + 1 < BPE_ROUNDS:
            bb = F.broadcast(
                best.select(
                    F.col("sym_left").alias("bx"), F.col("sym_right").alias("by")
                )
            )
            cur = (
                cur.crossJoin(bb)
                .select(
                    "n",
                    apply_merge(F.col("syms"), F.col("bx"), F.col("by")).alias(
                        "syms"
                    ),
                )
                .localCheckpoint(eager=True)
            )
    return _reduce(DataFrame.unionByName, outs)


MIX_TEMPERATURE = 0.7  # the standard multilingual-corpus smoothing alpha


@register(
    "corpus_temperature_mix",
    oracle=f"""
    WITH g AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(len(string_split(trim(text), ' '))) AS BIGINT) AS tok_total
      -- NULL-text docs have no countable tokens; a mixing weight needs
      -- a source id — both excluded identically in the Spark builder
      FROM documents WHERE text IS NOT NULL AND source IS NOT NULL
      GROUP BY source),
    p AS (SELECT source, n_docs, tok_total,
                 round(pow(tok_total, {MIX_TEMPERATURE}), 6) AS smoothed
          FROM g),
    tot AS (SELECT CAST(list_reduce(list(smoothed ORDER BY source),
                                    (a, b) -> a + b) AS DOUBLE) AS z,
                   CAST(SUM(tok_total) AS BIGINT) AS tok_corpus
            FROM p)
    SELECT source, n_docs, tok_total,
           CAST(round(smoothed * 1000000.0 / z, 0) AS BIGINT)
             AS temp_weight_ppm,
           tok_total * 1000000 // tok_corpus AS prop_weight_ppm
    FROM p CROSS JOIN tot
    """,
    tags=("llm", "text", "corpus"),
)
def corpus_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-smoothed sampling weights per source — the standard
    multilingual/multi-source mixing trick (weight ∝ tokens^alpha,
    alpha = 0.7): low-resource sources are up-sampled relative to their
    raw share so the training mix is not dominated by the largest
    crawl. Reports the smoothed ppm weight next to the proportional
    one, which is exactly the table a data-mixing review looks at.

    Determinism: token totals are exact integers; pow() is quantized
    to 6 decimals in both engines, and the normalizer folds the
    smoothed values in a FIXED order (list ordered by source —
    sequential add in both engines), so the one float reduction is
    order-pinned rather than shuffle-order-dependent.

    Scale: one narrow corpus aggregate (map-side combinable) to
    |sources| rows; everything after runs on that tiny table with a
    broadcast 1-row normalizer."""
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull() & F.col("source").isNotNull()
    )
    g = d.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum(F.size(F.split(F.trim(F.col("text")), " ")))
        .cast("bigint")
        .alias("tok_total"),
    )
    p = g.select(
        "source",
        "n_docs",
        "tok_total",
        F.round(F.pow("tok_total", F.lit(MIX_TEMPERATURE)), 6).alias("smoothed"),
    )
    tot = p.agg(
        F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct("source", "smoothed"))),
                lambda s: s["smoothed"],
            ),
            F.lit(0.0),
            lambda a, b: a + b,
        ).alias("z"),
        F.sum("tok_total").cast("bigint").alias("tok_corpus"),
    )
    return p.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "tok_total",
        F.round(F.col("smoothed") * 1000000.0 / F.col("z"), 0)
        .cast("bigint")
        .alias("temp_weight_ppm"),
        F.expr("tok_total * 1000000 div tok_corpus").alias("prop_weight_ppm"),
    )


@register(
    "text_entropy_distribution",
    oracle="""
    WITH c AS (
      SELECT lang, source, COUNT(*) AS n
      FROM documents GROUP BY lang, source),
    tot AS (
      SELECT lang, CAST(SUM(n) AS BIGINT) AS total, COUNT(*) AS n_sources
      FROM c GROUP BY lang)
    SELECT c.lang,
           n_sources,
           total AS n_docs,
           round(-SUM((CAST(n AS DOUBLE) / total)
                      * ln(CAST(n AS DOUBLE) / total)), 6) AS source_entropy
    FROM c JOIN tot ON c.lang = tot.lang
    GROUP BY c.lang, n_sources, total
    """,
    tags=("llm", "text", "entropy"),
)
def text_entropy_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of the source distribution per language — the
    diversity / mode-collapse signal corpus curation tracks (entropy
    near 0 = one source dominates). Two tiny keyed aggregates; the only
    float steps are identical-input divisions and ln, rounded to 6
    decimals in both engines."""
    d = load_table(spark, sf_dir, "documents")
    c = d.groupBy("lang", "source").agg(F.count("*").alias("n"))
    tot = c.groupBy("lang").agg(
        F.sum("n").cast("bigint").alias("total"), F.count("*").alias("n_sources")
    )
    p = F.col("n").cast("double") / F.col("total")
    return (
        c.join(F.broadcast(tot), "lang")
        .groupBy("lang", "n_sources", F.col("total").alias("n_docs"))
        .agg(F.round(-F.sum(p * F.log(p)), 6).alias("source_entropy"))
    )


@register(
    "text_unigram_surprisal",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(trim(text), ' ')) AS w
      FROM documents),
    vocab AS (
      SELECT w, COUNT(*) AS n_w FROM tok GROUP BY w),
    total AS (SELECT CAST(SUM(n_w) AS BIGINT) AS n FROM vocab),
    scored AS (
      SELECT tok.doc_id,
             CAST(ROUND(ln(CAST(n_w AS DOUBLE) / n) * 1000000, 0) AS BIGINT)
               AS unats
      FROM tok JOIN vocab ON tok.w = vocab.w CROSS JOIN total)
    SELECT doc_id,
           COUNT(*) AS n_tokens,
           CAST(-SUM(unats) AS DOUBLE) / 1000000.0 / COUNT(*) AS avg_surprisal
    FROM scored GROUP BY doc_id
    """,
    tags=("llm", "text", "lm"),
)
def text_unigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram language-model surprisal per document — the classic
    perplexity-proxy quality score (documents full of corpus-rare
    tokens score high; boilerplate scores low). The LM is the corpus
    itself: p(w) = count(w) / N, score = −mean ln p(w).

    Determinism: each token's surprisal is rounded to integer
    micro-nats BEFORE summing, so the per-doc sum is an exact bigint —
    merge-order independent — and the final two divides are identical
    single IEEE ops in both engines.

    Scale: one explode + one vocab aggregate + one token-keyed join.
    The join key is Zipf-skewed ("the" dominates); at 100 TB either
    AQE skew-join handles it or the vocab relation (≪ corpus,
    ~10⁷ rows) broadcasts — both knobs are config, not plan changes.
    No parallelize_scan here: tokenize/explode is light map work and
    the vocab aggregate's own exchange distributes everything heavy,
    so a pre-shuffle of the raw text only added cost (isolated r6
    timing: 0.97 s without vs 1.23 s with)."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.explode(F.split(F.trim(F.col("text")), " ")).alias("w")
    )
    vocab = tok.groupBy("w").agg(F.count("*").alias("n_w"))
    total = vocab.agg(F.sum("n_w").cast("bigint").alias("n"))
    scored = tok.join(vocab, "w").crossJoin(F.broadcast(total)).select(
        "doc_id",
        F.round(F.log(F.col("n_w").cast("double") / F.col("n")) * 1000000, 0)
        .cast("bigint")
        .alias("unats"),
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        (
            (-F.sum("unats")).cast("double") / 1000000.0 / F.count("*")
        ).alias("avg_surprisal"),
    )


@register(
    "text_html_strip",
    oracle="""
    WITH h AS (
      SELECT doc_id,
             '<html><body><h1>' || source || '</h1><p>'
               || replace(text, ' ', '&nbsp;') || '</p></body></html>' AS html
      FROM documents WHERE doc_id % 11 = 0)
    SELECT doc_id,
           length(html) AS html_len,
           replace(regexp_replace(html, '<[^>]*>', '', 'g'), '&nbsp;', ' ')
             AS extracted,
           length(replace(regexp_replace(html, '<[^>]*>', '', 'g'), '&nbsp;', ' '))
             AS extracted_len
    FROM h
    """,
    tags=("llm", "text", "extraction"),
)
def text_html_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML → text extraction (the first pass of every web-corpus
    pipeline): markup built deterministically from the fixture text,
    then tag-stripped and entity-unescaped with codegen'd regexp — the
    same two-step every boilerplate remover starts with. Both engines
    run the identical regex, so the extraction is hash-checked.

    Scale: pure map-side regexp over the scan — zero shuffle; at
    100 TB the regex cost is the pipeline's floor, which is exactly
    why it must stay JVM-side and not in a Python UDF."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 11 == 0)
    html = F.concat(
        F.lit("<html><body><h1>"),
        F.col("source"),
        F.lit("</h1><p>"),
        F.regexp_replace(F.col("text"), " ", "&nbsp;"),
        F.lit("</p></body></html>"),
    )
    extracted = F.regexp_replace(
        F.regexp_replace(html, "<[^>]*>", ""), "&nbsp;", " "
    )
    return d.select(
        "doc_id",
        F.length(html).alias("html_len"),
        extracted.alias("extracted"),
        F.length(extracted).alias("extracted_len"),
    )


# --------------------------------------------------------------------------
# bigram conditional-probability table (n-gram LM construction)
# --------------------------------------------------------------------------


@register(
    "text_bigram_conditional_topk",
    oracle="""
    WITH t AS (
      SELECT string_split(trim(text), ' ') AS toks FROM documents),
    bg AS (
      SELECT toks[i] AS w1, toks[i+1] AS w2
      FROM t CROSS JOIN unnest(generate_series(1, len(toks)-1)) AS u(i)),
    cnt AS (
      SELECT w1, w2, COUNT(*) AS n FROM bg GROUP BY w1, w2),
    tot AS (
      SELECT w1, CAST(SUM(n) AS BIGINT) AS w1_total FROM cnt GROUP BY w1),
    scored AS (
      SELECT cnt.w1, cnt.w2, cnt.n, tot.w1_total,
             CAST(cnt.n * 1000000 // tot.w1_total AS BIGINT) AS p_ppm,
             row_number() OVER (PARTITION BY cnt.w1
                                ORDER BY cnt.n DESC, cnt.w2) AS rn
      FROM cnt JOIN tot USING (w1))
    SELECT w1, w2, n, w1_total, p_ppm
    FROM scored WHERE rn <= 3
    """,
    tags=("llm", "text", "ngram"),
)
def text_bigram_conditional_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram conditional-probability table, top-3 continuations per
    word: P(w2|w1) in exact integer parts-per-million — the n-gram-LM
    construction step (the model behind classic perplexity filters and
    autocomplete baselines; the unigram analogue is
    text_unigram_surprisal).

    Scale: bigrams explode map-side; one shuffle on (w1, w2) with
    map-side combine; the per-w1 totals aggregate the (much smaller)
    bigram table, not the corpus; Catalyst turns the rn<=3 filter into
    WindowGroupLimit so no full per-w1 sort materializes. Integer
    division keeps every value exact. parallelize_scan spreads the
    tokenize+explode map work across cores on single-row-group
    fixture files (no-op cost on a real multi-file corpus)."""
    d = parallelize_scan(load_table(spark, sf_dir, "documents"))
    toks = F.split(F.trim(F.col("text")), " ")
    bg = d.select(
        F.explode(
            F.zip_with(
                F.slice(toks, 1, F.size(toks) - 1),
                F.slice(toks, 2, F.size(toks) - 1),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("p")
    ).select("p.w1", "p.w2")
    from pyspark.sql import Window

    cnt = bg.groupBy("w1", "w2").agg(F.count("*").alias("n"))
    tot = cnt.groupBy("w1").agg(F.sum("n").cast("bigint").alias("w1_total"))
    w = Window.partitionBy("w1").orderBy(F.col("n").desc(), "w2")
    return (
        cnt.join(tot, "w1")
        .select(
            "w1",
            "w2",
            "n",
            "w1_total",
            F.expr("CAST(n * 1000000 div w1_total AS BIGINT)").alias("p_ppm"),
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
        .drop("rn")
    )


@register(
    "text_kneser_ney_bigram",
    oracle="""
    -- interpolated Kneser-Ney (D = 0.75) over corpus bigrams: the
    -- standard n-gram LM smoothing (Kneser & Ney 1995; Chen &
    -- Goodman 1999). The continuation probability asks "in how many
    -- distinct contexts does w2 complete a bigram", which is what
    -- distinguishes KN from plain discounting.
    WITH t AS (
      SELECT string_split(trim(text), ' ') AS toks FROM documents),
    bg AS (
      SELECT toks[i] AS w1, toks[i+1] AS w2
      FROM t CROSS JOIN unnest(generate_series(1, len(toks)-1)) AS u(i)),
    cnt AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12
            FROM bg GROUP BY w1, w2),
    ctx AS (SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1,
                   CAST(COUNT(*) AS BIGINT) AS n1fwd
            FROM cnt GROUP BY w1),
    cont AS (SELECT w2, CAST(COUNT(*) AS BIGINT) AS ncont
             FROM cnt GROUP BY w2),
    tt AS (SELECT CAST(COUNT(*) AS BIGINT) AS t_types FROM cnt)
    SELECT w1, w2, c12, c1,
           CAST(round(1000000.0 *
             ((GREATEST(CAST(c12 AS DOUBLE) - 0.75, 0.0)
               + (0.75 * CAST(n1fwd AS DOUBLE))
                 * (CAST(ncont AS DOUBLE) / CAST(t_types AS DOUBLE)))
              / CAST(c1 AS DOUBLE)), 0) AS BIGINT) AS kn_ppm
    FROM (
      SELECT cnt.w1, cnt.w2, cnt.c12, ctx.c1, ctx.n1fwd, cont.ncont,
             tt.t_types,
             row_number() OVER (ORDER BY cnt.c12 DESC, cnt.w1, cnt.w2)
               AS rnk
      FROM cnt JOIN ctx USING (w1) JOIN cont USING (w2) CROSS JOIN tt)
    WHERE rnk <= 50
    """,
    tags=("llm", "text", "lm"),
)
def text_kneser_ney_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney bigram probabilities (D = 0.75) for the
    corpus's top-50 bigrams: P(w2|w1) = max(c12-D,0)/c1 +
    (D*N1+(w1,.)/c1) * (N1+(.,w2)/T) — the smoothing every production
    n-gram LM shipped with, built here as four aggregates over the
    bigram-type table. The continuation count N1+(.,w2) (distinct
    left-contexts of w2) is the KN signature: "York" is frequent but
    only ever follows "New", so its continuation probability is tiny.

    Exactness: all counts are exact bigints; the probability is ONE
    double expression evaluated with identical operation order in
    both engines, rounded once to ppm; the top-50 carries a
    (c12 DESC, w1, w2) total order.

    Scale: one shuffle groups corpus bigram occurrences into the
    bigram-TYPE table (map-side combine, vocab^2-bounded, far smaller
    than the corpus); context/continuation/type-total rollups all run
    on that small table; the top-50 compiles to TakeOrdered."""
    d = parallelize_scan(load_table(spark, sf_dir, "documents"))
    tk = F.split(F.trim(F.col("text")), " ")
    bg_arr = F.when(
        F.size(tk) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(tk) - 1),
            lambda i: F.struct(
                F.element_at(tk, i).alias("w1"),
                F.element_at(tk, i + F.lit(1)).alias("w2"),
            ),
        ),
    ).otherwise(
        F.array().cast("array<struct<w1:string,w2:string>>")
    )
    bg = d.select(F.explode(bg_arr).alias("b")).select("b.w1", "b.w2")
    # FOUR consumers (ctx, cont, the type total, and the final join)
    # read the bigram-TYPE table: materialize it once or the corpus
    # explode+aggregate re-runs per consumer (measured ×100: 73.0 s →
    # 20.2 s). The type table is vocab²-bounded — small at any corpus
    # size — exactly the relation a production LM pipeline persists.
    cnt = (
        bg.groupBy("w1", "w2")
        .agg(F.count("*").cast("bigint").alias("c12"))
        .localCheckpoint(eager=True)
    )
    ctx = cnt.groupBy("w1").agg(
        F.sum("c12").cast("bigint").alias("c1"),
        F.count("*").cast("bigint").alias("n1fwd"),
    )
    cont = cnt.groupBy("w2").agg(F.count("*").cast("bigint").alias("ncont"))
    tt = cnt.agg(F.count("*").cast("bigint").alias("t_types"))
    # top-50 FIRST (r14, guide §2.4): the ranking key (c12 DESC, w1,
    # w2) is a total order that lives entirely in cnt, and the ctx /
    # cont / tt joins are 1:1 per (w1) / (w2) / global — so taking the
    # 50 winners before joining selects exactly the rows the old
    # row_number-over-the-joined-table form kept, while the global
    # sort shrinks from |vocab²| joined rows pushed through ONE
    # unpartitioned Window (a single-partition Exchange + full sort)
    # to a TakeOrderedAndProject over the type table, and both stat
    # joins become 50-row broadcast probes instead of vocab²-row
    # shuffle joins.
    top = cnt.orderBy(F.col("c12").desc(), "w1", "w2").limit(50)
    j = (
        F.broadcast(top)
        .join(ctx, "w1")
        .join(cont, "w2")
        .crossJoin(F.broadcast(tt))
    )
    kn = (
        F.greatest(F.col("c12").cast("double") - F.lit(0.75), F.lit(0.0))
        + (F.lit(0.75) * F.col("n1fwd").cast("double"))
        * (F.col("ncont").cast("double") / F.col("t_types").cast("double"))
    ) / F.col("c1").cast("double")
    return j.select(
        "w1",
        "w2",
        "c12",
        "c1",
        F.round(F.lit(1_000_000.0) * kn, 0).cast("bigint").alias("kn_ppm"),
    )


@register(
    "text_bigram_surprisal",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split(trim(text), ' ') AS toks FROM documents),
    v AS (
      SELECT COUNT(DISTINCT w) AS vocab
      FROM (SELECT unnest(toks) AS w FROM t)),
    bg AS (
      SELECT doc_id, toks[i] AS w1, toks[i+1] AS w2
      FROM t CROSS JOIN unnest(generate_series(1, len(toks)-1)) AS u(i)),
    cnt AS (
      SELECT w1, w2, COUNT(*) AS n12 FROM bg GROUP BY w1, w2),
    tot AS (
      SELECT w1, CAST(SUM(n12) AS BIGINT) AS n1 FROM cnt GROUP BY w1),
    sc AS (
      SELECT bg.doc_id,
             CAST(round(ln((cnt.n12 + 1) / CAST(tot.n1 + v.vocab AS DOUBLE))
                        * 1000000, 0) AS BIGINT) AS unats
      FROM bg JOIN cnt USING (w1, w2) JOIN tot USING (w1) CROSS JOIN v)
    SELECT doc_id,
           COUNT(*) AS n_bigrams,
           CAST(-SUM(unats) AS DOUBLE) / 1000000.0 / COUNT(*) AS avg_surprisal
    FROM sc GROUP BY doc_id
    """,
    tags=("llm", "text", "lm"),
)
def text_bigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document bigram-LM surprisal with add-one smoothing — the
    second-order upgrade of text_unigram_surprisal: score each document
    by −mean ln P(w2|w1), P(w2|w1) = (c(w1,w2)+1)/(c(w1)+V). Documents
    whose word TRANSITIONS are corpus-rare score high even when every
    individual word is common — the signal that catches shuffled/
    machine-garbled text a unigram filter passes.

    Determinism: per-occurrence surprisal rounds to integer micro-nats
    before the per-doc sum (merge-order independent), mirroring the
    unigram query's contract.

    Scale: bigram pairs explode map-side; the (w1,w2) model table and
    its per-w1 totals aggregate with map-side combine; the scoring
    join is occurrence-to-model on Zipf-skewed keys — the model
    relation (≪ corpus) broadcasts at moderate vocabularies or AQE
    skew-splits the shuffle, both config-level. The vocab size V is a
    1-row aggregate, broadcast for free."""
    d = parallelize_scan(load_table(spark, sf_dir, "documents"))
    toks = F.split(F.trim(F.col("text")), " ")
    bg = d.select(
        "doc_id",
        F.explode(
            F.zip_with(
                F.slice(toks, 1, F.size(toks) - 1),
                F.slice(toks, 2, F.size(toks) - 1),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("p"),
    ).select("doc_id", "p.w1", "p.w2")
    vocab = d.select(F.explode(toks).alias("w")).agg(
        F.count_distinct("w").alias("vocab")
    )
    cnt = bg.groupBy("w1", "w2").agg(F.count("*").alias("n12"))
    tot = cnt.groupBy("w1").agg(F.sum("n12").cast("bigint").alias("n1"))
    model = cnt.join(tot, "w1").crossJoin(F.broadcast(vocab))
    scored = bg.join(model, ["w1", "w2"]).select(
        "doc_id",
        F.round(
            F.log(
                (F.col("n12") + 1).cast("double")
                / (F.col("n1") + F.col("vocab")).cast("double")
            )
            * 1000000,
            0,
        )
        .cast("bigint")
        .alias("unats"),
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").alias("n_bigrams"),
        ((-F.sum("unats")).cast("double") / 1000000.0 / F.count("*")).alias(
            "avg_surprisal"
        ),
    )


PMI_MIN_COUNT = 10  # bigram count floor before a pair is scored
PMI_TOP_K = 20


@register(
    "text_token_pmi_topk",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split(trim(text), ' ') AS t FROM documents),
    bg AS (
      SELECT doc_id, t[i] AS w1, t[i+1] AS w2
      FROM toks CROSS JOIN unnest(generate_series(1, len(t)-1)) AS g(i)),
    uni AS (
      SELECT w1 AS w, CAST(COUNT(*) AS BIGINT) AS n
      FROM (SELECT doc_id, t[i] AS w1
            FROM toks CROSS JOIN unnest(generate_series(1, len(t))) AS g(i))
      GROUP BY w1),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nn FROM uni),
    big AS (
      SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS n12 FROM bg GROUP BY w1, w2),
    scored AS (
      SELECT b.w1, b.w2, b.n12, u1.n AS n1, u2.n AS n2,
             CAST(round(ln((b.n12::DOUBLE * tot.nn) / (u1.n::DOUBLE * u2.n))
                        * 1000000, 0) AS BIGINT) AS pmi_unats
      FROM big b
      JOIN uni u1 ON u1.w = b.w1
      JOIN uni u2 ON u2.w = b.w2
      CROSS JOIN tot
      WHERE b.n12 >= {PMI_MIN_COUNT})
    SELECT w1, w2, n12, n1, n2, pmi_unats, rnk FROM (
      SELECT *, row_number() OVER (ORDER BY pmi_unats DESC, w1, w2) AS rnk
      FROM scored)
    WHERE rnk <= {PMI_TOP_K}
    """,
    tags=("llm", "text", "collocation"),
)
def text_token_pmi_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise-mutual-information collocation mining: the top-K
    adjacent token pairs by PMI = ln(N * c(w1,w2) / (c(w1) * c(w2))),
    with a c(w1,w2) >= PMI_MIN_COUNT support floor (the standard
    guard against PMI's low-count explosion). This is the classic
    corpus-linguistics pass pipelines run to find multi-word
    expressions worth protecting from tokenizer splits.

    Determinism: PMI is one ln on a ratio of exact bigint counts
    (identical double ops in both engines), rounded to integer
    micro-nats before ranking; ties break on the pair text.

    Scale: two token-keyed aggregates (unigrams, bigrams — both
    map-side-combinable) + two joins against the unigram vocab.
    The vocab is tiny relative to the corpus (<=10^7 rows at 100 TB)
    so both joins broadcast; the global top-K is a single-partition
    window over the already-aggregated pair table, which is bounded
    by vocab^2 intersected with observed pairs, not by corpus size."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.split(F.trim(F.col("text")), " ").alias("t"))
    uni = (
        toks.select(F.explode("t").alias("w"))
        .groupBy("w")
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    tot = uni.agg(F.sum("n").cast("bigint").alias("nn"))
    pair_struct = F.transform(
        F.sequence(F.lit(1), F.size("t") - 1),
        lambda i: F.struct(
            F.element_at("t", i).alias("w1"),
            F.element_at("t", i + 1).alias("w2"),
        ),
    )
    # guard: one-token docs would make sequence(1, 0) DESCEND ([1, 0])
    # and element_at crash under ANSI; DuckDB's generate_series is empty
    bg = toks.select(
        F.explode(
            F.when(F.size("t") >= 2, pair_struct).otherwise(
                F.array().cast("array<struct<w1:string,w2:string>>")
            )
        ).alias("p")
    ).select("p.w1", "p.w2")
    big = bg.groupBy("w1", "w2").agg(F.count("*").cast("bigint").alias("n12"))
    u1 = F.broadcast(uni.select(F.col("w").alias("w1"), F.col("n").alias("n1")))
    u2 = F.broadcast(uni.select(F.col("w").alias("w2"), F.col("n").alias("n2")))
    scored = (
        big.filter(F.col("n12") >= PMI_MIN_COUNT)
        .join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "w1", "w2", "n12", "n1", "n2",
            F.round(
                F.log(
                    (F.col("n12").cast("double") * F.col("nn"))
                    / (F.col("n1").cast("double") * F.col("n2"))
                )
                * 1000000,
                0,
            )
            .cast("bigint")
            .alias("pmi_unats"),
        )
    )
    w = Window.orderBy(F.col("pmi_unats").desc(), "w1", "w2")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= PMI_TOP_K)
    )


ZIPF_TOP_RANKS = 25


@register(
    "text_zipf_rank_frequency",
    oracle=f"""
    WITH uni AS (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS n_w
      FROM (SELECT unnest(string_split(trim(text), ' ')) AS w FROM documents)
      GROUP BY w),
    ranked AS (
      SELECT w, n_w,
             CAST(row_number() OVER (ORDER BY n_w DESC, w) AS BIGINT) AS rnk
      FROM uni),
    lo AS (
      SELECT w, n_w, rnk,
             CAST(round(ln(rnk::DOUBLE) * 1000000, 0) AS BIGINT) AS x_u,
             CAST(round(ln(n_w::DOUBLE) * 1000000, 0) AS BIGINT) AS y_u
      FROM ranked),
    fit AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM(CAST(x_u AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sx,
             CAST(SUM(CAST(y_u AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sy,
             CAST(SUM(CAST(x_u AS DECIMAL(38,0)) * y_u) AS DECIMAL(38,0)) AS sxy,
             CAST(SUM(CAST(x_u AS DECIMAL(38,0)) * x_u) AS DECIMAL(38,0)) AS sxx
      FROM lo)
    SELECT lo.w, lo.rnk, lo.n_w,
           round(CAST(fit.k * fit.sxy - fit.sx * fit.sy AS DOUBLE)
                 / CAST(fit.k * fit.sxx - fit.sx * fit.sx AS DOUBLE), 6)
             AS zipf_slope
    FROM lo CROSS JOIN fit
    WHERE lo.rnk <= {ZIPF_TOP_RANKS}
    """,
    tags=("llm", "text", "stats"),
)
def text_zipf_rank_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf rank-frequency diagnostic: the top-ranked vocabulary with
    the least-squares slope of ln(freq) on ln(rank) over the WHOLE
    vocabulary (natural text ~= -1; synthetic/boilerplate corpora
    deviate sharply, making the slope a cheap corpus-health metric).

    Determinism: ln(rank)/ln(freq) round to integer micro-nats, the
    OLS moment sums accumulate those bigints exactly as DECIMAL(38,0)
    (order-independent), and the slope is a single double divide of
    two exact decimals — bit-identical cross-engine.

    Scale: one token aggregate (map-side combinable) + a global
    ranking window over the vocab (vocab << corpus; at 10^7 terms a
    single-partition sort is still trivial) + one 5-number moment
    aggregate; the corpus itself is touched exactly once."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    uni = (
        d.select(F.explode(F.split(F.trim(F.col("text")), " ")).alias("w"))
        .groupBy("w")
        .agg(F.count("*").cast("bigint").alias("n_w"))
    )
    ranked = uni.withColumn(
        "rnk",
        F.row_number().over(Window.orderBy(F.col("n_w").desc(), "w")).cast("bigint"),
    )
    lo = ranked.select(
        "w", "n_w", "rnk",
        F.round(F.log(F.col("rnk").cast("double")) * 1000000, 0)
        .cast("bigint")
        .alias("x_u"),
        F.round(F.log(F.col("n_w").cast("double")) * 1000000, 0)
        .cast("bigint")
        .alias("y_u"),
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")
    fit = lo.agg(
        F.count("*").cast("bigint").alias("k"),
        F.sum(dec("x_u")).cast("decimal(38,0)").alias("sx"),
        F.sum(dec("y_u")).cast("decimal(38,0)").alias("sy"),
        F.sum(dec("x_u") * F.col("y_u")).cast("decimal(38,0)").alias("sxy"),
        F.sum(dec("x_u") * F.col("x_u")).cast("decimal(38,0)").alias("sxx"),
    )
    return (
        lo.filter(F.col("rnk") <= ZIPF_TOP_RANKS)
        .crossJoin(F.broadcast(fit))
        .select(
            "w", "rnk", "n_w",
            F.round(
                (F.col("k") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
                / (F.col("k") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
                    "double"
                ),
                6,
            ).alias("zipf_slope"),
        )
    )


BM25_K1 = 1.2
BM25_B = 0.75
BM25_QUERY = ("spark", "vector", "stream")  # fixed retrieval query


@register(
    "text_bm25_score",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(trim(text), ' ')) AS tok
      FROM documents),
    tf AS (SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
           FROM toks GROUP BY doc_id, tok),
    dl AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dlen FROM tf GROUP BY doc_id),
    stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                     CAST(SUM(dlen) AS BIGINT) AS total_len
              FROM dl),
    dfreq AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS df
              FROM tf WHERE tok IN {BM25_QUERY!r} GROUP BY tok),
    term AS (
      SELECT t.doc_id,
             CAST(round(
               ln((s.n_docs - f.df + 0.5) / (f.df + 0.5) + 1.0)
               * (t.tf * ({BM25_K1} + 1.0))
               / (t.tf + {BM25_K1} * (1.0 - {BM25_B}
                  + {BM25_B} * d.dlen / (CAST(s.total_len AS DOUBLE) / s.n_docs)))
               * 1000000, 0) AS BIGINT) AS score_u
      FROM tf t
      JOIN dfreq f ON f.tok = t.tok
      JOIN dl d ON d.doc_id = t.doc_id
      CROSS JOIN stats s)
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_terms_matched,
           CAST(SUM(score_u) AS DOUBLE) / 1000000.0 AS bm25
    FROM term GROUP BY doc_id
    """,
    tags=("llm", "text", "retrieval"),
)
def text_bm25_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 retrieval scoring against a fixed query — the lexical
    ranker behind almost every RAG retrieval stack and the hard-to-beat
    baseline dense retrieval is measured against (Robertson k1/b form
    with the +1 IDF). TF-IDF (text_tfidf_topk) extracts keywords; BM25
    RANKS documents for a query, saturating term frequency (k1) and
    normalizing by document length (b).

    Determinism: tf/df/doc-length/corpus stats are exact bigints; each
    per-term score is one shared double formula rounded to integer
    micro-units BEFORE the per-doc sum, so accumulation order cannot
    matter.

    Scale: one (doc, term) aggregate feeds term frequencies, document
    lengths, AND document frequencies (no second corpus scan); the df
    relation is |query|-sized and the corpus stats are one broadcast
    row. The inner join on the query terms prunes the tf table to
    matching rows before any scoring."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(F.split(F.trim(F.col("text")), " ")).alias("tok")
    )
    tf = toks.groupBy("doc_id", "tok").agg(F.count("*").cast("bigint").alias("tf"))
    dl = tf.groupBy("doc_id").agg(F.sum("tf").cast("bigint").alias("dlen"))
    stats = dl.agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("dlen").cast("bigint").alias("total_len"),
    )
    dfreq = (
        tf.filter(F.col("tok").isin(*BM25_QUERY))
        .groupBy("tok")
        .agg(F.count("*").cast("bigint").alias("df"))
    )
    avgdl = F.col("total_len").cast("double") / F.col("n_docs")
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    score_u = F.round(
        idf
        * (F.col("tf") * (BM25_K1 + 1.0))
        / (
            F.col("tf")
            + BM25_K1 * (1.0 - BM25_B + BM25_B * F.col("dlen") / avgdl)
        )
        * 1000000,
        0,
    ).cast("bigint")
    # dl is corpus-sized (one row per doc) — never hinted broadcast;
    # the tf->dl join rides doc_id (AQE may still broadcast at fixture
    # scale, SMJ at 100 TB — both correct)
    term = (
        tf.join(F.broadcast(dfreq), "tok")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", score_u.alias("score_u"))
    )
    return term.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_terms_matched"),
        (F.sum("score_u").cast("double") / 1000000.0).alias("bm25"),
    )


@register(
    "text_ngram_repetition",
    oracle="""
    WITH t AS (
      SELECT doc_id, text, string_split(trim(text), ' ') AS toks
      FROM documents),
    g AS (
      SELECT doc_id, 2 AS n,
             unnest(list_transform(generate_series(1, len(toks) - 1),
                                   i -> array_to_string(toks[i:i+1], ' '))) AS gram
      FROM t
      UNION ALL
      SELECT doc_id, 3 AS n,
             unnest(list_transform(generate_series(1, len(toks) - 2),
                                   i -> array_to_string(toks[i:i+2], ' '))) AS gram
      FROM t),
    c AS (SELECT doc_id, n, gram, COUNT(*) AS cnt FROM g GROUP BY doc_id, n, gram),
    m AS (
      SELECT doc_id,
             CAST(COALESCE(SUM(cnt) FILTER (n = 2), 0) AS BIGINT) AS n_bigrams,
             CAST(COALESCE(SUM(cnt) FILTER (n = 2 AND cnt > 1), 0) AS BIGINT)
               AS dup_bigram_mass,
             MAX(cnt) FILTER (n = 2) AS top_bigram_cnt,
             CAST(COALESCE(SUM(cnt) FILTER (n = 3), 0) AS BIGINT) AS n_trigrams,
             CAST(COALESCE(SUM(cnt) FILTER (n = 3 AND cnt > 1), 0) AS BIGINT)
               AS dup_trigram_mass
      FROM c GROUP BY doc_id)
    SELECT d.doc_id,
           CASE WHEN d.text IS NULL THEN NULL
                ELSE COALESCE(m.n_bigrams, 0) END AS n_bigrams,
           CASE WHEN d.text IS NULL THEN NULL
                ELSE COALESCE(m.dup_bigram_mass, 0) END AS dup_bigram_mass,
           m.top_bigram_cnt,
           CASE WHEN d.text IS NULL THEN NULL
                ELSE COALESCE(m.n_trigrams, 0) END AS n_trigrams,
           CASE WHEN d.text IS NULL THEN NULL
                ELSE COALESCE(m.dup_trigram_mass, 0) END AS dup_trigram_mass,
           CASE WHEN COALESCE(m.n_bigrams, 0) > 0
                THEN m.dup_bigram_mass / m.n_bigrams END AS dup_bigram_frac,
           CASE WHEN COALESCE(m.n_bigrams, 0) > 0
                THEN m.top_bigram_cnt / m.n_bigrams END AS top_bigram_frac,
           CASE WHEN COALESCE(m.n_trigrams, 0) > 0
                THEN m.dup_trigram_mass / m.n_trigrams END AS dup_trigram_frac,
           CASE WHEN COALESCE(m.n_bigrams, 0) > 0
                THEN m.top_bigram_cnt * 5 <= m.n_bigrams END AS ok_top_bigram,
           CASE WHEN COALESCE(m.n_trigrams, 0) > 0
                THEN m.dup_trigram_mass * 5 <= m.n_trigrams END AS ok_dup_trigram
    FROM documents d LEFT JOIN m ON d.doc_id = m.doc_id
    """,
    tags=("llm", "text", "quality"),
)
def text_ngram_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram repetition quality signals — the Gopher/MassiveText
    "repetitious text" filters at the n-gram level (Rae et al. 2021,
    arXiv:2112.11446 §A1.1), token-mass variant: per document, the
    mass fraction covered by DUPLICATED bigrams/trigrams and by the
    single most frequent bigram, with integer-threshold verdicts
    (top bigram <= 20 % of bigram mass, duplicated trigram mass <=
    20 %). Complements text_repetition_ratio (token level): phrase
    loops ("click here click here ...") repeat n-grams while keeping
    token-level stats unremarkable.

    Determinism: every metric is an integer count; fractions are one
    int/int IEEE divide; verdicts compare integers (never floats).
    NULL text -> NULL metrics; a doc too short for n-grams -> zero
    counts and NULL fractions/verdicts (0/0 is undefined, not 0).

    Scale shape (r13): ONE map pass, ZERO exchanges. Every metric is a
    pure function of a single document's own gram multiset, so each
    row sorts its gram arrays and reads the counts off the run lengths
    — no explode, no (doc_id, n, gram) shuffle, no doc_id rollup, no
    join back to `documents` (the r12 form paid two corpus-wide
    gram-STRING shuffles plus the join; the oracle's UNION ALL /
    GROUP BY pipeline is fine at DuckDB's scale). Per-doc work is
    O(len·log len) — bounded by the longest document, embarrassingly
    parallel."""
    d = load_table(spark, sf_dir, "documents")
    # Materialize toks as an attribute FIRST: referencing the split()
    # expression directly inside the gram lambdas would re-split the
    # text once per gram element (O(len^2) splits — measured 17.8 s vs
    # 1.0 s at sf0.01). toks is non-cheap and multi-referenced, so
    # CollapseProject keeps the projection boundary (same discipline
    # as dedup._add_minhash).
    t = d.select("doc_id", "text", F.split(F.trim(F.col("text")), " ").alias("toks"))
    toks = F.col("toks")

    def shift(k: int) -> Column:
        # toks without its first k elements (slice clamps: start past
        # the end or length 0 -> empty array)
        return F.slice(toks, k + 1, F.greatest(F.size(toks) - k, F.lit(0)))

    def grams(n: int) -> Column:
        # zip_with over k-shifted copies: O(len) per doc. The naive
        # transform(i -> slice(toks, i, n)) form copies a sub-array per
        # ELEMENT — O(len^2) interpreted work since higher-order
        # functions never codegen (measured 4.9 s vs 1.0 s at sf0.01).
        # zip_with pads the shorter side with NULL and concat propagates
        # it, so the k trailing windows that run off the end become NULL
        # and the filter drops them; NULL text propagates to a NULL
        # gram list (explode emits nothing, like the oracle's unnest).
        z = toks
        for k in range(1, n):
            z = F.zip_with(z, shift(k), lambda a, b: F.concat(a, F.lit(" "), b))
        return F.filter(z, lambda x: x.isNotNull())

    def tagged(n: int) -> Column:
        return F.transform(
            grams(n),
            lambda gr: F.struct(F.lit(n).alias("n"), gr.alias("gram")),
        )

    # r13: the per-doc gram counts are DOC-LOCAL — every metric is a
    # pure function of one document's own gram multiset — so the whole
    # query is a single map pass: sort each doc's gram array and read
    # the counts off the run lengths. The r12 form exploded the corpus
    # and shuffled gram STRINGS twice ((doc_id, n, gram) counts, then
    # the doc_id rollup) plus a doc_id join back to documents — ×100
    # measured 17.3 s for what needs NO exchange at all (guide §2.4).
    # Run-length machinery: `starts` = 1-based positions where the
    # sorted array changes value; run lengths are successive-start
    # differences (with a size+1 sentinel appended). Each non-cheap
    # multi-referenced array gets its own projection so CollapseProject
    # keeps the boundary (the _add_minhash discipline — element_at on
    # an inlined array_sort would re-sort per element).
    def starts_of(s: Column) -> Column:
        # position 1 is always a run start; the filter probes i >= 2
        # only (element_at rejects index 0, and sequence(2, 1) would
        # run DESCENDING — both branches are guarded; CaseWhen
        # evaluates lazily per row)
        tail = F.filter(
            F.sequence(F.lit(2), F.size(s)),
            lambda i: F.element_at(s, i) != F.element_at(s, i - 1),
        )
        return F.when(
            F.size(s) >= 2, F.concat(F.array(F.lit(1)), tail)
        ).when(F.size(s) == 1, F.array(F.lit(1)))

    def runs_of(st: Column, s: Column) -> Column:
        return F.zip_with(
            st,
            F.concat(
                F.slice(st, 2, F.greatest(F.size(st) - 1, F.lit(0))),
                F.array(F.size(s) + 1),
            ),
            lambda a, b: b - a,
        )

    sorted_ = t.select(
        "doc_id",
        "text",
        F.array_sort(grams(2)).alias("s2"),
        F.array_sort(grams(3)).alias("s3"),
    )
    started = sorted_.select(
        "doc_id",
        "text",
        "s2",
        "s3",
        starts_of(F.col("s2")).alias("st2"),
        starts_of(F.col("s3")).alias("st3"),
    )
    runs = started.select(
        "doc_id",
        "text",
        F.size("s2").alias("l2"),
        F.size("s3").alias("l3"),
        runs_of(F.col("st2"), F.col("s2")).alias("r2"),
        runs_of(F.col("st3"), F.col("s3")).alias("r3"),
    )

    def dup_mass(r: Column) -> Column:
        return F.aggregate(
            F.filter(r, lambda x: x > 1),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x.cast("bigint"),
        )

    # same names/semantics as the r12 aggregate: nb/nt = total gram
    # mass (0 when none), db/dt = mass in runs of length > 1, tb = the
    # longest bigram run (NULL when no bigrams — array_max over a NULL
    # runs column, exactly the old absent-group NULL)
    j = runs.select(
        "doc_id",
        "text",
        F.when(F.col("l2") > 0, F.col("l2")).otherwise(0).cast("bigint").alias("nb"),
        F.when(F.col("l2") > 0, dup_mass(F.col("r2"))).otherwise(0).alias("db"),
        F.array_max("r2").cast("bigint").alias("tb"),
        F.when(F.col("l3") > 0, F.col("l3")).otherwise(0).cast("bigint").alias("nt"),
        F.when(F.col("l3") > 0, dup_mass(F.col("r3"))).otherwise(0).alias("dt"),
    )
    has_text = F.col("text").isNotNull()
    nb = F.col("nb")
    nt_ = F.col("nt")
    has_bi = F.coalesce(nb, F.lit(0)) > 0
    has_tri = F.coalesce(nt_, F.lit(0)) > 0
    return j.select(
        "doc_id",
        F.when(has_text, F.coalesce(nb, F.lit(0)).cast("bigint")).alias("n_bigrams"),
        F.when(has_text, F.coalesce(F.col("db"), F.lit(0)).cast("bigint")).alias(
            "dup_bigram_mass"
        ),
        F.col("tb").alias("top_bigram_cnt"),
        F.when(has_text, F.coalesce(nt_, F.lit(0)).cast("bigint")).alias("n_trigrams"),
        F.when(has_text, F.coalesce(F.col("dt"), F.lit(0)).cast("bigint")).alias(
            "dup_trigram_mass"
        ),
        F.when(has_bi, F.col("db") / nb).alias("dup_bigram_frac"),
        F.when(has_bi, F.col("tb") / nb).alias("top_bigram_frac"),
        F.when(has_tri, F.col("dt") / nt_).alias("dup_trigram_frac"),
        F.when(has_bi, F.col("tb") * 5 <= nb).alias("ok_top_bigram"),
        F.when(has_tri, F.col("dt") * 5 <= nt_).alias("ok_dup_trigram"),
    )


@register(
    "text_readability_scores",
    oracle="""
    WITH t AS (
      SELECT doc_id, text,
             list_filter(string_split(trim(text), ' '), x -> x <> '') AS toks
      FROM documents),
    c AS (
      SELECT doc_id, text,
             CAST(len(toks) AS BIGINT) AS w,
             CAST(CASE WHEN len(toks) > 0
                  THEN GREATEST(1, len(regexp_extract_all(text, '[.!?]+')))
                  ELSE 0 END AS BIGINT) AS s,
             CAST(len(regexp_extract_all(text, '[aeiouyAEIOUY]+'))
                  + len(list_filter(toks,
                        x -> NOT regexp_matches(x, '[aeiouyAEIOUY]')))
                  AS BIGINT) AS sy
      FROM t)
    SELECT doc_id,
           CASE WHEN text IS NOT NULL THEN w END AS n_words,
           CASE WHEN text IS NOT NULL THEN s END AS n_sentences,
           CASE WHEN text IS NOT NULL THEN sy END AS n_syllables,
           CASE WHEN w > 0 THEN w / s END AS words_per_sentence,
           CASE WHEN w > 0 THEN sy / w END AS syllables_per_word,
           CASE WHEN w > 0 THEN
             (206835*s*w - 1015*w*w - 84600*sy*s) / (1000*s*w)
           END AS flesch_ease,
           CASE WHEN w > 0 THEN
             (390*w*w + 11800*sy*s - 15590*s*w) / (1000*s*w)
           END AS fk_grade,
           CASE WHEN w > 0 THEN
             206835*s*w - 1015*w*w - 84600*sy*s >= 60 * (1000*s*w)
           END AS is_easy_read
    FROM c
    """,
    tags=("llm", "text", "quality"),
)
def text_readability_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease + Flesch-Kincaid grade per document (Kincaid
    et al. 1975), with the standard vowel-group syllable heuristic:
    syllables(token) = max(1, count of [aeiouy]+ runs). Readability is
    a stock quality-filter signal in LLM curation stacks (C4/Gopher
    lineage) next to text_stats_quality's length/punct ratios.

    Determinism: words / sentences / syllables are integer counts;
    both scores are a SINGLE int/int IEEE divide of exact BIGINT
    polynomials (206.835 - 1.015*w/s - 84.6*sy/w ==
    (206835*s*w - 1015*w*w - 84600*sy*s)/(1000*s*w)), so Spark and
    DuckDB produce bit-identical doubles; the is_easy_read verdict
    (ease >= 60) compares the integer numerator against 60*denominator
    — no float compare anywhere. Products stay in BIGINT for any doc
    under ~3e6 tokens (2^63/1015 bound); the corpus schema caps well
    below that.

    NULL text -> all-NULL row; empty/whitespace text -> zero counts
    with NULL ratios/scores (0/0 undefined, not 0). Sentence count has
    a floor of 1 only when the doc has words (trailing-punctuation-free
    prose is one sentence, not zero).

    Scale shape: pure single-scan map-side work — split/regexp_count/
    array-filter are all codegen'd JVM expressions, zero shuffles,
    zero joins; at 100 TB this is scan-bound and embarrassingly
    parallel. Vowel groups are counted once over the raw text (word
    boundaries are spaces, so text-wide runs == per-token sums) plus a
    vowel-less-token floor from one array filter."""
    d = load_table(spark, sf_dir, "documents")
    t = d.select(
        "doc_id",
        "text",
        F.filter(_toks(), lambda x: x != "").alias("toks"),
    )
    toks = F.col("toks")
    w = F.size(toks).cast("bigint")
    s = F.when(
        F.size(toks) > 0,
        F.greatest(F.lit(1), F.regexp_count(F.col("text"), F.lit(r"[.!?]+"))),
    ).otherwise(F.lit(0)).cast("bigint")
    sy = (
        F.regexp_count(F.col("text"), F.lit("[aeiouyAEIOUY]+"))
        + F.size(F.filter(toks, lambda x: ~x.rlike("[aeiouyAEIOUY]")))
    ).cast("bigint")
    c = t.select("doc_id", "text", w.alias("w"), s.alias("s"), sy.alias("sy"))
    wc, sc, syc = F.col("w"), F.col("s"), F.col("sy")
    has_text = F.col("text").isNotNull()
    has_words = wc > 0
    ease_num = 206835 * sc * wc - 1015 * wc * wc - 84600 * syc * sc
    grade_num = 390 * wc * wc + 11800 * syc * sc - 15590 * sc * wc
    den = 1000 * sc * wc
    return c.select(
        "doc_id",
        F.when(has_text, wc).alias("n_words"),
        F.when(has_text, sc).alias("n_sentences"),
        F.when(has_text, syc).alias("n_syllables"),
        F.when(has_words, wc / sc).alias("words_per_sentence"),
        F.when(has_words, syc / wc).alias("syllables_per_word"),
        F.when(has_words, ease_num / den).alias("flesch_ease"),
        F.when(has_words, grade_num / den).alias("fk_grade"),
        F.when(has_words, ease_num >= 60 * den).alias("is_easy_read"),
    )


@register(
    "text_keyword_rake",
    oracle=f"""
    WITH canon AS (
      SELECT regexp_replace(
               regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'),
               '\\b({_STOP_ALT})\\b', '|', 'g') AS t
      FROM documents WHERE text IS NOT NULL),
    phrases AS (
      SELECT trim(p) AS phrase
      FROM canon, unnest(string_split(t, '|')) AS u(p)
      WHERE trim(p) <> ''),
    pw AS (
      SELECT w AS word, len(string_split(phrase, ' ')) AS plen
      FROM phrases, unnest(string_split(phrase, ' ')) AS v(w)),
    scored AS (
      SELECT word, COUNT(*) AS freq,
             CAST(SUM(plen) AS BIGINT) AS deg,
             round(CAST(SUM(plen) AS DOUBLE) / COUNT(*), 6) AS rake_score
      FROM pw GROUP BY word)
    SELECT word, freq, deg, rake_score
    FROM scored ORDER BY rake_score DESC, word LIMIT 50
    """,
    tags=("llm", "text", "keywords"),
)
def text_keyword_rake(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE (Rapid Automatic Keyword Extraction) word scores over the
    corpus: text splits into candidate phrases at stopword boundaries
    (the fixture corpus is pre-tokenized words — punctuation splitting
    would be a no-op here and is deliberately not claimed); each word
    scores degree/frequency, where degree sums
    the lengths of every phrase containing it — words that live in
    long multi-word phrases rank above merely-frequent ones. Top 50
    by (score, word) — the corpus keyword table a data card reports.

    Exactness: freq/deg are integers; the score is one division
    rounded to 6; the ORDER BY carries the word as total-order
    tiebreak. Scale: phrase + word explode is a single scan, linear in
    token count; the aggregate is map-side combinable on word (same
    shape as explode_wordcount). The top-50 is a TakeOrdered, not a
    global sort."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    stop_re = r"\b(" + _STOP_ALT + r")\b"
    t = F.regexp_replace(
        F.regexp_replace(F.trim(F.lower(F.col("text"))), r"\s+", " "),
        stop_re,
        "|",
    )
    phrases = (
        d.select(F.explode(F.split(t, r"\|")).alias("p"))
        .select(F.trim("p").alias("phrase"))
        .filter(F.col("phrase") != "")
    )
    pw = phrases.select(
        F.explode(F.split("phrase", " ")).alias("word"),
        F.size(F.split("phrase", " ")).alias("plen"),
    )
    scored = pw.groupBy("word").agg(
        F.count("*").alias("freq"),
        F.sum("plen").alias("deg"),
        F.round(F.sum("plen").cast("double") / F.count("*"), 6).alias(
            "rake_score"
        ),
    )
    return scored.orderBy(F.col("rake_score").desc(), "word").limit(50)


@register(
    "text_cdc_chunk_boundaries",
    oracle="""
    WITH d AS (
      SELECT doc_id,
             string_split(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'),
                          ' ') AS toks
      FROM documents WHERE text IS NOT NULL AND trim(text) <> ''),
    t AS (
      SELECT doc_id,
             unnest(toks) AS tok,
             unnest(generate_series(1, len(toks))) AS idx
      FROM d),
    h AS (
      SELECT doc_id, tok, idx,
             CASE WHEN idx >= 3 AND
               CAST(('0x' || substr(md5(
                 lag(tok, 2) OVER w || '_' || lag(tok, 1) OVER w || '_' || tok),
                 1, 15)) AS BIGINT) % 8 = 0
             THEN 1 ELSE 0 END AS boundary
      FROM t WINDOW w AS (PARTITION BY doc_id ORDER BY idx)),
    c AS (
      SELECT doc_id, tok, idx,
             CAST(1 + COALESCE(SUM(boundary) OVER (
               PARTITION BY doc_id ORDER BY idx
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS chunk_id
      FROM h)
    SELECT doc_id, chunk_id,
           COUNT(*) AS n_tokens,
           md5(string_agg(tok, ' ' ORDER BY idx)) AS chunk_hash
    FROM c GROUP BY doc_id, chunk_id
    """,
    tags=("llm", "text", "dedup", "chunking"),
)
def text_cdc_chunk_boundaries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking: a chunk boundary opens after token i
    whenever the rolling 3-token window hash ≡ 0 (mod 8) — so chunk
    edges move WITH the content, and an insertion near the front of a
    document shifts only its own chunk, not every downstream
    fixed-width window (the Rabin/gear-CDC property that makes
    chunk-level dedup robust to edits; mean chunk ≈ 8 tokens).
    Emits (doc, chunk, token count, chunk hash) — the dedup-able unit.

    Exactness: the window hash is md5 over '_'-joined tokens reduced
    mod 8 from the same 15-hex-digit prefix in both engines; chunk ids
    are integer prefix sums. Scale: one shuffle on doc_id for the
    token windows (per-doc state only), one map-side-combinable
    aggregate; nothing crosses documents. At 100 TB the same shape
    runs per-partition since docs never split across tasks."""
    d = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull() & (F.trim(F.col("text")) != ""))
        .select(
            "doc_id",
            F.split(
                F.regexp_replace(F.trim(F.lower(F.col("text"))), r"\s+", " "),
                " ",
            ).alias("toks"),
        )
    )
    t = d.select("doc_id", F.posexplode("toks").alias("pos", "tok")).select(
        "doc_id", "tok", (F.col("pos") + 1).alias("idx")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy("idx")
    win_hash = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    "_", F.lag("tok", 2).over(w), F.lag("tok", 1).over(w), F.col("tok")
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("bigint")
    h = t.select(
        "doc_id",
        "tok",
        "idx",
        F.when((F.col("idx") >= 3) & (win_hash % 8 == 0), F.lit(1))
        .otherwise(F.lit(0))
        .alias("boundary"),
    )
    wc = (
        Window.partitionBy("doc_id")
        .orderBy("idx")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    c = h.select(
        "doc_id",
        "tok",
        "idx",
        (F.lit(1) + F.coalesce(F.sum("boundary").over(wc), F.lit(0))).alias(
            "chunk_id"
        ),
    )
    ordered_toks = F.array_join(
        F.transform(
            F.array_sort(F.collect_list(F.struct("idx", "tok"))),
            lambda s: s.getField("tok"),
        ),
        " ",
    )
    return c.groupBy("doc_id", "chunk_id").agg(
        F.count("*").alias("n_tokens"),
        F.md5(ordered_toks).alias("chunk_hash"),
    )


@register(
    "corpus_heaps_law_fit",
    oracle="""
    WITH dt AS (
      SELECT doc_id, string_split(trim(text), ' ') AS toks
      -- NULL doc_id is unplaceable on the growth axis (cumulative
      -- window order): excluded in BOTH engines
      FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL),
    per_doc AS (
      SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_toks FROM dt),
    firsts AS (
      SELECT w, MIN(doc_id) AS first_doc
      FROM (SELECT doc_id, unnest(toks) AS w FROM dt) GROUP BY w),
    news AS (
      SELECT first_doc AS doc_id, CAST(COUNT(*) AS BIGINT) AS new_words
      FROM firsts GROUP BY first_doc),
    curve AS (
      SELECT p.doc_id,
             SUM(p.n_toks) OVER (ORDER BY p.doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_toks,
             SUM(COALESCE(n.new_words, 0)) OVER (ORDER BY p.doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_vocab
      FROM per_doc p LEFT JOIN news n ON p.doc_id = n.doc_id),
    lo AS (
      SELECT CAST(round(ln(CAST(cum_toks AS DOUBLE)) * 1000000, 0) AS BIGINT) AS x_u,
             CAST(round(ln(CAST(cum_vocab AS DOUBLE)) * 1000000, 0) AS BIGINT) AS y_u
      FROM curve WHERE cum_toks > 0 AND cum_vocab > 0),
    fit AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM(CAST(x_u AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sx,
             CAST(SUM(CAST(y_u AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sy,
             CAST(SUM(CAST(x_u AS DECIMAL(38,0)) * y_u) AS DECIMAL(38,0)) AS sxy,
             CAST(SUM(CAST(x_u AS DECIMAL(38,0)) * x_u) AS DECIMAL(38,0)) AS sxx
      FROM lo),
    tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(MAX(cum_toks) AS BIGINT) AS total_tokens,
             CAST(MAX(cum_vocab) AS BIGINT) AS vocab_size
      FROM curve)
    SELECT tot.n_docs, tot.total_tokens, tot.vocab_size,
           round(CAST(fit.k * fit.sxy - fit.sx * fit.sy AS DOUBLE)
                 / CAST(fit.k * fit.sxx - fit.sx * fit.sx AS DOUBLE), 6)
             AS heaps_beta,
           round(exp((CAST(fit.sy AS DOUBLE)
                      - (CAST(fit.k * fit.sxy - fit.sx * fit.sy AS DOUBLE)
                         / CAST(fit.k * fit.sxx - fit.sx * fit.sx AS DOUBLE))
                        * CAST(fit.sx AS DOUBLE))
                     / fit.k / 1000000.0), 6) AS heaps_k
    FROM tot CROSS JOIN fit
    """,
    tags=("llm", "text", "stats"),
)
def corpus_heaps_law_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary-growth fit: V(N) ≈ k·N^β estimated by
    least squares of ln(cum vocab) on ln(cum tokens) along the
    corpus-order growth curve (docs ordered by id). Natural corpora
    fit β ≈ 0.4–0.6; β drifting toward 0 flags saturation/duplication
    and toward 1 flags synthetic/noisy vocabularies — the companion
    health metric to the Zipf slope.

    Determinism: the growth curve is integer cumulative sums; the
    log points round to integer micro-nats; OLS moments accumulate
    as exact DECIMAL(38,0); slope/intercept/exp are one identical
    double expression per output cell (ln/exp differ ≤1 ulp
    cross-engine, absorbed by micro-rounding + round-6). Scale: one
    token scan for counts + first-occurrence aggregate (map-side
    combinable on word); the cumulative windows run over the per-doc
    table. The single-partition cumulative window is the documented
    trade-off — at 100 TB you'd checkpoint the curve at per-shard
    boundaries instead of every doc; the moment sums are unchanged."""
    from pyspark.sql import Window

    dt = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id").isNotNull() & F.col("text").isNotNull())
        .select("doc_id", F.split(F.trim(F.col("text")), " ").alias("toks"))
    )
    per_doc = dt.select("doc_id", F.size("toks").cast("bigint").alias("n_toks"))
    firsts = (
        dt.select("doc_id", F.explode("toks").alias("w"))
        .groupBy("w")
        .agg(F.min("doc_id").alias("first_doc"))
    )
    news = firsts.groupBy(F.col("first_doc").alias("doc_id")).agg(
        F.count("*").cast("bigint").alias("new_words")
    )
    wc = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, 0)
    curve = (
        per_doc.join(news, "doc_id", "left")
        .select(
            "doc_id",
            F.sum("n_toks").over(wc).alias("cum_toks"),
            F.sum(F.coalesce(F.col("new_words"), F.lit(0))).over(wc).alias(
                "cum_vocab"
            ),
        )
    )
    lo = curve.filter((F.col("cum_toks") > 0) & (F.col("cum_vocab") > 0)).select(
        F.round(F.log(F.col("cum_toks").cast("double")) * 1000000, 0)
        .cast("bigint")
        .alias("x_u"),
        F.round(F.log(F.col("cum_vocab").cast("double")) * 1000000, 0)
        .cast("bigint")
        .alias("y_u"),
    )
    dec38 = "decimal(38,0)"
    fit = lo.agg(
        F.count("*").cast("bigint").alias("k"),
        F.sum(F.col("x_u").cast(dec38)).cast(dec38).alias("sx"),
        F.sum(F.col("y_u").cast(dec38)).cast(dec38).alias("sy"),
        F.sum(F.col("x_u").cast(dec38) * F.col("y_u")).cast(dec38).alias("sxy"),
        F.sum(F.col("x_u").cast(dec38) * F.col("x_u")).cast(dec38).alias("sxx"),
    )
    tot = curve.agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.max("cum_toks").cast("bigint").alias("total_tokens"),
        F.max("cum_vocab").cast("bigint").alias("vocab_size"),
    )
    slope = (
        (F.col("k") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
        / (F.col("k") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    )
    return tot.crossJoin(F.broadcast(fit)).select(
        "n_docs",
        "total_tokens",
        "vocab_size",
        F.round(slope, 6).alias("heaps_beta"),
        F.round(
            F.exp(
                (F.col("sy").cast("double") - slope * F.col("sx").cast("double"))
                / F.col("k")
                / 1000000.0
            ),
            6,
        ).alias("heaps_k"),
    )


# --------------------------------------------------------------------------
# character-level Shannon entropy: the classic gibberish / compression-
# ratio quality signal
# --------------------------------------------------------------------------


@register(
    "text_char_entropy",
    oracle="""
    WITH d AS (
      SELECT doc_id, text FROM documents
      WHERE text IS NOT NULL AND len(text) >= 1),
    ch AS (
      SELECT doc_id, substr(text, CAST(i AS INT), 1) AS c
      FROM d, unnest(generate_series(1, len(text))) AS u(i)),
    cc AS (SELECT doc_id, c, COUNT(*) AS n_c FROM ch GROUP BY doc_id, c),
    tt AS (SELECT doc_id, n_c,
                  SUM(n_c) OVER (PARTITION BY doc_id) AS n
           FROM cc),
    sc AS (SELECT doc_id, n, n_c,
                  CAST(ROUND(ln(CAST(n_c AS DOUBLE) / n) * 1000000, 0)
                       AS BIGINT) AS unats
           FROM tt)
    SELECT doc_id,
           CAST(MAX(n) AS BIGINT) AS n_chars,
           COUNT(*) AS n_distinct_chars,
           CAST(-SUM(n_c * unats) AS DOUBLE) / 1000000.0 / MAX(n)
             AS entropy_nats
    FROM sc GROUP BY doc_id
    """,
    tags=("llm", "text", "quality"),
)
def text_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-level Shannon entropy per document — the cheapest
    gibberish/boilerplate signal a quality pipeline computes (random
    bytes score high, single-character spam scores ~0; natural English
    sits ~2.5-4.2 nats). Emitted as (n_chars, distinct chars, entropy
    in nats).

    Exactness: the only transcendental is ln(p), rounded to integer
    MICRO-NATS before the weighted sum (the text_unigram_surprisal
    convention) so a 1-ulp libm divergence between engines cannot
    reach the hash; the final division chain runs on integer-derived
    doubles, bit-identical.

    Scale (r13): ZERO exchanges — entropy is a pure function of one
    document's own character multiset, so the whole query is ONE map
    pass (the text_ngram_repetition run-length idiom): split the text
    into its char array, sort it, read each distinct char's count off
    the run lengths, and fold the weighted micro-nat sum per row. The
    r12 form exploded the corpus per CHARACTER into a (doc_id, char)
    hash aggregate + a doc_id window + a doc_id rollup — two
    corpus-keyed exchanges and a corpus-chars-sized row stream for
    doc-local arithmetic (×100 measured 8.6 s). Per-doc work is
    O(len·log len), embarrassingly parallel, no joins, no Python.

    Run-length equivalence: split('') yields exactly the per-code-point
    array substr(text, i, 1) walked (verified incl. non-ASCII), so the
    sorted runs ARE the (char, n_c) groups; n = size(chars) = the
    window's SUM(n_c); each run computes the identical
    round(ln(n_c/n)*1e6) micro-nat term on the same doubles, and the
    final chain divides in the oracle's exact order."""
    d = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull() & (F.length("text") >= 1))
        .select("doc_id", "text")
    )
    # each non-cheap multi-referenced array gets its own projection so
    # CollapseProject keeps the boundary (the _add_minhash discipline —
    # element_at on an inlined array_sort would re-sort per element)
    t = d.select("doc_id", F.array_sort(F.split("text", "")).alias("s"))
    s = F.col("s")
    # 1-based positions where the sorted array changes value; position
    # 1 is always a run start (text has >= 1 char here)
    tail = F.filter(
        F.sequence(F.lit(2), F.size(s)),
        lambda i: F.element_at(s, i) != F.element_at(s, i - 1),
    )
    started = t.select(
        "doc_id",
        F.size(s).alias("n"),
        F.when(F.size(s) >= 2, F.concat(F.array(F.lit(1)), tail))
        .otherwise(F.array(F.lit(1)))
        .alias("st"),
    )
    st = F.col("st")
    runs = F.zip_with(
        st,
        F.concat(
            F.slice(st, 2, F.greatest(F.size(st) - 1, F.lit(0))),
            F.array(F.col("n") + 1),
        ),
        lambda a, b: b - a,
    )
    r = started.select("doc_id", "n", F.size(st).alias("n_distinct"), runs.alias("r"))
    # sum over runs of n_c * round(ln(n_c/n) * 1e6): the same integer
    # micro-nat term per (char, count) group the r12 aggregate built
    term = lambda c: (  # noqa: E731
        c.cast("bigint")
        * F.round(
            F.log(c.cast("double") / F.col("n")) * 1000000.0, 0
        ).cast("bigint")
    )
    ent_sum = F.aggregate(
        F.col("r"), F.lit(0).cast("bigint"), lambda acc, c: acc + term(c)
    )
    return r.select(
        "doc_id",
        F.col("n").cast("bigint").alias("n_chars"),
        F.col("n_distinct").cast("bigint").alias("n_distinct_chars"),
        ((-ent_sum).cast("double") / 1000000.0 / F.col("n")).alias(
            "entropy_nats"
        ),
    )


# --------------------------------------------------------------------------
# PII-signal scan: regex census + redacted fingerprint (the scrub pass
# every public-corpus release runs)
# --------------------------------------------------------------------------

# Java regex (Spark) and RE2 (DuckDB) agree on this common subset:
# character classes, bounded repetition, \b, \d, \s — no lookaround,
# no backreferences.
_PII_EMAIL = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
_PII_URL = r"https?://[^\s]+"
_PII_NUMBER = r"\b\d+\b"
_PII_LONG_TOKEN = r"\b[a-z]{12,}\b"


@register(
    "text_pii_signal_counts",
    oracle=f"""
    WITH r AS (
      SELECT doc_id,
             len(regexp_extract_all(text, '{_PII_EMAIL}')) AS n_emails,
             len(regexp_extract_all(text, '{_PII_URL}')) AS n_urls,
             len(regexp_extract_all(text, '{_PII_NUMBER}')) AS n_numbers,
             len(regexp_extract_all(text, '{_PII_LONG_TOKEN}')) AS n_long_tokens,
             md5(regexp_replace(
                   regexp_replace(
                     regexp_replace(text, '{_PII_EMAIL}', '<EMAIL>', 'g'),
                     '{_PII_URL}', '<URL>', 'g'),
                   '{_PII_NUMBER}', '<NUM>', 'g')) AS redacted_fingerprint
      FROM documents WHERE text IS NOT NULL)
    SELECT doc_id,
           CAST(n_emails AS BIGINT) AS n_emails,
           CAST(n_urls AS BIGINT) AS n_urls,
           CAST(n_numbers AS BIGINT) AS n_numbers,
           CAST(n_long_tokens AS BIGINT) AS n_long_tokens,
           n_emails + n_urls + n_numbers > 0 AS has_pii_signal,
           redacted_fingerprint
    FROM r
    """,
    tags=("llm", "text", "quality", "pii"),
)
def text_pii_signal_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII-signal census per document: counts of email-shaped,
    URL-shaped and bare-number spans plus a long-token smell, and the
    md5 fingerprint of the REDACTED text (emails/URLs/numbers replaced
    by typed placeholders) — the audit table a public-corpus release
    pipeline reviews before scrubbing, with the fingerprint pinning
    the exact redaction output byte-for-byte.

    Exactness: counts are regex match counts and the fingerprint is an
    md5 of a deterministic replacement chain; the patterns use only
    the Java-regex/RE2 common subset (classes, bounded repetition,
    \\b/\\d/\\s) so both engines match identical spans. Scale: pure
    map-side scan work — no shuffle at all, the same shape the scrub
    pass itself has at 100 TB."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("text"), _PII_EMAIL, "<EMAIL>"),
            _PII_URL,
            "<URL>",
        ),
        _PII_NUMBER,
        "<NUM>",
    )
    n_emails = F.regexp_count("text", F.lit(_PII_EMAIL)).cast("bigint")
    n_urls = F.regexp_count("text", F.lit(_PII_URL)).cast("bigint")
    n_numbers = F.regexp_count("text", F.lit(_PII_NUMBER)).cast("bigint")
    n_long = F.regexp_count("text", F.lit(_PII_LONG_TOKEN)).cast("bigint")
    return d.select(
        "doc_id",
        n_emails.alias("n_emails"),
        n_urls.alias("n_urls"),
        n_numbers.alias("n_numbers"),
        n_long.alias("n_long_tokens"),
        (n_emails + n_urls + n_numbers > 0).alias("has_pii_signal"),
        F.md5(redacted).alias("redacted_fingerprint"),
    )


@register(
    "text_langid_confusion",
    oracle=f"""
    -- confusion matrix of declared lang vs the marker-word language-ID
    -- heuristic (same scorer as text_langid): per (declared,
    -- predicted) cell, count and the row share of the declared lang.
    WITH t AS (SELECT doc_id, lang, string_split(trim(text), ' ') AS toks
               FROM documents
               WHERE lang IS NOT NULL AND text IS NOT NULL),
    s AS (SELECT doc_id, lang,
                 {_lang_score_sql('en')} AS s_en,
                 {_lang_score_sql('de')} AS s_de,
                 {_lang_score_sql('fr')} AS s_fr,
                 {_lang_score_sql('es')} AS s_es
          FROM t),
    p AS (SELECT lang,
                 CASE WHEN s_en = 0 AND s_de = 0 AND s_fr = 0 AND s_es = 0
                        THEN 'unknown'
                      WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es
                        THEN 'en'
                      WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
                      WHEN s_fr >= s_es THEN 'fr'
                      ELSE 'es' END AS predicted
          FROM s),
    rowtot AS (SELECT lang, COUNT(*) AS n_lang FROM p GROUP BY lang)
    SELECT p.lang, p.predicted,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(*) * 1000000 // r.n_lang AS BIGINT) AS row_share_ppm,
           p.lang = p.predicted AS on_diagonal
    FROM p JOIN rowtot r USING (lang)
    GROUP BY p.lang, p.predicted, r.n_lang
    """,
    tags=("llm", "text", "audit"),
)
def text_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID confusion matrix: declared `lang` label vs the
    marker-word heuristic's prediction (the exact scorer behind
    text_langid), one row per (declared, predicted) cell with the
    count and the within-declared-lang share — the quality report a
    curation pipeline reads before trusting either the labels or the
    classifier. Integer-ppm shares; the per-lang row total joins back
    via broadcast (one row per language)."""
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("lang").isNotNull() & F.col("text").isNotNull()
    )
    toks = _toks()

    def score_col(lang: str):
        markers = LANG_MARKERS[lang]
        return F.size(F.filter(toks, lambda x: x.isin(*markers))).alias(
            f"s_{lang}"
        )

    scores = d.select("lang", *[score_col(lang) for lang in LANG_MARKERS])
    s_en, s_de, s_fr, s_es = (
        F.col(c) for c in ["s_en", "s_de", "s_fr", "s_es"]
    )
    pred = (
        F.when((s_en == 0) & (s_de == 0) & (s_fr == 0) & (s_es == 0), "unknown")
        .when((s_en >= s_de) & (s_en >= s_fr) & (s_en >= s_es), "en")
        .when((s_de >= s_fr) & (s_de >= s_es), "de")
        .when(s_fr >= s_es, "fr")
        .otherwise("es")
    )
    p = scores.select("lang", pred.alias("predicted"))
    rowtot = p.groupBy("lang").agg(F.count("*").alias("n_lang"))
    return (
        p.groupBy("lang", "predicted")
        .agg(F.count("*").cast("bigint").alias("n_docs"))
        .join(F.broadcast(rowtot), "lang")
        .select(
            "lang",
            "predicted",
            "n_docs",
            F.expr("CAST(n_docs * 1000000 div n_lang AS BIGINT)").alias(
                "row_share_ppm"
            ),
            (F.col("lang") == F.col("predicted")).alias("on_diagonal"),
        )
    )


@register(
    "text_perplexity_filter_audit",
    oracle="""
    -- the CCNet-style perplexity filter as an auditable pipeline step:
    -- score each doc by mean bigram surprisal (integer micro-nats), flag
    -- docs 25% above the corpus mean, report the blast radius per
    -- source. All comparisons are exact integer cross-multiplications.
    -- doc_id IS NOT NULL: a document with no id cannot be scored,
    -- joined back, or reported — both engines exclude it up front
    -- (and the shared guard keeps every Spark branch's scan
    -- identical, which is what lets one gram pass serve the model
    -- AND the probe).
    WITH t AS (
      SELECT doc_id, coalesce(source, '(none)') AS source,
             string_split(trim(text), ' ') AS toks
      FROM documents WHERE text IS NOT NULL AND doc_id IS NOT NULL),
    v AS (SELECT COUNT(DISTINCT w) AS vocab
          FROM (SELECT unnest(toks) AS w FROM t)),
    bg AS (SELECT doc_id, toks[i] AS w1, toks[i+1] AS w2
           FROM t CROSS JOIN unnest(generate_series(1, len(toks)-1)) AS u(i)),
    cnt AS (SELECT w1, w2, COUNT(*) AS n12 FROM bg GROUP BY w1, w2),
    tot AS (SELECT w1, CAST(SUM(n12) AS BIGINT) AS n1 FROM cnt GROUP BY w1),
    sc AS (
      SELECT bg.doc_id,
             CAST(-round(ln((cnt.n12 + 1) / CAST(tot.n1 + v.vocab AS DOUBLE))
                         * 1000000, 0) AS BIGINT) AS unats
      FROM bg JOIN cnt USING (w1, w2) JOIN tot USING (w1) CROSS JOIN v),
    per_doc AS (
      SELECT doc_id, CAST(SUM(unats) AS BIGINT) AS sum_unats,
             CAST(COUNT(*) AS BIGINT) AS n_bigrams
      FROM sc GROUP BY doc_id),
    corpus AS (
      SELECT CAST(SUM(sum_unats) AS BIGINT) AS c_unats,
             CAST(SUM(n_bigrams) AS BIGINT) AS c_bigrams
      FROM per_doc),
    flagged AS (
      SELECT d.doc_id,
             -- mean_doc > 1.25 * mean_corpus, cross-multiplied exactly:
             -- 4 * sum * c_bigrams > 5 * c_unats * n_bigrams
             4 * d.sum_unats * c.c_bigrams > 5 * c.c_unats * d.n_bigrams
               AS is_flagged
      FROM per_doc d CROSS JOIN corpus c),
    docs AS (
      SELECT t.source, t.doc_id, len(t.toks) AS n_tokens,
             f.is_flagged
      FROM t LEFT JOIN flagged f USING (doc_id))
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN is_flagged THEN 1 ELSE 0 END) AS BIGINT)
             AS n_flagged,
           CAST(SUM(CASE WHEN is_flagged IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_unscored,
           CAST(SUM(CASE WHEN is_flagged THEN 1 ELSE 0 END) * 1000000
                // COUNT(*) AS BIGINT) AS flagged_ppm,
           CAST(SUM(n_tokens) AS BIGINT) AS tokens_total,
           CAST(SUM(CASE WHEN is_flagged THEN n_tokens ELSE 0 END)
                AS BIGINT) AS tokens_flagged
    FROM docs GROUP BY source
    """,
    tags=("llm", "text", "lm", "curation"),
)
def text_perplexity_filter_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The perplexity filter (CCNet / Wenzek et al. 2020) as an
    auditable pipeline step: every document scores by mean bigram-LM
    surprisal (add-one smoothing, the text_bigram_surprisal model),
    documents 25% above the corpus-mean surprisal are flagged, and the
    report shows the filter's blast radius per source — docs and token
    mass it would remove, plus the unscored tail (docs with no bigram).
    This is the audit a curation team reads before turning the filter
    on.

    Exactness: per-occurrence surprisal rounds to integer micro-nats;
    every mean comparison is an exact integer cross-multiplication
    (4·sum·C_bigrams > 5·C_unats·n_bigrams) — no float thresholds;
    shares are integer-ppm.

    Scale: the bigram explode runs ONCE. Occurrences pre-aggregate to
    the per-doc (doc_id, w1, w2, k) type table with map-side combine,
    and every downstream relation — the (w1,w2) count, its w1 rollup,
    the model, and the scoring join's probe side — derives from that
    ONE Aggregate. Pinning the diamond below an Aggregate (not a bare
    repartition) is what makes AQE's ReuseExchange actually fire:
    column pruning cannot reach beneath groupBy keys, so every branch
    canonicalizes to the identical shuffle subtree and the corpus
    explode+shuffle materializes once (the bare-repartition variant
    measured two full explodes — pruning specialized the two sides'
    scans; a localCheckpoint of the type table still paid the explode
    twice: 41.3 s → 35.0 s → 17.1 s across the three shapes at ×100).
    The per-occurrence surprisal rounds once per TYPE, making k·unats
    exactly the occurrence sum. Plus a 1-row corpus broadcast and a
    source-keyed rollup."""
    d = parallelize_scan(load_table(spark, sf_dir, "documents")).filter(
        F.col("text").isNotNull() & F.col("doc_id").isNotNull()
    )
    toks = F.split(F.trim(F.col("text")), " ")
    t = d.select(
        "doc_id",
        F.coalesce("source", F.lit("(none)")).alias("source"),
        toks.alias("toks"),
    )
    bg = (
        t.select(
            "doc_id",
            F.explode(
                F.zip_with(
                    F.slice("toks", 1, F.size("toks") - 1),
                    F.expr("slice(toks, 2, size(toks) - 1)"),
                    lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
                )
            ).alias("p"),
        )
        .select("doc_id", "p.w1", "p.w2")
        # no-op semantically (equal-length zip_with slices yield no
        # NULLs) but load-bearing for the plan: the model join infers
        # isnotnull(w1) AND isnotnull(w2) on its branches while the
        # w1-only `tot` rollup infers just isnotnull(w1) — one Filter
        # node of difference, and the shared gram pass stops
        # canonicalizing equal, re-materializing per consumer.
        # Stating both guards here keeps every branch's subtree
        # byte-identical so AQE reuses ONE gram stage.
        .filter(F.col("w1").isNotNull() & F.col("w2").isNotNull())
    )
    vocab = t.select(F.explode("toks").alias("w")).agg(
        F.count_distinct("w").alias("vocab")
    )
    bgd = bg.groupBy("doc_id", "w1", "w2").agg(
        F.count("*").cast("bigint").alias("k")
    )
    cnt = bgd.groupBy("w1", "w2").agg(F.sum("k").alias("n12"))
    tot = cnt.groupBy("w1").agg(F.sum("n12").cast("bigint").alias("n1"))
    model = cnt.join(tot, "w1").crossJoin(F.broadcast(vocab))
    sc = bgd.join(model, ["w1", "w2"]).select(
        "doc_id",
        "k",
        (
            -F.round(
                F.log(
                    (F.col("n12") + 1).cast("double")
                    / (F.col("n1") + F.col("vocab")).cast("double")
                )
                * 1000000,
                0,
            )
        )
        .cast("bigint")
        .alias("unats"),
    )
    per_doc = sc.groupBy("doc_id").agg(
        F.sum(F.col("k") * F.col("unats")).cast("bigint").alias("sum_unats"),
        F.sum("k").cast("bigint").alias("n_bigrams"),
    )
    corpus = per_doc.agg(
        F.sum("sum_unats").cast("bigint").alias("c_unats"),
        F.sum("n_bigrams").cast("bigint").alias("c_bigrams"),
    )
    flagged = per_doc.crossJoin(F.broadcast(corpus)).select(
        "doc_id",
        (
            F.lit(4) * F.col("sum_unats") * F.col("c_bigrams")
            > F.lit(5) * F.col("c_unats") * F.col("n_bigrams")
        ).alias("is_flagged"),
    )
    docs = t.select("source", "doc_id", F.size("toks").alias("n_tokens")).join(
        flagged, "doc_id", "left"
    )
    return docs.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum(F.when(F.col("is_flagged"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_flagged"),
        F.sum(F.when(F.col("is_flagged").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_unscored"),
        F.expr(
            "CAST(SUM(CASE WHEN is_flagged THEN 1 ELSE 0 END) * 1000000"
            " div COUNT(*) AS BIGINT)"
        ).alias("flagged_ppm"),
        F.sum("n_tokens").cast("bigint").alias("tokens_total"),
        F.sum(F.when(F.col("is_flagged"), F.col("n_tokens")).otherwise(0))
        .cast("bigint")
        .alias("tokens_flagged"),
    )
