"""Text-analysis operators for LLM-data pipelines (SURVEY.md §2C
extension): quality scoring, language-ID heuristic, token counting,
document fingerprinting.

All pure built-in string/array functions — JVM-side, codegen'd, no
Python in the hot path; at 100 TB these run as a single scan with
map-side-only work (no shuffle at all except the final stats).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
import pyspark.sql.functions as F

from ..io import load_table, parallelize_scan
from ..registry import register

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is")
_SQL_STOP = ", ".join(f"'{w}'" for w in STOPWORDS)

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
    int/int double divisions (bit-identical cross-engine)."""
    d = load_table(spark, sf_dir, "documents")
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
    canon = F.concat_ws(
        " ", F.array_sort(F.array_distinct(F.split(F.trim(F.lower(F.col("text"))), " ")))
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
    d = load_table(spark, sf_dir, "documents")
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
