"""Array / map / JSON operators (SURVEY.md §2C semi-structured rows).

The reference serializes every row to JSON before writing
(``HiveStreamDataWriter.scala:96-100``); our engine instead treats JSON
as a first-class *column* format via ``from_json`` / ``get_json_object``
and keeps arrays columnar with Spark's higher-order functions (all
JVM-side, codegen'd — no Python in the loop).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from ..io import load_table
from ..registry import register


@register(
    "array_funcs",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(trim(text), ' ') AS toks FROM documents)
    SELECT doc_id,
           len(toks) AS n_tokens,
           list_contains(toks, 'spark') AS has_spark,
           array_to_string(toks[1:3], '|') AS first3,
           array_to_string(list_sort(list_distinct(toks))[1:5], ',') AS uniq5,
           len(list_filter(toks, x -> length(x) > 4)) AS n_long,
           CAST(list_sum(list_transform(toks, x -> length(x))) AS BIGINT) AS total_chars
    FROM t
    """,
    tags=("semistructured", "array"),
)
def array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array surface: split/size/contains/slice/sort/
    distinct/filter/transform/aggregate — all built-in, zero UDFs."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), " ")
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.array_contains(toks, "spark").alias("has_spark"),
        # array_join, NOT concat_ws: concat_ws('' ) on a NULL array
        # yields '' while DuckDB's array_to_string yields NULL;
        # array_join propagates NULL identically
        F.array_join(F.slice(toks, 1, 3), "|").alias("first3"),
        F.array_join(
            F.slice(F.array_sort(F.array_distinct(toks)), 1, 5), ","
        ).alias("uniq5"),
        F.size(F.filter(toks, lambda x: F.length(x) > 4)).alias("n_long"),
        F.aggregate(
            F.transform(toks, lambda x: F.length(x).cast("bigint")),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        ).alias("total_chars"),
    )


@register(
    "explode_wordcount",
    oracle="""
    SELECT tok AS word, COUNT(*) AS cnt, COUNT(DISTINCT doc_id) AS n_docs
    FROM (SELECT doc_id, unnest(string_split(trim(text), ' ')) AS tok FROM documents)
    WHERE length(tok) > 0
    GROUP BY tok
    """,
    tags=("semistructured", "array"),
)
def explode_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode → groupBy word count (the canonical UNNEST pipeline).

    Scale: explode multiplies rows ~150×; the count agg is
    partial+final so the shuffle carries only (word, partial counts) —
    stays bounded by vocabulary size, not corpus size.
    """
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select("doc_id", F.explode(F.split(F.trim(F.col("text")), " ")).alias("word"))
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count("*").alias("cnt"), F.countDistinct("doc_id").alias("n_docs"))
    )


@register(
    "json_funcs",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val,
           json_extract_string(props, '$.missing') AS missing_val,
           array_to_string(json_keys(props), ',') AS keys_csv
    FROM events
    """,
    tags=("semistructured", "json"),
)
def json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON column surface over events.props: get_json_object paths,
    from_json → map, map_keys."""
    e = load_table(spark, sf_dir, "events")
    m = F.from_json(F.col("props"), "map<string,string>")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k_val"),
        F.get_json_object("props", "$.missing").alias("missing_val"),
        # array_join: NULL props -> NULL keys_csv in both engines
        # (concat_ws would emit '' where DuckDB emits NULL)
        F.array_join(F.map_keys(m), ",").alias("keys_csv"),
    )


@register(
    "map_explode_entries",
    oracle="""
    WITH kv AS (
      SELECT event_id, unnest(json_keys(props)) AS mk, props FROM events)
    SELECT mk,
           COUNT(*) AS cnt,
           CAST(SUM(CAST(json_extract_string(props, '$.' || mk) AS INTEGER)) AS BIGINT) AS v_sum,
           MIN(CAST(json_extract_string(props, '$.' || mk) AS INTEGER)) AS v_min,
           MAX(CAST(json_extract_string(props, '$.' || mk) AS INTEGER)) AS v_max
    FROM kv GROUP BY mk
    """,
    tags=("semistructured", "map"),
)
def map_explode_entries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-entry explosion: from_json → map<string,int> → explode into
    (key, value) rows → per-key aggregate. The shuffle carries one row
    per (event, key) but reduces to the distinct-key set — bounded by
    schema vocabulary, not event count (same shape as explode_wordcount).
    Covers map_values/explode(map)/json_tuple surface of §2C."""
    e = load_table(spark, sf_dir, "events")
    m = F.from_json(F.col("props"), "map<string,int>")
    return (
        e.select("event_id", F.explode(m).alias("mk", "mv"))
        .groupBy("mk")
        .agg(
            F.count("*").alias("cnt"),
            F.sum("mv").cast("bigint").alias("v_sum"),
            F.min("mv").alias("v_min"),
            F.max("mv").alias("v_max"),
        )
    )


@register(
    "array_zip_reverse",
    oracle="""
    WITH t AS (SELECT doc_id, ts,
                      string_split(trim(text), ' ') AS toks
               FROM documents JOIN events ON doc_id = event_id)
    SELECT doc_id,
           toks[1] AS first_tok,
           list_reverse(toks)[1] AS last_tok,
           len(toks) AS n_tok,
           strftime(CAST(strftime(ts, '%Y-%m-%d %H:%M:%S') AS TIMESTAMP),
                    '%Y-%m-%d %H:%M:%S') AS ts_roundtrip
    FROM t
    """,
    tags=("semistructured", "array"),
)
def array_zip_reverse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """arrays_zip + reverse + element_at (struct-field extraction from
    a zipped pair), plus a to_timestamp parse round-trip — the §2C
    array/date surface not exercised elsewhere. The doc↔event join is
    only there to put a timestamp and a text in one row; both sides
    prune to two columns before the join (events is a fact stream that
    grows with volume, so no static broadcast — AQE decides)."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    e = load_table(spark, sf_dir, "events").select("event_id", "ts")
    toks = F.split(F.trim(F.col("text")), " ")
    z = F.arrays_zip(toks.alias("t"), F.reverse(toks).alias("r"))
    first = F.element_at(z, 1)
    return (
        d.join(e, d.doc_id == e.event_id)
        .select(
            "doc_id",
            first.getField("t").alias("first_tok"),
            first.getField("r").alias("last_tok"),
            F.size(toks).alias("n_tok"),
            F.date_format(
                F.to_timestamp(
                    F.date_format("ts", "yyyy-MM-dd HH:mm:ss"),
                    "yyyy-MM-dd HH:mm:ss",
                ),
                "yyyy-MM-dd HH:mm:ss",
            ).alias("ts_roundtrip"),
        )
    )


@register(
    "explode_outer_null_preserving",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split(trim(text), ' '), w -> length(w) >= 10) AS longs
      FROM documents)
    SELECT t.doc_id, u.tok, len(t.longs) AS n_long
    FROM t LEFT JOIN LATERAL (SELECT unnest(t.longs) AS tok) u ON TRUE
    """,
    tags=("semistructured", "array"),
)
def explode_outer_null_preserving(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode_outer: documents whose filtered token array is EMPTY
    still produce one (doc_id, NULL) row — plain explode silently drops
    them, the classic lost-rows bug in token pipelines. Oracle emulates
    with LEFT JOIN LATERAL unnest."""
    d = load_table(spark, sf_dir, "documents")
    longs = F.filter(
        F.split(F.trim(F.col("text")), " "), lambda w: F.length(w) >= 10
    )
    return d.select(
        "doc_id", F.explode_outer(longs).alias("tok"), F.size(longs).alias("n_long")
    )


@register(
    "map_transform_funcs",
    oracle="""
    WITH k AS (
      SELECT event_id,
             CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
      FROM events),
    entries AS (
      SELECT event_id,
             unnest([
               {'key': 'BASE',  'val': k + 1},
               {'key': 'TWICE', 'val': 2 * k + 1},
               {'key': 'MOD7',  'val': k % 7 + 1}
             ]) AS e
      FROM k)
    SELECT event_id, e.key AS key, e.val AS value
    FROM entries WHERE e.val % 2 = 0
    """,
    tags=("semistructured", "map"),
)
def map_transform_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map higher-order functions end to end: build a map from the JSON
    props (map_from_arrays), transform_values (+1), transform_keys
    (upper), map_filter (keep even values), then explode the surviving
    entries. The oracle states the resulting relation directly — the
    engine side must push every row through the real map API.

    All JVM codegen'd expressions; a map column at 100 TB behaves like
    a struct-array — no shuffle is introduced by any of these."""
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    m = F.map_from_arrays(
        F.array(F.lit("base"), F.lit("twice"), F.lit("mod7")),
        F.array(k, k * 2, k % 7),
    )
    m2 = F.transform_values(m, lambda _, v: v + 1)
    m3 = F.transform_keys(m2, lambda key, _: F.upper(key))
    mf = F.map_filter(m3, lambda _, v: v % 2 == 0)
    return (
        e.select("event_id", F.explode(mf).alias("key", "value"))
    )


@register(
    "json_variant_extract",
    oracle="""
    WITH j AS (
      SELECT event_id,
             '{"user":{"id":' || CAST(user_id AS VARCHAR)
               || '},"type":"' || event_type
               || '","vals":[' || CAST(event_id % 7 AS VARCHAR)
               || ',' || CAST(event_id % 11 AS VARCHAR) || ']}' AS doc
      FROM events WHERE event_id % 13 = 0)
    SELECT event_id,
           CAST(json_extract(doc, '$.user.id') AS BIGINT) AS uid,
           json_extract_string(doc, '$.type') AS etype,
           CAST(json_extract(doc, '$.vals[1]') AS BIGINT) AS second_val,
           CAST(json_array_length(doc, '$.vals') AS INT) AS n_vals,
           json_extract_string(doc, '$.missing.path') AS missing
    FROM j
    """,
    tags=("semistructured", "json", "variant"),
)
def json_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT surface: a nested JSON document (built in-query
    from event fields so the nesting is deterministic) is parsed ONCE
    to the binary VARIANT encoding with ``parse_json`` and then probed
    with typed ``variant_get`` paths — object fields, array index,
    array cardinality, and a missing path (NULL, not an error). This
    is the Spark-4 answer to the reference's JSON-per-row model
    (HiveStreamDataWriter.scala:96-100): shredded binary JSON that is
    ~10x cheaper to probe repeatedly than re-parsing strings.

    The oracle expresses identical semantics over the JSON text with
    DuckDB's json_extract — engine-neutral by construction.

    Scale: pure map-side projection; the VARIANT parse amortizes all
    five probes (vs five get_json_object re-parses), which is the
    whole point at 100 TB."""
    e = load_table(spark, sf_dir, "events")
    doc = F.concat(
        F.lit('{"user":{"id":'),
        F.col("user_id").cast("string"),
        F.lit('},"type":"'),
        F.col("event_type"),
        F.lit('","vals":['),
        (F.col("event_id") % 7).cast("string"),
        F.lit(","),
        (F.col("event_id") % 11).cast("string"),
        F.lit("]}"),
    )
    j = e.filter(F.col("event_id") % 13 == 0).select(
        "event_id", F.parse_json(doc).alias("v")
    )
    return j.select(
        "event_id",
        F.variant_get("v", "$.user.id", "bigint").alias("uid"),
        F.variant_get("v", "$.type", "string").alias("etype"),
        F.variant_get("v", "$.vals[1]", "bigint").alias("second_val"),
        F.array_size(F.variant_get("v", "$.vals", "array<variant>")).alias("n_vals"),
        F.variant_get("v", "$.missing.path", "string").alias("missing"),
    )


@register(
    "xml_funcs",
    oracle="""
    WITH x AS (
      SELECT event_id,
             '<ev><id>' || CAST(event_id AS VARCHAR)
               || '</id><kind>' || event_type
               || '</kind><user><uid>' || CAST(user_id AS VARCHAR)
               || '</uid></user></ev>' AS doc
      FROM events WHERE event_id % 19 = 0)
    SELECT event_id,
           CAST(regexp_extract(doc, '<id>([0-9]+)</id>', 1) AS BIGINT) AS xml_id,
           regexp_extract(doc, '<kind>([^<]*)</kind>', 1) AS xml_kind,
           CAST(regexp_extract(doc, '<uid>([0-9]+)</uid>', 1) AS BIGINT)
             AS nested_uid,
           CAST(regexp_extract(doc, '<uid>([0-9]+)</uid>', 1) AS BIGINT) % 7
             AS uid_mod
    FROM x
    """,
    tags=("semistructured", "xml"),
)
def xml_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 native XML surface (spark-xml merged in 4.0): an XML
    document built in-query parses ONCE with from_xml into a nested
    struct (including a nested element) and is probed again with the
    xpath_* family — the two ways enterprise feeds (the main place XML
    still lives) enter a pipeline. The oracle states the identical
    extraction with regexes over the same constructed string, so the
    parse semantics are hash-checked.

    Scale: from_xml/xpath are codegen'd map work — pure scan
    projection, no shuffle, no Python."""
    e = load_table(spark, sf_dir, "events")
    doc = F.concat(
        F.lit("<ev><id>"),
        F.col("event_id").cast("string"),
        F.lit("</id><kind>"),
        F.col("event_type"),
        F.lit("</kind><user><uid>"),
        F.col("user_id").cast("string"),
        F.lit("</uid></user></ev>"),
    )
    x = e.filter(F.col("event_id") % 19 == 0).select(
        "event_id", doc.alias("doc")
    )
    parsed = x.select(
        "event_id",
        F.from_xml(
            "doc", "id BIGINT, kind STRING, user STRUCT<uid: BIGINT>"
        ).alias("v"),
        F.xpath_long("doc", F.lit("/ev/user/uid")).alias("uid_xp"),
    )
    return parsed.select(
        "event_id",
        F.col("v.id").alias("xml_id"),
        F.col("v.kind").alias("xml_kind"),
        F.col("v.user.uid").alias("nested_uid"),
        (F.col("uid_xp") % 7).alias("uid_mod"),
    )
