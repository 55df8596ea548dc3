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
        F.concat_ws("|", F.slice(toks, 1, 3)).alias("first3"),
        F.concat_ws(",", F.slice(F.array_sort(F.array_distinct(toks)), 1, 5)).alias("uniq5"),
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
        F.concat_ws(",", F.map_keys(m)).alias("keys_csv"),
    )
