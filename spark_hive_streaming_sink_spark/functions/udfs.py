"""UDF / UDAF / UDTF surface (SURVEY.md §2C): every Python-extension
mechanism the engine supports, each demonstrated on fixture data with a
built-in-SQL oracle proving semantic equivalence.

Hierarchy (fastest first): built-in functions → Arrow-batched
pandas_udf / mapInPandas / applyInPandas → row-at-a-time Python UDF
(kept only as the compatibility demonstration; never in a hot path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F
import pandas as pd

from ..io import load_table
from ..registry import register


@register(
    "udf_pandas_scalar",
    oracle="""
    SELECT doc_id,
           length(text) AS chars_builtin,
           length(text) AS chars_pandas_udf,
           upper(substr(source, 1, 3)) AS src_prefix
    FROM documents
    """,
    tags=("udf",),
)
def udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized (Arrow) scalar pandas_udf next to the equivalent
    built-in — identical results, and the query shows both surfaces."""

    @F.pandas_udf("long")
    def py_strlen(s: pd.Series) -> pd.Series:
        # nullable Int64, not int64: NULL text must stay NULL (a plain
        # int64 cast would raise on the NaN that None becomes)
        return s.str.len().astype("Int64")

    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.length("text").cast("long").alias("chars_builtin"),
        py_strlen("text").alias("chars_pandas_udf"),
        F.upper(F.substring("source", 1, 3)).alias("src_prefix"),
    )


@register(
    "udf_grouped_agg",
    oracle="""
    SELECT source,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           COUNT(*) AS n_docs
    FROM documents GROUP BY source
    """,
    tags=("udf", "udaf"),
)
def udf_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom UDAF via GROUPED_AGG pandas_udf (exact integer sum, so
    partial-aggregation merge order cannot change the result)."""

    @F.pandas_udf("long")
    def py_sum(v: pd.Series) -> int:
        return int(v.sum())

    @F.pandas_udf("long")
    def py_count(v: pd.Series) -> int:
        return len(v)

    # NB: GROUPED_AGG pandas UDFs cannot be mixed with JVM aggregates in
    # one agg() — both columns go through the Arrow path.
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy("source").agg(
        py_sum("n_chars").alias("total_chars"), py_count("doc_id").alias("n_docs")
    )


@register(
    "udf_grouped_map",
    oracle="""
    SELECT event_id, event_type,
           row_number() OVER (PARTITION BY event_type ORDER BY ts, event_id) AS seq_in_type
    FROM events
    """,
    tags=("udf", "grouped_map"),
)
def udf_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas: per-group custom Python logic (here a
    deterministic sequence number, so the window-function oracle proves
    the grouping/ordering contract). The pattern for per-group model
    scoring / normalization at scale: one pandas frame per group."""

    def number(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"]).reset_index(drop=True)
        pdf["seq_in_type"] = range(1, len(pdf) + 1)
        return pdf[["event_id", "event_type", "seq_in_type"]]

    e = load_table(spark, sf_dir, "events")
    return e.select("event_id", "event_type", "ts").groupBy("event_type").applyInPandas(
        number, "event_id long, event_type string, seq_in_type long"
    )


@register(
    "udtf_tokenize",
    oracle="""
    SELECT doc_id, tok, length(tok) AS tok_len
    FROM (SELECT doc_id, unnest(string_split(trim(text), ' ')) AS tok
          FROM documents WHERE doc_id < 20)
    """,
    tags=("udf", "udtf"),
)
def udtf_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (table function): one input row → N token rows.
    Registered and invoked through SQL, oracle = UNNEST."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id bigint, tok string, tok_len int")
    class Tokenize:
        def eval(self, doc_id: int, text: str):
            if text is None:  # no tokens — matches unnest(NULL): no rows
                return
            for tok in text.strip().split(" "):
                yield doc_id, tok, len(tok)

    spark.udtf.register("shss_tokenize", Tokenize)
    load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 20).createOrReplaceTempView(
        "_udtf_docs"
    )
    return spark.sql(
        "SELECT t.doc_id, t.tok, t.tok_len "
        "FROM _udtf_docs, LATERAL shss_tokenize(doc_id, text) t"
    )


@register(
    "udf_row_at_a_time",
    oracle="""
    SELECT doc_id,
           CASE WHEN n_chars % 3 = 0 THEN 'fizz'
                WHEN n_chars % 5 = 0 THEN 'buzz'
                ELSE CAST(n_chars AS VARCHAR) END AS tag
    FROM documents
    """,
    tags=("udf",),
)
def udf_row_at_a_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDF — supported for compatibility, ~10-100×
    slower than pandas_udf (per-row pickling); the engine's guidance is
    to never use this in a hot path."""

    @F.udf("string")
    def tag(n: int) -> str:
        if n is None:  # CASE with NULL operand falls through to NULL
            return None
        if n % 3 == 0:
            return "fizz"
        if n % 5 == 0:
            return "buzz"
        return str(n)

    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", tag("n_chars").alias("tag"))
