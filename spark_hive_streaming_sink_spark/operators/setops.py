"""Sort / limit / set operators (SURVEY.md §2C).

LIMIT queries always carry a unique tie-break so the selected SET is
deterministic (the driver compares order-insensitively, but the
membership must match). Set ops use Spark's native INTERSECT/EXCEPT
(+ALL multiset variants).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
import pyspark.sql.functions as F

from ..io import load_table
from ..registry import register


@register(
    "orderby_limit_topk",
    oracle="""
    SELECT o_orderkey, o_totalprice, o_orderpriority
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 25
    """,
    tags=("sort", "limit"),
)
def orderby_limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: Spark executes as per-partition TakeOrdered + merge
    — no global sort materialization."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(25)
        .select("o_orderkey", "o_totalprice", "o_orderpriority")
    )


@register(
    "orderby_nulls_first",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS bal_or_null
    FROM customer
    ORDER BY bal_or_null ASC NULLS FIRST, c_custkey
    LIMIT 40
    """,
    tags=("sort",),
)
def orderby_nulls_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key sort with explicit null placement."""
    c = load_table(spark, sf_dir, "customer")
    bal = F.when(F.col("c_acctbal") < 0, F.lit(None).cast("double")).otherwise(
        F.col("c_acctbal")
    )
    return (
        c.select("c_custkey", bal.alias("bal_or_null"))
        .orderBy(F.col("bal_or_null").asc_nulls_first(), "c_custkey")
        .limit(40)
    )


@register(
    "union_all_counts",
    oracle="""
    SELECT k AS nationkey, COUNT(*) AS n_rows, COUNT(DISTINCT side) AS n_sides
    FROM (SELECT c_nationkey AS k, 'cust' AS side FROM customer
          UNION ALL
          SELECT s_nationkey AS k, 'supp' AS side FROM supplier)
    GROUP BY k
    """,
    tags=("setop",),
)
def union_all_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL (bag semantics) via unionByName."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey"), F.lit("cust").alias("side")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey"), F.lit("supp").alias("side")
    )
    return c.unionByName(s).groupBy("nationkey").agg(
        F.count("*").alias("n_rows"), F.countDistinct("side").alias("n_sides")
    )


@register(
    "union_distinct",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey FROM supplier
    """,
    tags=("setop",),
)
def union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (set semantics) = unionByName + distinct."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.unionByName(s).distinct()


@register(
    "intersect_except",
    oracle="""
    WITH bought AS (SELECT l_partkey AS k FROM lineitem),
         cheap AS (SELECT p_partkey AS k FROM part WHERE p_retailprice < 1200)
    SELECT 'intersect' AS op, k FROM (SELECT k FROM bought INTERSECT SELECT k FROM cheap)
    UNION ALL
    SELECT 'except' AS op, k FROM (SELECT k FROM cheap EXCEPT SELECT k FROM bought)
    """,
    tags=("setop",),
)
def intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT and EXCEPT (set semantics) in one labeled result."""
    bought = load_table(spark, sf_dir, "lineitem").select(F.col("l_partkey").alias("k"))
    cheap = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_retailprice") < 1200)
        .select(F.col("p_partkey").alias("k"))
    )
    inter = bought.intersect(cheap).select(F.lit("intersect").alias("op"), "k")
    exc = cheap.exceptAll(bought.distinct()).distinct().select(F.lit("except").alias("op"), "k")
    return inter.unionByName(exc)


@register(
    "intersect_except_all",
    oracle="""
    WITH a AS (SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'O'),
         b AS (SELECT o_custkey AS k FROM orders WHERE o_orderpriority LIKE '1-%')
    SELECT 'intersect_all' AS op, k, COUNT(*) AS n
    FROM (SELECT k FROM a INTERSECT ALL SELECT k FROM b) GROUP BY k
    UNION ALL
    SELECT 'except_all' AS op, k, COUNT(*) AS n
    FROM (SELECT k FROM a EXCEPT ALL SELECT k FROM b) GROUP BY k
    """,
    tags=("setop",),
)
def intersect_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL / EXCEPT ALL (multiset semantics), counted per key
    to keep the output compact."""
    o = load_table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("k"))
    b = o.filter(F.col("o_orderpriority").like("1-%")).select(F.col("o_custkey").alias("k"))
    ia = (
        a.intersectAll(b)
        .groupBy("k")
        .agg(F.count("*").alias("n"))
        .select(F.lit("intersect_all").alias("op"), "k", "n")
    )
    ea = (
        a.exceptAll(b)
        .groupBy("k")
        .agg(F.count("*").alias("n"))
        .select(F.lit("except_all").alias("op"), "k", "n")
    )
    return ia.unionByName(ea)


@register(
    "distinct_dropdup",
    oracle="""
    SELECT l_returnflag, l_linestatus FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("setop", "dedup"),
)
def distinct_dropdup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT on a projection (dropDuplicates on full row)."""
    return load_table(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus").distinct()


@register(
    "dropdup_keep_first",
    oracle="""
    SELECT o_custkey, o_orderkey AS first_orderkey
    FROM (SELECT o_custkey, o_orderkey,
                 row_number() OVER (PARTITION BY o_custkey
                                    ORDER BY o_orderdate, o_orderkey) AS rn
          FROM orders)
    WHERE rn = 1
    """,
    tags=("setop", "dedup"),
)
def dropdup_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dropDuplicates(subset) with *deterministic* keep-first semantics
    (plain dropDuplicates keeps an arbitrary row — never acceptable in
    a reproducible pipeline; this is the engine's canonical form)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        o.select("o_custkey", "o_orderkey", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") == 1)
        .select("o_custkey", F.col("o_orderkey").alias("first_orderkey"))
    )


@register(
    "not_in_null_semantics",
    oracle="""
    WITH probe AS (
      SELECT c_custkey FROM customer WHERE c_custkey <= 200),
    keys AS (
      SELECT CASE WHEN o_custkey % 50 = 0 THEN NULL ELSE o_custkey END AS k
      FROM orders)
    SELECT
      (SELECT COUNT(*) FROM probe
       WHERE c_custkey NOT IN (SELECT k FROM keys)) AS not_in_count,
      (SELECT COUNT(*) FROM probe p
       WHERE NOT EXISTS (SELECT 1 FROM keys WHERE k = p.c_custkey)) AS not_exists_count
    """,
    tags=("setops", "null-semantics"),
)
def not_in_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The NOT IN null trap, demonstrated and pinned: when the subquery
    produces ANY NULL, three-valued logic makes ``x NOT IN (...)``
    never-true → count 0, while ``NOT EXISTS`` (= left-anti join)
    counts the genuinely absent keys. Engines and engineers regularly
    get this wrong; both engines must agree on BOTH counts. Spark plans
    NOT IN as a null-aware anti join (broadcast-only — the reason
    NOT EXISTS is the scalable formulation)."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 200)
    keys = load_table(spark, sf_dir, "orders").select(
        F.when(F.col("o_custkey") % 50 == 0, None)
        .otherwise(F.col("o_custkey"))
        .alias("k")
    )
    c.createOrReplaceTempView("_nn_probe")
    keys.createOrReplaceTempView("_nn_keys")
    return spark.sql(
        """
        SELECT
          (SELECT COUNT(*) FROM _nn_probe
           WHERE c_custkey NOT IN (SELECT k FROM _nn_keys)) AS not_in_count,
          (SELECT COUNT(*) FROM _nn_probe p
           WHERE NOT EXISTS (SELECT 1 FROM _nn_keys WHERE k = p.c_custkey)) AS not_exists_count
        """
    )
