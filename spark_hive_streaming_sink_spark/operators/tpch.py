"""Composite TPC-H-style pipeline queries: the multi-join + aggregate +
top-k shapes a user of the reference runs upstream of the sink
(``README.md:41-60`` positions the sink at the end of exactly such
pipelines). These exercise join ordering, broadcast selection, and
aggregate pushdown together rather than operator-by-operator.

Scale posture: ONLY genuinely fixed-size dimensions (region = 5 rows,
nation = 25 rows by TPC-H spec at every SF) are explicitly broadcast.
Everything else — customer (150k×SF), supplier (10k×SF), part
(200k×SF) — grows linearly with scale factor, so those joins shuffle
on their equi keys and AQE converts to broadcast at runtime only when
the actual size is small (as it is at fixture scale); a static
`F.broadcast` hint cannot be demoted by AQE and would OOM executors at
the 100 TB design point. lineitem↔orders stays the only unavoidable
fact-fact shuffle; AQE handles runtime skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
import pyspark.sql.functions as F

from ..io import load_table
from ..registry import register
from ._helpers import revenue_c, sql_sum_revenue, ts_str


@register(
    "q3_shipping_priority",
    oracle=f"""
    SELECT l_orderkey,
           {sql_sum_revenue()} AS revenue,
           strftime(o_orderdate, '%Y-%m-%d') AS order_day,
           o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    tags=("relational", "tpch"),
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: segment filter → 3-way join → revenue agg →
    top-10. Order/lineitem predicates push to their scans; customer
    joins on the equi key (AQE broadcasts it when actually small)."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg((F.sum(revenue_c()).cast("double") / 100.0).alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            ts_str("o_orderdate", "yyyy-MM-dd").alias("order_day"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


@register(
    "q5_local_supplier_volume",
    oracle=f"""
    SELECT n_name AS nation,
           {sql_sum_revenue()} AS revenue,
           COUNT(*) AS n_lines
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    GROUP BY n_name
    """,
    tags=("relational", "tpch"),
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join with the customer-nation = supplier-
    nation locality constraint. Only region/nation (fixed ≤25 rows)
    broadcast; customer and supplier shuffle (both scale with SF, AQE
    upgrades to broadcast from runtime size), as does lineitem↔orders.

    r13 measured dead end (do not re-try): pre-joining orders⋈customer
    to (o_orderkey, c_nationkey) so lineitem shuffles once looked like
    it should drop the fact's second wide exchange, but ×100 measured
    45.1 s vs 14.5 for this order — adjudicated in BASELINE.md."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            s,
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            (F.sum(revenue_c()).cast("double") / 100.0).alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


@register(
    "q10_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name, n_name AS nation,
           {sql_sum_revenue()} AS lost_revenue,
           COUNT(*) AS n_returned_lines
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY lost_revenue DESC, c_custkey
    LIMIT 20
    """,
    tags=("relational", "tpch"),
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: returned-items revenue per customer, top-20.
    The returnflag predicate pushes to the lineitem scan."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", F.col("n_name").alias("nation"))
        .agg(
            (F.sum(revenue_c()).cast("double") / 100.0).alias("lost_revenue"),
            F.count("*").alias("n_returned_lines"),
        )
        .orderBy(F.col("lost_revenue").desc(), "c_custkey")
        .limit(20)
    )


@register(
    "q18_large_volume_customer",
    oracle="""
    WITH big AS (
      SELECT l_orderkey
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(ROUND(l_quantity * 100, 0) AS BIGINT)) > 27000)
    SELECT c_custkey, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS order_day,
           (CAST(CAST(SUM(CAST(ROUND(l_quantity * 100, 0) AS BIGINT)) AS BIGINT)
                 AS DOUBLE) / 100.0) AS total_qty
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE o_orderkey IN (SELECT l_orderkey FROM big)
    GROUP BY c_custkey, o_orderkey, o_orderdate
    """,
    tags=("relational", "tpch"),
)
def q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: semi-join against a HAVING-filtered aggregate
    subquery (orders whose total quantity exceeds a threshold)."""
    li = load_table(spark, sf_dir, "lineitem")
    qty_c = F.round(F.col("l_quantity") * 100, 0).cast("bigint")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(qty_c).alias("qc"))
        .filter(F.col("qc") > 27000)
        .select("l_orderkey")
    )
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        li.join(big.withColumnRenamed("l_orderkey", "big_key"),
                li.l_orderkey == F.col("big_key"), "left_semi")
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "o_orderkey", "o_orderdate")
        .agg((F.sum(qty_c).cast("double") / 100.0).alias("total_qty"))
        .select(
            "c_custkey",
            "o_orderkey",
            ts_str("o_orderdate", "yyyy-MM-dd").alias("order_day"),
            "total_qty",
        )
    )
