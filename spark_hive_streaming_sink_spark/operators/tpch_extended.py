"""Extended TPC-H-shape pipeline queries (Q2/Q4/Q6/Q7/Q8/Q9/Q11/Q12/
Q13/Q14/Q15/Q16/Q17/Q19/Q20/Q21/Q22 analogues — with tpch.py, the full
Q1-Q22 family), adapted to the driver fixture schema
(`FIXTURES.md` — no partsupp table, no ship/commit/receipt-date triple,
so part-supplier facts come from lineitem and "late" is measured as
l_shipdate vs o_orderdate).

These are the remaining canonical multi-join/aggregate/subquery shapes a
user of the reference runs upstream of the sink (`README.md:41-60`
positions the sink at the end of exactly such pipelines); together with
``tpch.py`` they cover the full TPC-H query-shape family expressible on
the fixtures.

Scale posture (100 TB): only nation/region (fixed ≤25 rows by spec)
are statically broadcast. part (200k×SF), supplier (10k×SF) and
customer all grow linearly with scale factor, so they join on their
equi keys with AQE deciding broadcast from actual runtime size — a
static hint would pin a multi-billion-row build side at the design
point; lineitem↔orders stays the only unavoidable fact-fact shuffle,
on its natural equi key; scalar-subquery thresholds are computed as
tiny (single-row / few-row) aggregates whose broadcast is
size-invariant; all money math is exact fixed-point
integers (`_helpers.to_units`) so partial aggregation is
order-independent and stays on the long fast path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
import pyspark.sql.functions as F

from ..io import load_table
from ..registry import register
from ._helpers import revenue_c, sql_revenue_c, sql_sum_revenue, to_units


@register(
    "q2_min_cost_supplier",
    oracle="""
    WITH offers AS (
      SELECT l_partkey, l_suppkey,
             MIN(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)) AS best_cents
      FROM lineitem GROUP BY l_partkey, l_suppkey),
    ranked AS (
      SELECT p_partkey, p_brand, s_name, best_cents,
             ROW_NUMBER() OVER (PARTITION BY p_partkey
                                ORDER BY best_cents, l_suppkey) AS rn
      FROM offers
      JOIN part ON l_partkey = p_partkey
      JOIN supplier ON l_suppkey = s_suppkey
      WHERE p_size <= 10)
    SELECT p_partkey, p_brand, s_name,
           (CAST(best_cents AS DOUBLE) / 100.0) AS best_price
    FROM ranked WHERE rn = 1
    """,
    tags=("relational", "tpch"),
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: cheapest supplier per part (min-cost offer via
    window rank; lineitem stands in for partsupp). The part size
    filter applies BELOW the offers aggregate so the shuffle only
    carries lines of qualifying parts; the aggregate itself is
    partial+final on the (partkey, suppkey) key, and the window rank
    reuses the partkey partitioning."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_size") <= 10)
    s = load_table(spark, sf_dir, "supplier")
    offers = (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("p_partkey", "p_brand", "l_suppkey")
        .agg(F.min(to_units("l_extendedprice", 2)).alias("best_cents"))
    )
    w = Window.partitionBy("p_partkey").orderBy("best_cents", "l_suppkey")
    return (
        offers.join(s, offers.l_suppkey == s.s_suppkey)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "p_partkey",
            "p_brand",
            "s_name",
            (F.col("best_cents").cast("double") / 100.0).alias("best_price"),
        )
    )


@register(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    """,
    tags=("relational", "tpch"),
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: order-priority counts for orders with at least
    one late line (shipped >60 days after order date; the fixture has no
    commit/receipt dates). EXISTS = left-semi join; the date predicate
    prunes the orders scan before the shuffle."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = o.join(
        li,
        (o.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > F.date_add(o.o_orderdate, 60)),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


@register(
    "q6_forecast_revenue",
    oracle="""
    SELECT (CAST(CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)
                       * CAST(ROUND(l_discount * 10000, 0) AS BIGINT)) AS BIGINT)
                 AS DOUBLE) / 1000000.0) AS promo_revenue,
           COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
    tags=("relational", "tpch"),
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure scan-filter-aggregate (the pushdown benchmark —
    all three predicates reach the parquet scan; no shuffle at all
    beyond the final single-row reduce). Revenue = sum(ep * discount)
    as an exact integer product: cents x basis points, summed as longs."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            (
                F.sum(to_units("l_extendedprice", 2) * to_units("l_discount", 4))
                .cast("double")
                / 1000000.0
            ).alias("promo_revenue"),
            F.count("*").alias("n_lines"),
        )
    )


@register(
    "q7_volume_shipping",
    oracle=f"""
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           CAST(EXTRACT(year FROM l_shipdate) AS INT) AS l_year,
           {sql_sum_revenue()} AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    WHERE sn.n_nationkey <> cn.n_nationkey
      AND sn.n_nationkey < 4 AND cn.n_nationkey < 4
    GROUP BY supp_nation, cust_nation, l_year
    """,
    tags=("relational", "tpch"),
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: cross-border shipping volume between nation
    pairs, by ship year. Both nation lookups broadcast (aliased copies);
    the inequality pair predicate applies post-join."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_nationkey") < 4)
    sn = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cn = n.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), s.s_nationkey == F.col("sn_key"))
        .join(F.broadcast(cn), c.c_nationkey == F.col("cn_key"))
        .filter(F.col("sn_key") != F.col("cn_key"))
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg((F.sum(revenue_c()).cast("double") / 100.0).alias("revenue"))
    )


@register(
    "q8_market_share",
    oracle=f"""
    SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
           (CAST(SUM(CASE WHEN p_brand = 'Brand#3'
                          THEN {sql_revenue_c()} ELSE 0 END) AS DOUBLE)
            / CAST(SUM({sql_revenue_c()}) AS DOUBLE)) AS mkt_share
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN part ON l_partkey = p_partkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = (SELECT r_name FROM region ORDER BY r_regionkey LIMIT 1)
    GROUP BY o_year
    """,
    tags=("relational", "tpch"),
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one brand's share of revenue per order year
    within one region's customers. The share is a ratio of two exact
    long sums cast to double — a single IEEE division in both engines.
    Conditional aggregation (CASE inside SUM) replaces the all_nations
    derived table."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    p = load_table(spark, sf_dir, "part")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    first_region = (
        r.orderBy("r_regionkey").limit(1).select("r_regionkey")
    )
    rev = revenue_c()
    brand_rev = F.when(F.col("p_brand") == "Brand#3", rev).otherwise(F.lit(0))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(p, li.l_partkey == p.p_partkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(
            F.broadcast(first_region), n.n_regionkey == first_region.r_regionkey
        )
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (
                F.sum(brand_rev).cast("double") / F.sum(rev).cast("double")
            ).alias("mkt_share")
        )
    )


@register(
    "q9_product_profit",
    oracle="""
    SELECT n_name AS nation,
           CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
           (CAST(CAST(SUM(
              CAST(ROUND(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)
                   * (10000 - CAST(ROUND(l_discount * 10000, 0) AS BIGINT))
                   / 10000.0, 0) AS BIGINT)
              - ((CAST(ROUND(l_quantity * 100, 0) AS BIGINT)
                  * CAST(ROUND(p_retailprice * 100, 0) AS BIGINT)) // 200)
           ) AS BIGINT) AS DOUBLE) / 100.0) AS profit
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN part ON l_partkey = p_partkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%a%'
    GROUP BY n_name, o_year
    """,
    tags=("relational", "tpch"),
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit per supplier nation per year; cost is
    quantity x half retail price (no partsupp supplycost in the
    fixtures). All money math in exact integer cents — the cost term is
    an integer floor-division so partial sums commute."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    s = load_table(spark, sf_dir, "supplier")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%a%"))
    n = load_table(spark, sf_dir, "nation")
    cost_c = F.expr(
        "(CAST(ROUND(l_quantity * 100, 0) AS BIGINT)"
        " * CAST(ROUND(p_retailprice * 100, 0) AS BIGINT)) DIV 200"
    )
    # r13 join order (guide §3.1): the dimension joins run FIRST —
    # part carries the query's only selective filter (p_name LIKE,
    # pushed to the scan), so the broadcast-side joins cut and narrow
    # the fact BEFORE its one big exchange into the orders SMJ.
    # part/supplier stay unhinted so AQE picks broadcast from runtime
    # size (they'd scale at a real 100 TB). Measured dead end on top
    # of this (do not re-try): also PARTIALLY AGGREGATING the profit
    # cents on (l_orderkey, n_name) before the orders join — ~7
    # lineitems per order with near-random suppliers means the keys
    # barely reduce, and the extra exchange + high-cardinality hash
    # aggregate measured 50.8 s at ×100 vs 23.6 for the r12 shape
    # (BASELINE.md).
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year")
        )
        .agg(((F.sum(revenue_c() - cost_c)).cast("double") / 100.0).alias("profit"))
    )


@register(
    "q12_priority_class",
    oracle="""
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY
    GROUP BY l_linestatus
    """,
    tags=("relational", "tpch"),
)
def q12_priority_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: late-shipment counts split by order priority
    class (l_linestatus stands in for l_shipmode; "late" = shipped >90
    days after order date). Conditional-sum aggregation after the
    fact-fact equi join."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(li.l_shipdate > F.date_add(o.o_orderdate, 90))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "q14_promo_revenue",
    oracle=f"""
    SELECT (100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                               THEN {sql_revenue_c()} ELSE 0 END) AS DOUBLE)
            / CAST(SUM({sql_revenue_c()}) AS DOUBLE)) AS promo_pct,
           COUNT(*) AS n_lines
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-07-01 00:00:00'
    """,
    tags=("relational", "tpch"),
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: promo parts' percentage of revenue in a window.
    Ratio of exact long sums; the lineitem side is date-pruned at the
    scan, and the part join shuffles on partkey (AQE broadcasts part
    only when its runtime size allows — it scales with SF)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1998-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-07-01 00:00:00").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part")
    rev = revenue_c()
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0))
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .agg(
            (
                F.lit(100.0)
                * F.sum(promo).cast("double")
                / F.sum(rev).cast("double")
            ).alias("promo_pct"),
            F.count("*").alias("n_lines"),
        )
    )


@register(
    "q15_top_supplier",
    oracle=f"""
    WITH rev AS (
      SELECT l_suppkey AS supplier_no,
             CAST(SUM({sql_revenue_c()}) AS BIGINT) AS total_cents
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name,
           (CAST(total_cents AS DOUBLE) / 100.0) AS total_revenue
    FROM rev JOIN supplier ON supplier_no = s_suppkey
    WHERE total_cents = (SELECT MAX(total_cents) FROM rev)
    """,
    tags=("relational", "tpch"),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: the supplier(s) with maximum quarterly revenue —
    scalar MAX subquery compared on exact integer cents, so ties are
    exact (no float-equality hazard). The revenue CTE is computed once
    and self-compared via a cross-joined 1-row max."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(revenue_c()).alias("total_cents")
    )
    mx = rev.agg(F.max("total_cents").alias("max_cents"))
    s = load_table(spark, sf_dir, "supplier")
    return (
        rev.join(F.broadcast(mx), rev.total_cents == mx.max_cents)
        .join(s, rev.supplier_no == s.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            (F.col("total_cents").cast("double") / 100.0).alias("total_revenue"),
        )
    )


@register(
    "q16_supplier_cnt",
    oracle="""
    SELECT p_brand, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO' AND p_size IN (1, 5, 9, 14, 19, 23)
    GROUP BY p_brand, p_size
    """,
    tags=("relational", "tpch"),
)
def q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct suppliers able to supply each
    (brand, size) bucket, with NOT-predicates on the part dimension
    (lineitem stands in for partsupp). Distinct-agg expands to a
    two-phase aggregate on (brand, size, suppkey)."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 9, 14, 19, 23)
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q17_small_quantity",
    oracle="""
    WITH avgq AS (
      SELECT l_partkey AS ap, COUNT(l_quantity) AS cnt,
             CAST(SUM(CAST(ROUND(l_quantity * 100, 0) AS BIGINT)) AS BIGINT) AS qsum
      FROM lineitem GROUP BY l_partkey)
    SELECT (CAST(CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT))
                 AS BIGINT) AS DOUBLE) / 100.0 / 7.0) AS avg_yearly,
           COUNT(*) AS n_lines
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    JOIN avgq ON l_partkey = ap
    WHERE p_brand = 'Brand#5'
      AND 2 * CAST(ROUND(l_quantity * 100, 0) AS BIGINT) * cnt < qsum
    """,
    tags=("relational", "tpch"),
)
def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: revenue impact of small-quantity orders (quantity
    below half the part's average). The correlated AVG subquery becomes
    a per-part aggregate computed AFTER the brand filter (a part's
    average is unchanged by restricting to that part's own lines), so
    the aggregate is never broadcast — both sides of the partkey join
    shuffle co-partitioned, and the brand predicate prunes lineitem via
    the part join first. The comparison is rearranged to
    pure integers (2 * qty * count < sum) — exact in both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#5")
    li_b5 = li.join(p, li.l_partkey == p.p_partkey)
    avgq = li_b5.groupBy(F.col("l_partkey").alias("ap")).agg(
        F.count("l_quantity").alias("cnt"),
        F.sum(to_units("l_quantity", 2)).alias("qsum"),
    )
    return (
        li_b5.join(avgq, li_b5.l_partkey == F.col("ap"))
        .filter(F.lit(2) * to_units("l_quantity", 2) * F.col("cnt") < F.col("qsum"))
        .agg(
            (
                F.sum(to_units("l_extendedprice", 2)).cast("double") / 100.0 / 7.0
            ).alias("avg_yearly"),
            F.count("*").alias("n_lines"),
        )
    )


@register(
    "q19_disjunctive_filter",
    oracle=f"""
    SELECT {sql_sum_revenue()} AS revenue, COUNT(*) AS n_lines
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity >= 1 AND l_quantity <= 21)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
           AND l_quantity >= 10 AND l_quantity <= 30)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
           AND l_quantity >= 20 AND l_quantity <= 40)
    """,
    tags=("relational", "tpch"),
)
def q19_disjunctive_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: disjunction of conjunctive brand/size/quantity
    predicates spanning both join sides — the classic test that the
    planner keeps the equi-join key extractable from an OR filter."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    q = F.col("l_quantity")
    sz = F.col("p_size")
    cond = (
        ((F.col("p_brand") == "Brand#1") & sz.between(1, 15) & q.between(1, 21))
        | ((F.col("p_brand") == "Brand#2") & sz.between(1, 25) & q.between(10, 30))
        | ((F.col("p_brand") == "Brand#3") & sz.between(1, 35) & q.between(20, 40))
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(
            (F.sum(revenue_c()).cast("double") / 100.0).alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


@register(
    "q22_sales_opportunity",
    oracle="""
    WITH thresh AS (
      SELECT (CAST(CAST(SUM(CAST(ROUND(c_acctbal * 100, 0) AS BIGINT)) AS BIGINT)
                   AS DOUBLE) / COUNT(*)) AS avg_cents
      FROM customer WHERE c_acctbal > 0.0)
    SELECT c_mktsegment, COUNT(*) AS numcust,
           (CAST(CAST(SUM(CAST(ROUND(c_acctbal * 100, 0) AS BIGINT)) AS BIGINT)
                 AS DOUBLE) / 100.0) AS totacctbal
    FROM customer, thresh
    WHERE CAST(ROUND(c_acctbal * 100, 0) AS BIGINT) > avg_cents
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                      AND o_orderpriority = '1-URGENT')
    GROUP BY c_mktsegment
    """,
    tags=("relational", "tpch"),
)
def q22_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: customers with above-average positive balance
    and no urgent orders (c_mktsegment stands in for the phone country
    code; the urgency filter keeps the anti-join result non-trivial at
    every SF). Global-average scalar subquery → broadcast 1-row cross
    join; NOT EXISTS → left-anti join against orders. The threshold
    compare runs on exact integer cents vs one IEEE division, identical
    in both engines."""
    c = load_table(spark, sf_dir, "customer")
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    bal_cents = to_units("c_acctbal", 2)
    thresh = (
        c.filter(F.col("c_acctbal") > 0.0)
        .agg(
            (F.sum(bal_cents).cast("double") / F.count("*")).alias("avg_cents")
        )
    )
    return (
        c.join(F.broadcast(thresh))
        .filter(bal_cents > F.col("avg_cents"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("numcust"),
            (F.sum(bal_cents).cast("double") / 100.0).alias("totacctbal"),
        )
    )


@register(
    "q13_customer_distribution",
    oracle="""
    WITH c_orders AS (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority != '1-URGENT'
      GROUP BY c_custkey)
    SELECT c_count, COUNT(*) AS custdist
    FROM c_orders GROUP BY c_count
    """,
    tags=("relational", "tpch"),
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: distribution of orders-per-customer including the
    zero bucket (left join with the filter INSIDE the join condition —
    pushing it to WHERE would silently drop the zero-order customers,
    the classic Q13 trap; the o_orderpriority predicate stands in for
    the spec's comment-pattern exclusion).

    Scale: customer↔orders equi join (AQE decides the build side),
    two map-combined aggregates; the c_count histogram key space is
    tiny so the second shuffle is negligible."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_orderpriority")
    joined = c.join(
        o,
        (c.c_custkey == o.o_custkey) & (o.o_orderpriority != "1-URGENT"),
        "left",
    )
    c_orders = joined.groupBy("c_custkey").agg(
        F.count("o_orderkey").alias("c_count")
    )
    return c_orders.groupBy("c_count").agg(F.count("*").alias("custdist"))


@register(
    "q11_important_stock",
    oracle="""
    WITH pv AS (
      SELECT l_partkey,
             CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT)
               AS value_cents
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      WHERE s_nationkey < 13
      GROUP BY l_partkey),
    tot AS (SELECT CAST(SUM(value_cents) AS BIGINT) AS total_cents,
                   COUNT(*) AS n_parts FROM pv)
    SELECT l_partkey AS partkey,
           CAST(value_cents AS DOUBLE) / 100.0 AS value
    FROM pv CROSS JOIN tot
    WHERE value_cents * n_parts > total_cents
    """,
    tags=("relational", "tpch"),
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts representing a above-average share
    of one nation-group's total supplied value, with the global
    total as a scalar subquery (lineitem×supplier stands in for
    partsupp — FIXTURES.md has no partsupp table). The significance
    test is the exact integer cross-multiplication
    value·n_parts > total, so no engine ever divides.

    Scale: one fact aggregate on l_partkey, a single-row total
    broadcast back; the HAVING-against-global-total shape is why the
    total must be a broadcast, never a re-aggregation per row."""
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier").filter(F.col("s_nationkey") < 13)
    pv = (
        l.join(s, l.l_suppkey == s.s_suppkey)
        .groupBy("l_partkey")
        .agg(F.sum(to_units("l_extendedprice", 2)).cast("bigint").alias("value_cents"))
    )
    tot = pv.agg(
        F.sum("value_cents").cast("bigint").alias("total_cents"),
        F.count("*").alias("n_parts"),
    )
    return (
        pv.join(F.broadcast(tot))
        .filter(F.col("value_cents") * F.col("n_parts") > F.col("total_cents"))
        .select(
            F.col("l_partkey").alias("partkey"),
            (F.col("value_cents").cast("double") / 100.0).alias("value"),
        )
    )


@register(
    "q20_excess_promo_suppliers",
    oracle="""
    WITH promo AS (
      SELECT p_partkey FROM part WHERE p_type = 'PROMO'),
    sq AS (
      SELECT l_suppkey,
             CAST(SUM(CAST(ROUND(l_quantity * 100, 0) AS BIGINT)) AS BIGINT)
               AS qty_units
      FROM lineitem JOIN promo ON l_partkey = p_partkey
      GROUP BY l_suppkey),
    tot AS (
      SELECT CAST(SUM(qty_units) AS BIGINT) AS total_units,
             COUNT(*) AS n_supp
      FROM sq)
    SELECT s_suppkey, s_name,
           CAST(qty_units AS DOUBLE) / 100.0 AS promo_qty
    FROM sq JOIN supplier ON l_suppkey = s_suppkey
    CROSS JOIN tot
    WHERE qty_units * n_supp > total_units
    """,
    tags=("relational", "tpch"),
)
def q20_excess_promo_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers holding an above-average share
    of promo-part quantity (the spec's excess-stock test re-anchored
    to lineitem facts; promo part semi-join → quantity rollup →
    scalar threshold → supplier name join). The above-average test is
    the exact integer cross-multiplication qty·n > total.

    Scale: the promo part list is a semi-join filter pushed below the
    fact aggregate; the supplier join is AQE-sized; the threshold is a
    single broadcast row."""
    l = load_table(spark, sf_dir, "lineitem")
    promo = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_type") == "PROMO")
        .select("p_partkey")
    )
    s = load_table(spark, sf_dir, "supplier")
    sq = (
        l.join(promo, l.l_partkey == promo.p_partkey, "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum(to_units("l_quantity", 2)).cast("bigint").alias("qty_units"))
    )
    tot = sq.agg(
        F.sum("qty_units").cast("bigint").alias("total_units"),
        F.count("*").alias("n_supp"),
    )
    return (
        sq.join(s, sq.l_suppkey == s.s_suppkey)
        .join(F.broadcast(tot))
        .filter(F.col("qty_units") * F.col("n_supp") > F.col("total_units"))
        .select(
            "s_suppkey",
            "s_name",
            (F.col("qty_units").cast("double") / 100.0).alias("promo_qty"),
        )
    )


@register(
    "q21_waiting_supplier",
    oracle="""
    WITH per_supp AS (
      SELECT l_orderkey, l_suppkey,
             MAX(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                      THEN 1 ELSE 0 END) AS late
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderstatus = 'F'
      GROUP BY l_orderkey, l_suppkey),
    per_order AS (
      SELECT l_orderkey,
             COUNT(*) AS n_supp,
             CAST(SUM(late) AS BIGINT) AS n_late,
             MAX(CASE WHEN late = 1 THEN l_suppkey END) AS late_supp
      FROM per_supp GROUP BY l_orderkey)
    SELECT s_name, COUNT(*) AS numwait
    FROM per_order JOIN supplier ON late_supp = s_suppkey
    WHERE n_supp >= 2 AND n_late = 1
    GROUP BY s_name
    """,
    tags=("relational", "tpch"),
)
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: for finished multi-supplier orders, the one
    supplier who alone shipped late (> 60 days after the order date —
    FIXTURES.md has no commit/receipt dates) — the EXISTS(other
    supplier) AND NOT EXISTS(other late supplier) semantics computed
    as one two-level aggregate instead of two correlated self-joins:
    per (order, supplier) lateness, then per order the supplier count,
    late count, and the single late supplier when there is exactly one.

    Scale: this rewrite turns Q21's three lineitem scans into ONE —
    the fact joins orders on its natural key, aggregates twice, and
    ends in a supplier-sized dim join. n_late = 1 selects MAX(late
    supp) deterministically (it is unique by construction)."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    s = load_table(spark, sf_dir, "supplier")
    per_supp = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.max(
                F.when(
                    F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 60), 1
                ).otherwise(0)
            ).alias("late")
        )
    )
    per_order = per_supp.groupBy("l_orderkey").agg(
        F.count("*").alias("n_supp"),
        F.sum("late").cast("bigint").alias("n_late"),
        F.max(F.when(F.col("late") == 1, F.col("l_suppkey"))).alias("late_supp"),
    )
    return (
        per_order.filter((F.col("n_supp") >= 2) & (F.col("n_late") == 1))
        .join(s, F.col("late_supp") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )
