"""Advanced relational operators: pivot, deterministic sampling,
correlated subqueries, skew-salted joins — the long tail of §2C plus
the sampling ops a training-data pipeline needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
import pyspark.sql.functions as F

from ..io import load_table
from ..registry import register
from ._helpers import sql_dsum, dsum


@register(
    "agg_pivot",
    oracle=f"""
    SELECT l_returnflag,
           {sql_dsum("CASE WHEN l_linestatus = 'F' THEN l_quantity ELSE 0 END", 2)} AS qty_F,
           {sql_dsum("CASE WHEN l_linestatus = 'O' THEN l_quantity ELSE 0 END", 2)} AS qty_O,
           COUNT(*) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("aggregate", "pivot"),
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: rows → columns per category. Spark's pivot with explicit
    value list (never the implicit distinct-scan variant at scale —
    that's an extra job over the fact table)."""
    li = load_table(spark, sf_dir, "lineitem")
    pivoted = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(
            dsum("l_quantity", 2).alias("qty"),
            F.count(F.lit(1)).alias("cnt"),  # count(*) star is invalid inside pivot agg
        )
    )
    return pivoted.select(
        "l_returnflag",
        F.coalesce("F_qty", F.lit(0.0)).alias("qty_F"),
        F.coalesce("O_qty", F.lit(0.0)).alias("qty_O"),
        (F.coalesce("F_cnt", F.lit(0)) + F.coalesce("O_cnt", F.lit(0))).alias("n"),
    )


@register(
    "sample_deterministic",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 2) < '1a'
    """,
    tags=("sample",),
)
def sample_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~10% deterministic hash sample: membership depends only on the
    key (not on partitioning, unlike df.sample) — reproducible across
    runs, re-partitions, and engines; the correct way to carve
    train/val splits in a data pipeline."""
    o = load_table(spark, sf_dir, "orders")
    return o.filter(
        F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 2) < "1a"
    ).select("o_orderkey", "o_totalprice")


@register(
    "sample_stratified",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n_sampled
    FROM (SELECT c_mktsegment,
                 row_number() OVER (PARTITION BY c_mktsegment
                                    ORDER BY md5(CAST(c_custkey AS VARCHAR)), c_custkey) AS rn,
                 COUNT(*) OVER (PARTITION BY c_mktsegment) AS grp_n
          FROM customer)
    WHERE rn * 5 <= grp_n
    GROUP BY c_mktsegment
    """,
    tags=("sample",),
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified 20% sample per segment: hash-ordered row_number caps
    each stratum at ⌊n/5⌋ — exact per-group fractions, deterministic,
    one shuffle."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.md5(F.col("c_custkey").cast("string")), "c_custkey"
    )
    wn = Window.partitionBy("c_mktsegment")
    return (
        c.select(
            "c_mktsegment",
            F.row_number().over(w).alias("rn"),
            F.count("*").over(wn).alias("grp_n"),
        )
        .filter(F.col("rn") * 5 <= F.col("grp_n"))
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_sampled"))
    )


@register(
    "subquery_correlated",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders o
    WHERE o_totalprice > 2 * (SELECT AVG(o2.o_totalprice)
                              FROM orders o2
                              WHERE o2.o_custkey = o.o_custkey)
    """,
    tags=("relational", "subquery"),
)
def subquery_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (orders > 2× their customer's
    average). Catalyst decorrelates this into an aggregate + join —
    no per-row re-execution. Note: the AVG here feeds a strict
    inequality against well-separated values, so cross-engine float
    summation order cannot flip the comparison on this data."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("_sq_orders")
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM _sq_orders o
        WHERE o_totalprice > 2 * (SELECT AVG(o2.o_totalprice)
                                  FROM _sq_orders o2
                                  WHERE o2.o_custkey = o.o_custkey)
        """
    )


@register(
    "join_skew_salted",
    oracle=f"""
    SELECT flag_name, COUNT(*) AS n, {sql_dsum('l_extendedprice', 2)} AS value
    FROM lineitem
    JOIN (VALUES ('A', 'returned'), ('N', 'kept'), ('R', 'refunded'))
         AS dim(flag, flag_name)
      ON l_returnflag = flag
    GROUP BY flag_name
    """,
    tags=("join", "skew"),
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted join for pathologically skewed keys: the fact side's join
    key has 3 distinct values (every row hits one of 3 reducers in a
    plain shuffle join). Salting appends hash(pk) % N to the fact key
    and replicates the dim N× — fan-out restores parallelism while the
    result stays identical to the plain join. (With a broadcastable dim
    you'd just broadcast; salting is the pattern for skewed fact-fact
    joins where AQE's skew split isn't available.)"""
    n_salt = 8
    li = load_table(spark, sf_dir, "lineitem").withColumn(
        "salt", F.pmod(F.hash("l_orderkey"), F.lit(n_salt))
    )
    dim = spark.createDataFrame(
        [("A", "returned"), ("N", "kept"), ("R", "refunded")], "flag string, flag_name string"
    )
    dim_salted = dim.crossJoin(
        spark.range(n_salt).select(F.col("id").cast("int").alias("salt"))
    )
    return (
        li.hint("shuffle_hash")
        .join(
            dim_salted,
            (li.l_returnflag == dim_salted.flag) & (li.salt == dim_salted.salt),
        )
        .groupBy("flag_name")
        .agg(F.count("*").alias("n"), dsum("l_extendedprice", 2).alias("value"))
    )


@register(
    "data_quality_null_profile",
    oracle="""
    WITH l AS (SELECT * FROM lineitem WHERE l_orderkey % 7 = 0)
    SELECT 'l_returnflag' AS col, COUNT(*) - COUNT(l_returnflag) AS n_null,
           COUNT(DISTINCT l_returnflag) AS n_distinct FROM l
    UNION ALL
    SELECT 'l_shipdate', COUNT(*) - COUNT(l_shipdate),
           COUNT(DISTINCT l_shipdate) FROM l
    UNION ALL
    SELECT 'l_quantity', COUNT(*) - COUNT(l_quantity),
           COUNT(DISTINCT CAST(ROUND(l_quantity * 100, 0) AS BIGINT)) FROM l
    UNION ALL
    SELECT 'l_discount', COUNT(*) - COUNT(l_discount),
           COUNT(DISTINCT CAST(ROUND(l_discount * 10000, 0) AS BIGINT)) FROM l
    """,
    tags=("aggregate", "profiling"),
)
def data_quality_null_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiling (the data-quality pass every ingest runs):
    null count + distinct count per column, emitted long-form so the
    profile of a 500-column table is rows, not schema. Doubles are
    profiled on their exact fixed-point encodings so distinct counts
    can't disagree across engines.

    Scale: Spark computes ALL columns' profiles in ONE scan (one
    aggregate with N expression pairs — the oracle's UNION ALL shape
    restates it per column for SQL clarity); at 100 TB add
    approx_count_distinct per column for the same single-pass shape at
    a fraction of the shuffle."""
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 7 == 0)
    prof = l.agg(
        (F.count("*") - F.count("l_returnflag")).alias("null_l_returnflag"),
        F.countDistinct("l_returnflag").alias("nd_l_returnflag"),
        (F.count("*") - F.count("l_shipdate")).alias("null_l_shipdate"),
        F.countDistinct("l_shipdate").alias("nd_l_shipdate"),
        (F.count("*") - F.count("l_quantity")).alias("null_l_quantity"),
        F.countDistinct(
            F.round(F.col("l_quantity") * 100, 0).cast("bigint")
        ).alias("nd_l_quantity"),
        (F.count("*") - F.count("l_discount")).alias("null_l_discount"),
        F.countDistinct(
            F.round(F.col("l_discount") * 10000, 0).cast("bigint")
        ).alias("nd_l_discount"),
    )
    cols = ["l_returnflag", "l_shipdate", "l_quantity", "l_discount"]
    pairs = F.array(
        *[
            F.struct(
                F.lit(c).alias("col"),
                F.col(f"null_{c}").alias("n_null"),
                F.col(f"nd_{c}").alias("n_distinct"),
            )
            for c in cols
        ]
    )
    return prof.select(F.explode(pairs).alias("p")).select(
        "p.col", "p.n_null", "p.n_distinct"
    )


@register(
    "events_funnel_analysis",
    oracle="""
    WITH stages AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
             MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
             MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
      FROM events GROUP BY user_id)
    SELECT COUNT(*) AS n_users,
           COUNT(t_view) AS reached_view,
           COUNT(CASE WHEN t_click > t_view THEN 1 END) AS view_then_click,
           COUNT(CASE WHEN t_purchase > t_click AND t_click > t_view THEN 1 END)
             AS full_funnel
    FROM stages
    """,
    tags=("aggregate", "funnel"),
)
def events_funnel_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel analysis (view → click → purchase): first
    occurrence of each stage per user, stages count only when reached
    in order. The product-analytics staple on event streams — one
    conditional-MIN aggregate per user, then a scalar rollup.

    Scale: one shuffle on user_id (the pre-aggregation is map-
    combined); no self-joins — the naive N-way event self-join
    formulation is the anti-pattern this shape replaces."""
    e = load_table(spark, sf_dir, "events")

    def first_ts(t: str):
        return F.min(F.when(F.col("event_type") == t, F.col("ts")))

    stages = e.groupBy("user_id").agg(
        first_ts("view").alias("t_view"),
        first_ts("click").alias("t_click"),
        first_ts("purchase").alias("t_purchase"),
    )
    return stages.agg(
        F.count("*").alias("n_users"),
        F.count("t_view").alias("reached_view"),
        F.count(
            F.when(F.col("t_click") > F.col("t_view"), F.lit(1))
        ).alias("view_then_click"),
        F.count(
            F.when(
                (F.col("t_purchase") > F.col("t_click"))
                & (F.col("t_click") > F.col("t_view")),
                F.lit(1),
            )
        ).alias("full_funnel"),
    )


@register(
    "market_basket_lift",
    oracle="""
    WITH li AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
      WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL),
    n AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM li),
    item AS (SELECT l_partkey, COUNT(*) AS cnt FROM li GROUP BY l_partkey),
    pair AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
             COUNT(*) AS pair_cnt
      FROM li a JOIN li b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING COUNT(*) >= 2)
    SELECT p.part_a, p.part_b, p.pair_cnt,
           ia.cnt AS cnt_a, ib.cnt AS cnt_b,
           round(CAST(p.pair_cnt AS DOUBLE) / n.n_orders, 6) AS support,
           round(CAST(p.pair_cnt AS DOUBLE) / ia.cnt, 6) AS confidence_ab,
           round(CAST(p.pair_cnt AS DOUBLE) * n.n_orders / ia.cnt / ib.cnt,
                 6) AS lift
    FROM pair p
    JOIN item ia ON p.part_a = ia.l_partkey
    JOIN item ib ON p.part_b = ib.l_partkey
    CROSS JOIN n
    """,
    tags=("aggregate", "join", "recommendation"),
)
def market_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association mining over order line items: for
    every part pair co-purchased in ≥2 orders, support, confidence and
    lift — the A-priori first pass every recommendation pipeline runs.

    Scale: ONE l_orderkey shuffle collects each order's sorted distinct
    basket; pairs enumerate MAP-SIDE from the array, so pair explosion
    is bounded by per-order basket size (≤7 lines in TPC-H —
    O(orders · basket²) total, never O(parts²)) and no self-join ever
    materializes; item counts and the 1-row order count broadcast back
    onto the (already aggregated) pair table. The ``pair_cnt >= 2``
    floor prunes the long singleton tail before the dimension joins.
    Exactness: all counts are integers; support/confidence/lift are
    identical IEEE division chains rounded to 6."""
    # r13: ONE orderkey shuffle builds per-order sorted distinct basket
    # arrays; pairs explode MAP-SIDE from each basket (bounded by
    # basket size — <= C(7,2) = 21 in TPC-H) instead of the r12
    # distinct + co-partitioned self-join, which paid a distinct
    # exchange, two sorted join sides, and a join of the same rows the
    # arrays now enumerate in place (guide §2.3 "aggregate before you
    # shuffle" / §2.4). collect_set dedups (orderkey, partkey) exactly
    # like the old .distinct(); sort_array makes pair order (a < b)
    # and the downstream counts deterministic.
    basket = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey").isNotNull() & F.col("l_partkey").isNotNull())
        .groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("parts"))
    )
    n = basket.agg(F.count("*").alias("n_orders"))
    item = basket.select(F.explode("parts").alias("l_partkey")).groupBy(
        "l_partkey"
    ).agg(F.count("*").alias("cnt"))
    pair_structs = F.flatten(
        F.transform(
            F.col("parts"),
            lambda x, i: F.transform(
                F.slice(
                    F.col("parts"),
                    i + F.lit(2),
                    F.greatest(F.size("parts") - i - 1, F.lit(0)),
                ),
                lambda y: F.struct(x.alias("part_a"), y.alias("part_b")),
            ),
        )
    )
    pair = (
        basket.select(F.explode(pair_structs).alias("p"))
        .groupBy(
            F.col("p.part_a").alias("part_a"), F.col("p.part_b").alias("part_b")
        )
        .agg(F.count("*").alias("pair_cnt"))
        .filter(F.col("pair_cnt") >= 2)
    )
    ia = item.select(F.col("l_partkey").alias("part_a"), F.col("cnt").alias("cnt_a"))
    ib = item.select(F.col("l_partkey").alias("part_b"), F.col("cnt").alias("cnt_b"))
    return (
        pair.join(ia, "part_a")
        .join(ib, "part_b")
        .crossJoin(F.broadcast(n))
        .select(
            "part_a",
            "part_b",
            "pair_cnt",
            "cnt_a",
            "cnt_b",
            F.round(F.col("pair_cnt").cast("double") / F.col("n_orders"), 6).alias(
                "support"
            ),
            F.round(F.col("pair_cnt").cast("double") / F.col("cnt_a"), 6).alias(
                "confidence_ab"
            ),
            F.round(
                F.col("pair_cnt").cast("double")
                * F.col("n_orders")
                / F.col("cnt_a")
                / F.col("cnt_b"),
                6,
            ).alias("lift"),
        )
    )
