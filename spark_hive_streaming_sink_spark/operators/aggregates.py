"""Aggregation operators (SURVEY.md §2C): basic/distinct/statistical
aggregates, rollup/cube/grouping sets, collect_list/set, approximate
sketches.

Everything is partial+final hash aggregation (map-side combine) —
the shuffle carries one row per (group, partition), so these scale
with group cardinality, not input rows. Statistical aggregates are
derived from exact decimal moments so results are order-independent
(same value no matter how many partitions / what merge order — a
correctness requirement for the oracle and a sanity property at
1000 executors).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
import pyspark.sql.functions as F

from ..io import load_table
from ..registry import register
from ._helpers import davg, dec, dsum, sql_davg, sql_dsum, to_units


@register(
    "agg_basic",
    oracle=f"""
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           COUNT(DISTINCT o_custkey) AS n_customers,
           {sql_dsum('o_totalprice', 2)} AS total_value,
           {sql_davg('o_totalprice', 2)} AS avg_value,
           MIN(o_totalprice) AS min_value,
           MAX(o_totalprice) AS max_value
    FROM orders GROUP BY o_orderpriority
    """,
    tags=("aggregate",),
)
def agg_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """count/sum/avg/min/max + countDistinct per group."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.countDistinct("o_custkey").alias("n_customers"),
        dsum("o_totalprice", 2).alias("total_value"),
        davg("o_totalprice", 2).alias("avg_value"),
        F.min("o_totalprice").alias("min_value"),
        F.max("o_totalprice").alias("max_value"),
    )


@register(
    "agg_distinct",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_suppkey) AS n_supp,
           COUNT(DISTINCT l_partkey) AS n_part,
           CAST(SUM(DISTINCT CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_uniq_qty
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("aggregate",),
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct aggregates (expand + two-phase agg under the hood)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct("l_partkey").alias("n_part"),
        F.sum_distinct(dec("l_quantity", 18, 2)).cast("double").alias("sum_uniq_qty"),
    )


@register(
    "agg_stats",
    oracle="""
    WITH m AS (
      SELECT l_returnflag,
             COUNT(*) AS n,
             CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(l_discount AS DECIMAL(8,4))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(l_discount AS DECIMAL(8,4)) * CAST(l_discount AS DECIMAL(8,4))) AS DOUBLE) AS syy,
             CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(8,4))) AS DOUBLE) AS sxy
      FROM lineitem GROUP BY l_returnflag)
    SELECT l_returnflag, n,
           sqrt((sxx - sx*sx/n) / (n-1)) AS stddev_qty,
           (sxx - sx*sx/n) / (n-1) AS var_qty,
           (sxy - sx*sy/n) / (n-1) AS covar_qty_disc,
           ((sxy - sx*sy/n)/n) / (sqrt((sxx - sx*sx/n)/n) * sqrt((syy - sy*sy/n)/n)) AS corr_qty_disc
    FROM m
    """,
    tags=("aggregate", "stats"),
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """stddev/variance/covariance/correlation from exact decimal
    moments: the merge-order-dependent part (sums) is exact, the final
    formula is one deterministic double computation. This is also the
    numerically *stable-at-scale* formulation: single pass, partial
    aggregation, no Welford merge asymmetry across 1000 executors."""
    li = load_table(spark, sf_dir, "lineitem")
    qd = dec("l_quantity", 12, 2)
    dd = dec("l_discount", 8, 4)
    m = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(qd).cast("double").alias("sx"),
        F.sum(qd * qd).cast("double").alias("sxx"),
        F.sum(dd).cast("double").alias("sy"),
        F.sum(dd * dd).cast("double").alias("syy"),
        F.sum(qd * dd).cast("double").alias("sxy"),
    )
    n, sx, sxx, sy, syy, sxy = (F.col(c) for c in ["n", "sx", "sxx", "sy", "syy", "sxy"])
    return m.select(
        "l_returnflag",
        "n",
        F.sqrt((sxx - sx * sx / n) / (n - 1)).alias("stddev_qty"),
        ((sxx - sx * sx / n) / (n - 1)).alias("var_qty"),
        ((sxy - sx * sy / n) / (n - 1)).alias("covar_qty_disc"),
        (
            ((sxy - sx * sy / n) / n)
            / (F.sqrt((sxx - sx * sx / n) / n) * F.sqrt((syy - sy * sy / n) / n))
        ).alias("corr_qty_disc"),
    )


@register(
    "agg_rollup",
    oracle="""
    SELECT COALESCE(o_orderstatus, 'ALL') AS status,
           COALESCE(o_orderpriority, 'ALL') AS priority,
           COUNT(*) AS n,
           (CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS DOUBLE) / 100.0) AS total
    FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
    tags=("aggregate", "grouping"),
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy: (status, priority) → (status) → ()."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n"), dsum("o_totalprice", 2).alias("total"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n",
            "total",
        )
    )


@register(
    "agg_cube",
    oracle="""
    SELECT COALESCE(l_returnflag, 'ALL') AS rflag,
           COALESCE(l_linestatus, 'ALL') AS lstatus,
           COUNT(*) AS n,
           (CAST(SUM(CAST(ROUND(l_quantity * 100, 0) AS BIGINT)) AS DOUBLE) / 100.0) AS qty
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    tags=("aggregate", "grouping"),
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: all 4 grouping-set combinations."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"), dsum("l_quantity", 2).alias("qty"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("rflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("lstatus"),
            "n",
            "qty",
        )
    )


@register(
    "agg_grouping_sets",
    oracle="""
    SELECT COALESCE(o_orderstatus, 'ALL') AS status,
           COALESCE(o_orderpriority, 'ALL') AS priority,
           COUNT(*) AS n
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
    tags=("aggregate", "grouping"),
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS via Spark SQL."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("_gs_orders")
    return spark.sql(
        """
        SELECT COALESCE(o_orderstatus, 'ALL') AS status,
               COALESCE(o_orderpriority, 'ALL') AS priority,
               COUNT(*) AS n
        FROM _gs_orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@register(
    "agg_collect",
    oracle="""
    SELECT l_returnflag,
           array_to_string(list_sort(list(DISTINCT l_linestatus)), ',') AS statuses,
           array_to_string(list_sort(list(DISTINCT CAST(CAST(l_quantity AS DECIMAL(12,2)) AS VARCHAR))), ',') AS uniq_qtys,
           COUNT(*) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("aggregate", "collect"),
)
def agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_set / collect_list — emitted as sorted joined strings
    (engines stringify arrays differently; determinism rule)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.concat_ws(",", F.array_sort(F.collect_set("l_linestatus"))).alias("statuses"),
        F.concat_ws(
            ",", F.array_sort(F.collect_set(dec("l_quantity", 12, 2).cast("string")))
        ).alias("uniq_qtys"),
        F.count("*").alias("n"),
    )


@register(
    "agg_percentile",
    oracle="""
    SELECT l_linestatus,
           round(quantile_cont(l_quantity, 0.5), 4) AS median_qty,
           round(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price,
           round(quantile_cont(l_quantity, 0.25), 4) AS p25_qty
    FROM lineitem GROUP BY l_linestatus
    """,
    tags=("aggregate", "percentile"),
)
def agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (linear interpolation — same definition as
    DuckDB's quantile_cont); rounded in both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_linestatus").agg(
        F.round(F.expr("percentile(l_quantity, 0.5)"), 4).alias("median_qty"),
        F.round(F.expr("percentile(l_extendedprice, 0.9)"), 4).alias("p90_price"),
        F.round(F.expr("percentile(l_quantity, 0.25)"), 4).alias("p25_qty"),
    )


@register(
    "agg_approx",
    # r14 (VERDICT item 7): the raw sketch estimates are engine-specific
    # and rode through every round on a rows-only check; the emitted
    # columns are now the DETERMINISTIC error-envelope verdicts (the
    # agg_approx_error_bounds pattern), which DuckDB pins to TRUE — a
    # sketch regression breaks the hash instead of passing unchecked.
    # Tolerances mirror the long-green local pytest
    # (test_approx_sketches_within_error_bounds): 10% for default-rsd
    # HLL (rsd=0.05, 2σ), 5% for rsd=0.01, 2% for the 10k-accuracy
    # median.
    oracle="""
    SELECT l_returnflag,
           TRUE AS parts_within_10pct,
           TRUE AS supps_within_5pct,
           TRUE AS median_within_2pct,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("aggregate", "approx"),
)
def agg_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate aggregates — the 100 TB workhorses: HLL++ count
    distinct and quantile sketches aggregate in O(1) memory per group
    where exact DISTINCT would shuffle every key. Emitted per group:
    the exact row count plus the sketch-vs-exact error-envelope
    verdicts (the exact references are recomputed in the same
    aggregation), so the driver hash certifies the sketches stay
    within their configured accuracy."""
    li = load_table(spark, sf_dir, "lineitem")
    g = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey").alias("ap"),
        F.approx_count_distinct("l_suppkey", rsd=0.01).alias("asup"),
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("amed"),
        F.countDistinct("l_partkey").alias("ep"),
        F.countDistinct("l_suppkey").alias("es"),
        F.expr("percentile(l_extendedprice, 0.5)").alias("emed"),
        F.count("*").alias("n"),
    )

    def within(approx: str, exact: str, tol: float) -> Column:
        return F.abs(F.col(approx).cast("double") / F.col(exact) - 1.0) < tol

    return g.select(
        "l_returnflag",
        within("ap", "ep", 0.10).alias("parts_within_10pct"),
        within("asup", "es", 0.05).alias("supps_within_5pct"),
        within("amed", "emed", 0.02).alias("median_within_2pct"),
        "n",
    )


@register(
    "agg_stats_native",
    oracle="""
    SELECT l_returnflag,
           round(stddev_samp(l_quantity), 4) AS sd_qty,
           round(var_samp(l_quantity), 4) AS var_qty,
           round(stddev_pop(l_quantity), 4) AS sd_pop_qty,
           round(covar_samp(l_quantity, l_discount), 6) AS covar_qd,
           round(corr(l_quantity, l_discount), 6) AS corr_qd
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("aggregate", "stats"),
)
def agg_stats_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The native statistical aggregate functions (stddev/var/covar/
    corr), rounded in both engines — the API-parity companion to
    agg_stats' exact-moment formulation (which is the bit-identical
    one; native single-pass implementations agree to ~1e-10)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 4).alias("sd_qty"),
        F.round(F.var_samp("l_quantity"), 4).alias("var_qty"),
        F.round(F.stddev_pop("l_quantity"), 4).alias("sd_pop_qty"),
        F.round(F.covar_samp("l_quantity", "l_discount"), 6).alias("covar_qd"),
        F.round(F.corr("l_quantity", "l_discount"), 6).alias("corr_qd"),
    )


@register(
    "agg_boolean_bitwise",
    oracle="""
    SELECT o_orderstatus,
           bool_and(o_totalprice > 1000)  AS all_over_1k,
           bool_or(o_totalprice > 400000) AS any_over_400k,
           bit_or(CAST(o_orderkey % 256 AS BIGINT))  AS key_bits_or,
           bit_and(CAST(o_orderkey % 256 AS BIGINT)) AS key_bits_and,
           COUNT(*) AS n
    FROM orders
    GROUP BY o_orderstatus
    """,
    tags=("aggregate", "boolean"),
)
def agg_boolean_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean (every/any) and bitwise (bit_or/bit_and) aggregates —
    both are single-pass partial+final aggregations, the cheapest
    reduction shapes there are."""
    o = load_table(spark, sf_dir, "orders")
    kb = (F.col("o_orderkey") % 256).cast("bigint")
    return o.groupBy("o_orderstatus").agg(
        F.every(F.col("o_totalprice") > 1000).alias("all_over_1k"),
        F.some(F.col("o_totalprice") > 400000).alias("any_over_400k"),
        F.bit_or(kb).alias("key_bits_or"),
        F.bit_and(kb).alias("key_bits_and"),
        F.count("*").alias("n"),
    )


@register(
    "agg_histogram_bucket",
    oracle="""
    SELECT CASE WHEN o_totalprice < 0 THEN 0
                WHEN o_totalprice >= 500000 THEN 11
                ELSE CAST(FLOOR(o_totalprice / 50000.0) AS BIGINT) + 1 END AS bucket,
           COUNT(*) AS n,
           MIN(o_totalprice) AS lo,
           MAX(o_totalprice) AS hi
    FROM orders
    GROUP BY 1
    """,
    tags=("aggregate", "histogram"),
)
def agg_histogram_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram via width_bucket (10 buckets over
    [0, 500k) + under/overflow buckets 0 and 11) — the single-shuffle
    histogram shape; the oracle replicates width_bucket's arithmetic
    exactly (the 50000.0 width divides the range evenly, so both
    engines' double divisions round identically)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.width_bucket(
                F.col("o_totalprice"), F.lit(0.0), F.lit(500000.0), F.lit(10)
            ).alias("bucket")
        )
        .agg(
            F.count("*").alias("n"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
        )
    )


@register(
    "unpivot_melt",
    oracle="""
    WITH wide AS (
      SELECT l_returnflag,
             CAST(CAST(SUM(CAST(ROUND(l_quantity * 100, 0) AS BIGINT)) AS BIGINT)
                  AS DOUBLE) / 100.0 AS sum_qty,
             CAST(CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT)
                  AS DOUBLE) / 100.0 AS sum_price,
             CAST(CAST(SUM(CAST(ROUND(l_discount * 10000, 0) AS BIGINT)) AS BIGINT)
                  AS DOUBLE) / 10000.0 AS sum_disc
      FROM lineitem GROUP BY l_returnflag)
    SELECT l_returnflag, metric, value
    FROM wide UNPIVOT (value FOR metric IN (sum_qty, sum_price, sum_disc))
    """,
    tags=("aggregate", "unpivot"),
)
def unpivot_melt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT / melt (wide → long): per-flag exact sums unpivoted to
    (flag, metric, value) rows — the inverse of agg_pivot. Map-side
    row expansion, no extra shuffle beyond the aggregate."""
    from ._helpers import dsum

    li = load_table(spark, sf_dir, "lineitem")
    wide = li.groupBy("l_returnflag").agg(
        dsum("l_quantity", 2).alias("sum_qty"),
        dsum("l_extendedprice", 2).alias("sum_price"),
        dsum("l_discount", 4).alias("sum_disc"),
    )
    return wide.unpivot(
        ["l_returnflag"], ["sum_qty", "sum_price", "sum_disc"], "metric", "value"
    )


@register(
    "agg_hll_mergeable_sketch",
    # r14 (VERDICT item 7): sketch bytes/estimates are engine-specific,
    # so the emitted column is the DETERMINISTIC error-envelope verdict
    # per group AND for the merged (union) sketch — DuckDB pins it to
    # TRUE; estimate drift past the envelope breaks the hash. 5% is
    # ~3σ for the default lgConfigK=12 Datasketches HLL (rsd ≈ 1.6%),
    # the tolerance the long-green local pytest used.
    oracle="""
    SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n_rows,
           TRUE AS customers_within_5pct
    FROM orders GROUP BY o_orderstatus
    UNION ALL
    SELECT 'ALL', CAST(COUNT(*) AS BIGINT), TRUE FROM orders
    """,
    tags=("aggregate", "approx", "sketch"),
)
def agg_hll_mergeable_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable HLL sketches (Datasketches, Spark 3.5+): build one
    sketch per order-status group, then UNION the group sketches into a
    global estimate — the re-aggregation workflow exact COUNT(DISTINCT)
    cannot do without a full re-shuffle. At 100 TB this is how
    per-partition/per-day cardinalities roll up to monthly/global ones:
    persist bytes, merge later, never touch raw keys again. Emitted:
    per-group and merged-global row counts plus the sketch-vs-exact
    error-envelope verdict, so the driver hash certifies both the
    group sketches and the union merge."""
    o = load_table(spark, sf_dir, "orders")
    per_group = o.groupBy("o_orderstatus").agg(
        F.hll_sketch_agg("o_custkey").alias("sk"),
        F.count("*").alias("n_rows"),
        F.countDistinct("o_custkey").alias("exact"),
    )
    ok = (
        F.abs(
            F.hll_sketch_estimate(F.col("sk")).cast("double")
            / F.col("exact")
            - 1.0
        )
        < 0.05
    )
    per_group_est = per_group.select(
        "o_orderstatus", "n_rows", ok.alias("customers_within_5pct")
    )
    g_exact = o.agg(F.countDistinct("o_custkey").alias("gexact"))
    merged = (
        per_group.agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"),
            F.sum("n_rows").alias("n_rows"),
        )
        .crossJoin(F.broadcast(g_exact))
        .select(
            F.lit("ALL").alias("o_orderstatus"),
            F.col("n_rows").cast("bigint").alias("n_rows"),
            (
                F.abs(F.col("est").cast("double") / F.col("gexact") - 1.0)
                < 0.05
            ).alias("customers_within_5pct"),
        )
    )
    return per_group_est.unionByName(merged)


@register(
    "agg_approx_error_bounds",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS exact_parts,
           COUNT(DISTINCT l_suppkey) AS exact_supps,
           TRUE AS parts_within_5pct,
           TRUE AS supps_within_3pct,
           TRUE AS median_within_2pct
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_returnflag
    """,
    tags=("aggregate", "approx"),
)
def agg_approx_error_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-checkable companion to ``agg_approx``: sketch estimates
    can't hash-match across engines, but their ERROR BOUNDS can — the
    exact aggregates are recomputed in both engines and the
    within-bound checks are emitted as boolean columns the oracle pins
    to TRUE. A sketch regression (worse than its configured rsd) now
    fails the hard driver gate instead of only a local pytest. The
    date slice keeps the exact-percentile reference cheap at oracle
    scale without changing what is being certified."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") >= F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    g = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("exact_parts"),
        F.countDistinct("l_suppkey").alias("exact_supps"),
        F.approx_count_distinct("l_partkey").alias("ap"),
        F.approx_count_distinct("l_suppkey", rsd=0.01).alias("asup"),
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("amed"),
        F.expr("percentile(l_extendedprice, 0.5)").alias("emed"),
    )
    def within(approx, exact, tol):
        return (
            F.abs(F.col(approx).cast("double") / F.col(exact) - 1.0) < tol
        )
    return g.select(
        "l_returnflag",
        "exact_parts",
        "exact_supps",
        within("ap", "exact_parts", 0.05).alias("parts_within_5pct"),
        within("asup", "exact_supps", 0.03).alias("supps_within_3pct"),
        within("amed", "emed", 0.02).alias("median_within_2pct"),
    )


@register(
    "agg_hll_union_error_bound",
    oracle="""
    SELECT COUNT(DISTINCT o_custkey) AS exact_customers,
           COUNT(DISTINCT o_orderstatus) AS n_groups,
           TRUE AS merged_within_5pct
    FROM orders
    """,
    tags=("aggregate", "approx", "sketch"),
)
def agg_hll_union_error_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-checkable companion to ``agg_hll_mergeable_sketch``: the
    per-group sketches are UNIONed into a global estimate, and the
    merge path's error vs the exact global distinct is pinned as a
    boolean — certifying the re-aggregation workflow (sketch → persist
    → merge later) stays within HLL's error envelope."""
    o = load_table(spark, sf_dir, "orders")
    per_group = o.groupBy("o_orderstatus").agg(F.hll_sketch_agg("o_custkey").alias("sk"))
    merged = per_group.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("merged_est"),
        F.count("*").alias("n_groups"),
    )
    exact = o.agg(F.countDistinct("o_custkey").alias("exact_customers"))
    return exact.crossJoin(F.broadcast(merged)).select(
        "exact_customers",
        "n_groups",
        (
            F.abs(F.col("merged_est").cast("double") / F.col("exact_customers") - 1.0)
            < 0.05
        ).alias("merged_within_5pct"),
    )


@register(
    "agg_filter_clause",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) FILTER (WHERE l_quantity > 25) AS n_bulk,
           COUNT(*) FILTER (WHERE l_discount = 0.0) AS n_undiscounted,
           CAST(CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT))
                     FILTER (WHERE l_quantity > 25) AS BIGINT) AS DOUBLE) / 100.0
             AS bulk_revenue,
           COUNT(*) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("aggregate", "filter-clause"),
)
def agg_filter_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation via the SQL FILTER clause / count_if —
    one pass computing several differently-filtered aggregates (the
    alternative is N scans or N CASE WHEN wrappers). Identical
    partial+final hash-agg shape as plain aggregates."""
    li = load_table(spark, sf_dir, "lineitem")
    bulk = F.col("l_quantity") > 25
    return li.groupBy("l_returnflag").agg(
        F.count_if(bulk).alias("n_bulk"),
        F.count_if(F.col("l_discount") == 0.0).alias("n_undiscounted"),
        (
            F.sum(F.when(bulk, to_units("l_extendedprice", 2)).otherwise(F.lit(None)))
            .cast("double")
            / 100.0
        ).alias("bulk_revenue"),
        F.count("*").alias("n"),
    )


@register(
    "table_fingerprint",
    oracle="""
    WITH h AS (
      SELECT CAST(('0x' || substr(md5(
               concat_ws('|', CAST(o_orderkey AS VARCHAR), CAST(o_custkey AS VARCHAR),
                         o_orderstatus,
                         CAST(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS VARCHAR),
                         strftime(o_orderdate, '%Y-%m-%d %H:%M:%S'), o_orderpriority)
             ), 1, 15)) AS BIGINT) AS rh
      FROM orders)
    SELECT COUNT(*) AS n_rows,
           bit_xor(rh) AS xor_fingerprint,
           CAST(SUM(rh % 1000000000) AS BIGINT) AS sum_fingerprint
    FROM h
    """,
    tags=("aggregate", "fingerprint"),
)
def table_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-independent table fingerprint: canonicalize each row to a
    string (exact integers for money, formatted timestamps — the same
    canon both engines can produce), hash to a 60-bit integer, reduce
    with XOR and a modular sum. Both reductions commute, so the
    fingerprint is partitioning-invariant — the O(1)-state way to
    compare a 100 TB table across engines/replicas/ingest runs without
    sorting or shuffling anything but one number per partition. XOR
    alone is blind to duplicated row pairs; the modular sum + count
    close that hole."""
    o = load_table(spark, sf_dir, "orders")
    canon = F.concat_ws(
        "|",
        F.col("o_orderkey").cast("string"),
        F.col("o_custkey").cast("string"),
        F.col("o_orderstatus"),
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").cast("string"),
        F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss"),
        F.col("o_orderpriority"),
    )
    rh = F.conv(F.substring(F.md5(canon), 1, 15), 16, 10).cast("bigint")
    return o.select(rh.alias("rh")).agg(
        F.count("*").alias("n_rows"),
        F.bit_xor("rh").alias("xor_fingerprint"),
        F.sum(F.col("rh") % 1000000000).cast("bigint").alias("sum_fingerprint"),
    )


@register(
    "agg_winsorize_clamp",
    oracle="""
    WITH bounds AS (
      SELECT l_returnflag AS bf,
             round(quantile_cont(l_extendedprice, 0.05), 4) AS p05,
             round(quantile_cont(l_extendedprice, 0.95), 4) AS p95
      FROM lineitem GROUP BY l_returnflag)
    SELECT l_returnflag,
           COUNT(*) AS n,
           CAST(COUNT(*) FILTER (WHERE l_extendedprice < p05) AS BIGINT) AS n_low,
           CAST(COUNT(*) FILTER (WHERE l_extendedprice > p95) AS BIGINT) AS n_high,
           CAST(CAST(SUM(CAST(ROUND(
               least(greatest(l_extendedprice, p05), p95) * 100, 0) AS BIGINT))
             AS BIGINT) AS DOUBLE) / 100.0 AS winsorized_sum
    FROM lineitem JOIN bounds ON l_returnflag = bf
    GROUP BY l_returnflag
    """,
    tags=("aggregate", "percentile", "winsorize"),
)
def agg_winsorize_clamp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorization: per-group p05/p95 bounds (exact interpolated
    percentiles, computed once on a tiny aggregate), broadcast back and
    clamped — the robust-statistics preprocessing step every
    quality-score pipeline needs before averaging heavy-tailed columns.
    The clamped sum is exact fixed-point; the bounds are rounded to 4
    decimals in both engines before the clamp so the comparison is
    deterministic."""
    li = load_table(spark, sf_dir, "lineitem")
    bounds = li.groupBy(F.col("l_returnflag").alias("bf")).agg(
        F.round(F.percentile("l_extendedprice", F.lit(0.05)), 4).alias("p05"),
        F.round(F.percentile("l_extendedprice", F.lit(0.95)), 4).alias("p95"),
    )
    ep = F.col("l_extendedprice")
    clamped = F.least(F.greatest(ep, F.col("p05")), F.col("p95"))
    return (
        li.join(F.broadcast(bounds), li.l_returnflag == F.col("bf"))
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n"),
            F.count_if(ep < F.col("p05")).alias("n_low"),
            F.count_if(ep > F.col("p95")).alias("n_high"),
            (
                F.sum(F.round(clamped * 100, 0).cast("bigint")).cast("double") / 100.0
            ).alias("winsorized_sum"),
        )
    )


@register(
    "agg_mode_deterministic",
    oracle="""
    WITH c AS (
      SELECT l_returnflag, l_quantity, COUNT(*) AS n
      FROM lineitem GROUP BY l_returnflag, l_quantity)
    SELECT l_returnflag,
           l_quantity AS modal_qty,
           n AS modal_count
    FROM (SELECT *, row_number() OVER (PARTITION BY l_returnflag
                                       ORDER BY n DESC, l_quantity) AS rn
          FROM c)
    WHERE rn = 1
    """,
    tags=("aggregate", "mode"),
)
def agg_mode_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic mode: most frequent value per group with an
    explicit tie-break (smallest value wins). Built-in mode() is
    non-deterministic on ties in BOTH engines, so cross-engine
    pipelines must spell out the count + row_number construction —
    two keyed aggregations, no sort of the raw data."""
    li = load_table(spark, sf_dir, "lineitem")
    c = li.groupBy("l_returnflag", "l_quantity").agg(F.count("*").alias("n"))
    from pyspark.sql import Window

    w = Window.partitionBy("l_returnflag").orderBy(F.col("n").desc(), "l_quantity")
    return (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "l_returnflag",
            F.col("l_quantity").alias("modal_qty"),
            F.col("n").alias("modal_count"),
        )
    )


@register(
    "agg_listagg_ordered",
    oracle="""
    SELECT o_orderpriority,
           string_agg(CAST(o_custkey AS VARCHAR), ','
                      ORDER BY o_custkey, o_orderkey) AS custkeys,
           COUNT(*) AS n
    FROM orders
    WHERE o_orderkey % 200 = 0
    GROUP BY o_orderpriority
    """,
    tags=("aggregate",),
)
def agg_listagg_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LISTAGG ... WITHIN GROUP (ORDER BY ...) — the SQL:2016 ordered
    string aggregation (Spark 4.0+). The explicit ORDER BY inside the
    aggregate is what makes the result deterministic; without it both
    engines would concatenate in partition-arrival order.

    Scale: the subsample predicate keeps group payloads bounded —
    unbounded LISTAGG over a fact table is an anti-pattern (one group's
    string must fit in memory); cap or bucket first."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 200 == 0)
    return o.groupBy("o_orderpriority").agg(
        F.expr(
            "listagg(cast(o_custkey as string), ',')"
            " within group (order by o_custkey, o_orderkey)"
        ).alias("custkeys"),
        F.count("*").alias("n"),
    )


@register(
    "agg_grouping_id_rollup",
    oracle="""
    SELECT COALESCE(o_orderstatus, '<all>') AS status,
           COALESCE(o_orderpriority, '<all>') AS priority,
           GROUPING(o_orderstatus) + 2 * GROUPING(o_orderpriority) AS gid,
           COUNT(*) AS n
    FROM orders
    GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
    """,
    tags=("aggregate",),
)
def agg_grouping_id_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING()/grouping-id over ROLLUP: the bit vector that tells a
    subtotal row apart from a genuine NULL group — without it, rollup
    outputs are ambiguous the moment a grouping column is nullable.
    (Spark's grouping_id() bit order is implementation-defined, so the
    portable form — used here in BOTH engines — composes GROUPING()
    bits explicitly.)"""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            (
                F.grouping("o_orderstatus") + F.grouping("o_orderpriority") * 2
            ).alias("gid"),
            F.count("*").alias("n"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("<all>")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("<all>")).alias("priority"),
            "gid",
            "n",
        )
    )


N_DEPTH_BUCKETS = 8


@register(
    "agg_histogram_equidepth",
    oracle=f"""
    WITH ranked AS (
      SELECT l_extendedprice AS v,
             row_number() OVER (ORDER BY l_extendedprice, l_orderkey,
                                l_linenumber) AS rk,
             COUNT(*) OVER () AS n
      FROM lineitem)
    SELECT CAST((rk - 1) * {N_DEPTH_BUCKETS} // n AS BIGINT) AS bucket,
           COUNT(*) AS cnt,
           MIN(v) AS lo,
           MAX(v) AS hi
    FROM ranked GROUP BY 1
    """,
    tags=("aggregate", "histogram"),
)
def agg_histogram_equidepth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact equi-depth (equal-frequency) histogram of l_extendedprice —
    the boundary source for range-bucketed layouts and skew-aware
    partitioning, where equi-WIDTH buckets (agg_histogram_bucket) are
    useless on heavy-tailed values.

    Scale: exact WITHOUT ranking rows at all (r13). Every output cell
    is a pure function of the (v, count) VALUE HISTOGRAM — per-bucket
    counts are rank-interval overlaps, lo/hi are order statistics of v
    alone; the (v, l_orderkey, l_linenumber) tie-break only decides
    which equal-valued ROW carries a rank, which no output depends on.
    One map-combined groupBy(v) collapses the corpus to its distinct
    values; the exact global rank intervals then come from the same
    distributed machinery as before (range repartition + per-partition
    cumulative counts + a K-row offsets relation that cumulates in one
    tiny window and broadcasts back — never a single-partition sort of
    anything corpus-sized). Bucket id stays floor((rank-1)·B/N) in pure
    integer math — identical in both engines (the oracle's global
    window is fine at DuckDB's scale)."""
    from pyspark.sql import Window

    # r13 rewrite — rank arithmetic on the VALUE HISTOGRAM, not the
    # rows (guide §2.3 "aggregate before you shuffle"): every output
    # cell is a pure function of the (v, count) histogram — per-bucket
    # counts are rank-interval overlaps and lo/hi are order statistics
    # of v alone, both independent of how the window's (v, l_orderkey,
    # l_linenumber) tie-break distributes EQUAL values across ranks
    # (verified exhaustively against the rank definition in
    # tests/test_plans.py's oracle + a 20k-case simulation). So: one
    # map-combined groupBy(v) collapses the corpus to its distinct
    # values (the r12 form range-exchanged every ROW with two tie-break
    # columns and ranked 60M rows through a window at ×100), and the
    # SAME distributed-rank machinery (range repartition + per-
    # partition cumsum + K-row offsets — never a single-partition sort)
    # now runs over the histogram only.
    hist = (
        load_table(spark, sf_dir, "lineitem")
        .select(F.col("l_extendedprice").alias("v"))
        .groupBy("v")
        .agg(F.count("*").alias("c"))
    )
    parts = hist.repartitionByRange(F.col("v")).withColumn(
        "pid", F.spark_partition_id()
    )
    wp = Window.partitionBy("pid").orderBy("v")
    local = parts.withColumn(
        "lcum", F.coalesce(F.sum("c").over(wp.rowsBetween(Window.unboundedPreceding, -1)), F.lit(0))
    )
    pc = parts.groupBy("pid").agg(F.sum("c").alias("pn"))
    wo = Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = pc.select(
        "pid",
        F.coalesce(F.sum("pn").over(wo), F.lit(0)).alias("offset"),
        F.sum("pn").over(
            Window.orderBy("pid").rangeBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("n"),
    )
    # each distinct v covers global ranks [start, end]; bucket b covers
    # ranks [ceil(b*n/B)+1, floor(((b+1)*n-1)/B)+1] (exact integer
    # rearrangement of the oracle's (rk-1)*B // n == b); the overlap of
    # those intervals is that value's contribution to the bucket
    ranked = local.join(F.broadcast(offsets), "pid").select(
        "v",
        "c",
        (F.col("offset") + F.col("lcum") + 1).alias("start"),
        (F.col("offset") + F.col("lcum") + F.col("c")).alias("end"),
        "n",
    )
    spans = ranked.select(
        "v",
        "start",
        "end",
        "n",
        F.explode(
            F.sequence(
                F.expr(f"(start - 1) * {N_DEPTH_BUCKETS} div n"),
                F.expr(f"(end - 1) * {N_DEPTH_BUCKETS} div n"),
            )
        ).alias("bucket"),
    )
    lo_rank = F.expr(f"(bucket * n + {N_DEPTH_BUCKETS} - 1) div {N_DEPTH_BUCKETS} + 1")
    hi_rank = F.expr(f"((bucket + 1) * n - 1) div {N_DEPTH_BUCKETS} + 1")
    ov = F.least(hi_rank, F.col("end")) - F.greatest(lo_rank, F.col("start")) + 1
    return (
        spans.select("bucket", "v", ov.alias("ov"))
        # empty buckets exist when n < B: a value's bucket span can
        # cross buckets that hold no ranks at all
        .filter(F.col("ov") >= 1)
        .groupBy("bucket")
        .agg(
            F.sum("ov").cast("bigint").alias("cnt"),
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
        )
    )


@register(
    "agg_welch_ttest",
    oracle="""
    WITH m AS (
      SELECT COUNT(*) FILTER (event_type = 'click') AS n1,
             CAST(SUM(CAST(round(value, 6) AS DECIMAL(18,6)))
                  FILTER (event_type = 'click') AS DOUBLE) AS sx1,
             CAST(SUM(CAST(round(value, 6) AS DECIMAL(18,6))
                      * CAST(round(value, 6) AS DECIMAL(18,6)))
                  FILTER (event_type = 'click') AS DOUBLE) AS sxx1,
             COUNT(*) FILTER (event_type = 'purchase') AS n2,
             CAST(SUM(CAST(round(value, 6) AS DECIMAL(18,6)))
                  FILTER (event_type = 'purchase') AS DOUBLE) AS sx2,
             CAST(SUM(CAST(round(value, 6) AS DECIMAL(18,6))
                      * CAST(round(value, 6) AS DECIMAL(18,6)))
                  FILTER (event_type = 'purchase') AS DOUBLE) AS sxx2
      FROM events),
    d AS (
      SELECT n1, n2,
             sx1/n1 - sx2/n2 AS mean_diff,
             ((sxx1 - sx1*sx1/n1)/(n1-1))/n1 AS a,
             ((sxx2 - sx2*sx2/n2)/(n2-1))/n2 AS b
      FROM m)
    SELECT n1, n2,
           round(mean_diff, 6) AS mean_diff,
           round(mean_diff / sqrt(a + b), 6) AS t_stat,
           round((a + b) * (a + b) / (a*a/(n1-1) + b*b/(n2-1)), 6) AS df_welch
    FROM d
    """,
    tags=("aggregate", "stats"),
)
def agg_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's two-sample t-test (unequal variances) between the click
    and purchase value distributions — the A/B-test primitive run over
    event streams. One single-pass conditional-moment aggregate (six
    FILTERed sums), then the t statistic and Welch–Satterthwaite
    degrees of freedom as a shared double formula over exact decimal
    moments (the agg_stats recipe).

    Scale: one scan, one partial+final aggregate of six numbers — the
    cheapest possible shape; works unchanged per experiment-arm key by
    adding a groupBy."""
    e = load_table(spark, sf_dir, "events")
    v = F.round("value", 6).cast("decimal(18,6)")
    click = F.col("event_type") == "click"
    purch = F.col("event_type") == "purchase"
    m = e.agg(
        F.count(F.when(click, 1)).alias("n1"),
        F.sum(F.when(click, v)).cast("double").alias("sx1"),
        F.sum(F.when(click, v * v)).cast("double").alias("sxx1"),
        F.count(F.when(purch, 1)).alias("n2"),
        F.sum(F.when(purch, v)).cast("double").alias("sx2"),
        F.sum(F.when(purch, v * v)).cast("double").alias("sxx2"),
    )
    n1, sx1, sxx1, n2, sx2, sxx2 = (
        F.col(c) for c in ["n1", "sx1", "sxx1", "n2", "sx2", "sxx2"]
    )
    d = m.select(
        "n1",
        "n2",
        (sx1 / n1 - sx2 / n2).alias("mean_diff"),
        (((sxx1 - sx1 * sx1 / n1) / (n1 - 1)) / n1).alias("a"),
        (((sxx2 - sx2 * sx2 / n2) / (n2 - 1)) / n2).alias("b"),
    )
    a, b, md = F.col("a"), F.col("b"), F.col("mean_diff")
    return d.select(
        "n1",
        "n2",
        F.round(md, 6).alias("mean_diff"),
        F.round(md / F.sqrt(a + b), 6).alias("t_stat"),
        F.round(
            (a + b) * (a + b) / (a * a / (n1 - 1) + b * b / (n2 - 1)), 6
        ).alias("df_welch"),
    )


@register(
    "events_benford_digit_audit",
    oracle="""
    WITH d AS (
      SELECT event_type,
             CAST(left(CAST(CAST(round(value * 10000, 0) AS BIGINT) AS VARCHAR), 1)
                  AS INT) AS digit
      FROM events WHERE value > 0),
    -- digit >= 1 guard: a value in (0, 5e-5) rounds to integer 0, whose
    -- first "digit" is 0 and whose Benford term divides by zero — both
    -- engines drop it identically here
    o AS (
      SELECT event_type, digit, CAST(COUNT(*) AS BIGINT) AS n_obs
      FROM d WHERE digit >= 1 GROUP BY event_type, digit),
    t AS (SELECT event_type, CAST(SUM(n_obs) AS BIGINT) AS n_total
          FROM o GROUP BY event_type),
    s AS (
      SELECT o.event_type, o.digit, o.n_obs, t.n_total,
             CAST(round(ln(1.0 + 1.0 / o.digit) / ln(10.0) * 1000000, 0) AS BIGINT)
               AS benford_ppm
      FROM o JOIN t ON t.event_type = o.event_type)
    SELECT event_type, digit, n_obs,
           CAST(round(n_obs * 1000000.0 / n_total, 0) AS BIGINT) AS obs_ppm,
           benford_ppm,
           round((n_obs - n_total * benford_ppm / 1000000.0)
                 * (n_obs - n_total * benford_ppm / 1000000.0)
                 / (n_total * benford_ppm / 1000000.0), 6) AS chi_contrib
    FROM s
    """,
    tags=("aggregate", "stats", "quality"),
)
def events_benford_digit_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit per event type: observed
    first-significant-digit shares vs the log10(1+1/d) expectation,
    with per-digit chi-square contributions — the classic forensic
    screen for fabricated or clipped metric streams (organic
    heavy-tailed values follow Benford; synthetic uniform injections
    light up digits 5-9).

    Determinism: the first digit comes from an exact integer rendering
    (round(value*1e4) -> string head); Benford shares round to integer
    ppm (each of the 9 constants sits >100 ppm from a rounding
    boundary, so cross-engine ln() ulps cannot flip them); the chi
    contribution is one shared double formula over exact ints.

    Scale: one scan, a (type x 9)-cardinality aggregate (map-side
    combinable), and a 9-row-per-type total join — broadcast."""
    e = load_table(spark, sf_dir, "events")
    d = e.filter(F.col("value") > 0).select(
        "event_type",
        F.substring(
            F.round(F.col("value") * 10000, 0).cast("bigint").cast("string"), 1, 1
        )
        .cast("int")
        .alias("digit"),
    )
    # digit >= 1: mirrors the oracle's guard — sub-5e-5 values round to
    # integer 0 (digit 0) and would divide by zero in the Benford term
    o = (
        d.filter(F.col("digit") >= 1)
        .groupBy("event_type", "digit")
        .agg(F.count("*").cast("bigint").alias("n_obs"))
    )
    t = o.groupBy("event_type").agg(F.sum("n_obs").cast("bigint").alias("n_total"))
    s = o.join(F.broadcast(t), "event_type").withColumn(
        "benford_ppm",
        F.round(F.log(1.0 + 1.0 / F.col("digit")) / F.log(F.lit(10.0)) * 1000000, 0)
        .cast("bigint"),
    )
    exp_cnt = F.col("n_total") * F.col("benford_ppm") / 1000000.0
    return s.select(
        "event_type", "digit", "n_obs",
        F.round(F.col("n_obs") * 1000000.0 / F.col("n_total"), 0)
        .cast("bigint")
        .alias("obs_ppm"),
        "benford_ppm",
        F.round((F.col("n_obs") - exp_cnt) * (F.col("n_obs") - exp_cnt) / exp_cnt, 6)
        .alias("chi_contrib"),
    )


@register(
    "agg_chi_square_independence",
    oracle="""
    WITH c AS (
      SELECT event_type, CAST(user_id % 4 AS INT) AS cohort,
             CAST(COUNT(*) AS BIGINT) AS n_obs
      FROM events GROUP BY event_type, user_id % 4),
    rt AS (SELECT event_type, CAST(SUM(n_obs) AS BIGINT) AS row_tot
           FROM c GROUP BY event_type),
    ct AS (SELECT cohort, CAST(SUM(n_obs) AS BIGINT) AS col_tot
           FROM c GROUP BY cohort),
    n AS (SELECT CAST(SUM(n_obs) AS BIGINT) AS grand FROM c)
    SELECT c.event_type, c.cohort, c.n_obs,
           round(rt.row_tot * ct.col_tot / CAST(n.grand AS DOUBLE), 6) AS expected,
           round((c.n_obs - rt.row_tot * ct.col_tot / CAST(n.grand AS DOUBLE))
                 * (c.n_obs - rt.row_tot * ct.col_tot / CAST(n.grand AS DOUBLE))
                 / (rt.row_tot * ct.col_tot / CAST(n.grand AS DOUBLE)), 6)
             AS chi_contrib
    FROM c
    JOIN rt ON rt.event_type = c.event_type
    JOIN ct ON ct.cohort = c.cohort
    CROSS JOIN n
    """,
    tags=("aggregate", "stats"),
)
def agg_chi_square_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square test of independence between event type and a user
    cohort (user_id mod 4): the contingency table with expected counts
    under independence and per-cell chi contributions — the
    segmentation sanity check run before trusting any per-cohort
    metric difference.

    Determinism: the contingency table, row/column totals, and grand
    total are exact bigints; expected counts and contributions are a
    shared double formula written identically in both engines.

    Scale: ONE shuffle builds the (type x cohort) table — cardinality
    |types| x 4 — and the margins derive from that tiny relation with
    broadcast joins; the corpus is scanned once."""
    e = load_table(spark, sf_dir, "events")
    c = e.groupBy(
        "event_type", (F.col("user_id") % 4).cast("int").alias("cohort")
    ).agg(F.count("*").cast("bigint").alias("n_obs"))
    rt = c.groupBy("event_type").agg(F.sum("n_obs").cast("bigint").alias("row_tot"))
    ct = c.groupBy("cohort").agg(F.sum("n_obs").cast("bigint").alias("col_tot"))
    n = c.agg(F.sum("n_obs").cast("bigint").alias("grand"))
    s = (
        c.join(F.broadcast(rt), "event_type")
        .join(F.broadcast(ct), "cohort")
        .crossJoin(F.broadcast(n))
    )
    exp = F.col("row_tot") * F.col("col_tot") / F.col("grand").cast("double")
    return s.select(
        "event_type", "cohort", "n_obs",
        F.round(exp, 6).alias("expected"),
        F.round((F.col("n_obs") - exp) * (F.col("n_obs") - exp) / exp, 6).alias(
            "chi_contrib"
        ),
    )


SUBSAMPLE_B = 8  # deterministic half-sample replicas


@register(
    "agg_subsample_ci",
    oracle=f"""
    WITH r AS (
      SELECT b, o_totalprice
      FROM orders CROSS JOIN unnest(generate_series(0, {SUBSAMPLE_B - 1})) AS t(b)
      WHERE substr(md5(CAST(o_orderkey AS VARCHAR) || '_' || CAST(b AS VARCHAR)),
                   1, 2) < '80'),
    means AS (
      SELECT b,
             CAST(round(CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                             AS DOUBLE) / 100.0 / COUNT(*) * 1000000, 0)
                  AS BIGINT) AS mean_u,
             CAST(COUNT(*) AS BIGINT) AS n_rows
      FROM r GROUP BY b),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_b,
             CAST(SUM(mean_u) AS BIGINT) AS s1,
             CAST(SUM(CAST(mean_u AS DECIMAL(38,0)) * mean_u) AS DECIMAL(38,0))
               AS s2,
             CAST(MIN(n_rows) AS BIGINT) AS min_rows,
             CAST(MAX(n_rows) AS BIGINT) AS max_rows
      FROM means)
    SELECT n_b, min_rows, max_rows,
           round(CAST(s1 AS DOUBLE) / n_b / 1000000.0, 6) AS grand_mean,
           round(sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n_b)
                      / (n_b - 1)) / 1000000.0, 6) AS sd_of_means,
           round(1.96 * sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n_b)
                             / (n_b - 1)) / sqrt(CAST(n_b AS DOUBLE))
                 / 1000000.0, 6) AS ci95_half_width
    FROM m
    """,
    tags=("aggregate", "stats", "sample"),
)
def agg_subsample_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subsample-ensemble confidence interval (deterministic
    half-sample bootstrap / subagging): B hash-gated ~50% replicas of
    the order-value mean, whose spread estimates the sampling error of
    the full-data mean — the error bar a pipeline attaches to every
    sampled metric WITHOUT a closed-form variance. Membership is
    md5(id, replica) — reproducible across runs, partitionings, and
    engines, unlike rand()-based bootstrap.

    Determinism: replica means are exact cents-sums over hash-selected
    rows, quantized to integer micro-units; the across-replica moments
    are exact DECIMAL(38,0) sums; the final sd/CI is one shared double
    formula.

    Scale: the replica explode multiplies the scan B-fold — stated
    cost, all map-side — then everything reduces through one B-row
    aggregate. For B beyond ~16, switch to one-pass Poisson
    bootstrap weights (md5-derived counts) to keep the blow-up
    constant; the hash-gating principle is identical."""
    o = load_table(spark, sf_dir, "orders")
    r = o.select(
        "o_orderkey",
        "o_totalprice",
        F.explode(F.sequence(F.lit(0), F.lit(SUBSAMPLE_B - 1))).alias("b"),
    ).filter(
        F.substring(
            F.md5(
                F.concat_ws("_", F.col("o_orderkey").cast("string"),
                            F.col("b").cast("string"))
            ),
            1,
            2,
        )
        < "80"
    )
    means = r.groupBy("b").agg(
        F.round(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
            .cast("double")
            / 100.0
            / F.count("*")
            * 1000000,
            0,
        )
        .cast("bigint")
        .alias("mean_u"),
        F.count("*").cast("bigint").alias("n_rows"),
    )
    m = means.agg(
        F.count("*").cast("bigint").alias("n_b"),
        F.sum("mean_u").cast("bigint").alias("s1"),
        F.sum(F.col("mean_u").cast("decimal(38,0)") * F.col("mean_u"))
        .cast("decimal(38,0)")
        .alias("s2"),
        F.min("n_rows").cast("bigint").alias("min_rows"),
        F.max("n_rows").cast("bigint").alias("max_rows"),
    )
    n_b, s1, s2 = F.col("n_b"), F.col("s1"), F.col("s2")
    var = (s2.cast("double") - s1.cast("double") * s1 / n_b) / (n_b - 1)
    return m.select(
        "n_b", "min_rows", "max_rows",
        F.round(s1.cast("double") / n_b / 1000000.0, 6).alias("grand_mean"),
        F.round(F.sqrt(var) / 1000000.0, 6).alias("sd_of_means"),
        F.round(
            1.96 * F.sqrt(var) / F.sqrt(n_b.cast("double")) / 1000000.0, 6
        ).alias("ci95_half_width"),
    )


@register(
    "agg_mutual_information",
    oracle="""
    WITH c AS (
      SELECT event_type, CAST(user_id % 4 AS INT) AS cohort,
             CAST(COUNT(*) AS BIGINT) AS n_xy
      FROM events GROUP BY event_type, user_id % 4),
    rx AS (SELECT event_type, CAST(SUM(n_xy) AS BIGINT) AS n_x
           FROM c GROUP BY event_type),
    ry AS (SELECT cohort, CAST(SUM(n_xy) AS BIGINT) AS n_y
           FROM c GROUP BY cohort),
    n AS (SELECT CAST(SUM(n_xy) AS BIGINT) AS nn FROM c),
    cells AS (
      SELECT c.n_xy,
             CAST(round(ln(n.nn * c.n_xy / (CAST(rx.n_x AS DOUBLE) * ry.n_y))
                        * 1000000, 0) AS BIGINT) AS mi_u
      FROM c
      JOIN rx ON rx.event_type = c.event_type
      JOIN ry ON ry.cohort = c.cohort
      CROSS JOIN n),
    hx AS (SELECT CAST(SUM(n_x * CAST(round(-ln(n_x / CAST(n.nn AS DOUBLE))
                                            * 1000000, 0) AS BIGINT)) AS BIGINT)
                    AS hx_w
           FROM rx CROSS JOIN n),
    hy AS (SELECT CAST(SUM(n_y * CAST(round(-ln(n_y / CAST(n.nn AS DOUBLE))
                                            * 1000000, 0) AS BIGINT)) AS BIGINT)
                    AS hy_w
           FROM ry CROSS JOIN n)
    SELECT n.nn AS n_events,
           round(CAST(SUM(cells.n_xy * cells.mi_u) AS DOUBLE)
                 / n.nn / 1000000.0, 6) AS mi_nats,
           round(CAST(hx.hx_w AS DOUBLE) / n.nn / 1000000.0, 6) AS h_type,
           round(CAST(hy.hy_w AS DOUBLE) / n.nn / 1000000.0, 6) AS h_cohort
    FROM cells CROSS JOIN n CROSS JOIN hx CROSS JOIN hy
    GROUP BY n.nn, hx.hx_w, hy.hy_w
    """,
    tags=("aggregate", "stats"),
)
def agg_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information I(event_type; cohort) with both marginal
    entropies — the information-theoretic dependence measure that,
    unlike chi-square (agg_chi_square_independence), is directly
    comparable across tables and is THE feature-selection score
    (information gain) for categorical columns.

    Determinism: per-cell and per-margin log terms quantize to integer
    micro-nats on exact count ratios; the expectation is then an exact
    bigint-weighted sum divided once.

    Scale: the same single contingency shuffle as chi-square —
    |types| x 4 cells — with broadcast margins; the corpus scans
    once."""
    e = load_table(spark, sf_dir, "events")
    c = e.groupBy(
        "event_type", (F.col("user_id") % 4).cast("int").alias("cohort")
    ).agg(F.count("*").cast("bigint").alias("n_xy"))
    rx = c.groupBy("event_type").agg(F.sum("n_xy").cast("bigint").alias("n_x"))
    ry = c.groupBy("cohort").agg(F.sum("n_xy").cast("bigint").alias("n_y"))
    n = c.agg(F.sum("n_xy").cast("bigint").alias("nn"))
    cells = (
        c.join(F.broadcast(rx), "event_type")
        .join(F.broadcast(ry), "cohort")
        .crossJoin(F.broadcast(n))
        .select(
            "n_xy",
            F.round(
                F.log(
                    F.col("nn") * F.col("n_xy")
                    / (F.col("n_x").cast("double") * F.col("n_y"))
                )
                * 1000000,
                0,
            )
            .cast("bigint")
            .alias("mi_u"),
        )
    )
    hx = rx.crossJoin(F.broadcast(n)).agg(
        F.sum(
            F.col("n_x")
            * F.round(-F.log(F.col("n_x") / F.col("nn").cast("double")) * 1000000, 0)
            .cast("bigint")
        )
        .cast("bigint")
        .alias("hx_w")
    )
    hy = ry.crossJoin(F.broadcast(n)).agg(
        F.sum(
            F.col("n_y")
            * F.round(-F.log(F.col("n_y") / F.col("nn").cast("double")) * 1000000, 0)
            .cast("bigint")
        )
        .cast("bigint")
        .alias("hy_w")
    )
    agg = cells.crossJoin(F.broadcast(n)).agg(
        F.max("nn").alias("n_events"),
        F.round(
            F.sum(F.col("n_xy") * F.col("mi_u")).cast("double")
            / F.max("nn")
            / 1000000.0,
            6,
        ).alias("mi_nats"),
    )
    return (
        agg.crossJoin(F.broadcast(hx))
        .crossJoin(F.broadcast(hy))
        .crossJoin(F.broadcast(n))
        .select(
            "n_events",
            "mi_nats",
            F.round(F.col("hx_w").cast("double") / F.col("nn") / 1000000.0, 6).alias(
                "h_type"
            ),
            F.round(F.col("hy_w").cast("double") / F.col("nn") / 1000000.0, 6).alias(
                "h_cohort"
            ),
        )
    )


@register(
    "agg_gini_coefficient",
    oracle="""
    WITH v AS (
      SELECT event_type,
             CAST(round(value * 10000, 0) AS BIGINT) AS v_u,
             event_id
      FROM events WHERE value >= 0),
    r AS (
      SELECT event_type, v_u,
             CAST(row_number() OVER (PARTITION BY event_type
                                     ORDER BY v_u, event_id) AS BIGINT) AS rk
      FROM v),
    m AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(v_u) AS BIGINT) AS s,
             CAST(SUM(CAST(rk AS DECIMAL(38,0)) * v_u) AS DECIMAL(38,0)) AS rs
      FROM r GROUP BY event_type)
    SELECT event_type, n,
           round(CAST(s AS DOUBLE) / 10000.0 / n, 6) AS mean_value,
           round((2.0 * CAST(rs AS DOUBLE) / (CAST(n AS DOUBLE) * s))
                 - (n + 1.0) / n, 6) AS gini
    FROM m
    """,
    tags=("aggregate", "stats"),
)
def agg_gini_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of the value distribution per event type — the
    concentration measure pipelines use to answer 'is this metric (or
    this source's contribution) dominated by a few heavy rows?' (0 =
    perfectly even, →1 = one row holds everything). Computed with the
    rank formulation G = 2·Σ(rank·x)/(n·Σx) − (n+1)/n over
    fixed-point values with a unique (value, event_id) rank order.

    Determinism: values quantize to integer basis points; the
    rank-weighted sum is an exact DECIMAL(38,0); the closed form is
    one shared double expression.

    Scale: one shuffle on event_type for the rank window (per-type
    sort is partition-local), then a map-side-combinable moment
    aggregate — the same shape as every windowed rollup here."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    v = e.filter(F.col("value") >= 0).select(
        "event_type",
        F.round(F.col("value") * 10000, 0).cast("bigint").alias("v_u"),
        "event_id",
    )
    w = Window.partitionBy("event_type").orderBy("v_u", "event_id")
    r = v.withColumn("rk", F.row_number().over(w).cast("bigint"))
    m = r.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("v_u").cast("bigint").alias("s"),
        F.sum(F.col("rk").cast("decimal(38,0)") * F.col("v_u"))
        .cast("decimal(38,0)")
        .alias("rs"),
    )
    n, s, rs = F.col("n"), F.col("s"), F.col("rs")
    return m.select(
        "event_type",
        "n",
        F.round(s.cast("double") / 10000.0 / n, 6).alias("mean_value"),
        F.round(
            (2.0 * rs.cast("double") / (n.cast("double") * s)) - (n + 1.0) / n, 6
        ).alias("gini"),
    )


@register(
    "agg_ks_two_sample",
    oracle="""
    WITH v AS (
      SELECT CAST(round(value * 10000, 0) AS BIGINT) AS v_u,
             CAST(event_type = 'click' AS INT) AS is1
      -- value IS NOT NULL is load-bearing: a NULL point would sort
      -- NULLS-first in Spark but NULLS-last in DuckDB and silently
      -- shift the ECDF (fixtures are null-free; the guard keeps the
      -- spec independent of that)
      FROM events WHERE event_type IN ('click', 'purchase')
        AND value IS NOT NULL),
    pts AS (
      SELECT v_u,
             CAST(SUM(is1) AS BIGINT) AS c1,
             CAST(COUNT(*) - SUM(is1) AS BIGINT) AS c2
      FROM v GROUP BY v_u),
    n AS (SELECT CAST(SUM(c1) AS BIGINT) AS n1, CAST(SUM(c2) AS BIGINT) AS n2
          FROM pts),
    ecdf AS (
      SELECT v_u,
             CAST(SUM(c1) OVER (ORDER BY v_u
                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS f1,
             CAST(SUM(c2) OVER (ORDER BY v_u
                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS f2
      FROM pts),
    d AS (
      SELECT e.v_u,
             CAST(abs(e.f1 * n.n2 - e.f2 * n.n1) AS BIGINT) AS d_num
      FROM ecdf e CROSS JOIN n)
    SELECT n.n1, n.n2,
           round(CAST(MAX(d.d_num) AS DOUBLE) / (n.n1 * n.n2), 6) AS ks_stat,
           round(CAST(MIN(CASE WHEN d.d_num = (SELECT MAX(d_num) FROM d)
                               THEN d.v_u END) AS DOUBLE) / 10000.0, 4)
             AS ks_location
    FROM d CROSS JOIN n
    GROUP BY n.n1, n.n2
    """,
    tags=("aggregate", "stats"),
)
def agg_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic between the click and
    purchase value distributions: the largest ECDF gap, with the value
    where it occurs — the standard nonparametric drift test, sensitive
    to ANY distributional difference where the t-test only sees means.
    Completes the drift toolkit (Welch t, chi-square, MI, Benford).

    Determinism: values quantize to integer basis points; the ECDF gap
    is compared as the exact integer |f1*n2 - f2*n1| (cross-multiplied
    — no per-point division), and only the final max divides once; the
    gap location ties to the smallest value.

    Scale: one aggregate over distinct value points, then a single
    global cumulative window over those points — cardinality is the
    DISTINCT value count, not the corpus (quantization caps it), which
    is what makes a global ECDF window tractable at 100 TB; for truly
    unbounded domains you coarsen the quantization, trading resolution
    for point count."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    v = e.filter(
        F.col("event_type").isin("click", "purchase")
        & F.col("value").isNotNull()
    ).select(
        F.round(F.col("value") * 10000, 0).cast("bigint").alias("v_u"),
        (F.col("event_type") == "click").cast("int").alias("is1"),
    )
    pts = v.groupBy("v_u").agg(
        F.sum("is1").cast("bigint").alias("c1"),
        (F.count("*") - F.sum("is1")).cast("bigint").alias("c2"),
    )
    n = pts.agg(
        F.sum("c1").cast("bigint").alias("n1"),
        F.sum("c2").cast("bigint").alias("n2"),
    )
    w = Window.orderBy("v_u").rowsBetween(Window.unboundedPreceding, 0)
    ecdf = pts.select(
        "v_u",
        F.sum("c1").over(w).cast("bigint").alias("f1"),
        F.sum("c2").over(w).cast("bigint").alias("f2"),
    )
    d = ecdf.crossJoin(F.broadcast(n)).select(
        "v_u",
        "n1",
        "n2",
        F.abs(F.col("f1") * F.col("n2") - F.col("f2") * F.col("n1"))
        .cast("bigint")
        .alias("d_num"),
    )
    dm = d.groupBy("n1", "n2").agg(F.max("d_num").alias("d_max"))
    loc = (
        d.join(F.broadcast(dm), ["n1", "n2"])
        .filter(F.col("d_num") == F.col("d_max"))
        .groupBy("n1", "n2", "d_max")
        .agg(F.min("v_u").alias("v_loc"))
    )
    return loc.select(
        "n1",
        "n2",
        F.round(F.col("d_max").cast("double") / (F.col("n1") * F.col("n2")), 6).alias(
            "ks_stat"
        ),
        F.round(F.col("v_loc").cast("double") / 10000.0, 4).alias("ks_location"),
    )


# --- Count-Min sketch ------------------------------------------------------

CMS_D = 4  # hash rows
CMS_W = 128  # buckets per row

_CMS_BUCKET_SQL = (
    "(CAST(('0x' || substr(md5(CAST({j} AS VARCHAR) || ':' "
    "|| CAST({k} AS VARCHAR)), 1, 12)) AS BIGINT) % " + str(CMS_W) + ")"
)


@register(
    "agg_countmin_sketch",
    oracle=f"""
    WITH e AS (SELECT user_id FROM events WHERE user_id IS NOT NULL),
    b AS (
      SELECT user_id, j,
             {_CMS_BUCKET_SQL.format(j="j", k="user_id")} AS bucket
      FROM e CROSS JOIN (SELECT unnest(generate_series(0, {CMS_D - 1})) AS j)),
    cms AS (
      SELECT j, bucket, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM b GROUP BY j, bucket),
    t AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS true_cnt
      FROM e GROUP BY user_id),
    est AS (
      SELECT t.user_id, MIN(c.cnt) AS cms_est
      FROM t JOIN cms c
        ON c.bucket = {_CMS_BUCKET_SQL.format(j="c.j", k="t.user_id")}
      GROUP BY t.user_id)
    SELECT t.user_id, t.true_cnt, est.cms_est,
           est.cms_est - t.true_cnt AS overestimate,
           est.cms_est = t.true_cnt AS is_exact
    FROM t JOIN est ON t.user_id = est.user_id
    ORDER BY t.true_cnt DESC, t.user_id LIMIT 20
    """,
    tags=("aggregate", "approx", "sketch"),
)
def agg_countmin_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch (Cormode & Muthukrishnan 2005) built as a plain
    aggregation — the mergeable frequency sketch for heavy-hitter
    monitoring at 100 TB: the sketch is a FIXED 4x128 count
    grid regardless of corpus size, partial aggregation collapses each
    map task's contribution to <= 512 rows before the
    shuffle, and two sketches merge by cell-wise addition (the groupBy
    IS the merge). Unlike the HLL op (engine-opaque bytes, rows-only
    check) every cell here is an exact BIGINT count, so the whole
    sketch AND its estimates are oracle-verified.

    Estimates: est(key) = min over the 4 rows of the key's bucket
    count — never an undercount (each bucket >= the key's true count),
    which the is_exact/overestimate columns certify against exact
    counts for the top-20 keys (deterministic order: count desc, key).

    Scale shape: one scan of events explodes 4 (j, bucket) pairs
    per row; the shuffle after partial agg is bounded by sketch size x
    partitions, not data size. The finished 512-cell sketch folds into
    a single broadcast map row; estimate lookups are map probes — no
    join against the sketch table. True counts (the audit side) are the
    only data-sized shuffle, and a real deployment drops them."""
    e = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull())
        .select("user_id")
    )

    def bucket(j: int, key: Column) -> Column:
        digest = F.md5(F.concat(F.lit(f"{j}:"), key.cast("string")))
        return F.conv(F.substring(digest, 1, 12), 16, 10).cast("bigint") % CMS_W

    pairs = e.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        bucket(j, F.col("user_id")).alias("bucket"),
                    )
                    for j in range(CMS_D)
                ]
            )
        ).alias("jb")
    ).select("jb.j", "jb.bucket")
    cms = pairs.groupBy("j", "bucket").agg(F.count("*").cast("bigint").alias("cnt"))
    # the finished sketch is 512 cells -> one broadcast map row
    sketch = cms.agg(
        F.map_from_entries(
            F.collect_list(
                F.struct(
                    (F.col("j") * CMS_W + F.col("bucket")).alias("k"),
                    F.col("cnt").alias("v"),
                )
            )
        ).alias("m")
    )
    t = e.groupBy("user_id").agg(F.count("*").cast("bigint").alias("true_cnt"))
    est = F.least(
        *[
            F.element_at(
                F.col("m"), (F.lit(j * CMS_W) + bucket(j, F.col("user_id")))
            )
            for j in range(CMS_D)
        ]
    )
    probed = t.crossJoin(F.broadcast(sketch)).select(
        "user_id", "true_cnt", est.alias("cms_est")
    )
    return (
        probed.select(
            "user_id",
            "true_cnt",
            "cms_est",
            (F.col("cms_est") - F.col("true_cnt")).alias("overestimate"),
            (F.col("cms_est") == F.col("true_cnt")).alias("is_exact"),
        )
        .orderBy(F.col("true_cnt").desc(), F.col("user_id"))
        .limit(20)
    )


# --- Bloom filter build + probe ---------------------------------------------

BLOOM_BITS = 256  # filter size (sized small so the FP path is exercised)
BLOOM_K = 3  # hash functions per key
BLOOM_BUILD_SRC = "src0"  # membership set: digests of this source's docs

_BLOOM_POS_SQL = (
    "(CAST(('0x' || substr(md5(CAST({j} AS VARCHAR) || ':' || {k}), 1, 12)) "
    "AS BIGINT) % " + str(BLOOM_BITS) + ")"
)


@register(
    "agg_bloom_filter_probe",
    oracle=f"""
    WITH d AS (SELECT source, md5(text) AS digest
               FROM documents WHERE text IS NOT NULL),
    build AS (SELECT DISTINCT digest FROM d WHERE source = '{BLOOM_BUILD_SRC}'),
    bbits AS (
      SELECT {_BLOOM_POS_SQL.format(j="j", k="digest")} AS pos
      FROM build CROSS JOIN (SELECT unnest(generate_series(0, {BLOOM_K - 1})) AS j)),
    words AS (
      SELECT pos // 32 AS word,
             CAST(bit_or(CAST(1 AS BIGINT) << CAST(pos % 32 AS INT)) AS BIGINT) AS w
      FROM bbits GROUP BY pos // 32),
    probe AS (SELECT DISTINCT source, digest FROM d),
    pbits AS (
      SELECT source, digest,
             {_BLOOM_POS_SQL.format(j="j", k="digest")} AS pos
      FROM probe CROSS JOIN (SELECT unnest(generate_series(0, {BLOOM_K - 1})) AS j)),
    claims AS (
      SELECT source, digest,
             bool_and((COALESCE(w.w, 0)
                       & (CAST(1 AS BIGINT) << CAST(b.pos % 32 AS INT))) <> 0)
               AS claimed
      FROM pbits b LEFT JOIN words w ON w.word = b.pos // 32
      GROUP BY source, digest),
    flags AS (SELECT c.source, c.claimed, (m.digest IS NOT NULL) AS is_member
              FROM claims c LEFT JOIN build m ON m.digest = c.digest)
    SELECT source,
      CAST(COUNT(*) AS BIGINT) AS n_probed,
      CAST(SUM(CASE WHEN claimed THEN 1 ELSE 0 END) AS BIGINT) AS n_claimed,
      CAST(SUM(CASE WHEN is_member THEN 1 ELSE 0 END) AS BIGINT)
        AS n_true_members,
      CAST(SUM(CASE WHEN claimed AND NOT is_member THEN 1 ELSE 0 END) AS BIGINT)
        AS n_false_pos,
      CAST(SUM(CASE WHEN is_member AND NOT claimed THEN 1 ELSE 0 END) AS BIGINT)
        AS n_missed,
      CAST(SUM(CASE WHEN claimed AND NOT is_member THEN 1 ELSE 0 END)
           * 1000000 AS BIGINT)
        // NULLIF(CAST(COUNT(*) AS BIGINT)
                  - CAST(SUM(CASE WHEN is_member THEN 1 ELSE 0 END) AS BIGINT), 0)
        AS fpr_ppm
    FROM flags GROUP BY source
    """,
    tags=("aggregate", "approx", "sketch"),
)
def agg_bloom_filter_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter membership (Bloom 1970) as a plain aggregation —
    the third mergeable sketch next to Count-Min and HLL, and the one
    a 100 TB crawl pipeline runs constantly ("was this URL/document
    digest ingested before?") when the exact key set no longer fits
    anywhere. The filter is a FIXED 256-bit array packed into
    32-bit words of BIGINTs built with bit_or — associative and
    commutative, so partial aggregation collapses every map task to
    <= 32 rows before the shuffle and two shards' filters merge by
    OR-ing words (the groupBy IS the merge).

    Build: BLOOM_K md5-derived bit positions per distinct digest of
    the BLOOM_BUILD_SRC docs. The finished filter folds into ONE
    broadcast map row; each probe is BLOOM_K map lookups + AND — no
    join against the filter, no shuffle proportional to it. Probes
    (every other source's distinct (source, digest)) are certified
    against exact membership (a real join on digest — the audit side a
    deployment drops): n_missed is structurally ZERO (a Bloom filter
    never false-negatives; the column proves it), n_false_pos and
    fpr_ppm measure the lie rate at this fill factor (3
    hashes, 256 bits — sized small on purpose so FPs occur
    and the FP path is actually tested).

    Determinism: bit positions are md5-derived (identical hex in both
    engines), counts and the ppm rate are integer-exact (integer
    division, NULL on zero negatives)."""
    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select("source", F.md5("text").alias("digest"))
    )
    pow2 = F.array(*[F.lit(1 << i).cast("bigint") for i in range(32)])

    def pos(j: int, key: Column) -> Column:
        digest = F.md5(F.concat(F.lit(f"{j}:"), key))
        return F.conv(F.substring(digest, 1, 12), 16, 10).cast(
            "bigint"
        ) % BLOOM_BITS

    build = (
        docs.filter(F.col("source") == BLOOM_BUILD_SRC).select("digest").distinct()
    )
    bbits = build.select(
        F.explode(F.array(*[pos(j, F.col("digest")) for j in range(BLOOM_K)])).alias(
            "pos"
        )
    )
    words = (
        bbits.select(
            F.floor(F.col("pos") / F.lit(32)).cast("bigint").alias("word"),
            F.element_at(pow2, (F.col("pos") % 32 + 1).cast("int")).alias("v"),
        )
        .groupBy("word")
        .agg(F.bit_or("v").alias("w"))
    )
    bloom = words.agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("word").alias("k"), F.col("w").alias("v")))
        ).alias("bm")
    )

    probe = docs.distinct()

    def hit(j: int) -> Column:
        p = pos(j, F.col("digest"))
        word = F.floor(p / F.lit(32)).cast("bigint")
        mask = F.element_at(pow2, (p % 32 + 1).cast("int"))
        looked = F.coalesce(
            F.element_at(F.col("bm"), word), F.lit(0).cast("bigint")
        )
        return looked.bitwiseAND(mask) != 0

    claimed = hit(0)
    for j in range(1, BLOOM_K):
        claimed = claimed & hit(j)
    claims = probe.crossJoin(F.broadcast(bloom)).select(
        "source", "digest", claimed.alias("claimed")
    )
    flags = claims.join(
        build.withColumn("is_m", F.lit(True)), "digest", "left"
    ).select("source", "claimed", F.coalesce("is_m", F.lit(False)).alias("is_member"))
    return flags.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_probed"),
        F.sum(F.col("claimed").cast("int")).cast("bigint").alias("n_claimed"),
        F.sum(F.col("is_member").cast("int")).cast("bigint").alias("n_true_members"),
        F.sum((F.col("claimed") & ~F.col("is_member")).cast("int"))
        .cast("bigint")
        .alias("n_false_pos"),
        F.sum((F.col("is_member") & ~F.col("claimed")).cast("int"))
        .cast("bigint")
        .alias("n_missed"),
    ).withColumn(
        "fpr_ppm",
        F.expr(
            "CAST(n_false_pos * 1000000 AS BIGINT) "
            "div NULLIF(n_probed - n_true_members, 0)"
        ),
    )


@register(
    "agg_proportion_ztest",
    oracle="""
    WITH u AS (
      -- deterministic 50/50 assignment by user-id hash (the same
      -- md5 gate every split op in this engine uses); NULL user_id
      -- can't be assigned a variant, NULL ts can't anchor the
      -- activation window: excluded in BOTH engines. Converted =
      -- purchased within 24h of the user's first event (activation),
      -- a non-degenerate rate at every fixture scale
      SELECT user_id,
             CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
                  AS BIGINT) % 2 AS variant,
             CASE WHEN MIN(CASE WHEN event_type = 'purchase' THEN ts END)
                       < MIN(ts) + INTERVAL 24 HOURS
                  THEN 1 ELSE 0 END AS converted
      FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
      GROUP BY user_id),
    cells AS (
      SELECT variant,
             CAST(COUNT(*) AS BIGINT) AS n_users,
             CAST(SUM(converted) AS BIGINT) AS n_converted
      FROM u GROUP BY variant),
    w AS (
      SELECT a.n_users AS n_a, a.n_converted AS c_a,
             b.n_users AS n_b, b.n_converted AS c_b
      FROM cells a JOIN cells b ON a.variant = 0 AND b.variant = 1)
    SELECT n_a, c_a, n_b, c_b,
           round(CAST(c_a AS DOUBLE) / n_a, 6) AS rate_a,
           round(CAST(c_b AS DOUBLE) / n_b, 6) AS rate_b,
           round(CAST(c_b AS DOUBLE) / n_b - CAST(c_a AS DOUBLE) / n_a, 6)
             AS lift_abs,
           round((CAST(c_b AS DOUBLE) / n_b - CAST(c_a AS DOUBLE) / n_a)
                 / nullif(sqrt((CAST(c_a + c_b AS DOUBLE) / (n_a + n_b))
                        * (1.0e0 - CAST(c_a + c_b AS DOUBLE) / (n_a + n_b))
                        * (1.0e0 / n_a + 1.0e0 / n_b)), 0.0e0), 6) AS z_score
    FROM w
    """,
    tags=("aggregate", "statistics", "abtest"),
)
def agg_proportion_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test — the A/B-test readout for binary
    outcomes (did the user activate: first purchase within 24h of
    first contact), complementing agg_welch_ttest's mean comparison:
    users hash-split 50/50 into variants, per-variant conversion
    rates, absolute lift, and the pooled-variance z-score (NULL when
    the pooled rate is degenerate 0 or 1).

    Exactness: conversion counts are integers from a deterministic
    md5 gate; rates/lift/z are one identical double expression tree
    rounded to 6 (sqrt is correctly-rounded IEEE in both engines).
    Scale: one user-level aggregate (map-side combinable), then a
    2-row cell table — the z-score math never touches the event
    stream."""
    e = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    )
    u = e.groupBy("user_id").agg(
        F.when(
            F.min(F.when(F.col("event_type") == "purchase", F.col("ts")))
            < F.min("ts") + F.expr("INTERVAL 24 HOURS"),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("converted")
    ).select(
        (
            F.conv(
                F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10
            ).cast("bigint")
            % 2
        ).alias("variant"),
        "converted",
    )
    cells = u.groupBy("variant").agg(
        F.count("*").cast("bigint").alias("n_users"),
        F.sum("converted").cast("bigint").alias("n_converted"),
    )
    a = cells.filter(F.col("variant") == 0).select(
        F.col("n_users").alias("n_a"), F.col("n_converted").alias("c_a")
    )
    b = cells.filter(F.col("variant") == 1).select(
        F.col("n_users").alias("n_b"), F.col("n_converted").alias("c_b")
    )
    rate_a = F.col("c_a").cast("double") / F.col("n_a")
    rate_b = F.col("c_b").cast("double") / F.col("n_b")
    pooled = (F.col("c_a") + F.col("c_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    )
    z = (rate_b - rate_a) / F.nullif(
        F.sqrt(
            pooled
            * (F.lit(1.0) - pooled)
            * (F.lit(1.0) / F.col("n_a") + F.lit(1.0) / F.col("n_b"))
        ),
        F.lit(0.0),
    )
    return a.crossJoin(F.broadcast(b)).select(
        "n_a",
        "c_a",
        "n_b",
        "c_b",
        F.round(rate_a, 6).alias("rate_a"),
        F.round(rate_b, 6).alias("rate_b"),
        F.round(rate_b - rate_a, 6).alias("lift_abs"),
        F.round(z, 6).alias("z_score"),
    )


# --- key-skew audit (r10) ---------------------------------------------------

SKEW_TOP_M = 16  # heavy-hitter share depth


@register(
    "events_key_skew_audit",
    oracle=f"""
    WITH c AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS c
      FROM events WHERE user_id IS NOT NULL GROUP BY user_id),
    nulls AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_null_events
      FROM events WHERE user_id IS NULL),
    r AS (
      SELECT c, row_number() OVER (ORDER BY c, user_id) AS rk FROM c),
    tops AS (
      SELECT CAST(COALESCE(SUM(c) FILTER (WHERE tr = 1), 0) AS BIGINT) AS top1,
             CAST(COALESCE(SUM(c) FILTER (WHERE tr <= {SKEW_TOP_M}), 0)
                  AS BIGINT) AS topm
      FROM (SELECT c, row_number() OVER (ORDER BY c DESC, user_id) AS tr
            FROM c)),
    g AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
             CAST(COALESCE(SUM(c), 0) AS BIGINT) AS n_events,
             CAST(COALESCE(SUM(rk * c), 0) AS BIGINT) AS s1
      FROM r)
    SELECT g.n_keys, g.n_events, nulls.n_null_events,
           CASE WHEN g.n_events > 0
                THEN CAST(tops.top1 * 1000000 // g.n_events AS BIGINT) END
             AS top1_share_ppm,
           CASE WHEN g.n_events > 0
                THEN CAST(tops.topm * 1000000 // g.n_events AS BIGINT) END
             AS top{SKEW_TOP_M}_share_ppm,
           CASE WHEN g.n_events > 0 AND g.n_keys > 0
                THEN CAST(round(1000000.0
                       * (2.0 * g.s1 - (g.n_keys + 1.0) * g.n_events)
                       / (1.0 * g.n_keys * g.n_events), 0) AS BIGINT) END
             AS gini_ppm
    FROM g CROSS JOIN tops CROSS JOIN nulls
    """,
    tags=("aggregate", "llm", "skew", "audit"),
)
def events_key_skew_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-shuffle key-skew census: the numbers that decide whether a
    groupBy/join on this key needs salting before it runs at 100 TB —
    exact Gini coefficient of the per-key event counts, the single
    heaviest key's traffic share, and the top-{SKEW_TOP_M} share
    (AQE's skew-join split handles a few hot PARTITIONS; a top-1 share
    in the tens of percent means one KEY floods one task and only
    salting helps). NULL keys are censused separately (they hash to
    one partition too — often the worst offender).

    Exactness: counts and shares are pure integer math (ppm by integer
    division); Gini uses the rank formula
    G = (2·Σ rk·c − (N+1)·Σc) / (N·Σc) over the ascending (count,
    user_id) total order — every intermediate is an exact BIGINT cast
    to double below 2^53 at every tested scale, and both engines
    evaluate the identical IEEE expression, then round to ppm.

    Scale: per-key counts are one hash aggregate; the heavy-hitter
    shares are a TakeOrdered({SKEW_TOP_M}), never a global sort; the
    Gini rank reuses the agg_histogram_equidepth pattern — range
    repartition on (count, user_id), per-partition row_number, plus a
    K-row broadcast of partition offsets — so the exact global rank
    never collapses into a single-partition window."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    nulls = ev.filter(F.col("user_id").isNull()).agg(
        F.count("*").cast("bigint").alias("n_null_events")
    )
    c = (
        ev.filter(F.col("user_id").isNotNull())
        .groupBy("user_id")
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    # heavy-hitter shares: TakeOrdered, never a full sort
    top_rows = c.orderBy(F.col("c").desc(), "user_id").limit(SKEW_TOP_M)
    w_top = Window.orderBy(F.col("c").desc(), "user_id")
    tops = (
        top_rows.withColumn("tr", F.row_number().over(w_top))
        .agg(
            F.coalesce(F.sum(F.when(F.col("tr") == 1, F.col("c"))), F.lit(0))
            .cast("bigint")
            .alias("top1"),
            F.coalesce(F.sum("c"), F.lit(0)).cast("bigint").alias("topm"),
        )
    )
    # exact ascending global rank, distributed (see docstring)
    key = [F.col("c"), F.col("user_id")]
    parts = c.repartitionByRange(*key).withColumn("pid", F.spark_partition_id())
    wp = Window.partitionBy("pid").orderBy(*key)
    local = parts.withColumn("lrn", F.row_number().over(wp))
    pc = parts.groupBy("pid").agg(F.count("*").alias("pn"))
    wo = Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = pc.select(
        "pid", F.coalesce(F.sum("pn").over(wo), F.lit(0)).alias("offset")
    )
    ranked = local.join(F.broadcast(offsets), "pid").select(
        "c", (F.col("lrn") + F.col("offset")).alias("rk")
    )
    g = ranked.agg(
        F.count("*").cast("bigint").alias("n_keys"),
        F.coalesce(F.sum("c"), F.lit(0)).cast("bigint").alias("n_events"),
        F.coalesce(F.sum(F.col("rk") * F.col("c")), F.lit(0))
        .cast("bigint")
        .alias("s1"),
    )
    share = lambda col: F.when(  # noqa: E731
        F.col("n_events") > 0,
        F.expr(f"CAST({col} * 1000000 div n_events AS BIGINT)"),
    )
    gini = F.when(
        (F.col("n_events") > 0) & (F.col("n_keys") > 0),
        F.round(
            1000000.0
            * (2.0 * F.col("s1") - (F.col("n_keys") + 1.0) * F.col("n_events"))
            / (1.0 * F.col("n_keys") * F.col("n_events")),
            0,
        ).cast("bigint"),
    )
    return (
        g.crossJoin(F.broadcast(tops))
        .crossJoin(F.broadcast(nulls))
        .select(
            "n_keys",
            "n_events",
            "n_null_events",
            share("top1").alias("top1_share_ppm"),
            share("topm").alias(f"top{SKEW_TOP_M}_share_ppm"),
            gini.alias("gini_ppm"),
        )
    )


@register(
    "agg_hll_intersection_error_bound",
    oracle="""
    WITH a AS (SELECT DISTINCT o_custkey FROM orders
               WHERE o_orderstatus = 'O' AND o_custkey IS NOT NULL),
    b AS (SELECT DISTINCT o_custkey FROM orders
          WHERE o_orderstatus = 'F' AND o_custkey IS NOT NULL)
    SELECT (SELECT COUNT(*) FROM a) AS exact_a,
           (SELECT COUNT(*) FROM b) AS exact_b,
           (SELECT COUNT(*) FROM (SELECT * FROM a UNION SELECT * FROM b))
             AS exact_union,
           (SELECT COUNT(*) FROM (SELECT * FROM a INTERSECT SELECT * FROM b))
             AS exact_intersection,
           TRUE AS within_bound
    """,
    tags=("aggregate", "approx", "sketch"),
)
def agg_hll_intersection_error_bound(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Sketch-algebra intersection: HLL sketches support union
    natively, so |A∩B| comes from inclusion-exclusion
    (est(A) + est(B) − est(A∪B)) — the standard audience-overlap
    estimate over persisted per-segment sketches. The estimate's
    error compounds three HLL errors, so the certified contract is a
    bound, not the value: the inclusion-exclusion estimate must land
    within 10% of the exact union's size of the exact intersection
    (exact sets: customers with open vs fulfilled orders). The exact
    counts hash-check; the estimate certifies as the boolean.

    Scale: three sketch aggregates over one scan (map-side partial
    merge, O(sketch bytes) per partition) + the exact side's two
    distincts — at 100 TB the sketches are what you persist, and this
    op is the audit that says the persisted algebra is trustworthy."""
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_custkey").isNotNull()
    )
    a = o.filter(F.col("o_orderstatus") == "O")
    b = o.filter(F.col("o_orderstatus") == "F")
    sk = (
        a.agg(F.hll_sketch_agg("o_custkey").alias("ska"))
        .crossJoin(F.broadcast(b.agg(F.hll_sketch_agg("o_custkey").alias("skb"))))
        .select(
            F.hll_sketch_estimate("ska").alias("est_a"),
            F.hll_sketch_estimate("skb").alias("est_b"),
            F.hll_sketch_estimate(
                F.hll_union(F.col("ska"), F.col("skb"))
            ).alias("est_u"),
        )
    )
    exact = (
        a.select("o_custkey")
        .distinct()
        .agg(F.count("*").alias("exact_a"))
        .crossJoin(
            F.broadcast(
                b.select("o_custkey").distinct().agg(F.count("*").alias("exact_b"))
            )
        )
        .crossJoin(
            F.broadcast(
                a.select("o_custkey")
                .union(b.select("o_custkey"))
                .distinct()
                .agg(F.count("*").alias("exact_union"))
            )
        )
        .crossJoin(
            F.broadcast(
                a.select("o_custkey")
                .intersect(b.select("o_custkey"))
                .agg(F.count("*").alias("exact_intersection"))
            )
        )
    )
    return exact.crossJoin(F.broadcast(sk)).select(
        F.col("exact_a").cast("bigint").alias("exact_a"),
        F.col("exact_b").cast("bigint").alias("exact_b"),
        F.col("exact_union").cast("bigint").alias("exact_union"),
        F.col("exact_intersection").cast("bigint").alias("exact_intersection"),
        (
            F.abs(
                (F.col("est_a") + F.col("est_b") - F.col("est_u")).cast("double")
                - F.col("exact_intersection")
            )
            <= 0.1 * F.col("exact_union")
        ).alias("within_bound"),
    )
