"""Core relational operators: projection, filter, scalar expressions.

These are the upstream pipeline ops every user of the reference sink
runs before ``writeStream`` (SURVEY.md §2B: ``selectExpr`` renames at
``HiveStreamingExample.scala:74``, CSV split+cast at ``:69-73``) plus
the full §2C scalar-function surface. All pure DataFrame API —
whole-stage-codegen'd, predicate-pushdown-friendly, no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from ..io import load_table
from ..registry import register
from ._helpers import to_units, ts_str

_Q1_CUTOFF = "2000-12-01 00:00:00"


@register(
    "q1_pricing_summary",
    oracle=f"""
    WITH u AS (
      SELECT l_returnflag, l_linestatus,
             CAST(ROUND(l_quantity * 100, 0) AS BIGINT) AS qty_c,
             CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS ep_c,
             CAST(ROUND(l_discount * 10000, 0) AS BIGINT) AS disc_bp,
             CAST(ROUND(l_tax * 10000, 0) AS BIGINT) AS tax_bp
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '{_Q1_CUTOFF}'),
    v AS (
      SELECT l_returnflag, l_linestatus, qty_c, ep_c, disc_bp,
             CAST(ROUND(ep_c * (10000 - disc_bp) / 10000.0, 0) AS BIGINT) AS disc_c,
             CAST(ROUND(ep_c * (10000 - disc_bp) * (10000 + tax_bp) / 1000000.0, 0)
                  AS BIGINT) AS charge_c
      FROM u)
    SELECT l_returnflag, l_linestatus,
           CAST(CAST(SUM(qty_c) AS BIGINT) AS DOUBLE) / 100.0 AS sum_qty,
           CAST(CAST(SUM(ep_c) AS BIGINT) AS DOUBLE) / 100.0 AS sum_base_price,
           CAST(CAST(SUM(disc_c) AS BIGINT) AS DOUBLE) / 100.0 AS sum_disc_price,
           CAST(CAST(SUM(charge_c) AS BIGINT) AS DOUBLE) / 100.0 AS sum_charge,
           CAST(CAST(SUM(qty_c) AS BIGINT) AS DOUBLE) / 100.0 / COUNT(*) AS avg_qty,
           CAST(CAST(SUM(ep_c) AS BIGINT) AS DOUBLE) / 100.0 / COUNT(*) AS avg_price,
           CAST(CAST(SUM(disc_bp) AS BIGINT) AS DOUBLE) / 10000.0 / COUNT(*) AS avg_disc,
           COUNT(*) AS count_order
    FROM v
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("relational", "aggregate", "flagship"),
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-style pricing summary: filter → hash agg → (driver sorts).

    Scale notes: the l_shipdate predicate is pushed to the parquet scan;
    aggregation is partial+final hash agg (map-side combine) on a
    low-cardinality key — no skew risk. Money/rate columns are encoded
    as exact fixed-point integers (cents / basis points) so the sums
    are order-independent across any partitioning AND stay on the
    long-backed fast path (~4× faster than BigDecimal aggregation;
    derived values like disc_price stay exact integer products).
    """
    li = load_table(spark, sf_dir, "lineitem")
    u = li.filter(F.col("l_shipdate") <= F.lit(_Q1_CUTOFF).cast("timestamp")).select(
        "l_returnflag",
        "l_linestatus",
        to_units("l_quantity", 2).alias("qty_c"),
        to_units("l_extendedprice", 2).alias("ep_c"),
        to_units("l_discount", 4).alias("disc_bp"),
        to_units("l_tax", 4).alias("tax_bp"),
    )
    qty_c, ep_c = F.col("qty_c"), F.col("ep_c")
    disc_f, tax_f = F.lit(10000) - F.col("disc_bp"), F.lit(10000) + F.col("tax_bp")
    # per-line derived money values are rounded to exact cents BEFORE the
    # sum: the per-row integer products fit a long, and the cent sums stay
    # below 2^53 (exactly representable in double) up to ~sf100 — no
    # decimal accumulators, no >2^53 integer→double conversions anywhere.
    v = u.select(
        "l_returnflag",
        "l_linestatus",
        qty_c,
        ep_c,
        F.col("disc_bp"),
        F.round(ep_c * disc_f / 10000.0, 0).cast("bigint").alias("disc_c"),
        F.round(ep_c * disc_f * tax_f / 1000000.0, 0).cast("bigint").alias("charge_c"),
    )
    n = F.count("*")
    return v.groupBy("l_returnflag", "l_linestatus").agg(
        (F.sum(qty_c).cast("double") / 100.0).alias("sum_qty"),
        (F.sum(ep_c).cast("double") / 100.0).alias("sum_base_price"),
        (F.sum("disc_c").cast("double") / 100.0).alias("sum_disc_price"),
        (F.sum("charge_c").cast("double") / 100.0).alias("sum_charge"),
        (F.sum(qty_c).cast("double") / 100.0 / n).alias("avg_qty"),
        (F.sum(ep_c).cast("double") / 100.0 / n).alias("avg_price"),
        (F.sum(F.col("disc_bp")).cast("double") / 10000.0 / n).alias("avg_disc"),
        F.count("*").alias("count_order"),
    )


@register(
    "project_compute",
    oracle="""
    SELECT p_partkey,
           upper(p_name) AS name_upper,
           p_brand || '/' || p_type AS brand_type,
           CAST(ROUND(p_retailprice * 100, 0) AS BIGINT) AS price_cents,
           p_size * 2 AS double_size
    FROM part
    """,
    tags=("relational", "projection"),
)
def project_compute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection + rename + computed columns (§2B-B4 selectExpr surface)."""
    return load_table(spark, sf_dir, "part").select(
        F.col("p_partkey"),
        F.upper("p_name").alias("name_upper"),
        F.concat_ws("/", "p_brand", "p_type").alias("brand_type"),
        F.round(F.col("p_retailprice") * 100, 0).cast("bigint").alias("price_cents"),
        (F.col("p_size") * 2).alias("double_size"),
    )


@register(
    "filter_predicates",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_orderpriority, o_totalprice
    FROM orders
    WHERE o_orderstatus IN ('O', 'F')
      AND o_totalprice BETWEEN 1000 AND 50000
      AND (o_orderpriority LIKE '1-%' OR o_orderpriority LIKE '2-%')
      AND o_custkey IS NOT NULL
    """,
    tags=("relational", "filter"),
)
def filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunction/disjunction, IN, BETWEEN, LIKE, null checks — all
    pushed down to the parquet scan by Catalyst."""
    o = load_table(spark, sf_dir, "orders")
    return o.filter(
        F.col("o_orderstatus").isin("O", "F")
        & F.col("o_totalprice").between(1000, 50000)
        & (F.col("o_orderpriority").like("1-%") | F.col("o_orderpriority").like("2-%"))
        & F.col("o_custkey").isNotNull()
    ).select("o_orderkey", "o_orderstatus", "o_orderpriority", "o_totalprice")


@register(
    "scalar_string_funcs",
    oracle="""
    SELECT c_custkey,
           upper(c_name) AS up,
           lower(c_mktsegment) AS lo,
           length(c_name) AS name_len,
           substr(c_name, 1, 8) AS prefix,
           trim(concat('  ', c_name, '  ')) AS trimmed,
           concat_ws('-', c_mktsegment, CAST(c_nationkey AS VARCHAR)) AS seg_nation,
           regexp_extract(c_name, '([0-9]+)', 1) AS digits,
           regexp_replace(c_name, '[0-9]', '#', 'g') AS masked,
           (c_name LIKE '%1%') AS has_one,
           split_part(c_name, '#', 1) AS name_stem
    FROM customer
    """,
    tags=("relational", "scalar"),
)
def scalar_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function surface (§2C): upper/lower/length/substr/trim/
    concat_ws/regexp_extract/regexp_replace/like/split."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("up"),
        F.lower("c_mktsegment").alias("lo"),
        F.length("c_name").alias("name_len"),
        F.substring("c_name", 1, 8).alias("prefix"),
        F.trim(F.concat(F.lit("  "), F.col("c_name"), F.lit("  "))).alias("trimmed"),
        F.concat_ws("-", F.col("c_mktsegment"), F.col("c_nationkey").cast("string")).alias("seg_nation"),
        F.regexp_extract("c_name", r"([0-9]+)", 1).alias("digits"),
        F.regexp_replace("c_name", r"[0-9]", "#").alias("masked"),
        F.col("c_name").like("%1%").alias("has_one"),
        F.split("c_name", "#").getItem(0).alias("name_stem"),
    )


@register(
    "scalar_datetime_funcs",
    oracle="""
    SELECT o_orderkey,
           year(o_orderdate) AS yr,
           month(o_orderdate) AS mo,
           day(o_orderdate) AS dom,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
           strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS due_date,
           date_diff('day', DATE '1995-01-01', o_orderdate) AS days_since_epoch_start,
           CAST(epoch(o_orderdate) AS BIGINT) AS unix_ts,
           strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS ts_text
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
    """,
    tags=("relational", "scalar"),
)
def scalar_datetime_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time surface: year/month/day, date_trunc, interval add,
    datediff, unix_timestamp, formatting. Timestamps leave as strings
    (determinism rule)."""
    o = load_table(spark, sf_dir, "orders")
    return o.filter(F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp")).select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dom"),
        ts_str(F.date_trunc("month", F.col("o_orderdate")), "yyyy-MM-dd").alias("month_start"),
        ts_str(F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"), "yyyy-MM-dd").alias("due_date"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date")).alias("days_since_epoch_start"),
        F.unix_timestamp("o_orderdate").alias("unix_ts"),
        ts_str("o_orderdate").alias("ts_text"),
    )


@register(
    "scalar_math_funcs",
    oracle="""
    SELECT p_partkey,
           abs(p_retailprice - 1000) AS abs_diff,
           CAST(ceil(p_retailprice) AS BIGINT) AS ceil_p,
           CAST(floor(p_retailprice) AS BIGINT) AS floor_p,
           round(p_retailprice, 1) AS round_p,
           sqrt(CAST(p_size AS DOUBLE)) AS sqrt_size,
           p_retailprice * p_retailprice AS price_sq,
           CAST(p_size % 7 AS INTEGER) AS size_mod,
           round(ln(CAST(p_size AS DOUBLE) + 1), 6) AS log_size,
           round(exp(CAST(p_size AS DOUBLE) / 50), 6) AS exp_size
    FROM part
    """,
    tags=("relational", "scalar"),
)
def scalar_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math surface. sqrt/abs/ceil/floor/* are IEEE-exact in both
    engines; ln/exp are rounded in both (libm vs StrictMath can differ
    in the last ulp)."""
    p = load_table(spark, sf_dir, "part")
    size_d = F.col("p_size").cast("double")
    return p.select(
        "p_partkey",
        F.abs(F.col("p_retailprice") - 1000).alias("abs_diff"),
        F.ceil("p_retailprice").alias("ceil_p"),
        F.floor("p_retailprice").alias("floor_p"),
        F.round("p_retailprice", 1).alias("round_p"),
        F.sqrt(size_d).alias("sqrt_size"),
        (F.col("p_retailprice") * F.col("p_retailprice")).alias("price_sq"),
        (F.col("p_size") % 7).cast("int").alias("size_mod"),
        F.round(F.log(size_d + 1), 6).alias("log_size"),
        F.round(F.exp(size_d / 50), 6).alias("exp_size"),
    )


@register(
    "conditional_funcs",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN 'debt'
                WHEN c_acctbal < 5000 THEN 'mid'
                ELSE 'rich' END AS balance_band,
           coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS seg_or_other,
           greatest(c_acctbal, 0.0) AS bal_floor0,
           least(CAST(c_nationkey AS BIGINT), c_custkey) AS min_key,
           (CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END) IS NULL AS bal_is_null
    FROM customer
    """,
    tags=("relational", "scalar"),
)
def conditional_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """when/otherwise, coalesce, nullif, greatest, least, null predicates."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, "debt")
        .when(F.col("c_acctbal") < 5000, "mid")
        .otherwise("rich")
        .alias("balance_band"),
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("OTHER")).alias(
            "seg_or_other"
        ),
        F.greatest(F.col("c_acctbal"), F.lit(0.0)).alias("bal_floor0"),
        F.least(F.col("c_nationkey").cast("bigint"), F.col("c_custkey")).alias("min_key"),
        F.when(F.col("c_acctbal") < 0, F.lit(None).cast("double"))
        .otherwise(F.col("c_acctbal"))
        .isNull()
        .alias("bal_is_null"),
    )


@register(
    "cast_try_cast",
    oracle="""
    WITH c AS (
      SELECT *, CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS price_c
      FROM orders)
    SELECT o_orderkey,
           CAST(o_orderkey AS VARCHAR) AS key_str,
           CAST(price_c // 100 AS VARCHAR) || '.' ||
             lpad(CAST(price_c % 100 AS VARCHAR), 2, '0') AS price_str,
           TRY_CAST(o_orderpriority AS INTEGER) AS prio_int,
           TRY_CAST(split_part(o_orderpriority, '-', 1) AS INTEGER) AS prio_rank,
           strftime(o_orderdate, '%Y-%m-%d') AS order_date
    FROM c
    """,
    tags=("relational", "scalar"),
)
def cast_try_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cast / try_cast surface; try_cast of non-numeric text → NULL in
    both engines (ANSI-safe path).

    Determinism: the raw double is rounded to exact integer cents FIRST
    (registry.py rule — Spark's double→decimal cast rounds HALF_UP,
    DuckDB's half-to-even, so half-cent-boundary rows diverge); the
    string form is then derived from the integer, which both engines
    parse exactly. Output carries no DECIMAL or DATE columns: both
    hash-diverged under the driver's canonicalizer for 4 straight
    rounds despite value-identical results, so the money column ships
    as its exact string form and the date as yyyy-MM-dd text.
    """
    o = load_table(spark, sf_dir, "orders")
    price_c = to_units("o_totalprice", 2)
    price_str = F.concat(
        (price_c / 100).cast("bigint").cast("string"),
        F.lit("."),
        F.lpad((price_c % 100).cast("string"), 2, "0"),
    )
    return o.select(
        "o_orderkey",
        F.col("o_orderkey").cast("string").alias("key_str"),
        price_str.alias("price_str"),
        F.expr("try_cast(o_orderpriority AS INT)").alias("prio_int"),
        F.expr("try_cast(split(o_orderpriority, '-')[0] AS INT)").alias("prio_rank"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
    )


@register(
    "filter_null_safe_eq",
    oracle="""
    WITH t AS (
      SELECT o_orderkey,
             CASE WHEN o_orderstatus = 'P' THEN NULL ELSE o_orderstatus END AS maybe_status
      FROM orders)
    SELECT o_orderkey, maybe_status,
           maybe_status IS NOT DISTINCT FROM 'O' AS is_open,
           maybe_status IS NOT DISTINCT FROM NULL AS is_nullish
    FROM t
    WHERE maybe_status IS DISTINCT FROM 'F'
    """,
    tags=("relational", "filter"),
)
def filter_null_safe_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality (<=> / IS NOT DISTINCT FROM) in projection and
    filter position — NULLs compare as values, not unknowns."""
    o = load_table(spark, sf_dir, "orders")
    maybe = F.when(F.col("o_orderstatus") == "P", F.lit(None).cast("string")).otherwise(
        F.col("o_orderstatus")
    )
    return (
        o.select("o_orderkey", maybe.alias("maybe_status"))
        .filter(~F.col("maybe_status").eqNullSafe(F.lit("F")))
        .select(
            "o_orderkey",
            "maybe_status",
            F.col("maybe_status").eqNullSafe(F.lit("O")).alias("is_open"),
            F.col("maybe_status").eqNullSafe(F.lit(None).cast("string")).alias("is_nullish"),
        )
    )


@register(
    "sql_group_by_all_topk",
    oracle="""
    WITH seg AS (
      SELECT c_mktsegment,
             c_nationkey,
             COUNT(*) AS n_cust,
             CAST(CAST(SUM(CAST(ROUND(c_acctbal * 100, 0) AS BIGINT)) AS BIGINT)
                  AS DOUBLE) / 100.0 AS total_bal
      FROM customer
      GROUP BY ALL)
    SELECT c_mktsegment, c_nationkey, n_cust, total_bal
    FROM (SELECT *, row_number() OVER (PARTITION BY c_mktsegment
                                       ORDER BY n_cust DESC, c_nationkey) AS rn
          FROM seg)
    WHERE rn <= 2
    """,
    tags=("relational", "sql"),
)
def sql_group_by_all_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Modern SQL surface: GROUP BY ALL (group on every non-aggregate
    select item, Spark 3.4+/DuckDB) feeding a windowed top-k — the same
    text runs in both engines (Spark SQL has no QUALIFY, so the window
    filter is a subquery). Top-2 nations per market segment by customer
    count; execution is the standard partial+final agg →
    WindowGroupLimit top-k."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("_q_customer")
    return spark.sql(
        """
        WITH seg AS (
          SELECT c_mktsegment,
                 c_nationkey,
                 COUNT(*) AS n_cust,
                 CAST(CAST(SUM(CAST(ROUND(c_acctbal * 100, 0) AS BIGINT)) AS BIGINT)
                      AS DOUBLE) / 100.0 AS total_bal
          FROM _q_customer
          GROUP BY ALL)
        SELECT c_mktsegment, c_nationkey, n_cust, total_bal
        FROM (SELECT *, row_number() OVER (PARTITION BY c_mktsegment
                                           ORDER BY n_cust DESC, c_nationkey) AS rn
              FROM seg)
        WHERE rn <= 2
        """
    )


@register(
    "sql_lateral_view",
    oracle="""
    SELECT doc_id, tok, COUNT(*) AS n
    FROM (SELECT doc_id, unnest(string_split(trim(text), ' ')) AS tok
          FROM documents)
    WHERE length(tok) >= 8
    GROUP BY doc_id, tok
    """,
    tags=("relational", "sql"),
)
def sql_lateral_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL VIEW explode in SQL (HiveQL-compatible syntax the
    reference's users write upstream of the sink) — long-token counts
    per document."""
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("_lv_documents")
    return spark.sql(
        """
        SELECT doc_id, tok, COUNT(*) AS n
        FROM _lv_documents
        LATERAL VIEW explode(split(trim(text), ' ')) t AS tok
        WHERE length(tok) >= 8
        GROUP BY doc_id, tok
        """
    )


@register(
    "date_spine_fill",
    oracle="""
    WITH bounds AS (
      SELECT CAST(MIN(o_orderdate) AS DATE) AS d0,
             CAST(MAX(o_orderdate) AS DATE) AS d1 FROM orders),
    spine AS (
      SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day
      FROM bounds),
    daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day, COUNT(*) AS n
      FROM orders GROUP BY 1)
    SELECT strftime(spine.day, '%Y-%m-%d') AS day,
           COALESCE(daily.n, 0) AS n_orders
    FROM spine LEFT JOIN daily ON spine.day = daily.day
    """,
    tags=("relational", "generator"),
)
def date_spine_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-spine gap filling: generate every calendar day between the
    first and last order (sequence + explode — a generator, not a
    table scan) and left-join daily counts so missing days appear as
    zero. The spine is tiny (one row per day) and broadcast; the
    pattern every time-series rollup needs before charting/windowing."""
    o = load_table(spark, sf_dir, "orders")
    bounds = o.agg(
        F.min(F.to_date("o_orderdate")).alias("d0"),
        F.max(F.to_date("o_orderdate")).alias("d1"),
    )
    spine = bounds.select(
        F.explode(F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))).alias("day")
    )
    daily = o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.count("*").alias("n")
    )
    return (
        F.broadcast(spine)
        .join(daily, "day", "left")
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.coalesce(F.col("n"), F.lit(0)).alias("n_orders"),
        )
    )


@register(
    "scalar_string_funcs_extra",
    oracle="""
    SELECT doc_id,
           CASE WHEN text IS NULL THEN NULL
                -- DuckDB's array_to_string([]) is NULL, Spark's
                -- array_join([]) is '': align the no-match case to ''
                ELSE COALESCE(array_to_string(
                       regexp_extract_all(text, '[a-z]{8,}'), ','), '')
           END AS long_words,
           lpad(CAST(doc_id AS VARCHAR), 8, '0') AS padded_id,
           rpad(substr(text, 1, 5), 8, '.') AS head_padded,
           repeat('-', 2 + CAST(doc_id % 3 AS INTEGER)) AS rule,
           translate(substr(text, 1, 20), 'aeiou', '     ') AS devoweled,
           reverse(substr(text, 1, 10)) AS head_rev,
           CASE WHEN lang IS NOT NULL AND n_chars IS NOT NULL
                THEN printf('%s:%d', lang, n_chars) END AS lang_tag
    FROM documents
    """,
    tags=("relational", "scalar"),
)
def scalar_string_funcs_extra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second string-surface query: regexp_extract_all, lpad/rpad,
    repeat, translate, reverse, format_string/printf — rounding out the
    §2C string list (all JVM built-ins, codegen'd)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.array_join(
            F.regexp_extract_all("text", F.lit("[a-z]{8,}"), 0), ","
        ).alias("long_words"),
        F.lpad(F.col("doc_id").cast("string"), 8, "0").alias("padded_id"),
        F.rpad(F.substring("text", 1, 5), 8, ".").alias("head_padded"),
        F.repeat(F.lit("-"), (F.lit(2) + (F.col("doc_id") % 3)).cast("int")).alias(
            "rule"
        ),
        F.translate(F.substring("text", 1, 20), "aeiou", "     ").alias("devoweled"),
        F.reverse(F.substring("text", 1, 10)).alias("head_rev"),
        # format_string renders NULL args as the string 'null' instead of
        # propagating NULL (DuckDB's printf propagates): guard both engines
        F.when(
            F.col("lang").isNotNull() & F.col("n_chars").isNotNull(),
            F.format_string("%s:%d", "lang", "n_chars"),
        ).alias("lang_tag"),
    )


@register(
    "sql_recursive_cte",
    oracle="""
    WITH RECURSIVE chain(c_custkey, depth) AS (
      SELECT c_custkey, 0 FROM customer WHERE c_custkey < 10
      UNION ALL
      SELECT c.c_custkey, chain.depth + 1
      FROM customer c JOIN chain ON c.c_custkey // 10 = chain.c_custkey
      WHERE c.c_custkey >= 10)
    SELECT depth, COUNT(*) AS n,
           MIN(c_custkey) AS min_key, MAX(c_custkey) AS max_key
    FROM chain GROUP BY depth
    """,
    tags=("relational", "sql", "iterative"),
)
def sql_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4.1 WITH RECURSIVE): walk a synthetic
    management chain (each customer reports to custkey÷10) from the
    roots down and roll up population per depth — the org-hierarchy /
    bill-of-materials shape. Each recursion step is a plain equi-join
    against the base relation (shuffle-or-broadcast per Catalyst), and
    the depth is bounded by log₁₀(max key), not data volume — the
    pattern stays executable at 100 TB because the per-step frontier,
    not the recursion, carries the data."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("_rc_customer")
    return spark.sql(
        """
        WITH RECURSIVE chain(c_custkey, depth) AS (
          SELECT c_custkey, 0 FROM _rc_customer WHERE c_custkey < 10
          UNION ALL
          SELECT c.c_custkey, chain.depth + 1
          FROM _rc_customer c JOIN chain ON c.c_custkey DIV 10 = chain.c_custkey
          WHERE c.c_custkey >= 10)
        SELECT depth, COUNT(*) AS n,
               MIN(c_custkey) AS min_key, MAX(c_custkey) AS max_key
        FROM chain GROUP BY depth
        """
    )


@register(
    "sql_table_valued_functions",
    oracle="""
    WITH r AS (SELECT unnest(generate_series(0, 99)) AS id),
    v(code, label) AS (VALUES ('O', 'open'), ('F', 'finished'), ('P', 'pending'))
    SELECT label,
           COUNT(*) AS n,
           CAST(SUM(id) AS BIGINT) AS id_sum
    FROM r JOIN v ON (id % 3) = CASE code WHEN 'O' THEN 0 WHEN 'F' THEN 1 ELSE 2 END
    GROUP BY label
    """,
    tags=("relational", "sql", "generator"),
)
def sql_table_valued_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table-valued functions and inline tables: range() generator
    joined to a VALUES relation — the no-input-table surface (test
    scaffolding, spine generation, enum decoding). range() parallelizes
    across the cluster (it's a real distributed relation, not a driver
    loop)."""
    return spark.sql(
        """
        WITH v(code, label) AS (VALUES ('O', 'open'), ('F', 'finished'), ('P', 'pending'))
        SELECT label,
               COUNT(*) AS n,
               CAST(SUM(id) AS BIGINT) AS id_sum
        FROM range(100) r JOIN v
          ON (id % 3) = CASE code WHEN 'O' THEN 0 WHEN 'F' THEN 1 ELSE 2 END
        GROUP BY label
        """
    )


@register(
    "sql_pipe_syntax",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_urgent_orders,
           CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
             AS cents_total
    FROM orders
    WHERE o_orderstatus = 'O'
    GROUP BY o_orderpriority
    HAVING COUNT(*) > 10
    """,
    tags=("sql", "surface"),
)
def sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL pipe syntax (Spark 4.0+, SPARK-45362): the same
    filter → aggregate → having pipeline written as |> stages —
    FROM orders |> WHERE ... |> AGGREGATE ... GROUP BY ... |> WHERE.
    Pipe operators compile to the identical logical plan as the ANSI
    form (the oracle), so this pins both the parser surface and the
    plan equivalence. Money sums ride exact integer cents."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "orders_pipe_view"
    )
    return spark.sql(
        """
        FROM orders_pipe_view
        |> WHERE o_orderstatus = 'O'
        |> AGGREGATE CAST(COUNT(*) AS BIGINT) AS n_urgent_orders,
                     CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                          AS BIGINT) AS cents_total
           GROUP BY o_orderpriority
        |> WHERE n_urgent_orders > 10
        |> SELECT o_orderpriority, n_urgent_orders, cents_total
        """
    )


@register(
    "sql_distribute_cluster_by",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_returnflag,
           CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS price_cents
    FROM lineitem WHERE l_orderkey % 100 = 0
    """,
    tags=("sql", "surface", "hive"),
)
def sql_distribute_cluster_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HiveQL physical-layout surface: CLUSTER BY (= DISTRIBUTE BY +
    SORT BY on the same key) — the syntax Hive users of the reference
    sink write to control partition placement before a bucketed write.
    The result SET is identical to the plain projection (the oracle);
    what CLUSTER BY adds is plan shape — a hash-partition Exchange plus
    a partition-local Sort, exactly what feeds a bucketed/sorted table
    write without a global sort.

    Scale: the Exchange is the explicit repartition a layout-control
    write wants anyway; SORT BY stays partition-local (never a single-
    partition global sort)."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "lineitem_cluster_view"
    )
    return spark.sql(
        """
        SELECT l_orderkey, l_linenumber, l_returnflag,
               CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS price_cents
        FROM lineitem_cluster_view
        WHERE l_orderkey % 100 = 0
        CLUSTER BY l_returnflag
        """
    )


@register(
    "sql_parameterized_query",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(MIN(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
             AS min_cents,
           CAST(MAX(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
             AS max_cents
    FROM orders
    WHERE o_totalprice BETWEEN 1000.0 AND 150000.0
      AND o_orderstatus = 'F'
    GROUP BY o_orderpriority
    """,
    tags=("sql", "surface"),
)
def sql_parameterized_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parameterized SQL (Spark 3.4+/4.x named parameter markers): the
    query text carries :lo/:hi/:status placeholders and the values
    bind at execution — the injection-safe templating surface an
    application layer uses instead of string concatenation. Binding
    happens in the parser, so the bound plan is byte-identical to the
    literal form (the oracle) — constant folding, pushdown, and
    partition pruning all see real literals.

    Scale: identical to the literal query — one scan with the BETWEEN
    and status filters pushed to parquet, one partial+final agg."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "orders_param_view"
    )
    return spark.sql(
        """
        SELECT o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(MIN(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
                 AS min_cents,
               CAST(MAX(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
                 AS max_cents
        FROM orders_param_view
        WHERE o_totalprice BETWEEN :lo AND :hi
          AND o_orderstatus = :status
        GROUP BY o_orderpriority
        """,
        args={"lo": 1000.0, "hi": 150000.0, "status": "F"},
    )


@register(
    "join_lateral_correlated",
    oracle="""
    SELECT o.o_orderkey, t.l_linenumber, t.cents
    FROM orders o, LATERAL (
      SELECT l_linenumber,
             CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS cents
      FROM lineitem WHERE l_orderkey = o.o_orderkey
      ORDER BY cents DESC, l_linenumber LIMIT 1) t
    WHERE o.o_orderkey % 500 = 0
    """,
    tags=("sql", "join", "surface"),
)
def join_lateral_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery join (SQL:99 LATERAL, Spark 3.2+):
    for each order, its single most expensive line item — the
    top-1-per-key pattern written the way an application developer
    ports it from Postgres. Spark decorrelates the LATERAL into a
    window/aggregate + join under the hood, so the plan is the same
    one window_topk_per_group gets — no per-row re-execution of the
    inner query (which is how a naive engine runs LATERAL and why it
    dies at scale). The deterministic ORDER BY (cents, linenumber)
    LIMIT 1 makes the picked row unique.

    Scale: decorrelation turns this into one lineitem shuffle on
    l_orderkey + a join with orders — no nested-loop, no iteration."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_lat_v")
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "lineitem_lat_v"
    )
    return spark.sql(
        """
        SELECT o.o_orderkey, t.l_linenumber, t.cents
        FROM orders_lat_v o, LATERAL (
          SELECT l_linenumber,
                 CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS cents
          FROM lineitem_lat_v WHERE l_orderkey = o.o_orderkey
          ORDER BY cents DESC, l_linenumber LIMIT 1) t
        WHERE o.o_orderkey % 500 = 0
        """
    )


@register(
    "scalar_try_functions",
    oracle="""
    SELECT event_id,
           CASE WHEN (event_id % 5) = 0 THEN NULL
                ELSE round(value / (event_id % 5), 6) END AS safe_div,
           CASE WHEN event_id > 0 THEN NULL
                ELSE 9223372036854775807 + event_id END AS safe_add_overflow,
           string_split(event_type, '_')[10] AS safe_elem_oob,
           strftime(try_strptime(CASE WHEN event_id % 2 = 0
                                      THEN '2024-01-15'
                                      ELSE 'not-a-date' END, '%Y-%m-%d'),
                    '%Y-%m-%d') AS safe_ts
    FROM events WHERE event_id % 17 = 0
    """,
    tags=("scalar", "surface"),
)
def scalar_try_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ANSI-mode error-handling surface: try_divide (zero divisor
    -> NULL instead of DIVIDE_BY_ZERO), try_add (bigint overflow ->
    NULL instead of ARITHMETIC_OVERFLOW), try_element_at (out-of-range
    index -> NULL), try_to_timestamp (unparseable -> NULL). Spark 4
    runs ANSI-on by default, so these are how production pipelines
    express 'null, don't abort' per-expression — the row-level
    companion to cast_try_cast. The oracle states the same semantics
    with explicit guards (DuckDB nulls OOB list access and has
    try_strptime natively).

    Scale: pure map-side projection — the try_ variants codegen the
    guard inline, no exception machinery on the hot path."""
    e = load_table(spark, sf_dir, "events")
    return e.filter(F.col("event_id") % 17 == 0).select(
        "event_id",
        F.round(F.try_divide("value", F.col("event_id") % 5), 6).alias("safe_div"),
        F.try_add(F.lit(9223372036854775807), F.col("event_id")).alias(
            "safe_add_overflow"
        ),
        F.try_element_at(F.split("event_type", "_"), F.lit(10)).alias(
            "safe_elem_oob"
        ),
        F.date_format(
            F.try_to_timestamp(
                F.when(F.col("event_id") % 2 == 0, "2024-01-15").otherwise(
                    "not-a-date"
                ),
                F.lit("yyyy-MM-dd"),
            ),
            "yyyy-MM-dd",
        ).alias("safe_ts"),
    )
