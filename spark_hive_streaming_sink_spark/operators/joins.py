"""Join operators (SURVEY.md §2C): every join type a pipeline feeding
the sink can need, each with its 100 TB posture noted.

Broadcast hints go on genuinely small sides (region/nation: O(100)
rows at any SF). Fact-fact joins shuffle on their equi keys and rely
on AQE for skew splitting; the as-of join uses the union+window
single-pass pattern instead of a quadratic range join.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession, Window
import pyspark.sql.functions as F

from ..io import load_table
from ..registry import register
from ._helpers import dec, dsum, sql_dsum, ts_str


@register(
    "join_inner_broadcast",
    oracle="""
    SELECT r_name AS region, n_name AS nation,
           COUNT(*) AS n_customers,
           (CAST(SUM(CAST(ROUND(c_acctbal * 100, 0) AS BIGINT)) AS DOUBLE) / 100.0) AS total_bal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    """,
    tags=("join",),
)
def join_inner_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join with explicitly broadcast dimension tables —
    at 100 TB the fact side never shuffles for dim joins."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(F.count("*").alias("n_customers"), dsum("c_acctbal", 2).alias("total_bal"))
    )


@register(
    "join_left_outer",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           COUNT(o_orderkey) AS n_orders,
           CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 0) AS DOUBLE) AS total_spent
    FROM customer LEFT JOIN orders ON o_custkey = c_custkey
    GROUP BY c_custkey, c_mktsegment
    """,
    tags=("join",),
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join keeping customers with zero orders."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_mktsegment")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(F.sum(dec("o_totalprice", 18, 2)), F.lit(0).cast("decimal(28,2)"))
            .cast("double")
            .alias("total_spent"),
        )
    )


@register(
    "join_right_outer",
    oracle="""
    SELECT c_custkey,
           COALESCE(strftime(MAX(o_orderdate), '%Y-%m-%d'), 'never') AS last_order_day
    FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
    GROUP BY c_custkey
    """,
    tags=("join",),
)
def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right outer join (fact on the left, dim kept on the right)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        o.join(c, o.o_custkey == c.c_custkey, "right")
        .groupBy("c_custkey")
        .agg(F.coalesce(ts_str(F.max("o_orderdate"), "yyyy-MM-dd"), F.lit("never")).alias("last_order_day"))
    )


@register(
    "join_full_outer",
    oracle="""
    WITH b AS (SELECT DISTINCT c_nationkey AS k FROM customer),
         s AS (SELECT DISTINCT s_nationkey AS k FROM supplier)
    SELECT COALESCE(b.k, s.k) AS nationkey,
           (b.k IS NOT NULL) AS has_customers,
           (s.k IS NOT NULL) AS has_suppliers
    FROM b FULL OUTER JOIN s ON b.k = s.k
    """,
    tags=("join",),
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join over two distinct key sets."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("bk")).distinct()
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("sk")).distinct()
    return c.join(s, c.bk == s.sk, "outer").select(
        F.coalesce("bk", "sk").alias("nationkey"),
        F.col("bk").isNotNull().alias("has_customers"),
        F.col("sk").isNotNull().alias("has_suppliers"),
    )


@register(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000)
    """,
    tags=("join",),
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left semi join — EXISTS without duplicating the left side."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 100000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@register(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_mktsegment FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 150000)
    """,
    tags=("join",),
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left anti join — NOT EXISTS (customers with no six-figure order;
    the filtered right side keeps the result non-trivial at every SF)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 150000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_mktsegment")


@register(
    "join_theta_range",
    oracle=f"""
    SELECT o_orderpriority,
           COUNT(*) AS n_late,
           {sql_dsum('l_extendedprice', 2)} AS late_value
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                 AND l_shipdate > o_orderdate + INTERVAL 60 DAY
    GROUP BY o_orderpriority
    """,
    tags=("join",),
)
def join_theta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi + range (theta) join condition: line items shipped >60 days
    after their order date. The equi key keeps it a hash/sort-merge
    join (the range predicate is a post-join filter, not a nested-loop
    explosion)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    return (
        li.join(
            o,
            (li.l_orderkey == o.o_orderkey)
            & (li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_late"), dsum("l_extendedprice", 2).alias("late_value"))
    )


@register(
    "join_cross",
    oracle="""
    SELECT r_name, st AS status, r_name || ':' || st AS label
    FROM region CROSS JOIN (SELECT DISTINCT o_orderstatus AS st FROM orders)
    """,
    tags=("join",),
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross join of two tiny sets (never do this between facts)."""
    r = load_table(spark, sf_dir, "region")
    st = load_table(spark, sf_dir, "orders").select(F.col("o_orderstatus").alias("status")).distinct()
    return r.crossJoin(st).select(
        "r_name", "status", F.concat_ws(":", "r_name", "status").alias("label")
    )


@register(
    "join_asof",
    oracle="""
    -- ts/user guards in BOTH engines: DuckDB's ASOF matches by SORT
    -- ORDER (a NULL-ts probe pairs with the last click) while the
    -- window formulation drops NULL comparisons; an as-of needs a real
    -- timestamp and entity key, so both are excluded explicitly
    WITH purch AS (SELECT event_id, user_id, ts FROM events
                   WHERE event_type = 'purchase'
                     AND ts IS NOT NULL AND user_id IS NOT NULL),
         clicks AS (SELECT user_id, ts FROM events
                    WHERE event_type = 'click'
                      AND ts IS NOT NULL AND user_id IS NOT NULL)
    SELECT p.event_id, p.user_id,
           strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
           strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS prior_click_ts,
           CAST(epoch_us(p.ts) - epoch_us(c.ts) AS BIGINT) AS gap_us
    FROM purch p ASOF JOIN clicks c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
    tags=("join", "asof"),
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (nearest prior click per purchase, per user).

    Spark lacks a native ASOF JOIN; the scalable pattern is a single
    sort within user partitions (union both sides, running MAX of
    click time over an ordered window) — one shuffle, no quadratic
    candidate pairs, works at any skew because a user's history is one
    partition's worth of state. Oracle uses DuckDB's native ASOF JOIN
    (inner semantics: purchases with no prior click are dropped).
    """
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "click")
        & F.col("ts").isNotNull()
        & F.col("user_id").isNotNull()  # mirrors the oracle's guards
    )
    # clicks sort BEFORE purchases at equal ts: DuckDB's ASOF predicate
    # is inclusive (p.ts >= c.ts), so a click at exactly the purchase's
    # timestamp IS a prior click regardless of event_id — found by the
    # NULL-pattern fuzzer (tests/test_null_fuzz.py), impossible on the
    # tie-free fixtures
    clicks_first = F.when(F.col("event_type") == "click", 0).otherwise(1)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", clicks_first, "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    click_ts = F.when(F.col("event_type") == "click", F.col("ts"))
    return (
        e.withColumn("prior_click", F.max(click_ts).over(w))
        .filter((F.col("event_type") == "purchase") & F.col("prior_click").isNotNull())
        .select(
            "event_id",
            "user_id",
            ts_str("ts").alias("purchase_ts"),
            ts_str("prior_click").alias("prior_click_ts"),
            (F.unix_micros(F.col("ts")) - F.unix_micros(F.col("prior_click"))).alias("gap_us"),
        )
    )


@register(
    "join_null_safe_key",
    oracle="""
    WITH l AS (
      SELECT o_orderkey, CASE WHEN o_custkey % 50 = 0 THEN NULL ELSE o_custkey END AS k
      FROM orders),
    r AS (
      SELECT CASE WHEN c_custkey % 50 = 0 THEN NULL ELSE c_custkey END AS k,
             c_mktsegment
      FROM customer)
    SELECT (l.k IS NULL) AS null_key, COUNT(*) AS n_pairs,
           COUNT(DISTINCT o_orderkey) AS n_orders
    FROM l JOIN r ON l.k IS NOT DISTINCT FROM r.k
    GROUP BY 1
    """,
    tags=("join", "null-semantics"),
)
def join_null_safe_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality (<=>) as the JOIN KEY: NULL matches NULL, so
    the null-keyed rows pair up instead of silently vanishing (a plain
    equi join drops every NULL key — three-valued logic again). Spark
    plans <=> as a hash-join key like any other; the NULL bucket is a
    single hot key, which is exactly why production pipelines filter or
    salt it — here it stays small by construction."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.when(F.col("o_custkey") % 50 == 0, None)
        .otherwise(F.col("o_custkey"))
        .alias("lk"),
    )
    c = load_table(spark, sf_dir, "customer").select(
        F.when(F.col("c_custkey") % 50 == 0, None)
        .otherwise(F.col("c_custkey"))
        .alias("rk"),
        "c_mktsegment",
    )
    return (
        o.join(c, o.lk.eqNullSafe(c.rk))
        .groupBy(F.col("lk").isNull().alias("null_key"))
        .agg(
            F.count("*").alias("n_pairs"),
            F.countDistinct("o_orderkey").alias("n_orders"),
        )
    )


@register(
    "join_bucketed_colocated",
    oracle="""
    SELECT o.o_orderkey, o.o_custkey, c.c_name, c.c_mktsegment, o.o_totalprice
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE o.o_totalprice > 300000
    """,
    tags=("join", "bucketed", "materialize"),
)
def join_bucketed_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed co-located join — the 100 TB shuffle-elimination
    technique for repeated fact↔dim joins: both sides are written
    ``bucketBy(N, join_key)`` + ``sortBy`` once, after which EVERY
    join on that key runs with ZERO Exchange (bucket pruning pairs
    file-bucket i with file-bucket i; the sortBy makes it a zip merge).
    On a petabyte warehouse this turns the nightly orders↔customer
    join from the dominant shuffle into a local merge per bucket —
    the write cost is paid once, amortized over every downstream run.

    The builder materializes the bucketed tables into the session
    warehouse (idempotent per sf_dir via a content tag, OVERWRITE on
    re-run) and joins with a merge hint so the plan shape is the
    bucketed sort-merge even where size stats would pick broadcast;
    ``tests/test_plans.py::test_bucketed_join_has_zero_exchange``
    pins Exchange == 0. Results are storage-invariant (oracle joins
    the plain parquet).
    """
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    names = {}
    for tbl, key in (("orders", "o_custkey"), ("customer", "c_custkey")):
        names[tbl] = f"bkt_{tbl}_{tag}"
        if not spark.catalog.tableExists(names[tbl]):
            # external location (not the managed warehouse): a stale
            # managed-table directory from a previous session would make
            # CREATE fail with LOCATION_ALREADY_EXISTS; an external path
            # with overwrite is restart-safe
            # repartition on the bucket key first → exactly ONE file per
            # bucket; with >1 file per bucket Spark must re-Sort inside
            # each bucket at read time and only the Exchange is saved
            (
                load_table(spark, sf_dir, tbl)
                .repartition(8, F.col(key))
                .write.bucketBy(8, key)
                .sortBy(key)
                .mode("overwrite")
                .format("parquet")
                .option("path", f"/tmp/shss_bucketed/{tag}/{tbl}")
                .saveAsTable(names[tbl])
            )
    # with exactly one file per bucket, the sortBy metadata satisfies the
    # merge join's ordering requirement — but only under this (runtime-
    # settable, bucketed-scans-only) conf; default Spark re-sorts each
    # bucket locally even when the files are sorted
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    o = spark.table(names["orders"]).filter(F.col("o_totalprice") > 300000)
    c = spark.table(names["customer"])
    return (
        o.hint("merge")
        .join(c, o.o_custkey == c.c_custkey)
        .select("o_orderkey", "o_custkey", "c_name", "c_mktsegment", "o_totalprice")
    )


@register(
    "join_asof_tolerance",
    oracle="""
    WITH purch AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
         clicks AS (SELECT user_id, ts FROM events WHERE event_type = 'click')
    SELECT p.event_id, p.user_id,
           strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
           CASE WHEN epoch_us(p.ts) - epoch_us(c.ts) <= 1800000000
                THEN strftime(c.ts, '%Y-%m-%d %H:%M:%S') END AS prior_click_ts,
           CASE WHEN epoch_us(p.ts) - epoch_us(c.ts) <= 1800000000
                THEN CAST(epoch_us(p.ts) - epoch_us(c.ts) AS BIGINT) END AS gap_us
    FROM purch p ASOF LEFT JOIN clicks c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
    tags=("join", "asof"),
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join, LEFT + tolerance variant (pandas merge_asof
    semantics): every purchase is kept; the nearest prior click counts
    only if it is within 30 minutes, else the match columns are NULL.
    Same single-sort window plan as join_asof — the tolerance is a
    post-match predicate, not a join-shape change, which is exactly why
    the windowed formulation scales where a range self-join would not.
    Oracle: DuckDB ASOF LEFT JOIN with the tolerance applied the same
    way."""
    tol_us = 1_800_000_000  # 30 minutes
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "click")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    click_ts = F.when(F.col("event_type") == "click", F.col("ts"))
    gap = F.unix_micros(F.col("ts")) - F.unix_micros(F.col("prior_click"))
    within = F.col("prior_click").isNotNull() & (gap <= tol_us)
    return (
        e.withColumn("prior_click", F.max(click_ts).over(w))
        .filter(F.col("event_type") == "purchase")
        .select(
            "event_id",
            "user_id",
            ts_str("ts").alias("purchase_ts"),
            F.when(within, ts_str("prior_click")).alias("prior_click_ts"),
            F.when(within, gap).alias("gap_us"),
        )
    )


@register(
    "join_asof_nearest",
    oracle="""
    -- same NULL guards as join_asof (DuckDB ASOF is sort-order-matched)
    WITH purch AS (SELECT event_id, user_id, ts FROM events
                   WHERE event_type = 'purchase'
                     AND ts IS NOT NULL AND user_id IS NOT NULL),
         clicks AS (SELECT user_id, ts FROM events
                    WHERE event_type = 'click'
                      AND ts IS NOT NULL AND user_id IS NOT NULL),
    b AS (
      SELECT p.event_id, p.user_id, p.ts, c.ts AS prior_ts
      FROM purch p ASOF LEFT JOIN clicks c
        ON p.user_id = c.user_id AND p.ts >= c.ts),
    f AS (
      SELECT p.event_id, c.ts AS next_ts
      FROM purch p ASOF LEFT JOIN clicks c
        ON p.user_id = c.user_id AND p.ts <= c.ts),
    j AS (
      SELECT b.event_id, b.user_id, b.ts, b.prior_ts, f.next_ts,
             CASE
               WHEN b.prior_ts IS NULL THEN f.next_ts
               WHEN f.next_ts IS NULL THEN b.prior_ts
               WHEN epoch_us(b.ts) - epoch_us(b.prior_ts)
                    <= epoch_us(f.next_ts) - epoch_us(b.ts) THEN b.prior_ts
               ELSE f.next_ts
             END AS chosen
      FROM b JOIN f USING (event_id)
      WHERE b.prior_ts IS NOT NULL OR f.next_ts IS NOT NULL)
    SELECT event_id, user_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
           strftime(chosen, '%Y-%m-%d %H:%M:%S') AS nearest_click_ts,
           CAST(epoch_us(ts) - epoch_us(chosen) AS BIGINT) AS gap_us,
           CASE WHEN chosen <= ts THEN 'prior' ELSE 'next' END AS direction
    FROM j
    """,
    tags=("join", "asof"),
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join, NEAREST direction (pandas merge_asof
    direction='nearest'): each purchase matches its closest click in
    EITHER direction, ties to the prior side. Completes the as-of
    family (backward = join_asof, backward+tolerance =
    join_asof_tolerance).

    Same single-sort scale shape: union both event roles, ONE shuffle
    on user_id, then two frames over the same ordering — running max
    of click time (nearest prior) and reversed running min (nearest
    following). No range self-join, no candidate pairs; a user's
    history is one partition of state. The direction label derives
    from the SIGN of the gap, so an exactly-simultaneous click is
    'prior' in both engines regardless of which frame surfaced it."""
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "click")
        & F.col("ts").isNotNull()
        & F.col("user_id").isNotNull()  # mirrors the oracle's guards
    )
    # same clicks-first tie order as join_asof: both ASOF directions are
    # inclusive in DuckDB, and a simultaneous click resolves as 'prior'
    # (gap 0 wins the tie-break) in both engines
    clicks_first = F.when(F.col("event_type") == "click", 0).otherwise(1)
    wb = (
        Window.partitionBy("user_id")
        .orderBy("ts", clicks_first, "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy("ts", clicks_first, "event_id")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    click_ts = F.when(F.col("event_type") == "click", F.col("ts"))
    prior = F.max(click_ts).over(wb)
    nxt = F.min(click_ts).over(wf)
    gap_prior = F.unix_micros(F.col("ts")) - F.unix_micros(F.col("prior_ts"))
    gap_next = F.unix_micros(F.col("next_ts")) - F.unix_micros(F.col("ts"))
    chosen = (
        F.when(F.col("prior_ts").isNull(), F.col("next_ts"))
        .when(F.col("next_ts").isNull(), F.col("prior_ts"))
        .when(gap_prior <= gap_next, F.col("prior_ts"))
        .otherwise(F.col("next_ts"))
    )
    return (
        e.withColumn("prior_ts", prior)
        .withColumn("next_ts", nxt)
        .filter(
            (F.col("event_type") == "purchase")
            & (F.col("prior_ts").isNotNull() | F.col("next_ts").isNotNull())
        )
        .withColumn("chosen", chosen)
        .select(
            "event_id",
            "user_id",
            ts_str("ts").alias("purchase_ts"),
            ts_str("chosen").alias("nearest_click_ts"),
            (F.unix_micros(F.col("ts")) - F.unix_micros(F.col("chosen"))).alias(
                "gap_us"
            ),
            F.when(F.col("chosen") <= F.col("ts"), F.lit("prior"))
            .otherwise(F.lit("next"))
            .alias("direction"),
        )
    )


@register(
    "join_runtime_bloom_pruned",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n_lines,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderpriority = '1-URGENT'
    GROUP BY l_returnflag
    """,
    tags=("join", "runtime-filter"),
)
def join_runtime_bloom_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-to-fact join where a selective predicate sits on ONE side:
    the 100 TB plan must not shuffle the unfiltered lineitem side in
    full — Spark's runtime bloom filter (InjectRuntimeFilter) builds a
    bloom over the filtered orders keys and applies might_contain at
    the lineitem scan, pruning ~80% of the shuffle input before it
    moves.

    The plan is deliberately hint-free so it adapts across scales:
    at fixture scale the filtered orders side is broadcastable and
    Catalyst picks a straight BroadcastHashJoin (injection is
    correctly skipped — a bloom adds nothing a broadcast hash probe
    doesn't already do); at 100 TB the filtered side exceeds the
    broadcast threshold, the join becomes shuffle-based, and
    InjectRuntimeFilter blooms the lineitem scan with default confs
    (the 10 GB applicationSideScanSizeThreshold passes naturally).
    tests/test_plans.py pins the might_contain marker by simulating
    the at-scale regime (broadcast disabled, scan threshold zeroed)
    in a scoped conf block."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n_lines"),
            F.sum(F.col("l_quantity").cast("bigint")).alias("sum_qty"),
        )
    )


@register(
    "join_asof_forward",
    oracle="""
    -- forward as-of: the NEXT click at-or-after each purchase (the
    -- "what happened next" direction — next maintenance after a
    -- failure, next quote after an order). Same guards as join_asof.
    WITH purch AS (SELECT event_id, user_id, ts FROM events
                   WHERE event_type = 'purchase'
                     AND ts IS NOT NULL AND user_id IS NOT NULL),
         clicks AS (SELECT user_id, ts FROM events
                    WHERE event_type = 'click'
                      AND ts IS NOT NULL AND user_id IS NOT NULL)
    SELECT p.event_id, p.user_id,
           strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
           strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS next_click_ts,
           CAST(epoch_us(c.ts) - epoch_us(p.ts) AS BIGINT) AS gap_us
    FROM purch p ASOF JOIN clicks c
      ON p.user_id = c.user_id AND p.ts <= c.ts
    """,
    tags=("join", "asof"),
)
def join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join (nearest NEXT click per purchase, per user)
    — the mirror of join_asof, completing the as-of family's
    direction axis (backward / nearest / tolerance / forward).

    Spark side: the same single-sort pattern as join_asof but over
    the REVERSED ordering — a cumulative MIN of click time over
    (ts DESC) sees exactly the clicks at-or-after each row, and Spark
    evaluates the reversed cumulative frame incrementally in O(n) per
    user (a CurrentRow..UnboundedFollowing frame would re-aggregate
    the tail per row — the documented O(n^2) trap). Clicks sort
    before purchases at equal ts in the scan so the inclusive
    p.ts <= c.ts boundary matches DuckDB's native forward ASOF."""
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "click")
        & F.col("ts").isNotNull()
        & F.col("user_id").isNotNull()
    )
    clicks_first = F.when(F.col("event_type") == "click", 0).otherwise(1)
    w_rev = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").desc(), clicks_first, F.col("event_id").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    click_ts = F.when(F.col("event_type") == "click", F.col("ts"))
    return (
        e.withColumn("next_click", F.min(click_ts).over(w_rev))
        .filter(
            (F.col("event_type") == "purchase")
            & F.col("next_click").isNotNull()
        )
        .select(
            "event_id",
            "user_id",
            ts_str("ts").alias("purchase_ts"),
            ts_str("next_click").alias("next_click_ts"),
            (
                F.unix_micros(F.col("next_click")) - F.unix_micros(F.col("ts"))
            ).alias("gap_us"),
        )
    )
