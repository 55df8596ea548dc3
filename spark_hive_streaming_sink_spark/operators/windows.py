"""Window-function operators (SURVEY.md §2C): ranking, analytic,
framed running aggregates, range frames, top-k per group.

Windows sort within partitions after one shuffle on the partition key.
Scale posture: partition keys here (mktsegment, custkey, brand) bound
per-partition state; a window over an unpartitioned ORDER BY would
serialize onto one task and is never used.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
import pyspark.sql.functions as F

from ..io import load_table
from ..registry import register
from ._helpers import dec, ts_str


@register(
    "window_ranking",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           row_number() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS rn,
           rank()       OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC) AS rnk,
           dense_rank() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC) AS drnk,
           ntile(4)     OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS quartile
    FROM customer
    """,
    tags=("window",),
)
def window_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number / rank / dense_rank / ntile (unique tiebreak on
    custkey wherever full determinism is required)."""
    c = load_table(spark, sf_dir, "customer")
    w_tb = Window.partitionBy("c_mktsegment").orderBy(F.col("c_acctbal").desc(), "c_custkey")
    w = Window.partitionBy("c_mktsegment").orderBy(F.col("c_acctbal").desc())
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.row_number().over(w_tb).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w_tb).alias("quartile"),
    )


@register(
    "window_analytic",
    oracle="""
    SELECT o_orderkey, o_custkey,
           lag(o_totalprice)  OVER w AS prev_price,
           lead(o_totalprice) OVER w AS next_price,
           first_value(o_totalprice) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_price,
           last_value(o_totalprice)  OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_last,
           strftime(lag(o_orderdate) OVER w, '%Y-%m-%d') AS prev_order_day
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    tags=("window",),
)
def window_analytic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead/first/last per customer order history (explicit ROWS
    frame — Spark and DuckDB default frames differ for last_value)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        F.first("o_totalprice").over(wf).alias("first_price"),
        F.last("o_totalprice").over(wf).alias("running_last"),
        ts_str(F.lag("o_orderdate").over(w), "yyyy-MM-dd").alias("prev_order_day"),
    )


@register(
    "window_running",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend,
           COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS order_seq
    FROM orders
    """,
    tags=("window",),
)
def window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running (cumulative) sum/count — decimal-exact cumulative sum."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.sum(dec("o_totalprice", 18, 2)).over(w).cast("double").alias("running_spend"),
        F.count("*").over(w).alias("order_seq"),
    )


@register(
    "window_range_frame",
    oracle="""
    SELECT p_partkey, p_brand, p_size,
           CAST(SUM(CAST(p_retailprice AS DECIMAL(12,2)))
                OVER (PARTITION BY p_brand ORDER BY p_size
                      RANGE BETWEEN 5 PRECEDING AND CURRENT ROW) AS DOUBLE) AS near_size_value,
           COUNT(*) OVER (PARTITION BY p_brand ORDER BY p_size
                          RANGE BETWEEN 5 PRECEDING AND CURRENT ROW) AS near_size_count
    FROM part
    """,
    tags=("window",),
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over a numeric ordering (value-based, peer-inclusive
    — deterministic regardless of tie order, unlike a ROWS frame)."""
    p = load_table(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy("p_size").rangeBetween(-5, 0)
    return p.select(
        "p_partkey",
        "p_brand",
        "p_size",
        F.sum(dec("p_retailprice", 12, 2)).over(w).cast("double").alias("near_size_value"),
        F.count("*").over(w).alias("near_size_count"),
    )


@register(
    "window_topk_per_group",
    oracle="""
    SELECT * FROM (
      SELECT o_orderstatus, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_orderstatus
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders)
    WHERE rn <= 3
    """,
    tags=("window", "topk"),
)
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group: row_number + filter. At scale Catalyst rewrites
    this into a per-partition top-k (WindowGroupLimit) before the
    shuffle, so it never materializes full per-group sorts."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    return (
        o.select("o_orderstatus", "o_orderkey", "o_totalprice", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 3)
    )


@register(
    "window_distribution",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist() OVER w, 6) AS cume,
           nth_value(c_custkey, 2) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND UNBOUNDED FOLLOWING) AS second_richest
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
    """,
    tags=("window",),
)
def window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions: percent_rank, cume_dist,
    nth_value (explicit full frame — Spark and DuckDB default frames
    differ for nth_value)."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(F.col("c_acctbal").desc(), "c_custkey")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.nth_value("c_custkey", 2).over(wf).alias("second_richest"),
    )


@register(
    "window_gaps_islands_sessionize",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts, event_id,
             CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                  OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
      -- NULL ts rows are unplaceable in the session order (Spark sorts
      -- NULLS FIRST asc vs DuckDB NULLS LAST): excluded in BOTH engines
      FROM events WHERE ts IS NOT NULL
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    sessions AS (
      SELECT user_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_no
      FROM marked)
    SELECT user_id,
           COUNT(DISTINCT session_no) AS n_sessions,
           CAST(SUM(events_in_session) AS BIGINT) AS n_events,
           MAX(events_in_session) AS max_session_len
    FROM (SELECT user_id, session_no, COUNT(*) AS events_in_session
          FROM sessions GROUP BY user_id, session_no) s
    GROUP BY user_id
    """,
    tags=("window", "session"),
)
def window_gaps_islands_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization via gaps-and-islands: lag() marks session
    starts (>30 min gap), a running SUM numbers the islands, then two
    aggregations summarize per user. The batch complement of the
    native stream_session_window — same 30-min gap semantics expressed
    with only lag + framed sum, the composition that works in any
    SQL engine. One shuffle on user_id serves the window AND both
    aggregates (same partitioning key throughout)."""
    e = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    marked = e.select(
        "user_id",
        "ts",
        "event_id",
        F.when(
            (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w)) > 1_800_000_000)
            | F.lag("ts").over(w).isNull(),
            1,
        )
        .otherwise(0)
        .alias("new_session"),
    )
    sessions = marked.select(
        "user_id", "ts", F.sum("new_session").over(run).alias("session_no")
    )
    per_session = sessions.groupBy("user_id", "session_no").agg(
        F.count("*").alias("events_in_session")
    )
    return per_session.groupBy("user_id").agg(
        F.countDistinct("session_no").alias("n_sessions"),
        F.sum("events_in_session").cast("bigint").alias("n_events"),
        F.max("events_in_session").alias("max_session_len"),
    )


@register(
    "window_cumulative_distinct",
    oracle="""
    WITH firsts AS (
      SELECT event_type,
             CAST(ts AS DATE) AS day,
             user_id,
             CASE WHEN row_number() OVER (PARTITION BY event_type, user_id
                                          ORDER BY ts, event_id) = 1
                  THEN 1 ELSE 0 END AS is_first
      -- NULL ts rows have no day and no place in first-seen order:
      -- excluded in BOTH engines
      FROM events WHERE ts IS NOT NULL),
    daily AS (
      SELECT event_type, day,
             CAST(SUM(is_first) AS BIGINT) AS new_users,
             COUNT(*) AS n_events
      FROM firsts GROUP BY event_type, day)
    SELECT event_type,
           strftime(day, '%Y-%m-%d') AS day,
           new_users,
           n_events,
           CAST(SUM(new_users) OVER (PARTITION BY event_type ORDER BY day
                                     ROWS UNBOUNDED PRECEDING) AS BIGINT)
             AS distinct_users_to_date
    FROM daily
    """,
    tags=("window", "distinct"),
)
def window_cumulative_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct users per event type over days. Neither
    engine supports COUNT(DISTINCT) OVER a running frame; the scalable
    construction is: flag each user's FIRST event (row_number = 1 per
    (type, user)), sum flags per day, then a running sum over days —
    two keyed shuffles, no per-row distinct state. The daily rollup is
    tiny, so the final ordered window is over days, not events."""
    e = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    w_first = Window.partitionBy("event_type", "user_id").orderBy("ts", "event_id")
    firsts = e.select(
        "event_type",
        F.to_date("ts").alias("day"),
        F.when(F.row_number().over(w_first) == 1, 1).otherwise(0).alias("is_first"),
    )
    daily = firsts.groupBy("event_type", "day").agg(
        F.sum("is_first").cast("bigint").alias("new_users"),
        F.count("*").alias("n_events"),
    )
    w_run = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return daily.select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "new_users",
        "n_events",
        F.sum("new_users").over(w_run).cast("bigint").alias("distinct_users_to_date"),
    )


@register(
    "window_ewma_fold",
    oracle="""
    SELECT user_id,
           COUNT(*) AS n_events,
           list_reduce(list(CAST(value AS DOUBLE)
                            ORDER BY ts NULLS FIRST, event_id),
                       (acc, x) -> acc * 0.5e0 + x * 0.5e0) AS ewma_value
    FROM events
    GROUP BY user_id
    """,
    tags=("window", "fold"),
)
def window_ewma_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average (alpha = 0.5) per user —
    the ordered-fold analytic neither engine has as a builtin window
    function. Events collect per user ordered by (ts, event_id) and a
    higher-order aggregate folds them: acc*0.5 + x*0.5. Each step is an
    exact IEEE halving + one rounded add over identically-ordered
    inputs, so the result is bit-identical cross-engine with no
    rounding crutch. State per group is one number; memory is bounded
    by the largest single user's history (the same bound any ordered
    per-key fold has — at 100 TB you'd cap history length or use the
    streaming stateful op instead)."""
    e = load_table(spark, sf_dir, "events")
    ordered_vals = F.transform(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.unix_micros("ts").alias("t"),
                    F.col("event_id").alias("i"),
                    F.col("value").cast("double").alias("v"),
                )
            )
        ),
        lambda s: s.getField("v"),
    )
    return e.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.aggregate(
            F.slice(ordered_vals, 2, 1_000_000_000),
            F.element_at(ordered_vals, 1),
            lambda acc, x: acc * F.lit(0.5) + x * F.lit(0.5),
        ).alias("ewma_value"),
    )


@register(
    "window_time_weighted_avg",
    oracle="""
    WITH s AS (
      SELECT user_id,
             list(struct_pack(t := epoch_us(ts), i := event_id,
                              v := CAST(value AS DOUBLE))
                  ORDER BY ts NULLS FIRST, event_id) AS ev
      FROM events GROUP BY user_id),
    f AS (
      SELECT user_id, len(ev) AS n_events,
             ev[len(ev)].t - ev[1].t AS span_us,
             list_reduce(
               list_prepend(0.0e0,
                 list_transform(generate_series(2, len(ev)),
                   i -> (ev[i-1].v + ev[i].v) * (ev[i].t - ev[i-1].t))),
               (acc, x) -> acc + x) AS area2
      FROM s WHERE len(ev) >= 2)
    SELECT user_id, n_events,
           round(area2 / (2.0e0 * span_us), 6) AS twa
    FROM f WHERE span_us > 0
    """,
    tags=("window", "fold", "timeseries"),
)
def window_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trapezoidal time-weighted average per user — the
    irregular-sampling mean (TimescaleDB's time_weight('linear')
    analogue) that plain AVG gets wrong when observations cluster:
    each consecutive pair contributes (v_i + v_{i+1})·Δt_us, and the
    total area divides by twice the covered span.

    Determinism without rounding crutches: Δt is an exact integer of
    microseconds, each trapezoid is the same two IEEE ops in both
    engines, and the sum is an ordered fold over identically-ordered
    terms (the window_ewma_fold pattern); the final divide+round runs
    on bit-identical doubles. Scale: one shuffle on user_id; state per
    group is the user's event list — same bound as any ordered per-key
    fold (cap history or go streaming beyond it)."""
    e = load_table(spark, sf_dir, "events")
    ev = F.array_sort(
        F.collect_list(
            F.struct(
                F.unix_micros("ts").alias("t"),
                F.col("event_id").alias("i"),
                F.col("value").cast("double").alias("v"),
            )
        )
    )
    s = e.groupBy("user_id").agg(ev.alias("ev"))
    n = F.size("ev")
    span = F.element_at("ev", -1).getField("t") - F.element_at("ev", 1).getField("t")
    trapezoids = F.transform(
        F.sequence(F.lit(2), n),
        lambda i: (
            F.element_at(F.col("ev"), (i - 1).cast("int")).getField("v")
            + F.element_at(F.col("ev"), i.cast("int")).getField("v")
        )
        * (
            F.element_at(F.col("ev"), i.cast("int")).getField("t")
            - F.element_at(F.col("ev"), (i - 1).cast("int")).getField("t")
        ),
    )
    area2 = F.aggregate(trapezoids, F.lit(0.0), lambda acc, x: acc + x)
    return (
        s.filter(n >= 2)
        .select(
            "user_id",
            n.alias("n_events"),
            span.alias("span_us"),
            area2.alias("area2"),
        )
        .filter(F.col("span_us") > 0)
        .select(
            "user_id",
            "n_events",
            F.round(F.col("area2") / (2.0 * F.col("span_us")), 6).alias("twa"),
        )
    )


def _arr_median(arr):
    """Exact median of a sorted numeric array column: middle element
    (odd n) or the IEEE-exact average of the two middles (even n) —
    identical in both engines, no percentile interpolation needed."""
    s = F.array_sort(arr)
    n = F.size(s)
    mid = (n / 2).cast("int")
    odd = F.element_at(s, ((n + 1) / 2).cast("int"))
    even = (F.element_at(s, mid) + F.element_at(s, mid + 1)) / 2
    # empty array -> NULL median (DuckDB's list_sort([])[0] is NULL;
    # Spark's element_at(., 0) is an ANSI error — a row whose whole
    # neighborhood is NULL values hits this, found by the NULL fuzzer)
    return (
        F.when(n == 0, F.lit(None).cast("double"))
        .when(n % 2 == 1, odd)
        .otherwise(even)
    )


_SQL_ARR_MEDIAN = """
    CASE WHEN len({s}) % 2 = 1
         THEN list_sort({s})[CAST((len({s})+1)//2 AS INTEGER)]
         ELSE (list_sort({s})[CAST(len({s})//2 AS INTEGER)]
               + list_sort({s})[CAST(len({s})//2 + 1 AS INTEGER)]) / 2
    END"""


@register(
    "window_hampel_filter",
    oracle=f"""
    WITH w AS (
      SELECT user_id, event_id, CAST(value AS DOUBLE) AS v,
             list(CAST(value AS DOUBLE))
               FILTER (WHERE value IS NOT NULL) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS nb
      -- NULL ts rows are unplaceable in the neighborhood order:
      -- excluded in BOTH engines (NULL values stay, handled below)
      FROM events WHERE ts IS NOT NULL),
    m AS (
      SELECT user_id, event_id, v, nb,
             {_SQL_ARR_MEDIAN.format(s='nb')} AS med
      FROM w),
    d AS (
      SELECT user_id, event_id, v, med,
             {_SQL_ARR_MEDIAN.format(s="list_transform(nb, x -> abs(x - med))")} AS mad
      FROM m)
    SELECT user_id, event_id, v, med,
           (abs(v - med) > 3 * mad) AS is_spike,
           CASE WHEN abs(v - med) > 3 * mad THEN med ELSE v END AS cleaned
    FROM d
    """,
    tags=("window", "timeseries", "robust"),
)
def window_hampel_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hampel despiking filter: each event's value is compared to the
    median of its ±3-row neighborhood; points beyond 3×MAD of that
    median are spikes and get replaced by it — the standard robust
    cleaning pass for sensor/metric streams before they feed training
    features (a mean-based rolling filter drags toward the spike it is
    supposed to remove).

    Exactness: medians are order statistics on the sorted neighborhood
    (middle element, or the exact IEEE half-sum of the two middles) —
    no percentile interpolation, bit-identical cross-engine. A flat
    neighborhood has MAD 0, and then ANY deviation is a spike (the
    standard Hampel convention — a constant window makes every
    departure anomalous; equal-to-median points stay clean because
    0 > 0 is false). Null handling is explicit on both sides: Spark's
    collect_list drops NULL values, so the oracle's list() carries
    FILTER (WHERE value IS NOT NULL) — a NULL reading shrinks its
    neighbors' windows instead of poisoning their medians, and its own
    row keeps v/is_spike/cleaned NULL in both engines. Scale: one
    shuffle on user_id; the ±3 frame is constant-size state, so the
    window never buffers a user's full history."""
    e = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    wf = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-3, 3)
    )
    nb = F.collect_list(F.col("value").cast("double")).over(wf)
    base = e.select(
        "user_id",
        "event_id",
        F.col("value").cast("double").alias("v"),
        nb.alias("nb"),
    )
    m = base.withColumn("med", _arr_median(F.col("nb")))
    d = m.withColumn(
        "mad",
        _arr_median(F.transform(F.col("nb"), lambda x: F.abs(x - F.col("med")))),
    )
    spike = F.abs(F.col("v") - F.col("med")) > 3 * F.col("mad")
    return d.select(
        "user_id",
        "event_id",
        "v",
        "med",
        spike.alias("is_spike"),
        F.when(spike, F.col("med")).otherwise(F.col("v")).alias("cleaned"),
    )


RATE_WINDOW_S = 3600  # trailing window
RATE_LIMIT = 5  # max events allowed inside it


@register(
    "events_windowed_rate_limit",
    oracle=f"""
    SELECT event_id, user_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_str,
           COUNT(*) OVER (
             PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN {RATE_WINDOW_S * 1_000_000} PRECEDING
                       AND CURRENT ROW) AS n_in_window,
           COUNT(*) OVER (
             PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN {RATE_WINDOW_S * 1_000_000} PRECEDING
                       AND CURRENT ROW) > {RATE_LIMIT} AS throttled
    FROM events
    """,
    tags=("window", "rate-limit"),
)
def events_windowed_rate_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window rate limiting: count each user's events in the
    trailing hour (inclusive RANGE frame over microsecond offsets) and
    flag everything beyond the cap — the abuse/bot screen applied
    before user-generated content enters a corpus, and the batch
    mirror of what a streaming limiter enforces online.

    Exact integer counts over a numeric RANGE frame (identical frame
    semantics in both engines — ties in ts share a frame, so the flag
    is deterministic without an event_id tie-break). One shuffle on
    user_id."""
    e = load_table(spark, sf_dir, "events")
    wr = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-RATE_WINDOW_S * 1_000_000, 0)
    )
    n = F.count("*").over(wr)
    from ._helpers import ts_str

    return e.select(
        "event_id",
        "user_id",
        ts_str("ts").alias("ts_str"),
        n.alias("n_in_window"),
        (n > RATE_LIMIT).alias("throttled"),
    )


@register(
    "window_max_drawdown",
    oracle="""
    WITH u AS (
      SELECT user_id, event_id, ts,
             CAST(round(round(value, 6) * 1000000, 0) AS BIGINT) AS v_u
      FROM events WHERE ts IS NOT NULL AND value IS NOT NULL),
    c1 AS (
      SELECT user_id, event_id, ts,
             CAST(SUM(v_u) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_u
      FROM u),
    cs AS (
      SELECT user_id, event_id, ts, cum_u,
             CAST(MAX(cum_u) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS peak_u
      FROM c1)
    SELECT user_id,
           round((peak_u - cum_u) / 1000000.0, 6) AS max_drawdown,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS trough_ts,
           round(cum_u / 1000000.0, 6) AS cum_at_trough,
           round(peak_u / 1000000.0, 6) AS peak_before_trough
    FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                                       ORDER BY peak_u - cum_u DESC, ts, event_id)
                      AS rn
          FROM cs)
    WHERE rn = 1
    """,
    tags=("window", "timeseries"),
)
def window_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown per user: the deepest drop of the cumulative
    value series below its running peak — the classic risk statistic,
    and in pipeline monitoring the sharpest detector of a metric that
    ramped and then collapsed (a plain min/max never sees it because
    it ignores ordering).

    Determinism: values quantize to integer micro-units BEFORE the
    cumulative sum, so cum/peak/drawdown are exact bigints; the trough
    row breaks ties on (ts, event_id).

    Scale: one user_id shuffle; the cumulative sum and running max
    share the (ts, event_id) sort and the trough argmax re-sorts
    partition-locally — plan-pinned at exactly 1 Exchange."""
    e = load_table(spark, sf_dir, "events")
    u = e.filter(
        F.col("ts").isNotNull() & F.col("value").isNotNull()
    ).select(
        "user_id", "event_id", "ts",
        F.round(F.round("value", 6) * 1000000, 0).cast("bigint").alias("v_u"),
    )
    wseq = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cs = u.select(
        "user_id", "event_id", "ts",
        F.sum("v_u").over(wseq).cast("bigint").alias("cum_u"),
    ).withColumn("peak_u", F.max("cum_u").over(wseq).cast("bigint"))
    wpk = Window.partitionBy("user_id").orderBy(
        (F.col("peak_u") - F.col("cum_u")).desc(), "ts", "event_id"
    )
    return (
        cs.withColumn("rn", F.row_number().over(wpk))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.round((F.col("peak_u") - F.col("cum_u")) / 1000000.0, 6).alias(
                "max_drawdown"
            ),
            ts_str("ts").alias("trough_ts"),
            F.round(F.col("cum_u") / 1000000.0, 6).alias("cum_at_trough"),
            F.round(F.col("peak_u") / 1000000.0, 6).alias("peak_before_trough"),
        )
    )


@register(
    "window_holt_linear_fold",
    oracle="""
    -- ordered fold restated as a recursive CTE: DuckDB's lambda-struct
    -- accumulator evaluates struct_pack fields sequentially in place
    -- (later fields observe earlier updates), so the scalar recursion
    -- is spelled row-by-row instead — plain SQL expressions evaluate
    -- functionally in both engines
    WITH RECURSIVE xs AS (
      SELECT user_id,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts NULLS FIRST, event_id) AS k,
             COALESCE(CAST(value AS DOUBLE), CAST('NaN' AS DOUBLE)) AS x
      FROM events),
    n AS (SELECT user_id, MAX(k) AS n_events FROM xs GROUP BY user_id),
    s AS (
      SELECT user_id, k, x AS l, 0.0e0 AS b FROM xs WHERE k = 1
      UNION ALL
      SELECT xs.user_id, xs.k,
             0.5e0 * xs.x + 0.5e0 * (s.l + s.b) AS l,
             (0.25e0 * xs.x - 0.25e0 * s.l) + 0.75e0 * s.b AS b
      -- IS NOT DISTINCT FROM: the NULL-user_id group is a real group
      -- in Spark's groupBy and must advance through the recursion too
      FROM s JOIN xs ON xs.user_id IS NOT DISTINCT FROM s.user_id
                    AND xs.k = s.k + 1)
    SELECT s.user_id, n.n_events,
           s.l AS level, s.b AS trend,
           s.l + s.b AS forecast_next
    FROM s JOIN n ON s.user_id IS NOT DISTINCT FROM n.user_id
                 AND s.k = n.n_events
    """,
    tags=("window", "fold", "forecast"),
)
def window_holt_linear_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt double exponential smoothing (level + linear trend,
    alpha = beta = 0.5) per user — the one-step-ahead forecaster a
    monitoring pipeline runs on per-key series; the ordered two-
    accumulator fold neither engine has as a builtin.

    Exactness: dyadic alpha/beta make every smoothing step exact
    IEEE scaling plus rounded adds over identically-ordered inputs
    (the window_ewma_fold discipline extended to a struct
    accumulator); the trend update is algebraically flattened to
    b' = (x/4 − l/4) + 3b/4 so NO subexpression repeats across struct
    fields — both engines' fold evaluators (Spark ArrayAggregate
    codegen, DuckDB lambda struct_pack) mis-evaluate repeated
    subexpressions inside multi-field accumulators. NULL values enter
    the fold as NaN (IEEE-propagating, non-null): a NULL in a series
    poisons that user's level/trend to NaN identically in both
    engines, and the accumulator never writes NULL into Spark's
    non-nullable zero-struct slot (which silently reads back 0.0 —
    found by the adversarial NULL gate). Scale: one shuffle on
    user_id; state per group is the user's history (cap history or
    move to the streaming stateful op beyond memory bounds)."""
    e = load_table(spark, sf_dir, "events")
    ordered_vals = F.transform(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.unix_micros("ts").alias("t"),
                    F.col("event_id").alias("i"),
                    F.coalesce(
                        F.col("value").cast("double"),
                        F.lit(float("nan")),
                    ).alias("v"),
                )
            )
        ),
        lambda s: s.getField("v"),
    )

    def step(acc, x):
        new_l = F.lit(0.5) * x + F.lit(0.5) * (
            acc.getField("l") + acc.getField("b")
        )
        new_b = (
            F.lit(0.25) * x - F.lit(0.25) * acc.getField("l")
        ) + F.lit(0.75) * acc.getField("b")
        return F.struct(new_l.alias("l"), new_b.alias("b"))

    st = F.aggregate(
        F.slice(ordered_vals, 2, 1_000_000_000),
        F.struct(
            F.element_at(ordered_vals, 1).alias("l"), F.lit(0.0).alias("b")
        ),
        step,
    )
    return (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n_events"), st.alias("st"))
        .select(
            "user_id",
            "n_events",
            F.col("st.l").alias("level"),
            F.col("st.b").alias("trend"),
            (F.col("st.l") + F.col("st.b")).alias("forecast_next"),
        )
    )


@register(
    "window_rolling_ols_slope",
    oracle="""
    WITH base AS (
      SELECT MIN(epoch_us(ts)) // 1000000 AS t0 FROM events WHERE ts IS NOT NULL),
    e AS (
      -- NULL ts is unplaceable in the window order, NULL value breaks
      -- the integer moments: excluded in BOTH engines
      SELECT event_id, user_id,
             epoch_us(ts) // 1000000 - (SELECT t0 FROM base) AS t_rel,
             CAST(ROUND(value * 10000, 0) AS BIGINT) AS v_u
      FROM events WHERE ts IS NOT NULL AND value IS NOT NULL),
    m AS (
      SELECT event_id, user_id, t_rel,
             COUNT(*) OVER w AS n_w,
             SUM(t_rel) OVER w AS st,
             SUM(v_u) OVER w AS sv,
             SUM(t_rel * v_u) OVER w AS stv,
             SUM(t_rel * t_rel) OVER w AS stt
      FROM e
      WINDOW w AS (PARTITION BY user_id ORDER BY t_rel, event_id
                   ROWS BETWEEN 4 PRECEDING AND CURRENT ROW))
    SELECT event_id, user_id, t_rel, n_w,
           -- + 0.0 collapses IEEE -0.0 (a 0/den numerator with den < 0)
           -- to +0.0 identically in both engines
           round(CAST(n_w * stv - st * sv AS DOUBLE)
                 / nullif(CAST(n_w * stt - st * st AS DOUBLE), 0.0e0)
                 / 10000.0, 6) + 0.0e0 AS slope_per_s
    FROM m WHERE n_w >= 2
    """,
    tags=("window", "regression", "timeseries"),
)
def window_rolling_ols_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling least-squares slope of value against time over each
    user's last 5 events — the local-trend detector monitoring
    pipelines run per key (is this metric accelerating RIGHT NOW),
    complementing the global robust Theil-Sen fit.

    Exactness: times are whole seconds RELATIVE TO THE CORPUS MIN (so
    t·v products stay ≲2^48 and the BIGINT window sums are exact —
    absolute epoch seconds would overflow Σt·v); values are exact 1e-4
    units; the slope is one double division of two exact integers,
    NULL when the 5 timestamps tie (zero variance). Scale: one shuffle
    on user_id; all five moments come from the SAME frame in one
    window pass; the 1-row corpus-min broadcasts."""
    ev_all = load_table(spark, sf_dir, "events")
    e = ev_all.filter(F.col("ts").isNotNull() & F.col("value").isNotNull())
    # t0 over ALL non-NULL timestamps (matching the oracle's base CTE):
    # filtering NULL values first would shift every t_rel whenever the
    # corpus-min event carries a NULL value — fuzzer-caught divergence
    base = ev_all.filter(F.col("ts").isNotNull()).agg(
        F.expr("min(unix_micros(ts)) div 1000000").alias("t0")
    )
    ev = e.crossJoin(F.broadcast(base)).select(
        "event_id",
        "user_id",
        (F.expr("unix_micros(ts) div 1000000") - F.col("t0")).alias("t_rel"),
        F.round(F.col("value") * 10000, 0).cast("bigint").alias("v_u"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("t_rel", "event_id")
        .rowsBetween(-4, 0)
    )
    m = ev.select(
        "event_id",
        "user_id",
        "t_rel",
        F.count("*").over(w).alias("n_w"),
        F.sum("t_rel").over(w).alias("st"),
        F.sum("v_u").over(w).alias("sv"),
        F.sum(F.col("t_rel") * F.col("v_u")).over(w).alias("stv"),
        F.sum(F.col("t_rel") * F.col("t_rel")).over(w).alias("stt"),
    ).filter(F.col("n_w") >= 2)
    num = (F.col("n_w") * F.col("stv") - F.col("st") * F.col("sv")).cast("double")
    den = F.nullif(
        (F.col("n_w") * F.col("stt") - F.col("st") * F.col("st")).cast("double"),
        F.lit(0.0),
    )
    return m.select(
        "event_id",
        "user_id",
        "t_rel",
        "n_w",
        (F.round(num / den / 10000.0, 6) + F.lit(0.0)).alias("slope_per_s"),
    )


@register(
    "events_session_paths_topk",
    oracle="""
    WITH f AS (
      SELECT user_id, ts, event_id, event_type
      FROM events
      -- NULL ts is unplaceable in session order; NULL event_type has
      -- no path token; NULL event_id breaks the (ts, event_id) tie
      -- order (NULLS FIRST vs LAST differs between engines): all three
      -- excluded identically in both engines
      WHERE ts IS NOT NULL AND event_type IS NOT NULL
        AND event_id IS NOT NULL),
    marked AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                  OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
      FROM f WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    sessions AS (
      SELECT user_id, ts, event_id, event_type,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_no
      FROM marked),
    paths AS (
      SELECT user_id, session_no,
             -- event_type mirrors the Spark side's struct tie-break
             -- (array_sort over (ts, event_id, event_type)) for
             -- duplicate (ts, event_id) rows
             string_agg(event_type, '>' ORDER BY ts, event_id, event_type) AS path,
             COUNT(*) AS path_len
      FROM sessions GROUP BY user_id, session_no),
    tot AS (SELECT COUNT(*) AS n_total FROM paths),
    g AS (
      SELECT path, MAX(path_len) AS path_len, COUNT(*) AS n_sessions
      FROM paths GROUP BY path)
    SELECT g.path, CAST(g.path_len AS BIGINT) AS path_len,
           g.n_sessions,
           CAST(g.n_sessions * 1000000 // t.n_total AS BIGINT)
             AS sessions_ppm
    FROM g CROSS JOIN tot t
    ORDER BY n_sessions DESC, path LIMIT 25
    """,
    tags=("window", "session", "funnel"),
)
def events_session_paths_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-25 session paths (the '>'-joined event-type sequence of each
    30-min-gap session) with session counts and corpus share — the
    path-mining table behind every funnel/journey dashboard, built from
    the same gaps-and-islands sessionization as
    window_gaps_islands_sessionize.

    Exactness: path strings are ordered by (ts, event_id, event_type)
    over NULL-free keys in both engines (Spark sorts the collected
    struct array, DuckDB uses aggregate ORDER BY); counts and
    the integer-ppm share are exact; the top-25 carries (n_sessions
    DESC, path) as a total-order tiebreak.

    Scale: one shuffle on user_id serves the lag window, the running
    session sum AND the per-session path aggregation (same key); the
    path groupBy shuffles one row per session; the 1-row session total
    broadcasts; the top-25 is a TakeOrdered, never a global sort."""
    e = load_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull()
        & F.col("event_type").isNotNull()
        & F.col("event_id").isNotNull()
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    marked = e.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.when(
            (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w)) > 1_800_000_000)
            | F.lag("ts").over(w).isNull(),
            1,
        )
        .otherwise(0)
        .alias("new_session"),
    )
    sessions = marked.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.sum("new_session").over(run).alias("session_no"),
    )
    paths = sessions.groupBy("user_id", "session_no").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("ts", "event_id", "event_type"))),
                lambda s: s.getField("event_type"),
            ),
            ">",
        ).alias("path"),
        F.count("*").alias("path_len"),
    )
    tot = paths.agg(F.count("*").alias("n_total"))
    g = paths.groupBy("path").agg(
        F.max("path_len").cast("bigint").alias("path_len"),
        F.count("*").alias("n_sessions"),
    )
    return (
        g.crossJoin(F.broadcast(tot))
        .select(
            "path",
            "path_len",
            "n_sessions",
            F.expr("CAST(n_sessions * 1000000 div n_total AS BIGINT)").alias(
                "sessions_ppm"
            ),
        )
        .orderBy(F.col("n_sessions").desc(), "path")
        .limit(25)
    )
