"""Time-series operators over the events stream: forward fill
(IGNORE NULLS window), OHLC-style resampling, and interval-overlap
joins with the bucketed equi-join rewrite that makes them scale.

All three are shapes the reference's streaming users run downstream of
the sink (gap-filled sensor series, bar charts, session overlap); here
they are batch operators with full DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F
from pyspark.sql.window import Window

from ..io import load_table
from ..registry import register


@register(
    "window_ignore_nulls_ffill",
    oracle="""
    WITH s AS (
      SELECT event_id, user_id, ts,
             CASE WHEN event_id % 3 = 0 THEN value END AS sparse
      -- NULL ts rows are unplaceable in the fill order (and Spark sorts
      -- NULLS FIRST asc vs DuckDB NULLS LAST): excluded in BOTH engines
      FROM events WHERE ts IS NOT NULL)
    SELECT event_id, user_id, sparse,
           last_value(sparse IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
    FROM s
    """,
    tags=("window", "timeseries"),
)
def window_ignore_nulls_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward fill (LOCF) via last_value IGNORE NULLS: a sparse sensor
    series (two thirds of readings dropped deterministically) is
    gap-filled with the most recent non-null per user. (ts, event_id)
    is a unique ordering, so the fill is deterministic; the kept values
    are untouched doubles from the scan — no float arithmetic at all.

    Scale: one window shuffle on user_id — the same partitioning every
    per-user op in the pipeline reuses."""
    e = load_table(spark, sf_dir, "events")
    s = e.filter(F.col("ts").isNotNull()).select(
        "event_id",
        "user_id",
        "ts",
        F.when(F.col("event_id") % 3 == 0, F.col("value")).alias("sparse"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return s.select(
        "event_id",
        "user_id",
        "sparse",
        F.last("sparse", ignorenulls=True).over(w).alias("filled"),
    )


@register(
    "events_ohlc_resample",
    oracle="""
    WITH b AS (
      SELECT event_type,
             strftime(date_trunc('hour', ts), '%Y-%m-%d %H') AS bar,
             value, ts, event_id,
             row_number() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                                ORDER BY ts, event_id) AS rn_open,
             row_number() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                                ORDER BY ts DESC, event_id DESC) AS rn_close
      -- NULL ts rows have no bar; excluded identically in both engines
      -- (also sidesteps a DuckDB 1.0 bug where a NULL window-partition
      -- key can split across threads, yielding several rn=1 rows)
      FROM events WHERE ts IS NOT NULL)
    SELECT event_type, bar,
           MAX(CASE WHEN rn_open = 1 THEN value END) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           MAX(CASE WHEN rn_close = 1 THEN value END) AS close,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(ROUND(value * 10000, 0) AS BIGINT)) AS DOUBLE) / 10000.0
             AS volume
    FROM b GROUP BY event_type, bar
    """,
    tags=("aggregate", "timeseries"),
)
def events_ohlc_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Downsampling to hourly OHLC bars per event type — the canonical
    time-series resample. Open/close are picked by unique (ts,
    event_id) order (row_number, not first_value, so ties can't make
    the answer engine-dependent); high/low are pure selections; volume
    is an exact fixed-point sum.

    Scale: one shuffle on (event_type, hour) for the windows, reused by
    the aggregate — at 100 TB this is the standard ingest-time rollup
    and the bar key is naturally unskewed (time advances)."""
    e = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    bucket = F.date_trunc("hour", F.col("ts"))
    wo = Window.partitionBy("event_type", bucket).orderBy("ts", "event_id")
    wc = Window.partitionBy("event_type", bucket).orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    b = e.select(
        "event_type",
        F.date_format(bucket, "yyyy-MM-dd HH").alias("bar"),
        "value",
        F.row_number().over(wo).alias("rn_open"),
        F.row_number().over(wc).alias("rn_close"),
    )
    return b.groupBy("event_type", "bar").agg(
        F.max(F.when(F.col("rn_open") == 1, F.col("value"))).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max(F.when(F.col("rn_close") == 1, F.col("value"))).alias("close"),
        F.count("*").alias("n_events"),
        (
            F.sum(F.round(F.col("value") * 10000, 0).cast("bigint")).cast("double")
            / 10000.0
        ).alias("volume"),
    )


OVERLAP_BUCKET_SEC = 3600  # candidate-generation granularity


@register(
    "join_interval_overlap",
    oracle="""
    WITH a AS (
      SELECT event_id AS a_id, user_id,
             epoch_us(ts) // 1000000 AS a_start,
             epoch_us(ts) // 1000000 + 3600 AS a_end
      FROM events WHERE event_type = 'click' AND event_id % 5 = 0),
    b AS (
      SELECT event_id AS b_id, user_id,
             epoch_us(ts) // 1000000 AS b_start,
             epoch_us(ts) // 1000000 + 1800 AS b_end
      FROM events WHERE event_type = 'purchase')
    SELECT a.a_id, b.b_id, a.user_id,
           least(a.a_end, b.b_end) - greatest(a.a_start, b.b_start)
             AS overlap_sec
    FROM a JOIN b ON a.user_id = b.user_id
     AND a.a_start < b.b_end AND b.b_start < a.a_end
    """,
    tags=("join", "timeseries"),
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join (clicks' 1-hour windows × purchases'
    30-minute windows per user), executed with the bucketed rewrite
    that scales: each interval explodes to the hour buckets it covers,
    the join becomes an EQUI join on (user_id, bucket) — hash, never
    nested-loop — and the exact overlap predicate then filters
    candidates; distinct de-dupes intervals that met in two buckets.

    The oracle states the semantics as the plain inequality join; the
    builder's bucketed plan must produce identical pairs. At 100 TB
    the bucket key bounds candidate fan-out by interval-length /
    bucket-size, the knob you tune to the workload."""
    e = load_table(spark, sf_dir, "events")
    epoch = F.unix_timestamp("ts")
    a = e.filter((F.col("event_type") == "click") & (F.col("event_id") % 5 == 0)).select(
        F.col("event_id").alias("a_id"),
        "user_id",
        epoch.alias("a_start"),
        (epoch + 3600).alias("a_end"),
    )
    b = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("b_id"),
        "user_id",
        epoch.alias("b_start"),
        (epoch + 1800).alias("b_end"),
    )
    bk = OVERLAP_BUCKET_SEC

    def bucketed(df: DataFrame, s: str, t: str) -> DataFrame:
        return df.withColumn(
            "bucket",
            F.explode(
                F.sequence(
                    F.expr(f"{s} div {bk}"),
                    # end is exclusive: an interval ending exactly on a
                    # boundary does not cover the next bucket
                    F.expr(f"({t} - 1) div {bk}"),
                )
            ),
        )
    pairs = (
        bucketed(a, "a_start", "a_end")
        .join(bucketed(b, "b_start", "b_end"), ["user_id", "bucket"])
        .filter((F.col("a_start") < F.col("b_end")) & (F.col("b_start") < F.col("a_end")))
        .select(
            "a_id",
            "b_id",
            "user_id",
            (
                F.least("a_end", "b_end") - F.greatest("a_start", "b_start")
            ).alias("overlap_sec"),
        )
        .distinct()
    )
    return pairs


@register(
    "events_retention_cohorts",
    oracle="""
    WITH firsts AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day
      FROM events GROUP BY user_id),
    activity AS (
      SELECT DISTINCT e.user_id, f.cohort_day,
             datediff('day', f.cohort_day, CAST(e.ts AS DATE)) AS day_offset
      FROM events e JOIN firsts f ON e.user_id = f.user_id)
    SELECT CAST(cohort_day AS VARCHAR) AS cohort,
           day_offset,
           COUNT(*) AS active_users
    FROM activity
    WHERE day_offset <= 7
    GROUP BY cohort_day, day_offset
    """,
    tags=("aggregate", "timeseries", "cohort"),
)
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix — the canonical product-analytics
    rollup: users are cohorted by first-seen day, activity is bucketed
    by day offset from the cohort day, and each (cohort, offset) cell
    counts distinct returning users (first week only).

    Scale: one aggregate to find cohort days, one user-keyed join
    (AQE-sized — the firsts relation is one row per user, ≪ events),
    one distinct + count. No window over the full event stream."""
    e = load_table(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(
        F.min(F.col("ts").cast("date")).alias("cohort_day")
    )
    activity = (
        e.join(firsts, "user_id")
        .select(
            "user_id",
            "cohort_day",
            F.datediff(F.col("ts").cast("date"), F.col("cohort_day")).alias(
                "day_offset"
            ),
        )
        .filter(F.col("day_offset") <= 7)
        .distinct()
    )
    return activity.groupBy(
        F.col("cohort_day").cast("string").alias("cohort"), "day_offset"
    ).agg(F.count("*").alias("active_users"))


@register(
    "window_session_dynamic_gap",
    oracle="""
    WITH e AS (
      SELECT user_id, epoch_us(ts) AS t,
             CASE WHEN event_type = 'click' THEN 600000000
                  ELSE 1800000000 END AS gap
      -- NULL ts rows belong to no session; excluded in BOTH engines
      FROM events WHERE ts IS NOT NULL),
    m AS (
      SELECT user_id, t, gap,
             MAX(t + gap) OVER (PARTITION BY user_id ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
      FROM e),
    b AS (
      SELECT user_id, t, gap,
             CASE WHEN prev_max IS NULL OR t >= prev_max THEN 1 ELSE 0 END AS brk
      FROM m),
    s AS (
      SELECT user_id, t, gap,
             SUM(brk) OVER (PARTITION BY user_id ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM b)
    SELECT user_id,
           strftime(make_timestamp(MIN(t)), '%Y-%m-%d %H:%M:%S') AS session_start,
           strftime(make_timestamp(MAX(t + gap)), '%Y-%m-%d %H:%M:%S') AS session_end,
           COUNT(*) AS n_events
    FROM s GROUP BY user_id, sid
    """,
    tags=("window", "timeseries", "session"),
)
def window_session_dynamic_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows with a DYNAMIC gap — the gap depends on the
    event (10 min after a click, 30 min otherwise), which Spark's
    native session_window supports as a gap *expression*. The oracle
    restates the merge semantics from first principles: an event opens
    a new session iff its time reaches the running max of previous
    events' (ts + gap) ends; a session's end is the max merged end.
    Matching the native operator against that independent formulation
    is the strongest check a custom-session engine gets.

    Scale: one shuffle on user_id; Spark's session operator merges
    sort-locally exactly like the window formulation."""
    e = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    gap = F.when(F.col("event_type") == "click", F.lit("10 minutes")).otherwise(
        F.lit("30 minutes")
    )
    agg = e.groupBy(F.session_window("ts", gap), "user_id").agg(
        F.count("*").alias("n_events")
    )
    return agg.select(
        "user_id",
        F.date_format(F.col("session_window.start"), "yyyy-MM-dd HH:mm:ss").alias(
            "session_start"
        ),
        F.date_format(F.col("session_window.end"), "yyyy-MM-dd HH:mm:ss").alias(
            "session_end"
        ),
        "n_events",
    )


@register(
    "events_cusum_changepoint",
    oracle="""
    WITH base AS (
      SELECT user_id, event_id, ts, round(value, 6) AS v
      -- NULL ts/value guard: engine NULL-ordering differs (see
      -- events_theil_sen_trend note)
      FROM events WHERE ts IS NOT NULL AND value IS NOT NULL),
    st AS (
      SELECT user_id,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST(SUM(CAST(v AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS mu
      FROM base GROUP BY user_id),
    dev AS (
      SELECT b.user_id, b.event_id, b.ts, st.n_events,
             CAST(round((b.v - st.mu) * 1000000, 0) AS BIGINT) AS dev_u
      FROM base b JOIN st ON st.user_id = b.user_id),
    cs AS (
      SELECT user_id, event_id, ts, n_events,
             CAST(SUM(dev_u) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS s_u,
             CAST(row_number() OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS BIGINT) AS pos
      FROM dev)
    SELECT user_id, n_events,
           round(CAST(abs(s_u) AS DOUBLE) / 1000000.0, 6) AS max_abs_cusum,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS changepoint_ts,
           round(CAST(pos AS DOUBLE) / n_events, 6) AS changepoint_frac
    FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                                       ORDER BY abs(s_u) DESC, ts, event_id) AS rn
          FROM cs)
    WHERE rn = 1
    """,
    tags=("timeseries", "monitoring"),
)
def events_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point detection per user: the cumulative sum of
    mean-centered values S_i = sum_{j<=i}(x_j - mean) peaks (in
    absolute value) at the most likely single change-point — the
    standard offline CUSUM estimator monitoring pipelines run over
    per-entity metric streams. Reports each user's peak |S|, where it
    happened, and how far through the series (a mid-series peak with
    large |S| is a genuine level shift; peaks near the edges are
    noise).

    Determinism: deviations are centered on an exact decimal-sum mean
    and rounded to integer micro-units BEFORE the cumulative sum, so
    every running value is an exact bigint in both engines; ties in
    the peak break on (ts, event_id).

    Scale: two user_id exchanges — the mean aggregate's partial/final
    pair and the join's probe side — then both windows reuse the
    join's user_id partitioning (plan-pinned: 2 Exchanges total); all
    window work is partition-local. No iteration, no driver state."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    base = e.filter(
        F.col("ts").isNotNull() & F.col("value").isNotNull()
    ).select("user_id", "event_id", "ts", F.round("value", 6).alias("v"))
    st = base.groupBy("user_id").agg(
        F.count("*").cast("bigint").alias("n_events"),
        (
            F.sum(F.col("v").cast("decimal(18,6)")).cast("double") / F.count("*")
        ).alias("mu"),
    )
    dev = base.join(st, "user_id").select(
        "user_id", "event_id", "ts", "n_events",
        F.round((F.col("v") - F.col("mu")) * 1000000, 0)
        .cast("bigint")
        .alias("dev_u"),
    )
    wseq = Window.partitionBy("user_id").orderBy("ts", "event_id")
    cs = dev.select(
        "user_id", "event_id", "ts", "n_events",
        F.sum("dev_u").over(wseq.rowsBetween(Window.unboundedPreceding, 0))
        .cast("bigint")
        .alias("s_u"),
        F.row_number().over(wseq).cast("bigint").alias("pos"),
    )
    wpeak = Window.partitionBy("user_id").orderBy(
        F.abs(F.col("s_u")).desc(), "ts", "event_id"
    )
    return (
        cs.withColumn("rn", F.row_number().over(wpeak))
        .filter(F.col("rn") == 1)
        .select(
            "user_id", "n_events",
            F.round(F.abs(F.col("s_u")).cast("double") / 1000000.0, 6).alias(
                "max_abs_cusum"
            ),
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("changepoint_ts"),
            F.round(F.col("pos").cast("double") / F.col("n_events"), 6).alias(
                "changepoint_frac"
            ),
        )
    )


@register(
    "events_markov_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL),
    cnt AS (
      SELECT prev_type, event_type AS next_type,
             CAST(COUNT(*) AS BIGINT) AS n_trans
      FROM seq WHERE prev_type IS NOT NULL
      GROUP BY prev_type, event_type),
    tot AS (
      SELECT prev_type, CAST(SUM(n_trans) AS BIGINT) AS n_from
      FROM cnt GROUP BY prev_type)
    SELECT c.prev_type, c.next_type, c.n_trans, t.n_from,
           CAST(round(c.n_trans * 1000000.0 / t.n_from, 0) AS BIGINT) AS prob_ppm
    FROM cnt c JOIN tot t ON t.prev_type = c.prev_type
    """,
    tags=("timeseries", "sequence"),
)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: count (prev event_type -> next event_type) transitions
    and their row-normalized probabilities — the behavioral-model
    fingerprint session-anomaly and bot screens compare against (a
    scraper's transition row diverges sharply from organic traffic).

    Determinism: counts are exact bigints; probabilities are a single
    round(n*1e6/total) — integer ppm in both engines.

    Scale: one user_id shuffle for the lag window, then a transition
    aggregate whose cardinality is |event_type|^2 (tiny — partial
    map-side combine absorbs the volume); the row-total join
    broadcasts. No iteration, no Python."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = (
        e.filter(F.col("ts").isNotNull() & F.col("event_type").isNotNull())
        .select("event_type", F.lag("event_type").over(w).alias("prev_type"))
        .filter(F.col("prev_type").isNotNull())
    )
    cnt = seq.groupBy(
        "prev_type", F.col("event_type").alias("next_type")
    ).agg(F.count("*").cast("bigint").alias("n_trans"))
    tot = cnt.groupBy("prev_type").agg(
        F.sum("n_trans").cast("bigint").alias("n_from")
    )
    return cnt.join(F.broadcast(tot), "prev_type").select(
        "prev_type", "next_type", "n_trans", "n_from",
        F.round(F.col("n_trans") * 1000000.0 / F.col("n_from"), 0)
        .cast("bigint")
        .alias("prob_ppm"),
    )


@register(
    "events_autocorr_lag1",
    oracle="""
    WITH s AS (
      -- cast to DECIMAL BEFORE multiplying (the embed_text_consistency_corr
      -- pattern): both engines then form v*pv as an EXACT decimal product
      -- and round it HALF_UP identically — a double-side product can land
      -- exactly on a 5e-7 tie (0.001*0.0005) and round the other way
      SELECT user_id, CAST(round(value, 6) AS DECIMAL(18,6)) AS v,
             lag(CAST(round(value, 6) AS DECIMAL(18,6)))
               OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pv
      FROM events WHERE ts IS NOT NULL AND value IS NOT NULL),
    pairs AS (SELECT user_id, v, pv FROM s WHERE pv IS NOT NULL),
    -- products round back to scale 6 before the exact sum: unscaled
    -- values stay < 2^53 so the decimal->double cast is 1-ulp-safe
    m AS (
      SELECT user_id, COUNT(*) AS n,
             CAST(SUM(v) AS DOUBLE) AS sx,
             CAST(SUM(CAST(round(v * v, 6) AS DECIMAL(18,6))) AS DOUBLE) AS sxx,
             CAST(SUM(pv) AS DOUBLE) AS sy,
             CAST(SUM(CAST(round(pv * pv, 6) AS DECIMAL(18,6))) AS DOUBLE) AS syy,
             CAST(SUM(CAST(round(v * pv, 6) AS DECIMAL(18,6))) AS DOUBLE) AS sxy
      FROM pairs GROUP BY user_id)
    -- a CONSTANT series has zero variance: the correlation is
    -- undefined (0/0 -> NaN in Spark, engine-dependent in DuckDB), so
    -- both engines return NULL explicitly
    -- + 0 normalizes IEEE -0.0 to +0.0: DuckDB's round keeps the sign
    -- of a tiny negative correlation (-1e-12 -> -0.0) while Spark's
    -- BigDecimal HALF_UP round has no signed zero (-> 0.0); x + 0 = x
    -- for every other double and NULL stays NULL, so only the
    -- zero-correlation sign bit is touched (null-fuzz finding, r13)
    SELECT user_id, n,
           CASE WHEN (sxx - sx*sx/n) > 0 AND (syy - sy*sy/n) > 0
                THEN round(((sxy - sx*sy/n)/n)
                           / (sqrt((sxx - sx*sx/n)/n)
                              * sqrt((syy - sy*sy/n)/n)), 6) + 0
           END AS autocorr_lag1
    FROM m WHERE n >= 3
    """,
    tags=("timeseries", "stats"),
)
def events_autocorr_lag1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 autocorrelation per user: Pearson r between consecutive
    values in event order — near zero for organic bursty metrics,
    strongly positive for smoothed/interpolated (i.e. synthetic)
    series, the cheapest single-number 'is this stream real' test and
    the seasonality precursor (high |r| says model the sequence, not
    the marginal distribution).

    Determinism: the agg_stats recipe over (value, lagged value)
    pairs — exact decimal moments, one shared IEEE formula, rounded.

    Scale: one user_id shuffle serves the lag window and the moment
    aggregate (partial map-side); output is |users|-sized."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    v6 = F.round("value", 6)
    s = (
        e.filter(F.col("ts").isNotNull() & F.col("value").isNotNull())
        .select(
            "user_id",
            v6.cast("decimal(18,6)").alias("v"),
            F.lag(v6).over(w).cast("decimal(18,6)").alias("pv"),
        )
        .filter(F.col("pv").isNotNull())
    )
    m = s.groupBy("user_id").agg(
        F.count("*").alias("n"),
        F.sum("v").cast("double").alias("sx"),
        F.sum(F.round(F.col("v") * F.col("v"), 6).cast("decimal(18,6)"))
        .cast("double")
        .alias("sxx"),
        F.sum("pv").cast("double").alias("sy"),
        F.sum(F.round(F.col("pv") * F.col("pv"), 6).cast("decimal(18,6)"))
        .cast("double")
        .alias("syy"),
        F.sum(F.round(F.col("v") * F.col("pv"), 6).cast("decimal(18,6)"))
        .cast("double")
        .alias("sxy"),
    )
    n, sx, sxx, sy, syy, sxy = (
        F.col(c) for c in ["n", "sx", "sxx", "sy", "syy", "sxy"]
    )
    return m.filter(n >= 3).select(
        "user_id",
        "n",
        # zero-variance (constant) series: undefined -> NULL, not 0/0 NaN
        F.when(
            ((sxx - sx * sx / n) > 0) & ((syy - sy * sy / n) > 0),
            F.round(
                ((sxy - sx * sy / n) / n)
                / (
                    F.sqrt((sxx - sx * sx / n) / n)
                    * F.sqrt((syy - sy * sy / n) / n)
                ),
                6,
            ),
        ).alias("autocorr_lag1"),
    )


@register(
    "events_theil_sen_trend",
    oracle="""
    WITH s AS (
      SELECT user_id, event_id, epoch_us(ts) // 1000000 AS t,
             round(value, 6) AS v
      -- NULL values/timestamps are excluded explicitly: a NULL slope
      -- would rank NULLS-first in Spark vs NULLS-last in DuckDB
      FROM events WHERE user_id % 5 = 0
        AND value IS NOT NULL AND ts IS NOT NULL),
    p AS (
      SELECT a.user_id,
             CAST(round((b.v - a.v) / (b.t - a.t) * 1000000, 0) AS BIGINT)
               AS slope_u
      FROM s a JOIN s b
        ON a.user_id = b.user_id AND b.t > a.t),
    r AS (
      SELECT user_id, slope_u,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY slope_u, user_id) AS rn,
             COUNT(*) OVER (PARTITION BY user_id) AS n_pairs
      FROM p)
    SELECT user_id, CAST(n_pairs AS BIGINT) AS n_pairs,
           round(slope_u / 1000000.0, 6) AS theil_sen_slope
    FROM r WHERE rn = (n_pairs + 1) // 2
    """,
    tags=("timeseries", "stats"),
)
def events_theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen trend per user: the MEDIAN of all pairwise slopes
    (v_j - v_i)/(t_j - t_i) — the robust trend estimator that, unlike
    OLS, shrugs off up to ~29% outliers, which is why monitoring
    pipelines fit it to noisy per-entity metrics. Pairs with strictly
    increasing timestamps only (ties in t are excluded — the
    textbook formulation), median taken as the lower order statistic
    with a deterministic rank order.

    Determinism: slopes quantize to integer micro-units (one shared
    double divide on exact second/round(6) inputs, rounded once); the
    median is an exact order statistic, never an interpolation.

    Scale: the pair join is user-local, so the quadratic term is
    bounded by events-per-user (~10^2 here; at 100 TB you window it
    to the trailing N samples per entity — same plan, bounded
    fan-out), and the shuffle is one exchange on user_id shared by
    the join and the rank window."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    s = e.filter(
        (F.col("user_id") % 5 == 0)
        & F.col("value").isNotNull()
        & F.col("ts").isNotNull()
    ).select(
        "user_id",
        F.floor(F.unix_micros("ts") / 1000000).cast("bigint").alias("t"),
        F.round("value", 6).alias("v"),
    )
    b = s.select(
        F.col("user_id").alias("b_uid"),
        F.col("t").alias("b_t"),
        F.col("v").alias("b_v"),
    )
    p = s.join(
        b, (F.col("user_id") == F.col("b_uid")) & (F.col("b_t") > F.col("t"))
    ).select(
        "user_id",
        F.round((F.col("b_v") - F.col("v")) / (F.col("b_t") - F.col("t")) * 1000000, 0)
        .cast("bigint")
        .alias("slope_u"),
    )
    w = Window.partitionBy("user_id").orderBy("slope_u", "user_id")
    r = p.select(
        "user_id",
        "slope_u",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(Window.partitionBy("user_id")).alias("n_pairs"),
    )
    return r.filter(
        F.col("rn") == F.floor((F.col("n_pairs") + 1) / 2)
    ).select(
        "user_id",
        F.col("n_pairs").cast("bigint").alias("n_pairs"),
        F.round(F.col("slope_u") / 1000000.0, 6).alias("theil_sen_slope"),
    )


# --- SCD2 dimension build ---------------------------------------------------


@register(
    "dim_scd2_from_events",
    oracle="""
    WITH e AS (
      SELECT user_id, event_type, ts, event_id
      FROM events
      WHERE user_id IS NOT NULL AND event_type IS NOT NULL
        AND ts IS NOT NULL AND event_id IS NOT NULL),
    marked AS (
      SELECT user_id, event_type, ts, event_id,
             CASE WHEN lag(event_type) OVER w IS NULL
                    OR lag(event_type) OVER w <> event_type
                  THEN 1 ELSE 0 END AS is_new
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    runs AS (
      -- the running sum MUST share the lag window's total order
      -- (ts, event_id): duplicate timestamps would otherwise make
      -- run_id assignment engine-dependent
      SELECT user_id, event_type, ts,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS run_id
      FROM marked),
    dim AS (
      SELECT user_id, event_type AS state, run_id,
             MIN(ts) AS valid_from,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM runs GROUP BY user_id, event_type, run_id)
    SELECT user_id, state,
           epoch_us(valid_from) AS valid_from_us,
           epoch_us(lead(valid_from) OVER (PARTITION BY user_id ORDER BY run_id))
             AS valid_to_us,
           (lead(valid_from) OVER (PARTITION BY user_id ORDER BY run_id)
             IS NULL) AS is_current,
           n_events
    FROM dim
    """,
    tags=("timeseries", "window", "warehouse"),
)
def dim_scd2_from_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 slowly-changing-dimension build from an event stream —
    the standard warehouse pattern for turning a mutation log into a
    point-in-time dimension: consecutive runs of the same per-user
    state collapse into one row with [valid_from, valid_to) validity,
    the open row (valid_to NULL) flagged is_current. An AS OF join
    against this table answers "what was the user's state at time T"
    — the lookup every feature-backfill pipeline needs.

    Scale shape: ONE shuffle on user_id serves all three windows (the
    run-start lag, the running run_id sum, and the valid_to lead share
    the same partitioning), then a partial-aggregating groupBy on the
    same key — no joins, no second exchange of the event log. Rows
    with NULL user/state/ts/event_id are excluded on both engines:
    the window order (ts, event_id) must be total for runs to be
    deterministic.

    Ref parity: the reference's sink materializes exactly this kind of
    per-key mutation feed into Hive (HiveStreamDataWriter.scala:39-41);
    this op is the dimension-table consumer of such a feed."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
        & F.col("event_type").isNotNull()
        & F.col("ts").isNotNull()
        & F.col("event_id").isNotNull()
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = e.select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        F.when(
            F.lag("event_type").over(w).isNull()
            | (F.lag("event_type").over(w) != F.col("event_type")),
            1,
        )
        .otherwise(0)
        .alias("is_new"),
    )
    runs = marked.select(
        "user_id",
        "event_type",
        "ts",
        # same total order (ts, event_id) as the lag window — duplicate
        # timestamps would otherwise make run_id engine-dependent
        F.sum("is_new")
        .over(
            Window.partitionBy("user_id")
            .orderBy("ts", "event_id")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        .alias("run_id"),
    )
    dim = runs.groupBy("user_id", F.col("event_type").alias("state"), "run_id").agg(
        F.min("ts").alias("valid_from"),
        F.count("*").cast("bigint").alias("n_events"),
    )
    w2 = Window.partitionBy("user_id").orderBy("run_id")
    # epoch-micros export: raw timestamp outputs are banned by the
    # type canon (driver hash diverges on temporal export formats)
    return dim.select(
        "user_id",
        "state",
        F.unix_micros("valid_from").alias("valid_from_us"),
        F.unix_micros(F.lead("valid_from").over(w2)).alias("valid_to_us"),
        F.lead("valid_from").over(w2).isNull().alias("is_current"),
        "n_events",
    )


@register(
    "events_rfm_segmentation",
    oracle="""
    WITH e AS (
      -- NULL ts rows are unplaceable on the recency axis: excluded in
      -- BOTH engines (Spark sorts NULLS FIRST asc vs DuckDB NULLS LAST)
      SELECT * FROM events WHERE ts IS NOT NULL),
    anchor AS (SELECT MAX(CAST(ts AS DATE)) AS as_of FROM e),
    per_user AS (
      SELECT user_id,
             datediff('day', MAX(CAST(ts AS DATE)),
                      (SELECT as_of FROM anchor)) AS recency_days,
             COUNT(*) AS frequency,
             COALESCE(CAST(SUM(CAST(ROUND(value * 10000, 0) AS BIGINT))
                           AS DOUBLE) / 10000.0, 0.0) AS monetary
      FROM e GROUP BY user_id)
    SELECT user_id, recency_days, frequency, monetary,
           ntile(5) OVER (ORDER BY recency_days DESC,
                          user_id NULLS FIRST) AS r_score,
           ntile(5) OVER (ORDER BY frequency ASC,
                          user_id NULLS FIRST) AS f_score,
           ntile(5) OVER (ORDER BY monetary ASC,
                          user_id NULLS FIRST) AS m_score
    FROM per_user
    """,
    tags=("aggregate", "timeseries", "segmentation"),
)
def events_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency / frequency / monetary) customer segmentation —
    the classic CRM rollup: per-user days-since-last-event against the
    corpus max date, event count, and exact-cents value sum, each
    quintiled with ntile(5) so that higher score = better (more recent,
    more frequent, higher value).

    Exactness: recency/frequency are integers; monetary is an exact
    integer-units sum (dsum idiom) coalesced to 0 so no NULL ever
    reaches the ntile ordering; every ntile ORDER BY carries user_id as
    the total-order tiebreak, making bucket boundaries deterministic
    cross-engine. Scale: one groupBy(user_id) aggregate + a broadcast
    1-row anchor; the three ntiles run over the per-user table (rows =
    users, not events). A global ntile is a single-partition sort —
    at 100 TB of *users* you would bucket by percentile ranks from
    approx_percentile instead; at any realistic user count (1e9 rows of
    3 ints) the single-reducer sort holds."""
    e = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    anchor = e.agg(F.max(F.col("ts").cast("date")).alias("as_of"))
    per_user = (
        e.groupBy("user_id")
        .agg(
            F.max(F.col("ts").cast("date")).alias("last_day"),
            F.count("*").alias("frequency"),
            (
                F.sum(F.round(F.col("value") * 10000, 0).cast("bigint")).cast(
                    "double"
                )
                / 10000.0
            ).alias("monetary_raw"),
        )
        .crossJoin(F.broadcast(anchor))
        .select(
            "user_id",
            F.datediff("as_of", "last_day").alias("recency_days"),
            "frequency",
            F.coalesce(F.col("monetary_raw"), F.lit(0.0)).alias("monetary"),
        )
    )
    return per_user.select(
        "user_id",
        "recency_days",
        "frequency",
        "monetary",
        F.ntile(5)
        .over(Window.orderBy(F.col("recency_days").desc(), F.col("user_id")))
        .alias("r_score"),
        F.ntile(5)
        .over(Window.orderBy(F.col("frequency").asc(), F.col("user_id")))
        .alias("f_score"),
        F.ntile(5)
        .over(Window.orderBy(F.col("monetary").asc(), F.col("user_id")))
        .alias("m_score"),
    )


@register(
    "events_interarrival_burstiness",
    oracle="""
    WITH e AS (
      SELECT user_id, epoch_us(ts) AS t, event_id
      FROM events WHERE ts IS NOT NULL),
    g AS (
      SELECT user_id,
             (t - lag(t) OVER (PARTITION BY user_id
                               ORDER BY t, event_id)) // 1000000 AS gap_s
      FROM e),
    s AS (
      SELECT user_id,
             COUNT(gap_s) AS n_gaps,
             SUM(gap_s) AS sum_g,
             SUM(gap_s * gap_s) AS sum_g2
      FROM g WHERE gap_s IS NOT NULL GROUP BY user_id
      HAVING COUNT(gap_s) >= 2)
    SELECT user_id, n_gaps,
           round(CAST(sum_g AS DOUBLE) / n_gaps, 6) AS mean_gap_s,
           round(sqrt(greatest(
             (CAST(sum_g2 AS DOUBLE)
              - CAST(sum_g AS DOUBLE) * CAST(sum_g AS DOUBLE) / n_gaps)
             / (n_gaps - 1), 0.0e0)), 6) AS sd_gap_s,
           round(
             (sqrt(greatest(
                (CAST(sum_g2 AS DOUBLE)
                 - CAST(sum_g AS DOUBLE) * CAST(sum_g AS DOUBLE) / n_gaps)
                / (n_gaps - 1), 0.0e0))
              - CAST(sum_g AS DOUBLE) / n_gaps)
             / nullif(
               sqrt(greatest(
                 (CAST(sum_g2 AS DOUBLE)
                  - CAST(sum_g AS DOUBLE) * CAST(sum_g AS DOUBLE) / n_gaps)
                 / (n_gaps - 1), 0.0e0))
               + CAST(sum_g AS DOUBLE) / n_gaps, 0.0e0), 6) AS burstiness
    FROM s
    """,
    tags=("timeseries", "statistics"),
)
def events_interarrival_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user inter-arrival-time statistics + the Goh–Barabási
    burstiness coefficient B = (σ−μ)/(σ+μ): B→1 for bursty (bot-like)
    traffic, B≈0 for Poisson, B→−1 for metronomic schedules — a
    standard traffic-shape screen on an event log.

    Exactness: gaps are integer whole seconds (epoch-micros integer
    division), so Σg and Σg² are exact BIGINTs; the mean/variance
    doubles are computed by the IDENTICAL expression tree in both
    engines and rounded to 6. Σg² fits BIGINT up to ~1e5-second gaps ×
    ~1e5 events/user — beyond that switch the unit to minutes.
    Scale: one shuffle on user_id for the lag window, then a pure
    map-side-combinable integer aggregate. No collect, no fold."""
    e = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull())
        .select("user_id", F.unix_micros("ts").alias("t"), "event_id")
    )
    w = Window.partitionBy("user_id").orderBy("t", "event_id")
    g = e.select(
        "user_id",
        F.expr("(t - lag(t) over (partition by user_id order by t, event_id))"
               " div 1000000").alias("gap_s"),
    ).filter(F.col("gap_s").isNotNull())
    s = (
        g.groupBy("user_id")
        .agg(
            F.count("gap_s").alias("n_gaps"),
            F.sum("gap_s").alias("sum_g"),
            F.sum(F.col("gap_s") * F.col("gap_s")).alias("sum_g2"),
        )
        .filter(F.col("n_gaps") >= 2)
    )
    mean = F.col("sum_g").cast("double") / F.col("n_gaps")
    var = F.greatest(
        (
            F.col("sum_g2").cast("double")
            - F.col("sum_g").cast("double")
            * F.col("sum_g").cast("double")
            / F.col("n_gaps")
        )
        / (F.col("n_gaps") - 1),
        F.lit(0.0),
    )
    sd = F.sqrt(var)
    return s.select(
        "user_id",
        "n_gaps",
        F.round(mean, 6).alias("mean_gap_s"),
        F.round(sd, 6).alias("sd_gap_s"),
        F.round((sd - mean) / F.nullif(sd + mean, F.lit(0.0)), 6).alias(
            "burstiness"
        ),
    )


@register(
    "events_cohort_ltv",
    oracle="""
    WITH e AS (SELECT * FROM events WHERE ts IS NOT NULL),
    firsts AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day
      FROM e GROUP BY user_id),
    cells AS (
      SELECT f.cohort_day,
             datediff('day', f.cohort_day, CAST(e.ts AS DATE)) AS day_offset,
             COALESCE(SUM(CAST(ROUND(e.value * 10000, 0) AS BIGINT)), 0)
               AS period_units
      FROM e JOIN firsts f ON e.user_id = f.user_id
      WHERE datediff('day', f.cohort_day, CAST(e.ts AS DATE)) <= 14
      GROUP BY 1, 2)
    SELECT CAST(cohort_day AS VARCHAR) AS cohort,
           day_offset,
           CAST(period_units AS DOUBLE) / 10000.0 AS period_value,
           CAST(SUM(period_units) OVER (PARTITION BY cohort_day
                ORDER BY day_offset
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) / 10000.0 AS cum_value
    FROM cells
    """,
    tags=("aggregate", "timeseries", "cohort"),
)
def events_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curve — the value-weighted sibling of
    events_retention_cohorts: users cohorted by first-seen day, event
    value summed per (cohort, day-offset) cell in exact integer units,
    then accumulated along the offset axis so each cell reads as
    cumulative value per cohort through day N (first two weeks).

    Exactness: the running sum folds exact BIGINT units; the /1e4
    double conversion is a single identical IEEE op per cell in both
    engines. Scale: one aggregate for cohort days, one user-keyed join
    (AQE-sized), one cell aggregate; the cumulative window runs over
    the tiny (cohort × 15) cell table, not the event stream."""
    e = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    firsts = e.groupBy("user_id").agg(
        F.min(F.col("ts").cast("date")).alias("cohort_day")
    )
    cells = (
        e.join(firsts, "user_id")
        .select(
            "cohort_day",
            F.datediff(F.col("ts").cast("date"), F.col("cohort_day")).alias(
                "day_offset"
            ),
            F.round(F.col("value") * 10000, 0).cast("bigint").alias("units"),
        )
        .filter(F.col("day_offset") <= 14)
        .groupBy("cohort_day", "day_offset")
        .agg(F.coalesce(F.sum("units"), F.lit(0)).alias("period_units"))
    )
    w = (
        Window.partitionBy("cohort_day")
        .orderBy("day_offset")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return cells.select(
        F.col("cohort_day").cast("string").alias("cohort"),
        "day_offset",
        (F.col("period_units").cast("double") / 10000.0).alias("period_value"),
        (F.sum("period_units").over(w).cast("double") / 10000.0).alias(
            "cum_value"
        ),
    )


@register(
    "events_seasonal_decompose",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day,
             COALESCE(SUM(CAST(ROUND(value * 10000, 0) AS BIGINT)), 0)
               AS units
      FROM events WHERE ts IS NOT NULL GROUP BY 1),
    tr AS (
      SELECT day, units,
             SUM(units) OVER w AS w_units,
             COUNT(*) OVER w AS w_n
      FROM daily
      WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
    det AS (
      SELECT day,
             datediff('day', DATE '1970-01-05', day) % 7 AS wd,
             CAST(units AS DOUBLE) / 10000.0 AS value,
             CAST(w_units AS DOUBLE) / w_n / 10000.0 AS trend,
             CAST(ROUND((CAST(units AS DOUBLE) / 10000.0
                         - CAST(w_units AS DOUBLE) / w_n / 10000.0)
                        * 1000000, 0) AS BIGINT) AS dmicro
      FROM tr WHERE w_n = 7),
    seas AS (
      SELECT wd,
             CAST(SUM(dmicro) AS DOUBLE) / COUNT(*) / 1000000.0 AS s
      FROM det GROUP BY wd)
    SELECT CAST(d.day AS VARCHAR) AS day, d.wd, d.value,
           round(d.trend, 6) AS trend,
           round(s.s, 6) AS seasonal,
           round(d.value - d.trend - s.s, 6) AS residual
    FROM det d JOIN seas s ON d.wd = s.wd
    """,
    tags=("timeseries", "decomposition"),
)
def events_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive seasonal decomposition of the daily value
    series: trend = centered 7-day moving average (full frames only),
    weekday seasonal = mean detrended residual per weekday, residual =
    value − trend − seasonal. The moving-parts version of what STL does
    — and the shape every anomaly-detection pipeline runs before
    flagging outliers.

    Exactness: daily sums fold exact integer units; the trend is one
    exact BIGINT frame-sum divided once; detrended values are rounded
    to integer micro-units BEFORE the weekday average so that sum is
    order-independent too. Weekday is day-epoch arithmetic (mod-7 from
    a fixed Monday anchor), not engine-local dayofweek conventions.
    Scale: everything after the first aggregate runs on the tiny daily
    table (rows = distinct days); the event stream is scanned once."""
    e = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    daily = (
        e.groupBy(F.col("ts").cast("date").alias("day"))
        .agg(
            F.coalesce(
                F.sum(F.round(F.col("value") * 10000, 0).cast("bigint")),
                F.lit(0),
            ).alias("units")
        )
    )
    w = Window.orderBy("day").rowsBetween(-3, 3)
    tr = daily.select(
        "day",
        "units",
        F.sum("units").over(w).alias("w_units"),
        F.count("*").over(w).alias("w_n"),
    ).filter(F.col("w_n") == 7)
    value = F.col("units").cast("double") / 10000.0
    trend = F.col("w_units").cast("double") / F.col("w_n") / 10000.0
    det = tr.select(
        "day",
        (F.datediff("day", F.lit("1970-01-05").cast("date")) % 7).alias("wd"),
        value.alias("value"),
        trend.alias("trend"),
        F.round((value - trend) * 1000000, 0).cast("bigint").alias("dmicro"),
    )
    seas = det.groupBy("wd").agg(
        (F.sum("dmicro").cast("double") / F.count("*") / 1000000.0).alias("s")
    )
    return det.join(seas, "wd").select(
        F.col("day").cast("string").alias("day"),
        "wd",
        "value",
        F.round("trend", 6).alias("trend"),
        F.round("s", 6).alias("seasonal"),
        F.round(F.col("value") - F.col("trend") - F.col("s"), 6).alias(
            "residual"
        ),
    )


@register(
    "events_funnel_time_to_convert",
    oracle="""
    WITH e AS (SELECT * FROM events WHERE ts IS NOT NULL),
    tv AS (
      SELECT user_id, MIN(ts) FILTER (event_type = 'view') AS t_view
      FROM e GROUP BY user_id),
    tc AS (
      SELECT e.user_id, MIN(e.ts) AS t_click
      FROM e JOIN tv ON e.user_id IS NOT DISTINCT FROM tv.user_id
      WHERE e.event_type = 'click' AND e.ts > tv.t_view
      GROUP BY e.user_id),
    tp AS (
      SELECT e.user_id, MIN(e.ts) AS t_purchase
      FROM e JOIN tc ON e.user_id IS NOT DISTINCT FROM tc.user_id
      WHERE e.event_type = 'purchase' AND e.ts > tc.t_click
      GROUP BY e.user_id),
    lat AS (
      SELECT 'view_to_click' AS stage,
             (epoch_us(tc.t_click) - epoch_us(tv.t_view)) // 1000000 AS lat_s
      FROM tc JOIN tv ON tc.user_id IS NOT DISTINCT FROM tv.user_id
      UNION ALL
      SELECT 'click_to_purchase' AS stage,
             (epoch_us(tp.t_purchase) - epoch_us(tc.t_click)) // 1000000 AS lat_s
      FROM tp JOIN tc ON tp.user_id IS NOT DISTINCT FROM tc.user_id)
    SELECT stage,
           CAST(COUNT(*) AS BIGINT) AS n_converted,
           round(quantile_cont(lat_s, 0.5), 6) AS median_latency_s,
           round(CAST(SUM(lat_s) AS DOUBLE) / COUNT(*), 6) AS mean_latency_s,
           CAST(MAX(lat_s) AS BIGINT) AS max_latency_s
    FROM lat GROUP BY stage
    """,
    tags=("timeseries", "funnel"),
)
def events_funnel_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel step-latency distribution: per user, the first view,
    the first click strictly after it, and the first purchase strictly
    after that; then per funnel stage the converted-user count and the
    median / mean / max conversion latency in whole seconds — the
    'how long does the funnel take' readout next to
    events_funnel_analysis's 'how many make it'.

    Exactness: latencies are integer whole seconds (epoch-micros
    integer division); medians interpolate on the integer grid
    identically in both engines (the MAD-op precedent); the mean is an
    exact integer sum divided once. Scale: three user-keyed aggregates
    chained by user-keyed joins (each AQE-sized, rows = users), never
    a window over the event stream; NULL user_id stays one group via
    null-safe join keys."""
    e = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    tv = e.groupBy(F.col("user_id").alias("uid_v")).agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view")
    )
    tc = (
        e.join(tv, F.col("user_id").eqNullSafe(F.col("uid_v")))
        .filter((F.col("event_type") == "click") & (F.col("ts") > F.col("t_view")))
        .groupBy(F.col("user_id").alias("uid_c"))
        .agg(F.min("ts").alias("t_click"))
    )
    tp = (
        e.join(tc, F.col("user_id").eqNullSafe(F.col("uid_c")))
        .filter(
            (F.col("event_type") == "purchase") & (F.col("ts") > F.col("t_click"))
        )
        .groupBy(F.col("user_id").alias("uid_p"))
        .agg(F.min("ts").alias("t_purchase"))
    )
    lat_vc = tc.join(tv, F.col("uid_c").eqNullSafe(F.col("uid_v"))).select(
        F.lit("view_to_click").alias("stage"),
        F.expr("(unix_micros(t_click) - unix_micros(t_view)) div 1000000").alias(
            "lat_s"
        ),
    )
    lat_cp = tp.join(tc, F.col("uid_p").eqNullSafe(F.col("uid_c"))).select(
        F.lit("click_to_purchase").alias("stage"),
        F.expr(
            "(unix_micros(t_purchase) - unix_micros(t_click)) div 1000000"
        ).alias("lat_s"),
    )
    return (
        lat_vc.unionAll(lat_cp)
        .groupBy("stage")
        .agg(
            F.count("*").cast("bigint").alias("n_converted"),
            F.round(F.expr("percentile(lat_s, 0.5D)"), 6).alias(
                "median_latency_s"
            ),
            F.round(F.sum("lat_s").cast("double") / F.count("*"), 6).alias(
                "mean_latency_s"
            ),
            F.max("lat_s").cast("bigint").alias("max_latency_s"),
        )
    )


@register(
    "events_poisson_dispersion",
    oracle="""
    WITH e AS (SELECT * FROM events WHERE ts IS NOT NULL),
    span AS (SELECT COUNT(DISTINCT CAST(ts AS DATE)) AS n_days FROM e),
    daily AS (
      SELECT user_id, CAST(ts AS DATE) AS day, COUNT(*) AS c
      FROM e GROUP BY user_id, day),
    s AS (
      SELECT user_id,
             CAST(SUM(c) AS BIGINT) AS sum_c,
             CAST(SUM(c * c) AS BIGINT) AS sum_c2
      FROM daily GROUP BY user_id)
    SELECT s.user_id,
           sp.n_days,
           s.sum_c AS n_events,
           round(CAST(s.sum_c AS DOUBLE) / sp.n_days, 6) AS mean_daily,
           round((CAST(s.sum_c2 AS DOUBLE)
                  - CAST(s.sum_c AS DOUBLE) * CAST(s.sum_c AS DOUBLE)
                    / sp.n_days)
                 / (sp.n_days - 1), 6) AS var_daily,
           round(((CAST(s.sum_c2 AS DOUBLE)
                   - CAST(s.sum_c AS DOUBLE) * CAST(s.sum_c AS DOUBLE)
                     / sp.n_days)
                  / (sp.n_days - 1))
                 / (CAST(s.sum_c AS DOUBLE) / sp.n_days), 6) AS dispersion
    FROM s CROSS JOIN span sp
    WHERE sp.n_days >= 2
    """,
    tags=("timeseries", "statistics", "anomaly"),
)
def events_poisson_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user Poisson dispersion (variance-to-mean ratio of DAILY
    event counts over the full corpus day span, zero days included):
    ≈1 for Poisson-like behavior, ≫1 flags bursty/bot accounts, ≪1
    metronomic schedulers — the count-domain overdispersion screen
    next to the inter-arrival burstiness coefficient.

    Exactness: zero days contribute 0 to both Σc and Σc², so the
    active-days sums ARE the full-span sums and no zero-fill join is
    needed; mean/variance/ratio are identical double expression trees
    over exact integers, rounded to 6. Scale: one (user, day)
    aggregate then one user aggregate — both map-side combinable; the
    1-row day-span broadcasts."""
    e = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    span = e.agg(
        F.countDistinct(F.col("ts").cast("date")).alias("n_days")
    )
    daily = e.groupBy(
        "user_id", F.col("ts").cast("date").alias("day")
    ).agg(F.count("*").alias("c"))
    s = daily.groupBy("user_id").agg(
        F.sum("c").cast("bigint").alias("sum_c"),
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("sum_c2"),
    )
    mean = F.col("sum_c").cast("double") / F.col("n_days")
    var = (
        F.col("sum_c2").cast("double")
        - F.col("sum_c").cast("double")
        * F.col("sum_c").cast("double")
        / F.col("n_days")
    ) / (F.col("n_days") - 1)
    return (
        s.crossJoin(F.broadcast(span))
        .filter(F.col("n_days") >= 2)
        .select(
            "user_id",
            "n_days",
            F.col("sum_c").alias("n_events"),
            F.round(mean, 6).alias("mean_daily"),
            F.round(var, 6).alias("var_daily"),
            F.round(var / mean, 6).alias("dispersion"),
        )
    )


@register(
    "events_retention_triangle",
    oracle="""
    WITH f AS (
      SELECT user_id, CAST(date_trunc('week', ts) AS TIMESTAMP) AS wk
      FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL),
    c AS (SELECT user_id, MIN(wk) AS cohort_week FROM f GROUP BY user_id),
    a AS (SELECT DISTINCT user_id, wk FROM f),
    s AS (SELECT cohort_week, COUNT(*) AS cohort_size FROM c
          GROUP BY cohort_week),
    j AS (
      SELECT c.cohort_week,
             CAST(date_diff('day', c.cohort_week, a.wk) // 7 AS BIGINT)
               AS week_index,
             a.user_id
      FROM a JOIN c USING (user_id)),
    g AS (
      SELECT cohort_week, week_index,
             COUNT(DISTINCT user_id) AS n_active
      FROM j GROUP BY cohort_week, week_index)
    SELECT strftime(g.cohort_week, '%Y-%m-%d') AS cohort_week,
           g.week_index, g.n_active,
           CAST(s.cohort_size AS BIGINT) AS cohort_size,
           CAST(g.n_active * 1000000 // s.cohort_size AS BIGINT)
             AS retained_ppm
    FROM g JOIN s USING (cohort_week)
    """,
    tags=("aggregate", "window", "timeseries", "retention"),
)
def events_retention_triangle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: users grouped by first-activity week,
    counted as retained in every later week they act in — the
    (cohort_week, week_index) matrix every growth/engagement dashboard
    renders, with exact integer-ppm retention rates.

    Exactness: week buckets are Monday-midnight date_trunc in both
    engines; week_index is an integer day-difference of two truncated
    midnights div 7; rates are integer-ppm floor division — all
    hash-exact. Scale: two shuffles on user_id (cohort min + activity
    distinct), one on the (cohort_week, week_index) key; the cohort-
    size table (one row per week) joins back via broadcast — at 100 TB
    weeks number in the hundreds while events number in the trillions,
    the classic tiny-dim join."""
    f = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull() & F.col("user_id").isNotNull())
        .select("user_id", F.date_trunc("week", F.col("ts")).alias("wk"))
    )
    c = f.groupBy("user_id").agg(F.min("wk").alias("cohort_week"))
    a = f.distinct()
    s = c.groupBy("cohort_week").agg(F.count("*").alias("cohort_size"))
    j = a.join(c, "user_id").select(
        "cohort_week",
        F.expr("CAST(datediff(wk, cohort_week) div 7 AS BIGINT)").alias(
            "week_index"
        ),
        "user_id",
    )
    g = j.groupBy("cohort_week", "week_index").agg(
        F.countDistinct("user_id").alias("n_active")
    )
    return g.join(F.broadcast(s), "cohort_week").select(
        # temporal outputs leave as formatted strings (type canon —
        # raw TIMESTAMP/DATE hash-diverge under the driver comparator)
        F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
        "week_index",
        "n_active",
        F.col("cohort_size").cast("bigint").alias("cohort_size"),
        F.expr("CAST(n_active * 1000000 div cohort_size AS BIGINT)").alias(
            "retained_ppm"
        ),
    )


@register(
    "events_survival_km",
    oracle="""
    WITH e AS (
      SELECT user_id, event_type, ts FROM events
      WHERE ts IS NOT NULL AND user_id IS NOT NULL),
    t0 AS (SELECT user_id, MIN(ts) AS signup_ts FROM e
           WHERE event_type = 'signup' GROUP BY user_id),
    study AS (SELECT MAX(ts) AS end_ts FROM e),
    p AS (SELECT e.user_id, MIN(e.ts) AS purchase_ts
          FROM e JOIN t0 USING (user_id)
          WHERE e.event_type = 'purchase' AND e.ts >= t0.signup_ts
          GROUP BY e.user_id),
    subj AS (
      SELECT p.purchase_ts IS NOT NULL AS observed,
             CASE WHEN p.purchase_ts IS NOT NULL
                  THEN (epoch_us(p.purchase_ts) - epoch_us(t0.signup_ts))
                       // 86400000000
                  ELSE (epoch_us(s.end_ts) - epoch_us(t0.signup_ts))
                       // 86400000000
             END AS dur_day
      FROM t0 LEFT JOIN p USING (user_id) CROSS JOIN study s),
    n_tot AS (SELECT COUNT(*) AS n FROM subj),
    by_day AS (
      SELECT dur_day,
             SUM(CASE WHEN observed THEN 1 ELSE 0 END) AS d,
             COUNT(*) AS leaving
      FROM subj GROUP BY dur_day),
    risk AS (
      SELECT dur_day, d,
             t.n - COALESCE(SUM(leaving) OVER (
               ORDER BY dur_day
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS n_at_risk
      FROM by_day CROSS JOIN n_tot t),
    ev AS (SELECT dur_day, d, n_at_risk FROM risk WHERE d > 0)
    SELECT CAST(dur_day AS BIGINT) AS day,
           CAST(n_at_risk AS BIGINT) AS n_at_risk,
           CAST(d AS BIGINT) AS n_events,
           CAST(floor(1000000 * list_reduce(
             list(1.0 - CAST(d AS DOUBLE) / CAST(n_at_risk AS DOUBLE))
               OVER (ORDER BY dur_day
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             (x, y) -> x * y)) AS BIGINT) AS survival_ppm
    FROM ev
    """,
    tags=("aggregate", "window", "timeseries", "survival"),
)
def events_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curve for time-to-first-purchase: each
    signup user is a subject from their first 'signup' event; the
    event is their first 'purchase' at-or-after signup, and users who
    never purchase are right-censored at the global study end (max ts).
    One row per event day: the at-risk count, the event count, and the
    KM survival estimate S(t) = prod_{u<=t} (1 - d_u/n_u) in ppm —
    the conversion/churn curve every lifecycle dashboard draws, with
    the censoring handled correctly instead of dropped.

    Exactness: durations are integer-microsecond day divisions; d and
    n are exact bigints; S(t) is a sequential double product in
    ascending-day order in BOTH engines (Spark folds a window-ordered
    collect_list, DuckDB list_reduce over a window-ordered list() —
    identical IEEE multiply sequence; the 1.0 init is exact), floored
    to ppm.

    Scale: subjects aggregate per user_id (one shuffle, map-side
    combine); the curve itself lives on the per-day table — O(distinct
    days), thousands of rows at any corpus size — so the global-order
    window and the product fold cost days, not events."""
    e = load_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
    )
    t0 = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("signup_ts"))
    )
    study = e.agg(F.max("ts").alias("end_ts"))
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(t0, "user_id")
        .filter(F.col("ts") >= F.col("signup_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("purchase_ts"))
    )
    # integer floor division on non-negative durations (purchase >=
    # signup, end >= signup), so Spark's div == DuckDB's // exactly
    subj = (
        t0.join(p, "user_id", "left")
        .crossJoin(F.broadcast(study))
        .select(
            F.col("purchase_ts").isNotNull().alias("observed"),
            F.when(
                F.col("purchase_ts").isNotNull(),
                F.expr(
                    "(unix_micros(purchase_ts) - unix_micros(signup_ts))"
                    " div 86400000000"
                ),
            )
            .otherwise(
                F.expr(
                    "(unix_micros(end_ts) - unix_micros(signup_ts))"
                    " div 86400000000"
                )
            )
            .alias("dur_day"),
        )
    )
    n_tot = subj.agg(F.count("*").alias("n"))
    by_day = subj.groupBy("dur_day").agg(
        F.sum(F.col("observed").cast("bigint")).alias("d"),
        F.count("*").alias("leaving"),
    )
    w_prev = Window.orderBy("dur_day").rowsBetween(Window.unboundedPreceding, -1)
    risk = by_day.crossJoin(F.broadcast(n_tot)).select(
        "dur_day",
        "d",
        (
            F.col("n") - F.coalesce(F.sum("leaving").over(w_prev), F.lit(0))
        ).alias("n_at_risk"),
    )
    ev = risk.filter(F.col("d") > 0)
    w_cur = Window.orderBy("dur_day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    factor = F.lit(1.0) - F.col("d").cast("double") / F.col("n_at_risk").cast(
        "double"
    )
    surv = F.aggregate(
        F.collect_list(factor).over(w_cur), F.lit(1.0), lambda a, x: a * x
    )
    return ev.select(
        F.col("dur_day").cast("bigint").alias("day"),
        F.col("n_at_risk").cast("bigint").alias("n_at_risk"),
        F.col("d").cast("bigint").alias("n_events"),
        F.floor(F.lit(1_000_000.0) * surv).cast("bigint").alias("survival_ppm"),
    )


@register(
    "events_nelson_aalen_hazard",
    oracle="""
    WITH e AS (
      SELECT user_id, event_type, ts FROM events
      WHERE ts IS NOT NULL AND user_id IS NOT NULL),
    t0 AS (SELECT user_id, MIN(ts) AS signup_ts FROM e
           WHERE event_type = 'signup' GROUP BY user_id),
    study AS (SELECT MAX(ts) AS end_ts FROM e),
    p AS (SELECT e.user_id, MIN(e.ts) AS purchase_ts
          FROM e JOIN t0 USING (user_id)
          WHERE e.event_type = 'purchase' AND e.ts >= t0.signup_ts
          GROUP BY e.user_id),
    subj AS (
      SELECT p.purchase_ts IS NOT NULL AS observed,
             CASE WHEN p.purchase_ts IS NOT NULL
                  THEN (epoch_us(p.purchase_ts) - epoch_us(t0.signup_ts))
                       // 86400000000
                  ELSE (epoch_us(s.end_ts) - epoch_us(t0.signup_ts))
                       // 86400000000
             END AS dur_day
      FROM t0 LEFT JOIN p USING (user_id) CROSS JOIN study s),
    n_tot AS (SELECT COUNT(*) AS n FROM subj),
    by_day AS (
      SELECT dur_day,
             SUM(CASE WHEN observed THEN 1 ELSE 0 END) AS d,
             COUNT(*) AS leaving
      FROM subj GROUP BY dur_day),
    risk AS (
      SELECT dur_day, d,
             t.n - COALESCE(SUM(leaving) OVER (
               ORDER BY dur_day
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS n_at_risk
      FROM by_day CROSS JOIN n_tot t),
    ev AS (
      SELECT dur_day, d, n_at_risk,
             CAST(round(1000000.0 * CAST(d AS DOUBLE)
                        / CAST(n_at_risk AS DOUBLE), 0) AS BIGINT)
               AS term_ppm
      FROM risk WHERE d > 0)
    SELECT CAST(dur_day AS BIGINT) AS day,
           CAST(n_at_risk AS BIGINT) AS n_at_risk,
           CAST(d AS BIGINT) AS n_events,
           CAST(SUM(term_ppm) OVER (
             ORDER BY dur_day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS cum_hazard_ppm
    FROM ev
    """,
    tags=("aggregate", "window", "timeseries", "survival"),
)
def events_nelson_aalen_hazard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nelson-Aalen cumulative hazard for time-to-first-purchase — the
    companion estimator to events_survival_km on the same subjects
    (signup cohort, first purchase as the event, right-censoring at
    study end): H(t) = sum_{u <= t} d_u / n_u, one row per event day
    with the at-risk count, event count, and the running hazard in
    ppm. Where KM answers "what fraction survives", NA answers "how
    much cumulative risk has accrued" — the quantity hazard-ratio
    models are built on, and the better-behaved estimator under small
    at-risk sets.

    Exactness: each day's increment rounds ONCE to integer ppm
    (identical double divide + round in both engines); the cumulative
    sum is then pure integer addition — no float accumulation order
    to disagree on (the KM product needs the ordered-fold trick; the
    NA sum doesn't).

    Scale: identical to KM — subjects aggregate per user (one
    shuffle), the curve lives on the O(distinct days) table, so the
    global-order window costs days, not events."""
    e = load_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
    )
    t0 = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("signup_ts"))
    )
    study = e.agg(F.max("ts").alias("end_ts"))
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(t0, "user_id")
        .filter(F.col("ts") >= F.col("signup_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("purchase_ts"))
    )
    subj = (
        t0.join(p, "user_id", "left")
        .crossJoin(F.broadcast(study))
        .select(
            F.col("purchase_ts").isNotNull().alias("observed"),
            F.when(
                F.col("purchase_ts").isNotNull(),
                F.expr(
                    "(unix_micros(purchase_ts) - unix_micros(signup_ts))"
                    " div 86400000000"
                ),
            )
            .otherwise(
                F.expr(
                    "(unix_micros(end_ts) - unix_micros(signup_ts))"
                    " div 86400000000"
                )
            )
            .alias("dur_day"),
        )
    )
    n_tot = subj.agg(F.count("*").alias("n"))
    by_day = subj.groupBy("dur_day").agg(
        F.sum(F.col("observed").cast("bigint")).alias("d"),
        F.count("*").alias("leaving"),
    )
    w_prev = Window.orderBy("dur_day").rowsBetween(Window.unboundedPreceding, -1)
    risk = by_day.crossJoin(F.broadcast(n_tot)).select(
        "dur_day",
        "d",
        (
            F.col("n") - F.coalesce(F.sum("leaving").over(w_prev), F.lit(0))
        ).alias("n_at_risk"),
    )
    ev = risk.filter(F.col("d") > 0).withColumn(
        "term_ppm",
        F.round(
            F.lit(1_000_000.0)
            * F.col("d").cast("double")
            / F.col("n_at_risk").cast("double"),
            0,
        ).cast("bigint"),
    )
    w_cur = Window.orderBy("dur_day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return ev.select(
        F.col("dur_day").cast("bigint").alias("day"),
        F.col("n_at_risk").cast("bigint").alias("n_at_risk"),
        F.col("d").cast("bigint").alias("n_events"),
        F.sum("term_ppm").over(w_cur).cast("bigint").alias("cum_hazard_ppm"),
    )


@register(
    "events_attribution_credit",
    oracle="""
    -- spec: the naive windowed pair join (every purchase x every
    -- click/view touch of the same user in the preceding 7 days).
    -- The Spark side computes the identical aggregates WITHOUT
    -- materializing pairs (marker-row running counters) — the pair
    -- relation is quadratic in per-user event density, the rewrite is
    -- linear.
    WITH p AS (
      SELECT event_id AS p_id, user_id, ts AS p_ts FROM events
      WHERE event_type = 'purchase' AND ts IS NOT NULL
        AND user_id IS NOT NULL AND event_id IS NOT NULL),
    t AS (
      SELECT event_id AS t_id, user_id, ts AS t_ts, event_type AS t_type
      FROM events
      WHERE event_type IN ('click', 'view') AND ts IS NOT NULL
        AND user_id IS NOT NULL AND event_id IS NOT NULL),
    pair AS (
      SELECT p.p_id, t.t_id, t.t_type,
             COUNT(*) OVER (PARTITION BY p.p_id) AS n_touch,
             row_number() OVER (PARTITION BY p.p_id
                                ORDER BY t.t_ts DESC, t.t_id DESC) AS rn_last,
             row_number() OVER (PARTITION BY p.p_id
                                ORDER BY t.t_ts ASC, t.t_id ASC) AS rn_first
      FROM p JOIN t ON t.user_id = p.user_id
        AND epoch_us(t.t_ts) < epoch_us(p.p_ts)
        AND epoch_us(t.t_ts) >= epoch_us(p.p_ts) - 604800000000),
    touched AS (
      SELECT t_type AS touch_type,
             CAST(COUNT(*) AS BIGINT) AS n_touches,
             CAST(COUNT(DISTINCT p_id) AS BIGINT) AS conversions,
             CAST(SUM(1000000 // n_touch) AS BIGINT) AS credit_ppm_total,
             CAST(SUM(CASE WHEN rn_last = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_last_touch,
             CAST(SUM(CASE WHEN rn_first = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_first_touch
      FROM pair GROUP BY t_type),
    direct AS (
      SELECT '(direct)' AS touch_type, CAST(0 AS BIGINT) AS n_touches,
             CAST(COUNT(*) AS BIGINT) AS conversions,
             CAST(0 AS BIGINT) AS credit_ppm_total,
             CAST(0 AS BIGINT) AS n_last_touch,
             CAST(0 AS BIGINT) AS n_first_touch
      FROM p LEFT JOIN (SELECT DISTINCT p_id FROM pair) x USING (p_id)
      WHERE x.p_id IS NULL)
    SELECT * FROM touched
    UNION ALL
    SELECT * FROM direct WHERE conversions > 0
    """,
    tags=("window", "timeseries", "attribution", "join"),
)
def events_attribution_credit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution: every purchase splits 1000000
    ppm of conversion credit equally (integer floor share) across the
    user's click/view touches in the preceding 7 days; per touch
    channel the report carries total touches, conversions touched,
    total linear credit, and last-/first-touch win counts, plus a
    '(direct)' row for purchases with no preceding touch.

    The semantics are the windowed purchase x touch pair join (the
    oracle states it literally), but the pair relation is quadratic in
    per-user event density — on a replicated-user stress corpus it
    blows up as REPL^2. This implementation never materializes pairs:
    the touch stream and two marker rows per purchase (window start,
    window end) merge-sort per user, running per-channel counters and
    an IGNORE-NULLS last/next touch carry down the timeline, and each
    purchase reads its window aggregate as counter differences at its
    two markers — one user_id shuffle, O(events) rows end to end.

    Exactness: all outputs are exact integer counts/floor shares;
    marker rows sort before same-timestamp touches in both the
    counter and the carry, reproducing the [p_ts-7d, p_ts) boundary
    exactly; last/first tie-breaks are (ts, event_id) on both sides.

    Scale: one shuffle on user_id for the merged timeline windows, one
    on p_id to pair each purchase's two markers, then a two-row-
    per-purchase explode into the channel aggregate — no step is
    super-linear in events; per-user state is two counters, not a
    buffer."""
    e = load_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull()
        & F.col("user_id").isNotNull()
        & F.col("event_id").isNotNull()
    )
    touches = e.filter(F.col("event_type").isin("click", "view")).select(
        "user_id",
        "ts",
        F.lit(2).alias("k"),
        F.col("event_id").alias("tb_id"),
        F.when(F.col("event_type") == "click", 1).otherwise(0).alias("is_click"),
        F.when(F.col("event_type") == "view", 1).otherwise(0).alias("is_view"),
        F.struct(
            F.col("ts").alias("t_ts"),
            F.col("event_id").alias("t_id"),
            F.col("event_type").alias("t_type"),
        ).alias("tstruct"),
        F.lit(None).cast("bigint").alias("p_id"),
        F.lit(None).cast("timestamp").alias("p_ts"),
    )
    p = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("p_id"),
        F.col("ts").alias("p_ts"),
    )
    null_struct = F.lit(None).cast(
        "struct<t_ts:timestamp,t_id:bigint,t_type:string>"
    )
    lo = p.select(
        "user_id",
        F.timestamp_micros(F.unix_micros("p_ts") - 604_800_000_000).alias("ts"),
        F.lit(0).alias("k"),
        F.col("p_id").alias("tb_id"),
        F.lit(0).alias("is_click"),
        F.lit(0).alias("is_view"),
        null_struct.alias("tstruct"),
        "p_id",
        "p_ts",
    )
    hi = p.select(
        "user_id",
        F.col("p_ts").alias("ts"),
        F.lit(1).alias("k"),
        F.col("p_id").alias("tb_id"),
        F.lit(0).alias("is_click"),
        F.lit(0).alias("is_view"),
        null_struct.alias("tstruct"),
        "p_id",
        "p_ts",
    )
    merged = touches.unionByName(lo).unionByName(hi)
    w = Window.partitionBy("user_id").orderBy("ts", "k", "tb_id")
    w_cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # "next touch at-or-after this row" as a REVERSED cumulative frame:
    # Spark evaluates cumulative (UnboundedPreceding..CurrentRow) frames
    # incrementally in O(n) per partition, but a
    # CurrentRow..UnboundedFollowing frame re-aggregates the remaining
    # rows for EVERY row — O(n^2) per partition, measured 129 s at the
    # x100 stress vs 2.7 s at x10 before this rewrite. last(...) over
    # the exact reverse ordering is the same value, computed
    # incrementally.
    w_rev = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("k").desc(), F.col("tb_id").desc()
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    scanned = merged.select(
        "p_id",
        "p_ts",
        "k",
        F.sum("is_click").over(w_cum).alias("cum_click"),
        F.sum("is_view").over(w_cum).alias("cum_view"),
        F.last("tstruct", ignorenulls=True).over(w_cum).alias("last_t"),
        F.last("tstruct", ignorenulls=True).over(w_rev).alias("next_t"),
    ).filter(F.col("p_id").isNotNull())
    per_p = scanned.groupBy("p_id").agg(
        F.max("p_ts").alias("p_ts"),
        F.max(F.when(F.col("k") == 0, F.col("cum_click"))).alias("click_lo"),
        F.max(F.when(F.col("k") == 1, F.col("cum_click"))).alias("click_hi"),
        F.max(F.when(F.col("k") == 0, F.col("cum_view"))).alias("view_lo"),
        F.max(F.when(F.col("k") == 1, F.col("cum_view"))).alias("view_hi"),
        F.max(F.when(F.col("k") == 1, F.col("last_t"))).alias("last_t"),
        F.max(F.when(F.col("k") == 0, F.col("next_t"))).alias("first_t"),
    )
    lo_us = F.unix_micros("p_ts") - 604_800_000_000
    per_p = per_p.select(
        "p_id",
        (F.col("click_hi") - F.col("click_lo")).alias("click_n"),
        (F.col("view_hi") - F.col("view_lo")).alias("view_n"),
        (
            F.col("click_hi")
            - F.col("click_lo")
            + F.col("view_hi")
            - F.col("view_lo")
        ).alias("n_touch"),
        F.when(
            F.col("last_t").isNotNull()
            & (F.unix_micros(F.col("last_t.t_ts")) >= lo_us),
            F.col("last_t.t_type"),
        ).alias("last_type"),
        F.when(
            F.col("first_t").isNotNull()
            & (
                F.unix_micros(F.col("first_t.t_ts")) < F.unix_micros("p_ts")
            ),
            F.col("first_t.t_type"),
        ).alias("first_type"),
    )
    channel = (
        per_p.filter(F.col("n_touch") > 0)
        .select(
            "p_id",
            "n_touch",
            "last_type",
            "first_type",
            F.explode(
                F.array(
                    F.struct(
                        F.lit("click").alias("touch_type"),
                        F.col("click_n").alias("cnt"),
                    ),
                    F.struct(
                        F.lit("view").alias("touch_type"),
                        F.col("view_n").alias("cnt"),
                    ),
                )
            ).alias("ch"),
        )
        .select(
            "p_id",
            "n_touch",
            "last_type",
            "first_type",
            F.col("ch.touch_type").alias("touch_type"),
            F.col("ch.cnt").alias("cnt"),
        )
        .filter(F.col("cnt") > 0)
    )
    touched = channel.groupBy("touch_type").agg(
        F.sum("cnt").cast("bigint").alias("n_touches"),
        F.count("*").cast("bigint").alias("conversions"),
        F.sum(F.col("cnt") * F.expr("1000000 div n_touch"))
        .cast("bigint")
        .alias("credit_ppm_total"),
        F.sum(
            F.when(F.col("last_type") == F.col("touch_type"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_last_touch"),
        F.sum(
            F.when(F.col("first_type") == F.col("touch_type"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_first_touch"),
    )
    direct = (
        per_p.filter(F.col("n_touch") == 0)
        .agg(F.count("*").cast("bigint").alias("conversions"))
        .filter(F.col("conversions") > 0)
        .select(
            F.lit("(direct)").alias("touch_type"),
            F.lit(0).cast("bigint").alias("n_touches"),
            "conversions",
            F.lit(0).cast("bigint").alias("credit_ppm_total"),
            F.lit(0).cast("bigint").alias("n_last_touch"),
            F.lit(0).cast("bigint").alias("n_first_touch"),
        )
    )
    return touched.unionByName(direct)


@register(
    "events_forecast_backtest",
    oracle="""
    -- walk-forward backtest: at every step with >= 3 points of
    -- history, forecast the next value with (a) naive last-value and
    -- (b) a 3-point moving average, score absolute errors, and
    -- compare the models — the honest out-of-sample protocol, never
    -- in-sample fit.
    WITH s AS (
      SELECT user_id, value,
             lag(value, 1) OVER w AS l1,
             lag(value, 2) OVER w AS l2,
             lag(value, 3) OVER w AS l3
      FROM events
      WHERE ts IS NOT NULL AND user_id IS NOT NULL AND value IS NOT NULL
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    f AS (
      SELECT round(abs(value - l1), 6) AS e_naive,
             round(abs(value - (l1 + l2 + l3) / 3.0), 6) AS e_ma3
      FROM s WHERE l3 IS NOT NULL)
    SELECT 'naive' AS model, CAST(COUNT(*) AS BIGINT) AS n_forecasts,
           CAST(SUM(CAST(e_naive AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)
             AS mae,
           CAST(SUM(CASE WHEN e_naive < e_ma3 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_wins
    FROM f
    UNION ALL
    SELECT 'ma3', CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CAST(e_ma3 AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*),
           CAST(SUM(CASE WHEN e_ma3 < e_naive THEN 1 ELSE 0 END) AS BIGINT)
    FROM f
    """,
    tags=("timeseries", "forecast", "window"),
)
def events_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Walk-forward forecast backtest over each user's value series:
    one-step-ahead naive (last value) vs 3-point moving average,
    scored by MAE and head-to-head wins over every step with three
    points of history — the out-of-sample model-selection table that
    decides which baseline a forecasting pipeline must beat.

    Exactness: both forecasts are fixed-order expressions over lagged
    doubles (the ma3 sum is written (l1+l2+l3)/3.0, never a frame
    aggregate whose addition order floats); absolute errors round to
    6dp and sum as exact decimals, so MAE is merge-order independent;
    wins are exact comparisons of identical doubles.

    Scale: ONE user_id window serves all three lags; the scoreboard is
    a two-row aggregate with map-side combine. The backtest never
    leaks the future — each forecast uses strictly prior rows."""
    e = load_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull()
        & F.col("user_id").isNotNull()
        & F.col("value").isNotNull()
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = e.select(
        "value",
        F.lag("value", 1).over(w).alias("l1"),
        F.lag("value", 2).over(w).alias("l2"),
        F.lag("value", 3).over(w).alias("l3"),
    )
    f = s.filter(F.col("l3").isNotNull()).select(
        F.round(F.abs(F.col("value") - F.col("l1")), 6).alias("e_naive"),
        F.round(
            F.abs(
                F.col("value")
                - (F.col("l1") + F.col("l2") + F.col("l3")) / F.lit(3.0)
            ),
            6,
        ).alias("e_ma3"),
    )

    # r13: ONE aggregate computes both models' sums/wins, and the two
    # report rows explode from the 1-row result — the r12 two-branch
    # union re-executed the whole 3-lag window pass per model (the
    # exact sum/divide/win expressions are unchanged per branch)
    agg1 = f.agg(
        F.count("*").cast("bigint").alias("nf"),
        F.sum(F.col("e_naive").cast("decimal(18,6)")).alias("s_naive"),
        F.sum(F.col("e_ma3").cast("decimal(18,6)")).alias("s_ma3"),
        F.sum(F.when(F.col("e_naive") < F.col("e_ma3"), 1).otherwise(0))
        .cast("bigint")
        .alias("w_naive"),
        F.sum(F.when(F.col("e_ma3") < F.col("e_naive"), 1).otherwise(0))
        .cast("bigint")
        .alias("w_ma3"),
    )
    rows = F.array(
        F.struct(
            F.lit("naive").alias("model"),
            F.col("nf").alias("n_forecasts"),
            (F.col("s_naive").cast("double") / F.col("nf")).alias("mae"),
            F.col("w_naive").alias("n_wins"),
        ),
        F.struct(
            F.lit("ma3").alias("model"),
            F.col("nf").alias("n_forecasts"),
            (F.col("s_ma3").cast("double") / F.col("nf")).alias("mae"),
            F.col("w_ma3").alias("n_wins"),
        ),
    )
    return agg1.select(F.explode(rows).alias("r")).select(
        "r.model", "r.n_forecasts", "r.mae", "r.n_wins"
    )


@register(
    "events_diff_in_diff",
    oracle="""
    -- difference-in-differences: treated users are those who ever hit
    -- an 'error' event; periods split at the study midpoint; the DiD
    -- estimate is the treated group's post-pre change minus the
    -- control group's — the workhorse quasi-experimental estimator.
    WITH e AS (
      SELECT user_id, ts, event_type, value FROM events
      WHERE ts IS NOT NULL AND user_id IS NOT NULL AND value IS NOT NULL),
    span AS (SELECT MIN(ts) AS t0, MAX(ts) AS t1 FROM e),
    treated AS (SELECT DISTINCT user_id FROM e WHERE event_type = 'error'),
    cells AS (
      SELECT CASE WHEN t.user_id IS NOT NULL THEN 'treated'
                  ELSE 'control' END AS grp,
             CASE WHEN epoch_us(e.ts) * 2 >= epoch_us(s.t0) + epoch_us(s.t1)
                  THEN 'post' ELSE 'pre' END AS period,
             e.value
      FROM e CROSS JOIN span s
      LEFT JOIN treated t ON t.user_id = e.user_id),
    agg AS (
      SELECT grp, period,
             CAST(COUNT(*) AS BIGINT) AS n_obs,
             CAST(SUM(CAST(round(value, 6) AS DECIMAL(18,6))) AS DOUBLE)
               / COUNT(*) AS mean_value
      FROM cells GROUP BY grp, period),
    wide AS (
      SELECT grp,
             MAX(CASE WHEN period = 'pre' THEN mean_value END) AS m_pre,
             MAX(CASE WHEN period = 'post' THEN mean_value END) AS m_post,
             CAST(SUM(n_obs) AS BIGINT) AS n_obs
      FROM agg GROUP BY grp)
    -- round(x*1e6, 0)/1e6 instead of round(x, 6): a 5e-7 tie is not
    -- binary-representable, and DuckDB rounds the BINARY double while
    -- Spark rounds its SHORTEST DECIMAL STRING — on a double whose
    -- shortest representation lands exactly on the tie they disagree
    -- (null-fuzz finding, r13). Scaling first makes the tie a .5,
    -- which IS representable, so both engines see the same side.
    SELECT grp, n_obs,
           round(m_pre * 1000000.0, 0) / 1000000.0 AS mean_pre,
           round(m_post * 1000000.0, 0) / 1000000.0 AS mean_post,
           round((m_post - m_pre) * 1000000.0, 0) / 1000000.0 AS delta,
           round((SELECT (tw.m_post - tw.m_pre) - (cw.m_post - cw.m_pre)
                  FROM wide tw, wide cw
                  WHERE tw.grp = 'treated' AND cw.grp = 'control')
                 * 1000000.0, 0) / 1000000.0
             AS did_estimate
    FROM wide
    WHERE m_pre IS NOT NULL AND m_post IS NOT NULL
    """,
    tags=("timeseries", "stats", "causal"),
)
def events_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences estimate of the 'error' experience's
    effect on event values: users who ever hit an error are the
    treated group, the study window splits at its midpoint, and the
    DiD estimate is the treated post-minus-pre change net of the
    control group's — the standard quasi-experimental readout when
    randomization isn't available. One row per group with cell means
    and the shared DiD estimate (NULL-safe: groups missing a period
    drop out of the report in both engines).

    Exactness: cell means are exact decimal sums of 6dp-rounded values
    over exact counts; the midpoint split compares integer
    microseconds (epoch*2 vs t0+t1, no division); the estimate is a
    final scalar op on identical doubles, rounded in both engines.

    Scale: one scan feeds the treated-user set (semi-join shape on
    user_id) and the 4-cell aggregate (map-side combine); the study
    span is a 1-row broadcast. Nothing holds per-user state."""
    e = load_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull()
        & F.col("user_id").isNotNull()
        & F.col("value").isNotNull()
    )
    span = e.agg(F.min("ts").alias("t0"), F.max("ts").alias("t1"))
    treated = (
        e.filter(F.col("event_type") == "error").select("user_id").distinct()
    )
    cells = (
        e.crossJoin(F.broadcast(span))
        .join(
            treated.withColumn("is_treated", F.lit(True)), "user_id", "left"
        )
        .select(
            F.when(F.col("is_treated"), "treated")
            .otherwise("control")
            .alias("grp"),
            F.when(
                F.unix_micros("ts") * 2
                >= F.unix_micros("t0") + F.unix_micros("t1"),
                "post",
            )
            .otherwise("pre")
            .alias("period"),
            "value",
        )
    )
    agg = cells.groupBy("grp", "period").agg(
        F.count("*").cast("bigint").alias("n_obs"),
        (
            F.sum(F.round("value", 6).cast("decimal(18,6)")).cast("double")
            / F.count("*")
        ).alias("mean_value"),
    )
    wide = agg.groupBy("grp").agg(
        F.max(F.when(F.col("period") == "pre", F.col("mean_value"))).alias(
            "m_pre"
        ),
        F.max(F.when(F.col("period") == "post", F.col("mean_value"))).alias(
            "m_post"
        ),
        F.sum("n_obs").cast("bigint").alias("n_obs"),
    # bounded (<= 2 rows) with two consumers (the estimate scalar and
    # the report): without the barrier each re-ran the full event scan
    # + treated join (r13, guide §5)
    ).localCheckpoint(eager=True)
    # single-row aggregate (never 0 rows): a missing group or period
    # yields a NULL estimate, mirroring the oracle's scalar subquery
    # round(x*1e6, 0)/1e6, not round(x, 6): a 5e-7 tie is not
    # binary-representable — Spark rounds the double's SHORTEST DECIMAL
    # STRING (BigDecimal.valueOf) while DuckDB rounds the BINARY value,
    # so a shortest-representation tie diverges (null-fuzz finding,
    # r13); after the 1e6 scale the tie is a representable .5 and both
    # engines agree. Same expression in the oracle.
    def round6(c: Column) -> Column:
        return F.round(c * 1000000.0, 0) / 1000000.0

    did = wide.agg(
        round6(
            F.max(
                F.when(
                    F.col("grp") == "treated", F.col("m_post") - F.col("m_pre")
                )
            )
            - F.max(
                F.when(
                    F.col("grp") == "control", F.col("m_post") - F.col("m_pre")
                )
            )
        ).alias("did_estimate")
    )
    return (
        wide.filter(F.col("m_pre").isNotNull() & F.col("m_post").isNotNull())
        .crossJoin(F.broadcast(did))
        .select(
            "grp",
            "n_obs",
            round6(F.col("m_pre")).alias("mean_pre"),
            round6(F.col("m_post")).alias("mean_post"),
            round6(F.col("m_post") - F.col("m_pre")).alias("delta"),
            "did_estimate",
        )
    )


@register(
    "window_ignore_nulls_bfill",
    oracle="""
    WITH s AS (
      SELECT event_id, user_id, ts,
             CASE WHEN event_id % 3 = 0 THEN value END AS sparse
      FROM events WHERE ts IS NOT NULL)
    SELECT event_id, user_id, sparse,
           first_value(sparse IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS filled
    FROM s
    """,
    tags=("window", "timeseries"),
)
def window_ignore_nulls_bfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward fill (NOCB — next observation carried backward), the
    mirror of window_ignore_nulls_ffill: each gap takes the NEXT
    non-null reading per user. The oracle states it naturally as
    first_value IGNORE NULLS over a following frame; the Spark side
    deliberately does NOT — Spark re-aggregates a
    CurrentRow..UnboundedFollowing frame for every row (O(n^2) per
    partition, the x100 lesson from events_attribution_credit), so
    the fill computes as last_value IGNORE NULLS over the EXACT
    REVERSE ordering's cumulative frame, which Spark evaluates
    incrementally in O(n). Same values, linear plan — this op pins
    the pattern as a first-class operator.

    Scale: one user_id window shuffle; (ts, event_id) is a unique
    ordering so the fill is deterministic; values are untouched
    doubles from the scan."""
    e = load_table(spark, sf_dir, "events")
    s = e.filter(F.col("ts").isNotNull()).select(
        "event_id",
        "user_id",
        "ts",
        F.when(F.col("event_id") % 3 == 0, F.col("value")).alias("sparse"),
    )
    w_rev = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return s.select(
        "event_id",
        "user_id",
        "sparse",
        F.last("sparse", ignorenulls=True).over(w_rev).alias("filled"),
    )


@register(
    "events_cuped_adjustment",
    oracle="""
    -- CUPED (Deng et al. 2013): adjust each user's post-period metric
    -- with their pre-period covariate, theta = cov(X,Y)/var(X), and
    -- report the per-group means before/after plus the pooled
    -- variance reduction — the standard experimentation trick that
    -- shrinks A/B confidence intervals for free.
    WITH e AS (
      SELECT user_id, ts, event_type, round(value, 6) AS v FROM events
      WHERE ts IS NOT NULL AND user_id IS NOT NULL AND value IS NOT NULL),
    span AS (SELECT MIN(ts) AS t0, MAX(ts) AS t1 FROM e),
    per_user AS (
      SELECT e.user_id,
             CAST(SUM(CASE WHEN epoch_us(e.ts) * 2 < epoch_us(s.t0)
                                + epoch_us(s.t1)
                           THEN CAST(e.v AS DECIMAL(18,6)) END) AS DOUBLE)
               / COUNT(CASE WHEN epoch_us(e.ts) * 2 < epoch_us(s.t0)
                                 + epoch_us(s.t1) THEN 1 END) AS x,
             CAST(SUM(CASE WHEN epoch_us(e.ts) * 2 >= epoch_us(s.t0)
                                + epoch_us(s.t1)
                           THEN CAST(e.v AS DECIMAL(18,6)) END) AS DOUBLE)
               / COUNT(CASE WHEN epoch_us(e.ts) * 2 >= epoch_us(s.t0)
                                 + epoch_us(s.t1) THEN 1 END) AS y
      FROM e CROSS JOIN span s GROUP BY e.user_id),
    u AS (SELECT user_id, round(x, 6) AS x, round(y, 6) AS y
          FROM per_user WHERE x IS NOT NULL AND y IS NOT NULL),
    treated AS (SELECT DISTINCT user_id FROM e WHERE event_type = 'error'),
    stats AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(x AS DECIMAL(18,6))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(y AS DECIMAL(18,6))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(x AS DECIMAL(18,6)) * CAST(x AS DECIMAL(18,6)))
                  AS DOUBLE) AS sxx,
             CAST(SUM(CAST(x AS DECIMAL(18,6)) * CAST(y AS DECIMAL(18,6)))
                  AS DOUBLE) AS sxy,
             CAST(SUM(CAST(y AS DECIMAL(18,6)) * CAST(y AS DECIMAL(18,6)))
                  AS DOUBLE) AS syy
      FROM u),
    th AS (
      SELECT n, sx, sy,
             CASE WHEN n * sxx - sx * sx = 0 THEN 0.0
                  ELSE (n * sxy - sx * sy) / (n * sxx - sx * sx) END
               AS theta,
             (n * syy - sy * sy) / (CAST(n AS DOUBLE) * n) AS var_y
      FROM stats),
    adj AS (
      SELECT u.user_id, u.y,
             u.y - t.theta * (u.x - t.sx / t.n) AS y_adj, t.theta, t.var_y
      FROM u CROSS JOIN th t),
    vadj AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(round(y_adj, 6) AS DECIMAL(18,6))) AS DOUBLE)
               AS sya,
             CAST(SUM(CAST(round(y_adj, 6) AS DECIMAL(18,6))
                      * CAST(round(y_adj, 6) AS DECIMAL(18,6))) AS DOUBLE)
               AS syya
      FROM adj),
    vr AS (
      SELECT CASE WHEN t.var_y = 0 THEN 0
                  ELSE CAST(floor(1000000 * (1.0
                    - ((v.n * v.syya - v.sya * v.sya)
                       / (CAST(v.n AS DOUBLE) * v.n)) / t.var_y)) AS BIGINT)
             END AS var_reduction_ppm,
             round(t.theta, 6) + 0.0 AS theta
      FROM vadj v CROSS JOIN th t)
    SELECT CASE WHEN tr.user_id IS NOT NULL THEN 'treated'
                ELSE 'control' END AS grp,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           round(CAST(SUM(CAST(a.y AS DECIMAL(18,6))) AS DOUBLE)
                 / COUNT(*), 6) + 0.0 AS mean_y,
           round(CAST(SUM(CAST(round(a.y_adj, 6) AS DECIMAL(18,6)))
                      AS DOUBLE) / COUNT(*), 6) + 0.0 AS mean_y_adj,
           MAX(vr.theta) AS theta,
           MAX(vr.var_reduction_ppm) AS var_reduction_ppm
    FROM adj a
    LEFT JOIN treated tr ON tr.user_id = a.user_id
    CROSS JOIN vr
    GROUP BY 1
    """,
    tags=("timeseries", "stats", "experimentation"),
)
def events_cuped_adjustment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance reduction (Deng et al. 2013): each user's
    post-period mean value adjusts by theta times their pre-period
    deviation, theta = cov(X,Y)/var(X) pooled over users with both
    periods — the free CI-shrink every mature experimentation platform
    applies. Per exposure group (users who ever hit an 'error' event
    vs not): user counts, raw and adjusted post-period means, the
    shared theta, and the pooled variance reduction in ppm.

    Exactness: per-user and pooled moments ride 6dp-rounded decimal
    sums (order-independent, every unscaled sum below 2^53); theta,
    the adjustment, and the variance ratio are final scalar double
    expressions on identical inputs, rounded in both engines; the
    period split compares integer microseconds.

    Scale (r13): ONE events scan feeds everything. The per-user
    aggregate (map-side combine on user_id) carries the treated flag
    as max(event_type = 'error') — the r12 form re-scanned events for
    a separate treated-users distinct and, worse, re-executed the
    whole scan + per-user aggregate subtree once per consumer (theta
    moments, the adjusted-variance pass, and the final rollup: ~4
    scans in the executed plan). The user-level table is
    |users|-sized — NOT the corpus-signature class — so a
    localCheckpoint is the right barrier (guide §5); the 1-row moment
    tables broadcast, the adjustment is a map over users, and the
    group rollup is 2 rows. Nothing super-linear."""
    e = load_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull()
        & F.col("user_id").isNotNull()
        & F.col("value").isNotNull()
    ).select(
        "user_id", "ts", "event_type", F.round("value", 6).alias("v")
    )
    span = e.agg(F.min("ts").alias("t0"), F.max("ts").alias("t1"))
    is_post = (
        F.unix_micros("ts") * 2 >= F.unix_micros("t0") + F.unix_micros("t1")
    )
    dec = lambda c: F.col(c).cast("decimal(18,6)")  # noqa: E731
    per_user = (
        e.crossJoin(F.broadcast(span))
        .groupBy("user_id")
        .agg(
            (
                F.sum(F.when(~is_post, dec("v"))).cast("double")
                / F.count(F.when(~is_post, F.lit(1)))
            ).alias("x"),
            (
                F.sum(F.when(is_post, dec("v"))).cast("double")
                / F.count(F.when(is_post, F.lit(1)))
            ).alias("y"),
            # same verdict as the r12 treated-set semi-join: a user is
            # treated iff ANY of their (ts/user_id/value non-null)
            # events is an 'error' — computed in the same pass
            F.coalesce(
                F.max(F.col("event_type") == "error"), F.lit(False)
            ).alias("is_treated"),
        )
    )
    u = (
        per_user.filter(F.col("x").isNotNull() & F.col("y").isNotNull())
        .select(
            "user_id",
            F.round("x", 6).alias("x"),
            F.round("y", 6).alias("y"),
            "is_treated",
        )
        .localCheckpoint(eager=True)
    )
    stats = u.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(dec("x")).cast("double").alias("sx"),
        F.sum(dec("y")).cast("double").alias("sy"),
        F.sum(dec("x") * dec("x")).cast("double").alias("sxx"),
        F.sum(dec("x") * dec("y")).cast("double").alias("sxy"),
        F.sum(dec("y") * dec("y")).cast("double").alias("syy"),
    )
    th = stats.select(
        "n",
        "sx",
        "sy",
        F.when(
            F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx") == 0,
            F.lit(0.0),
        )
        .otherwise(
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
            / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        )
        .alias("theta"),
        (
            (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
            / (F.col("n").cast("double") * F.col("n"))
        ).alias("var_y"),
    )
    adj = u.crossJoin(F.broadcast(th)).select(
        "user_id",
        "y",
        (
            F.col("y")
            - F.col("theta") * (F.col("x") - F.col("sx") / F.col("n"))
        ).alias("y_adj"),
        "is_treated",
    )
    ya = F.round("y_adj", 6).cast("decimal(18,6)")
    vadj = adj.agg(
        F.count("*").cast("bigint").alias("vn"),
        F.sum(ya).cast("double").alias("sya"),
        F.sum(ya * ya).cast("double").alias("syya"),
    )
    vr = (
        vadj.crossJoin(F.broadcast(th))
        .select(
            F.when(F.col("var_y") == 0, F.lit(0).cast("bigint"))
            .otherwise(
                F.floor(
                    1_000_000
                    * (
                        F.lit(1.0)
                        - (
                            (
                                F.col("vn") * F.col("syya")
                                - F.col("sya") * F.col("sya")
                            )
                            / (F.col("vn").cast("double") * F.col("vn"))
                        )
                        / F.col("var_y")
                    )
                ).cast("bigint")
            )
            .alias("var_reduction_ppm"),
            # + 0.0 canonicalizes IEEE negative zero (fuzzer-found:
            # round(-epsilon, 6) = -0.0 hash-diverges from 0.0)
            (F.round("theta", 6) + F.lit(0.0)).alias("theta"),
        )
    )
    return (
        adj.crossJoin(F.broadcast(vr))
        .groupBy(
            F.when(F.col("is_treated"), "treated")
            .otherwise("control")
            .alias("grp")
        )
        .agg(
            F.count("*").cast("bigint").alias("n_users"),
            (
                F.round(F.sum(dec("y")).cast("double") / F.count("*"), 6)
                + F.lit(0.0)
            ).alias("mean_y"),
            (
                F.round(
                    F.sum(
                        F.round("y_adj", 6).cast("decimal(18,6)")
                    ).cast("double")
                    / F.count("*"),
                    6,
                )
                + F.lit(0.0)
            ).alias("mean_y_adj"),
            F.max("theta").alias("theta"),
            F.max("var_reduction_ppm").alias("var_reduction_ppm"),
        )
    )


import math as _math

# SPRT constants, computed ONCE in Python and inlined as integer
# micro-nat literals into BOTH engines (no runtime ln -> no cross-
# engine libm question): H0 p=0.15 vs H1 p=0.25 click share,
# alpha = beta = 0.1 -> boundaries +-ln(9). (The fixture's true click
# share is ~0.20 — dead between the hypotheses — so decisions come
# from each user's sampling noise; ~half the sf0.01 users decide
# within their stream, the rest stay undecided, which is exactly the
# behavior the test's error guarantees describe.)
SPRT_P0, SPRT_P1 = 0.15, 0.25
SPRT_INC_HIT = round(_math.log(SPRT_P1 / SPRT_P0) * 1_000_000)
SPRT_INC_MISS = round(_math.log((1 - SPRT_P1) / (1 - SPRT_P0)) * 1_000_000)
SPRT_BOUND = round(_math.log(9.0) * 1_000_000)


@register(
    "events_sprt_decision",
    oracle=f"""
    -- Wald's SPRT per user: is this user's click share {SPRT_P1} (H1)
    -- or {SPRT_P0} (H0)? The log-likelihood ratio walks in exact integer
    -- micro-nats ({SPRT_INC_HIT} per click, {SPRT_INC_MISS} per
    -- non-click, both Python-inlined so neither engine computes a
    -- logarithm) and the FIRST crossing of +-{SPRT_BOUND} decides —
    -- the sequential test that stops reading a user's stream as soon
    -- as the evidence suffices.
    WITH e AS (
      SELECT user_id, ts, event_id,
             CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS hit
      FROM events
      WHERE ts IS NOT NULL AND user_id IS NOT NULL
        AND event_id IS NOT NULL),
    walk AS (
      SELECT user_id, ts, event_id,
             SUM(CASE WHEN hit = 1 THEN {SPRT_INC_HIT}
                      ELSE {SPRT_INC_MISS} END) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS llr,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS n_obs
      FROM e),
    crossed AS (
      SELECT user_id, llr, n_obs,
             row_number() OVER (PARTITION BY user_id ORDER BY n_obs)
               AS cross_rank
      FROM walk
      WHERE llr >= {SPRT_BOUND} OR llr <= -{SPRT_BOUND})
    SELECT user_id,
           CASE WHEN llr >= {SPRT_BOUND} THEN 'accept_h1'
                ELSE 'accept_h0' END AS decision,
           CAST(n_obs AS BIGINT) AS n_obs,
           CAST(llr AS BIGINT) AS llr_micro_nats
    FROM crossed WHERE cross_rank = 1
    """,
    tags=("timeseries", "stats", "sequential"),
)
def events_sprt_decision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald's sequential probability ratio test per user: walk the
    click/non-click log-likelihood ratio down each user's event
    stream in exact integer micro-nats and stop at the FIRST crossing
    of the +-ln(9) boundary (alpha = beta = 0.1) — the sequential
    decision that lets a pipeline stop scoring an entity as soon as
    the evidence suffices, instead of fixed-n testing everyone.
    Users whose stream never crosses produce no row (undecided).

    Exactness: both LLR increments and the boundary are Python-
    computed integer literals inlined into BOTH engines — the query
    itself does pure integer cumsum and comparison; (ts, event_id)
    is a unique order.

    Scale: one user_id window pass for the walk + one for the first
    crossing — both cumulative frames, O(events) total; the decision
    table is at most one row per user."""
    e = load_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull()
        & F.col("user_id").isNotNull()
        & F.col("event_id").isNotNull()
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    inc = F.when(
        F.col("event_type") == "click", F.lit(SPRT_INC_HIT)
    ).otherwise(F.lit(SPRT_INC_MISS))
    walk = e.select(
        "user_id",
        F.sum(inc).over(w_cum).alias("llr"),
        F.row_number().over(w).alias("n_obs"),
    )
    crossed = walk.filter(
        (F.col("llr") >= SPRT_BOUND) | (F.col("llr") <= -SPRT_BOUND)
    )
    w_first = Window.partitionBy("user_id").orderBy("n_obs")
    return (
        crossed.withColumn("cross_rank", F.row_number().over(w_first))
        .filter(F.col("cross_rank") == 1)
        .select(
            "user_id",
            F.when(F.col("llr") >= SPRT_BOUND, "accept_h1")
            .otherwise("accept_h0")
            .alias("decision"),
            F.col("n_obs").cast("bigint").alias("n_obs"),
            F.col("llr").cast("bigint").alias("llr_micro_nats"),
        )
    )


@register(
    "events_interval_union_coverage",
    oracle="""
    -- interval-union ("covered time") per user: each event opens an
    -- interval [ts, ts + value seconds); overlapping/touching
    -- intervals merge (gaps-and-islands over a cumulative max of the
    -- running end), and the user's coverage is the summed length of
    -- the merged islands against their first-start->last-end span.
    -- The utilization statistic behind session stitching, ad
    -- exposure, and GPU-occupancy accounting.
    WITH iv AS (
      SELECT user_id, epoch_us(ts) AS s,
             epoch_us(ts) + CAST(round(value * 1000000, 0) AS BIGINT) AS e
      FROM events
      WHERE ts IS NOT NULL AND user_id IS NOT NULL
        AND value IS NOT NULL AND value > 0),
    m AS (
      SELECT user_id, s, e,
             MAX(e) OVER (PARTITION BY user_id ORDER BY s, e
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND 1 PRECEDING) AS prev_max_e
      FROM iv),
    g AS (
      SELECT user_id, s, e,
             SUM(CASE WHEN prev_max_e IS NULL OR s > prev_max_e
                      THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY s, e
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS island
      FROM m),
    isl AS (
      SELECT user_id, island, MIN(s) AS i_start, MAX(e) AS i_end
      FROM g GROUP BY user_id, island)
    SELECT user_id,
           CAST((SELECT COUNT(*) FROM g g2 WHERE g2.user_id = isl.user_id)
                AS BIGINT) AS n_intervals,
           CAST(COUNT(*) AS BIGINT) AS n_islands,
           CAST(SUM(i_end - i_start) AS BIGINT) AS covered_us,
           CAST(MAX(i_end) - MIN(i_start) AS BIGINT) AS span_us,
           CAST(round(1000000.0 * SUM(i_end - i_start)
                      / (MAX(i_end) - MIN(i_start)), 0) AS BIGINT)
             AS coverage_ppm
    FROM isl GROUP BY user_id
    """,
    tags=("events", "window", "interval"),
)
def events_interval_union_coverage(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Merged-interval coverage per user (interval union length): each
    event opens [ts, ts + value seconds); overlapping or touching
    intervals merge into islands via the gaps-and-islands cumulative
    running-max, and the report gives islands, covered time, span, and
    the covered share. Degenerate inputs (NULL ts/user/value,
    non-positive durations) are excluded identically in both engines.

    Exactness: all arithmetic is integer microseconds (one round of
    value*1e6 per event); island detection is order-independent for
    tied starts (an interval starting at the same instant always
    merges — its start can't exceed the running end).

    Scale: two windows and one aggregate, all keyed on user_id — one
    shuffle of the event set, O(n log n) per user for the sort, no
    joins, no Python. The subquery-free Spark side reuses the island
    table for the per-user interval count."""
    e = load_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull()
        & F.col("user_id").isNotNull()
        & F.col("value").isNotNull()
        & (F.col("value") > 0)
    )
    iv = e.select(
        "user_id",
        F.unix_micros("ts").alias("s"),
        (
            F.unix_micros("ts")
            + F.round(F.col("value") * 1_000_000, 0).cast("bigint")
        ).alias("e"),
    )
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_cum = (
        Window.partitionBy("user_id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    g = iv.withColumn("prev_max_e", F.max("e").over(w_prev)).withColumn(
        "island",
        F.sum(
            F.when(
                F.col("prev_max_e").isNull()
                | (F.col("s") > F.col("prev_max_e")),
                1,
            ).otherwise(0)
        ).over(w_cum),
    )
    isl = g.groupBy("user_id", "island").agg(
        F.min("s").alias("i_start"),
        F.max("e").alias("i_end"),
        F.count("*").alias("n_iv"),
    )
    covered = F.sum(F.col("i_end") - F.col("i_start")).cast("bigint")
    span = (F.max("i_end") - F.min("i_start")).cast("bigint")
    return isl.groupBy("user_id").agg(
        F.sum("n_iv").cast("bigint").alias("n_intervals"),
        F.count("*").cast("bigint").alias("n_islands"),
        covered.alias("covered_us"),
        span.alias("span_us"),
        F.round(F.lit(1_000_000.0) * covered / span, 0)
        .cast("bigint")
        .alias("coverage_ppm"),
    )
