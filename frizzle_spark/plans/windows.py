"""Event-time windowing over the ``events`` table (SURVEY.md §2.3 Q10).

The reference carries a per-message timestamp but has NO event-time logic
of any kind (reference msg.go:19 — ``Timestamp()`` is never consumed by
the engine).  These are the committed windowing semantics, expressed with
Spark's native ``window`` / ``session_window`` operators so the SAME
expressions run in batch here and in Structured Streaming
(frizzle_spark.streaming) with a watermark bolted on.

Oracles: tumbling ≙ date_trunc; sliding ≙ event × k∈[0,4) offset
expansion (exactly what Spark's sliding window does internally); session
≙ classic gaps-and-islands with lag + cumulative flag sum.

Scale: all three shuffle once on (window/group keys).  Sliding fan-out
multiplies rows by window/slide (4×) BEFORE the partial aggregate, but
map-side combine collapses them within each task, so the shuffle still
carries ~|groups| rows.  Session windows shuffle by (user, type) then
sort-merge runs within each key — state is bounded per key, the model
that also bounds streaming state growth under a watermark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from frizzle_spark.plans.registry import query
from frizzle_spark.sources.tables import load_table


@query(
    "q10_tumbling_windows",
    oracle="""
    SELECT date_trunc('hour', ts)                     AS w_start,
           date_trunc('hour', ts) + INTERVAL 1 HOUR   AS w_end,
           event_type,
           count(*)                                    AS n_events,
           count(DISTINCT user_id)                     AS n_users,
           round(sum(value), 2)                        AS sum_value
    FROM events
    GROUP BY 1, 2, 3
    """,
)
def q10_tumbling_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time windows per event_type."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("w_start"),
            F.col("w.end").alias("w_end"),
            "event_type",
            "n_events",
            "n_users",
            "sum_value",
        )
    )


@query(
    "q10_sliding_windows",
    oracle="""
    SELECT w_start,
           w_start + INTERVAL 1 HOUR AS w_end,
           event_type,
           count(*)             AS n_events,
           round(sum(value), 2) AS sum_value
    FROM (
        SELECT time_bucket(INTERVAL '15 minutes', ts)
                 - to_minutes(15 * k) AS w_start,
               event_type, value
        FROM events, generate_series(0, 3) AS t(k)
    )
    GROUP BY 1, 2, 3
    """,
)
def q10_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 1-hour windows, 15-minute slide, per event_type."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("w_start"),
            F.col("w.end").alias("w_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


@query(
    "q10_session_windows",
    oracle="""
    WITH flagged AS (
        SELECT user_id, event_type, ts, value,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_sess
        FROM events
        WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts)
    ),
    numbered AS (
        SELECT *, sum(new_sess) OVER (PARTITION BY user_id, event_type
                                      ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sess_id
        FROM flagged
    )
    SELECT user_id, event_type,
           min(ts)                          AS session_start,
           max(ts) + INTERVAL 30 MINUTE     AS session_end,
           count(*)                         AS n_events,
           round(sum(value), 2)             AS sum_value
    FROM numbered
    GROUP BY user_id, event_type, sess_id
    """,
)
def q10_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30-min inactivity gap) per user × event_type.

    ``session_window``'s end bound is last-event-time + gap, mirrored in
    the oracle's ``max(ts) + 30 min``.
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.session_window("ts", "30 minutes").alias("w"), "user_id", "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            "user_id",
            "event_type",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


@query(
    "q10_gap_fill",
    oracle="""
    WITH bounds AS (
        SELECT date_trunc('hour', min(ts)) AS lo, date_trunc('hour', max(ts)) AS hi
        FROM events
    ),
    grid AS (
        SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour FROM bounds
    ),
    agg AS (
        SELECT date_trunc('hour', ts) AS hour, count(*) AS n,
               round(sum(value), 6) AS sum_value
        FROM events GROUP BY 1
    )
    SELECT g.hour, coalesce(a.n, 0) AS n_events,
           coalesce(a.sum_value, 0.0) AS sum_value,
           a.n IS NULL AS gap_filled
    FROM grid g LEFT JOIN agg a ON g.hour = a.hour
    """,
)
def q10_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resample with gap fill: hourly grid from ``sequence`` +
    explode, left-joined to the hourly aggregate, missing hours zeroed.

    The grid side is tiny (one row per hour of span) and broadcasts;
    the aggregate side shuffles once on the truncated hour.  This is the
    canonical densification shape — at 100 TB the grid stays driver-free
    (sequence() is generated, not collected).
    """
    ev = load_table(spark, sf_dir, "events")
    agg = ev.groupBy(F.date_trunc("hour", "ts").alias("hour")).agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 6).alias("sv")
    )
    grid = (
        ev.agg(
            F.date_trunc("hour", F.min("ts")).alias("lo"),
            F.date_trunc("hour", F.max("ts")).alias("hi"),
        )
        .select(
            F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("hour")
        )
    )
    return grid.join(F.broadcast(agg), "hour", "left").select(
        "hour",
        F.coalesce(F.col("n"), F.lit(0)).alias("n_events"),
        F.coalesce(F.col("sv"), F.lit(0.0)).alias("sum_value"),
        F.col("n").isNull().alias("gap_filled"),
    )


# --------------------------------------------------------------------------
# Q10c — cohort retention: users grouped by first-activity week, activity
# counted per week offset.  The product-analytics staple that combines a
# per-user min() with a self-join back onto the fact stream.
# Scale: two key shuffles (user_id for the firsts agg, then the cohort
# grid agg); the firsts side is |users| rows — orders of magnitude
# smaller than events — and joins back on the SAME user_id hash
# partitioning Catalyst just produced, so the join adds no extra
# exchange on the firsts side.  Week arithmetic stays on day-diffs of
# week-truncated timestamps (multiples of 7), so Spark and DuckDB agree
# exactly with no week-boundary-counting semantics in play.
# --------------------------------------------------------------------------
@query(
    "q10_cohort_retention",
    oracle="""
    WITH firsts AS (
        SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
        FROM events GROUP BY user_id
    )
    SELECT f.cohort_week,
           CAST(date_diff('day', f.cohort_week, date_trunc('week', e.ts)) // 7
                AS BIGINT) AS week_offset,
           count(DISTINCT e.user_id) AS active_users,
           count(*) AS n_events
    FROM events e JOIN firsts f ON e.user_id = f.user_id
    GROUP BY 1, 2
    """,
)
def q10_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention grid over events."""
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    week = F.date_trunc("week", F.col("ts"))
    return (
        ev.join(firsts, "user_id")
        .groupBy(
            "cohort_week",
            F.floor(F.datediff(week, F.col("cohort_week")) / 7)
            .cast("long")
            .alias("week_offset"),
        )
        .agg(
            F.countDistinct("user_id").alias("active_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


FUNNEL_STEPS = ("signup", "view", "click", "purchase")

_FUNNEL_ORACLE = """
    WITH s1 AS (
        SELECT user_id, min(ts) AS t1 FROM events
        WHERE event_type = 'signup' GROUP BY user_id
    ),
    s2 AS (
        SELECT e.user_id, min(e.ts) AS t2
        FROM events e JOIN s1 USING (user_id)
        WHERE e.event_type = 'view' AND e.ts > s1.t1 GROUP BY e.user_id
    ),
    s3 AS (
        SELECT e.user_id, min(e.ts) AS t3
        FROM events e JOIN s2 USING (user_id)
        WHERE e.event_type = 'click' AND e.ts > s2.t2 GROUP BY e.user_id
    ),
    s4 AS (
        SELECT e.user_id, min(e.ts) AS t4
        FROM events e JOIN s3 USING (user_id)
        WHERE e.event_type = 'purchase' AND e.ts > s3.t3 GROUP BY e.user_id
    )
    SELECT 'signup' AS step, count(*) AS n_users FROM s1
    UNION ALL SELECT 'view', count(*) FROM s2
    UNION ALL SELECT 'click', count(*) FROM s3
    UNION ALL SELECT 'purchase', count(*) FROM s4
"""


@query("qz10_funnel", oracle=_FUNNEL_ORACLE)
def qz10_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential funnel: how many users performed signup → view →
    click → purchase IN ORDER (each stage strictly after the previous
    stage's first qualifying event) — the ordered-pattern query event
    analytics needs and plain aggregation can't express.

    Scale shape: ONE shuffle (by user) and NO joins.  The naive
    formulation is a cascade of K-1 self-joins, each shuffling the
    events table again; here each user's (ts, type) pairs are collected
    and time-sorted in-row, then a single Catalyst ``aggregate`` fold
    walks the sequence computing the stage-entry times — per-user state
    is K timestamps, work is one pass, and everything after the shuffle
    is JVM expression eval (no Python).  Per-user row width is bounded
    by user activity, the same bound session windows already rely on.
    The strict-inequality guards make ties (same-timestamp events)
    non-advancing, matching the oracle's nested ``min … WHERE ts >``
    cascade exactly.  qz-prefixed but fully oracle-backed via the
    pytest differential sweep.
    """
    k = len(FUNNEL_STEPS)
    ev = (
        load_table(spark, sf_dir, "events")
        .where(F.col("event_type").isin(*FUNNEL_STEPS))
        .select("user_id", "ts", "event_type")
    )
    seq = ev.groupBy("user_id").agg(
        F.array_sort(F.collect_list(F.struct("ts", "event_type"))).alias("seq")
    )
    init = F.struct(
        *[F.lit(None).cast("timestamp").alias(f"t{i + 1}") for i in range(k)]
    )

    def step_time(acc, x, i):
        """Stage i's entry time: first event of the right type strictly
        after stage i-1's entry (pre-update acc on every guard — one
        event can never advance two stages)."""
        g = acc[f"t{i + 1}"].isNull() & (x["event_type"] == FUNNEL_STEPS[i])
        if i > 0:
            g = g & acc[f"t{i}"].isNotNull() & (x["ts"] > acc[f"t{i}"])
        return F.when(g, x["ts"]).otherwise(acc[f"t{i + 1}"]).alias(f"t{i + 1}")

    folded = seq.select(
        F.aggregate(
            "seq",
            init,
            lambda acc, x: F.struct(*[step_time(acc, x, i) for i in range(k)]),
        ).alias("f")
    )
    counts = folded.agg(
        *[
            # coalesce: a corpus with no funnel-step events folds to an
            # empty input whose sum is NULL, but the oracle's count(*)
            # over an empty stage table is 0
            F.coalesce(
                F.sum(F.col(f"f.t{i + 1}").isNotNull().cast("long")), F.lit(0)
            ).alias(f"n{i + 1}")
            for i in range(k)
        ]
    )
    stack_args = ", ".join(f"'{s}', n{i + 1}" for i, s in enumerate(FUNNEL_STEPS))
    return counts.select(
        F.expr(f"stack({k}, {stack_args}) AS (step, n_users)")
    )


SESSION_GAP_MIN = 30  # minutes of inactivity that closes a session

_SESSIONIZE_ORACLE = f"""
    WITH flagged AS (
        SELECT event_id, user_id, ts,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w > INTERVAL {SESSION_GAP_MIN} MINUTE
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT event_id, user_id,
           CAST(sum(new_session) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id
                                       ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND CURRENT ROW)
                AS BIGINT) AS session_seq
    FROM flagged
"""


@query("qz10_sessionize", oracle=_SESSIONIZE_ORACLE)
def qz10_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-ID assignment (gaps-and-islands): every event gets its
    user-local session ordinal, a new session starting after
    SESSION_GAP_MIN of inactivity — the per-EVENT complement of
    q10_session_windows' per-SESSION aggregate (pipelines need the
    assignment to join features back onto raw events).

    Scale shape: one shuffle by user, then two stacked window passes
    over the same (user, ts) sort — Catalyst reuses the single sort and
    partitioning for both (one Exchange in the plan); state per row is
    a lag and a running sum.  The (ts, event_id) tiebreak makes the
    assignment total-ordered and therefore engine-stable.  qz-prefixed
    but fully oracle-backed via the pytest differential sweep.
    """
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # full microsecond precision: cast("long") truncates to seconds and
    # mis-classifies gaps inside (1800, 1801)s against the oracle's
    # INTERVAL comparison
    gap = F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
    new_session = F.when(
        gap.isNull() | (gap > SESSION_GAP_MIN * 60 * 1_000_000), 1
    ).otherwise(0)
    return ev.select(
        "event_id",
        "user_id",
        F.sum(new_session)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("session_seq"),
    )


_SCD2_ORACLE = """
    SELECT user_id, ts AS valid_from,
           lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS valid_to,
           event_id, event_type, value,
           (lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               IS NULL) AS is_current
    FROM events
"""


@query("qz5_scd2", oracle=_SCD2_ORACLE)
def qz5_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD-2 interval construction: turn an append-only event log into
    versioned rows with [valid_from, valid_to) validity and an
    is_current flag — the standard change-history table a warehouse
    keeps for every mutable entity, built from the bus's immutable log
    (the reference's messages are immutable too; this is how its log
    becomes point-in-time queryable).

    Scale shape: ONE shuffle by entity key, one sort, one lead() —
    every version's closing timestamp is its successor's opening one.
    The (ts, event_id) tiebreak totalizes the order so simultaneous
    updates chain deterministically instead of producing ambiguous
    intervals.  As-of lookup then composes:
    ``WHERE valid_from <= t AND (valid_to > t OR is_current)``.
    qz-prefixed but fully oracle-backed via the pytest differential
    sweep.
    """
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    return ev.select(
        "user_id",
        F.col("ts").alias("valid_from"),
        nxt.alias("valid_to"),
        "event_id",
        "event_type",
        "value",
        nxt.isNull().alias("is_current"),
    )


TOPK_PER_WINDOW = 3


@query(
    "qz10_windowed_topk",
    oracle=f"""
    WITH per_user AS (
        SELECT date_trunc('day', ts) AS w_start,
               user_id,
               count(*) AS n_events,
               round(sum(value), 2) AS sum_value
        FROM events
        GROUP BY 1, 2
    ),
    ranked AS (
        SELECT *, row_number() OVER (PARTITION BY w_start
                                     ORDER BY n_events DESC, user_id) AS rnk
        FROM per_user
    )
    SELECT w_start, CAST(rnk AS BIGINT) AS rnk, user_id, n_events, sum_value
    FROM ranked WHERE rnk <= {TOPK_PER_WINDOW}
    """,
)
def qz10_windowed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K entities per event-time window — the 'trending per hour/
    day' shape every event-analytics surface needs (leaderboards,
    hot-key monitoring, per-window heavy users).

    Plan shape: ONE shuffle aggregates (window, user) partials map-side;
    the rank-and-filter then runs over the already-reduced per-window
    rows, where Spark's WindowGroupLimit pushes the rnk <= K predicate
    INTO the window sort, so each partition keeps a K-row heap per
    window instead of sorting every (window, user) group — the same
    per-group-top-N discipline gated for qz22_source_cap.  At 100 TB
    the first aggregation is the only corpus-sized stage; everything
    after operates on |windows|×|active users| reduced rows.

    qz-prefixed but fully oracle-backed via the pytest differential
    sweep (date_trunc twin of the 1-day tumbling window).
    """
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    per_user = (
        ev.groupBy(F.window("ts", "1 day").alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(F.col("w.start").alias("w_start"), "user_id", "n_events", "sum_value")
    )
    rnk = F.row_number().over(
        Window.partitionBy("w_start").orderBy(F.desc("n_events"), F.asc("user_id"))
    )
    return (
        per_user.withColumn("rnk", rnk.cast("long"))
        .where(F.col("rnk") <= TOPK_PER_WINDOW)
        .select("w_start", "rnk", "user_id", "n_events", "sum_value")
    )


ANOMALY_Z = 2.0  # |z| at or above this flags the hour as anomalous


@query(
    "qz10_rate_anomaly",
    oracle=f"""
    WITH hourly AS (
        SELECT date_trunc('hour', ts) AS w_start, event_type,
               count(*) AS n_events
        FROM events GROUP BY 1, 2
    ),
    scored AS (
        SELECT w_start, event_type, n_events,
               avg(n_events) OVER tw AS mu,
               stddev_samp(n_events) OVER tw AS sd
        FROM hourly
        WINDOW tw AS (PARTITION BY event_type ORDER BY w_start
                      RANGE BETWEEN INTERVAL 24 HOURS PRECEDING
                            AND INTERVAL 1 HOUR PRECEDING)
    )
    SELECT w_start, event_type, n_events,
           round(mu, 6) AS baseline,
           round((n_events - mu) / sd, 6) AS z,
           CAST(abs((n_events - mu) / sd) >= {ANOMALY_Z!r} AS BIGINT) AS anomalous
    FROM scored
    WHERE sd IS NOT NULL AND sd > 0
    """,
)
def qz10_rate_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-rate anomaly detection: each (hour, event_type)'s count
    z-scored against its own TRAILING 24-hour baseline — the on-call
    'is this stream misbehaving' primitive (spike/drop detection with a
    self-updating baseline, no fixed thresholds to tune per stream).

    Plan shape: the corpus-sized stage is one aggregation to hourly
    counts; the z-score is then a RANGE-frame window over the tiny
    (hours × types) table — order by epoch seconds with a
    [-24h, -1h) frame, so the baseline NEVER includes the scored hour
    (a frame that includes 'now' masks the very spike it should flag).
    At 100 TB only the first aggregation sees raw events; the window
    runs over |hours|×|types| rows regardless of corpus size.

    qz-prefixed but fully oracle-backed via the pytest differential
    sweep (DuckDB temporal RANGE frame twin).
    """
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    hourly = (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("w_start"), "event_type", "n_events")
    )
    tw = (
        Window.partitionBy("event_type")
        .orderBy(F.unix_timestamp("w_start"))
        .rangeBetween(-24 * 3600, -3600)
    )
    scored = hourly.select(
        "w_start",
        "event_type",
        "n_events",
        F.avg("n_events").over(tw).alias("mu"),
        F.stddev_samp("n_events").over(tw).alias("sd"),
    )
    z = (F.col("n_events") - F.col("mu")) / F.col("sd")
    return scored.where(F.col("sd").isNotNull() & (F.col("sd") > 0)).select(
        "w_start",
        "event_type",
        "n_events",
        F.round("mu", 6).alias("baseline"),
        F.round(z, 6).alias("z"),
        (F.abs(z) >= ANOMALY_Z).cast("long").alias("anomalous"),
    )


# ---------------------------------------------------------------------------
# qz5_forward_fill — last-observation-carried-forward per key
# ---------------------------------------------------------------------------

_FFILL_ORACLE = """
    WITH masked AS (
        SELECT user_id, event_id, ts,
               CASE WHEN event_type = 'error' THEN NULL
                    ELSE round(value, 2) END AS reading
        FROM events
    )
    SELECT user_id, event_id, reading,
           last_value(reading IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS filled
    FROM masked
    """


@query("qz5_forward_fill", oracle=_FFILL_ORACLE)
def qz5_forward_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward fill (LOCF — last observation carried forward) per key:
    the time-series repair primitive for sensor gaps / failed readings.
    Here ``error`` events mask their value to NULL and each key's gap
    inherits the latest non-null reading at or before it (leading gaps
    stay NULL — LOCF never invents data).

    ``last(..., ignorenulls=True)`` over a running per-key frame is the
    whole operator — one shuffle by user_id, sort within partition,
    single window pass; DuckDB's ``last_value(x IGNORE NULLS)`` is the
    exact twin.  (ts, event_id) ordering makes the fill deterministic
    under equal timestamps.  Fully oracle-backed.
    """
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    reading = F.when(F.col("event_type") == "error", F.lit(None)).otherwise(
        F.round("value", 2)
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        ev.select("user_id", "event_id", "ts", reading.alias("reading"))
        .withColumn("filled", F.last("reading", ignorenulls=True).over(w))
        .drop("ts")
    )


# ---------------------------------------------------------------------------
# qz10_dynamic_sessions — sessionization with a per-event-type gap
# ---------------------------------------------------------------------------

# inactivity horizon depends on what the PREVIOUS event was: a purchase
# keeps the session alive longer than a passive view (micros)
DYN_GAPS_US = {"purchase": 3600, "signup": 3600, "click": 1800, "view": 900, "error": 900}
_DYN_GAP_CASE = (
    "CASE {col} "
    + " ".join(f"WHEN '{k}' THEN {v * 1_000_000}" for k, v in DYN_GAPS_US.items())
    + " ELSE 1800000000 END"
)

_DYN_SESSIONS_ORACLE = f"""
    WITH lagged AS (
        SELECT event_id, user_id, event_type, ts,
               lag(ts) OVER w AS prev_ts,
               lag(event_type) OVER w AS prev_type
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    flagged AS (
        SELECT *,
               CASE WHEN prev_ts IS NULL
                         OR epoch_us(ts) - epoch_us(prev_ts)
                            > ({_DYN_GAP_CASE.format(col="prev_type")})
                    THEN 1 ELSE 0 END AS new_session
        FROM lagged
    )
    SELECT event_id, user_id,
           CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS session_seq
    FROM flagged
    """


@query("qz10_dynamic_sessions", oracle=_DYN_SESSIONS_ORACLE)
def qz10_dynamic_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization with a DYNAMIC inactivity gap: the horizon depends
    on the previous event's type (a purchase keeps the session alive an
    hour; a passive view only 15 minutes) — the shape Structured
    Streaming expresses with ``session_window(ts, gap_expression)`` and
    batch pipelines express as gaps-and-islands with a CASE gap, which
    is what runs here (same single-exchange two-window plan as
    qz10_sessionize; microsecond-exact compares; (ts, event_id)
    total order keeps both engines identical).  Fully oracle-backed.
    """
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "ts"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
    prev_type = F.lag("event_type").over(w)
    limit_us = F.coalesce(
        *[
            F.when(prev_type == k, F.lit(v * 1_000_000))
            for k, v in DYN_GAPS_US.items()
        ],
        F.lit(1_800_000_000),
    )
    new_session = F.when(gap_us.isNull() | (gap_us > limit_us), 1).otherwise(0)
    return ev.select(
        "event_id",
        "user_id",
        F.sum(new_session)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long")
        .alias("session_seq"),
    )


# ---------------------------------------------------------------------------
# qz10_transitions — event-type transition matrix (round 7).  The
# first-order Markov profile of user behavior: for every (from, to)
# event-type pair, how many consecutive-event transitions occur and
# the conditional probability P(to | from).  The behavioral-data
# sibling of the distribution profilers: a transition matrix that
# shifts between corpus snapshots is upstream behavior change (bot
# traffic, instrumentation bugs) that per-event histograms miss.
#
# Oracle-exactness: ordering is (ts, event_id) — event_id breaks
# timestamp ties deterministically; counts are exact longs and the
# probability is one integer division rounded at 6dp.
#
# Scale shape: ONE window shuffle by user_id (each user's history
# sorts locally), then a map-side-combined groupBy down to the
# (from, to) matrix — bounded by |event types|², not rows.
# ---------------------------------------------------------------------------

_TRANSITIONS_ORACLE = """
    WITH seq AS (
        SELECT user_id, event_type AS to_type,
               lag(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS from_type
        FROM events
    ),
    cells AS (
        SELECT from_type, to_type, count(*) AS n
        FROM seq WHERE from_type IS NOT NULL
        GROUP BY from_type, to_type
    )
    SELECT from_type, to_type, n,
           round(CAST(n AS DOUBLE)
                 / sum(n) OVER (PARTITION BY from_type), 6) AS p
    FROM cells
"""


@query("qz10_transitions", oracle=_TRANSITIONS_ORACLE)
def qz10_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order event-type transition matrix with conditional
    probabilities (header comment has the exactness and scale notes)."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("to_type"),
        F.lag("event_type").over(w).alias("from_type"),
    )
    cells = (
        seq.where(F.col("from_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wf = Window.partitionBy("from_type")
    return cells.select(
        "from_type",
        "to_type",
        "n",
        F.round(F.col("n").cast("double") / F.sum("n").over(wf), 6).alias("p"),
    )


# ---------------------------------------------------------------------------
# qz10_autocorr — lag-k autocorrelation of the daily value series per
# event type (round 7).  The time-series diagnostic the profiler family
# still lacked: pair each day's total with its lag-1 and lag-7
# predecessors via ordered windows, then one corr() aggregate per lag —
# day-over-day persistence and weekly seasonality in a single scan of
# the (days × types) table.  Pearson-on-lagged-pairs is the standard
# sample ACF estimator (Box–Jenkins denominate by the full-series
# variance instead; the pairwise form is what SQL's corr() computes and
# what the oracle pins exactly).
#
# 100 TB shape: identical to qz23_cusum — raw events collapse to
# (day, type) in the single corpus-sized aggregation; lags and corr run
# over the tiny derived table, partitioned by type.  No joins at all:
# the lag is an ordered window, the ACF is one map-side-combinable
# aggregate.
# ---------------------------------------------------------------------------

_AUTOCORR_ORACLE = """
    WITH daily AS (
        SELECT date_trunc('day', ts) AS d, event_type,
               sum(value) AS rev
        FROM events GROUP BY 1, 2
    ),
    lagged AS (
        SELECT event_type, rev,
               lag(rev, 1) OVER w AS rev_l1,
               lag(rev, 7) OVER w AS rev_l7
        FROM daily
        WINDOW w AS (PARTITION BY event_type ORDER BY d)
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_days,
           round(corr(rev, rev_l1), 6) AS acf_lag1,
           round(corr(rev, rev_l7), 6) AS acf_lag7
    FROM lagged
    GROUP BY event_type
"""


@query("qz10_autocorr", oracle=_AUTOCORR_ORACLE)
def qz10_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 and lag-7 autocorrelation of daily revenue per event type
    (header comment has the estimator and scale notes)."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("day", F.col("ts")).alias("d"), "event_type"
    ).agg(F.sum("value").alias("rev"))
    w = Window.partitionBy("event_type").orderBy("d")
    lagged = daily.select(
        "event_type",
        "rev",
        F.lag("rev", 1).over(w).alias("rev_l1"),
        F.lag("rev", 7).over(w).alias("rev_l7"),
    )
    return lagged.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.round(F.corr("rev", "rev_l1"), 6).alias("acf_lag1"),
        F.round(F.corr("rev", "rev_l7"), 6).alias("acf_lag7"),
    )


# ---------------------------------------------------------------------------
# Marketing attribution (first-touch / last-touch) — the behavioral-
# analytics classic the event-window family didn't cover: credit each
# purchase to the first (resp. last) click/view by the same user in the
# 7 days before it, with a deterministic (ts, event_id) tie order, and
# '(none)' when no touch qualifies (direct conversion).
#
# Scale shape: purchases ⋈ touches is an EQUI join on user_id with the
# 7-day band as a post-join predicate (the q16_range_join contract: never
# a nested loop); per-purchase argmin/argmax is one window over the
# candidate rows, whose fan-out is bounded by a user's touches per week,
# not the corpus.  Revenue sums in DECIMAL(12,2) (order-independent, the
# tpch_extra money contract).
# ---------------------------------------------------------------------------

_ATTRIBUTION_ORACLE = """
    WITH purch AS (
      SELECT event_id AS p_id, user_id AS p_user, ts AS p_ts,
             CAST(value AS DECIMAL(12,2)) AS p_value
      FROM events WHERE event_type = 'purchase'
    ),
    touch AS (
      SELECT user_id AS t_user, ts AS t_ts, event_type AS t_type,
             event_id AS t_id
      FROM events WHERE event_type IN ('click', 'view')
    ),
    cand AS (
      SELECT p.*, t.t_type, t.t_ts, t.t_id
      FROM purch p LEFT OUTER JOIN touch t
        ON t.t_user = p.p_user
       AND t.t_ts <= p.p_ts
       AND t.t_ts >= p.p_ts - INTERVAL 7 DAY
    ),
    ranked AS (
      SELECT *,
        row_number() OVER (PARTITION BY p_id
                           ORDER BY t_ts ASC  NULLS LAST, t_id ASC)  AS rn_first,
        row_number() OVER (PARTITION BY p_id
                           ORDER BY t_ts DESC NULLS LAST, t_id DESC) AS rn_last
      FROM cand
    ),
    credited AS (
      SELECT 'first_touch' AS model, coalesce(t_type, '(none)') AS touch_type,
             p_value
      FROM ranked WHERE rn_first = 1
      UNION ALL
      SELECT 'last_touch' AS model, coalesce(t_type, '(none)') AS touch_type,
             p_value
      FROM ranked WHERE rn_last = 1
    )
    SELECT model, touch_type,
           CAST(count(*) AS BIGINT) AS n_conversions,
           CAST(round(sum(p_value), 2) AS DOUBLE) AS attributed_revenue
    FROM credited GROUP BY 1, 2
"""


@query("qz10_attribution", oracle=_ATTRIBUTION_ORACLE)
def qz10_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch and last-touch purchase attribution over a 7-day
    lookback: (model, touch_type, n_conversions, attributed_revenue).
    Direct conversions (no qualifying touch) credit '(none)'."""
    ev = load_table(spark, sf_dir, "events")
    purch = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        F.col("value").cast("decimal(12,2)").alias("p_value"),
    )
    touch = ev.where(F.col("event_type").isin("click", "view")).select(
        F.col("user_id").alias("t_user"),
        F.col("ts").alias("t_ts"),
        F.col("event_type").alias("t_type"),
        F.col("event_id").alias("t_id"),
    )
    cand = purch.join(
        touch,
        (F.col("t_user") == F.col("p_user"))
        & (F.col("t_ts") <= F.col("p_ts"))
        & (F.col("t_ts") >= F.col("p_ts") - F.expr("INTERVAL 7 DAY")),
        "left_outer",
    )
    w_first = Window.partitionBy("p_id").orderBy(
        F.asc_nulls_last("t_ts"), F.asc("t_id")
    )
    w_last = Window.partitionBy("p_id").orderBy(
        F.desc_nulls_last("t_ts"), F.desc("t_id")
    )
    ranked = cand.select(
        "p_id",
        "p_value",
        "t_type",
        F.row_number().over(w_first).alias("rn_first"),
        F.row_number().over(w_last).alias("rn_last"),
    )
    touch_col = F.coalesce(F.col("t_type"), F.lit("(none)")).alias("touch_type")
    credited = (
        ranked.where(F.col("rn_first") == 1)
        .select(F.lit("first_touch").alias("model"), touch_col, "p_value")
        .unionAll(
            ranked.where(F.col("rn_last") == 1).select(
                F.lit("last_touch").alias("model"), touch_col, "p_value"
            )
        )
    )
    return credited.groupBy("model", "touch_type").agg(
        F.count(F.lit(1)).alias("n_conversions"),
        F.round(F.sum("p_value"), 2).cast("double").alias("attributed_revenue"),
    )


# ---------------------------------------------------------------------------
# Growth accounting (user lifecycle states) — the monthly
# new/retained/resurrected/churned decomposition every growth team
# reads.  Month identity is the integer year·12+month index (the
# cohort-LTV rule: no interval-semantics drift).  A user is NEW in
# their first active month, RETAINED in month m if active in m−1,
# RESURRECTED if active earlier but not in m−1, and CHURNED in m+1
# when active in m but not m+1 (churn rows stop at the corpus' last
# observed month — no phantom churn after the observation window).
# Scale: one DISTINCT (user, month) aggregation, one per-user window
# (lag/lead over a few rows per user), two shrinking counts.
# ---------------------------------------------------------------------------

_LIFECYCLE_ORACLE = """
    WITH active AS (
      SELECT DISTINCT user_id,
             CAST(year(ts) * 12 + month(ts) AS BIGINT) AS m
      FROM events
    ),
    mx AS (SELECT max(m) AS max_m FROM active),
    seq AS (
      SELECT user_id, m,
             lag(m)  OVER (PARTITION BY user_id ORDER BY m) AS pm,
             lead(m) OVER (PARTITION BY user_id ORDER BY m) AS nm
      FROM active
    ),
    states AS (
      SELECT m, CASE WHEN pm IS NULL THEN 'new'
                     WHEN pm = m - 1 THEN 'retained'
                     ELSE 'resurrected' END AS state
      FROM seq
      UNION ALL
      SELECT s.m + 1, 'churned'
      FROM seq s, mx
      WHERE (s.nm IS NULL OR s.nm > s.m + 1) AND s.m + 1 <= mx.max_m
    )
    SELECT m, state, CAST(count(*) AS BIGINT) AS n_users
    FROM states GROUP BY 1, 2
"""


@query("qz10_lifecycle", oracle=_LIFECYCLE_ORACLE)
def qz10_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly growth accounting: (m, state, n_users) over
    new/retained/resurrected/churned — see header comment for the
    state rules.  Fully oracle-backed (pure integer month algebra)."""
    ev = load_table(spark, sf_dir, "events")
    active = ev.select(
        "user_id", (F.year("ts") * 12 + F.month("ts")).cast("long").alias("m")
    ).distinct()
    mx = active.agg(F.max("m").alias("max_m"))
    w = Window.partitionBy("user_id").orderBy("m")
    seq = active.select(
        "user_id",
        "m",
        F.lag("m").over(w).alias("pm"),
        F.lead("m").over(w).alias("nm"),
    )
    states = seq.select(
        "m",
        F.when(F.col("pm").isNull(), "new")
        .when(F.col("pm") == F.col("m") - 1, "retained")
        .otherwise("resurrected")
        .alias("state"),
    ).unionAll(
        seq.crossJoin(F.broadcast(mx))
        .where(
            (F.col("nm").isNull() | (F.col("nm") > F.col("m") + 1))
            & (F.col("m") + 1 <= F.col("max_m"))
        )
        .select((F.col("m") + 1).alias("m"), F.lit("churned").alias("state"))
    )
    return states.groupBy("m", "state").agg(F.count(F.lit(1)).alias("n_users"))


# ---------------------------------------------------------------------------
# Sliding-window EXACT distinct — trailing 7-day distinct users per
# active day.  Distinct doesn't decompose over sliding windows (you
# cannot merge per-day distinct counts), so the exact form joins the
# tiny day-anchor list (one row per ACTIVE day — a broadcast) against
# the distinct (user, day) activity table with a 7-day band: each
# activity row lands in ≤7 anchors, so the expansion is 7×|user-days|,
# never users×days.  Day identity is the integer epoch-day.  The
# approx tier for this shape is qz9_hll_mergeable (sketches DO merge
# across windows); this is its exact twin, same twinning as the
# percentile tiers.
# ---------------------------------------------------------------------------

_SLIDING_DISTINCT_ORACLE = """
    WITH active AS (
      SELECT DISTINCT user_id,
             CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day
      FROM events
    ),
    anchors AS (SELECT DISTINCT day FROM active)
    SELECT a.day,
           CAST(count(DISTINCT u.user_id) AS BIGINT) AS users_7d
    FROM anchors a JOIN active u
      ON u.day BETWEEN a.day - 6 AND a.day
    GROUP BY a.day
"""


@query("qz10_sliding_distinct", oracle=_SLIDING_DISTINCT_ORACLE)
def qz10_sliding_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day distinct active users per active day (exact):
    (day, users_7d).  See header comment for why sliding distinct
    needs the band join and where the sketch tier takes over."""
    ev = load_table(spark, sf_dir, "events")
    active = ev.select(
        "user_id",
        F.floor(F.unix_timestamp("ts") / 86400).cast("long").alias("day"),
    ).distinct()
    anchors = active.select(F.col("day").alias("a_day")).distinct()
    return (
        active.join(
            F.broadcast(anchors),
            (F.col("day") >= F.col("a_day") - 6) & (F.col("day") <= F.col("a_day")),
        )
        .groupBy(F.col("a_day").alias("day"))
        .agg(F.countDistinct("user_id").alias("users_7d"))
    )


# ---------------------------------------------------------------------------
# Inter-purchase gap distribution — the repeat-purchase cadence curve:
# per-user gaps between consecutive purchases (lag window), pooled into
# exact discrete percentiles via the ⌈p·n⌉ order-statistic rule (the
# qz28 contract).  Gaps are exact integer seconds, so every output is
# an integer a purchase pair actually exhibited.
# Scale: one (user) window over purchases only, one global rank window
# over the |purchase-pairs| gap table — both fact-pruned at the scan.
# ---------------------------------------------------------------------------

_PURCHASE_GAPS_ORACLE = """
    WITH p AS (
      SELECT user_id, ts FROM events WHERE event_type = 'purchase'
    ),
    gaps AS (
      SELECT CAST(date_diff('second',
                  lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                  ts) AS BIGINT) AS gap_s
      FROM (SELECT user_id, ts, event_id FROM events
            WHERE event_type = 'purchase')
      QUALIFY lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
              IS NOT NULL
    ),
    ranked AS (
      SELECT gap_s,
             row_number() OVER (ORDER BY gap_s) AS rn,
             count(*) OVER () AS n
      FROM gaps
    )
    SELECT max(n) AS n_gaps,
           max(CASE WHEN rn = CAST(ceil(0.25 * n) AS BIGINT) THEN gap_s END) AS p25_s,
           max(CASE WHEN rn = CAST(ceil(0.50 * n) AS BIGINT) THEN gap_s END) AS median_s,
           max(CASE WHEN rn = CAST(ceil(0.75 * n) AS BIGINT) THEN gap_s END) AS p75_s,
           max(CASE WHEN rn = CAST(ceil(0.90 * n) AS BIGINT) THEN gap_s END) AS p90_s
    FROM ranked
"""


@query("qz10_purchase_gaps", oracle=_PURCHASE_GAPS_ORACLE)
def qz10_purchase_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact discrete percentiles of inter-purchase gaps in seconds
    (1 row: n_gaps, p25/median/p75/p90) — the repeat-purchase cadence
    a retention model calibrates against.

    The global rank runs through operators/ranks.py's AUTO
    global_row_number (round 10, closing the last single-task global
    sort the r9 audit flagged): small inputs keep the plain window
    plan; past the measured crossover the percentile-bucketed
    one-exchange recipe takes over — same values (ties in gap_s are
    rank-order-insensitive for the selected percentile VALUES; the
    event_id tie-break makes the order total as the operator
    requires).  The qz9 sketch tier remains the ±ε alternative."""
    from frizzle_spark.operators.ranks import global_row_number

    ev = load_table(spark, sf_dir, "events")
    p = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    w_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = (
        p.select(
            "event_id",
            (
                F.unix_timestamp("ts")
                - F.unix_timestamp(F.lag("ts").over(w_user))
            )
            .cast("long")
            .alias("gap_s"),
        )
        .where(F.col("gap_s").isNotNull())
    )
    ranked = global_row_number(
        gaps, "gap_s", [F.asc("gap_s"), F.asc("event_id")], out="rn"
    )
    n_df = gaps.agg(F.count(F.lit(1)).alias("n"))
    joined = ranked.crossJoin(F.broadcast(n_df))

    def _at(pq: float):
        idx = F.ceil(F.lit(pq) * F.col("n")).cast("long")
        return F.max(F.when(F.col("rn") == idx, F.col("gap_s")))

    return joined.agg(
        F.max("n").alias("n_gaps"),
        _at(0.25).alias("p25_s"),
        _at(0.50).alias("median_s"),
        _at(0.75).alias("p75_s"),
        _at(0.90).alias("p90_s"),
    )


_PEAK_CONCURRENCY_ORACLE = """
    WITH ev AS (
      SELECT epoch_us(ts) AS s_us,
             epoch_us(ts) + CAST(floor(value * 1000000) AS BIGINT) AS e_us
      FROM events
    ), b AS (
      SELECT s_us AS t, 1 AS d FROM ev
      UNION ALL
      SELECT e_us AS t, -1 AS d FROM ev
    ), g AS (
      SELECT t, SUM(d) AS net FROM b GROUP BY t
    ), r AS (
      SELECT t, SUM(net) OVER (ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS conc
      FROM g
    )
    SELECT make_timestamp((t // 3600000000) * 3600000000) AS hour_start,
           CAST(max(conc) AS BIGINT) AS peak
    FROM r
    GROUP BY 1
"""


@query("qz10_peak_concurrency", oracle=_PEAK_CONCURRENCY_ORACLE)
def qz10_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrency per hour via a distributed sweep line: each event
    occupies the half-open interval [ts, ts + value seconds); the answer is
    the max number of simultaneously-open intervals observed in each hour.

    The naive formulation is an interval self-join (every pair of
    overlapping events) — quadratic per hot hour.  The sweep line is the
    linear form: explode each interval into a +1/-1 boundary pair, sum
    deltas per distinct instant (so an end and a start at the SAME
    microsecond cancel first — exactly the [s,e) semantics, mirrored by
    construction in the oracle), then a running sum ordered by time gives
    the concurrency after each instant.

    A single global running sum would be one totally-ordered partition —
    the classic scale-killer.  This is the two-phase distributed prefix
    sum instead (the qz22_token_budget pattern): the running sum is
    partitioned by hour (parallel, shuffle on hour key), and each hour's
    starting offset is the exclusive prefix of per-hour net sums — a
    |hours|-row window (bounded by the calendar, NOT by data volume: 30
    days = 720 rows even at 100 TB) that broadcasts back onto the
    per-hour partials.  All timestamp math is integer microseconds
    (``unix_micros`` / ``epoch_us`` + ``floor``), so both engines hash
    identical BIGINTs — no float-seconds rounding hazard.

    Scale: 2 rows per event into one groupBy(t) shuffle; one shuffle on
    the hour key; the only ordered structure is the calendar-bounded
    hour spine.  Reference has no interval analytics (transforms are
    opaque func(Msg) Msg, reference transform.go:8-14).
    """
    ev = load_table(spark, sf_dir, "events").select(
        F.unix_micros("ts").alias("s_us"),
        (
            F.unix_micros("ts")
            + F.floor(F.col("value") * F.lit(1000000.0)).cast("long")
        ).alias("e_us"),
    )
    bounds = ev.select(F.col("s_us").alias("t"), F.lit(1).alias("d")).unionAll(
        ev.select(F.col("e_us").alias("t"), F.lit(-1).alias("d"))
    )
    per_instant = (
        bounds.groupBy("t")
        .agg(F.sum("d").alias("net"))
        .withColumn("hr", F.expr("t div 3600000000"))
    )
    w_in_hour = (
        Window.partitionBy("hr")
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    partials = per_instant.withColumn("run_in_hr", F.sum("net").over(w_in_hour))
    # Exclusive prefix of per-hour nets = each hour's carried-in concurrency.
    w_hours = (
        Window.orderBy("hr")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        per_instant.groupBy("hr")
        .agg(F.sum("net").alias("hour_net"))
        .withColumn("carry_in", F.coalesce(F.sum("hour_net").over(w_hours), F.lit(0)))
        .select("hr", "carry_in")
    )
    return (
        partials.join(F.broadcast(offsets), "hr")
        .withColumn("conc", F.col("carry_in") + F.col("run_in_hr"))
        .groupBy("hr")
        .agg(F.max("conc").cast("long").alias("peak"))
        .select(
            F.timestamp_micros(F.col("hr") * F.lit(3600000000)).alias("hour_start"),
            "peak",
        )
    )


_STREAKS_ORACLE = """
    WITH days AS (
      SELECT DISTINCT user_id,
             date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day_id
      FROM events
    ), islands AS (
      SELECT user_id,
             day_id - row_number() OVER (PARTITION BY user_id ORDER BY day_id)
               AS island
      FROM days
    ), streaks AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS streak_days
      FROM islands GROUP BY user_id, island
    ), longest AS (
      SELECT user_id, max(streak_days) AS best
      FROM streaks GROUP BY user_id
    )
    SELECT best AS streak_days, CAST(count(*) AS BIGINT) AS n_users
    FROM longest GROUP BY 1
"""


@query("qz10_streaks", oracle=_STREAKS_ORACLE)
def qz10_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-day activity streak per user, reported as a
    histogram (streak length → user count) — the classic gaps-and-islands
    shape that qz10_sessionize's time-gap form does NOT cover: islands
    here are defined on the integer DAY grid (``day_id − row_number()``
    is constant exactly while days are consecutive), not on arbitrary
    timestamp gaps.

    Scale: one distinct over (user, day) collapses the fact table to at
    most |users|·|days| rows before anything ordered happens; the only
    window is partitioned by user (bounded state per key, never a global
    sort); the two follow-up groupBys shrink monotonically, and the
    histogram output is at most |days| rows.  All arithmetic is integer
    epoch-days — no timezone/rounding hazard between engines (session
    timezone is UTC, and both engines truncate the SAME timestamp).

    Reference has no event-time analytics at all (msg.go:19 carries a
    timestamp the engine never consumes).
    """
    ev = load_table(spark, sf_dir, "events")
    days = ev.select(
        "user_id",
        F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date")).alias("day_id"),
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day_id")
    islands = days.withColumn(
        "island", F.col("day_id") - F.row_number().over(w)
    )
    streaks = islands.groupBy("user_id", "island").agg(
        F.count(F.lit(1)).alias("streak_days")
    )
    longest = streaks.groupBy("user_id").agg(
        F.max("streak_days").alias("best")
    )
    return longest.groupBy(F.col("best").alias("streak_days")).agg(
        F.count(F.lit(1)).alias("n_users")
    )


# ---------------------------------------------------------------------------
# qz10_match_path — MATCH_RECOGNIZE-lite sequence pattern matching
# (round 7, final wave).  The one event-analytics shape the registry
# still lacked as a first-class operator: regular-expression matching
# over each user's ORDERED event-type path, the portable core of SQL's
# MATCH_RECOGNIZE (Flink CEP / Oracle 12c / Trino all expose the same
# regex-over-rows semantics).  Each user's history collapses to a
# character string (one char per event type, ordered by ts with
# event_id as the deterministic tie-break); behavioral patterns are
# ordinary regexes counted non-overlapping left-to-right — exactly
# MATCH_RECOGNIZE's AFTER MATCH SKIP PAST LAST ROW policy.
#
# The reference bus has no sequence semantics at all (msg.go:19 carries
# a timestamp the engine never consumes); this is the committed
# extension shape.
#
# Oracle-exactness: Java regex (Spark regexp_count) and RE2 (DuckDB
# regexp_extract_all) agree on these patterns — plain character
# classes with greedy +, no backrefs/lookarounds, and both engines use
# leftmost non-overlapping scan.  Path order is (ts, event_id), the
# same deterministic key every other q10 query pins.
#
# Scale shape: ONE shuffle — groupBy(user_id) builds each path with a
# map-side-combinable collect_list (state bounded by per-user event
# count, the same bound session windows already rely on); the 3-row
# pattern table joins broadcast-nested-loop (3 literals, no shuffle);
# the result is |patterns| rows.  At 100 TB the only risk is a
# pathological power user inflating one path string — the same key-skew
# exposure as any per-entity sessionization, handled by the standard
# per-user event cap upstream (qz22_source_cap's shape).
# ---------------------------------------------------------------------------

_MATCH_PATH_ORACLE = """
    WITH path AS (
        SELECT user_id,
               string_agg(CASE event_type
                              WHEN 'view'     THEN 'v'
                              WHEN 'click'    THEN 'c'
                              WHEN 'purchase' THEN 'p'
                              WHEN 'error'    THEN 'e'
                              WHEN 'signup'   THEN 's'
                              ELSE 'x' END,
                          '' ORDER BY ts, event_id) AS s
        FROM events GROUP BY user_id
    ),
    pat(pattern, rx) AS (
        VALUES ('browse_to_buy',  '[vc]+p'),
               ('error_recovery', 'e+p'),
               ('signup_bounce',  'se')
    ),
    m AS (
        SELECT pat.pattern,
               len(regexp_extract_all(path.s, pat.rx)) AS n
        FROM path CROSS JOIN pat
    )
    SELECT pattern,
           CAST(count(*) FILTER (WHERE n > 0) AS BIGINT) AS n_users,
           CAST(sum(n) AS BIGINT)                        AS n_matches
    FROM m GROUP BY pattern
"""


@query("qz10_match_path", oracle=_MATCH_PATH_ORACLE)
def qz10_match_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE-lite: count non-overlapping regex pattern matches
    over each user's ordered event-type path (header comment has the
    exactness and scale notes)."""
    ev = load_table(spark, sf_dir, "events")
    ch = (
        F.when(F.col("event_type") == "view", "v")
        .when(F.col("event_type") == "click", "c")
        .when(F.col("event_type") == "purchase", "p")
        .when(F.col("event_type") == "error", "e")
        .when(F.col("event_type") == "signup", "s")
        .otherwise("x")
    )
    paths = (
        ev.select("user_id", F.struct("ts", "event_id", ch.alias("ch")).alias("e"))
        .groupBy("user_id")
        .agg(
            F.concat_ws(
                "",
                F.transform(
                    F.array_sort(F.collect_list("e")), lambda s: s["ch"]
                ),
            ).alias("s")
        )
    )
    pats = spark.createDataFrame(
        [
            ("browse_to_buy", "[vc]+p"),
            ("error_recovery", "e+p"),
            ("signup_bounce", "se"),
        ],
        "pattern string, rx string",
    )
    matched = paths.join(F.broadcast(pats)).select(
        "pattern", F.regexp_count("s", F.col("rx")).alias("n")
    )
    return matched.groupBy("pattern").agg(
        F.sum(F.when(F.col("n") > 0, 1).otherwise(0)).cast("long").alias("n_users"),
        F.sum("n").cast("long").alias("n_matches"),
    )
