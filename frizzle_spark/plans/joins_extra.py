"""Q16 — join shapes beyond plain equi-joins (SURVEY.md §2.2 "joins" row:
range/theta join and stream–static join are committed inventory; the
as-of join is the canonical training-data-pipeline primitive the
reference cannot express at all — its only "join" is user code holding
two channels, reference frizzle.go:97-123).

Three operators:

* ``q16_range_join``   — temporal range (interval) join: purchases within
  one hour AFTER a click by the same user.  Equi key (user_id) + range
  predicate — shuffles by user, never a cross join, so the plan survives
  100 TB (pairs per user are bounded by per-user activity, the classic
  sessionized-funnel shape).
* ``q16_asof_join``    — as-of join via the union + ordered-window scan:
  each event picks the latest order (by o_orderdate) of the same
  customer at-or-before its timestamp.  ONE shuffle + sort of
  events∪orders by (key, time); no join explosion (an equi-join first
  would materialize every 〈event, earlier-order〉 pair — 95k pairs at
  sf0.01, quadratic in per-key history at scale).  This is the
  pattern range-partitioned time-series stores use for MERGE AS OF.
* ``q16_stream_static``— Structured Streaming stream–static join:
  replayed events stream ⋈ broadcast static customer dim → streaming
  aggregation by market segment, availableNow, memory sink; the sink
  contents are differentially checked against the batch SQL oracle.
"""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from frizzle_spark.plans.registry import query
from frizzle_spark.sources.tables import load_table

FUNNEL_WINDOW = "1 hour"

_RANGE_ORACLE = """
    SELECT a.event_id AS click_id, b.event_id AS purchase_id,
           a.user_id AS user_id,
           CAST(date_diff('second', a.ts, b.ts) AS BIGINT) AS secs_to_purchase
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 1 HOUR
    WHERE a.event_type = 'click' AND b.event_type = 'purchase'
"""


@query("q16_range_join", oracle=_RANGE_ORACLE)
def q16_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Click→purchase funnel pairs inside a 1 h window (range join)."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("ts").alias("click_ts"),
    )
    buys = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("b_user_id"),
        F.col("ts").alias("buy_ts"),
    )
    cond = (
        (F.col("user_id") == F.col("b_user_id"))
        & (F.col("buy_ts") > F.col("click_ts"))
        & (F.col("buy_ts") <= F.col("click_ts") + F.expr(f"INTERVAL {FUNNEL_WINDOW}"))
    )
    secs = (F.unix_timestamp("buy_ts") - F.unix_timestamp("click_ts")).cast("long")
    return clicks.join(buys, cond).select(
        "click_id", "purchase_id", "user_id", secs.alias("secs_to_purchase")
    )


_ASOF_ORACLE = """
    WITH cand AS (
        SELECT e.event_id, e.user_id, o.o_orderkey, o.o_orderdate,
               row_number() OVER (
                   PARTITION BY e.event_id
                   ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
        FROM events e
        JOIN orders o ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
    )
    SELECT event_id, user_id, o_orderkey AS asof_orderkey,
           o_orderdate AS asof_orderdate
    FROM cand WHERE rn = 1
"""


@query("q16_asof_join", oracle=_ASOF_ORACLE)
def q16_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: latest order at-or-before each event, per customer.

    Union both sides tagged ``side`` (orders=0, events=1), sort within
    each customer by (time, side, orderkey) and carry the running
    ``last(order, ignorenulls)`` forward — an order dated exactly at the
    event timestamp is visible (<= semantics), and among same-date
    orders the max orderkey wins (mirrors the oracle's tie-break).
    """
    ev = load_table(spark, sf_dir, "events")
    orders = load_table(spark, sf_dir, "orders")
    o = orders.select(
        F.col("o_custkey").alias("key"),
        F.col("o_orderdate").alias("t"),
        F.lit(0).alias("side"),
        F.col("o_orderkey").alias("ord_key"),
        F.col("o_orderdate").alias("ord_date"),
        F.lit(None).cast("long").alias("event_id"),
    )
    e = ev.select(
        F.col("user_id").alias("key"),
        F.col("ts").alias("t"),
        F.lit(1).alias("side"),
        F.lit(None).cast("long").alias("ord_key"),
        F.lit(None).cast("timestamp").alias("ord_date"),
        "event_id",
    )
    w = (
        Window.partitionBy("key")
        .orderBy("t", "side", "ord_key")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = o.unionByName(e).select(
        "key",
        "side",
        "event_id",
        F.last("ord_key", ignorenulls=True).over(w).alias("asof_orderkey"),
        F.last("ord_date", ignorenulls=True).over(w).alias("asof_orderdate"),
    )
    return merged.where(
        (F.col("side") == 1) & F.col("asof_orderkey").isNotNull()
    ).select(
        "event_id",
        F.col("key").alias("user_id"),
        "asof_orderkey",
        "asof_orderdate",
    )


_SEGMENT_ORACLE = """
    SELECT c.c_mktsegment AS segment,
           count(*) AS n_events,
           round(sum(e.value), 6) AS sum_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY c.c_mktsegment
"""


@query("q16_stream_static", oracle=_SEGMENT_ORACLE)
def q16_stream_static(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream–static join: replayed event stream ⋈ broadcast customer dim,
    streaming aggregation by segment (complete mode, availableNow).

    The static side re-resolves per micro-batch (Spark's stream-static
    contract), and broadcast keeps the join shuffle-free — at 100 TB the
    stream side never repartitions for this join.
    """
    from frizzle_spark.sources.tables import enable_nanos_scan

    # Schema comes from the parquet footer (events_raw_schema) so the
    # stream reads whichever ts physical type the dataset variant ships;
    # ts itself is unused here, so the select prunes it before the join.
    enable_nanos_scan(spark)
    from frizzle_spark.plans.streaming_queries import _stream_events_raw

    stream = _stream_events_raw(spark, sf_dir).select("user_id", "value")
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    agg = (
        stream.join(F.broadcast(cust), "user_id")
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
    )
    qname = f"seg_agg_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(qname)
        .outputMode("complete")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_ss_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.table(qname)


_OUTER_ORACLE = """
    WITH ustats AS (
        SELECT user_id, count(*) AS n_events, round(sum(value), 6) AS sum_value
        FROM events GROUP BY user_id
    ),
    small_cust AS (
        SELECT c_custkey, c_name, c_mktsegment FROM customer WHERE c_custkey < 100
    )
    SELECT coalesce(u.user_id, c.c_custkey) AS key,
           u.n_events, u.sum_value, c.c_name, c.c_mktsegment,
           CASE WHEN u.user_id IS NULL THEN 'customer_only'
                WHEN c.c_custkey IS NULL THEN 'events_only'
                ELSE 'both' END AS side
    FROM ustats u FULL OUTER JOIN small_cust c ON u.user_id = c.c_custkey
"""


@query("q17_outer_joins", oracle=_OUTER_ORACLE)
def q17_outer_joins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-outer join with genuinely unmatched rows on BOTH sides
    (users 100-149 have events but no small_cust row; customers beyond
    the event population have no events), expressed through the
    ``spark.sql`` surface over temp views — the engine's SQL entry path.

    Left/right outer are the same plan with one side's null branch
    dropped; full-outer is the strict superset so it is the oracle-
    checked shape.  Catalyst plans it as a sort-merge join (broadcast
    full-outer is unsupported for the stream side) — both inputs
    shuffle once on the key.
    """
    from frizzle_spark.sources.tables import load_table

    load_table(spark, sf_dir, "events").createOrReplaceTempView("v_events")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("v_customer")
    return spark.sql(
        """
        WITH ustats AS (
            SELECT user_id, count(*) AS n_events,
                   round(sum(value), 6) AS sum_value
            FROM v_events GROUP BY user_id
        ),
        small_cust AS (
            SELECT c_custkey, c_name, c_mktsegment
            FROM v_customer WHERE c_custkey < 100
        )
        SELECT coalesce(u.user_id, c.c_custkey) AS key,
               u.n_events, u.sum_value, c.c_name, c.c_mktsegment,
               CASE WHEN u.user_id IS NULL THEN 'customer_only'
                    WHEN c.c_custkey IS NULL THEN 'events_only'
                    ELSE 'both' END AS side
        FROM ustats u FULL OUTER JOIN small_cust c ON u.user_id = c.c_custkey
        """
    )


_SALTED_ORACLE = """
    SELECT o.o_orderkey, c.c_name, c.c_mktsegment
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE o.o_totalprice > 100000
"""


@query("q19_salted_join", oracle=_SALTED_ORACLE)
def q19_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The salted skew join as a registry query: same rows as the plain
    equi-join (the oracle), produced through salt-and-replicate
    (operators/skew.py).  Exists to keep the skew path differentially
    verified on real tables — use it when a hot key breaks past AQE's
    split threshold and the right side can't broadcast.
    """
    from frizzle_spark.operators.skew import salted_join

    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_totalprice") > 100000
    )
    cust = load_table(spark, sf_dir, "customer").withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    return salted_join(orders, cust, ["o_custkey"]).select(
        "o_orderkey", "c_name", "c_mktsegment"
    )


_PIT_ORACLE = """
    WITH days AS (SELECT DISTINCT date_trunc('day', ts) AS t FROM events),
    users AS (SELECT DISTINCT user_id FROM events),
    probes AS (SELECT user_id, t FROM users, days),
    v AS (
        SELECT user_id, ts AS valid_from,
               lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS valid_to,
               event_id, event_type, value
        FROM events
    )
    SELECT p.user_id, p.t AS probe_ts, v.event_id, v.event_type,
           round(v.value, 6) AS value
    FROM probes p JOIN v
      ON p.user_id = v.user_id
     AND v.valid_from <= p.t AND (v.valid_to > p.t OR v.valid_to IS NULL)
"""


@query("qz16_pit_scd2", oracle=_PIT_ORACLE)
def qz16_pit_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time lookup against the SCD-2 version history — the
    feature-store correctness primitive: 'what was this entity's state
    at time t', answered WITHOUT leakage from later versions (training
    features joined naively on key silently read the future; PIT joins
    are how that bug is kept out of training data).

    Probe set: every (user, day-boundary) over the corpus' span.  The
    lookup uses the engine's join-free as-of pattern (q16_asof_join):
    probes and versions UNION into one stream, one shuffle+sort per
    user over (ts, is-probe, event_id), and last(ignorenulls) pulls
    each probe's governing version — correct because lead()-built SCD-2
    intervals are gapless, so the latest version at-or-before t always
    contains t.  Versions order BEFORE probes at equal ts, making the
    match boundary exactly ``valid_from <= t``.  At 100 TB: no join,
    no per-key state beyond the sort, one exchange on user_id.

    The oracle states the same semantics as interval containment
    against lead()-closed intervals — the declarative spec, while the
    union+window is the scale plan.  qz-prefixed but fully
    oracle-backed via the pytest differential sweep.
    """
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    days = ev.select(F.date_trunc("day", "ts").alias("t")).distinct()
    users = ev.select("user_id").distinct()
    probes = users.crossJoin(F.broadcast(days)).select(
        "user_id",
        F.col("t"),
        F.lit(1).alias("is_probe"),
        F.lit(None).cast("long").alias("event_id"),
        F.lit(None).cast("string").alias("event_type"),
        F.lit(None).cast("double").alias("value"),
    )
    versions = ev.select(
        "user_id",
        F.col("ts").alias("t"),
        F.lit(0).alias("is_probe"),
        "event_id",
        "event_type",
        "value",
    )
    merged = versions.unionByName(probes)
    w = (
        Window.partitionBy("user_id")
        .orderBy("t", "is_probe", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = merged.select(
        "user_id",
        "t",
        "is_probe",
        F.last("event_id", ignorenulls=True).over(w).alias("v_event_id"),
        F.last("event_type", ignorenulls=True).over(w).alias("v_event_type"),
        F.last("value", ignorenulls=True).over(w).alias("v_value"),
    )
    return (
        filled.where((F.col("is_probe") == 1) & F.col("v_event_id").isNotNull())
        .select(
            "user_id",
            F.col("t").alias("probe_ts"),
            F.col("v_event_id").alias("event_id"),
            F.col("v_event_type").alias("event_type"),
            F.round("v_value", 6).alias("value"),
        )
    )


_CDC_MERGE_ORACLE = """
    WITH latest AS (
        SELECT user_id, event_type, value FROM (
            SELECT user_id, event_type, value,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY ts DESC, event_id DESC) AS rn
            FROM events
        ) WHERE rn = 1
    ),
    snapshot AS (
        SELECT c_custkey AS key, c_name, round(c_acctbal, 2) AS balance
        FROM customer
    )
    SELECT coalesce(s.key, l.user_id) AS key,
           CASE WHEN l.user_id IS NULL THEN 'unchanged'
                WHEN s.key IS NULL THEN 'inserted'
                ELSE 'updated' END AS change,
           CASE WHEN l.user_id IS NULL THEN s.c_name ELSE s.c_name END AS c_name,
           CASE WHEN l.user_id IS NULL THEN s.balance
                ELSE round(l.value, 2) END AS balance
    FROM snapshot s FULL OUTER JOIN latest l ON s.key = l.user_id
    WHERE NOT (l.event_type = 'error' AND l.user_id IS NOT NULL)
       OR l.user_id IS NULL
"""


@query("qz17_cdc_merge", oracle=_CDC_MERGE_ORACLE)
def qz17_cdc_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC MERGE: apply a changelog to a snapshot — the warehouse upsert
    primitive (Delta/Iceberg ``MERGE INTO`` semantics) built from core
    relational pieces, for targets that are plain parquet.

    Changelog = each user's LATEST event (keep-latest window, the
    standard CDC compaction — intermediate changes per key are
    superseded): an ``error`` event is a DELETE, anything else UPSERTs
    the balance; snapshot rows without changes pass through, changelog
    keys absent from the snapshot INSERT.

    Plan shape: one window over the changelog (compaction — shuffle by
    key, carries the changelog only, never the snapshot), then ONE full
    outer join snapshot⋈compacted-changes.  At 100 TB the changelog is
    normally ≪ snapshot, so the join's snapshot side streams while
    change resolution is per-row CASE logic — no second pass, no
    driver-side anything.  Full outer is required (unchanged + inserted
    + updated all surface); deletes drop in the post-join filter.

    qz-prefixed but fully oracle-backed via the pytest differential
    sweep.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    latest = (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "event_type", "value")
    )
    snapshot = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("key"),
        "c_name",
        F.round("c_acctbal", 2).alias("balance"),
    )
    merged = snapshot.join(latest, snapshot["key"] == latest["user_id"], "full_outer")
    change = (
        F.when(F.col("user_id").isNull(), "unchanged")
        .when(F.col("key").isNull(), "inserted")
        .otherwise("updated")
    )
    return (
        merged.where(
            ~((F.col("event_type") == "error") & F.col("user_id").isNotNull())
            | F.col("user_id").isNull()
        )
        .select(
            F.coalesce("key", "user_id").alias("key"),
            change.alias("change"),
            "c_name",
            F.when(F.col("user_id").isNull(), F.col("balance"))
            .otherwise(F.round("value", 2))
            .alias("balance"),
        )
    )


# ---------------------------------------------------------------------------
# qz17_incr_agg — incremental materialized-view maintenance
# ---------------------------------------------------------------------------

INCR_CUTOFF = "2024-01-16 00:00:00"

_INCR_AGG_ORACLE = f"""
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(CAST(round(value * 100) AS BIGINT)) / 100.0, 2) AS sum_value
    FROM events
    GROUP BY user_id
"""


@query("qz17_incr_agg", oracle=_INCR_AGG_ORACLE)
def qz17_incr_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance: refresh a per-user
    aggregate by merging the stored snapshot with ONLY the new slice —
    never rescanning history.  The oracle is the full recompute over
    all events; the query must produce it bit-identically from
    snapshot ⊕ delta.

    Here the "stored MV" is the aggregate over events before
    {INCR_CUTOFF!r} (in production: a parquet/Delta table written by the
    previous refresh) and the delta is everything after.  Merge = ONE
    full outer join on the group key + componentwise combine
    (count: add; sum: add — each partial is self-mergeable, the same
    combiner algebra operators/skew.two_phase_agg enforces).  At 100 TB
    this is the difference between scanning a day and scanning three
    years: refresh cost is O(delta + |MV|), independent of history.

    Sums are carried as integer CENTS (round(value·100) → long) so
    snapshot+delta addition is associative-exact and hash-matches the
    oracle's single-pass sum regardless of float summation order.
    Fully oracle-backed (qz prefix: the 50 driver slots are taken).
    """
    ev = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    cut = F.lit(INCR_CUTOFF).cast("timestamp")

    def agg_slice(sl: DataFrame) -> DataFrame:
        return sl.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n"), F.sum(cents).alias("s")
        )

    snapshot = agg_slice(ev.where(F.col("ts") < cut)).withColumnsRenamed(
        {"n": "n0", "s": "s0"}
    )
    delta = agg_slice(ev.where(F.col("ts") >= cut)).withColumnsRenamed(
        {"n": "n1", "s": "s1"}
    )
    z = F.lit(0).cast("long")
    merged = snapshot.join(delta, "user_id", "full_outer")
    return merged.select(
        "user_id",
        (F.coalesce("n0", z) + F.coalesce("n1", z)).alias("n_events"),
        F.round(
            (F.coalesce("s0", z) + F.coalesce("s1", z)) / F.lit(100.0), 2
        ).alias("sum_value"),
    )


# ---------------------------------------------------------------------------
# qz17_snapshot_diff — table diff between two snapshot versions
# (round 7).  The inverse of qz17_cdc_merge: MERGE applies a changelog
# to produce a new snapshot; diff RECOVERS the changelog from two
# snapshots — the audit/reconciliation primitive ("what changed between
# yesterday's corpus and today's?") and the input a downstream
# incremental consumer needs when the producer ships full snapshots.
#
# The two versions derive DETERMINISTICALLY from the orders table so
# the oracle sees the identical inputs: v_old drops keys ≡ 0 (mod 97)
# (rows "not yet ingested"), v_new drops keys ≡ 3 (mod 89) (rows
# deleted since) and bumps o_totalprice by +1.0 for keys ≡ 0 (mod 13)
# (rows updated).  +1.0 on a double is exact, so changed-row detection
# is a bit-exact <> compare in both engines.
#
# Scale shape: ONE full outer join on the unique key — both sides
# shuffle-partitioned by o_orderkey (or co-located for free if the
# snapshots are bucketed/clustered by key in storage, the layout
# sources/bucketed.py ships); classification is per-row CASE logic.
# Unchanged rows (the overwhelming majority of any real diff) are
# dropped by the post-join filter, so the output carries only the
# actual changelog.
# ---------------------------------------------------------------------------

_SNAPSHOT_DIFF_ORACLE = """
    WITH v_old AS (
        SELECT o_orderkey AS key, o_totalprice AS price
        FROM orders WHERE o_orderkey % 97 <> 0
    ),
    v_new AS (
        SELECT o_orderkey AS key,
               CASE WHEN o_orderkey % 13 = 0 THEN o_totalprice + 1.0
                    ELSE o_totalprice END AS price
        FROM orders WHERE o_orderkey % 89 <> 3
    )
    SELECT coalesce(a.key, b.key) AS key,
           CASE WHEN a.key IS NULL THEN 'added'
                WHEN b.key IS NULL THEN 'removed'
                ELSE 'changed' END AS change,
           round(a.price, 2) AS old_price,
           round(b.price, 2) AS new_price
    FROM v_old a FULL OUTER JOIN v_new b ON a.key = b.key
    WHERE a.key IS NULL OR b.key IS NULL OR a.price <> b.price
"""


@query("qz17_snapshot_diff", oracle=_SNAPSHOT_DIFF_ORACLE)
def qz17_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diff two snapshot versions into an added/removed/changed
    changelog (header comment has the derivation and scale notes)."""
    orders = load_table(spark, sf_dir, "orders")
    v_old = orders.where(F.col("o_orderkey") % 97 != 0).select(
        F.col("o_orderkey").alias("key"), F.col("o_totalprice").alias("price")
    )
    v_new = orders.where(F.col("o_orderkey") % 89 != 3).select(
        F.col("o_orderkey").alias("key"),
        F.when(
            F.col("o_orderkey") % 13 == 0, F.col("o_totalprice") + F.lit(1.0)
        )
        .otherwise(F.col("o_totalprice"))
        .alias("price"),
    )
    a = v_old.select(F.col("key").alias("a_key"), F.col("price").alias("a_price"))
    b = v_new.select(F.col("key").alias("b_key"), F.col("price").alias("b_price"))
    joined = a.join(b, a["a_key"] == b["b_key"], "full_outer")
    return joined.where(
        F.col("a_key").isNull()
        | F.col("b_key").isNull()
        | (F.col("a_price") != F.col("b_price"))
    ).select(
        F.coalesce("a_key", "b_key").alias("key"),
        F.when(F.col("a_key").isNull(), "added")
        .when(F.col("b_key").isNull(), "removed")
        .otherwise("changed")
        .alias("change"),
        F.round("a_price", 2).alias("old_price"),
        F.round("b_price", 2).alias("new_price"),
    )


# ---------------------------------------------------------------------------
# qz26_bitmap_semijoin — semi-join reduction via a broadcast key bitmap
# (round 7).  THE classic distributed-join optimization the engine
# should demonstrate explicitly: when a huge fact table is semi-joined
# to a selective dim, first fold the dim's join keys into a fixed-size
# bit array (BITMAP_WORDS × 64 bits of xxhash64 positions — a Bloom
# filter with exactly one hash function), broadcast those few KB, and
# drop non-matching fact rows BEFORE any shuffle.  False positives are
# possible (hash collisions), false negatives are not — so the exact
# broadcast semi join that follows sees a pre-thinned probe side and
# the RESULT is exactly the plain semi join, which is what the oracle
# pins.  Spark's own runtime bloom-filter injection (plan-gated
# elsewhere) does this adaptively; this query is the explicit,
# composable form that also works where the optimizer declines
# (e.g. pre-shuffle thinning feeding a later wide join).
#
# 100 TB shape: the bitmap build is one map-side-combined aggregation
# over the DIM (≤ BITMAP_WORDS rows out), the probe-side filter is a
# broadcast hash join against ≤ 1024 rows plus pure codegen bit math —
# the fact table is never shuffled at all in this plan (both joins
# broadcast); at cluster scale the reduction applies before the
# shuffle of whatever wide operator consumes the surviving rows.
# ---------------------------------------------------------------------------

BITMAP_WORDS = 1024  # 65,536 bits; dim keys ≪ bits → low collision rate
TARGET_SEGMENT = "BUILDING"

_BITMAP_SEMI_ORACLE = f"""
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(sum(o_totalprice), 2) AS revenue
    FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer
                        WHERE c_mktsegment = '{TARGET_SEGMENT}')
    GROUP BY o_orderpriority
"""


@query("qz26_bitmap_semijoin", oracle=_BITMAP_SEMI_ORACLE)
def qz26_bitmap_semijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders by priority for customers in one market segment, computed
    through an explicit broadcast-bitmap semi-join reduction (header
    comment): dim keys → 64 KiB bit array → codegen pre-filter on the
    fact → exact broadcast semi join.  Oracle = the plain semi join
    (the bitmap pass admits a superset, the exact join removes every
    collision)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    dim = cust.where(F.col("c_mktsegment") == TARGET_SEGMENT).select("c_custkey")

    def positions(key):
        h = F.xxhash64(key)
        word = F.pmod(h, F.lit(BITMAP_WORDS)).cast("int")
        bit = F.pmod(F.shiftrightunsigned(h, 32), F.lit(64)).cast("int")
        return word, bit

    d_word, d_bit = positions(F.col("c_custkey"))
    # shiftleft by a COLUMN count needs the SQL form (the Python
    # wrapper only takes an int literal)
    one_shl_bit = F.expr("shiftleft(CAST(1 AS BIGINT), bit)")
    bitmap = (
        dim.select(d_word.alias("word"), d_bit.alias("bit"))
        .groupBy("word")
        .agg(F.bit_or(one_shl_bit).alias("mask"))
    )

    f_word, f_bit = positions(F.col("o_custkey"))
    thinned = (
        orders.withColumn("word", f_word)
        .withColumn("bit", f_bit)
        .join(F.broadcast(bitmap), "word")
        .where(F.col("mask").bitwiseAND(one_shl_bit) != 0)
    )
    exact = thinned.join(
        F.broadcast(dim), thinned["o_custkey"] == dim["c_custkey"], "left_semi"
    )
    return exact.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("revenue"),
    )


# ---------------------------------------------------------------------------
# qz16_band_join — numeric band self-join via bucket blocking
# (round 7).  "Find all pairs within ±δ on a numeric key" is the value-
# domain sibling of the temporal range join: naive is the n² cross
# product, the scalable form buckets the axis at width δ so any
# qualifying pair lands in the same or adjacent bucket.  One side is
# EXPANDED to (its bucket, its bucket+1); the equi-join on the bucket
# key then sees each unordered pair exactly once under the predicate
#   same bucket  → keep iff plain.key < expanded.key
#   adjacent     → keep iff expanded row came from the lower bucket
# (no post-hoc distinct, no double counting), and the exact |a−b| ≤ δ
# filter prunes bucket-mates outside the band.
#
# 100 TB shape: shuffle keys are bucket ids — candidate cells are
# bounded by the VALUE DENSITY at width δ, never by n² (with skewed
# density, salt the hot buckets exactly as q19_salted_join).  The 2×
# row expansion is the entire overhead.  Output size is the true band
# cardinality, an inherent property of the query, not the plan.
# ---------------------------------------------------------------------------

BAND_DELTA = 0.05  # price-match tolerance (same cents, ±5)

_BAND_ORACLE = f"""
    SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
           a.p_retailprice AS price_a, b.p_retailprice AS price_b,
           a.p_brand AS brand_a, b.p_brand AS brand_b
    FROM part a JOIN part b
      ON abs(a.p_retailprice - b.p_retailprice) <= {BAND_DELTA!r}
     AND a.p_partkey < b.p_partkey
     AND a.p_brand <> b.p_brand
"""


@query("qz16_band_join", oracle=_BAND_ORACLE)
def qz16_band_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-brand part pairs whose retail prices agree within ±δ
    (price-match audit), via δ-width bucket blocking (header comment
    has the exactly-once pair accounting)."""
    part = load_table(spark, sf_dir, "part")
    rows = part.select(
        F.col("p_partkey").alias("key"),
        F.col("p_retailprice").alias("price"),
        F.col("p_brand").alias("brand"),
        F.floor(F.col("p_retailprice") / F.lit(BAND_DELTA)).alias("bkt"),
    )
    plain = rows.select(
        F.col("key").alias("key_p"),
        F.col("price").alias("price_p"),
        F.col("brand").alias("brand_p"),
        F.col("bkt").alias("bkt_p"),
    )
    expanded = rows.select(
        "key",
        "price",
        "brand",
        F.col("bkt").alias("bkt_orig"),
        F.explode(F.array(F.col("bkt"), F.col("bkt") + 1)).alias("bkt_e"),
    )
    paired = plain.join(expanded, F.col("bkt_p") == F.col("bkt_e")).where(
        (
            (F.col("bkt_orig") == F.col("bkt_p"))
            & (F.col("key_p") < F.col("key"))
        )
        | (F.col("bkt_orig") < F.col("bkt_p"))
    )
    exact = paired.where(
        (F.abs(F.col("price_p") - F.col("price")) <= BAND_DELTA)
        & (F.col("brand_p") != F.col("brand"))
    )
    lo = F.least(
        F.struct("key_p", "price_p", "brand_p"),
        F.struct(
            F.col("key").alias("key_p"),
            F.col("price").alias("price_p"),
            F.col("brand").alias("brand_p"),
        ),
    )
    hi = F.greatest(
        F.struct("key_p", "price_p", "brand_p"),
        F.struct(
            F.col("key").alias("key_p"),
            F.col("price").alias("price_p"),
            F.col("brand").alias("brand_p"),
        ),
    )
    return exact.select(
        lo["key_p"].alias("key_a"),
        hi["key_p"].alias("key_b"),
        lo["price_p"].alias("price_a"),
        hi["price_p"].alias("price_b"),
        lo["brand_p"].alias("brand_a"),
        hi["brand_p"].alias("brand_b"),
    )


_ASOF_FWD_ORACLE = """
    WITH cand AS (
        SELECT e.event_id, e.user_id, o.o_orderkey, o.o_orderdate,
               row_number() OVER (
                   PARTITION BY e.event_id
                   ORDER BY o.o_orderdate ASC, o.o_orderkey ASC) AS rn
        FROM events e
        JOIN orders o ON o.o_custkey = e.user_id AND o.o_orderdate > e.ts
    )
    SELECT event_id, user_id, o_orderkey AS next_orderkey,
           o_orderdate AS next_orderdate
    FROM cand WHERE rn = 1
"""


@query("qz16_asof_forward", oracle=_ASOF_FWD_ORACLE)
def qz16_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join: the earliest order STRICTLY AFTER each event,
    per customer — the lead-time twin of q16_asof_join's lookback (what
    does this user buy next?).  Same union+window shape, mirrored:
    orders sort BEFORE events at equal time (strict > means a same-
    instant order is invisible), and ``first(..., ignorenulls)`` over
    (currentRow, unboundedFollowing) carries the NEXT order backward.
    One shuffle+sort of events∪orders per key; no pair explosion."""
    ev = load_table(spark, sf_dir, "events")
    orders = load_table(spark, sf_dir, "orders")
    o = orders.select(
        F.col("o_custkey").alias("key"),
        F.col("o_orderdate").alias("t"),
        F.lit(0).alias("side"),
        F.col("o_orderkey").alias("ord_key"),
        F.col("o_orderdate").alias("ord_date"),
        F.lit(None).cast("long").alias("event_id"),
    )
    e = ev.select(
        F.col("user_id").alias("key"),
        F.col("ts").alias("t"),
        F.lit(1).alias("side"),
        F.lit(None).cast("long").alias("ord_key"),
        F.lit(None).cast("timestamp").alias("ord_date"),
        "event_id",
    )
    w = (
        Window.partitionBy("key")
        .orderBy("t", "side", "ord_key")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    merged = o.unionByName(e).select(
        "key",
        "side",
        "event_id",
        F.first("ord_key", ignorenulls=True).over(w).alias("next_orderkey"),
        F.first("ord_date", ignorenulls=True).over(w).alias("next_orderdate"),
    )
    return merged.where(
        (F.col("side") == 1) & F.col("next_orderkey").isNotNull()
    ).select(
        "event_id",
        F.col("key").alias("user_id"),
        "next_orderkey",
        "next_orderdate",
    )
