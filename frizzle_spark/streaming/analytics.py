"""Streaming analytics over the bus: watermarks, event-time windows,
streaming dedup, and a custom stateful operator.

The reference carries ``Timestamp()`` per message but never consumes it
(reference msg.go:19) and its only state is the un-acked map
(common/unacked.go:10-59).  These are committed extensions (SURVEY.md
§2.2 streaming rows), built on the engine's native state store:

* ``windowed_aggregate``  — watermarked tumbling/sliding window agg; the
  watermark bounds state so window state is evicted once event time
  passes window_end + delay (the 100 TB state-growth guard).
* ``streaming_dedup``     — ``dropDuplicatesWithinWatermark`` across
  micro-batches: exact dedup within the watermark horizon, key state
  evicted past it (duplicates farther apart than the horizon are NOT
  collapsed — size it to the real duplicate spread).
* ``running_counts``      — custom per-key stateful operator via
  ``applyInPandasWithState`` (the escape hatch for semantics the
  built-ins lack; state round-trips through Arrow).

Each has a batch-equivalent assertion in tests/test_streaming_analytics:
replayed-stream results must equal the batch computation — the
streaming/batch consistency Structured Streaming promises and the
DuckDB oracles check for the batch halves.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def windowed_aggregate(
    stream: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "10 minutes",
    group_cols: tuple[str, ...] = ("event_type",),
) -> DataFrame:
    """Watermarked event-time window aggregation (count + sum(value))."""
    win = F.window(ts_col, window, slide) if slide else F.window(ts_col, window)
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(win.alias("w"), *group_cols)
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.col("w.start").alias("w_start"),
            F.col("w.end").alias("w_end"),
            *group_cols,
            "n_events",
            "sum_value",
        )
    )


def session_aggregate(
    stream: DataFrame,
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "0 seconds",
    group_cols: tuple[str, ...] = ("user_id", "event_type"),
) -> DataFrame:
    """Watermarked session-window aggregation (inactivity-gap sessions).

    Append-mode contract: a session is emitted only once the watermark
    passes its end (last event + gap) — sessions still open at the final
    watermark stay in state.  That is exactly the bounded-state behavior
    wanted at scale: state per key is one open session, closed sessions
    leave the store.  The batch equivalent (plans/windows.py
    q10_session_windows) emits ALL sessions; tests assert the streaming
    result equals the batch result restricted to closed sessions.
    """
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("w"), *group_cols)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            *group_cols,
            "n_events",
            "sum_value",
        )
    )


def streaming_dedup(
    stream: DataFrame, keys: list[str], ts_col: str = "ts", watermark: str = "1 hour"
) -> DataFrame:
    """Streaming dedup on content keys: first arrival wins; per-key state
    is evicted once the watermark passes event_time + horizon, so state
    is bounded by keys-within-horizon at any scale.

    Uses ``dropDuplicatesWithinWatermark``, NOT ``dropDuplicates``: the
    plain variant only bounds state when the event-time column is part
    of the dedup keys — on content keys (the normal case) its state
    grows with stream length forever, the scale trap this helper exists
    to avoid.  The trade: duplicates farther apart in event time than
    the horizon are not collapsed — size ``watermark`` to the real
    duplicate spread (e.g. the upstream redelivery window), never to
    stream length.
    """
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)


def running_counts(stream: DataFrame, key_col: str = "user_id") -> DataFrame:
    """Custom stateful operator: running event count + value sum per key,
    emitted per micro-batch (update semantics) via applyInPandasWithState."""

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"key": [key[0]], "n_events": [n], "sum_value": [round(total, 2)]}
        )

    return stream.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType="key long, n_events long, sum_value double",
        stateStructType="n long, total double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    left_ts: str = "l_ts",
    right_ts: str = "r_ts",
    upper: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream inner join: right events within (left_ts, left_ts +
    ``upper``] for the same key — the streaming twin of the batch range
    join (plans/joins_extra.q16_range_join's click→purchase funnel).

    Both sides carry watermarks and the join condition bounds event time
    in BOTH directions; that pair is what lets the state store evict a
    buffered row once the other side's watermark passes its join window
    — without the time bound, stream-stream join state grows forever
    (the 100 TB kill switch).  Shuffle shape: both streams hash-shuffle
    on the equi-key once; per-key state is bounded by the interval
    length × per-key rate.
    """
    l = left.withWatermark(left_ts, watermark)
    r = right.withWatermark(right_ts, watermark)
    cond = (
        (l[key] == r[key])
        & (r[right_ts] > l[left_ts])
        & (r[right_ts] <= l[left_ts] + F.expr(f"INTERVAL {upper}"))
    )
    return l.join(r, cond, "inner")


def running_counts_tws(stream: DataFrame, key_col: str = "user_id") -> DataFrame:
    """The same running (count, sum) state machine as
    :func:`running_counts`, on Spark 4's ``transformWithStateInPandas``
    — the successor stateful API (SPARK-49564 "state v2"): named state
    variables (value/list/map) instead of one opaque tuple, optional
    per-state TTL, event/processing-time timers, and a RocksDB-backed
    store.  Keeping both operators pins that the engine's custom-state
    surface survives the API migration with identical semantics (the
    pytest gate runs them against the same replay and the same batch
    GROUP BY oracle).

    Requires the RocksDB state-store provider — the caller scopes
    ``spark.sql.streaming.stateStore.providerClass`` for the query (the
    HDFS-backed default store does not support state v2).
    """
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class _RunningCounts(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState("totals", "n long, total double")

        def handleInputRows(self, key, rows, timerValues):  # noqa: ANN001
            prev = self._totals.get() if self._totals.exists() else None
            n, total = prev if prev is not None else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._totals.update((n, total))
            yield pd.DataFrame(
                {"key": [key[0]], "n_events": [n], "sum_value": [round(total, 2)]}
            )

        def close(self) -> None:
            pass

    return stream.groupBy(key_col).transformWithStateInPandas(
        statefulProcessor=_RunningCounts(),
        outputStructType="key long, n_events long, sum_value double",
        outputMode="Update",
        timeMode="None",
    )


def cusum_monitor(
    stream: DataFrame,
    params: dict[str, tuple[float, float]],
    slack_sds: float,
    alarm_sds: float,
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Streaming two-sided CUSUM (plans/sql_surface.qz23_cusum's
    stateful twin): per event type, fold daily volumes through the
    LITERAL clamped recursion

        S⁺ ← max(0, S⁺ + (x − μ − κ));  S⁻ ← max(0, S⁻ − (x − μ + κ))

    inside ``applyInPandasWithState``, carrying (s_up, s_dn, n_alarms)
    across micro-batches.  The batch query computes the SAME statistic
    through the prefix-scan closed form; tests/test_properties.py pins
    the algebraic identity, and the registry oracle pins this stream
    against DuckDB's closed form end-to-end — recursion and rewrite
    checking each other.

    ``params``: type → (μ, σ) REFERENCE baseline (in production, fit on
    a historical window; the registry query fits it on the replayed
    corpus so the oracle can reproduce it).  κ = slack_sds·σ, alarm at
    S > alarm_sds·σ.

    Exactness caveat: each day's count must land in ONE micro-batch
    (availableNow replay = one batch; live = day-aligned triggers or an
    upstream daily aggregate) — a day split across batches would enter
    the recursion twice.  State per type: two floats + a long, the
    smallest state in the module.
    """

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        etype = key[0]
        mu, sd = params.get(etype, (0.0, 0.0))
        kappa, h = slack_sds * sd, alarm_sds * sd
        s_up, s_dn, n_alarms = (
            state.get if state.exists else (0.0, 0.0, 0)
        )
        days: dict = {}
        for pdf in pdfs:
            for d, n in pdf.groupby("day").size().items():
                days[d] = days.get(d, 0) + int(n)
        for d in sorted(days):
            x = float(days[d])
            s_up = max(0.0, s_up + (x - mu - kappa))
            s_dn = max(0.0, s_dn - (x - mu + kappa))
            if s_up > h or s_dn > h:
                n_alarms += 1
        state.update((s_up, s_dn, n_alarms))
        yield pd.DataFrame(
            {
                "event_type": [etype],
                "final_up": [round(s_up, 6)],
                "final_dn": [round(s_dn, 6)],
                "n_alarms": [n_alarms],
            }
        )

    daily = stream.select(
        F.col(type_col).alias("event_type"),
        F.date_trunc("day", F.col(ts_col)).alias("day"),
    )
    return daily.groupBy("event_type").applyInPandasWithState(
        update,
        outputStructType=(
            "event_type string, final_up double, final_dn double,"
            " n_alarms long"
        ),
        stateStructType="s_up double, s_dn double, n_alarms long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def last_touch_attribution(
    stream: DataFrame, lookback_days: int = 7
) -> DataFrame:
    """Streaming last-touch attribution: per-user state machine via
    ``applyInPandasWithState`` that remembers the most recent click/view
    and credits every purchase to it (within the lookback) the moment
    the purchase arrives — the real-time form of qz10_attribution's
    last-touch model.

    State per user: (last-touch epoch-µs, type, event_id) — three
    scalars, evicted never (a TTL timeout would bound it in production;
    the replay corpus has ~20 events/user so the state table is tiny).

    Within a micro-batch a user's rows arrive unordered, so the walk
    sorts by (ts, is_purchase, event_id): touches at a timestamp apply
    BEFORE purchases at the same timestamp (matching the batch model's
    inclusive t_ts <= p_ts), and ascending event_id leaves the
    max-event_id touch in state for equal timestamps (matching the
    batch (t_ts DESC, t_id DESC) argmax).  Across batches the state
    carries forward, so time-ordered replay splits emit identical
    credits — pinned by the multi-batch equivalence test.
    """
    lb_us = lookback_days * 86_400_000_000

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        t_us, t_type, t_id = (
            state.get if state.exists else (None, None, None)
        )
        out_id, out_type, out_val = [], [], []
        for pdf in pdfs:
            if not len(pdf):
                continue
            pdf = pdf.assign(
                us=pdf["ts"].astype("int64") // 1000,
                is_p=(pdf["event_type"] == "purchase").astype("int8"),
            ).sort_values(["us", "is_p", "event_id"], kind="mergesort")
            for us, etype, eid, val in zip(
                pdf["us"].to_numpy(),
                pdf["event_type"].to_numpy(),
                pdf["event_id"].to_numpy(),
                pdf["value"].to_numpy(),
            ):
                if etype == "purchase":
                    if t_us is not None and t_us >= us - lb_us:
                        out_type.append(t_type)
                    else:
                        out_type.append("(none)")
                    out_id.append(int(eid))
                    out_val.append(round(float(val), 2))
                else:  # click / view
                    t_us, t_type, t_id = int(us), str(etype), int(eid)
        if t_us is not None:
            state.update((t_us, t_type, t_id))
        yield pd.DataFrame(
            {"p_id": out_id, "touch_type": out_type, "p_value": out_val}
        )

    return (
        stream.where(F.col("event_type").isin("click", "view", "purchase"))
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType="p_id long, touch_type string, p_value double",
            stateStructType="t_us long, t_type string, t_id long",
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


FUNNEL_STAGES = ("signup", "view", "click", "purchase")


def funnel_progress(stream: DataFrame) -> DataFrame:
    """Streaming funnel stage tracking: per-user state machine that
    advances through signup → view → click → purchase, each stage
    requiring an event STRICTLY after the previous stage's completion
    time — the real-time twin of qz10_funnel's batch chain.

    State per user: (stage, completion epoch-µs) — two scalars.  The
    in-batch walk sorts by (ts, event_id); the strict > rule makes the
    result independent of the order equal-timestamp events are walked
    in (a same-ts next-stage event never qualifies), so the single
    drain reproduces the batch min-ts chain exactly and multi-batch
    replays land in the same states.
    """

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        stage, t_prev = state.get if state.exists else (0, -1)
        for pdf in pdfs:
            if not len(pdf):
                continue
            pdf = pdf.assign(us=pdf["ts"].astype("int64") // 1000).sort_values(
                ["us", "event_id"], kind="mergesort"
            )
            for us, etype in zip(
                pdf["us"].to_numpy(), pdf["event_type"].to_numpy()
            ):
                if (
                    stage < len(FUNNEL_STAGES)
                    and etype == FUNNEL_STAGES[stage]
                    and us > t_prev
                ):
                    stage += 1
                    t_prev = int(us)
        state.update((stage, t_prev))
        yield pd.DataFrame({"user_id": [key[0]], "stage": [stage]})

    return (
        stream.where(F.col("event_type").isin(*FUNNEL_STAGES))
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType="user_id long, stage long",
            stateStructType="stage long, t_prev long",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
