"""Ordered-set aggregates (qz28_*) — the SQL-standard WITHIN GROUP
family (mode, percentile_disc) the registry's percentile tier didn't
cover: q9_percentiles is percentile_CONT (interpolating) and
qz9_approx_percentiles is the sketch tier; DISCRETE order statistics
(the value that actually occurs) and plurality mode are different
semantics with different determinism obligations.

Both engines compute them from the SAME explicit formulation instead of
their built-in ``mode()``/``quantile_disc()`` (whose tie-breaking is
implementation-defined): mode = (count DESC, value ASC) plurality;
percentile_disc(p) = the value at 1-based rank ⌈p·n⌉ of the sorted
multiset — well-defined under ties because every row inside a tie run
carries the same value.

Scale: the mode is two shrinking aggregations (group×bucket counts →
per-group argmax window).  The discrete quantiles need exact order
statistics, which means one sort per group (a single hash-partitioned
window; ~5 groups here).  At 100 TB you'd reach for qz9's KLL sketch
tier instead — this query IS the exact tier those sketches are gated
against, the same exact/approx twinning the dedup family uses.

Reference note: the reference bus has no aggregation layer at all
(frizzle.go:97-107, transform.go:8); this is §2.3 SQL-surface
completion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from frizzle_spark.plans.registry import query
from frizzle_spark.sources.tables import load_table


@query(
    "qz28_ordered_set_aggs",
    oracle="""
    WITH ev AS (
      SELECT event_type, value, round(value, 1) AS bucket
      FROM events WHERE value IS NOT NULL
    ),
    bcnt AS (
      SELECT event_type, bucket, count(*) AS cnt
      FROM ev GROUP BY 1, 2
    ),
    mode_pick AS (
      SELECT event_type, bucket AS mode_1dp
      FROM (
        SELECT event_type, bucket,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY cnt DESC, bucket ASC) AS rn
        FROM bcnt
      ) WHERE rn = 1
    ),
    ranked AS (
      SELECT event_type, value,
             row_number() OVER (PARTITION BY event_type ORDER BY value) AS rn,
             count(*)     OVER (PARTITION BY event_type) AS n
      FROM ev
    ),
    quant AS (
      SELECT event_type,
             max(n) AS n,
             max(CASE WHEN rn = CAST(ceil(0.25 * n) AS BIGINT) THEN value END) AS p25_disc,
             max(CASE WHEN rn = CAST(ceil(0.50 * n) AS BIGINT) THEN value END) AS median_disc,
             max(CASE WHEN rn = CAST(ceil(0.75 * n) AS BIGINT) THEN value END) AS p75_disc,
             max(CASE WHEN rn = CAST(ceil(0.90 * n) AS BIGINT) THEN value END) AS p90_disc
      FROM ranked GROUP BY event_type
    )
    SELECT q.event_type, q.n, m.mode_1dp,
           q.p25_disc, q.median_disc, q.p75_disc, q.p90_disc
    FROM quant q JOIN mode_pick m ON m.event_type = q.event_type
    """,
)
def qz28_ordered_set_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type ordered-set aggregates: deterministic plurality
    mode of the 1-dp bucket and exact discrete percentiles (25/50/75/90)
    — the value at 1-based rank ⌈p·n⌉.  Every number is a value that
    actually occurs in the data (the WITHIN GROUP contract percentile_
    cont breaks)."""
    ev = (
        load_table(spark, sf_dir, "events")
        .where(F.col("value").isNotNull())
        .select("event_type", "value", F.round("value", 1).alias("bucket"))
    )
    bcnt = ev.groupBy("event_type", "bucket").agg(F.count(F.lit(1)).alias("cnt"))
    w_mode = Window.partitionBy("event_type").orderBy(
        F.desc("cnt"), F.asc("bucket")
    )
    mode_pick = (
        bcnt.withColumn("rn", F.row_number().over(w_mode))
        .where(F.col("rn") == 1)
        .select(
            F.col("event_type").alias("m_type"), F.col("bucket").alias("mode_1dp")
        )
    )
    w_rank = Window.partitionBy("event_type").orderBy("value")
    w_all = Window.partitionBy("event_type")
    ranked = ev.select(
        "event_type",
        "value",
        F.row_number().over(w_rank).alias("rn"),
        F.count(F.lit(1)).over(w_all).alias("n"),
    )

    def _at(p: float):
        idx = F.ceil(F.lit(p) * F.col("n")).cast("long")
        return F.max(F.when(F.col("rn") == idx, F.col("value")))

    quant = ranked.groupBy("event_type").agg(
        F.max("n").alias("n"),
        _at(0.25).alias("p25_disc"),
        _at(0.50).alias("median_disc"),
        _at(0.75).alias("p75_disc"),
        _at(0.90).alias("p90_disc"),
    )
    return quant.join(
        F.broadcast(mode_pick), quant["event_type"] == mode_pick["m_type"]
    ).select(
        "event_type", "n", "mode_1dp", "p25_disc", "median_disc", "p75_disc", "p90_disc"
    )


# ---------------------------------------------------------------------------
# Exact discrete quantiles WITHOUT a per-group sort — the scale path
# qz28_ordered_set_aggs' docstring promises.  Three shrinking passes:
#
#   1. per-group (min, max, n)            — one partial-agg shuffle
#   2. per-group 1024-bin histogram       — one partial-agg shuffle of
#      ≤ groups×1024 rows; the driver locates, for each target rank
#      ⌈p·n⌉, the bin whose cumulative count crosses it (a constant-size
#      collect: groups × bins longs) and the rank REMAINDER inside it
#   3. rows in the selected bins only (a broadcast semi-join — at most
#      groups×4 bins survive, i.e. ~n/256 of the corpus at uniform
#      spread) get ONE narrow window sort; the row at the local
#      remainder rank is the exact global order statistic.
#
# Equal values can straddle a bin boundary only at the bin EDGE, where
# the selected value is by construction the same on either side, so the
# result is exactly the ⌈p·n⌉-th order statistic — the oracle is the
# same explicit formulation qz28 uses, which pins the claim.
#
# 100 TB: pass-3 input shrinks ~256× vs the full corpus (and the sort
# is per selected bin, bounded by the densest bin, salvageable by
# re-binning recursively if a single bin degenerates); compare the
# window-sort tier, which sorts EVERYTHING per group.  Degenerate
# min==max groups short-circuit: every quantile is that value.
# ---------------------------------------------------------------------------

_QUANTILE_BINS = 1024


@query(
    "qz28_quantile_2pass",
    oracle="""
    WITH ev AS (
      SELECT event_type, value FROM events WHERE value IS NOT NULL
    ),
    ranked AS (
      SELECT event_type, value,
             row_number() OVER (PARTITION BY event_type ORDER BY value) AS rn,
             count(*)     OVER (PARTITION BY event_type) AS n
      FROM ev
    )
    SELECT event_type,
           max(n) AS n,
           max(CASE WHEN rn = CAST(ceil(0.25 * n) AS BIGINT) THEN value END) AS p25_disc,
           max(CASE WHEN rn = CAST(ceil(0.50 * n) AS BIGINT) THEN value END) AS median_disc,
           max(CASE WHEN rn = CAST(ceil(0.75 * n) AS BIGINT) THEN value END) AS p75_disc,
           max(CASE WHEN rn = CAST(ceil(0.90 * n) AS BIGINT) THEN value END) AS p90_disc
    FROM ranked GROUP BY event_type
    """,
)
def qz28_quantile_2pass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact discrete percentiles (25/50/75/90) per event_type via
    histogram + selective-bin selection — identical OUTPUT to the
    window-sort formulation (same oracle), radically different plan:
    no per-group corpus sort ever happens; see header comment."""
    import math as _math

    ps = (0.25, 0.50, 0.75, 0.90)
    ev = (
        load_table(spark, sf_dir, "events")
        .where(F.col("value").isNotNull())
        .select("event_type", "value")
    )
    # pass 1: per-group stats (tiny)
    stats = {
        r["event_type"]: (r["mn"], r["mx"], r["n"])
        for r in ev.groupBy("event_type")
        .agg(
            F.min("value").alias("mn"),
            F.max("value").alias("mx"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    }
    if not stats:
        return spark.createDataFrame(
            [],
            "event_type string, n bigint, p25_disc double, median_disc double, "
            "p75_disc double, p90_disc double",
        )
    # degenerate groups (min==max) resolve immediately
    done = {
        g: (n, [mn] * len(ps)) for g, (mn, mx, n) in stats.items() if mn == mx
    }
    live = {g: v for g, v in stats.items() if g not in done}
    out_rows = [
        (g, n, *vals) for g, (n, vals) in done.items()
    ]
    if live:
        b = _QUANTILE_BINS
        # bin width per group rides in a broadcast join (groups rows)
        spec = spark.createDataFrame(
            [(g, mn, (mx - mn) / b) for g, (mn, mx, _n) in live.items()],
            "event_type string, mn double, w double",
        )
        binned = ev.join(F.broadcast(spec), "event_type").select(
            "event_type",
            "value",
            F.least(
                F.floor((F.col("value") - F.col("mn")) / F.col("w")).cast("long"),
                F.lit(b - 1),
            ).alias("bin"),
        )
        # pass 2: histogram (≤ groups×bins rows), cumulated on the driver
        hist: dict[str, list[int]] = {g: [0] * b for g in live}
        for r in binned.groupBy("event_type", "bin").count().collect():
            hist[r["event_type"]][r["bin"]] = r["count"]
        # locate (bin, local rank) for each target global rank
        targets = []  # (group, bin, local_rank, p_index)
        for g, (_mn, _mx, n) in live.items():
            cum = 0
            want = [(int(_math.ceil(p * n)), i) for i, p in enumerate(ps)]
            wi = 0
            for bi, cnt in enumerate(hist[g]):
                while wi < len(want) and want[wi][0] <= cum + cnt:
                    targets.append((g, bi, want[wi][0] - cum, want[wi][1]))
                    wi += 1
                cum += cnt
                if wi == len(want):
                    break
        tsel = spark.createDataFrame(
            targets, "event_type string, bin long, local_rank long, p_index long"
        )
        # pass 3: only rows in selected bins sort (narrow window), and the
        # local_rank-th row inside its (group, bin) is the order statistic
        w_local = Window.partitionBy("event_type", "bin").orderBy("value")
        picked = (
            binned.join(
                F.broadcast(tsel.select("event_type", "bin").distinct()),
                ["event_type", "bin"],
            )
            .withColumn("rn", F.row_number().over(w_local))
            .join(
                F.broadcast(tsel),
                ["event_type", "bin"],
            )
            .where(F.col("rn") == F.col("local_rank"))
            .select("event_type", "p_index", "value")
        )
        got: dict[str, dict[int, float]] = {}
        for r in picked.collect():
            got.setdefault(r["event_type"], {})[r["p_index"]] = r["value"]
        for g, (_mn, _mx, n) in live.items():
            vals = [got[g][i] for i in range(len(ps))]
            out_rows.append((g, n, *vals))
    return spark.createDataFrame(
        out_rows,
        "event_type string, n bigint, p25_disc double, median_disc double, "
        "p75_disc double, p90_disc double",
    )
