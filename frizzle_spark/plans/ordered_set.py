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
