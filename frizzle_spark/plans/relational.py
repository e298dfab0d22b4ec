"""Batch relational core — the committed analytics inventory (SURVEY.md §2.2/§2.3).

The reference implements NO relational operators (no joins, aggregations,
windows, sorts or set ops exist anywhere in /root/reference — its
transforms are opaque ``func(Msg) Msg``, reference transform.go:8).  This
module is the engine's committed relational layer, built exclusively from
declarative DataFrame primitives so Catalyst supplies pushdown, pruning,
join selection, partial aggregation and AQE for free.

Determinism contract with the DuckDB oracle: every floating aggregate is
rounded in BOTH engines (money 2 dp, ratios/averages 6 dp) and every
computed column carries the same alias on both sides, so the driver's
order-insensitive value hash matches bit-for-bit.

Scale notes are on each query: which side broadcasts, where the shuffles
are, and why the plan survives 1000×.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from frizzle_spark.plans.registry import query
from frizzle_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# Q1 — pricing summary (filter → groupBy agg).  TPC-H Q1 shape.
# Scale: single shuffle on the 2-value group key; Catalyst plans
# partial (map-side) aggregation so the shuffle carries ~|groups|×tasks
# rows, not the fact table.  The l_shipdate predicate reaches the parquet
# scan as a pushed filter; only 8 of 11 columns are read.
# --------------------------------------------------------------------------
@query(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                     AS sum_qty,
           round(sum(l_extendedprice), 2)                                AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)             AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           round(avg(l_quantity), 6)                                     AS avg_qty,
           round(avg(l_extendedprice), 6)                                AS avg_price,
           round(avg(l_discount), 6)                                     AS avg_disc,
           count(*)                                                      AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped pricing summary over lineitem (agg: sum/avg/count)."""
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(charge), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )
