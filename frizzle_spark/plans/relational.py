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


def _revenue():
    # Column objects need a live SparkContext, so build lazily per call.
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


# --------------------------------------------------------------------------
# Q2 — star-join chain: region ⋈ nation ⋈ customer ⋈ orders ⋈ lineitem.
# Scale: the two fact tables (lineitem, orders) hash-join on o_orderkey —
# the single unavoidable big shuffle.  customer/nation/region are
# broadcast (explicit hint for nation/region; AQE converts customer when
# its filtered size is below threshold), so no shuffle fans out of the
# dimension side.  Filter on o_orderdate prunes orders before the join.
# --------------------------------------------------------------------------
@query(
    "q2_revenue_by_nation",
    oracle="""
    SELECT n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           count(*) AS n_items
    FROM region
    JOIN nation   ON n_regionkey = r_regionkey
    JOIN customer ON c_nationkey = n_nationkey
    JOIN orders   ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n_name
    """,
)
def q2_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-way inner equi-join with broadcast dims; revenue per nation."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    dims = (
        cust.join(
            F.broadcast(nation), cust.c_nationkey == nation.n_nationkey
        ).join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(dims), orders.o_custkey == dims.c_custkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum(_revenue()), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# --------------------------------------------------------------------------
# Q3 — top-k: highest-revenue orders.  groupBy on o_orderkey shuffles the
# joined fact rows once; the ORDER BY ... LIMIT 10 is a TakeOrdered
# physical op — each task keeps a 10-row heap, the driver merges heaps;
# no global sort is materialized at any scale.
# --------------------------------------------------------------------------
@query(
    "q3_top_orders",
    oracle="""
    SELECT o_orderkey, o_orderdate, c_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer
    JOIN orders   ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    GROUP BY o_orderkey, o_orderdate, c_name
    ORDER BY revenue DESC, o_orderkey ASC
    LIMIT 10
    """,
)
def q3_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join + aggregate + deterministic top-k (ties broken on o_orderkey)."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("o_orderkey", "o_orderdate", "c_name")
        .agg(F.round(F.sum(_revenue()), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


# --------------------------------------------------------------------------
# Q4 — left-semi / left-anti.  Both halves are one shuffle-free pass when
# orders' key set broadcasts (AQE decides); at 100 TB the semi/anti join
# shuffles only the distinct o_custkey side, never order payloads.
# --------------------------------------------------------------------------
@query(
    "q4_semi_anti",
    oracle="""
    SELECT c_custkey,
           c_custkey IN (SELECT o_custkey FROM orders) AS has_order
    FROM customer
    """,
)
def q4_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with ≥1 order (semi) and with none (anti), tagged."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    semi = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi")
        .select("c_custkey")
        .withColumn("has_order", F.lit(True))
    )
    anti = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey")
        .withColumn("has_order", F.lit(False))
    )
    return semi.unionByName(anti)


# --------------------------------------------------------------------------
# Q5 — window functions: per-customer ranking + running revenue.
# Scale: ONE shuffle on o_custkey serves all four window functions (same
# partition spec); the running sum is frame-sequential so no second pass.
# Skewed customers are bounded by orders-per-customer, not table size.
# --------------------------------------------------------------------------
@query(
    "q5_customer_order_windows",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice,
           row_number() OVER w AS rn,
           rank()       OVER w AS rnk,
           lag(o_totalprice) OVER w AS prev_price,
           round(sum(o_totalprice) OVER (PARTITION BY o_custkey
                 ORDER BY o_totalprice DESC, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    """,
)
def q5_customer_order_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number / rank / lag / running sum over one window spec."""
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.row_number().over(w).cast("long").alias("rn"),
        F.rank().over(w).cast("long").alias("rnk"),
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.round(
            F.sum("o_totalprice").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
            2,
        ).alias("running_spend"),
    )


# --------------------------------------------------------------------------
# Q6 — set operations over two market-segment key sets.  Spark plans
# intersect/except as aggregate-style joins on the key — each is one
# shuffle over distinct keys only (narrow: a single int column at scale).
# --------------------------------------------------------------------------
@query(
    "q6_segment_set_ops",
    oracle="""
    WITH b AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
         m AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY')
    SELECT 'union' AS op, c_custkey FROM (SELECT c_custkey FROM b UNION SELECT c_custkey FROM m)
    UNION ALL
    SELECT 'intersect' AS op, c_custkey FROM (SELECT c_custkey FROM b INTERSECT SELECT c_custkey FROM m)
    UNION ALL
    SELECT 'except' AS op, c_custkey FROM (SELECT c_custkey FROM b EXCEPT SELECT c_custkey FROM m)
    """,
)
def q6_segment_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """union-distinct / intersect / except of two filtered key sets."""
    cust = _t(spark, sf_dir, "customer")
    b = cust.where(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    m = cust.where(F.col("c_mktsegment") == "MACHINERY").select("c_custkey")
    tag = lambda df, op: df.select(F.lit(op).alias("op"), "c_custkey")  # noqa: E731
    return (
        tag(b.union(m).distinct(), "union")
        .unionByName(tag(b.intersect(m), "intersect"))
        .unionByName(tag(b.exceptAll(m).distinct(), "except"))
    )


@query(
    "q6_multiset_ops",
    oracle="""
    WITH o AS (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'),
         f AS (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
    SELECT 'except_all' AS op, o_custkey
    FROM (SELECT o_custkey FROM o EXCEPT ALL SELECT o_custkey FROM f)
    UNION ALL
    SELECT 'intersect_all' AS op, o_custkey
    FROM (SELECT o_custkey FROM o INTERSECT ALL SELECT o_custkey FROM f)
    """,
)
def q6_multiset_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics set ops (EXCEPT ALL / INTERSECT ALL) over key
    multisets that genuinely contain duplicates (customers place many
    orders).  Completes the §2.2 set-ops row beside q6's distinct
    variants; Catalyst plans both as a single hash aggregate counting
    per-key multiplicities — one shuffle, no join explosion.
    """
    orders = _t(spark, sf_dir, "orders")
    o = orders.where(F.col("o_orderstatus") == "O").select("o_custkey")
    fch = orders.where(F.col("o_orderstatus") == "F").select("o_custkey")
    tag = lambda df, op: df.select(F.lit(op).alias("op"), "o_custkey")  # noqa: E731
    return tag(o.exceptAll(fch), "except_all").unionByName(
        tag(o.intersectAll(fch), "intersect_all")
    )


# --------------------------------------------------------------------------
# Q7 — grouping sets: ROLLUP and CUBE over the region→nation hierarchy.
# Catalyst expands grouping sets into a single Expand + one aggregate —
# one shuffle regardless of how many grouping sets, which is why we use
# the built-in rather than unioning per-level aggregates.
# --------------------------------------------------------------------------
@query(
    "q7_rollup",
    oracle="""
    SELECT r_name, n_name,
           CAST(grouping(r_name, n_name) AS BIGINT) AS gid,
           round(sum(c_acctbal), 2) AS total_bal,
           count(*) AS n_cust
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
)
def q7_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over (region, nation) with grouping id + agg."""
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    joined = cust.join(
        F.broadcast(nation), cust.c_nationkey == nation.n_nationkey
    ).join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    return joined.rollup("r_name", "n_name").agg(
        F.grouping_id().alias("gid"),
        F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
        F.count(F.lit(1)).alias("n_cust"),
    )


@query(
    "q7_cube",
    oracle="""
    SELECT r_name, c_mktsegment,
           CAST(grouping(r_name, c_mktsegment) AS BIGINT) AS gid,
           round(sum(c_acctbal), 2) AS total_bal,
           count(*) AS n_cust
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY CUBE (r_name, c_mktsegment)
    """,
)
def q7_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (region, market segment) with grouping id + agg."""
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    joined = cust.join(
        F.broadcast(nation), cust.c_nationkey == nation.n_nationkey
    ).join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    return joined.cube("r_name", "c_mktsegment").agg(
        F.grouping_id().alias("gid"),
        F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
        F.count(F.lit(1)).alias("n_cust"),
    )


# --------------------------------------------------------------------------
# Q8 — scalar-function battery.  Pure narrow projection: no shuffle at
# all; every expression is JVM-side inside one WholeStageCodegen span.
# Two flavors: string/math over part, date/time over orders.
# --------------------------------------------------------------------------
@query(
    "q8_scalar_string_math",
    oracle="""
    SELECT p_partkey,
           concat(p_brand, '#', p_type)            AS brand_type,
           upper(p_name)                           AS name_upper,
           substring(p_name, 1, 8)                 AS name_prefix,
           CAST(length(p_name) AS BIGINT)          AS name_len,
           regexp_extract(p_name, '^([a-z]+)', 1)  AS first_word,
           contains(p_type, 'ECO')                 AS is_eco,
           round(p_retailprice * 1.1, 2)           AS bumped_price,
           CAST(abs(p_size - 25) AS BIGINT)        AS size_dist,
           round(ln(p_retailprice), 6)             AS log_price
    FROM part
    WHERE p_name LIKE '%e%' AND p_size BETWEEN 1 AND 50
    """,
)
def q8_scalar_string_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String/regex/math scalar functions with LIKE + BETWEEN predicates."""
    part = _t(spark, sf_dir, "part")
    return (
        part.where(F.col("p_name").like("%e%") & F.col("p_size").between(1, 50))
        .select(
            "p_partkey",
            F.concat_ws("#", "p_brand", "p_type").alias("brand_type"),
            F.upper("p_name").alias("name_upper"),
            F.substring("p_name", 1, 8).alias("name_prefix"),
            F.length("p_name").cast("long").alias("name_len"),
            F.regexp_extract("p_name", r"^([a-z]+)", 1).alias("first_word"),
            F.col("p_type").contains("ECO").alias("is_eco"),
            F.round(F.col("p_retailprice") * 1.1, 2).alias("bumped_price"),
            F.abs(F.col("p_size") - 25).cast("long").alias("size_dist"),
            F.round(F.log(F.col("p_retailprice")), 6).alias("log_price"),
        )
    )


@query(
    "q8_scalar_datetime",
    oracle="""
    SELECT o_orderkey,
           date_trunc('month', o_orderdate)                          AS order_month,
           CAST(extract(year FROM o_orderdate) AS BIGINT)            AS order_year,
           CAST(extract(month FROM o_orderdate) AS BIGINT)           AS order_mon,
           CAST(extract(day FROM o_orderdate) AS BIGINT)             AS order_day,
           CAST(date_diff('day', TIMESTAMP '1995-01-01 00:00:00',
                          o_orderdate) AS BIGINT)                    AS days_since_epoch_start,
           CAST(o_orderdate + INTERVAL 90 DAY AS TIMESTAMP)          AS due_date,
           substring(o_orderpriority, 1, 1)                          AS priority_code
    FROM orders
    WHERE o_orderstatus = 'F'
    """,
)
def q8_scalar_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time scalar functions: trunc, extract, diff, interval add."""
    orders = _t(spark, sf_dir, "orders")
    return orders.where(F.col("o_orderstatus") == "F").select(
        "o_orderkey",
        F.date_trunc("month", "o_orderdate").alias("order_month"),
        F.year("o_orderdate").cast("long").alias("order_year"),
        F.month("o_orderdate").cast("long").alias("order_mon"),
        F.dayofmonth("o_orderdate").cast("long").alias("order_day"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp"))
        .cast("long")
        .alias("days_since_epoch_start"),
        (F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")).alias("due_date"),
        F.substring("o_orderpriority", 1, 1).alias("priority_code"),
    )


# --------------------------------------------------------------------------
# Q9 — exact distinct counting.  countDistinct plans as a two-phase
# aggregate (partial distinct per partition, then merge) — the shuffle
# carries distinct keys only.  The HLL variant (approx_count_distinct)
# is registered separately without an oracle because DuckDB's sketch
# differs; it is tolerance-tested in tests/test_relational.py.
# --------------------------------------------------------------------------
@query(
    "q9_distinct",
    oracle="""
    SELECT o_orderstatus,
           count(DISTINCT o_custkey)      AS n_customers,
           count(DISTINCT o_orderpriority) AS n_priorities,
           count(*)                        AS n_orders
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def q9_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact count-distinct (multi) per group."""
    orders = _t(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.countDistinct("o_orderpriority").alias("n_priorities"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@query("qz9_approx_distinct", oracle=None)
def qz9_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ approximate distinct — sketch-mergeable, single narrow shuffle.

    No DuckDB oracle (different sketch); tests assert ≤5% relative error
    vs the exact count.
    """
    orders = _t(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.approx_count_distinct("o_custkey", rsd=0.01).alias("n_customers_approx"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@query("qz9_hll_mergeable", oracle=None)
def qz9_hll_mergeable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable HLL sketches — the 100 TB re-aggregation pattern.

    ``approx_count_distinct`` gives one number; at warehouse scale the
    asset is the SKETCH: per-slice Datasketches HLL objects
    (``hll_sketch_agg``) that roll up to ANY coarser grain via
    ``hll_union_agg`` WITHOUT rescanning the fact table — per-day
    sketches answer per-month distincts, per-source sketches answer
    global, each merge touching kilobytes instead of terabytes.

    Here: one sketch of user_id per event_type, then the ALL row is
    produced by merging those per-type sketches (a second pass over K
    sketch rows, NOT over the events).  Pytest gates ≤5% relative error
    vs exact distincts AND the merge identity: the union-of-sketches
    estimate must equal sketching the whole table directly.
    """
    ev = load_table(spark, sf_dir, "events")
    per_type = ev.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.count(F.lit(1)).alias("n_events"),
    )
    per_type_rows = per_type.select(
        F.col("event_type").alias("scope"),
        F.hll_sketch_estimate("sk").alias("approx_users"),
        "n_events",
    )
    merged = per_type.agg(
        F.hll_union_agg("sk").alias("sk"), F.sum("n_events").alias("n_events")
    ).select(
        F.lit("ALL").alias("scope"),
        F.hll_sketch_estimate("sk").alias("approx_users"),
        "n_events",
    )
    return per_type_rows.unionByName(merged)


# --------------------------------------------------------------------------
# Q8c — JSON scalar functions over events.props (§2.2 scalar row: the
# payload-at-the-edge pattern of §1.2 — opaque payload upgraded to typed
# columns exactly once, at the boundary, then everything downstream is
# columnar).  Both extraction paths are exercised: schema-full from_json
# and path-only get_json_object; they must agree, and the oracle checks
# both against DuckDB's JSON extension.
# --------------------------------------------------------------------------
@query(
    "q8_json_props",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k_parsed,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k_path,
           min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
           max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
    FROM events
    GROUP BY event_type
    """,
)
def q8_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parse the JSON ``props`` payload and aggregate the extracted field."""
    ev = _t(spark, sf_dir, "events")
    parsed = ev.select(
        "event_type",
        F.from_json("props", "k long").getField("k").alias("k_parsed"),
        F.get_json_object("props", "$.k").cast("long").alias("k_path"),
    )
    return parsed.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("k_parsed").alias("sum_k_parsed"),
        F.sum("k_path").alias("sum_k_path"),
        F.min("k_parsed").alias("min_k"),
        F.max("k_parsed").alias("max_k"),
    )


# --------------------------------------------------------------------------
# Q8d — predicate battery (§2.2 projection/filter row: IN, BETWEEN, LIKE,
# null-safe equality).  Projected as booleans rather than filters so the
# oracle checks every predicate's value on every row, not just the
# surviving subset.
# --------------------------------------------------------------------------
@query(
    "q8_predicates",
    oracle="""
    SELECT o_orderkey,
           o_orderpriority IN ('1-URGENT', '2-HIGH')        AS is_priority,
           o_totalprice BETWEEN 50000 AND 150000            AS mid_price,
           o_orderpriority LIKE '%URGENT'                   AS like_urgent,
           nullif(o_orderstatus, 'P') IS NOT DISTINCT FROM 'F' AS nullsafe_f,
           nullif(o_orderstatus, 'P') IS NOT DISTINCT FROM NULL AS nullsafe_null
    FROM orders
    WHERE o_orderkey % 3 = 0
    """,
)
def q8_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN / BETWEEN / LIKE / null-safe-eq battery over ``orders``."""
    orders = _t(spark, sf_dir, "orders")
    status_or_null = F.nullif(F.col("o_orderstatus"), F.lit("P"))
    return orders.where(F.col("o_orderkey") % 3 == 0).select(
        "o_orderkey",
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH").alias("is_priority"),
        F.col("o_totalprice").between(50000, 150000).alias("mid_price"),
        F.col("o_orderpriority").like("%URGENT").alias("like_urgent"),
        status_or_null.eqNullSafe(F.lit("F")).alias("nullsafe_f"),
        status_or_null.eqNullSafe(F.lit(None).cast("string")).alias("nullsafe_null"),
    )


# --------------------------------------------------------------------------
# Q8e — array & map function battery (§2.2 scalar row: size, element
# access, contains, transform+aggregate, distinct; map_keys/element_at
# over the parsed JSON payload).  Arrays come from tokenizing documents,
# maps from events.props — both native columnar types end-to-end.
# --------------------------------------------------------------------------
@query(
    "q8_array_map",
    oracle=r"""
    WITH t AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws
        FROM documents
    )
    SELECT doc_id,
           CAST(len(ws) AS BIGINT)                         AS n_words,
           ws[1]                                           AS first_word,
           list_contains(ws, 'the')                        AS has_the,
           CAST(list_sum(list_transform(ws, w -> length(w))) AS BIGINT) AS total_chars,
           CAST(len(list_distinct(ws)) AS BIGINT)          AS n_unique,
           array_to_string(ws[1:3], ' ')                   AS first_three
    FROM t
    """,
)
def q8_array_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array higher-order-function battery over tokenized documents."""
    docs = _t(spark, sf_dir, "documents")
    ws = F.split(F.trim(F.col("text")), r"\s+")
    t = docs.select("doc_id", ws.alias("ws"))
    total = F.aggregate(
        F.transform("ws", lambda w: F.length(w).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return t.select(
        "doc_id",
        F.size("ws").cast("long").alias("n_words"),
        F.col("ws").getItem(0).alias("first_word"),
        F.array_contains("ws", "the").alias("has_the"),
        total.alias("total_chars"),
        F.size(F.array_distinct("ws")).cast("long").alias("n_unique"),
        F.concat_ws(" ", F.slice("ws", 1, 3)).alias("first_three"),
    )


@query(
    "q8_map_props",
    oracle="""
    SELECT event_id,
           array_to_string(json_keys(props), ',') AS prop_keys,
           CAST(len(json_keys(props)) AS BIGINT)  AS n_keys,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
    FROM events
    WHERE event_id % 5 = 0
    """,
)
def q8_map_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map functions (map_keys / element_at) over the parsed JSON payload."""
    ev = _t(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,bigint>")
    return ev.where(F.col("event_id") % 5 == 0).select(
        "event_id",
        F.concat_ws(",", F.map_keys(m)).alias("prop_keys"),
        F.size(F.map_keys(m)).cast("long").alias("n_keys"),
        F.element_at(m, "k").alias("k_val"),
    )


# --------------------------------------------------------------------------
# Q7c — pivot (conditional aggregation surface).  groupBy().pivot() with an
# EXPLICIT value list: without it Spark runs an extra distinct job to
# discover columns, and at 100 TB schema discovery must never scan data.
# --------------------------------------------------------------------------
@query(
    "q7_pivot",
    oracle="""
    SELECT user_id % 10 AS user_bucket,
           round(coalesce(sum(value) FILTER (event_type = 'click'),    0), 6) AS click,
           round(coalesce(sum(value) FILTER (event_type = 'purchase'), 0), 6) AS purchase,
           round(coalesce(sum(value) FILTER (event_type = 'view'),     0), 6) AS view,
           round(coalesce(sum(value) FILTER (event_type = 'signup'),   0), 6) AS signup,
           round(coalesce(sum(value) FILTER (event_type = 'error'),    0), 6) AS error
    FROM events
    GROUP BY 1
    """,
)
def q7_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user-bucket revenue pivoted by event type (explicit value list)."""
    ev = _t(spark, sf_dir, "events")
    kinds = ["click", "purchase", "view", "signup", "error"]
    out = (
        ev.groupBy((F.col("user_id") % 10).alias("user_bucket"))
        .pivot("event_type", kinds)
        .agg(F.sum("value"))
    )
    return out.select(
        "user_bucket",
        *[F.round(F.coalesce(F.col(k), F.lit(0.0)), 6).alias(k) for k in kinds],
    )


# --------------------------------------------------------------------------
# Q9b — exact percentiles (continuous interpolation, matches DuckDB
# quantile_cont).  percentile() is an exact sort-based aggregate; the
# sketch alternative at scale is approx_percentile (same shape as Q9's
# approx_count_distinct: mergeable partials, rel-error tested).
# --------------------------------------------------------------------------
@query(
    "q9_percentiles",
    oracle="""
    SELECT event_type,
           round(quantile_cont(value, 0.5), 6)  AS p50,
           round(quantile_cont(value, 0.9), 6)  AS p90,
           round(quantile_cont(value, 0.99), 6) AS p99
    FROM events
    GROUP BY event_type
    """,
)
def q9_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact p50/p90/p99 of event value per type."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.9)"), 6).alias("p90"),
        F.round(F.expr("percentile(value, 0.99)"), 6).alias("p99"),
    )


@query("qz9_approx_percentiles", oracle=None)
def qz9_approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch percentiles (KLL-style, mergeable partials) — the 100 TB
    path where exact percentile's per-group sort is unaffordable.  No
    DuckDB oracle (different sketch); tests bound the error against
    q9_percentiles.
    """
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.expr("approx_percentile(value, 0.5, 10000)").alias("p50_approx"),
        F.expr("approx_percentile(value, 0.9, 10000)").alias("p90_approx"),
    )


# --------------------------------------------------------------------------
# Q24 — GROUPING SETS (the third grouping-lattice shape beside Q7's
# rollup/cube): explicit set list + grouping() indicators.  Same engine
# machinery as rollup (Expand node → one shuffle); the set list keeps the
# expansion factor at |sets|, not 2^k.
# --------------------------------------------------------------------------
@query(
    "q24_grouping_sets",
    oracle="""
    SELECT n_name, o_orderstatus,
           CAST(grouping(n_name) AS BIGINT)       AS g_nation,
           CAST(grouping(o_orderstatus) AS BIGINT) AS g_status,
           round(sum(o_totalprice), 2) AS revenue,
           count(*) AS n_orders
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    GROUP BY GROUPING SETS ((n_name, o_orderstatus), (n_name), ())
    """,
)
def q24_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by explicit grouping sets with grouping() indicators."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    joined = orders.join(
        F.broadcast(cust), orders.o_custkey == cust.c_custkey
    ).join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
    joined.createOrReplaceTempView("q24_joined")
    return spark.sql(
        """
        SELECT n_name, o_orderstatus,
               CAST(grouping(n_name) AS BIGINT)        AS g_nation,
               CAST(grouping(o_orderstatus) AS BIGINT) AS g_status,
               round(sum(o_totalprice), 2) AS revenue,
               count(*) AS n_orders
        FROM q24_joined
        GROUP BY GROUPING SETS ((n_name, o_orderstatus), (n_name), ())
        """
    )


# --------------------------------------------------------------------------
# Q5b — distribution-rank window battery: ntile / percent_rank /
# cume_dist complete the §2.2 window row beyond Q5's row_number/lag.
# Deterministic under ties because the window orders by a UNIQUE
# (o_totalprice, o_orderkey) pair — ntile in particular assigns by row
# position, so a non-unique ordering would be nondeterministic.
# --------------------------------------------------------------------------
@query(
    "q5_rank_stats",
    oracle="""
    SELECT o_orderkey, o_orderstatus,
           ntile(4)       OVER w AS price_quartile,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist()    OVER w, 6) AS cume
    FROM orders
    WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
    """,
)
def q5_rank_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quartile bucketing + distribution ranks per order-status partition.

    Scale honesty: ntile/percent_rank/cume_dist need a TOTAL order per
    window partition, and o_orderstatus has only 3 values — at 100 TB a
    third of the table sorts through one task.  That cost is inherent to
    the exact-rank semantics (any engine pays it), not to this plan; the
    scalable approximation when per-row exactness isn't required is
    bucketing by approx_percentile thresholds (the qz9 sketch tier):
    compute K quantile cut points (mergeable partials, one narrow
    shuffle) and assign buckets with a codegen'd CASE — no per-partition
    total order anywhere.
    """
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    return orders.select(
        "o_orderkey",
        "o_orderstatus",
        F.ntile(4).over(w).cast("long").alias("price_quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


# ---------------------------------------------------------------------------
# qz8_hof_battery — the remaining array higher-order functions
# ---------------------------------------------------------------------------


@query(
    "qz8_hof_battery",
    oracle=r"""
    WITH t AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws
        FROM documents
    )
    SELECT doc_id,
           CAST(len(list_filter(ws, w -> length(w) > 5)) AS BIGINT) AS n_long,
           len(list_filter(ws, w -> w LIKE 's%')) > 0               AS any_s,
           len(list_filter(ws, w -> length(w) = 0)) = 0             AS all_nonempty,
           CAST(list_max(list_transform(ws, w -> length(w))) AS BIGINT) AS max_len,
           list_sort(ws)[1]                                         AS alpha_first,
           array_to_string(list_reverse_sort(ws)[1:2], ' ')         AS alpha_last_two
    FROM t
    """,
)
def qz8_hof_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The array higher-order functions q8_array_map leaves out:
    ``filter`` / ``exists`` / ``forall`` / ``transform``+``array_max``
    / ``sort_array`` both directions — completing the §2.2 scalar-fn
    row's lambda surface.  All JVM codegen (lambdas compile into the
    same whole-stage span as ordinary expressions — zero Python), so
    the battery is one map-only pass at any scale.  Fully
    oracle-backed (DuckDB list_* twins).
    """
    docs = _t(spark, sf_dir, "documents")
    ws = F.split(F.trim(F.col("text")), r"\s+")
    t = docs.select("doc_id", ws.alias("ws"))
    return t.select(
        "doc_id",
        F.size(F.filter("ws", lambda w: F.length(w) > 5)).cast("long").alias("n_long"),
        F.exists("ws", lambda w: w.startswith("s")).alias("any_s"),
        F.forall("ws", lambda w: F.length(w) != 0).alias("all_nonempty"),
        F.array_max(F.transform("ws", lambda w: F.length(w).cast("long"))).alias(
            "max_len"
        ),
        F.sort_array("ws").getItem(0).alias("alpha_first"),
        F.concat_ws(" ", F.slice(F.sort_array("ws", asc=False), 1, 2)).alias(
            "alpha_last_two"
        ),
    )


# ---------------------------------------------------------------------------
# qz8_variant / qz8_try_errors / qz8_collation — Spark 4 SQL-surface tier
# ---------------------------------------------------------------------------


@query(
    "qz8_variant",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k_val,
           CAST(NULL AS BIGINT) AS missing,
           json_extract(props, '$.k') IS NOT NULL AS has_k
    FROM events
    """,
)
def qz8_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access through Spark 4's VARIANT type:
    ``parse_json`` once into a binary-encoded variant, then typed path
    extraction with ``variant_get`` / ``try_variant_get`` — the
    schema-on-read upgrade over string-walking ``get_json_object``
    (q8_json_props keeps the legacy path for contrast).  VARIANT's
    binary encoding parses each document ONCE however many paths are
    read, and shredded storage gives it a columnar future — the right
    default for a 100 TB props column with evolving keys.  The missing
    path goes through ``try_variant_get`` (NULL, not an ANSI error).
    Fully oracle-backed via DuckDB's json_extract twins.
    """
    ev = _t(spark, sf_dir, "events")
    v = F.parse_json("props")
    return ev.select(
        "event_id",
        F.variant_get(v, "$.k", "bigint").alias("k_val"),
        F.try_variant_get(v, "$.absent.path", "bigint").alias("missing"),
        F.variant_get(v, "$.k", "bigint").isNotNull().alias("has_k"),
    )


@query(
    "qz8_try_errors",
    oracle="""
    SELECT event_id,
           CASE WHEN round(value, 2) - round(value, 2) = 0 THEN NULL
                ELSE value / (round(value, 2) - round(value, 2)) END AS div0,
           TRY_CAST(event_type AS BIGINT) AS bad_int,
           TRY_CAST(event_type AS TIMESTAMP) AS bad_ts,
           CAST(NULL AS VARCHAR) AS oob_elem,
           TRY_CAST(CAST(user_id AS VARCHAR) AS BIGINT) AS good_int
    FROM events
    """,
)
def qz8_try_errors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ANSI-safe scalar surface: Spark 4 runs with ANSI mode ON, so
    division by zero / bad casts / out-of-bounds access THROW by
    default — correct for catching corruption, wrong inside a curation
    cascade that must be total over dirty data.  ``try_divide`` /
    ``try_cast`` / ``try_to_timestamp`` / ``try_element_at`` are the
    sanctioned per-expression escape hatches: NULL on failure, error
    elsewhere, no session-wide ANSI downgrade.  Every failure mode here
    is exercised on real columns (zero denominator, non-numeric and
    non-temporal casts, index past the array end) next to one success
    path proving try_* is not NULL-happy.  Fully oracle-backed.
    """
    ev = _t(spark, sf_dir, "events")
    zero = F.round("value", 2) - F.round("value", 2)
    return ev.select(
        "event_id",
        F.try_divide(F.col("value"), zero).alias("div0"),
        F.col("event_type").try_cast("bigint").alias("bad_int"),
        F.try_to_timestamp(F.col("event_type")).alias("bad_ts"),
        F.try_element_at(F.split("event_type", "-"), F.lit(99)).alias("oob_elem"),
        F.col("user_id").cast("string").try_cast("bigint").alias("good_int"),
    )


@query(
    "qz8_collation",
    oracle="""
    WITH mangled AS (
        SELECT doc_id,
               CASE WHEN doc_id % 2 = 0 THEN upper(source) ELSE source END AS src_mixed
        FROM documents
    )
    SELECT CAST(count(DISTINCT lower(src_mixed)) AS BIGINT) AS n_sources_ci,
           CAST(count(DISTINCT src_mixed) AS BIGINT) AS n_sources_cs,
           CAST(coalesce(sum(CASE WHEN lower(src_mixed) = 'src1' THEN 1 ELSE 0 END), 0)
                AS BIGINT) AS n_src1_ci
    FROM mangled
    """,
)
def qz8_collation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 collations: case-insensitive comparison and DISTINCT via
    the ``UTF8_LCASE`` collation on the COLUMN, not via scattering
    ``lower()`` into every predicate — the engine-level answer to
    mixed-case source labels / dedup keys.  The corpus is deterministic
    so the case noise is injected (upper() on even doc_ids); the
    collated distinct-count then recovers the true source count while
    the binary-collation count sees the doubled key space.  The oracle
    expresses the same semantics through lower() — for ASCII the two
    are exactly equivalent, which is what makes this oracle-checkable.
    """
    docs = _t(spark, sf_dir, "documents")
    mixed = F.when(F.col("doc_id") % 2 == 0, F.upper("source")).otherwise(
        F.col("source")
    )
    ci = F.collate(mixed, "UTF8_LCASE")
    return docs.select(mixed.alias("src_mixed"), ci.alias("src_ci")).agg(
        F.countDistinct("src_ci").alias("n_sources_ci"),
        F.countDistinct("src_mixed").alias("n_sources_cs"),
        F.coalesce(
            F.sum(F.when(F.col("src_ci") == F.lit("src1"), 1).otherwise(0)),
            F.lit(0),
        ).cast("long").alias("n_src1_ci"),
    )


# ---------------------------------------------------------------------------
# Contribution (share-of-parent) analysis — each nation's revenue as a
# share of its region and of the total, plus the region's share of
# total: the drill-path percentages a BI layer computes over the
# rollup lattice.  Shares are ratios of DECIMAL sums (the tpch_extra
# money rule) cast to double for the division, so both engines divide
# identical doubles.
# Scale: one fact aggregation at nation grain; region and grand totals
# are WINDOW sums over the ~25-row aggregate — no second fact pass.
# ---------------------------------------------------------------------------

_CONTRIBUTION_ORACLE = """
    WITH rev AS (
      SELECT r_name AS region, n_name AS nation,
             sum(CAST(l_extendedprice AS DECIMAL(12,2))
                 * (1 - CAST(l_discount AS DECIMAL(3,2)))) AS dec_rev
      FROM lineitem
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation   ON n_nationkey = c_nationkey
      JOIN region   ON r_regionkey = n_regionkey
      GROUP BY 1, 2
    )
    SELECT region, nation,
           CAST(round(dec_rev, 2) AS DOUBLE) AS revenue,
           round(CAST(dec_rev AS DOUBLE)
                 / CAST(sum(dec_rev) OVER (PARTITION BY region) AS DOUBLE),
                 6) AS share_of_region,
           round(CAST(dec_rev AS DOUBLE)
                 / CAST(sum(dec_rev) OVER () AS DOUBLE), 6) AS share_of_total
    FROM rev
"""


@query("qz7_contribution", oracle=_CONTRIBUTION_ORACLE)
def qz7_contribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share-of-parent revenue contribution per nation: (region, nation,
    revenue, share_of_region, share_of_total).  Decimal sums; window
    shares over the tiny aggregate."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    ords = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cus = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nat = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    reg = _t(spark, sf_dir, "region").select("r_regionkey", "r_name")
    rev_dec = F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(3,2)")
    )
    rev = (
        li.join(ords, li["l_orderkey"] == ords["o_orderkey"])
        .join(F.broadcast(cus), ords["o_custkey"] == cus["c_custkey"])
        .join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(F.sum(rev_dec).alias("dec_rev"))
    )
    w_region = Window.partitionBy("region")
    w_all = Window.partitionBy()
    return rev.select(
        "region",
        "nation",
        F.round("dec_rev", 2).cast("double").alias("revenue"),
        F.round(
            F.col("dec_rev").cast("double")
            / F.sum("dec_rev").over(w_region).cast("double"),
            6,
        ).alias("share_of_region"),
        F.round(
            F.col("dec_rev").cast("double")
            / F.sum("dec_rev").over(w_all).cast("double"),
            6,
        ).alias("share_of_total"),
    )


# ---------------------------------------------------------------------------
# Relational DIVISION (universal quantification): customers with at
# least one order in EVERY quarter of 1996 — the "FOR ALL" query shape
# (Codd's ÷) that EXISTS/IN subqueries don't cover.  Implemented as the
# count-matching form: distinct (customer, quarter) → customers whose
# distinct-quarter count equals the divisor cardinality.  The divisor
# here is a constant (4); with a dynamic divisor table the same plan
# broadcasts its count — never a nested NOT EXISTS double negation.
# ---------------------------------------------------------------------------

_DIVISION_ORACLE = """
    WITH cq AS (
      SELECT DISTINCT o_custkey, quarter(o_orderdate) AS q
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    )
    SELECT o_custkey AS c_custkey,
           CAST(count(*) AS BIGINT) AS n_quarters
    FROM cq GROUP BY 1 HAVING count(*) = 4
"""


@query("qz20_division", oracle=_DIVISION_ORACLE)
def qz20_division(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relational division: customers ordering in all 4 quarters of
    1996 (count-matching form)."""
    ords = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    cq = ords.select(
        "o_custkey", F.quarter("o_orderdate").alias("q")
    ).distinct()
    return (
        cq.groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(F.count(F.lit(1)).alias("n_quarters"))
        .where(F.col("n_quarters") == 4)
    )
