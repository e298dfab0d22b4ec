"""TPC-H completion block (qz27_*) — the classic decision-support shapes
the driver's 50 slots don't cover, adapted to the testdata schema (no
partsupp / l_commitdate / c_phone columns, so Q9/Q12/Q21-style queries are
re-expressed over the columns that exist; each docstring names its
ancestor).

The reference has no relational layer at all (its transforms are opaque
``func(Msg) Msg``, reference transform.go:8); these queries exist because
"a user of the reference could switch" implies the standard warehouse
workload runs here too, and because each one pins a distinct Catalyst
join-planning shape the rest of the registry doesn't:

* double-dimension alias join (Q7: nation joined TWICE under different
  roles), * conditional-aggregate market share (Q8), * derived-column
  profit over a 5-way star (Q9), * top-k after a fact-side agg (Q10),
  * left-outer fact histogram (Q13), * single-pass conditional ratio
  (Q14), * agg-then-argmax self-reference (Q15), * correlated scalar
  subquery decorrelated into a broadcast join (Q17), * having-filtered
  semi-structure (Q18), * multi-disjunct pushdown (Q19), * anti-join with
  a scalar-subquery threshold (Q22).

Every query follows the module-wide determinism contract
(plans/relational.py): money 2 dp, ratios 6 dp, identical aliases both
sides, and every float-boundary predicate is written INTEGER-EXACT
(quantities are integral doubles, so ``2*n*qty < sum_qty`` is exact where
``qty < 0.5*avg`` could tie-break differently between engines).

Scale notes ride each query: dimension sides broadcast, the one fact-fact
shuffle is named, and filters reach the parquet scan (plan-gated in
tests/test_plan_quality.py for the block's representatives).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from frizzle_spark.plans.registry import query
from frizzle_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _rev():
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


def _rev_dec():
    """Revenue as EXACT decimal: money columns are 2-dp decimals stored as
    doubles, so the cast is lossless and the sum is order-independent —
    the one property double sums lack.  Group counts in this block are
    large enough (1246 nation-pair-years) that double summation-order
    noise WILL flip a 2-dp rounding boundary somewhere between Spark and
    DuckDB; decimal aggregation makes the hash deterministic by
    construction, and is what a warehouse would use for money at 100 TB
    anyway.  Precision note: (12,2) × (14,2) stays ≤ (27,4), inside both
    engines' 38-digit exact range — no silent precision-loss rescale."""
    return F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(3,2)")
    )


_REV_DEC_SQL = (
    "CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(3,2)))"
)


# --------------------------------------------------------------------------
# Q7 — volume shipping: revenue flow between every (supplier-nation,
# customer-nation) pair by ship year.  The classic filters a single nation
# pair; the testdata's sf0.001 slice has only 10 suppliers, so the pair
# filter degenerates — keeping ALL pairs preserves the interesting part
# (nation joined twice under different roles) and stays non-degenerate at
# every SF.
# Scale: lineitem⋈orders is the one big shuffle (orderkey); supplier,
# customer, and both nation aliases broadcast.  The shipdate filter is
# pushed to the scan, so only two ship-years of the fact table move.
# --------------------------------------------------------------------------
@query(
    "qz27_volume_shipping",
    oracle="""
    SELECT n1.n_name AS supp_nation,
           n2.n_name AS cust_nation,
           CAST(year(l_shipdate) AS BIGINT) AS l_year,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(3,2)))), 2) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation n1 ON n1.n_nationkey = s_nationkey
    JOIN nation n2 ON n2.n_nationkey = c_nationkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY 1, 2, 3
    """,
)
def qz27_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: nation-pair shipping volume by year (double nation alias)."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    sup = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    cus = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    ords = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    nat = _t(spark, sf_dir, "nation")
    n1 = nat.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nat.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(ords, li["l_orderkey"] == ords["o_orderkey"])
        .join(F.broadcast(sup), li["l_suppkey"] == sup["s_suppkey"])
        .join(F.broadcast(cus), ords["o_custkey"] == cus["c_custkey"])
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(F.round(F.sum(_rev_dec()), 2).cast("double").alias("revenue"))
    )


# --------------------------------------------------------------------------
# Q8 — market share: of all PROMO-part revenue delivered to EUROPE
# customers, what fraction came from NATION_5 suppliers, per order year.
# Scale: part filter (p_type='PROMO') prunes the fact side FIRST via a
# broadcast join — 1/6 of lineitem survives before the orderkey shuffle.
# The share is a conditional aggregate, not a second pass.
# --------------------------------------------------------------------------
@query(
    "qz27_market_share",
    oracle="""
    SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
           round(CAST(coalesce(
             sum(CASE WHEN n1.n_name = 'NATION_5'
                      THEN CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(3,2))) END), 0) AS DOUBLE)
             / CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE), 6) AS mkt_share
    FROM lineitem
    JOIN part     ON p_partkey = l_partkey AND p_type = 'PROMO'
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation n1 ON n1.n_nationkey = s_nationkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation n2 ON n2.n_nationkey = c_nationkey
    JOIN region   ON r_regionkey = n2.n_regionkey AND r_name = 'EUROPE'
    GROUP BY 1
    """,
)
def qz27_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: national market share of PROMO parts in EUROPE by year."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_orderkey", "l_extendedprice", "l_discount"
    )
    part = (
        _t(spark, sf_dir, "part")
        .where(F.col("p_type") == "PROMO")
        .select("p_partkey")
    )
    sup = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = _t(spark, sf_dir, "nation")
    n1 = nat.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    reg = _t(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    n2 = nat.join(
        F.broadcast(reg), nat["n_regionkey"] == reg["r_regionkey"]
    ).select(F.col("n_nationkey").alias("n2_key"))
    cus = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    ords = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    rev = _rev_dec()
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .join(F.broadcast(sup), li["l_suppkey"] == sup["s_suppkey"])
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(ords, li["l_orderkey"] == ords["o_orderkey"])
        .join(F.broadcast(cus), ords["o_custkey"] == cus["c_custkey"])
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            F.round(
                F.coalesce(
                    F.sum(F.when(F.col("supp_nation") == "NATION_5", rev)),
                    F.lit(0).cast("decimal(12,2)"),
                ).cast("double")
                / F.sum(rev).cast("double"),
                6,
            ).alias("mkt_share")
        )
    )


# --------------------------------------------------------------------------
# Q9 (adapted) — product-line profit by supplier nation and year.  The
# classic uses ps_supplycost; without partsupp, cost is proxied as
# 0.6 × p_retailprice × quantity — the SHAPE (derived measure over a
# 5-way star, grouped by a dimension of the supplier side) is what's
# being pinned, not the constant.
# Scale: part/supplier/nation broadcast; lineitem⋈orders shuffles once on
# orderkey; profit is computed pre-aggregation so the shuffle carries one
# double per group, not the operands.
# --------------------------------------------------------------------------
@query(
    "qz27_product_profit",
    oracle="""
    SELECT n_name AS nation,
           CAST(year(o_orderdate) AS BIGINT) AS o_year,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(3,2)))
                     - CAST(0.6 AS DECIMAL(2,1)) * CAST(p_retailprice AS DECIMAL(12,2))
                       * CAST(l_quantity AS DECIMAL(9,0))), 2) AS DOUBLE) AS sum_profit
    FROM lineitem
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation   ON n_nationkey = s_nationkey
    JOIN orders   ON o_orderkey = l_orderkey
    GROUP BY 1, 2
    """,
)
def qz27_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit (revenue − proxied cost) by nation × year."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_orderkey", "l_extendedprice", "l_discount",
        "l_quantity",
    )
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_retailprice")
    sup = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    ords = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    profit = _rev_dec() - (
        F.expr("CAST(0.6 AS DECIMAL(2,1))")
        * F.col("p_retailprice").cast("decimal(12,2)")
        * F.col("l_quantity").cast("decimal(9,0)")
    )
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .join(F.broadcast(sup), li["l_suppkey"] == sup["s_suppkey"])
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(ords, li["l_orderkey"] == ords["o_orderkey"])
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(F.round(F.sum(profit), 2).cast("double").alias("sum_profit"))
    )


# --------------------------------------------------------------------------
# Q10 — returned items: the 20 customers losing the most revenue to
# returns in one quarter.
# Scale: the quarter filter prunes orders BEFORE the fact join; returnflag
# prunes lineitem at the scan.  The top-20 is a sort over the
# post-aggregation table (≤|customers| rows), never the fact table;
# deterministic tiebreak on c_custkey keeps the hash stable.
# --------------------------------------------------------------------------
@query(
    "qz27_returned_items",
    oracle="""
    SELECT c_custkey, c_name, n_name,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(3,2)))), 2) AS DOUBLE) AS revenue,
           round(max(c_acctbal), 2) AS c_acctbal
    FROM lineitem
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation   ON n_nationkey = c_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
    GROUP BY 1, 2, 3
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def qz27_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: top-20 customers by returned-item revenue in a quarter."""
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    ords = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    cus = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey", "c_acctbal"
    )
    nat = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        li.join(ords, li["l_orderkey"] == ords["o_orderkey"])
        .join(F.broadcast(cus), ords["o_custkey"] == cus["c_custkey"])
        .join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(F.sum(_rev_dec()), 2).cast("double").alias("revenue"),
            F.round(F.max("c_acctbal"), 2).alias("c_acctbal"),
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


# --------------------------------------------------------------------------
# Q13 — customer order-count distribution: how many customers placed
# exactly k qualifying orders (left outer join keeps 0-order customers).
# Scale: two aggregations, both shrinking — per-customer counts shuffle on
# custkey, the histogram on the count value.  The priority filter lives in
# the JOIN CONDITION (not a WHERE) so 0-order customers survive, exactly
# the classic's comment-filter trick.
# --------------------------------------------------------------------------
@query(
    "qz27_order_counts",
    oracle="""
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM (
      SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer
      LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '4-NOT SPECIFIED'
      GROUP BY c_custkey
    )
    GROUP BY c_count
    """,
)
def qz27_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: histogram of per-customer qualifying-order counts."""
    cus = _t(spark, sf_dir, "customer").select("c_custkey")
    ords = _t(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") != "4-NOT SPECIFIED"
    )
    per_cust = (
        cus.join(ords, cus["c_custkey"] == ords["o_custkey"], "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


# --------------------------------------------------------------------------
# Q14 — promotion effect: percentage of revenue from PROMO parts, per
# ship month of 1996.
# Scale: single fact pass; part broadcasts; the ratio is a conditional
# aggregate in the SAME groupBy — no second scan, no join back.
# --------------------------------------------------------------------------
@query(
    "qz27_promo_share",
    oracle="""
    SELECT CAST(month(l_shipdate) AS BIGINT) AS ship_month,
           round(100.0 * CAST(coalesce(
             sum(CASE WHEN p_type = 'PROMO'
                      THEN CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(3,2))) END), 0) AS DOUBLE)
             / CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE), 6) AS promo_revenue_pct
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY 1
    """,
)
def qz27_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: monthly PROMO revenue percentage."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = _rev_dec()
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .groupBy(F.month("l_shipdate").cast("long").alias("ship_month"))
        .agg(
            F.round(
                F.lit(100.0)
                * F.coalesce(
                    F.sum(F.when(F.col("p_type") == "PROMO", rev)),
                    F.lit(0).cast("decimal(12,2)"),
                ).cast("double")
                / F.sum(rev).cast("double"),
                6,
            ).alias("promo_revenue_pct")
        )
    )


# --------------------------------------------------------------------------
# Q15 — top supplier: supplier(s) achieving the maximum revenue in a
# quarter.  Agg-then-argmax: the max is a 1-row aggregate of the
# per-supplier table, broadcast back — never a global sort, and ties all
# survive (the classic's VIEW + subquery, decorrelated).
# Scale: one shuffle on suppkey (fact-side agg), then two broadcast joins
# (1-row max, |suppliers|-row dimension).
# --------------------------------------------------------------------------
@query(
    "qz27_top_supplier",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey AS supplier_no,
             CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(3,2)))), 2) AS DOUBLE) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY 1
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN rev ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
    """,
)
def qz27_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: maximum-revenue supplier(s) for a quarter, ties kept."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(F.sum(_rev_dec()), 2).cast("double").alias("total_revenue")
    )
    mx = rev.agg(F.max("total_revenue").alias("max_rev"))
    sup = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.crossJoin(F.broadcast(mx))
        .where(F.col("total_revenue") == F.col("max_rev"))
        .join(F.broadcast(sup), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


# --------------------------------------------------------------------------
# Q17 — small-quantity-order revenue: average yearly revenue lost if
# orders below half a part's average quantity were not filled, for one
# brand.  The correlated scalar subquery (per-part average) decorrelates
# into a per-part aggregate joined back.
# INTEGER-EXACT boundary: qty < 0.5·(sum/n) ⇔ 2·n·qty < sum — quantities
# are integral doubles, so both engines evaluate the comparison exactly
# and no float tie can flip a row between Spark and the oracle.
# Scale: brand filter broadcasts part, pruning lineitem before the
# per-part agg; both the agg and the join key on l_partkey, so AQE reuses
# one exchange.
# --------------------------------------------------------------------------
@query(
    "qz27_small_qty_rev",
    oracle="""
    WITH pa AS (
      SELECT l_partkey AS pk,
             sum(l_quantity) AS sq,
             CAST(count(*) AS BIGINT) AS n
      FROM lineitem
      GROUP BY 1
    )
    SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0, 2) AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey AND p_brand = 'Brand#1'
    JOIN pa   ON pk = l_partkey
    WHERE 2 * n * l_quantity < sq
    """,
)
def qz27_small_qty_rev(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: revenue in below-half-average-quantity orders (1 row)."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    part = (
        _t(spark, sf_dir, "part")
        .where(F.col("p_brand") == "Brand#1")
        .select("p_partkey")
    )
    pa = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum("l_quantity").alias("sq"), F.count(F.lit(1)).alias("n")
    )
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .join(pa, F.col("pk") == li["l_partkey"])
        .where(2 * F.col("n") * F.col("l_quantity") < F.col("sq"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(12,2)")).cast("double")
                / 7.0,
                2,
            ).alias("avg_yearly")
        )
    )


# --------------------------------------------------------------------------
# Q18 — large-volume orders: orders whose total quantity exceeds a
# threshold, with their customer.  HAVING over a fact-side agg, joined
# back to both parents.
# INTEGER-EXACT: sum of integral quantities is exact in double, so the
# >190 boundary cannot tie-break differently.
# Scale: one shuffle (orderkey agg); the surviving order set is tiny, so
# the joins back to orders/customer broadcast the AGGREGATE side — the
# fact table is never re-shuffled.
# --------------------------------------------------------------------------
@query(
    "qz27_big_orders",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey, o_orderdate,
           round(o_totalprice, 2) AS o_totalprice,
           round(sum_qty, 2) AS sum_qty
    FROM (
      SELECT l_orderkey, sum(l_quantity) AS sum_qty
      FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 190
    )
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    """,
)
def qz27_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: orders with total quantity > 190 and their customers."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("raw_qty"))
        .where(F.col("raw_qty") > 190)
    )
    ords = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    cus = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        ords.join(F.broadcast(big), ords["o_orderkey"] == big["l_orderkey"])
        .join(F.broadcast(cus), ords["o_custkey"] == cus["c_custkey"])
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            F.round("raw_qty", 2).alias("sum_qty"),
        )
    )


# --------------------------------------------------------------------------
# Q19 — discounted revenue under disjunctive predicates: three OR'd
# (brand × size-band × quantity-band) conjunctions.  Pins Catalyst's
# handling of multi-disjunct filters: the common join key survives, the
# disjunction is pushed below the join where each leg references only one
# side, and the broadcast part side carries its legs to the scan.
# Scale: single fact pass, part broadcasts, one 1-row aggregate.
# --------------------------------------------------------------------------
@query(
    "qz27_disjunctive_rev",
    oracle="""
    SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(3,2)))), 2) AS DOUBLE) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1'  AND p_size BETWEEN 1 AND 15
             AND l_quantity >= 1  AND l_quantity <= 20)
       OR (p_brand = 'Brand#7'  AND p_size BETWEEN 10 AND 30
             AND l_quantity >= 10 AND l_quantity <= 35)
       OR (p_brand = 'Brand#13' AND p_size BETWEEN 20 AND 50
             AND l_quantity >= 20 AND l_quantity <= 50)
    """,
)
def qz27_disjunctive_rev(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: revenue under three OR'd brand/size/quantity bands."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    q = F.col("l_quantity")
    sz = F.col("p_size")
    leg = (
        ((F.col("p_brand") == "Brand#1") & sz.between(1, 15) & q.between(1, 20))
        | ((F.col("p_brand") == "Brand#7") & sz.between(10, 30) & q.between(10, 35))
        | ((F.col("p_brand") == "Brand#13") & sz.between(20, 50) & q.between(20, 50))
    )
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .where(leg)
        .agg(F.round(F.sum(_rev_dec()), 2).cast("double").alias("revenue"))
    )


# --------------------------------------------------------------------------
# Q22 — idle high-balance customers: customers whose balance beats the
# positive-balance average and who placed no RECENT order (the classic's
# "no order at all" is empty on this data — every customer has history —
# so recency is the adaptation), grouped by nation.
# Scale: the threshold is a 1-row aggregate broadcast into the filter; the
# anti join keys on custkey against the date-pruned orders slice.  At
# 100 TB the anti side is the pruned recent partition set, not the full
# history — partition pruning does the heavy lifting.
# --------------------------------------------------------------------------
@query(
    "qz27_idle_customers",
    oracle="""
    WITH thresh AS (
      SELECT avg(c_acctbal) AS ab FROM customer WHERE c_acctbal > 0
    )
    SELECT n_name,
           CAST(count(*) AS BIGINT) AS numcust,
           CAST(round(sum(CAST(c_acctbal AS DECIMAL(12,2))), 2) AS DOUBLE) AS totacctbal
    FROM customer, thresh
    JOIN nation ON n_nationkey = c_nationkey
    WHERE c_acctbal > ab
      AND NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey
          AND o_orderdate >= TIMESTAMP '2000-06-01 00:00:00'
      )
    GROUP BY 1
    """,
)
def qz27_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22: rich customers with no recent orders, by nation."""
    cus = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    thresh = cus.where(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("ab")
    )
    recent = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") >= F.lit("2000-06-01 00:00:00").cast("timestamp"))
        .select("o_custkey")
    )
    nat = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        cus.crossJoin(F.broadcast(thresh))
        .where(F.col("c_acctbal") > F.col("ab"))
        .join(recent, cus["c_custkey"] == recent["o_custkey"], "left_anti")
        .join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum(F.col("c_acctbal").cast("decimal(12,2)")), 2)
            .cast("double")
            .alias("totacctbal"),
        )
    )


# --------------------------------------------------------------------------
# Q6 — forecast revenue change: the classic scan-bound aggregate (no
# join at all).  Pins the pure-pushdown shape: all three predicates
# must reach the parquet scan, the plan is one WholeStageCodegen span
# over the scan plus a 1-row aggregate, and NOTHING shuffles but 1-row
# partials.  Decimal sum per the module contract.
# --------------------------------------------------------------------------
@query(
    "qz27_forecast_revenue",
    oracle="""
    SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                          * CAST(l_discount AS DECIMAL(3,2))), 2) AS DOUBLE)
           AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def qz27_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: revenue that would be gained by eliminating small
    discounts on low-quantity orders in one year (1 row, scan-bound)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(
                F.sum(
                    F.col("l_extendedprice").cast("decimal(12,2)")
                    * F.col("l_discount").cast("decimal(3,2)")
                ),
                2,
            )
            .cast("double")
            .alias("revenue")
        )
    )


# --------------------------------------------------------------------------
# Q16 (adapted) — supplier variety: how many distinct suppliers have
# shipped each (brand, type, size) combination, for a size subset and
# excluding one brand.  The classic reads partsupp; without it, the
# shipped-lineitem relation IS the part-supplier association.
# Scale: part filters broadcast into the fact scan; count(DISTINCT) is
# the two-stage groupBy (no Expand), so both shuffles carry narrow
# (attrs, suppkey) rows.
# --------------------------------------------------------------------------
@query(
    "qz27_supplier_variety",
    oracle="""
    SELECT p_brand, p_type, p_size,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM part JOIN lineitem ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
    GROUP BY 1, 2, 3
    """,
)
def qz27_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier counts per part attribute
    combination, via the shipped-lineitem association."""
    part = (
        _t(spark, sf_dir, "part")
        .where(
            (F.col("p_brand") != "Brand#1")
            & F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .groupBy("p_brand", "p_type", "p_size", "l_suppkey")
        .agg(F.lit(1).alias("_one"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count(F.lit(1)).alias("supplier_cnt"))
    )


# --------------------------------------------------------------------------
# Q12 (adapted) — late-shipment priority analysis: per ship year, how
# many lineitems shipped >30 days after their order date, split into
# critical (1-URGENT / 2-HIGH) vs other priorities.  The classic reads
# l_shipmode/l_commitdate/l_receiptdate; the available lateness signal
# is shipdate − orderdate.
# Scale: one fact-fact join on orderkey (orders side carries only key,
# date, priority), conditional aggregation in one pass; the lateness
# predicate is join-dependent so it evaluates post-join, but the year
# grouping keeps the shuffle at |years| rows.
# --------------------------------------------------------------------------
@query(
    "qz27_late_shipments",
    oracle="""
    SELECT CAST(year(l_shipdate) AS BIGINT) AS ship_year,
           CAST(count(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                           THEN 1 END) AS BIGINT) AS critical_late,
           CAST(count(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                           THEN 1 END) AS BIGINT) AS other_late
    FROM lineitem JOIN orders ON o_orderkey = l_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 30 DAY
    GROUP BY 1
    """,
)
def qz27_late_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: late-shipment counts by priority class and year."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    ords = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    crit = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(ords, li["l_orderkey"] == ords["o_orderkey"])
        .where(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAY"))
        .groupBy(F.year("l_shipdate").cast("long").alias("ship_year"))
        .agg(
            F.count(F.when(crit, 1)).alias("critical_late"),
            F.count(F.when(~crit, 1)).alias("other_late"),
        )
    )


# --------------------------------------------------------------------------
# Q4 (adapted) — order-priority checking: for a six-month order window,
# count orders per priority that had at least one lineitem shipped more
# than 60 days after the order date.  The classic tests
# l_commitdate < l_receiptdate; the available lateness signal is
# shipdate − orderdate (same signal qz27_late_shipments uses, but THIS
# query pins the EXISTS→left-semi shape: orders are counted once no
# matter how many lineitems were late).
# Scale: the date filter prunes orders at the scan; the semi join
# shuffles both sides on orderkey and stops at the first matching
# lineitem per order (LeftSemi short-circuit) — never a pair blowup,
# and the lateness predicate rides the join condition so no
# full-width intermediate materializes.
# --------------------------------------------------------------------------
@query(
    "qz27_priority_check",
    oracle="""
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY 1
    """,
)
def qz27_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS decorrelated to a left-semi join, then a
    tiny priority histogram."""
    ords = (
        _t(spark, sf_dir, "orders")
        .where(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
        )
        .select("o_orderkey", "o_orderdate", "o_orderpriority")
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")
    )
    return (
        ords.join(li, late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


# --------------------------------------------------------------------------
# Q21 (adapted) — suppliers who kept orders waiting: in finished orders
# ('F') involving MORE than one supplier, find the supplier who was the
# ONLY one whose items were returned, and count their offending
# lineitems.  The classic's late-delivery signal (receipt vs commit
# date) doesn't exist in this schema; the return flag carries the same
# sole-offender semantics.  What this query pins that nothing else in
# the registry does: the double-correlated EXISTS / NOT EXISTS
# self-join, decorrelated Spark-side into ONE per-order aggregate
# (n_suppliers, n_returning_suppliers) instead of the l1×l2×l3
# three-way self-join a literal translation would run.
# Scale: lineitem shuffles on orderkey twice (once into the per-order
# aggregate, once as the candidate side); both joins are equi-joins on
# orderkey, so AQE coalesces them over the same hash layout.  The
# l1×l2×l3 form is quadratic per hot order; the aggregate form is
# strictly linear.  Supplier is broadcast.
# --------------------------------------------------------------------------
@query(
    "qz27_waiting_suppliers",
    oracle="""
    SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM lineitem l1
    JOIN orders   ON o_orderkey = l1.l_orderkey AND o_orderstatus = 'F'
    JOIN supplier ON s_suppkey = l1.l_suppkey
    WHERE l1.l_returnflag = 'R'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY 1
    """,
)
def qz27_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: sole-offender detection via per-order aggregate
    decorrelation (no three-way self-join)."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_returnflag"
    )
    per_order = li.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(
            F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
        ).alias("n_ret_supp"),
    )
    # EXISTS(other supplier)       ⇔ n_supp > 1
    # NOT EXISTS(other R supplier) ⇔ n_ret_supp = 1 (l1's own supplier)
    sole = per_order.where((F.col("n_supp") > 1) & (F.col("n_ret_supp") == 1))
    ords_f = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus") == "F")
        .select("o_orderkey")
    )
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        li.where(F.col("l_returnflag") == "R")
        .join(sole.select("l_orderkey"), "l_orderkey")
        .join(ords_f, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )
