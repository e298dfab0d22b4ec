"""Gates for the distributed global order statistics
(frizzle_spark/operators/ranks.py, round 9 — grown out of the
full-registry sf10 run flagging qz26_rfm's global-ntile
single-partition sort as the registry's only superlinear plan).

Three contracts:

* IDENTITY — the DISTRIBUTED branch of global_row_number /
  global_ntile / global_running_sum is value-identical to the naive
  unpartitioned window on every corner the formula has (ties,
  descending, n<k, n=k, empty, single bucket via degenerate
  boundaries).
* AUTO — the default mode is the two-stage switch: plan-size
  estimate gate (zero added machinery below GLOBAL_SORT_MAX_EST_BYTES),
  then an exact count gate at GLOBAL_SORT_MAX_ROWS for estimate-large
  inputs (both branches are identical anyway; the switch is constants
  only).
* PLAN — the distributed branch's big-table window is partitioned by
  the percentile bucket (no Exchange SinglePartition sorts the
  input), and qz26_rfm forced past the threshold plans no ntile() at
  all.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from frizzle_spark.operators import ranks
from frizzle_spark.operators.ranks import (
    global_ntile,
    global_row_number,
    global_running_sum,
)


@pytest.fixture(scope="module")
def corpus(spark):
    random.seed(1234)
    rows = [(i, random.randint(0, 40), random.random()) for i in range(7333)]
    return spark.createDataFrame(rows, "k long, a long, x double").repartition(8)


def _mismatches(naive, got, keys=("k", "a", "x"), col="rn"):
    n, g = naive.alias("n"), got.alias("g")
    return (
        n.join(g, list(keys))
        .where(F.col(f"n.{col}") != F.col(f"g.{col}"))
        .count()
    )


def test_row_number_matches_naive_asc_with_ties(corpus):
    order = [F.asc("a"), F.asc("k")]
    naive = corpus.withColumn(
        "rn", F.row_number().over(Window.orderBy(*order)).cast("long")
    )
    got = global_row_number(corpus, "a", order, out="rn", distributed=True)
    assert _mismatches(naive, got) == 0


def test_row_number_matches_naive_desc(corpus):
    order = [F.desc("x"), F.asc("k")]
    naive = corpus.withColumn(
        "rn", F.row_number().over(Window.orderBy(*order)).cast("long")
    )
    got = global_row_number(
        corpus, "x", order, out="rn", descending=True, distributed=True
    )
    assert _mismatches(naive, got) == 0


@pytest.mark.parametrize("k", [2, 5, 7])
def test_ntile_matches_naive(corpus, k):
    order = [F.asc("a"), F.asc("k")]
    naive = corpus.withColumn(
        "t", F.ntile(k).over(Window.orderBy(*order)).cast("long")
    )
    got = global_ntile(corpus, k, "a", order, out="t", distributed=True)
    assert _mismatches(naive, got, col="t") == 0


def test_ntile_matches_naive_desc(corpus):
    order = [F.desc("a"), F.asc("k")]
    naive = corpus.withColumn(
        "t", F.ntile(5).over(Window.orderBy(*order)).cast("long")
    )
    got = global_ntile(
        corpus, 5, "a", order, out="t", descending=True, distributed=True
    )
    assert _mismatches(naive, got, col="t") == 0


def test_running_sum_matches_naive_both_directions(corpus):
    for descending, order in (
        (False, [F.asc("a"), F.asc("k")]),
        (True, [F.desc("a"), F.asc("k")]),
    ):
        w = Window.orderBy(*order).rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        naive = corpus.withColumn("run", F.sum("x").over(w))
        got = global_running_sum(
            corpus, "x", "a", order, out="run",
            descending=descending, distributed=True,
        )
        # double prefix sums re-associate across buckets — compare on a
        # grid far above eps*n yet far below any value scale
        n, g = naive.alias("n"), got.alias("g")
        bad = (
            n.join(g, ["k", "a", "x"])
            .where(F.abs(F.col("n.run") - F.col("g.run")) > 1e-9)
            .count()
        )
        assert bad == 0


def test_running_sum_long_is_exact(corpus):
    order = [F.asc("a"), F.asc("k")]
    w = Window.orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    naive = corpus.withColumn("run", F.sum("a").over(w))
    got = global_running_sum(
        corpus, "a", "a", order, out="run", distributed=True
    )
    assert _mismatches(naive, got, col="run") == 0


def test_auto_picks_naive_below_threshold_distributed_above(corpus, monkeypatch):
    order = [F.asc("a"), F.asc("k")]
    # a local-collection corpus has NO size estimate (Long.Max), so the
    # estimate gate falls through to the exact count gate: 7333 rows
    # below GLOBAL_SORT_MAX_ROWS -> naive branch, plain unpartitioned
    # window (no __bucket anywhere)
    auto_small = global_row_number(corpus, "a", order, out="rn")
    plan = auto_small._jdf.queryExecution().executedPlan().toString()
    assert "__bucket" not in plan
    # force the count threshold to zero -> distributed branch, same values
    monkeypatch.setattr(ranks, "GLOBAL_SORT_MAX_ROWS", 0)
    auto_big = global_row_number(corpus, "a", order, out="rn")
    plan_big = auto_big._jdf.queryExecution().executedPlan().toString()
    assert "__bucket" in plan_big
    assert _mismatches(auto_small, auto_big) == 0


def test_auto_estimate_gate_is_free_for_parquet_inputs(spark, sf_dir):
    # a parquet-backed aggregate HAS a plan-size estimate; at test scale
    # it sits far below GLOBAL_SORT_MAX_EST_BYTES, so AUTO must take the
    # naive branch without adding checkpoint/count machinery: the plan
    # is the plain window over the aggregate, nothing else
    from frizzle_spark.sources.tables import load_table

    totals = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("k"))
        .agg(F.sum("o_totalprice").alias("x"))
    )
    got = global_row_number(totals, "x", [F.asc("x"), F.asc("k")], out="rn")
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "__bucket" not in plan
    assert "Scan ExistingRDD" not in plan  # no checkpoint was inserted


def test_ntile_n_below_k_gives_singleton_tiles(spark):
    small = spark.createDataFrame([(1, 10), (2, 20), (3, 30)], "k long, a long")
    got = global_ntile(
        small, 5, "a", [F.asc("a"), F.asc("k")], out="t", distributed=True
    )
    assert [(r.a, r.t) for r in got.orderBy("a").collect()] == [
        (10, 1), (20, 2), (30, 3)
    ]


def test_ntile_n_equals_k(spark):
    rows = [(i, i * 10) for i in range(5)]
    df = spark.createDataFrame(rows, "k long, a long")
    got = global_ntile(
        df, 5, "a", [F.asc("a"), F.asc("k")], out="t", distributed=True
    )
    assert [r.t for r in got.orderBy("a").collect()] == [1, 2, 3, 4, 5]


def test_empty_input_is_total(spark):
    empty = spark.createDataFrame([], "k long, a long")
    order = [F.asc("a"), F.asc("k")]
    for dist in (True, None):
        assert global_row_number(empty, "a", order, distributed=dist).count() == 0
        assert global_ntile(empty, 5, "a", order, distributed=dist).count() == 0


def test_single_bucket_degenerate_boundaries(spark):
    # all-equal primary: every percentile boundary collapses to the one
    # value, all rows land in one bucket — ranks must still be exact
    # (the tie-break key carries the whole order)
    rows = [(i, 7) for i in range(100)]
    df = spark.createDataFrame(rows, "k long, a long").repartition(4)
    got = global_row_number(
        df, "a", [F.asc("a"), F.asc("k")], out="rn", distributed=True
    )
    assert [r.rn for r in got.orderBy("k").collect()] == list(range(1, 101))


def test_plan_big_window_is_bucket_partitioned(corpus):
    got = global_row_number(
        corpus, "a", [F.asc("a"), F.asc("k")], out="rn", distributed=True
    )
    plan = got._jdf.queryExecution().executedPlan().toString()
    row_number_specs = [
        line
        for line in plan.splitlines()
        if "row_number()" in line and "windowspecdefinition" in line
    ]
    assert row_number_specs, "expected a row_number window in the plan"
    assert all("__bucket" in line for line in row_number_specs), (
        "the distributed branch must never plan an unpartitioned "
        "row_number window:\n" + plan
    )


def test_rfm_plans_no_global_ntile_past_threshold(spark, sf_dir, monkeypatch):
    from frizzle_spark.plans.registry import REGISTRY

    monkeypatch.setattr(ranks, "GLOBAL_SORT_MAX_EST_BYTES", -1)
    monkeypatch.setattr(ranks, "GLOBAL_SORT_MAX_ROWS", 0)
    df = REGISTRY["qz26_rfm"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ntile(" not in plan
    specs = [
        line
        for line in plan.splitlines()
        if "row_number()" in line and "windowspecdefinition" in line
    ]
    assert all("__bucket" in line for line in specs)


def test_rfm_auto_matches_forced_distributed(spark, sf_dir, monkeypatch):
    from frizzle_spark.plans.registry import REGISTRY

    base = {
        tuple(sorted(r.asDict().items()))
        for r in REGISTRY["qz26_rfm"].fn(spark, sf_dir).collect()
    }
    monkeypatch.setattr(ranks, "GLOBAL_SORT_MAX_EST_BYTES", -1)
    monkeypatch.setattr(ranks, "GLOBAL_SORT_MAX_ROWS", 0)
    forced = {
        tuple(sorted(r.asDict().items()))
        for r in REGISTRY["qz26_rfm"].fn(spark, sf_dir).collect()
    }
    assert base == forced


def test_purchase_gaps_routes_through_auto(spark, sf_dir, monkeypatch):
    """qz10_purchase_gaps (round 10): the last single-task global sort
    the r9 audit flagged now rides global_row_number's AUTO switch —
    small inputs keep the plain window; a forced-large input takes the
    bucketed one-exchange recipe with IDENTICAL output."""
    from frizzle_spark.plans.windows import qz10_purchase_gaps

    small = qz10_purchase_gaps(spark, sf_dir)
    plan_small = small._jdf.queryExecution().executedPlan().toString()
    assert "__bucket" not in plan_small  # AUTO stays naive at test scale
    want = [tuple(r) for r in small.collect()]

    monkeypatch.setattr(ranks, "GLOBAL_SORT_MAX_EST_BYTES", 0)
    monkeypatch.setattr(ranks, "GLOBAL_SORT_MAX_ROWS", 0)
    big = qz10_purchase_gaps(spark, sf_dir)
    plan_big = big._jdf.queryExecution().executedPlan().toString()
    assert "__bucket" in plan_big  # forced-large: bucketed recipe
    assert [tuple(r) for r in big.collect()] == want
