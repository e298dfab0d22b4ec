"""Bucketed co-located join: the write-once-shuffle-never layout.

The gate: a fact-fact equi-join between two tables bucketed on the join
key must contain NO Exchange in its physical plan — the bucket layout
replaces the runtime shuffle.  Values are still differentially checked
against the plain (shuffling) join.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from frizzle_spark.sources.bucketed import read_bucketed, write_bucketed
from frizzle_spark.sources.tables import load_table


@pytest.fixture()
def no_broadcast(spark):
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path, no_broadcast):
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    write_bucketed(orders, "b_orders", str(tmp_path / "b_orders"), ["o_custkey"], 8)
    write_bucketed(cust, "b_cust", str(tmp_path / "b_cust"), ["c_custkey"], 8)

    joined = read_bucketed(spark, "b_orders").join(
        read_bucketed(spark, "b_cust"),
        F.col("o_custkey") == F.col("c_custkey"),
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "SortMergeJoin" in plan

    # same rows as the plain shuffling join
    plain = orders.join(cust, F.col("o_custkey") == F.col("c_custkey"))
    assert joined.count() == plain.count()
    a = joined.agg(F.round(F.sum("o_totalprice"), 2)).collect()[0][0]
    b = plain.agg(F.round(F.sum("o_totalprice"), 2)).collect()[0][0]
    assert a == b

    # groupBy on the bucket key also rides the layout: no exchange
    agg = read_bucketed(spark, "b_orders").groupBy("o_custkey").count()
    agg_plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in agg_plan, agg_plan

    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_cust")


def test_clustered_write_disjoint_ranges_and_pruning(spark, tmp_path):
    """Range-clustered layout: parquet footer min/max of the cluster
    column must be pairwise disjoint across files (that disjointness IS
    the pruning guarantee), and a point-predicate scan must read fewer
    files than the file count."""
    import glob

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from frizzle_spark.sources.bucketed import write_clustered
    from frizzle_spark.sources.tables import load_table

    ev = load_table(spark, "/root/testdata/sf0.01", "events").select(
        "event_id", "user_id", "value"
    )
    path = str(tmp_path / "events_clustered")
    write_clustered(ev, path, ["user_id"], partitions=8)

    ranges = []
    for f in glob.glob(f"{path}/part-*.parquet"):
        md = pq.read_metadata(f)
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            col = next(
                md.row_group(rg).column(i)
                for i in range(md.num_columns)
                if md.row_group(rg).column(i).path_in_schema == "user_id"
            )
            mins.append(col.statistics.min)
            maxs.append(col.statistics.max)
        ranges.append((min(mins), max(maxs)))
    ranges.sort()
    assert len(ranges) >= 4
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, f"overlapping file ranges {(lo1, hi1)} {(lo2, hi2)}"

    # point-predicate locality: all of one key's rows live in ONE file
    # (disjoint ranges above are what lets the scan skip the rest)
    probe = (
        spark.read.parquet(path)
        .where(F.col("user_id") == 7)
        .select(F.input_file_name().alias("f"))
        .distinct()
    )
    assert probe.count() == 1


def test_zorder_bounds_both_dimensions(spark, tmp_path):
    """Z-ordered files must have tight per-file min/max stats in BOTH
    clustered columns (each file ≈ one z hyper-rectangle, modulo files
    straddling quadrant seams), where single-key clustering leaves the
    non-leading column spanning its whole domain in every file."""
    import glob

    import pyarrow.parquet as pq

    from frizzle_spark.sources.bucketed import write_clustered, write_zordered
    from frizzle_spark.sources.tables import load_table

    ev = load_table(spark, "/root/testdata/sf0.01", "events").select(
        "event_id", "user_id", "value"
    )

    def spans(path, col, domain):
        out = []
        for f in glob.glob(f"{path}/part-*.parquet"):
            md = pq.read_metadata(f)
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                c = next(
                    md.row_group(rg).column(i)
                    for i in range(md.num_columns)
                    if md.row_group(rg).column(i).path_in_schema == col
                )
                mins.append(c.statistics.min)
                maxs.append(c.statistics.max)
            out.append((max(maxs) - min(mins)) / domain)
        return out

    zpath = str(tmp_path / "events_z")
    write_zordered(
        ev, zpath, [("user_id", 0, 149), ("value", 0.01, 490.02)], partitions=16
    )
    u_spans = spans(zpath, "user_id", 149.0)
    v_spans = spans(zpath, "value", 490.0)
    assert len(u_spans) >= 8
    # most files sit inside one z quadrant: bounded in BOTH dims at once
    assert sum(s <= 0.6 for s in u_spans) / len(u_spans) >= 0.75, u_spans
    assert sum(s <= 0.6 for s in v_spans) / len(v_spans) >= 0.75, v_spans

    # the single-key baseline: clustering by user_id alone does nothing
    # for value — its per-file spans must be materially wider than the
    # z-ordered layout's
    cpath = str(tmp_path / "events_c")
    write_clustered(ev, cpath, ["user_id"], partitions=16)
    cv = spans(cpath, "value", 490.0)
    med = lambda xs: sorted(xs)[len(xs) // 2]
    assert med(cv) > 1.5 * med(v_spans), (med(cv), med(v_spans))


def test_zorder_key_guards_fail_loudly(spark):
    """ADVICE r5: bits*len(specs) > 64 silently wraps shiftleft (a
    corrupted layout, no error) and hi <= lo makes NaN buckets collapse
    to 0 — both must raise instead."""
    import pytest as _pytest

    from frizzle_spark.sources.bucketed import zorder_key

    with _pytest.raises(ValueError, match="exceeds the 64-bit key"):
        zorder_key([(f"c{i}", 0.0, 1.0) for i in range(5)], bits=16)
    with _pytest.raises(ValueError, match="degenerate range"):
        zorder_key([("a", 0.0, 1.0), ("b", 7.0, 7.0)], bits=16)
    # the documented safe alternative for many columns still works
    assert zorder_key([(f"c{i}", 0.0, 1.0) for i in range(5)], bits=12) is not None
