"""CSV/JSON scan round-trips and skew-mitigation equivalence tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from frizzle_spark.operators.skew import salted_join, two_phase_agg
from frizzle_spark.sources.files import scan_csv, scan_json, scan_parquet
from frizzle_spark.sources.tables import load_table

ORDERS_SCHEMA = (
    "o_orderkey long, o_custkey long, o_orderstatus string,"
    " o_totalprice double, o_orderdate timestamp_ntz, o_orderpriority string"
)


def _sorted_rows(df, *cols):
    return [tuple(r) for r in df.orderBy(*cols).collect()]


@pytest.fixture(scope="module")
def orders(spark, sf_dir):
    return load_table(spark, sf_dir, "orders")


def test_csv_scan_round_trip(spark, orders, tmp_path):
    path = str(tmp_path / "orders_csv")
    orders.write.option("header", True).csv(path)
    back = scan_csv(spark, path, ORDERS_SCHEMA)
    assert _sorted_rows(back, "o_orderkey") == _sorted_rows(orders, "o_orderkey")


def test_json_scan_round_trip(spark, orders, tmp_path):
    path = str(tmp_path / "orders_json")
    orders.write.json(path)
    back = scan_json(spark, path, ORDERS_SCHEMA)
    assert _sorted_rows(back, "o_orderkey") == _sorted_rows(orders, "o_orderkey")


def test_parquet_scan_matches_load_table(spark, sf_dir):
    a = scan_parquet(spark, f"{sf_dir}/orders.parquet")
    b = load_table(spark, sf_dir, "orders")
    assert a.count() == b.count() and a.schema == b.schema


def test_salted_join_matches_plain(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    plain = orders.join(cust, "o_custkey").select("o_orderkey", "c_name")
    salted = salted_join(orders, cust, ["o_custkey"]).select("o_orderkey", "c_name")
    assert _sorted_rows(salted, "o_orderkey") == _sorted_rows(plain, "o_orderkey")


def test_salted_left_join_keeps_unmatched(spark):
    big = spark.createDataFrame([(1, "a"), (2, "b"), (99, "z")], ["k", "v"])
    small = spark.createDataFrame([(1, "x"), (2, "y")], ["k", "w"])
    out = salted_join(big, small, ["k"], how="left")
    rows = {(r["k"], r["w"]) for r in out.collect()}
    assert rows == {(1, "x"), (2, "y"), (99, None)}


def test_two_phase_agg_matches_plain(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    plain = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("l_quantity").alias("qty"),
        F.min("l_shipdate").alias("first_ship"),
        F.max("l_shipdate").alias("last_ship"),
    )
    skewsafe = two_phase_agg(
        li,
        ["l_returnflag"],
        {
            "n": (F.count(F.lit(1)), "sum"),
            "qty": (F.sum("l_quantity"), "sum"),
            "first_ship": (F.min("l_shipdate"), "min"),
            "last_ship": (F.max("l_shipdate"), "max"),
        },
    )
    assert _sorted_rows(skewsafe, "l_returnflag") == _sorted_rows(plain, "l_returnflag")


def test_two_phase_agg_rejects_non_decomposable(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    with pytest.raises(ValueError, match="non-decomposable"):
        two_phase_agg(li, ["l_returnflag"], {"a": F.avg("l_quantity")}).collect()


def test_two_phase_agg_rejects_unknown_combiner(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    with pytest.raises(ValueError, match="unknown combiner"):
        two_phase_agg(
            li, ["l_returnflag"], {"a": (F.avg("l_quantity"), "avg")}
        ).collect()


def test_salted_join_rejects_right_full(spark, sf_dir):
    big = load_table(spark, sf_dir, "orders")
    small = load_table(spark, sf_dir, "customer").withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    for how in ("right", "full", "outer"):
        with pytest.raises(ValueError, match="salted_join supports"):
            salted_join(big, small, ["o_custkey"], how=how)


def test_partitioned_write_prunes_directories(spark, orders, tmp_path):
    # hive-style partitioned layout: a filter on the partition column
    # must prune directories at planning time (PartitionFilters on the
    # scan), never read-then-filter — at 100 TB this is the difference
    # between scanning one status directory and scanning everything
    path = str(tmp_path / "orders_by_status")
    orders.write.partitionBy("o_orderstatus").parquet(path)
    df = spark.read.parquet(path).where(F.col("o_orderstatus") == "F")
    plan = df._jdf.queryExecution().executedPlan().toString()
    pf = plan[plan.index("PartitionFilters: [") :]
    pf = pf[: pf.index("]")]
    assert "o_orderstatus" in pf, plan
    assert df.count() == orders.where(F.col("o_orderstatus") == "F").count()


def test_orc_scan_round_trip(spark, orders, tmp_path):
    from frizzle_spark.sources.files import scan_orc, write_orc

    path = str(tmp_path / "orders_orc")
    write_orc(orders, path)
    back = scan_orc(spark, path)
    assert _sorted_rows(back, "o_orderkey") == _sorted_rows(orders, "o_orderkey")
    # columnar contract: filters reach the ORC scan as pushed filters
    plan = (
        back.where(F.col("o_orderkey") == 1)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PushedFilters: [" in plan and "o_orderkey" in plan.split("PushedFilters:")[1][:200]


def test_avro_clear_error_without_module(spark, tmp_path):
    from frizzle_spark.sources.files import scan_avro

    with pytest.raises(NotImplementedError, match="spark-avro"):
        scan_avro(spark, str(tmp_path / "nope.avro"))


def test_lenient_scan_skips_corrupt_file_strict_raises(spark, orders, tmp_path):
    """A truncated parquet object must fail the strict scan loudly but
    be skipped by the lenient scan (per-read option, not a session-wide
    conf), which still returns every row of the intact files."""
    import glob
    import os

    from frizzle_spark.sources.files import scan_parquet, scan_parquet_lenient

    path = str(tmp_path / "orders_mixed")
    orders.coalesce(1).write.parquet(path)
    part = glob.glob(f"{path}/part-*.parquet")[0]
    with open(part, "rb") as f:
        blob = f.read()
    with open(f"{path}/part-9999-corrupt.parquet", "wb") as f:
        f.write(blob[: len(blob) // 2])  # no footer -> corrupt

    with pytest.raises(Exception):
        scan_parquet(spark, path).count()
    good = scan_parquet_lenient(spark, path, schema=orders.schema)
    assert good.count() == orders.count()
    # the per-read option must not leak into the session config
    assert (
        spark.conf.get("spark.sql.files.ignoreCorruptFiles", "false") == "false"
    )
    os.remove(f"{path}/part-9999-corrupt.parquet")


def test_events_raw_schema_does_not_mutate_session(spark, sf_dir):
    """VERDICT r5 hygiene: the schema GETTER must not leave nanosAsLong
    set session-wide; scan sites opt in explicitly via
    enable_nanos_scan, and the scoped getter still returns the same
    schema a scan under the conf produces."""
    from frizzle_spark.sources.tables import (
        _NANOS_CONF,
        enable_nanos_scan,
        events_raw_schema,
    )

    spark.conf.unset(_NANOS_CONF)
    schema = events_raw_schema(spark, sf_dir)
    assert spark.conf.get(_NANOS_CONF, None) is None, "getter leaked the conf"
    # a prior value must be restored, not unset
    spark.conf.set(_NANOS_CONF, "true")
    events_raw_schema(spark, sf_dir)
    assert spark.conf.get(_NANOS_CONF) == "true"
    # the explicit scan-site opt-in makes the read work with that schema
    enable_nanos_scan(spark)
    n = spark.read.schema(schema).parquet(f"{sf_dir}/events.parquet").count()
    assert n > 0
    spark.conf.unset(_NANOS_CONF)


def test_schema_evolution_scan(spark, tmp_path):
    """scan_parquet_evolving: old files missing a later-added column
    must read as NULL under a declared schema (no footer sweep), and
    mergeSchema discovery must union the generations; the strict scan's
    silent column drop is what both modes exist to prevent."""
    from frizzle_spark.sources.files import scan_parquet_evolving

    base = str(tmp_path / "evolving")
    spark.createDataFrame(
        [(1, "a"), (2, "b")], "id long, name string"
    ).write.parquet(f"{base}/gen=0")
    spark.createDataFrame(
        [(3, "c", 0.5), (4, "d", 0.9)], "id long, name string, score double"
    ).write.parquet(f"{base}/gen=1")

    declared = "id long, name string, score double"
    got = scan_parquet_evolving(
        spark, f"{base}/gen=0", f"{base}/gen=1", schema=declared
    )
    rows = {r["id"]: r["score"] for r in got.collect()}
    assert rows == {1: None, 2: None, 3: 0.5, 4: 0.9}

    merged = scan_parquet_evolving(spark, f"{base}/gen=0", f"{base}/gen=1")
    assert set(merged.columns) == {"id", "name", "score"}
    assert merged.count() == 4
    # declared-schema mode also prunes columns the reader doesn't want
    slim = scan_parquet_evolving(spark, f"{base}/gen=1", schema="id long")
    assert slim.columns == ["id"]


def test_salted_topk_equals_plain_window(spark, sf_dir):
    """Per-group top-k is salted-mergeable: the salted two-phase result
    must equal the plain window EXACTLY, on real data and on a
    synthetically hot key — and the equality must hold regardless of
    the random salt assignment (correctness is salt-independent; only
    load balance depends on it)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from frizzle_spark.operators.skew import salted_topk
    from frizzle_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").select("event_type", "value", "event_id")
    # synthetic hot key: replicate 'purchase' rows 20×
    hot = ev.where(F.col("event_type") == "purchase").crossJoin(
        spark.range(20).select((F.col("id") + 1_000_000).alias("bump"))
    ).select(
        "event_type", "value", (F.col("event_id") * 100 + F.col("bump")).alias("event_id")
    )
    df = ev.unionByName(hot)

    got = {
        (r["event_type"], r["rank"], r["event_id"])
        for r in salted_topk(df, ["event_type"], "value", 7, "event_id").collect()
    }
    w = Window.partitionBy("event_type").orderBy(F.desc("value"), F.asc("event_id"))
    want = {
        (r["event_type"], r["rank"], r["event_id"])
        for r in df.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= 7)
        .collect()
    }
    assert got == want


def test_join_strategy_hints_are_honored(spark, sf_dir):
    """The hint surface: MERGE forces SortMergeJoin and SHUFFLE_HASH
    forces ShuffledHashJoin on a join AQE would otherwise broadcast —
    the manual override lane for when statistics mislead at scale."""
    from pyspark.sql import functions as F

    from frizzle_spark.sources.tables import load_table

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    for hint, marker in (("merge", "SortMergeJoin"), ("shuffle_hash", "ShuffledHashJoin")):
        j = orders.join(cust.hint(hint), orders["o_custkey"] == cust["c_custkey"])
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert marker in plan, f"hint {hint} not honored:\n{plan[:500]}"
        assert "BroadcastHashJoin" not in plan
