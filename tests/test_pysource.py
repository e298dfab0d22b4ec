"""Python Data Source API connector gates: deterministic batch read,
filter-pushdown handshake, and offset-based streaming with replayable
ranges — the modern no-JVM answer to the reference's pluggable Source
interface (reference msg.go:22-31)."""

from __future__ import annotations

from pyspark.sql import functions as F

from frizzle_spark.sources.pysource import EVENT_TYPES, _row, register


def test_batch_read_deterministic_and_partitioned(spark):
    register(spark)
    rd = lambda: (
        spark.read.format("frizzle_events")
        .option("n_rows", 500)
        .option("n_partitions", 8)
        .load()
    )
    a = rd().collect()
    b = rd().collect()
    assert len(a) == 500
    assert sorted(a) == sorted(b)  # same options → same table, any run
    assert rd().rdd.getNumPartitions() == 8  # generation fans out
    # rows equal the reference generator exactly (executors run the
    # same pure function of (seed, i))
    got = {r["event_id"]: (r["user_id"], r["event_type"], r["value"]) for r in a}
    for i in (0, 123, 499):
        want = _row(7, i, 50)
        assert got[i] == (want[2], want[3], want[4])


def test_filter_pushdown_handshake(spark):
    """The EqualTo on event_type must be CONSUMED by the reader (no
    event_type equality Filter left in the plan) and the result must
    equal the unfiltered read filtered after the fact."""
    register(spark)
    # NOTE: pushFilters mutates the per-scan reader instance, so every
    # query gets its own .load() relation (sharing one DataFrame across
    # differently-filtered queries would leak one query's pushed filter
    # into another — by API design the reader is per-scan state).
    load = lambda: (
        spark.read.format("frizzle_events").option("n_rows", 500).load()
    )
    rows = load().collect()
    pushed = load().where(F.col("event_type") == "click")
    plan = pushed._jdf.queryExecution().executedPlan().toString()
    assert "BatchScan frizzle_events" in plan
    assert "= click" not in plan, f"equality not consumed:\n{plan}"
    want = [r for r in rows if r["event_type"] == "click"]
    assert sorted(pushed.collect()) == sorted(want)
    # an unsupported filter (inequality) stays a Spark-side Filter and
    # still answers correctly
    kept = load().where(F.col("value") > 100.0)
    plan2 = kept._jdf.queryExecution().executedPlan().toString()
    assert "Filter" in plan2 and "100.0" in plan2
    assert kept.count() == sum(1 for r in rows if r["value"] > 100.0)


def test_stream_read_drains_deterministically(spark, tmp_path):
    """Offset-based streaming: batch_rows per trigger; the union of
    the micro-batches is
    exactly rows [0, n_rows) — same rows the batch read produces."""
    register(spark)
    stream = (
        spark.readStream.format("frizzle_events")
        .option("n_rows", 300)
        .option("batch_rows", 120)
        .load()
    )
    name = "pysource_stream_sink"
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    # PythonMicroBatchStream doesn't support Trigger.AvailableNow (WARN
    # + single-batch fallback) — drain with processAllAvailable: the
    # generator head advances batch_rows per poll and caps at n_rows,
    # so this returns once every micro-batch is committed.
    q.processAllAvailable()
    q.stop()
    got = spark.table(name).collect()
    assert len(got) == 300
    assert {r["event_id"] for r in got} == set(range(300))
    batch = (
        spark.read.format("frizzle_events").option("n_rows", 300).load().collect()
    )
    assert sorted(got) == sorted(batch)


def test_json_sink_two_phase_commit(spark, tmp_path):
    """Write side: per-task temp files + driver manifest publish.
    Success → manifest lists exactly the committed files and the
    read-back equals the input; injected task failure → the job
    raises, NO manifest appears, and readers (who trust only the
    manifest) see nothing."""
    import os

    import pytest as _pytest

    from frizzle_spark.sources.pysource import read_json_sink, register_sink

    register_sink(spark)
    register(spark)
    src = (
        spark.read.format("frizzle_events")
        .option("n_rows", 200)
        .option("n_partitions", 4)
        .load()
    )
    good = str(tmp_path / "sink_ok")
    src.write.format("frizzle_json_sink").option("path", good).mode("append").save()
    rows = read_json_sink(good)
    assert len(rows) == 200
    assert {r["event_id"] for r in rows} == set(range(200))
    want = {r["event_id"]: r["value"] for r in src.collect()}
    assert all(want[r["event_id"]] == r["value"] for r in rows)

    bad = str(tmp_path / "sink_fail")
    with _pytest.raises(Exception):
        (
            src.write.format("frizzle_json_sink")
            .option("path", bad)
            .option("fail_on_value", "150")
            .mode("append")
            .save()
        )
    assert not os.path.exists(os.path.join(bad, "manifest.json"))
    with _pytest.raises(FileNotFoundError):
        read_json_sink(bad)
