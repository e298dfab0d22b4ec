"""Opt-in LIVE Kafka round-trip test (VERDICT r2 'Next round' #4).

The sandbox has no broker and OSS pyspark does not bundle the Kafka
connector, so this module SKIPS unless both are provided:

    export FRIZZLE_KAFKA_BOOTSTRAP=broker1:9092
    # connector on the classpath, e.g.:
    export PYSPARK_SUBMIT_ARGS="--packages \
        org.apache.spark:spark-sql-kafka-0-10_2.13:4.1.2 pyspark-shell"
    pytest tests/test_kafka_integration.py -q

What it proves on a real cluster: the exact option set from
``KafkaSource.reader_options`` connects, ``KafkaSink.to_wire``'s
(key, value, topic) wire mapping produces records the source maps back
through ``to_envelope`` to the identical frizzle envelope — the full
produce→consume bus loop the reference integration-tests in-process
(reference frizzle_integration_test.go:82-131).  The broker-free halves
of both mappings are unit-gated in test_pipeline_golden.py, so this
test's marginal value is the live wire itself.
"""

from __future__ import annotations

import os
import uuid

import pytest
from pyspark.sql import functions as F

BOOTSTRAP = os.environ.get("FRIZZLE_KAFKA_BOOTSTRAP")

live = pytest.mark.skipif(
    not BOOTSTRAP,
    reason="live Kafka test: set FRIZZLE_KAFKA_BOOTSTRAP=<broker:port> "
    "(and put the spark-sql-kafka connector on the classpath) to run",
)


@live
def test_kafka_round_trip_envelope(spark, tmp_path):
    from frizzle_spark.streaming.pipeline import ENVELOPE, KafkaSink, KafkaSource

    topic = f"frizzle_it_{uuid.uuid4().hex[:8]}"
    rows = [
        ("m1", b"payload-one", None, None),
        ("m2", b"payload-two", None, None),
        ("m3", b"payload-three", None, None),
    ]
    df = spark.createDataFrame(rows, ENVELOPE)

    sink = KafkaSink(brokers=BOOTSTRAP, default_topic=topic)
    sink.write(df, default_dest=topic)

    source = KafkaSource(
        brokers=BOOTSTRAP,
        subscribe=topic,
        options={"startingOffsets": "earliest"},
    )
    name = f"kafka_rt_{topic}"
    q = (
        source.load(spark)
        .writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "kafka read did not drain in 120s"

    got = {
        (r["id"], bytes(r["data"]))
        for r in spark.table(name).select("id", "data").collect()
    }
    assert got == {(i, d) for i, d, _, _ in rows}
    # ts must be a real broker timestamp, dest re-enters unrouted
    out = spark.table(name).select("ts", "dest").collect()
    assert all(r["ts"] is not None for r in out)
    assert all(r["dest"] is None for r in out)


@live
def test_kafka_pipeline_chain_to_parquet(spark, tmp_path):
    """Bus chaining over the live wire: Kafka source → Pipeline routing
    → ParquetSink, the reference's produce→bus→sink golden path."""
    from frizzle_spark.streaming.pipeline import (
        ENVELOPE,
        KafkaSink,
        KafkaSource,
        ParquetSink,
        Pipeline,
    )

    topic = f"frizzle_it_{uuid.uuid4().hex[:8]}"
    df = spark.createDataFrame(
        [("ok1", b"x", None, None), ("fail", b"z", None, None)], ENVELOPE
    )
    KafkaSink(brokers=BOOTSTRAP, default_topic=topic).write(df, default_dest=topic)

    sink = ParquetSink(str(tmp_path / "sink"))
    dlq = ParquetSink(str(tmp_path / "dlq"))
    pipe = Pipeline(
        spark,
        source=KafkaSource(
            brokers=BOOTSTRAP, subscribe=topic,
            options={"startingOffsets": "earliest"},
        ),
        sink=sink,
        default_dest="main",
        fail_sink=(dlq, "dead"),
        fail_predicate=F.col("id") == "fail",
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q = pipe.start(trigger={"availableNow": True})
    assert q.awaitTermination(120)
    pipe.stop()

    assert {r["id"] for r in spark.read.parquet(sink.base_path).collect()} == {"ok1"}
    assert {r["id"] for r in spark.read.parquet(dlq.base_path).collect()} == {"fail"}


# ---------------------------------------------------------------------------
# Broker-free wire-path tests (no env gate): the fakekafka data source
# speaks the exact Kafka wire contract on both sides, so everything
# below broker I/O — to_wire, KAFKA_WIRE_SCHEMA, to_envelope, Pipeline
# routing, offset-log exactly-once restart — runs for real in-sandbox.
# ---------------------------------------------------------------------------


def _drain(q):
    q.processAllAvailable()  # Python streams don't support AvailableNow
    q.stop()


def test_fakekafka_round_trip_envelope(spark, tmp_path):
    """Mirror of the live round-trip test over the fake log: the REAL
    to_wire and to_envelope mappings, end to end."""
    from frizzle_spark.sources.fakekafka import FakeKafkaSink, FakeKafkaSource
    from frizzle_spark.streaming.pipeline import ENVELOPE

    topic = f"frizzle_fake_{uuid.uuid4().hex[:8]}"
    log_dir = str(tmp_path / "log")
    rows = [
        ("m1", b"payload-one", None, None),
        ("m2", b"payload-two", None, None),
        ("m3", b"payload-three", None, None),
    ]
    df = spark.createDataFrame(rows, ENVELOPE)
    FakeKafkaSink(log_dir, default_topic=topic).write(df, default_dest=topic)

    name = f"fake_rt_{topic}"
    q = (
        FakeKafkaSource(log_dir, subscribe=topic)
        .load(spark)
        .writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    _drain(q)
    got = {
        (r["id"], bytes(r["data"]))
        for r in spark.table(name).select("id", "data").collect()
    }
    assert got == {(i, d) for i, d, _, _ in rows}
    out = spark.table(name).select("ts", "dest").collect()
    assert all(r["ts"] is not None for r in out)
    assert all(r["dest"] is None for r in out)


def test_fakekafka_dest_routes_topic(spark, tmp_path):
    """dest column → topic routing through to_wire: rows with distinct
    dests land on distinct topics, unrouted rows on the default."""
    from frizzle_spark.sources.fakekafka import FakeKafkaSink, FakeKafkaSource
    from frizzle_spark.streaming.pipeline import ENVELOPE

    log_dir = str(tmp_path / "log")
    df = spark.createDataFrame(
        [
            ("a", b"1", None, "topic_x"),
            ("b", b"2", None, "topic_y"),
            ("c", b"3", None, None),
        ],
        ENVELOPE,
    )
    FakeKafkaSink(log_dir, default_topic="topic_default").write(df, default_dest=None)

    for topic, want in (
        ("topic_x", {"a"}),
        ("topic_y", {"b"}),
        ("topic_default", {"c"}),
    ):
        name = f"fake_route_{topic}"
        q = (
            FakeKafkaSource(log_dir, subscribe=topic)
            .load(spark)
            .writeStream.format("memory")
            .queryName(name)
            .option("checkpointLocation", str(tmp_path / f"ckpt_{topic}"))
            .start()
        )
        _drain(q)
        assert {r["id"] for r in spark.table(name).collect()} == want


def test_fakekafka_full_pipeline_with_restart(spark, tmp_path):
    """The FULL Pipeline over the fake wire (VERDICT r6 #4): envelope →
    separator transform → DLQ routing → parquet sinks, then MORE
    produces and a RESTARTED Pipeline on the same checkpoint — only the
    new messages may be delivered (offset-log exactly-once), and the
    fresh stream reader must resume from the durable head."""
    from frizzle_spark.sources.fakekafka import FakeKafkaSink, FakeKafkaSource
    from frizzle_spark.streaming.pipeline import ENVELOPE, ParquetSink, Pipeline
    from frizzle_spark.streaming.transforms import sep_transformer

    topic = f"frizzle_pipe_{uuid.uuid4().hex[:8]}"
    log_dir = str(tmp_path / "log")
    producer = FakeKafkaSink(log_dir, default_topic=topic)
    producer.write(
        spark.createDataFrame(
            [("ok1", b"x", None, None), ("fail", b"z", None, None)], ENVELOPE
        ),
        default_dest=topic,
    )

    sink = ParquetSink(str(tmp_path / "sink"))
    dlq = ParquetSink(str(tmp_path / "dlq"))

    def make_pipe():
        return Pipeline(
            spark,
            source=FakeKafkaSource(log_dir, subscribe=topic),
            sink=sink,
            default_dest="main",
            fail_sink=(dlq, "dead"),
            fail_predicate=F.col("id").startswith("fail"),
            transformers=[sep_transformer(b"\n")],
            checkpoint_dir=str(tmp_path / "ckpt"),
        )

    pipe = make_pipe()
    q = pipe.start(trigger={"processingTime": "0 seconds"})
    q.processAllAvailable()
    pipe.stop()

    assert {r["id"] for r in spark.read.parquet(sink.base_path).collect()} == {"ok1"}
    assert {r["id"] for r in spark.read.parquet(dlq.base_path).collect()} == {"fail"}
    # separator transform round-trip: send-side appended, receive-side
    # stripped on the NEXT hop — the sink sees the appended form
    sent = {
        bytes(r["data"])
        for r in spark.read.parquet(sink.base_path).select("data").collect()
    }
    assert sent == {b"x\n"}

    # second wave + restarted pipeline on the SAME checkpoint
    producer.write(
        spark.createDataFrame(
            [("ok2", b"y", None, None), ("fail2", b"w", None, None)], ENVELOPE
        ),
        default_dest=topic,
    )
    pipe2 = make_pipe()
    q2 = pipe2.start(trigger={"processingTime": "0 seconds"})
    q2.processAllAvailable()
    pipe2.stop()

    main_ids = [r["id"] for r in spark.read.parquet(sink.base_path).collect()]
    dlq_ids = [r["id"] for r in spark.read.parquet(dlq.base_path).collect()]
    assert sorted(main_ids) == ["ok1", "ok2"], main_ids  # no redelivery
    assert "fail2" in dlq_ids and len([i for i in dlq_ids if i == "fail"]) == 1
