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

pytestmark = pytest.mark.skipif(
    not BOOTSTRAP,
    reason="live Kafka test: set FRIZZLE_KAFKA_BOOTSTRAP=<broker:port> "
    "(and put the spark-sql-kafka connector on the classpath) to run",
)


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
