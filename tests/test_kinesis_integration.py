"""Broker-free Kinesis wire-path tests — the fakekinesis data source
speaks the OSS spark-sql-kinesis record shape on both sides, so
everything below AWS wire I/O runs for real in-sandbox:

* ``KinesisSink.to_wire``'s (data, partitionKey, streamName) PutRecords
  mapping (the production code, not a copy),
* the ``KINESIS_WIRE_SCHEMA`` record shape round-tripping through a
  registered Python Data Source stream reader,
* ``KinesisSource.to_envelope``'s projection back to the frizzle
  envelope (partitionKey→id, data→data, arrival ts→ts),
* dest-routed multi-stream fan-out,
* the FULL Pipeline (transforms → DLQ routing → parquet sinks) with a
  checkpoint restart proving offset-log exactly-once over the fake wire.

This closes the last "partial" in the r6 coverage table (O4: Kinesis
``.load()`` connector-gated) to the same bar fakekafka set for Kafka —
only the AWS connector wire itself remains untested, the identical
posture the reference takes by shipping Kinesis in the sibling repo
frinesis (frizzle.go:33-34).
"""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F


def _drain(q):
    q.processAllAvailable()  # Python streams don't support AvailableNow
    return q


def test_fakekinesis_round_trip_envelope(spark, tmp_path):
    """envelope → REAL KinesisSink.to_wire → fake stream → wire schema
    → REAL KinesisSource.to_envelope: ids/payloads survive, sequence
    numbers are monotonic, arrival timestamps are real and stable."""
    from frizzle_spark.sources.fakekinesis import FakeKinesisSink, FakeKinesisSource
    from frizzle_spark.streaming.pipeline import ENVELOPE

    stream = f"frizzle_kin_{uuid.uuid4().hex[:8]}"
    log_dir = str(tmp_path / "log")
    rows = [
        ("m1", b"payload-one", None, None),
        ("m2", b"payload-two", None, None),
        ("m3", b"payload-three", None, None),
    ]
    df = spark.createDataFrame(rows, ENVELOPE)
    FakeKinesisSink(log_dir, default_stream=stream).write(df, default_dest=stream)

    name = f"kin_rt_{stream}"
    q = (
        FakeKinesisSource(log_dir, stream_name=stream)
        .load(spark)
        .writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    _drain(q).stop()

    got = {
        (r["id"], bytes(r["data"]))
        for r in spark.table(name).select("id", "data").collect()
    }
    assert got == {(i, d) for i, d, _, _ in rows}
    out = spark.table(name).select("ts", "dest").collect()
    assert all(r["ts"] is not None for r in out)
    assert all(r["dest"] is None for r in out)


def test_fakekinesis_wire_schema_and_sequence_numbers(spark, tmp_path):
    """The raw wire rows (below to_envelope) carry the exact
    spark-sql-kinesis record shape, with per-stream monotonic
    zero-padded sequence numbers — lexicographic == arrival order."""
    from frizzle_spark.sources.fakekinesis import (
        FakeKinesisSink,
        register,
    )
    from frizzle_spark.streaming.pipeline import ENVELOPE, KINESIS_WIRE_SCHEMA

    stream = f"frizzle_kin_{uuid.uuid4().hex[:8]}"
    log_dir = str(tmp_path / "log")
    sink = FakeKinesisSink(log_dir, default_stream=stream)
    sink.write(
        spark.createDataFrame([("a", b"1", None, None)], ENVELOPE),
        default_dest=stream,
    )
    sink.write(
        spark.createDataFrame([("b", b"2", None, None)], ENVELOPE),
        default_dest=stream,
    )

    register(spark)
    name = f"kin_wire_{stream}"
    q = (
        spark.readStream.format("fakekinesis")
        .option("log_dir", log_dir)
        .option("streamName", stream)
        .load()
        .writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    _drain(q).stop()

    wire = spark.table(name)
    assert set(wire.columns) == {f.name for f in KINESIS_WIRE_SCHEMA.fields}
    recs = sorted(wire.collect(), key=lambda r: r["sequenceNumber"])
    assert [r["partitionKey"] for r in recs] == ["a", "b"]
    assert [bytes(r["data"]) for r in recs] == [b"1", b"2"]
    assert all(r["streamName"] == stream for r in recs)
    seqs = [r["sequenceNumber"] for r in recs]
    assert seqs == sorted(seqs) and len(set(seqs)) == 2
    assert all(len(s) == 20 and s.isdigit() for s in seqs)


def test_fakekinesis_dest_routes_stream(spark, tmp_path):
    """dest column routes the stream through the REAL to_wire, exactly
    as KafkaSink routes the topic (frizzle.go:115-123)."""
    from frizzle_spark.sources.fakekinesis import FakeKinesisSink, FakeKinesisSource
    from frizzle_spark.streaming.pipeline import ENVELOPE

    log_dir = str(tmp_path / "log")
    df = spark.createDataFrame(
        [
            ("r1", b"to-a", None, "stream_a"),
            ("r2", b"to-b", None, "stream_b"),
            ("r3", b"to-default", None, None),
        ],
        ENVELOPE,
    )
    FakeKinesisSink(log_dir, default_stream="stream_default").write(
        df, default_dest=None
    )

    for stream, want in [
        ("stream_a", {("r1", b"to-a")}),
        ("stream_b", {("r2", b"to-b")}),
        ("stream_default", {("r3", b"to-default")}),
    ]:
        name = f"kin_route_{stream}_{uuid.uuid4().hex[:6]}"
        q = (
            FakeKinesisSource(log_dir, stream_name=stream)
            .load(spark)
            .writeStream.format("memory")
            .queryName(name)
            .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
            .trigger(processingTime="0 seconds")
            .start()
        )
        _drain(q).stop()
        got = {
            (r["id"], bytes(r["data"]))
            for r in spark.table(name).select("id", "data").collect()
        }
        assert got == want, stream


def test_fakekinesis_full_pipeline_with_restart(spark, tmp_path):
    """The FULL Pipeline over the fake Kinesis wire: envelope →
    separator transform → DLQ routing → parquet sinks, then MORE
    produces and a RESTARTED Pipeline on the same checkpoint — only
    the new messages may be delivered (offset-log exactly-once), and
    the fresh stream reader must resume from the durable head."""
    from frizzle_spark.sources.fakekinesis import FakeKinesisSink, FakeKinesisSource
    from frizzle_spark.streaming.pipeline import ENVELOPE, ParquetSink, Pipeline
    from frizzle_spark.streaming.transforms import sep_transformer

    stream = f"frizzle_kinpipe_{uuid.uuid4().hex[:8]}"
    log_dir = str(tmp_path / "log")
    producer = FakeKinesisSink(log_dir, default_stream=stream)
    producer.write(
        spark.createDataFrame(
            [("ok1", b"x", None, None), ("fail", b"z", None, None)], ENVELOPE
        ),
        default_dest=stream,
    )

    sink = ParquetSink(str(tmp_path / "sink"))
    dlq = ParquetSink(str(tmp_path / "dlq"))

    def make_pipe():
        return Pipeline(
            spark,
            source=FakeKinesisSource(log_dir, stream_name=stream),
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
        default_dest=stream,
    )
    pipe2 = make_pipe()
    q2 = pipe2.start(trigger={"processingTime": "0 seconds"})
    q2.processAllAvailable()
    pipe2.stop()

    main_ids = [r["id"] for r in spark.read.parquet(sink.base_path).collect()]
    dlq_ids = [r["id"] for r in spark.read.parquet(dlq.base_path).collect()]
    assert sorted(main_ids) == ["ok1", "ok2"], main_ids  # no redelivery
    assert "fail2" in dlq_ids and len([i for i in dlq_ids if i == "fail"]) == 1


def test_kinesis_sink_to_wire_mapping(spark):
    """The production KinesisSink.to_wire in isolation: column names,
    types and dest-fallback chain (dest → pipeline default → sink
    default)."""
    from frizzle_spark.streaming.pipeline import ENVELOPE, KinesisSink

    df = spark.createDataFrame(
        [("i1", b"d1", None, "explicit"), ("i2", b"d2", None, None)], ENVELOPE
    )
    sink = KinesisSink(region="us-east-1", default_stream="sink_default")

    wired = sink.to_wire(df, default_dest="pipe_default").collect()
    by_id = {r["partitionKey"]: r for r in wired}
    assert set(by_id) == {"i1", "i2"}
    assert by_id["i1"]["streamName"] == "explicit"
    assert by_id["i2"]["streamName"] == "pipe_default"
    assert bytes(by_id["i1"]["data"]) == b"d1"

    wired2 = sink.to_wire(df, default_dest=None).collect()
    assert {r["streamName"] for r in wired2} == {"explicit", "sink_default"}


def test_fake_producers_two_phase_commit_and_abort(tmp_path):
    """Direct protocol test of BOTH fake producers' two-phase append
    (no Spark): staged task files are invisible until the driver's
    commit assigns offsets/sequence numbers and bumps _head; abort
    removes staged files and leaves the log untouched; a crash BETWEEN
    segment write and _head bump (simulated) leaves readers pinned to
    the old head — the exact guarantee both module docstrings claim."""
    import json
    import os

    from frizzle_spark.sources import fakekafka as fk
    from frizzle_spark.sources import fakekinesis as kn

    for mod, rec, head_of in [
        (
            fk,
            {"topic": "t1", "k": None, "v": "cGF5bG9hZA==", "ts": 1},
            lambda d: fk._head(d, "t1"),
        ),
        (
            kn,
            {"stream": "t1", "pk": "p", "d": "cGF5bG9hZA==", "ts": 1},
            lambda d: kn._head(d, "t1"),
        ),
    ]:
        log_dir = str(tmp_path / mod.__name__.split(".")[-1])
        prod = mod._Producer({"log_dir": log_dir})

        # stage two task files, abort one → no head movement, tmp gone
        os.makedirs(os.path.join(log_dir, "_tmp"), exist_ok=True)
        m1 = os.path.join(log_dir, "_tmp", "a.jsonl")
        with open(m1, "w") as fh:
            fh.write(json.dumps(rec) + "\n")
        prod.abort([mod._PartMessage(m1)])
        assert not os.path.exists(m1)
        assert head_of(log_dir) == 0, "abort must not publish"
        prod.abort([mod._PartMessage(m1)])  # idempotent on missing file

        # commit two records → head 2, exactly one segment
        for name in ("b.jsonl", "c.jsonl"):
            with open(os.path.join(log_dir, "_tmp", name), "w") as fh:
                fh.write(json.dumps(rec) + "\n")
        prod.commit(
            [
                mod._PartMessage(os.path.join(log_dir, "_tmp", "b.jsonl")),
                mod._PartMessage(os.path.join(log_dir, "_tmp", "c.jsonl")),
            ]
        )
        assert head_of(log_dir) == 2
        segs = [f for f in os.listdir(os.path.join(log_dir, "t1")) if f.startswith("seg-")]
        assert len(segs) == 1 and "-2." in segs[0], segs

        # crash window: a segment written but _head never bumped is
        # invisible (readers trust _head) and the next commit's base
        # still starts at the published head
        orphan = os.path.join(log_dir, "t1", "seg-000000000099-1.jsonl")
        with open(orphan, "w") as fh:
            fh.write(json.dumps({k: v for k, v in rec.items() if k != "topic" and k != "stream"}) + "\n")
        assert head_of(log_dir) == 2, "orphan segment must not move the head"
