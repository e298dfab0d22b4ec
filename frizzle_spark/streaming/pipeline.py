"""The streaming bus: frizzle's Source → Transform → process → Sink(+DLQ)
re-expressed as Structured Streaming.

Reference model (frizzle.go:11-21, 53-209): ``Init(source, sink, opts)``
starts a consume loop; every Msg is tracked un-acked until exactly one of
Ack/Fail; Fail optionally forwards to a fail sink (DLQ); Flush-and-close
drains in-flight work.  Spark mapping (SURVEY.md §3.2):

* consume loop        → micro-batch trigger on a streaming DataFrame
* per-record Ack      → per-batch checkpoint commit after the batch's
                        sinks succeed (at-least-once on retry, exactly
                        like frizzle's redeliver-before-Ack)
* Fail + fail sink    → row-level routing inside ``foreachBatch``:
                        every row lands in exactly one of {main sink,
                        DLQ} — the invariant the reference enforces via
                        the un-acked map (common/unacked.go:10-59)
* dest routing        → a ``dest`` column consumed by the sink writer
                        (frizzle.go:115-123's ``Send(m, dest)``)
* FlushAndClose       → ``stop(flush_timeout)``: processAllAvailable
                        bounded by the timeout, then query.stop()
* HandleShutdown      → ``handle_shutdown()``: SIGINT/SIGTERM →
                        FlushAndClose → user callback (options.go:105-135)

Scale: the envelope never collects to the driver; routing is a column
predicate, both sink writes are executor-parallel, and the only
per-batch driver work is the commit.  Rate limiting (reference's
buffer-500 backpressure, basic/source.go:13-16) maps to
``maxFilesPerTrigger`` / ``maxOffsetsPerTrigger`` on the source.
"""

from __future__ import annotations

import os
import signal
import tempfile
import uuid
from collections.abc import Callable
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from frizzle_spark.streaming import metrics as M
from frizzle_spark.streaming.transforms import Transformer, chain

# the frizzle Msg envelope (msg.go:15-20) + dest routing column
ENVELOPE = StructType(
    [
        StructField("id", StringType()),
        StructField("data", BinaryType()),
        StructField("ts", TimestampType()),
        StructField("dest", StringType()),
    ]
)

DEFAULT_FLUSH_SECONDS = 30  # options.go:13-15


# ---------------------------------------------------------------- sources
@dataclass(frozen=True)
class FileReplaySource:
    """Replay a file directory as a stream (the test/replay source; the
    frizzle ``basic.Source`` analogue with durable storage instead of an
    in-memory channel, basic/source.go:34-68)."""

    path: str
    schema: StructType
    fmt: str = "parquet"
    max_files_per_trigger: int | None = None
    to_envelope: Callable[[DataFrame], DataFrame] | None = None
    glob_filter: str | None = None  # file streams need a DIRECTORY path

    def load(self, spark: SparkSession) -> DataFrame:
        reader = spark.readStream.schema(self.schema).format(self.fmt)
        if self.max_files_per_trigger:
            reader = reader.option("maxFilesPerTrigger", self.max_files_per_trigger)
        if self.glob_filter:
            reader = reader.option("pathGlobFilter", self.glob_filter)
        df = reader.load(self.path)
        return self.to_envelope(df) if self.to_envelope else df


# the Kafka connector's fixed wire schema (what reader.load() yields)
KAFKA_WIRE_SCHEMA = StructType(
    [
        StructField("key", BinaryType()),
        StructField("value", BinaryType()),
        StructField("topic", StringType()),
        StructField("partition", IntegerType()),
        StructField("offset", LongType()),
        StructField("timestamp", TimestampType()),
        StructField("timestampType", IntegerType()),
    ]
)


@dataclass(frozen=True)
class KafkaSource:
    """Kafka ecosystem source (declared type, frizzle.go:30-32).  Builds
    the standard Kafka envelope: key→id, value→data, timestamp→ts.

    ``reader_options`` and ``to_envelope`` are exposed separately so the
    option set and the envelope projection are unit-testable without a
    broker (the sandbox has none): tests apply ``to_envelope`` to a
    static DataFrame with ``KAFKA_WIRE_SCHEMA``.
    """

    brokers: str
    subscribe: str
    options: dict[str, str] = field(default_factory=dict)

    def reader_options(self) -> dict[str, str]:
        """The exact option set handed to the kafka DataStreamReader."""
        return {
            "kafka.bootstrap.servers": self.brokers,
            "subscribe": self.subscribe,
            **self.options,
        }

    @staticmethod
    def to_envelope(df: DataFrame) -> DataFrame:
        """Kafka wire record → frizzle ENVELOPE (msg.go:15-20 mapping)."""
        return df.select(
            F.col("key").cast("string").alias("id"),
            F.col("value").alias("data"),
            F.col("timestamp").alias("ts"),
            F.lit(None).cast("string").alias("dest"),
        )

    def load(self, spark: SparkSession) -> DataFrame:
        reader = spark.readStream.format("kafka")
        for k, v in self.reader_options().items():
            reader = reader.option(k, v)
        return self.to_envelope(reader.load())


@dataclass(frozen=True)
class KinesisSource:
    """Kinesis ecosystem source (declared type, frizzle.go:33-34; impl in
    the reference lives in the sibling repo frinesis — ours likewise
    delegates to an external connector).  Requires the spark-sql-kinesis
    connector on the classpath (``--packages``); OSS Spark core does not
    bundle one, so ``load`` raises a clear error when it is absent.
    Envelope mapping: partitionKey→id, data→data, approximateArrivalTimestamp→ts.
    """

    stream_name: str
    region: str
    endpoint: str | None = None
    options: dict[str, str] = field(default_factory=dict)

    def load(self, spark: SparkSession) -> DataFrame:
        reader = (
            spark.readStream.format("kinesis")
            .option("streamName", self.stream_name)
            .option("region", self.region)
        )
        if self.endpoint:
            reader = reader.option("endpointUrl", self.endpoint)
        for k, v in self.options.items():
            reader = reader.option(k, v)
        try:
            df = reader.load()
        except Exception as exc:  # connector not on classpath
            raise NotImplementedError(
                "Kinesis needs the spark-sql-kinesis connector on the "
                "classpath (spark-submit --packages ...); not bundled here"
            ) from exc
        return df.select(
            F.col("partitionKey").cast("string").alias("id"),
            F.col("data").alias("data"),
            F.col("approximateArrivalTimestamp").alias("ts"),
            F.lit(None).cast("string").alias("dest"),
        )


@dataclass(frozen=True)
class RateSource:
    """Synthetic source for smoke tests (rows/sec)."""

    rows_per_second: int = 100

    def load(self, spark: SparkSession) -> DataFrame:
        df = (
            spark.readStream.format("rate")
            .option("rowsPerSecond", self.rows_per_second)
            .load()
        )
        return df.select(
            F.col("value").cast("string").alias("id"),
            F.encode(F.col("value").cast("string"), "UTF-8").alias("data"),
            F.col("timestamp").alias("ts"),
            F.lit(None).cast("string").alias("dest"),
        )


@dataclass(frozen=True)
class ChainSource:
    """Bus composition (O25): a Friz satisfies Source AND Sink so buses
    chain (reference README.md:41, interfaces at frizzle.go:110-123).
    Spark-idiomatically, the durable output of an upstream Pipeline's
    ``ParquetSink`` IS a streaming source — downstream discovers files as
    the upstream commits them (the same role an intermediate Kafka topic
    plays in the reference's ecosystem).  Handoff is effectively-once:
    the upstream's batch-id dynamic-overwrite layout keeps retried
    batches from duplicating rows, and the downstream file source tracks
    seen files in its own checkpoint.

    ``dest`` narrows to one destination partition (e.g. only 'main');
    partition-directory pruning keeps unselected dests unread.
    """

    upstream: "ParquetSink"
    dest: str | None = None
    max_files_per_trigger: int | None = None

    def load(self, spark: SparkSession) -> DataFrame:
        base = self.upstream.base_path
        # data files hold (id, data, ts); dest lives in the partition dir.
        # Read the dirs directly (glob when unnarrowed) and rebuild dest
        # from the file path — sidesteps streaming partition inference.
        schema = StructType([f for f in ENVELOPE.fields if f.name != "dest"])
        path = f"{base}/dest={self.dest}" if self.dest else f"{base}/dest=*"
        # recursiveFileLookup: data files sit under dest=<d>/_batch=<id>/
        # (ParquetSink's idempotent layout); partition-dir inference is
        # disabled and dest is rebuilt from the file path below.
        reader = spark.readStream.schema(schema).option("recursiveFileLookup", "true")
        if self.max_files_per_trigger:
            reader = reader.option("maxFilesPerTrigger", self.max_files_per_trigger)
        df = reader.parquet(path)
        # routing is per-Send state, not message state (reference
        # msg.go:34-36): consumed messages re-enter unrouted, with the
        # upstream destination preserved as provenance in `src_dest`.
        src = (
            F.lit(self.dest)
            if self.dest
            else F.regexp_extract(F.input_file_name(), r"dest=([^/]+)/", 1)
        )
        return df.withColumn("dest", F.lit(None).cast("string")).withColumn(
            "src_dest", src
        )


# ------------------------------------------------------------------ sinks
class MemorySink:
    """Per-destination in-memory sink (basic/sink.go:28-37's
    ``map[dest][]Msg``): batches append into a driver-side dict of rows.
    Test-only by design, like the reference's basic sink (a retried
    batch appends again — at-least-once, as in the reference)."""

    def __init__(self) -> None:
        self.sent: dict[str, list] = {}

    def write(
        self, df: DataFrame, default_dest: str, batch_id: int | None = None
    ) -> None:
        dest_col = F.coalesce(F.col("dest"), F.lit(default_dest))
        for row in df.withColumn("dest", dest_col).collect():
            self.sent.setdefault(row["dest"], []).append(row)


class ParquetSink:
    """Durable sink: one parquet dir per destination (partition-parallel).

    Idempotent under micro-batch retries: when the pipeline passes a
    ``batch_id``, rows land under ``dest=<d>/_batch=<id>/`` via DYNAMIC
    partition overwrite — a replayed batch (checkpoint uncommitted →
    foreachBatch re-invoked with the SAME batch_id) rewrites exactly its
    own partitions instead of appending duplicates.  That upgrades the
    file output from at-least-once to effectively-once CONTENTS while
    keeping the write one executor-parallel job for all destinations
    (never a per-dest loop).  Without a batch_id (plain batch use) it
    appends, as before.
    """

    def __init__(self, base_path: str) -> None:
        self.base_path = base_path

    def write(
        self, df: DataFrame, default_dest: str, batch_id: int | None = None
    ) -> None:
        dest_col = F.coalesce(F.col("dest"), F.lit(default_dest))
        out = df.withColumn("dest", dest_col)
        if batch_id is None:
            out.write.mode("append").partitionBy("dest").parquet(self.base_path)
            return
        (
            out.withColumn("_batch", F.lit(int(batch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("dest", "_batch")
            .parquet(self.base_path)
        )

    def compact(
        self,
        spark: SparkSession,
        target_rows_per_file: int = 1_000_000,
        compacted_batch: int = -1,
    ) -> None:
        """Maintenance: fold accumulated per-batch directories into few
        large files (the OPTIMIZE step every per-trigger file sink needs
        at scale — a day of 1-minute triggers is 1,440 batch dirs per
        dest, and small files destroy downstream scan throughput).

        Rewrites ALL current rows into the reserved ``_batch=-1``
        partition sized by ``target_rows_per_file``, into a sibling temp
        directory (Spark refuses to overwrite a path it is reading),
        then atomically swaps directories.  The rename is atomic on a
        real filesystem/HDFS; on an object store swap via a manifest or
        table format instead.  Run from maintenance windows, not inside
        the trigger path.
        """
        import shutil

        cur = spark.read.parquet(self.base_path)
        n = cur.count()
        if n == 0:
            return
        files = max(1, -(-n // target_rows_per_file))
        tmp = self.base_path.rstrip("/") + "__compact_tmp"
        (
            cur.drop("_batch")
            .withColumn("_batch", F.lit(int(compacted_batch)))
            .repartition(files)
            .write.mode("overwrite")
            .partitionBy("dest", "_batch")
            .parquet(tmp)
        )
        old = self.base_path.rstrip("/") + "__compact_old"
        os.rename(self.base_path, old)
        os.rename(tmp, self.base_path)
        shutil.rmtree(old)


class KafkaSink:
    """Kafka ecosystem sink (frizzle.go:27-29): dest column → topic.

    ``to_wire`` is the broker-free unit-testable half: envelope →
    (key, value, topic) exactly as the kafka writer expects them.
    """

    def __init__(self, brokers: str, default_topic: str) -> None:
        self.brokers = brokers
        self.default_topic = default_topic

    def to_wire(self, df: DataFrame, default_dest: str) -> DataFrame:
        """ENVELOPE → Kafka writer columns; dest routes the topic
        (frizzle.go:115-123's Send(m, dest)), falling back to the
        pipeline default then the sink's default topic."""
        return df.select(
            F.encode(F.col("id"), "UTF-8").alias("key"),
            F.col("data").alias("value"),
            F.coalesce(F.col("dest"), F.lit(default_dest or self.default_topic)).alias(
                "topic"
            ),
        )

    def write(
        self, df: DataFrame, default_dest: str, batch_id: int | None = None
    ) -> None:
        (
            self.to_wire(df, default_dest)
            .write.format("kafka")
            .option("kafka.bootstrap.servers", self.brokers)
            .save()
        )


# --------------------------------------------------------------- pipeline
class Pipeline:
    """``Init(source, sink, opts...)`` equivalent (frizzle.go:53-79).

    Usage::

        p = Pipeline(spark, source, sink,
                     fail_sink=(dlq_sink, "dead-letter"),
                     transformers=[sep_transformer(b"\\n")],
                     process=my_df_fn,            # the user loop
                     fail_predicate=F.col(...),   # rows that Fail()
                     stats=DictStats())
        q = p.start()          # begins consume
        p.stop(flush_timeout)  # FlushAndClose
    """

    def __init__(
        self,
        spark: SparkSession,
        source: Any,
        sink: Any,
        *,
        default_dest: str = "out",
        fail_sink: tuple[Any, str] | None = None,
        transformers: list[Transformer] | None = None,
        process: Callable[[DataFrame], DataFrame] | None = None,
        fail_predicate: Any = None,
        stats: M.StatsIncrementer | None = None,
        checkpoint_dir: str | None = None,
        monitor_rate: bool = False,
        drop_unrouted: bool = False,
    ) -> None:
        self.spark = spark
        self.source = source
        self.sink = sink
        self.default_dest = default_dest
        self.fail_sink = fail_sink
        self.transformers = transformers or []
        self.process = process
        self.fail_predicate = fail_predicate
        self.stats = stats or M.NoopStats()
        # reference semantics: a processed Msg may be Acked without ever
        # being Sent (frizzle_integration_test.go:26-45 acks upper-case
        # msgs without forwarding).  With drop_unrouted, ok-rows whose
        # dest is NULL are acked (batch commit) but skipped by the sink.
        self.drop_unrouted = drop_unrouted
        self.checkpoint_dir = checkpoint_dir or tempfile.mkdtemp(prefix="frizzle-ckpt-")
        self.query: StreamingQuery | None = None
        self.listener: M.PipelineListener | None = None
        if monitor_rate:
            self.listener = M.PipelineListener(self.stats)
            spark.streams.addListener(self.listener)

    # ≙ Receive() (frizzle.go:110-112): the post-receive-transform stream
    def stream(self) -> DataFrame:
        df = self.source.load(self.spark)
        return chain([t.receive for t in self.transformers], df)

    def _run_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        # One micro-batch ≙ one slice of the consume loop.  Checkpoint
        # commit after this returns ≙ Ack for every routed row.
        batch_df = batch_df.persist()
        try:
            df = self.process(batch_df) if self.process else batch_df
            # NULL-normalize the fail predicate ONCE: a predicate over a
            # nullable column evaluates NULL on some rows, and both
            # filter(p) and filter(~p) drop NULL — the row would silently
            # land in neither the sink nor the DLQ.  NULL ≙ not failed,
            # so the {sink, DLQ} partition invariant (common/unacked.go
            # contract) holds for every row.
            has_fail = self.fail_predicate is not None
            pred = (
                F.coalesce(self.fail_predicate.cast("boolean"), F.lit(False))
                if has_fail
                else F.lit(False)
            )

            # Zero extra jobs per batch: rcv/fail/unrouted counters ride
            # the sink write via a CollectMetrics (observe) node placed
            # BELOW the routing filters, so the full batch flows through
            # it during the main sink's action (SURVEY §2.1/O19's
            # df.observe mapping; round 1 ran a separate aggregate job
            # per trigger instead).
            obs = Observation(f"frizzle-batch-{batch_id}")
            df = df.observe(
                obs,
                F.count(F.lit(1)).alias("rcv"),
                F.count(F.when(pred, True)).alias("fail"),
                F.count(F.when(~pred & F.col("dest").isNull(), True)).alias(
                    "unrouted"
                ),
            )
            failed = df.filter(pred) if has_fail else None
            ok = df.filter(~pred) if has_fail else df

            to_send = ok.where(F.col("dest").isNotNull()) if self.drop_unrouted else ok
            to_send = chain([t.send for t in self.transformers], to_send)
            self.sink.write(to_send, self.default_dest, batch_id=batch_id)

            counts = obs.get  # resolved by the sink job just finished
            n_rcv, n_fail = counts["rcv"], counts["fail"]
            n_ok = n_rcv - n_fail
            n_send = n_ok - counts["unrouted"] if self.drop_unrouted else n_ok
            self.stats.increment(M.RCV, n_rcv)
            self.stats.increment(M.SEND, n_send)
            self.stats.increment(M.ACK, n_ok)

            if failed is not None and n_fail:
                self.stats.increment(M.FAIL, n_fail)
                if self.fail_sink is not None:
                    dlq, dlq_dest = self.fail_sink
                    dlq.write(
                        failed.withColumn("dest", F.lit(dlq_dest)),
                        dlq_dest,
                        batch_id=batch_id,
                    )
                    self.stats.increment(M.FAILSEND, n_fail)
        finally:
            batch_df.unpersist()

    # ≙ Init's consume goroutine start (frizzle.go:72-74)
    def start(
        self,
        trigger: dict[str, Any] | None = None,
        query_name: str | None = None,
    ) -> StreamingQuery:
        out = chain([t.receive for t in self.transformers], self.source.load(self.spark))
        writer = (
            out.writeStream.foreachBatch(self._run_batch)
            .option("checkpointLocation", self.checkpoint_dir)
            .queryName(query_name or f"frizzle-{uuid.uuid4().hex[:8]}")
        )
        trigger = trigger or {"availableNow": True}
        writer = writer.trigger(**trigger)
        self.query = writer.start()
        return self.query

    # ≙ FlushAndClose (frizzle.go:152-179): drain, then stop.
    #
    # Straggler divergence (documented, SURVEY §2.1/O14): the reference
    # Fails → DLQ messages still un-acked when the timeout fires
    # (frizzle.go:160-175).  Here a micro-batch is atomic — if the
    # timeout interrupts an uncommitted batch, ALL its rows are
    # redelivered on restart (at-least-once) rather than Failed; routing
    # them to the DLQ at timeout would deliver them twice (DLQ now +
    # main sink after checkpoint replay).
    def stop(self, flush_timeout: float = DEFAULT_FLUSH_SECONDS) -> None:
        if self.query is None:
            return
        try:
            self.query.awaitTermination(flush_timeout)
        finally:
            if self.query.isActive:
                self.query.stop()
            if self.listener is not None:
                self.spark.streams.removeListener(self.listener)

    # ≙ HandleShutdown (options.go:105-135)
    def handle_shutdown(
        self,
        app_shutdown: Callable[[], None] | None = None,
        flush_timeout: float = DEFAULT_FLUSH_SECONDS,
    ) -> None:
        def _handler(signum, frame):
            self.stop(flush_timeout)
            if app_shutdown:
                app_shutdown()

        signal.signal(signal.SIGINT, _handler)
        signal.signal(signal.SIGTERM, _handler)
