"""Custom connector on Spark 4's Python Data Source API — the modern
way to add a source WITHOUT a JVM jar, and therefore the answer this
engine gives to the reference's pluggable-Source interface
(reference msg.go:22-31: ``Receive() <-chan Msg`` + viper config) for
ecosystems that ship no Spark connector: implement
``DataSource``/``DataSourceReader`` in Python, register it on the
session, and `spark.read.format("frizzle_events")` plans it like any
scan — partitioned, schema'd, filter-aware.

``FrizzleEventsDataSource`` is a deterministic synthetic event
generator (the O2 in-memory demo source re-imagined as a connector):

* **batch**: options ``n_rows``/``n_users``/``seed``/``n_partitions``;
  each InputPartition generates ITS slice on an executor — nothing
  materializes on the driver, so `n_rows=10^12` would fan out like any
  table scan;
* **filter pushdown**: equality on ``event_type`` is accepted in
  ``pushFilters`` and applied inside the generator — rows that would
  fail the predicate are never even built (the Python-source analogue
  of parquet predicate pushdown; the gate asserts both the row set and
  the accepted-filter handshake);
* **streaming**: ``DataSourceStreamReader`` with integer offsets —
  micro-batches of ``batch_rows`` per trigger, exactly-once via the
  offset log (replayable: partitions(start, end) regenerates the same
  rows for the same range, which is precisely the contract Spark's
  offset-based recovery needs).

Rows derive from md5(seed, i) only — same (options → table) function
on every executor, every retry, every engine.
"""

from __future__ import annotations

import hashlib
from datetime import datetime, timedelta

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    EqualTo,
    InputPartition,
)

EVENT_TYPES = ("click", "view", "purchase", "signup", "error")
_T0 = datetime(2024, 1, 1)

SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string,"
    " value double, props string"
)


def _row(seed: int, i: int, n_users: int):
    h = hashlib.md5(f"{seed}:{i}".encode()).hexdigest()
    user = int(h[:8], 16) % n_users
    etype = EVENT_TYPES[int(h[8:10], 16) % len(EVENT_TYPES)]
    value = round(int(h[10:16], 16) % 50_000 / 100.0, 2)
    props = '{"k": %d}' % (int(h[16:18], 16) % 100)
    return (i, _T0 + timedelta(seconds=7 * i), user, etype, value, props)


class _Slice(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class _Reader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("n_rows", 1000))
        self.n_users = int(options.get("n_users", 50))
        self.seed = int(options.get("seed", 7))
        self.n_partitions = int(options.get("n_partitions", 4))
        self.etype_filter: str | None = None

    def pushFilters(self, filters):
        for f in filters:
            if (
                isinstance(f, EqualTo)
                and f.attribute == ("event_type",)
                and isinstance(f.value, str)
            ):
                self.etype_filter = f.value  # accepted → applied in read()
            else:
                yield f  # unsupported → Spark keeps its own Filter node

    def partitions(self):
        step = -(-self.n_rows // self.n_partitions)
        return [
            _Slice(lo, min(lo + step, self.n_rows))
            for lo in range(0, self.n_rows, step)
        ]

    def read(self, partition: _Slice):
        for i in range(partition.start, partition.end):
            row = _row(self.seed, i, self.n_users)
            if self.etype_filter is not None and row[3] != self.etype_filter:
                continue
            yield row


class _StreamReader(DataSourceStreamReader):
    def __init__(self, options):
        self.n_rows = int(options.get("n_rows", 1000))
        self.n_users = int(options.get("n_users", 50))
        self.seed = int(options.get("seed", 7))
        self.batch_rows = int(options.get("batch_rows", 100))

    def initialOffset(self):
        return {"idx": 0}

    def latestOffset(self):
        # the generator's "topic head" advances batch_rows per poll,
        # capped at the configured corpus size.  _head is in-process
        # state re-seeded by commit(): after an in-process query restart
        # (stop + restart on the same session, which re-uses this reader
        # instance) the head resumes FROM the committed offset instead
        # of regressing to 0.  Across a full driver restart a fresh
        # reader starts at 0 again; that cannot corrupt data — Spark
        # plans batches from its own offset log and partitions(start,
        # end) regenerates identical rows for any range — it only delays
        # new progress until the head re-advances past the log, and
        # commit() of the first recovered batch re-seeds it.
        if not hasattr(self, "_head"):
            self._head = 0
        self._head = min(self.n_rows, self._head + self.batch_rows)
        return {"idx": self._head}

    def partitions(self, start, end):
        return [_Slice(int(start["idx"]), int(end["idx"]))]

    def read(self, partition: _Slice):
        for i in range(partition.start, partition.end):
            yield _row(self.seed, i, self.n_users)

    def commit(self, end):
        # remember the durable head so latestOffset never trails what
        # the offset log already committed (restart-recovery seam)
        self._head = max(getattr(self, "_head", 0), int(end["idx"]))


class FrizzleEventsDataSource(DataSource):
    @classmethod
    def name(cls):
        return "frizzle_events"

    def schema(self):
        return SCHEMA

    def reader(self, schema):
        return _Reader(self.options)

    def streamReader(self, schema):
        return _StreamReader(self.options)


def register(spark) -> None:
    """Register the connector on a session (idempotent).

    Also enables ``spark.sql.python.filterPushdown.enabled`` — a
    Python reader that merely DEFINES pushFilters() raises at planning
    time when the flag is off (Spark's guard against silently ignoring
    an implemented pushdown), so the flag travels with the connector.
    """
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(FrizzleEventsDataSource)


# ---------------------------------------------------------------------------
# Write side: a manifest-committed JSON sink with two-phase commit — the
# Python-API analogue of the reference's pluggable Sink
# (reference msg.go:33-37) with the delivery guarantee frizzle tracks
# per-message (Ack/Fail) expressed the Spark way: per-TASK temp files +
# a driver-side atomic manifest publish (commit) or cleanup (abort).
# ---------------------------------------------------------------------------

import json as _json
import uuid as _uuid

from pyspark.sql.datasource import (  # noqa: E402 - grouped with writer code
    DataSourceWriter,
    WriterCommitMessage,
)


class _PartMessage(WriterCommitMessage):
    def __init__(self, filename: str, n_rows: int):
        self.filename = filename
        self.n_rows = n_rows


class _JsonSinkWriter(DataSourceWriter):
    """Tasks write to ``<path>/_tmp/<uuid>.jsonl`` and report the file
    in their commit message; ONLY the driver's ``commit`` publishes the
    manifest listing exactly the reported files.  A failed/duplicate
    task attempt leaves at most an orphan temp file that no reader
    ever sees — readers trust the manifest, not the directory listing
    (the same generation protocol as streaming/pipeline.ParquetSink's
    compaction manifest)."""

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("frizzle_json_sink requires .option('path', ...)")
        self.fail_on_value = options.get("fail_on_value")

    def write(self, iterator) -> WriterCommitMessage:
        import os

        os.makedirs(os.path.join(self.path, "_tmp"), exist_ok=True)
        fname = os.path.join(self.path, "_tmp", f"{_uuid.uuid4().hex}.jsonl")
        n = 0
        with open(fname, "w") as fh:
            for row in iterator:
                d = row.asDict(recursive=True)
                if self.fail_on_value is not None and str(
                    d.get("event_id")
                ) == str(self.fail_on_value):
                    raise RuntimeError(
                        f"injected task failure at event_id={self.fail_on_value}"
                    )
                for k, v in d.items():
                    if hasattr(v, "isoformat"):
                        d[k] = v.isoformat()
                fh.write(_json.dumps(d, sort_keys=True) + "\n")
                n += 1
        return _PartMessage(fname, n)

    def commit(self, messages) -> None:
        import os

        files, total = [], 0
        for m in messages:
            final = os.path.join(self.path, os.path.basename(m.filename))
            os.replace(m.filename, final)
            files.append(os.path.basename(final))
            total += m.n_rows
        manifest = {"files": sorted(files), "n_rows": total}
        tmp = os.path.join(self.path, "_manifest.tmp")
        with open(tmp, "w") as fh:
            _json.dump(manifest, fh)
        os.replace(tmp, os.path.join(self.path, "manifest.json"))

    def abort(self, messages) -> None:
        import os
        import shutil

        shutil.rmtree(os.path.join(self.path, "_tmp"), ignore_errors=True)


class FrizzleJsonSinkDataSource(DataSource):
    @classmethod
    def name(cls):
        return "frizzle_json_sink"

    def writer(self, schema, overwrite: bool):
        return _JsonSinkWriter(self.options)


def read_json_sink(path: str) -> list[dict]:
    """Reader honoring the manifest — files outside it don't exist."""
    import os

    with open(os.path.join(path, "manifest.json")) as fh:
        manifest = _json.load(fh)
    rows = []
    for fname in manifest["files"]:
        with open(os.path.join(path, fname)) as fh:
            rows.extend(_json.loads(line) for line in fh)
    assert len(rows) == manifest["n_rows"], "manifest/file drift"
    return rows


def register_sink(spark) -> None:
    spark.dataSource.register(FrizzleJsonSinkDataSource)
