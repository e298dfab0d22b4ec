"""Stats counters, rate monitoring and async error reporting.

Reference parity:
* ``StatsIncrementer`` (stats.go:5-7) — the pluggable counter interface;
  buckets keep the reference's code-behavior names ``ctr.rcv``,
  ``ctr.send``, ``ctr.ack``, ``ctr.fail``, ``ctr.failsend``,
  ``ctr.error`` (frizzle.go:103,116,127,136,142; README documents
  ``ctr.failsink`` but the code emits ``ctr.failsend`` — we follow the
  code, SURVEY.md §2.1 O19).
* ``MonitorProcessingRate`` (options.go:43-70) — a polling goroutine in
  the reference; in Spark the engine already measures
  ``processedRowsPerSecond`` per micro-batch, so the monitor is a
  ``StreamingQueryListener`` surfacing it (no custom thread).
* ``ReportAsyncErrors`` (options.go:72-103) — merged event channels in
  the reference; one listener per session receives events for every
  query (the analogue of ``InitEvents`` fan-in, event.go:44-76).
"""

from __future__ import annotations

import logging
import threading
from collections import defaultdict

from pyspark.sql.streaming import StreamingQueryListener

log = logging.getLogger("frizzle_spark")

RCV = "ctr.rcv"
SEND = "ctr.send"
ACK = "ctr.ack"
FAIL = "ctr.fail"
FAILSEND = "ctr.failsend"
ERROR = "ctr.error"


class StatsIncrementer:
    """Interface: increment(bucket) — mirror of stats.go:5-7."""

    def increment(self, bucket: str, n: int = 1) -> None:  # pragma: no cover
        raise NotImplementedError


class NoopStats(StatsIncrementer):
    """Default no-op (stats.go:9-19)."""

    def increment(self, bucket: str, n: int = 1) -> None:
        pass


class DictStats(StatsIncrementer):
    """Thread-safe in-memory counters (tests, local runs)."""

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self.counts: dict[str, int] = defaultdict(int)

    def increment(self, bucket: str, n: int = 1) -> None:
        with self._lock:
            self.counts[bucket] += n


class PipelineListener(StreamingQueryListener):
    """Session-wide listener: rate monitoring + async error reporting.

    ``onQueryProgress`` ≙ MonitorProcessingRate's periodic log line;
    ``onQueryTerminated`` with an exception ≙ ReportAsyncErrors' Error
    path (log + ``ctr.error``); normal termination logs at warning level
    like non-error events (options.go:96-101).
    """

    def __init__(self, stats: StatsIncrementer | None = None) -> None:
        self.stats = stats or NoopStats()
        self.rates: list[float] = []

    def onQueryStarted(self, event) -> None:
        log.info("query started: %s", event.id)

    def onQueryProgress(self, event) -> None:
        p = event.progress
        rate = p.processedRowsPerSecond or 0.0
        self.rates.append(rate)
        log.info("processing rate: %.1f msg/sec", rate)

    def onQueryIdle(self, event) -> None:
        pass

    def onQueryTerminated(self, event) -> None:
        if event.exception:
            self.stats.increment(ERROR)
            log.error("async error: %s", event.exception)
        else:
            log.warning("event: query %s terminated", event.id)
