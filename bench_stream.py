"""Isolated streaming-bus throughput benchmark (round 8, VERDICT r7 #2).

The full-registry bench runs q13_stream as one of ~200 co-tenant
queries, so its derived events/sec drifted with session load
(72.8k → 62.0k r6→r7 as the registry grew 122→196).  The rate monitor
is a reference-committed surface (O18, reference options.go:43-70), so
it gets its own noise-free record: a FRESH session, the events table
as fixed input cardinality, and ≥3 timed end-to-end pipeline runs
(file-replay source → separator transform → fail routing → partitioned
parquet sinks, checkpointed — the identical assembly q13_stream
differential-checks, via the shared ``run_bus_pipeline``).

Prints ONE JSON line and writes BENCH_STREAM.json beside
BENCH_LOCAL.json.  The headline is the MAX rate (min wall): like the
per-query bench, the min isolates the pipeline from GC/compile jitter;
the per-run list is recorded for spread.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_runs = max(3, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))

    from frizzle_spark.plans.streaming_queries import run_bus_pipeline
    from frizzle_spark.session import get_spark

    spark = get_spark("frizzle_spark-bench-stream")
    n_events = spark.read.parquet(f"{sf_dir}/events.parquet").count()

    # one untimed warmup: JVM/codegen/Python-worker first-touch belongs
    # to the session, not the pipeline
    shutil.rmtree(run_bus_pipeline(spark, sf_dir), ignore_errors=True)

    walls: list[float] = []
    for _ in range(n_runs):
        t0 = time.perf_counter()
        base = run_bus_pipeline(spark, sf_dir)
        walls.append(round(time.perf_counter() - t0, 3))
        shutil.rmtree(base, ignore_errors=True)

    rates = [round(n_events / w, 1) for w in walls]
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    record = {
        "metric": "stream_rows_per_sec",
        "value": max(rates),
        "unit": "rows/sec",
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "n_events": n_events,
        "runs_wall_sec": walls,
        "runs_rows_per_sec": rates,
        "median_rows_per_sec": sorted(rates)[len(rates) // 2],
    }
    print(json.dumps(record))
    # sf0.1 keeps the headline record; other SFs write a suffixed file
    # (same convention as bench.py's BENCH_LOCAL)
    suffix = "" if sf_dir.rstrip("/").endswith("sf0.1") else f"_sf{record['sf']}"
    out = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), f"BENCH_STREAM{suffix}.json"
    )
    with open(out, "w") as fh:
        json.dump(record, fh, indent=1, sort_keys=True)
    print(f"# written to {out}", file=sys.stderr)


if __name__ == "__main__":
    main()
