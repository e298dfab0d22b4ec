"""Streaming state-size evidence at sf1 (round 8, VERDICT r7 #6).

The stateful tier (stream_dedup / counts / cusum / attribution /
funnel) ASSERTS bounded state; this harness MEASURES it: replay the
sf1 events table (10x users/density vs the bench corpus) as a
DAY-ALIGNED multi-batch stream (maxFilesPerTrigger=1) and record, per
micro-batch, the state-store metrics Spark itself exposes in
StreamingQueryProgress.stateOperators — numRowsTotal / numRowsUpdated /
numRowsRemoved / memoryUsedBytes — plus numInputRows.

Day-aligned splits matter twice: cusum's exactness contract requires
each day to land in ONE micro-batch, and a time-ordered replay is the
arrival pattern watermark eviction is defined over.  stream_dedup runs
TWICE — once at the registry horizon (35 days ≥ corpus span: state
grows to distinct-keys-within-corpus, no eviction expected) and once at
a 2-day horizon (eviction must be VISIBLE: numRowsRemoved > 0 and
numRowsTotal plateaus at keys-within-horizon instead of keys-ever).

Writes STREAM_STATE_SF1.json and prints the SCALE.md table.  Usage:

    FRIZZLE_SF1_DIR=/tmp/frizzle_sf1 python scripts/stream_state_scale.py
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_BATCH_GROUPS = 8
EV_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, value double"
)


def day_split_replay(spark, sf1_dir: str, out_dir: str) -> int:
    """Re-materialize sf1 events as ~N_BATCH_GROUPS day-aligned files in
    time order (file k holds days [k*span, (k+1)*span)), so a
    maxFilesPerTrigger=1 replay forms micro-batches that advance event
    time monotonically — the pattern watermarks are defined over."""
    from pyspark.sql import functions as F

    from frizzle_spark.sources.tables import load_table

    ev = load_table(spark, sf1_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    bounds = ev.agg(
        F.min(F.to_date("ts")).alias("d0"), F.max(F.to_date("ts")).alias("d1")
    ).collect()[0]
    n_days = (bounds["d1"] - bounds["d0"]).days + 1
    days_per_group = max(1, -(-n_days // N_BATCH_GROUPS))
    ev = ev.withColumn(
        "grp", (F.datediff(F.to_date("ts"), F.lit(bounds["d0"])) / days_per_group).cast("int")
    )
    groups = sorted(r["grp"] for r in ev.select("grp").distinct().collect())
    for g in groups:
        ev.where(F.col("grp") == g).drop("grp").coalesce(1).write.mode(
            "append"
        ).parquet(out_dir)
    return len(groups)


def run_and_harvest(parent, build, name: str, mode: str) -> list[dict]:
    """availableNow drain on an isolated child session; returns one
    record per micro-batch with the state-operator metrics."""
    child = parent.newSession()
    child.conf.set("spark.sql.shuffle.partitions", "8")
    q = (
        build(child)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    timeout = int(os.environ.get("FRIZZLE_STATE_TIMEOUT", "600"))
    if not q.awaitTermination(timeout):
        q.stop()
        raise TimeoutError(name)
    out = []
    for p in q.recentProgress or []:
        for op in p.get("stateOperators", []):
            out.append(
                {
                    "batch": p.get("batchId"),
                    "input_rows": p.get("numInputRows"),
                    "state_rows_total": op.get("numRowsTotal"),
                    "state_rows_updated": op.get("numRowsUpdated"),
                    "state_rows_removed": op.get("numRowsRemoved"),
                    "state_memory_bytes": op.get("memoryUsedBytes"),
                }
            )
    return out


def main() -> None:
    from pyspark.sql import functions as F

    from frizzle_spark.session import get_spark
    from frizzle_spark.sources.tables import load_table
    from frizzle_spark.streaming.analytics import (
        cusum_monitor,
        funnel_progress,
        last_touch_attribution,
        running_counts,
        streaming_dedup,
    )

    sf1 = os.environ.get("FRIZZLE_SF1_DIR", "/tmp/frizzle_sf1")
    # round 9: same harness, third decade — point FRIZZLE_SF1_DIR at the
    # sf10 corpus and label the record (STREAM_STATE_SF10.json)
    label = os.environ.get("FRIZZLE_STATE_LABEL", "SF1")
    spark = get_spark("frizzle_spark-stream-state")
    replay = tempfile.mkdtemp(prefix="sf1_day_replay_")
    n_files = day_split_replay(spark, sf1, replay)
    print(f"# replay: {n_files} day-aligned files at {replay}", file=sys.stderr)

    def stream(child):
        return (
            child.readStream.schema(EV_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(replay)
        )

    # cusum baseline fit, same estimator as the registry query
    daily = (
        load_table(spark, sf1, "events")
        .groupBy(F.date_trunc("day", F.col("ts")).alias("d"), "event_type")
        .agg(F.count(F.lit(1)).cast("double").alias("x"))
    )
    params = {
        r["event_type"]: (
            float(r["mu"]),
            float(r["sd"]) if r["sd"] is not None else 0.0,
        )
        for r in daily.groupBy("event_type")
        .agg(F.avg("x").alias("mu"), F.stddev_samp("x").alias("sd"))
        .collect()
    }
    from frizzle_spark.plans.sql_surface import CUSUM_ALARM_SDS, CUSUM_SLACK_SDS

    cases = {
        "stream_dedup_35d": (
            lambda c: streaming_dedup(
                stream(c).select("ts", "user_id", "event_type"),
                keys=["user_id", "event_type"],
                watermark="35 days",
            ),
            "append",
        ),
        "stream_dedup_2d": (
            lambda c: streaming_dedup(
                stream(c).select("ts", "user_id", "event_type"),
                keys=["user_id", "event_type"],
                watermark="2 days",
            ),
            "append",
        ),
        "stream_counts": (
            lambda c: running_counts(stream(c).select("user_id", "value")),
            "update",
        ),
        "stream_cusum": (
            lambda c: cusum_monitor(
                stream(c).select("ts", "event_type"),
                params,
                CUSUM_SLACK_SDS,
                CUSUM_ALARM_SDS,
            ),
            "update",
        ),
        "stream_attribution": (
            lambda c: last_touch_attribution(
                stream(c).select("event_id", "ts", "user_id", "event_type", "value")
            ),
            "append",
        ),
        "stream_funnel": (
            lambda c: funnel_progress(
                stream(c).select("event_id", "ts", "user_id", "event_type")
            ),
            "update",
        ),
    }

    only = os.environ.get("FRIZZLE_STATE_ONLY")
    if only:
        keep = {c.strip() for c in only.split(",")}
        cases = {k: v for k, v in cases.items() if k in keep}
    results: dict[str, list[dict]] = {}
    for name, (build, mode) in cases.items():
        # one slow case must not lose the others' records — the harvest
        # JSON is written from whatever completed; re-run the stragglers
        # with FRIZZLE_STATE_ONLY=<names> (+FRIZZLE_STATE_TIMEOUT) and
        # the records merge
        try:
            results[name] = run_and_harvest(spark, build, f"ss_{name}", mode)
        except TimeoutError:
            print(f"# {name}: TIMEOUT — skipped (re-run with "
                  f"FRIZZLE_STATE_ONLY={name})", file=sys.stderr)
            continue
        last = results[name][-1] if results[name] else {}
        print(f"# {name}: {len(results[name])} batches, final {last}", file=sys.stderr)

    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        f"STREAM_STATE_{label}.json",
    )
    merged = results
    if os.path.exists(out):  # partial re-runs (FRIZZLE_STATE_ONLY) merge
        with open(out) as fh:
            prior = json.load(fh).get("results", {})
        merged = {**prior, **results}
    with open(out, "w") as fh:
        json.dump({"sf1_dir": sf1, "n_files": n_files, "results": merged}, fh, indent=1)
    print(json.dumps({k: v[-1] if v else None for k, v in results.items()}))

    # SCALE.md table
    print("\n| operator | batches | final state rows | max state rows | "
          "rows removed (total) | final state MB |")
    print("|---|---|---|---|---|---|")
    for name, recs in results.items():
        if not recs:
            print(f"| {name} | 0 | - | - | - | - |")
            continue
        rows = [r["state_rows_total"] or 0 for r in recs]
        removed = sum(r["state_rows_removed"] or 0 for r in recs)
        mb = (recs[-1]["state_memory_bytes"] or 0) / 1e6
        print(
            f"| {name} | {len(recs)} | {rows[-1]} | {max(rows)} | "
            f"{removed} | {mb:.1f} |"
        )


if __name__ == "__main__":
    main()
