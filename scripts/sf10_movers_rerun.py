"""Isolated re-run of the four round-10 sf10 'movers' (VERDICT r10 #1).

The uncommitted round-10 sf10 re-run drifted +7% total and four queries
moved far outside run-to-run noise with NO code change
(q11_embedding_neardup 108.5 -> 276.1 s, q20_range_frame +48%,
qz27_waiting_suppliers +174%) — inside a 199-query bench whose earlier
queries can leave heap/page-cache pressure behind.  This harness
re-measures exactly those queries ISOLATED: a fresh JVM per QUERY, no
concurrent Spark work, min-of-N walls per query, same noop-sink action
and driver memory as the decade bench.  If the isolated wall matches
the old committed number, the drift was bench-run contention; if it
reproduces, the query has a real third-decade cliff.

Usage: python scripts/sf10_movers_rerun.py [out_json]
Env:   MOVERS_SF_DIR (default /tmp/frizzle_sf10), MOVERS_RUNS (default 2)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

MOVERS = (
    "q11_embedding_neardup",
    "q20_range_frame",
    "qz27_waiting_suppliers",
)

_CHILD = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")
import __spark_entry__  # noqa: F401
from frizzle_spark.plans.registry import REGISTRY
from frizzle_spark.session import get_spark
spark = get_spark("sf10-mover")
spark.sparkContext.setLogLevel("ERROR")
sf_dir = {sf_dir!r}
spark.read.parquet(f"{{sf_dir}}/lineitem.parquet").count()
spark.range(64).repartition(8).mapInPandas(lambda it: it, schema="id long").count()
walls = []
for _ in range({runs}):
    t0 = time.perf_counter()
    REGISTRY[{name!r}].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    walls.append(round(time.perf_counter() - t0, 2))
print(json.dumps({{"name": {name!r}, "walls": walls, "min": min(walls)}}))
"""


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        repo, "SF10_MOVERS_RERUN.json"
    )
    sf_dir = os.environ.get("MOVERS_SF_DIR", "/tmp/frizzle_sf10")
    runs = int(os.environ.get("MOVERS_RUNS", "2"))
    results = {}
    for name in MOVERS:
        code = _CHILD.format(repo=repo, sf_dir=sf_dir, runs=runs, name=name)
        proc = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True
        )
        line = [
            ln for ln in proc.stdout.strip().splitlines() if ln.startswith("{")
        ]
        if line:
            results[name] = json.loads(line[-1])
            print(f"# {line[-1]}", file=sys.stderr)
        else:
            results[name] = {"error": proc.stderr[-500:]}
            print(f"# {name} FAILED: {proc.stderr[-300:]}", file=sys.stderr)
    rec = {
        "sf_dir": sf_dir,
        "runs_per_query": runs,
        "isolation": "fresh JVM per query, no concurrent Spark work",
        "committed_r10_walls": {
            "q11_embedding_neardup": 276.093,
            "q20_range_frame": 111.145,
            "qz27_waiting_suppliers": 63.191,
            "qz16_band_join": 483.287,
        },
        "r9_era_walls": {"q11_embedding_neardup": 108.5},
        "results": results,
    }
    with open(out_path, "w") as fh:
        json.dump(rec, fh, indent=1)
    print(json.dumps({"written": out_path}))


if __name__ == "__main__":
    main()
