"""Sub-1.5 s tail breakdown (round 13, VERDICT r12 #6): for a sample of
tail queries, split the wall into the phases a plan-level optimization
could and could not touch:

  build    — Python DSL construction + eager analysis (py4j round trips)
  optimize — Catalyst optimization (first touch of optimizedPlan)
  plan     — physical planning (executedPlan)
  exec1    — first noop-sink execution (includes codegen + JIT compile)
  exec2    — second execution (codegen cache warm: the plan's real cost)

If exec1 − exec2 dominates, the tail's floor is JIT/codegen (a
session-level lever: code cache sizing); if build+optimize+plan
dominate, it is planning; if exec2 dominates, the plans themselves are
the cost and per-query work is the only lever.  Per-phase host-steal %%
rides along so a contended window indicts itself.

Usage: python scripts/r13_tail_phases.py [query ...]   (default sample)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_SAMPLE = [
    "q1_pricing_summary",
    "q4_semi_anti",
    "q7_cube",
    "qz8_try_errors",
    "qz9_approx_distinct",
    "qz17_snapshot_diff",
    "qz23_drift",
    "qz23_ref_integrity",
    "qz26_rfm",
    "qz27_big_orders",
    "qz5_forward_fill",
    "qz10_match_path",
]


def _ticks():
    p = open("/proc/stat").readline().split()[1:]
    return sum(map(int, p)), int(p[7])


def main() -> None:
    names = sys.argv[1:] or DEFAULT_SAMPLE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__  # noqa: F401
    from frizzle_spark.plans.registry import REGISTRY
    from frizzle_spark.session import get_spark

    spark = get_spark("r13-tail-phases")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    spark.range(64).repartition(8).mapInPandas(
        lambda it: it, schema="id long"
    ).count()

    out = {}
    tot = {"build": 0.0, "optimize": 0.0, "plan": 0.0, "exec1": 0.0, "exec2": 0.0}
    for name in names:
        spec = REGISTRY[name]
        t0c, s0 = _ticks()
        t = time.perf_counter()
        df = spec.fn(spark, sf_dir)
        build = time.perf_counter() - t
        qe = df._jdf.queryExecution()
        t = time.perf_counter()
        qe.optimizedPlan()
        opt = time.perf_counter() - t
        t = time.perf_counter()
        qe.executedPlan()
        plan = time.perf_counter() - t
        t = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        exec1 = time.perf_counter() - t
        t = time.perf_counter()
        spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        exec2 = time.perf_counter() - t
        t1c, s1 = _ticks()
        rec = {
            "build": round(build, 3),
            "optimize": round(opt, 3),
            "plan": round(plan, 3),
            "exec1": round(exec1, 3),
            "exec2": round(exec2, 3),
            "steal_pct": round(100.0 * (s1 - s0) / (t1c - t0c), 2)
            if t1c > t0c
            else -1.0,
        }
        for k in tot:
            tot[k] += rec[k]
        out[name] = rec
        print(name, rec)
    out["_totals"] = {k: round(v, 3) for k, v in tot.items()}
    print(json.dumps(out["_totals"]))


if __name__ == "__main__":
    main()
