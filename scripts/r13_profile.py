"""Round-13 per-query profiler: run named queries standalone with the
noop sink N times, print per-run walls WITH per-run host-steal %% (the
r12 lesson: a contended host inflates walls invisibly to loadavg), and
dump explain("formatted") to plans/r13/<query>_<tag>.txt.

    python scripts/r13_profile.py <tag> <query> [<query> ...]

Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_RUNS (default 3).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _ticks() -> tuple[int, int]:
    try:
        p = open("/proc/stat").readline().split()[1:]
        return sum(map(int, p)), int(p[7])
    except (OSError, ValueError, IndexError):
        return 0, 0


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_runs = int(os.environ.get("SPARK_GRAFT_RUNS", "3"))
    import __spark_entry__  # noqa: F401
    from frizzle_spark.plans.registry import REGISTRY
    from frizzle_spark.session import get_spark

    spark = get_spark("frizzle_spark-r13-profile")
    spark.sparkContext.setLogLevel("ERROR")
    # same warmup as bench.py so first-run numbers aren't JIT noise
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    spark.range(64).repartition(8).mapInPandas(
        lambda it: it, schema="id long"
    ).count()

    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r13"
    )
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        spec = REGISTRY[name]
        runs, steals = [], []
        for _ in range(n_runs):
            t0c, s0 = _ticks()
            t0 = time.perf_counter()
            df = spec.fn(spark, sf_dir)
            if "limit" in name:
                df.collect()
            else:
                df.write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 3))
            t1c, s1 = _ticks()
            steals.append(
                round(100.0 * (s1 - s0) / (t1c - t0c), 2) if t1c > t0c else -1.0
            )
        try:
            plan = spec.fn(spark, sf_dir)._sc._jvm.PythonSQLUtils.explainString(
                spec.fn(spark, sf_dir)._jdf.queryExecution(), "formatted"
            )
        except Exception:
            import contextlib
            import io

            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                spec.fn(spark, sf_dir).explain("formatted")
            plan = buf.getvalue()
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(plan)
        print(
            f"{name}: runs={runs} min={min(runs):.3f} steal%={steals}"
            f"  plan -> plans/r13/{name}_{tag}.txt"
        )


if __name__ == "__main__":
    main()
