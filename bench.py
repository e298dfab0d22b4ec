"""Benchmark harness: run every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import frizzle_spark.plans.relational  # noqa: F401
    import frizzle_spark.plans.windows  # noqa: F401
    import frizzle_spark.plans.text_queries  # noqa: F401
    import frizzle_spark.operators.dedup  # noqa: F401
    import frizzle_spark.operators.similarity  # noqa: F401
    import frizzle_spark.plans.streaming_queries  # noqa: F401
    import frizzle_spark.plans.multimodal_queries  # noqa: F401
    import frizzle_spark.plans.joins_extra  # noqa: F401
    import frizzle_spark.plans.udf_queries  # noqa: F401
    import frizzle_spark.plans.sql_surface  # noqa: F401
    from frizzle_spark.plans.registry import REGISTRY
    from frizzle_spark.session import get_spark

    spark = get_spark("frizzle_spark-bench")
    # warm the JVM + parquet footers + the Python worker pool once so
    # per-query numbers measure the plan, not first-touch JIT / daemon
    # startup (which otherwise charges whichever query runs first)
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    spark.range(64).repartition(8).mapInPandas(
        lambda it: it, schema="id long"
    ).count()

    timings: dict[str, float] = {}
    for name, spec in sorted(REGISTRY.items()):
        t0 = time.perf_counter()
        df = spec.fn(spark, sf_dir)
        n = df.count() if "limit" not in name else len(df.collect())
        timings[name] = round(time.perf_counter() - t0, 3)
        print(f"# {name}: {timings[name]:.3f}s ({n} rows)", file=sys.stderr)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "total_query_wall_sec",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
