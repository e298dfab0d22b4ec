"""Round-12 session-decay probe: time sentinel queries at successive
session stages (fresh -> after index prewarms -> after qz11 family ->
after qz12 family) with JVM heap / persistent-RDD / thread counters, to
attribute the 240s-bench late-alphabet degradation to a stage.

    python scripts/r12_decay_probe.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SENTINELS = ["qz12_sq8", "qz12_range_search", "qz25_communities", "qz5_scd2"]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__  # noqa: F401
    from frizzle_spark.plans.registry import REGISTRY
    from frizzle_spark.session import get_spark

    spark = get_spark("r12-decay-probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    spark.range(64).repartition(8).mapInPandas(lambda it: it, schema="id long").count()

    jvm = spark.sparkContext._jvm
    rt = jvm.java.lang.Runtime.getRuntime()

    def state(label: str) -> None:
        used = (rt.totalMemory() - rt.freeMemory()) // (1 << 20)
        n_rdd = spark.sparkContext._jsc.sc().getPersistentRDDs().size()
        n_thr = jvm.java.lang.Thread.activeCount()
        print(f"[state:{label}] heap_used={used}MiB persistent_rdds={n_rdd} jvm_threads={n_thr}", flush=True)

    def run(name: str) -> float:
        t0 = time.perf_counter()
        df = REGISTRY[name].fn(spark, sf_dir)
        if "limit" in name:
            df.collect()
        else:
            df.write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)

    def sentinels(label: str) -> None:
        for s in SENTINELS:
            w = run(s)
            print(f"[{label}] {s}: {w:.3f}s", flush=True)
        state(label)

    state("fresh")
    sentinels("fresh")

    for warm in ("qz11_canonical_keep", "qz22_leakage_safe_split",
                 "qz11_incremental_neardup", "qz12_knn_graph"):
        w = run(warm)
        print(f"[prewarm] {warm}: {w:.3f}s", flush=True)
    sentinels("after-prewarm")

    fam = sorted(n for n in REGISTRY if n.startswith("qz11") or n == "q11_ngram_jaccard")
    for name in fam:
        for _ in range(2):
            w = run(name)
        print(f"[qz11] {name}: {w:.3f}s", flush=True)
    sentinels("after-qz11")

    fam12 = sorted(n for n in REGISTRY if n.startswith(("qz12", "qz13")))
    for name in fam12:
        for _ in range(2):
            w = run(name)
        print(f"[qz12-13] {name}: {w:.3f}s", flush=True)
    sentinels("after-qz12-13")


if __name__ == "__main__":
    main()
