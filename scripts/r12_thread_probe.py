"""Thread-leak attribution: snapshot JVM thread-name histogram between
query batches to find what leaks ~10 threads/query in long sessions.

    python scripts/r12_thread_probe.py
"""

from __future__ import annotations

import os
import sys
import time
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__  # noqa: F401
    from frizzle_spark.plans.registry import REGISTRY
    from frizzle_spark.session import get_spark

    spark = get_spark("r12-thread-probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    spark.range(64).repartition(8).mapInPandas(lambda it: it, schema="id long").count()

    jvm = spark.sparkContext._jvm

    def histo() -> Counter:
        import re

        names = []
        it = jvm.java.lang.Thread.getAllStackTraces().keySet().iterator()
        while it.hasNext():
            n = it.next().getName()
            n = re.sub(r"\d+", "#", n)
            names.append(n)
        return Counter(names)

    def run(name: str) -> float:
        t0 = time.perf_counter()
        df = REGISTRY[name].fn(spark, sf_dir)
        if "limit" in name:
            df.collect()
        else:
            df.write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)

    base = histo()
    print(f"[base] total={sum(base.values())}", flush=True)

    batches = [
        ("prewarm", ["qz11_canonical_keep", "qz22_leakage_safe_split",
                     "qz11_incremental_neardup", "qz12_knn_graph"]),
        ("dedup", ["q11_ngram_jaccard", "qz11_jaccard_join", "qz11_containment",
                   "qz11_simhash", "qz11_minhash_lsh"]),
        ("streams", ["qz13_stream_counts", "qz13_stream_dedup", "qz13_curation_ingest"]),
        ("ann", ["qz12_sq8", "qz12_ivfpq", "qz12_pca", "qz12_range_search"]),
        ("graph", ["qz25_pagerank", "qz25_ppr", "qz25_communities"]),
    ]
    prev = base
    for label, names in batches:
        for n in names:
            w = run(n)
            print(f"[{label}] {n}: {w:.3f}s", flush=True)
        cur = histo()
        delta = Counter(cur)
        delta.subtract(prev)
        grown = {k: v for k, v in delta.items() if v != 0}
        print(f"[threads after {label}] total={sum(cur.values())} delta={dict(sorted(grown.items(), key=lambda kv: -kv[1]))}", flush=True)
        prev = cur


if __name__ == "__main__":
    main()
