"""Like-for-like ANN-LSH probing frontier (VERDICT r5 'Next round' #1).

For each probing strategy at the SAME corpus-derived (bits, tables) and
the SAME bucket budget — ``uniform`` Hamming-≤2 enumeration (the r02
parameterization) vs ``query``-directed margin-ranked perturbation
(the r05 default) — measure on one corpus:

* wall time (min of N runs) of the full top-k query (candidates +
  exact cosine re-rank + window top-k),
* recall vs the exact q12_cosine_topk pairs,
* scanned-candidate fraction.

Prints one JSON line; paste the table into SCALE.md.

Usage: python scripts/ann_probe_frontier.py [sf_dir] [n_runs]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql.window import Window


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from frizzle_spark.functions import vectors as V
    from frizzle_spark.operators.similarity import (
        N_PROBES,
        TOP_K,
        _corpus,
        ann_lsh_candidates,
    )
    from frizzle_spark.plans.registry import REGISTRY
    from frizzle_spark.session import get_spark

    spark = get_spark("ann-probe-frontier")
    spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    spark.range(64).repartition(8).mapInPandas(lambda it: it, schema="id long").count()

    n = _corpus(spark, sf_dir).count()
    denom = N_PROBES * (n - 1)
    exact = {
        (r["probe_id"], r["neighbor_id"])
        for r in REGISTRY["q12_cosine_topk"].fn(spark, sf_dir).collect()
    }

    def topk(probing: str):
        scored = ann_lsh_candidates(spark, sf_dir, probing=probing).withColumn(
            "cos_sim", V.dot(F.col("pu"), F.col("u"))
        )
        w = Window.partitionBy("probe_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= TOP_K)
            .select("probe_id", F.col("vec_id").alias("neighbor_id"))
        )

    out: dict[str, dict] = {"sf_dir": sf_dir, "n": n, "runs": n_runs}
    for probing in ("uniform", "query"):
        runs = []
        rows = None
        for _ in range(n_runs):
            t0 = time.perf_counter()
            rows = topk(probing).collect()
            runs.append(round(time.perf_counter() - t0, 3))
        got = {(r["probe_id"], r["neighbor_id"]) for r in rows}
        frac = ann_lsh_candidates(spark, sf_dir, probing=probing).count() / denom
        out[probing] = {
            "time_s": min(runs),
            "all_runs": runs,
            "recall": round(len(exact & got) / len(exact), 4),
            "candidate_fraction": round(frac, 4),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
