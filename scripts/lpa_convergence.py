"""LPA communities-vs-rounds on a planted corpus (round 11, VERDICT
r10 #5).

GRAPH_LSH_E2E.json showed fixed LPA_ITERS=5 rounds oversplitting a
planted 25k-cluster corpus into 47k communities (purity 1.0 — labels
never bleed ACROSS clusters, they just fail to coalesce WITHIN one).
This harness records how the community count approaches the planted
number as rounds grow, and what the ``until_stable`` knob lands on:

* a planted corpus of n/CLUSTER_SIZE tight cos≈0.95 clusters;
* kNN edges via the standard auto tier;
* label_propagation at fixed rounds 1..N, then ``until_stable=True``
  (fixpoint / 2-cycle detection, max_rounds-capped) — for each run:
  n_communities, planted purity, wall.

Usage: python scripts/lpa_convergence.py [out_json]
Env:   LPA_CONV_N (default 50000) — corpus size
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from knn_edge_crossover_bench import CLUSTER_SIZE, make_clustered_corpus

FIXED_ROUNDS = (1, 2, 3, 5, 8, 12, 20)


def main() -> None:
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from frizzle_spark.operators.graph import knn_edges, label_propagation
    from frizzle_spark.session import get_spark

    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "LPA_CONVERGENCE.json",
    )
    n = int(os.environ.get("LPA_CONV_N", "50000"))
    spark = get_spark("lpa-convergence")
    spark.sparkContext.setLogLevel("ERROR")

    corpus_dir = tempfile.mkdtemp(prefix="lpa_conv_")
    make_clustered_corpus(n, corpus_dir)
    edges = knn_edges(spark, corpus_dir).select("src", "dst").localCheckpoint()
    n_edges = edges.count()
    planted = n // CLUSTER_SIZE
    rec: dict = {"n": n, "planted_communities": planted, "n_edges": int(n_edges),
                 "runs": []}
    print(f"# n={n} planted={planted} edges={n_edges}", file=sys.stderr)

    def evaluate(lp):
        lp = lp.localCheckpoint()
        purity_row = (
            lp.withColumn("planted", (F.col("node") / CLUSTER_SIZE).cast("long"))
            .groupBy("community", "planted")
            .count()
            .withColumn(
                "rk",
                F.row_number().over(
                    Window.partitionBy("community")
                    .orderBy(F.desc("count"), F.asc("planted"))
                ),
            )
            .where(F.col("rk") == 1)
            .agg(F.sum("count").alias("majority"))
            .collect()[0]
        )
        n_nodes = lp.count()
        return (
            int(lp.select("community").distinct().count()),
            round(purity_row["majority"] / n_nodes, 4),
        )

    for r in FIXED_ROUNDS:
        t0 = time.perf_counter()
        lp = label_propagation(edges, n_iter=r)
        n_comm, purity = evaluate(lp)
        run = {"mode": "fixed", "rounds": r, "n_communities": n_comm,
               "planted_purity": purity,
               "wall_sec": round(time.perf_counter() - t0, 1)}
        rec["runs"].append(run)
        print(f"# {json.dumps(run)}", file=sys.stderr)

    probe: dict = {}
    t0 = time.perf_counter()
    lp = label_propagation(edges, until_stable=True, _probe=probe)
    n_comm, purity = evaluate(lp)
    run = {"mode": "until_stable", "rounds": probe.get("rounds_run"),
           "stopped": probe.get("stopped"),
           "changed_history": probe.get("changed_history"),
           "n_communities": n_comm, "planted_purity": purity,
           "wall_sec": round(time.perf_counter() - t0, 1)}
    rec["runs"].append(run)
    print(f"# {json.dumps(run)}", file=sys.stderr)

    with open(out_path, "w") as fh:
        json.dump(rec, fh, indent=1)
    print(json.dumps({"written": out_path}))
    spark.stop()


if __name__ == "__main__":
    main()
