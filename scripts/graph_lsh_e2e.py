"""Post-crossover graph tier END TO END (round 10, VERDICT r9 #3).

KNN_EDGE_CROSSOVER.json proved the LSH-blocked EDGE BUILD survives
n=500k where the exact grid dies ENOSPC; this harness proves the
CONSUMERS compose with it: pagerank and label_propagation run over the
n=500k LSH-built edge set (the auto tier past KNN_EXACT_MAX_N) with
the co-partition superstep, recording walls plus the checks that make
the numbers meaningful at a size where a numpy twin cannot run:

* pagerank mass conservation: |Σrank − 1| (the per-round invariant the
  operator's algebra guarantees; a superstep bug breaks it first);
* LPA planted-community recovery: the corpus is n/20 tight cos≈0.95
  clusters, so communities should reconstruct the planted clusters —
  reported as purity (fraction of nodes whose community's plurality
  planted-cluster is their own);
* a MID-SIZE identity leg (n=20k, forced LSH edges — same code path):
  pagerank and LPA each run in BOTH co-partition modes and must agree
  exactly (ranks to 1e-12, labels bit-equal) — the superstep-identity
  check the big run rides on.

Usage: python scripts/graph_lsh_e2e.py [out_json]
Env:   GRAPH_E2E_N (default 500000), GRAPH_E2E_MID_N (default 20000)
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from knn_edge_crossover_bench import CLUSTER_SIZE, make_clustered_corpus


def main() -> None:
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from frizzle_spark.operators.graph import (
        KNN_EXACT_MAX_N,
        knn_edges,
        label_propagation,
        pagerank,
    )
    from frizzle_spark.session import get_spark

    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "GRAPH_LSH_E2E.json",
    )
    n_big = int(os.environ.get("GRAPH_E2E_N", "500000"))
    n_mid = int(os.environ.get("GRAPH_E2E_MID_N", "20000"))
    spark = get_spark("graph-lsh-e2e")
    spark.sparkContext.setLogLevel("ERROR")

    rec: dict = {"n": n_big, "mid_n": n_mid,
                 "knn_exact_max_n": KNN_EXACT_MAX_N}

    # ---- mid-size identity leg: same LSH code path, both superstep modes
    mid_dir = tempfile.mkdtemp(prefix="graph_e2e_mid_")
    make_clustered_corpus(n_mid, mid_dir)
    mid_edges = knn_edges(spark, mid_dir, exact=False).select(
        "src", "dst"
    ).localCheckpoint()
    pr_a = {r["node"]: r["rank"] for r in pagerank(mid_edges, co_partition=True).collect()}
    pr_b = {r["node"]: r["rank"] for r in pagerank(mid_edges, co_partition=False).collect()}
    assert pr_a.keys() == pr_b.keys()
    pr_max_diff = max(abs(pr_a[k] - pr_b[k]) for k in pr_a)
    lp_a = {r["node"]: r["community"] for r in label_propagation(mid_edges, co_partition=True).collect()}
    lp_b = {r["node"]: r["community"] for r in label_propagation(mid_edges, co_partition=False).collect()}
    rec["mid_identity"] = {
        "pagerank_max_abs_diff": pr_max_diff,
        "pagerank_identical_1e12": bool(pr_max_diff < 1e-12),
        "lpa_labels_identical": bool(lp_a == lp_b),
    }
    assert pr_max_diff < 1e-12 and lp_a == lp_b
    print(f"# mid identity OK (pr diff {pr_max_diff:.2e})", file=sys.stderr)

    # ---- the big leg: n=500k through the auto (LSH) tier
    big_dir = tempfile.mkdtemp(prefix="graph_e2e_big_")
    make_clustered_corpus(n_big, big_dir)
    probe: dict = {}
    t0 = time.perf_counter()
    edges = knn_edges(spark, big_dir, exact=None, _probe=probe).select(
        "src", "dst"
    ).localCheckpoint()
    n_edges = edges.count()
    rec["edge_build"] = {
        "wall_sec": round(time.perf_counter() - t0, 1),
        "tier_exact": probe.get("exact"),
        "n_edges": int(n_edges),
    }
    if n_big > KNN_EXACT_MAX_N:
        assert probe.get("exact") is False, "auto must pick LSH past the crossover"
    print(f"# edges built: {n_edges} in {rec['edge_build']['wall_sec']}s",
          file=sys.stderr)

    t0 = time.perf_counter()
    pr = pagerank(edges).localCheckpoint()
    mass = pr.agg(F.sum("rank").alias("s")).collect()[0]["s"]
    rec["pagerank"] = {
        "wall_sec": round(time.perf_counter() - t0, 1),
        "n_nodes": int(pr.count()),
        "mass_abs_err": abs(1.0 - float(mass)),
    }
    assert rec["pagerank"]["mass_abs_err"] < 1e-9
    print(f"# pagerank: {rec['pagerank']}", file=sys.stderr)

    t0 = time.perf_counter()
    lp = label_propagation(edges).localCheckpoint()
    # planted-community purity: plurality planted cluster per community
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
        .agg(
            F.sum("count").alias("majority"),
        )
        .collect()[0]
    )
    n_nodes = lp.count()
    rec["lpa"] = {
        "wall_sec": round(time.perf_counter() - t0, 1),
        "n_nodes": int(n_nodes),
        "n_communities": int(lp.select("community").distinct().count()),
        "planted_purity": round(purity_row["majority"] / n_nodes, 4),
    }
    print(f"# lpa: {rec['lpa']}", file=sys.stderr)

    with open(out_path, "w") as fh:
        json.dump(rec, fh, indent=1)
    print(json.dumps({"written": out_path}))
    spark.stop()


if __name__ == "__main__":
    main()
