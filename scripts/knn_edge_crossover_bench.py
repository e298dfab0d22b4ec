"""kNN EDGE build: exact GEMM grid vs LSH-blocked tier CROSSOVER
(round 9, VERDICT r8 #1).

NEARDUP_CROSSOVER.json located the exact-vs-LSH crossover for the
THRESHOLD near-dup scan (exact dies ENOSPC at n=500k; LSH completes at
recall 0.994).  This harness measures the same curves for the kNN EDGE
build that the whole graph tier rides (knn_edges → pagerank / ppr /
communities / triangles): wall time of both tiers, the approximate
tier's directed-edge recall vs exact where exact can still run, and
the scored candidate fraction.  The result pins ``KNN_EXACT_MAX_N``
(operators/graph.py) — the auto-switch threshold.

Corpus: CLUSTERED (n/20 tight cos≈0.95 clusters of 20) — the regime
where top-k recall is a meaningful bar; on random vectors every
bucketed method sits at a documented ~0.3-0.4 floor (SCALE.md).

Usage: python scripts/knn_edge_crossover_bench.py [n1,n2,...]
Merges into KNN_EDGE_CROSSOVER.json (by n) and prints a SCALE.md row
per n.  FRIZZLE_XOVER_LSH_ONLY=1 skips the exact grid (the n=500k
posture: the exact grid's shuffle is measured-quadratic in the sibling
record and exceeds this box's disk past ~300k).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

DIM = 64
CLUSTER_SIZE = 20
SEED = 99


def make_clustered_corpus(n: int, out_dir: str) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.RandomState(SEED)
    n_clusters = n // CLUSTER_SIZE
    centers = rng.randn(n_clusters, DIM)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    vecs = np.repeat(centers, CLUSTER_SIZE, axis=0)[:n] + 0.03 * rng.randn(n, DIM)
    flat = pa.array(vecs.astype(np.float32).ravel(), type=pa.float32())
    offsets = pa.array(np.arange(0, (n + 1) * DIM, DIM, dtype=np.int32))
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.ListArray.from_arrays(offsets, flat),
            "label": pa.array(np.zeros(n, dtype=np.int32)),
        }
    )
    pq.write_table(tbl, os.path.join(out_dir, "embeddings.parquet"))


def main() -> None:
    ns = (
        [int(x) for x in sys.argv[1].split(",")]
        if len(sys.argv) > 1
        else [20_000, 50_000, 100_000, 200_000, 500_000]
    )
    lsh_only = os.environ.get("FRIZZLE_XOVER_LSH_ONLY") == "1"
    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "48g")
        .appName("frizzle-knn-edge-crossover")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(64).repartition(8).mapInPandas(lambda it: it, schema="id long").count()

    from frizzle_spark.operators.graph import KNN_EXACT_MAX_N, knn_edges
    from frizzle_spark.operators.similarity import lsh_params

    results = []
    for n in ns:
        d = tempfile.mkdtemp(prefix=f"knnx_{n}_")
        make_clustered_corpus(n, d)
        row: dict = {"n": n, "bits": lsh_params(n)[0]}
        t0 = time.time()
        approx = knn_edges(spark, d, exact=False)
        approx_pairs = {(r["src"], r["dst"]) for r in approx.collect()}
        row["lsh_sec"] = round(time.time() - t0, 2)
        row["lsh_edges"] = len(approx_pairs)
        run_exact = not lsh_only and n <= 300_000
        if run_exact:
            t0 = time.time()
            exact_pairs = {
                (r["src"], r["dst"])
                for r in knn_edges(spark, d, exact=True).collect()
            }
            row["exact_sec"] = round(time.time() - t0, 2)
            row["exact_edges"] = len(exact_pairs)
            row["lsh_edge_recall"] = round(
                len(approx_pairs & exact_pairs) / max(len(exact_pairs), 1), 4
            )
        else:
            row["exact"] = (
                "not run: the exact grid's shuffle is measured-quadratic "
                "(NEARDUP_CROSSOVER.json: 20.5 GB at 200k, died ENOSPC at "
                "500k); same GEMM grid here"
            )
        results.append(row)
        print(json.dumps(row), flush=True)
        import shutil

        shutil.rmtree(d, ignore_errors=True)

    out = "KNN_EDGE_CROSSOVER.json"
    prior = []
    if os.path.exists(out):
        with open(out) as fh:
            prior = json.load(fh)
    by_n = {r["n"]: r for r in prior}
    for r in results:
        by_n[r["n"]] = r
    merged = [by_n[k] for k in sorted(by_n)]
    with open(out, "w") as fh:
        json.dump(merged, fh, indent=1)
    print(f"auto-switch threshold KNN_EXACT_MAX_N = {KNN_EXACT_MAX_N}")


if __name__ == "__main__":
    main()
