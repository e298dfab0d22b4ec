"""Clustered-corpus ANN benchmark (VERDICT r5 'Next round' #5).

The random testdata has no neighborhood structure, so ANN recall there
is a calibrated floor, not a realistic number.  This script generates a
PLANTED-CLUSTER corpus at the sf0.1 scale (n=2,000, dim=64: a Gaussian
mixture over K unit centers with within-cluster cos ≈ cos_target) and
reports, for each ANN tier, the same (wall time, recall@5 vs exact,
candidate fraction) block the driver bench reports on the random
corpus — the numbers SCALE.md records for the realistic shape.

Usage: python scripts/ann_clustered_bench.py [n] [k_clusters] [cos_target]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_clustered(n: int, k: int, dim: int, cos_target: float, seed: int = 31):
    """n unit vectors in k clusters; E[cos(member, center)] ≈ cos_target."""
    rng = np.random.RandomState(seed)
    centers = rng.randn(k, dim)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = rng.randint(0, k, size=n)
    # member = cos_target*center + sqrt(1-cos²)*orthonormal noise
    noise = rng.randn(n, dim)
    c = centers[labels]
    noise -= (noise * c).sum(axis=1, keepdims=True) * c
    noise /= np.linalg.norm(noise, axis=1, keepdims=True)
    sin = np.sqrt(1.0 - cos_target**2)
    vecs = cos_target * c + sin * noise
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    return vecs, labels


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    cos_target = float(sys.argv[3]) if len(sys.argv) > 3 else 0.85

    from frizzle_spark.operators import similarity as sim
    from frizzle_spark.plans.registry import REGISTRY
    from frizzle_spark.session import get_spark

    spark = get_spark("ann-clustered-bench")
    spark.range(64).repartition(8).mapInPandas(lambda it: it, schema="id long").count()

    vecs, labels = make_clustered(n, k, sim.DIM, cos_target)
    out = tempfile.mkdtemp(prefix="ann_clustered_")
    spark.createDataFrame(
        [(i, [float(x) for x in v], int(l)) for i, (v, l) in enumerate(zip(vecs, labels))],
        "vec_id long, embedding array<float>, label int",
    ).write.mode("overwrite").parquet(f"{out}/embeddings.parquet")

    try:
        exact = {
            (r["probe_id"], r["neighbor_id"])
            for r in REGISTRY["q12_cosine_topk"].fn(spark, out).collect()
        }
        fracs = sim.candidate_fractions(spark, out)
        res: dict = {
            "n": n,
            "k_clusters": k,
            "cos_target": cos_target,
            "tiers": {},
        }
        for q in ("qz12_ann_lsh", "qz12_ivf", "qz12_ivfpq"):
            runs = []
            rows = None
            for _ in range(3):
                t0 = time.perf_counter()
                rows = REGISTRY[q].fn(spark, out).collect()
                runs.append(round(time.perf_counter() - t0, 3))
            got = {(r["probe_id"], r["neighbor_id"]) for r in rows}
            res["tiers"][q] = {
                "time_s": min(runs),
                "recall": round(len(exact & got) / len(exact), 4),
                "candidate_fraction": fracs.get(q),
            }
        # context: how hard is the task? median true-neighbor cosine
        u = vecs
        probe_sims = u[:10] @ u.T
        np.fill_diagonal(probe_sims[:, :10], -2)
        top5 = np.sort(probe_sims, axis=1)[:, -5:]
        res["median_true_neighbor_cos"] = round(float(np.median(top5)), 4)
        print(json.dumps(res))
    finally:
        shutil.rmtree(out, ignore_errors=True)


if __name__ == "__main__":
    main()
