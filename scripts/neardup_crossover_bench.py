"""Embedding near-dup: exact GEMM grid vs LSH pre-blocker CROSSOVER
(round 8, VERDICT r7 #3).

qz11_embedding_neardup_lsh's docstring claims the LSH path wins in the
n²/n regime (n ≫ 2,000) but the largest prior measurement was sf1
(n=20,000, LSH slower-or-equal).  This harness generates planted
near-dup corpora at n up to 500k and measures BOTH paths' wall time and
shuffle volume, plus the LSH path's planted-pair recall and candidate
fraction, to locate where the curves actually cross.

Corpus: n random unit vectors (dim 64), the last m = max(10, n/1000)
replaced by planted cos≈0.95 near-copies of the first m (pairs
(i, n−m+i)).  NOTE the random background's cosine tail is heavy at
NEARDUP_THRESHOLD=0.4 (P ≈ 4.8e-4 per pair at d=64), so the exact
output is dominated by weak background pairs as n grows — both paths
pay the same emission cost, and the metric that matters for the
near-dup USE CASE is planted recall, reported separately.

Usage: python scripts/neardup_crossover_bench.py [n1,n2,...]
Merges into NEARDUP_CROSSOVER.json (by n) and prints the SCALE.md table.

FRIZZLE_XOVER_LSH_ONLY=1 skips the exact grid and records the
projected exact shuffle instead: at n=500k the exact path needs
~128 GB of shuffle (the measured 20.5 GB at 200k × (500/200)² — the
shuffle curve is cleanly quadratic across all four measured points)
which exceeds this box's free disk; the run was attempted and died on
java.io.IOException: No space left on device mid-grid.  That the LSH
path completes where the exact grid cannot physically run IS the
crossover statement at this n.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

DIM = 64
SEED = 47


def make_corpus(n: int, out_dir: str) -> int:
    """n unit vectors with m planted cos≈0.95 pairs (i, n-m+i); written
    straight through pyarrow (a 500k-row python-list createDataFrame
    would dominate the harness)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.RandomState(SEED)
    vecs = rng.randn(n, DIM)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    m = max(10, n // 1000)
    w = rng.randn(m, DIM)
    base = vecs[:m]
    w -= (w * base).sum(axis=1, keepdims=True) * base
    w /= np.linalg.norm(w, axis=1, keepdims=True)
    vecs[n - m :] = 0.95 * base + np.sqrt(1 - 0.95**2) * w
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
    return m


def shuffle_write_bytes(app_base: str) -> int:
    with urllib.request.urlopen(f"{app_base}/stages?status=complete") as r:
        stages = json.load(r)
    return sum(s.get("shuffleWriteBytes", 0) for s in stages)


def main() -> None:
    ns = (
        [int(x) for x in sys.argv[1].split(",")]
        if len(sys.argv) > 1
        else [20_000, 50_000, 100_000, 200_000, 500_000]
    )
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "48g")
        .appName("frizzle-neardup-crossover")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    app_base = f"{ui}/api/v1/applications/{spark.sparkContext.applicationId}"
    spark.range(64).repartition(8).mapInPandas(lambda it: it, schema="id long").count()

    from frizzle_spark.operators.similarity import (
        embedding_lsh_candidates,
        lsh_params,
        q11_embedding_neardup,
        qz11_embedding_neardup_lsh,
    )

    results = []
    for n in ns:
        d = tempfile.mkdtemp(prefix=f"xover_{n}_")
        m = make_corpus(n, d)
        row: dict = {"n": n, "planted": m, "bits": lsh_params(n)[0]}

        def timed(fn, key):
            s0 = shuffle_write_bytes(app_base)
            t0 = time.perf_counter()
            cnt = fn()
            row[key + "_sec"] = round(time.perf_counter() - t0, 2)
            row[key + "_rows"] = cnt
            row[key + "_shuffle_mb"] = round(
                (shuffle_write_bytes(app_base) - s0) / 1e6, 1
            )

        timed(lambda: qz11_embedding_neardup_lsh(spark, d).count(), "lsh")
        cand = embedding_lsh_candidates(spark, d).count()
        row["cand_fraction"] = round(cand / (n * (n - 1) / 2), 6)
        # planted recall of the LSH path (the near-dup-regime metric)
        planted_found = (
            qz11_embedding_neardup_lsh(spark, d)
            .where((F.col("id2") - F.col("id1")) == (n - m))
            .where(F.col("id1") < m)
            .count()
        )
        row["lsh_planted_recall"] = round(planted_found / m, 4)
        if os.environ.get("FRIZZLE_XOVER_LSH_ONLY"):
            row["exact"] = (
                "not run: projected shuffle ~20.5 GB x (n/200k)^2 exceeds "
                "free disk; attempted run died ENOSPC mid-grid"
            )
        else:
            timed(lambda: q11_embedding_neardup(spark, d).count(), "exact")
        results.append(row)
        print(json.dumps(row), file=sys.stderr)
        shutil.rmtree(d, ignore_errors=True)

    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "NEARDUP_CROSSOVER.json",
    )
    if os.path.exists(out):  # merge by n — partial reruns never clobber
        with open(out) as fh:
            merged = {r["n"]: r for r in json.load(fh)}
        merged.update({r["n"]: r for r in results})
        results = [merged[k] for k in sorted(merged)]
    with open(out, "w") as fh:
        json.dump(results, fh, indent=1)
    print(json.dumps(results))
    print("\n| n | exact wall | LSH wall | exact shuffle MB | LSH shuffle MB |"
          " cand frac | planted recall |")
    print("|---|---|---|---|---|---|---|")
    for r in results:
        print(
            f"| {r['n']:,} | {r.get('exact_sec', '—')} s | {r['lsh_sec']} s "
            f"| {r.get('exact_shuffle_mb', '—')} | {r['lsh_shuffle_mb']} "
            f"| {r['cand_fraction']} | {r['lsh_planted_recall']} |"
        )


if __name__ == "__main__":
    main()
