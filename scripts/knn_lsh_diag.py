"""Stage-by-stage diagnosis of the LSH kNN edge build at n=100k —
the regime where the first crossover attempt exhausted disk mid-join
(stage-22 SMJ sort spill).  Measures each intermediate's row volume
and wall so the blowup is located, not guessed."""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from knn_edge_crossover_bench import make_clustered_corpus  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", "48g")
        .appName("knn-lsh-diag")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from frizzle_spark.functions import vectors as V
    from frizzle_spark.operators.graph import knn_lsh_candidates
    from frizzle_spark.operators.similarity import (
        DIM,
        _corpus,
        _lsh_codes,
        _lsh_planes,
        _lsh_probe_codes,
        _unit,
        lsh_params,
    )

    d = tempfile.mkdtemp(prefix=f"knndiag_{n}_")
    make_clustered_corpus(n, d)
    unit = _unit(_corpus(spark, d)).localCheckpoint()

    bits, tables, _ = lsh_params(n)
    print(f"n={n} bits={bits} tables={tables}", flush=True)
    bc = spark.sparkContext.broadcast(_lsh_planes(bits, tables, DIM))
    coded = _lsh_codes(unit, bc)
    probe = _lsh_probe_codes(unit, bc, budget=bits + 1)

    t0 = time.time()
    print("probe rows:", probe.count(), f"{time.time()-t0:.1f}s", flush=True)

    raw = (
        probe.alias("a")
        .join(coded.alias("b"), ["table_id", "code"])
        .where(F.col("a.vec_id") != F.col("b.vec_id"))
    )
    t0 = time.time()
    print("raw collisions:", raw.count(), f"{time.time()-t0:.1f}s", flush=True)

    t0 = time.time()
    cand = knn_lsh_candidates(spark, unit, n).localCheckpoint()
    print("distinct directed cand:", cand.count(), f"{time.time()-t0:.1f}s", flush=True)

    u1 = unit.select(F.col("vec_id").alias("src"), F.col("u").alias("u_src"))
    u2 = unit.select(F.col("vec_id").alias("dst"), F.col("u").alias("u_dst"))
    t0 = time.time()
    scored = (
        cand.join(u1, "src")
        .join(u2, "dst")
        .select("src", "dst", V.dot(F.col("u_src"), F.col("u_dst")).alias("s"))
    )
    print("scored rows:", scored.count(), f"{time.time()-t0:.1f}s", flush=True)
    scored.explain("formatted")

    import shutil

    shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
