"""Per-stage timing of qz11_simhash at sf0.1 (VERDICT r2 'what's wrong' #1).

Stages timed independently (each with its own .count() action), 3 runs each
in one fresh session so run 1 carries codegen/JIT compile and runs 2-3 show
steady state:

  A. shingles          — scan + explode + distinct          (shuffle 1)
  B. fingerprints      — 17-buffer packed agg + 64-term unpack (shuffle 2)
  C. full query        — band self-join + hamming filter     (shuffle 3+)

Usage: python scripts/profile_simhash.py [sf_dir]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from frizzle_spark.operators.dedup import (  # noqa: E402
    _shingles,
    qz11_simhash,
    simhash_fingerprints,
)
from frizzle_spark.session import get_spark  # noqa: E402


def timed(label: str, fn, n: int = 3) -> list[float]:
    runs = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        runs.append(round(time.perf_counter() - t0, 3))
    print(f"{label:20s} {runs}  min={min(runs):.3f}")
    return runs


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("profile-simhash")
    spark.read.parquet(f"{sf_dir}/documents.parquet").count()  # warm footers

    timed("A shingles", lambda: _shingles(spark, sf_dir).count())

    def fp_count():
        sh = _shingles(spark, sf_dir)
        hashed = sh.select("doc_id", F.xxhash64(F.col("shingle")).alias("h64"))
        return simhash_fingerprints(hashed).count()

    timed("B fingerprints", fp_count)
    timed("C full query", lambda: qz11_simhash(spark, sf_dir).count())


if __name__ == "__main__":
    main()
