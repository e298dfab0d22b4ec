"""Measure the parquet compression-codec trade at sf0.1 (SCALE.md).

Writes the sf0.1 ``lineitem`` table (600k rows) under each codec and
records: bytes on disk, write wall time, and read wall time for (a) a
full aggregation pass and (b) a selective 2-column projection — the
numbers behind the codec choice a 100 TB deployment writes into its
table properties.  Prints one JSON line.

Usage: python scripts/codec_bench.py [sf_dir] [n_runs]
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

CODECS = ["uncompressed", "snappy", "gzip", "zstd"]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from frizzle_spark.session import get_spark

    spark = get_spark("codec-bench")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    li.count()  # warm

    base = tempfile.mkdtemp(prefix="codecs_")
    out: dict = {"sf_dir": sf_dir, "n_rows": li.count(), "codecs": {}}
    try:
        for codec in CODECS:
            path = f"{base}/{codec}"
            t0 = time.perf_counter()
            li.repartition(8).write.option("compression", codec).parquet(path)
            w_time = round(time.perf_counter() - t0, 3)
            size = sum(
                os.path.getsize(f) for f in glob.glob(f"{path}/*.parquet")
            )

            agg_runs, proj_runs = [], []
            for _ in range(n_runs):
                t0 = time.perf_counter()
                spark.read.parquet(path).groupBy("l_returnflag").agg(
                    F.sum("l_quantity"), F.avg("l_extendedprice")
                ).collect()
                agg_runs.append(round(time.perf_counter() - t0, 3))
                t0 = time.perf_counter()
                spark.read.parquet(path).select("l_orderkey", "l_quantity").where(
                    F.col("l_quantity") > 45
                ).count()
                proj_runs.append(round(time.perf_counter() - t0, 3))
            out["codecs"][codec] = {
                "bytes": size,
                "mb": round(size / 1e6, 1),
                "write_s": w_time,
                "agg_read_s": min(agg_runs),
                "proj_read_s": min(proj_runs),
            }
        print(json.dumps(out))
    finally:
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
