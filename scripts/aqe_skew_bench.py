"""Measure AQE skew-join splitting vs a skew-blind sort-merge join.

The engine ships TWO answers to join skew: the explicit salted join
(operators/skew.py, for when the skew is known and extreme) and Spark
AQE's runtime skew-join splitting (for skew discovered at run time).
This script measures the second on a worst-case corpus: a fact table
whose hot key holds ~70% of all rows, sort-merge-joined (broadcast
disabled) against a dim table, with AQE skew handling off vs on.

Skew thresholds are scaled DOWN to the test data size (the defaults
bind at 256 MB partitions — i.e., exactly at the 100 TB scale this
repo targets); what is being demonstrated is the MECHANISM: the hot
partition is split into N subpartitions and the join's task-time
distribution flattens.

Prints one JSON line; SCALE.md records the table.
"""

from __future__ import annotations

import json
import sys
import time

import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    from frizzle_spark.session import get_spark

    spark = get_spark("aqe-skew-bench")
    spark.range(64).repartition(8).mapInPandas(lambda it: it, schema="id long").count()

    # fact: 70% of rows on key 0, rest uniform over 10k keys; payload
    # column makes row width realistic enough for size-based skew stats
    fact = spark.range(n_rows).select(
        F.when(F.rand(7) < 0.7, F.lit(0))
        .otherwise((F.rand(11) * 10_000).cast("long"))
        .alias("k"),
        F.md5(F.col("id").cast("string")).alias("payload"),
    )
    dim = spark.range(10_000).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("grp")
    )

    def run(skew_enabled: bool):
        c = spark.conf
        prior = {
            "spark.sql.adaptive.skewJoin.enabled": c.get(
                "spark.sql.adaptive.skewJoin.enabled"
            ),
            "spark.sql.autoBroadcastJoinThreshold": c.get(
                "spark.sql.autoBroadcastJoinThreshold"
            ),
        }
        c.set("spark.sql.adaptive.skewJoin.enabled", str(skew_enabled).lower())
        c.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
        # scale the skew detector to the corpus (defaults bind at 256MB)
        c.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1m")
        c.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1m")
        c.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        try:
            # max("payload") forces the wide column through the join —
            # otherwise column pruning shrinks rows so far below the
            # (scaled) size threshold that no partition registers as
            # skewed and the run measures nothing
            df = (
                fact.join(dim, "k")
                .groupBy("grp")
                .agg(F.count(F.lit(1)).alias("n"), F.max("payload").alias("mx"))
            )
            runs = []
            for _ in range(3):
                t0 = time.perf_counter()
                df.collect()
                runs.append(round(time.perf_counter() - t0, 3))
            final = df._jdf.queryExecution().executedPlan().toString()
            return {
                "time_s": min(runs),
                "all_runs": runs,
                "skew_joins": final.count("skew=true"),
                "skewed_reads": final.count("and skewed"),
                "plan_has_smj": "SortMergeJoin" in final,
            }
        finally:
            for k, v in prior.items():
                c.set(k, v)

    out = {
        "n_rows": n_rows,
        "hot_key_share": 0.7,
        "skew_off": run(False),
        "skew_on": run(True),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
