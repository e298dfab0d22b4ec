"""Q18 — the user-extension surface (§2.2 UDF/UDAF row).

The reference's entire extension API is ``Transform func(Msg) Msg``
(reference transform.go:8-14).  Our equivalents, each demonstrated on a
real query and differentially checked:

* DataFrame→DataFrame transformers  — streaming/transforms.py (Q13)
* grouped-map / mapInPandas         — operators/similarity.py (GEMM
  kernels), functions/multimodal.py (media decode)
* stateful grouped-map              — streaming/analytics.running_counts
* **grouped-agg pandas UDF**        — THIS module: per-group mode over
  Arrow batches.  Integer math end-to-end so the differential check is
  hash-exact (no float-boundary risk in the mode/tie-break).

Scale shape: a grouped-agg pandas UDF is partial-aggregation-free (all
rows of a group meet one worker), so it shuffles the full input — use
built-ins when they exist; this surface is for semantics they lack.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from frizzle_spark.plans.registry import query
from frizzle_spark.sources.tables import load_table


def _make_udafs():
    """Build the UDAFs lazily — @pandas_udf parses its return type through
    the ACTIVE session, and registry modules import before any session
    exists in the driver process."""

    @pandas_udf("long")
    def mode_bucket(v: pd.Series) -> int:
        """Most frequent integer bucket (floor of value); smallest wins ties."""
        b = np.floor(v.to_numpy()).astype(np.int64)
        buckets, counts = np.unique(b, return_counts=True)
        best = counts.max()
        return int(buckets[counts == best].min())

    @pandas_udf("long")
    def mode_count(v: pd.Series) -> int:
        b = np.floor(v.to_numpy()).astype(np.int64)
        _, counts = np.unique(b, return_counts=True)
        return int(counts.max())

    return mode_bucket, mode_count


@query(
    "q18_pandas_udaf",
    oracle="""
    WITH c AS (
        SELECT event_type, CAST(floor(value) AS BIGINT) AS b, count(*) AS n
        FROM events GROUP BY 1, 2
    ),
    r AS (
        SELECT *, row_number() OVER (PARTITION BY event_type
                                     ORDER BY n DESC, b ASC) AS rn
        FROM c
    )
    SELECT event_type, b AS mode_bucket, n AS mode_count
    FROM r WHERE rn = 1
    """,
)
def q18_pandas_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type value-bucket mode via a grouped-agg pandas UDF."""
    ev = load_table(spark, sf_dir, "events")
    mode_bucket, mode_count = _make_udafs()
    return ev.groupBy("event_type").agg(
        mode_bucket(F.col("value")).alias("mode_bucket"),
        mode_count(F.col("value")).alias("mode_count"),
    )
