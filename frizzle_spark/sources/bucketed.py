"""Bucketed-table sink/scan — the co-located join layout (SURVEY.md §2.2
"joins" row: bucketing is the committed mechanism for repeated big-big
joins; the reference has no storage layer at all — its sinks are opaque
per-destination appends, reference basic/sink.go:28-37).

Why this matters at 100 TB: a sort-merge join between two fact tables
shuffles BOTH sides every run.  Bucketing pays that shuffle once at
write time — `bucketBy(N, key)` hash-partitions files on disk and
records the layout in the catalog — so every later join or aggregation
on the bucket key reads co-located partitions and skips the exchange
entirely (`tests/test_bucketing.py` asserts the join plan contains no
Exchange).  The bucket count is the write-time knob: pick it so one
bucket of the BIGGER table fits an executor's memory at target scale
(e.g. 100 TB / 4096 buckets ≈ 25 GB per bucket pre-compression).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    keys: list[str],
    buckets: int,
    sort: bool = True,
) -> None:
    """Persist ``df`` hash-bucketed (and per-bucket sorted) on ``keys``.

    Sorting within buckets lets a later sort-merge join skip its Sort
    as well as its Exchange when each bucket lands in one file.  Uses
    an explicit ``path`` so the catalog entry is an external table —
    nothing is written under the default warehouse dir.
    """
    writer = (
        df.write.mode("overwrite")
        .option("path", path)
        .bucketBy(buckets, *keys)
    )
    if sort:
        writer = writer.sortBy(*keys)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Scan a bucketed table THROUGH the catalog — `spark.read.parquet`
    on the same files would lose the bucket metadata and re-shuffle."""
    return spark.table(table)
