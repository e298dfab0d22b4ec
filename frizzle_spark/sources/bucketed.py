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


def write_clustered(
    df: DataFrame,
    path: str,
    cluster_cols: list[str],
    partitions: int | None = None,
    max_records_per_file: int | None = None,
) -> None:
    """Range-clustered parquet layout: co-locate rows with nearby
    ``cluster_cols`` values so later selective scans PRUNE files instead
    of reading them.

    ``repartitionByRange`` gives files pairwise-DISJOINT key ranges
    (sampled range partitioner) and ``sortWithinPartitions`` makes each
    file internally sorted, so every parquet row-group's min/max
    statistics are tight.  A predicate like ``user_id = k`` then reads
    exactly one file's worth of row-groups — at 100 TB the difference
    between a full-corpus scan and a few hundred MB.  This is the
    single-dimension form of data clustering (Z-order generalizes it to
    multi-column predicates; range-on-leading-column is optimal for the
    single-key access path committed here and needs no custom codec).

    Complements ``write_bucketed``: bucketing kills the JOIN shuffle via
    hash co-location (equality access, catalog-tracked); clustering
    kills selective-SCAN IO via range co-location (range + equality
    pruning, plain files).  ``max_records_per_file`` caps file size so a
    skewed range splits into several files rather than one huge object.
    Layout disjointness is asserted from parquet footer statistics in
    tests/test_bucketing.py.
    """
    n = partitions or int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    out = df.repartitionByRange(n, *cluster_cols).sortWithinPartitions(
        *cluster_cols
    )
    writer = out.write.mode("overwrite")
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    writer.parquet(path)


def zorder_key(
    specs: list[tuple[str, float, float]], bits: int = 16
):
    """Z-order (Morton) key column from N (col, lo, hi) specs.

    Each column is min/max-scaled to a ``bits``-bit integer bucket and
    the buckets' bits are INTERLEAVED, so nearby z-values are nearby in
    EVERY clustered dimension at once — the multi-column generalization
    of single-key range clustering (Delta/Iceberg's OPTIMIZE ZORDER
    uses the same construction).  Pure codegen'd column arithmetic:
    N·bits shift/mask/or terms, no UDF, no shuffle of its own.

    (lo, hi) come from the caller (table stats or domain knowledge) —
    the scaling must be FIXED so the layout is stable across
    incremental writes; deriving it from each batch's min/max would
    re-grid every write.  Values outside [lo, hi] clamp to the edge
    buckets.
    """
    from pyspark.sql import functions as F

    # Guard rails (ADVICE r5): Spark's shiftleft wraps its shift amount
    # mod 64, so bits*len(specs) > 64 would silently interleave bits on
    # top of each other — a corrupted clustering layout with no error.
    # And a degenerate (lo == hi) spec divides by zero → NaN → NULL
    # buckets that greatest() coerces to bucket 0, quietly destroying
    # that dimension's locality.  Both must fail loudly.
    if bits * len(specs) > 64:
        raise ValueError(
            f"zorder_key: bits*len(specs) = {bits}*{len(specs)} exceeds the "
            f"64-bit key; pass bits<={64 // len(specs)} for {len(specs)} columns"
        )
    for col, lo, hi in specs:
        if not float(hi) > float(lo):
            raise ValueError(
                f"zorder_key: degenerate range for {col!r}: lo={lo} hi={hi} "
                "(need hi > lo; fix the spec or drop the column)"
            )

    mask = (1 << bits) - 1
    z = F.lit(0).cast("long")
    for j, (col, lo, hi) in enumerate(specs):
        scaled = (F.col(col).cast("double") - F.lit(float(lo))) / F.lit(
            float(hi) - float(lo)
        )
        bucket = F.least(
            F.lit(mask),
            F.greatest(F.lit(0), F.floor(scaled * mask).cast("long")),
        )
        for i in range(bits):
            # bit i of this column lands at interleaved position
            # i*len(specs) + j
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftright(bucket, i).bitwiseAND(F.lit(1)),
                    i * len(specs) + j,
                )
            )
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    specs: list[tuple[str, float, float]],
    partitions: int | None = None,
    max_records_per_file: int | None = None,
) -> None:
    """Multi-column clustered parquet layout via a Z-order key.

    Like :func:`write_clustered` but selective predicates on ANY of the
    clustered columns prune files: each file covers one z-range, which
    is a bounded hyper-rectangle neighborhood in every dimension, so
    every file's per-column min/max stats are tight in every clustered
    column simultaneously — single-key range clustering gives that for
    the leading column only.  The z column is dropped before writing
    (it is derivable; the layout, not the value, is the product).
    Asserted in tests/test_bucketing.py: per-file spans on BOTH
    clustered columns must be small fractions of their domains.
    """
    n = partitions or int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    out = (
        df.withColumn("__z", zorder_key(specs))
        .repartitionByRange(n, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )
    writer = out.write.mode("overwrite")
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    writer.parquet(path)
