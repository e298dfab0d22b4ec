"""Batch table sources over the driver-provided parquet star schema.

The reference's only sources are an in-memory channel, Kafka and Kinesis
(reference frizzle.go:27-35, basic/source.go:34-53); it has no relational
scans at all.  This module is the batch-scan half of our committed source
inventory (SURVEY.md §2.2): parquet scans that keep Catalyst fully
informed — column pruning and predicate pushdown reach the parquet
reader because we return the raw declarative scan and let callers
``select``/``filter`` on it.

Scale notes: parquet scans split by row-group; with
``spark.sql.files.maxPartitionBytes`` (default 128 MB) a 100 TB table
fans out to ~800k input tasks — no per-table tuning needed here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Small dimension tables that should always broadcast in joins.  At any
# realistic scale region/nation are KBs; customer/supplier/part grow with
# SF but stay far below lineitem/orders — the fact tables are never here.
BROADCAST_DIMS = frozenset({"region", "nation"})


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Declarative parquet scan for one star-schema table.

    ``events.parquet`` stores its timestamp as parquet TIMESTAMP(NANOS),
    which Spark's vectorized reader rejects outright — we read it as a
    raw int64 (``nanosAsLong``) and rebuild a microsecond timestamp with
    integer division (``div``, never ``/``: nanos since epoch ≈ 1.7e18
    overflows double's 53-bit mantissa and a float division would drift
    the microseconds).  DuckDB truncates NANOS→micros the same way, so
    oracles agree.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        from pyspark.sql import functions as F

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        return spark.read.parquet(f"{sf_dir}/events.parquet").withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        )
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so ``spark.sql`` can see them."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
