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

    ``events.parquet``'s timestamp physical type has varied across
    driver-generated datasets — TIMESTAMP(NANOS) (which Spark's
    vectorized reader only accepts as a raw int64 via ``nanosAsLong``)
    and native TIMESTAMP(MICROS) (read as TIMESTAMP_NTZ).  We adapt to
    whatever the file declares and always hand callers a session-tz
    ``timestamp`` column:

    - int64 nanos → ``timestamp_micros(ts div 1000)`` (``div``, never
      ``/``: nanos since epoch ≈ 1.7e18 overflows double's 53-bit
      mantissa and a float division would drift the microseconds);
    - TIMESTAMP_NTZ → ``cast('timestamp')`` — the session tz is pinned
      to UTC (session.py:64) so the cast is instant-preserving;
    - TIMESTAMP → passthrough.

    DuckDB reads the same file as naive micros, so oracles agree in
    every case.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        return normalize_events_ts(spark.read.parquet(f"{sf_dir}/events.parquet"))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_NANOS_CONF = "spark.sql.legacy.parquet.nanosAsLong"


def enable_nanos_scan(spark: SparkSession) -> None:
    """Turn on ``nanosAsLong`` for the session — call at SCAN sites.

    The conf is load-bearing while a (lazy) parquet read of a
    TIMESTAMP(NANOS) column executes: with it, the column scans as a
    raw int64; without it, Spark 4's vectorized reader errors.  It is a
    no-op for files without nanos timestamps.  Every reader of
    ``events.parquet`` must call this before triggering the scan —
    schema inspection (:func:`events_raw_schema`) deliberately does NOT
    leave it set on the caller's behalf (VERDICT r4/r5 hygiene: a
    getter must not mutate session state as a side effect).
    """
    spark.conf.set(_NANOS_CONF, "true")


def events_raw_schema(spark: SparkSession, sf_dir: str):
    """File-declared read schema for ``events.parquet``.

    Streaming readers must pass an explicit schema; taking it from the
    parquet footer (a metadata-only read) keeps streaming code working
    across the dataset variants described in :func:`load_table` —
    hardcoding ``ts: LongType`` breaks the moment the file declares
    native micros, and vice versa.

    The ``nanosAsLong`` conf is set only for the duration of the footer
    read and restored after — so the returned schema matches what a
    scan under :func:`enable_nanos_scan` produces, without this getter
    mutating session state.  Callers that go on to scan must call
    :func:`enable_nanos_scan` themselves (the streaming query sites do).
    """
    prior = spark.conf.get(_NANOS_CONF, None)
    spark.conf.set(_NANOS_CONF, "true")
    try:
        return spark.read.parquet(f"{sf_dir}/events.parquet").schema
    finally:
        if prior is None:
            spark.conf.unset(_NANOS_CONF)
        else:
            spark.conf.set(_NANOS_CONF, prior)


def normalize_events_ts(df: DataFrame, col: str = "ts", out: str | None = None) -> DataFrame:
    """Normalize a raw events timestamp column to session-tz ``timestamp``.

    Works on batch and streaming DataFrames alike — dispatches on the
    column's declared type per the table in :func:`load_table`.
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    out = out or col
    ts_type = df.schema[col].dataType
    if isinstance(ts_type, T.LongType):
        return df.withColumn(out, F.timestamp_micros(F.expr(f"{col} div 1000")))
    if isinstance(ts_type, T.TimestampNTZType):
        return df.withColumn(out, F.col(col).cast("timestamp"))
    return df if out == col else df.withColumn(out, F.col(col))


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so ``spark.sql`` can see them."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
