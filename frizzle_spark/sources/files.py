"""Generic batch file scans — the CSV/JSON half of the committed source
inventory (SURVEY.md §2.2 "scans/sources"; the reference reads only
in-memory channels, Kafka and Kinesis, reference frizzle.go:27-35).

Schemas are always supplied explicitly: schema inference reads the data
twice, and at 100 TB the inference pass alone is a full-table scan.
CSV/JSON scans have no predicate pushdown (row formats), but column
pruning still applies for CSV and both benefit from partition-dir
pruning — the docstring contract tests assert the parquet path stays
the fast default.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def scan_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    header: bool = True,
    **options: str,
) -> DataFrame:
    reader = spark.read.schema(schema).option("header", str(header).lower())
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.csv(path)


def scan_json(
    spark: SparkSession, path: str, schema: StructType | str, **options: str
) -> DataFrame:
    """JSON-lines scan.  ``schema`` is mandatory — with it, Spark prunes
    unreferenced fields during parsing (no full-object materialization)."""
    reader = spark.read.schema(schema)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.json(path)


def scan_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Columnar scan: predicate pushdown + column pruning + row-group skip."""
    return spark.read.parquet(path)
