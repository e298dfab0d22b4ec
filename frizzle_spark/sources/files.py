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


def scan_parquet_lenient(
    spark: SparkSession, path: str, schema: StructType | str | None = None
) -> DataFrame:
    """Corrupt-file-tolerant columnar scan.

    At 100 TB an object store WILL eventually serve a truncated or
    bit-rotted object, and the default scan fails the whole job on the
    first bad footer — hours of work lost to one file.  This variant
    sets the per-read ``ignoreCorruptFiles`` / ``ignoreMissingFiles``
    generic file-source options (scoped to THIS scan — never the
    session-wide ``spark.sql.files.*`` confs, which would silently
    change unrelated reads): corrupt files are logged and skipped,
    good files stream through untouched.

    ``schema`` should be passed when tolerating corruption — inference
    itself reads footers and can trip on the bad file before the
    option applies to data reads.  Use for backfill/quarantine sweeps;
    keep the strict default for pipelines where silent data loss is
    worse than a failed job (the strict/lenient split is asserted in
    tests/test_sources_skew.py).
    """
    reader = (
        spark.read.option("ignoreCorruptFiles", "true")
        .option("ignoreMissingFiles", "true")
    )
    if schema is not None:
        reader = reader.schema(schema)
    return reader.parquet(path)


def scan_parquet_evolving(
    spark: SparkSession, *paths: str, schema: StructType | str | None = None
) -> DataFrame:
    """Schema-evolution-tolerant columnar scan.

    A long-lived dataset's files are written by MANY pipeline versions:
    columns get added, and old files simply lack them.  The strict scan
    picks one footer's schema and silently DROPS later columns (or
    fails, depending on which file wins footer sampling).  Two correct
    modes, chosen by whether a declared schema exists:

    * ``schema`` given (the production path): every file is read
      through the declared schema — missing columns come back NULL,
      extra on-disk columns are pruned, and NO footer sweep happens.
      At 100 TB this is the only sane default; the catalog owns the
      schema, not the files.
    * no ``schema`` (exploration/backfill): ``mergeSchema`` unions all
      footer schemas.  Correct, but it READS EVERY FOOTER at planning
      time — O(files) driver-side metadata fetches — so it is the
      discovery tool, not the steady-state reader.

    Column-type CHANGES (not additions) are out of scope for both
    modes and should fail loudly — see tests/test_sources_skew.py.
    """
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("mergeSchema", "true")
    return reader.parquet(*paths)


def scan_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC columnar scan (bundled in OSS Spark): predicate pushdown +
    column pruning + stripe skipping, same contract as parquet."""
    return spark.read.orc(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).orc(path)


def scan_avro(spark: SparkSession, path: str) -> DataFrame:
    """Avro scan — requires the external ``spark-avro`` module
    (``spark-submit --packages org.apache.spark:spark-avro_2.13:<ver>``);
    OSS Spark does not bundle the datasource (only the avro runtime
    jars), so this raises a clear error when it is absent — the same
    connector-absent posture as KinesisSource (streaming/pipeline.py).
    """
    try:
        return spark.read.format("avro").load(path)
    except Exception as exc:
        raise NotImplementedError(
            "Avro needs the spark-avro datasource on the classpath "
            "(spark-submit --packages org.apache.spark:spark-avro_2.13:...); "
            "not bundled in OSS Spark"
        ) from exc


def scan_binary_files(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """Raw media ingestion: Spark's ``binaryFile`` source reads a
    directory of opaque files into (path, modificationTime, length,
    content binary) — the entry point that turns a crawl dump of
    images/audio into the Q15 multimodal table shape
    (content → ``media`` column + typed metadata; see
    plans/multimodal_queries.py).

    Scale notes: each file becomes one row read by whatever task owns
    it — no splitting, so MANY SMALL FILES is the failure mode
    (driver-side file listing + one task per tiny file).  Production
    pattern: binaryFile-ingest ONCE, immediately rewrite as parquet
    with the binary payload inline (≤ a few MB each) or as pointers,
    then all downstream passes scan parquet.  ``pathGlobFilter``
    pushes the extension filter into the LISTING, not a post-scan
    filter.
    """
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)
