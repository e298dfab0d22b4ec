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
import frizzle_spark.operators.similarity  # noqa: F401
import frizzle_spark.plans.streaming_queries  # noqa: F401
import frizzle_spark.plans.multimodal_queries  # noqa: F401
import frizzle_spark.plans.joins_extra  # noqa: F401
import frizzle_spark.plans.udf_queries  # noqa: F401
import frizzle_spark.plans.sql_surface  # noqa: F401
from frizzle_spark.plans.registry import REGISTRY


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (Q1 pricing summary) on /root/testdata/sf0.001."""
    return REGISTRY["q1_pricing_summary"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in sorted(REGISTRY.items())}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; omitted → rows-only check."""
    return {name: spec.oracle for name, spec in sorted(REGISTRY.items()) if spec.oracle}
