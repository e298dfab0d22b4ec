"""Vector column functions over ``array<float>`` embedding columns.

All JVM-side higher-order functions (``zip_with`` / ``aggregate``) — no
Python crosses the wire for the algebra, so cosine math runs inside
codegen next to the scan.  Floats are widened to double BEFORE any
arithmetic so results are bit-identical to the DuckDB oracle's DOUBLE[]
math (sequential left-fold accumulation on both sides).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(v: Column) -> Column:
    return v.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product (matches DuckDB list_dot_product order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(v: Column) -> Column:
    return F.sqrt(dot(v, v))


def cosine(a: Column, b: Column, norm_a: Column, norm_b: Column) -> Column:
    """Cosine from precomputed norms — precompute per row, never per pair."""
    return dot(a, b) / (norm_a * norm_b)
