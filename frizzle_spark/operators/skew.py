"""Skew-aware join utilities (SURVEY.md §4.2 scale concerns; no analogue
in the reference — it has no joins at all).

At 100 TB a handful of hot keys (a viral document, a null-ish default
user id) can put 100 GB behind one reduce task.  Two mitigations, in
preference order:

1. **AQE skew-join** (`spark.sql.adaptive.skewJoin.enabled`, on by
   default in our session) — runtime splitting of oversized partitions.
   Zero code; first choice.
2. **Salting** (this module) — for the cases AQE can't fix: skewed
   *aggregations*, and joins where the skewed side must meet a
   non-broadcastable right side.  ``salted_join`` explodes the small
   side SALT ways and sprays the big side uniformly; ``two_phase_agg``
   pre-aggregates on (key, salt) then re-aggregates on key, so the hot
   key's rows meet SALT reducers instead of one.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SALT = 16


def with_salt(df: DataFrame, buckets: int = DEFAULT_SALT, col: str = "_salt") -> DataFrame:
    """Uniform random salt column in [0, buckets) — spreads a hot key
    across ``buckets`` shuffle partitions."""
    return df.withColumn(col, (F.rand(seed=7) * buckets).cast("int"))


def replicate_for_salt(
    df: DataFrame, buckets: int = DEFAULT_SALT, col: str = "_salt"
) -> DataFrame:
    """Explode every row ``buckets`` ways (the small/right side of a
    salted join: each salted left partition finds its match locally)."""
    return df.withColumn(
        col, F.explode(F.array(*[F.lit(i) for i in range(buckets)]))
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    how: str = "inner",
    buckets: int = DEFAULT_SALT,
) -> DataFrame:
    """Equi-join with the big side salted and the small side replicated.

    Use only when `small` is too large to broadcast AND `big` has skewed
    join keys that AQE's split threshold misses.  Cost model: small side
    is shuffled ``buckets``× — worth it when the hot key's partition
    exceeds buckets × the median partition.
    """
    b = with_salt(big, buckets)
    s = replicate_for_salt(small, buckets)
    out = b.join(s, [*on, "_salt"], how)
    return out.drop("_salt")


def two_phase_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, Column],
    buckets: int = DEFAULT_SALT,
) -> DataFrame:
    """Skew-safe aggregation: partial agg on (keys, salt), final on keys.

    ``aggs`` maps output name → decomposable partial aggregate over the
    input (count/sum/min/max); the final phase re-combines partials
    (count → sum of counts, sum → sum, min → min, max → max).
    """
    salted = with_salt(df, buckets)
    partial = salted.groupBy(*keys, "_salt").agg(
        *[c.alias(f"_p_{name}") for name, c in aggs.items()]
    )
    recombine = {
        "count": F.sum,
        "sum": F.sum,
        "min": F.min,
        "max": F.max,
    }

    def final_col(name: str, c: Column) -> Column:
        # infer combiner from the partial expression's function name
        expr = c._jc.toString().lower()
        for fn, comb in recombine.items():
            if expr.startswith(fn):
                return comb(f"_p_{name}").alias(name)
        raise ValueError(f"non-decomposable aggregate for {name!r}: use avg=sum/count")

    return partial.groupBy(*keys).agg(
        *[final_col(name, c) for name, c in aggs.items()]
    )
