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

from collections.abc import Callable, Sequence

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

    Only ``inner`` and ``left`` are supported: the replication is on the
    SMALL side, so unmatched big-side rows surface once (their salt
    matches nothing), but under ``right``/``full`` every unmatched
    small-side row would surface once PER SALT BUCKET (``buckets``
    duplicate null-padded rows).  For a right/full skewed join, swap the
    sides or salt the other way.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how in {{'inner','left'}}, got {how!r}: "
            "replicating the small side duplicates its unmatched rows "
            "once per salt bucket under right/full joins"
        )
    b = with_salt(big, buckets)
    s = replicate_for_salt(small, buckets)
    out = b.join(s, [*on, "_salt"], how)
    return out.drop("_salt")


COMBINERS = {"sum": F.sum, "min": F.min, "max": F.max}


def two_phase_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[Column, "str | Callable[[str], Column]"]],
    buckets: int = DEFAULT_SALT,
) -> DataFrame:
    """Skew-safe aggregation: partial agg on (keys, salt), final on keys.

    ``aggs`` maps output name → ``(partial, combiner)`` where ``partial``
    is the per-(key, salt) aggregate Column and ``combiner`` names how the
    partials merge in the final phase — ``'sum'``/``'min'``/``'max'`` or
    any callable ``column_name -> Column`` (count partials combine with
    ``'sum'``; avg decomposes as a sum partial and a count partial
    divided after the final phase).

    The combiner is EXPLICIT by design: inferring it from the partial
    expression's string form misclassifies wrapped expressions (e.g.
    ``round(sum(x))``) and depends on JVM internals that do not exist
    under Spark Connect.
    """
    salted = with_salt(df, buckets)

    def resolve(name: str, spec) -> tuple[Column, Callable[[str], Column]]:
        if not (isinstance(spec, tuple) and len(spec) == 2):
            raise ValueError(
                f"non-decomposable aggregate spec for {name!r}: pass "
                "(partial_column, combiner) — e.g. avg = a sum partial "
                "and a count partial combined as sum, divided afterwards"
            )
        partial, comb = spec
        if isinstance(comb, str):
            if comb not in COMBINERS:
                raise ValueError(
                    f"unknown combiner {comb!r} for {name!r}; "
                    f"one of {sorted(COMBINERS)} or a callable"
                )
            comb = COMBINERS[comb]
        return partial, comb

    resolved = {name: resolve(name, spec) for name, spec in aggs.items()}
    partial = salted.groupBy(*keys, "_salt").agg(
        *[c.alias(f"_p_{name}") for name, (c, _) in resolved.items()]
    )
    return partial.groupBy(*keys).agg(
        *[comb(f"_p_{name}").alias(name) for name, (_, comb) in resolved.items()]
    )


def salted_topk(
    df: DataFrame,
    keys: Sequence[str],
    order_col: str,
    k: int,
    tiebreak: str,
    buckets: int = DEFAULT_SALT,
    descending: bool = True,
) -> DataFrame:
    """Per-group top-k that survives a HOT group: local top-k within
    (key, salt) — the hot group's rows meet ``buckets`` reducers, each
    keeping only k — then global top-k over the ≤ buckets·k survivors
    per key.  Identical result to the plain window (per-group top-k is
    a salted-mergeable operation: the global top-k is contained in the
    union of local top-ks), pinned by the equivalence test.

    Use when one group dwarfs the rest (a viral document's events, a
    default/null-ish key): WindowGroupLimit pushes the k-limit into the
    shuffle but every row of a group still lands on ONE reducer; with
    salting the straggler does ``rows/buckets`` work.  The trade is a
    second (tiny) shuffle of ≤ buckets·k rows per key.
    """
    from pyspark.sql.window import Window

    def ordering():
        c = F.col(order_col)
        first = c.desc() if descending else c.asc()
        return [first, F.col(tiebreak).asc()]

    salted = with_salt(df, buckets)
    w_local = Window.partitionBy(*keys, "_salt").orderBy(*ordering())
    local = (
        salted.withColumn("_rn", F.row_number().over(w_local))
        .where(F.col("_rn") <= k)
        .drop("_rn", "_salt")
    )
    w_global = Window.partitionBy(*keys).orderBy(*ordering())
    return (
        local.withColumn("rank", F.row_number().over(w_global).cast("long"))
        .where(F.col("rank") <= k)
    )
