"""Distributed exact global order statistics (round 9).

``Window.orderBy`` with no partition keys plans ``Exchange
SinglePartition`` + one sort task over the ENTIRE input — the one
window shape that cannot survive scale-up, and the full-registry sf10
run caught it live: qz26_rfm's three global ntiles were the only
genuinely superlinear PLAN in the record (22x wall per 10x data while
the registry median was 4.8x; see SCALE.md "Round-9: distributed
global-rank").  The reference has no window layer at all (its surface
is the message bus, frizzle.go:97-123), so the scale posture here is
ours to own.

``global_row_number`` computes the EXACT global row_number over a
total order without ever planning a single-partition pass of the big
table:

1. **Bucket by value.**  B-1 percentile boundaries of the primary
   order column are computed with ``percentile_approx`` (a partial
   aggregate — map-side combine, 1-row result) and crossJoin-broadcast
   back; each row's bucket is the count of boundaries <= its value
   (one hash-ordered-set probe per row via ``F.filter`` + ``size`` on
   the broadcast literal array, whole-stage codegen).  Equal values
   always land in the same bucket, so bucket order is a coarsening of
   the global order; boundary QUALITY affects balance only, never
   values.
2. **Rank within bucket.**  One ``Window.partitionBy(bucket)`` — the
   single full-table exchange of the whole recipe, hash-fanned across
   B buckets instead of collapsed to one partition.
3. **Prefix offsets.**  Per-bucket row counts (a tiny <=B-row
   aggregate) are prefix-summed with a single-partition window *over
   the B-row table* and broadcast-joined back: global rank = bucket
   offset + local rank.

Exactness does not depend on the sketch: ranks are computed from the
actual ordering inside each bucket plus exact bucket counts, so the
output is value-identical to the naive global window (identity-gated
in tests/test_ranks.py, including tie and n<k corners) and
deterministic whenever the order is total (callers append a unique
tie-break key, the q5_rank_stats rule).

``global_ntile`` derives SQL-standard ``ntile(k)`` from that rank with
the first-(n mod k)-buckets-get-one-extra formula, n coming from the
same tiny counts table (no second pass, no driver action).

Scale: one hash exchange of the input per ordering + two <=B-row side
aggregates.  The naive form's single sort task is replaced by B
parallel sorts of ~n/B rows.  Below the measured crossover the plain
window wins on constants, so the default mode is a two-stage AUTO
(plan-size estimate, then an exact count only for estimate-large
inputs — see the GLOBAL_SORT_MAX_* comment).  Known bounds: the
primary column must be non-null (callers'
metrics are aggregates — counts, sums, day deltas — which never null;
a null primary would need a null-bucket leg) and numeric
(percentile_approx's domain).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# Bucket-count resolution: the per-row bucket probe is a LINEAR scan
# of the boundary array (F.filter has no binary search), so its cost
# is O(B) per row — measured at sf10 (1.5M rows): 256 buckets lose to
# the naive global window (4.8 s vs 3.0 s) while 32 buckets beat it
# (1.4 s).  The sort fan-out only needs to cover the available slots,
# so the default is the session's parallelism, clamped: floor 16 keeps
# degenerate local sessions fanned out; cap 256 bounds the per-row
# probe (a cluster wanting more fan-out should grow per-bucket sort
# capacity before boundary count — or upgrade the probe to a two-level
# coarse/fine filter, O(2*sqrt(B)), if B must truly grow).
N_BUCKETS_CAP = 256


def _resolve_buckets(df: DataFrame, n_buckets: int | None) -> int:
    if n_buckets is not None:
        return n_buckets
    par = df.sparkSession.sparkContext.defaultParallelism
    return max(16, min(N_BUCKETS_CAP, par))


# The naive/distributed AUTO switch (the auto_co_partition posture from
# operators/graph.py, applied to global windows).  Below the crossover
# the plain unpartitioned window wins on constants: the distributed
# recipe pays a fixed ~10-job overhead (boundary agg, counts, offsets,
# two broadcast joins) that one small sort undercuts.  Above it the
# single sort task is the thing that stops scaling (one task, n log n,
# spill past executor memory) while the distributed cost stays ~n/B
# per sorter.  Honest noop-sink measurements at sf10 (count() actions
# are USELESS here — Catalyst deletes row-preserving Window operators
# under count(), see SCALE.md "Round-9: bench-action correction"):
# qz26_rfm (3 chained ntiles, 1.5M rows) naive 11.0 s vs distributed
# 10.8 s — crossover ALREADY passed; qz23_gini (2 independent legs,
# 1.5M/2M rows) naive 9.0 s vs distributed 12.1 s — crossover not yet
# reached.  The two constants bracket those measurements; mis-picking
# inside the bracket costs ~1.3x constants, never correctness (both
# branches are identity-gated against each other).
#
# AUTO is two-stage so the common case stays free:
#   1. Catalyst's plan-time sizeInBytes estimate (the same statistic
#      AQE's broadcast decisions ride) — below GLOBAL_SORT_MAX_EST_BYTES
#      take the naive branch with ZERO added work (no checkpoint, no
#      count; the plan is byte-identical to the plain window).
#      Unknown-size inputs (local collections, RDD scans) estimate as
#      Long.Max and fall through — conservative toward the scale-safe
#      branch.
#   2. For estimate-large inputs, an exact count() on the lazily
#      checkpointed frame: the same job that picks the branch
#      materializes the input both branches then read, so the count
#      pass is never wasted work.
GLOBAL_SORT_MAX_EST_BYTES = 32 << 20
GLOBAL_SORT_MAX_ROWS = 1_000_000


def _prepared(
    df: DataFrame, distributed: bool | None
) -> tuple[DataFrame, bool]:
    if distributed is None:
        est = int(
            df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
        if est <= GLOBAL_SORT_MAX_EST_BYTES:
            return df, False
        df = df.localCheckpoint(eager=False)
        return df, df.count() > GLOBAL_SORT_MAX_ROWS
    if distributed:
        # dedupe the recipe's triple read of the input subtree (the
        # same sanctioned lazy-checkpoint move as knn_topk_lsh's union
        # arms); the naive branch reads its input once and needs none
        df = df.localCheckpoint(eager=False)
    return df, distributed


def _bucketed(
    df: DataFrame, primary: str, descending: bool, n_buckets: int
) -> DataFrame:
    """Input + ``__bucket`` (bucket ids ascend with the ORDER direction:
    bucket 0 sorts first)."""
    pa_type = df.schema[primary].dataType.simpleString()
    probs = F.array(
        *[F.lit(i / n_buckets) for i in range(1, n_buckets)]
    )
    bounds = df.agg(
        F.coalesce(
            F.percentile_approx(F.col(primary), probs, F.lit(10_000)),
            F.expr(f"CAST(array() AS array<{pa_type}>)"),
        ).alias("__bounds")
    )
    v = F.col(primary)
    n_le = F.size(F.filter(F.col("__bounds"), lambda b: v >= b))
    # descending order wants HIGH values in LOW bucket ids so the
    # prefix offsets accumulate in order; flip against the boundary
    # count (n-1-x keeps ids dense in [0, n_buckets))
    bucket = (
        F.lit(n_buckets - 1) - n_le if descending else n_le
    )
    return df.crossJoin(F.broadcast(bounds)).select(
        *df.columns, bucket.cast("int").alias("__bucket")
    )


def _ranked(
    df: DataFrame,
    primary: str,
    order: list[Column],
    descending: bool,
    n_buckets: int,
) -> tuple[DataFrame, DataFrame]:
    """(input + ``__rn`` global row number, broadcast-ready 1-row
    ``__n`` total-count frame — derived from the same tiny per-bucket
    counts, not a second pass over the input)."""
    # the recipe reads its input three times (boundary agg, window,
    # counts); the caller (_prepared) lazily localCheckpoints the
    # input first so those collapse to one computation of the caller's
    # subtree (the same sanctioned dedupe as the union arms in
    # knn_topk_lsh)
    b = _bucketed(df, primary, descending, n_buckets)
    w_local = Window.partitionBy("__bucket").orderBy(*order)
    local = b.withColumn("__lrn", F.row_number().over(w_local))
    counts = b.groupBy("__bucket").agg(F.count(F.lit(1)).alias("__cnt"))
    w_off = Window.orderBy("__bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = counts.select(
        "__bucket",
        F.coalesce(F.sum("__cnt").over(w_off), F.lit(0)).alias("__off"),
    )
    ranked = local.join(F.broadcast(offsets), "__bucket").select(
        *df.columns,
        (F.col("__lrn") + F.col("__off")).cast("long").alias("__rn"),
    )
    n = counts.agg(F.coalesce(F.sum("__cnt"), F.lit(0)).alias("__n"))
    return ranked, n


def global_row_number(
    df: DataFrame,
    primary: str,
    order: list[Column],
    out: str = "rn",
    descending: bool = False,
    n_buckets: int | None = None,
    distributed: bool | None = None,
) -> DataFrame:
    """Exact global ``row_number`` over a TOTAL order, distributed
    (header comment has the recipe and bounds).

    ``primary``: the leading, non-null numeric order column (bucketing
    key); ``descending``: its direction; ``order``: the FULL directed
    ordering (primary first, unique tie-break last).  Adds ``out``.
    ``distributed=None`` auto-selects by input size (GLOBAL_SORT_MAX_ROWS)."""
    df, dist = _prepared(df, distributed)
    if not dist:
        w = Window.orderBy(*order)
        return df.withColumn(out, F.row_number().over(w).cast("long"))
    ranked, _ = _ranked(df, primary, order, descending,
                        _resolve_buckets(df, n_buckets))
    return ranked.withColumnRenamed("__rn", out)


def global_running_sum(
    df: DataFrame,
    val: str,
    primary: str,
    order: list[Column],
    out: str = "run",
    descending: bool = False,
    n_buckets: int | None = None,
    distributed: bool | None = None,
) -> DataFrame:
    """Exact running sum of ``val`` over a global TOTAL order
    (``rowsBetween(unboundedPreceding, currentRow)``), distributed:
    same bucket recipe, with per-bucket SUM prefix offsets instead of
    counts.  Long sums are exact; double sums re-associate across
    buckets (error ~eps x n, orders below any rounded output grid —
    the same float posture as pagerank's conservation identity).
    ``distributed=None`` auto-selects by input size (GLOBAL_SORT_MAX_ROWS)."""
    df, dist = _prepared(df, distributed)
    if not dist:
        w = Window.orderBy(*order).rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        return df.withColumn(out, F.sum(val).over(w))
    b = _bucketed(df, primary, descending, _resolve_buckets(df, n_buckets))
    w_local = (
        Window.partitionBy("__bucket")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = b.withColumn("__lrun", F.sum(val).over(w_local))
    sums = b.groupBy("__bucket").agg(F.sum(val).alias("__s"))
    w_off = Window.orderBy("__bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = sums.select(
        "__bucket",
        F.coalesce(F.sum("__s").over(w_off), F.lit(0)).alias("__off"),
    )
    return local.join(F.broadcast(offsets), "__bucket").select(
        *df.columns, (F.col("__lrun") + F.col("__off")).alias(out)
    )


def global_ntile(
    df: DataFrame,
    k: int,
    primary: str,
    order: list[Column],
    out: str = "tile",
    descending: bool = False,
    n_buckets: int | None = None,
    distributed: bool | None = None,
) -> DataFrame:
    """SQL-standard ``ntile(k)`` over a TOTAL order, distributed.

    Tile sizes follow the standard: with n = q*k + r, the first r
    tiles hold q+1 rows (when n < k each row gets its own 1..n tile —
    the q=0 corner the identity test pins).  ``distributed=None``
    auto-selects by input size (GLOBAL_SORT_MAX_ROWS)."""
    df, dist = _prepared(df, distributed)
    if not dist:
        w = Window.orderBy(*order)
        return df.withColumn(out, F.ntile(k).over(w).cast("long"))
    ranked, n = _ranked(df, primary, order, descending,
                        _resolve_buckets(df, n_buckets))
    rn, nn = F.col("__rn"), F.col("__n")
    q = F.floor(nn / k)
    r = nn % k
    cut = r * (q + 1)  # rows 1..cut live in the first r (fat) tiles
    tile = F.when(rn <= cut, F.floor((rn - 1) / (q + 1)) + 1).otherwise(
        r + F.floor((rn - cut - 1) / q) + 1
    )
    return (
        ranked.crossJoin(F.broadcast(n))
        .select(*[c for c in ranked.columns if c != "__rn"],
                tile.cast("long").alias(out))
    )
