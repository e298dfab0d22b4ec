"""Graph analytics over the embedding similarity graph (north-star
extension; the reference has no graph layer — its only graph-shaped
notion is the source→sink topology wired in Init, reference
frizzle.go:97-123).

Two committed operators:

* ``qz12_knn_graph`` — the exact directed k-nearest-neighbor graph over
  the embedding corpus (every vector → its top-k cosine neighbors),
  built with the same block-GEMM grid as the exact near-dup scan but
  emitting per-row LOCAL top-k per grid cell, then one window for the
  global top-k.  Fully oracle-backed (DuckDB brute-force rank).
* ``qz25_pagerank`` — PageRank over that kNN graph (Page et al. 1999):
  density/centrality scoring of corpus items, the classic
  representativeness signal for coreset selection / curriculum
  ordering in training-data curation.  Iterative join algebra
  (Pregel-style), rows-only with a numpy power-iteration differential
  gate in pytest.

Scale notes: the kNN build shuffles packed block matrices (never row
pairs) and each grid cell emits at most k candidates per row, so the
global-top-k window receives O(n·k·B) skinny rows, not n².  PageRank
state is one double per node; each round is two hash joins on the edge
list (shuffle by node, then by dst) with ZERO per-round driver actions
(fixed supersteps; dangling mass folds in as a 1-row broadcast) and
lineage truncated by localCheckpoint every few rounds.
Past ``KNN_EXACT_MAX_N`` the edge build auto-switches (round 9) to
LSH-blocked candidates + exact re-rank — the exact grid's shuffle is
measured-quadratic and dies ENOSPC at n=500k in this sandbox while the
blocked build completes (NEARDUP_CROSSOVER.json /
KNN_EDGE_CROSSOVER.json); the iteration algebra above it is unchanged.
"""

from __future__ import annotations

import os
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from frizzle_spark.functions import vectors as V
from frizzle_spark.operators.similarity import (
    DIM,
    NEARDUP_CHUNK_ROWS,
    SCORE_BROADCAST_MAX_N,
    _corpus,
    _corpus_size,
    _lsh_codes,
    _lsh_planes,
    _lsh_probe_codes,
    _n_blocks,
    _pack_blocks,
    _unit,
    lsh_params,
)
from frizzle_spark.plans.registry import query

KNN_K = 3
PR_DAMPING = 0.85
PR_ITERS = 12  # fixed-point residual ≤ 2·d^t ≈ 0.28 L1 upper bound; the
# RANKING stabilizes much earlier (GraphX's staticPageRank ships 10 as
# its documented default operating point)
# truncate lineage / materialize every N rounds.  Re-swept in round 12
# on the post-kernel-unit code (the r8 sweep that picked 4 predates the
# cheaper per-round plans): interleaved 5×, sf0.1 medians every-2 3.18 s /
# every-3 3.46 s / every-4 4.84 s, and sf0.01 agrees (3.12/3.42/3.93) —
# analysis+codegen of the unrolled multi-round plan now grows faster
# than the per-checkpoint materialization costs, so shallow wins (at
# ~12 unmaterialized rounds Catalyst's tree-string printer
# stack-overflows, so deep no-checkpoint plans are off the table
# entirely).  Results are cadence-invariant by construction (identical
# float algebra; localCheckpoint only materializes rows).  On a real
# cluster each checkpoint is a full node-table materialization, so the
# env knob lets deployments trade back toward deeper lineage.
PR_CHECKPOINT_EVERY = int(os.environ.get("FRIZZLE_PR_CHECKPOINT_EVERY", "2"))

# Driver-local power-iteration tier (r12): below this edge count the
# whole fixed-iteration recurrence runs as ONE bounded collect + numpy
# vectors instead of ~n_iter/cadence multi-join Spark jobs — the same
# AUTO fast-tier pattern as dedup's union-find cap.  1M edges collect to
# ~16 MB of longs (well under maxResultSize) and the rank/deg vectors
# are 8 B/node; the distributed supersteps remain the over-cap path, so
# the 100 TB posture is unchanged.  Identity between tiers is
# pytest-gated (same conservation-law algebra, <1e-12, and rounded-
# output equality on the registry graph).
PR_LOCAL_EDGE_CAP = int(os.environ.get("FRIZZLE_PR_LOCAL_EDGE_CAP", "1000000"))

_KNN_ORACLE = f"""
    WITH corpus AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
               sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                     CAST(embedding AS DOUBLE[]))) AS nrm
        FROM embeddings
        WHERE embedding IS NOT NULL
    ),
    scored AS (
        SELECT a.vec_id AS src, b.vec_id AS dst,
               list_dot_product(a.v, b.v) / (a.nrm * b.nrm) AS cos_sim
        FROM corpus a JOIN corpus b ON a.vec_id <> b.vec_id
    ),
    ranked AS (
        SELECT *, row_number() OVER (PARTITION BY src
                                     ORDER BY cos_sim DESC, dst) AS rank
        FROM scored
    )
    SELECT src, dst, round(cos_sim, 6) AS cos_sim, CAST(rank AS BIGINT) AS rank
    FROM ranked WHERE rank <= {KNN_K}
    """


# Size-based exact↔approx switch for the kNN edge build (round 9,
# VERDICT r8 #1).  The exact GEMM grid's shuffle is cleanly quadratic
# (NEARDUP_CROSSOVER.json: 227 MB @20k → 1.3 GB @50k → 5.2 GB @100k →
# 20.5 GB @200k, and the attempted 500k run died ENOSPC mid-grid).
# KNN_EDGE_CROSSOVER.json measures the crossover for THIS operator's
# clustered-corpus edge build: exact wins at 20k (12 s vs 45 s) and
# 50k (62 vs 72), the LSH-blocked tier wins from 100k up (63 vs 77 at
# 100k, 111 vs 287 at 200k) and completes 500k in 314 s where the grid
# cannot run, at directed-edge recall 0.998–0.999 throughout.  The
# threshold sits at the measured crossover: at or below 100k the exact
# grid stays the default (oracle preference — at 100k it is within
# 1.2× of LSH and its ~5 GB shuffle safely runnable); past it the auto
# default switches to LSH-blocked candidates + exact re-rank, the
# identical top-k reducer, so the switch is plan-shape only.  Exact remains the oracle tier (every registry/driver corpus
# sits far below the threshold) and callers can force either mode with
# ``exact=``.
KNN_EXACT_MAX_N = 100_000


# Above this, the (vec_id → unit vector) side tables stop being
# explicitly broadcast for the re-rank joins (≈540 B/row ⇒ ~1 GB at
# 2M) and the scoring falls back to shuffled joins over the skinny
# candidate pairs.  Shared with the embedding near-dup re-rank
# (similarity.SCORE_BROADCAST_MAX_N) — same hazard, same bound.
KNN_LSH_BROADCAST_MAX_N = SCORE_BROADCAST_MAX_N


def _knn_lsh_undirected(spark: SparkSession, unit: DataFrame, n: int) -> DataFrame:
    """UNDIRECTED candidate pairs (id1 < id2) of the LSH-blocked kNN
    build: every vector probes its ``bits+1`` query-directed bucket
    variants per table (the same margin-ranked flip machinery as the
    near-dup blocker, operators/similarity._lsh_probe_codes) against
    the map-side-coded corpus; a collision in EITHER direction
    canonicalizes to one undirected pair, since query-directed variant
    sets are asymmetric (the canonicalize-then-expand move measured at
    +0.08 recall on the near-dup blocker).  The only shuffles carry
    (table_id, code) / id PAIRS — never vectors, never n² rows:
    candidate volume is Σ per-bucket occupancy², bounded by the
    ⌈log2 n⌉+1 bit growth."""
    bits, tables, _ = lsh_params(n)
    bc_planes = spark.sparkContext.broadcast(_lsh_planes(bits, tables, DIM))
    coded = _lsh_codes(unit, bc_planes)
    probe = _lsh_probe_codes(unit, bc_planes, budget=bits + 1)
    return (
        probe.alias("a")
        .join(coded.alias("b"), ["table_id", "code"])
        .where(F.col("a.vec_id") != F.col("b.vec_id"))
        .select(
            F.least("a.vec_id", "b.vec_id").alias("id1"),
            F.greatest("a.vec_id", "b.vec_id").alias("id2"),
        )
        .distinct()
    )


def knn_lsh_candidates(spark: SparkSession, unit: DataFrame, n: int) -> DataFrame:
    """Directed candidate pairs (src, dst): the undirected blocker's
    output expanded both ways (diagnostic surface; the production path
    ``knn_topk_lsh`` scores the undirected set first and expands the
    SKINNY scored rows, so the candidate machinery runs once)."""
    und = _knn_lsh_undirected(spark, unit, n)
    return und.select(F.col("id1").alias("src"), F.col("id2").alias("dst")).unionAll(
        und.select(F.col("id2").alias("src"), F.col("id1").alias("dst"))
    )


def knn_topk_lsh(
    spark: SparkSession,
    unit: DataFrame,
    n: int,
    k: int,
    _probe: dict | None = None,
) -> DataFrame:
    """Approximate kNN edges: LSH-blocked candidate generation + exact
    cosine re-rank + the IDENTICAL per-source top-k reducer as the
    exact grid (same window, same tie order, same output schema) — so
    switching tiers changes candidate coverage only, never semantics.

    Plan shape (round-9 rework — the first cut of this tier died
    ENOSPC at n=100k, the exact failure mode the tier exists to avoid):

    * vectors NEVER ride a shuffle.  Each undirected pair is scored
      once through two joins against the (vec_id, u) side table —
      explicitly broadcast below ``KNN_LSH_BROADCAST_MAX_N`` (≤ ~1 GB;
      zero exchanges, candidates stream map-side through both lookups)
      — and the projection to (id1, id2, cos_sim) lands INSIDE the
      same stage, so only 24-byte rows ever reach an exchange.  The
      first cut instead joined vectors onto DIRECTED pairs with SMJ:
      two sorts + an exchange all carrying ~540 B/row — tens of GB of
      sort spill at n=100k.
    * the scored undirected set is localCheckpoint'ed (lazy) before the
      two-way direction expansion: both union arms then read ONE RDD
      instead of re-running the probe kernel + bucket join + distinct
      per arm (DataFrame union duplicates the logical subtree — the
      other half of the first cut's blowup).
    * the probe/code kernels are CPU-bound numpy; a small local corpus
      arrives in a handful of row-group splits, so the unit frame is
      re-partitioned to the session's parallelism first (one ~O(n·d)
      exchange, the only one vectors ever cross, shared by all four
      consumers via the checkpoint).
    * dot(u, v) is bit-symmetric (pairwise multiply commutes, the sum
      runs in index order for both argument orders), so scoring each
      pair once and emitting both directions is value-identical to
      scoring twice.

    Beyond ~2M vectors the side tables outgrow broadcast and the
    scoring joins fall back to shuffled hash joins whose big side is
    the SKINNY pair stream; beyond that regime the right tool is the
    persisted IVF index (ann_index.py), not an in-query edge build."""
    unit = unit.repartition(spark.sparkContext.defaultParallelism).localCheckpoint(
        eager=False
    )
    und = _knn_lsh_undirected(spark, unit, n)
    u1 = unit.select(F.col("vec_id").alias("id1"), F.col("u").alias("u1v"))
    u2 = unit.select(F.col("vec_id").alias("id2"), F.col("u").alias("u2v"))
    if n <= KNN_LSH_BROADCAST_MAX_N:
        u1, u2 = F.broadcast(u1), F.broadcast(u2)
    scored_pre = (
        und.join(u1, "id1")
        .join(u2, "id2")
        .select("id1", "id2", V.dot(F.col("u1v"), F.col("u2v")).alias("cos_sim"))
    )
    if _probe is not None:
        # the checkpoint below hides the candidate/scoring subtree from
        # the final plan — expose it here so the plan gate can assert
        # the no-vector-exchange / broadcast-lookup shape directly
        _probe["scored_plan"] = (
            scored_pre._jdf.queryExecution().executedPlan().toString()
        )
    scored_und = scored_pre.localCheckpoint(eager=False)
    directed = scored_und.select(
        F.col("id1").alias("src"), F.col("id2").alias("dst"), "cos_sim"
    ).unionAll(
        scored_und.select(
            F.col("id2").alias("src"), F.col("id1").alias("dst"), "cos_sim"
        )
    )
    w = Window.partitionBy("src").orderBy(F.desc("cos_sim"), F.asc("dst"))
    return (
        directed.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("src", "dst", F.round("cos_sim", 6).alias("cos_sim"), "rank")
    )


def knn_edges(
    spark: SparkSession,
    sf_dir: str,
    k: int = KNN_K,
    exact: bool | None = None,
    _probe: dict | None = None,
) -> DataFrame:
    """Directed kNN edge list (src, dst, cos_sim, rank).

    ``exact=None`` (default) auto-selects by corpus size — the same
    posture as pagerank's ``auto_co_partition``: the EXACT block-GEMM
    grid below ``KNN_EXACT_MAX_N`` (the oracle tier; every registry
    corpus lands here), the LSH-blocked approximate build above it,
    where the measured crossover says the exact grid's quadratic
    shuffle stops being runnable at all (died ENOSPC at n=500k in this
    sandbox — NEARDUP_CROSSOVER.json / KNN_EDGE_CROSSOVER.json).

    Exact tier: block-GEMM grid (upper-triangle of block pairs — the
    only shuffle carries packed matrices), each cell emitting per-row
    LOCAL top-k in BOTH directions (A-rows vs B and B-rows vs A; the
    diagonal cell reuses one GEMM for both).  The global top-k per
    source then needs only a window over O(n·k·B) candidate rows.
    Local-then-global is lossless: every global top-k neighbor of a
    row survives its cell's local selection, because local selection
    is tie-inclusive at the kth similarity — exact ties (duplicate
    embeddings are routine in a dedup corpus) are ALL forwarded and
    broken deterministically by the global (cos_sim DESC, dst ASC)
    window, matching the oracle's order.

    Approx tier: ``knn_topk_lsh`` — same reducer, LSH-blocked
    candidates (recall-gated ≥0.95 directed-edge recall vs exact on a
    clustered corpus, tests/test_graph.py)."""
    corpus = _corpus(spark, sf_dir)
    n = _corpus_size(spark, sf_dir)
    unit = _unit(corpus, n)
    if exact is None:
        exact = n <= KNN_EXACT_MAX_N
    if _probe is not None:
        _probe.update({"exact": exact, "n": n})
    if exact:
        return knn_topk_of(spark, unit, n, k)
    return knn_topk_lsh(spark, unit, n, k, _probe=_probe)


def knn_topk_of(
    spark: SparkSession, unit: DataFrame, n: int, k: int
) -> DataFrame:
    """The GEMM-grid top-k over an arbitrary prepared (vec_id, u)
    unit-vector frame — factored out of ``knn_edges`` so eval harnesses
    (the matryoshka dimension-ablation in operators/similarity.py) run
    the IDENTICAL tie-inclusive local-then-global selection on derived
    corpora (truncated/renormalized vectors) without duplicating the
    grid.  Same semantics, same plan; knn_edges' oracle pins it."""
    packed = _pack_blocks(unit, n, NEARDUP_CHUNK_ROWS)
    a = packed.select(
        F.col("blk").alias("b1"), F.col("ids").alias("ids1"), F.col("mat").alias("m1")
    )
    b = packed.select(
        F.col("blk").alias("b2"), F.col("ids").alias("ids2"), F.col("mat").alias("m2")
    )
    n_blocks = _n_blocks(n, NEARDUP_CHUNK_ROWS)
    n_tasks = min(
        n_blocks * (n_blocks + 1) // 2, spark.sparkContext.defaultParallelism
    )
    grid = a.join(b, F.col("b1") <= F.col("b2")).repartition(n_tasks)

    def local_topk(batches):  # pragma: no cover - executed on executors
        import numpy as np
        import pandas as pd

        def emit(ids_q, ids_c, sims, out):
            kk = min(k, sims.shape[1])
            if kk == 0:
                return
            # Tie-INCLUSIVE local selection: keep every candidate whose
            # similarity ties the per-row kth-largest value, so a tied
            # candidate with a smaller dst can never be dropped locally —
            # the global (cos_sim DESC, dst ASC) window owns tie-breaking.
            thresh = -np.partition(-sims, kk - 1, axis=1)[:, kk - 1 : kk]
            keep = (sims >= thresh) & np.isfinite(sims)
            rows, cols = np.nonzero(keep)
            out.append(
                pd.DataFrame(
                    {
                        "src": ids_q[rows],
                        "dst": ids_c[cols],
                        "cos_sim": sims[rows, cols],
                    }
                )
            )

        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                ids1 = np.asarray(row.ids1, dtype=np.int64)
                ids2 = np.asarray(row.ids2, dtype=np.int64)
                m1 = np.asarray(row.m1, dtype=np.float64).reshape(len(ids1), -1)
                m2 = np.asarray(row.m2, dtype=np.float64).reshape(len(ids2), -1)
                sims = m1 @ m2.T
                if row.b1 == row.b2:
                    np.fill_diagonal(sims, -np.inf)  # no self-loops
                    emit(ids1, ids2, sims, out)
                else:
                    emit(ids1, ids2, sims, out)
                    emit(ids2, ids1, sims.T, out)
            if out:
                yield pd.concat(out, ignore_index=True)

    cand = grid.mapInPandas(local_topk, schema="src long, dst long, cos_sim double")
    w = Window.partitionBy("src").orderBy(F.desc("cos_sim"), F.asc("dst"))
    return (
        cand.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("src", "dst", F.round("cos_sim", 6).alias("cos_sim"), "rank")
    )


KNN_INDEX_SCHEMA = "src long, dst long, cos_sim double, rank long"

_KNN_CACHE: dict[str, str] = {}


def materialize_knn_index(edges: DataFrame, base_path: str) -> None:
    """Persist a kNN edge list to ``<base_path>/edges`` — the graph
    sibling of ``dedup.materialize_cluster_index``: the GEMM grid runs
    once per corpus snapshot and every graph consumer (the edge-list
    query itself, PageRank, future traversals) reads the skinny
    (src, dst, cos_sim, rank) parquet instead of re-scoring n·k
    block pairs.  At 100 TB this table lives on shared storage,
    bucketed by src, and IS the precondition for iterating at all."""
    edges.write.mode("overwrite").parquet(f"{base_path}/edges")


def load_knn_index(spark: SparkSession, base_path: str) -> DataFrame:
    """Read a materialized kNN edge list.  Explicit schema: an empty
    corpus legitimately writes a parquet dir with only _SUCCESS, and
    inference would fail on exactly that index."""
    return spark.read.schema(KNN_INDEX_SCHEMA).parquet(f"{base_path}/edges")


def _cached_knn_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scratch kNN index built ONCE per (process, sf_dir) and removed at
    exit — the same sanctioned pattern as dedup's per-process cluster
    index: repeated registry invocations (bench min-of-n, the PageRank
    consumer, pytest gates) reuse the materialized edge list instead of
    re-running the edge build, which IS the 100 TB operating mode.
    The build is ``knn_edges``'s AUTO tier: the exact (oracle) grid at
    registry scale, the LSH-blocked build past ``KNN_EXACT_MAX_N``.
    The tempdir is driver-local and therefore LOCAL-MODE ONLY; on a
    cluster call ``materialize_knn_index``/``load_knn_index`` with a
    base on shared storage."""
    import atexit
    import shutil
    import tempfile

    base = _KNN_CACHE.get(sf_dir)
    if base is None:
        base = tempfile.mkdtemp(prefix="knn_index_")
        materialize_knn_index(knn_edges(spark, sf_dir), base)
        _KNN_CACHE[sf_dir] = base
        atexit.register(shutil.rmtree, base, ignore_errors=True)
    return load_knn_index(spark, base)


@query("qz12_knn_graph", oracle=_KNN_ORACLE)
def qz12_knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact directed top-{KNN_K} cosine neighbor graph for EVERY corpus
    vector (q12_cosine_topk generalized from 10 probes to all n, without
    the broadcast-probe shortcut).  Fully oracle-backed against the
    DuckDB brute-force ranking — the hash check rides the per-process
    scratch index, so the persisted path is what the oracle pins."""
    return _cached_knn_edges(spark, sf_dir)


# Per-row broadcast-size estimate for the superstep's skinny node-side
# tables (contrib is (dst, c): 8 B key + 8 B double + UnsafeRow/estimate
# overhead; ranks adds deg + w).  48 B/row tracks Spark's own plan-stats
# sizing for a 2-4 numeric-column row and errs toward switching EARLY —
# the co-partitioned path is identity-tested, so an early switch costs
# only the bench-scale AQE-broadcast win, never correctness.
PR_NODE_ROW_BYTES = 48


def _conf_bytes(spark: SparkSession, key: str, default: int) -> int:
    """Parse a Spark byte-size conf value ("10485760", "10485760b",
    "10MB", "-1") into bytes.  Mirrors Spark's JavaUtils.byteStringAs
    for the suffixes the threshold conf actually uses."""
    raw = str(spark.conf.get(key, str(default))).strip().lower()
    mult = 1
    for suffix, m in (
        ("kb", 1 << 10), ("mb", 1 << 20), ("gb", 1 << 30), ("tb", 1 << 40),
        ("k", 1 << 10), ("m", 1 << 20), ("g", 1 << 30), ("t", 1 << 40),
        ("b", 1),
    ):
        if raw.endswith(suffix):
            mult, raw = m, raw[: -len(suffix)].strip()
            break
    try:
        return int(float(raw) * mult)
    except ValueError:
        return default


def auto_co_partition(spark: SparkSession, n_nodes: int) -> bool:
    """The size-based superstep-mode switch (round 8, VERDICT r7 #1).

    AQE saves the per-round exchanges only while it can broadcast-convert
    the skinny node-side tables (ranks/contrib, one row per node); past
    ``spark.sql.autoBroadcastJoinThreshold`` it falls back to shuffled
    SMJ and the default path pays TWO exchanges per superstep
    (SCALE.md's measured condition).  So: co-partition exactly when the
    estimated node-table size exceeds the threshold — i.e. exactly when
    AQE stops saving the shuffle.  A disabled threshold (≤ 0) means AQE
    can never broadcast, so the one-exchange mode is always right."""
    thresh = _conf_bytes(spark, "spark.sql.autoBroadcastJoinThreshold", 10 << 20)
    return thresh <= 0 or n_nodes * PR_NODE_ROW_BYTES > thresh


@contextmanager
def _static_plan(spark: SparkSession):
    """AQE-off scope for ``localCheckpoint`` calls.  Under AQE the
    executed plan is an AdaptiveSparkPlan whose outputPartitioning is
    unknown at checkpoint time, so ``Dataset.checkpoint`` captures
    UnknownPartitioning and silently discards the co-partitioning every
    superstep depends on (probe-verified on this Spark).  Checkpointing
    with static planning makes the captured hashpartitioning real; the
    flag is restored immediately after (sequential-session contract,
    same posture as qz16_interval_join's documented conf scope)."""
    prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        yield
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)


def _pagerank_local(
    spark: SparkSession,
    e: DataFrame,
    damping: float,
    n_iter: int,
    teleport: DataFrame | None,
) -> DataFrame:
    """Under-cap tier: the IDENTICAL fixed-iteration recurrence as the
    distributed supersteps — same conservation-law dangling fold
    (dangling = 1 − Σc), same teleport restriction/renormalization,
    same (1−d)·w + d·(c + dangling·w) update — run on collected numpy
    vectors.  One bounded collect (≤ PR_LOCAL_EDGE_CAP edges of two
    keys), zero per-round jobs.  Float sums associate in a different
    order than Spark's partial aggregates, so agreement is ~1e-15/round
    (the same bound the numpy differential gate already pins for the
    distributed path); both registry consumers round to 9dp, far above
    that noise floor, and tier identity of the ROUNDED output is
    pytest-gated on the real registry graph."""
    import numpy as np
    from pyspark.sql.types import DoubleType, StructField, StructType

    # Arrow collect (r13, ADVICE r12): a cap-full edge list as PySpark
    # Row objects costs ~100+ B/edge of Python objects (~100× the
    # "16 MB of longs" the cap comment promises); toArrow() lands the
    # two columns as numpy-convertible buffers at the documented bound.
    tb = e.toArrow()
    node_t = e.schema[0].dataType
    schema = StructType(
        [StructField("node", node_t, True), StructField("rank", DoubleType(), True)]
    )
    if tb.num_rows == 0:
        return spark.createDataFrame([], schema)
    src = np.asarray(tb.column(0).to_numpy())  # ChunkedArray: copy allowed
    dst = np.asarray(tb.column(1).to_numpy())
    nodes = np.unique(np.concatenate([src, dst]))
    n = nodes.size
    si = np.searchsorted(nodes, src)
    di = np.searchsorted(nodes, dst)
    deg = np.bincount(si, minlength=n).astype(np.float64)
    w = np.full(n, 1.0 / n)
    if teleport is not None:
        seed_rows = teleport.select("node").distinct().collect()
        seed_vals = np.asarray([r[0] for r in seed_rows]) if seed_rows else None
        pos = np.array([], dtype=np.int64)
        if seed_vals is not None and seed_vals.size:
            cand = np.searchsorted(nodes, seed_vals)
            in_graph = (cand < n) & (nodes[np.minimum(cand, n - 1)] == seed_vals)
            pos = np.unique(cand[in_graph])
        if pos.size == 0:
            # same degenerate contract as the distributed path: PPR with
            # no in-graph seed yields an empty result, not a raise
            return spark.createDataFrame([], schema)
        w = np.zeros(n)
        w[pos] = 1.0 / pos.size
    r = w.copy()
    for _ in range(n_iter):
        c = np.bincount(di, weights=r[si] / deg[si], minlength=n)
        dangling = 1.0 - c.sum()
        r = (1.0 - damping) * w + damping * (c + dangling * w)
    return spark.createDataFrame(
        list(zip(nodes.tolist(), (float(x) for x in r))), schema
    )


def pagerank(
    edges: DataFrame,
    damping: float = PR_DAMPING,
    n_iter: int = PR_ITERS,
    checkpoint_every: int = PR_CHECKPOINT_EVERY,
    co_partition: bool | None = None,
    teleport: DataFrame | None = None,
    _probe: dict | None = None,
) -> DataFrame:
    """Static (fixed-iteration) PageRank over an (src, dst) edge
    DataFrame — GraphX ``staticPageRank`` semantics, as join algebra.

    ``teleport``: optional (node) seed set for PERSONALIZED PageRank —
    teleport AND dangling mass land uniformly on the seeds (restricted
    to nodes actually present in the graph, renormalized) instead of
    uniformly everywhere, and the iteration starts from the seed
    distribution.  The per-node teleport weight joins into the
    checkpointed node table ONCE before the loop, so the superstep
    algebra is unchanged — same two joins, same single reference to
    the prior ranks, ZERO extra per-round cost.  Σrank = 1 every round
    in both modes (the weight column sums to 1 by construction).

    Per round: contributions = edges ⋈ ranks (shuffle by node) →
    groupBy dst (shuffle by dst) → left-outer back onto the node set.
    State is (node, rank) — two columns per node.  Fixed iteration
    count, ZERO per-round driver actions: dangling mass is folded in
    via one pre-computed dangling-node flag column (their rank re-
    spreads uniformly), and lineage is truncated by ``localCheckpoint``
    every ``checkpoint_every`` rounds — between checkpoints the rounds
    fuse into one multi-join job, trading lineage depth for job-launch
    overhead (measured 3× fewer jobs at equal shuffle volume).

    Fixed iterations rather than a tolerance loop is deliberate: the
    result is DETERMINISTIC (hash-stable run to run), the residual has
    a closed-form bound (‖r_t − r*‖₁ ≤ 2·d^t), and at 100 TB a
    convergence probe per round would serialize an extra driver action
    into every superstep.  Σrank = 1 every round (teleport + dangling
    redistribution keep it stochastic).
    """
    # Materialize the edge list ONCE — it feeds every superstep, and an
    # unmaterialized edge plan (here: the kNN GEMM grid) would otherwise
    # recompute per round.  At 100 TB the equivalent is writing the edge
    # list to storage (bucketed by src) before iterating.
    #
    # ``co_partition=True`` pre-partitions e by src and nd by node
    # (captured through localCheckpoint via the AQE-off _static_plan
    # scope — under AQE, checkpoint records UnknownPartitioning and the
    # layout is silently lost) so the per-round joins find both sides
    # already co-partitioned: the edges⋈ranks join and the node-set
    # join add NO exchange, leaving exactly ONE shuffle per superstep
    # (the groupBy(dst) message aggregation — the algorithmic minimum).
    # That is the 100 TB operating mode: ranks has one row per node —
    # far past broadcast range — and every avoided exchange is a full
    # network pass over the node set; on a real cluster the equivalent
    # is the edge list bucketed by src in storage.  At local/bench
    # scale, AQE's runtime broadcast conversion of the skinny ranks
    # table beats exchange-free static SMJ (measured sf0.01 warm:
    # 3.3 s adaptive vs 8.0 s static).  The default (None) is the
    # size-based AUTO switch — ``auto_co_partition`` flips to the
    # one-exchange mode exactly when the node table outgrows
    # ``autoBroadcastJoinThreshold``, i.e. exactly when AQE stops
    # saving the shuffle (round 8; SCALE.md names the condition).
    # Both paths are identity-tested against each other (<1e-12).
    spark = edges.sparkSession

    # Materialize the raw edge list first (one pass over the possibly
    # expensive edge plan — the kNN GEMM grid), count the node set,
    # THEN decide the superstep mode; under co_partition the cheap
    # already-materialized edges take one extra shuffle into the
    # src-hashed layout, amortized over every superstep.
    e = edges.select("src", "dst").localCheckpoint()
    # AUTO fast tier (r12): with no explicit superstep-mode request and
    # no plan probe, an under-cap edge list runs the identical
    # recurrence driver-local in one bounded collect (see
    # _pagerank_local) — ~n_iter/cadence Spark jobs become one.  An
    # explicit co_partition (the identity gates, the e2e scripts) or a
    # _probe (the superstep plan gates) always takes the distributed
    # path, so the over-cap machinery stays exercised.
    # Bounded gate probe (r13, ADVICE r12): limit(cap+1).count() instead
    # of a full count, so the gate's cost on the OVER-cap (distributed)
    # path is bounded by the cap rather than the edge-list size.
    if (
        co_partition is None
        and _probe is None
        and e.limit(PR_LOCAL_EDGE_CAP + 1).count() <= PR_LOCAL_EDGE_CAP
    ):
        return _pagerank_local(spark, e, damping, n_iter, teleport)
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    n = nodes.count()
    if co_partition is None:
        co_partition = auto_co_partition(spark, n)
    if _probe is not None:
        _probe["co_partition"] = co_partition
        _probe["n_nodes"] = n

    def _ckpt(df, key=None):
        if not co_partition:
            return df.localCheckpoint()
        with _static_plan(spark):
            return (df.repartition(key) if key else df).localCheckpoint()

    if co_partition:
        e = _ckpt(e, "src")
    if n == 0:
        return nodes.select("node", F.lit(0.0).alias("rank"))
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # (node, deg) with deg NULL ⇔ dangling — one table drives both the
    # contribution split and the dangling-mass fold, no per-round action
    if teleport is not None:
        # seeds ∩ nodes, uniform weight; seeds outside the graph would
        # silently leak teleport mass (Σrank < 1), so they are dropped
        # and the weight renormalized over what remains
        seeds = teleport.select("node").distinct().join(nodes, "node")
        n_seeds = seeds.count()
        if n_seeds == 0:
            # PPR is undefined with no in-graph seed; empty result (not
            # a raise) keeps registry queries total on degenerate
            # corpora (null-label / one-row totality sweeps)
            return nodes.select("node", F.lit(0.0).alias("rank")).limit(0)
        w_col = F.coalesce(F.col("w"), F.lit(0.0))
        nd_src = (
            nodes.join(outdeg, nodes["node"] == outdeg["src"], "left_outer")
            .join(seeds.select("node", F.lit(1.0 / n_seeds).alias("w")), "node", "left_outer")
            .select("node", "deg", w_col.alias("w"))
        )
    else:
        nd_src = (
            nodes.join(outdeg, nodes["node"] == outdeg["src"], "left_outer")
            .select("node", "deg", F.lit(1.0 / n).alias("w"))
        )
    nd = _ckpt(nd_src, "node")
    ranks = nd.select("node", "deg", F.col("w").alias("rank"))
    # uniquely-named edge view for the per-round join: `e` re-enters the
    # plan every superstep while the prior round's lineage (between
    # checkpoints) already contains it — fresh names sidestep Spark's
    # ambiguous-self-join attribute resolution; select() is narrow, so
    # the src-hash partitioning survives
    em = e.select(F.col("src").alias("msrc"), F.col("dst").alias("mdst"))
    for it in range(n_iter):
        # ONE reference to the prior ranks per superstep (the r6 shape
        # referenced `ranks` twice — dangling filter-agg + contribution
        # join — doubling unmaterialized lineage every round): only the
        # linked nodes join the edge list, and the dangling mass falls
        # out of the CONSERVATION LAW instead of a second pass —
        # Σranks = 1 every round (teleport + redistribution keep the
        # vector stochastic), and Σcontrib.c = Σ_{non-dangling} rank by
        # construction, so dangling = 1 − Σc.  The dmass agg reads the
        # tiny post-shuffle contrib table; its duplicated reference
        # sits ABOVE contrib's exchange, which Spark reuses.  Float
        # error of the identity is ~1e-15/round, 3 orders below the
        # 9dp output grid and the 1e-12 numpy-differential gate.
        contrib = (
            ranks.where(F.col("deg").isNotNull())
            .join(em, F.col("node") == F.col("msrc"))
            .select(
                F.col("mdst").alias("dst"),
                (F.col("rank") / F.col("deg")).alias("c"),
            )
            .groupBy("dst")
            .agg(F.sum("c").alias("c"))
        )
        # guaranteed-1-row broadcast (coalesce covers the all-dangling
        # corner: empty contrib ⇒ dangling = 1)
        dmass = contrib.agg(
            (F.lit(1.0) - F.coalesce(F.sum("c"), F.lit(0.0))).alias("dangling")
        )
        ranks = (
            nd.join(contrib, nd["node"] == contrib["dst"], "left_outer")
            .crossJoin(F.broadcast(dmass))
            .select(
                "node",
                "deg",
                (
                    F.lit(1.0 - damping) * F.col("w")
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("c"), F.lit(0.0))
                        + F.col("dangling") * F.col("w")
                    )
                ).alias("rank"),
            )
        )
        if _probe is not None and it == 0:
            # plan-gate hook: the first superstep's physical plan, read
            # BEFORE checkpointing erases the lineage — tests count its
            # shuffle exchanges (one-exchange gate for co_partition)
            _probe["superstep_plan"] = (
                ranks._jdf.queryExecution().executedPlan().toString()
            )
        if (it + 1) % checkpoint_every == 0 or it == n_iter - 1:
            # under co_partition, static-plan capture keeps hash(node)
            # alive across the truncation, so the next round's ranks
            # side stays exchange-free too
            ranks = _ckpt(ranks)
    return ranks.select("node", "rank")


@query("qz25_pagerank", oracle=None)
def qz25_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank centrality over the exact kNN similarity graph — which
    corpus items sit in dense, well-connected neighborhoods (high rank)
    vs isolated periphery (rank → teleport floor).  Rows-only
    (iterative algorithm, not single-statement SQL); pytest gates:
    numpy power-iteration differential running the IDENTICAL fixed
    supersteps on identical edges, Σrank = 1, and a hub-vs-chain
    synthetic graph.  Ranks are rounded to 9dp — float-sum noise lives
    at ~1e-15, far below the rounding grid, so output is hash-stable
    across runs.  Edges come from the per-process scratch kNN index
    (built once per corpus snapshot, shared with qz12_knn_graph) — at
    100 TB the iteration always starts from a persisted edge list.
    Superstep mode is the AUTO size switch (round 8): one-exchange
    co-partitioned supersteps kick in exactly when the node table
    outgrows the broadcast threshold (see ``auto_co_partition``)."""
    edges = _cached_knn_edges(spark, sf_dir)
    return pagerank(edges).select("node", F.round("rank", 9).alias("rank"))


PPR_SEED_LABEL = 0  # the "trusted" cluster whose neighborhood PPR scores


@query("qz25_ppr", oracle=None)
def qz25_ppr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERSONALIZED PageRank over the kNN graph: teleport (and dangling
    mass) land on a trusted seed set — here the label-{PPR_SEED_LABEL}
    embedding cluster — so rank measures proximity/reachability FROM
    the seeds, not global centrality.  This is the standard
    curation-by-example scorer: given a small vetted subset, PPR ranks
    the whole corpus by similarity-graph diffusion from it (seeded
    coreset selection, label propagation's continuous cousin).

    Same superstep algebra and cost as qz25_pagerank — the seed weight
    column joins into the checkpointed node table once, before the
    loop.  Rows-only (iterative); pytest gates: numpy power-iteration
    differential with the same teleport vector (<1e-12), Σrank = 1,
    and seeds-outrank-periphery on a synthetic two-cluster graph.
    """
    from frizzle_spark.sources.tables import load_table

    edges = _cached_knn_edges(spark, sf_dir)
    seeds = (
        load_table(spark, sf_dir, "embeddings")
        .where(F.col("label") == PPR_SEED_LABEL)
        .select(F.col("vec_id").alias("node"))
    )
    return pagerank(edges, teleport=seeds).select(
        "node", F.round("rank", 9).alias("rank")
    )


# ---------------------------------------------------------------------------
# qz25_triangles — per-node triangle counts on the kNN similarity graph
# (round 7).  Triangles are the community-structure primitive (local
# clustering: a node whose neighbors also neighbor each other sits
# inside a dense near-duplicate clique, not a hub): symmetrize the
# directed top-k graph into canonical a<b edges, then count via the
# ordered two-path + closing-edge join — each triangle {a<b<c} is
# found EXACTLY once as (a,b)⋈(b,c) closed by (a,c), the standard
# all-orderings-deduped formulation.  Per-node counts come from
# unpivoting each triangle's three corners.
#
# 100 TB shape: the joins run over the EDGE LIST (n·k rows — never the
# corpus, never all-pairs; the GEMM grid that builds the edges is
# amortized in the persisted kNN index).  With degree bounded by the
# kNN k (≤ k out-neighbors, in-degree concentration capped by the
# similarity cutoff in practice), the two-path intermediate is O(n·k²)
# — and a skew guard for pathological in-degree hubs would salt the
# b-key, same recipe as q19_salted_join.  This node-iterator-as-joins
# shape is the MapReduce-classic triangle algorithm (Suri & Vassilvitskii,
# WWW'11) expressed declaratively.
# ---------------------------------------------------------------------------

_TRIANGLES_ORACLE = f"""
    WITH corpus AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
               sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                     CAST(embedding AS DOUBLE[]))) AS nrm
        FROM embeddings
        WHERE embedding IS NOT NULL
    ),
    scored AS (
        SELECT a.vec_id AS src, b.vec_id AS dst,
               list_dot_product(a.v, b.v) / (a.nrm * b.nrm) AS cos_sim
        FROM corpus a JOIN corpus b ON a.vec_id <> b.vec_id
    ),
    ranked AS (
        SELECT *, row_number() OVER (PARTITION BY src
                                     ORDER BY cos_sim DESC, dst) AS rank
        FROM scored
    ),
    und AS (
        SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        FROM ranked WHERE rank <= {KNN_K}
    ),
    tri AS (
        SELECT e1.a AS x, e1.b AS y, e2.b AS z
        FROM und e1
        JOIN und e2 ON e2.a = e1.b
        JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
    ),
    corners AS (
        SELECT x AS vec_id FROM tri
        UNION ALL SELECT y FROM tri
        UNION ALL SELECT z FROM tri
    )
    SELECT vec_id, CAST(count(*) AS BIGINT) AS n_triangles
    FROM corners GROUP BY vec_id
"""


@query("qz25_triangles", oracle=_TRIANGLES_ORACLE)
def qz25_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle counts on the symmetrized kNN graph (header
    comment has the formulation and scale notes).  Rides the same
    per-process scratch kNN index as qz12_knn_graph / qz25_pagerank —
    the oracle therefore pins the persisted-index path end-to-end."""
    edges = _cached_knn_edges(spark, sf_dir)
    und = edges.select(
        F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
    ).distinct()
    e1 = und.select(F.col("a").alias("x"), F.col("b").alias("y"))
    e2 = und.select(F.col("a").alias("y"), F.col("b").alias("z"))
    e3 = und.select(F.col("a").alias("x"), F.col("b").alias("z"))
    tri = e1.join(e2, "y").join(e3, ["x", "z"])
    corners = (
        tri.select(F.col("x").alias("vec_id"))
        .unionAll(tri.select(F.col("y").alias("vec_id")))
        .unionAll(tri.select(F.col("z").alias("vec_id")))
    )
    return corners.groupBy("vec_id").agg(F.count(F.lit(1)).alias("n_triangles"))


# ---------------------------------------------------------------------------
# Label-propagation community detection (Raghavan et al., Phys. Rev. E 2007)
# — SYNCHRONOUS variant with a deterministic tie-break, as join algebra.
#
# Connected components (dedup.dup_clusters) answers "what touches what";
# LPA answers the denser question a curation pipeline asks of a similarity
# graph: which groups of items are MUTUALLY similar (a giant weakly-
# connected blob usually hides several dense communities).  Asynchronous
# LPA is order-dependent by construction; the synchronous variant with
# (count DESC, label ASC) tie-break is fully deterministic, which is what
# lets a numpy twin replay it bit-for-bit (tests/test_graph.py).
#
# Per round: labels ⋈ edges on src (message pass), groupBy(dst, label)
# count, one window per dst picks the plurality label — two shuffles and
# one window, ZERO driver actions; lineage truncated by localCheckpoint
# every LPA_CHECKPOINT_EVERY rounds (same posture as pagerank).  Isolated
# nodes never occur here (every kNN node has out-degree k and the edge
# set is symmetrized), but the final left join keeps any node that lost
# all messages on its own label — totality over degenerate corpora.
#
# 100 TB: messages carry (node, label) longs only; the plurality count
# is partial-aggregated map-side; fixed LPA_ITERS rounds bound the cost
# (synchronous LPA converges or 2-cycles in O(10) rounds on similarity
# graphs — a fixpoint loop would add a per-round driver action for no
# stability gain, since 2-cycles never terminate it).
# ---------------------------------------------------------------------------

LPA_ITERS = 5
LPA_CHECKPOINT_EVERY = 2
LPA_MAX_ROUNDS = 30  # until_stable safety cap (2-cycles never settle)


def label_propagation(
    edges: DataFrame,
    n_iter: int = LPA_ITERS,
    co_partition: bool | None = None,
    _probe: dict | None = None,
    until_stable: bool = False,
    tol: float = 0.0,
    max_rounds: int = LPA_MAX_ROUNDS,
) -> DataFrame:
    """Synchronous LPA over an (src, dst) edge DataFrame → (node, community).

    Labels start as the node id; each round every node adopts the
    plurality label among its in-neighbors on the SYMMETRIZED edge set
    (ties → smallest label).  Deterministic: same input, same labels,
    every run — the property the numpy twin asserts.

    ``co_partition`` (round 9, VERDICT r8 #2 — the exact move pagerank
    got in round 8): past broadcast range AQE stops converting the
    skinny labels frame and the default round pays exchanges at the
    labels⋈sym join, the (dst, label) aggregation AND the per-dst
    window.  The co-partitioned mode pre-hashes sym by src and labels
    by node (captured through AQE-off localCheckpoint, ``_static_plan``)
    so the message join is exchange-free, and routes the plurality
    count through ONE explicit hash(dst) repartition that the compound
    groupBy, the window and the write-back join all reuse
    (hash(dst) satisfies ClusteredDistribution(dst, label), and the
    winners frame rides it into the labels join) — exactly ONE shuffle
    per round, the algorithmic minimum (messages must regroup from
    src- to dst-alignment).  Trade named: repartitioning RAW messages
    forgoes map-side partial aggregation of (dst, label) counts — on a
    kNN similarity graph (in-degree ≈ 2k) partial combine almost never
    fires anyway, so the avoided exchange dominates.  Default (None) =
    ``auto_co_partition``: flips exactly when the node table outgrows
    ``autoBroadcastJoinThreshold``; both modes identity-tested.

    ``until_stable`` (round 11, VERDICT r10 #5): fixed LPA_ITERS=5
    rounds OVERSPLIT a clustered corpus whose communities need more
    rounds to absorb their periphery (measured at n=500k/25k planted:
    47,045 communities at 5 rounds, purity 1.0 —
    GRAPH_LSH_E2E.json).  With ``until_stable=True`` the loop runs the
    same co-partition superstep until the fraction of nodes that
    changed label is ≤ ``tol`` (default 0: a true fixpoint), capped at
    ``max_rounds`` because synchronous LPA can 2-cycle forever.  Cost
    named: convergence needs ONE extra driver action (a changed-label
    count) per round — the fixed-rounds default stays action-free, so
    the knob is opt-in.  LPA_CONVERGENCE.json records
    communities-vs-rounds on a planted corpus.
    """
    spark = edges.sparkSession
    sym = (
        edges.select("src", "dst")
        .unionAll(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .distinct()
        .localCheckpoint()
    )
    nodes = sym.select(F.col("src").alias("node")).distinct()
    n = nodes.count()
    if co_partition is None:
        co_partition = auto_co_partition(spark, n)
    if _probe is not None:
        _probe["co_partition"] = co_partition
        _probe["n_nodes"] = n

    def _ckpt(df, key=None):
        if not co_partition:
            return df.localCheckpoint()
        with _static_plan(spark):
            return (df.repartition(key) if key else df).localCheckpoint()

    if co_partition:
        sym = _ckpt(sym, "src")
    # checkpoint the SINGLE-column node table and alias `label` AFTER
    # the scan: checkpointing Project[node, node AS label] captures the
    # hash partitioning against the alias attribute (probe-verified:
    # hashpartitioning(label) — same values, but the node-keyed joins
    # can't use it), which silently re-introduced per-round exchanges.
    nd = _ckpt(nodes, "node")
    labels = nd.select("node", F.col("node").alias("label"))
    w = Window.partitionBy("dst").orderBy(F.desc("cnt"), F.asc("label"))
    rounds = max_rounds if until_stable else n_iter
    changed_history: list[int] = []
    stopped = "max_rounds"
    prev2: DataFrame | None = None  # labels from two rounds back
    for it in range(rounds):
        # ONE reference to the prior labels per round (same discipline
        # as pagerank's single-ranks-reference): the write-back joins
        # winners against the static `nd` table, not the prior labels —
        # on the symmetrized edge set every node has in-degree ≥ 1, so
        # every node receives messages every round and the coalesce
        # fallback (own id = initial label) is unreachable; it exists
        # for totality only.
        msgs = labels.join(sym, labels["node"] == sym["src"]).select(
            "dst", "label"
        )
        if co_partition:
            # the round's ONE exchange; hash(dst) then satisfies the
            # compound aggregation, the window AND the write-back join
            msgs = msgs.repartition("dst")
        counted = msgs.groupBy("dst", "label").agg(
            F.count(F.lit(1)).alias("cnt")
        )
        winners = (
            counted.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select(F.col("dst").alias("w_node"), F.col("label").alias("w_label"))
        )
        prev = labels
        labels = nd.join(
            winners, nd["node"] == winners["w_node"], "left_outer"
        ).select(
            "node", F.coalesce(F.col("w_label"), F.col("node")).alias("label")
        )
        if _probe is not None and it == 0:
            _probe["superstep_plan"] = (
                labels._jdf.queryExecution().executedPlan().toString()
            )
        if until_stable:
            # the knob's one driver action per round: checkpoint the new
            # labels (also truncates lineage) and count label changes
            labels = _ckpt(labels)
            changed = (
                labels.join(
                    prev.select(
                        "node", F.col("label").alias("_prev")
                    ),
                    "node",
                )
                .where(F.col("label") != F.col("_prev"))
                .count()
            )
            changed_history.append(int(changed))
            if changed <= tol * n:
                stopped = "fixpoint"
                break
            # synchronous LPA can oscillate with period 2 forever (any
            # bipartite-ish neighborhood): when the changed count
            # repeats — a necessary condition for a 2-cycle — compare
            # against the labels of two rounds ago and stop if equal
            # (either member of the oscillating pair is a valid answer;
            # taking the current one keeps determinism)
            if (
                prev2 is not None
                and len(changed_history) >= 2
                and changed_history[-2] == changed
            ):
                cyc = (
                    labels.join(
                        prev2.select("node", F.col("label").alias("_p2")),
                        "node",
                    )
                    .where(F.col("label") != F.col("_p2"))
                    .count()
                )
                if cyc == 0:
                    stopped = "cycle"
                    break
            prev2 = prev
        elif (it + 1) % LPA_CHECKPOINT_EVERY == 0 or it == n_iter - 1:
            labels = _ckpt(labels)
    if _probe is not None:
        _probe["rounds_run"] = it + 1
        _probe["changed_history"] = changed_history
        _probe["stopped"] = stopped if until_stable else "fixed_rounds"
    return labels.select("node", F.col("label").alias("community"))


@query("qz25_communities")
def qz25_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synchronous label-propagation communities over the kNN similarity
    graph (node, community).  Rows-only at the driver (iterative, not
    single-statement SQL); pytest gates: numpy twin replaying the
    identical synchronous rounds on identical edges, planted two-clique
    separation, and determinism across invocations.  Rides the same
    per-process scratch kNN index as the other graph consumers."""
    edges = _cached_knn_edges(spark, sf_dir)
    return label_propagation(edges)
