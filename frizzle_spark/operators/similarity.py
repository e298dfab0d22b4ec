"""Similarity search over the ``embeddings`` table (north-star extension;
the reference has nothing of the kind — SURVEY.md §2.2).

Two tiers, as a 100 TB design demands:

* ``q12_cosine_topk`` — exact brute force: broadcast the (small) probe
  set against the full corpus, one codegen'd pass, per-probe top-k via
  window + filter.  This is the correctness baseline and the oracle-
  checked query.  Scale shape: corpus-partitioned map-side scoring; the
  only shuffle carries |probes|×k-ish candidate rows (window on probe_id
  after a per-partition prune would make it fully heap-like; at our
  probe counts the window is already tiny).
* ``qz12_ann_lsh`` — approximate: random-hyperplane (SimHash) bucketing,
  multi-table (OR-construction) with QUERY-DIRECTED multiprobe (margin-
  ranked bucket perturbations at the Hamming-≤2 enumeration's bucket
  budget — see ``_query_directed_masks``).  Parameters
  are CORPUS-DERIVED (``lsh_params``): bits ≈ log2(n)+1 holds per-table
  exact-bucket occupancy at ~½ vector, so the probed candidate fraction
  stays roughly constant as the corpus grows — at 100× the data the
  code gets ~7 bits wider instead of the buckets getting 100× fatter.
  Recall on *random* vectors is bounded by construction (no real
  cluster structure in the testdata — measured: median true-neighbor
  cos is 0.37, so each hyperplane bit discriminates at only p≈0.62 vs
  0.5; scripts/ann_param_sweep.py has the full recall-vs-fraction grid
  and SCALE.md the round-3 write-up).  The pytest gates check BOTH the
  calibrated random-data floor AND, on a planted-neighbor corpus
  (cos≈0.95 duplicates — the realistic dedup/similarity shape), high
  recall at ≤10% candidate fraction.

Hyperplanes are deterministic (numpy seed 42+t per table) and shipped
as a BROADCAST variable into an Arrow kernel — measured in r2, shipping
model constants as Catalyst literals is 10× slower to analyze; at
tables×bits×dim = 3,072 coefficients the expression-tree route is the
exact anti-pattern SCALE.md documents.  Candidate scoring (the exact
re-rank) stays JVM-side.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from frizzle_spark.functions import vectors as V
from frizzle_spark.plans.registry import query
from frizzle_spark.sources.tables import load_table

N_PROBES = 10
TOP_K = 5
DIM = 64
LSH_TABLES = 4
LSH_HAMMING = 2
LSH_MIN_BITS, LSH_MAX_BITS = 6, 24
# near-dup pre-blocker's own grid (VERDICT r10 #9 — sweep in the
# embedding_lsh_candidates docstring); the top-k ANN tiers keep
# lsh_params' (bits, 4)
EMB_NEARDUP_LSH_TABLES = 12
NEARDUP_CHUNK_ROWS = 1024  # target rows per packed GEMM block (size bound)
NEARDUP_THRESHOLD = 0.4
# Re-rank scoring joins explicitly broadcast the (vec_id, unit-vector)
# side table up to this corpus size (≈540 B/row ⇒ ~1 GB at 2M): the
# candidate PAIR stream is the big side, and vectors must never ride a
# sort-merge-join sort (measured: tens of GB of sort spill at n=100k on
# the kNN edge build's first cut — operators/graph.knn_topk_lsh).
SCORE_BROADCAST_MAX_N = 2_000_000


def lsh_params(n: int) -> tuple[int, int, int]:
    """(bits, tables, hamming) derived from corpus size.

    bits = ⌈log2 n⌉ + 1 → per-table exact-bucket occupancy n/2^bits ≈ ½;
    with Hamming-≤2 multiprobe each probe touches ~(1+B+C(B,2)) buckets
    per table, so the expected candidate fraction is
    tables·(1+B+C(B,2))/2^B — ≈8% at n=2,000 (B=12) and FALLING as n
    grows (the binomial numerator is polynomial in B, the denominator
    exponential).  Tables OR together to recover recall lost to the
    narrower buckets; 4 tables is the measured knee on the sweep grid.
    """
    bits = min(LSH_MAX_BITS, max(LSH_MIN_BITS, math.ceil(math.log2(max(n, 2))) + 1))
    return bits, LSH_TABLES, LSH_HAMMING


def _corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, v, nrm) similarity corpus.  Rows with a NULL embedding
    are dropped here, at the boundary: a vector-table row without a
    vector is not a corpus member, and every downstream numpy kernel
    would otherwise meet ragged None batches (null-corpus totality
    sweep, round 6).  The oracles carry the same IS NOT NULL filter."""
    emb = load_table(spark, sf_dir, "embeddings").where(
        F.col("embedding").isNotNull()
    )
    v = V.as_double(F.col("embedding"))
    return emb.select("vec_id", v.alias("v")).withColumn("nrm", V.norm(F.col("v")))


# sf_dir → corpus row count.  The count drives only the LSH width
# derivation (lsh_params) and it is a catalog fact — static for a given
# dataset directory — so repeated ANN queries in one session shouldn't
# each pay a count job for it.  (Test corpora live in unique tmp dirs,
# so the key never aliases across datasets.)
_CORPUS_N_CACHE: dict[str, int] = {}


def _corpus_size(spark: SparkSession, sf_dir: str) -> int:
    if sf_dir not in _CORPUS_N_CACHE:
        _CORPUS_N_CACHE[sf_dir] = _corpus(spark, sf_dir).count()
    return _CORPUS_N_CACHE[sf_dir]


@query(
    "q12_cosine_topk",
    oracle=f"""
    WITH corpus AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
               sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                     CAST(embedding AS DOUBLE[]))) AS nrm
        FROM embeddings
        WHERE embedding IS NOT NULL
    ),
    probes AS (
        SELECT vec_id AS probe_id, v AS pv, nrm AS pnrm
        FROM corpus ORDER BY vec_id LIMIT {N_PROBES}
    ),
    scored AS (
        SELECT probe_id, vec_id AS neighbor_id,
               list_dot_product(pv, v) / (pnrm * nrm) AS cos_sim
        FROM probes, corpus
        WHERE vec_id <> probe_id
    ),
    ranked AS (
        SELECT *, row_number() OVER (PARTITION BY probe_id
                                     ORDER BY cos_sim DESC, neighbor_id) AS rank
        FROM scored
    )
    SELECT probe_id, neighbor_id, round(cos_sim, 6) AS cos_sim,
           CAST(rank AS BIGINT) AS rank
    FROM ranked WHERE rank <= {TOP_K}
    """,
)
def q12_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-k cosine neighbors for the 10 lowest-id probe vectors."""
    corpus = _corpus(spark, sf_dir)
    probes = corpus.orderBy("vec_id").limit(N_PROBES).select(
        F.col("vec_id").alias("probe_id"),
        F.col("v").alias("pv"),
        F.col("nrm").alias("pnrm"),
    )
    scored = (
        corpus.join(F.broadcast(probes), F.col("vec_id") != F.col("probe_id"))
        .withColumn("cos_sim", V.cosine(F.col("pv"), F.col("v"), F.col("pnrm"), F.col("nrm")))
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= TOP_K)
        .select(
            "probe_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round("cos_sim", 6).alias("cos_sim"),
            "rank",
        )
    )


RANGE_TAU = 0.3  # radius threshold; raw-float compare is bit-safe because
# both engines fold the dot product left-to-right (same convention as
# NEARDUP_THRESHOLD)


@query(
    "qz12_range_search",
    oracle=f"""
    WITH corpus AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
               sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                     CAST(embedding AS DOUBLE[]))) AS nrm
        FROM embeddings
        WHERE embedding IS NOT NULL
    ),
    probes AS (
        SELECT vec_id AS probe_id, v AS pv, nrm AS pnrm
        FROM corpus ORDER BY vec_id LIMIT {N_PROBES}
    )
    SELECT probe_id, vec_id AS neighbor_id,
           round(list_dot_product(pv, v) / (pnrm * nrm), 6) AS cos_sim
    FROM probes, corpus
    WHERE vec_id <> probe_id
      AND list_dot_product(pv, v) / (pnrm * nrm) >= {RANGE_TAU}
    """,
)
def qz12_range_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Radius (range) similarity search: ALL corpus vectors within
    cosine ≥ {RANGE_TAU} of each probe — the fixed-threshold sibling of
    q12_cosine_topk (top-k answers "the k closest", range search
    answers "everything this similar": retrieval cutoffs, near-dup
    sweeps with a quality bar, collision checks against a blocklist of
    embeddings).

    Scale shape: identical to the top-k baseline's best case — probes
    broadcast, ONE codegen'd corpus scan, and the threshold prunes
    map-side, so the operator produces output rows only where matches
    exist and shuffles NOTHING (no window needed at all: the predicate
    is per-row).  At 100 TB the same query rides the LSH/IVF bucket
    tiers (any candidate below τ is discarded by the same final
    predicate), so exact and approximate variants share this reducer.
    """
    corpus = _corpus(spark, sf_dir)
    probes = corpus.orderBy("vec_id").limit(N_PROBES).select(
        F.col("vec_id").alias("probe_id"),
        F.col("v").alias("pv"),
        F.col("nrm").alias("pnrm"),
    )
    return (
        corpus.join(F.broadcast(probes), F.col("vec_id") != F.col("probe_id"))
        .withColumn(
            "cos_sim",
            V.cosine(F.col("pv"), F.col("v"), F.col("pnrm"), F.col("nrm")),
        )
        .where(F.col("cos_sim") >= RANGE_TAU)
        .select(
            "probe_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round("cos_sim", 6).alias("cos_sim"),
        )
    )


@query(
    "qz12_mips",
    oracle=f"""
    WITH corpus AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        FROM embeddings
        WHERE embedding IS NOT NULL
    ),
    probes AS (
        SELECT vec_id AS probe_id, v AS pv
        FROM corpus ORDER BY vec_id LIMIT {N_PROBES}
    ),
    ranked AS (
        SELECT probe_id, vec_id AS neighbor_id,
               list_dot_product(pv, v) AS score,
               row_number() OVER (PARTITION BY probe_id
                                  ORDER BY list_dot_product(pv, v) DESC,
                                           vec_id) AS rank
        FROM probes, corpus
        WHERE vec_id <> probe_id
    )
    SELECT probe_id, neighbor_id, round(score, 6) AS score,
           CAST(rank AS BIGINT) AS rank
    FROM ranked WHERE rank <= {TOP_K}
    """,
)
def qz12_mips(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum-inner-product search: top-k by RAW dot product, no
    normalization — the retrieval mode recommender / learned-embedding
    scoring uses when vector magnitude carries signal (popularity,
    confidence) that cosine deliberately erases.  Same broadcast-probe
    single-scan plan as q12_cosine_topk; at 100 TB the standard
    norm-augmentation reduction (append √(M²−‖v‖²) as an extra
    coordinate, Bachrach et al. RecSys'14) turns this into the cosine
    problem, so every ANN tier (LSH/IVF/IVF-PQ/SQ8) serves MIPS
    unchanged — this exact scan is their oracle twin."""
    corpus = _corpus(spark, sf_dir)
    probes = corpus.orderBy("vec_id").limit(N_PROBES).select(
        F.col("vec_id").alias("probe_id"), F.col("v").alias("pv")
    )
    scored = corpus.join(
        F.broadcast(probes), F.col("vec_id") != F.col("probe_id")
    ).withColumn("score", V.dot(F.col("pv"), F.col("v")))
    w = Window.partitionBy("probe_id").orderBy(F.desc("score"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= TOP_K)
        .select(
            "probe_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round("score", 6).alias("score"),
            "rank",
        )
    )


def _lsh_planes(bits: int, tables: int, dim: int) -> np.ndarray:
    """(tables, bits, dim) hyperplane tensor, seed 42+t per table."""
    return np.stack(
        [np.random.RandomState(42 + t).randn(bits, dim) for t in range(tables)]
    )


# _spread sizing: one task per ~this many vectors.  Small enough that a
# 20k-vector corpus fans out to ~20 tasks (the sf1 probe-coding pass
# measured ~2.3 ms/vector of numpy — 45 s on the 2 tasks the single
# local file scanned as), large enough that a 2k-vector sf0.1 corpus
# stays on its natural splits (no exchange added where the work is
# already sub-second — measured +0.7 s/query of pure overhead when
# 2k rows were spread to 32 tasks).
SPREAD_ROWS_PER_TASK = 1024
# Below this corpus size the near-dup re-rank keeps the JVM fold over
# broadcast side tables: the gather-GEMM tier's one driver collect +
# matrix broadcast (~0.5 s) outweighs scoring a few-thousand-pair
# stream.  Above it the collect amortizes against millions of pairs.
GATHER_RERANK_MIN_N = 8192


def _spread(df: DataFrame, n: int | None) -> DataFrame:
    """Round-robin repartition ONLY when the scan arrives under-split
    for its row count.

    The ANN/dedup kernels downstream are per-row Python/numpy compute
    (mapInPandas GEMMs), and task count = input split count: a local
    single-file corpus scans as 1-2 splits, pinning every kernel to 1-2
    of the session's cores — the whole family's 10×-decade walls were
    split-bound, not compute-bound (qz11_embedding_neardup_lsh 62.9 →
    22.9 s at sf1 from this alone).  On a cluster a 100 TB corpus
    arrives as thousands of splits and this is a NO-OP — no exchange is
    added where the scan already fans out; locally it costs one
    round-robin shuffle of (vec_id, u) rows (~10 MB at sf1).  ``n`` is
    the (cached, catalog-fact) corpus row count; None disables the
    spread — callers without a count keep the scan's own splits."""
    if not n:
        return df
    p = min(
        df.sparkSession.sparkContext.defaultParallelism,
        max(1, n // SPREAD_ROWS_PER_TASK),
    )
    if df.rdd.getNumPartitions() < p:
        return df.repartition(p)
    return df


def _unit(corpus: DataFrame, n: int | None = None) -> DataFrame:
    """(vec_id, u) unit-normalized vectors.

    With ``n`` (every hot ANN/dedup path): ONE Arrow kernel computes
    norm + division in numpy on the spread frame.  The JVM
    higher-order-function form below — an ``aggregate`` fold for the
    norm plus a ``transform`` map for the division — measured 5.95 s
    for 20k×64 at sf1 (~300 µs/row for 128 scalar ops: HOFs allocate
    per element and never vectorize), and every _unit consumer paid it
    per branch.  The kernel pass is ~0.3 s for the same frame.  numpy's
    pairwise summation differs from the JVM's sequential fold at
    ~1e-16 relative — invisible at the round-6 publication precision
    every consumer applies (same argument as the q11 score kernel).
    Division semantics match the JVM exactly (x/0 → ±inf, 0/0 → nan —
    no special-casing), and _corpus has already dropped null vectors.

    Without ``n`` (cold/neutral callers that feed JVM-side joins):
    the original codegen form, no Python roundtrip."""
    if n is None:
        return corpus.select(
            "vec_id", F.transform(F.col("v"), lambda x: x / F.col("nrm")).alias("u")
        )

    def kern(batches):  # pragma: no cover - executed on executors
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            m = np.stack(pdf["v"].map(np.asarray))
            nrm = np.sqrt((m * m).sum(axis=1, keepdims=True))
            with np.errstate(divide="ignore", invalid="ignore"):
                u = m / nrm
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"], "u": list(map(list, u))}
            )

    return _spread(corpus.select("vec_id", "v"), n).mapInPandas(
        kern, "vec_id long, u array<double>"
    )


def _lsh_codes(unit: DataFrame, bc_planes) -> DataFrame:
    """(vec_id, u) → (vec_id, table_id, code): sign-bit bucket code per
    table, one numpy GEMM per Arrow batch against broadcast hyperplanes.
    Map-side only — the corpus is never shuffled to be coded, and the
    code stream carries three scalars per (vector, table), no arrays."""

    def assign(batches):  # pragma: no cover - executed on executors
        import pandas as pd

        planes = bc_planes.value  # (T, B, D)
        tables, bits, _ = planes.shape
        weights = (1 << np.arange(bits)).astype(np.int64)
        for pdf in batches:
            if not len(pdf):
                continue
            u = np.stack(pdf["u"].map(np.asarray))
            frames = []
            for t in range(tables):
                codes = ((u @ planes[t].T >= 0) @ weights).astype(np.int64)
                frames.append(
                    pd.DataFrame(
                        {
                            "vec_id": pdf["vec_id"],
                            "table_id": np.int32(t),
                            "code": codes,
                        }
                    )
                )
            yield pd.concat(frames)

    return unit.mapInPandas(assign, "vec_id long, table_id int, code long")


def _multiprobe_masks(bits: int, hamming: int) -> list[int]:
    from itertools import combinations

    masks = [0]
    if hamming >= 1:
        masks += [1 << j for j in range(bits)]
    if hamming >= 2:
        masks += [(1 << a) | (1 << b) for a, b in combinations(range(bits), 2)]
    return masks


QD_MAX_FLIPS = 4  # deepest perturbation the query-directed ranking considers
QD_POOL_BITS = 18  # enumerate flip subsets over the lowest-margin ≤18 bits
# Corpus-side pool cap (sf1 scaling finding, SCALE.md round 7): the
# near-dup blocker runs the subset ranking for EVERY corpus vector, and
# with pool = bits the candidate-subset count C(pool, ≤4) grows ~bits⁴
# while bits grows with log n — measured 27.8× wall at 10× data (bits
# 12 → 16 means 794 → 2,517 scored subsets per vector-table).  Capping
# the pool at 12 lowest-margin bits bounds per-vector work at O(1):
# the probe budget is only bits+1 ≤ 25 subsets, and the top-25
# subset-sums over sorted margins essentially never reach past the 12
# smallest elements (a rank-13+ singleton must beat a pair of the two
# smallest).  At n ≤ 2k (bits ≤ 12, every published sf0.1 number) the
# cap is inactive — behavior is bit-identical.  The 10-probe ANN path
# (_query_directed_masks) keeps the full 18-bit pool: its ranking cost
# is per-probe, not per-corpus-vector.
QD_CORPUS_POOL_BITS = 12

# (pool, depth) → (C(pool, depth), depth) int array of combination index
# rows.  Data-independent, so computed once per process: the r5 version
# re-ran itertools+per-subset numpy for every (probe, table) — ~162k
# tiny numpy calls on the driver per query, which was the entire 2.7×
# qz12_ann_lsh bench regression (VERDICT r5 'Performance').
_COMB_CACHE: dict[tuple[int, int], np.ndarray] = {}


def _comb_indices(pool: int, depth: int) -> np.ndarray:
    key = (pool, depth)
    if key not in _COMB_CACHE:
        from itertools import combinations

        _COMB_CACHE[key] = np.asarray(
            list(combinations(range(pool), depth)), dtype=np.int64
        ).reshape(-1, depth)
    return _COMB_CACHE[key]


def _query_directed_masks(z: "np.ndarray", budget: int) -> list[int]:
    """The ``budget`` most-promising bucket perturbations for ONE
    (probe, table), ranked by margin score — query-directed multiprobe
    (Lv et al., VLDB 2007, adapted to sign-hyperplane LSH).

    For sign LSH the probability that a true neighbor disagrees with the
    query on bit i shrinks with the query's distance-to-hyperplane
    |z_i|, so the buckets most likely to hold missed neighbors are those
    reached by flipping LOW-|z| bits.  Score(perturbation S) = Σ_{i∈S}
    |z_i|; probing the ``budget`` lowest-score subsets (sizes ≤
    ``QD_MAX_FLIPS``, drawn from the ``QD_POOL_BITS`` lowest-margin
    bits) dominates uniform Hamming-≤2 enumeration at the SAME bucket
    count: a 3-bit flip of near-boundary bits often outranks a 2-bit
    flip of confident ones, and confident-bit flips that can't help are
    never probed.  Fully vectorized: one score-sum + one mask-fold per
    flip depth over cached combination-index matrices (≤ C(18,4)=3,060
    rows), so the driver cost per (probe, table) is a handful of numpy
    ops — bounded regardless of corpus size.
    """
    azs = np.abs(z)
    order = np.argsort(azs)[:QD_POOL_BITS]
    pool = len(order)
    margins = azs[order]
    bitvals = (np.int64(1) << order.astype(np.int64))
    scores = [np.zeros(1)]
    masks = [np.zeros(1, dtype=np.int64)]
    for depth in range(1, QD_MAX_FLIPS + 1):
        idx = _comb_indices(pool, depth)
        scores.append(margins[idx].sum(axis=1))
        masks.append(np.bitwise_or.reduce(bitvals[idx], axis=1))
    all_scores = np.concatenate(scores)
    all_masks = np.concatenate(masks)
    take = np.argsort(all_scores, kind="stable")[:budget]
    return [int(m) for m in all_masks[take]]


def _probe_dot_kernel(
    cand: DataFrame, pid: "np.ndarray", pu: "np.ndarray", out: str = "cos_sim"
) -> DataFrame:
    """Score a (probe_id, vec_id, u) candidate stream against a
    BROADCAST probe matrix in one Arrow kernel: gather each row's probe
    vector by searchsorted, one einsum row-dot per batch (r12; the
    gather-GEMM shape qz11_embedding_neardup_lsh earned in r11).

    Replaces the per-row ``V.dot(pu, u)`` JVM fold (~300 µs/row of
    allocate-per-element HOF work) AND the per-row pu attach — the
    probe side is P×dim floats shipped once, so candidate rows stay
    (2 longs + one u array) instead of carrying a second vector each.
    Scoring cost scales with the candidate stream, map-side, zero
    shuffles — the 100 TB shape is unchanged, only the per-row constant
    drops.  numpy's dot differs from the JVM's sequential fold at
    ~1e-16 relative — invisible at the 6dp publication rounding every
    consumer applies (same argument as _unit's kernel)."""
    order = np.argsort(pid)
    bc = cand.sparkSession.sparkContext.broadcast((pid[order], pu[order]))

    def score(batches):  # pragma: no cover - executed on executors
        import pandas as pd

        spid, spu = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            idx = np.searchsorted(spid, pdf["probe_id"].to_numpy())
            u = np.stack(pdf["u"].map(np.asarray))
            yield pd.DataFrame(
                {
                    "probe_id": pdf["probe_id"],
                    "vec_id": pdf["vec_id"],
                    out: np.einsum("ij,ij->i", spu[idx], u),
                }
            )

    return cand.select("probe_id", "vec_id", "u").mapInPandas(
        score, f"probe_id long, vec_id long, {out} double"
    )


def ann_lsh_candidates(
    spark: SparkSession,
    sf_dir: str,
    probing: str = "query",
    attach_pu: bool = True,
    _parts: dict | None = None,
) -> DataFrame:
    """Distinct (probe_id, vec_id, pu, u) LSH candidates — the recall/
    candidate-fraction surface the bench reports on.

    ``probing`` selects the bucket-perturbation strategy at the SAME
    bucket budget: ``"query"`` (default) margin-ranks perturbations per
    (probe, table) — see ``_query_directed_masks``; ``"uniform"`` is the
    classic Hamming-≤h enumeration.  Both exist so the bench can record
    a like-for-like (time, recall, fraction) frontier (SCALE.md).

    Shape: corpus coded map-side (T rows per vector), probes collected
    driver-side (bounded: N_PROBES rows), multiprobe bucket variants
    enumerated in numpy and broadcast, candidates via broadcast hash
    join on (table_id, code).  The only shuffle is the pair-distinct,
    and it carries candidate PAIRS (two longs), never vectors or
    buckets; the deduped pair set (probe-bounded, ≈fraction·|probes|·n
    rows) broadcasts back against the corpus so the re-rank scoring
    stays map-side too.
    """
    corpus = _corpus(spark, sf_dir)
    n = _corpus_size(spark, sf_dir)
    bits, tables, hamming = lsh_params(n)
    planes = _lsh_planes(bits, tables, DIM)
    bc_planes = spark.sparkContext.broadcast(planes)
    coded = _lsh_codes(_unit(corpus, n), bc_planes)

    probe_rows = (
        corpus.orderBy("vec_id").limit(N_PROBES).select("vec_id", "v", "nrm").collect()
    )
    pu = np.asarray([r["v"] for r in probe_rows]) / np.asarray(
        [[r["nrm"]] for r in probe_rows]
    )
    weights = (1 << np.arange(bits)).astype(np.int64)
    # bucket budget = the uniform Hamming-≤`hamming` enumeration's count,
    # but the buckets themselves are chosen query-directed (margin-
    # ranked) — same expected candidate fraction, strictly better-aimed
    # probes.  See _query_directed_masks.
    uniform = _multiprobe_masks(bits, hamming)
    budget = len(uniform)
    bucket_rows = []
    for i, r in enumerate(probe_rows):
        for t in range(tables):
            z = pu[i] @ planes[t].T
            code = int(((z >= 0) @ weights))
            masks = uniform if probing == "uniform" else _query_directed_masks(z, budget)
            bucket_rows += [(r["vec_id"], t, code ^ m) for m in masks]
    probe_buckets = spark.createDataFrame(
        bucket_rows, "probe_id long, table_id int, code long"
    )
    probes_df = spark.createDataFrame(
        [(r["vec_id"], [float(x) for x in row]) for r, row in zip(probe_rows, pu)],
        "probe_id long, pu array<double>",
    )
    pairs = (
        coded.join(F.broadcast(probe_buckets), ["table_id", "code"])
        .where(F.col("vec_id") != F.col("probe_id"))
        .select("probe_id", "vec_id")
        .distinct()
    )
    if _parts is not None:
        _parts["pid"] = np.asarray(
            [r["vec_id"] for r in probe_rows], dtype=np.int64
        )
        _parts["pu"] = pu
    cand = _unit(corpus, n).join(F.broadcast(pairs), "vec_id")
    if not attach_pu:
        # kernel-re-rank callers score against the broadcast probe
        # matrix (_probe_dot_kernel) — per-row pu rows would be pure
        # Arrow-boundary weight
        return cand
    return cand.join(F.broadcast(probes_df), "probe_id")


@query("qz12_ann_lsh", oracle=None)
def qz12_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k via multi-table random-hyperplane LSH with
    query-directed multiprobe (margin-ranked perturbations, Hamming-≤2
    bucket budget), exact cosine re-rank of the candidate set.
    Measured at sf0.1: recall 0.38 @ 9.2% candidates vs 0.36 @ 9.1% for
    uniform Hamming-≤2 — same cost, better-aimed probes; the gap widens
    on clustered (non-random) corpora where margins carry real signal.

    No SQL oracle (bucketing is not expressible without replicating the
    hyperplane tensor); pytest gates recall AND candidate fraction
    against q12_cosine_topk — on the random testdata at the calibrated
    floor, on a planted-neighbor corpus at the realistic bar.
    """
    parts: dict = {}
    cand = ann_lsh_candidates(spark, sf_dir, attach_pu=False, _parts=parts)
    # r12: exact re-rank through the gather-kernel (see
    # _probe_dot_kernel) instead of a per-row JVM HOF fold — VERDICT
    # r11 #4's named wall (the fold alone was ~5 s of the sf1 run)
    scored = _probe_dot_kernel(cand, parts["pid"], parts["pu"])
    w = Window.partitionBy("probe_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= TOP_K)
        .select(
            "probe_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round("cos_sim", 6).alias("cos_sim"),
            "rank",
        )
    )


def _n_blocks(n_rows: int, chunk_rows: int) -> int:
    """Block count for the GEMM grid: grows with the corpus so the
    per-block packed row stays ~chunk_rows × dim doubles."""
    return max(1, -(-n_rows // chunk_rows))


def _pack_blocks(unit: DataFrame, n_rows: int, chunk_rows: int) -> DataFrame:
    """Pack unit vectors into ≈chunk_rows-sized (blk, ids[], mat[]) rows.

    Block id is ``xxhash64(vec_id) mod B`` — uniform, shuffle-friendly,
    and independent of any global ordering.  ids are sorted within a
    block so the diagonal grid cell can take the strict upper triangle.
    """
    b = _n_blocks(n_rows, chunk_rows)
    return (
        unit.groupBy(F.pmod(F.xxhash64(F.col("vec_id")), F.lit(b)).alias("blk"))
        .agg(F.sort_array(F.collect_list(F.struct("vec_id", "u"))).alias("rows"))
        .select(
            "blk",
            F.col("rows.vec_id").alias("ids"),
            F.flatten(F.col("rows.u")).alias("mat"),
        )
    )


@query(
    "q11_embedding_neardup",
    oracle="""
    WITH corpus AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
               sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                     CAST(embedding AS DOUBLE[]))) AS nrm
        FROM embeddings
        WHERE embedding IS NOT NULL
    )
    SELECT a.vec_id AS id1, b.vec_id AS id2,
           round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6) AS cos_sim
    FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id
    WHERE list_dot_product(a.v, b.v) / (a.nrm * b.nrm) >= 0.4
    """,
)
def q11_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (cos ≥ 0.4 on this corpus).

    Block-matrix similarity join — the all-pairs scan expressed as a
    GEMM grid instead of a row-level cross join:

    1. unit-normalize each vector JVM-side (one codegen pass);
    2. hash vectors into ``B = ceil(n / NEARDUP_CHUNK_ROWS)`` blocks and
       pack each block into one (ids[], row-major matrix[]) row — the
       block COUNT grows with the corpus while the packed-row SIZE stays
       ~NEARDUP_CHUNK_ROWS × dim doubles (hash-uniform assignment, so
       the max block concentrates near the mean; a FIXED block count
       would make packed rows grow O(n) and breach Spark's ~2 GB
       column limit long before 100× — round-1's shape, fixed in r2).
       Hash assignment, not row_number: a global ordering window would
       serialize the corpus through one partition, its own scale-killer;
    3. cross-join the upper triangle of block pairs (B·(B+1)/2 rows —
       the only shuffle, and it carries packed matrices, not pairs;
       the quadratic grid is inherent to EXACT all-pairs);
    4. score each block pair with a single numpy GEMM in mapInPandas
       (Arrow batches; ~10-100× the interpreted ``zip_with`` path) and
       emit only pairs above threshold.

    At 100 TB per-task memory is the binding constraint and it is
    bounded: two ~CHUNK×dim matrices per grid cell; the emitted-pair
    volume — not n² — is what shuffles out.  An LSH pre-blocker
    (qz12_ann_lsh's buckets as join key) drops the grid to
    near-diagonal when approximate recall is acceptable.
    """
    corpus = _corpus(spark, sf_dir)
    n = _corpus_size(spark, sf_dir)
    # Arrow-kernel normalize (see _unit): the JVM HOF form this used
    # cost ~6 s alone at sf1 before the grid even started
    unit = _unit(corpus, n)
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

    out_schema = "id1 long, id2 long, cos_sim double"

    def score(batches):  # pragma: no cover - executed on executors
        import numpy as np
        import pandas as pd

        for pdf in batches:
            i1s, i2s, cs = [], [], []
            for row in pdf.itertuples(index=False):
                ids1 = np.asarray(row.ids1, dtype=np.int64)
                ids2 = np.asarray(row.ids2, dtype=np.int64)
                m1 = np.asarray(row.m1, dtype=np.float64).reshape(len(ids1), -1)
                m2 = np.asarray(row.m2, dtype=np.float64).reshape(len(ids2), -1)
                sims = m1 @ m2.T
                if row.b1 == row.b2:
                    # ids are sorted within a block: upper triangle = id1 < id2
                    sims = np.triu(sims, k=1)
                i, j = np.nonzero(sims >= NEARDUP_THRESHOLD)
                if i.size == 0:
                    continue
                lo = np.minimum(ids1[i], ids2[j])
                hi = np.maximum(ids1[i], ids2[j])
                i1s.append(lo)
                i2s.append(hi)
                cs.append(sims[i, j])
            if i1s:
                yield pd.DataFrame(
                    {
                        "id1": np.concatenate(i1s),
                        "id2": np.concatenate(i2s),
                        "cos_sim": np.round(np.concatenate(cs), 6),
                    }
                )

    return grid.mapInPandas(score, schema=out_schema)


_BLAS_CTL: tuple | None = None


def _blas_set_threads(n: int):
    """Best-effort OpenBLAS runtime thread cap for DRIVER-side training
    numpy.  The bundled OpenBLAS spawns/syncs its pool per GEMM call,
    and the quantizer-training GEMMs are tiny (thousands×4-ish):
    measured 3.0 s → 0.7 s for _pq_train on 2,000×64 just by pinning
    one thread.  Returns the previous setting (None when the control
    symbol is unavailable — then this is a no-op and training simply
    keeps the default).  Executor-side kernels are unaffected: they run
    in separate worker processes."""
    global _BLAS_CTL
    if _BLAS_CTL is None:
        import ctypes
        import glob
        import os

        setter = getter = None
        pattern = os.path.join(
            os.path.dirname(np.__file__), os.pardir, "numpy.libs", "*openblas*"
        )
        for path in glob.glob(pattern):
            try:
                h = ctypes.CDLL(path)
            except OSError:
                continue
            for fn in ("openblas_set_num_threads64_", "openblas_set_num_threads"):
                if hasattr(h, fn):
                    setter = getattr(h, fn)
                    getter = getattr(h, fn.replace("set", "get"), None)
                    break
            if setter is not None:
                break
        _BLAS_CTL = (setter, getter)
    setter, getter = _BLAS_CTL
    if setter is None:
        return None
    prev = getter() if getter is not None else None
    setter(n)
    return prev


def _pinned_blas(fn, *args):
    """Run a driver-side training function under a 1-thread BLAS pin,
    restoring the prior setting after."""
    prev = _blas_set_threads(1)
    try:
        return fn(*args)
    finally:
        if prev:
            _blas_set_threads(prev)


IVF_TRAIN_SAMPLE = 4096
IVF_ITERS = 10
IVF_PROBE_FRAC = 0.09  # target nprobe/K — candidate fraction ≈ this
IVF_MIN_CLUSTERS = 4
IVF_MAX_CLUSTERS = 65536


def ivf_params(n: int) -> tuple[int, int]:
    """(K, nprobe) derived from corpus size: K ≈ √n (the standard IVF
    sizing — per-list length and list count both grow as √n, so probe
    cost is O(nprobe·√n) instead of O(n)), nprobe = max(2, round(frac·K))
    so the scanned candidate fraction stays ≈IVF_PROBE_FRAC at every
    scale instead of the fixed-K shape whose fraction was stuck at 25%."""
    k = min(IVF_MAX_CLUSTERS, max(IVF_MIN_CLUSTERS, round(math.sqrt(n))))
    nprobe = max(2, round(IVF_PROBE_FRAC * k))
    return k, nprobe


def _kmeans_unit(x: "np.ndarray", k: int) -> "np.ndarray":
    """Deterministic Lloyd's k-means over unit vectors (cosine affinity).

    Runs on a bounded driver-side sample — the scale contract: training
    cost is O(sample × iters × K) regardless of corpus size; at 100 TB
    you still collect only IVF_TRAIN_SAMPLE vectors.  Centroids are
    re-unit-normalized each iteration so affinity stays the cosine.
    """
    rng = np.random.RandomState(7)
    cent = x[rng.choice(len(x), min(k, len(x)), replace=False)]
    for _ in range(IVF_ITERS):
        assign = (x @ cent.T).argmax(axis=1)
        for c in range(len(cent)):
            members = x[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
                cent[c] /= np.linalg.norm(cent[c])
    return cent


def _ivf_train(spark: SparkSession, sf_dir: str):
    """Shared IVF front-matter: (unit, sample, x, cent, pid, pu,
    top_clusters).  Factored so ivf_candidates and ivfpq_candidates use
    the IDENTICAL sample, quantizer seed and probe set STRUCTURALLY —
    their candidate membership cannot drift apart by a copy-paste edit
    (the property tests/test_dedup_similarity.py's membership gate
    checks on real data).

    ONE bounded collect feeds both the quantizer sample and the probe
    set (probes are the N_PROBES lowest vec_ids, a prefix of the
    lowest-IVF_TRAIN_SAMPLE sample) — a first cut ran the full-corpus
    mapInPandas assignment a second time just to read 10 probe rows.
    """
    corpus = _corpus(spark, sf_dir)
    n = _corpus_size(spark, sf_dir)
    k, nprobe = ivf_params(n)
    unit = _unit(corpus, n)
    sample = (
        corpus.orderBy("vec_id")
        .limit(max(IVF_TRAIN_SAMPLE, N_PROBES))
        .select("vec_id", "v", "nrm")
        .collect()
    )
    if not sample:
        return None
    x = np.asarray([r["v"] for r in sample]) / np.asarray(
        [[r["nrm"]] for r in sample]
    )
    cent = _pinned_blas(_kmeans_unit, x, k)
    pid = [r["vec_id"] for r in sample[:N_PROBES]]
    pu = x[:N_PROBES]
    top_clusters = np.argsort(-(pu @ cent.T), axis=1)[:, :nprobe]
    return unit, sample, x, cent, pid, pu, top_clusters


def ivf_candidates(
    spark: SparkSession,
    sf_dir: str,
    attach_pu: bool = True,
    _parts: dict | None = None,
) -> DataFrame:
    """Distinct IVF candidates (probe_id, vec_id, pu, u) — the recall/
    candidate-fraction surface the bench reports on; qz12_ivf re-ranks
    it exactly.  See qz12_ivf for the plan shape.  ``attach_pu=False``
    skips the per-row probe-vector attach for kernel-re-rank callers
    (membership is identical either way — the probe join key is
    cluster id alone)."""
    trained = _ivf_train(spark, sf_dir)
    if trained is None:  # empty corpus: empty candidate stream
        return spark.createDataFrame(
            [], "cluster int, vec_id long, u array<double>, probe_id long, pu array<double>"
        )
    unit, sample, x, cent, pid, pu, top_clusters = trained
    if _parts is not None:
        _parts["pid"] = np.asarray(pid, dtype=np.int64)
        _parts["pu"] = pu
    bc_cent = spark.sparkContext.broadcast(cent)

    def assign(batches):  # pragma: no cover - executed on executors
        import pandas as pd

        c = bc_cent.value
        for pdf in batches:
            if not len(pdf):
                continue
            u = np.stack(pdf["u"].map(np.asarray))
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "cluster": (u @ c.T).argmax(axis=1).astype(np.int32),
                    "u": pdf["u"],
                }
            )

    clustered = unit.mapInPandas(assign, "vec_id long, cluster int, u array<double>")

    # bucket rows carry only (probe_id, cluster); the probe VECTORS ride
    # a separate broadcast (attach join or kernel matrix) instead of
    # being duplicated into every one of the nprobe bucket rows
    probe_buckets = spark.createDataFrame(
        [(int(p), int(c)) for p, row in zip(pid, top_clusters) for c in row],
        "probe_id long, cluster int",
    )
    cand = clustered.join(F.broadcast(probe_buckets), "cluster").where(
        F.col("vec_id") != F.col("probe_id")
    )
    if not attach_pu:
        return cand
    probes_df = spark.createDataFrame(
        [(int(p), [float(x) for x in vec]) for p, vec in zip(pid, pu)],
        "probe_id long, pu array<double>",
    )
    return cand.join(F.broadcast(probes_df), "probe_id")


@query("qz12_ivf", oracle=None)
def qz12_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k via IVF: k-means coarse quantizer, K and nprobe
    corpus-derived (``ivf_params``: K ≈ √n, nprobe ≈ 9% of K).

    Corpus vectors partition into K inverted lists; each probe scans
    only its nprobe closest lists (~nprobe/K of the data).
    Cluster assignment is one numpy GEMM per Arrow batch against a
    BROADCAST centroid matrix (a first cut shipped the centroids as
    1,024 literal expression nodes — Catalyst analysis alone made the
    query 10× slower at sf0.1; broadcast variables are the way to ship
    model constants).  Candidate generation is a broadcast hash join on
    cluster id, so the corpus never reshuffles per query — the
    inverted-list layout IS the partitioning.  Rows-only check; pytest
    gates recall against q12_cosine_topk's exact result, plus the
    planted-neighbor bar (see qz12_ann_lsh docstring).
    """
    parts: dict = {}
    cand = ivf_candidates(spark, sf_dir, attach_pu=False, _parts=parts)
    if "pid" not in parts:  # empty corpus
        return spark.createDataFrame([], TOPK_SCHEMA)
    # r12: exact re-rank via the gather-kernel (_probe_dot_kernel)
    # instead of the per-row JVM HOF fold
    scored = _probe_dot_kernel(cand, parts["pid"], parts["pu"])
    w = Window.partitionBy("probe_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= TOP_K)
        .select(
            "probe_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round("cos_sim", 6).alias("cos_sim"),
            "rank",
        )
    )


SQ8_TRAIN_SAMPLE = 512  # rows collected to fit the per-dim quantizer


TOPK_SCHEMA = "probe_id long, neighbor_id long, cos_sim double, rank long"


def _sq8_train(spark: SparkSession, sf_dir: str):
    """Per-dimension affine int8 quantizer fitted on a bounded sample +
    the probe set: (lo[dim], scale[dim], probe ids, probe unit vecs).
    Returns None on an empty corpus (nothing to fit or probe)."""
    corpus = _corpus(spark, sf_dir)
    sample = (
        corpus.orderBy("vec_id")
        .limit(max(SQ8_TRAIN_SAMPLE, N_PROBES))
        .select("vec_id", "v", "nrm")
        .collect()
    )
    if not sample:
        return None
    x = np.asarray([r["v"] for r in sample]) / np.asarray(
        [[r["nrm"]] for r in sample]
    )
    lo, hi = x.min(axis=0), x.max(axis=0)
    scale = np.maximum((hi - lo) / 255.0, 1e-9)
    pid = [r["vec_id"] for r in sample[:N_PROBES]]
    pu = x[:N_PROBES]
    return lo, scale, pid, pu


@query("qz12_sq8", oracle=None)
def qz12_sq8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flat scalar-quantized (SQ8) top-k: brute-force scan over int8
    codes — the 4×-memory tier between raw-vector exactness and
    IVF-PQ's 32× compression (the standard SQ8 flat index of the
    Johnson/Douze/Jégou GPU-similarity line, arXiv:1702.08734 §4).

    Encode: per-dimension affine quantizer (lo/scale fitted on a
    bounded sample) maps each unit vector to 64 uint8 codes — 8× less
    than the float64 arrays, 4× less than float32, so a 100 TB raw
    corpus becomes a 12.5 TB code stream that scans at memory-bandwidth
    speed.  Score: asymmetric — the probe stays full-precision and
    folds the quantizer into itself (A = pu·scale, b = pu·lo), so each
    Arrow batch costs ONE uint8→GEMM with no per-row dequantization.
    Per-batch top-k prune (numpy argpartition) bounds the shuffle to
    ~batches·|probes|·k rows; the window then takes the global top-k.
    Map-side scan, candidate fraction 1.0 BY DESIGN — this is the
    no-index tier for corpora that fit as codes but not as floats;
    LSH/IVF cut the scan, SQ8 cuts the bytes.

    Rows-only at the driver; pytest gates recall vs q12_cosine_topk
    (quantization-noise-limited, ≥0.8 on the random corpus) and exact
    recovery of planted cos≈0.95 neighbors.
    """
    trained = _sq8_train(spark, sf_dir)
    if trained is None:  # empty corpus: empty result, not a crash
        return spark.createDataFrame([], TOPK_SCHEMA)
    lo, scale, pid, pu = trained
    A = pu * scale  # (P, D): probe folded into the quantizer
    b = pu @ lo  # (P,)
    bc = spark.sparkContext.broadcast((A, b, np.asarray(pid, dtype=np.int64)))
    unit = _unit(_corpus(spark, sf_dir), _corpus_size(spark, sf_dir))

    def encode_and_scan(batches):  # pragma: no cover - executed on executors
        import pandas as pd

        A_, b_, pid_ = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            u = np.stack(pdf["u"].map(np.asarray))
            codes = np.clip(np.rint((u - lo) / scale), 0, 255).astype(np.uint8)
            # one GEMM over the uint8 codes per batch (float32 promote)
            s = A_.astype(np.float32) @ codes.T.astype(np.float32) + b_[:, None]
            vec_ids = pdf["vec_id"].to_numpy()
            k = min(TOP_K + 1, s.shape[1])  # +1 absorbs the self-match
            part = np.argpartition(-s, k - 1, axis=1)[:, :k]
            rows = {
                "probe_id": np.repeat(pid_, k),
                "vec_id": vec_ids[part.ravel()],
                "score": np.take_along_axis(s, part, axis=1).ravel().astype(np.float64),
            }
            yield pd.DataFrame(rows)

    scanned = unit.mapInPandas(
        encode_and_scan, "probe_id long, vec_id long, score double"
    ).where(F.col("vec_id") != F.col("probe_id"))
    w = Window.partitionBy("probe_id").orderBy(F.desc("score"), F.asc("vec_id"))
    return (
        scanned.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= TOP_K)
        .select(
            "probe_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round("score", 6).alias("cos_sim"),
            "rank",
        )
    )


def _qd_subset_index(pool: int, max_flips: int) -> "np.ndarray":
    """(S, max_flips) index matrix of all flip subsets of sizes 0..max_flips
    over a pool of ``pool`` margin-sorted bit slots, padded with -1 —
    built once per kernel invocation, shared across all rows."""
    from itertools import combinations

    subs: list[tuple[int, ...]] = [()]
    for depth in range(1, max_flips + 1):
        subs += list(combinations(range(pool), depth))
    idx = np.full((len(subs), max_flips), -1, dtype=np.int64)
    for i, s in enumerate(subs):
        idx[i, : len(s)] = s
    return idx


def _lsh_probe_codes(unit: DataFrame, bc_planes, budget: int) -> DataFrame:
    """(vec_id, u) → (vec_id, table_id, code) PROBE rows: for each
    (vector, table), the ``budget`` query-directed bucket variants
    (margin-ranked flip subsets — the vectorized corpus-side analogue of
    ``_query_directed_masks``; same scoring, batched in numpy across the
    whole Arrow batch instead of per-row Python).  Emits budget rows per
    (vector, table) — the same row volume as uniform Hamming-1
    explosion at budget = bits+1, but aimed at the buckets a near-dup
    is actually likely to land in.  Map-side only, like _lsh_codes."""

    def probe(batches):  # pragma: no cover - executed on executors
        import pandas as pd

        planes = bc_planes.value  # (T, B, D)
        tables, bits, _ = planes.shape
        pool = min(bits, QD_CORPUS_POOL_BITS)
        max_flips = min(QD_MAX_FLIPS, pool)
        idx = _qd_subset_index(pool, max_flips)  # (S, max_flips)
        n_sub = len(idx)
        take = min(budget, n_sub)
        weights = (1 << np.arange(bits)).astype(np.int64)
        for pdf in batches:
            if not len(pdf):
                continue
            u = np.stack(pdf["u"].map(np.asarray))
            m = len(u)
            frames = []
            for t in range(tables):
                z = u @ planes[t].T  # (m, bits)
                codes = ((z >= 0) @ weights).astype(np.int64)
                az = np.abs(z)
                order = np.argsort(az, axis=1)[:, :pool]  # (m, pool)
                az_low = np.take_along_axis(az, order, axis=1)
                bit_low = (1 << order.astype(np.int64))  # (m, pool)
                scores = np.zeros((m, n_sub))
                masks = np.zeros((m, n_sub), dtype=np.int64)
                for j in range(max_flips):
                    col = idx[:, j]
                    valid = col >= 0
                    scores[:, valid] += az_low[:, col[valid]]
                    masks[:, valid] |= bit_low[:, col[valid]]
                sel = np.argpartition(scores, take - 1, axis=1)[:, :take]
                var_codes = codes[:, None] ^ np.take_along_axis(masks, sel, axis=1)
                frames.append(
                    pd.DataFrame(
                        {
                            "vec_id": np.repeat(pdf["vec_id"].to_numpy(), take),
                            "table_id": np.int32(t),
                            "code": var_codes.ravel(),
                        }
                    )
                )
            yield pd.concat(frames)

    return unit.mapInPandas(probe, "vec_id long, table_id int, code long")


PQ_M = 16  # subquantizers → PQ_M bytes per coded vector (32× vs float64[64])
PQ_KS = 256  # codes per subquantizer (1 byte)
PQ_ITERS = 10
PQ_REFINE_R = 6 * TOP_K  # ADC shortlist size re-ranked at full precision


def _pq_train(resid: "np.ndarray", m: int, ks: int) -> "np.ndarray":
    """(m, ks, dim/m) PQ codebooks via per-subspace Lloyd's k-means on
    RESIDUALS (vector − its coarse centroid, the IVFADC construction of
    Jégou, Douze & Schmid, PAMI 2011).  Deterministic (seed 100+m per
    subspace); runs on the same bounded driver-side sample as the
    coarse quantizer — training cost is corpus-size-independent."""
    d = resid.shape[1] // m
    books = []
    for mi in range(m):
        sub = resid[:, mi * d : (mi + 1) * d]
        rng = np.random.RandomState(100 + mi)
        cb = sub[rng.choice(len(sub), min(ks, len(sub)), replace=False)].copy()
        for _ in range(PQ_ITERS):
            # argmin ||s-c||² = argmin (||c||² − 2 s·c): one GEMM per
            # iteration instead of an (n, ks, d) broadcast tensor
            a = ((cb * cb).sum(1)[None, :] - 2.0 * (sub @ cb.T)).argmin(1)
            # per-dim bincount beats np.add.at ~10× (add.at's buffered
            # fancy indexing is the hidden cost of vectorized Lloyd)
            counts = np.bincount(a, minlength=len(cb))
            sums = np.stack(
                [
                    np.bincount(a, weights=sub[:, j], minlength=len(cb))
                    for j in range(d)
                ],
                axis=1,
            )
            nz = counts > 0
            cb[nz] = sums[nz] / counts[nz, None]
        books.append(cb)
    return np.stack(books)


def pq_encode(spark: SparkSession, unit: DataFrame, cent, books) -> DataFrame:
    """(vec_id, u) → (vec_id, cluster, 16-byte PQ code): the shared
    encode kernel of the in-session IVF-PQ query, the persisted IVF-PQ
    index build, AND its streaming append — one implementation so the
    persisted index is identical to the session tier by construction
    (the cross-gate then only has to pin determinism, not re-derive
    the math)."""
    bc_cent = spark.sparkContext.broadcast(cent)
    bc_books = spark.sparkContext.broadcast(books)
    d_sub = cent.shape[1] // PQ_M

    def encode(batches):  # pragma: no cover - executed on executors
        import pandas as pd

        c, b = bc_cent.value, bc_books.value
        for pdf in batches:
            if not len(pdf):
                continue
            u = np.stack(pdf["u"].map(np.asarray))
            cluster = (u @ c.T).argmax(axis=1)
            resid = u - c[cluster]
            codes = np.empty((len(u), PQ_M), dtype=np.uint8)
            for mi in range(PQ_M):
                sub = resid[:, mi * d_sub : (mi + 1) * d_sub]
                # same GEMM-form argmin as _pq_train (||c||² − 2 s·c)
                codes[:, mi] = (
                    (b[mi] * b[mi]).sum(1)[None, :] - 2.0 * (sub @ b[mi].T)
                ).argmin(1)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "cluster": cluster.astype(np.int32),
                    "code": [r.tobytes() for r in codes],
                }
            )

    return unit.mapInPandas(encode, "vec_id long, cluster int, code binary")


def adc_refine(
    spark: SparkSession,
    cand: DataFrame,
    pid,
    pu,
    cent,
    books,
    unit: DataFrame,
    k: int = TOP_K,
) -> DataFrame:
    """The ADC scoring + full-precision refinement shared by qz12_ivfpq
    and the persisted IVF-PQ index search (one implementation — see
    ``pq_encode``): broadcast per-probe LUTs, score the (probe, code)
    candidate stream at 16 B/vector, shortlist top-PQ_REFINE_R, re-rank
    the shortlist at exact cosine against ``unit`` (the only raw-vector
    touch, O(probes x R) rows)."""
    d_sub = pu.shape[1] // PQ_M
    base_tab = pu @ cent.T  # (P, K)
    luts = np.stack(
        [
            np.stack(
                [
                    pu[i, mi * d_sub : (mi + 1) * d_sub] @ books[mi].T
                    for mi in range(PQ_M)
                ]
            )
            for i in range(len(pu))
        ]
    )  # (P, M, ks)
    order = np.argsort(pid)
    bc_score = spark.sparkContext.broadcast(
        (pid[order], base_tab[order], luts[order])
    )

    def adc(batches):  # pragma: no cover - executed on executors
        import pandas as pd

        spid, sbase, sluts = bc_score.value
        for pdf in batches:
            if not len(pdf):
                continue
            pidx = np.searchsorted(spid, pdf["probe_id"].to_numpy())
            codes = np.frombuffer(
                b"".join(pdf["code"]), dtype=np.uint8
            ).reshape(len(pdf), PQ_M)
            score = sbase[pidx, pdf["cluster"].to_numpy()] + sluts[
                pidx[:, None], np.arange(PQ_M)[None, :], codes
            ].sum(axis=1)
            yield pd.DataFrame(
                {
                    "probe_id": pdf["probe_id"],
                    "neighbor_id": pdf["vec_id"],
                    "adc_score": score,
                }
            )

    scored = cand.mapInPandas(adc, "probe_id long, neighbor_id long, adc_score double")
    w_adc = Window.partitionBy("probe_id").orderBy(
        F.desc("adc_score"), F.asc("neighbor_id")
    )
    shortlist = (
        scored.withColumn("_r", F.row_number().over(w_adc))
        .where(F.col("_r") <= PQ_REFINE_R)
        .select("probe_id", "neighbor_id")
    )
    probe_df = spark.createDataFrame(
        [(int(p), [float(x) for x in v]) for p, v in zip(pid, pu)],
        "probe_id long, pu array<double>",
    )
    refined = (
        unit.select(F.col("vec_id").alias("neighbor_id"), "u")
        .join(
            F.broadcast(shortlist.join(F.broadcast(probe_df), "probe_id")),
            "neighbor_id",
        )
        .withColumn("cos_sim", V.dot(F.col("pu"), F.col("u")))
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        refined.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select(
            "probe_id",
            "neighbor_id",
            F.round("cos_sim", 6).alias("cos_sim"),
            "rank",
        )
    )


def ivfpq_candidates(spark: SparkSession, sf_dir: str):
    """IVF-PQ candidate stream + trained quantizers: (cand, pid, pu,
    cent, books).  ``cand`` carries (probe_id, vec_id, cluster, 16-byte
    code).  Built on :func:`_ivf_train`, so candidate MEMBERSHIP is
    structurally identical to ``ivf_candidates`` (same sample,
    quantizer seed, probe set and nprobe by shared code, not by
    copy-paste discipline) — PQ only changes how candidates are
    SCORED.  The membership identity is additionally gated on real
    data by the pytest membership test."""
    trained = _ivf_train(spark, sf_dir)
    if trained is None:  # empty corpus: caller returns empty result
        return None
    unit, sample, x, cent, pid_l, pu, top_clusters = trained
    books = _pinned_blas(
        _pq_train, x - cent[(x @ cent.T).argmax(1)], PQ_M, PQ_KS
    )
    encoded = pq_encode(spark, unit, cent, books)

    pid = np.array(pid_l)
    probe_buckets = spark.createDataFrame(
        [(int(p), int(c)) for p, row in zip(pid, top_clusters) for c in row],
        "probe_id long, cluster int",
    )
    cand = encoded.join(F.broadcast(probe_buckets), "cluster").where(
        F.col("vec_id") != F.col("probe_id")
    )
    return cand, pid, pu, cent, books


@query("qz12_ivfpq", oracle=None)
def qz12_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k via IVF-PQ with asymmetric distance computation
    — the MEMORY-BOUNDED ANN tier (Jégou, Douze & Schmid, PAMI 2011):
    each corpus vector is stored as a cluster id + PQ_M one-byte
    subspace codes (16 bytes vs 512 for float64[64] — 32×), and probe
    scoring reads ONLY those codes: adc(p, v) = ⟨p, centroid(v)⟩ +
    Σ_m LUT_p[m][code_v[m]], with the per-probe LUTs (probes × 16 × 256
    doubles) precomputed driver-side and broadcast.  The candidate
    stream carries (probe_id, vec_id, cluster, 16-byte code) — NO raw
    vectors move after encoding, which is the property that matters at
    100 TB: the inverted-list scan is bandwidth-bounded by 16 B/vector,
    and the full-precision corpus is touched zero times per query.

    Same coarse quantizer + nprobe as qz12_ivf (candidate fraction
    ≈9%); what PQ trades is scoring precision.  That loss is then
    bought back with the standard REFINEMENT step (the ADC+R
    construction from the same Jégou line, also Johnson/Douze/Jégou
    arXiv:1702.08734 §3.3): the top-``PQ_REFINE_R`` ADC candidates per
    probe (6×k) are re-scored at full precision against the raw unit
    vectors — fetched by id through ONE corpus scan with a broadcast
    semi-join (P×R skinny rows; in the persisted-index mode the fetch
    is additionally partition-pruned by cluster) — and the final top-k
    ranks on exact cosine.  The bandwidth story is unchanged: the
    inverted-list scan still reads 16 B/vector; full-precision touches
    are O(probes × R), corpus-size-independent.

    Rows-only; pytest gates the recall floor (now at exact-scoring
    IVF's level — the ADC gap closes by construction) and the
    planted-neighbor bar like the other ANN tiers.
    """
    built = ivfpq_candidates(spark, sf_dir)
    if built is None:  # empty corpus: empty result, not a crash
        return spark.createDataFrame([], TOPK_SCHEMA)
    cand, pid, pu, cent, books = built
    # r12: the refinement fetch uses the Arrow-kernel _unit like every
    # other hot ANN path — the no-`n` form re-ran the JVM HOF norm fold
    # over the WHOLE corpus just to serve the P×R shortlist join
    # (measured sf0.1: refine 1.80 → 1.47 s; the fold grows O(n) while
    # the shortlist stays constant, so the gap widens every decade)
    return adc_refine(
        spark, cand, pid, pu, cent, books,
        _unit(_corpus(spark, sf_dir), _corpus_size(spark, sf_dir)),
    )


def embedding_lsh_candidates(
    spark: SparkSession, sf_dir: str, _su: DataFrame | None = None
) -> DataFrame:
    """Distinct (id1, id2) bucket-collision candidates of the LSH-blocked
    near-dup — exposed so the bench reports the scanned pair fraction
    (|candidates| / C(n,2)) beside the operator's recall.

    Probe side is QUERY-DIRECTED (``_lsh_probe_codes``, budget = bits+1
    — the uniform Hamming-1 row volume): measured at sf0.1 (n=2,000,
    bits=12), margin-ranked variants recall 0.239 @ 2.9% of C(n,2) vs
    uniform Hamming-1's 0.126 @ 1.7% — ~1.9× the recall for the same
    probe-row count, because flips spend themselves on near-boundary
    bits where a true near-dup can actually differ.

    Geometry (round 11, VERDICT r10 #9): this tier runs its OWN
    (bits+2, 12 tables) grid instead of the shared ``lsh_params``
    (bits, 4) — narrower buckets recover precision per table, more
    tables recover recall by union.  Swept on the planted clustered
    corpus (n=2,000, 50-doc cos≈0.85 clusters): recall 0.769 @ 4.35%
    of C(n,2) under the old geometry → 0.934 @ 4.63% under this one —
    +0.17 recall for +6% candidates; the 8-table/bits+1 and
    double-budget alternatives all sat ≤0.91 at equal-or-higher
    fraction.  Coding/probing stay map-side GEMMs (3× the plane rows —
    compute-cheap), and candidate volume — the number that matters at
    100 TB — is pinned by the published fraction."""
    corpus = _corpus(spark, sf_dir)
    n = _corpus_size(spark, sf_dir)
    base_bits, _, _ = lsh_params(n)
    bits = min(LSH_MAX_BITS, base_bits + 2)
    tables = EMB_NEARDUP_LSH_TABLES
    planes = _lsh_planes(bits, tables, DIM)
    bc_planes = spark.sparkContext.broadcast(planes)
    # DELIBERATE double compute: build and probe sides each rescan +
    # re-GEMM the corpus.  The alternative — materializing one tagged
    # code stream and self-joining — does NOT save work without a
    # persist (Spark re-executes both branches of a self-join), and
    # persisting a corpus-scale intermediate is the wrong trade at
    # 100 TB (the map-side GEMM is cheaper to recompute than an
    # n×tables×budget-row cache is to hold); cf. the measured
    # no-persist finding in operators/dedup._shingles.
    # r13: the REGISTRY caller passes a materialized ``_su`` so the
    # normalize kernel runs once across all four of its consumers (the
    # two code passes here + the re-rank sides); standalone callers
    # (the bench's candidate_fraction probe) keep the recompute shape.
    su = _su if _su is not None else _unit(corpus, n)
    coded = _lsh_codes(su, bc_planes)
    probe = _lsh_probe_codes(su, bc_planes, budget=bits + 1)
    # Query-directed variant sets are ASYMMETRIC (each vector flips its
    # own low-margin bits), so a pair may collide in only one probe
    # direction — canonicalize with least/greatest instead of the
    # `a < b` filter that symmetric Hamming-1 variants allowed (that
    # filter silently discarded ~40% of the qd collisions: measured
    # recall 0.163 with it vs 0.239 without, at n=2,000 sf0.1).
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


@query("qz11_embedding_neardup_lsh", oracle=None)
def qz11_embedding_neardup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate embedding near-dup: the LSH pre-blocker scale path the
    exact GEMM grid's docstring promises (q11_embedding_neardup step 3) —
    instead of the inherent B·(B+1)/2 all-pairs grid, pairs are generated
    only WITHIN hyperplane buckets and then exactly re-ranked, dropping
    the work to near-diagonal when approximate recall is acceptable.

    Shape: corpus coded map-side (reuses ``_lsh_codes``, corpus-derived
    ``lsh_params``), Hamming-1 multiprobe via variant-explosion on ONE
    side of the self-join, bucket-equi self-join on (table_id, code) —
    a hash shuffle whose hot buckets AQE's skew split handles — then a
    distinct over id PAIRS and an exact cosine re-rank.  Every emitted
    pair is exact (re-rank), so precision is 1.0 by construction; recall
    is what the bucketing trades (pytest-gated: subset-of-exact on the
    random testdata, ≥9/10 planted cos≈0.95 duplicates found on the
    clustered corpus).  At 100 TB: candidate volume is Σ per-bucket n²
    instead of n² — with √n-scaled bits the expected bucket stays O(1),
    and the corpus text/vectors are never shuffled, only (id, code)
    pairs and the final candidate ids.

    Crossover note (measured, sf0.1): at n=2,000 this runs ~3.8 s vs the
    exact grid's ~3.1 s — the 4-table coding pass is fixed overhead and
    the "grid" it avoids is only 2×2 blocks at this n.  The win scales
    as n²/n: at n=1 M the exact grid is ~977² ≈ 477k block pairs while
    this path's candidate volume stays ~bucket-occupancy-bounded; the
    operator exists for that regime, the oracle-scale timing is not the
    signal.
    """
    corpus = _corpus(spark, sf_dir)
    n = _corpus_size(spark, sf_dir)
    # r13 (VERDICT r12 #8): materialize the unit-vector table ONCE —
    # it feeds FOUR branches (the coded/probe GEMM passes inside the
    # candidate join + both re-rank join sides), every one behind a
    # broadcast or opaque-kernel boundary that defeats subplan reuse,
    # so the normalize kernel (and its corpus scan) executed 4× per
    # run.  Cap-gated like the dedup family: executor-local under
    # LOCAL_MAT_CAP_BYTES, parquet scratch over it.
    from frizzle_spark.operators.dedup import materialize_fanout

    unit = materialize_fanout(_unit(corpus, n), n * (24 + DIM * 8))
    cand = embedding_lsh_candidates(spark, sf_dir, _su=unit)
    if GATHER_RERANK_MIN_N < n <= SCORE_BROADCAST_MAX_N:
        # gather-GEMM re-rank (round 11): broadcast the WHOLE unit
        # matrix once (n x dim float64 — 1 GB at the cap, the same
        # budget the join path's two broadcast side tables spent) and
        # score the SKINNY pair stream map-side: two vectorized
        # searchsorted gathers + one einsum row-dot per Arrow batch.
        # Replaces a per-pair 64-element zip_with/aggregate fold that
        # dominated the sf1 wall (measured 62 s -> the join work alone;
        # the arithmetic is ~2 GFLOP numpy does in seconds).  Pairs
        # stay 16 B/row through the shuffle; vectors never move.
        # r13 (VERDICT r12 #8): collect UNSORTED and argsort driver-side
        # — the old orderBy("vec_id") paid a full range-partition
        # exchange + sort just to feed searchsorted, and the to_pylist
        # round-trip materialized n×dim Python floats; both were the
        # variance sources in this query's 2.7-4.2 s spread.  Arrow
        # list flatten + one numpy argsort produce the identical
        # (sorted ids, aligned matrix) pair.
        rows = unit.toArrow()
        ids_raw = rows["vec_id"].to_numpy().astype(np.int64, copy=False)
        u_col = rows["u"].combine_chunks()
        mat_raw = u_col.flatten().to_numpy(zero_copy_only=False).reshape(
            len(ids_raw), -1
        ).astype(np.float64, copy=False)
        order = np.argsort(ids_raw, kind="stable")
        ids_arr = ids_raw[order]
        mat = mat_raw[order]
        bc = spark.sparkContext.broadcast((ids_arr, mat))

        def score(batches):  # pragma: no cover - executed on executors
            import pandas as pd

            ids_b, m = bc.value
            for pdf in batches:
                if not len(pdf):
                    continue
                i1 = np.searchsorted(ids_b, pdf["id1"].to_numpy())
                i2 = np.searchsorted(ids_b, pdf["id2"].to_numpy())
                sims = np.einsum("ij,ij->i", m[i1], m[i2])
                keep = sims >= NEARDUP_THRESHOLD
                if not keep.any():
                    continue
                yield pd.DataFrame(
                    {
                        "id1": pdf["id1"].to_numpy()[keep],
                        "id2": pdf["id2"].to_numpy()[keep],
                        "cos_sim": np.round(sims[keep], 6),
                    }
                )

        return cand.mapInPandas(score, "id1 long, id2 long, cos_sim double")
    # tiny corpora (≤ GATHER_RERANK_MIN_N): the collect+broadcast costs
    # more than it saves — broadcast the side tables and fold JVM-side;
    # over the broadcast budget: plain pair⋈vector joins (AQE picks the
    # strategy) — the side tables are too big to pin on every executor
    u1 = unit.select(F.col("vec_id").alias("id1"), F.col("u").alias("u1"))
    u2 = unit.select(F.col("vec_id").alias("id2"), F.col("u").alias("u2"))
    if n <= GATHER_RERANK_MIN_N:
        u1, u2 = F.broadcast(u1), F.broadcast(u2)
    sim = V.dot(F.col("u1"), F.col("u2"))
    return (
        cand.join(u1, "id1")
        .join(u2, "id2")
        .withColumn("sim_raw", sim)
        .where(F.col("sim_raw") >= NEARDUP_THRESHOLD)
        .select("id1", "id2", F.round("sim_raw", 6).alias("cos_sim"))
    )


SEMDECON_EVAL_N = 100  # eval-set size: the lowest-id vectors stand in
SEMDECON_THRESHOLD = 0.45  # max-eval-cos ≥ τ → contaminated (drop)


@query("qz11_semantic_decontaminate", oracle=None)
def qz11_semantic_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic decontamination: flag corpus embeddings whose cosine to
    ANY eval-set embedding reaches SEMDECON_THRESHOLD — the third
    decontamination tier beside exact-hash blocklisting
    (q11_blocklist_dedup) and n-gram overlap (qz11_decontaminate),
    catching paraphrased/reworded eval leakage that survives both.

    Shape: the eval set is small by nature (benchmarks are thousands of
    rows, not billions), so it broadcasts as ONE numpy matrix and every
    corpus vector scores against it in a map-side Arrow GEMM — zero
    shuffles, zero joins; the corpus is read once and never moves.  At
    100 TB this is embarrassingly parallel and bandwidth-bounded.
    Returns a per-document report (vec_id, max_eval_sim, keep); the
    pipeline use is ``.where("keep")``.  Rows-only; pytest checks the
    report against a driver-side numpy recomputation exactly and plants
    cos≈0.95 eval copies that must be dropped.

    On this corpus (random vectors) τ=0.45 flags the far tail (6 docs
    at sf0.01, 15 at sf0.1 — measured); real eval contamination sits
    near cos≈1 and is unmissable at any sane τ.
    """
    corpus = _corpus(spark, sf_dir)
    eval_rows = (
        corpus.orderBy("vec_id").limit(SEMDECON_EVAL_N).select("vec_id", "v", "nrm").collect()
    )
    E = np.asarray([r["v"] for r in eval_rows]) / np.asarray(
        [[r["nrm"]] for r in eval_rows]
    )
    eval_ids = [int(r["vec_id"]) for r in eval_rows]
    bc_eval = spark.sparkContext.broadcast(E)
    unit = _unit(corpus, _corpus_size(spark, sf_dir)).where(
        ~F.col("vec_id").isin(eval_ids)
    )

    def maxsim(batches):  # pragma: no cover - executed on executors
        import pandas as pd

        ev = bc_eval.value
        for pdf in batches:
            if not len(pdf):
                continue
            u = np.stack(pdf["u"].map(np.asarray))
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "max_eval_sim": (u @ ev.T).max(axis=1),
                }
            )

    rep = unit.mapInPandas(maxsim, "vec_id long, max_eval_sim double")
    # keep is derived from the ROUNDED value so the report is self-
    # consistent: a consumer re-checking the published max_eval_sim
    # against τ gets the same verdict as the flag
    rounded = F.round("max_eval_sim", 6)
    return rep.select(
        "vec_id",
        rounded.alias("max_eval_sim"),
        (rounded < SEMDECON_THRESHOLD).alias("keep"),
    )


def candidate_fractions(spark: SparkSession, sf_dir: str) -> dict[str, float]:
    """Scanned-candidate fraction of each approximate operator, against
    what its brute-force twin scores: |probes|·(n−1) for the top-k tier,
    C(n,2) for the pairwise near-dup tier.  Reported in the bench JSON
    next to recall so speed cannot silently buy itself worse quality."""
    n = _corpus_size(spark, sf_dir)
    topk_denom = N_PROBES * (n - 1)
    pair_denom = n * (n - 1) / 2
    ivf_frac = round(ivf_candidates(spark, sf_dir).count() / topk_denom, 4)
    fracs = {
        "qz12_ann_lsh": round(
            ann_lsh_candidates(spark, sf_dir).count() / topk_denom, 4
        ),
        "qz12_ivf": ivf_frac,
        # STRUCTURALLY ivf's fraction: both candidate streams derive
        # from _ivf_train's shared quantizer/probe set, so membership is
        # identical by construction (PQ changes scoring only) — gated on
        # real data by the pytest membership test, and counting it again
        # here would re-train PQ + re-encode the corpus for nothing
        "qz12_ivfpq": ivf_frac,
        "qz11_embedding_neardup_lsh": round(
            embedding_lsh_candidates(spark, sf_dir).count() / pair_denom, 4
        ),
    }
    try:  # the documents tier — absent on embeddings-only corpora
        from frizzle_spark.operators.dedup import minhash_candidates
        from frizzle_spark.sources.tables import load_table as _lt

        n_docs = _lt(spark, sf_dir, "documents").count()
        fracs["qz11_minhash_lsh"] = round(
            minhash_candidates(spark, sf_dir).count() / (n_docs * (n_docs - 1) / 2),
            4,
        )
    except Exception:
        pass
    return fracs


# ---------------------------------------------------------------------------
# Matryoshka dimension ablation (Kusupati et al., NeurIPS 2022): how much
# exact-search quality survives truncating the embedding to its first
# d' coordinates — the eval a pipeline runs before committing to a
# cheaper dimension budget (MRL-trained embeddings keep most recall at
# d/4; non-MRL embeddings don't — this query measures which kind you
# have).  For each budget, vectors are truncated, RE-normalized, and the
# IDENTICAL tie-inclusive GEMM-grid top-k runs (graph.knn_topk_of — the
# same machinery knn_edges' oracle pins); recall@k is the pair-set
# intersection against the full-dimension ranking, reported as exact
# integer hit counts plus one rational division (deterministic in both
# engines).
#
# Scale: one grid per budget over n·d' packed floats — truncation makes
# the cheap budgets genuinely cheaper (the 8-dim grid moves 1/8 the
# bytes); n_queries is corpus-count, a catalog fact.  Zero-norm
# truncations (possible when the first d' coords are all zero) drop out
# of that budget's candidates and queries on BOTH sides by the same
# nrm > 0 rule.
# ---------------------------------------------------------------------------

MATRYOSHKA_DIMS = (8, 16, 32, 64)
MATRYOSHKA_K = 10
# The recall metric's eval grid is O(n²); past this corpus size the
# registry default AUTO-samples the eval to this many vectors (round 9
# — at sf10 the full 200k grid blew the Arrow allocator mid-bench; the
# round-8 convergence gate already proves the estimate is stable in
# sample size, so a bounded eval IS the operator's contract at scale).
MATRYOSHKA_AUTO_SAMPLE_N = 20_000


def _matryoshka_oracle() -> str:
    k = MATRYOSHKA_K
    budgets = []
    for d in MATRYOSHKA_DIMS:
        budgets.append(f"""
    t{d} AS (
        SELECT vec_id, v[1:{d}] AS t,
               sqrt(list_dot_product(v[1:{d}], v[1:{d}])) AS nrm
        FROM corpus
    ),
    p{d} AS (
        SELECT a.vec_id AS src, b.vec_id AS dst,
               row_number() OVER (
                 PARTITION BY a.vec_id
                 ORDER BY list_dot_product(a.t, b.t) / (a.nrm * b.nrm) DESC,
                          b.vec_id ASC) AS rn
        FROM t{d} a JOIN t{d} b
          ON a.vec_id <> b.vec_id AND a.nrm > 0 AND b.nrm > 0
    ),
    top{d} AS (SELECT src, dst FROM p{d} WHERE rn <= {k})""")
    full = MATRYOSHKA_DIMS[-1]
    unions = []
    for d in MATRYOSHKA_DIMS:
        unions.append(f"""
    SELECT CAST({d} AS BIGINT) AS dims,
           (SELECT count(*) FROM t{full} WHERE nrm > 0) AS n_queries,
           (SELECT CAST(count(*) AS BIGINT)
              FROM top{d} x JOIN top{full} f
                ON f.src = x.src AND f.dst = x.dst) AS hits,
           round((SELECT count(*) FROM top{d} x JOIN top{full} f
                    ON f.src = x.src AND f.dst = x.dst)
                 / ({k}.0 * greatest((SELECT count(*) FROM t{full}
                                      WHERE nrm > 0), 1)), 6) AS recall_at_k""")
    return (
        """
    WITH corpus AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        FROM embeddings WHERE embedding IS NOT NULL
    ),"""
        + ",".join(budgets)
        + "\n"
        + "\n    UNION ALL".join(unions)
    )


def _multi_budget_topk(
    spark: SparkSession, raw: DataFrame, n: int, k: int, budgets: tuple[int, ...]
) -> DataFrame:
    """Tie-inclusive exact top-k for EVERY dimension budget from ONE
    packed-block grid: raw (un-normalized) vectors shuffle once; each
    grid cell slices its matrices to each budget, renormalizes the
    truncated rows in-kernel, and GEMMs — so 4 budgets cost one shuffle
    plus 4 cheap submatrix products instead of 4 independent grids
    (measured 6.3 → ~2.5 s at sf0.1).  Zero-norm truncations drop out
    as queries AND candidates (the nrm > 0 rule).  Returns (dims, src,
    dst) after the same (cos_sim DESC, dst ASC) global window the
    single-budget path uses."""
    from pyspark.sql.window import Window as _W

    packed = _pack_blocks(
        raw.select("vec_id", F.col("v").alias("u")), n, NEARDUP_CHUNK_ROWS
    )
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
    buds = tuple(budgets)

    def local_topk(batches):  # pragma: no cover - executed on executors
        import numpy as np
        import pandas as pd

        def unitize(m, d):
            t = m[:, :d]
            nr = np.sqrt((t * t).sum(axis=1))
            ok = nr > 0
            u = np.zeros_like(t)
            u[ok] = t[ok] / nr[ok, None]
            return u, ok

        def emit(d, ids_q, ids_c, sims, ok_q, out):
            kk = min(k, sims.shape[1])
            if kk == 0:
                return
            thresh = -np.partition(-sims, kk - 1, axis=1)[:, kk - 1 : kk]
            keep = (sims >= thresh) & np.isfinite(sims) & ok_q[:, None]
            rows, cols = np.nonzero(keep)
            out.append(
                pd.DataFrame(
                    {
                        "dims": np.full(len(rows), d, dtype=np.int64),
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
                for d in buds:
                    u1, ok1 = unitize(m1, d)
                    if row.b1 == row.b2:
                        sims = u1 @ u1.T
                        sims[:, ~ok1] = -np.inf
                        np.fill_diagonal(sims, -np.inf)
                        emit(d, ids1, ids1, sims, ok1, out)
                    else:
                        u2, ok2 = unitize(m2, d)
                        sims = u1 @ u2.T
                        s12 = sims.copy()
                        s12[:, ~ok2] = -np.inf
                        emit(d, ids1, ids2, s12, ok1, out)
                        s21 = sims.T.copy()
                        s21[:, ~ok1] = -np.inf
                        emit(d, ids2, ids1, s21, ok2, out)
            if out:
                yield pd.concat(out, ignore_index=True)

    cand = grid.mapInPandas(
        local_topk, schema="dims long, src long, dst long, cos_sim double"
    )
    w = _W.partitionBy("dims", "src").orderBy(F.desc("cos_sim"), F.asc("dst"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("dims", "src", "dst")
    )


SAMPLE_HASH_SEED = 12


def hash_sample(df: DataFrame, id_col: str, frac: float) -> DataFrame:
    """Deterministic per-row hash sample (the qz22_hash_split move): a
    row is in the sample iff xxhash64(seed, id) mod 1e6 < frac·1e6 —
    a pure function of the id, so the sample is reproducible across
    engines/runs and STABLE under corpus growth (new rows join or not;
    existing membership never flips).  No ordering, no RNG state.

    Degenerate fractions (ADVICE r8): frac ≤ 0 is a caller bug —
    raise, never return a silently-empty sample; 0 < frac < 1e-6
    floors the bound at 1 (an ≈1-per-million sample), so a tiny but
    positive request can still select rows instead of none."""
    if frac <= 0.0:
        raise ValueError(f"hash_sample: frac must be > 0, got {frac}")
    if frac >= 1.0:
        return df
    bound = max(1, int(frac * 1_000_000))
    return df.where(
        F.pmod(
            F.xxhash64(F.lit(SAMPLE_HASH_SEED), F.col(id_col)), F.lit(1_000_000)
        )
        < bound
    )


@query("qz12_matryoshka", oracle=_matryoshka_oracle())
def qz12_matryoshka(
    spark: SparkSession, sf_dir: str, sample_n: int | None = None
) -> DataFrame:
    """Exact-search recall@{MATRYOSHKA_K} of dimension-truncated
    embeddings vs the full vectors, per budget: (dims, n_queries, hits,
    recall_at_k).  Fully oracle-backed — hit counts are exact integers
    and the single division is the same rational in both engines.  All
    budgets ride ONE packed-block grid (_multi_budget_topk).

    ``sample_n`` (round 8, VERDICT r7 #8): the recall metric is an
    ESTIMATE whose eval grid is O(n²) — at 100 TB it runs on a
    deterministic hash-sample (``hash_sample``), never the corpus.
    The pytest convergence gate pins the estimator: per-budget recall
    stable within ε across 2× sample sizes.  Round 9: the registry
    default (None) AUTO-samples past ``MATRYOSHKA_AUTO_SAMPLE_N`` —
    the full-corpus grid at sf10 (n=200k) exhausted the Arrow
    allocator; below the threshold (every oracle corpus) None still
    means the exact full-corpus eval."""
    corpus = _corpus(spark, sf_dir)
    n = _corpus_size(spark, sf_dir)
    if sample_n is None and n > MATRYOSHKA_AUTO_SAMPLE_N:
        sample_n = MATRYOSHKA_AUTO_SAMPLE_N
    if sample_n is not None and 0 < sample_n < n:
        corpus = hash_sample(corpus, "vec_id", sample_n / n).localCheckpoint()
        n = corpus.count()
    if n == 0:
        return spark.createDataFrame(
            [], "dims long, n_queries long, hits long, recall_at_k double"
        )
    k = MATRYOSHKA_K
    full_d = MATRYOSHKA_DIMS[-1]
    tk = _multi_budget_topk(
        spark, corpus.select("vec_id", "v"), n, k, MATRYOSHKA_DIMS
    ).localCheckpoint()
    full = tk.where(F.col("dims") == full_d).select("src", "dst")
    n_queries = (
        corpus.where(F.col("nrm") > 0).count()
    )  # catalog fact, bounded collect
    hit_rows = {
        r["dims"]: r["hits"]
        for r in tk.join(full, ["src", "dst"])
        .groupBy("dims")
        .agg(F.count(F.lit(1)).alias("hits"))
        .collect()
    }
    rows = [
        (
            d,
            n_queries,
            int(hit_rows.get(d, 0)),
            round(hit_rows.get(d, 0) / (float(k) * max(n_queries, 1)), 6),
        )
        for d in MATRYOSHKA_DIMS
    ]
    return spark.createDataFrame(
        rows, "dims long, n_queries long, hits long, recall_at_k double"
    )
