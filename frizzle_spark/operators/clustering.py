"""Distributed Lloyd k-means over the embedding corpus (round 7).

The IVF tiers (operators/similarity.py) train their coarse quantizer
on a bounded DRIVER-side sample — correct for index building, but the
engine still lacked clustering as a first-class OPERATOR whose
assignment pass runs distributed over the full corpus.  This module is
that operator, Spark-shaped:

* **assignment** (the corpus-sized stage) is one ``mapInPandas`` GEMM
  per iteration — centroids ride to executors as a tiny closure array
  (k×d floats), each Arrow batch scores against all k in one matmul,
  and only (vec_id, cluster) ever leaves Python;
* **update** re-estimates centroids from BOUNDED aggregation state:
  per-batch partial sums (cluster, count, Σv) are emitted from the
  same pass — so the shuffle carries ≤ batches×k skinny rows, never
  vectors per corpus row — then posexplode + groupBy folds them to
  k×d component rows, and the driver collects exactly k×d doubles
  (a CONSTANT, the sanctioned bounded-collect shape) to rebuild the
  centroid array for the next round.

Determinism: init = the k lowest-vec_id unit-agnostic vectors (same
rule as IVF's sample ordering), ties in assignment break to the LOWEST
cluster index (argmin semantics on exact doubles) — which is what the
numpy twin in tests/test_clustering.py replays bit-for-bit.  Empty
clusters keep their previous centroid (the standard Lloyd fallback).

100 TB shape: per iteration exactly one corpus scan, one k×batches
shuffle, one k×d collect; no driver-side loop over data, no
InMemoryRelation pinning (the corpus re-reads from parquet each
round — at scale you point this at the columnar snapshot and the scan
is the cost floor Lloyd always pays).

Reference note: the reference bus has no analytics layer at all
(frizzle.go:97-107); clustering is part of this engine's §2.3
similarity extension tier beside IVF/PQ (Lloyd 1982; MacQueen 1967).
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from frizzle_spark.operators.similarity import _corpus, _corpus_size, _spread
from frizzle_spark.plans.registry import query

KMEANS_K = 8
KMEANS_ITERS = 5


def _init_centroids(corpus: DataFrame, k: int) -> np.ndarray:
    """Deterministic seed: the k lowest-vec_id vectors (bounded collect,
    k rows — same posture as IVF's ordered training sample)."""
    rows = corpus.select("vec_id", "v").orderBy("vec_id").limit(k).collect()
    return np.asarray([r["v"] for r in rows], dtype=np.float64)


def kmeans_assign(
    spark: SparkSession,
    corpus: DataFrame,
    k: int = KMEANS_K,
    n_iter: int = KMEANS_ITERS,
) -> DataFrame:
    """Lloyd iterations over ``corpus`` (vec_id, v) → final (vec_id,
    cluster, dist) assignments.  See module docstring for the plan
    shape per round."""
    cent = _init_centroids(corpus, k)
    if cent.size == 0:  # empty corpus: nothing to assign, nothing to fit
        return spark.createDataFrame(
            [], "vec_id long, cluster long, dist double"
        )
    d = cent.shape[1]
    # mapInPandas is opaque to Catalyst: every column of its input is
    # computed AND shipped through Arrow.  The _corpus frame callers
    # hand us carries nrm — a per-row 64-element JVM aggregate fold
    # (~300 µs/row, the HOF-whale shape _unit's docstring documents) —
    # that Lloyd never reads.  Prune to exactly what the kernels use,
    # per iteration (guide-§4 column discipline; measured at sf0.1 the
    # update rounds drop ~40% of their wall).
    update_in = corpus.select("v")
    assign_in = corpus.select("vec_id", "v")

    for _ in range(n_iter):
        c = cent  # bind the current round's array into the closure

        def partials(batches, _c=c):
            import pandas as pd

            for pdf in batches:
                m = np.asarray(
                    [np.asarray(x, dtype=np.float64) for x in pdf["v"]]
                )
                # ‖x−c‖² = ‖x‖² − 2x·c + ‖c‖²; ‖x‖² is per-row constant,
                # so argmin over (−2x·c + ‖c‖²) suffices — one GEMM.
                scores = -2.0 * (m @ _c.T) + (_c * _c).sum(axis=1)[None, :]
                a = np.argmin(scores, axis=1)  # ties → lowest index
                out = []
                for j in np.unique(a):
                    sel = m[a == j]
                    out.append(
                        {
                            "cluster": int(j),
                            "cnt": int(sel.shape[0]),
                            "s": sel.sum(axis=0).tolist(),
                        }
                    )
                yield pd.DataFrame(out)

        folded = (
            update_in.mapInPandas(
                partials, schema="cluster int, cnt long, s array<double>"
            )
            .select(
                "cluster", "cnt", F.posexplode("s").alias("pos", "val")
            )
            .groupBy("cluster", "pos")
            .agg(
                F.sum("cnt").alias("n"),
                F.sum("val").alias("sv"),
            )
            .collect()  # exactly k×d rows — bounded by construction
        )
        new = cent.copy()  # empty clusters keep their previous centroid
        counts = np.zeros(k, dtype=np.int64)
        sums = np.zeros((k, d), dtype=np.float64)
        for r in folded:
            # every (cluster, pos) row carries the same cluster count
            counts[r["cluster"]] = r["n"]
            sums[r["cluster"], r["pos"]] = r["sv"]
        for j in range(k):
            if counts[j] > 0:
                new[j] = sums[j] / counts[j]
        cent = new

    final = cent

    def assign(batches, _c=final):
        import pandas as pd

        for pdf in batches:
            m = np.asarray([np.asarray(x, dtype=np.float64) for x in pdf["v"]])
            d2 = (
                (m * m).sum(axis=1)[:, None]
                - 2.0 * (m @ _c.T)
                + (_c * _c).sum(axis=1)[None, :]
            )
            a = np.argmin(d2, axis=1)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy(),
                    "cluster": a.astype("int64"),
                    "dist": np.sqrt(np.maximum(d2[np.arange(len(a)), a], 0.0)),
                }
            )

    return assign_in.mapInPandas(
        assign, schema="vec_id long, cluster long, dist double"
    ).select("vec_id", "cluster", F.round("dist", 6).alias("dist"))


@query("qz12_kmeans")
def qz12_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Lloyd k-means ({KMEANS_K} clusters, {KMEANS_ITERS}
    iterations) over the embedding corpus; rows-only at the driver,
    numpy-differential-gated in tests/test_clustering.py (identical
    init → identical assignments and centroids to 1e-9).

    Round 12: the corpus is pruned to (vec_id, v) BEFORE entering the
    kernels (mapInPandas is opaque — the nrm HOF fold was computed and
    shipped per iteration for nothing) and `_spread` joins the same
    split-bound fix the rest of the GEMM family got in r11: a local
    single-file corpus scans as 1-2 splits and every Lloyd round's GEMM
    was pinned there; on a cluster the spread is a no-op."""
    corpus = _corpus(spark, sf_dir).select("vec_id", "v")
    return kmeans_assign(spark, _spread(corpus, _corpus_size(spark, sf_dir)))
