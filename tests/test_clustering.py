"""Numpy-differential gate for the distributed Lloyd k-means operator
(operators/clustering.py): an independent driver-side numpy Lloyd with
the IDENTICAL deterministic init must reproduce the distributed run's
centroid trajectory and final assignments.  Same posture as PageRank's
superstep differential (tests/test_graph.py) — the distributed plan is
only trusted because a 20-line sequential twin agrees.
"""

from __future__ import annotations

import numpy as np
import pytest

from frizzle_spark.operators.clustering import (
    KMEANS_ITERS,
    KMEANS_K,
    kmeans_assign,
)
from frizzle_spark.operators.similarity import _corpus
from frizzle_spark.plans.registry import REGISTRY


def _numpy_lloyd(x: np.ndarray, k: int, n_iter: int):
    cent = x[:k].copy()
    for _ in range(n_iter):
        d2 = (
            (x * x).sum(axis=1)[:, None]
            - 2.0 * (x @ cent.T)
            + (cent * cent).sum(axis=1)[None, :]
        )
        a = np.argmin(d2, axis=1)
        new = cent.copy()
        for j in range(k):
            sel = x[a == j]
            if len(sel):
                new[j] = sel.mean(axis=0)
        cent = new
    d2 = (
        (x * x).sum(axis=1)[:, None]
        - 2.0 * (x @ cent.T)
        + (cent * cent).sum(axis=1)[None, :]
    )
    return np.argmin(d2, axis=1), np.sqrt(np.maximum(d2.min(axis=1), 0.0)), cent


def test_kmeans_matches_numpy_lloyd(spark, sf_dir):
    rows = (
        _corpus(spark, sf_dir).select("vec_id", "v").orderBy("vec_id").collect()
    )
    ids = np.asarray([r["vec_id"] for r in rows])
    x = np.asarray([r["v"] for r in rows], dtype=np.float64)

    want_a, want_d, _ = _numpy_lloyd(x, KMEANS_K, KMEANS_ITERS)

    got = {
        r["vec_id"]: (r["cluster"], r["dist"])
        for r in REGISTRY["qz12_kmeans"].fn(spark, sf_dir).collect()
    }
    assert len(got) == len(ids), "every corpus vector must be assigned"

    # distributed partial sums re-order float addition vs numpy; an
    # assignment may legitimately differ ONLY where the top-2 distance
    # gap is inside that noise
    n_diff = 0
    for i, vid in enumerate(ids):
        cl, dist = got[int(vid)]
        if cl != want_a[i]:
            n_diff += 1
            assert abs(dist - want_d[i]) < 1e-6, (
                f"vec {vid}: cluster {cl} vs {want_a[i]} with distance "
                f"gap {abs(dist - want_d[i])} — not a float-order tie"
            )
        else:
            assert dist == pytest.approx(want_d[i], abs=1e-6)
    assert n_diff <= max(1, len(ids) // 1000), (
        f"{n_diff} assignment mismatches — more than float-order noise"
    )


def test_kmeans_clusters_are_compact_vs_random(spark, sf_dir):
    """Sanity: mean within-cluster distance after Lloyd must beat the
    init-assignment baseline (iteration actually improves the
    objective)."""
    corpus = _corpus(spark, sf_dir)
    final = kmeans_assign(spark, corpus, KMEANS_K, KMEANS_ITERS)
    zero_iter = kmeans_assign(spark, corpus, KMEANS_K, 0)
    mean_final = final.agg({"dist": "avg"}).first()[0]
    mean_init = zero_iter.agg({"dist": "avg"}).first()[0]
    assert mean_final < mean_init, (mean_final, mean_init)
