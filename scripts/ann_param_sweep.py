"""Offline (numpy) sweep of ANN parameters on the real sf0.1 embeddings.

Simulates exactly what the Spark operators do — random-hyperplane LSH
(multi-table, multiprobe) and IVF (cosine k-means, nprobe) — and prints
recall vs candidate-fraction for a grid of configs, so the corpus-derived
defaults in operators/similarity.py are picked from measurement, not
guesswork (VERDICT r2 'Next round' #2).

Ground truth: exact top-5 cosine neighbors of the 10 lowest-id probes
(same contract as q12_cosine_topk).
"""
from __future__ import annotations

import sys
from itertools import combinations

import duckdb
import numpy as np

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
N_PROBES, TOP_K = 10, 5

rows = duckdb.sql(
    f"SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM '{SF_DIR}/embeddings.parquet' ORDER BY vec_id"
).fetchall()
ids = np.array([r[0] for r in rows])
X = np.array([r[1] for r in rows])
U = X / np.linalg.norm(X, axis=1, keepdims=True)
n = len(ids)

P = U[:N_PROBES]
sims = P @ U.T
for i in range(N_PROBES):
    sims[i, i] = -2
truth = {
    (ids[i], ids[j])
    for i in range(N_PROBES)
    for j in np.argsort(-sims[i])[:TOP_K]
}
neighbor_cos = sorted(sims[i, j] for i in range(N_PROBES) for j in np.argsort(-sims[i])[:TOP_K])
print(f"n={n} dim={X.shape[1]} truth_cos[min/med/max]="
      f"{neighbor_cos[0]:.3f}/{neighbor_cos[len(neighbor_cos)//2]:.3f}/{neighbor_cos[-1]:.3f}")


def lsh_eval(bits: int, tables: int, hamming: int) -> tuple[float, float]:
    """Return (recall, candidate_fraction) for multi-table multiprobe LSH."""
    cand: set[tuple[int, int]] = set()
    for t in range(tables):
        rng = np.random.RandomState(42 + t)
        planes = rng.randn(bits, X.shape[1])
        codes = (U @ planes.T >= 0) @ (1 << np.arange(bits))
        buckets: dict[int, list[int]] = {}
        for idx, c in enumerate(codes):
            buckets.setdefault(int(c), []).append(idx)
        masks = [0]
        if hamming >= 1:
            masks += [1 << j for j in range(bits)]
        if hamming >= 2:
            masks += [(1 << a) | (1 << b) for a, b in combinations(range(bits), 2)]
        for i in range(N_PROBES):
            pc = int(codes[i])
            for m in masks:
                for j in buckets.get(pc ^ m, ()):
                    if j != i:
                        cand.add((ids[i], ids[j]))
    recall = len(cand & truth) / len(truth)
    frac = len(cand) / (N_PROBES * (n - 1))
    return recall, frac


def ivf_eval(k: int, nprobe: int, sample: int = 4096, iters: int = 10) -> tuple[float, float]:
    x = U[: min(sample, n)]
    rng = np.random.RandomState(7)
    cent = x[rng.choice(len(x), k, replace=False)]
    for _ in range(iters):
        assign = (x @ cent.T).argmax(axis=1)
        for c in range(k):
            members = x[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
                cent[c] /= np.linalg.norm(cent[c])
    full_assign = (U @ cent.T).argmax(axis=1)
    top_c = np.argsort(-(P @ cent.T), axis=1)[:, :nprobe]
    cand = {
        (ids[i], ids[j])
        for i in range(N_PROBES)
        for j in np.nonzero(np.isin(full_assign, top_c[i]))[0]
        if j != i
    }
    recall = len(cand & truth) / len(truth)
    frac = len(cand) / (N_PROBES * (n - 1))
    return recall, frac


def lsh_eval_qd(bits: int, tables: int, budget: int) -> tuple[float, float]:
    """(recall, fraction) for QUERY-DIRECTED multiprobe at `budget`
    buckets per (probe, table) — the round-5 probing strategy
    (similarity._query_directed_masks): flip subsets of the lowest-|z|
    bits ranked by summed margin, replacing uniform Hamming enumeration
    at the same bucket count."""
    sys.path.insert(0, "/root/repo")
    from frizzle_spark.operators.similarity import _query_directed_masks

    cand: set[tuple[int, int]] = set()
    for t in range(tables):
        rng = np.random.RandomState(42 + t)
        planes = rng.randn(bits, X.shape[1])
        Z = U @ planes.T
        codes = (Z >= 0) @ (1 << np.arange(bits))
        buckets: dict[int, list[int]] = {}
        for idx, c in enumerate(codes):
            buckets.setdefault(int(c), []).append(idx)
        for i in range(N_PROBES):
            pc = int(codes[i])
            for m in _query_directed_masks(Z[i], budget):
                for j in buckets.get(pc ^ m, ()):
                    if j != i:
                        cand.add((ids[i], ids[j]))
    recall = len(cand & truth) / len(truth)
    frac = len(cand) / (N_PROBES * (n - 1))
    return recall, frac


print("\nLSH (bits, tables, hamming) -> recall / fraction")
for bits in (8, 10, 12, 14):
    for tables in (2, 4, 6, 8):
        for ham in (1, 2):
            r, f = lsh_eval(bits, tables, ham)
            flag = " <==" if f <= 0.10 and r >= 0.46 else ""
            print(f"  B={bits:2d} T={tables} H{ham}: recall={r:.2f} frac={f:.3f}{flag}")

print("\nLSH query-directed (bits, tables, budget=Ham-2 count) -> recall / fraction")
for bits in (10, 12, 14):
    for tables in (2, 4, 6):
        budget = 1 + bits + bits * (bits - 1) // 2
        r, f = lsh_eval_qd(bits, tables, budget)
        print(f"  B={bits:2d} T={tables} qd({budget:3d}): recall={r:.2f} frac={f:.3f}")

print("\nIVF (K, nprobe) -> recall / fraction")
for k in (16, 32, 45, 64, 90):
    for nprobe in (2, 4, 6, 8):
        r, f = ivf_eval(k, nprobe)
        flag = " <==" if f <= 0.10 and r >= 0.64 else ""
        print(f"  K={k:2d} nprobe={nprobe}: recall={r:.2f} frac={f:.3f}{flag}")
