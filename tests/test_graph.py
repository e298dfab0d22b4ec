"""Graph-analytics gates: the kNN graph is oracle-swept automatically
(test_relational.test_oracle_match); here we pin PageRank against a
numpy power iteration running the IDENTICAL supersteps, plus structural
invariants on synthetic graphs (hub centrality, dangling-mass
redistribution, stochasticity)."""

from __future__ import annotations

import numpy as np

from frizzle_spark.operators.graph import (
    KNN_K,
    PR_DAMPING,
    PR_ITERS,
    knn_edges,
    pagerank,
)


def _numpy_pagerank(edges, n_iter=PR_ITERS, d=PR_DAMPING, seeds=None):
    """Reference power iteration — same supersteps as operators.graph.
    ``seeds``: optional node set for personalized PageRank (teleport +
    dangling mass on seeds∩nodes, uniform; start from the seed
    distribution)."""
    nodes = sorted({s for s, _ in edges} | {t for _, t in edges})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    deg = np.zeros(n)
    for s, _ in edges:
        deg[idx[s]] += 1
    w = np.full(n, 1.0 / n)
    if seeds is not None:
        inset = [v for v in nodes if v in seeds]
        w = np.zeros(n)
        for v in inset:
            w[idx[v]] = 1.0 / len(inset)
    r = w.copy()
    for _ in range(n_iter):
        dangling = r[deg == 0].sum()
        c = np.zeros(n)
        for s, t in edges:
            c[idx[t]] += r[idx[s]] / deg[idx[s]]
        r = (1 - d) * w + d * (c + dangling * w)
    return {v: r[idx[v]] for v in nodes}


def test_pagerank_matches_numpy_on_knn_graph(spark, sf_dir):
    # co_partition=False pins the DISTRIBUTED supersteps (the AUTO path
    # takes the r12 driver-local tier at this scale; its identity with
    # the distributed path is gated separately below)
    e = knn_edges(spark, sf_dir)
    pairs = [(r["src"], r["dst"]) for r in e.select("src", "dst").collect()]
    want = _numpy_pagerank(pairs)
    got = {r["node"]: r["rank"] for r in pagerank(e, co_partition=False).collect()}
    assert set(got) == set(want)
    worst = max(abs(got[v] - want[v]) for v in want)
    assert worst < 1e-12, f"max |spark - numpy| = {worst:.3e}"
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_ppr_matches_numpy_on_knn_graph(spark, sf_dir):
    """Personalized PageRank differential: identical supersteps, same
    label-0 teleport vector, on the real kNN edges."""
    from pyspark.sql import functions as F

    from frizzle_spark.operators.graph import PPR_SEED_LABEL, pagerank
    from frizzle_spark.sources.tables import load_table

    e = knn_edges(spark, sf_dir)
    pairs = [(r["src"], r["dst"]) for r in e.select("src", "dst").collect()]
    seeds = {
        r["vec_id"]
        for r in load_table(spark, sf_dir, "embeddings")
        .where(F.col("label") == PPR_SEED_LABEL)
        .collect()
    }
    want = _numpy_pagerank(pairs, seeds=seeds)
    seed_df = spark.createDataFrame(
        [(int(s),) for s in sorted(seeds)], "node long"
    )
    got = {
        r["node"]: r["rank"]
        for r in pagerank(e, teleport=seed_df, co_partition=False).collect()
    }
    assert set(got) == set(want)
    worst = max(abs(got[v] - want[v]) for v in want)
    assert worst < 1e-12, f"max |spark - numpy| = {worst:.3e}"
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_pagerank_local_tier_identity(spark, sf_dir):
    """The r12 driver-local power-iteration tier (AUTO under
    PR_LOCAL_EDGE_CAP) must match the distributed supersteps on the
    real kNN graph: same node set, <1e-12 numerically, and EXACTLY
    equal after the 9dp rounding both registry consumers apply — the
    same standard as the union-find/fixpoint cluster tier gates."""
    from pyspark.sql import functions as F

    from frizzle_spark.operators.graph import PPR_SEED_LABEL, _pagerank_local
    from frizzle_spark.sources.tables import load_table

    e = knn_edges(spark, sf_dir).select("src", "dst").localCheckpoint()
    seeds = (
        load_table(spark, sf_dir, "embeddings")
        .where(F.col("label") == PPR_SEED_LABEL)
        .select(F.col("vec_id").alias("node"))
    )
    for tele in (None, seeds):
        local = {
            r["node"]: r["rank"]
            for r in _pagerank_local(
                spark, e, PR_DAMPING, PR_ITERS, tele
            ).collect()
        }
        dist = {
            r["node"]: r["rank"]
            for r in pagerank(e, teleport=tele, co_partition=False).collect()
        }
        assert set(local) == set(dist)
        worst = max(abs(local[v] - dist[v]) for v in dist)
        assert worst < 1e-12, f"max |local - distributed| = {worst:.3e}"
        assert {v: round(x, 9) for v, x in local.items()} == {
            v: round(x, 9) for v, x in dist.items()
        }


def test_ppr_seeds_outrank_far_periphery(spark):
    """Two outward chains: seeding one chain's head must put ALL rank
    mass on the seeded component (teleport + dangling return both land
    on seeds, and nothing points into chain B) — rank is proximity to
    the seeds, not global centrality.  (Intra-chain ordering is NOT
    asserted: with fixed finite supersteps mass travels the chain in
    waves; the numpy differential above pins the exact values.)"""
    from frizzle_spark.operators.graph import pagerank

    # chain A: 1->2->3->4->5 (diffusion path from the seed), chain B same
    edges = [(i, i + 1) for i in range(1, 5)] + [(i, i + 1) for i in range(11, 15)]
    e = spark.createDataFrame(edges, "src long, dst long")
    seed_df = spark.createDataFrame([(1,)], "node long")
    got = {r["node"]: r["rank"] for r in pagerank(e, teleport=seed_df).collect()}
    for v in (1, 2, 3, 4, 5):
        assert got[v] > 0.0
    for v in (11, 12, 13, 14, 15):
        assert got[v] == 0.0  # exactly: no teleport, no inbound path
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_knn_index_identity_with_direct_path(spark, sf_dir):
    """The per-process scratch kNN index (what qz12_knn_graph and
    qz25_pagerank serve from) must be row-identical to the direct
    block-GEMM path — mirror of the persisted-IVF and cluster-index
    identity gates."""
    from frizzle_spark.operators.graph import _cached_knn_edges

    direct = {tuple(r) for r in knn_edges(spark, sf_dir).collect()}
    cached = {tuple(r) for r in _cached_knn_edges(spark, sf_dir).collect()}
    assert direct == cached and len(direct) > 0


def test_pagerank_hub_beats_periphery(spark):
    """Star + chain: the hub every spoke points at must out-rank every
    spoke, and a two-hop feeder chain ranks between."""
    edges = [(i, 0) for i in range(1, 8)] + [(100, 1), (101, 100)]
    e = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["rank"] for r in pagerank(e).collect()}
    assert got[0] == max(got.values())
    assert got[1] > got[101]  # fed spoke beats unfed feeder
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_pagerank_dangling_mass_redistributed(spark):
    """Node 0 is dangling (no out-edges).  Its mass must re-spread, not
    vanish: Σrank stays 1 and the numpy twin agrees exactly."""
    edges = [(1, 0), (2, 0), (1, 2), (2, 1)]
    e = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["rank"] for r in pagerank(e).collect()}
    want = _numpy_pagerank(edges)
    assert abs(sum(got.values()) - 1.0) < 1e-12
    for v in want:
        assert abs(got[v] - want[v]) < 1e-12, (v, got[v], want[v])


def test_knn_graph_degree_invariant(spark, sf_dir):
    """Every corpus vector emits exactly k edges with ranks 1..k (the
    corpus is larger than k everywhere), and no self-loops."""
    rows = knn_edges(spark, sf_dir).collect()
    by_src = {}
    for r in rows:
        assert r["src"] != r["dst"]
        by_src.setdefault(r["src"], []).append(r["rank"])
    for src, ranks in by_src.items():
        assert sorted(ranks) == list(range(1, KNN_K + 1)), (src, ranks)


def test_pagerank_co_partition_identity(spark):
    """The co_partition=True scale path (pre-partitioned e/nd captured
    through AQE-off localCheckpoint; one exchange per superstep) must
    produce the same ranks as the default adaptive path, and the AQE
    flag must be restored afterwards."""
    edges = [(i, (i * 7) % 23) for i in range(60) if i != (i * 7) % 23] + [
        (100, 1),
        (101, 100),
    ]
    e = spark.createDataFrame(edges, "src long, dst long")
    aqe_before = spark.conf.get("spark.sql.adaptive.enabled")
    got_default = {
        r["node"]: r["rank"] for r in pagerank(e, co_partition=False).collect()
    }
    got_cp = {
        r["node"]: r["rank"] for r in pagerank(e, co_partition=True).collect()
    }
    assert spark.conf.get("spark.sql.adaptive.enabled") == aqe_before
    assert set(got_cp) == set(got_default)
    worst = max(abs(got_cp[v] - got_default[v]) for v in got_default)
    assert worst < 1e-12, f"max |co_partition - default| = {worst:.3e}"


def test_pagerank_auto_switch_one_exchange_per_superstep(spark):
    """Round-8 scale gate (VERDICT r7 #1): with the broadcast threshold
    forced below the node-table estimate — the 'node table outgrew
    broadcast range' regime a forced-large graph would hit — the AUTO
    default must (a) pick the co-partitioned mode, (b) plan exactly ONE
    distinct shuffle exchange in the superstep (the groupBy(dst) message
    aggregation; dmass's duplicated print of the same exchange dedups by
    expr-id and AQE reuses it at runtime), and (c) produce ranks
    identical to the adaptive default path (<1e-12)."""
    edges = [(i, (i * 7) % 23) for i in range(60) if i != (i * 7) % 23] + [
        (100, 1),
        (101, 100),
    ]
    e = spark.createDataFrame(edges, "src long, dst long")
    want = {r["node"]: r["rank"] for r in pagerank(e, co_partition=False).collect()}

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1k")
    try:
        probe = {}
        got = {
            r["node"]: r["rank"] for r in pagerank(e, _probe=probe).collect()
        }
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    assert probe["co_partition"] is True, probe
    plan = probe["superstep_plan"]
    # dmass re-prints contrib's subtree with fresh expr-ids (self-join
    # dedup); canonically it is the SAME exchange and AQE's
    # ReuseExchange collapses it at runtime — so dedup on the
    # expr-id-normalized form, and require every shuffle to be the
    # groupBy(dst) message aggregation (joins exchange-free).
    import re

    raw_shuffles = [
        ln.split("Exchange", 1)[1].strip()
        for ln in plan.splitlines()
        if "Exchange hashpartitioning" in ln
    ]
    assert raw_shuffles and all(
        s.startswith("hashpartitioning(dst") for s in raw_shuffles
    ), f"non-aggregation shuffle in superstep:\n" + "\n".join(raw_shuffles)
    distinct_shuffles = {
        re.sub(r"#\d+L?|plan_id=\d+", "#", s) for s in raw_shuffles
    }
    assert len(distinct_shuffles) == 1, (
        f"superstep planned {len(distinct_shuffles)} distinct shuffles:\n"
        + "\n".join(sorted(distinct_shuffles))
    )
    assert set(got) == set(want)
    worst = max(abs(got[v] - want[v]) for v in want)
    assert worst < 1e-12, f"max |auto - adaptive| = {worst:.3e}"

    # and at bench scale (threshold untouched, small n) auto stays on
    # the adaptive path — the registry outputs are byte-identical
    probe_small = {}
    pagerank(e, n_iter=1, _probe=probe_small)
    assert probe_small["co_partition"] is False, probe_small


def test_knn_graph_tie_inclusive_local_topk(spark):
    """Duplicate embeddings create exact cosine ties at the kth slot;
    the local per-cell selection must forward ALL tied candidates so the
    global (cos_sim DESC, dst ASC) window keeps the smallest dst —
    verified against a numpy brute force with the same tie order."""
    import numpy as np
    import os
    import tempfile

    rng = np.random.default_rng(7)
    base = rng.normal(size=(40, 8))
    # 10 exact duplicate groups of 4 → every query's top-3 is all ties
    vecs = np.repeat(base[:10], 4, axis=0)
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(len(vecs))]
    with tempfile.TemporaryDirectory() as td:
        spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        ).write.parquet(os.path.join(td, "embeddings.parquet"))
        got = knn_edges(spark, td).collect()
    unit = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = unit @ unit.T
    np.fill_diagonal(sims, -np.inf)
    for src in range(len(vecs)):
        order = sorted(
            range(len(vecs)),
            key=lambda j: (-round(sims[src, j], 9), j),
        )[:KNN_K]
        got_dsts = [r["dst"] for r in sorted(
            (g for g in got if g["src"] == src), key=lambda g: g["rank"]
        )]
        assert got_dsts == order, (src, got_dsts, order)


def test_static_plan_checkpoint_captures_partitioning(spark):
    """The mechanism behind co_partition: under AQE, localCheckpoint
    records UnknownPartitioning (layout silently lost); inside the
    _static_plan scope it records the real hashpartitioning, and a join
    of two co-partitioned checkpoints plans ZERO exchanges."""
    from pyspark.sql import functions as F

    from frizzle_spark.operators.graph import _static_plan

    df = spark.range(10_000).select(
        (F.col("id") % 970).alias("src"), F.col("id").alias("dst")
    )
    lost = df.repartition("src").localCheckpoint()
    assert "hashpartitioning" not in (
        lost._jdf.queryExecution().executedPlan().outputPartitioning().toString()
    )
    with _static_plan(spark):
        e = df.repartition("src").localCheckpoint()
        nd = (
            spark.range(970)
            .select(F.col("id").alias("node"))
            .repartition("node")
            .localCheckpoint()
        )
    assert "hashpartitioning(src" in (
        e._jdf.queryExecution().executedPlan().outputPartitioning().toString()
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = nd.join(e, nd["node"] == e["src"])
        plan = j._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "Exchange hashpartitioning" not in plan, plan[:400]


# ---------------------------------------------------------------------------
# Label propagation (synchronous LPA)
# ---------------------------------------------------------------------------


def _lpa_numpy(edges: list[tuple[int, int]], n_iter: int) -> dict[int, int]:
    """Pure-python twin of label_propagation: symmetrize, then
    synchronous plurality updates with (count DESC, label ASC) ties."""
    sym = set()
    for s, d in edges:
        sym.add((s, d))
        sym.add((d, s))
    nodes = sorted({s for s, _ in sym})
    nbrs: dict[int, list[int]] = {n: [] for n in nodes}
    for s, d in sym:
        nbrs[d].append(s)  # message flows src -> dst
    labels = {n: n for n in nodes}
    for _ in range(n_iter):
        new = {}
        for n in nodes:
            counts: dict[int, int] = {}
            for m in nbrs[n]:
                counts[labels[m]] = counts.get(labels[m], 0) + 1
            if counts:
                new[n] = min(
                    counts, key=lambda lab: (-counts[lab], lab)
                )
            else:
                new[n] = labels[n]
        labels = new
    return labels


def test_lpa_matches_python_twin_on_knn_graph(spark, sf_dir):
    from frizzle_spark.operators.graph import (
        LPA_ITERS,
        _cached_knn_edges,
        label_propagation,
    )

    edges = [
        (r["src"], r["dst"])
        for r in _cached_knn_edges(spark, sf_dir).select("src", "dst").collect()
    ]
    want = _lpa_numpy(edges, LPA_ITERS)
    got = {
        r["node"]: r["community"]
        for r in label_propagation(
            _cached_knn_edges(spark, sf_dir)
        ).collect()
    }
    assert got == want


def test_lpa_separates_planted_cliques(spark):
    from frizzle_spark.operators.graph import label_propagation

    # two 6-cliques joined by ONE bridge edge: LPA must give each clique
    # a single internal community and not merge them through the bridge
    edges = []
    for base in (0, 10):
        for i in range(6):
            for j in range(i + 1, 6):
                edges.append((base + i, base + j))
    edges.append((5, 10))  # bridge
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["community"] for r in label_propagation(df).collect()}
    a = {got[i] for i in range(6)}
    b = {got[i] for i in range(10, 16)}
    assert len(a) == 1 and len(b) == 1 and a != b


def test_lpa_deterministic_across_runs(spark, sf_dir):
    from frizzle_spark.plans.registry import REGISTRY

    r1 = sorted(
        map(tuple, REGISTRY["qz25_communities"].fn(spark, sf_dir).collect())
    )
    r2 = sorted(
        map(tuple, REGISTRY["qz25_communities"].fn(spark, sf_dir).collect())
    )
    assert r1 == r2 and len(r1) > 0


def _clustered_embedding_dir(tmp_path, n_clusters=40, per=100, d=64, seed=9):
    """Clustered synthetic corpus (tight cos≈0.95 clusters) written as a
    file-shaped embeddings.parquet — the corpus where kNN recall is a
    meaningful bar (the random testdata's top-k is a ~0.3-0.4 floor for
    ANY bucketed method; SCALE.md documents the same split for the ANN
    tiers)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.RandomState(seed)
    centers = rng.randn(n_clusters, d)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    vecs = np.repeat(centers, per, axis=0) + 0.03 * rng.randn(n_clusters * per, d)
    n = len(vecs)
    flat = pa.array(vecs.astype(np.float64).ravel(), type=pa.float64())
    off = pa.array(np.arange(0, (n + 1) * d, d, dtype=np.int32))
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.ListArray.from_arrays(off, flat),
        }
    )
    out = str(tmp_path / "knn_clustered")
    os.makedirs(out, exist_ok=True)
    pq.write_table(tbl, os.path.join(out, "embeddings.parquet"))
    return out, n


def test_knn_edges_lsh_recall_vs_exact_clustered(spark, tmp_path):
    """Round-9 gate (VERDICT r8 #1): the LSH-blocked approximate edge
    build must reach ≥0.95 directed-edge recall vs the exact grid on a
    clustered corpus (measured 1.0 at n=4,000), with the identical
    output schema and exact cosine values on every emitted edge (the
    re-rank scores exactly — approximation is candidate coverage
    only)."""
    from frizzle_spark.operators.graph import KNN_EXACT_MAX_N

    d, n = _clustered_embedding_dir(tmp_path)
    assert n <= KNN_EXACT_MAX_N  # the regime where both tiers run
    exact_rows = knn_edges(spark, d, exact=True).collect()
    approx_rows = knn_edges(spark, d, exact=False).collect()
    exact = {(r["src"], r["dst"]): r["cos_sim"] for r in exact_rows}
    approx = {(r["src"], r["dst"]): r["cos_sim"] for r in approx_rows}
    recall = len(set(approx) & set(exact)) / len(exact)
    assert recall >= 0.95, f"directed-edge recall {recall:.3f} < 0.95"
    for pair in set(approx) & set(exact):
        assert approx[pair] == exact[pair], pair  # exact re-rank scores


def test_knn_edges_auto_switch_modes(spark, sf_dir, tmp_path):
    """The auto default must pick the exact (oracle) tier at registry
    scale, and the forced-approx tier must plan NO quadratic grid: no
    nested-loop/cartesian join anywhere, and the candidate set it
    scores stays far below n(n-1) on a clustered corpus."""
    from frizzle_spark.operators.graph import knn_lsh_candidates
    from frizzle_spark.operators.similarity import (
        _corpus,
        _corpus_size,
        _unit,
    )

    probe = {}
    knn_edges(spark, sf_dir, _probe=probe)
    assert probe["exact"] is True  # registry corpora stay on the oracle tier

    d, n = _clustered_embedding_dir(tmp_path, n_clusters=20, per=50)
    probe_lsh = {}
    final_plan = (
        knn_edges(spark, d, exact=False, _probe=probe_lsh)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the exact grid's block-pair join IS nested-loop (b1 <= b2) — its
    # absence in BOTH the candidate subtree (pre-checkpoint, exposed
    # via the probe) and the top-k tail is the no-n²-shuffle statement
    scored_plan = probe_lsh["scored_plan"]
    for plan in (scored_plan, final_plan):
        assert "NestedLoop" not in plan and "CartesianProduct" not in plan, plan
    # round-9 rework shape: the re-rank looks vectors up through
    # BROADCAST joins (the first cut's SMJ sorts carried ~540 B vector
    # rows and spilled tens of GB at n=100k) — no exchange in the
    # scoring subtree may carry a vector column
    assert scored_plan.count("BroadcastHashJoin") >= 2, scored_plan
    for ln in scored_plan.splitlines():
        if "Exchange" in ln:
            assert "u1v" not in ln and "u2v" not in ln and "u#" not in ln, ln
    # candidate volume confirms the no-n² claim quantitatively
    n_cand = knn_lsh_candidates(
        spark, _unit(_corpus(spark, d)), _corpus_size(spark, d)
    ).count()
    assert n_cand < 0.15 * n * (n - 1), (n_cand, n)


def test_lpa_auto_switch_one_exchange_per_superstep(spark):
    """Round-9 gate (VERDICT r8 #2 — pagerank's round-8 gate applied to
    LPA): with the broadcast threshold forced below the node-table
    estimate, the AUTO default must (a) pick the co-partitioned mode,
    (b) plan exactly ONE distinct shuffle exchange in the superstep
    (the hash(dst) message regroup — the compound (dst, label)
    aggregation, the per-dst window and the write-back join all reuse
    it), and (c) produce communities identical to the adaptive default
    path."""
    import re

    from frizzle_spark.operators.graph import label_propagation

    edges = [(i, (i * 7) % 23) for i in range(60) if i != (i * 7) % 23] + [
        (100, 1),
        (101, 100),
    ]
    e = spark.createDataFrame(edges, "src long, dst long")
    want = {
        r["node"]: r["community"]
        for r in label_propagation(e, co_partition=False).collect()
    }

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1k")
    try:
        probe = {}
        got = {
            r["node"]: r["community"]
            for r in label_propagation(e, _probe=probe).collect()
        }
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    assert probe["co_partition"] is True, probe
    plan = probe["superstep_plan"]
    raw_shuffles = [
        ln.split("Exchange", 1)[1].strip()
        for ln in plan.splitlines()
        if "Exchange hashpartitioning" in ln
    ]
    assert raw_shuffles and all(
        s.startswith("hashpartitioning(dst") for s in raw_shuffles
    ), "non-regroup shuffle in superstep:\n" + "\n".join(raw_shuffles)
    distinct_shuffles = {
        re.sub(r"#\d+L?|plan_id=\d+", "#", s) for s in raw_shuffles
    }
    assert len(distinct_shuffles) == 1, (
        f"superstep planned {len(distinct_shuffles)} distinct shuffles:\n"
        + "\n".join(sorted(distinct_shuffles))
    )
    assert got == want

    # at bench scale (threshold untouched, small n) auto stays adaptive
    probe_small = {}
    label_propagation(e, n_iter=1, _probe=probe_small)
    assert probe_small["co_partition"] is False, probe_small


def test_lpa_until_stable_converges_and_heals_chain(spark):
    """VERDICT r10 #5: the convergence knob.  On a path graph of 12
    nodes, 5 fixed synchronous rounds cannot propagate the min label to
    the far end (information travels one hop per round) — fixed-rounds
    LPA oversplits it; until_stable runs until no label changes and the
    far end joins.  On the planted two-clique graph the knob must agree
    with the fixed-rounds answer (both converge) and report rounds_run
    + a monotone changed_history through _probe."""
    from frizzle_spark.operators.graph import label_propagation

    # path: 0-1-2-...-11
    path = spark.createDataFrame(
        [(i, i + 1) for i in range(11)], "src long, dst long"
    )
    fixed = {
        r["node"]: r["community"]
        for r in label_propagation(path, n_iter=2).collect()
    }
    assert len(set(fixed.values())) > 1, "2 rounds cannot label a 12-path"
    probe: dict = {}
    stable = {
        r["node"]: r["community"]
        for r in label_propagation(
            path, until_stable=True, _probe=probe
        ).collect()
    }
    # a path is bipartite-ish: synchronous LPA 2-cycles — the knob must
    # DETECT the oscillation and stop early rather than burn max_rounds
    assert len(set(stable.values())) < len(set(fixed.values()))
    assert probe["rounds_run"] > 2
    assert probe["stopped"] in ("fixpoint", "cycle")
    from frizzle_spark.operators.graph import LPA_MAX_ROUNDS

    assert probe["rounds_run"] < LPA_MAX_ROUNDS

    # two cliques + bridge: knob and fixed rounds agree
    edges = []
    for base in (0, 10):
        for i in range(6):
            for j in range(i + 1, 6):
                edges.append((base + i, base + j))
    edges.append((5, 10))
    df = spark.createDataFrame(edges, "src long, dst long")
    want = {
        r["node"]: r["community"] for r in label_propagation(df).collect()
    }
    probe2: dict = {}
    got = {
        r["node"]: r["community"]
        for r in label_propagation(
            df, until_stable=True, _probe=probe2
        ).collect()
    }
    assert got == want
    assert probe2["stopped"] in ("fixpoint", "cycle")
