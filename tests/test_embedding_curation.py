"""Gates for the embedding curation bus (streaming/embedding_curation).

Synthetic deterministic corpus: unit vectors from a seeded RNG, with
planted near-dup copies (tiny noise, cos > 0.99), so every routing
decision is known by construction.  The invariant gate recomputes the
pairwise survivor property EXACTLY with numpy — no estimator slack.
"""
from __future__ import annotations

import json
import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from frizzle_spark.streaming import embedding_curation as EC

# 32 dims: random-pair cosines concentrate near 0 (σ = 1/√32 ≈ 0.18),
# so unplanted pairs sit far below the 0.9 threshold even at the max
# over a few thousand pairs — decisions are planted-only by geometry
DIM = 32
RNG = np.random.RandomState(1234)


def _mk_vecs(n: int, seed: int = 7) -> np.ndarray:
    rng = np.random.RandomState(seed)
    v = rng.randn(n, DIM)
    return v / np.linalg.norm(v, axis=1, keepdims=True)


def _df(spark, ids, vecs):
    import pandas as pd

    return spark.createDataFrame(
        pd.DataFrame(
            {
                "vec_id": np.asarray(ids, dtype=np.int64),
                "embedding": [
                    None if v is None else [float(x) for x in v] for v in vecs
                ],
            }
        ),
        "vec_id long, embedding array<float>",
    )


def _noisy(v: np.ndarray, eps: float = 1e-3) -> np.ndarray:
    w = v + eps * RNG.randn(len(v))
    return w / np.linalg.norm(w)


@pytest.fixture()
def bases(tmp_path):
    return str(tmp_path / "index"), str(tmp_path / "out")


def _ingest(spark, bases, batches, **kw):
    index, out = bases
    res = []
    for bid, (ids, vecs) in enumerate(batches):
        res.append(
            EC.embedding_ingest_batch(
                spark, _df(spark, ids, vecs), index, out, bid, **kw
            )
        )
    return res


def _assignment_rows(spark, out):
    return sorted(
        (
            (r["vec_id"], r["dest"], r["reason"], r["dup_of"])
            for r in EC.embedding_assignment(spark, out).collect()
        )
    )


def test_greedy_routing_and_provenance(spark, bases):
    base = _mk_vecs(40)
    # batch 0: 20 originals; batch 1: 10 new + copies of ids 3 and 7
    # (cross-batch) + an internal pair (200, 201 near-dup of each other)
    b0 = (range(20), base[:20])
    dup3, dup7 = _noisy(base[3]), _noisy(base[7])
    pairv = _mk_vecs(1, seed=99)[0]
    b1_ids = list(range(20, 30)) + [103, 107, 200, 201]
    b1_vecs = list(base[20:30]) + [dup3, dup7, pairv, _noisy(pairv)]
    _ingest(spark, bases, [b0, (b1_ids, b1_vecs)])
    rows = dict(
        (vid, (dest, reason, dup_of))
        for vid, dest, reason, dup_of in _assignment_rows(spark, bases[1])
    )
    assert rows[103] == ("dlq", "dup_index", 3)
    assert rows[107] == ("dlq", "dup_index", 7)
    assert rows[200] == ("corpus", None, None)
    assert rows[201] == ("dlq", "dup_batch", 200)
    assert sum(1 for d, _, _ in rows.values() if d == "corpus") == 31
    meta = json.load(open(os.path.join(bases[1], EC.EMB_INGEST_META)))
    assert meta["n_vecs_in"] == 34 and meta["n_vecs_kept"] == 31


def test_survivor_pairwise_invariant_exact(spark, bases):
    # clustered corpus: 12 groups x 5 near-identical members across 3
    # batches — survivors must be pairwise below threshold EXACTLY
    centers = _mk_vecs(12, seed=3)
    ids, vecs = [], []
    for g in range(12):
        for m in range(5):
            ids.append(g * 100 + m)
            vecs.append(_noisy(centers[g], 1e-4))
    batches = [
        (ids[k::3], [vecs[i] for i in range(k, len(vecs), 3)])
        for k in range(3)
    ]
    _ingest(spark, bases, batches)
    corpus = EC.embedding_assignment(spark, bases[1]).where(
        "dest = 'corpus'"
    )
    kept = sorted(r["vec_id"] for r in corpus.collect())
    # greedy first-accepted: one survivor per planted group
    assert len(kept) == 12
    import pyarrow.parquet as pq

    mats, kids = [], []
    for root, _d, files in os.walk(os.path.join(bases[1], "corpus")):
        for f in files:
            if f.endswith(".parquet"):
                tb = pq.read_table(os.path.join(root, f))
                kids += tb["vec_id"].to_pylist()
                mats += tb["embedding"].to_pylist()
    u = np.asarray(mats, dtype=np.float64)
    u /= np.linalg.norm(u, axis=1, keepdims=True)
    sims = np.triu(u @ u.T, k=1)
    assert sims.max(initial=0.0) < EC.EMB_DUP_THRESHOLD
    assert sorted(kids) == kept


def test_replay_noop_and_redelivery_bit_identity(spark, bases):
    index, out = bases
    base = _mk_vecs(30)
    b0 = (range(15), base[:15])
    b1_ids = list(range(15, 28)) + [103]
    b1_vecs = list(base[15:28]) + [_noisy(base[3])]
    _ingest(spark, bases, [b0])

    # deliver batch 1, then CRASH between index append and meta commit:
    # simulate by running batch 1 fully, then rolling the meta watermark
    # back (the index keeps batch 1's survivors — the crash window)
    EC.embedding_ingest_batch(
        spark, _df(spark, b1_ids, b1_vecs), index, out, 1
    )
    want = _assignment_rows(spark, out)
    with open(os.path.join(out, EC.EMB_INGEST_META)) as fh:
        meta = json.load(fh)
    import pyarrow.parquet as pq

    def corpus_bytes():
        out_rows = []
        for root, _d, files in sorted(os.walk(os.path.join(out, "corpus"))):
            for f in sorted(files):
                if f.endswith(".parquet"):
                    tb = pq.read_table(os.path.join(root, f))
                    out_rows += sorted(
                        zip(
                            tb["vec_id"].to_pylist(),
                            map(tuple, tb["embedding"].to_pylist()),
                        )
                    )
        return out_rows

    want_corpus = corpus_bytes()
    meta["committed_batch"] = 0  # roll back: batch 1 uncommitted again
    EC._write_emb_meta(out, meta | {"committed_batch": 0,
                                    "n_vecs_in": 15, "n_vecs_kept": 15})
    res = EC.embedding_ingest_batch(
        spark, _df(spark, b1_ids, b1_vecs), index, out, 1
    )
    assert not res["skipped"]
    assert _assignment_rows(spark, out) == want
    assert corpus_bytes() == want_corpus

    # committed replay is a no-op
    res = EC.embedding_ingest_batch(
        spark, _df(spark, b1_ids, b1_vecs), index, out, 1
    )
    assert res["skipped"]


def test_decon_gate_and_invalid(spark, bases):
    base = _mk_vecs(10)
    ev = _mk_vecs(2, seed=5)
    ids = list(range(10)) + [500, 501]
    vecs = list(base) + [_noisy(ev[0]), None]
    _ingest(spark, bases, [(ids, vecs)], eval_vecs=ev)
    rows = dict(
        (vid, (dest, reason))
        for vid, dest, reason, _ in _assignment_rows(spark, bases[1])
    )
    assert rows[500] == ("dlq", "contaminated")
    assert rows[501] == ("dlq", "invalid")
    # contaminated vectors are never indexed
    import pyarrow.parquet as pq

    for root, _d, files in os.walk(os.path.join(bases[0], "lists")):
        for f in files:
            if f.endswith(".parquet"):
                tb = pq.read_table(os.path.join(root, f))
                assert 500 not in tb["vec_id"].to_pylist()
                assert 501 not in tb["vec_id"].to_pylist()


def test_forced_distributed_tier_identity(spark, bases, tmp_path, monkeypatch):
    base = _mk_vecs(40)
    batches = [
        (range(20), base[:20]),
        (
            list(range(20, 30)) + [103, 200, 201],
            list(base[20:30]) + [_noisy(base[3]), base[35], _noisy(base[35])],
        ),
    ]
    _ingest(spark, bases, batches)
    want = _assignment_rows(spark, bases[1])

    ib2, ob2 = str(tmp_path / "i2"), str(tmp_path / "o2")
    monkeypatch.setattr(EC, "EMB_LOCAL_MAX_VECS", 0)
    _ingest(spark, (ib2, ob2), batches)
    assert _assignment_rows(spark, ob2) == want


def test_forced_pruned_probe_identity(spark, bases, tmp_path, monkeypatch):
    # same decisions whether the probe runs the young-index driver tier
    # or the cogrouped cluster-pruned Spark tier with nprobe = all
    base = _mk_vecs(60)
    batches = [
        (range(30), base[:30]),
        (
            list(range(30, 50)) + [105, 112],
            list(base[30:50]) + [_noisy(base[5]), _noisy(base[12])],
        ),
    ]
    _ingest(spark, bases, batches)
    want = _assignment_rows(spark, bases[1])

    ib2, ob2 = str(tmp_path / "i2"), str(tmp_path / "o2")
    monkeypatch.setattr(EC, "EMB_PROBE_LOCAL_MAX_BYTES", 0)
    _ingest(spark, (ib2, ob2), batches, nprobe="all")
    assert _assignment_rows(spark, ob2) == want


def _hits_equal(a: dict, b: dict) -> None:
    """Hit-dict identity: same probe rows, same min old_id, cosines to
    float-dot tolerance (BLAS summation order may differ across tiers
    for the SAME vector pair, so bitwise cos equality is not owed)."""
    assert set(a) == set(b)
    for q in a:
        assert a[q][0] == b[q][0]
        assert abs(a[q][1] - b[q][1]) < 1e-9


def test_cluster_cached_probe_identity_and_fallback(
    spark, bases, monkeypatch
):
    # r13 (VERDICT r12 #9): the per-cluster cached tier must produce the
    # broadcast tier's exact hits (routing, exclude mask, min-old_id),
    # cold and warm, and refuse (None) when the budget cannot hold the
    # probed working set
    monkeypatch.setattr(EC, "EMB_PROBE_LOCAL_MAX_BYTES", 0)
    base = _mk_vecs(80)
    _ingest(spark, bases, [(range(60), base[:60])])
    index = bases[0]
    probe_ids = np.asarray([500, 501, 502], dtype=np.int64)
    probes = np.vstack(
        [_noisy(base[5]), _noisy(base[17]), _mk_vecs(1, seed=42)[0]]
    )
    for npb in (2, "all"):
        EC._CLUSTER_CACHE.clear()
        cold = EC._probe_index_pruned_cached(index, probes, 0.9, npb, set())
        warm = EC._probe_index_pruned_cached(index, probes, 0.9, npb, set())
        bc = EC._probe_index_pruned_broadcast(
            spark, index, probe_ids, probes, 0.9, npb, set()
        )
        assert cold is not None and cold  # planted dups actually hit
        _hits_equal(cold, warm)
        _hits_equal(cold, bc)
    # exclude masking identical across tiers
    EC._CLUSTER_CACHE.clear()
    got = EC._probe_index_pruned_cached(index, probes, 0.9, 2, {5})
    bc = EC._probe_index_pruned_broadcast(
        spark, index, probe_ids, probes, 0.9, 2, {5}
    )
    assert got is not None
    _hits_equal(got, bc)
    assert all(old != 5 for old, _ in got.values())
    # budget 0: the pre-load gate refuses before reading anything
    monkeypatch.setattr(EC, "EMB_CLUSTER_CACHE_MAX_BYTES", 0)
    EC._CLUSTER_CACHE.clear()
    assert EC._probe_index_pruned_cached(index, probes, 0.9, 2, set()) is None
    # ...and the ingest path still works end-to-end via the fallback
    ib2, ob2 = bases[0] + "_fb", bases[1] + "_fb"
    _ingest(
        spark,
        (ib2, ob2),
        [(range(30), base[:30]), ([900], [_noisy(base[7])])],
    )
    rows = dict(
        (vid, (dest, reason, dup_of))
        for vid, dest, reason, dup_of in _assignment_rows(spark, ob2)
    )
    assert rows[900] == ("dlq", "dup_index", 7)


def test_cluster_cache_extend_matches_cold_reload(spark, bases, monkeypatch):
    # the appending batch extends warm blocks in place; a cold re-read
    # of the post-append files must yield the identical probe result
    monkeypatch.setattr(EC, "EMB_PROBE_LOCAL_MAX_BYTES", 0)
    base = _mk_vecs(90)
    _ingest(spark, bases, [(range(40), base[:40])])
    index = bases[0]
    EC._CLUSTER_CACHE.clear()
    # warm the cache over every cluster, then append batch 1 (extends)
    EC._probe_index_pruned_cached(
        index, np.vstack([_noisy(base[i]) for i in range(6)]), 0.9, "all", set()
    )
    _ingest(
        spark,
        bases,
        [(range(40), base[:40]), (range(40, 80), base[40:80])],
    )
    p2 = np.vstack([_noisy(base[40 + i]) for i in range(6)])
    warm = EC._probe_index_pruned_cached(index, p2, 0.9, "all", set())
    EC._CLUSTER_CACHE.clear()
    cold = EC._probe_index_pruned_cached(index, p2, 0.9, "all", set())
    assert warm is not None and len(warm) == 6
    _hits_equal(warm, cold)


def test_pruned_probe_default_nprobe_catches_planted(
    spark, bases, monkeypatch
):
    # with the DEFAULT (pruned) nprobe a near-identical copy lands in
    # the same nearest cluster as its original — planted dups are still
    # caught when probing is approximate
    monkeypatch.setattr(EC, "EMB_PROBE_LOCAL_MAX_BYTES", 0)
    base = _mk_vecs(50)
    batches = [
        (range(50), base),
        ([1000 + i for i in range(8)], [_noisy(base[i]) for i in range(8)]),
    ]
    _ingest(spark, bases, batches)
    rows = dict(
        (vid, (dest, reason, dup_of))
        for vid, dest, reason, dup_of in _assignment_rows(spark, bases[1])
    )
    for i in range(8):
        assert rows[1000 + i] == ("dlq", "dup_index", i)


def test_empty_first_batch_and_bootstrap(spark, bases):
    index, out = bases
    res0 = EC.embedding_ingest_batch(spark, _df(spark, [], []), index, out, 0)
    assert res0["n_kept"] == 0
    meta = json.load(open(os.path.join(out, EC.EMB_INGEST_META)))
    assert not meta["index_ready"]
    base = _mk_vecs(10)
    res1 = EC.embedding_ingest_batch(
        spark, _df(spark, range(10), base), index, out, 1
    )
    assert res1["n_kept"] == 10
    meta = json.load(open(os.path.join(out, EC.EMB_INGEST_META)))
    assert meta["index_ready"]
    assert json.load(open(os.path.join(index, "index_meta.json")))[
        "n_vectors"
    ] == 10


def test_bus_index_is_search_ivf_compatible(spark, bases):
    # the bus writes the ann_index layout — search_ivf_index must work
    # on it unchanged
    from frizzle_spark.operators.ann_index import search_ivf_index

    base = _mk_vecs(40)
    _ingest(spark, bases, [(range(40), base)])
    import pandas as pd

    probes = spark.createDataFrame(
        pd.DataFrame(
            {"probe_id": [0, 1], "pu": [list(base[0]), list(base[1])]}
        )
    )
    res = search_ivf_index(spark, bases[0], probes, k=3)
    got = res.collect()
    assert {r["probe_id"] for r in got} == {0, 1}
    for pid in (0, 1):
        ranks = sorted(r["rank"] for r in got if r["probe_id"] == pid)
        assert ranks == [1, 2, 3]


def test_stream_twin_matches_batch_twin(spark, bases, tmp_path):
    import pandas as pd

    base = _mk_vecs(32)
    batches = [
        (range(16), base[:16]),
        (list(range(16, 30)) + [102], list(base[16:30]) + [_noisy(base[2])]),
    ]
    _ingest(spark, bases, batches)
    want = _assignment_rows(spark, bases[1])

    replay = str(tmp_path / "replay")
    os.makedirs(replay)
    pinned: set[str] = set()
    for k, (ids, vecs) in enumerate(batches):
        pdf = pd.DataFrame(
            {
                "vec_id": np.asarray(list(ids), dtype=np.int64),
                "embedding": [[float(x) for x in v] for v in vecs],
            }
        )
        spark.createDataFrame(
            pdf, "vec_id long, embedding array<float>"
        ).coalesce(1).write.mode("append").parquet(replay)
        for f in sorted(os.listdir(replay)):
            if f.startswith(("_", ".")) or f in pinned:
                continue
            os.utime(os.path.join(replay, f), (1_000_000_000 + k * 60,) * 2)
            pinned.add(f)
    ib2, ob2 = str(tmp_path / "i2"), str(tmp_path / "o2")
    EC.stream_embedding_ingest(
        spark, replay, ib2, ob2, str(tmp_path / "ckpt")
    )
    assert _assignment_rows(spark, ob2) == want


def test_retrain_compaction_identity_and_guard(spark, bases, tmp_path):
    # grow an index across batches with a batch-0 quantizer, then
    # retrain-compact: nprobe="all" decisions must be identical, meta k
    # must track the grown corpus, and the interrupted-retrain crash
    # window must be refused loudly
    import shutil

    from frizzle_spark.operators.ann_index import compact_ann_index

    index, out = bases
    base = _mk_vecs(600, seed=11)
    batches = [(range(k * 200, (k + 1) * 200), base[k * 200 : (k + 1) * 200])
               for k in range(3)]
    _ingest(spark, bases, batches)
    k_before = json.load(open(os.path.join(index, "index_meta.json")))["k"]

    res = compact_ann_index(spark, index, retrain=True)
    assert res["k"] >= k_before  # k tracks the grown corpus
    assert res["files_after"] <= res["files_before"]

    # probe the retrained index exactly as batch 3 would, nprobe=all:
    # a noisy copy of an accepted vector must still resolve to it
    probe_batch = ([9000, 9001], [_noisy(base[17]), _mk_vecs(1, seed=77)[0]])
    EC.embedding_ingest_batch(
        spark, _df(spark, *probe_batch), index, out, 3, nprobe="all"
    )
    rows = dict(
        (vid, (dest, reason, dup_of))
        for vid, dest, reason, dup_of in _assignment_rows(spark, out)
    )
    assert rows[9000] == ("dlq", "dup_index", 17)
    assert rows[9001][0] == "corpus"

    # crash-window guard: a lists partition beyond the centroid table
    k_now = json.load(open(os.path.join(index, "index_meta.json")))["k"]
    src = None
    for d in os.listdir(os.path.join(index, "lists")):
        if d.startswith("cluster="):
            src = d
            break
    shutil.copytree(
        os.path.join(index, "lists", src),
        os.path.join(index, "lists", f"cluster={k_now + 5}"),
    )
    import pandas as pd

    batch_unit = spark.createDataFrame(
        pd.DataFrame({"vec_id": [1], "u": [list(map(float, base[0]))]})
    )
    with pytest.raises(RuntimeError, match="interrupted"):
        EC._probe_index_pruned(spark, index, batch_unit, 0.9, 2)
