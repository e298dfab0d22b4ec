"""Gates for the deterministic global shuffle (training-data epoch
permutation): determinism, permutation-ness, range-partition balance,
and the no-global-sort plan shape of the head-of-order query.  The
cross-engine order agreement itself is covered by qz22_global_shuffle's
DuckDB oracle in test_relational.py.
"""

from __future__ import annotations

from pyspark.sql import functions as F

import frizzle_spark.plans.windows  # noqa: F401 - populate registry (funnel)
from frizzle_spark.plans.registry import REGISTRY
from frizzle_spark.plans.sql_surface import global_shuffle
from frizzle_spark.sources.tables import load_table


def _order(df) -> list[int]:
    # partition-major order: rows within a range partition are sorted,
    # and partition i's keys all precede partition i+1's.
    return [r["doc_id"] for r in df.select("doc_id", "shuffle_key").collect()]


def test_global_shuffle_is_deterministic_permutation(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    a = global_shuffle(docs, ["doc_id"], seed=42, num_partitions=8)
    b = global_shuffle(docs, ["doc_id"], seed=42, num_partitions=8)
    oa, ob = _order(a), _order(b)
    assert oa == ob, "same seed must reproduce the identical order"
    assert sorted(oa) == sorted(r["doc_id"] for r in docs.collect()), (
        "shuffle must be a permutation (no rows lost or duplicated)"
    )
    c = global_shuffle(docs, ["doc_id"], seed=7, num_partitions=8)
    assert _order(c) != oa, "a different seed must yield a different epoch order"


def test_global_shuffle_partitions_balanced(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    out = global_shuffle(docs, ["doc_id"], num_partitions=8)
    sizes = [
        r["n"]
        for r in out.groupBy(F.spark_partition_id().alias("p"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    ]
    n = sum(sizes)
    assert len(sizes) == 8
    # md5 keys are uniform, range boundaries come from sampling: no
    # partition should exceed 2x the mean (the skew bound a sharded
    # training-data writer depends on).
    assert max(sizes) <= 2 * (n / len(sizes)), f"skewed partitions: {sizes}"


def test_global_shuffle_head_is_take_ordered(spark, sf_dir):
    plan = (
        REGISTRY["qz22_global_shuffle"]
        .fn(spark, sf_dir)
        ._jdf.queryExecution()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan, (
        "head-of-order must be per-partition top-k + driver merge, "
        "never a global sort"
    )


def test_hash_split_proportions_and_stability(spark, sf_dir):
    """qz22_hash_split: splits are disjoint-and-covering by construction
    (CASE), proportions land near 80/10/10 (md5 uniformity), the plan
    has zero exchanges (pure projection), and assignment is STABLE —
    restricting the corpus to any subset leaves every doc's split
    unchanged (the property that lets a growing corpus keep its
    historical split)."""
    from pyspark.sql import functions as F

    df = REGISTRY["qz22_hash_split"].fn(spark, sf_dir)
    counts = {r["split"]: r["n"] for r in df.groupBy("split").agg(F.count("*").alias("n")).collect()}
    n = sum(counts.values())
    assert set(counts) == {"train", "val", "test"}
    assert abs(counts["train"] / n - 0.8) < 0.03, counts
    assert abs(counts["val"] / n - 0.1) < 0.02, counts
    assert abs(counts["test"] / n - 0.1) < 0.02, counts
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, "hash split must be a pure map-side projection"
    # stability: the same doc gets the same split in a half-size corpus
    full = {r["doc_id"]: r["split"] for r in df.collect()}
    half = {
        r["doc_id"]: r["split"]
        for r in df.where(F.col("doc_id") % 2 == 0).collect()
    }
    assert all(full[k] == v for k, v in half.items())


def test_token_budget_matches_independent_recomputation(spark, sf_dir):
    """Third-implementation check (beside the DuckDB oracle): the
    distributed bucket-offset prefix sum must reproduce the exact
    maximal prefix of the md5-ordered corpus that a plain driver-side
    cumsum selects."""
    import hashlib
    import re

    import pyarrow.parquet as pq

    from frizzle_spark.plans.sql_surface import TOKEN_BUDGET, TOKEN_BUDGET_SEED

    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    rows = []
    for doc_id, text in zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()):
        key = hashlib.md5(f"{doc_id}:{TOKEN_BUDGET_SEED}".encode()).hexdigest()
        rows.append((key, doc_id, len(re.split(r"\s+", text.strip()))))
    rows.sort()
    want, cum = {}, 0
    for key, doc_id, ntok in rows:
        cum += ntok
        if cum > TOKEN_BUDGET:
            break
        want[doc_id] = (ntok, cum)

    got = {
        r["doc_id"]: (r["n_tokens"], r["cum_tokens"])
        for r in REGISTRY["qz22_token_budget"].fn(spark, sf_dir).collect()
    }
    assert got == want


def test_mixture_sample_quotas_exact(spark, sf_dir):
    """Every source must keep exactly floor(w_s * T) documents where
    T = min_s(N_s / w_s) — the largest total the corpus supports at the
    target mixture (independent recomputation from raw counts)."""
    import math

    from pyspark.sql import functions as F

    raw = {
        r["source"]: r["n"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    wt = {s: 2.0 if int(s[3:]) % 2 == 0 else 1.0 for s in raw}
    t = min(raw[s] / wt[s] for s in raw)
    want = {s: math.floor(wt[s] * t) for s in raw}

    kept = {
        r["source"]: r["n"]
        for r in REGISTRY["qz22_mixture_sample"]
        .fn(spark, sf_dir)
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert kept == {s: n for s, n in want.items() if n > 0}


def test_funnel_tie_and_order_semantics(spark, tmp_path):
    """Edge cases the corpus can't guarantee: a same-timestamp event
    must NOT advance to the next stage (strict >), an out-of-order
    stage doesn't count, and one event never advances two stages."""
    import datetime as dt

    from pyspark.sql import functions as F

    t = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)
    rows = [
        # user 1: view ties with signup -> stuck at signup
        (1, t(0), "signup"), (1, t(0), "view"), (1, t(2), "click"),
        # user 2: click ties with view -> reaches view only
        (2, t(0), "signup"), (2, t(1), "view"), (2, t(1), "click"),
        (2, t(2), "purchase"),  # purchase without click -> no
        # user 3: full ordered funnel
        (3, t(0), "signup"), (3, t(1), "view"), (3, t(2), "click"),
        (3, t(3), "purchase"),
        # user 4: purchase BEFORE signup never counts
        (4, t(0), "purchase"), (4, t(1), "signup"),
    ]
    d = str(tmp_path / "funnel")
    spark.createDataFrame(
        [(i, ts, u, et, 1.0, "{}") for i, (u, ts, et) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{d}/events.parquet")

    got = {
        r["step"]: r["n_users"]
        for r in REGISTRY["qz10_funnel"].fn(spark, d).collect()
    }
    assert got == {"signup": 4, "view": 2, "click": 1, "purchase": 1}


def test_funnel_zero_counts_on_empty_corpus(spark, tmp_path):
    """A corpus with no funnel-step events must report 0 per stage (the
    oracle's count(*) over empty stage tables), never NULL."""
    import datetime as dt

    d = str(tmp_path / "funnel_empty")
    spark.createDataFrame(
        [(0, dt.datetime(2024, 1, 1), 1, "error", 1.0, "{}")],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(f"{d}/events.parquet")
    got = {
        r["step"]: r["n_users"]
        for r in REGISTRY["qz10_funnel"].fn(spark, d).collect()
    }
    assert got == {"signup": 0, "view": 0, "click": 0, "purchase": 0}


def test_funnel_matches_simulation_on_random_events(spark, tmp_path):
    """Randomized differential: the Catalyst fold must agree with a
    plain Python funnel simulation on a corpus dense with repeated
    types and deliberate timestamp collisions (coarse 20-second grid
    over 30 users × 400 events)."""
    import datetime as dt
    import random

    from frizzle_spark.plans.windows import FUNNEL_STEPS

    rng = random.Random(7)
    base = dt.datetime(2024, 1, 1)
    types = list(FUNNEL_STEPS) + ["error"]
    rows = [
        (
            i,
            base + dt.timedelta(seconds=20 * rng.randrange(50)),
            rng.randrange(30),
            rng.choice(types),
        )
        for i in range(400)
    ]
    d = str(tmp_path / "funnel_rand")
    spark.createDataFrame(
        [(i, ts, u, et, 1.0, "{}") for i, ts, u, et in rows],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(f"{d}/events.parquet")

    # simulation: per user, walk (ts, type)-sorted events; stage i+1
    # requires its type strictly after stage i's recorded time
    per_user: dict[int, list] = {}
    for _, ts, u, et in sorted(rows, key=lambda r: (r[2], r[1], r[3])):
        st = per_user.setdefault(u, [None] * len(FUNNEL_STEPS))
        for i, step in enumerate(FUNNEL_STEPS):
            if st[i] is None and et == step and (
                i == 0 or (st[i - 1] is not None and ts > st[i - 1])
            ):
                st[i] = ts
                break
    want = {
        step: sum(1 for st in per_user.values() if st[i] is not None)
        for i, step in enumerate(FUNNEL_STEPS)
    }
    got = {
        r["step"]: r["n_users"]
        for r in REGISTRY["qz10_funnel"].fn(spark, d).collect()
    }
    assert got == want


def test_leakage_safe_split_invariants(spark, sf_dir):
    """qz22_leakage_safe_split: (a) NO near-dup pair straddles splits —
    the leakage guarantee, checked against the full MinHash pair set;
    (b) documents in no cluster keep exactly qz22_hash_split's
    assignment (own-id rep, same seed/bounds); (c) deterministic."""
    from frizzle_spark.plans.registry import REGISTRY

    split_rows = REGISTRY["qz22_leakage_safe_split"].fn(spark, sf_dir).collect()
    split = {r["doc_id"]: r["split"] for r in split_rows}
    rep = {r["doc_id"]: r["cluster_rep"] for r in split_rows}

    pairs = [
        (r["d1"], r["d2"])
        for r in REGISTRY["qz11_minhash_lsh"].fn(spark, sf_dir).collect()
    ]
    assert pairs, "testdata must contain near-dup pairs for this gate"
    for d1, d2 in pairs:
        assert split[d1] == split[d2], (d1, d2, split[d1], split[d2])
        assert rep[d1] == rep[d2], "near-dup pair must share a cluster rep"

    plain = {
        r["doc_id"]: r["split"]
        for r in REGISTRY["qz22_hash_split"].fn(spark, sf_dir).collect()
    }
    singles = [d for d in split if rep[d] == d]
    assert singles, "corpus must contain singleton docs"
    clustered_elsewhere = [d for d in split if rep[d] != d]
    assert clustered_elsewhere, "corpus must contain clustered docs"
    for d in singles:
        assert split[d] == plain[d], (d, split[d], plain[d])

    again = {
        r["doc_id"]: r["split"]
        for r in REGISTRY["qz22_leakage_safe_split"].fn(spark, sf_dir).collect()
    }
    assert again == split
