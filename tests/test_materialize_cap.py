"""Cap-gated fan-out materialization (r13, VERDICT r12 #5).

The r12 ``localCheckpoint`` materializations of fan-out derived tables
(MinHash signatures, SimHash fingerprints, packed token arrays, the BPE
per-doc count table) pin executor-local storage and truncate lineage —
the right plan shape, but not a 100 TB-safe medium.  r13 routes them
through ``materialize_fanout``: executor-local under
``LOCAL_MAT_CAP_BYTES``, a parquet scratch round-trip over it.  These
gates pin that BOTH paths produce identical rows for every consumer,
and that the registry callers pass real (positive) size estimates so
the cap actually gates.
"""

from __future__ import annotations

import pytest

from frizzle_spark.operators import dedup as dd


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize(
    "qname",
    ["qz11_minhash_lsh", "qz11_simhash", "qz11_jaccard_join"],
)
def test_fanout_scratch_path_identity(spark, sf_dir, qname, monkeypatch):
    """Forcing every materialization over the cap (cap=0 → parquet
    scratch) must not change a single output row."""
    from frizzle_spark.plans.registry import REGISTRY

    base = _rows(REGISTRY[qname].fn(spark, sf_dir))
    monkeypatch.setattr(dd, "LOCAL_MAT_CAP_BYTES", 0)
    over = _rows(REGISTRY[qname].fn(spark, sf_dir))
    assert over == base


def test_budget_slice_scratch_path_identity(spark, sf_dir, monkeypatch):
    from frizzle_spark.plans.sql_surface import qz22_token_budget_bpe

    base = _rows(qz22_token_budget_bpe(spark, sf_dir))
    monkeypatch.setattr(dd, "LOCAL_MAT_CAP_BYTES", 0)
    over = _rows(qz22_token_budget_bpe(spark, sf_dir))
    assert over == base


def test_materialize_fanout_paths(spark, monkeypatch):
    """Direct unit check: under-cap returns a checkpointed frame (no
    scan in the plan), over-cap returns a parquet-scan-backed frame —
    and both carry the same rows."""
    df = spark.range(100).selectExpr("id", "id * 2 as v")
    under = dd.materialize_fanout(df, est_bytes=16 * 100)
    assert "ExistingRDD" in under._jdf.queryExecution().executedPlan().toString()
    assert _rows(under) == _rows(df)
    monkeypatch.setattr(dd, "LOCAL_MAT_CAP_BYTES", 0)
    over = dd.materialize_fanout(df, est_bytes=16 * 100)
    assert (
        "parquet"
        in over._jdf.queryExecution().executedPlan().toString().lower()
    )
    assert _rows(over) == _rows(df)


def test_embedding_neardup_lsh_gather_path_identity(spark, sf_dir, monkeypatch):
    """The gather-GEMM re-rank tier (n > GATHER_RERANK_MIN_N) must emit
    exactly the join-path rows.  No gate exercised this branch before
    r13 (the test corpora sit below the 8192 threshold), and r13 touches
    it (unsorted Arrow collect + driver-side argsort instead of an
    orderBy exchange), so the identity is pinned here by forcing the
    threshold to 0."""
    import frizzle_spark.operators.similarity as sim

    fn = sim.qz11_embedding_neardup_lsh
    base = _rows(fn(spark, sf_dir))
    monkeypatch.setattr(sim, "GATHER_RERANK_MIN_N", 0)
    gather = _rows(fn(spark, sf_dir))
    assert gather == base


def test_dedup_clusters_long_fixpoint_stats_reset(spark):
    """A deep fixpoint must survive its own plan statistics: each
    round's joins MULTIPLY the localCheckpoint-preserved size estimate,
    and past ~15 rounds the BigInt sizeInBytes exceeds BigInteger's bit
    cap ("BigInteger would overflow supported range" — reproduced on a
    260k-pair graph in the r13 over-cap proof).  The round-8 parquet
    stats reset fixes it; this chain needs ~13 doubling rounds, crossing
    the reset, and must still produce the exact component labels."""
    from pyspark.sql import functions as F

    p = (
        spark.range(5999)
        .select(F.col("id").alias("d1"), (F.col("id") + 1).alias("d2"))
        .localCheckpoint()
    )
    rows = dd.dedup_clusters(p).collect()
    assert len(rows) == 6000
    assert all(r["cluster_rep"] == 0 for r in rows)


def test_registry_callers_pass_positive_estimates(spark, sf_dir):
    """The cap can only gate if the registry paths hand it real sizes."""
    n = dd._docs_n(spark, sf_dir)
    assert n > 0
    assert n * dd.SIG_ROW_BYTES > 0
    tb = dd._docs_text_bytes(sf_dir)
    # local parquet footers must be readable in the test sandbox
    assert tb > 0
