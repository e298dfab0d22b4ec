"""Sample-scale convergence gates (round 8, VERDICT r7 #8).

qz12_matryoshka's eval grid is O(n²) and qz12_ood_score's fit reads the
whole corpus; both docstrings claimed "at 100 TB this runs on a sample"
without a knob.  The knob is now ``sample_n`` (deterministic hash-
sample — the qz22_hash_split move); these gates pin the ESTIMATOR:
metrics stable within ε across 2× sample sizes and against the
full-corpus value, plus determinism (same sample, same rows, every run).
Run at sf0.1 (n=2,000 embeddings) so samples of 500/1,000 are
meaningfully smaller than the corpus.
"""

from __future__ import annotations

SF01 = "/root/testdata/sf0.1"


def test_matryoshka_sample_convergence(spark):
    from frizzle_spark.operators.similarity import qz12_matryoshka

    def recalls(sample_n):
        return {
            r["dims"]: r["recall_at_k"]
            for r in qz12_matryoshka(spark, SF01, sample_n=sample_n).collect()
        }

    r_full = recalls(None)
    r_1000 = recalls(1000)
    r_500 = recalls(500)
    # full-dims truncation is the identity — recall exactly 1 everywhere
    assert r_full[64] == r_1000[64] == r_500[64] == 1.0
    for d in (8, 16, 32):
        assert abs(r_1000[d] - r_500[d]) <= 0.10, (d, r_500[d], r_1000[d])
        assert abs(r_1000[d] - r_full[d]) <= 0.10, (d, r_1000[d], r_full[d])
    # determinism: the hash-sample is a pure function of the ids
    assert recalls(500) == r_500


def test_ood_sample_fit_convergence(spark):
    """Scores under a half-corpus fit converge to the full fit, and
    PLANTED outliers — the thing the operator exists to catch — rank on
    top under both fits.  (A set-overlap gate on the random testdata's
    top-5% is meaningless: with no true outliers every score is the
    same chi-square(d) noise and the ranking is arbitrary.)"""
    from frizzle_spark.operators.decomposition import qz12_ood_score

    full = {r["vec_id"]: r["maha_sq"] for r in qz12_ood_score(spark, SF01).collect()}
    samp = {
        r["vec_id"]: r["maha_sq"]
        for r in qz12_ood_score(spark, SF01, sample_n=1000).collect()
    }
    # scoring still covers EVERY vector — only the fit was sampled
    assert set(samp) == set(full) and len(full) == 2000
    rel = sorted(
        abs(samp[v] - full[v]) / max(full[v], 1e-9) for v in full
    )
    median_rel = rel[len(rel) // 2]
    assert median_rel <= 0.15, f"median relative maha drift {median_rel:.3f}"


def test_ood_sample_fit_catches_planted_outliers(spark, tmp_path):
    """2,000 anisotropic in-distribution vectors + 20 planted 6σ
    outliers: the sampled fit must rank every planted outlier in the
    top 40 — the operator's actual job, invariant to the fit sample."""
    import numpy as np

    from frizzle_spark.operators.decomposition import qz12_ood_score

    rng = np.random.RandomState(11)
    scales = 0.2 + rng.rand(64) * 2.0
    x = rng.randn(2000, 64) * scales
    x[:20] = rng.randn(20, 64) * scales * 6.0  # planted far tail
    d = str(tmp_path / "ood_planted")
    spark.createDataFrame(
        [(i, [float(v) for v in row], 0) for i, row in enumerate(x)],
        "vec_id long, embedding array<float>, label int",
    ).write.parquet(f"{d}/embeddings.parquet")
    for sample_n in (None, 1000):
        got = {
            r["vec_id"]: r["maha_sq"]
            for r in qz12_ood_score(spark, d, sample_n=sample_n).collect()
        }
        top40 = set(sorted(got, key=got.get, reverse=True)[:40])
        missed = set(range(20)) - top40
        assert not missed, f"sample_n={sample_n}: planted outliers missed {missed}"


def test_hash_sample_stable_under_growth(spark):
    """Membership never flips when the corpus grows — the property that
    makes sampled metrics comparable across crawls."""
    from pyspark.sql import functions as F

    from frizzle_spark.operators.similarity import hash_sample

    small = spark.range(1000).select(F.col("id").alias("vec_id"))
    big = spark.range(2000).select(F.col("id").alias("vec_id"))
    s_small = {r["vec_id"] for r in hash_sample(small, "vec_id", 0.3).collect()}
    s_big = {r["vec_id"] for r in hash_sample(big, "vec_id", 0.3).collect()}
    assert s_small == {v for v in s_big if v < 1000}
    # and the rate lands near the requested fraction
    assert 0.2 <= len(s_big) / 2000 <= 0.4


def test_hash_sample_degenerate_fractions(spark):
    """Round-9 gate (ADVICE r8): frac ≤ 0 raises (never a silently
    empty sample); a tiny positive frac floors the bound at 1-per-
    million instead of rounding to zero, so it selects exactly the
    rows a 1e-6 request would."""
    import pytest
    from pyspark.sql import functions as F

    from frizzle_spark.operators.similarity import hash_sample

    df = spark.range(5000).select(F.col("id").alias("vec_id"))
    with pytest.raises(ValueError, match="frac must be > 0"):
        hash_sample(df, "vec_id", 0.0)
    with pytest.raises(ValueError, match="frac must be > 0"):
        hash_sample(df, "vec_id", -0.1)
    tiny = {r["vec_id"] for r in hash_sample(df, "vec_id", 1e-9).collect()}
    floor = {r["vec_id"] for r in hash_sample(df, "vec_id", 1e-6).collect()}
    assert tiny == floor  # bound floored at 1, not silently 0


def test_matryoshka_auto_samples_past_threshold(spark, sf_dir, monkeypatch):
    """Round-9 gate: the registry default (sample_n=None) must
    auto-sample once the corpus outgrows MATRYOSHKA_AUTO_SAMPLE_N —
    the full-corpus O(n²) grid exhausted the Arrow allocator at sf10 —
    and the auto result must equal the explicit sample_n call exactly
    (same hash sample, same grid).  Below the threshold None still
    means the exact full-corpus eval."""
    from frizzle_spark.operators import similarity as sim

    full = [tuple(r) for r in sim.qz12_matryoshka(spark, sf_dir).collect()]

    monkeypatch.setattr(sim, "MATRYOSHKA_AUTO_SAMPLE_N", 50)
    auto = [tuple(r) for r in sim.qz12_matryoshka(spark, sf_dir).collect()]
    explicit = [
        tuple(r) for r in sim.qz12_matryoshka(spark, sf_dir, sample_n=50).collect()
    ]
    assert auto == explicit
    # the hash sample is Bernoulli (size ≈ target, not exact) — the
    # load-bearing claims are identity with the explicit call and a
    # genuinely shrunken eval
    assert auto[0][1] < full[0][1]
