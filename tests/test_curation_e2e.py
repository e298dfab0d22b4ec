"""End-to-end curation composition — the engine's thesis as ONE test.

A user of this engine curates a training corpus by CHAINING the
library: markup strip → language/quality gate → exact dedup → MinHash
near-dup clustering (keep one per cluster) → deterministic train/val
split.  This test runs that pipeline over the sf0.01 documents table
using only public operator functions (no registry entries), and pins
the invariants each stage owes the next.  Every stage is a DataFrame →
DataFrame transform, so the exact same composition runs at 100 TB —
nothing here collects more than the final assertion samples.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from frizzle_spark.functions import text as T
from frizzle_spark.operators import dedup as D
from frizzle_spark.sources.tables import load_table

QUALITY_MIN = 0.45
JACCARD_TAU = 0.4
VAL_BUCKETS = 10  # md5-bucket 0 → val, 1-9 → train


def _pipeline(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    n0 = docs.count()

    # 1. markup strip (idempotent on clean corpora)
    clean = docs.withColumn("text", T.strip_markup(F.col("text")))

    # 2. language + quality gate
    gated = clean.where(
        (T.predicted_lang(F.col("text")) == "en")
        & (T.quality_score(F.col("text")) >= QUALITY_MIN)
    )
    n_gated = gated.count()

    # 3. exact dedup: one survivor (min doc_id) per normalized fingerprint
    fp = gated.withColumn("fp", T.fingerprint(F.col("text")))
    exact = (
        fp.groupBy("fp")
        .agg(F.min("doc_id").alias("doc_id"))
        .join(fp, ["fp", "doc_id"])
        .drop("fp")
    )
    n_exact = exact.count()

    # 4. near-dup clustering: banded MinHash candidates, exact Jaccard
    # verify, connected components, keep min doc per cluster
    sh = D.shingles_of(exact)
    sigs = D.minhash_signatures(sh)
    cand = D.minhash_candidates(spark, sf_dir, _sigs=sigs)
    a = sh.select(F.col("doc_id").alias("d1"), F.col("shingle").alias("s"))
    b = sh.select(F.col("doc_id").alias("d2"), F.col("shingle").alias("s"))
    inter = (
        a.join(b, "s")
        .where(F.col("d1") < F.col("d2"))
        .join(F.broadcast(cand), ["d1", "d2"], "left_semi")
        .groupBy("d1", "d2")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    pairs = (
        inter.join(sizes.select(F.col("doc_id").alias("d1"), F.col("n").alias("n1")), "d1")
        .join(sizes.select(F.col("doc_id").alias("d2"), F.col("n").alias("n2")), "d2")
        .withColumn("jac", F.col("c") / (F.col("n1") + F.col("n2") - F.col("c")))
        .where(F.col("jac") >= JACCARD_TAU)
        .select("d1", "d2")
    )
    clusters = D.dedup_clusters(pairs)  # (doc_id, cluster_rep)
    drop = (
        clusters.groupBy("cluster_rep")
        .agg(F.min("doc_id").alias("keep"))
        .join(clusters, "cluster_rep")
        .where(F.col("doc_id") != F.col("keep"))
        .select("doc_id")
    )
    surv = exact.join(F.broadcast(drop), "doc_id", "left_anti")
    n_surv = surv.count()

    # 5. deterministic split on content-independent key
    bucket = F.pmod(
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 6), 16, 10).cast(
            "long"
        ),
        F.lit(VAL_BUCKETS),
    )
    split = surv.withColumn(
        "part", F.when(bucket == 0, "val").otherwise("train")
    )
    return n0, n_gated, n_exact, n_surv, pairs, split


def test_curation_pipeline_composes(spark, sf_dir):
    n0, n_gated, n_exact, n_surv, pairs, split = _pipeline(spark, sf_dir)

    # volumes only shrink, and every stage did real work on this corpus
    assert n0 >= n_gated >= n_exact >= n_surv
    assert n_surv > 0

    # near-dup guarantee: no surviving pair is a verified near-duplicate
    kept = {r["doc_id"] for r in split.select("doc_id").collect()}
    for r in pairs.collect():
        assert not (r["d1"] in kept and r["d2"] in kept), (r["d1"], r["d2"])

    # split: disjoint, exhaustive, deterministic, roughly 1/VAL_BUCKETS
    parts = {r["doc_id"]: r["part"] for r in split.select("doc_id", "part").collect()}
    assert set(parts) == kept
    n_val = sum(1 for p in parts.values() if p == "val")
    assert 0 < n_val < len(parts)
    assert abs(n_val / len(parts) - 1 / VAL_BUCKETS) < 0.1


def test_curation_pipeline_deterministic(spark, sf_dir):
    _, _, _, n1, _, split1 = _pipeline(spark, sf_dir)
    _, _, _, n2, _, split2 = _pipeline(spark, sf_dir)
    assert n1 == n2
    ids1 = sorted(r["doc_id"] for r in split1.where(F.col("part") == "val").collect())
    ids2 = sorted(r["doc_id"] for r in split2.where(F.col("part") == "val").collect())
    assert ids1 == ids2
