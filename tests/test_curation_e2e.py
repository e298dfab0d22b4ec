"""End-to-end INCREMENTAL curation composition (round 9, VERDICT r8 #5).

Every incremental piece has its own identity gate (MinHash index probe,
cluster-index append, canonical keep, leakage-safe split) — this module
drives ONE new-crawl slice through the whole chain *composed* and
asserts the result equals recomputing everything from scratch over the
union corpus:

    base corpus ──materialize_minhash_index──▶ band/sig index
    new slice  ──incremental_neardup──▶ cross pairs (new vs indexed)
               ──minhash_pairs_of────▶ within-slice pairs (new vs new)
    cross ∪ within ──append_cluster_index──▶ updated cluster map
    updated map ──canonical_keep / qz22_leakage_safe_split──▶ survivors,
                                                              splits

vs the full rebuild: minhash_pairs_of(base ∪ slice) →
materialize_cluster_index → the same consumers.  Equality is exact —
the incremental pair set (base∪cross∪within) is the same band-collision
set the batch run finds over the union (signatures are a pure function
of text; banding is a pure function of signatures), and the append's
rep-projection preserves union-find connectivity and rep minimality
(its own identity gate) — so survivors AND split assignments must match
row-for-row, which is the property that makes incremental curation
trustworthy at 100 TB: a nightly crawl append yields the same corpus a
monthly full rebuild would.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from frizzle_spark.operators.dedup import (
    append_cluster_index,
    canonical_keep,
    incremental_neardup,
    materialize_cluster_index,
    materialize_minhash_index,
    minhash_pairs_of,
)
from frizzle_spark.plans.sql_surface import qz22_leakage_safe_split
from frizzle_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def curation_world(spark, sf_dir, tmp_path_factory):
    """(union_dir, incr_cluster_base, full_cluster_base): the composed
    incremental chain and the from-scratch rebuild over the same union
    corpus, built once for all assertions."""
    root = tmp_path_factory.mktemp("curation_e2e")
    base_docs = load_table(spark, sf_dir, "documents")

    # the new crawl: near-dup mutations of the 10 longest base docs
    # (guaranteed above the Jaccard threshold), 2 genuinely fresh docs,
    # and a within-slice near-dup pair that only new-vs-new dedup finds
    long_docs = (
        base_docs.where(F.size(F.split(F.trim("text"), r"\s+")) >= 30)
        .orderBy(F.desc("doc_id"))
        .limit(10)
    )
    mutated = long_docs.select(
        (F.col("doc_id") + F.lit(1_000_000)).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" recrawled")).alias("text"),
    )
    seed_txt = long_docs.orderBy("doc_id").limit(1).collect()[0]["text"]
    extra = spark.createDataFrame(
        [
            (2_000_001, "completely fresh crawl document one of a kind alpha"),
            (2_000_002, "another unrelated brand new page beta gamma delta"),
            (3_000_001, seed_txt + " twin one"),
            (3_000_002, seed_txt + " twin two"),
        ],
        "doc_id long, text string",
    )
    slice_docs = mutated.unionByName(extra)

    # union corpus on disk — both paths' consumers read the same dir
    union_dir = str(root / "union")
    base_docs.select("doc_id", "text").unionByName(slice_docs).write.parquet(
        f"{union_dir}/documents.parquet"
    )

    # ---- incremental path ----
    mh_base = str(root / "mh_index")
    materialize_minhash_index(base_docs, mh_base)
    incr_cl = str(root / "clusters_incr")
    materialize_cluster_index(
        minhash_pairs_of(base_docs).select("d1", "d2"), incr_cl
    )
    cross = incremental_neardup(spark, slice_docs, mh_base).select(
        F.col("new_id").alias("d1"), F.col("old_id").alias("d2")
    )
    within = minhash_pairs_of(slice_docs).select("d1", "d2")
    append_cluster_index(spark, cross.unionByName(within), incr_cl)

    # ---- full rebuild ----
    full_cl = str(root / "clusters_full")
    union_docs = load_table(spark, union_dir, "documents")
    materialize_cluster_index(
        minhash_pairs_of(union_docs).select("d1", "d2"), full_cl
    )
    return union_dir, incr_cl, full_cl


def test_incremental_chain_fires(spark, curation_world):
    """Sanity that the composition exercises every mechanism: mutated
    docs cluster with their sources (cross pairs), the twin pair
    clusters together (within-slice pairs), fresh docs stay singleton."""
    from frizzle_spark.operators.dedup import load_cluster_index

    _, incr_cl, _ = curation_world
    m = {
        r["doc_id"]: r["cluster_rep"]
        for r in load_cluster_index(spark, incr_cl).collect()
    }
    mutated_ids = [d for d in m if 1_000_000 <= d < 2_000_000]
    assert len(mutated_ids) >= 8  # cross-pair dedup found the sources
    for d in mutated_ids:
        assert m[d] == m.get(d - 1_000_000, m[d] + 1) or m[d] < 1_000_000
    assert m.get(3_000_002) is not None  # twins clustered (new-vs-new)
    assert 2_000_001 not in m and 2_000_002 not in m  # fresh = singleton


def test_incremental_equals_full_rebuild_clusters(spark, curation_world):
    from frizzle_spark.operators.dedup import load_cluster_index

    _, incr_cl, full_cl = curation_world
    incr = {
        (r["doc_id"], r["cluster_rep"])
        for r in load_cluster_index(spark, incr_cl).collect()
    }
    full = {
        (r["doc_id"], r["cluster_rep"])
        for r in load_cluster_index(spark, full_cl).collect()
    }
    assert incr == full and len(incr) > 0


def test_incremental_equals_full_rebuild_survivors(spark, curation_world):
    """canonical_keep over the appended index == over the rebuilt one:
    identical survivor per cluster, identical doc→keeper map."""
    union_dir, incr_cl, full_cl = curation_world
    incr = {
        (r["doc_id"], r["keep_id"])
        for r in canonical_keep(spark, union_dir, index_base=incr_cl).collect()
    }
    full = {
        (r["doc_id"], r["keep_id"])
        for r in canonical_keep(spark, union_dir, index_base=full_cl).collect()
    }
    assert incr == full and len(incr) > 0


def test_incremental_equals_full_rebuild_split(spark, curation_world):
    """Leakage-safe split assignments identical — a doc's split never
    depends on whether its cluster arrived incrementally or by rebuild
    (and base docs whose cluster was EXTENDED by the crawl keep a
    rep-consistent assignment in both)."""
    union_dir, incr_cl, full_cl = curation_world
    incr = {
        r["doc_id"]: (r["split"], r["cluster_rep"])
        for r in qz22_leakage_safe_split(
            spark, union_dir, index_base=incr_cl
        ).collect()
    }
    full = {
        r["doc_id"]: (r["split"], r["cluster_rep"])
        for r in qz22_leakage_safe_split(
            spark, union_dir, index_base=full_cl
        ).collect()
    }
    assert incr == full and len(incr) > 0
