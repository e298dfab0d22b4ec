"""Scaling-curve harness (VERDICT r6 #3): run the heavy operator
families at sf0.1 AND at a 10×-scaled synthetic sf1, record wall time
and shuffle bytes per query, and print the ratio table for SCALE.md.

sf1 is derived from the driver's sf0.1 tables by 10× replication with
structure-preserving mutation (so the workload SHAPE scales, not the
duplicate structure):

* documents — replica k offsets doc_id and rewrites every 2nd word
  with a replica-salted variant, which kills all 3-gram shingle overlap
  ACROSS replicas (otherwise every doc gains 9 exact near-dups and pair
  counts scale ~45×, measuring a different problem) while keeping word
  counts — and therefore shingle volume — at an exact 10×;
* embeddings — replica k offsets vec_id and draws a FRESH seeded
  random unit vector (matching the original corpus's structureless
  distribution; additive noise at any moderate σ leaves same-original
  replicas at cos 0.2–0.5, which straddles the 0.4 near-dup threshold
  and manufactures ~100k borderline pairs — a different workload);
* events — replica k offsets event_id/user_id, same time range → 10×
  the users and 10× the per-window density.

Every query runs SPARK_GRAFT_BENCH_RUNS (default 2) times per scale;
min is reported.  Shuffle bytes come from the UI REST API summed over
completed stages, diffed around each query.  Usage:

    python scripts/scaling_sf1.py [out_json]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF01 = "/root/testdata/sf0.1"

HEAVY = [
    # dedup suite
    "q11_exact_dedup",
    "q11_ngram_jaccard",
    "qz11_minhash_lsh",
    "qz11_simhash",
    "qz11_dup_clusters",
    "qz11_canonical_keep",
    "qz11_chunk_dedup",
    # PPJoin
    "qz11_jaccard_join",
    # kNN + PageRank (exact GEMM grid is the documented n² oracle tier)
    "qz12_knn_graph",
    "qz25_pagerank",
    # ANN tiers + exact twins
    "qz12_ann_lsh",
    "qz12_ivf",
    "qz12_ivfpq",
    "qz12_sq8",
    "q12_cosine_topk",
    "q11_embedding_neardup",
    "qz11_embedding_neardup_lsh",
    # windowed analytics
    "q10_tumbling_windows",
    "q10_sliding_windows",
    "q10_session_windows",
    "qz10_sessionize",
    "qz10_windowed_topk",
    # round-7 profilers: the KS/chi2 grids are bounded by the VALUE
    # DOMAIN, so 10× rows should scale sublinearly after the first pass
    "qz23_ks_test",
    "qz23_chi2",
    "qz23_embedding_dispersion",
    "qz23_benford",
    "qz23_entropy",
    "qz22_temporal_split",
    # round-7 retrieval/graph additions (embeddings-scaled)
    "qz12_range_search",
    "qz12_mips",
    "qz25_ppr",
    # round-7 second wave (events- and embeddings-scaled)
    "qz23_cusum",
    "qz10_autocorr",
    "qz23_mad_outliers",
    "qz25_triangles",
    "qz12_kmeans",
    # star-schema tier (real 10× tables since the referential
    # replication landed in build_sf1)
    "q1_pricing_summary",
    "q2_revenue_by_nation",
    "q3_top_orders",
    "q16_asof_join",
    "qz26_copurchase",
    "qz16_band_join",
    "qz26_bitmap_semijoin",
    "qz26_fuzzy_join",
    # round-7 third wave: TPC-H completion block (star-schema tier),
    # PCA/LPA (embeddings-scaled), ordered-set aggregates (events-scaled
    # per-group sort — the exact tier whose sf1 curve justifies the
    # sketch tier)
    "qz27_volume_shipping",
    "qz27_big_orders",
    "qz27_small_qty_rev",
    "qz12_pca",
    "qz25_communities",
    "qz28_ordered_set_aggs",
    "qz14_bpe_pairs",
    "qz11_repeated_ngrams",
    # round-7 fourth wave
    "qz14_collocations",
    "qz12_matryoshka",
    "qz27_late_shipments",
    "qz26_cohort_ltv",
    "qz10_attribution",
    "qz28_quantile_2pass",
    # round-7 closing wave
    "qz11_containment",
    "qz10_lifecycle",
    "qz10_sliding_distinct",
    "qz14_readability",
    "qz7_contribution",
    "qz20_division",
    "qz26_basket_rules",
    "qz10_purchase_gaps",
    "qz12_ood_score",
    "qz16_asof_forward",
    # round-7 final wave: Q21/Q4 decorrelations + sweep line +
    # gaps-and-islands (star/events-scaled), FK audit (all tables),
    # corpus-grain vocabulary overlap (documents-scaled)
    "qz27_waiting_suppliers",
    "qz27_priority_check",
    "qz10_peak_concurrency",
    "qz10_streaks",
    "qz23_ref_integrity",
    "qz14_source_overlap",
    # round-8: true-token-space tier (documents-scaled; the encode pass
    # is vocab-bounded so 10× corpus should cost ≪ 10×)
    "qz14_bpe_encode",
    "qz22_token_budget_bpe",
]


def build_sf1(spark, base: str, n_reps: int = 10, src: str = SF01) -> None:
    """Replicate the ``src`` corpus ``n_reps``× with structure-preserving
    mutation (docstring above).  n_reps=10 from sf0.1 is the sf1 build;
    n_reps=100 from sf0.1 is the sf10 build (scripts/scaling_sf10.py) —
    the per-table key offsets accommodate up to ~100 replicas of sf0.1
    (max source keys: doc 5k<10k, custkey 15k<100k, orderkey<1M)."""
    from pyspark.sql import functions as F

    k_lit = F.col("_k")
    reps = spark.range(n_reps).select(F.col("id").cast("int").alias("_k"))

    docs = spark.read.parquet(f"{src}/documents.parquet")
    ws = F.split(F.trim(F.col("text")), r"\s+")
    salt = F.concat(F.lit("r"), k_lit.cast("string"))
    # replica 0 keeps the original text; k>0 salts every 2nd word (no
    # 3 consecutive originals survive → zero cross-replica shingles)
    mutated = F.when(k_lit == 0, F.col("text")).otherwise(
        F.array_join(
            F.transform(
                ws,
                lambda w, i: F.when((i % 2) == 1, F.concat(w, salt)).otherwise(w),
            ),
            " ",
        )
    )
    (
        docs.crossJoin(reps)
        .select(
            (F.col("doc_id") + k_lit.cast("long") * 10_000).alias("doc_id"),
            mutated.alias("text"),
            "lang",
            "source",
            F.length(mutated).alias("n_chars"),
        )
        .repartition(16).write.mode("overwrite")
        .parquet(f"{base}/documents.parquet")
    )

    emb = spark.read.parquet(f"{src}/embeddings.parquet").crossJoin(reps).select(
        (F.col("vec_id") + k_lit.cast("long") * 2_000).alias("vec_id"),
        "embedding",
        "label",
        k_lit,
    )

    def perturb(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            out = []
            for vid, vec, k in zip(pdf["vec_id"], pdf["embedding"], pdf["_k"]):
                v = np.asarray(vec, dtype=np.float64)
                if k > 0:
                    v = np.random.RandomState(int(vid)).randn(len(v))
                n = np.linalg.norm(v)
                out.append([float(x) for x in (v / n if n else v)])
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"], "embedding": out, "label": pdf["label"]}
            )

    emb.mapInPandas(
        perturb, "vec_id long, embedding array<float>, label int"
    ).repartition(16).write.mode("overwrite").parquet(f"{base}/embeddings.parquet")

    ev = spark.read.parquet(f"{src}/events.parquet")
    (
        ev.crossJoin(reps)
        .select(
            (F.col("event_id") + k_lit.cast("long") * 1_000_000).alias("event_id"),
            "ts",
            (F.col("user_id") + k_lit.cast("long") * 100_000).alias("user_id"),
            "event_type",
            "value",
            "props",
        )
        .repartition(16).write.mode("overwrite")
        .parquet(f"{base}/events.parquet")
    )
    # Star schema: 10× replication with REFERENTIALLY-CONSISTENT key
    # offsets (replica k of an order points at replica k of its
    # customer/parts/suppliers), so join hit rates and per-key
    # cardinalities survive the scale-up — q1/q2/q3, the basket/band/
    # bitmap family and the as-of join all get true 10× points.
    # Offsets = 10^ceil(log10(max_key+1)) per table.
    C_OFF, S_OFF, P_OFF, O_OFF = 100_000, 1_000, 100_000, 1_000_000

    def replicate(table: str, offsets: dict[str, int]) -> None:
        dst = f"{base}/{table}.parquet"
        if os.path.islink(dst):  # upgrade an old symlinked build
            os.unlink(dst)
        df = spark.read.parquet(f"{src}/{table}.parquet")
        cols = [
            (F.col(c) + k_lit.cast("long") * offsets[c]).alias(c)
            if c in offsets
            else F.col(c)
            for c in df.columns
        ]
        df.crossJoin(reps).select(*cols).repartition(16).write.mode("overwrite").parquet(dst)

    replicate("customer", {"c_custkey": C_OFF})
    replicate("supplier", {"s_suppkey": S_OFF})
    replicate("part", {"p_partkey": P_OFF})
    replicate("orders", {"o_orderkey": O_OFF, "o_custkey": C_OFF})
    replicate(
        "lineitem",
        {"l_orderkey": O_OFF, "l_partkey": P_OFF, "l_suppkey": S_OFF},
    )
    # true dims stay shared
    for t in ("region", "nation"):
        dst = f"{base}/{t}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{src}/{t}.parquet", dst)


def shuffle_totals(app_base: str) -> tuple[int, int]:
    with urllib.request.urlopen(f"{app_base}/stages?status=complete") as r:
        stages = json.load(r)
    return (
        sum(s.get("shuffleReadBytes", 0) for s in stages),
        sum(s.get("shuffleWriteBytes", 0) for s in stages),
    )


def main() -> None:
    out_json = sys.argv[1] if len(sys.argv) > 1 else "SCALE_SF1.json"
    import tempfile

    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "48g")
        .appName("frizzle-scaling-sf1")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    with urllib.request.urlopen(f"{ui}/api/v1/applications") as r:
        app_id = json.load(r)[0]["id"]
    app_base = f"{ui}/api/v1/applications/{app_id}"

    base = os.environ.get("FRIZZLE_SF1_DIR") or tempfile.mkdtemp(prefix="sf1_")
    if not all(
        os.path.exists(f"{base}/{t}.parquet")
        for t in ("documents", "embeddings", "events")
    ) or os.path.islink(f"{base}/customer.parquet"):  # pre-star-schema build
        t0 = time.time()
        build_sf1(spark, base)
        print(f"# sf1 built at {base} in {time.time()-t0:.1f}s", file=sys.stderr)

    import __spark_entry__ as entry

    qs = entry.queries()
    n_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2")))
    only = os.environ.get("FRIZZLE_SCALE_ONLY")
    heavy = [q for q in HEAVY if q in only.split(",")] if only else HEAVY
    results: dict[str, dict] = {}
    for name in heavy:
        row: dict = {}
        for tag, sf_dir in (("sf0.1", SF01), ("sf1", base)):
            walls, sh = [], None
            try:
                for _ in range(n_runs):
                    r0, w0 = shuffle_totals(app_base)
                    t0 = time.perf_counter()
                    # noop sink, NOT count(): Catalyst constant-folds
                    # 1-row aggregates and can prune window subtrees
                    # under count() (round-9 bench-action correction,
                    # SCALE.md) — the noop write executes the full plan
                    qs[name](spark, sf_dir).write.format("noop").mode(
                        "overwrite"
                    ).save()
                    wall = time.perf_counter() - t0
                    time.sleep(0.3)  # let the status store settle
                    r1, w1 = shuffle_totals(app_base)
                    walls.append(round(wall, 2))
                    if sh is None or (r1 - r0) < sh[0]:
                        sh = (r1 - r0, w1 - w0)
            except Exception as ex:
                row[tag] = {"err": f"{type(ex).__name__}: {ex}"[:200]}
                print(f"# {name} {tag}: ERROR {row[tag]['err']}", file=sys.stderr)
                continue
            row[tag] = {
                "wall_s": min(walls),
                "walls": walls,
                "shuffle_read_b": sh[0],
                "shuffle_write_b": sh[1],
            }
            print(f"# {name} {tag}: {min(walls)}s shuffle_r {sh[0]:,}", file=sys.stderr)
        a, b = row.get("sf0.1", {}), row.get("sf1", {})
        if "wall_s" in a and "wall_s" in b:
            row["wall_ratio"] = round(b["wall_s"] / max(a["wall_s"], 1e-9), 2)
            row["shuffle_ratio"] = round(
                b["shuffle_read_b"] / max(a["shuffle_read_b"], 1), 2
            )
        results[name] = row
    with open(out_json, "w") as fh:
        json.dump({"sf1_dir": base, "results": results}, fh, indent=1)
    print(json.dumps({k: v.get("wall_ratio") for k, v in results.items()}))


if __name__ == "__main__":
    main()
