"""Second-decade scaling harness (round 8): sf1 → sf10 curves.

scaling_sf1.py measured one decade (sf0.1 → sf1, 10×).  This harness
extends the heavy families a SECOND decade: a 100×-bench corpus
(sf10 — 500k documents, 200k embeddings, 10M events, 60M lineitem)
built by the same structure-preserving replication (``build_sf1`` with
``n_reps=100`` straight from sf0.1, so sf10 relates to sf1 exactly as
sf1 relates to sf0.1: fresh per-replica embeddings, cross-replica
shingle overlap killed, referentially-consistent star keys), then each
query measured at sf1 AND sf10 with wall + shuffle deltas.

Two-decade curves distinguish genuinely-linear operators from ones
whose sf0.1→sf1 ratio was flattered by fixed overhead: an operator
whose wall goes ~k× per decade at BOTH decades has a defensible
100 TB extrapolation; one whose second-decade ratio jumps superlinear
is hiding a term the first decade couldn't see.

The deliberate exact-n² oracle tiers (q11_embedding_neardup,
qz12_knn_graph and their consumers qz25_*) are excluded BY DESIGN:
their 100×-scale record is NEARDUP_CROSSOVER.json, which already
measures the exact grid to its ENOSPC wall and the LSH path beyond it.
qz12_matryoshka is excluded for the same reason (its sf1 shuffle is
already 2.1 GB of eval grid; the operator's scale mode is sample_n).

Usage: python scripts/scaling_sf10.py [out_json]
Env: FRIZZLE_SF1_DIR (default /tmp/frizzle_sf1),
     FRIZZLE_SF10_DIR (default /tmp/frizzle_sf10),
     FRIZZLE_SCALE_ONLY=q1,q2 to subset, SPARK_GRAFT_BENCH_RUNS.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from scaling_sf1 import SF01, build_sf1, shuffle_totals  # noqa: E402

QUERIES = [
    # star schema (60M-row lineitem at sf10)
    "q1_pricing_summary",
    "q3_top_orders",
    "q16_asof_join",
    "qz27_waiting_suppliers",
    "qz27_priority_check",
    # events (10M rows, 1.5M users)
    "q10_session_windows",
    "qz10_sessionize",
    "qz10_peak_concurrency",
    "qz10_streaks",
    # dedup (500k documents)
    "q11_exact_dedup",
    "qz11_minhash_lsh",
    "qz11_simhash",
    "qz11_repeated_ngrams",
    "qz11_jaccard_join",
    # text / tokens
    "qz14_bm25",
    "qz14_bpe_encode",
    "qz22_token_budget_bpe",
    # similarity (200k embeddings) — bucketed tiers + the broadcast-probe
    # exact scan (single corpus pass, the only exact tier that scales)
    "q12_cosine_topk",
    "qz12_ann_lsh",
    "qz12_ivf",
    "qz12_sq8",
    # profiling (value-domain-bounded grids)
    "qz23_ks_test",
    "qz23_entropy",
]


def main() -> None:
    out_json = sys.argv[1] if len(sys.argv) > 1 else "SCALE_SF10.json"
    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "48g")
        .appName("frizzle-scaling-sf10")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    import urllib.request

    with urllib.request.urlopen(f"{ui}/api/v1/applications") as r:
        app_id = json.load(r)[0]["id"]
    app_base = f"{ui}/api/v1/applications/{app_id}"

    sf1 = os.environ.get("FRIZZLE_SF1_DIR", "/tmp/frizzle_sf1")
    sf10 = os.environ.get("FRIZZLE_SF10_DIR", "/tmp/frizzle_sf10")
    for base, n_reps in ((sf1, 10), (sf10, 100)):
        if not all(
            os.path.exists(f"{base}/{t}.parquet")
            for t in ("documents", "embeddings", "events", "lineitem")
        ):
            t0 = time.time()
            build_sf1(spark, base, n_reps=n_reps, src=SF01)
            print(
                f"# {base} ({n_reps}x sf0.1) built in {time.time()-t0:.1f}s",
                file=sys.stderr,
            )

    import __spark_entry__ as entry

    qs = entry.queries()
    n_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2")))
    only = os.environ.get("FRIZZLE_SCALE_ONLY")
    names = [q for q in QUERIES if q in only.split(",")] if only else QUERIES
    results: dict[str, dict] = {}
    for name in names:
        row: dict = {}
        for tag, sf_dir in (("sf1", sf1), ("sf10", sf10)):
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
                    time.sleep(0.3)
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
        a, b = row.get("sf1", {}), row.get("sf10", {})
        if "wall_s" in a and "wall_s" in b:
            row["wall_ratio"] = round(b["wall_s"] / max(a["wall_s"], 1e-9), 2)
            row["shuffle_ratio"] = round(
                b["shuffle_read_b"] / max(a["shuffle_read_b"], 1), 2
            )
        results[name] = row
    with open(out_json, "w") as fh:
        json.dump({"sf1_dir": sf1, "sf10_dir": sf10, "results": results}, fh, indent=1)
    print(json.dumps({k: v.get("wall_ratio") for k, v in results.items()}))


if __name__ == "__main__":
    main()
