"""Long-bus law end-to-end (round 11, VERDICT r10 #3).

CURATION_PROBE_SCALE.json fixes the batch and grows the index;
CURATION_INGEST_SCALE.json grows the corpus over 4 slices.  Neither
shows a LONG stream — the curve the quadratic-total-I/O objection was
originally about: does the PER-BATCH wall stay flat (or log) as batch
number grows, with periodic index + sink compaction folded in?

Harness: N_BATCHES fixed-size micro-batches through the bus's own
per-batch body (``dedup_ingest_batch`` — the eager twin the streaming
machinery is identity-gated against).  Batch b is the same base doc
slice with every word suffixed by b, so batches are mutually
non-near-dup and the index GROWS by ~one batch of signatures per
batch — the adversarial regime for any O(index) probe.  Every
COMPACT_EVERY batches, ``compact_minhash_index`` (which also writes
the round-11 row-group manifest sidecar) and
``compact_curation_sinks`` run, timed separately — the bus's
maintenance cadence.

Each batch is pre-written to parquet and re-read so generation cost
never pollutes the measured wall, and the batch arrives file-backed
exactly as foreachBatch delivers it (the text-gate / local-tier paths
see their production shape).

Usage: python scripts/curation_longbus.py [out_json]
Env:   LONGBUS_BATCHES      (default 60)
       LONGBUS_BATCH_DOCS   (default 10000)
       LONGBUS_COMPACT_EVERY(default 20)
       LONGBUS_SF_DIR       (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import functions as F

    import frizzle_spark.operators.dedup as dd
    from frizzle_spark.sources.tables import load_table
    from frizzle_spark.session import get_spark
    from frizzle_spark.streaming.curation import dedup_ingest_batch
    from frizzle_spark.streaming.curation_compact import compact_curation_sinks

    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "CURATION_LONGBUS.json",
    )
    n_batches = int(os.environ.get("LONGBUS_BATCHES", "60"))
    batch_docs = int(os.environ.get("LONGBUS_BATCH_DOCS", "10000"))
    compact_every = int(os.environ.get("LONGBUS_COMPACT_EVERY", "20"))
    sf_dir = os.environ.get("LONGBUS_SF_DIR", "/root/testdata/sf0.1")

    os.environ["FRIZZLE_CURATION_PROFILE"] = "1"
    spark = get_spark("curation-longbus")
    spark.sparkContext.setLogLevel("ERROR")

    root = tempfile.mkdtemp(prefix="longbus_")
    index, outb, slices = f"{root}/index", f"{root}/out", f"{root}/slices"
    base_docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .orderBy("doc_id")
        .limit(batch_docs)
        .persist()
    )
    n_base = base_docs.count()
    rec: dict = {
        "n_batches": n_batches,
        "batch_docs": int(n_base),
        "compact_every": compact_every,
        "sf_dir": sf_dir,
        "batches": [],
        "compactions": [],
    }
    print(f"# {n_batches} batches x {n_base} docs", file=sys.stderr)

    for b in range(n_batches):
        # word-suffixed replica: every shingle differs from every other
        # batch's -> zero cross-batch near-dups, index grows per batch
        batch = base_docs.select(
            (F.col("doc_id") + b * 10_000_000).alias("doc_id"),
            F.concat_ws(
                " ",
                F.transform(
                    F.split(F.trim("text"), r"\s+"),
                    lambda w: F.concat(w, F.lit(str(b))),
                ),
            ).alias("text"),
        )
        p = f"{slices}/b{b}"
        batch.coalesce(1).write.mode("overwrite").parquet(p)
        bdf = spark.read.parquet(p)
        t0 = time.perf_counter()
        out = dedup_ingest_batch(spark, bdf, index, outb, b)
        wall = round(time.perf_counter() - t0, 3)
        row = {
            "batch": b,
            "wall_sec": wall,
            "n_in": out.get("n_in"),
            "n_kept": out.get("n_kept"),
            "phases": out.get("phases"),
        }
        rec["batches"].append(row)
        print(f"# {json.dumps(row)}", file=sys.stderr)
        if (b + 1) % compact_every == 0 and b + 1 < n_batches:
            t0 = time.perf_counter()
            cidx = dd.compact_minhash_index(spark, index)
            t1 = time.perf_counter()
            csink = compact_curation_sinks(spark, outb)
            crow = {
                "after_batch": b,
                "index_wall_sec": round(t1 - t0, 2),
                "sink_wall_sec": round(time.perf_counter() - t1, 2),
                "index_files": f"{cidx['files_before']}->{cidx['files_after']}",
                "band_rows": cidx["bands_rows"],
            }
            rec["compactions"].append(crow)
            print(f"# {json.dumps(crow)}", file=sys.stderr)

    walls = [r["wall_sec"] for r in rec["batches"]]
    k = max(1, len(walls) // 6)
    rec["summary"] = {
        "first_decile_median_sec": sorted(walls[:k])[k // 2],
        "last_decile_median_sec": sorted(walls[-k:])[k // 2],
        "max_batch_sec": max(walls),
        "total_docs_ingested": int(n_base) * n_batches,
    }
    print(f"# summary {json.dumps(rec['summary'])}", file=sys.stderr)
    with open(out_path, "w") as fh:
        json.dump(rec, fh, indent=1)
    print(json.dumps({"written": out_path, **rec["summary"]}))
    shutil.rmtree(root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
