"""Isolated scaling record for the continuous-curation bus (round 9).

The registry entry (qz13_curation_ingest) rides the co-tenant bench; this
harness gives the operator the same treatment the bus (bench_stream.py)
and the stateful tier (stream_state_scale.py) got: a fresh session per
scale factor, per-slice walls measured INSIDE the micro-batch loop, and
throughput/selectivity beside them, so the decade curve separates the
fixed per-batch overhead (flat, dominates ≤sf0.1) from the data-bound
regime (linear, from sf1).

Per SF it records: per-slice wall + rows-in + rows-kept (the slice the
index grows by), total ingest wall, docs/sec, DLQ split by reason, and
the final index size.  The interesting scale property: slice k's probe
joins against an index holding only SURVIVORS of slices < k, so a
duplicate-heavy corpus pays probe cost sublinear in raw history.

Usage: python scripts/curation_ingest_scale.py [out_json]
Env:   CURATION_SF_DIRS — comma-separated table dirs
       (default /root/testdata/sf0.1,/tmp/frizzle_sf1,/tmp/frizzle_sf10)
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_SLICES = 4


def run_one(sf_dir: str, keep: str = "min_id") -> dict:
    from pyspark.sql import functions as F

    import frizzle_spark.streaming.curation as cur
    from frizzle_spark.session import get_spark
    from frizzle_spark.sources.tables import load_table

    spark = get_spark(
        f"curation-scale-{keep}-{os.path.basename(sf_dir.rstrip('/'))}"
    )
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    base = tempfile.mkdtemp(prefix="curation_scale_")
    replay, index, out, ckpt = (
        f"{base}/replay", f"{base}/index", f"{base}/out", f"{base}/ckpt",
    )
    pinned: set[str] = set()
    for k in range(N_SLICES):
        docs.where(F.col("doc_id") % N_SLICES == k).coalesce(1).write.mode(
            "append"
        ).parquet(replay)
        for f in sorted(os.listdir(replay)):
            if f.startswith(("_", ".")) or f in pinned:
                continue
            os.utime(os.path.join(replay, f), (1_000_000_000 + k * 60,) * 2)
            pinned.add(f)

    # time each micro-batch from inside the loop: wrap the batch body
    # (the wrapper only observes — the commit protocol is untouched)
    slice_walls: list[dict] = []
    inner = cur.dedup_ingest_batch

    def timed_batch(spark_, bdf, index_base, out_base, batch_id, **kw):
        t0 = time.perf_counter()
        res = inner(spark_, bdf, index_base, out_base, batch_id, **kw)
        res["wall_sec"] = round(time.perf_counter() - t0, 3)
        slice_walls.append(res)
        return res

    cur.dedup_ingest_batch = timed_batch
    try:
        t0 = time.perf_counter()
        cur.stream_dedup_ingest(
            spark, replay, "doc_id long, text string", index, out, ckpt,
            keep=keep,
        )
        total = round(time.perf_counter() - t0, 3)
    finally:
        cur.dedup_ingest_batch = inner

    assign = cur.ingest_assignment(spark, out)
    by = {
        (r["dest"], r["reason"]): r["n"]
        for r in assign.groupBy("dest", "reason").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    }
    n_docs = sum(by.values())
    index_rows = spark.read.parquet(f"{index}/signatures").count()
    rec = {
        "sf_dir": sf_dir,
        "keep": keep,
        "n_docs": n_docs,
        "n_kept": by.get(("corpus", None), 0),
        "n_dup_index": by.get(("dlq", "dup_index"), 0),
        "n_dup_batch": by.get(("dlq", "dup_batch"), 0),
        "index_rows": index_rows,
        "total_wall_sec": total,
        "docs_per_sec": round(n_docs / total, 1) if total else None,
        "slices": slice_walls,
    }
    spark.stop()
    return rec


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "CURATION_INGEST_SCALE.json",
    )
    dirs = os.environ.get(
        "CURATION_SF_DIRS",
        "/root/testdata/sf0.1,/tmp/frizzle_sf1,/tmp/frizzle_sf10",
    ).split(",")
    records = []
    for d in dirs:
        if not os.path.isdir(d):
            print(f"# skip {d}: not found", file=sys.stderr)
            continue
        # both survivor rules per decade (round 10, VERDICT r9 #6):
        # min_id is the deterministic registry rule; quality is the
        # rule real curation runs (adds a per-cluster quality pick)
        for keep in os.environ.get("CURATION_KEEP", "min_id,quality").split(","):
            print(f"# ingesting {d} keep={keep} ...", file=sys.stderr)
            rec = run_one(d, keep=keep)
            records.append(rec)
            print(json.dumps(rec), file=sys.stderr)
    with open(out_path, "w") as fh:
        json.dump(records, fh, indent=1)
    print(json.dumps({"written": out_path, "n": len(records)}))


if __name__ == "__main__":
    main()
