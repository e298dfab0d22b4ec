"""Probe-wall-vs-index-size record for the curation bus's index probe
(round 10, VERDICT r9 item #1).

The claim under test: per-batch probe cost is O(batch + collisions),
NOT O(index) — i.e. a FIXED probe batch stays (near-)flat while the
stored MinHash index grows 10x/100x.  The mechanism is the layout +
tier work in operators/dedup.py:

* bands sorted by band_hash with small row groups -> parquet min/max
  statistics cover narrow disjoint ranges;
* the "rowgroup" tier reads only row groups whose range intersects the
  batch's hashes (I/O floor = batch_keys x row-group rows, independent
  of index size once the index has more row groups than the batch has
  hashes);
* the "bitmap" tier pre-thins the full scan before any shuffle (scan
  stays O(index) but the join sees only collisions);
* "full" is the unpruned baseline the identity gates compare against.

Index decades are built by replicating the sf0.1 corpus's REAL MinHash
signatures with per-replica value perturbation (uniform hash layout, no
planted cross-replica duplicates), written through the same
``append_minhash_index_local`` writer the bus uses — so file/row-group
shape matches a long-running bus's accumulated appends.  The probe
batch is 200 mutated real docs, so every decade sees the same ~200 true
collisions.

Beside each wall the record carries the pruning WITNESS
(``rowgroup_prune_stats``): rows the rowgroup tier reads vs the index
total — the number that must flatten.

Usage: python scripts/curation_probe_scale.py [out_json]
Env:   PROBE_SCALE_REPS   — comma-separated replica factors (default 1,10,100)
       PROBE_SCALE_SF_DIR — source tables (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PROBE_DOCS = 200
CHUNK_DOCS = 50_000  # per local-append write chunk (bus-like file shape)


def main() -> None:
    import numpy as np
    from pyspark.sql import functions as F

    import frizzle_spark.operators.dedup as dd
    from frizzle_spark.session import get_spark

    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "CURATION_PROBE_SCALE.json",
    )
    sf_dir = os.environ.get("PROBE_SCALE_SF_DIR", "/root/testdata/sf0.1")
    reps = [
        int(x)
        for x in os.environ.get("PROBE_SCALE_REPS", "1,10,100").split(",")
    ]

    spark = get_spark("curation-probe-scale")
    spark.sparkContext.setLogLevel("ERROR")
    docs = dd.load_table(spark, sf_dir, "documents").select("doc_id", "text")

    # real signatures, once
    tb = dd.minhash_signatures(dd.shingles_of(docs, distinct=False)).toArrow()
    ids = tb["doc_id"].to_numpy().astype(np.int64)
    mat = np.column_stack(
        [tb[f"h{k}"].to_numpy(zero_copy_only=False)
         for k in range(dd.MINHASH_PERMS)]
    ).astype(np.int64)
    n0 = ids.size
    print(f"# base signatures: {n0}", file=sys.stderr)

    # fixed probe batch: mutated copies of real docs -> ~PROBE_DOCS true
    # collisions at every index size
    probe = (
        docs.orderBy("doc_id")
        .limit(PROBE_DOCS)
        .select(
            (F.col("doc_id") + F.lit(10_000_000)).alias("doc_id"),
            F.concat("text", F.lit(" probescale")).alias("text"),
        )
        .persist()
    )
    probe.count()

    golden = 0x9E3779B97F4A7C15
    records = []
    for R in reps:
        base = tempfile.mkdtemp(prefix=f"probe_scale_{R}x_")
        t0 = time.perf_counter()
        written = 0
        for r in range(R):
            # per-replica perturbation: uniform layout, replicas are NOT
            # near-dups of each other (multiply-mix each minimum)
            if r == 0:
                m = mat
            else:
                u = mat.view(np.uint64)
                m = (
                    (u * np.uint64(golden)) ^ np.uint64(r * 0x2545F4914F6CDD1D)
                ).view(np.int64)
            off = ids + np.int64(r) * np.int64(1_000_000)
            for lo in range(0, n0, CHUNK_DOCS):
                hi = min(n0, lo + CHUNK_DOCS)
                written += dd.append_minhash_index_local(
                    off[lo:hi], m[lo:hi], base
                )
        build_wall = round(time.perf_counter() - t0, 2)

        files = dd._list_index_files(f"{base}/bands", "band_id")
        idx_bytes = sum(os.stat(p).st_size for p, _ in files)

        tiers = {}
        n_pairs = {}
        for mode in ("full", "bitmap", "rowgroup"):
            walls = []
            for _ in range(2):
                t0 = time.perf_counter()
                n = dd.incremental_neardup(
                    spark, probe, base, probe_mode=mode
                ).count()
                walls.append(time.perf_counter() - t0)
            tiers[mode] = round(min(walls), 3)
            n_pairs[mode] = n

        # the witness: what the rowgroup tier READS
        psigs = dd.minhash_signatures(
            dd.shingles_of(probe, distinct=False)
        )
        keys = [
            r[0]
            for r in dd.band_buckets(psigs)
            .select("band_hash").distinct().collect()
        ]
        witness = dd.rowgroup_prune_stats(
            f"{base}/bands", "band_hash", keys, part_col="band_id"
        )

        assert len(set(n_pairs.values())) == 1, f"tier pair mismatch {n_pairs}"
        rec = {
            "replicas": R,
            "index_docs": int(n0 * R),
            "index_band_rows": int(written * dd.LSH_BANDS),
            "index_bytes": int(idx_bytes),
            "index_files": len(files),
            "build_wall_sec": build_wall,
            "probe_docs": PROBE_DOCS,
            "probe_band_keys": len(keys),
            "n_pairs": n_pairs["full"],
            "probe_wall_sec": tiers,
            "rows_read_rowgroup": witness["rows_read"],
            "rows_total": witness["rows_total"],
            "read_fraction": round(
                witness["rows_read"] / max(1, witness["rows_total"]), 4
            ),
            "row_groups_read": witness["row_groups_read"],
            "row_groups_total": witness["row_groups_total"],
        }
        records.append(rec)
        print(json.dumps(rec), file=sys.stderr)

    with open(out_path, "w") as fh:
        json.dump(records, fh, indent=1)
    print(json.dumps({"written": out_path, "n": len(records)}))
    spark.stop()


if __name__ == "__main__":
    main()
