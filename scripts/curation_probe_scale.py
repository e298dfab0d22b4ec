"""Probe-wall-vs-index-size record for the curation bus's index probe
(round 10, VERDICT r9 item #1).

The claim under test: per-batch probe cost is O(batch + collisions),
NOT O(index) — a FIXED probe batch stays (near-)flat while the stored
MinHash index grows 10x/100x/1000x.  Two mechanisms compose
(operators/dedup.py):

* the "rowgroup" probe tier reads only parquet row groups whose
  band_hash [min,max] intersects the batch's hashes — I/O floor =
  batch_keys x row-group rows, INDEPENDENT of index size — with the
  "bitmap" broadcast pre-thin and the plain "full" join as the
  over-cap / small-index tiers;
* ``compact_minhash_index``: every bus append adds one file per band
  whose rows span the FULL hash range (minima are uniform), so an
  append-accumulated index defeats range statistics no matter how the
  probe reads it.  Compaction repartitions by range + sorts, making
  files and row groups narrow and disjoint again.

So the record measures BOTH layouts per decade: the append-shaped
index exactly as the bus leaves it (one ``append_minhash_index_local``
call per replica, the bus's own writer), and the compacted index.  The
flat curve is rowgroup-on-compacted; append-shaped rowgroup degrading
toward the full scan is the measured justification for compaction.
Probes run at two fixed batch sizes (20 and 200 docs — real mutated
docs, so every decade sees the same true collisions), because the
pruning law bends where index row groups outnumber batch keys.

Beside each wall: the pruning WITNESS (``rowgroup_prune_stats``) —
fraction of index rows the rowgroup tier reads.

Usage: python scripts/curation_probe_scale.py [out_json]
Env:   PROBE_SCALE_REPS   — replica factors (default 1,10,100,1000)
       PROBE_SCALE_SF_DIR — source tables (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PROBE_SIZES = (20, 200)


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
        for x in os.environ.get("PROBE_SCALE_REPS", "1,10,100,1000").split(",")
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

    # fixed probe batches: mutated copies of real docs -> same true
    # collision count at every index size
    probes = {}
    probe_keys = {}
    for p in PROBE_SIZES:
        pdf = (
            docs.orderBy("doc_id")
            .limit(p)
            .select(
                (F.col("doc_id") + F.lit(10_000_000)).alias("doc_id"),
                F.concat("text", F.lit(" probescale")).alias("text"),
            )
            .persist()
        )
        pdf.count()
        probes[p] = pdf
        psigs = dd.minhash_signatures(dd.shingles_of(pdf, distinct=False))
        km: dict[int, list[int]] = {}
        for b, h in (
            dd.band_buckets(psigs)
            .select("band_id", "band_hash").distinct().collect()
        ):
            km.setdefault(int(b), []).append(h)
        probe_keys[p] = km

    def measure(base: str, modes) -> dict:
        out = {}
        pairs = {}
        for p, pdf in probes.items():
            tiers = {}
            for mode in modes:
                walls = []
                for _ in range(2):
                    t0 = time.perf_counter()
                    n = dd.incremental_neardup(
                        spark, pdf, base, probe_mode=mode
                    ).count()
                    walls.append(time.perf_counter() - t0)
                tiers[mode] = round(min(walls), 3)
                pairs.setdefault(p, set()).add(n)
            w = dd.rowgroup_prune_stats(
                f"{base}/bands", "band_hash", probe_keys[p],
                part_col="band_id",
            )
            out[str(p)] = {
                "wall_sec": tiers,
                "n_pairs": max(pairs[p]),
                "read_fraction": round(
                    w["rows_read"] / max(1, w["rows_total"]), 4
                ),
                "row_groups": f"{w['row_groups_read']}/{w['row_groups_total']}",
            }
            assert len(pairs[p]) == 1, f"tier pair mismatch {pairs[p]}"
        return out

    golden = 0x9E3779B97F4A7C15
    records = []
    for R in reps:
        base = tempfile.mkdtemp(prefix=f"probe_scale_{R}x_")
        t0 = time.perf_counter()
        written = 0
        # Above 1000 replicas, one append per replica would leave
        # R x 17 files (170k at 10000x) — chunk 10 replicas per append
        # so the synthetic build itself stays tractable; the measured
        # object is the COMPACTED layout, which is chunking-invariant.
        chunk = 1 if R <= 1000 else 10
        buf_ids: list = []
        buf_mat: list = []
        for r in range(R):
            # per-replica perturbation: uniform layout, replicas are NOT
            # near-dups of each other (multiply-mix each minimum)
            if r == 0:
                m = mat
            else:
                u = mat.view(np.uint64)
                salt = np.uint64((r * 0x2545F4914F6CDD1D) % (1 << 64))
                m = ((u * np.uint64(golden)) ^ salt).view(np.int64)
            buf_ids.append(ids + np.int64(r) * np.int64(1_000_000))
            buf_mat.append(m)
            if len(buf_ids) == chunk or r == R - 1:
                written += dd.append_minhash_index_local(
                    np.concatenate(buf_ids), np.vstack(buf_mat), base
                )
                buf_ids, buf_mat = [], []
        build_wall = round(time.perf_counter() - t0, 2)
        files = dd._list_index_files(f"{base}/bands", "band_id")
        idx_bytes = sum(os.stat(p_, ).st_size for p_, _ in files)

        rec = {
            "replicas": R,
            "index_docs": int(n0 * R),
            "index_band_rows": int(written * dd.LSH_BANDS),
            "index_mb": round(idx_bytes / 2**20, 1),
            "band_files_append_shape": len(files),
            "build_wall_sec": build_wall,
            # above 1000x the O(index) tiers cost minutes per probe by
            # construction (that is the point of the pruning tiers) —
            # measure only the tier whose flatness is the claim
            "append_shape": measure(
                base,
                ("full", "bitmap", "rowgroup") if R <= 1000 else ("rowgroup",),
            ),
        }
        t0 = time.perf_counter()
        cstats = dd.compact_minhash_index(spark, base)
        rec["compact"] = {"wall_sec": round(time.perf_counter() - t0, 2),
                          **cstats}
        rec["compacted_shape"] = measure(
            base, ("full", "rowgroup") if R <= 1000 else ("rowgroup",)
        )
        records.append(rec)
        print(json.dumps(rec), file=sys.stderr)
        import shutil

        shutil.rmtree(base, ignore_errors=True)

    with open(out_path, "w") as fh:
        json.dump(records, fh, indent=1)
    print(json.dumps({"written": out_path, "n": len(records)}))
    spark.stop()


if __name__ == "__main__":
    main()
