"""Long-bus law for the EMBEDDING curation bus: run many fixed-size
micro-batches against the growing accepted-vector IVF index and record
per-batch wall — the embedding twin of scripts/curation_longbus.py's
record (CURATION_LONGBUS.json).  The claim under test: per-batch cost
is flat in index size once the probe prunes (young-index driver tier
below 64 MiB, cogrouped cluster-pruned scan above), with
compact_ann_index folded in on a cadence to keep the small-file count
bounded.

Synthetic deterministic stream: each batch is BATCH fresh unit vectors
(seeded per batch) plus DUP_FRAC near-identical copies of vectors from
EARLIER batches (cross-batch dups the probe must catch) — so the probe
does real work every batch and the index grows by ~(1-DUP_FRAC)·BATCH.

Usage:  python scripts/embedding_longbus.py [n_batches] [batch_size]
Writes EMB_LONGBUS.json at the repo root.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from frizzle_spark.session import get_spark  # noqa: E402
from frizzle_spark.streaming import embedding_curation as EC  # noqa: E402

DIM = 64
DUP_FRAC = 0.2
COMPACT_EVERY = 20


def main() -> None:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 60
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
    import tempfile

    base = tempfile.mkdtemp(prefix="emb_longbus_")
    index, out = f"{base}/index", f"{base}/out"
    spark = get_spark("emb-longbus")

    import pandas as pd

    n_dup = int(batch * DUP_FRAC)
    n_new = batch - n_dup
    next_id = 0
    accepted_pool: list[tuple[int, np.ndarray]] = []
    walls = []
    for b in range(n_batches):
        rng = np.random.RandomState(1000 + b)
        fresh = rng.randn(n_new, DIM)
        fresh /= np.linalg.norm(fresh, axis=1, keepdims=True)
        ids = list(range(next_id, next_id + n_new))
        vecs = list(fresh)
        next_id += n_new
        if accepted_pool and n_dup:
            picks = rng.choice(len(accepted_pool), size=n_dup, replace=True)
            for p in picks:
                _oid, ov = accepted_pool[p]
                w = ov + 1e-4 * rng.randn(DIM)
                vecs.append(w / np.linalg.norm(w))
                ids.append(next_id)
                next_id += 1
        pdf = pd.DataFrame(
            {
                "vec_id": np.asarray(ids, dtype=np.int64),
                "embedding": [[float(x) for x in v] for v in vecs],
            }
        )
        bdf = spark.createDataFrame(pdf, "vec_id long, embedding array<float>")
        t0 = time.perf_counter()
        res = EC.embedding_ingest_batch(spark, bdf, index, out, b)
        wall = time.perf_counter() - t0
        compact_s = None
        if (b + 1) % COMPACT_EVERY == 0 and os.path.exists(
            os.path.join(index, "index_meta.json")
        ):
            from frizzle_spark.operators.ann_index import compact_ann_index

            t1 = time.perf_counter()
            # retrain at the fold: k tracks √n as the index grows, so
            # the pruned probe's per-list work stays bounded instead of
            # fattening against the batch-0 bootstrap quantizer
            compact_ann_index(spark, index, retrain=True)
            compact_s = round(time.perf_counter() - t1, 3)
        # pool only the survivors (dup targets must be accepted
        # vectors): intersect with the batch's ACTUAL kept set from the
        # corpus sink partition — blindly pooling all fresh vectors let
        # a dropped vector serve as a planted-dup target no accepted
        # index row matches, slightly understating the recorded probe
        # recall (r12, ADVICE low; also guards the skipped-replay shape)
        kept = 0 if res.get("skipped") else res.get("n_kept", 0)
        kept_ids: set[int] = set()
        cdir = os.path.join(out, "corpus", f"batch_id={b}")
        if os.path.isdir(cdir):
            import pyarrow.parquet as _pq

            for f in sorted(os.listdir(cdir)):
                if f.endswith(".parquet"):
                    kept_ids.update(
                        _pq.read_table(
                            os.path.join(cdir, f), columns=["vec_id"]
                        )["vec_id"].to_pylist()
                    )
        for i, vid in enumerate(ids[:n_new]):
            if vid in kept_ids:
                accepted_pool.append((vid, vecs[i]))
        walls.append(
            {
                "batch": b,
                "wall_s": round(wall, 3),
                "n_in": res["n_in"],
                "n_kept": kept,
                "index_vectors": json.load(
                    open(os.path.join(index, "index_meta.json"))
                )["n_vectors"],
                "lists_bytes": EC._lists_bytes(index),
                "compact_s": compact_s,
            }
        )
        print(walls[-1], file=sys.stderr)

    ws = [w["wall_s"] for w in walls]
    dec = max(1, len(ws) // 10)
    rec = {
        "n_batches": n_batches,
        "batch_size": batch,
        "dup_frac": DUP_FRAC,
        "compact_every": COMPACT_EVERY,
        "first_decile_median_s": round(float(np.median(ws[:dec])), 3),
        "last_decile_median_s": round(float(np.median(ws[-dec:])), 3),
        "median_s": round(float(np.median(ws)), 3),
        "max_s": round(float(np.max(ws)), 3),
        "final_index_vectors": walls[-1]["index_vectors"],
        "final_lists_bytes": walls[-1]["lists_bytes"],
        "batches": walls,
    }
    with open(
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "EMB_LONGBUS.json"),
        "w",
    ) as fh:
        json.dump(rec, fh, indent=1)
    print(json.dumps({k: v for k, v in rec.items() if k != "batches"}))


if __name__ == "__main__":
    main()
