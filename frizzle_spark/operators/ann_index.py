"""Persisted ANN index: the IVF inverted lists written to parquet as a
PARTITION LAYOUT, so probing is a partition-pruned scan (north-star
extension; the reference persists nothing — its whole state is
in-memory channels, reference basic/source.go:34-53).

The in-session ANN tiers (operators/similarity.py) re-derive the
quantizer and re-assign the corpus per query.  That is the right shape
for a one-shot query, and the wrong one for a serving corpus searched
thousands of times: at 100 TB you build the index ONCE —

* ``index/centroids.parquet`` — K rows (cluster, centroid); K ≈ √n, so
  even a billion-vector corpus stores ~30k small rows — always
  collectable, always broadcastable;
* ``index/lists/cluster=<c>/…`` — the corpus unit vectors written
  ``partitionBy("cluster")``: the inverted list IS the directory
  layout, exactly the same mechanism as the minhash band index
  (operators/dedup.materialize_minhash_index) and the hive-layout
  pruning gates.

and every search is: nearest-nprobe clusters computed driver-side
against the tiny centroid table, then ONE scan whose
``cluster IN (…)`` predicate prunes to nprobe directories at
file-listing time (the pytest gate asserts the scan's PartitionFilters
and that only the probed directories' files are read).  Search cost is
O(nprobe/K of the corpus) in IO, not just in compute.

Same quantizer, same assignment kernel, same re-ranking as qz12_ivf —
the pytest gate checks a from-index search returns the IDENTICAL
result set as the in-session IVF query at equal parameters.
"""

from __future__ import annotations

import json
import os

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from frizzle_spark.functions import vectors as V
from frizzle_spark.operators.similarity import (
    TOP_K,
    _ivf_train,
)


def materialize_ivf_index(spark: SparkSession, sf_dir: str, base_path: str) -> dict:
    """Build and persist the IVF index for the sf_dir embedding corpus.

    Returns the metadata dict also written to ``index_meta.json``
    (k, nprobe, n_vectors, dim).  Training is the SAME bounded-sample
    deterministic k-means as the in-session tier (similarity._ivf_train)
    so an index built today reproduces the session query bit-for-bit.
    """
    trained = _ivf_train(spark, sf_dir)
    os.makedirs(base_path, exist_ok=True)
    if trained is None:  # empty corpus → empty but well-formed index
        meta = {"k": 0, "nprobe": 0, "n_vectors": 0, "dim": 0}
        with open(os.path.join(base_path, "index_meta.json"), "w") as fh:
            json.dump(meta, fh)
        return meta
    unit, sample, x, cent, pid, pu, top_clusters = trained
    bc_cent = spark.sparkContext.broadcast(cent)

    def assign(batches):  # pragma: no cover - executed on executors
        import pandas as pd

        c = bc_cent.value
        for pdf in batches:
            if not len(pdf):
                continue
            u = np.stack(pdf["u"].map(np.asarray))
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "cluster": (u @ c.T).argmax(axis=1).astype(np.int32),
                    "u": pdf["u"],
                }
            )

    clustered = unit.mapInPandas(assign, "vec_id long, cluster int, u array<double>")
    clustered.write.mode("overwrite").partitionBy("cluster").parquet(
        os.path.join(base_path, "lists")
    )
    cent_rows = [(int(i), [float(v) for v in row]) for i, row in enumerate(cent)]
    spark.createDataFrame(
        cent_rows, "cluster int, centroid array<double>"
    ).write.mode("overwrite").parquet(os.path.join(base_path, "centroids"))
    nprobe = top_clusters.shape[1]
    meta = {
        "k": int(len(cent)),
        "nprobe": int(nprobe),
        "n_vectors": int(unit.count()),
        "dim": int(cent.shape[1]),
    }
    with open(os.path.join(base_path, "index_meta.json"), "w") as fh:
        json.dump(meta, fh)
    return meta


def probed_lists_scan(
    spark: SparkSession, base_path: str, probe_vecs: "np.ndarray", nprobe: int
) -> tuple[DataFrame, "np.ndarray"]:
    """(pruned lists scan, per-probe cluster matrix).  Exposed so the
    pruning pytest gate can inspect the scan before the join."""
    check_quantizer_epoch(base_path)  # interrupted-retrain refusal (r12)
    cent_rows = (
        spark.read.parquet(os.path.join(base_path, "centroids"))
        .orderBy("cluster")
        .collect()
    )
    cent = np.asarray([r["centroid"] for r in cent_rows])
    top_clusters = np.argsort(-(probe_vecs @ cent.T), axis=1)[:, :nprobe]
    wanted = sorted({int(c) for row in top_clusters for c in row})
    lists = spark.read.parquet(os.path.join(base_path, "lists"))
    return lists.where(F.col("cluster").isin(wanted)), top_clusters


def search_ivf_index(
    spark: SparkSession,
    base_path: str,
    probes: DataFrame,
    k: int = TOP_K,
    nprobe: int | None = None,
) -> DataFrame:
    """Top-k cosine search against the persisted index.

    ``probes``: (probe_id long, pu array<double>) unit query vectors.
    Plan: centroids collected (K ≈ √n rows), probe→cluster routing
    computed driver-side, lists scan pruned to the probed partitions,
    broadcast hash join probes⋈lists on cluster, numpy-free JVM dot
    re-ranking — identical scoring to qz12_ivf.
    """
    with open(os.path.join(base_path, "index_meta.json")) as fh:
        meta = json.load(fh)
    if meta["k"] == 0:
        return spark.createDataFrame(
            [], "probe_id long, neighbor_id long, cos_sim double, rank long"
        )
    if nprobe is None:
        nprobe = meta["nprobe"]
    probe_rows = probes.collect()  # bounded: probe sets are small by contract
    pids = [r["probe_id"] for r in probe_rows]
    pu = np.asarray([r["pu"] for r in probe_rows])
    pruned, top_clusters = probed_lists_scan(spark, base_path, pu, nprobe)
    probe_buckets = spark.createDataFrame(
        [
            (int(p), int(c), [float(v) for v in vec])
            for p, vec, row in zip(pids, pu, top_clusters)
            for c in row
        ],
        "probe_id long, cluster int, pu array<double>",
    )
    scored = (
        pruned.join(F.broadcast(probe_buckets), "cluster")
        .where(F.col("vec_id") != F.col("probe_id"))
        .withColumn("cos_sim", V.dot(F.col("pu"), F.col("u")))
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select(
            "probe_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round("cos_sim", 6).alias("cos_sim"),
            "rank",
        )
    )


def assign_clusters(
    spark: SparkSession, base_path: str, vecs: DataFrame
) -> DataFrame:
    """(vec_id, u) → (vec_id, cluster, u) against the PERSISTED
    centroids — the same broadcast-GEMM assignment kernel the build
    uses, reusable for both batch appends and streaming foreachBatch."""
    cent_rows = (
        spark.read.parquet(os.path.join(base_path, "centroids"))
        .orderBy("cluster")
        .collect()
    )
    cent = np.asarray([r["centroid"] for r in cent_rows])
    bc_cent = spark.sparkContext.broadcast(cent)

    def assign(batches):  # pragma: no cover - executed on executors
        import pandas as pd

        c = bc_cent.value
        for pdf in batches:
            if not len(pdf):
                continue
            u = np.stack(pdf["u"].map(np.asarray))
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "cluster": (u @ c.T).argmax(axis=1).astype(np.int32),
                    "u": pdf["u"],
                }
            )

    return vecs.mapInPandas(assign, "vec_id long, cluster int, u array<double>")


# --- persisted IVF-PQ (round 10, VERDICT r9 #7) ---------------------------
#
# The IVF index above stores RAW unit vectors in its inverted lists —
# right when full-precision re-ranking wants zero extra hops, wrong
# when the index itself must fit a storage/memory budget.  The IVF-PQ
# layout stores 16-byte PQ codes instead (32x smaller), plus the two
# tiny quantizer tables:
#
# * ``codes/cluster=<c>/…``   — (vec_id, code binary): the partition
#   layout IS the inverted list, same pruning mechanism as IVF;
# * ``centroids.parquet``     — K coarse centroids;
# * ``codebooks.parquet``     — PQ_M x PQ_KS sub-codebook rows.
#
# Search = same routing as IVF + the SAME ``adc_refine`` kernel as the
# in-session qz12_ivfpq (shared code, not a twin implementation): ADC
# over the pruned 16 B/vector code scan, then full-precision
# refinement of O(probes x R) rows against the caller-supplied unit
# corpus (the refine fetch is the one raw-vector touch — the index
# never stores them; pass ``search_ivfpq_index(..., unit=...)`` from
# whatever corpus table the deployment keeps).


def materialize_ivfpq_index(
    spark: SparkSession, sf_dir: str, base_path: str
) -> dict:
    """Build and persist the IVF-PQ index: same deterministic coarse
    quantizer as the IVF index and the session tier (_ivf_train), same
    PQ training and encode kernel as qz12_ivfpq (similarity.pq_encode)
    — the from-index search is gated IDENTICAL to the session query."""
    from frizzle_spark.operators.similarity import (
        PQ_KS,
        PQ_M,
        _pinned_blas,
        _pq_train,
        pq_encode,
    )

    trained = _ivf_train(spark, sf_dir)
    os.makedirs(base_path, exist_ok=True)
    if trained is None:  # empty corpus → empty but well-formed index
        meta = {"k": 0, "nprobe": 0, "n_vectors": 0, "dim": 0,
                "pq_m": PQ_M, "pq_ks": PQ_KS}
        with open(os.path.join(base_path, "index_meta.json"), "w") as fh:
            json.dump(meta, fh)
        return meta
    unit, sample, x, cent, pid, pu, top_clusters = trained
    books = _pinned_blas(
        _pq_train, x - cent[(x @ cent.T).argmax(1)], PQ_M, PQ_KS
    )
    pq_encode(spark, unit, cent, books).write.mode("overwrite").partitionBy(
        "cluster"
    ).parquet(os.path.join(base_path, "codes"))
    spark.createDataFrame(
        [(int(i), [float(v) for v in row]) for i, row in enumerate(cent)],
        "cluster int, centroid array<double>",
    ).write.mode("overwrite").parquet(os.path.join(base_path, "centroids"))
    spark.createDataFrame(
        [
            (int(mi), int(ci), [float(v) for v in books[mi, ci]])
            for mi in range(books.shape[0])
            for ci in range(books.shape[1])
        ],
        "m int, code int, subcentroid array<double>",
    ).write.mode("overwrite").parquet(os.path.join(base_path, "codebooks"))
    meta = {
        "k": int(len(cent)),
        "nprobe": int(top_clusters.shape[1]),
        "n_vectors": int(unit.count()),
        "dim": int(cent.shape[1]),
        "pq_m": int(books.shape[0]),
        "pq_ks": int(books.shape[1]),
    }
    with open(os.path.join(base_path, "index_meta.json"), "w") as fh:
        json.dump(meta, fh)
    return meta


def _load_pq_tables(spark: SparkSession, base_path: str):
    # fail loudly if the persisted geometry no longer matches the code's
    # (pq_encode/adc_refine use the module constants internally — a
    # constant change after an index is built would otherwise decode
    # 16-byte codes against wrong codebook shapes, silently)
    from frizzle_spark.operators.similarity import PQ_KS, PQ_M

    with open(os.path.join(base_path, "index_meta.json")) as fh:
        meta = json.load(fh)
    if (int(meta.get("pq_m", PQ_M)), int(meta.get("pq_ks", PQ_KS))) != (
        PQ_M,
        PQ_KS,
    ):
        raise ValueError(
            f"persisted PQ geometry (pq_m={meta.get('pq_m')}, "
            f"pq_ks={meta.get('pq_ks')}) != code's (PQ_M={PQ_M}, "
            f"PQ_KS={PQ_KS}); rebuild the index with "
            "materialize_ivfpq_index"
        )
    cent_rows = (
        spark.read.parquet(os.path.join(base_path, "centroids"))
        .orderBy("cluster")
        .collect()
    )
    cent = np.asarray([r["centroid"] for r in cent_rows])
    book_rows = spark.read.parquet(
        os.path.join(base_path, "codebooks")
    ).collect()
    m = 1 + max(r["m"] for r in book_rows)
    ks = 1 + max(r["code"] for r in book_rows)
    d_sub = len(book_rows[0]["subcentroid"])
    books = np.zeros((m, ks, d_sub))
    for r in book_rows:
        books[r["m"], r["code"]] = r["subcentroid"]
    return cent, books


def probed_codes_scan(
    spark: SparkSession, base_path: str, probe_vecs: "np.ndarray", nprobe: int
) -> tuple[DataFrame, "np.ndarray", "np.ndarray", "np.ndarray"]:
    """(pruned codes scan, per-probe cluster matrix, cent, books) —
    exposed for the pruning gate, mirroring ``probed_lists_scan``."""
    cent, books = _load_pq_tables(spark, base_path)
    top_clusters = np.argsort(-(probe_vecs @ cent.T), axis=1)[:, :nprobe]
    wanted = sorted({int(c) for row in top_clusters for c in row})
    codes = spark.read.parquet(os.path.join(base_path, "codes"))
    return codes.where(F.col("cluster").isin(wanted)), top_clusters, cent, books


def search_ivfpq_index(
    spark: SparkSession,
    base_path: str,
    probes: DataFrame,
    unit: DataFrame,
    k: int = TOP_K,
    nprobe: int | None = None,
) -> DataFrame:
    """Top-k cosine search against the persisted IVF-PQ index.

    ``probes``: (probe_id long, pu array<double>); ``unit``: the
    (vec_id, u) unit corpus the refinement step fetches raw vectors
    from (the index stores only codes).  Candidate routing, ADC
    scoring, and refinement are the session tier's own kernels."""
    from frizzle_spark.operators.similarity import adc_refine

    with open(os.path.join(base_path, "index_meta.json")) as fh:
        meta = json.load(fh)
    if meta["k"] == 0:
        return spark.createDataFrame(
            [], "probe_id long, neighbor_id long, cos_sim double, rank long"
        )
    if nprobe is None:
        nprobe = meta["nprobe"]
    probe_rows = probes.collect()  # bounded: probe sets are small by contract
    if not probe_rows:  # empty probe set → empty result, not a shape error
        return spark.createDataFrame(
            [], "probe_id long, neighbor_id long, cos_sim double, rank long"
        )
    pid = np.asarray([r["probe_id"] for r in probe_rows])
    pu = np.asarray([r["pu"] for r in probe_rows])
    if pu.shape[1] != int(meta["dim"]):
        raise ValueError(
            f"probe dim {pu.shape[1]} != index dim {meta['dim']}"
        )
    pruned, top_clusters, cent, books = probed_codes_scan(
        spark, base_path, pu, nprobe
    )
    probe_buckets = spark.createDataFrame(
        [
            (int(p), int(c))
            for p, row in zip(pid, top_clusters)
            for c in row
        ],
        "probe_id long, cluster int",
    )
    cand = pruned.join(F.broadcast(probe_buckets), "cluster").where(
        F.col("vec_id") != F.col("probe_id")
    )
    return adc_refine(spark, cand, pid, pu, cent, books, unit, k=k)


def append_to_ivfpq_index(
    spark: SparkSession, base_path: str, vecs: DataFrame
) -> None:
    """Incremental IVF-PQ maintenance, the twin of ``append_to_ivf_index``:
    encode new vectors with the FROZEN coarse quantizer + codebooks and
    append to the code lists they land in; works as a foreachBatch body
    (the streaming-ingest gate's wiring)."""
    from frizzle_spark.operators.similarity import pq_encode

    with open(os.path.join(base_path, "index_meta.json")) as fh:
        if json.load(fh)["k"] == 0:
            raise ValueError(
                "cannot append to an empty IVF-PQ index (k=0): no "
                "quantizer/codebooks were trained; rebuild with "
                "materialize_ivfpq_index on a non-empty corpus"
            )
    cent, books = _load_pq_tables(spark, base_path)
    encoded = pq_encode(spark, vecs, cent, books).localCheckpoint()
    n_new = encoded.count()
    encoded.write.mode("append").partitionBy("cluster").parquet(
        os.path.join(base_path, "codes")
    )
    meta_path = os.path.join(base_path, "index_meta.json")
    with open(meta_path) as fh:
        meta = json.load(fh)
    meta["n_vectors"] = int(meta.get("n_vectors", 0)) + int(n_new)
    tmp = meta_path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(meta, fh)
    os.replace(tmp, meta_path)


def append_to_ivf_index(spark: SparkSession, base_path: str, vecs: DataFrame) -> None:
    """Incremental index maintenance: route new vectors to their
    inverted lists and APPEND — the quantizer is frozen (the standard
    IVF posture: re-train only on drift, never per ingest), so an
    append touches exactly the partitions the new vectors land in and
    never rewrites existing lists.  Works identically as the body of a
    ``foreachBatch`` streaming sink — that is the streaming-ingest
    test's exact wiring (embeddings arrive on a stream, the index
    stays searchable throughout).

    After a successful append, ``index_meta.json`` is rewritten with the
    updated ``n_vectors`` so anything sizing nprobe/k from the metadata
    sees the post-ingest corpus, not the initial build.  The count comes
    from the appended micro-batch, which is materialized ONCE via
    localCheckpoint so the count and the write share the assignment
    work (``observe`` is not reliable under foreachBatch re-execution —
    measured delivering 0 — and a plain count would re-run the
    assignment GEMM); no rescan of the lists."""
    assigned = assign_clusters(spark, base_path, vecs).localCheckpoint()
    n_new = assigned.count()
    assigned.write.mode("append").partitionBy("cluster").parquet(
        os.path.join(base_path, "lists")
    )
    meta_path = os.path.join(base_path, "index_meta.json")
    with open(meta_path) as fh:
        meta = json.load(fh)
    meta["n_vectors"] = int(meta.get("n_vectors", 0)) + int(n_new)
    tmp = meta_path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(meta, fh)
    os.replace(tmp, meta_path)


_EPOCH_MARKER = "_quantizer_epoch"  # underscore name: invisible to scans


def check_quantizer_epoch(base_path: str) -> None:
    """Deterministic interrupted-retrain detection (r12, ADVICE low).

    ``compact_ann_index(retrain=True)`` stamps a fresh epoch uuid into
    the rewritten lists tree (``lists/_quantizer_epoch``, carried
    through the directory swap) and then into ``index_meta.json``
    (``quantizer_epoch``) when the new centroids publish.  A crash
    between the two leaves the stamps DIFFERENT, so probes refuse
    loudly instead of routing re-clustered lists with stale centroids.
    The pre-existing partition-id-≥-k guard only fires
    probabilistically (a retrain that leaves the high partitions empty
    slips past it); the epoch compare is exact.  Pre-r12 indexes have
    neither stamp — both absent is consistent (legacy)."""
    lists_marker = os.path.join(base_path, "lists", _EPOCH_MARKER)
    lists_epoch = None
    if os.path.isfile(lists_marker):
        with open(lists_marker) as fh:
            lists_epoch = fh.read().strip() or None
    meta_epoch = None
    meta_path = os.path.join(base_path, "index_meta.json")
    if os.path.isfile(meta_path):
        with open(meta_path) as fh:
            meta_epoch = json.load(fh).get("quantizer_epoch")
    if lists_epoch != meta_epoch:
        raise RuntimeError(
            f"index at {base_path}: lists quantizer epoch {lists_epoch!r} "
            f"!= meta quantizer epoch {meta_epoch!r} — an interrupted "
            "compact_ann_index(retrain=True); re-run it to heal"
        )


def _parquet_file_count(root: str) -> int:
    import os as _os

    return sum(
        1
        for dp, _, fns in _os.walk(root)
        for f in fns
        if f.endswith(".parquet")
    )


def compact_ann_index(
    spark: SparkSession, base_path: str, retrain: bool = False
) -> dict:
    """Small-file compaction for a persisted IVF or IVF-PQ index (round
    11, VERDICT r10 #7 — the same disease ``compact_minhash_index``
    cures for the MinHash layout): every streaming append
    (``append_to_ivf_index`` / ``append_to_ivfpq_index``) adds one file
    per touched ``cluster=`` partition, so a long-running ingest leaves
    appends x clusters files and every probed directory pays the open
    storm.  Folds each inverted list back to ~one file per cluster with
    the same two-phase tmp-write / count-verify / directory-swap
    protocol as the MinHash compaction (single-writer maintenance op —
    do not run concurrently with appends).  Search identity and the
    PartitionFilters pruning witness are pytest-gated.

    Works on both layouts (detects ``lists`` = IVF, ``codes`` =
    IVF-PQ); by default quantizer tables and ``index_meta.json`` are
    untouched.  Returns {"table", "rows", "files_before",
    "files_after"} (plus {"k", "nprobe"} after a retrain).

    ``retrain=True`` (raw-vector ``lists`` layout only) additionally
    RE-TRAINS the coarse quantizer before folding — the "retrain on
    drift" half of the standard IVF posture, placed at its natural
    point: compaction already rewrites every row, so re-assigning
    clusters on the way through is free I/O-wise.  A streaming bus
    bootstraps its quantizer on the FIRST batch (k ≈ √batch) and the
    frozen k goes stale as the index grows 100× — lists get fat and
    pruned-probe compute degrades toward a full scan.  Retraining uses
    the same bounded-sample deterministic k-means as the session tier
    (k from ``ivf_params`` at the CURRENT corpus size), rewrites
    centroids + meta k/nprobe under the same two-phase protocol, and
    keeps probe-at-nprobe="all" results identical (a threshold probe
    is quantizer-independent when nothing prunes — the pytest gate).
    Not supported for ``codes`` (IVF-PQ): codes are residual-encoded
    against the coarse centroids, so a retrain would require re-encoding
    from raw vectors the index deliberately does not store — raise."""
    import json as _json
    import os as _os
    import shutil

    table = "lists" if _os.path.isdir(_os.path.join(base_path, "lists")) else "codes"
    root = _os.path.join(base_path, table)
    if retrain and table != "lists":
        raise ValueError(
            "retrain=True requires the raw-vector 'lists' layout; the "
            "IVF-PQ 'codes' layout stores residual codes, not vectors — "
            "rebuild with materialize_ivfpq_index instead"
        )
    if not _os.path.isdir(root):  # k=0 empty index: nothing to fold
        return {"table": table, "rows": 0, "files_before": 0, "files_after": 0}
    files_before = _parquet_file_count(root)
    df = spark.read.parquet(root)
    n = int(df.count())
    new_meta_kn = None
    if retrain and n:
        from frizzle_spark.operators.similarity import (
            IVF_TRAIN_SAMPLE,
            _kmeans_unit,
            _pinned_blas,
            ivf_params,
        )

        k, nprobe = ivf_params(n)
        sample = (
            df.orderBy("vec_id")
            .limit(IVF_TRAIN_SAMPLE)
            .select("u")
            .collect()
        )
        x = np.asarray([r["u"] for r in sample])
        cent = _pinned_blas(_kmeans_unit, x, k)
        bc_cent = spark.sparkContext.broadcast(cent)

        def reassign(batches):  # pragma: no cover - executed on executors
            import pandas as pd

            c = bc_cent.value
            for pdf in batches:
                if not len(pdf):
                    continue
                u = np.stack(pdf["u"].map(np.asarray))
                yield pd.DataFrame(
                    {
                        "vec_id": pdf["vec_id"],
                        "cluster": (u @ c.T).argmax(axis=1).astype(np.int32),
                        "u": pdf["u"],
                    }
                )

        df = df.select("vec_id", "u").mapInPandas(
            reassign, "vec_id long, cluster int, u array<double>"
        )
        new_meta_kn = (int(len(cent)), int(nprobe), cent)
    tmp = root + "_compact_tmp"
    (
        df.repartition("cluster")
        .write.mode("overwrite")
        .partitionBy("cluster")
        .parquet(tmp)
    )
    if new_meta_kn is not None:
        # epoch stamp rides the new lists tree THROUGH the swap; its
        # twin lands in index_meta.json only after the centroids
        # publish, so the crash window between swap and publish is
        # exactly a stamp mismatch — check_quantizer_epoch
        import uuid

        epoch = uuid.uuid4().hex
        with open(_os.path.join(tmp, _EPOCH_MARKER), "w") as fh:
            fh.write(epoch)
    elif _os.path.isfile(_os.path.join(root, _EPOCH_MARKER)):
        # plain (no-retrain) compaction must carry an existing stamp
        # through the swap, or the epoch guard would fire spuriously
        shutil.copyfile(
            _os.path.join(root, _EPOCH_MARKER),
            _os.path.join(tmp, _EPOCH_MARKER),
        )
    n2 = int(spark.read.parquet(tmp).count())
    if n2 != n:  # verify before the swap — never publish a short fold
        shutil.rmtree(tmp, ignore_errors=True)
        raise RuntimeError(f"compaction row mismatch: {n2} != {n}")
    old = _os.path.join(base_path, f"_{table}_precompact")
    shutil.rmtree(old, ignore_errors=True)
    _os.rename(root, old)
    _os.rename(tmp, root)
    shutil.rmtree(old, ignore_errors=True)
    out = {
        "table": table,
        "rows": n,
        "files_before": files_before,
        "files_after": _parquet_file_count(root),
    }
    if new_meta_kn is not None:
        # publish the new quantizer AFTER the lists swap — this order
        # makes the crash window DETECTABLE: re-clustered lists carry
        # cluster ids ≥ the stale meta's k, which pruned probes check
        # and refuse loudly (streaming/embedding_curation.py guard;
        # the reverse order would leave new centroids routing into old
        # partitions — a silent-miss window nothing could detect).
        # Recovery = re-run this compaction (idempotent).
        k, nprobe, cent = new_meta_kn
        cent_rows = [(int(i), [float(v) for v in row]) for i, row in enumerate(cent)]
        spark.createDataFrame(
            cent_rows, "cluster int, centroid array<double>"
        ).write.mode("overwrite").parquet(_os.path.join(base_path, "centroids"))
        meta_path = _os.path.join(base_path, "index_meta.json")
        with open(meta_path) as fh:
            meta = _json.load(fh)
        meta["k"], meta["nprobe"] = k, nprobe
        meta["quantizer_epoch"] = epoch  # closes the detectable window
        tmp_m = meta_path + ".tmp"
        with open(tmp_m, "w") as fh:
            _json.dump(meta, fh)
        _os.replace(tmp_m, meta_path)
        out["k"], out["nprobe"] = k, nprobe
    return out
