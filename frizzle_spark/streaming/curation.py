"""Continuous curation: near-dup deduplication INSIDE the ingest bus.

The batch incremental pieces each exist and are identity-gated on their
own (``materialize_minhash_index`` / ``append_minhash_index``,
``incremental_neardup`` for new-vs-indexed, ``minhash_pairs_of`` for
new-vs-new, ``dedup_clusters`` for within-slice components,
``append_cluster_index`` downstream).  This module is the operating
mode they exist FOR: a stream of crawl slices arrives, each micro-batch
is deduplicated against everything already ACCEPTED (never against
raw history — survivors only), survivors land in the corpus sink and
join the MinHash index, duplicates route to the DLQ with a provenance
pointer — the reference's bus shape (source → transform → route → ack,
frizzle.go:53-79, basic/sink.go) carrying the curation decision loop.

Semantics — greedy first-occurrence-wins, the standard crawl-ingest
contract:

* a doc is a ``dup_index`` drop iff its MinHash-estimated Jaccard
  against any previously ACCEPTED doc reaches the batch threshold
  (same signatures, banding, threshold as qz11_minhash_lsh);
* within one batch, near-dup components collapse to their min-doc_id
  member that was not itself an index dup (``dup_batch`` drops point at
  that survivor);
* therefore NO TWO SURVIVORS are near-dups under the estimator — the
  invariant the pytest gate asserts corpus-wide after the replay.

Exactly-once under restart/replay: the per-batch writer is guarded by a
committed-batch watermark in ``ingest_meta.json`` (atomic tmp+replace —
the same commit-point pattern as the cluster-index meta), and the
corpus/DLQ appends go to PER-BATCH partition directories written with
overwrite — so Spark's standard failure mode (redeliver the last
uncommitted micro-batch with the SAME batch_id) rewrites the partial
partition instead of duplicating it, and replay of an already-committed
batch is a no-op.  The index append sits between the sink write and the
meta commit; a crash in that window can duplicate index ROWS, which is
deliberately benign — every downstream consumer is set-semantic
(candidates are ``.distinct()``-ed, the drop decision is min-aggregated)
so decisions are unchanged, only probe cost inflates — and the pytest
replay test pins exactly that.

Scale shape (100 TB): per-batch cost is O(batch docs) signature work
plus one band-bucket join against the stored index — text never
shuffles; the index grows only by survivors, so a crawl that is 40%
duplicate pays index writes for the 60%.  State lives entirely in
storage (index + meta), NOT in stream state stores — restart needs no
state recovery beyond the checkpoint offsets and the meta watermark.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

INGEST_META = "ingest_meta.json"

ASSIGNMENT_SCHEMA = "doc_id long, dest string, reason string, dup_of long"


def _read_ingest_meta(out_base: str) -> dict:
    try:
        with open(os.path.join(out_base, INGEST_META)) as fh:
            return json.load(fh)
    except (OSError, ValueError):
        return {}


def _write_ingest_meta(out_base: str, meta: dict) -> None:
    os.makedirs(out_base, exist_ok=True)
    path = os.path.join(out_base, INGEST_META)
    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(meta, fh)
    os.replace(tmp, path)


def dedup_ingest_batch(
    spark: SparkSession,
    batch_docs: DataFrame,
    index_base: str,
    out_base: str,
    batch_id: int,
    keep: str = "min_id",
) -> dict:
    """One micro-batch of the curation bus (the foreachBatch body,
    callable directly for the eager/batch twin): decide, route, index,
    commit.  Returns the batch accounting dict ({"skipped": True} when
    the batch_id is at or below the committed watermark — the replay
    no-op path).

    ``keep`` picks the within-batch survivor rule: ``"min_id"`` (the
    default — deterministic, id-ordered, what the registry entry and
    its gates pin) or ``"quality"`` — the rule real curation uses
    (``canonical_keep``'s move applied at ingest time): the surviving
    member of a within-batch near-dup cluster is the HIGHEST
    quality_score doc among those not already duplicating the index,
    ties broken on min doc_id.  Cross-batch semantics are unchanged
    under either rule (first ACCEPTED occurrence wins — a later
    higher-quality copy is still a dup_index drop; revising history
    would mean un-publishing an already-committed survivor, which an
    append-only corpus cannot do).  The pairwise-non-near-dup survivor
    invariant holds for both rules."""
    from frizzle_spark.operators.dedup import (
        append_minhash_index,
        dedup_clusters,
        incremental_neardup,
        minhash_pairs_of,
    )

    meta = _read_ingest_meta(out_base)
    if batch_id <= int(meta.get("committed_batch", -1)):
        return {"skipped": True, "batch_id": batch_id}

    batch = batch_docs.select("doc_id", "text").persist()
    try:
        # -- decide -------------------------------------------------------
        if meta.get("index_ready"):
            cross = incremental_neardup(spark, batch, index_base)
            cross_hit = cross.groupBy(F.col("new_id").alias("doc_id")).agg(
                F.min("old_id").alias("idx_dup_of")
            )
        else:  # first batch: nothing accepted yet
            cross_hit = spark.createDataFrame([], "doc_id long, idx_dup_of long")

        # no emptiness pre-check: take(1) would materialize the pair set
        # a second time; dedup_clusters converges in one cheap round on
        # an empty edge set
        labels = dedup_clusters(minhash_pairs_of(batch).select("d1", "d2"))

        m = (
            batch.select("doc_id")
            .join(labels, "doc_id", "left_outer")
            .select(
                "doc_id",
                F.coalesce("cluster_rep", F.col("doc_id")).alias("cluster"),
            )
            .join(cross_hit, "doc_id", "left_outer")
        )
        eligible = m.where(F.col("idx_dup_of").isNull())
        if keep == "quality":
            from pyspark.sql.window import Window

            from frizzle_spark.functions.text import quality_score

            q = batch.select(
                "doc_id", quality_score(F.col("text")).alias("_q")
            )
            w = Window.partitionBy("cluster").orderBy(
                F.desc("_q"), F.asc("doc_id")
            )
            keep_ids = (
                eligible.join(q, "doc_id")
                .withColumn("_rn", F.row_number().over(w))
                .where(F.col("_rn") == 1)
                .select("cluster", F.col("doc_id").alias("keep_id"))
            )
        elif keep == "min_id":
            keep_ids = eligible.groupBy("cluster").agg(
                F.min("doc_id").alias("keep_id")
            )
        else:
            raise ValueError(f"keep must be 'min_id' or 'quality', got {keep!r}")
        assign = (
            m.join(keep_ids, "cluster", "left_outer")
            .select(
                "doc_id",
                F.when(F.col("doc_id") == F.col("keep_id"), F.lit("corpus"))
                .otherwise(F.lit("dlq"))
                .alias("dest"),
                F.when(F.col("doc_id") == F.col("keep_id"), F.lit(None).cast("string"))
                .when(F.col("idx_dup_of").isNotNull(), F.lit("dup_index"))
                .otherwise(F.lit("dup_batch"))
                .alias("reason"),
                F.when(
                    F.col("doc_id") == F.col("keep_id"), F.lit(None).cast("long")
                )
                .otherwise(F.coalesce("idx_dup_of", "keep_id"))
                .alias("dup_of"),
            )
            # pin the decision before any state mutation below: the three
            # consumers (corpus write, DLQ write, index append) must see
            # ONE verdict even if an executor retries a task
            .localCheckpoint(eager=True)
        )

        # -- route (idempotent per-batch partition overwrite) --------------
        survivors = batch.join(
            assign.where(F.col("dest") == "corpus").select("doc_id"), "doc_id"
        )
        survivors.write.mode("overwrite").parquet(
            f"{out_base}/corpus/batch_id={batch_id}"
        )
        assign.where(F.col("dest") == "dlq").select(
            "doc_id", "reason", "dup_of"
        ).write.mode("overwrite").parquet(f"{out_base}/dlq/batch_id={batch_id}")

        # -- index the survivors (benign-on-replay window, module doc) -----
        n_indexed = append_minhash_index(survivors, index_base)

        # -- commit ---------------------------------------------------------
        n_in = batch.count()
        n_kept = survivors.count()
        _write_ingest_meta(
            out_base,
            {
                **meta,
                "committed_batch": batch_id,
                # readiness follows SIGNATURES, not batches: an empty (or
                # all-sub-3-word) first slice must not flip the probe on
                # before the index dirs exist on storage
                "index_ready": bool(meta.get("index_ready")) or n_indexed > 0,
                "n_docs_in": int(meta.get("n_docs_in", 0)) + n_in,
                "n_docs_kept": int(meta.get("n_docs_kept", 0)) + n_kept,
            },
        )
        return {
            "skipped": False,
            "batch_id": batch_id,
            "n_in": n_in,
            "n_kept": n_kept,
        }
    finally:
        batch.unpersist()


def stream_dedup_ingest(
    spark: SparkSession,
    replay_dir: str,
    schema,
    index_base: str,
    out_base: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 1,
    keep: str = "min_id",
) -> None:
    """Drive the curation bus over a file-replay stream to completion
    (availableNow): one crawl-slice file per micro-batch.  ``keep``
    passes through to :func:`dedup_ingest_batch`."""
    from frizzle_spark.streaming.pipeline import resolve_stream_input

    path, glob = resolve_stream_input(spark, replay_dir, None)
    reader = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
    )
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    sdf = reader.parquet(path)

    def _body(bdf: DataFrame, bid: int) -> None:
        dedup_ingest_batch(spark, bdf, index_base, out_base, bid, keep=keep)

    q = (
        sdf.writeStream.foreachBatch(_body)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def ingest_assignment(spark: SparkSession, out_base: str) -> DataFrame:
    """The replay's full routing verdict, one row per ingested doc:
    (doc_id, dest ∈ {corpus, dlq}, reason ∈ {NULL, dup_index,
    dup_batch}, dup_of = the accepted doc this one duplicates)."""
    try:
        corpus = spark.read.parquet(f"{out_base}/corpus").select(
            "doc_id",
            F.lit("corpus").alias("dest"),
            F.lit(None).cast("string").alias("reason"),
            F.lit(None).cast("long").alias("dup_of"),
        )
    except Exception:
        corpus = spark.createDataFrame([], ASSIGNMENT_SCHEMA)
    try:
        dlq = spark.read.parquet(f"{out_base}/dlq").select(
            "doc_id", F.lit("dlq").alias("dest"), "reason", "dup_of"
        )
    except Exception:
        dlq = spark.createDataFrame([], ASSIGNMENT_SCHEMA)
    return corpus.unionByName(dlq)
