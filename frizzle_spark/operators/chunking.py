"""Content-defined chunking (CDC) over the ``documents`` table.

Fixed-size chunking breaks catastrophically under insertion: one byte
added at the front shifts every later boundary, so every downstream
chunk fingerprint changes and chunk-level dedup finds nothing.  CDC
places boundaries where a ROLLING HASH of the last W bytes hits a
divisor condition — boundaries are a function of local content, so an
edit only disturbs the chunk it lands in and cutting re-synchronizes
immediately after (the LBFS construction, Muthitacharoen et al.,
SOSP 2001; the same scheme underlying rsync/borg/restic dedup).  For a
training-data pipeline this is the chunk-level complement to the Q11
document-level dedup family: near-identical documents that differ by an
insertion still share almost all chunk fingerprints.

Spark shape: one ``mapInPandas`` pass — numpy Buzhash (cyclic-rotation
rolling hash, vectorized as W shifted XOR folds per document, no
per-byte Python), boundary selection, md5 per chunk.  Map-side only:
the corpus is read once, no shuffle is introduced, and the emitted
stream carries (doc_id, idx, len, fp) — four scalars per chunk, never
the text.  At 100 TB the chunk stream feeds the exact-dedup hash
groupBy (q11_exact_dedup's shape) at ~1/64th the row width of the
documents themselves.

The reference has no chunking of any kind (its transforms are
byte-suffix append/strip, transform.go:8-14) — north-star extension
per SURVEY.md §2.2.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from frizzle_spark.plans.registry import query
from frizzle_spark.sources.tables import load_table

CDC_WINDOW = 16  # rolling-hash window bytes
CDC_DIVISOR = 64  # boundary when hash % divisor == 0 → ~64-byte average
CDC_MIN = 32  # chunk length floor (suppresses boundary clusters)
CDC_MAX = 256  # chunk length ceiling (bounds worst-case chunk size)

# deterministic Buzhash byte table, fixed across sessions/executors
_BUZ = np.random.RandomState(97).randint(0, 2**63, size=256, dtype=np.int64).view(
    np.uint64
)


def _rot64(x: np.ndarray, k: int) -> np.ndarray:
    k %= 64
    if k == 0:
        return x
    return (x << np.uint64(k)) | (x >> np.uint64(64 - k))


def cdc_boundaries(data: bytes) -> list[int]:
    """Chunk END offsets for one payload (last entry == len(data)).

    Buzhash over the trailing ``CDC_WINDOW`` bytes at each position,
    candidate cut after positions where ``hash % CDC_DIVISOR == 0``,
    then a sequential min/max sweep: candidates closer than ``CDC_MIN``
    to the previous cut are skipped, gaps longer than ``CDC_MAX`` force
    a cut.  Pure numpy for the hash (W shifted XOR folds), Python only
    over the ~n/DIVISOR candidates.
    """
    n = len(data)
    if n == 0:
        return []
    if n <= CDC_MIN:
        return [n]
    b = np.frombuffer(data, dtype=np.uint8)
    w = CDC_WINDOW
    acc = np.zeros(n - w + 1, dtype=np.uint64)
    for j in range(w):
        acc ^= _rot64(_BUZ[b[j : n - w + 1 + j]], w - 1 - j)
    # window starting at s covers [s, s+w) → candidate cut AFTER byte
    # e = s + w - 1, i.e. boundary offset e + 1
    cand = (np.nonzero(acc % np.uint64(CDC_DIVISOR) == 0)[0] + w).tolist()
    cuts: list[int] = []
    last = 0
    for c in cand:
        while c - last > CDC_MAX:
            cuts.append(last + CDC_MAX)
            last += CDC_MAX
        if c - last >= CDC_MIN:
            cuts.append(c)
            last = c
    while n - last > CDC_MAX:
        cuts.append(last + CDC_MAX)
        last += CDC_MAX
    if last < n:
        cuts.append(n)
    return cuts


def cdc_chunk_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: (doc_id, payload) → one row per chunk."""
    for pdf in batches:
        out: dict[str, list] = {
            "doc_id": [],
            "chunk_idx": [],
            "chunk_len": [],
            "chunk_fp": [],
        }
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            if payload is None:  # null payload → no chunks
                continue
            data = bytes(payload)
            prev = 0
            for i, cut in enumerate(cdc_boundaries(data)):
                out["doc_id"].append(doc_id)
                out["chunk_idx"].append(i)
                out["chunk_len"].append(cut - prev)
                out["chunk_fp"].append(hashlib.md5(data[prev:cut]).hexdigest())
                prev = cut
        yield pd.DataFrame(out)


CHUNK_DEDUP_MIN_SHARED = 3  # pairs must share at least this many chunks
CHUNK_HOT_FP_CAP = 50  # fps in more docs than this are boilerplate: skip


@query("qz11_chunk_dedup", oracle=None)
def qz11_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial-duplicate detection via shared content-defined chunks —
    catches CONTAINMENT and partial overlap that whole-document
    fingerprints (q14_fingerprint) and even shingle-Jaccard miss when a
    long common span hides inside otherwise-different documents (the
    quote/boilerplate/mirror shape of web corpora).

    Plan: the map-side CDC chunk stream, per-doc fp dedup, then an
    equi-JOIN on chunk_fp — the same banded-join discipline as the
    whole Q11 family: pairs come from hash buckets, never an all-pairs
    scan.  Two skew guards make it 100 TB-safe: (a) hot fingerprints
    appearing in more than ``CHUNK_HOT_FP_CAP`` docs are dropped before
    the join (boilerplate chunks generate quadratic pair blowup and
    carry no dedup signal — the standard 'stop chunk' rule, same role
    as stopwords in shingling); (b) the join carries (fp, doc_id) pairs
    only — two scalars — and aggregates straight to (doc pair, shared
    count).  Output: pairs sharing ≥ ``CHUNK_DEDUP_MIN_SHARED`` chunks
    with their overlap coefficient (shared / min(chunk count)).

    Rows-only at the driver (rolling-hash boundaries are not
    SQL-expressible); pytest plants a shared span inside otherwise-
    different documents and gates detection + non-detection + a
    recomputation differential.
    """
    # Single-pass shape: Spark re-executes an unpersisted subplan once
    # PER CONSUMER, and a first cut consumed the chunk stream five times
    # (hot filter, cold join, per-doc counts, both self-join sides) —
    # five full Arrow-kernel corpus passes.  Instead the kernel output
    # aggregates ONCE to (chunk_fp → doc set); everything else derives
    # from that fp-grouped table: the hot-fp rule becomes a size()
    # filter, per-doc cold-chunk counts come from exploding the kept
    # lists, and candidate pairs expand IN-ROW (sorted set → ordered
    # 2-combinations, ≤ C(cap,2) structs per fp) — no self-join at all.
    # Caveat, stated for the >10⁹-doc regime: collect_set's agg buffer
    # for a boilerplate fp grows with its doc count until the filter
    # drops it (8 bytes × docs; an 1M-doc stop chunk = one 8 MB buffer
    # row).  Corpora hot enough to care should run
    # ``chunk_dedup_pairs(..., two_pass=True)`` — count-distinct
    # prepass + broadcast anti join for O(cap) buffers, at the price of
    # a second kernel pass (equivalence pytest-gated on the
    # planted-span corpus, plan-gated for the map-only prepass shape).
    return chunk_dedup_pairs(spark, sf_dir)


def chunk_dedup_pairs(
    spark: SparkSession, sf_dir: str, two_pass: bool = False
) -> DataFrame:
    """The qz11_chunk_dedup plan with a selectable hot-fp guard.

    ``two_pass=False`` (default, the registry path): one kernel pass;
    the hot-fp rule is a ``size(docs) > cap`` filter AFTER collect_set,
    so a boilerplate fp's agg buffer grows with its doc count before
    being dropped.  ``two_pass=True``: a count-distinct prepass finds
    the hot fps (constant-size agg buffers — countDistinct is two-phase
    partial aggregation, never a set), a BROADCAST ANTI join removes
    them from the chunk stream before any collect_set, and every
    surviving fp's buffer is bounded by the cap.  The hot set
    broadcasts safely by construction: it holds only fps in > cap docs,
    a vanishing fraction of distinct fps in any real corpus.
    """
    chunks = qz14_cdc_chunk(spark, sf_dir).select("doc_id", "chunk_fp")
    if two_pass:
        hot = (
            chunks.groupBy("chunk_fp")
            .agg(F.countDistinct("doc_id").alias("nd"))
            .where(F.col("nd") > CHUNK_HOT_FP_CAP)
            .select("chunk_fp")
        )
        kept = chunks.join(F.broadcast(hot), "chunk_fp", "left_anti")
        lists = (
            kept.groupBy("chunk_fp")
            .agg(F.collect_set("doc_id").alias("docs"))
            .select(F.array_sort("docs").alias("docs"))
        )
    else:
        lists = (
            chunks.groupBy("chunk_fp")
            .agg(F.collect_set("doc_id").alias("docs"))
            .where(F.size("docs") <= CHUNK_HOT_FP_CAP)
            .select(F.array_sort("docs").alias("docs"))
        )
    per_doc = (
        lists.select(F.explode("docs").alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_chunks"))
    )
    ds = F.col("docs")
    pair_structs = F.flatten(
        F.transform(
            ds,
            lambda x, i: F.transform(
                F.slice(ds, i + F.lit(2), F.size(ds)),
                lambda y: F.struct(x.alias("doc_a"), y.alias("doc_b")),
            ),
        )
    )
    pairs = (
        lists.where(F.size("docs") >= 2)
        .select(F.explode(pair_structs).alias("p"))
        .select("p.doc_a", "p.doc_b")
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("shared_chunks"))
        .where(F.col("shared_chunks") >= CHUNK_DEDUP_MIN_SHARED)
    )
    # per_doc is corpus-sized (one row per document) — the SMALL side is
    # the filtered pair set, so THAT broadcasts and the chunk-count
    # table streams map-side, ONCE: the overlap denominator only needs
    # min(na, nb), so each pair melts into two (pair, doc) probes, one
    # broadcast join tags them with n_chunks, and a re-group takes the
    # min — instead of two separate per-side stat joins that would
    # execute the per_doc subplan twice.  Net: the kernel appears twice
    # in the plan (pairs branch + per-doc-count branch, sharing an
    # identical fp-grouping exchange that AQE's exchange reuse can
    # collapse at runtime), down from five — gated in test_plan_quality.
    melted = pairs.select(
        "doc_a",
        "doc_b",
        "shared_chunks",
        F.explode(F.array("doc_a", "doc_b")).alias("doc_id"),
    )
    return (
        per_doc.join(F.broadcast(melted), "doc_id")
        .groupBy("doc_a", "doc_b", "shared_chunks")
        .agg(F.min("n_chunks").alias("mn"))
        .select(
            "doc_a",
            "doc_b",
            "shared_chunks",
            F.round(F.col("shared_chunks") / F.col("mn"), 6).alias("overlap"),
        )
    )


@query("qz14_cdc_chunk", oracle=None)
def qz14_cdc_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunk fingerprints for every document — the
    edit-stable chunk stream that chunk-level dedup joins on (module
    docstring has the design).  Rows-only at the driver; pytest gates
    the reassembly partition, the min/max bounds, the insertion-
    stability property CDC exists for (vs fixed-size chunking), and a
    Spark-vs-driver-numpy differential.
    """
    docs = load_table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    return docs.select("doc_id", F.encode("text", "UTF-8").alias("payload")).mapInPandas(
        cdc_chunk_batch,
        "doc_id long, chunk_idx long, chunk_len long, chunk_fp string",
    )
