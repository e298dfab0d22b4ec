"""Content-defined chunking gates (operators/chunking.py).

The defining property under test: boundaries are a function of LOCAL
content, so an insertion disturbs only the chunk it lands in and the
cut positions re-synchronize right after — fixed-size chunking loses
every chunk downstream of the edit.
"""

from __future__ import annotations

import hashlib
import random

from frizzle_spark.operators.chunking import (
    CDC_DIVISOR,
    CDC_MAX,
    CDC_MIN,
    cdc_boundaries,
    cdc_chunk_batch,
)
from frizzle_spark.plans.registry import REGISTRY


def _doc(n: int, seed: int = 11) -> bytes:
    rng = random.Random(seed)
    return bytes(rng.randrange(256) for _ in range(n))


def _fps(data: bytes) -> list[str]:
    prev, out = 0, []
    for cut in cdc_boundaries(data):
        out.append(hashlib.md5(data[prev:cut]).hexdigest())
        prev = cut
    return out


def test_boundaries_partition_and_bounds():
    data = _doc(8192)
    cuts = cdc_boundaries(data)
    assert cuts[-1] == len(data)
    assert cuts == sorted(set(cuts)), "cuts must be strictly increasing"
    lens = [b - a for a, b in zip([0] + cuts[:-1], cuts)]
    assert all(ln <= CDC_MAX for ln in lens)
    # min bound holds for every chunk except the unavoidable final tail
    assert all(ln >= CDC_MIN for ln in lens[:-1])
    # average tracks the divisor target (loose band: min/max clamp it)
    avg = len(data) / len(lens)
    assert CDC_DIVISOR / 2 <= avg <= CDC_MAX, avg
    # deterministic
    assert cdc_boundaries(data) == cuts
    # edges
    assert cdc_boundaries(b"") == []
    assert cdc_boundaries(b"xy") == [2]


def test_insertion_stability_beats_fixed_chunking():
    """One byte inserted mid-document: CDC re-synchronizes (most chunk
    fingerprints survive), fixed-size chunking loses everything after
    the edit point."""
    base = _doc(6144)
    pos = 1000
    edited = base[:pos] + b"\x7f" + base[pos:]

    cdc_shared = len(set(_fps(base)) & set(_fps(edited)))
    cdc_total = len(_fps(base))
    assert cdc_shared / cdc_total >= 0.7, f"CDC kept {cdc_shared}/{cdc_total}"

    def fixed_fps(data: bytes) -> list[str]:
        return [
            hashlib.md5(data[i : i + CDC_DIVISOR]).hexdigest()
            for i in range(0, len(data), CDC_DIVISOR)
        ]

    fixed_shared = len(set(fixed_fps(base)) & set(fixed_fps(edited)))
    # fixed chunking keeps only the prefix before the edit (~pos/64 of
    # ~6144/64 chunks) — CDC must beat it decisively
    assert cdc_shared / cdc_total > 2 * fixed_shared / len(fixed_fps(base))


def test_spark_kernel_matches_driver_numpy(spark, sf_dir):
    """The Spark mapInPandas stream must equal a driver-side
    recomputation over the same payload bytes, row for row."""
    from pyspark.sql import functions as F

    from frizzle_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").limit(50)
    want = []
    for r in docs.select("doc_id", F.encode("text", "UTF-8").alias("p")).collect():
        data = bytes(r["p"])
        prev = 0
        for i, cut in enumerate(cdc_boundaries(data)):
            want.append(
                (r["doc_id"], i, cut - prev, hashlib.md5(data[prev:cut]).hexdigest())
            )
            prev = cut
    got = [
        (r["doc_id"], r["chunk_idx"], r["chunk_len"], r["chunk_fp"])
        for r in docs.select("doc_id", F.encode("text", "UTF-8").alias("payload"))
        .mapInPandas(
            cdc_chunk_batch,
            "doc_id long, chunk_idx long, chunk_len long, chunk_fp string",
        )
        .collect()
    ]
    assert sorted(got) == sorted(want)


def test_registry_query_shape(spark, sf_dir):
    df = REGISTRY["qz14_cdc_chunk"].fn(spark, sf_dir)
    assert df.columns == ["doc_id", "chunk_idx", "chunk_len", "chunk_fp"]
    n_docs = df.select("doc_id").distinct().count()
    assert n_docs == 500  # every sf0.01 document chunked


def test_chunk_dedup_finds_partial_overlap_and_containment(spark, tmp_path):
    """qz11_chunk_dedup: a 1.2KB span shared inside otherwise-different
    documents and a full containment pair must both surface; unrelated
    docs must not pair.  Shared counts are verified against a
    driver-side recomputation over the same kernel."""
    import string

    rng = random.Random(42)

    def text(n):
        return "".join(rng.choice(string.ascii_lowercase + " ") for _ in range(n))

    span = text(1200)
    docs = {i: text(3000) for i in range(10)}
    docs[100] = text(1500) + span + text(1500)
    docs[101] = text(400) + span + text(2600)
    docs[102] = text(2000)
    docs[103] = docs[102][500:1700]  # fully contained in 102

    out = str(tmp_path / "corpus")
    spark.createDataFrame(
        [(i, t, "en", f"src{i % 3}", len(t)) for i, t in docs.items()],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(f"{out}/documents.parquet")

    rows = REGISTRY["qz11_chunk_dedup"].fn(spark, out).collect()
    got = {(r["doc_a"], r["doc_b"]): r for r in rows}
    assert (100, 101) in got, got.keys()
    assert (102, 103) in got, got.keys()
    # containment: nearly all of 103's chunks live in 102
    assert got[(102, 103)]["overlap"] >= 0.6, got[(102, 103)]
    assert all(p in {(100, 101), (102, 103)} for p in got), got.keys()

    # differential: shared counts equal a driver-side recomputation
    fps = {i: set(_fps(t.encode())) for i, t in docs.items()}
    for (a, b), r in got.items():
        assert r["shared_chunks"] == len(fps[a] & fps[b]), (a, b)


def test_chunk_dedup_runs_on_testdata(spark, sf_dir):
    df = REGISTRY["qz11_chunk_dedup"].fn(spark, sf_dir)
    assert df.columns == ["doc_a", "doc_b", "shared_chunks", "overlap"]
    assert df.count() >= 0


def test_chunk_dedup_two_pass_equivalence(spark, tmp_path):
    """chunk_dedup_pairs(two_pass=True) — count-distinct prepass +
    broadcast anti join for O(cap) agg buffers — must produce the
    IDENTICAL pair set as the collect_set path on the planted-span
    corpus (including a planted HOT fingerprint shared by many docs,
    which both guards must drop), and its plan must show the anti-join
    prepass shape."""
    import string

    from frizzle_spark.operators.chunking import (
        CHUNK_HOT_FP_CAP,
        chunk_dedup_pairs,
    )

    rng = random.Random(7)

    def text(n):
        return "".join(rng.choice(string.ascii_lowercase + " ") for _ in range(n))

    span = text(1200)
    boiler = text(900)  # hot span planted into EVERY doc → hot fps
    docs = {i: boiler + text(3000) for i in range(CHUNK_HOT_FP_CAP + 5)}
    docs[100] = boiler + text(1500) + span + text(1500)
    docs[101] = boiler + text(400) + span + text(2600)

    out = str(tmp_path / "corpus")
    spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in docs.items()],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(f"{out}/documents.parquet")

    one = {tuple(r) for r in chunk_dedup_pairs(spark, out).collect()}
    two_df = chunk_dedup_pairs(spark, out, two_pass=True)
    two = {tuple(r) for r in two_df.collect()}
    assert one == two
    assert any(r[0] == 100 and r[1] == 101 for r in two), two

    plan = two_df._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" in plan and "BroadcastHashJoin" in plan, plan[:500]
    # the prepass aggregates a DISTINCT count, never a set
    assert "count(distinct" in plan.lower() or "count(doc_id" in plan.lower()


def test_chunk_dedup_two_pass_on_testdata(spark, sf_dir):
    from frizzle_spark.operators.chunking import chunk_dedup_pairs

    one = {tuple(r) for r in chunk_dedup_pairs(spark, sf_dir).collect()}
    two = {tuple(r) for r in chunk_dedup_pairs(spark, sf_dir, two_pass=True).collect()}
    assert one == two
