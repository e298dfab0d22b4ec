from __future__ import annotations

import pytest

from frizzle_spark.functions.multimodal import extract_features_batch, resize_image
from frizzle_spark.plans.multimodal_queries import media_table


def test_resize_stub_raises_cleanly():
    with pytest.raises(NotImplementedError, match="imaging libs"):
        resize_image(b"\x89PNG...", 32, 32)


def test_feature_batch_shape(spark, sf_dir):
    df = media_table(spark, sf_dir).limit(8).mapInPandas(
        extract_features_batch, "doc_id bigint, features array<double>"
    )
    rows = df.collect()
    assert len(rows) == 8
    for r in rows:
        assert len(r["features"]) == 8
        assert abs(sum(r["features"]) - 1.0) < 1e-4  # 8 values each rounded to 6dp


def test_phash_spark_matches_numpy(spark, sf_dir):
    """The executor-side phash values must equal a driver-side
    recomputation over the same payload bytes."""
    from frizzle_spark.functions.multimodal import phash64, phash_batch

    media = media_table(spark, sf_dir)
    want = {
        r["doc_id"]: phash64(bytes(r["payload"])) for r in media.collect()
    }
    got = {
        r["doc_id"]: r["phash"]
        for r in media.mapInPandas(phash_batch, "doc_id long, phash long").collect()
    }
    assert got == want


def test_phash_small_edit_is_near_large_edit_is_far():
    """Locality: a few flipped bytes move few bits, an unrelated payload
    moves ~half of them."""
    from frizzle_spark.functions.multimodal import phash64

    import random

    rng = random.Random(3)
    base = bytes(rng.randrange(256) for _ in range(4000))
    edited = bytearray(base)
    for i in (100, 2000, 3900):
        edited[i] = (edited[i] + 97) % 256
    other = bytes(rng.randrange(256) for _ in range(4000))
    ham = lambda a, b: bin((phash64(a) ^ phash64(b)) & (2**64 - 1)).count("1")
    assert ham(base, bytes(edited)) <= 7, ham(base, bytes(edited))
    assert ham(base, other) >= 16, ham(base, other)


def test_phash_neardup_exhaustive_recall_within_threshold(spark, sf_dir):
    """The banding guarantee: EVERY pair within PHASH_HAM_MAX hamming
    bits must be emitted (pigeonhole — ham <= 7 over 8 bands leaves one
    band untouched), with the exact hamming distance.  Brute-forced
    against all pairs driver-side."""
    from frizzle_spark.functions.multimodal import phash64
    from frizzle_spark.plans.multimodal_queries import PHASH_HAM_MAX
    from frizzle_spark.plans.registry import REGISTRY

    media = media_table(spark, sf_dir)
    sigs = {r["doc_id"]: phash64(bytes(r["payload"])) for r in media.collect()}
    ids = sorted(sigs)
    want = {}
    for i, da in enumerate(ids):
        for db in ids[i + 1 :]:
            h = bin((sigs[da] ^ sigs[db]) & (2**64 - 1)).count("1")
            if h <= PHASH_HAM_MAX:
                want[(da, db)] = h
    got = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in REGISTRY["qz15_phash_neardup"].fn(spark, sf_dir).collect()
    }
    assert got == want
