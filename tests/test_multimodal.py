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


# ---------------------------------------------------------------- real decode
# VERDICT r5 'Next round' #4: one real image behind the decode seam —
# a pure-numpy binary-PNM path (FRIZZLE_REAL_DECODE=1 opt-in; the
# deterministic stub stays the default and the oracles are unchanged).


def _ppm(w: int, h: int, f):
    """Build a binary P6 image; f(x, y) → (r, g, b)."""
    raster = bytearray()
    for y in range(h):
        for x in range(w):
            raster += bytes(f(x, y))
    return b"P6\n# test image\n%d %d\n255\n" % (w, h) + bytes(raster)


def _gradient(x, y):
    return ((x * 7) % 256, (y * 11) % 256, (x + y) % 256)


def test_decode_pnm_real_dims_and_luma():
    from frizzle_spark.functions.multimodal import decode_pnm

    img = _ppm(32, 24, _gradient)
    gray, w, h = decode_pnm(img)
    assert (w, h) == (32, 24) and gray.shape == (24, 32)
    r, g, b = _gradient(5, 3)
    assert abs(gray[3, 5] - (0.299 * r + 0.587 * g + 0.114 * b)) < 1e-9
    # P5 grayscale parses too
    p5 = b"P5\n4 2\n255\n" + bytes(range(8))
    gray5, w5, h5 = decode_pnm(p5)
    assert (w5, h5) == (4, 2) and gray5[1, 3] == 7.0


def test_decode_pnm_strict_sniffing_rejects_invalid():
    """try_decode_gray must never claim a non-image: wrong magic, bad
    header tokens, and raster-length mismatch all fall back to None."""
    from frizzle_spark.functions.multimodal import try_decode_gray

    good = _ppm(16, 16, _gradient)
    assert try_decode_gray(good) is not None
    assert try_decode_gray(b"plain document text") is None
    assert try_decode_gray(b"P6 is a nice format to talk about") is None
    assert try_decode_gray(good[:-1]) is None  # truncated raster
    assert try_decode_gray(_ppm(4, 4, _gradient)) is None  # below thumb size


def test_real_decode_kernel_reports_header_dims(spark):
    """Seam proof, decode stage: with the real flag captured at
    plan-build, a genuinely decoded PNM reports its TRUE header dims
    through the unchanged MEDIA_META_SCHEMA, while a non-image row in
    the same batch keeps stub dims."""
    from frizzle_spark.functions.multimodal import (
        MEDIA_META_SCHEMA,
        _fake_dims,
        make_decode_kernel,
    )

    img = _ppm(40, 20, _gradient)
    txt = b"not an image at all"
    df = spark.createDataFrame(
        [(1, bytearray(img), "image"), (2, bytearray(txt), "image")],
        "doc_id long, payload binary, media_type string",
    )
    out = {
        r["doc_id"]: r
        for r in df.mapInPandas(make_decode_kernel(True), MEDIA_META_SCHEMA).collect()
    }
    assert (out[1]["width"], out[1]["height"]) == (40, 20)
    assert (out[2]["width"], out[2]["height"]) == _fake_dims(txt)
    assert out[1]["n_bytes"] == len(img)


def test_real_decode_phash_locality_and_schema(spark):
    """Seam proof, phash stage: dHash over genuinely decoded pixels —
    a small brightness patch stays within the banding threshold, an
    unrelated image lands far, and the Spark kernel with the captured
    real flag matches the driver-side numpy computation exactly."""
    from frizzle_spark.functions.multimodal import (
        decode_pnm,
        make_phash_kernel,
        phash64_gray,
    )
    from frizzle_spark.plans.multimodal_queries import PHASH_HAM_MAX

    base = _ppm(64, 48, _gradient)
    patched = _ppm(
        64,
        48,
        lambda x, y: tuple(
            min(255, c + 40) if (30 <= x < 34 and 10 <= y < 14) else c
            for c in _gradient(x, y)
        ),
    )
    other = _ppm(64, 48, lambda x, y: ((x * x + 13 * y) % 256,) * 3)

    h = {name: phash64_gray(decode_pnm(img)[0]) for name, img in
         [("base", base), ("patched", patched), ("other", other)]}
    ham = lambda a, b: bin((a ^ b) & (2**64 - 1)).count("1")
    assert ham(h["base"], h["patched"]) <= PHASH_HAM_MAX
    assert ham(h["base"], h["other"]) >= 16

    df = spark.createDataFrame(
        [(1, bytearray(base)), (2, bytearray(patched)), (3, bytearray(other))],
        "doc_id long, payload binary",
    )
    got = {
        r["doc_id"]: r["phash"]
        for r in df.mapInPandas(
            make_phash_kernel(True), "doc_id long, phash long"
        ).collect()
    }
    assert got == {1: h["base"], 2: h["patched"], 3: h["other"]}


def test_resize_image_real_pnm_round_trip():
    """resize_image now does a REAL resize for PNM: output is a valid
    P5 of the requested dims whose pixels are the block means."""
    from frizzle_spark.functions.multimodal import decode_pnm, resize_image

    img = _ppm(32, 24, _gradient)
    out = resize_image(img, 8, 6)
    gray, w, h = decode_pnm(out)
    assert (w, h) == (8, 6)
    src = decode_pnm(img)[0]
    import numpy as np

    want = round(float(np.rint(src[0:4, 0:4].mean())))
    assert abs(gray[0, 0] - want) <= 1.0
    with pytest.raises(ValueError, match="upscal"):
        resize_image(img, 64, 64)


def test_real_decode_default_off(monkeypatch):
    """With the env unset the factories resolve to the stub — the
    oracle-checked q15 behavior is unchanged by default."""
    from frizzle_spark.functions import multimodal as mm

    monkeypatch.delenv(mm.REAL_DECODE_ENV, raising=False)
    assert mm.real_decode_enabled() is False
    monkeypatch.setenv(mm.REAL_DECODE_ENV, "1")
    assert mm.real_decode_enabled() is True


def test_binary_file_ingestion_feeds_media_pipeline(spark, tmp_path):
    """binaryFile → multimodal-table shape → dHash kernel end-to-end:
    drop raw files in a directory, ingest with pathGlobFilter pushed
    into the listing, and run the real phash kernel over the ingested
    content — the crawl-dump entry path for Q15."""
    from pyspark.sql import functions as F

    from frizzle_spark.functions.multimodal import make_phash_kernel
    from frizzle_spark.sources.files import scan_binary_files

    d = tmp_path / "dump"
    d.mkdir()
    payloads = {f"img_{i}.bin": bytes([i]) * (64 + i) for i in range(5)}
    for name, data in payloads.items():
        (d / name).write_bytes(data)
    (d / "ignore.txt").write_text("not media")

    df = scan_binary_files(spark, str(d), glob="*.bin")
    rows = df.select("path", "length", "content").collect()
    assert len(rows) == 5  # the .txt never entered the listing
    got = {r["path"].rsplit("/", 1)[-1]: bytes(r["content"]) for r in rows}
    assert got == payloads
    media = df.select(
        F.xxhash64("path").alias("doc_id"), F.col("content").alias("payload")
    )
    hashed = media.mapInPandas(make_phash_kernel(), "doc_id long, phash long")
    assert hashed.where("phash IS NOT NULL").count() == 5


def _make_wav(freq=440.0, rate=8000, seconds=0.5, channels=1, width=2):
    """Sine-wave PCM WAV via the stdlib wave module."""
    import io
    import math
    import struct
    import wave

    n = int(rate * seconds)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(channels)
        wf.setsampwidth(width)
        wf.setframerate(rate)
        for i in range(n):
            v = int(32767 * 0.5 * math.sin(2 * math.pi * freq * i / rate))
            wf.writeframes(struct.pack("<h", v) * channels)
    return buf.getvalue()


def test_wav_decode_and_features_real():
    """The stdlib WAV parser recovers the true rate/duration and the
    feature vector carries genuine time-domain descriptors: a 440 Hz
    sine at 8 kHz has zcr ≈ 2·440/8000 = 0.11 and rms ≈ 0.5/√2."""
    import math

    from frizzle_spark.functions.multimodal import audio_features, decode_wav

    data = _make_wav()
    x, rate, nch = decode_wav(data)
    assert rate == 8000 and nch == 1 and len(x) == 4000
    f = audio_features(x, rate, nch)
    assert f[0] == 0.5  # duration
    assert abs(f[1] - 0.5 / math.sqrt(2)) < 0.01  # rms
    assert abs(f[2] - 2 * 440 / 8000) < 0.01  # zero-crossing rate
    assert f[6] == 1.0 and f[7] == 8.0  # channels, kHz

    # stereo downmix path
    x2, rate2, nch2 = decode_wav(_make_wav(channels=2))
    assert nch2 == 2 and len(x2) == 4000


def test_wav_sniff_rejects_non_wav():
    from frizzle_spark.functions.multimodal import try_decode_wav

    assert try_decode_wav(b"not audio at all" * 10) is None
    assert try_decode_wav(b"RIFF\x00\x00\x00\x00WAVEgarbage") is None
    assert try_decode_wav(_make_wav()) is not None


def test_media_features_real_wav_through_query_schema(spark):
    """q15_media_features' exact schema and kernel, real gate on: a WAV
    payload row yields audio features, a text payload row keeps the
    byte-histogram stub — per-row sniffing in one mixed corpus."""
    from frizzle_spark.functions.multimodal import (
        audio_features,
        decode_wav,
        make_features_kernel,
    )

    wav = _make_wav()
    txt = b"plain text payload, definitely not a RIFF container"
    df = spark.createDataFrame(
        [(1, bytearray(wav), "audio"), (2, bytearray(txt), "image")],
        "doc_id long, payload binary, media_type string",
    )
    feature_schema = "doc_id bigint, " + ", ".join(f"f{j} double" for j in range(8))
    got = {
        r["doc_id"]: [r[f"f{j}"] for j in range(8)]
        for r in df.mapInPandas(make_features_kernel(True), feature_schema).collect()
    }
    assert got[1] == audio_features(*decode_wav(wav))
    hist = [0] * 8
    for b in txt:
        hist[b % 8] += 1
    assert got[2] == [h / len(txt) for h in hist]

    # gate off (the registry default): the WAV row must use the stub too
    stub = {
        r["doc_id"]: [r[f"f{j}"] for j in range(8)]
        for r in df.mapInPandas(make_features_kernel(False), feature_schema).collect()
    }
    hist_w = [0] * 8
    for b in wav:
        hist_w[b % 8] += 1
    assert stub[1] == [h / len(wav) for h in hist_w]


# ---------------------------------------------------------------- PNG decode
# Round 9 (VERDICT r8 #7): a stdlib-zlib PNG path beside the PNM seam.
# The differential oracle is a pure-Python test-side ENCODER (struct +
# zlib, per-row filter choice) — prod decodes what the test encodes,
# across every filter type and supported color type, and the same
# pixels encoded as PNM and as PNG must produce the identical gray
# plane (and therefore identical phash).


def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def _encode_png(px, color: int, filters) -> bytes:
    """Encode an (h, w, channels) uint8 array as PNG, using filters[y]
    (0..4) for row y — the test-side differential encoder."""
    import struct
    import zlib

    import numpy as np

    px = np.asarray(px, dtype=np.uint8)
    h, w, ch = px.shape
    bpp = ch
    flat = px.reshape(h, w * ch).astype(np.int32)
    lines = bytearray()
    prev = np.zeros(w * ch, dtype=np.int32)
    for y in range(h):
        cur, f = flat[y], int(filters[y])
        if f == 0:
            enc = cur
        elif f == 1:  # Sub
            left = np.concatenate([np.zeros(bpp, np.int32), cur[:-bpp]])
            enc = cur - left
        elif f == 2:  # Up
            enc = cur - prev
        elif f == 3:  # Average
            left = np.concatenate([np.zeros(bpp, np.int32), cur[:-bpp]])
            enc = cur - ((left + prev) >> 1)
        else:  # Paeth
            left = np.concatenate([np.zeros(bpp, np.int32), cur[:-bpp]])
            upleft = np.concatenate([np.zeros(bpp, np.int32), prev[:-bpp]])
            p = left + prev - upleft
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - upleft)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, upleft)
            )
            enc = cur - pred
        lines += bytes([f]) + bytes((enc % 256).astype(np.uint8))
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(lines)))
        + _png_chunk(b"IEND", b"")
    )


def _test_image(w=24, h=16, channels=3, seed=5):
    import numpy as np

    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w, channels), dtype=np.uint8)


def test_decode_png_all_filters_all_color_types():
    """Exact reconstruction through every PNG filter (cycling 0..4 by
    row) for gray / RGB / gray+alpha / RGBA — decoded gray equals the
    luma computed straight from the source array."""
    import numpy as np

    from frizzle_spark.functions.multimodal import decode_png

    for color, ch in ((0, 1), (2, 3), (4, 2), (6, 4)):
        px = _test_image(channels=ch)
        filters = [y % 5 for y in range(px.shape[0])]
        data = _encode_png(px, color, filters)
        gray, w, h = decode_png(data)
        assert (w, h) == (px.shape[1], px.shape[0])
        src = px.astype(np.float64)
        if ch in (1, 2):
            want = src[..., 0]
        else:
            want = 0.299 * src[..., 0] + 0.587 * src[..., 1] + 0.114 * src[..., 2]
        assert np.allclose(gray, want), (color, np.abs(gray - want).max())


def test_decode_png_single_filter_uniformity():
    """Each filter alone (whole image) reconstructs exactly — isolates
    a filter bug to its name instead of the cycling mix."""
    import numpy as np

    from frizzle_spark.functions.multimodal import decode_png

    px = _test_image(channels=3, seed=11)
    for f in range(5):
        data = _encode_png(px, 2, [f] * px.shape[0])
        gray, _, _ = decode_png(data)
        src = px.astype(np.float64)
        want = 0.299 * src[..., 0] + 0.587 * src[..., 1] + 0.114 * src[..., 2]
        assert np.allclose(gray, want), f


def test_png_pnm_luma_identity_and_phash():
    """The SAME pixels encoded as P6 PNM and as RGB PNG decode to the
    identical gray plane — so the real-decode phash is container-
    independent (the property that makes cross-format near-dup
    detection work)."""
    import numpy as np

    from frizzle_spark.functions.multimodal import (
        decode_png,
        decode_pnm,
        phash64_gray,
        try_decode_gray,
    )

    px = _test_image(w=32, h=24, channels=3, seed=23)
    pnm = b"P6\n%d %d\n255\n" % (px.shape[1], px.shape[0]) + px.tobytes()
    png = _encode_png(px, 2, [y % 5 for y in range(px.shape[0])])
    g1, w1, h1 = decode_pnm(pnm)
    g2, w2, h2 = decode_png(png)
    assert (w1, h1) == (w2, h2)
    assert np.array_equal(g1, g2)
    assert phash64_gray(g1) == phash64_gray(g2)
    # and the sniffing seam accepts both containers
    assert try_decode_gray(pnm) is not None
    assert try_decode_gray(png) is not None


def test_decode_png_rejects_unsupported_honestly():
    """Palette / 16-bit / interlaced / truncated / corrupt-zlib PNGs
    raise (or sniff to None) — never a silently wrong decode."""
    import struct
    import zlib

    import pytest as _pytest

    from frizzle_spark.functions.multimodal import decode_png, try_decode_gray

    px = _test_image(channels=3)
    good = _encode_png(px, 2, [0] * px.shape[0])

    def mutate_ihdr(**kw):
        w, h = px.shape[1], px.shape[0]
        fields = {"depth": 8, "color": 2, "interlace": 0}
        fields.update(kw)
        ihdr = struct.pack(
            ">IIBBBBB", w, h, fields["depth"], fields["color"], 0, 0,
            fields["interlace"],
        )
        body = zlib.compress(
            b"".join(b"\x00" + px[y].tobytes() for y in range(h))
        )
        return (
            b"\x89PNG\r\n\x1a\n"
            + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", body)
            + _png_chunk(b"IEND", b"")
        )

    for bad in (
        mutate_ihdr(color=3),  # palette
        mutate_ihdr(depth=16),
        mutate_ihdr(interlace=1),
        good[:60],  # truncated
        good[:40] + b"\x00" * 20 + good[60:],  # corrupt IDAT stream
    ):
        with _pytest.raises(ValueError):
            decode_png(bad)
        assert try_decode_gray(bad) is None
    assert try_decode_gray(good) is not None


def test_resize_image_real_png_round_trip():
    """resize_image decodes a real PNG and emits a re-decodable P5 of
    the requested dims, matching the same resize of the PNM encoding of
    the same pixels."""
    import numpy as np

    from frizzle_spark.functions.multimodal import decode_pnm, resize_image

    px = _test_image(w=32, h=24, channels=3, seed=29)
    pnm = b"P6\n%d %d\n255\n" % (px.shape[1], px.shape[0]) + px.tobytes()
    png = _encode_png(px, 2, [4] * px.shape[0])
    out_png = resize_image(png, 9, 8)
    out_pnm = resize_image(pnm, 9, 8)
    assert out_png == out_pnm
    gray, w, h = decode_pnm(out_png)
    assert (w, h) == (9, 8)
