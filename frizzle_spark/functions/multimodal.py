"""Multimodal (image/audio/video) column plumbing for training-data
pipelines.

Design: media payloads are opaque ``binary`` columns + typed metadata —
exactly how the reference treats every payload (``Data() []byte``,
reference msg.go:17) — and decode / feature-extract / resize /
frame-sample run as Arrow-batched Pandas UDFs over ``mapInPandas`` so
the heavy per-byte work happens columnar-batch-at-a-time in Python
workers, never row-at-a-time.

The decode kernels here are DETERMINISTIC FAKES: the container has no
image/audio libraries (PIL / libav are absent), so the byte→pixels step
is simulated as a pure function of the payload bytes (length + md5).
The Spark-side plumbing — schemas, ``mapInPandas`` signatures, Arrow
batch iteration, partition behavior, explode shape for frame sampling —
is real and tested, and the fakes are mirrored in DuckDB SQL so the
whole path is oracle-checked.  Swapping in a real decoder is a
one-function change (see ``resize_image``).

Scale: mapInPandas streams Arrow batches; memory per task is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch``; media blobs should be
size-capped per row (spark.sql row limits) with large assets chunked or
referenced by URI — documented here as the 100 TB pattern.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

MEDIA_META_SCHEMA = (
    "doc_id bigint, media_type string, n_bytes bigint, "
    "width bigint, height bigint, fingerprint string"
)

FRAME_SCHEMA = "doc_id bigint, frame_idx bigint, frame_fp string"

FEATURE_DIM = 8
FEATURE_SCHEMA = f"doc_id bigint, features array<double>"


def _fake_dims(data: bytes) -> tuple[int, int]:
    """Deterministic fake decode: dimensions from the md5 of the bytes.

    A real decoder would parse the container header; this is a pure
    byte-function so DuckDB can mirror it:
    width  = 16 + (first 4 md5 hex digits as int) % 64
    height = 16 + (next 4 md5 hex digits as int) % 64
    """
    h = hashlib.md5(data).hexdigest()
    return 16 + int(h[:4], 16) % 64, 16 + int(h[4:8], 16) % 64


def decode_media_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: (doc_id, payload, media_type) → typed metadata."""
    for pdf in batches:
        data = pdf["payload"]
        dims = data.map(lambda b: _fake_dims(bytes(b)))
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "media_type": pdf["media_type"],
                "n_bytes": data.map(len).astype("int64"),
                "width": dims.map(lambda d: d[0]).astype("int64"),
                "height": dims.map(lambda d: d[1]).astype("int64"),
                "fingerprint": data.map(lambda b: hashlib.md5(bytes(b)).hexdigest()),
            }
        )


def sample_frames_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel with row fan-out (UDTF shape): one row per
    sampled 'frame'.  n_frames = 1 + n_bytes % 4; frame fingerprint =
    md5(media_fp + ':' + idx) — all mirrored in the SQL oracle."""
    for pdf in batches:
        out: dict[str, list] = {"doc_id": [], "frame_idx": [], "frame_fp": []}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            b = bytes(payload)
            fp = hashlib.md5(b).hexdigest()
            for i in range(1 + len(b) % 4):
                out["doc_id"].append(doc_id)
                out["frame_idx"].append(i)
                out["frame_fp"].append(
                    hashlib.md5(f"{fp}:{i}".encode()).hexdigest()
                )
        yield pd.DataFrame(out)


def extract_features_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: deterministic 8-dim 'embedding' from payload
    bytes (byte-bucket histogram, L1-normalized) — the feature-extract
    stage's plumbing with a swappable kernel."""
    for pdf in batches:
        feats = []
        for payload in pdf["payload"]:
            b = bytes(payload)
            hist = [0] * FEATURE_DIM
            for byte in b:
                hist[byte % FEATURE_DIM] += 1
            total = max(sum(hist), 1)
            feats.append([round(h / total, 6) for h in hist])
        yield pd.DataFrame({"doc_id": pdf["doc_id"], "features": feats})


PHASH_CHUNKS = 65  # 64 adjacent-comparison bits, dHash-style


def phash64(data: bytes) -> int:
    """64-bit byte-domain perceptual hash (dHash over chunk means).

    The payload is split into PHASH_CHUNKS equal byte ranges; bit k is
    ``mean(chunk k) > mean(chunk k+1)`` — the adjacent-gradient scheme
    of image dHash applied to the byte stream, so SMALL payload edits
    flip FEW bits (an edit touches one or two chunk means → at most ~4
    bits), while unrelated payloads differ in ~32.  This is a real
    locality-sensitive signature (ssdeep-style piecewise hashing), not
    a fake; for decoded images the same function would run over the
    grayscale thumbnail instead of raw bytes (the decode seam of
    ``resize_image``).  Returned as a signed int64 (Spark LongType
    bit-pattern).
    """
    import numpy as np

    b = np.frombuffer(data, dtype=np.uint8)
    n = len(b)
    bounds = np.array(
        [(k * n) // PHASH_CHUNKS for k in range(PHASH_CHUNKS + 1)], dtype=np.int64
    )
    counts = np.diff(bounds)
    if n >= PHASH_CHUNKS:
        # every chunk non-empty → one reduceat accumulating straight
        # into int64 (dtype=, no 8× astype copy of the payload; uint8
        # accumulation would overflow).  float64 holds sums ≤ 255·n
        # exactly, so the division is bit-identical to per-slice .mean()
        sums = np.add.reduceat(b, bounds[:-1], dtype=np.int64)
        means = sums / counts
    else:
        means = np.array(
            [
                float(b[bounds[k] : bounds[k + 1]].mean()) if counts[k] else 0.0
                for k in range(PHASH_CHUNKS)
            ]
        )
    bits = means[:-1] > means[1:]
    acc = np.uint64(0)
    for k in np.nonzero(bits)[0]:
        acc |= np.uint64(1) << np.uint64(k)
    return int(acc.astype(np.int64))


def phash_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: (doc_id, payload) → (doc_id, phash int64)."""
    for pdf in batches:
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "phash": pdf["payload"].map(lambda b: phash64(bytes(b))),
            }
        )


def resize_image(data: bytes, width: int, height: int) -> bytes:
    """Real image resize — requires an imaging library not present in
    this container.  The plumbing (signature, typed stub) is the
    committed surface; decode stays behind this seam."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "image resize requires PIL; container has no imaging libs "
            "(decode is stubbed deterministically — see module docstring)"
        ) from e
    raise NotImplementedError("real decode path not exercised in this container")
