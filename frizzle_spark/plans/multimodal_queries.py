"""Q15 — multimodal column queries (decode / frame-sample / features).

The media table is derived from ``documents``: payload = UTF-8 bytes of
the text (an opaque BLOB, exactly the reference's ``Data() []byte``
payload model), media_type assigned round-robin from the source id.
The decode kernels are deterministic fakes (no imaging libs in the
container — see functions/multimodal.py) expressed as md5/length byte
functions, so DuckDB mirrors the whole Pandas-UDF path and the Arrow
plumbing is oracle-checked end-to-end.

Scale: ``mapInPandas`` over a binary column is the pattern for 100 TB
media work — Arrow batches bound worker memory; the decode stage is
embarrassingly parallel (no shuffle); fan-out stages (frame sampling)
multiply rows map-side BEFORE any shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from frizzle_spark.functions.multimodal import (
    FRAME_SCHEMA,
    MEDIA_META_SCHEMA,
    extract_features_batch,
    make_decode_kernel,
    make_features_kernel,
    make_phash_kernel,
    sample_frames_batch,
)
from frizzle_spark.plans.registry import query
from frizzle_spark.sources.tables import load_table

_MEDIA_TYPE_SQL = """
    CASE CAST(substr(source, 4, 10) AS BIGINT) % 3
         WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END
"""


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → (doc_id, payload BINARY, media_type) media table.

    NULL-text documents are dropped at this boundary — a media row
    without a payload has nothing to decode, and the Arrow kernels
    would otherwise meet None batches (null-corpus totality sweep,
    round 6).  The q15 oracles carry the same IS NOT NULL filter."""
    docs = load_table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    src_num = F.substring("source", 4, 10).cast("long")
    media_type = (
        F.when(src_num % 3 == 0, "image")
        .when(src_num % 3 == 1, "audio")
        .otherwise("video")
    )
    return docs.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        media_type.alias("media_type"),
    )


@query(
    "q15_media_decode",
    oracle=f"""
    SELECT doc_id,
           {_MEDIA_TYPE_SQL} AS media_type,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           CAST(16 + ('0x' || substr(md5(text), 1, 4))::BIGINT % 64 AS BIGINT) AS width,
           CAST(16 + ('0x' || substr(md5(text), 5, 4))::BIGINT % 64 AS BIGINT) AS height,
           md5(text) AS fingerprint
    FROM documents WHERE text IS NOT NULL
    """,
)
def q15_media_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode stage: binary payload → typed metadata via mapInPandas.

    The kernel's real-vs-stub dispatch resolves here, driver-side, via
    the FRIZZLE_REAL_DECODE gate (default stub — matches the oracle);
    PNM payloads decode for real when enabled.
    """
    return media_table(spark, sf_dir).mapInPandas(
        make_decode_kernel(), MEDIA_META_SCHEMA
    )


@query(
    "q15_frame_sample",
    oracle="""
    WITH media AS (
        SELECT doc_id, md5(text) AS fp,
               octet_length(encode(text)) % 4 AS extra
        FROM documents WHERE text IS NOT NULL
    )
    SELECT doc_id,
           CAST(unnest(generate_series(0, extra)) AS BIGINT) AS frame_idx,
           md5(fp || ':' || unnest(generate_series(0, extra))) AS frame_fp
    FROM media
    """,
)
def q15_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling stage: UDTF-shaped mapInPandas fan-out (1-4 frames
    per media row, deterministic)."""
    return media_table(spark, sf_dir).mapInPandas(sample_frames_batch, FRAME_SCHEMA)


_FEATURE_COLS = ", ".join(
    f"CAST(sum(CASE WHEN k = {j} THEN 1 ELSE 0 END) AS DOUBLE)"
    f" / any_value(n) AS f{j}"
    for j in range(8)
)

_FEATURES_ORACLE = f"""
    WITH chars AS (
        SELECT doc_id, text, length(text) AS n,
               unnest(generate_series(1, length(text))) AS i
        FROM documents WHERE text IS NOT NULL
    ),
    classed AS (
        SELECT doc_id, n, ascii(substr(text, i, 1)) % 8 AS k FROM chars
    )
    SELECT doc_id, {_FEATURE_COLS}
    FROM classed
    GROUP BY doc_id
"""


@query("q15_media_features", oracle=_FEATURES_ORACLE)
def q15_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-extraction stage: payload → 8-dim features (flat double
    columns).  Default (oracle-matched): byte-histogram stub, raw
    divisions, no re-rounding.  Under FRIZZLE_REAL_DECODE=1, PCM WAV
    payloads get genuine time-domain audio features through the same
    schema (functions/multimodal.make_features_kernel — the audio
    counterpart of the q15_media_decode PNM seam)."""
    feature_schema = "doc_id bigint, " + ", ".join(f"f{j} double" for j in range(8))
    return media_table(spark, sf_dir).mapInPandas(
        make_features_kernel(), feature_schema
    )



PHASH_BANDS = 8  # 8 bands × 8 bits: identical-band GUARANTEE for ham ≤ 7
PHASH_HAM_MAX = 7


@query("qz15_phash_neardup", oracle=None)
def qz15_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash near-duplicate detection over the media tier —
    image-dedup's pipeline shape (thumbnail → dHash → band buckets →
    hamming verify) running on the byte-domain dHash of
    functions/multimodal.phash64 (the decode seam swaps in a real
    grayscale thumbnail; everything downstream is unchanged).

    Banding gives a DETERMINISTIC recall guarantee, unlike MinHash's
    probabilistic one: 8 bands of 8 bits means any pair within
    PHASH_HAM_MAX=7 differing bits shares at least one untouched band
    (pigeonhole), so recall within the threshold is exactly 1 — the
    pytest gate brute-forces all pairs and asserts it.  Scale shape:
    one Arrow pass computes 8-byte signatures (the corpus' media bytes
    are read ONCE and reduced 10⁶×); the self-join is a hash EQUI-join
    on (band_id, band_value) over 8 narrow rows per asset — never an
    all-pairs scan — and candidates dedup before the bit_count verify.
    Rows-only at the driver (the kernel is numpy; pytest holds the
    numpy-differential, planted-edit, and exhaustive-recall gates).
    """
    sig = media_table(spark, sf_dir).mapInPandas(
        make_phash_kernel(), "doc_id long, phash long"
    )
    bands = sig.select(
        "doc_id",
        "phash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band_id"),
                        F.expr(f"shiftrightunsigned(phash, {8 * i}) & 255").alias(
                            "band_val"
                        ),
                    )
                    for i in range(PHASH_BANDS)
                ]
            )
        ).alias("b"),
    ).select("doc_id", "phash", "b.band_id", "b.band_val")
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.phash").alias("ha"),
            F.col("b.phash").alias("hb"),
        )
        .distinct()
    )
    return (
        cand.withColumn("hamming", F.expr("bit_count(ha ^ hb)").cast("long"))
        .where(F.col("hamming") <= PHASH_HAM_MAX)
        .select("doc_a", "doc_b", "hamming")
    )


# keep the array-typed variant importable for pipeline composition
__all__ = ["media_table", "extract_features_batch"]
