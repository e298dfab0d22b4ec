"""Similarity search over the ``embeddings`` table (north-star extension;
the reference has nothing of the kind — SURVEY.md §2.2).

Two tiers, as a 100 TB design demands:

* ``q12_cosine_topk`` — exact brute force: broadcast the (small) probe
  set against the full corpus, one codegen'd pass, per-probe top-k via
  window + filter.  This is the correctness baseline and the oracle-
  checked query.  Scale shape: corpus-partitioned map-side scoring; the
  only shuffle carries |probes|×k-ish candidate rows (window on probe_id
  after a per-partition prune would make it fully heap-like; at our
  probe counts the window is already tiny).
* ``q12_ann_lsh`` — approximate: random-hyperplane (SimHash) bucketing
  with multiprobe (Hamming-1) search.  Buckets partition the corpus, so
  each probe touches ~(1+nbits)/2^nbits of the data instead of all of
  it.  Recall on *random* vectors is modest by construction (no real
  cluster structure in the testdata — verified, max pairwise cos 0.51);
  the pytest recall gate is calibrated against the candidate fraction.

Hyperplanes are deterministic (numpy seed 42) and shipped as literal
arrays — broadcast constants, no Python in the scoring path.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from frizzle_spark.functions import vectors as V
from frizzle_spark.plans.registry import query
from frizzle_spark.sources.tables import load_table

N_PROBES = 10
TOP_K = 5
DIM = 64
LSH_BITS = 4


def _corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    v = V.as_double(F.col("embedding"))
    return emb.select("vec_id", v.alias("v")).withColumn("nrm", V.norm(F.col("v")))


@query(
    "q12_cosine_topk",
    oracle=f"""
    WITH corpus AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
               sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                     CAST(embedding AS DOUBLE[]))) AS nrm
        FROM embeddings
    ),
    probes AS (
        SELECT vec_id AS probe_id, v AS pv, nrm AS pnrm
        FROM corpus ORDER BY vec_id LIMIT {N_PROBES}
    ),
    scored AS (
        SELECT probe_id, vec_id AS neighbor_id,
               list_dot_product(pv, v) / (pnrm * nrm) AS cos_sim
        FROM probes, corpus
        WHERE vec_id <> probe_id
    ),
    ranked AS (
        SELECT *, row_number() OVER (PARTITION BY probe_id
                                     ORDER BY cos_sim DESC, neighbor_id) AS rank
        FROM scored
    )
    SELECT probe_id, neighbor_id, round(cos_sim, 6) AS cos_sim,
           CAST(rank AS BIGINT) AS rank
    FROM ranked WHERE rank <= {TOP_K}
    """,
)
def q12_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-k cosine neighbors for the 10 lowest-id probe vectors."""
    corpus = _corpus(spark, sf_dir)
    probes = corpus.orderBy("vec_id").limit(N_PROBES).select(
        F.col("vec_id").alias("probe_id"),
        F.col("v").alias("pv"),
        F.col("nrm").alias("pnrm"),
    )
    scored = (
        corpus.join(F.broadcast(probes), F.col("vec_id") != F.col("probe_id"))
        .withColumn("cos_sim", V.cosine(F.col("pv"), F.col("v"), F.col("pnrm"), F.col("nrm")))
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= TOP_K)
        .select(
            "probe_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round("cos_sim", 6).alias("cos_sim"),
            "rank",
        )
    )


def _hyperplanes() -> list[list[float]]:
    rng = np.random.RandomState(42)
    return rng.randn(LSH_BITS, DIM).tolist()


def _bucket_expr(vec: F.Column) -> F.Column:
    """LSH bucket id: sign bits of the vector against LSH_BITS hyperplanes."""
    planes = _hyperplanes()
    bucket = F.lit(0).cast("long")
    for j, plane in enumerate(planes):
        h = F.array(*[F.lit(float(x)) for x in plane])
        bit = (V.dot(h, vec) >= 0).cast("long")
        bucket = bucket + F.shiftleft(bit, j)
    return bucket


@query("q12_ann_lsh", oracle=None)
def q12_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k via random-hyperplane LSH with Hamming-1 multiprobe.

    No SQL oracle (bucketing is not expressible without replicating the
    hyperplane literals); pytest checks recall against q12_cosine_topk.
    """
    corpus = _corpus(spark, sf_dir).withColumn("bucket", _bucket_expr(F.col("v")))
    probes = (
        corpus.orderBy("vec_id")
        .limit(N_PROBES)
        .select(
            F.col("vec_id").alias("probe_id"),
            F.col("v").alias("pv"),
            F.col("nrm").alias("pnrm"),
            F.col("bucket").alias("pbucket"),
        )
    )
    # multiprobe: exact bucket + all Hamming-1 variants
    variants = F.array(
        F.col("pbucket"), *[F.col("pbucket").bitwiseXOR(F.lit(1 << j)) for j in range(LSH_BITS)]
    )
    probe_buckets = probes.withColumn("bucket", F.explode(variants))
    cand = corpus.join(
        F.broadcast(probe_buckets), on="bucket"
    ).where(F.col("vec_id") != F.col("probe_id"))
    scored = cand.withColumn(
        "cos_sim", V.cosine(F.col("pv"), F.col("v"), F.col("pnrm"), F.col("nrm"))
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= TOP_K)
        .select(
            "probe_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round("cos_sim", 6).alias("cos_sim"),
            "rank",
        )
    )


@query(
    "q11_embedding_neardup",
    oracle="""
    WITH corpus AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
               sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                     CAST(embedding AS DOUBLE[]))) AS nrm
        FROM embeddings
    )
    SELECT a.vec_id AS id1, b.vec_id AS id2,
           round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6) AS cos_sim
    FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id
    WHERE list_dot_product(a.v, b.v) / (a.nrm * b.nrm) >= 0.4
    """,
)
def q11_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (cos ≥ 0.4 on this corpus).

    Brute-force all-pairs at test scale; the documented scale path is the
    same LSH bucketing as q12_ann_lsh used as a self-join blocker (bucket
    equality before scoring) — O(n²/buckets) instead of O(n²).
    """
    corpus = _corpus(spark, sf_dir)
    a = corpus.select(
        F.col("vec_id").alias("id1"), F.col("v").alias("v1"), F.col("nrm").alias("n1")
    )
    b = corpus.select(
        F.col("vec_id").alias("id2"), F.col("v").alias("v2"), F.col("nrm").alias("n2")
    )
    cos = V.cosine(F.col("v1"), F.col("v2"), F.col("n1"), F.col("n2"))
    return (
        a.join(b, F.col("id1") < F.col("id2"))
        .withColumn("cos_raw", cos)
        .where(F.col("cos_raw") >= 0.4)
        .select("id1", "id2", F.round("cos_raw", 6).alias("cos_sim"))
    )
