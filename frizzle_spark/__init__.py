"""frizzle_spark — a PySpark-native analytics & streaming-pipeline engine.

A from-scratch engine with the query and data-processing capabilities of
qntfy/frizzle (a Go streaming message-bus: Source → Transform → Sink with
Ack/Fail accounting, DLQ, metrics — see /root/reference), re-expressed
Spark-first:

* the streaming bus is Structured Streaming (micro-batch DataFrames,
  checkpoint commits as the Ack analogue, ``foreachBatch`` DLQ routing,
  ``observe`` + listener metrics)  — :mod:`frizzle_spark.streaming`
* a full batch relational layer (joins, aggregation, windows, set ops,
  grouping sets, scalar functions) built ONLY on DataFrame/Catalyst
  primitives — :mod:`frizzle_spark.plans`
* LLM-data-pipeline operators (dedup families, vector similarity search,
  text analysis, multimodal column plumbing) — :mod:`frizzle_spark.operators`
  and :mod:`frizzle_spark.functions`

Everything is declarative DataFrame code so Catalyst gets full visibility:
predicate pushdown, column pruning, broadcast selection and AQE all apply.
"""

from frizzle_spark.session import get_spark
from frizzle_spark.sources.tables import TABLES, load_table, register_views

__version__ = "0.1.0"

__all__ = [
    "get_spark",
    "load_table",
    "register_views",
    "TABLES",
    "__version__",
    # streaming bus facade (imported lazily below to keep bare imports light)
    "Pipeline",
    "FileReplaySource",
    "KafkaSource",
    "KinesisSource",
    "RateSource",
    "ChainSource",
    "MemorySink",
    "ParquetSink",
    "KafkaSink",
    "ENVELOPE",
    "Transformer",
    "sep_transformer",
    "DictStats",
    "salted_join",
    "two_phase_agg",
    "interval_join",
    "materialize_minhash_index",
    "incremental_neardup",
    "write_bucketed",
    "read_bucketed",
    "lsh_params",
    "ivf_params",
    "candidate_fractions",
    "scan_csv",
    "scan_json",
    "scan_parquet",
    "scan_orc",
    "scan_avro",
    "write_orc",
    "redact_pii",
]


def __getattr__(name: str):
    """Lazy re-exports: ``frizzle_spark.Pipeline`` etc. without paying the
    streaming-module import on bare ``import frizzle_spark``."""
    from frizzle_spark.functions import text as _text
    from frizzle_spark.operators import dedup as _dedup
    from frizzle_spark.operators import similarity as _similarity
    from frizzle_spark.operators import skew as _skew
    from frizzle_spark.sources import bucketed as _bucketed
    from frizzle_spark.sources import files as _files
    from frizzle_spark.streaming import analytics as _analytics
    from frizzle_spark.streaming import metrics as _metrics
    from frizzle_spark.streaming import pipeline as _pipeline
    from frizzle_spark.streaming import transforms as _transforms

    for mod in (_pipeline, _transforms, _metrics, _skew, _analytics, _files,
                _bucketed, _text, _dedup, _similarity):
        if hasattr(mod, name):
            return getattr(mod, name)
    raise AttributeError(f"module 'frizzle_spark' has no attribute {name!r}")
