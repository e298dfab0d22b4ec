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

__all__ = ["get_spark", "load_table", "register_views", "TABLES", "__version__"]
