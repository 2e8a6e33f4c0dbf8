"""simple_stream_processor_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capability surface of the reference
stream-processing framework (``yianni/simple-stream-processor``, studied
read-only at /root/reference) on Apache Spark: DataFrame/Catalyst for the
batch surface, Structured Streaming for the unbounded surface, plus the
relational and LLM-data-pipeline extensions a 100 TB training-data engine
needs (dedup, similarity search, text analysis, multimodal plumbing).

Design stance (see SURVEY.md):
- Declarative first: every operator builds a Catalyst logical plan via the
  DataFrame/SQL API; Tungsten/AQE pick the physical strategy.
- UDFs are the slow path: Pandas UDFs (Arrow-batched) only where built-in
  functions genuinely cannot express the semantics.
- Ordering is explicit: Spark only guarantees order after a sort, so every
  order-sensitive operator carries a deterministic sort key (the analog of
  the reference's ordered-parMap contract, reference Stream.scala:103-186).
"""

from simple_stream_processor_spark.pipeline import Pipeline
from simple_stream_processor_spark.session import get_spark
from simple_stream_processor_spark.tables import load_table, register_views

__all__ = ["Pipeline", "get_spark", "load_table", "register_views"]

__version__ = "0.1.0"
