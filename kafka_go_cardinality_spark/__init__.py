"""kafka_go_cardinality_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of the reference system
``MatejaMaric/kafka-go-cardinality`` (a Go Kafka→HLL→Kafka streaming
approximate-cardinality pipeline, see ``/root/reference``), built Spark-first:

- the reference's windowed approximate count-distinct pipeline as both a
  batch query family (``operators.cardinality``) and a Structured Streaming
  pipeline (``streaming.pipeline``);
- the full relational extension surface mandated by SURVEY.md §2.3
  (scans, filters, joins, aggregations, window functions, set ops, scalar /
  array / JSON functions) in ``operators.relational``;
- large-scale training-data-pipeline operators: deduplication
  (``operators.dedup``), similarity search (``operators.similarity``),
  text analysis (``operators.text``), multimodal column plumbing
  (``operators.multimodal``).

Everything is declarative DataFrame/SQL so Catalyst + Tungsten pick the
physical strategy; Python UDFs appear only where built-ins genuinely cannot
express the semantics (and then as Arrow-batched pandas UDFs).
"""

__version__ = "0.1.0"
