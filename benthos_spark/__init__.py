"""benthos_spark — a PySpark-native streaming/analytics engine with the
query and data-processing capabilities of the Benthos v3 stream processor
(reference: windhooked/benthos), re-expressed Spark-first.

Layers:
- ``bloblang``: mapping DSL (parser + interpreter + Catalyst compiler)
- ``engine``: YAML pipeline spec -> DataFrame plan compiler + processors
- ``streaming``: windows, stateful dedupe, idempotent sink, checkpointing
- ``ops``: large-scale training-data operators (dedup, similarity, text)
"""

__version__ = "0.1.0"
