"""lasdb_spark — a PySpark-native point-cloud & data-pipeline analytics
engine with the query surface of cynthiacai56/lasdb (reference at
/root/reference, read-only), rebuilt Spark-first.

Layers:
- ``pcsfc``      Morton SFC math (driver planning + codegen Column exprs)
- ``sources``    point derivation, LAS reader/writer, parquet layouts
- ``operators``  ingest, window queries (bbox/circle/polygon/z/kNN),
                 dedup, similarity search, text analysis, multimodal
- ``streaming``  Structured Streaming ops over the events table
- ``cli``        JSON-script-compatible import/query/export entry points
"""

__version__ = "0.1.0"
