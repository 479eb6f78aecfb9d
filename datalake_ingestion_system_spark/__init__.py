"""datalake_ingestion_system_spark — a PySpark-native analytics & ingestion engine.

A ground-up rebuild, on idiomatic Spark (DataFrame / Spark SQL / Catalyst /
Structured Streaming), of the capability envelope of the reference system
``liang-wu-1985/DataLake_Ingestion_System`` (a Glue/PySpark-2 metadata-driven
CSV→Parquet lake ingestion pipeline whose ad-hoc query surface was delegated
to Athena/Presto; see SURVEY.md).

Layout:
- ``session``    — tuned SparkSession factory (local testing; scale-ready conf)
- ``catalog``    — test-lake table loading / temp-view registration
- ``sources``    — landing-zone CSV source (filename grammar), config registry,
                   JDBC source with incremental watermark
- ``plans``      — the batch ingestion pipeline (routing, quarantine, state)
- ``streaming``  — Structured Streaming ingestion + windowed aggregations
- ``operators``  — reusable relational / dedup / similarity / text operators
- ``functions``  — column-level helpers (vector math, hashing, tokenization)
- ``queries``    — the named query registry consumed by ``__spark_entry__``
"""

__version__ = "0.1.0"
