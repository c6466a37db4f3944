"""PySpark-native analytics/ETL engine with the capabilities of the
``maxtybar/opensearch-dynamodb-etl-cdk`` reference pipeline.

The reference (see /root/repo/SURVEY.md) is a DynamoDB → OpenSearch
change-data-capture ETL: DynamoDB-JSON unmarshalling, content-based
routing, keyed upsert/delete into search indexes with a dead-letter
queue, plus the query surface (DynamoDB access patterns + OpenSearch
query DSL) the pipeline exists to enable.

This package re-expresses all of that Spark-first:

- ``functions/``  column-expression libraries (DynamoDB-JSON codec,
  composite keys, text analysis, vector math) — JVM-side, codegen-able.
- ``sources/``    batch export reader + CDC stream source.
- ``operators/``  routing, keyed upsert, search-DSL interpreter,
  dedup, similarity search, multimodal plumbing.
- ``streaming/``  the bootstrap+tail pipeline (foreachBatch merge, DLQ).
- ``plans/``      the named-query catalog consumed by __spark_entry__.py
  (Spark callable + DuckDB oracle SQL twins).
"""

__version__ = "0.1.0"
