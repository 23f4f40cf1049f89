"""PySpark-native analytics engine with the capabilities of
haixiang/gcp-cloudsql-to-bigquery (reference at /root/reference/).

The reference is a CloudSQL→GCS→BigQuery ETL pipeline that delegates all
relational computation to MySQL/BigQuery.  This package rebuilds the whole
capability surface Spark-first:

- ``ingest``     — reference-parity ELT core: type mapping, name sanitizing,
                   NULL-sentinel handling, schema JSON round-trip, schema-applied
                   loads (SURVEY.md §2A #12-#21, #25).
- ``sources``    — scan/source helpers (parquet/csv/jdbc-style catalog reads).
- ``operators``  — relational operators, joins, aggregations, windows, dedup,
                   similarity search, text analysis (SURVEY.md §2B).
- ``functions``  — scalar function library (string/date/math/array/JSON).
- ``streaming``  — Structured Streaming slice (windows, watermark, dedup).
- ``plans``      — plan-inspection helpers (pushdown/broadcast assertions).
- ``workload``   — the query registry consumed by ``__spark_entry__.py``.
"""

__version__ = "0.1.0"
