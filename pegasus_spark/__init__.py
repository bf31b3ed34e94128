"""pegasus_spark — a from-scratch PySpark-native analytics + crawl engine.

Re-expresses the query/data-processing capabilities of the reference crawler
framework (nju04zq/pegasus, studied at /root/reference) as idiomatic Spark:

- ``pegasus_spark.session``   — SparkSession factory (AQE, Arrow, UTC).
- ``pegasus_spark.tables``    — snapshot-versioned parquet tables (Iceberg
  stand-in for this sandbox; no Iceberg runtime jar is available).
- ``pegasus_spark.crawler``   — URL frontier + fetch scheduler (the north
  rule): politeness, robots, bloom URL-seen, priority dequeue, CDC merge.
- ``pegasus_spark.operators`` — relational/top-K/window/dedup/similarity/
  text operators used by the analytics surface.
- ``pegasus_spark.analytics`` — the reference's report/time-series queries
  re-expressed over DataFrames.
- ``pegasus_spark.fixtures``  — deterministic synthetic site + image payload
  generators (seed=42) for tests and benchmarks.
"""

__version__ = "0.1.0"
