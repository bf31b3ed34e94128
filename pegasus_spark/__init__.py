"""pegasus_spark — a from-scratch PySpark-native analytics + crawl engine.

Re-expresses the query/data-processing capabilities of the reference crawler
framework (nju04zq/pegasus, studied at /root/reference) as idiomatic Spark:

- ``pegasus_spark.session``    — SparkSession factory (AQE tuning, Arrow,
  UTC, executor PYTHONPATH).
- ``pegasus_spark.crawler``    — URL frontier + fetch scheduler (the north
  rule): politeness + robots.txt in-batch, bloom/cuckoo URL-seen, priority
  dequeue, CDC merge, versioned snapshots + checkpoint manifest, retries.
- ``pegasus_spark.analytics``  — the oracle-checked query registry
  (reference reports, TPC-H-shaped joins, training-data pipeline queries)
  plus the crawled-table report suite.
- ``pegasus_spark.textops``    — dedup (exact/MinHash-LSH/SimHash/Jaccard),
  similarity search (cosine/sign-LSH/hyperplane ANN), text analysis.
- ``pegasus_spark.multimodal`` — image/audio/video binary-column operators.
- ``pegasus_spark.streaming``  — watermarked metrics stream + stateful
  per-host counters.
- ``pegasus_spark.io_utils``   — CSV/JSON export-import with count verify.
"""

__version__ = "0.1.0"
