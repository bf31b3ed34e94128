"""Training-data pipeline operators over document/embedding tables.

- text       — language-ID, quality scoring, token counting, fingerprinting
- dedup      — exact, MinHash+LSH, SimHash, n-gram Jaccard near-dup
- similarity — brute-force cosine top-k + LSH-bucketed ANN

Every operator is a pure DataFrame transform (JVM expressions where
possible, hashlib-parity pandas UDFs where vectorization needs numpy), each
with a DuckDB-SQL twin in pegasus_spark.analytics.pipeline_queries so the
driver's oracle gate covers them.
"""
