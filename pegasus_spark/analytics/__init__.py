"""Analytics surface: the reference's report/time-series queries (SURVEY.md
§2.4-§2.8) re-expressed as Spark DataFrame plans, plus the DuckDB oracle SQL
twins used by the driver's correctness gate."""

from pegasus_spark.analytics.queries import ORACLE_SQL, QUERIES  # noqa: F401
