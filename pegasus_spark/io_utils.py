"""Export/import utilities — SURVEY §2.1 S6/S7.

Rebuilds the reference's tooling:
- S6: per-table CSV export + import with row-count verification
  (/root/reference/src/pegasus/tools/export.py:9-46, import.py:10-54 — the
  `SELECT … INTO OUTFILE` / `LOAD DATA INFILE` pair with its
  lines-vs-COUNT(*) check, import.py:25-37).
- S7: JSON result dump (/root/reference/src/pegasus/mergesort/dumpres.go:27-42).

Spark-side these are one-liners; the value is the verified round-trip
contract: export returns the count it wrote, import re-counts and raises on
mismatch — the reference prints OK/??? per table, we fail loudly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def export_csv(df: DataFrame, path: str) -> int:
    """Write df as headered CSV; returns the exported row count."""
    n = df.count()
    df.write.mode("overwrite").option("header", "true").csv(path)
    return n


def import_csv(
    spark: SparkSession, path: str, schema: StructType, expected_rows: int | None = None
) -> DataFrame:
    """Read a CSV export back with an explicit schema (no inference — the
    reference's DDL is fixed, import.py:56-96). If ``expected_rows`` is
    given, verify the round-trip count (import.py:25-37) and raise on drift."""
    df = spark.read.option("header", "true").schema(schema).csv(path)
    if expected_rows is not None:
        got = df.count()
        if got != expected_rows:
            raise ValueError(f"csv round-trip mismatch: expected {expected_rows}, got {got}")
    return df


def dump_json(df: DataFrame, path: str) -> int:
    """S7: JSON result dump."""
    n = df.count()
    df.write.mode("overwrite").json(path)
    return n
