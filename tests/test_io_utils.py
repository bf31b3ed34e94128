"""S6/S7 round-trip tests: CSV export/import with count verification, JSON dump."""

from __future__ import annotations

import pytest
from pyspark.sql.types import IntegerType, StringType, StructField, StructType

from pegasus_spark.io_utils import dump_json, export_csv, import_csv

SCHEMA = StructType(
    [StructField("aid", StringType()), StructField("price", IntegerType())]
)


def test_csv_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([("a1", 100), ("a2", 200), ("a3", 300)], SCHEMA)
    n = export_csv(df, str(tmp_path / "out"))
    assert n == 3
    back = import_csv(spark, str(tmp_path / "out"), SCHEMA, expected_rows=3)
    assert sorted((r["aid"], r["price"]) for r in back.collect()) == [
        ("a1", 100), ("a2", 200), ("a3", 300)
    ]


def test_csv_count_mismatch_raises(spark, tmp_path):
    df = spark.createDataFrame([("a1", 100)], SCHEMA)
    export_csv(df, str(tmp_path / "out"))
    with pytest.raises(ValueError, match="round-trip mismatch"):
        import_csv(spark, str(tmp_path / "out"), SCHEMA, expected_rows=2)


def test_json_dump(spark, tmp_path):
    df = spark.createDataFrame([("a1", 1)], SCHEMA)
    assert dump_json(df, str(tmp_path / "j")) == 1
    assert spark.read.json(str(tmp_path / "j")).count() == 1
