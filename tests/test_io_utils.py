"""S6/S7 round-trip tests: CSV export/import with count verification, JSON dump."""

from __future__ import annotations

import pytest
import pyspark.sql.functions as F
from pyspark.sql.types import IntegerType, StringType, StructField, StructType

from pegasus_spark.io_utils import (
    dump_json,
    export_archive,
    export_csv,
    import_archive,
    import_csv,
)

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


SCHEMA2 = StructType(
    [StructField("region", StringType()), StructField("cnt", IntegerType())]
)


def test_archive_roundtrip(spark, tmp_path):
    """Reference export/import packaging fidelity: per-table CSVs in ONE
    .tgz, counts verified on import (export.py:31-44, import.py:25-37)."""
    import tarfile

    dfs = {
        "apartments": spark.createDataFrame([("a1", 100), ("a2", 200)], SCHEMA),
        "regions": spark.createDataFrame([("pudong", 2)], SCHEMA2),
    }
    tgz = str(tmp_path / "data.tgz")
    counts = export_archive(dfs, tgz)
    assert counts == {"apartments": 2, "regions": 1}
    with tarfile.open(tgz, "r:gz") as tf:
        assert sorted(tf.getnames()) == ["apartments.csv", "regions.csv"]
    back = import_archive(
        spark, tgz, {"apartments": SCHEMA, "regions": SCHEMA2}, expected_rows=counts
    )
    assert sorted(
        (r["aid"], r["price"]) for r in back["apartments"].collect()
    ) == [("a1", 100), ("a2", 200)]
    assert back["regions"].collect()[0]["region"] == "pudong"


def test_archive_count_mismatch_raises(spark, tmp_path):
    dfs = {"apartments": spark.createDataFrame([("a1", 100)], SCHEMA)}
    tgz = str(tmp_path / "data.tgz")
    export_archive(dfs, tgz)
    with pytest.raises(ValueError, match="round-trip mismatch"):
        import_archive(spark, tgz, {"apartments": SCHEMA}, expected_rows={"apartments": 5})


def test_archive_reused_extract_dir_ignores_stale_files(spark, tmp_path):
    """The archive's member list — not the extract dir's contents — defines
    the table set: re-importing a rewritten tgz into the same default
    extract_dir must not resurrect tables from the earlier archive."""
    tgz = str(tmp_path / "data.tgz")
    v1 = {
        "apartments": spark.createDataFrame([("a1", 100)], SCHEMA),
        "regions": spark.createDataFrame([("pudong", 1)], SCHEMA2),
    }
    export_archive(v1, tgz)
    import_archive(spark, tgz, {"apartments": SCHEMA, "regions": SCHEMA2})
    # v2 drops the regions table; the stale regions.csv stays on disk
    export_archive({"apartments": spark.createDataFrame([("a2", 200)], SCHEMA)}, tgz)
    with pytest.raises(ValueError, match="missing tables"):
        import_archive(spark, tgz, {"apartments": SCHEMA, "regions": SCHEMA2})
    back = import_archive(spark, tgz, {"apartments": SCHEMA})
    assert sorted(back) == ["apartments"]
    assert back["apartments"].collect()[0]["aid"] == "a2"


def test_archive_missing_table_raises(spark, tmp_path):
    dfs = {"apartments": spark.createDataFrame([("a1", 100)], SCHEMA)}
    tgz = str(tmp_path / "data.tgz")
    export_archive(dfs, tgz)
    with pytest.raises(ValueError, match="missing tables"):
        import_archive(spark, tgz, {"apartments": SCHEMA, "regions": SCHEMA2})


class TestBucketedJoin:
    """Executable proof of the co-located-join claim the scale notes make
    (corpus_diff et al.): two tables bucketed the same way on the join
    key sort-merge-join with NO Exchange in the physical plan — the
    shuffle happened once at write time."""

    def test_bucketed_join_has_no_exchange(self, spark, tmp_path):
        from pegasus_spark.io_utils import write_bucketed

        orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        lineitem = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        write_bucketed(
            orders, "b_orders", str(tmp_path / "b_orders"), "o_orderkey", 8
        )
        write_bucketed(
            lineitem, "b_lineitem", str(tmp_path / "b_lineitem"), "l_orderkey", 8
        )
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            j = spark.table("b_lineitem").join(
                spark.table("b_orders"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            plan = j._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" not in plan, plan
            assert "SortMergeJoin" in plan, plan
            # same rows as the plain (shuffled) join
            want = lineitem.join(
                orders, F.col("l_orderkey") == F.col("o_orderkey")
            ).count()
            assert j.count() == want
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
            spark.sql("DROP TABLE IF EXISTS b_orders")
            spark.sql("DROP TABLE IF EXISTS b_lineitem")

    def test_bucketed_aggregation_has_no_exchange(self, spark, tmp_path):
        from pegasus_spark.io_utils import write_bucketed

        lineitem = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        write_bucketed(
            lineitem, "b_li_agg", str(tmp_path / "b_li_agg"), "l_orderkey", 8
        )
        try:
            agg = (
                spark.table("b_li_agg")
                .groupBy("l_orderkey")
                .agg(F.count(F.lit(1)).alias("n"))
            )
            plan = agg._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" not in plan, plan
            assert agg.count() == lineitem.select("l_orderkey").distinct().count()
        finally:
            spark.sql("DROP TABLE IF EXISTS b_li_agg")


class TestPartitionPruning:
    """Executable proof of the partition-pruning claims the scale notes
    make: a date-partitioned write + an equality filter read exactly one
    partition directory — the scan never touches the other days."""

    def test_partitioned_scan_prunes(self, spark, tmp_path):
        ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        path = str(tmp_path / "ev_by_day")
        (
            ev.withColumn("dy", F.col("ts").cast("date"))
            .write.mode("overwrite")
            .partitionBy("dy")
            .parquet(path)
        )
        back = spark.read.parquet(path)
        one_day = back.filter(F.col("dy") == "2024-01-05")
        qe = one_day._jdf.queryExecution()
        plan = qe.executedPlan().toString()
        assert "PartitionFilters" in plan, plan
        # the pruned scan reads exactly the rows of that day, and the
        # partition count proves only one directory survived pruning
        want = ev.filter(F.col("ts").cast("date") == "2024-01-05").count()
        assert one_day.count() == want and want > 0
        n_parts = (
            spark.read.parquet(path)
            .select("dy").distinct().count()
        )
        assert n_parts > 1  # pruning had something to prune


class TestAqeSkewJoin:
    """Executable proof of the 'hot keys are AQE-skew-split' posture the
    dedup/join docstrings lean on: a join with one mega-key gets its
    skewed partition split at runtime (skew=true in the final plan)."""

    def test_skewed_join_is_split(self, spark):
        import pyspark.sql.functions as SF

        conf = spark.conf
        old = {
            k: conf.get(k)
            for k in (
                "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
                "spark.sql.adaptive.advisoryPartitionSizeInBytes",
                "spark.sql.autoBroadcastJoinThreshold",
            )
        }
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            # one mega-key (0) holding ~90% of left rows; it matches ONE
            # right row, so the join output stays collect-sized while the
            # mega-key's shuffle partition blows past the skew threshold
            left = spark.range(0, 55_000).select(
                SF.when(SF.col("id") < 50_000, SF.lit(0))
                .otherwise(SF.col("id")).alias("k"),
                SF.concat(SF.lit("payload-padding-"), SF.col("id")).alias("v"),
            )
            right = spark.range(0, 5_000).select(
                SF.when(SF.col("id") == 0, SF.lit(0))
                .otherwise(SF.col("id") + 100_000).alias("k"),
                SF.col("id").alias("w"),
            )
            j = left.join(right, "k")
            # collect() executes THIS dataset's own QueryExecution (count()
            # or a write would build a fresh one whose adaptive plan stays
            # isFinalPlan=false), so the skew split shows in the final plan
            rows = j.collect()
            assert len(rows) == 50_000
            plan = j._jdf.queryExecution().executedPlan().toString()
            assert "skew=true" in plan, plan
        finally:
            for k, v in old.items():
                conf.set(k, v)
