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


def export_archive(
    dfs: dict[str, DataFrame], tgz_path: str, tmp_dir: str | None = None
) -> dict[str, int]:
    """Bundle tables into one ``.tgz`` holding ``<table>.csv`` per table —
    the reference's export packaging (export.py:31-44: per-table CSV dump →
    ``tarfile.open(..., "w:gz")``). Returns the per-table exported counts
    (the manifest ``import_archive`` verifies against).

    The single-file-per-table assembly runs on the driver, which is the
    right tool-shape here: the reference's ``SELECT INTO OUTFILE`` is
    equally single-node, and an operational backup bundle is consumed as
    one artifact. Cluster-scale exports keep ``export_csv``'s partitioned
    directory layout instead."""
    import glob
    import os
    import shutil
    import tarfile
    import tempfile

    counts: dict[str, int] = {}
    tmp = tempfile.mkdtemp(dir=tmp_dir)
    try:
        with tarfile.open(tgz_path, "w:gz") as tf:
            for name, df in sorted(dfs.items()):
                d = os.path.join(tmp, name)
                counts[name] = export_csv(df.coalesce(1), d)
                parts = sorted(glob.glob(os.path.join(d, "part-*.csv")))
                csv_path = os.path.join(tmp, name + ".csv")
                with open(csv_path, "wb") as out:
                    for i, p in enumerate(parts):
                        with open(p, "rb") as fh:
                            if i > 0:
                                fh.readline()  # drop the repeated header
                            shutil.copyfileobj(fh, out)
                tf.add(csv_path, arcname=name + ".csv")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return counts


def import_archive(
    spark: SparkSession,
    tgz_path: str,
    schemas: dict[str, StructType],
    expected_rows: dict[str, int] | None = None,
    extract_dir: str | None = None,
) -> dict[str, DataFrame]:
    """Unpack an ``export_archive`` bundle and read every table back with its
    explicit schema, verifying row counts per table (import.py:25-37's
    lines-vs-COUNT(*) check — we raise instead of printing ???). The
    extracted CSVs stay on disk under ``extract_dir`` (default:
    ``<tgz_path>.extracted``) because the returned DataFrames read them
    lazily; callers delete the directory when done with the DataFrames."""
    import os
    import tarfile

    extract_dir = extract_dir or tgz_path + ".extracted"
    os.makedirs(extract_dir, exist_ok=True)
    with tarfile.open(tgz_path, "r:gz") as tf:
        # the member list, not a directory listing, defines the table set —
        # a reused extract_dir may hold stale files from an earlier archive
        members = sorted(tf.getnames())
        try:
            tf.extractall(extract_dir, filter="data")
        except TypeError:  # Python < 3.12 tarfile has no filter kwarg
            tf.extractall(extract_dir)
    out: dict[str, DataFrame] = {}
    for fname in members:
        if not fname.endswith(".csv"):
            continue
        name = fname[: -len(".csv")]
        if name not in schemas:
            raise ValueError(f"archive table {name!r} has no schema provided")
        out[name] = import_csv(
            spark,
            os.path.join(extract_dir, fname),
            schemas[name],
            (expected_rows or {}).get(name),
        )
    missing = set(schemas) - set(out)
    if missing:
        raise ValueError(f"archive is missing tables: {sorted(missing)}")
    return out


def write_bucketed(
    df: DataFrame, table: str, path: str, key: str, n_buckets: int = 32,
    sort: bool = True,
) -> None:
    """Write ``df`` as a hash-BUCKETED (and per-bucket sorted) parquet
    table — the co-located-join layout the scale notes across this repo
    assume ("at 100 TB both sides are id-bucketed, so the join co-locates
    without an exchange", e.g. corpus_diff). Bucketing is Spark's
    persistent partitioning contract: every writer task routes rows by
    ``hash(key) % n_buckets`` and the catalog records the layout, so a
    later equi-join or aggregation on ``key`` between tables bucketed the
    same way runs WITHOUT any Exchange — the shuffle happened once, at
    write time, and is amortized over every downstream read. On a
    1000-executor cluster this is the difference between re-shuffling
    100 TB per join and reading co-located buckets.

    Registered as an EXTERNAL table at ``path`` (no warehouse config
    needed); overwrite drops + rewrites. Executable proof that the layout
    removes the exchange: tests/test_io_utils.py::TestBucketedJoin."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    w = df.write.mode("overwrite").option("path", path).bucketBy(n_buckets, key)
    if sort:
        w = w.sortBy(key)
    w.format("parquet").saveAsTable(table)
