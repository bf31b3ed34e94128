"""SparkSession factory.

One place to get a correctly-configured session: AQE on (runtime re-plan +
skew-join handling), Arrow on (vectorized pandas UDF transfer), UTC session
timezone (so date math matches the DuckDB oracle), and a shuffle-partition
count sized to the local core count rather than the 200 default (at cluster
scale this is overridden by AQE coalescing anyway).

Replaces the reference's config-server boot path
(/root/reference/src/pegasus/cfgmgr/mgr.go:12,
 /root/reference/src/pegasus/worker/workermain.go:45-80): all of the
master/worker discovery collapses into `spark-submit --py-files` + this
builder.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "pegasus_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the session.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32) —
    the sandbox stand-in for a multi-executor cluster. On a real cluster the
    caller passes ``master="inherit"``: the builder then sets no master at
    all and the one given to ``spark-submit --master`` flows through the
    ``spark.master`` conf (scripts/run_crawl.py is the launch path that
    exercises this, pinned by tests/test_submit.py).
    """
    # Executor Python workers must import this package even when the driver
    # was launched outside the repo (the cluster equivalent is
    # `spark-submit --py-files pegasus_spark.zip`). PYTHONPATH must be set
    # BEFORE the JVM forks the first python worker.
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    existing = os.environ.get("PYTHONPATH", "")
    if pkg_root not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            f"{pkg_root}{os.pathsep}{existing}" if existing else pkg_root
        )

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        # local mode: one shuffle partition per core is the sweet spot for
        # sub-GB inputs; cluster mode relies on AQE target-size coalescing.
        n = cpus if master.startswith("local") else 200
        shuffle_partitions = n

    builder = SparkSession.builder.appName(app_name)
    if master != "inherit":
        builder = builder.master(master)
    builder = (
        builder.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # coalesce by SIZE, not default parallelism: with parallelismFirst
        # (the default) a 10-row frontier shuffle still schedules `cpus`
        # tasks; 8 MB advisory keeps real data parallel while collapsing the
        # scheduler's many tiny exchanges. CPU-bound pandas-UDF stages pin
        # their own partition counts explicitly (fetch_batch, extract_items).
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", str(8 * 1024 * 1024))
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # without this, caching a DataFrame pins its shuffle partitioning and
        # AQE stops coalescing tiny shuffles → 32-96 task stages on 10-row
        # frontier rounds (measured 3-5× round overhead in the crawl loop)
        .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
