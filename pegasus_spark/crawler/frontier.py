"""Frontier table: priority dequeue, dedup-guarded enqueue, versioned store.

Schema (FIXTURES.md §3): ``(url, url_hash, url_hash64, host, kind, priority,
page, depth, region, state, discovered_round)`` — the generalization of the
reference's per-stage input lists (districts/regions/pages flowing through
master RAM, /root/reference/src/pegasus/master/masterjob.go:487-506) into one
partitioned table.

Dequeue = the north rule's "window-ranked top-K per host-partition": the
politeness budget is enforced HERE, pre-dispatch, so no executor can exceed
it (reference analog: one-task-per-free-worker dispatch + MaxPage-desc
priority sort, /root/reference/src/pegasus/master/wmgr.go:254-274,
lianjia/region_maxpage.go:97-111).

Enqueue = canonicalize → hash → two-tier dedup: bloom-negative rows are
definitely new (no join at all); bloom-positive rows resolve through the
exact ``left_anti`` against the frontier — the canonical URL string is the
equality authority, so bloom FPs cost a probe, never a lost URL. Writes are
salted-repartitioned on (host, salt) to break hot-host file skew.

Persistence is a versioned-parquet stand-in for Iceberg snapshots (no
Iceberg runtime jar in the sandbox): each round writes ``frontier/v{N}`` and
a checkpoint manifest with per-partition lineage; on a cluster the same
calls become Iceberg ``MERGE INTO`` + snapshot metadata, and resume =
time-travel to the manifest's snapshot id.
"""

from __future__ import annotations

import json
import os
from dataclasses import asdict, dataclass, field

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from pegasus_spark.crawler.bloom import BloomShards
from pegasus_spark.crawler.urlnorm import host_of, with_url_columns

FRONTIER_DDL = (
    "url string, url_hash int, url_hash64 bigint, host string, kind string, "
    "priority int, page int, depth int, region string, state string, "
    "discovered_round int, retry_cnt int"
)

N_SALTS = 8  # hot-host write-skew breaker


# ---------------------------------------------------------------------------
# dequeue
# ---------------------------------------------------------------------------

def dequeue(frontier: DataFrame, budget: DataFrame) -> DataFrame:
    """Top-K pending per host under the politeness budget, in the canonical
    order (priority desc, region, page, url — SURVEY §4.3). ``budget`` is the
    politeness table (host, max_per_round, …), always broadcast (it is
    host-cardinality small)."""
    w = Window.partitionBy("host").orderBy(
        F.desc("priority"),
        F.asc(F.coalesce("region", F.lit(""))),
        F.asc("page"),
        F.asc("url"),
    )
    return (
        frontier.filter(F.col("state") == "pending")
        .join(F.broadcast(budget.select("host", "max_per_round")), "host", "left")
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= F.coalesce("max_per_round", F.lit(32)))
        .drop("_rk", "max_per_round")
    )


def with_dequeue_seq(dequeued: DataFrame, round_no: int) -> DataFrame:
    """Global canonical sequence over this round's batch — the golden crawl
    ordering (parallelism-independent by construction; §4.3 contract)."""
    w = Window.orderBy(
        F.desc("priority"),
        F.asc(F.coalesce("region", F.lit(""))),
        F.asc("page"),
        F.asc("url"),
    )
    return dequeued.withColumn("seq", F.row_number().over(w)).withColumn(
        "round", F.lit(round_no)
    )


# ---------------------------------------------------------------------------
# enqueue
# ---------------------------------------------------------------------------

def _robots_state(budget: DataFrame):
    """state column: robots_blocked iff any disallowed prefix matches the
    URL path — evaluated as a Catalyst lambda over the broadcast budget row,
    no UDF."""
    return F.when(
        F.exists(
            F.coalesce("robots_disallow", F.array().cast("array<string>")),
            lambda p: F.startswith(F.parse_url("url", F.lit("PATH")), p),
        ),
        F.lit("robots_blocked"),
    ).otherwise(F.lit("pending"))


def prepare_candidates(discoveries: DataFrame, budget: DataFrame, round_no: int) -> DataFrame:
    """Raw discovered links → frontier-shaped candidate rows: canonicalize,
    hash, within-batch dedup (highest priority wins, deterministic), robots
    marking."""
    cand = with_url_columns(discoveries).withColumn("host", host_of())
    w = Window.partitionBy("url").orderBy(
        F.desc("priority"), F.asc(F.coalesce("region", F.lit("")))
    )
    cand = cand.withColumn("_rk", F.row_number().over(w)).filter("_rk = 1").drop("_rk")
    cand = cand.join(F.broadcast(budget.select("host", "robots_disallow")), "host", "left")
    return cand.select(
        "url", "url_hash", "url_hash64", "host", "kind", "priority", "page",
        "depth", "region",
        _robots_state(budget).alias("state"),
        F.lit(round_no).alias("discovered_round"),
        F.lit(0).alias("retry_cnt"),
    )


def filter_unseen(
    spark: SparkSession,
    candidates: DataFrame,
    frontier: DataFrame,
    bloom: BloomShards,
    bloom_shards=None,
    bloom_arrays=None,
) -> DataFrame:
    """Two-tier URL-seen prune. Bloom-negative → new with zero join work;
    bloom-positive → exact left_anti on the canonical URL. Pass
    ``bloom_arrays`` (driver-held dict) to skip the shard merge job."""
    if bloom_arrays is not None:
        checked = bloom.check_with_dict(spark, candidates, bloom_arrays)
    elif bloom_shards is not None:
        checked = bloom.check_broadcast(spark, candidates, bloom_shards)
    else:
        return candidates.join(frontier.select("url"), "url", "left_anti")
    fresh = checked.filter(~F.col("maybe_seen")).drop("maybe_seen")
    suspect = (
        checked.filter(F.col("maybe_seen"))
        .drop("maybe_seen")
        .join(frontier.select("url"), "url", "left_anti")
    )
    return fresh.unionByName(suspect)


def salted(df: DataFrame, n_partitions: int | None = None) -> DataFrame:
    """Salted repartition on (host, salt): a hot host's rows spread over
    N_SALTS hash keys instead of one (north-rule skew handling). Partition
    count stays with AQE unless the caller pins it — the salt column is what
    breaks the skew, not the count."""
    out = df.withColumn("_salt", F.pmod(F.col("url_hash"), F.lit(N_SALTS)))
    if n_partitions:
        out = out.repartition(n_partitions, F.col("host"), F.col("_salt"))
    else:
        out = out.repartition(F.col("host"), F.col("_salt"))
    return out.drop("_salt")


# ---------------------------------------------------------------------------
# versioned store + checkpoint manifest
# ---------------------------------------------------------------------------

@dataclass
class Checkpoint:
    round: int = 0
    frontier_version: int = -1
    apartments_version: int = -1
    bloom_versions: list[int] = field(default_factory=list)
    appended_rounds: list[int] = field(default_factory=list)
    # per-partition lineage: host → {pending, fetched, failed, robots_blocked}
    partition_lineage: dict = field(default_factory=dict)
    counters: dict = field(default_factory=dict)
    finished: bool = False


class FrontierStore:
    """Versioned parquet layout under ``workdir`` (Iceberg snapshot stand-in).

    Atomicity contract: a round is visible iff the manifest names its
    versions — data writes happen first, the manifest rename is the commit
    point (same ordering Iceberg gives via snapshot swap)."""

    def __init__(self, spark: SparkSession, workdir: str):
        self.spark = spark
        self.workdir = workdir
        os.makedirs(workdir, exist_ok=True)

    # paths ------------------------------------------------------------------
    def _p(self, *parts: str) -> str:
        return os.path.join(self.workdir, *parts)

    @property
    def manifest_path(self) -> str:
        return self._p("checkpoint.json")

    # manifest ---------------------------------------------------------------
    def load_checkpoint(self) -> Checkpoint | None:
        if not os.path.exists(self.manifest_path):
            return None
        with open(self.manifest_path) as f:
            return Checkpoint(**json.load(f))

    def write_checkpoint(self, ckpt: Checkpoint) -> None:
        tmp = self.manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(asdict(ckpt), f, indent=1)
        os.replace(tmp, self.manifest_path)  # atomic commit point

    # frontier snapshots -----------------------------------------------------
    def write_frontier(self, df: DataFrame, version: int, n_partitions: int | None = None) -> None:
        salted(df).write.mode("overwrite").parquet(self._p("frontier", f"v{version}"))

    def read_frontier(self, version: int) -> DataFrame:
        return self.spark.read.parquet(self._p("frontier", f"v{version}"))

    # bloom shard versions ---------------------------------------------------
    def write_bloom(self, shards: DataFrame, version: int) -> None:
        shards.write.mode("overwrite").parquet(self._p("bloom", f"v{version}"))

    def read_bloom(self, versions: list[int]) -> DataFrame | None:
        if not versions:
            return None
        dfs = [self.spark.read.parquet(self._p("bloom", f"v{v}")) for v in versions]
        out = dfs[0]
        for d in dfs[1:]:
            out = out.unionByName(d)
        return out

    # apartments snapshots ---------------------------------------------------
    def write_apartments(self, df: DataFrame, version: int) -> None:
        df.repartition("region").write.mode("overwrite").partitionBy("region").parquet(
            self._p("apartments", f"v{version}")
        )

    def read_apartments(self, version: int) -> DataFrame:
        return self.spark.read.parquet(self._p("apartments", f"v{version}"))

    # snapshot lifecycle -----------------------------------------------------
    def snapshot_diff(self, v_old: int, v_new: int) -> DataFrame:
        """Row-level diff between two frontier snapshots — the local
        equivalent of an Iceberg changelog scan (ST4 incremental semantics):
        change_type ∈ {added, state_changed}. Join on the canonical URL
        (the identity column), one shuffle."""
        old = self.read_frontier(v_old).select(
            "url", F.col("state").alias("old_state")
        )
        new = self.read_frontier(v_new)
        joined = new.join(old, "url", "left")
        return (
            joined.filter(
                F.col("old_state").isNull() | (F.col("old_state") != F.col("state"))
            )
            .withColumn(
                "change_type",
                F.when(F.col("old_state").isNull(), "added").otherwise("state_changed"),
            )
            .select("url", "host", "kind", "old_state", "state", "change_type")
        )

    def compact(self, keep_last: int = 2) -> list[str]:
        """Drop frontier/bloom versions no checkpoint needs: everything older
        than the manifest's referenced versions minus ``keep_last`` history.
        Returns removed paths. (Iceberg equivalent: expire_snapshots.)"""
        import shutil

        ckpt = self.load_checkpoint()
        if ckpt is None:
            return []
        removed: list[str] = []
        keep_f = {ckpt.frontier_version}
        fdir = self._p("frontier")
        if os.path.isdir(fdir):
            versions = sorted(
                int(d[1:]) for d in os.listdir(fdir) if d.startswith("v")
            )
            for v in versions[:-keep_last] if len(versions) > keep_last else []:
                if v not in keep_f:
                    shutil.rmtree(os.path.join(fdir, f"v{v}"), ignore_errors=True)
                    removed.append(f"frontier/v{v}")
        bdir = self._p("bloom")
        keep_b = set(ckpt.bloom_versions)
        if os.path.isdir(bdir):
            for d in os.listdir(bdir):
                v = int(d[1:])
                if v not in keep_b:
                    shutil.rmtree(os.path.join(bdir, d), ignore_errors=True)
                    removed.append(f"bloom/v{v}")
        return removed

    # append-only tables -----------------------------------------------------
    def append(self, name: str, df: DataFrame, round_no: int) -> None:
        df.write.mode("overwrite").parquet(self._p(name, f"r{round_no}"))

    def read_appended(self, name: str, rounds: list[int]) -> DataFrame | None:
        paths = [self._p(name, f"r{r}") for r in rounds if os.path.exists(self._p(name, f"r{r}"))]
        if not paths:
            return None
        return self.spark.read.parquet(*paths)
