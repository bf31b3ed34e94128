"""Fetch stage: politeness-enforced page retrieval inside mapInPandas batches.

North-rule contract: "robots.txt + rate-limit enforcement inside mapInPandas
fetch batches — no per-row Python". The reference's analog is the worker
tasklet executor (2 concurrent fetches/worker,
/root/reference/src/pegasus/worker/workertask.go:21,134-144) calling
rate.GetHtml (/root/reference/src/pegasus/rate/rate.go:119-129).

Two fetchers share one batch protocol:

- ``StoreFetcher`` — the deterministic synthetic page store (a parquet table
  keyed by canonical URL, FIXTURES.md §2). Loaded once per Python worker
  process into a dict (module-level cache — the mapInPandas equivalent of the
  reference's pooled TaskletCtx, task/task.go:78,95-97). Fetch timestamps are
  simulated: within a batch each host's requests are spaced by its
  ``min_interval_ms``, which the politeness property test asserts.
- ``HttpFetcher`` — real urllib fetches with actual inter-request sleeps, for
  cluster runs (exercised against a local http.server in tests).

Politeness/robots configuration RIDES THE ROWS: the scheduler's dequeue
joins ``min_interval_ms`` and ``robots_disallow`` from the broadcast budget
onto the batch, so fetcher closures are O(1) — no O(hosts) driver dict is
serialized per task (the round-2 design shipped both maps in the UDF
closure; at millions of hosts that is driver memory and per-task overhead).

Budget (max requests per host per round) is enforced UPSTREAM at dequeue
(frontier.dequeue) so executors cannot collude to exceed it — see SURVEY
§7.4. Spacing inside the batch is sound because the scheduler repartitions
the dequeued batch by host: one host never spans two partitions.

Per-fetch metrics columns feed the RateStats rollup (rate.go:32-40).
"""

from __future__ import annotations

import time

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

FETCH_SCHEMA_EXTRA = [
    StructField("status", IntegerType()),
    StructField("body", StringType()),
    StructField("nbytes", LongType()),
    StructField("duration_ms", LongType()),
    StructField("fetch_ts_ms", LongType()),
]

_DATASET_CACHE: dict[str, object] = {}


def _fetch_bodies(path: str, urls: "pd.Series") -> "pd.Series":
    """Batch 'GET': predicate-pushdown read of exactly this batch's URLs from
    the page-store parquet (dataset handle cached per process — metadata
    only). Memory stays O(batch), not O(store): with a full-store dict every
    Python worker would hold (and first pay to build) the whole site."""
    import pyarrow.dataset as ds

    if path not in _DATASET_CACHE:
        _DATASET_CACHE[path] = ds.dataset(path, format="parquet")
    dset = _DATASET_CACHE[path]
    tbl = dset.to_table(columns=["url", "body"], filter=ds.field("url").isin(urls.tolist()))
    lut = dict(zip(tbl.column("url").to_pylist(), tbl.column("body").to_pylist()))
    return urls.map(lut)


STATUS_ROBOTS = 451  # in-batch robots refusal (never actually requested)

_ROBOTS_CACHE: dict[tuple[str, str], list[str]] = {}


def parse_robots_txt(body: str | None) -> list[str]:
    """Disallow prefixes for User-agent: * (minimal RFC 9309 subset: UA
    groups, Disallow lines; Allow and wildcards out of scope)."""
    if not body:
        return []
    out: list[str] = []
    applies = False
    for line in body.splitlines():
        line = line.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key, val = key.strip().lower(), val.strip()
        if key == "user-agent":
            applies = val == "*"
        elif key == "disallow" and applies and val:
            out.append(val)
    return out


def _store_robots(store_path: str, hosts: "pd.Series") -> dict[str, list[str]]:
    """Per-batch robots.txt retrieval: fetch https://{host}/robots.txt from
    the page store for every host in the batch, parse, cache per process
    (the 'robots cache per batch fn' of SURVEY §2.10 — one lookup per host,
    not per URL)."""
    result: dict[str, list[str]] = {}
    missing = [h for h in hosts.unique() if (store_path, h) not in _ROBOTS_CACHE]
    if missing:
        urls = pd.Series([f"https://{h}/robots.txt" for h in missing])
        bodies = _fetch_bodies(store_path, urls)
        for h, body in zip(missing, bodies):
            _ROBOTS_CACHE[(store_path, h)] = parse_robots_txt(
                body if isinstance(body, str) else None
            )
    for h in hosts.unique():
        result[h] = _ROBOTS_CACHE[(store_path, h)]
    return result


def _robots_disallowed(pdf: pd.DataFrame, robots: dict[str, list[str]] | None) -> pd.Series:
    """Vectorized in-batch robots check — the frontier already marks
    disallowed URLs at enqueue (cheapest place), this is the defense-in-depth
    guard the north rule puts INSIDE the fetch batch: even a mis-enqueued URL
    is refused before any request is issued."""
    if not robots:
        return pd.Series(False, index=pdf.index)
    paths = pdf["url"].str.replace(r"^[a-z][a-z0-9+.-]*://[^/]+", "", regex=True)
    out = pd.Series(False, index=pdf.index)
    for host, prefixes in robots.items():
        m = pdf["host"] == host
        if m.any() and prefixes:
            hit = paths[m].str.startswith(tuple(prefixes))
            out.loc[m] = hit
    return out


def _row_interval_ms(pdf: pd.DataFrame) -> "pd.Series":
    """Per-row min_interval_ms from the batch itself (budget-joined at
    dequeue); absent column or NULL → 0 (no spacing requirement)."""
    if "min_interval_ms" in pdf.columns:
        return pd.to_numeric(pdf["min_interval_ms"], errors="coerce").fillna(0).astype("int64")
    return pd.Series(0, index=pdf.index, dtype="int64")


def _row_robots(pdf: pd.DataFrame) -> dict[str, list[str]]:
    """Static disallow prefixes carried on the rows (budget-joined at
    dequeue): host → prefixes. Constant per host by construction."""
    out: dict[str, list[str]] = {}
    if "robots_disallow" in pdf.columns:
        # one row per distinct host (vectorized), not a per-row batch loop
        firsts = pdf[["host", "robots_disallow"]].drop_duplicates(subset=["host"])
        for h, rd in zip(firsts["host"], firsts["robots_disallow"]):
            if rd is not None and len(rd):
                out[h] = [str(p) for p in rd]
    return out


class StoreFetcher:
    """fetch(pdf) → pdf + (status, body, nbytes, duration_ms, fetch_ts_ms)."""

    def __init__(self, store_path: str, round_start_ms: int):
        self.store_path = store_path
        self.round_start_ms = round_start_ms

    def __call__(self, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["host", "priority", "url"], ascending=[True, False, True]).copy()
        # live robots.txt per host (fetched from the store, cached per
        # process) merged with the row-carried static disallows
        live = _store_robots(self.store_path, pdf["host"])
        static = _row_robots(pdf)
        merged = {
            h: sorted(set(live.get(h, [])) | set(static.get(h, [])))
            for h in pdf["host"].unique()
        }
        blocked = _robots_disallowed(pdf, merged)
        bodies = (
            _fetch_bodies(self.store_path, pdf.loc[~blocked, "url"])
            .reindex(pdf.index)
            .astype(object)  # an all-miss batch would otherwise be float64 NaN
        )
        found = bodies.notna()
        pdf["status"] = found.map({True: 200, False: 404}).astype("int32")
        pdf.loc[blocked, "status"] = STATUS_ROBOTS
        pdf["body"] = bodies.where(found, None)
        pdf["nbytes"] = bodies.str.len().fillna(0).astype("int64")
        # deterministic simulated latency: 1-5 ms keyed by url hash
        pdf["duration_ms"] = (pdf["url_hash64"].astype("int64") % 5 + 1).abs().astype("int64")
        seq = pdf.groupby("host").cumcount()
        pdf["fetch_ts_ms"] = self.round_start_ms + seq * _row_interval_ms(pdf)
        return pdf


class HttpFetcher:
    """Real-network variant (cluster path). Same batch protocol; sleeps the
    row-carried ``min_interval_ms`` between same-host requests —
    vectorization applies to everything except the unavoidable serial GETs."""

    def __init__(self, timeout_s: float = 10.0):
        self.timeout_s = timeout_s

    def __call__(self, pdf: pd.DataFrame) -> pd.DataFrame:
        import urllib.request

        pdf = pdf.sort_values(["host", "priority", "url"], ascending=[True, False, True]).copy()
        blocked = _robots_disallowed(pdf, _row_robots(pdf))
        interval = _row_interval_ms(pdf)
        rows = []
        last_by_host: dict[str, float] = {}
        for (idx, url), host in zip(pdf["url"].items(), pdf["host"]):
            if blocked.loc[idx]:
                rows.append((STATUS_ROBOTS, None, 0, 0, int(time.time() * 1000)))
                continue
            wait = interval.loc[idx] / 1000.0
            since = time.monotonic() - last_by_host.get(host, 0.0)
            if since < wait:
                time.sleep(wait - since)
            t0 = time.monotonic()
            try:
                with urllib.request.urlopen(url, timeout=self.timeout_s) as r:
                    body = r.read().decode("utf-8", "replace")
                    status = r.status
            except urllib.error.HTTPError as e:
                # a 4xx/5xx response IS a response — keep the real status so
                # the retry budget and fetch_log see 404 vs 500 vs timeout
                body, status = None, e.code
            except Exception:
                body, status = None, 599  # transport failure (refused/timeout/DNS)
            last_by_host[host] = time.monotonic()
            rows.append(
                (status, body, len(body) if body else 0,
                 int((time.monotonic() - t0) * 1000), int(time.time() * 1000))
            )
        pdf[["status", "body", "nbytes", "duration_ms", "fetch_ts_ms"]] = pd.DataFrame(
            rows, index=pdf.index
        )
        return pdf


def fetch_batch(dequeued: DataFrame, fetcher, n_partitions: int | None = None) -> DataFrame:
    """Run the fetcher over the dequeued frontier rows, one host never split
    across partitions (hash-partition on host) so in-batch spacing is global
    per host — any partition COUNT preserves that cohesion.

    The count is pinned explicitly by the caller (sized from the known
    dequeue count): this is a Python-heavy stage, and AQE's byte-based
    coalescing would squeeze a CPU-bound 5k-page fetch into ~1 partition,
    serializing it regardless of cores."""
    out_schema = StructType(list(dequeued.schema.fields) + FETCH_SCHEMA_EXTRA)

    def run(batches):
        for pdf in batches:
            if len(pdf):
                yield fetcher(pdf)

    if n_partitions:
        part = dequeued.repartition(n_partitions, F.col("host"))
    else:
        part = dequeued.repartition(F.col("host"))
    return part.mapInPandas(run, out_schema)


def rate_stats(fetched: DataFrame, round_no: int) -> DataFrame:
    """A4: the RateStats monoid per host (rate.go:32-40,95-108) as a
    map-side-combinable agg — TotalBytes/TotalDuration/Success/Failure/
    Max/MinDuration, appended per round (the rebuild of the 1 s worker→master
    rate POST, rate.go:135-149)."""
    return fetched.groupBy("host").agg(
        F.lit(round_no).alias("round"),
        F.sum("nbytes").alias("total_bytes"),
        F.sum("duration_ms").alias("total_duration_ms"),
        F.sum(F.when(F.col("status") == 200, 1).otherwise(0)).alias("success_cnt"),
        F.sum(F.when(F.col("status") != 200, 1).otherwise(0)).alias("failure_cnt"),
        F.max("duration_ms").alias("max_duration_ms"),
        F.min("duration_ms").alias("min_duration_ms"),
    )
