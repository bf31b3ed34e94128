"""Streaming metrics: the reference's 1 s worker→master rate reports
(/root/reference/src/pegasus/rate/rate.go:27,135-149 — ST2 in SURVEY §2.9)
re-expressed as a Structured Streaming windowed aggregation with late-data
handling, plus a custom stateful operator for run-cumulative per-host
counters (applyInPandasWithState) — the streaming twin of the RateStats
monoid (rate.go:95-108).

Input stream schema = the crawler's fetch audit rows:
    (url string, host string, status int, nbytes long, duration_ms long,
     fetch_ts timestamp)

Scale: the windowed agg shuffles once on (window, host); watermark bounds
state. The stateful counter keeps one tiny row per host in the state store —
host-cardinality state, exactly what the politeness budget needs.
"""

from __future__ import annotations

from typing import Any, Iterable

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

FETCH_STREAM_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("host", StringType()),
        StructField("status", LongType()),
        StructField("nbytes", LongType()),
        StructField("duration_ms", LongType()),
        StructField("fetch_ts", TimestampType()),
    ]
)


def read_fetch_stream(spark: SparkSession, src_dir: str) -> DataFrame:
    """File-source stream over the crawler's fetch audit directory — each
    round's append becomes a micro-batch (cluster deployments swap in Kafka;
    the transformation chain is identical)."""
    return (
        spark.readStream.schema(FETCH_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )


def windowed_rate_stats(
    stream: DataFrame, window: str = "10 seconds", watermark: str = "30 seconds"
) -> DataFrame:
    """A4's RateStats columns per (event-time window, host), watermarked so
    late fetch reports beyond `watermark` are dropped and state is bounded —
    the semantics the reference approximates with its 1 s push cadence."""
    return (
        stream.withWatermark("fetch_ts", watermark)
        .groupBy(F.window("fetch_ts", window).alias("w"), "host")
        .agg(
            F.sum("nbytes").alias("total_bytes"),
            F.sum("duration_ms").alias("total_duration_ms"),
            F.sum(F.when(F.col("status") == 200, 1).otherwise(0)).alias("success_cnt"),
            F.sum(F.when(F.col("status") != 200, 1).otherwise(0)).alias("failure_cnt"),
            F.max("duration_ms").alias("max_duration_ms"),
            F.min("duration_ms").alias("min_duration_ms"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "host", "total_bytes", "total_duration_ms",
            "success_cnt", "failure_cnt", "max_duration_ms", "min_duration_ms",
        )
    )


CUMULATIVE_SCHEMA = StructType(
    [
        StructField("host", StringType()),
        StructField("total_fetches", LongType()),
        StructField("total_bytes", LongType()),
        StructField("total_failures", LongType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("fetches", LongType()),
        StructField("bytes", LongType()),
        StructField("failures", LongType()),
    ]
)


def _accumulate(
    key: Any, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    """Stateful combine: the RateStats monoid held in the state store per
    host, emitting the running totals each micro-batch."""
    fetches, nbytes, failures = state.get if state.exists else (0, 0, 0)
    for pdf in pdfs:
        fetches += len(pdf)
        nbytes += int(pdf["nbytes"].sum())
        failures += int((pdf["status"] != 200).sum())
    state.update((fetches, nbytes, failures))
    yield pd.DataFrame(
        {"host": [key[0]], "total_fetches": [fetches],
         "total_bytes": [nbytes], "total_failures": [failures]}
    )


def cumulative_host_stats(stream: DataFrame) -> DataFrame:
    """Run-cumulative per-host counters via applyInPandasWithState — one
    state row per host, updated every micro-batch (the custom stateful
    operator slot of the north rule's streaming surface)."""
    return stream.groupBy("host").applyInPandasWithState(
        _accumulate,
        outputStructType=CUMULATIVE_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


SESSION_SCHEMA = StructType(
    [
        StructField("host", StringType()),
        StructField("session_start_ms", LongType()),
        StructField("session_end_ms", LongType()),
        StructField("n_fetches", LongType()),
        StructField("total_bytes", LongType()),
        StructField("closed_by", StringType()),
    ]
)

_SESSION_STATE = StructType(
    [
        StructField("start_ms", LongType()),
        StructField("last_ms", LongType()),
        StructField("n", LongType()),
        StructField("nbytes", LongType()),
    ]
)


def streaming_sessions(
    stream: DataFrame, gap_s: int = 30, watermark: str = "10 seconds"
) -> DataFrame:
    """Gap-based STREAMING sessionization — the streaming twin of the batch
    `sessionize` query (the classic custom stateful operator): per host,
    consecutive fetches separated by ≤ ``gap_s`` belong to one session; a
    larger gap closes it in-stream (``closed_by = 'gap'``), and a session
    with no successor is flushed by an EVENT-TIME TIMEOUT once the
    watermark passes its gap horizon (``closed_by = 'timeout'``) — so every
    session is eventually emitted exactly once, append-mode.

    State = ONE tiny row per host (start, last, count, bytes); the
    watermark bounds both late data and state lifetime. At crawl scale the
    state store holds host-cardinality rows — the same bound as the
    politeness budget — and the shuffle key is the host hash, identical to
    the batch fetch partitioning, so a cluster deployment co-locates the
    sessionizer with the fetch stream it audits."""
    gap_ms = int(gap_s) * 1000

    def update(key, pdfs, state: GroupState):
        out = []
        if state.hasTimedOut:
            s = state.get
            out.append((key[0], s[0], s[1], s[2], s[3], "timeout"))
            state.remove()
        else:
            rows = pd.concat(list(pdfs), ignore_index=True)
            rows = rows.sort_values("fetch_ts")
            ts_ms = (rows["fetch_ts"].astype("int64") // 1_000_000).tolist()
            sizes = rows["nbytes"].tolist()
            cur = list(state.get) if state.exists else None
            for t, b in zip(ts_ms, sizes):
                if cur is None:
                    cur = [t, t, 0, 0]
                elif t - cur[1] > gap_ms:
                    out.append((key[0], cur[0], cur[1], cur[2], cur[3], "gap"))
                    cur = [t, t, 0, 0]
                cur[1] = max(cur[1], t)
                cur[2] += 1
                cur[3] += int(b)
            state.update(tuple(cur))
            state.setTimeoutTimestamp(cur[1] + gap_ms)
        if out:
            yield pd.DataFrame(
                out,
                columns=[
                    "host", "session_start_ms", "session_end_ms",
                    "n_fetches", "total_bytes", "closed_by",
                ],
            )

    return (
        stream.withWatermark("fetch_ts", watermark)
        .groupBy("host")
        .applyInPandasWithState(
            update,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_SESSION_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def streaming_url_dedup(stream: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming twin of the frontier's URL-seen set: first-seen-wins dedup
    of fetch rows by url ACROSS micro-batches, state bounded by the event-time
    watermark (`dropDuplicatesWithinWatermark` — a duplicate arriving within
    the horizon is dropped; state for urls older than the watermark is
    evicted, so state size tracks the horizon's url volume, not the run's).

    This is the streaming-ingest guard a training-data pipeline puts in
    front of the batch dedup stages: it cheaply collapses the exact repeats
    a crawler re-emits (retries, re-discovered links) before payload bytes
    are stored; batch MinHash/SimHash near-dup handles the rest downstream.
    Scale: state shuffles on url hash — the same key discipline as the batch
    URL-seen bloom/anti-join path."""
    return stream.withWatermark("fetch_ts", watermark).dropDuplicatesWithinWatermark(
        ["url"]
    )


def run_to_memory_sink(
    df: DataFrame, query_name: str, output_mode: str, checkpoint_dir: str
):
    """Drive a streaming frame into an in-memory table for tests/inspection."""
    return (
        df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
