"""Structured Streaming tests: windowed RateStats with watermark, stateful
cumulative per-host counters, micro-batch-per-file semantics."""

from __future__ import annotations

import datetime as dt

import pytest

from pegasus_spark.streaming.metrics import (
    FETCH_STREAM_SCHEMA,
    cumulative_host_stats,
    read_fetch_stream,
    run_to_memory_sink,
    windowed_rate_stats,
)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _batch(spark, rows):
    return spark.createDataFrame(rows, FETCH_STREAM_SCHEMA)


def _rows(host, n, start_s, status=200, nbytes=100, dur=5):
    return [
        (f"https://{host}/p{i}", host, status, nbytes, dur,
         T0 + dt.timedelta(seconds=start_s + i))
        for i in range(n)
    ]


@pytest.fixture()
def src_dir(tmp_path):
    return str(tmp_path / "fetches")


def test_windowed_rate_stats(spark, src_dir, tmp_path):
    # micro-batches append part-files into ONE flat dir (the file stream
    # source does not recurse into subdirectories)
    _batch(spark, _rows("h0", 5, 0) + _rows("h1", 3, 2, status=404)).coalesce(
        1
    ).write.parquet(src_dir)
    stream = read_fetch_stream(spark, src_dir)
    assert stream.isStreaming
    q = run_to_memory_sink(
        windowed_rate_stats(stream), "win_stats", "append", str(tmp_path / "ck1")
    )
    try:
        q.processAllAvailable()
        # append mode only emits windows the watermark has closed, one
        # trigger late — advance event time, then feed one more batch so the
        # closed windows flush
        _batch(spark, _rows("h0", 1, 120)).coalesce(1).write.mode("append").parquet(
            src_dir
        )
        q.processAllAvailable()
        _batch(spark, _rows("h0", 1, 240)).coalesce(1).write.mode("append").parquet(
            src_dir
        )
        q.processAllAvailable()
        out = {
            (r["host"], r["window_start"]): r
            for r in spark.sql("select * from win_stats").collect()
        }
    finally:
        q.stop()
    assert out[("h0", T0)]["success_cnt"] == 5
    assert out[("h0", T0)]["failure_cnt"] == 0
    assert out[("h0", T0)]["total_bytes"] == 500
    assert out[("h1", T0)]["failure_cnt"] == 3
    assert out[("h1", T0)]["success_cnt"] == 0


def test_streaming_url_dedup_across_batches(spark, src_dir, tmp_path):
    """A url repeated in a LATER micro-batch (within the watermark horizon)
    is dropped; distinct urls all pass."""
    from pegasus_spark.streaming.metrics import streaming_url_dedup

    _batch(spark, _rows("h0", 3, 0)).coalesce(1).write.parquet(src_dir)
    stream = read_fetch_stream(spark, src_dir)
    q = run_to_memory_sink(
        streaming_url_dedup(stream), "url_dedup", "append", str(tmp_path / "ck3")
    )
    try:
        q.processAllAvailable()
        # second batch: one repeat of p0 (same url, later ts) + two new urls
        repeat = [("https://h0/p0", "h0", 200, 100, 5, T0 + dt.timedelta(seconds=30))]
        _batch(spark, repeat + _rows("h1", 2, 40)).coalesce(1).write.mode(
            "append"
        ).parquet(src_dir)
        q.processAllAvailable()
        urls = [r["url"] for r in spark.sql("select url from url_dedup").collect()]
    finally:
        q.stop()
    assert sorted(urls) == sorted(
        [f"https://h0/p{i}" for i in range(3)] + [f"https://h1/p{i}" for i in range(2)]
    )  # p0 repeat dropped, each url exactly once


def test_cumulative_host_stats_across_batches(spark, src_dir, tmp_path):
    _batch(spark, _rows("h0", 4, 0) + _rows("h1", 2, 0)).coalesce(1).write.parquet(
        src_dir
    )
    stream = read_fetch_stream(spark, src_dir)
    q = run_to_memory_sink(
        cumulative_host_stats(stream), "cum_stats", "update", str(tmp_path / "ck2")
    )
    try:
        q.processAllAvailable()
        _batch(spark, _rows("h0", 3, 60, status=500)).coalesce(1).write.mode(
            "append"
        ).parquet(src_dir)
        q.processAllAvailable()
        rows = spark.sql(
            "select * from cum_stats order by total_fetches"
        ).collect()
    finally:
        q.stop()
    # memory sink in update mode appends each emission; take the last per host
    latest = {}
    for r in rows:
        if r["host"] not in latest or r["total_fetches"] > latest[r["host"]]["total_fetches"]:
            latest[r["host"]] = r
    assert latest["h0"]["total_fetches"] == 7
    assert latest["h0"]["total_failures"] == 3
    assert latest["h0"]["total_bytes"] == 700
    assert latest["h1"]["total_fetches"] == 2


def test_streaming_sessions_gap_and_timeout(spark, src_dir, tmp_path):
    """Gap-based streaming sessionization: an in-batch gap closes a session
    immediately (closed_by='gap'); a session whose host goes quiet is
    flushed by the event-time timeout once the watermark passes its gap
    horizon (closed_by='timeout'); counts/bytes/spans are exact."""
    from pegasus_spark.streaming.metrics import streaming_sessions

    # batch 1: hA burst of 3 (0..2 s), then a second burst at 100 s (gap
    # 30 s exceeded in-batch); hB burst of 2 (0..1 s)
    _batch(
        spark,
        _rows("hA", 3, 0) + _rows("hA", 2, 100) + _rows("hB", 2, 0),
    ).coalesce(1).write.parquet(src_dir)
    stream = read_fetch_stream(spark, src_dir)
    q = run_to_memory_sink(
        streaming_sessions(stream, gap_s=30, watermark="10 seconds"),
        "sessions", "append", str(tmp_path / "ck_sess"),
    )
    try:
        q.processAllAvailable()
        # batch 2: only hB speaks (at 300 s) — the watermark jumps past
        # hA's open-session horizon, so hA flushes via timeout
        _batch(spark, _rows("hB", 1, 300)).coalesce(1).write.mode("append").parquet(
            src_dir
        )
        q.processAllAvailable()
        # batch 3: one more event so hB's 300 s session can time out too
        _batch(spark, _rows("hB", 1, 600)).coalesce(1).write.mode("append").parquet(
            src_dir
        )
        q.processAllAvailable()
        rows = spark.sql("select * from sessions").collect()
    finally:
        q.stop()
    t0_ms = int(T0.timestamp()) * 1000
    got = {
        (r["host"], r["session_start_ms"]): (
            r["session_end_ms"], r["n_fetches"], r["total_bytes"], r["closed_by"]
        )
        for r in rows
    }
    # hA burst 1: closed in-batch by the 100 s gap
    assert got[("hA", t0_ms)] == (t0_ms + 2000, 3, 300, "gap")
    # hA burst 2: closed by event-time timeout after hA went quiet
    assert got[("hA", t0_ms + 100_000)] == (t0_ms + 101_000, 2, 200, "timeout")
    # hB burst 1: closed by timeout once batch 2's watermark passed it
    assert got[("hB", t0_ms)] == (t0_ms + 1000, 2, 200, "timeout")
