"""Pure-pandas unit tests for the fetch batch protocol (no Spark session):
in-batch robots refusal, per-host spacing, deterministic latency."""

from __future__ import annotations

import pandas as pd

from pegasus_spark.crawler.fetch import STATUS_ROBOTS, _robots_disallowed


def _pdf(robots: dict[str, list[str]] | None = None, interval: int = 10):
    """Batch rows carry their politeness config (min_interval_ms,
    robots_disallow) — the dequeue-join contract."""
    hosts = ["h0.test", "h0.test", "h1.test", "h1.test"]
    return pd.DataFrame(
        {
            "url": [
                "https://h0.test/ershoufang/a/",
                "https://h0.test/private/x/",
                "https://h1.test/private/x/",
                "https://h1.test/ok/",
            ],
            "host": hosts,
            "priority": [1, 1, 1, 1],
            "url_hash64": [1, 2, 3, 4],
            "min_interval_ms": [interval] * 4,
            "robots_disallow": [(robots or {}).get(h) for h in hosts],
        }
    )


def test_robots_disallowed_mask():
    robots = {"h0.test": ["/private/"], "h1.test": []}
    mask = _robots_disallowed(_pdf(), robots)
    assert mask.tolist() == [False, True, False, False]


def test_robots_none_means_open():
    assert not _robots_disallowed(_pdf(), None).any()
    assert not _robots_disallowed(_pdf(), {}).any()


def test_store_fetcher_blocks_in_batch(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pegasus_spark.crawler.fetch import StoreFetcher

    store = str(tmp_path / "store.parquet")
    pq.write_table(
        pa.table({"url": ["https://h0.test/ershoufang/a/", "https://h0.test/private/x/"],
                  "body": ["BODY-A", "SECRET"]}),
        store,
    )
    f = StoreFetcher(store, round_start_ms=0)
    pdf = _pdf(robots={"h0.test": ["/private/"]})
    out = f(pdf[pdf["host"] == "h0.test"]).set_index("url")
    assert out.loc["https://h0.test/ershoufang/a/", "status"] == 200
    assert out.loc["https://h0.test/private/x/", "status"] == STATUS_ROBOTS
    # the disallowed row's body was never read
    assert out.loc["https://h0.test/private/x/", "body"] is None


def test_parse_robots_txt():
    from pegasus_spark.crawler.fetch import parse_robots_txt

    body = (
        "# comment\nUser-agent: google\nDisallow: /google-only/\n\n"
        "User-agent: *\nDisallow: /private/\nDisallow: /tmp/\n"
    )
    assert parse_robots_txt(body) == ["/private/", "/tmp/"]
    assert parse_robots_txt(None) == []
    assert parse_robots_txt("User-agent: *\nDisallow:\n") == []  # empty = allow all


def test_store_fetcher_live_robots_txt(tmp_path):
    """robots.txt fetched from the store blocks in-batch even with NO static
    robots configuration (the north rule's in-batch robots.txt enforcement)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pegasus_spark.crawler.fetch import STATUS_ROBOTS, StoreFetcher

    store = str(tmp_path / "store2.parquet")
    pq.write_table(
        pa.table({
            "url": [
                "https://h9.test/robots.txt",
                "https://h9.test/ok/",
                "https://h9.test/private/x/",
            ],
            "body": ["User-agent: *\nDisallow: /private/\n", "OK", "SECRET"],
        }),
        store,
    )
    pdf = pd.DataFrame(
        {"url": ["https://h9.test/ok/", "https://h9.test/private/x/"],
         "host": ["h9.test"] * 2, "priority": [1, 1], "url_hash64": [1, 2]}
    )
    out = StoreFetcher(store, 0)(pdf).set_index("url")
    assert out.loc["https://h9.test/ok/", "status"] == 200
    assert out.loc["https://h9.test/private/x/", "status"] == STATUS_ROBOTS


class _QuietHandler:
    pass


def _serve(pages: dict[str, str]):
    """Tiny local HTTP server on an ephemeral port; returns (server, port)."""
    import http.server
    import threading

    class H(http.server.BaseHTTPRequestHandler):
        def do_GET(self):  # noqa: N802
            body = pages.get(self.path)
            if body is None:
                self.send_response(404)
                self.end_headers()
                return
            data = body.encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def log_message(self, *a):
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), H)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv, srv.server_address[1]


def test_http_fetcher_against_local_server():
    """The real-network fetcher (cluster path): statuses/bodies from a live
    local http.server, per-host min-interval honored between requests, robots
    refusal without a request, 599 on connection failure."""
    import time

    from pegasus_spark.crawler.fetch import HttpFetcher

    srv, port = _serve({"/a/": "<html>page-a</html>", "/b/": "<html>page-b</html>"})
    try:
        host = f"127.0.0.1:{port}"
        dead = "127.0.0.1:1"  # closed port → connection refused
        hosts = [host, host, host, host, dead]
        pdf = pd.DataFrame(
            {
                "url": [
                    f"http://{host}/a/",
                    f"http://{host}/b/",
                    f"http://{host}/missing/",
                    f"http://{host}/private/x/",
                    f"http://{dead}/a/",
                ],
                "host": hosts,
                "priority": [5, 4, 3, 2, 1],
                "url_hash64": [1, 2, 3, 4, 5],
                "min_interval_ms": [150, 150, 150, 150, 0],
                "robots_disallow": [["/private/"] if h == host else None for h in hosts],
            }
        )
        fetcher = HttpFetcher(timeout_s=2.0)
        t0 = time.monotonic()
        out = fetcher(pdf).set_index("url")
        wall = time.monotonic() - t0
        assert out.loc[f"http://{host}/a/", "status"] == 200
        assert out.loc[f"http://{host}/a/", "body"] == "<html>page-a</html>"
        assert out.loc[f"http://{host}/b/", "status"] == 200
        assert out.loc[f"http://{host}/missing/", "status"] == 404
        assert out.loc[f"http://{host}/private/x/", "status"] == STATUS_ROBOTS
        assert out.loc[f"http://{dead}/a/", "status"] == 599
        # 3 live requests to the same host at 150 ms spacing ⇒ ≥ 300 ms wall
        # (robots row must NOT consume politeness budget: no request made)
        assert wall >= 0.3
        assert out.loc[f"http://{host}/private/x/", "nbytes"] == 0
    finally:
        srv.shutdown()
