"""Live-HTTP connector tests against a loopback http.server — verifies
the online fetch path end-to-end (fetch → CSS extract → DataFrame) with
zero external traffic."""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("live_fixtures")
    (d / "newsapi.json").write_text(
        json.dumps(
            {
                "status": "ok",
                "articles": [
                    {"title": "A", "url": "http://x/a", "source": {"id": "nytimes"}},
                    {"title": "B", "url": "http://x/b", "source": {"id": "unknown-src"}},
                ],
            }
        )
    )
    return d


@pytest.fixture(scope="module")
def loopback_server():
    pages = {
        "/article": (
            "text/html",
            "<html><body><article class='story'><p>Live body.</p>"
            "</article></body></html>",
        ),
        "/multi": (
            "text/html",
            "<html><article class='story'>a</article>"
            "<article class='story'>b</article></html>",
        ),
        "/api": ("application/json", json.dumps({"status": "ok", "n": 3})),
    }

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            path = self.path.split("?")[0]
            if path == "/boom":
                self.send_error(500)
                return
            if path not in pages:
                self.send_error(404)
                return
            ctype, body = pages[path]
            data = body.encode()
            self.send_response(200)
            self.send_header("Content-Type", f"{ctype}; charset=utf-8")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def log_message(self, *a):  # quiet
            pass

    srv = HTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_http_fetch_fn_success_and_failure(loopback_server):
    from data_pipeline_playground_spark.sources.live_http import http_fetch_fn

    fetch = http_fetch_fn(timeout_s=5)
    assert "Live body." in fetch(loopback_server + "/article")
    assert fetch(loopback_server + "/missing") is None  # 404 → None
    assert fetch(loopback_server + "/boom") is None  # 500 → None
    assert fetch("not-a-url") is None
    assert fetch(None) is None


def test_json_api_fetch_fn(loopback_server):
    from data_pipeline_playground_spark.sources.live_http import json_api_fetch_fn

    call = json_api_fetch_fn(loopback_server + "/api", params={"q": "x"})
    doc = call({"page": "1"})
    assert doc == {"status": "ok", "n": 3}
    miss = json_api_fetch_fn(loopback_server + "/missing")
    assert miss() is None


def test_live_fetch_through_spark_plan(spark, fixture_dir, loopback_server):
    """The online fetch_fn drives the same fetch_and_extract plan as
    the fixtures: one row fetched+extracted, one null on multi-match,
    registry misses null — all inside mapInPandas on executors."""
    from pyspark.sql import functions as F

    from data_pipeline_playground_spark.sources.http_sources import (
        fetch_and_extract,
        read_newsapi,
    )
    from data_pipeline_playground_spark.sources.live_http import http_fetch_fn

    articles = read_newsapi(spark, str(fixture_dir / "newsapi.json"))
    # point the fixture's nytimes row at the loopback article
    articles = articles.withColumn(
        "url",
        F.when(
            F.col("source") == "nytimes", F.lit(loopback_server + "/article")
        ).otherwise(F.col("url")),
    )
    out = fetch_and_extract(articles, {"nytimes": "article.story"}, http_fetch_fn(5))
    rows = {r.source: r.text for r in out.collect()}
    assert rows["nytimes"] == "Live body."
    assert rows["unknown-src"] is None
