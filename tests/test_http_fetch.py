"""Real-HTTP transport seam (fetch_url.c semantics) against an in-process
localhost server: status/body capture, redirect following, HTTP-error
bodies, hard timeout → transport failure, and in-batch transport retries.
The operator boundary (mapInPandas, batch + FETCH_RESULT_FIELDS) is the
same one the synthetic transport uses, so the crawl loop swaps transports
without plan changes."""

import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest
from pyspark.sql import functions as F

from web_scraper_spark.sources.fetch import fetch_pages_http

_FLAKY_HITS: dict[str, int] = {}
_LOCK = threading.Lock()


class _Handler(BaseHTTPRequestHandler):
    def log_message(self, *a):  # quiet
        pass

    def do_GET(self):
        if self.path.startswith("/p/"):
            body = f"<html><head><title>Page {self.path}</title></head><body>ok</body></html>".encode()
            self.send_response(200)
            self.send_header("Content-Type", "text/html")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
        elif self.path == "/redir":
            self.send_response(302)
            self.send_header("Location", "/p/0")
            self.end_headers()
        elif self.path == "/slow":
            import time

            time.sleep(3)
            self.send_response(200)
            self.end_headers()
        elif self.path == "/flaky":
            with _LOCK:
                n = _FLAKY_HITS.get(self.path, 0)
                _FLAKY_HITS[self.path] = n + 1
            if n == 0:
                # abort without a response → client-side transport error
                self.connection.close()
                return
            body = b"<html><head><title>flaky ok</title></head></html>"
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
        else:
            body = b"nope"
            self.send_response(404)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)


@pytest.fixture(scope="module")
def server():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_http_transport_semantics(spark, server):
    _FLAKY_HITS.clear()
    urls = [
        f"{server}/p/1",
        f"{server}/p/2",
        f"{server}/redir",      # followed (CURLOPT_FOLLOWLOCATION analog)
        f"{server}/missing",    # 404: status + body are RESULTS
        f"{server}/slow",       # > timeout → transport failure row
        f"{server}/flaky",      # fails once, retries=1 recovers in-batch
        "http://127.0.0.1:1/never",  # connection refused → failure row
    ]
    df = spark.createDataFrame([(u,) for u in urls], ["url_canon"]).coalesce(1)
    out = {
        r["url_canon"]: r
        for r in fetch_pages_http(df, timeout_s=1.0, retries=1).collect()
    }
    assert out[f"{server}/p/1"]["status"] == 200
    assert b"Page /p/1" in bytes(out[f"{server}/p/1"]["content"])
    assert "text/html" in out[f"{server}/p/1"]["content_type"]
    assert out[f"{server}/redir"]["status"] == 200  # redirect followed
    assert b"Page /p/0" in bytes(out[f"{server}/redir"]["content"])
    assert out[f"{server}/missing"]["status"] == 404
    assert bytes(out[f"{server}/missing"]["content"]) == b"nope"
    assert out[f"{server}/slow"]["status"] is None
    assert out[f"{server}/slow"]["content"] is None
    assert out[f"{server}/flaky"]["status"] == 200  # retry recovered
    assert out["http://127.0.0.1:1/never"]["status"] is None


def test_http_extraction_composes(spark, server):
    """The real transport feeds the same analysis pipeline."""
    from web_scraper_spark.functions import textops

    df = spark.createDataFrame([(f"{server}/p/7",)], ["url_canon"])
    got = (
        fetch_pages_http(df, timeout_s=2.0)
        .withColumn("_an", textops.analyze_udf(F.col("content")))
        .select(F.col("_an.title").alias("title"))
        .collect()
    )
    assert got[0]["title"] == "Page /p/7"


def test_analyze_url_http_transport(spark, server, tmp_path):
    """analyze_url honors cfg.transport="http" (r3 verdict item 4): the
    `-a <url>` analog fetches the REAL page like the reference's analyze
    path (scraper.c:244-287 → fetch_url), while the cache read-through
    stays transport-independent."""
    from web_scraper_spark import api
    from web_scraper_spark.catalog import Catalog
    from web_scraper_spark.config import CrawlConfig
    from web_scraper_spark.synth import SynthWebConfig

    web = SynthWebConfig(seed=7)
    cfg = CrawlConfig(transport="http", request_timeout=2)

    # miss path over the wire: the localhost server's real title comes back
    row = api.analyze_url(spark, None, f"{server}/p/42", web, cfg=cfg).collect()[0]
    assert row["title"] == "Page /p/42"
    assert row["cached"] is False

    # cache read-through unchanged: a pages hit short-circuits the fetch
    # (point the URL at a dead port — a real fetch attempt would fail)
    cat = Catalog(spark, str(tmp_path / "cat"))
    dead = "http://127.0.0.1:1/cached"
    pages = spark.createDataFrame(
        [(dead, "Cached Title", "d", ["k"], [], 0.5, "en")],
        "url string, title string, description string, keywords array<string>, "
        "meta array<struct<name:string,content:string>>, sentiment double, "
        "language string",
    )
    cat.stage("pages", pages)
    cat.commit(generation=1, t0=0.0)
    hit = api.analyze_url(spark, cat, dead, web, cfg=cfg).collect()[0]
    assert hit["title"] == "Cached Title"
    assert hit["cached"] is True
