"""Fetch source: batched page retrieval as a mapInPandas operator.

The reference fetches with libcurl one URL per worker thread
(fetch_url.c:9-31, 10 s timeout, 1 MB cap via the write callback). The
Spark operator boundary is identical — URL rows in, (status, content,
content_type, response_ms) out — but a *batch* of frontier rows flows
through one Arrow exchange, and the body is a single BinaryType cell
(no realloc-append chunking needed; write_callback.c:27-43 disappears).

Two transports live behind the one operator boundary:
- `fetch_pages` — the deterministic synthetic web (synth.page_for_url): a
  pure function of (seed, url), evaluable on any executor independently —
  which is exactly what lets the 10^10-URL frontier stay virtual; every
  correctness test runs on this transport.
- `fetch_pages_http` — REAL HTTP via stdlib urllib with fetch_url.c
  semantics (follow redirects, hard timeout, UA header, 1 MB cap), a
  per-partition I/O thread pool (the 8-worker-thread analog) and in-batch
  transport retries; verified against an in-process localhost server
  (tests/test_http_fetch.py). Identical output schema, so the crawl loop
  swaps transports without touching the plan.

The 1 MB response cap (MAX_RESPONSE_SIZE, scraper.c:28) is enforced here,
as is the robots.txt fetch used by the T4 refresh path.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..config import MAX_RESPONSE_SIZE
from ..synth import SynthWebConfig, page_for_url, robots_body

FETCH_RESULT_FIELDS = [
    T.StructField("status", T.IntegerType(), True),
    T.StructField("content", T.BinaryType(), True),
    T.StructField("content_type", T.StringType(), True),
    T.StructField("response_ms", T.IntegerType(), True),
]


def _fetch_batch(urls: pd.Series, cfg: SynthWebConfig) -> pd.DataFrame:
    rows = []
    for u in urls:
        status, html, ctype, ms = page_for_url(u, cfg)
        body = html.encode("utf-8") if html is not None else None
        if body is not None and len(body) > MAX_RESPONSE_SIZE:
            body = body[:MAX_RESPONSE_SIZE]  # 1 MB cap (scraper.c:28)
        rows.append(
            {"status": status, "content": body, "content_type": ctype, "response_ms": ms}
        )
    return pd.DataFrame(rows)


def fetch_pages(batch: DataFrame, cfg: SynthWebConfig, url_col: str = "url_canon") -> DataFrame:
    """batch rows + fetch-result columns, one Arrow pass (S1)."""
    out_schema = T.StructType(list(batch.schema.fields) + FETCH_RESULT_FIELDS)
    conf = cfg

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            res = _fetch_batch(pdf[url_col], conf)
            res.index = pdf.index
            yield pd.concat([pdf, res], axis=1)

    return batch.mapInPandas(run, schema=out_schema)


ROBOTS_FETCH_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("body", T.StringType(), True),
    ]
)


def fetch_robots(hosts: DataFrame, cfg: SynthWebConfig) -> DataFrame:
    """Fetch robots.txt bodies for hosts (T4); null body = 404/absent.

    Hosts with no robots still yield a row — rules_from_corpus turns them
    into the 'none' sentinel so the fetched-once gate (EXISTS analog,
    robots_parser.c:191-199) holds and we don't refetch every generation.
    """
    conf = cfg

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "host": pdf["host"],
                    "body": [robots_body(h, conf) for h in pdf["host"]],
                }
            )

    return hosts.select("host").mapInPandas(run, schema=ROBOTS_FETCH_SCHEMA)


# --------------------------------------------------------------------------
# real HTTP transport (stdlib urllib) behind the same operator boundary
# --------------------------------------------------------------------------


def _shrink_sock_timeout(resp, seconds: float) -> None:
    """Best-effort: clamp the response's underlying socket timeout to the
    remaining deadline so one blocking read() can never outlive it. The
    socket lives behind http.client's buffered makefile; if the private
    attribute path moves in a future Python, reads simply keep the original
    per-op timeout and the outer deadline check still bounds total time to
    at most deadline + one socket timeout."""
    try:
        resp.fp.raw._sock.settimeout(max(0.05, seconds))
    except Exception:
        pass


def _read_capped(resp, deadline: float) -> bytes | None:
    """Read ≤MAX_RESPONSE_SIZE under a HARD wall-clock deadline (an
    absolute time.perf_counter() instant shared with the connect phase).

    urllib's `timeout` is the PER-SOCKET-OPERATION timeout, not a total
    cap: a tarpit trickling one byte per (timeout−ε) never trips it and
    would pin a ThreadPoolExecutor worker for hours. CURLOPT_TIMEOUT in
    the reference caps the WHOLE transfer INCLUDING connect — mirror that
    by starting the deadline before urlopen (see _http_get) and shrinking
    the per-read socket timeout to the remaining budget, so an attempt
    can't stretch to ~2x timeout (connect + trickled body);
    None = deadline exceeded (transport failure)."""
    import time

    chunks: list[bytes] = []
    total = 0
    while total <= MAX_RESPONSE_SIZE:
        remaining = deadline - time.perf_counter()
        if remaining <= 0:
            return None
        _shrink_sock_timeout(resp, remaining)
        try:
            chunk = resp.read(min(65536, MAX_RESPONSE_SIZE + 1 - total))
        except Exception:  # socket timeout at the shrunken budget
            return None
        if not chunk:
            break
        chunks.append(chunk)
        total += len(chunk)
    return b"".join(chunks)[:MAX_RESPONSE_SIZE]


def _http_get(url: str, timeout_s: float, user_agent: str):
    """One GET with fetch_url.c semantics: follow redirects (urllib
    default ≙ CURLOPT_FOLLOWLOCATION), hard total timeout (CURLOPT_TIMEOUT
    — the deadline starts BEFORE urlopen so connect + headers + body all
    share one budget, see _read_capped), UA header. HTTP 4xx/5xx return
    (code, body) — the C reads the status via CURLINFO_RESPONSE_CODE and
    keeps whatever body arrived; transport errors (DNS, refused, timeout)
    return (None, None) — the CURLE_!OK path the engine maps to a fetch
    failure (T7)."""
    import time
    import urllib.error
    import urllib.request

    deadline = time.perf_counter() + timeout_s
    req = urllib.request.Request(url, headers={"User-Agent": user_agent})
    try:
        with urllib.request.urlopen(req, timeout=timeout_s) as resp:
            body = _read_capped(resp, deadline)
            if body is None:
                return None, None, None
            return resp.status, body, resp.headers.get("Content-Type")
    except urllib.error.HTTPError as e:
        body = _read_capped(e, deadline)
        if body is None:
            return None, None, None
        return e.code, body, e.headers.get("Content-Type")
    except Exception:
        return None, None, None


def http_fetch_batch(
    urls: pd.Series,
    timeout_s: float = 10.0,
    user_agent: str = "WebScraperBot/1.0",
    retries: int = 0,
    concurrency: int = 8,
) -> pd.DataFrame:
    """Fetch one Arrow batch over real HTTP.

    - `concurrency` is the per-partition I/O thread pool — the analog of
      the reference's 8 worker threads (REFERENCE_NUM_THREADS); Spark's
      task parallelism multiplies it across cores/executors.
    - `retries` re-attempts TRANSPORT failures only (the in-batch
      complement of the cross-generation T7 backoff; HTTP error statuses
      are results, not retryable transport faults).
    """
    import time
    from concurrent.futures import ThreadPoolExecutor

    def one(u: str):
        t0 = time.perf_counter()
        status = body = ctype = None
        for _ in range(1 + max(0, retries)):
            status, body, ctype = _http_get(u, timeout_s, user_agent)
            if status is not None:
                break
        ms = int((time.perf_counter() - t0) * 1000)
        return {
            "status": status,
            "content": body,
            "content_type": ctype,
            "response_ms": ms,
        }

    with ThreadPoolExecutor(max_workers=max(1, concurrency)) as pool:
        rows = list(pool.map(one, urls))
    return pd.DataFrame(rows)


def fetch_pages_http(
    batch: DataFrame,
    timeout_s: float = 10.0,
    user_agent: str = "WebScraperBot/1.0",
    retries: int = 0,
    concurrency: int = 8,
    url_col: str = "url_canon",
) -> DataFrame:
    """fetch_pages with the REAL transport: identical schema and operator
    shape (mapInPandas, batch rows + FETCH_RESULT_FIELDS), so the crawl
    loop swaps transports without touching the plan. Config plumbs from
    CrawlConfig: request_timeout → timeout_s, user_agent, and
    http_inbatch_retries → retries. `retries` is deliberately NOT
    retry_count: cross-generation attempts are the fetch_failures table's
    contract (T7), and applying retry_count at both layers would mean up
    to retry_count² transport attempts per URL."""
    out_schema = T.StructType(list(batch.schema.fields) + FETCH_RESULT_FIELDS)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            res = http_fetch_batch(
                pdf[url_col], timeout_s, user_agent, retries, concurrency
            )
            res.index = pdf.index
            yield pd.concat([pdf, res], axis=1)

    return batch.mapInPandas(run, schema=out_schema)


def fetch_robots_http(
    hosts: DataFrame,
    timeout_s: float = 10.0,
    user_agent: str = "WebScraperBot/1.0",
    concurrency: int = 8,
) -> DataFrame:
    """fetch_robots over the REAL transport: GET <scheme>://<host>/robots.txt
    (robots_parser.c:183-189 builds the same URL). `hosts` carries (host
    [, scheme]); scheme defaults to http. Output schema matches
    fetch_robots, so rules_from_corpus composes unchanged:
    - HTTP 200 → decoded body;
    - any other status OR a transport failure → null body, which
      rules_from_corpus turns into the 'none' sentinel = allow-all AND
      cached-for-TTL (the C treats fetch failure as allow,
      robots_parser.c:201-214, and we additionally avoid refetching every
      generation)."""
    from concurrent.futures import ThreadPoolExecutor

    def one(host: str, scheme: str):
        status, body, _ = _http_get(
            f"{scheme}://{host}/robots.txt", timeout_s, user_agent
        )
        if status != 200 or body is None:
            return None
        return body.decode("utf-8", errors="replace")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            schemes = (
                pdf["scheme"].fillna("http")
                if "scheme" in pdf.columns
                else pd.Series(["http"] * len(pdf), index=pdf.index)
            )
            with ThreadPoolExecutor(max_workers=max(1, concurrency)) as pool:
                bodies = list(pool.map(one, pdf["host"], schemes))
            yield pd.DataFrame({"host": pdf["host"], "body": bodies})

    cols = ["host", "scheme"] if "scheme" in hosts.columns else ["host"]
    return hosts.select(*cols).mapInPandas(run, schema=ROBOTS_FETCH_SCHEMA)
