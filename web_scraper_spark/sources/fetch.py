"""Fetch source: batched page retrieval as a mapInPandas operator.

The reference fetches with libcurl one URL per worker thread
(fetch_url.c:9-31, 10 s timeout, 1 MB cap via the write callback). The
Spark operator boundary is identical — URL rows in, (status, content,
content_type, response_ms) out — but a *batch* of frontier rows flows
through one Arrow exchange, and the body is a single BinaryType cell
(no realloc-append chunking needed; write_callback.c:27-43 disappears).

In this sandbox there is no network, so the transport behind the operator
is the deterministic synthetic web (synth.page_for_url): a pure function
of (seed, url), evaluable on any executor independently — which is exactly
what lets the 10^10-URL frontier stay virtual. Swapping in a real HTTP
transport (requests/aiohttp per Arrow batch with a thread pool, timeout +
retry per T7) changes ONLY `_fetch_batch`, not the plan shape.

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
