"""Structured Streaming variant of the politeness scheduler + crawl metrics.

The batch engine (crawl.py) is the primary execution mode; this module is
the continuous-ingest shape of the same operators (SURVEY.md §2.7):

- ``politeness_gate``  — T1/T2 as `applyInPandasWithState` keyed by host:
  per-host GroupState holds (min_delay, current_delay, last_fetch,
  consecutive_errors); each micro-batch's candidates are slotted in
  (priority asc, url_canon asc) order at `last_fetch + k*current_delay`,
  and completed fetches (rows carrying status/response_ms) fold AIMD with
  the exact rate_limiter.c formulas via scheduler.aimd_update_py. One
  stateful shuffle by host — the same key-parallelism as the batch path.

- ``crawl_metrics_stream`` — A1 as a watermarked windowed aggregation:
  pages-stream → 1-minute windows of urls_processed / bytes_downloaded per
  host; late events beyond the watermark are dropped (the streaming analog
  of the reference's monitor-thread stats print, scraper.c:96-112).

State-store scale note: state is one tiny row per host (5 numbers), hash-
partitioned by the group key across executors; hot hosts are not a state
problem (single row) — their *candidate volume* is, which the upstream
batch admission handles via salted top-K before rows reach this operator.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..config import MIN_DELAY
from ..operators.scheduler import aimd_update_py

GATE_INPUT_FIELDS = "host string, url_canon string, priority int, event_time double, status int, response_ms int"

GATE_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("url_canon", T.StringType(), False),
        T.StructField("priority", T.IntegerType(), True),
        T.StructField("fetch_time", T.DoubleType(), False),
        T.StructField("current_delay", T.DoubleType(), False),
    ]
)

GATE_STATE_SCHEMA = T.StructType(
    [
        T.StructField("min_delay", T.DoubleType(), False),
        T.StructField("current_delay", T.DoubleType(), False),
        T.StructField("last_fetch", T.DoubleType(), False),
        T.StructField("consecutive_errors", T.IntegerType(), False),
    ]
)


def _gate_fn(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    host = key[0]
    if state.exists:
        min_delay, delay, last_fetch, errors = state.get
    else:
        min_delay, delay, last_fetch, errors = MIN_DELAY, MIN_DELAY, 0.0, 0

    # Arrow delivers a LARGE group as multiple chunks (split at
    # maxRecordsPerBatch): concatenate BEFORE sorting, or the slot order
    # would hold only within each chunk — a priority-1 url landing in
    # chunk 2 would be slotted after every chunk-1 url, violating the
    # ZSET pop contract (and AIMD folds would interleave with slotting).
    frames = list(pdfs)
    pdf = (
        frames[0]
        if len(frames) == 1
        else pd.concat(frames, ignore_index=True)
    )
    # 1. fold AIMD over completed fetches (rows with a status), in
    #    event_time order — rate_limiter_update semantics
    done = pdf[pdf["status"].notna()].sort_values("event_time")
    for st, ms in zip(done["status"], done["response_ms"]):
        delay, errors = aimd_update_py(
            delay, min_delay, errors, int(st), float(ms or 0) / 1000.0
        )
    # 2. slot new candidates (rows without status) in ZSET order
    cand = pdf[pdf["status"].isna()].sort_values(["priority", "url_canon"])
    times: list[float] = []
    if len(cand):
        t0 = float(cand["event_time"].min())
        base = max(last_fetch + delay, t0)
        times = [base + i * delay for i in range(len(cand))]
        last_fetch = times[-1]
    # update BEFORE yielding: the state write must not depend on the
    # consumer exhausting the generator
    state.update((min_delay, delay, last_fetch, errors))
    if times:
        yield pd.DataFrame(
            {
                "host": host,
                "url_canon": cand["url_canon"].to_numpy(),
                "priority": cand["priority"].to_numpy(),
                "fetch_time": times,
                "current_delay": delay,
            }
        )


def politeness_gate(candidates: DataFrame) -> DataFrame:
    """Stateful per-host politeness slotting over a (micro-batched) stream.

    Works identically on a static DataFrame (tests) and a readStream source
    — applyInPandasWithState is the operator either way."""
    return candidates.groupBy("host").applyInPandasWithState(
        _gate_fn,
        outputStructType=GATE_OUTPUT_SCHEMA,
        stateStructType=GATE_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def crawl_metrics_stream(pages: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Watermarked windowed crawl stats per host (A1 streaming analog).

    pages: stream with (host, fetched_ts timestamp, content_size long)."""
    return (
        pages.withWatermark("fetched_ts", watermark)
        .groupBy(F.window("fetched_ts", "1 minute").alias("win"), "host")
        .agg(
            F.count("*").alias("urls_processed"),
            F.sum("content_size").alias("bytes_downloaded"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            "host",
            "urls_processed",
            "bytes_downloaded",
        )
    )
