"""Pure-Python reference simulator for the crawl contract (SURVEY.md §5.1).

Single-threaded reimplementation of the engine's generation semantics,
which in oracle mode (batch-of-1, unbounded horizon) collapses to exactly
the C reference's observable behavior (SURVEY.md §3.4):

- pop order: global (priority asc, url bytes-lex asc) — the Redis ZSET
  ZRANGE 0 0 contract (redis_helper.c:274-276);
- seen gating at pop (url_processor.c:46) and at push
  (extract_hrefs.c:139-143), with visited marked AFTER extraction
  (url_processor.c:167-169) — so a page can re-enqueue itself;
- robots fetch-once per host + allow-first decision (robots_parser.c);
- politeness: per-host delay slots; AIMD per rate_limiter.c formulas
  (the C ships but never calls rate_limiter_update — our engine contract
  activates it, identically here and in the Spark engine);
- all discovered links enqueued at priority 1 (extract_hrefs.c:142).

The simulator shares the *kernel* functions (canonicalize, robots parse /
match, AIMD step, synthetic web) with the engine — those kernels are
unit-tested against the reference semantics separately — but implements
the LOOP independently of Spark, so it cross-checks the engine's set
algebra (anti-joins, window ranks, upserts, commit ordering).
"""

from __future__ import annotations

import hashlib
import os
import sys
from dataclasses import dataclass, field

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from web_scraper_spark.config import MIN_DELAY, CrawlConfig
from web_scraper_spark.functions.htmlparse import parse_document  # noqa
from web_scraper_spark.functions.urlops import canonicalize_series
from web_scraper_spark.operators.robots import is_allowed_py, parse_robots_body
from web_scraper_spark.operators.scheduler import aimd_update_py
from web_scraper_spark.synth import SynthWebConfig, page_for_url, robots_body


def sha1_hex(s: str) -> str:
    return hashlib.sha1(s.encode()).hexdigest()


def canon(base: str, href: str) -> str | None:
    out = canonicalize_series(pd.Series([base]), pd.Series([href])).iloc[0]
    return None if pd.isna(out) else str(out)


def split_path(url: str) -> str:
    """split_url path part (scraper.c:61-73): first '/' at index >= 8."""
    i = url.find("/", 8)
    return url[i:] if i != -1 else "/"


@dataclass
class HostState:
    min_delay: float = MIN_DELAY
    current_delay: float = MIN_DELAY
    last_fetch: float = 0.0
    errors: int = 0


@dataclass
class SimResult:
    crawl_order: list[tuple[int, str, str, int]]  # (gen, url_canon, host, priority)
    seen: set[str]
    host_state: dict[str, HostState]
    frontier: dict[str, tuple[int, int]]  # url -> (priority, depth)
    disallowed: list[str]
    skipped: int = 0
    generations: int = 0
    metrics: dict = field(default_factory=dict)
    failures: dict = field(default_factory=dict)  # url -> attempts (T7)


def host_of(url: str) -> str | None:
    i = url.find("://")
    if i == -1:
        return None
    j = url.find("/", i + 3)
    return url[i + 3 : j] if j != -1 else url[i + 3 :]


def simulate(
    seeds: list[tuple[str, int]],
    cfg: CrawlConfig,
    web: SynthWebConfig,
    max_generations: int = 100_000,
) -> SimResult:
    # frontier: url_canon -> (priority, depth)
    frontier: dict[str, tuple[int, int]] = {}
    for url, prio in seeds:
        c = canon("http://seed.invalid/", url)
        if c is None:
            continue
        if c in frontier:
            p, d = frontier[c]
            frontier[c] = (min(p, prio), min(d, 0))
        else:
            frontier[c] = (prio, 0)

    seen: set[str] = set()
    failures: dict[str, int] = {}      # url -> attempts (T7)
    cooldown: dict[str, float] = {}    # url -> next_retry_gen (inf = terminal)
    robots: dict[str, tuple[list[str], list[str], float | None]] = {}
    hs: dict[str, HostState] = {}
    crawl_order: list[tuple[int, str, str, int]] = []
    disallowed_log: list[str] = []
    t0 = 0.0
    processed = skipped = disallowed_n = bytes_dl = failed_n = 0
    gen = 0

    while gen < max_generations:
        # termination order mirrors the engine: budget / empty-frontier are
        # checked via the PREVIOUS generation's done flag (resume_crawl),
        # i.e. BEFORE the next pop-gate would count more skips
        if cfg.max_pages and processed >= cfg.max_pages:
            break
        if not frontier:
            break
        # ---- 1. pop-gate
        pre_seen = set(seen)
        pre_fail = dict(failures)  # gen-start failure state (engine reads the table once)
        drop = [u for u in frontier if sha1_hex(u) in seen]
        for u in drop:
            del frontier[u]
        skipped += len(drop)
        # T7: terminally-failed urls drop out of the frontier (not skipped)
        for u in [u for u in frontier if failures.get(u, 0) >= cfg.retry_count]:
            del frontier[u]
        if not frontier:
            break
        # T7 cooldown: in-backoff urls stay in the frontier, ineligible now
        eligible = {u: v for u, v in frontier.items() if cooldown.get(u, 0) <= gen}

        # ---- 2. admission (uses host_state BEFORE this gen's robots refresh)
        by_host: dict[str, list[str]] = {}
        for u in eligible:
            by_host.setdefault(host_of(u) or "", []).append(u)
        batch: list[tuple[str, int, float]] = []  # (url, host_rank, fetch_time)
        if cfg.oracle_mode:
            if eligible:
                u = min(eligible, key=lambda x: (frontier[x][0], x))
                h = host_of(u) or ""
                st = hs.get(h, HostState())
                ft = max(st.last_fetch + st.current_delay, t0)
                batch = [(u, 1, ft)]
        else:
            for h, urls in by_host.items():
                st = hs.get(h, HostState())
                urls.sort(key=lambda x: (frontier[x][0], x))
                base = max(st.last_fetch + st.current_delay, t0)
                for i, u in enumerate(urls):
                    ft = base + i * st.current_delay
                    if ft < t0 + cfg.horizon:
                        batch.append((u, i + 1, ft))
            # global budget cut in (priority, url) order
            if cfg.max_pages:
                budget = cfg.max_pages - processed
                batch.sort(key=lambda b: (frontier[b[0]][0], b[0]))
                batch = batch[:budget]
        if not batch:
            # nothing admitted this window — advance the clock
            t0 = t0 + cfg.horizon if not cfg.oracle_mode else t0
            gen += 1
            continue

        # ---- 3. robots refresh + decision
        for u, _, _ in batch:
            h = host_of(u) or ""
            hs.setdefault(h, HostState())
            if h not in robots:
                body = robots_body(h, web)
                robots[h] = parse_robots_body(body) if body is not None else ([], [], None)
        # crawl-delay application (engine applies to full host_state each gen)
        for h, st in hs.items():
            r = robots.get(h)
            if r and r[2] is not None:
                st.min_delay = max(r[2], MIN_DELAY)
                st.current_delay = max(st.current_delay, st.min_delay)

        allowed_rows, disallowed_rows = [], []
        for u, rank, ft in batch:
            h = host_of(u) or ""
            a, d, _ = robots.get(h, ([], [], None))
            if is_allowed_py(split_path(u), a, d):
                allowed_rows.append((u, rank, ft))
            else:
                disallowed_rows.append((u, rank, ft))
                disallowed_log.append(u)
        disallowed_n += len(disallowed_rows)

        # ---- 4-6. fetch, extract, push (order: priority asc, url asc)
        allowed_rows.sort(key=lambda r: (frontier[r[0]][0], r[0]))
        results: dict[str, list[tuple[int, float, int | None, float]]] = {}
        for u, rank, ft in batch:
            h = host_of(u) or ""
            results.setdefault(h, []).append((rank, ft, None, 0.0))
        new_links: list[tuple[str, int, int]] = []  # (url, priority, depth)
        retry_readds: list[tuple[str, int, int]] = []
        completed: list[str] = []
        for u, rank, ft in allowed_rows:
            prio, depth = frontier[u]
            h = host_of(u) or ""
            status, html, _, ms = page_for_url(u, web)
            if html is None:
                # transport failure: slot consumed, nothing marked/extracted.
                # T7: record the attempt; non-terminal rows return to the
                # frontier with a generation-unit backoff
                failed_n += 1
                att = failures.get(u, 0) + 1
                failures[u] = att
                if att >= cfg.retry_count:
                    cooldown[u] = float("inf")
                else:
                    cooldown[u] = gen + 1 + (att - 1) * max(1, int(cfg.retry_delay))
                    retry_readds.append((u, prio, depth))
                continue
            completed.append(u)
            failures.pop(u, None)
            cooldown.pop(u, None)
            crawl_order.append((gen, u, h, prio))
            processed += 1
            bytes_dl += len(html.encode()) if html else 0
            # overwrite the placeholder result with real status/latency
            lst = results[h]
            for i, (rk, f2, _, _) in enumerate(lst):
                if rk == rank:
                    lst[i] = (rk, f2, status, ms / 1000.0)
                    break
            if html and depth < cfg.max_depth:
                for href in parse_document(html)["links"]:
                    c = canon(u, href)
                    if c is None or sha1_hex(c) in pre_seen:
                        continue
                    if pre_fail.get(c, 0) >= cfg.retry_count:
                        continue  # T7: terminal failures never re-enqueued
                    new_links.append((c, 1, depth + 1))

        # ---- 7. mark seen (successfully fetched only)
        for u in completed:
            seen.add(sha1_hex(u))

        # ---- 8. AIMD fold per host in slot (rank) order
        for h, lst in results.items():
            st = hs[h]
            lst.sort(key=lambda r: r[0])
            for _, ft, status, rt in lst:
                if status is None:
                    continue  # disallowed row: slot consumed, no AIMD
                st.current_delay, st.errors = aimd_update_py(
                    st.current_delay, st.min_delay, st.errors, status, rt
                )
            st.last_fetch = max(r[1] for r in lst)

        # ---- frontier' = (frontier ∖ batch) ∪ retryable-failed ∪ new
        for u, _, _ in batch:
            frontier.pop(u, None)
        for u, prio, depth in retry_readds:
            frontier[u] = (prio, depth)
        for u, prio, depth in new_links:
            if u in frontier:
                p, d = frontier[u]
                frontier[u] = (min(p, prio), min(d, depth))
            else:
                frontier[u] = (prio, depth)

        # ---- clock
        if cfg.oracle_mode:
            t0 = max(ft for _, _, ft in batch)
        else:
            t0 = t0 + cfg.horizon
        gen += 1

    return SimResult(
        crawl_order=crawl_order,
        seen=seen,
        host_state=hs,
        frontier=frontier,
        disallowed=disallowed_log,
        skipped=skipped,
        generations=gen,
        failures=failures,
        metrics={
            "urls_processed": processed,
            "urls_skipped": skipped,
            "urls_disallowed": disallowed_n,
            "bytes_downloaded": bytes_dl,
            "urls_failed": failed_n,
        },
    )
