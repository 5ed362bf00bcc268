#!/usr/bin/env python
"""spark-submit entry point for the crawl engine.

Cluster:
  spark-submit --py-files wss.zip scripts/run_crawl.py \\
      --catalog hdfs:///crawl/cat --hosts 64 --pages-per-host 100 \\
      --max-pages 100000 --horizon 8

Local sandbox:
  python scripts/run_crawl.py --catalog /tmp/crawl_cat --hosts 8

Build the py-files bundle with:
  cd /root/repo && zip -r wss.zip web_scraper_spark

The script is driver-side control flow only (generation loop + snapshot
commits, SURVEY.md §4.3); all heavy work runs as executor-side DataFrame
stages, so the same file works unchanged on local[N] and on a multi-
executor cluster — only --master / deploy-mode differ.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--catalog", required=True, help="checkpoint root (resumable)")
    ap.add_argument("--hosts", type=int, default=8)
    ap.add_argument("--pages-per-host", type=int, default=40)
    ap.add_argument("--max-pages", type=int, default=1000)   # scraper.c:46 default
    ap.add_argument("--max-depth", type=int, default=3)      # scraper.c:45 default
    ap.add_argument("--horizon", type=float, default=8.0)
    ap.add_argument("--shards", type=int, default=32)
    ap.add_argument("--oracle", action="store_true", help="batch-of-1 exact pop order")
    ap.add_argument("--force-rescrape", action="store_true")
    ap.add_argument("--retry-count", type=int, default=3,
                    help="T7: max fetch attempts per url (scraper.c:56 default)")
    ap.add_argument("--retry-delay", type=int, default=5,
                    help="T7: backoff in generations per prior attempt (scraper.c:57)")
    ap.add_argument("--transport", choices=("synth", "http"), default="synth",
                    help="synth = deterministic synthetic web; http = REAL "
                         "urllib transport (seeds must then be real URLs — "
                         "pass --seed-url; robots.txt fetched over the wire)")
    ap.add_argument("--seed-url", action="append", default=[],
                    help="seed URL for --transport http (repeatable)")
    ap.add_argument("--user-agent", default="WebScraperBot/1.0")
    ap.add_argument("--request-timeout", type=int, default=30)
    ap.add_argument("--resume", action="store_true", help="continue existing catalog")
    ap.add_argument("--max-generations", type=int, default=1000)
    ap.add_argument("--cores", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    from web_scraper_spark import synth
    from web_scraper_spark.catalog import Catalog
    from web_scraper_spark.config import CrawlConfig
    from web_scraper_spark.crawl import resume_crawl, run_crawl
    from web_scraper_spark.session import get_spark

    spark = get_spark("wss-crawl", cores=args.cores)
    web = synth.SynthWebConfig(n_hosts=args.hosts, pages_per_host=args.pages_per_host)
    cfg = CrawlConfig(
        max_pages=args.max_pages,
        max_depth=args.max_depth,
        horizon=args.horizon,
        num_shards=args.shards,
        oracle_mode=args.oracle,
        force_rescrape=args.force_rescrape,
        retry_count=args.retry_count,
        retry_delay=args.retry_delay,
        transport=args.transport,
        user_agent=args.user_agent,
        request_timeout=args.request_timeout,
    )
    if args.transport == "http" and not (args.seed_url or args.resume):
        ap.error("--transport http requires --seed-url (or --resume)")

    t0 = time.perf_counter()
    if args.resume and os.path.exists(os.path.join(args.catalog, "_manifests", "CURRENT")):
        cat = Catalog(spark, args.catalog)
        cat = resume_crawl(cat, cfg, web, max_generations=args.max_generations)
    else:
        if args.transport == "http":
            if not args.seed_url:
                # --resume passed but no manifest exists at --catalog: the
                # resume exemption above doesn't apply to a fresh start
                ap.error(
                    f"no catalog manifest at {args.catalog} to resume from; "
                    "pass --seed-url to start a new http crawl"
                )
            seed_rows = [(u, 0) for u in args.seed_url]
        else:
            seed_rows = [(r["url"], r["priority"]) for r in synth.seed_url_rows(web)]
        seeds = spark.createDataFrame(seed_rows, ["url", "priority"])
        cat = run_crawl(spark, args.catalog, seeds, cfg, web, max_generations=args.max_generations)
    wall = time.perf_counter() - t0

    snap = cat.current_snapshot()
    m = dict(snap.metrics)
    m.update(
        generation=snap.generation,
        snapshot_id=snap.snapshot_id,
        wall_sec=round(wall, 2),
        urls_per_sec=round(m.get("urls_processed", 0) / wall, 2) if wall > 0 else None,
    )
    print(json.dumps(m))
    spark.stop()


if __name__ == "__main__":
    main()
