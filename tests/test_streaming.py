"""Streaming politeness gate + windowed metrics (SURVEY.md §2.7 T1/T2).

The gate runs as a real streaming query (parquet file source → memory
sink) across TWO micro-batches so GroupState genuinely persists between
batches: batch 2's slots must respect batch 1's last_fetch, and AIMD
updates from completion events must change the delay."""

import os
import time

import pytest
from pyspark.sql import functions as F

from web_scraper_spark.streaming.politeness import (
    GATE_INPUT_FIELDS,
    crawl_metrics_stream,
    politeness_gate,
)


def _write_batch(spark, path, rows):
    df = spark.createDataFrame(rows, GATE_INPUT_FIELDS)
    df.coalesce(1).write.mode("append").parquet(path)


class TestPolitenessGate:
    def test_two_microbatches_respect_state(self, spark, tmp_path):
        src = str(tmp_path / "cand")
        ckpt = str(tmp_path / "ckpt")
        os.makedirs(src, exist_ok=True)

        # batch 1: three candidates on h1 (slots 1,2,3s) + one on h2
        _write_batch(
            spark,
            src,
            [
                ("h1", "u_b", 1, 0.0, None, None),
                ("h1", "u_a", 1, 0.0, None, None),
                ("h1", "u_c", 0, 0.0, None, None),
                ("h2", "u_x", 1, 0.0, None, None),
            ],
        )
        stream = spark.readStream.schema(GATE_INPUT_FIELDS).parquet(src)
        q = (
            politeness_gate(stream)
            .writeStream.format("memory")
            .queryName("gate_out")
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .start()
        )
        try:
            q.processAllAvailable()
            out1 = {
                r["url_canon"]: r
                for r in spark.sql("select * from gate_out").collect()
            }
            # ZSET order: priority asc then lex → u_c, u_a, u_b
            assert out1["u_c"]["fetch_time"] == 1.0  # base = last(0)+delay(1)
            assert out1["u_a"]["fetch_time"] == 2.0
            assert out1["u_b"]["fetch_time"] == 3.0
            assert out1["u_x"]["fetch_time"] == 1.0

            # batch 2: slow completion on h1 (rt 5s > delay → x1.5) + new candidate
            _write_batch(
                spark,
                src,
                [
                    ("h1", "u_done", 1, 3.0, 200, 5000),
                    ("h1", "u_d", 1, 4.0, None, None),
                ],
            )
            q.processAllAvailable()
            out2 = {
                r["url_canon"]: r for r in spark.sql("select * from gate_out").collect()
            }
            # AIMD slow-server branch: delay 1.0 → 1.5; base = max(3.0+1.5, 4.0)
            assert out2["u_d"]["current_delay"] == 1.5
            assert out2["u_d"]["fetch_time"] == 4.5
        finally:
            q.stop()

    def test_error_penalty_after_three_errors(self, spark, tmp_path):
        src = str(tmp_path / "cand2")
        ckpt = str(tmp_path / "ckpt2")
        os.makedirs(src, exist_ok=True)
        _write_batch(
            spark,
            src,
            [("h9", f"e{i}", 1, float(i), 500, 100) for i in range(3)]
            + [("h9", "u_after", 1, 9.0, None, None)],
        )
        stream = spark.readStream.schema(GATE_INPUT_FIELDS).parquet(src)
        q = (
            politeness_gate(stream)
            .writeStream.format("memory")
            .queryName("gate_err")
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .start()
        )
        try:
            q.processAllAvailable()
            rows = {r["url_canon"]: r for r in spark.sql("select * from gate_err").collect()}
            # 3 consecutive errors → delay *= 2 (rate_limiter.c:113-118)
            assert rows["u_after"]["current_delay"] == 2.0
        finally:
            q.stop()


class TestMetricsStream:
    def test_windowed_counts(self, spark, tmp_path):
        src = str(tmp_path / "pages")
        ckpt = str(tmp_path / "ckpt3")
        os.makedirs(src, exist_ok=True)
        rows = [
            ("h1", "2026-01-01 00:00:10", 100),
            ("h1", "2026-01-01 00:00:50", 200),
            ("h1", "2026-01-01 00:01:10", 300),
            ("h2", "2026-01-01 00:00:20", 50),
        ]
        df = spark.createDataFrame(rows, "host string, ts string, content_size long").select(
            "host", F.to_timestamp("ts").alias("fetched_ts"), "content_size"
        )
        df.coalesce(1).write.mode("append").parquet(src)
        stream = spark.readStream.schema(df.schema).parquet(src)
        q = (
            crawl_metrics_stream(stream)
            .writeStream.format("memory")
            .queryName("metrics_out")
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .start()
        )
        try:
            q.processAllAvailable()
            # append mode emits only windows closed by the watermark; write a
            # late row far in the future to close the earlier windows
            late = spark.createDataFrame(
                [("h1", "2026-01-01 01:00:00", 1)], "host string, ts string, content_size long"
            ).select("host", F.to_timestamp("ts").alias("fetched_ts"), "content_size")
            late.coalesce(1).write.mode("append").parquet(src)
            q.processAllAvailable()
            got = {
                (str(r["window_start"]), r["host"]): (r["urls_processed"], r["bytes_downloaded"])
                for r in spark.sql("select * from metrics_out").collect()
            }
            assert got[("2026-01-01 00:00:00", "h1")] == (2, 300)
            assert got[("2026-01-01 00:01:00", "h1")] == (1, 300)
            assert got[("2026-01-01 00:00:00", "h2")] == (1, 50)
        finally:
            q.stop()


class TestStreamingCrawlEndToEnd:
    def test_dedup_politeness_fetch_sink_and_resume(self, spark, tmp_path):
        """Full streaming crawl: frontier drops → streaming dedup →
        stateful politeness → fetch → analyze → checkpointed parquet sink.
        A second drop against the SAME checkpoint must (a) never refetch
        urls from drop 1 (dedup state store survives restart), (b) keep
        each host's politeness clock advancing from its persisted
        last_fetch, (c) fetch every genuinely-new url exactly once."""
        from web_scraper_spark.streaming.crawl_stream import streaming_crawl
        from web_scraper_spark.synth import SynthWebConfig, page_url

        web = SynthWebConfig(n_hosts=3, pages_per_host=8)
        frontier = str(tmp_path / "frontier")
        pages = str(tmp_path / "pages")
        ckpt = str(tmp_path / "ckpt")
        os.makedirs(frontier, exist_ok=True)

        def drop(rows):
            spark.createDataFrame(
                rows, "url string, priority int, event_time double"
            ).coalesce(1).write.mode("append").parquet(frontier)

        batch1 = [(page_url(h, p), 1, 0.0) for h in range(3) for p in range(4)]
        drop(batch1 + batch1[:3])  # in-stream duplicates too
        q = streaming_crawl(spark, frontier, pages, ckpt, web)
        q.awaitTermination()
        got1 = spark.read.parquet(pages).collect()
        urls1 = [r["url"] for r in got1]
        assert sorted(urls1) == sorted({u for u, _, _ in batch1})
        assert all(r["title"] for r in got1)
        by_host_last = {}
        for r in got1:
            ts = by_host_last.setdefault(r["host"], [])
            ts.append(r["fetch_time"])
        for h, ts in by_host_last.items():
            ts.sort()
            assert all(b - a >= 0.999 for a, b in zip(ts, ts[1:])), (h, ts)
            by_host_last[h] = ts[-1]

        # drop 2: overlap with drop 1 + new urls; restart from checkpoint
        batch2 = [(page_url(h, p), 1, 0.0) for h in range(3) for p in range(2, 7)]
        drop(batch2)
        q2 = streaming_crawl(spark, frontier, pages, ckpt, web)
        q2.awaitTermination()
        got2 = spark.read.parquet(pages).collect()
        new_urls = {u for u, _, _ in batch2} - {u for u, _, _ in batch1}
        assert sorted(r["url"] for r in got2) == sorted(
            {u for u, _, _ in batch1} | new_urls
        )
        # politeness clock continued: every new fetch lands after the
        # host's persisted last_fetch + delay
        for r in got2:
            if r["url"] in new_urls and r["host"] in by_host_last:
                assert r["fetch_time"] >= by_host_last[r["host"]] + 0.999, r


class TestStreamingDocumentKeepSet:
    def test_keep_first_across_batches_and_restart(self, spark, tmp_path):
        """Streaming corpus dedup (the batch exact_dedup twin): each
        distinct text is kept exactly once across micro-batches AND a
        checkpoint restart; in-stream duplicates collapse; the kept
        fingerprint set equals the batch kernel's fingerprint set."""
        from web_scraper_spark.functions.textanalysis import md5_60_expr
        from web_scraper_spark.streaming.dedup_stream import dedup_documents_stream

        docs = str(tmp_path / "docs")
        out = str(tmp_path / "kept")
        ckpt = str(tmp_path / "ckpt")
        os.makedirs(docs, exist_ok=True)

        def drop(rows):
            spark.createDataFrame(
                rows, "doc_id long, text string, event_time double"
            ).coalesce(1).write.mode("append").parquet(docs)

        texts1 = [f"document body {i}" for i in range(6)]
        # 6 distinct texts, 2 duplicated inside the same drop
        drop([(i, t, 0.0) for i, t in enumerate(texts1)]
             + [(100, texts1[0], 0.0), (101, texts1[1], 0.0)])
        dedup_documents_stream(spark, docs, out, ckpt).awaitTermination()
        got1 = spark.read.parquet(out).collect()
        assert len(got1) == 6
        assert sorted({r["text"] for r in got1}) == sorted(texts1)

        # drop 2: full overlap with drop 1 + 3 new texts; restart from the
        # same checkpoint — only the new texts may appear
        texts2 = [f"document body {i}" for i in range(4, 9)]
        drop([(200 + i, t, 1.0) for i, t in enumerate(texts2)])
        dedup_documents_stream(spark, docs, out, ckpt).awaitTermination()
        got2 = spark.read.parquet(out).collect()
        assert len(got2) == 9
        assert sorted({r["text"] for r in got2}) == sorted(set(texts1) | set(texts2))
        # kept ids from drop 1 unchanged (never re-emitted / replaced)
        ids1 = {r["text"]: r["doc_id"] for r in got1}
        for r in got2:
            if r["text"] in ids1:
                assert r["doc_id"] == ids1[r["text"]]
        # fingerprints match the batch kernel exactly
        expect_fp = {
            r["fp"]
            for r in spark.createDataFrame(
                [(t,) for t in set(texts1) | set(texts2)], "text string"
            ).select(md5_60_expr(F.col("text")).alias("fp")).collect()
        }
        assert {r["fp"] for r in got2} == expect_fp

    def test_ttl_allows_rekeep_after_expiry(self, spark, tmp_path):
        """Bounded-state mode: with ttl set, a text whose state row has
        aged out of the watermark may be kept AGAIN. The watermark (and so
        eviction) advances at the END of a batch, one batch behind event
        time — a duplicate arriving in the same batch that moves the clock
        is still suppressed; the NEXT batch sees it re-kept."""
        from web_scraper_spark.streaming.dedup_stream import dedup_documents_stream

        docs = str(tmp_path / "docs")
        out = str(tmp_path / "kept")
        ckpt = str(tmp_path / "ckpt")
        os.makedirs(docs, exist_ok=True)

        def drop(rows):
            spark.createDataFrame(
                rows, "doc_id long, text string, event_time double"
            ).coalesce(1).write.mode("append").parquet(docs)

        def run():
            dedup_documents_stream(spark, docs, out, ckpt, ttl=10).awaitTermination()

        # NOT t=0: the initial watermark is epoch 0, and a row at or below
        # the watermark is discarded as late before it ever reaches the
        # dedup state (empirically verified; applies to any watermarked op)
        drop([(1, "repeat me", 100.0)])
        run()
        # same text 900s later: moves the watermark to 990 at batch END,
        # but the t=100 state row (expiry 110) was live when this batch
        # was planned → still suppressed here; expiry is NOT extended
        drop([(2, "repeat me", 1000.0)])
        run()
        got = spark.read.parquet(out).collect()
        assert len(got) == 1 and got[0]["doc_id"] == 1
        # next batch: watermark 990 > expiry 110 → state evicted → re-kept
        drop([(3, "repeat me", 1000.0)])
        run()
        got = spark.read.parquet(out).collect()
        assert len(got) == 2 and {r["doc_id"] for r in got} == {1, 3}


class TestStreamingCrawlDedupTTL:
    def test_url_refetched_after_ttl_expiry(self, spark, tmp_path):
        """dedup_ttl bounds the URL-seen state: a url re-dropped after its
        state row ages out of the watermark is fetched AGAIN (the
        reference's cache-expiry contract, cache.h:8). Same watermark fine
        print as the document keep-set: eviction lands the batch after the
        watermark passes expiry, and t=0 rows would be late-dropped."""
        from web_scraper_spark.streaming.crawl_stream import streaming_crawl
        from web_scraper_spark.synth import SynthWebConfig, page_url

        web = SynthWebConfig(n_hosts=1, pages_per_host=4)
        frontier = str(tmp_path / "frontier")
        pages = str(tmp_path / "pages")
        ckpt = str(tmp_path / "ckpt")
        os.makedirs(frontier, exist_ok=True)
        u = page_url(0, 0)

        def drop(rows):
            spark.createDataFrame(
                rows, "url string, priority int, event_time double"
            ).coalesce(1).write.mode("append").parquet(frontier)

        def run():
            streaming_crawl(
                spark, frontier, pages, ckpt, web, dedup_ttl=10
            ).awaitTermination()

        drop([(u, 1, 100.0)])
        run()
        assert spark.read.parquet(pages).count() == 1
        # same url 900s later: state row (expiry 110) still live when this
        # batch plans → suppressed; watermark moves to 990 at batch end
        drop([(u, 1, 1000.0)])
        run()
        assert spark.read.parquet(pages).count() == 1
        # next batch: watermark 990 > 110 → state evicted → REFETCHED
        drop([(u, 1, 1000.0)])
        run()
        got = spark.read.parquet(pages).collect()
        assert len(got) == 2 and all(r["url"] == u for r in got)


class TestStreamingRetryAndFeedback:
    def test_failed_url_retryable_via_attempt_key(self, spark, tmp_path):
        """The (url_sha1, attempt) dedup key makes transport failures
        retryable: re-enqueueing a failed url with attempt=1 (its failure-
        row count) passes the state store and reaches the transport again,
        while re-enqueueing an already-SUCCESSFUL url at attempt=0 stays
        suppressed — the batch 'failures are never marked seen' contract."""
        from web_scraper_spark.streaming.crawl_stream import streaming_crawl
        from web_scraper_spark.synth import SynthWebConfig, page_url

        web = SynthWebConfig(n_hosts=2, pages_per_host=6, fail_rate=0.4)
        frontier = str(tmp_path / "frontier")
        pages = str(tmp_path / "pages")
        fails = str(tmp_path / "fails")
        ckpt = str(tmp_path / "ckpt")
        os.makedirs(frontier, exist_ok=True)

        def drop(rows):
            spark.createDataFrame(
                rows, "url string, priority int, event_time double, attempt int"
            ).coalesce(1).write.mode("append").parquet(frontier)

        def run():
            streaming_crawl(
                spark, frontier, pages, ckpt, web, failures_dir=fails
            ).awaitTermination()

        drop([(page_url(h, p), 1, 0.0, 0) for h in range(2) for p in range(6)])
        run()
        failed = [r["url"] for r in spark.read.parquet(fails).collect()]
        ok = [r["url"] for r in spark.read.parquet(pages).collect()]
        assert failed and ok, "need both outcomes (fail_rate seeds both)"
        # sweeper protocol: attempt = the url's failure-row count
        drop([(failed[0], 1, 1.0, 1)])  # retry of a failed url
        drop([(ok[0], 1, 1.0, 0)])      # duplicate of a SUCCESSFUL url
        run()
        fail_counts = {
            r["url"]: r["n"]
            for r in spark.read.parquet(fails).groupBy("url").agg(
                F.count("*").alias("n")
            ).collect()
        }
        # the retry reached the transport again (deterministic synth fails
        # it again -> a second failure row); the successful dup stayed out
        assert fail_counts[failed[0]] == 2
        assert sorted(r["url"] for r in spark.read.parquet(pages).collect()) == sorted(ok)

    def test_aimd_feedback_stream_raises_delay(self, spark, tmp_path):
        """The gate's AIMD fold is reachable e2e: a feedback stream of
        error-status rows for a host doubles its delay, and the host's
        NEXT admitted urls are slotted at the widened spacing."""
        from web_scraper_spark.streaming.crawl_stream import streaming_crawl
        from web_scraper_spark.synth import SynthWebConfig, page_url

        web = SynthWebConfig(n_hosts=1, pages_per_host=8)
        frontier = str(tmp_path / "frontier")
        pages = str(tmp_path / "pages")
        fb_dir = str(tmp_path / "fb")
        ckpt = str(tmp_path / "ckpt")
        os.makedirs(frontier, exist_ok=True)
        host = "h0.example.test"

        FB = "host string, url_canon string, priority int, event_time double, status int, response_ms int"
        # 3 consecutive errors -> AIMD doubles current_delay (T2 constants)
        spark.createDataFrame(
            [(host, f"http://{host}/err/{i}", 1, float(i), 500, 10) for i in range(3)],
            FB,
        ).coalesce(1).write.mode("append").parquet(fb_dir)
        feedback = spark.readStream.schema(FB).parquet(fb_dir)

        spark.createDataFrame(
            [(page_url(0, p), 1, 10.0, 0) for p in range(4)],
            "url string, priority int, event_time double, attempt int",
        ).coalesce(1).write.mode("append").parquet(frontier)
        streaming_crawl(
            spark, frontier, pages, ckpt, web, feedback=feedback
        ).awaitTermination()
        ts = sorted(r["fetch_time"] for r in spark.read.parquet(pages).collect())
        assert len(ts) == 4
        gaps = [b - a for a, b in zip(ts, ts[1:])]
        # delay doubled from MIN_DELAY (1.0) to 2.0 before slotting
        assert all(g >= 1.99 for g in gaps), gaps


    def test_aimd_self_feedback_two_query_restart_loop(self, spark, tmp_path):
        """The CLOSED feedback loop, no caller improvisation (r3 verdict
        item 9): pages sink → pages_feedback_stream → gate, run twice
        against one checkpoint. Run 1 fetches three 404 urls on one host;
        run 2's availableNow listing picks those completed rows up as
        feedback, folds 3 consecutive errors (→ delay 1.0 * ERROR_PENALTY
        = 2.0) into the RESTORED host state, then slots run 2's fresh urls
        at the widened spacing."""
        from web_scraper_spark.config import ERROR_PENALTY, MIN_DELAY
        from web_scraper_spark.streaming.crawl_stream import (
            pages_feedback_stream,
            streaming_crawl,
        )
        from web_scraper_spark.synth import SynthWebConfig, page_url

        web = SynthWebConfig(n_hosts=1, pages_per_host=8)
        frontier = str(tmp_path / "frontier")
        pages = str(tmp_path / "pages")
        ckpt = str(tmp_path / "ckpt")
        os.makedirs(frontier, exist_ok=True)
        os.makedirs(pages, exist_ok=True)
        host = "h0.example.test"

        def drop(rows):
            spark.createDataFrame(
                rows, "url string, priority int, event_time double, attempt int"
            ).coalesce(1).write.mode("append").parquet(frontier)

        def run():
            streaming_crawl(
                spark, frontier, pages, ckpt, web,
                feedback=pages_feedback_stream(spark, pages),
            ).awaitTermination()

        # run 1: three unknown paths -> deterministic 404s (bodies present,
        # so they land in the pages sink with their error status)
        drop([(f"http://{host}/missing/{i}", 1, 100.0, 0) for i in range(3)])
        run()
        got1 = spark.read.parquet(pages).collect()
        assert sorted(r["status"] for r in got1) == [404, 404, 404]
        ts1 = sorted(r["fetch_time"] for r in got1)
        # run-1 slots at the default delay (no feedback had been written)
        assert all(abs(b - a - MIN_DELAY) < 1e-6 for a, b in zip(ts1, ts1[1:]))

        # run 2: fresh urls; restart folds run 1's 404s first
        drop([(page_url(0, p), 1, 200.0, 0) for p in range(3)])
        run()
        got2 = [r for r in spark.read.parquet(pages).collect() if r["status"] == 200]
        assert len(got2) == 3
        ts2 = sorted(r["fetch_time"] for r in got2)
        want = MIN_DELAY * ERROR_PENALTY
        gaps = [b - a for a, b in zip(ts2, ts2[1:])]
        assert all(abs(g - want) < 1e-6 for g in gaps), gaps

        # run 3: the loop keeps going — run 2's three successes now fold
        # back (FAST/SLOW factors per their real response times); expected
        # delay re-derived with the same pure kernel the gate uses
        from web_scraper_spark.operators.scheduler import aimd_update_py

        delay, errors = want, 0
        for r in sorted(got2, key=lambda r: r["fetch_time"]):
            delay, errors = aimd_update_py(
                delay, MIN_DELAY, errors, int(r["status"]),
                float(r["response_ms"] or 0) / 1000.0,
            )
        drop([(page_url(0, p), 1, 300.0, 0) for p in range(3, 6)])
        run()
        got3 = [r for r in spark.read.parquet(pages).collect()
                if r["fetch_time"] >= 300.0]
        ts3 = sorted(r["fetch_time"] for r in got3)
        gaps3 = [b - a for a, b in zip(ts3, ts3[1:])]
        assert all(abs(g - delay) < 1e-6 for g in gaps3), (gaps3, delay)


class TestStreamingRobotsAndFailures:
    def test_disallowed_never_fetched_failures_routed_resume_exact(self, spark, tmp_path):
        """Round-3 parity: the stream composes the SAME broadcast robots
        decision the batch engine uses (a disallowed url never reaches the
        gate, the transport, or any sink), transport failures land in the
        failures sink instead of vanishing, and a checkpoint restart keeps
        the dedup store exact across both new sinks."""
        import os

        from web_scraper_spark.operators.robots import rules_from_corpus
        from web_scraper_spark.streaming.crawl_stream import streaming_crawl
        from web_scraper_spark.synth import SynthWebConfig, host_name, page_url

        # fail_rate seeds deterministic transport failures on known pages
        web = SynthWebConfig(n_hosts=2, pages_per_host=20, fail_rate=0.25)
        frontier = str(tmp_path / "frontier")
        pages = str(tmp_path / "pages")
        fails_dir = str(tmp_path / "fails")
        ckpt = str(tmp_path / "ckpt")
        os.makedirs(frontier, exist_ok=True)

        corpus = spark.createDataFrame(
            [(host_name(k), "User-agent: *\nDisallow: /private/*\n") for k in range(2)],
            ["host", "body"],
        )
        robots = rules_from_corpus(corpus, fetched_at=0)

        def drop(rows):
            spark.createDataFrame(
                rows, "url string, priority int, event_time double"
            ).coalesce(1).write.mode("append").parquet(frontier)

        batch1 = [(page_url(k, j), 1, 0.0) for k in range(2) for j in range(10)]
        private1 = {u for u, _, _ in batch1 if "/private/" in u}
        assert private1  # j % 10 == 7 pages exist in range(10)
        drop(batch1)
        q = streaming_crawl(
            spark, frontier, pages, ckpt, web,
            robots=robots, failures_dir=fails_dir,
        )
        q.awaitTermination()

        got = spark.read.parquet(pages).collect()
        page_urls = {r["url"] for r in got}
        failed_urls = (
            {r["url"] for r in spark.read.parquet(fails_dir).collect()}
            if os.path.exists(fails_dir) and os.listdir(fails_dir)
            else set()
        )
        # robots honored BEFORE fetch: disallowed urls in NO sink
        assert not (page_urls & private1)
        assert not (failed_urls & private1)
        # failures routed, disjoint from pages, and together they cover
        # every allowed url exactly once
        allowed1 = {u for u, _, _ in batch1} - private1
        assert failed_urls  # fail_rate=0.25 over 16 allowed urls
        assert not (page_urls & failed_urls)
        assert page_urls | failed_urls == allowed1

        # restart from checkpoint: overlap + new urls; dedup state must
        # hold across the foreachBatch sink path too
        batch2 = [(page_url(k, j), 1, 0.0) for k in range(2) for j in range(5, 15)]
        drop(batch2)
        q2 = streaming_crawl(
            spark, frontier, pages, ckpt, web,
            robots=robots, failures_dir=fails_dir,
        )
        q2.awaitTermination()
        got2_urls = [r["url"] for r in spark.read.parquet(pages).collect()]
        # no url fetched twice (exactly-once across restarts)
        assert len(got2_urls) == len(set(got2_urls))
        all_private = {u for u, _, _ in batch1 + batch2 if "/private/" in u}
        assert not (set(got2_urls) & all_private)

        # foreachBatch sinks are batch-id-keyed overwrite directories (the
        # exactly-once mechanism: a mid-batch crash replays the same
        # batch_id and rewrites the same directory instead of appending
        # duplicates) — partition discovery surfaces the key
        assert any(d.startswith("batch_id=") for d in os.listdir(pages))

        # robots runs BEFORE the dedup state store (batch parity: a
        # disallowed url is never marked seen). Restart with a permissive
        # rules table and re-deliver a previously-disallowed url: it must
        # be fetched now — under robots-after-dedup it would sit in state
        # forever and be dropped before the new decision ever saw it.
        corpus_open = spark.createDataFrame(
            [(host_name(k), "User-agent: *\nAllow: /\n") for k in range(2)],
            ["host", "body"],
        )
        robots_open = rules_from_corpus(corpus_open, fetched_at=1)
        target = sorted(private1)[0]
        drop([(target, 1, 0.0)])
        q3 = streaming_crawl(
            spark, frontier, pages, ckpt, web,
            robots=robots_open, failures_dir=fails_dir,
        )
        q3.awaitTermination()
        urls3 = {r["url"] for r in spark.read.parquet(pages).collect()}
        fails3 = {r["url"] for r in spark.read.parquet(fails_dir).collect()}
        assert target in (urls3 | fails3)


class TestStreamingCuration:
    def test_stage_drops_and_mask_in_stream(self, spark, tmp_path):
        """curate_documents_stream: repetition filter, decontamination
        (static eval-gram literal), PII masking, and exact-dedup state all
        fire on a continuous ingest — same kernels, same constants, same
        decisions as the batch curate_corpus."""
        from web_scraper_spark.streaming.curation_stream import (
            curate_documents_stream,
        )

        docs = str(tmp_path / "docs")
        out = str(tmp_path / "kept")
        ckpt = str(tmp_path / "ckpt")
        os.makedirs(docs, exist_ok=True)

        def drop(rows):
            spark.createDataFrame(
                rows, "doc_id long, text string, event_time double"
            ).coalesce(1).write.mode("append").parquet(docs)

        base = " ".join(f"w{i}" for i in range(40))
        ev = spark.createDataFrame(
            [(" ".join(f"e{i}" for i in range(1, 21)),)], "text string"
        )

        def run():
            curate_documents_stream(
                spark, docs, out, ckpt, ev,
                quality_min=0.0, dup_frac_max=0.5,
            ).awaitTermination()

        drop([
            (1, base + " alpha", 1.0),                        # kept
            (2, base + " mail a.b@c.org here", 1.0),          # kept, masked
            (3, "x " * 60, 1.0),                              # repetition drop
            (4, base + " e1 e2 e3 e4 e5 e6 e7 e8", 1.0),      # contaminated
            (5, base + " alpha", 1.0),                        # in-batch dup of 1
        ])
        run()
        got1 = {r["doc_id"]: r for r in spark.read.parquet(out).collect()}
        assert set(got1) == {1, 2}
        assert got1[2]["masked_text"] == base + " mail <EMAIL> here"
        assert got1[1]["n_tokens"] == 41

        # batch 2 against the same checkpoint: cross-batch dup suppressed
        # by the fingerprint state; a new doc flows through
        drop([(6, base + " alpha", 2.0), (7, base + " beta", 2.0)])
        run()
        got2 = {r["doc_id"] for r in spark.read.parquet(out).collect()}
        assert got2 == {1, 2, 7}

    def test_matches_batch_decisions(self, spark, tmp_path):
        """The streaming keep TEXT set equals batch curate_corpus's keep
        set on the same corpus (budget off, near-dup off — the two stages
        streaming deliberately omits)."""
        from web_scraper_spark.functions import curation as cu
        from web_scraper_spark.streaming.curation_stream import (
            curate_documents_stream,
        )

        docs = str(tmp_path / "docs")
        out = str(tmp_path / "kept")
        ckpt = str(tmp_path / "ckpt")
        os.makedirs(docs, exist_ok=True)

        d = (
            spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .select("doc_id", "text")
        )
        train = d.filter(F.col("doc_id") % 5 != 0)
        ev = d.filter(F.col("doc_id") % 5 == 0).select("text")

        train.withColumn("event_time", F.lit(1.0)).coalesce(2).write.mode(
            "append"
        ).parquet(docs)
        curate_documents_stream(
            spark, docs, out, ckpt, ev, quality_min=0.9, dup_frac_max=0.55
        ).awaitTermination()
        stream_texts = {
            r["masked_text"] for r in spark.read.parquet(out).collect()
        }

        batch = cu.curate_corpus(
            train.withColumn("lang", F.lit("x")),
            ev,
            quality_min=0.9,
            dup_frac_max=0.55,
            max_hamming=-1,   # near-dup off: streaming has no banded join
            budget_tokens=None,
        )
        batch_texts = {r["masked_text"] for r in batch.collect()}
        assert stream_texts == batch_texts
        assert len(stream_texts) > 0


class TestStreamingPairCuration:
    """curate_pairs_stream — the image twin of the docs curation stage:
    geometry/caption/quality drops fire in-stream with the batch
    constants, and the two exact-dedup states (image phash, caption fp)
    keep-FIRST across micro-batches and restarts."""

    @staticmethod
    def _pair(iid, px, caption, t, fmt="ppm"):
        import numpy as np  # noqa: F401 (px built by callers)

        from web_scraper_spark.functions import imageops

        data = imageops.encode_image(px, fmt)
        arr = imageops.decode_image(data, fmt)
        return (
            iid, bytearray(data), int(px.shape[1]), int(px.shape[0]), fmt,
            caption, imageops.phash64(arr), float(t),
        )

    def test_stage_drops_and_dedup_state(self, spark, tmp_path):
        import numpy as np

        from web_scraper_spark import synth
        from web_scraper_spark.streaming.pair_stream import (
            PAIRS_STREAM_SCHEMA,
            curate_pairs_stream,
        )

        pairs = str(tmp_path / "pairs")
        out = str(tmp_path / "kept")
        ckpt = str(tmp_path / "ckpt")
        os.makedirs(pairs, exist_ok=True)

        def drop(rows):
            spark.createDataFrame(rows, PAIRS_STREAM_SCHEMA).coalesce(
                1
            ).write.mode("append").parquet(pairs)

        def run():
            curate_pairs_stream(spark, pairs, out, ckpt).awaitTermination()

        cap = "a detailed photo of subject number %d in context"
        good0 = synth.gen_pixels(0, 42)     # 32x32+ gradient+noise: passes
        good5 = synth.gen_pixels(5, 42)
        tiny = synth.gen_pixels(1, 42)[:8, :8]          # 64 px: geometry
        wide = synth.gen_pixels(2, 42)[:8, :]           # check real aspect
        if wide.shape[1] / wide.shape[0] <= 4.0:        # ensure > 4
            wide = wide[:4, :]
        flat = np.full((48, 48, 3), 77, np.uint8)       # quality drop

        drop([
            self._pair("p-00", good0, cap % 0, 1.0),          # kept
            self._pair("p-01", tiny, cap % 1, 1.0),           # geometry
            self._pair("p-02", wide, cap % 2, 1.0),           # aspect
            self._pair("p-03", good5, "too short", 1.0),      # caption len
            self._pair("p-04", flat, cap % 4, 1.0),           # quality
        ])
        run()
        got1 = {r["image_id"]: r for r in spark.read.parquet(out).collect()}
        assert set(got1) == {"p-00"}
        r = got1["p-00"]
        assert r["sharp_milli"] >= 2_000_000 and r["ent_milli"] >= 4_000
        assert r["caption_tokens"] == 9 and r["n_pixels"] == good0.shape[0] * good0.shape[1]

        # batch 2, same checkpoint: a cross-batch image re-post AND a
        # caption re-use are both suppressed by state (keep-FIRST across
        # micro-batches — within ONE micro-batch dropDuplicates keeps an
        # arbitrary representative, so the conflicts are split across
        # batches here); a brand-new pair flows through
        good7 = synth.gen_pixels(7, 42)
        good11 = synth.gen_pixels(11, 42)
        drop([
            self._pair("p-10", good0, cap % 10, 2.0),   # phash dup, cross-batch
            self._pair("p-11", good7, cap % 0, 2.0),    # caption dup, cross-batch
            self._pair("p-12", good11, cap % 12, 2.0),  # kept
        ])
        run()
        got2 = {r["image_id"] for r in spark.read.parquet(out).collect()}
        assert got2 == {"p-00", "p-12"}

    def test_matches_sequential_expectation(self, spark, tmp_path):
        """Streaming keep set == the keep-FIRST expectation re-derived
        sequentially with the same kernels over the same arrival order."""
        import pandas as pd

        import hashlib

        from web_scraper_spark import synth
        from web_scraper_spark.functions import imageops
        from web_scraper_spark.streaming.pair_stream import (
            PAIRS_STREAM_SCHEMA,
            curate_pairs_stream,
        )

        pairs = str(tmp_path / "pairs")
        out = str(tmp_path / "kept")
        ckpt = str(tmp_path / "ckpt")
        os.makedirs(pairs, exist_ok=True)

        n = 96
        pdf = synth.images_pdf(pd.Series(range(n)), 42)
        rows = [
            (
                r.image_id, bytearray(bytes(r.bytes)), int(r.w), int(r.h),
                r.fmt, r.caption, int(r.phash), 1.0,
            )
            for r in pdf.itertuples(index=False)
        ]
        spark.createDataFrame(rows, PAIRS_STREAM_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(pairs)
        curate_pairs_stream(spark, pairs, out, ckpt).awaitTermination()
        got = {r["image_id"] for r in spark.read.parquet(out).collect()}

        seen_ph, seen_fp, expected = set(), set(), set()
        for r in pdf.itertuples(index=False):  # id order == arrival order
            if int(r.w) * int(r.h) < 1024:
                continue
            if max(r.w, r.h) / min(r.w, r.h) > 4.0:
                continue
            if len(r.caption.split()) < 4:
                continue
            s = imageops.quality_stats(
                imageops.decode_image(bytes(r.bytes), r.fmt)
            )
            if s["sharp_milli"] < 2_000_000 or s["ent_milli"] < 4_000:
                continue
            fp = int(hashlib.md5(r.caption.encode()).hexdigest()[:15], 16)
            if int(r.phash) in seen_ph or fp in seen_fp:
                continue
            seen_ph.add(int(r.phash))
            seen_fp.add(fp)
            expected.add(r.image_id)
        assert got == expected and expected


class TestStreamingPairAlignment:
    """curate_pairs_stream(min_alignment=...) — the CLIP-score gate as a
    STATELESS in-stream stage: misaligned pairs drop before dedup, and a
    gated-out pair leaves no trace in the dedup state."""

    def test_gate_drops_misaligned_without_state(self, spark, tmp_path):
        from web_scraper_spark import synth
        from web_scraper_spark.streaming.pair_stream import (
            PAIRS_EMB_STREAM_SCHEMA,
            curate_pairs_stream,
        )

        pairs = str(tmp_path / "pairs")
        out = str(tmp_path / "kept")
        ckpt = str(tmp_path / "ckpt")
        os.makedirs(pairs, exist_ok=True)

        aligned = ([1.0, 0.0], [1.0, 0.0])
        misaligned = ([1.0, 0.0], [0.0, 1.0])

        def pair(iid, k, caption, t, vecs):
            base = TestStreamingPairCuration._pair(
                iid, synth.gen_pixels(k, 42), caption, t
            )
            return base + (list(vecs[0]), list(vecs[1]))

        def drop(rows):
            spark.createDataFrame(rows, PAIRS_EMB_STREAM_SCHEMA).coalesce(
                1
            ).write.mode("append").parquet(pairs)

        def run():
            curate_pairs_stream(
                spark, pairs, out, ckpt, min_alignment=0.9
            ).awaitTermination()

        cap = "a detailed photo of subject number %d in context"
        drop([
            pair("p-00", 0, cap % 0, 1.0, aligned),      # kept
            pair("p-01", 5, cap % 1, 1.0, misaligned),   # gate drop
        ])
        run()
        got1 = {r["image_id"] for r in spark.read.parquet(out).collect()}
        assert got1 == {"p-00"}

        # p-01's pixels re-post ALIGNED in batch 2: the gate is stateless,
        # so the earlier gated-out pair must not have claimed the phash —
        # this pair is kept. A re-post of p-00's pixels stays suppressed
        # by the real dedup state.
        drop([
            pair("p-10", 5, cap % 10, 2.0, aligned),     # kept (no ghost state)
            pair("p-11", 0, cap % 11, 2.0, aligned),     # phash dup of p-00
        ])
        run()
        got2 = {r["image_id"] for r in spark.read.parquet(out).collect()}
        assert got2 == {"p-00", "p-10"}


class TestStreamingPairLanguage:
    """curate_pairs_stream(allowed_langs=...) — the caption-language gate
    as a STATELESS in-stream stage: foreign-language pairs drop before
    dedup with no ghost state, mirroring the batch composite's 2a gate."""

    def test_gate_drops_foreign_without_state(self, spark, tmp_path):
        from web_scraper_spark import synth
        from web_scraper_spark.streaming.pair_stream import (
            PAIRS_STREAM_SCHEMA,
            curate_pairs_stream,
        )

        pairs = str(tmp_path / "pairs")
        out = str(tmp_path / "kept")
        ckpt = str(tmp_path / "ckpt")
        os.makedirs(pairs, exist_ok=True)

        def drop(rows):
            spark.createDataFrame(rows, PAIRS_STREAM_SCHEMA).coalesce(
                1
            ).write.mode("append").parquet(pairs)

        def run():
            curate_pairs_stream(
                spark, pairs, out, ckpt, allowed_langs=("en", "und")
            ).awaitTermination()

        en = "a detailed photo of subject number %d in context"
        de = "der hund ist nicht gross und die katze ist klein"
        drop([
            TestStreamingPairCuration._pair("p-00", synth.gen_pixels(0, 42), en % 0, 1.0),  # kept
            TestStreamingPairCuration._pair("p-01", synth.gen_pixels(5, 42), de, 1.0),  # lang drop
        ])
        run()
        got1 = {r["image_id"] for r in spark.read.parquet(out).collect()}
        assert got1 == {"p-00"}

        # p-01's pixels re-post with an allowed caption in batch 2: the
        # gate is stateless, so the gated-out pair must not have claimed
        # the phash; a re-post of p-00's pixels stays suppressed by the
        # real dedup state.
        drop([
            TestStreamingPairCuration._pair("p-10", synth.gen_pixels(5, 42), en % 10, 2.0),  # kept
            TestStreamingPairCuration._pair("p-11", synth.gen_pixels(0, 42), en % 11, 2.0),  # dup
        ])
        run()
        got2 = {r["image_id"] for r in spark.read.parquet(out).collect()}
        assert got2 == {"p-00", "p-10"}


class TestStreamingPairSafety:
    """curate_pairs_stream(max_banned_frac=...) — the caption safety gate
    as a STATELESS in-stream stage with no ghost dedup state."""

    def test_gate_drops_banned_without_state(self, spark, tmp_path):
        from web_scraper_spark import synth
        from web_scraper_spark.streaming.pair_stream import curate_pairs_stream

        pairs = str(tmp_path / "pairs")
        out = str(tmp_path / "kept")
        ckpt = str(tmp_path / "ckpt")
        os.makedirs(pairs, exist_ok=True)

        def drop(rows):
            from web_scraper_spark.streaming.pair_stream import (
                PAIRS_STREAM_SCHEMA,
            )

            spark.createDataFrame(rows, PAIRS_STREAM_SCHEMA).coalesce(
                1
            ).write.mode("append").parquet(pairs)

        def run():
            curate_pairs_stream(
                spark, pairs, out, ckpt, max_banned_frac=0.0
            ).awaitTermination()

        en = "a detailed photo of subject number %d in context"
        bad = "photo of spamterm content right here"
        drop([
            TestStreamingPairCuration._pair("p-00", synth.gen_pixels(0, 42), en % 0, 1.0),
            TestStreamingPairCuration._pair("p-01", synth.gen_pixels(5, 42), bad, 1.0),
        ])
        run()
        got1 = {r["image_id"] for r in spark.read.parquet(out).collect()}
        assert got1 == {"p-00"}

        drop([
            TestStreamingPairCuration._pair("p-10", synth.gen_pixels(5, 42), en % 10, 2.0),
            TestStreamingPairCuration._pair("p-11", synth.gen_pixels(0, 42), en % 11, 2.0),
        ])
        run()
        got2 = {r["image_id"] for r in spark.read.parquet(out).collect()}
        assert got2 == {"p-00", "p-10"}  # no ghost state; real dup suppressed
