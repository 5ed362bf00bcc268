"""Training-shard emission (operators/sharding.py): the loader contract.

What a data loader assumes of a shard set — deterministic hash placement,
seeded within-shard shuffle order, verifiable per-shard manifest — is
pinned here at three levels: (1) pure-frame semantics (positions are a
permutation, salt re-deals), (2) the WRITTEN artifact (rows inside each
shard=K/ parquet land in epoch order; manifest recounts match the files),
and (3) DuckDB twin parity for both SQL generators, so the driver oracle
never drifts from the Spark path.
"""

from __future__ import annotations

import glob
import os

import duckdb
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from web_scraper_spark.operators.sharding import (
    _CKSUM_MOD,
    shard_assign,
    shard_manifest,
    shard_manifest_sql,
    shard_positions,
    shard_positions_sql,
    write_training_shards,
)

N_SHARDS = 8


@pytest.fixture(scope="module")
def docs(spark, sf001_dir):
    return spark.read.parquet(os.path.join(sf001_dir, "documents.parquet"))


def test_assign_deterministic_and_balanced(docs):
    a = shard_assign(docs, N_SHARDS).select("doc_id", "shard", "shuffle_key")
    b = shard_assign(docs, N_SHARDS).select("doc_id", "shard", "shuffle_key")
    ra = {r["doc_id"]: (r["shard"], r["shuffle_key"]) for r in a.collect()}
    rb = {r["doc_id"]: (r["shard"], r["shuffle_key"]) for r in b.collect()}
    assert ra == rb
    shards = [v[0] for v in ra.values()]
    assert set(shards) <= set(range(N_SHARDS))
    n = len(shards)
    # hash placement: every shard populated, none grossly skewed
    for s in range(N_SHARDS):
        cnt = shards.count(s)
        assert 0.3 * n / N_SHARDS <= cnt <= 2.5 * n / N_SHARDS, (s, cnt)


def test_positions_are_per_shard_permutations(docs):
    rows = shard_positions(docs, N_SHARDS).collect()
    by_shard: dict[int, list[int]] = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r["shard_pos"])
    assert sum(len(v) for v in by_shard.values()) == docs.count()
    for s, ps in by_shard.items():
        assert sorted(ps) == list(range(len(ps))), s


def test_salt_redeals_placement_and_order(docs):
    p0 = {
        r["doc_id"]: (r["shard"], r["shard_pos"])
        for r in shard_positions(docs, N_SHARDS, salt=0).collect()
    }
    p1 = {
        r["doc_id"]: (r["shard"], r["shard_pos"])
        for r in shard_positions(docs, N_SHARDS, salt=1).collect()
    }
    assert p0.keys() == p1.keys()
    moved = sum(1 for k in p0 if p0[k] != p1[k])
    # a re-deal moves essentially everything (md5 is a fresh draw per salt)
    assert moved > 0.9 * len(p0)


def test_bad_shard_count_rejected(docs):
    with pytest.raises(ValueError):
        shard_assign(docs, 0)


def test_written_shards_are_in_epoch_order_and_match_manifest(docs, tmp_path):
    out = str(tmp_path / "shards")
    manifest = {
        r["shard"]: r
        for r in write_training_shards(
            docs, out, N_SHARDS, id_col="doc_id", text_col="text"
        ).collect()
    }
    assert set(manifest) == set(range(N_SHARDS))

    expected = {
        r["doc_id"]: (r["shard"], r["shard_pos"])
        for r in shard_positions(docs, N_SHARDS).collect()
    }
    total_docs = 0
    for s in range(N_SHARDS):
        files = sorted(glob.glob(os.path.join(out, f"shard={s}", "*.parquet")))
        assert files, s
        # pyarrow preserves physical row order within each file; shard=K is
        # one write partition, so concatenating files in name order IS the
        # order a loader streams
        tbl = None
        ids: list[int] = []
        keys: list[int] = []
        cks = 0
        ntok = 0
        for f in files:
            tbl = pq.read_table(f)
            ids.extend(tbl.column("doc_id").to_pylist())
            keys.extend(tbl.column("shuffle_key").to_pylist())
        # epoch order on disk: (shuffle_key, doc_id) ascending
        assert keys == sorted(keys)
        for i, d in enumerate(ids):
            assert expected[d] == (s, i), (s, d, i)
        total_docs += len(ids)
        assert manifest[s]["n_docs"] == len(ids)
    assert total_docs == docs.count()

    # manifest totals recomputed from the ORIGINAL frame agree with sums of
    # the written shards' token counts and checksums
    from web_scraper_spark.functions.textanalysis import (
        md5_60_expr,
        token_count_expr,
    )

    re_ck = (
        shard_assign(docs, N_SHARDS)
        .groupBy("shard")
        .agg(
            (
                F.sum(
                    md5_60_expr(
                        F.concat(
                            F.col("doc_id").cast("string"),
                            F.lit(":"),
                            F.col("text"),
                        )
                    )
                    % _CKSUM_MOD
                )
                % _CKSUM_MOD
            ).alias("ck"),
            F.sum(token_count_expr(F.col("text")).cast("long")).alias("tok"),
        )
        .collect()
    )
    for r in re_ck:
        assert manifest[r["shard"]]["content_ck"] == r["ck"]
        assert manifest[r["shard"]]["n_tokens"] == r["tok"]


def test_duckdb_twins_match(docs, sf001_dir):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{os.path.join(sf001_dir, 'documents.parquet')}'"
    )
    want_pos = {
        (r[0], r[1], r[2])
        for r in con.execute(
            shard_positions_sql(N_SHARDS, salt=7)
        ).fetchall()
    }
    got_pos = {
        (r["doc_id"], r["shard"], r["shard_pos"])
        for r in shard_positions(docs, N_SHARDS, salt=7).collect()
    }
    assert got_pos == want_pos

    want_man = {
        r[0]: (r[1], r[2], r[3])
        for r in con.execute(shard_manifest_sql(N_SHARDS, salt=7)).fetchall()
    }
    got_man = {
        r["shard"]: (r["n_docs"], r["n_tokens"], r["content_ck"])
        for r in shard_manifest(docs, N_SHARDS, salt=7).collect()
    }
    assert got_man == want_man


# ---------------------------------------------------------------------------
# split_assign / append_training_shards / merge_manifests
# ---------------------------------------------------------------------------

from web_scraper_spark.operators.sharding import (  # noqa: E402
    append_training_shards,
    merge_manifests,
    split_assign,
    split_assign_sql,
)

FRACS = {"train": 0.8, "val": 0.1, "test": 0.1}


def test_split_fractions_validated(docs):
    with pytest.raises(ValueError):
        split_assign(docs, {"train": 0.5, "val": 0.1})
    with pytest.raises(ValueError):
        split_assign(docs, {})


def test_split_deterministic_and_roughly_proportional(docs):
    rows = split_assign(docs, FRACS, salt=3).select("doc_id", "split").collect()
    again = split_assign(docs, FRACS, salt=3).select("doc_id", "split").collect()
    assert {r["doc_id"]: r["split"] for r in rows} == {
        r["doc_id"]: r["split"] for r in again
    }
    n = len(rows)
    counts = {s: 0 for s in FRACS}
    for r in rows:
        counts[r["split"]] += 1
    assert counts["train"] > 0.65 * n
    assert 0 < counts["val"] < 0.25 * n
    assert 0 < counts["test"] < 0.25 * n


def test_split_membership_stable_under_corpus_growth(docs):
    """the eval-contamination property: a doc's split never depends on
    which OTHER docs are present."""
    half = docs.filter(F.col("doc_id") % 2 == 0)
    full_m = {
        r["doc_id"]: r["split"]
        for r in split_assign(docs, FRACS).select("doc_id", "split").collect()
    }
    half_m = {
        r["doc_id"]: r["split"]
        for r in split_assign(half, FRACS).select("doc_id", "split").collect()
    }
    assert all(full_m[k] == v for k, v in half_m.items())


def test_split_independent_of_shard_draws(docs):
    """domain separation: the split draw is not the shard or shuffle draw
    (same salt) — correlated draws would skew per-shard split mixes."""
    j = (
        shard_assign(docs, N_SHARDS, salt=3)
        .select("doc_id", "shard", "shuffle_key")
        .join(split_assign(docs, FRACS, salt=3).select("doc_id", "split_u"), "doc_id")
        .collect()
    )
    assert any(r["split_u"] != r["shuffle_key"] % 1_000_000 for r in j)
    # and the split_u draw is not constant within a shard
    by_shard: dict[int, set[int]] = {}
    for r in j:
        by_shard.setdefault(r["shard"], set()).add(r["split_u"])
    assert all(len(v) > 1 for v in by_shard.values())


def test_split_duckdb_twin(docs, sf001_dir):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{os.path.join(sf001_dir, 'documents.parquet')}'"
    )
    sql = split_assign_sql(FRACS, salt=5)
    want = {
        r[0]: (r[1], r[2])
        for r in con.execute(
            f"SELECT doc_id, split, split_u FROM ({sql})"
        ).fetchall()
    }
    got = {
        r["doc_id"]: (r["split"], r["split_u"])
        for r in split_assign(docs, FRACS, salt=5)
        .select("doc_id", "split", "split_u")
        .collect()
    }
    assert got == want


def test_incremental_append_equals_full_rebuild(docs, tmp_path):
    """O(delta) refresh contract: write half A, append half B; the merged
    manifests and the on-disk per-shard doc sets equal a full rebuild's."""
    a = docs.filter(F.col("doc_id") % 2 == 0)
    b = docs.filter(F.col("doc_id") % 2 == 1)
    inc_path = str(tmp_path / "inc")
    man_a = write_training_shards(a, inc_path, N_SHARDS)
    man_b = append_training_shards(b, inc_path, N_SHARDS)
    merged = {
        r["shard"]: (r["n_docs"], r["n_tokens"], r["content_ck"])
        for r in merge_manifests(man_a, man_b).collect()
    }
    full = {
        r["shard"]: (r["n_docs"], r["n_tokens"], r["content_ck"])
        for r in shard_manifest(docs, N_SHARDS).collect()
    }
    assert merged == full

    # per-shard id sets on disk match a full rebuild's placement, and each
    # appended segment is internally epoch-ordered
    expected = {}
    for r in shard_positions(docs, N_SHARDS).collect():
        expected.setdefault(r["shard"], set()).add(r["doc_id"])
    for s in range(N_SHARDS):
        ids = set()
        for f in sorted(glob.glob(os.path.join(inc_path, f"shard={s}", "*.parquet"))):
            t = pq.read_table(f)
            keys = t.column("shuffle_key").to_pylist()
            assert keys == sorted(keys), (s, f)
            ids.update(t.column("doc_id").to_pylist())
        assert ids == expected.get(s, set()), s


# ---------------------------------------------------------------------------
# plan shapes — the 100-TB arguments, pinned
# ---------------------------------------------------------------------------

from web_scraper_spark.plans import audit  # noqa: E402


def test_split_assign_plan_is_scan_only(docs):
    """split membership is a pure codegen expr on the scan: NO exchange of
    any kind — the property that makes the split free at 100 TB."""
    df = split_assign(docs, FRACS).select("doc_id", "split")
    plan = audit.physical_plan(df)
    assert "Exchange" not in plan
    assert audit.codegen_stages(df) >= 1


def test_shard_manifest_plan_one_partial_agg_exchange(docs):
    """the manifest is ONE hash exchange on the shard key with a map-side
    partial aggregate below it (counts/sums/modular checksum all
    combine) — the manifest of a 100-TB corpus ships n_shards rows."""
    df = shard_manifest(docs, N_SHARDS)
    plan = audit.physical_plan(df)
    assert len(audit.hash_exchanges(df)) == 1
    assert plan.count("HashAggregate") >= 2  # partial + final
    assert not audit.has_cartesian(df)


def test_shard_positions_plan_one_exchange(docs):
    """positions cost exactly the shard writer's own shuffle: one hash
    exchange on shard, then a per-shard sort + window — nothing global."""
    df = shard_positions(docs, N_SHARDS)
    plan = audit.physical_plan(df)
    assert len(audit.hash_exchanges(df)) == 1
    assert audit.range_exchanges(df) == 0  # no global sort
    assert audit.single_partition_exchanges(df) == 0
    assert "Window" in plan


# ---------------------------------------------------------------------------
# streaming shard emission
# ---------------------------------------------------------------------------


class TestShardStream:
    def test_two_batches_match_full_rebuild_and_replay_is_idempotent(
        self, spark, tmp_path
    ):
        """shard_documents_stream over two micro-batches: the union of
        batch segments equals a full batch rebuild's placement, the
        standing manifest equals the batch manifest, every segment is
        epoch-ordered, and re-emitting a batch (foreachBatch replay after
        checkpoint recovery) leaves the output byte-identical."""
        from web_scraper_spark.streaming.shard_stream import (
            shard_documents_stream,
            standing_manifest,
        )

        docs_dir = str(tmp_path / "docs")
        shards = str(tmp_path / "shards")
        man = str(tmp_path / "man")
        ckpt = str(tmp_path / "ckpt")
        os.makedirs(docs_dir, exist_ok=True)

        def drop(lo, hi, t):
            spark.createDataFrame(
                [(i, f"tok{i} " * (3 + i % 5), t) for i in range(lo, hi)],
                "doc_id long, text string, event_time double",
            ).coalesce(1).write.mode("append").parquet(docs_dir)

        drop(0, 60, 1.0)
        shard_documents_stream(
            spark, docs_dir, shards, man, ckpt, N_SHARDS
        ).awaitTermination()
        drop(60, 100, 2.0)
        shard_documents_stream(
            spark, docs_dir, shards, man, ckpt, N_SHARDS
        ).awaitTermination()

        all_docs = spark.createDataFrame(
            [(i, f"tok{i} " * (3 + i % 5)) for i in range(100)],
            "doc_id long, text string",
        )
        want_place = {}
        for r in shard_positions(all_docs, N_SHARDS).collect():
            want_place.setdefault(r["shard"], set()).add(r["doc_id"])

        def read_placement():
            got = {}
            orderings = []
            for f in glob.glob(
                os.path.join(shards, "ingest_batch=*", "shard=*", "*.parquet")
            ):
                s = int(f.split("shard=")[1].split(os.sep)[0])
                t = pq.read_table(f)
                got.setdefault(s, set()).update(t.column("doc_id").to_pylist())
                orderings.append(t.column("shuffle_key").to_pylist())
            return got, orderings

        got_place, orderings = read_placement()
        assert got_place == want_place
        assert all(ks == sorted(ks) for ks in orderings)

        sm = {
            r["shard"]: (r["n_docs"], r["n_tokens"], r["content_ck"])
            for r in standing_manifest(spark, man).collect()
        }
        bm = {
            r["shard"]: (r["n_docs"], r["n_tokens"], r["content_ck"])
            for r in shard_manifest(all_docs, N_SHARDS).collect()
        }
        assert sm == bm

        # replay: re-fire the second batch's emit with the SAME batch id
        # (foreachBatch is at-least-once under checkpoint recovery; ids
        # are stable within a checkpoint lineage) — output must stay
        # identical, never double
        from web_scraper_spark.streaming.shard_stream import emit_shard_batch

        batch_ids = sorted(
            int(p.split("=")[1])
            for p in os.listdir(shards)
            if p.startswith("ingest_batch=")
        )
        second = spark.createDataFrame(
            [(i, f"tok{i} " * (3 + i % 5), 2.0) for i in range(60, 100)],
            "doc_id long, text string, event_time double",
        )
        emit_shard_batch(second, batch_ids[-1], shards, man, N_SHARDS)
        got2, orderings2 = read_placement()
        assert got2 == want_place
        assert all(ks == sorted(ks) for ks in orderings2)
        sm2 = {
            r["shard"]: (r["n_docs"], r["n_tokens"], r["content_ck"])
            for r in standing_manifest(spark, man).collect()
        }
        assert sm2 == bm

    def test_chained_curation_to_shards(self, spark, tmp_path):
        """The continuous-pipeline hand-off the docstrings claim: raw docs
        → curate_documents_stream → its sink dir fed DIRECTLY to
        shard_documents_stream (CURATED_STREAM_SCHEMA, text on
        masked_text). Two ingest drops flow through BOTH stages; the
        final segment placement and standing manifest equal a batch
        rebuild over the curated frame, and the second drop never
        rewrites the first drop's shipped segment files (O(delta) at the
        file level across the whole chain)."""
        import hashlib

        from web_scraper_spark.streaming.curation_stream import (
            CURATED_STREAM_SCHEMA,
            curate_documents_stream,
        )
        from web_scraper_spark.streaming.shard_stream import (
            shard_documents_stream,
            standing_manifest,
        )

        docs = str(tmp_path / "docs")
        kept = str(tmp_path / "kept")
        shards = str(tmp_path / "shards")
        man = str(tmp_path / "man")
        ck1 = str(tmp_path / "ck1")
        ck2 = str(tmp_path / "ck2")
        os.makedirs(docs, exist_ok=True)

        base = " ".join(f"w{i}" for i in range(40))
        ev = spark.createDataFrame(
            [(" ".join(f"e{i}" for i in range(1, 21)),)], "text string"
        )

        def drop(rows):
            spark.createDataFrame(
                rows, "doc_id long, text string, event_time double"
            ).coalesce(1).write.mode("append").parquet(docs)

        def run_chain():
            curate_documents_stream(
                spark, docs, kept, ck1, ev, quality_min=0.0, dup_frac_max=0.5
            ).awaitTermination()
            shard_documents_stream(
                spark, kept, shards, man, ck2, N_SHARDS,
                text_col="masked_text", schema=CURATED_STREAM_SCHEMA,
            ).awaitTermination()

        def seg_hashes():
            return {
                f: hashlib.md5(open(f, "rb").read()).hexdigest()
                for f in glob.glob(
                    os.path.join(shards, "ingest_batch=*", "shard=*", "*.parquet")
                )
            }

        drop([
            (i, base + f" uniq{i}", 1.0) for i in range(30)
        ] + [
            (100, "x " * 60, 1.0),                         # repetition drop
            (101, base + " e1 e2 e3 e4 e5 e6 e7 e8", 1.0), # contaminated
            (102, base + " uniq0", 1.0),                   # dup of 0
        ])
        run_chain()
        h1 = seg_hashes()
        assert h1  # stage 2 actually shipped segments

        drop([
            (200 + i, base + f" uniq{200 + i}", 2.0) for i in range(20)
        ] + [
            (300, base + " uniq5", 2.0),                   # cross-batch dup
        ])
        run_chain()
        h2 = seg_hashes()
        # O(delta) across the chain: every batch-1 segment file survives
        # byte-identical; the second drop only ADDED segment dirs
        assert set(h1) <= set(h2)
        assert all(h2[f] == h1[f] for f in h1)
        assert len(h2) > len(h1)

        # final placement + manifest == a batch rebuild over the curated
        # sink frame (which earlier tests pin equal to batch curation)
        curated = spark.read.schema(CURATED_STREAM_SCHEMA).parquet(kept)
        assert {r["doc_id"] for r in curated.select("doc_id").collect()} == (
            set(range(30)) | set(range(200, 220))
        )
        want = {}
        for r in shard_positions(curated, N_SHARDS).collect():
            want.setdefault(r["shard"], set()).add(r["doc_id"])
        got = {}
        for f in h2:
            s = int(f.split("shard=")[1].split(os.sep)[0])
            t = pq.read_table(f)
            got.setdefault(s, set()).update(t.column("doc_id").to_pylist())
        assert got == want
        sm = {
            r["shard"]: (r["n_docs"], r["n_tokens"], r["content_ck"])
            for r in standing_manifest(spark, man).collect()
        }
        bm = {
            r["shard"]: (r["n_docs"], r["n_tokens"], r["content_ck"])
            for r in shard_manifest(
                curated, N_SHARDS, text_col="masked_text"
            ).collect()
        }
        assert sm == bm


class TestPairShardChain:
    def test_chained_pair_curation_to_shards(self, spark, tmp_path):
        """The IMAGE twin of the chained hand-off: raw image+caption pairs
        → curate_pairs_stream → its sink dir fed DIRECTLY to
        shard_documents_stream (CURATED_PAIRS_SCHEMA, id on image_id,
        text on caption). Two ingest drops flow through BOTH stages; the
        final segment placement and standing manifest equal a batch
        rebuild over the curated frame, and the second drop never
        rewrites the first drop's shipped segment files (O(delta) at the
        file level across the whole chain)."""
        import hashlib

        import pandas as pd

        from web_scraper_spark import synth
        from web_scraper_spark.streaming.pair_stream import (
            CURATED_PAIRS_SCHEMA,
            PAIRS_STREAM_SCHEMA,
            curate_pairs_stream,
        )
        from web_scraper_spark.streaming.shard_stream import (
            shard_documents_stream,
            standing_manifest,
        )

        pairs = str(tmp_path / "pairs")
        kept = str(tmp_path / "kept")
        shards = str(tmp_path / "shards")
        man = str(tmp_path / "man")
        ck1 = str(tmp_path / "ck1")
        ck2 = str(tmp_path / "ck2")
        os.makedirs(pairs, exist_ok=True)

        def drop(ids, t):
            pdf = synth.images_pdf(pd.Series(ids), 42)
            rows = [
                (
                    r.image_id, bytearray(bytes(r.bytes)), int(r.w), int(r.h),
                    r.fmt, r.caption, int(r.phash), t,
                )
                for r in pdf.itertuples(index=False)
            ]
            spark.createDataFrame(rows, PAIRS_STREAM_SCHEMA).coalesce(
                1
            ).write.mode("append").parquet(pairs)

        def run_chain():
            curate_pairs_stream(spark, pairs, kept, ck1).awaitTermination()
            shard_documents_stream(
                spark, kept, shards, man, ck2, N_SHARDS,
                id_col="image_id", text_col="caption",
                schema=CURATED_PAIRS_SCHEMA,
            ).awaitTermination()

        def seg_hashes():
            return {
                f: hashlib.md5(open(f, "rb").read()).hexdigest()
                for f in glob.glob(
                    os.path.join(shards, "ingest_batch=*", "shard=*", "*.parquet")
                )
            }

        drop(range(48), 1.0)
        run_chain()
        h1 = seg_hashes()
        assert h1  # stage 2 actually shipped segments

        drop(range(200, 232), 2.0)
        run_chain()
        h2 = seg_hashes()
        # O(delta) across the chain: every batch-1 segment file survives
        # byte-identical; the second drop only ADDED segment dirs
        assert set(h1) <= set(h2)
        assert all(h2[f] == h1[f] for f in h1)
        assert len(h2) > len(h1)

        # final placement + manifest == a batch rebuild over the curated
        # sink frame (whose keep decisions TestStreamingPairCuration pins
        # against the batch kernels)
        curated = spark.read.schema(CURATED_PAIRS_SCHEMA).parquet(kept)
        assert curated.count() > 0
        want = {}
        for r in shard_positions(curated, N_SHARDS, id_col="image_id").collect():
            want.setdefault(r["shard"], set()).add(r["image_id"])
        got = {}
        for f in h2:
            s = int(f.split("shard=")[1].split(os.sep)[0])
            t = pq.read_table(f)
            got.setdefault(s, set()).update(t.column("image_id").to_pylist())
        assert got == want
        sm = {
            r["shard"]: (r["n_docs"], r["n_tokens"], r["content_ck"])
            for r in standing_manifest(spark, man).collect()
        }
        bm = {
            r["shard"]: (r["n_docs"], r["n_tokens"], r["content_ck"])
            for r in shard_manifest(
                curated, N_SHARDS, id_col="image_id", text_col="caption"
            ).collect()
        }
        assert sm == bm


class TestPairShardManifest:
    """sharding.pair_shard_manifest — multimodal byte-budget accounting."""

    def test_sums_and_placement_match_sequential(self, spark):
        import hashlib

        from web_scraper_spark.operators import sharding

        rows = [
            ("img-a", "two words", b"\x00" * 10),
            ("img-b", "three little words", b"\x01" * 7),
            ("img-c", "one", b"" ),
        ]
        df = spark.createDataFrame(
            rows, "image_id string, caption string, bytes binary"
        )
        got = {
            r["shard"]: (
                r["n_pairs"], r["n_caption_tokens"],
                r["n_image_bytes"], r["content_ck"],
            )
            for r in sharding.pair_shard_manifest(df, 4, salt=3).collect()
        }

        def md60(s):
            return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

        want = {}
        for iid, cap, data in rows:
            sh = md60(f"3:{iid}") % 4
            n, t, b, ck = want.get(sh, (0, 0, 0, 0))
            want[sh] = (
                n + 1,
                t + len(cap.split()),
                b + len(data),
                (ck + md60(f"{iid}:{cap}") % 1_000_000_007) % 1_000_000_007,
            )
        assert got == want

    def test_no_python_and_no_decode(self, spark):
        from web_scraper_spark.operators import sharding

        df = spark.createDataFrame(
            [("i", "c", b"x")], "image_id string, caption string, bytes binary"
        )
        plan = (
            sharding.pair_shard_manifest(df, 2)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Python" not in plan  # octet_length is codegen on the cell
