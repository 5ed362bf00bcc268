"""Crawl → page_images → images join → training pairs, end-to-end.

Validates the graft's core data product: every crawled <img> reference
joins back to the authoritative image store with byte-equal captions
(input_hint invariant), and the phash LSH dedup removes exactly the
seeded near-duplicate images."""

import pytest
from pyspark.sql import functions as F

from web_scraper_spark import synth
from web_scraper_spark.config import CrawlConfig
from web_scraper_spark.crawl import run_crawl
from web_scraper_spark.operators import pairs as pairs_ops


@pytest.fixture(scope="module")
def crawl_and_images(spark, tmp_path_factory):
    web = synth.SynthWebConfig(n_hosts=3, pages_per_host=8)
    cfg = CrawlConfig(max_pages=12, max_depth=2, horizon=6.0, num_shards=8)
    root = str(tmp_path_factory.mktemp("pairs_crawl"))
    seeds = spark.createDataFrame(
        [(r["url"], r["priority"]) for r in synth.seed_url_rows(web)], ["url", "priority"]
    )
    cat = run_crawl(spark, root, seeds, cfg, web, max_generations=20)
    images = synth.images_df(spark, web.n_images, seed=web.seed).cache()
    return cat, images


def test_pairs_join_and_caption_equality(spark, crawl_and_images):
    cat, images = crawl_and_images
    page_images = cat.read("page_images")
    assert page_images.count() > 0
    pairs = pairs_ops.image_caption_pairs(page_images, images).cache()
    n = pairs.count()
    assert n > 0
    # every crawled reference must resolve (synth graph is closed over ids)
    refs = page_images.filter(F.col("src").rlike("^/img/img-")).count()
    assert n == refs
    # input_hint invariant: alt text == stored caption, byte-equal, all rows
    assert pairs.filter(~F.col("caption_matches")).count() == 0
    assert pairs.filter(~F.col("dims_match")).count() == 0


def test_phash_dedup_drops_seeded_neardups(spark, crawl_and_images):
    _, images = crawl_and_images
    drops = {r["image_id"] for r in pairs_ops.neardup_image_ids(images, 3).collect()}
    expected = {
        f"img-{i:010d}"
        for i in range(1, images.count())
        if i % synth.NEARDUP_STRIDE == 1
    }
    # every seeded perturbed copy is caught (hamming <= 2 by construction;
    # organic collisions may add more drops, which is correct behavior)
    assert expected <= drops


def test_dedup_pairs_antijoin(spark, crawl_and_images):
    cat, images = crawl_and_images
    page_images = cat.read("page_images")
    pairs = pairs_ops.image_caption_pairs(page_images, images)
    deduped = pairs_ops.dedup_pairs(pairs, images, 3)
    drops = pairs_ops.neardup_image_ids(images, 3)
    joined = pairs.join(drops, "image_id", "left_semi").count()
    assert deduped.count() == pairs.count() - joined


def test_pair_keep_ids_both_axes_fire(spark):
    """The joint image+caption keep-set drops on EITHER axis: a phash
    near-dup with a unique caption, a caption dup with a unique image,
    and survivors untouched."""
    from web_scraper_spark import synth

    # ids 0,1 are a seeded phash near-dup pair (NEARDUP_STRIDE); give
    # every row a unique caption except two boilerplate copies on ids 4,6
    imgs = synth.images_df(spark, 8, seed=42).select("image_id", "phash", "caption")
    boiler = "the same caption twice"
    imgs = imgs.withColumn(
        "caption",
        F.when(F.col("image_id").isin("img-0000000004", "img-0000000006"),
               F.lit(boiler)).otherwise(F.col("caption")),
    )
    kept = {r["image_id"] for r in pairs_ops.pair_keep_ids(imgs).collect()}
    assert "img-0000000001" not in kept  # image near-dup of id 0
    assert "img-0000000000" in kept      # its keep-first representative
    assert "img-0000000006" not in kept  # caption dup of id 4
    assert "img-0000000004" in kept      # caption keep-first
    # survivors keep all columns
    row = pairs_ops.pair_keep_ids(imgs).filter(F.col("image_id") == "img-0000000004").collect()[0]
    assert row["caption"] == boiler and row["phash"] is not None


def test_audio_keep_ids_drops_spliced_copies(spark):
    """Audio keep-set: every seeded spliced copy (i % AUDIO_DUP_STRIDE == 1
    gain-edits two envelope windows of clip i-1) is within fingerprint
    hamming 3 of its source and gets dropped; the source survives; the
    result is stable under repartitioning."""
    from web_scraper_spark.functions import multimodal

    n = 32
    clips = synth.audio_clips_df(spark, n, seed=42)
    fps = multimodal.audio_fingerprints(clips)
    kept = {r["clip_id"] for r in pairs_ops.audio_keep_ids(fps, 3).collect()}
    dups = {f"aud-{i:08d}" for i in range(n) if i % synth.AUDIO_DUP_STRIDE == 1 and i > 0}
    srcs = {f"aud-{i - 1:08d}" for i in range(n) if i % synth.AUDIO_DUP_STRIDE == 1 and i > 0}
    assert kept & dups == set()          # every spliced copy dropped
    assert srcs <= kept                  # keep-first representatives survive
    # sequential re-derivation agrees (same kernel, no Spark)
    seq = {
        r.clip_id: multimodal.wav_fingerprint(bytes(r.bytes))
        for r in synth.audio_pdf(range(n), 42).itertuples(index=False)
    }
    dist = {r["clip_id"]: r["afp"] for r in fps.collect()}
    assert seq == dist
    again = {
        r["clip_id"]
        for r in pairs_ops.audio_keep_ids(
            multimodal.audio_fingerprints(clips.repartition(8)), 3
        ).collect()
    }
    assert again == kept


def test_pair_corpus_clean_quality_gate(spark):
    """The opt-in decode-quality stage of pair_corpus_clean: drops fire
    on real kernel values, survivors carry the stats, bytes never leave
    the composite, and the gate adds NO exchange beyond the baseline
    composite's plan."""
    import pandas as pd

    from web_scraper_spark.functions import imageops
    from web_scraper_spark.plans import audit

    n = 192
    imgs = synth.images_df(spark, n, seed=42).select(
        "image_id", "bytes", "w", "h", "fmt", "caption", "phash"
    )
    base = pairs_ops.pair_corpus_clean(imgs.drop("bytes"))
    gated = pairs_ops.pair_corpus_clean(
        imgs, min_sharp_milli=2_000_000, min_ent_milli=4_000
    )
    assert "bytes" not in gated.columns
    assert {"sharp_milli", "ent_milli"} <= set(gated.columns)
    # the gate is inline (scalar Arrow UDF): no extra shuffle family
    assert audit.count_op(gated, "Exchange") == audit.count_op(base, "Exchange")

    got = {r["image_id"]: r for r in gated.collect()}
    base_ids = {r["image_id"] for r in base.collect()}
    # sequential truth: which baseline survivors pass the quality gate
    pdf = synth.images_pdf(pd.Series(range(n)), 42)
    stats = {
        r.image_id: imageops.quality_stats(
            imageops.decode_image(bytes(r.bytes), r.fmt)
        )
        for r in pdf.itertuples(index=False)
    }
    passing = {
        i for i, s in stats.items()
        if s["sharp_milli"] >= 2_000_000 and s["ent_milli"] >= 4_000
    }
    # on THIS corpus no quality-dropped image is a dedup drop-source, so
    # the gated result is exactly a subset of the baseline (in general a
    # gate before dedup may let a near-dup of a gated-out image survive);
    # the gate provably removes at least one baseline survivor
    assert set(got) <= base_ids & passing
    assert (base_ids - passing) and not (set(got) & (base_ids - passing))
    for iid, r in got.items():
        assert r["sharp_milli"] == stats[iid]["sharp_milli"]
        assert r["ent_milli"] == stats[iid]["ent_milli"]


class TestPairKeepIncremental:
    def test_old_always_wins_even_with_smaller_new_id(self, spark):
        """Precedence: shipped pairs cannot be untrained — a new pair
        whose id sorts BEFORE the old near-dup's id still drops, on both
        the image and the caption axis."""
        old = synth.images_df(spark, 32, seed=42).select(
            "image_id", "caption", "phash"
        )
        idx = pairs_ops.pair_index(old)
        o5 = synth.images_pdf([5], 42).iloc[0]
        new = spark.createDataFrame(
            [
                ("aaa-imgdup", "a wholly new caption about something else", int(o5.phash)),
                ("aaa-capdup", o5.caption, -4242424242424242421),
                ("aaa-fresh", "one caption nobody ever wrote before now", 4611686018427387905),
            ],
            "image_id string, caption string, phash long",
        )
        kept = {
            r["image_id"]
            for r in pairs_ops.pair_keep_ids_incremental(new, idx).collect()
        }
        assert kept == {"aaa-fresh"}

    def test_equals_joint_keep_set_when_old_ids_sort_first(self, spark):
        """When every old id < every new id, the incremental result
        equals pair_keep_ids(old ∪ new) restricted to the new ids (the
        text twin's pinned property, on the joint image+caption axes)."""
        old = synth.images_df(spark, 64, seed=42).select(
            "image_id", "caption", "phash"
        )
        new = (
            synth.images_df(spark, 164, seed=42)
            .filter(F.col("image_id") >= "img-0000000100")
            .select("image_id", "caption", "phash")
        )
        inc = {
            r["image_id"]
            for r in pairs_ops.pair_keep_ids_incremental(
                new, pairs_ops.pair_index(old)
            ).collect()
        }
        joint = {
            r["image_id"]
            for r in pairs_ops.pair_keep_ids(old.unionByName(new)).collect()
        }
        new_ids = {r["image_id"] for r in new.select("image_id").collect()}
        assert inc == (joint & new_ids)
        assert inc  # non-vacuous


class TestPairAlignment:
    """simsearch.pair_alignment — the CLIP-score curation gate."""

    def _score(self, spark, rows, threshold=0.5):
        from web_scraper_spark.functions import simsearch

        df = spark.createDataFrame(
            rows, "pair_id string, image_emb array<double>, caption_emb array<double>"
        )
        out = simsearch.pair_alignment(df, threshold=threshold)
        return {r["pair_id"]: (r["alignment"], r["keep"]) for r in out.collect()}

    def test_hand_values(self, spark):
        got = self._score(
            spark,
            [
                ("identical", [1.0, 0.0], [1.0, 0.0]),     # cos 1.0
                ("orthogonal", [1.0, 0.0], [0.0, 1.0]),    # cos 0.0
                ("opposite", [1.0, 0.0], [-1.0, 0.0]),     # cos -1.0
                ("scaled", [2.0, 0.0], [0.5, 0.0]),        # norm-invariant
                ("angled", [1.0, 0.0], [1.0, 1.0]),        # cos 1/sqrt(2)
            ],
        )
        assert got["identical"] == (1.0, True)
        assert got["orthogonal"] == (0.0, False)
        assert got["opposite"] == (-1.0, False)
        assert got["scaled"] == (1.0, True)
        assert got["angled"] == (0.707107, True)

    def test_boundary_decides_on_rounded_value(self, spark):
        # raw cosine just UNDER the threshold but rounding to exactly it:
        # keep must be True because both engines compare the round(,6)
        # value (the cross-engine boundary rule)
        import math

        theta = math.acos(0.4999996)  # rounds to 0.5
        got = self._score(
            spark,
            [("boundary", [1.0, 0.0], [math.cos(theta), math.sin(theta)])],
            threshold=0.5,
        )
        assert got["boundary"] == (0.5, True)

    def test_scoring_stage_is_exchange_free(self, spark):
        """The gate itself is row-local codegen: no Exchange, no UDF
        (python worker), no join — whatever plan feeds the embedding
        columns, alignment adds zero shuffle."""
        from web_scraper_spark.functions import simsearch

        df = spark.createDataFrame(
            [("p0", [1.0, 0.0], [0.0, 1.0])],
            "pair_id string, image_emb array<double>, caption_emb array<double>",
        )
        plan = (
            simsearch.pair_alignment(df)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan
        assert "Python" not in plan  # no UDF in the scoring path


def test_pair_corpus_clean_alignment_gate(spark):
    """min_alignment drops exactly the misaligned pairs (orthogonal
    caption embedding) from the composite, before the keep-set; the
    alignment score rides on survivors and the embeddings do not."""
    base = synth.images_df(spark, 64, seed=42).select(
        "image_id", "w", "h", "fmt", "caption", "phash"
    )
    k = F.substring("image_id", 5, 10).cast("long")
    w = base.withColumn(
        "image_emb", F.array(F.lit(1.0), F.lit(0.0))
    ).withColumn(
        "caption_emb",
        F.when(k % 9 == 0, F.array(F.lit(0.0), F.lit(1.0))).otherwise(
            F.array(F.lit(1.0), F.lit(0.0))
        ),
    )
    gated = pairs_ops.pair_corpus_clean(w, min_alignment=0.9)
    plain = pairs_ops.pair_corpus_clean(base)
    got = {r["image_id"]: r["alignment"] for r in gated.collect()}
    plain_ids = {r["image_id"] for r in plain.collect()}
    misaligned = {
        r["image_id"]
        for r in base.filter(k % 9 == 0).select("image_id").collect()
    }
    assert set(got) == plain_ids - misaligned
    assert misaligned & plain_ids  # the drop path provably fired
    assert all(v == 1.0 for v in got.values())
    assert "image_emb" not in gated.columns
    assert "caption_emb" not in gated.columns


def test_pair_corpus_clean_language_gate(spark):
    """allowed_langs drops exactly the pairs whose caption identifies as
    a disallowed language, before the keep-set; caption_lang rides on the
    survivors. Injected German captions fire the drop path; the synthetic
    wordlist captions identify as 'und' (or 'en') and survive."""
    german = "der hund ist nicht gross und die katze ist klein"
    base = synth.images_df(spark, 64, seed=42).select(
        "image_id", "w", "h", "fmt", "caption", "phash"
    )
    last = F.substring("image_id", 14, 1)
    injected = base.withColumn(
        "caption", F.when(last == "7", F.lit(german)).otherwise(F.col("caption"))
    )
    gated = pairs_ops.pair_corpus_clean(injected, allowed_langs=("en", "und"))
    plain = pairs_ops.pair_corpus_clean(base)
    got = {r["image_id"]: r["caption_lang"] for r in gated.collect()}
    plain_ids = {r["image_id"] for r in plain.collect()}
    german_ids = {
        r["image_id"] for r in base.filter(last == "7").select("image_id").collect()
    }
    # NB: injection also changes caption-dedup inputs, but the german rows
    # are gone before the caption stage, so the survivor set is exactly
    # the ungated survivors minus the injected ids
    assert set(got) == plain_ids - german_ids
    assert german_ids & plain_ids  # the drop path provably fired
    assert set(got.values()) <= {"en", "und"}


def test_pair_corpus_clean_safety_gate(spark):
    """max_banned_frac drops exactly the pairs whose caption carries a
    banned term, before the keep-set; banned_frac rides on survivors."""
    banned = "photo of spamterm content right here"
    base = synth.images_df(spark, 64, seed=42).select(
        "image_id", "w", "h", "fmt", "caption", "phash"
    )
    last = F.substring("image_id", 14, 1)
    injected = base.withColumn(
        "caption", F.when(last == "9", F.lit(banned)).otherwise(F.col("caption"))
    )
    gated = pairs_ops.pair_corpus_clean(injected, max_banned_frac=0.0)
    plain = pairs_ops.pair_corpus_clean(base)
    got = {r["image_id"]: r["banned_frac"] for r in gated.collect()}
    plain_ids = {r["image_id"] for r in plain.collect()}
    banned_ids = {
        r["image_id"] for r in base.filter(last == "9").select("image_id").collect()
    }
    assert set(got) == plain_ids - banned_ids
    assert banned_ids & plain_ids  # the drop path provably fired
    assert all(v == 0.0 for v in got.values())
