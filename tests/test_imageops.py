"""Image payload invariants (BASELINE.json input_hint / FIXTURES.md §1):

- lossless round-trip (ppm, png): decode(encode(px)) == px exactly;
- lossy qdct: PSNR >= 40 dB;
- phash: recompute matches stored column; near-dup rows hamming <= 2..8;
- caption byte-equality through the Spark table;
- LSH band join finds every pair with hamming <= 3 (no cartesian).
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from web_scraper_spark import synth
from web_scraper_spark.functions import imageops, multimodal


def px(i, seed=42):
    return synth.gen_pixels(i, seed)


class TestCodecs:
    @pytest.mark.parametrize("i", [0, 3, 17])
    def test_ppm_roundtrip(self, i):
        a = px(i)
        assert np.array_equal(imageops.decode_ppm(imageops.encode_ppm(a)), a)

    @pytest.mark.parametrize("i", [1, 5, 23])
    def test_png_roundtrip(self, i):
        a = px(i)
        assert np.array_equal(imageops.decode_png(imageops.encode_png(a)), a)

    @pytest.mark.parametrize("i", [2, 7, 31])
    def test_qdct_psnr_over_40(self, i):
        a = px(i)
        b = imageops.decode_qdct(imageops.encode_qdct(a))
        assert imageops.psnr(a, b) >= 40.0

    def test_phash_deterministic_and_distinct(self):
        h0 = imageops.phash64(px(0))
        assert h0 == imageops.phash64(px(0))
        others = [imageops.phash64(px(i)) for i in range(1, 12)]
        assert all(imageops.hamming64(h0, o) > 4 for o in others)


class TestImagesTable:
    @pytest.fixture(scope="class")
    def images(self, spark):
        return synth.images_df(spark, 220, seed=42, partitions=4).cache()

    def test_schema_matches_input_hint(self, images):
        assert [ (f.name, f.dataType.simpleString()) for f in images.schema.fields ] == [
            ("image_id", "string"), ("bytes", "binary"), ("w", "int"), ("h", "int"),
            ("fmt", "string"), ("caption", "string"), ("phash", "bigint"),
        ]

    def test_decode_invariants_via_features(self, images):
        feats = multimodal.image_features(images).withColumnRenamed("phash", "phash_re")
        j = images.join(feats, "image_id")
        bad = j.filter(
            (~F.col("decode_ok"))
            | (F.col("dec_w") != F.col("w"))
            | (F.col("dec_h") != F.col("h"))
            | (F.col("phash") != F.col("phash_re"))
        )
        # recomputed phash must equal the stored column on every row
        assert bad.count() == 0

    def test_caption_equality(self, images):
        rows = images.select("image_id", "caption").collect()
        for r in rows[:50]:
            i = int(r["image_id"].split("-")[1])
            assert r["caption"] == synth.caption_for(i, 42)

    def test_neardup_rows_close_in_phash(self, images):
        """i % 101 == 1 rows are perturbed copies of i-1 (FIXTURES.md §1)."""
        rows = {r["image_id"]: r["phash"] for r in images.select("image_id", "phash").collect()}
        found = 0
        for i in range(1, 220):
            if i % synth.NEARDUP_STRIDE == 1:
                a = rows[f"img-{i:010d}"]
                b = rows[f"img-{i - 1:010d}"]
                assert imageops.hamming64(a, b) <= 8
                found += 1
        assert found >= 2

    def test_lsh_band_join_finds_neardups(self, spark, images):
        """phash near-dup pruning (J6): band equi-join + hamming filter
        finds exactly the pairs a brute-force scan finds at t <= 3."""
        ph = images.select("image_id", "phash")
        bands = ph.select(
            "image_id",
            "phash",
            F.explode(
                F.array(*[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftrightunsigned("phash", b * 16).bitwiseAND(F.lit(0xFFFF)).alias("bv"),
                    )
                    for b in range(4)
                ])
            ).alias("bb"),
        ).select("image_id", "phash", "bb.band", "bb.bv")
        a = bands.select(F.col("image_id").alias("ia"), F.col("phash").alias("pa"), "band", "bv")
        b = bands.select(F.col("image_id").alias("ib"), F.col("phash").alias("pb"), "band", "bv")
        got = {
            (r["ia"], r["ib"])
            for r in (
                a.join(b, ["band", "bv"])
                .filter(F.col("ia") < F.col("ib"))
                .withColumn("d", F.bit_count(F.col("pa").bitwiseXOR(F.col("pb"))))
                .filter(F.col("d") <= 3)
                .select("ia", "ib")
                .dropDuplicates()
                .collect()
            )
        }
        rows = images.select("image_id", "phash").collect()
        brute = {
            (x["image_id"], y["image_id"])
            for xi, x in enumerate(rows)
            for y in rows[xi + 1 :]
            if imageops.hamming64(x["phash"], y["phash"]) <= 3
        }
        brute = {(min(p), max(p)) for p in brute}
        assert got == brute

    def test_resize_plumbing(self, images):
        out = multimodal.resize_images(images.limit(20), size=16)
        rows = out.collect()
        assert all(r["w"] == 16 and r["h"] == 16 for r in rows)
        arr = imageops.decode_ppm(bytes(rows[0]["bytes"]))
        assert arr.shape == (16, 16, 3)


class TestAudioVideoStubs:
    """The audio/video decode steps are DISCLOSED stubs (no codec libs in
    the sandbox — multimodal.py); these tests pin the Spark-side contract
    that IS real: output schema, mapInPandas batching, explode fan-out,
    determinism under repartitioning, and the strict=True production
    posture (raise instead of fake)."""

    def clips(self, spark, n=32):
        return spark.range(0, n).select(
            F.concat(F.lit("clip"), F.col("id").cast("string")).alias("clip_id"),
            F.unhex(F.md5(F.col("id").cast("string"))).alias("bytes"),
        )

    def test_audio_schema_and_determinism(self, spark):
        c = self.clips(spark)
        out = multimodal.audio_features(c)
        assert out.schema == multimodal.AUDIO_FEATURES_SCHEMA
        r1 = {r["clip_id"]: (r["duration_s"], r["rms"], r["sample_rate"]) for r in out.collect()}
        r2 = {
            r["clip_id"]: (r["duration_s"], r["rms"], r["sample_rate"])
            for r in multimodal.audio_features(c.repartition(8)).collect()
        }
        assert r1 == r2 and len(r1) == 32
        assert all(0 <= d < 30 and 0 <= q < 1 for d, q, _ in r1.values())

    def test_video_explode_shape(self, spark):
        c = self.clips(spark)
        out = multimodal.video_frame_sample(c, every_n=10)
        assert out.schema == multimodal.VIDEO_FRAMES_SCHEMA
        rows = out.collect()
        per = {}
        for r in rows:
            per.setdefault(r["clip_id"], []).append(r["frame_idx"])
        assert set(per) == {f"clip{i}" for i in range(32)}
        for idxs in per.values():
            # frame indices are the every_n grid over 30..299 frames
            assert sorted(idxs) == list(range(0, max(idxs) + 1, 10))
            assert 3 <= len(idxs) <= 30
        # deterministic under partitioning
        again = multimodal.video_frame_sample(c.repartition(8), every_n=10)
        assert {(r["clip_id"], r["frame_idx"], r["frame_phash"]) for r in again.collect()} == {
            (r["clip_id"], r["frame_idx"], r["frame_phash"]) for r in rows
        }

    def test_strict_raises(self, spark):
        c = self.clips(spark, n=4)
        with pytest.raises(Exception, match="NotImplementedError|soundfile|ffmpeg"):
            multimodal.audio_features(c, strict=True).collect()
        with pytest.raises(Exception, match="NotImplementedError|pyav|ffmpeg"):
            multimodal.video_frame_sample(c, strict=True).collect()


def test_batch_buckets_hand_values(spark):
    """Aspect + resolution classes on hand-picked dims, both engines'
    CASE arithmetic being pure integer comparisons."""
    from web_scraper_spark.functions.imageops import (
        aspect_bucket_expr,
        area_bucket_expr,
    )

    rows = [
        (1, 128, 64),   # 2.0 → wide, 8192 px → res 64
        (2, 16, 64),    # 0.25 → tall, 1024 px → res 32
        (3, 64, 64),    # square, 4096 px → res 64
        (4, 128, 96),   # 4/3 exactly → square (boundary not-strict)
        (5, 96, 128),   # 3/4 exactly → square
        (6, 16, 16),    # below every rung but the smallest
        (7, 128, 128),  # top rung
    ]
    df = spark.createDataFrame(rows, "image_id long, w int, h int")
    got = {
        r["image_id"]: (r["ar"], r["res"])
        for r in df.select(
            "image_id",
            aspect_bucket_expr(F.col("w"), F.col("h")).alias("ar"),
            area_bucket_expr(F.col("w"), F.col("h")).alias("res"),
        ).collect()
    }
    assert got == {
        1: ("wide", 64),
        2: ("tall", 32),
        3: ("square", 64),
        4: ("square", 64),
        5: ("square", 64),
        6: ("square", 16),
        7: ("square", 128),
    }


class TestImageQuality:
    """The decode-side quality gate (multimodal.image_quality /
    imageops.quality_stats): hand-value kernel pins, distributed ==
    sequential, quarantine path, threshold semantics, and the plan shape
    (one Arrow stage, keep as a post-stage codegen boolean, no Exchange)."""

    def test_kernel_hand_values(self):
        flat = np.full((16, 16, 3), 128, np.uint8)
        s = imageops.quality_stats(flat)
        assert s == {
            "sharp_milli": 0, "ent_milli": 0,
            "mean_milli": 128000, "std_milli": 0,
        }
        cb = np.zeros((16, 16, 3), np.uint8)
        cb[::2, ::2] = 255
        cb[1::2, 1::2] = 255
        s = imageops.quality_stats(cb)
        # two equal histogram bins -> exactly 1 bit of entropy
        assert s["ent_milli"] == 1000
        assert s["sharp_milli"] > 10_000_000  # extreme high-frequency energy
        assert s["mean_milli"] == 127500 and s["std_milli"] == 127500

    def test_kernel_no_interior_is_sharpness_zero(self):
        tiny = np.random.default_rng(7).integers(
            0, 255, (2, 2, 3)
        ).astype(np.uint8)
        assert imageops.quality_stats(tiny)["sharp_milli"] == 0

    def test_distributed_equals_sequential(self, spark):
        import pandas as pd

        imgs = synth.images_df(spark, 64, seed=42, partitions=4)
        got = {
            r["image_id"]: (
                r["sharp_milli"], r["ent_milli"], r["mean_milli"],
                r["std_milli"], r["decode_ok"], r["keep"],
            )
            for r in multimodal.image_quality(imgs).collect()
        }
        pdf = synth.images_pdf(pd.Series(range(64)), 42)
        for r in pdf.itertuples(index=False):
            s = imageops.quality_stats(
                imageops.decode_image(bytes(r.bytes), r.fmt)
            )
            keep = s["sharp_milli"] >= 2_000_000 and s["ent_milli"] >= 4_000
            assert got[r.image_id] == (
                s["sharp_milli"], s["ent_milli"], s["mean_milli"],
                s["std_milli"], True, keep,
            ), r.image_id

    def test_quarantine_and_thresholds(self, spark):
        flat = np.full((16, 16, 3), 128, np.uint8)
        rows = [
            ("ok-ish", imageops.encode_ppm(px(0)), "ppm"),
            ("flat", imageops.encode_ppm(flat), "ppm"),
            ("bad", b"\x00garbage", "jpeg"),
            ("none", None, "ppm"),
        ]
        df = spark.createDataFrame(rows, "image_id string, bytes binary, fmt string")
        got = {r["image_id"]: r for r in multimodal.image_quality(df).collect()}
        assert got["flat"]["decode_ok"] and not got["flat"]["keep"]
        assert got["flat"]["sharp_milli"] == 0 and got["flat"]["ent_milli"] == 0
        for quarantined in ("bad", "none"):
            r = got[quarantined]
            assert not r["decode_ok"] and not r["keep"]
            assert r["sharp_milli"] is None and r["ent_milli"] is None
        # the synthetic corpus image passes both thresholds
        assert got["ok-ish"]["keep"]

    def test_plan_one_arrow_stage_no_exchange(self, spark):
        from web_scraper_spark.plans import audit

        imgs = synth.images_df(spark, 32, seed=42, partitions=2)
        out = multimodal.image_quality(imgs)
        # decode runs in mapInPandas stages only (synth gen + quality);
        # keep never forces a shuffle or an extra Python pass
        assert audit.count_op(out, "MapInPandas") == 2
        assert audit.count_op(out, "Exchange") == 0


class TestResizeToBuckets:
    """multimodal.resize_to_buckets — per-bucket batch-shape normalizer."""

    def test_every_output_matches_its_bucket_shape(self, spark):
        from web_scraper_spark import synth
        from web_scraper_spark.functions import imageops, multimodal

        imgs = synth.images_df(spark, 96, seed=42)
        meta = {
            r["image_id"]: (r["w"], r["h"])
            for r in imgs.select("image_id", "w", "h").collect()
        }
        out = multimodal.resize_to_buckets(imgs).collect()
        assert len(out) == 96
        seen_keys = set()
        for r in out:
            w0, h0 = meta[r["image_id"]]
            tw, th = imageops.bucket_target_dims(w0, h0)
            assert (r["w"], r["h"]) == (tw, th)
            ar = "wide" if tw > th else ("tall" if th > tw else "square")
            assert r["batch_key"] == f"{ar}_{min(tw, th)}"
            seen_keys.add(r["batch_key"])
            # the bytes really are a th×tw ppm
            arr = imageops.decode_image(bytes(r["bytes"]), "ppm")
            assert arr.shape == (th, tw, 3)
        assert len(seen_keys) > 1  # synth corpus spans several buckets

    def test_target_dims_hand_cases(self):
        from web_scraper_spark.functions import imageops

        assert imageops.bucket_target_dims(64, 64) == (64, 64)      # square
        assert imageops.bucket_target_dims(100, 20) == (64, 32)     # wide: area 2000 → s=32
        assert imageops.bucket_target_dims(20, 100) == (32, 64)     # tall: area 2000 → s=32
        assert imageops.bucket_target_dims(4, 3) == (16, 16)        # boundary: 4/3 is square
        assert imageops.bucket_target_dims(3, 4) == (16, 16)        # boundary: 3/4 is square

    def test_single_arrow_stage(self, spark):
        from web_scraper_spark import synth
        from web_scraper_spark.functions import multimodal

        imgs = synth.images_df(spark, 8, seed=42)
        plan = (
            multimodal.resize_to_buckets(imgs)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        # exactly ONE python/Arrow stage beyond the synth generator's own
        assert plan.count("MapInPandas") <= 2
        assert "Exchange" not in plan


class TestAugmentImages:
    """multimodal.augment_images — seeded per-epoch flip/crop augmentation."""

    def test_epoch_replay_is_byte_identical(self, spark):
        from web_scraper_spark import synth
        from web_scraper_spark.functions import multimodal

        imgs = synth.images_df(spark, 48, seed=42)
        a = {r["image_id"]: bytes(r["bytes"])
             for r in multimodal.augment_images(imgs, epoch=2, size=16).collect()}
        b = {r["image_id"]: bytes(r["bytes"])
             for r in multimodal.augment_images(imgs, epoch=2, size=16).collect()}
        assert a == b and len(a) == 48  # no RNG state anywhere

    def test_epochs_vary_the_variant_mix(self, spark):
        from web_scraper_spark import synth
        from web_scraper_spark.functions import multimodal

        imgs = synth.images_df(spark, 48, seed=42)
        e1 = {r["image_id"]: (r["flip"], r["crop"])
              for r in multimodal.augment_images(imgs, epoch=1, size=16).collect()}
        e2 = {r["image_id"]: (r["flip"], r["crop"])
              for r in multimodal.augment_images(imgs, epoch=2, size=16).collect()}
        assert any(e1[k] != e2[k] for k in e1)  # a new epoch reseeds choices
        # and the choice is the documented md5-60 rule, not an opaque seed
        import hashlib
        for iid, (fl, cr) in e1.items():
            h = int(hashlib.md5(f"{iid}:1".encode()).hexdigest()[:15], 16)
            assert (fl, cr) == (h % 2 == 1, (h >> 1) % 2 == 1)

    def test_flip_crop_pixels_match_sequential_twin(self, spark):
        import numpy as np

        from web_scraper_spark import synth
        from web_scraper_spark.functions import imageops, multimodal

        imgs = synth.images_df(spark, 24, seed=7)
        src = {r["image_id"]: (bytes(r["bytes"]), r["fmt"])
               for r in imgs.collect()}
        for r in multimodal.augment_images(imgs, epoch=3, size=16).collect():
            data, fmt = src[r["image_id"]]
            arr = imageops.decode_image(data, fmt)
            if r["flip"]:
                arr = arr[:, ::-1, :]
            if r["crop"]:
                hh, ww, _ = arr.shape
                arr = arr[hh // 8: hh - hh // 8, ww // 8: ww - ww // 8]
            want = imageops.encode_ppm(
                multimodal._area_resize(np.ascontiguousarray(arr), 16)
            )
            assert bytes(r["bytes"]) == want

    def test_crop_is_noop_below_8px(self, spark):
        import numpy as np

        from web_scraper_spark.functions import imageops, multimodal

        arr = (np.arange(7 * 7 * 3) % 251).astype(np.uint8).reshape(7, 7, 3)
        rows = [("tiny", imageops.encode_ppm(arr), "ppm")]
        df = spark.createDataFrame(rows, "image_id string, bytes binary, fmt string")
        out = multimodal.augment_images(df, epoch=1, size=4).collect()[0]
        # margin floor(7/8)=0 -> crop bit may be set but must not change pixels
        base = arr[:, ::-1, :] if out["flip"] else arr
        want = imageops.encode_ppm(multimodal._area_resize(np.ascontiguousarray(base), 4))
        assert bytes(out["bytes"]) == want
