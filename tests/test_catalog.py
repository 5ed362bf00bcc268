"""Snapshot catalog: atomicity, append-only deltas, lineage, time travel.

The MULTI/EXEC analog (redis_helper.c:235-253) as table commits: staged
writes are invisible until the CURRENT swap; appends are O(delta); every
snapshot is readable forever by id."""

import json
import os

import pytest
from pyspark.sql import functions as F

from web_scraper_spark.catalog import Catalog


@pytest.fixture()
def cat(spark, tmp_path):
    return Catalog(spark, str(tmp_path / "cat"))


def df_of(spark, n, tag=""):
    return spark.range(n).select(
        F.col("id"), F.concat(F.lit(tag), F.col("id").cast("string")).alias("v")
    )


class TestCommit:
    def test_staged_invisible_until_commit(self, spark, cat):
        cat.stage("t", df_of(spark, 5))
        assert cat.current_snapshot() is None
        assert cat.read("t") is None
        cat.commit(generation=0, t0=0.0)
        assert cat.read("t").count() == 5

    def test_abort_discards(self, spark, cat):
        cat.stage("t", df_of(spark, 5))
        cat.commit(generation=0, t0=0.0)
        cat.stage("t", df_of(spark, 99))
        cat.abort()
        cat.stage_keep("t", cat.current_snapshot())
        cat.commit(generation=1, t0=1.0)
        assert cat.read("t").count() == 5

    def test_crash_between_stage_and_commit_is_invisible(self, spark, cat):
        cat.stage("t", df_of(spark, 5))
        cat.commit(generation=0, t0=0.0)
        # simulate a crash: stage a new version, never commit, "restart"
        cat.stage("t", df_of(spark, 50))
        cat2 = Catalog(spark, cat.root)
        assert cat2.read("t").count() == 5  # uncommitted files not referenced


class TestAppend:
    def test_append_is_delta_only(self, spark, cat):
        cat.stage("t", df_of(spark, 10, "a"))
        s0 = cat.commit(generation=0, t0=0.0)
        n_files_0 = len(s0.tables["t"]["files"])
        cat.stage_append("t", df_of(spark, 3, "b"), s0)
        s1 = cat.commit(generation=1, t0=1.0)
        assert cat.read("t").count() == 13
        # parent files are reused verbatim, only the delta is new
        f0 = {f["path"] for f in s0.tables["t"]["files"]}
        f1 = {f["path"] for f in s1.tables["t"]["files"]}
        assert f0 <= f1
        assert len(f1) > len(f0)
        assert n_files_0 == len(f0)

    def test_lineage_rowcounts(self, spark, cat):
        cat.stage("t", df_of(spark, 10))
        snap = cat.commit(generation=0, t0=0.0)
        entry = snap.tables["t"]
        assert entry["rows"] == 10
        assert sum(f["rows"] for f in entry["files"]) == 10
        assert all(f["bytes"] > 0 for f in entry["files"])


class TestTimeTravel:
    def test_read_old_snapshot(self, spark, cat):
        cat.stage("t", df_of(spark, 10))
        s0 = cat.commit(generation=0, t0=0.0)
        cat.stage_append("t", df_of(spark, 5), s0)
        cat.commit(generation=1, t0=1.0)
        assert cat.read("t").count() == 15
        assert cat.read("t", cat.snapshot(s0.snapshot_id)).count() == 10

    def test_parent_chain_and_metrics(self, spark, cat):
        cat.stage("t", df_of(spark, 1))
        s0 = cat.commit(generation=0, t0=0.0, metrics={"urls_processed": 1})
        cat.stage_keep("t", s0)
        s1 = cat.commit(generation=1, t0=9.5, metrics={"urls_processed": 3})
        assert s1.parent_id == s0.snapshot_id
        assert cat.snapshot(s0.snapshot_id).metrics["urls_processed"] == 1
        assert s1.t0 == 9.5

    def test_manifest_is_valid_json_on_disk(self, spark, cat):
        cat.stage("t", df_of(spark, 2))
        s0 = cat.commit(generation=0, t0=0.0)
        path = os.path.join(cat.root, "_manifests", f"s{s0.snapshot_id:06d}.json")
        with open(path) as f:
            d = json.load(f)
        assert d["tables"]["t"]["rows"] == 2


class TestMaintenance:
    def test_compact_reduces_files_preserves_rows(self, spark, cat):
        cat.stage("t", df_of(spark, 10, "a"), partitions=4)
        s = cat.commit(generation=0, t0=0.0)
        for g in range(1, 5):
            cat.stage_append("t", df_of(spark, 5, f"g{g}"), partitions=2)
            s = cat.commit(generation=g, t0=float(g))
        n_files_before = len(s.tables["t"]["files"])
        rows_before = sorted(map(tuple, cat.read("t").collect()))
        cat.compact("t", partitions=2)
        s2 = cat.commit(generation=99, t0=99.0)
        assert len(s2.tables["t"]["files"]) < n_files_before
        assert sorted(map(tuple, cat.read("t").collect())) == rows_before
        # time travel to the pre-compaction snapshot still works
        assert cat.read("t", cat.snapshot(s.snapshot_id)).count() == 30

    def test_expire_snapshots_gc(self, spark, cat):
        import os

        cat.stage("t", df_of(spark, 10), partitions=2)
        s0 = cat.commit(generation=0, t0=0.0)
        cat.stage("t", df_of(spark, 20), partitions=2)  # overwrite → s0 orphaned
        cat.commit(generation=1, t0=1.0)
        stats = cat.expire_snapshots(keep_last=1)
        assert stats["snapshots_removed"] >= 1
        assert stats["files_removed"] >= 1
        assert cat.read("t").count() == 20  # live data untouched
        assert not os.path.exists(
            os.path.join(cat._manifest_dir, f"s{s0.snapshot_id:06d}.json")
        )
