"""Plan-quality gates for the dedup/similarity pair operators.

Locks in the scale-critical shapes added in round 3:

- cosine_dup_pairs: block-matrix applyInPandas — the all-pairs semantics
  must NOT appear as a cartesian/nested-loop join in the plan; the only
  wide operation is the (bi, bj) group-by exchange.
- simhash_pairs / minhash_lsh_pairs / sign_sig_pairs: the self-join input
  is persisted, so the plan reads one InMemoryRelation on both sides
  instead of duplicating the expensive kernel subtree; the joins are
  band-bucket equi-joins, never cartesian.
"""

import sys

from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from web_scraper_spark.functions import dedupops, simsearch
from web_scraper_spark.plans import audit

SF = "/root/testdata/sf0.01"


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def _emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_cosine_pairs_no_cartesian(spark):
    """All-pairs cosine compiles to replicate + one hash exchange on the
    block-pair key + applyInPandas — no CartesianProduct / BNLJ."""
    df = simsearch.cosine_dup_pairs(_emb(spark), threshold=0.35)
    assert not audit.has_cartesian(df)
    plan = audit.physical_plan(df)
    assert "FlatMapGroupsInPandas" in plan or "ArrowEvalPython" in plan


def test_cosine_pairs_matches_expression_join(spark):
    """Block-gemm output == the naive expression theta-join (values at
    round-6, same rounding both paths)."""
    e = _emb(spark).limit(200).persist()
    e.count()
    got = {
        (r.id_a, r.id_b, r.cosine)
        for r in simsearch.cosine_dup_pairs(e, threshold=0.30).collect()
    }
    a = e.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"))
    b = e.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"))
    want = {
        (r.id_a, r.id_b, r.cosine)
        for r in (
            a.join(b, F.col("id_a") < F.col("id_b"))
            .select(
                "id_a", "id_b",
                F.round(
                    simsearch.cosine_expr(
                        F.col("va").cast("array<double>"),
                        F.col("vb").cast("array<double>"),
                    ), 6,
                ).alias("cosine"),
            )
            .filter(F.col("cosine") >= 0.30)
        ).collect()
    }
    e.unpersist()
    assert got == want


def test_pair_selfjoins_reuse_cached_kernel(spark):
    """The persisted kernel frame appears as InMemoryRelation feeding both
    self-join sides — the expensive fold subtree is not duplicated."""
    for df in (
        dedupops.simhash_pairs(_docs(spark), max_hamming=3),
        dedupops.minhash_lsh_pairs(_docs(spark), threshold=0.12),
        simsearch.sign_sig_pairs(_emb(spark)),
    ):
        plan = audit.physical_plan(df)
        assert "InMemoryTableScan" in plan, plan[:500]
        assert not audit.has_cartesian(df)
    spark.catalog.clearCache()


def test_keep_set_no_cartesian_and_anti_join(spark):
    df = dedupops.dedup_keep_ids(_docs(spark), max_hamming=3)
    assert not audit.has_cartesian(df)
    assert "LeftAnti" in audit.physical_plan(df)
    spark.catalog.clearCache()
