"""Similarity search over embedding columns (array<float>).

The ANN surface of the training-data pipeline, over the ``embeddings``
table (vec_id, embedding: array<float>, label):

- ``cosine_expr``     — native cosine similarity via zip_with + aggregate
                        (JVM higher-order functions; no Python, no UDF);
                        DuckDB oracle: list_cosine_similarity.
- ``brute_topk``      — exact top-k neighbors per query vector: broadcast
                        the (small) query set against the corpus, window
                        rank. The correctness baseline.
- ``cosine_dup_pairs``— embedding near-duplicate join: all pairs with
                        cosine >= threshold (corpus self-join; exact).
- ``lsh_topk``        — scale path: random-hyperplane LSH (deterministic
                        md5-seeded planes) buckets the corpus; each query
                        probes only its bucket (+ multiprobe neighbors at
                        hamming 1), then exact-ranks within candidates.
                        Recall < 1 by construction — benchmarked, and the
                        planes are seeded so results are reproducible.

At 10^10-vector scale: brute_topk is one broadcast + one shuffle-free
scan + per-query top-k (fine for few queries); the self-join pair ops and
high-QPS serving go through the LSH bucket equi-join, never a cartesian.
"""

from __future__ import annotations

import hashlib

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# --------------------------------------------------------------------------
# native cosine
# --------------------------------------------------------------------------


def dot_expr(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm_expr(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_expr(a: Column, b: Column) -> Column:
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def cosine_sql(a: str, b: str) -> str:
    """DuckDB equivalent; round both sides when comparing (float assoc)."""
    return f"list_cosine_similarity({a}, {b})"


# --------------------------------------------------------------------------
# exact brute-force top-k
# --------------------------------------------------------------------------


def brute_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
) -> DataFrame:
    """(q_id, vec_id, cosine, rank) — exact top-k per query.

    queries is broadcast (small); the corpus is scanned once with the
    cosine evaluated JVM-side; rank via window per query. Ties broken by
    vec_id asc for determinism.
    """
    j = corpus.crossJoin(F.broadcast(queries))
    scored = j.select(
        F.col(q_id_col),
        F.col(id_col),
        F.round(cosine_expr(F.col(vec_col), F.col(q_vec_col)), 6).alias("cosine"),
    )
    w = Window.partitionBy(q_id_col).orderBy(F.desc("cosine"), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def cosine_dup_pairs(
    corpus: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding near-dup pairs (a < b, cosine >= threshold). Exact
    self-join — the LSH variant below is the scale path."""
    a = corpus.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = corpus.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(cosine_expr(F.col("va"), F.col("vb")), 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


# --------------------------------------------------------------------------
# LSH (random hyperplanes, deterministic)
# --------------------------------------------------------------------------


def _planes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic hyperplanes: md5-seeded standard normals."""
    out = []
    for p in range(n_planes):
        h = hashlib.md5(f"plane|{seed}|{p}".encode()).digest()
        rng = np.random.Generator(np.random.PCG64(int.from_bytes(h[:8], "big")))
        out.append([float(x) for x in rng.standard_normal(dim)])
    return out


def lsh_bucket_expr(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-bit bucket id: bit p = 1 iff dot(vec, plane_p) > 0."""
    bits = []
    for p, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(x) for x in plane])
        bits.append(F.when(dot_expr(vec, lit_plane) > 0, F.lit(1 << p)).otherwise(F.lit(0)))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("int")


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_planes: int = 6,
    dim: int = 64,
    multiprobe: bool = True,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: bucket equi-join on the hyperplane signature.

    multiprobe=True also probes every bucket at hamming distance 1 from the
    query's bucket (n_planes+1 probes), trading join fan-out for recall.
    """
    planes = _planes(dim, n_planes, seed)
    c = corpus.select(
        F.col(id_col), F.col(vec_col), lsh_bucket_expr(F.col(vec_col), planes).alias("bucket")
    )
    q = queries.select(
        F.col(q_id_col), F.col(q_vec_col), lsh_bucket_expr(F.col(q_vec_col), planes).alias("qb")
    )
    if multiprobe:
        probes = F.array(
            F.col("qb"), *[F.col("qb").bitwiseXOR(F.lit(1 << p)) for p in range(n_planes)]
        )
        q = q.select(q_id_col, q_vec_col, F.explode(probes).alias("bucket"))
    else:
        q = q.withColumnRenamed("qb", "bucket")
    j = c.join(F.broadcast(q), "bucket")
    scored = j.select(
        F.col(q_id_col),
        F.col(id_col),
        F.round(cosine_expr(F.col(vec_col), F.col(q_vec_col)), 6).alias("cosine"),
    ).dropDuplicates([q_id_col, id_col])
    w = Window.partitionBy(q_id_col).orderBy(F.desc("cosine"), F.col(id_col).asc())
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
