"""Host authority for crawl prioritization — fixed-point PageRank.

A frontier scheduler wants more than FIFO-per-host: hosts that many other
hosts link to should be fetched earlier (the classic crawl-ordering
signal; the reference's priority queue takes an opaque numeric priority —
`scheduler.c` pops by score — and this operator produces that score from
the link graph itself).

Numerics are FIXED-POINT on purpose: ranks live in integer micro-units
(`scale`), every step is integer division (`DIV` / `//`) and integer
sums. Float PageRank would be irreproducible across engines — float
addition order differs between Spark partial aggregation and any SQL
oracle — while integer sums are associative, so the DuckDB twin matches
bit-for-bit and the operator stays value-oracled like everything else in
this repo. The cost is a deterministic rounding-down per step (mass
leaks ~N*k micro-units), which is irrelevant at rank precision 1e-6.

Scale shape: each of the k iterations is one equi-join (edges × ranks)
plus one partial-aggregable groupBy(dst) sum — the same shuffle family as
hash-min connected components (dedupops.connected_components), with k
fixed (not data-dependent). Skewed in-degree (every page links to the
hot host) combines map-side because the sum is a plain aggregate, never
a window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def host_authority(
    edges: DataFrame,
    k: int = 5,
    scale: int = 1_000_000,
    damping_pct: int = 85,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """k rounds of fixed-point PageRank over the distinct(src, dst) edge
    set (self-loops dropped): rank' = base + damping_pct% of the sum of
    in-neighbors' rank DIV out-degree, everything in integer micro-units.

    Returns (host, authority): every node (src or dst of any edge) with
    its final integer rank. Nodes with no in-links settle at `base`;
    dangling nodes (no out-links) simply leak their mass — the standard
    simplification, stated identically in the SQL twin. One driver-side
    count() fixes N (bounded: one long)."""
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .where(F.col(src_col) != F.col(dst_col))
        .distinct()
    )
    nodes = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    n = nodes.count()
    init = int(scale) // n
    base = ((100 - int(damping_pct)) * int(scale)) // (100 * n)

    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    e_deg = e.join(deg, "src")
    ranks = nodes.select("id", F.lit(init).cast("long").alias("rank"))
    for _ in range(int(k)):
        contribs = (
            e_deg.join(ranks.withColumnRenamed("id", "src"), "src")
            .select("dst", F.expr("rank DIV deg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        ranks = (
            nodes.join(contribs.withColumnRenamed("dst", "id"), "id", "left")
            .select(
                "id",
                (
                    F.lit(base)
                    + F.expr(f"({int(damping_pct)} * coalesce(s, 0L)) DIV 100")
                ).cast("long").alias("rank"),
            )
        )
    return ranks.select(F.col("id").alias("host"), F.col("rank").alias("authority"))


def host_authority_sql(
    edges_sql: str,
    k: int = 5,
    scale: int = 1_000_000,
    damping_pct: int = 85,
) -> str:
    """The same k unrolled fixed-point rounds as chained CTEs. edges_sql
    is a parenthesizable query yielding (src, dst). N comes from a scalar
    subquery over the node CTE, so the statement is scale-factor-free."""
    dp = int(damping_pct)
    sc = int(scale)
    parts = [
        f"e AS (SELECT DISTINCT src, dst FROM ({edges_sql}) WHERE src <> dst)",
        "nodes AS (SELECT src AS id FROM e UNION SELECT dst FROM e)",
        "deg AS (SELECT src, COUNT(*) AS deg FROM e GROUP BY src)",
        f"params AS (SELECT CAST({sc} // COUNT(*) AS BIGINT) AS init, "
        f"CAST(({100 - dp} * {sc}) // (100 * COUNT(*)) AS BIGINT) AS base "
        "FROM nodes)",
        "r0 AS (SELECT id, init AS rank FROM nodes, params)",
    ]
    for i in range(int(k)):
        parts.append(
            f"r{i + 1} AS (SELECT n.id, "
            f"p.base + ({dp} * COALESCE(SUM(r.rank // d.deg), 0)) // 100 AS rank "
            f"FROM nodes n CROSS JOIN params p "
            f"LEFT JOIN e ON e.dst = n.id "
            f"LEFT JOIN deg d ON d.src = e.src "
            f"LEFT JOIN r{i} r ON r.id = e.src "
            f"GROUP BY n.id, p.base)"
        )
    ctes = ",\n      ".join(parts)
    return f"""
      WITH {ctes}
      SELECT id AS host, CAST(rank AS BIGINT) AS authority FROM r{int(k)}
    """
