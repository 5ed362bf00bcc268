"""host_authority: fixed-point PageRank — integer arithmetic must match a
sequential reference exactly (that exactness is the whole design), ranks
must order hubs above leaves, and the plan must stay join+agg (no window,
no cartesian)."""

from pyspark.sql import functions as F

from web_scraper_spark.operators.authority import host_authority
from web_scraper_spark.plans import audit


def ref_authority(edges, k=5, scale=1_000_000, dp=85):
    """Sequential fixed-point reference."""
    E = sorted({(s, d) for s, d in edges if s != d})
    nodes = sorted({x for e in E for x in e})
    n = len(nodes)
    deg = {}
    for s, _ in E:
        deg[s] = deg.get(s, 0) + 1
    init = scale // n
    base = ((100 - dp) * scale) // (100 * n)
    r = {x: init for x in nodes}
    for _ in range(k):
        acc = {}
        for s, d in E:
            acc[d] = acc.get(d, 0) + r[s] // deg[s]
        r = {x: base + (dp * acc.get(x, 0)) // 100 for x in nodes}
    return r


def test_hub_graph_exact_and_ordered(spark):
    # star + chain + a node with no in-links: hub 0 gets everyone's mass
    edges = [(i, 0) for i in range(1, 8)] + [(0, 1), (1, 2), (9, 0)]
    df = spark.createDataFrame(edges, "src long, dst long")
    out = host_authority(df, k=5)
    got = {r["host"]: r["authority"] for r in out.collect()}
    assert got == ref_authority(edges)
    # no-in-link nodes (3..7, 9) all settle at exactly base; mass
    # concentrates downstream of the hub (0 → 1 funnels everything)
    base = ((100 - 85) * 1_000_000) // (100 * len(got))
    assert all(got[x] == base for x in (3, 4, 5, 6, 7, 9))
    assert got[0] > 10 * base and got[1] == max(got.values())


def test_duplicate_edges_and_self_loops_ignored(spark):
    edges = [(1, 2), (1, 2), (2, 2), (2, 1)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["host"]: r["authority"] for r in host_authority(df, k=3).collect()}
    assert got == ref_authority(edges, k=3)
    assert set(got) == {1, 2}


def test_plan_join_agg_only(spark):
    edges = [(i % 7, (i * 3) % 7) for i in range(30)]
    df = spark.createDataFrame(edges, "src long, dst long")
    out = host_authority(df, k=3)
    plan = audit.physical_plan(out)
    assert "Window" not in plan
    assert not audit.has_cartesian(out)
