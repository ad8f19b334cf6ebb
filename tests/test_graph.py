"""PageRank: exact agreement with a pure-Python integer replay, known
structural orderings, and layout independence."""

from pyspark.sql import functions as F

from data_lake_for_e_commerce_analytics_spark.operators import graph, urls


def _py_pagerank(edges, iters=3, damping=85, scale=1_000_000):
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    outdeg = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    pr = {n: scale for n in nodes}
    base = scale * (100 - damping) // 100
    for _ in range(iters):
        s = {n: 0 for n in nodes}
        for u, v in edges:
            s[v] += pr[u] // outdeg[u]
        pr = {n: base + (damping * s[n]) // 100 for n in nodes}
    return pr


def test_pagerank_matches_python_replay(spark):
    edges = [
        ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
        ("d", "c"), ("d", "c"),  # duplicate edge == weight 2
    ]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r["node"]: r["pr"] for r in graph.pagerank(df, iters=3).collect()}
    assert got == _py_pagerank(edges)


def test_pagerank_cycle_is_uniform_and_star_center_wins(spark):
    cyc = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a")], "src string, dst string"
    )
    prs = {r["node"]: r["pr"] for r in graph.pagerank(cyc, iters=5).collect()}
    assert len(set(prs.values())) == 1  # symmetric cycle -> equal ranks
    star = spark.createDataFrame(
        [("a", "hub"), ("b", "hub"), ("c", "hub"), ("hub", "a")],
        "src string, dst string",
    )
    sprs = {r["node"]: r["pr"] for r in graph.pagerank(star, iters=3).collect()}
    assert sprs["hub"] == max(sprs.values())
    assert sprs["hub"] > sprs["b"]


def test_host_authority_layout_independent(spark, tables):
    u = urls.synth_urls(tables["documents"])
    a = graph.host_authority(u, iters=2).collect()
    b = graph.host_authority(
        urls.synth_urls(tables["documents"].repartition(17)), iters=2
    ).collect()
    assert a == b
    assert all(r["pr"] > 0 for r in a)
