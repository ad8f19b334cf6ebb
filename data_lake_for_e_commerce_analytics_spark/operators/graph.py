"""Graph operators for corpus curation: PageRank-style authority
scoring over a link graph. Crawl pipelines rank hosts/domains by link
authority (CommonCrawl publishes harmonic-centrality/PageRank domain
ranks; RefinedWeb-style curation consumes them as a quality prior), and
this is the canonical iterative-join workload on Spark.

Exact-parity variant (the repo's oracle rule): ranks live in integer
MICRO-UNITS (1.0 == `scale`), per-edge contributions are integer
floor-division shares, and the damping update is integer percent
arithmetic — so iteration results are identical on any ANSI engine and
independent of partition layout / summation order (sums of int64 are
exact). Dangling-node mass is dropped (the standard simplification;
normalizing it back adds one scalar broadcast per round and does not
change the ranking).

Design for 100 TB:
- Each iteration is {equi-join edges ⋈ ranks on src, partial-agg
  groupBy dst} — two shuffles keyed on node ids, the textbook
  distributed PageRank shape. No driver-side state: the rank relation
  stays distributed; `iters` rounds unroll into one logical plan like
  `similarity.kmeans_assign`.
- For web-scale graphs pre-partition `edges` and the rank relation on
  the node key (bucketing) so every round's join is co-located and only
  the groupBy exchanges data. Skewed in-degree (everybody links to
  google.com) is partial-agg-combined map-side before the shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    iters: int = 3,
    damping_pct: int = 85,
    scale: int = 1_000_000,
) -> DataFrame:
    """Integer-exact PageRank over an (src, dst) edge relation.

    Returns (node, pr) with pr in micro-units (initial rank
    ``scale`` == 1.0 per node). Update per round:
    ``pr'(v) = scale*(100-d)//100  +  d * sum_{u->v}(pr(u) // outdeg(u)) // 100``.
    Duplicate (src, dst) rows act as weighted edges (each contributes a
    share), which is exactly what a per-document host-link relation
    produces.
    """
    # The edge relation feeds 2 + 2*iters plan branches (nodes, outdeg,
    # and a join per round); truncate its lineage so an expensive
    # upstream synthesis/extraction runs once, not once per branch.
    edges = edges.localCheckpoint(eager=False)
    src_nodes = edges.select(F.col("src").alias("node"))
    dst_nodes = edges.select(F.col("dst").alias("node"))
    nodes = src_nodes.unionByName(dst_nodes).distinct()
    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("od"))
    base = scale * (100 - damping_pct) // 100
    pr = nodes.withColumn("pr", F.lit(scale).cast("long"))
    for _ in range(iters):
        contrib = (
            edges.join(pr.withColumnRenamed("node", "src"), "src")
            .join(outdeg, "src")
            .select("dst", F.expr("pr div od").alias("c"))
        )
        summed = contrib.groupBy("dst").agg(F.sum("c").alias("s"))
        pr = (
            nodes.join(summed.withColumnRenamed("dst", "node"), "node", "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.expr(f"({damping_pct} * coalesce(s, 0L)) div 100")
                ).alias("pr"),
            )
        )
    return pr


def synth_host_links(urls_df: DataFrame, links_per_doc: int = 2, n_hosts: int = 20) -> DataFrame:
    """Deterministic host-level link graph from the URL relation: every
    document's host links to ``links_per_doc`` hash-chosen shop hosts
    (``xxhash64(doc_id, 'ln<j>') % n_hosts``) — the synthetic stand-in
    for the href graph a real crawl extracts, replayable cross-engine
    like every other xxh64-derived synthesis in this lake."""
    from .urls import url_host

    out = []
    for j in range(links_per_doc):
        k = F.pmod(F.xxhash64(F.col("doc_id"), F.lit(f"ln{j}")), F.lit(n_hosts))
        out.append(
            urls_df.select(
                url_host("url").alias("src"),
                F.concat(
                    F.lit("shop-src"), k.cast("string"), F.lit(".example.com")
                ).alias("dst"),
            )
        )
    res = out[0]
    for o in out[1:]:
        res = res.unionByName(o)
    return res


def host_authority(urls_df: DataFrame, iters: int = 3) -> DataFrame:
    """PageRank authority of every host in the synthesized crawl link
    graph — the curation signal a host-quality prior is built from."""
    return pagerank(synth_host_links(urls_df), iters=iters).orderBy("node")
