"""SemDeDup — semantic deduplication via k-means clustering (Abbas et
al. 2023, "SemDeDup: Data-efficient learning at web-scale through
semantic deduplication", arXiv:2303.09540).

The method: cluster the embedding space with k-means, then look for
near-duplicate pairs ONLY within each cluster (cosine similarity above
a threshold), and keep the member of each duplicate pair that sits
FARTHEST from its cluster centroid (the paper's "low centroid
similarity" keeper — it preserves the cluster's outliers, which carry
the most marginal information for training).

Design for 100 TB:
- The quadratic term is bounded by CLUSTER SIZE, not corpus size: the
  pair join is an equi-join on the cluster id, so candidate volume is
  sum(|cluster|^2). At web scale k grows with n (the paper uses 50k
  clusters for LAION), holding |cluster| roughly constant — the whole
  pipeline then costs O(n * dim) per Lloyd round plus O(n * avg_cluster)
  for the pair check. No all-pairs join exists anywhere.
- Exact-parity variant (this repo's oracle rule): embeddings are
  quantized to an integer grid, centroids are integer floor-division
  means (same discipline as ``similarity.kmeans_assign``), and the
  cosine threshold is evaluated in pure int64 arithmetic
  (``scale^2 * dot^2 >= tau_bp^2 * |a|^2 * |b|^2`` with dot > 0), so any
  ANSI engine reproduces every drop decision bit-for-bit.
- The centroid relation is k x dim rows and is BROADCAST to the
  assignment join; the driver never materializes anything larger.

Reference parity note: the reference lake (generate_clickstream.py +
README spec) has no ANN/dedup surface — this module is part of the
requested training-data-pipeline extension (BASELINE.json north star).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F



def _quantized_dims(embeddings: DataFrame, scale: int) -> DataFrame:
    """(vec_id, d, x) integer-grid explosion of the embedding column."""
    return embeddings.select(
        "vec_id", F.posexplode("embedding").alias("d", "xf")
    ).select(
        "vec_id",
        "d",
        F.floor(F.col("xf").cast("double") * F.lit(float(scale)))
        .cast("long")
        .alias("x"),
    )


def kmeans_assign_with_dist(
    embeddings: DataFrame,
    k: int = 8,
    iters: int = 2,
    scale: int = 1000,
    init: str = "first",
) -> DataFrame:
    """``similarity.kmeans_assign`` (deterministic integer-grid Lloyd)
    extended to also return the final squared distance to the assigned
    centroid — the ranking signal SemDeDup's keeper rule needs.

    Returns (vec_id, cluster, cdist2). Same plan shape as the plain
    assignment: per round one broadcast join against the k x dim centroid
    relation plus two keyed partial aggregates; nothing driver-side.
    ``init='scatter'`` decorrelates seeds from id assignment (see
    ``similarity.kmeans_seed_ids`` for when 'first' collapses).
    """
    from .similarity import kmeans_seed_ids

    e = _quantized_dims(embeddings, scale)
    seeds = kmeans_seed_ids(embeddings, k, init)
    seeded = (
        e.filter(F.col("vec_id") < k)
        if seeds is None
        else e.join(F.broadcast(seeds), "vec_id")
    )
    cent = seeded.select(
        F.col("vec_id").alias("cid"), "d", F.col("x").alias("cx")
    )
    assign = None
    for _ in range(iters):
        dists = (
            e.join(F.broadcast(cent), "d")
            .groupBy("vec_id", "cid")
            .agg(
                F.sum(
                    (F.col("x") - F.col("cx")) * (F.col("x") - F.col("cx"))
                ).alias("dist2")
            )
        )
        assign = (
            dists.groupBy("vec_id")
            .agg(F.min(F.struct("dist2", "cid")).alias("m"))
            .select(
                "vec_id",
                F.col("m.cid").alias("cluster"),
                F.col("m.dist2").alias("cdist2"),
            )
        )
        cent = (
            e.join(assign.select("vec_id", "cluster"), "vec_id")
            .groupBy(F.col("cluster").alias("cid"), F.col("d"))
            .agg(F.expr("sum(x) div count(1)").alias("cx"))
        )
    return assign


def _pairs_from(
    assign: DataFrame, embeddings: DataFrame, tau_bp: int, cos_scale: int
) -> DataFrame:
    """Within-cluster semantic-duplicate pairs: (vec_a, vec_b, cluster)
    with cosine(a, b) >= tau_bp/100, candidates generated ONLY through
    the cluster equi-join.

    The threshold check is pure integer: with q = floor(x * cos_scale),
    cos >= tau  <=>  dot > 0 and 10000 * dot^2 >= tau_bp^2 * |a|^2 * |b|^2
    (both sides exact — replayed verbatim by the DuckDB oracle, which
    computes them in HUGEINT). The per-vector sums (dot, |a|^2) stay in
    int64, but the threshold PRODUCTS are compared in decimal(38,0):
    at |x| ~ 0.6, dim 64, cos_scale 1000, 10^4 * dot^2 is already
    ~5.5e18 — within 2x of the int64 edge — and the sf1 scaling pass
    caught real corpora (shifted copies, norm ~4) overflowing BIGINT.
    decimal(38,0) keeps the comparison exact with 10^19 more headroom;
    truly extreme (norm * cos_scale)^2 * dim > 1e19 deployments drop
    cos_scale (the check is a threshold, not a metric).
    """
    # Arrow/numpy cluster kernel (r14 opt, guide §4.2): the previous
    # array form joined the two cluster sides and folded each pair's
    # dot product through interpreted zip_with/aggregate lambdas —
    # measured as a single-task multi-second stage. Each cluster group
    # now ships once to one Arrow batch and the |m|^2 pair term runs as
    # ONE int64 matrix product. Exactness: quantization replays the
    # same IEEE ops (double cast, multiply, floor); every integer sum
    # is int64 with Java's wrap semantics (modular arithmetic is
    # order-free, so numpy's int64 matmul matches Spark's int64 fold
    # bit-for-bit even at the overflow edge); the threshold compare
    # 10^4*dot^2 >= tau_bp^2*|a|^2*|b|^2 — exact decimal(38,0) in the
    # old plan — is decided by a float64 screen with a 1e-12 relative
    # guard band (float64 round-off is ~4e-16 relative here) and the
    # rare in-band pairs are re-checked in exact arbitrary-precision
    # Python ints. Cluster-bounded as before: the quadratic term never
    # crosses clusters, and `scaled_k` keeps cluster size ~constant as
    # the corpus grows, so one group per task is the designed shape.
    import numpy as np
    import pandas as pd

    tau2 = int(tau_bp) * int(tau_bp)
    scale = float(cos_scale)
    src = embeddings.select("vec_id", "embedding").join(
        assign.select("vec_id", "cluster"), "vec_id"
    )
    empty = pd.DataFrame(
        {
            "vec_a": pd.Series(dtype="int64"),
            "vec_b": pd.Series(dtype="int64"),
            "cluster": pd.Series(dtype="int64"),
        }
    )

    def per_cluster(pdf: pd.DataFrame) -> pd.DataFrame:
        m = len(pdf)
        if m < 2:
            return empty
        pdf = pdf.sort_values("vec_id")
        V = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
        Q = np.floor(V * scale).astype(np.int64)
        n2 = (Q * Q).sum(axis=1)
        D = Q @ Q.T
        ia, ib = np.triu_indices(m, 1)
        dot = D[ia, ib]
        pos = dot > 0
        ia, ib, dot = ia[pos], ib[pos], dot[pos]
        if len(dot) == 0:
            return empty
        lhs = 1e4 * (dot.astype(np.float64) ** 2)
        rhs = float(tau2) * (
            n2[ia].astype(np.float64) * n2[ib].astype(np.float64)
        )
        keep = lhs >= rhs * (1.0 + 1e-12)
        border = ~(keep | (lhs <= rhs * (1.0 - 1e-12)))
        for idx in np.nonzero(border)[0]:
            d, a2, b2 = int(dot[idx]), int(n2[ia[idx]]), int(n2[ib[idx]])
            keep[idx] = 10000 * d * d >= tau2 * a2 * b2
        ia, ib = ia[keep], ib[keep]
        vids = pdf["vec_id"].to_numpy()
        return pd.DataFrame(
            {
                "vec_a": vids[ia],
                "vec_b": vids[ib],
                "cluster": np.full(
                    len(ia), int(pdf["cluster"].iloc[0]), dtype=np.int64
                ),
            }
        )

    return src.groupBy("cluster").applyInPandas(
        per_cluster, "vec_a long, vec_b long, cluster long"
    )


def semdedup_pairs(
    embeddings: DataFrame,
    k: int = 8,
    iters: int = 2,
    tau_bp: int = 85,
    kmeans_scale: int = 1000,
    cos_scale: int = 1000,
    init: str = "first",
) -> DataFrame:
    """Standalone pair view of ``semdedup`` (see ``_pairs_from`` for the
    int64 threshold algebra and the cluster-bounded candidate shape)."""
    assign = kmeans_assign_with_dist(embeddings, k, iters, kmeans_scale, init)
    return _pairs_from(assign, embeddings, tau_bp, cos_scale)


def scaled_k(
    n: int, target_cluster_size: int = 256, floor: int = 8
) -> int:
    """Cluster count that keeps within-cluster pair work LINEAR in the
    corpus: k ∝ n (the SemDeDup paper's own regime — Abbas'23 uses 50k
    clusters for LAION precisely so cluster size, and with it the
    quadratic within-cluster pair term, stays bounded as the corpus
    grows). A fixed k at 10x data means 10x clusters sizes and 100x
    pairs — measured as a 23x wall-clock blowup in the r8 sf1 pass
    before this. The floor keeps small corpora at the historical k=8
    (sf0.01 and sf0.1 both resolve to 8, so the DuckDB oracle's
    fixed-k SQL stays exact)."""
    import math

    return max(floor, math.ceil(n / target_cluster_size))


def semdedup(
    embeddings: DataFrame,
    k: int | str = 8,
    iters: int = 2,
    tau_bp: int = 85,
    kmeans_scale: int = 1000,
    cos_scale: int = 1000,
    init: str = "first",
) -> DataFrame:
    """Full SemDeDup verdict: every vector labeled with its cluster, its
    squared centroid distance, and whether the keeper rule drops it.

    ``k="auto"`` resolves the cluster count from the corpus size via
    ``scaled_k`` (one metadata-cheap count job) — the configuration a
    100 TB run must use; see ``scaled_k`` for the quadratic-pairs
    pathology a fixed k causes.

    Keeper rule (per the paper, made deterministic): within a duplicate
    pair, the member CLOSER to the cluster centroid is dropped — ties
    break by dropping the larger vec_id. A vector is dropped if ANY of
    its above-threshold partners outranks it; the farthest-from-centroid
    member of every duplicate group always survives, and so does every
    unpaired vector.

    Returns (vec_id, cluster, cdist2, dropped) — dropped as int 0/1, so
    the result is flat, sortable, and hashable cross-engine.

    Scale: the drop relation is a projection of the pair join (ids only);
    the final left join attaches a 1-bit verdict. Output is one row per
    corpus vector — the downstream corpus rebuild is a broadcast-able
    anti-join on the dropped ids, same shape as ``dedup.apply_dedup``.

    The assignment relation (n rows of 3 ints) is localCheckpoint-ed
    before reuse: it feeds four plan branches (pair sides, both victim
    ranks, the final verdict), and truncating the iterative Lloyd
    lineage there keeps those branches from re-running the clustering —
    the same lineage rule as ``dedup.connected_components``.
    """
    if k == "auto":
        k = scaled_k(embeddings.count())
    assign = kmeans_assign_with_dist(
        embeddings, k, iters, kmeans_scale, init
    ).localCheckpoint(eager=False)
    pairs = _pairs_from(assign, embeddings, tau_bp, cos_scale)
    ranked = (
        pairs.join(
            assign.select(F.col("vec_id").alias("vec_a"), F.col("cdist2").alias("da")),
            "vec_a",
        ).join(
            assign.select(F.col("vec_id").alias("vec_b"), F.col("cdist2").alias("db")),
            "vec_b",
        )
    )
    # The pair's victim: the member closer to the centroid (smaller
    # cdist2); on a tie the larger vec_id loses (vec_b, since a < b).
    victims = ranked.select(
        F.when(
            (F.col("da") < F.col("db"))
            | ((F.col("da") == F.col("db")) & (F.col("vec_a") > F.col("vec_b"))),
            F.col("vec_a"),
        )
        .otherwise(F.col("vec_b"))
        .alias("vec_id")
    ).distinct()
    return (
        assign.join(victims.withColumn("dropped", F.lit(1)), "vec_id", "left")
        .select(
            "vec_id",
            "cluster",
            "cdist2",
            F.coalesce(F.col("dropped"), F.lit(0)).alias("dropped"),
        )
    )


def apply_semdedup(embeddings: DataFrame, verdict: DataFrame) -> DataFrame:
    """Rebuild the corpus from a SemDeDup verdict: keep every vector the
    keeper rule did not drop. Ids-only anti-join (broadcast-able — the
    drop set is a small fraction of the corpus by construction)."""
    dropped = verdict.filter(F.col("dropped") == 1).select("vec_id")
    return embeddings.join(dropped, "vec_id", "left_anti")


def semdedup_jl(
    embeddings: DataFrame,
    out_dim: int = 16,
    dim: int = 64,
    jl_quant: int = 1000,
    k: int | str = 8,
    iters: int = 2,
    tau_bp: int = 85,
    cos_scale: int = 1000,
) -> DataFrame:
    """SemDeDup with Johnson-Lindenstrauss-accelerated clustering: the
    k-means stage — the O(n * k * dim) term that dominates SemDeDup at
    scale once k grows with n — runs in ``out_dim``-dim integer sketch
    space (``similarity.jl_project``; a quarter of the bytes and
    multiplies at the 64 -> 16 defaults), while every candidate pair is
    CONFIRMED with the full-dimension exact integer cosine at the same
    ``tau_bp`` threshold as raw-space SemDeDup.

    Contract and honest characterization (measured, SCALING.md r9):
    - PRECISION 1.0 by construction: a vector is only ever dropped for
      a partner whose RAW-space cosine clears the threshold — the
      sketch can never manufacture a false duplicate (unlike
      thresholding JL-space cosines directly, which at out_dim=16 has
      ~1/sqrt(16) angular noise and drops most of the corpus).
    - Pair DISCOVERY is cluster-conditional — in both variants: SemDeDup
      only examines within-cluster pairs, so the found-pair set moves
      with the clustering (raw-space k=8 vs k=12 shares only ~47% of
      pairs on the sf0.01 corpus; the JL clustering shares ~21% with
      raw k=8 while finding the same duplicate VOLUME, 95 vs 99 pairs,
      and the same drop rate).
    - Exactness: projection, Lloyd on the integer grid (scale 1 — the
      projection is already integer), and the raw-space confirm are all
      int64/decimal(38,0) arithmetic: the full verdict replays
      bit-for-bit in the DuckDB oracle.

    Scale shape: identical to ``semdedup`` except assignment reads
    out_dim-int rows; the pair join still ships only ids + quantized
    vectors within clusters. At 100 TB with k ~ n/256 the assignment
    term is the bill — this variant cuts it 4x at the defaults.
    """
    from .similarity import jl_project

    if k == "auto":
        k = scaled_k(embeddings.count())
    proj = jl_project(embeddings, out_dim=out_dim, dim=dim, quant=jl_quant)
    # Materialize the sketch ONCE before Lloyd iterates over it — each
    # k-means round otherwise re-runs the 16-fold projection lineage
    # (measured 15.1 s -> 6.5 s at sf0.1). This is also the 100 TB
    # shape: a real run writes the projection as a silver-zone table
    # and every clustering pass scans out_dim ints, not raw vectors.
    as_emb = proj.select(
        "vec_id",
        F.transform("proj", lambda y: y.cast("double")).alias("embedding"),
    ).localCheckpoint(eager=True)
    # cluster in sketch space (scale 1: floor(y * 1.0) = y exactly) ...
    assign = kmeans_assign_with_dist(as_emb, k, iters, 1, "first").localCheckpoint(
        eager=False
    )
    # ... confirm pairs in RAW space at the exact integer threshold
    pairs = _pairs_from(assign, embeddings, tau_bp, cos_scale)
    ranked = pairs.join(
        assign.select(F.col("vec_id").alias("vec_a"), F.col("cdist2").alias("da")),
        "vec_a",
    ).join(
        assign.select(F.col("vec_id").alias("vec_b"), F.col("cdist2").alias("db")),
        "vec_b",
    )
    victims = ranked.select(
        F.when(
            (F.col("da") < F.col("db"))
            | ((F.col("da") == F.col("db")) & (F.col("vec_a") > F.col("vec_b"))),
            F.col("vec_a"),
        )
        .otherwise(F.col("vec_b"))
        .alias("vec_id")
    ).distinct()
    return assign.join(
        victims.withColumn("dropped", F.lit(1)), "vec_id", "left"
    ).select(
        "vec_id",
        "cluster",
        "cdist2",
        F.coalesce(F.col("dropped"), F.lit(0)).alias("dropped"),
    )
