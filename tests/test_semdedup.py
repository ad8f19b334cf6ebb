"""SemDeDup (cluster-bounded semantic dedup): keeper-rule semantics on
constructed duplicates, corpus rebuild, and plan shape."""

from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, FloatType, IntegerType, LongType, StructField, StructType

from data_lake_for_e_commerce_analytics_spark.operators import semdedup, similarity
from data_lake_for_e_commerce_analytics_spark.plans.explain import (
    assert_no_cartesian,
    plan_string,
)

_SCHEMA = StructType(
    [
        StructField("vec_id", LongType()),
        StructField("embedding", ArrayType(FloatType())),
        StructField("label", IntegerType()),
    ]
)


def _emb(spark, rows):
    return spark.createDataFrame(
        [(int(i), [float(x) for x in v], 0) for i, v in rows], _SCHEMA
    )


def test_semdedup_drops_injected_near_duplicate(spark, tables):
    """A vector plus a tiny perturbation of it must form a duplicate
    pair, and exactly one of the two survives."""
    emb = tables["embeddings"]
    dup = emb.filter(F.col("vec_id") == 17).select(
        F.lit(100017).cast("long").alias("vec_id"),
        F.transform("embedding", lambda x: x + F.lit(0.001)).alias("embedding"),
        "label",
    )
    verdict = semdedup.semdedup(emb.unionByName(dup), k=8, iters=2, tau_bp=85)
    pairish = verdict.filter(F.col("vec_id").isin(17, 100017)).collect()
    assert len(pairish) == 2
    assert sum(r["dropped"] for r in pairish) == 1
    # Both copies land in the same cluster (they are ~identical vectors).
    assert len({r["cluster"] for r in pairish}) == 1


def test_semdedup_keeper_is_farthest_from_centroid(spark):
    """Three near-identical vectors in one tight group, plus distant
    cluster seeds: the survivor of the duplicate group must be the one
    with the LARGEST centroid distance among the group."""
    base = [1.0] + [0.0] * 7
    rows = [
        (0, base),
        (1, [1.001] + [0.0] * 7),
        (2, [1.002] + [0.0] * 7),
        (3, [-1.0] + [0.0] * 7),  # second k-means seed, far away
    ]
    verdict = semdedup.semdedup(_emb(spark, rows), k=2, iters=2, tau_bp=99).collect()
    by_id = {r["vec_id"]: r for r in verdict}
    group = [by_id[i] for i in (0, 1, 2)]
    survivors = [r for r in group if r["dropped"] == 0]
    assert len(survivors) == 1
    assert survivors[0]["cdist2"] == max(r["cdist2"] for r in group)
    assert by_id[3]["dropped"] == 0  # unpaired vector always survives


def test_apply_semdedup_rebuilds_corpus(spark, tables):
    emb = tables["embeddings"]
    dup = emb.filter(F.col("vec_id") == 3).select(
        F.lit(100003).cast("long").alias("vec_id"), "embedding", "label"
    )
    corpus = emb.unionByName(dup)
    verdict = semdedup.semdedup(corpus, k=8, iters=2, tau_bp=85)
    kept = semdedup.apply_semdedup(corpus, verdict)
    n_dropped = verdict.filter(F.col("dropped") == 1).count()
    assert kept.count() == corpus.count() - n_dropped
    assert n_dropped >= 1  # the exact copy must be caught
    # Exactly one of the identical twins remains.
    assert kept.filter(F.col("vec_id").isin(3, 100003)).count() == 1


def test_semdedup_matches_kmeans_assignment(tables):
    """The clustering inside semdedup IS kmeans_assign — assignments
    must agree bit-for-bit with the standalone operator."""
    emb = tables["embeddings"]
    ours = semdedup.kmeans_assign_with_dist(emb, k=8, iters=2).select(
        "vec_id", "cluster"
    )
    theirs = similarity.kmeans_assign(emb, k=8, iters=2)
    assert ours.exceptAll(theirs).count() == 0
    assert theirs.exceptAll(ours).count() == 0


def test_semdedup_plan_shape(tables):
    """No cartesian product anywhere (candidates come from the cluster
    equi-join) and the centroid relation joins broadcast."""
    verdict = semdedup.semdedup(tables["embeddings"], k=8, iters=2, tau_bp=85)
    assert_no_cartesian(verdict)
    assert "BroadcastHashJoin" in plan_string(verdict)


def test_scatter_init_resists_id_mode_correlation(spark):
    """Seeds from vec_id < k collapse when ids correlate with modes
    (all seeds in one mode -> other modes pile into one giant cluster
    -> quadratic pair join on one task, as the sf1 scaling pass
    observed). init='scatter' (k smallest xxhash64(vec_id)) must keep
    the max cluster bounded on the same adversarial layout, and stay
    layout-independent."""
    import random

    from data_lake_for_e_commerce_analytics_spark.operators import semdedup as sd

    rnd = random.Random(11)
    rows = []
    # 4 well-separated modes; ids BLOCKED by mode (0-99 mode0, ...)
    for mode in range(4):
        for j in range(100):
            base = [float(mode * 10)] * 8
            rows.append(
                (mode * 100 + j, [v + rnd.uniform(-0.3, 0.3) for v in base], mode)
            )
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )

    first = sd.kmeans_assign_with_dist(emb, k=4, iters=2, init="first")
    scatter = sd.kmeans_assign_with_dist(emb, k=4, iters=2, init="scatter")
    max_first = first.groupBy("cluster").count().agg(F.max("count")).head()[0]
    max_scatter = scatter.groupBy("cluster").count().agg(F.max("count")).head()[0]
    # id-blocked seeds: 3 modes (300 vecs) collapse onto one centroid
    assert max_first >= 300
    # scattered seeds cover the modes; no cluster dominates
    assert max_scatter <= 200

    # determinism: same assignment regardless of partition layout
    a = sorted(map(tuple, scatter.collect()))
    b = sorted(
        map(
            tuple,
            sd.kmeans_assign_with_dist(
                emb.repartition(13), k=4, iters=2, init="scatter"
            ).collect(),
        )
    )
    assert a == b


def test_scaled_k_keeps_small_corpora_at_floor_and_grows_linearly():
    """k="auto" resolves through scaled_k: sf0.01 (500) and sf0.1
    (2000) stay at the historical k=8 (oracle-exact), while 10x+
    corpora grow k linearly so within-cluster pair work stays linear
    (the r8 sf1 pass measured fixed-k semdedup at 23x wall clock)."""
    from data_lake_for_e_commerce_analytics_spark.operators.semdedup import (
        scaled_k,
    )

    assert scaled_k(500) == 8
    assert scaled_k(2000) == 8
    assert scaled_k(20_000) == 79
    assert scaled_k(200_000) == 782
    # linear regime: doubling n doubles k (within ceil rounding)
    assert abs(scaled_k(400_000) - 2 * scaled_k(200_000)) <= 1


def test_semdedup_auto_k_matches_fixed_k_at_floor(spark, tables):
    """At corpus sizes below the floor threshold, k="auto" must be
    byte-identical to the historical k=8 verdict."""
    from data_lake_for_e_commerce_analytics_spark.operators import semdedup as sd

    emb = tables["embeddings"]
    a = sd.semdedup(emb, k=8, iters=2, tau_bp=35).orderBy("vec_id")
    b = sd.semdedup(emb, k="auto", iters=2, tau_bp=35).orderBy("vec_id")
    assert [tuple(r) for r in a.collect()] == [tuple(r) for r in b.collect()]


def test_semdedup_jl_drops_injected_near_duplicate(spark, tables):
    """The JL-clustered variant must still catch a true near-duplicate:
    the injected copy lands in the same sketch-space cluster (JL
    preserves locality) and the raw-space confirm seals the drop."""
    emb = tables["embeddings"]
    dup = emb.filter(F.col("vec_id") == 17).select(
        F.lit(100017).cast("long").alias("vec_id"),
        F.transform("embedding", lambda x: x + F.lit(0.001)).alias("embedding"),
        "label",
    )
    out = semdedup.semdedup_jl(emb.unionByName(dup), k=8, tau_bp=35).collect()
    flags = {r["vec_id"]: r["dropped"] for r in out}
    assert flags[17] + flags[100017] == 1


def test_semdedup_jl_precision_pairs_are_true_duplicates(spark, tables):
    """Precision 1.0 by construction: every within-cluster pair the JL
    variant confirms clears the RAW-space quantized-cosine threshold
    (numpy recomputation)."""
    import numpy as np

    emb = tables["embeddings"]
    k = semdedup.scaled_k(emb.count())
    proj = similarity.jl_project(emb, out_dim=16, quant=1000)
    as_emb = proj.select(
        "vec_id", F.transform("proj", lambda y: y.cast("double")).alias("embedding")
    )
    assign = semdedup.kmeans_assign_with_dist(as_emb, k, 2, 1, "first")
    pairs = semdedup._pairs_from(assign, emb, 35, 1000).collect()
    assert pairs, "fixture corpus is known to contain semantic duplicates"
    vecs = {
        r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
        for r in emb.select("vec_id", "embedding").collect()
    }
    for r in pairs:
        qa = np.floor(vecs[r["vec_a"]] * 1000).astype(np.int64)
        qb = np.floor(vecs[r["vec_b"]] * 1000).astype(np.int64)
        dot = int(qa @ qb)
        assert dot > 0
        assert 10000 * dot * dot >= 1225 * int(qa @ qa) * int(qb @ qb)


def test_semdedup_jl_volume_comparable_to_raw(spark, tables):
    """The sketch-clustered variant finds the same ORDER of duplicate
    volume as raw-space SemDeDup on the fixture corpus (pair identity
    is cluster-conditional in both — see docstring/SCALING.md)."""
    emb = tables["embeddings"]
    raw_drops = (
        semdedup.semdedup(emb, k="auto", iters=2, tau_bp=35)
        .agg(F.sum("dropped"))
        .head()[0]
    )
    jl_drops = (
        semdedup.semdedup_jl(emb, k="auto", iters=2, tau_bp=35)
        .agg(F.sum("dropped"))
        .head()[0]
    )
    assert raw_drops > 0 and jl_drops > 0
    assert 0.5 * raw_drops <= jl_drops <= 2.0 * raw_drops
