"""Similarity search: brute-force exactness vs numpy, LSH recall and
candidate-pruning behavior."""

import numpy as np
from pyspark.sql import functions as F

from data_lake_for_e_commerce_analytics_spark.operators import similarity


def _numpy_topk(tables, query_vec_id, k):
    rows = tables["embeddings"].select("vec_id", "embedding").collect()
    vecs = {r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64) for r in rows}
    q = vecs[query_vec_id]
    sims = {
        vid: float(v @ q / (np.linalg.norm(v) * np.linalg.norm(q)))
        for vid, v in vecs.items()
        if vid != query_vec_id
    }
    return sorted(sims.items(), key=lambda kv: (-round(kv[1], 4), kv[0]))[:k]


def test_brute_force_knn_matches_numpy(spark, tables):
    got = similarity.knn_for_vec_id(spark, tables["embeddings"], query_vec_id=0, k=10).collect()
    want = _numpy_topk(tables, 0, 10)
    assert [r["vec_id"] for r in got] == [vid for vid, _ in want]
    for r, (_, sim) in zip(got, want):
        assert abs(r["cosine"] - round(sim, 4)) <= 1e-4


def test_lsh_knn_subset_of_corpus_and_ranked(spark, tables):
    got = similarity.lsh_bucketed_knn(spark, tables["embeddings"], query_vec_id=0, k=10).collect()
    cosines = [r["cosine"] for r in got]
    assert cosines == sorted(cosines, reverse=True)
    assert all(r["vec_id"] != 0 for r in got)


def test_lsh_prunes_candidates(spark, tables):
    """The LSH filter must examine fewer vectors than the corpus."""
    emb = tables["embeddings"]
    sigs = emb.withColumn("sig", similarity.hyperplane_signature(F.col("embedding"), 12, 64))
    qsig = sigs.filter(F.col("vec_id") == 0).select("sig").head()[0]
    n_candidates = sigs.filter(F.bit_count(F.col("sig").bitwiseXOR(F.lit(qsig))) <= 2).count()
    assert n_candidates < emb.count()


def test_ivf_knn_recall_against_exact(spark, tables):
    from data_lake_for_e_commerce_analytics_spark.operators import similarity

    emb = tables["embeddings"]
    exact = {r["vec_id"] for r in similarity.knn_for_vec_id(spark, emb, 0, k=10).collect()}
    approx = similarity.ivf_knn(spark, emb, query_vec_id=0, k=10, n_cells=8, n_probe=4)
    got = {r["vec_id"] for r in approx.collect()}
    # probing half the cells must recover at least half of the true top-10
    assert len(got & exact) >= 5
    # full probe degenerates to exact search
    full = similarity.ivf_knn(spark, emb, query_vec_id=0, k=10, n_cells=8, n_probe=8)
    assert {r["vec_id"] for r in full.collect()} == exact


def test_ivf_assignments_cover_all_vectors(spark, tables):
    from data_lake_for_e_commerce_analytics_spark.operators import similarity

    emb = tables["embeddings"]
    assigned, centroids = similarity.build_ivf_index(emb, n_cells=8, lloyd_iters=1)
    assert assigned.count() == emb.count()
    assert centroids.shape == (8, 64)
    n_used = assigned.select("cell").distinct().count()
    assert n_used >= 2  # clustering is non-degenerate


def test_ivf_build_driver_sees_at_most_k_rows(spark, tables, monkeypatch):
    """The Lloyd loop must stay distributed: at realistic ANN scale
    (k=65536 cells x 768 dims) a per-iteration driver collect of
    (cell, dim) partials is ~50M rows per round. Spy on every
    driver-materialization route and assert nothing larger than k rows
    crosses the boundary during an index build."""
    # patch the CONCRETE class (pyspark.sql.classic.dataframe.DataFrame
    # in PySpark 4) — the pyspark.sql.DataFrame base's methods are
    # overridden there and a base-class patch never fires
    DataFrame = type(tables["embeddings"])

    sizes = []
    orig_collect, orig_head = DataFrame.collect, DataFrame.head

    def spy_collect(self):
        rows = orig_collect(self)
        sizes.append(len(rows))
        return rows

    def spy_head(self, n=None):
        out = orig_head(self, n)
        sizes.append(1 if n is None else len(out))
        return out

    monkeypatch.setattr(DataFrame, "collect", spy_collect)
    monkeypatch.setattr(DataFrame, "head", spy_head)
    monkeypatch.setattr(
        DataFrame, "toPandas", lambda self: (_ for _ in ()).throw(
            AssertionError("toPandas during IVF build")
        )
    )
    assigned, centroids = similarity.build_ivf_index(
        tables["embeddings"], n_cells=8, lloyd_iters=2
    )
    assert sizes and max(sizes) <= 8
    assert centroids.shape == (8, 64)


def test_label_centroids_match_numpy(tables):
    emb = tables["embeddings"]
    got = {r["label"]: (r["centroid"], r["n_vectors"]) for r in similarity.label_centroids(emb).collect()}
    pdf = emb.select("label", "embedding").toPandas()
    for label, grp in pdf.groupby("label"):
        mat = np.array([np.asarray(v, dtype=np.float64) for v in grp["embedding"]])
        want = np.round(mat.mean(axis=0), 4)
        centroid, n = got[label]
        assert n == len(mat)
        assert np.allclose(np.array(centroid), want, atol=1e-4)


def test_ivf_written_index_prunes_partitions_and_matches_join_path(
    spark, tables, tmp_path
):
    """The cell-partitioned IVF layout must (a) prune non-probed cells at
    the scan (PartitionFilters) and (b) return exactly what brute-force
    over the probed cells' members returns."""
    from data_lake_for_e_commerce_analytics_spark.plans.explain import plan_string

    emb = tables["embeddings"]
    path = str(tmp_path / "ivf_idx")
    centroids = similarity.write_ivf_index(emb, path, n_cells=8, lloyd_iters=1)

    qrow = emb.filter(F.col("vec_id") == 0).select("embedding").head()
    q = [float(x) for x in qrow[0]]
    got = similarity.ivf_knn_pruned(
        spark, path, centroids, q, k=5, n_probe=3, exclude_vec_id=0
    )
    plan = plan_string(got)
    assert "PartitionFilters" in plan and "cell" in plan

    # oracle: brute force over the same probed membership read back
    import numpy as np

    qn = np.asarray(q) / np.linalg.norm(q)
    probe = [int(c) for c in (centroids @ qn).argsort()[::-1][:3]]
    members = (
        spark.read.parquet(path)
        .filter(F.col("cell").isin(probe))
        .filter(F.col("vec_id") != 0)
    )
    want = similarity.brute_force_knn(members, q, k=5)
    assert [r["vec_id"] for r in got.collect()] == [
        r["vec_id"] for r in want.collect()
    ]


def test_ivf_sq8_written_index_bytes_pruning_and_code_agreement(
    spark, tables, tmp_path
):
    """The at-rest two-tier index: (a) stores INT8 codes (1 byte/dim,
    no float vector column), (b) prunes non-probed cells at the file
    index, (c) ranks identically to the in-memory SQ8 distance over
    the same probed membership with the same codebook."""
    from data_lake_for_e_commerce_analytics_spark.plans.explain import plan_string
    from pyspark.sql import types as T

    emb = tables["embeddings"]
    path = str(tmp_path / "ivf_sq8_idx")
    centroids, stats = similarity.write_ivf_sq8_index(
        emb, path, n_cells=8, lloyd_iters=1
    )
    stored = spark.read.parquet(path)
    code_type = stored.schema["code"].dataType
    assert isinstance(code_type, T.ArrayType)
    assert isinstance(code_type.elementType, T.ByteType)
    assert "embedding" not in stored.columns  # floats never hit disk

    qrow = emb.filter(F.col("vec_id") == 0).select("embedding").head()
    q = [float(x) for x in qrow[0]]
    got = similarity.ivf_sq8_knn_pruned(
        spark, path, centroids, stats, q, k=5, n_probe=3, exclude_vec_id=0
    )
    plan = plan_string(got)
    assert "PartitionFilters" in plan and "cell" in plan

    # agreement oracle: re-encode the probed members' original vectors
    # with sq8_knn's own expression over the same membership
    import numpy as np

    qn = np.asarray(q) / np.linalg.norm(q)
    probe = [int(c) for c in (centroids @ qn).argsort()[::-1][:3]]
    member_ids = stored.filter(F.col("cell").isin(probe)).select("vec_id")
    want = similarity.sq8_knn(emb, query_vec_id=0, k=5, candidates=member_ids)
    assert [(r["vec_id"], r["sqdist"]) for r in got.collect()] == [
        (r["vec_id"], r["sqdist"]) for r in want.collect()
    ]


def test_ivf_pq_refine_written_index_layout_pruning_and_agreement(
    spark, tables, tmp_path
):
    """The at-rest IVFADC + refine layout: (a) the PQ tier stores one
    tinyint per subspace and no float column, (b) both tiers share one
    cell assignment, (c) the probe prunes non-probed cells at the file
    index AND pushes the shortlist id filter into the rerank scan,
    (d) with full probe + full shortlist the result degenerates to
    plain SQ8 over the corpus (minus the excluded query row)."""
    from data_lake_for_e_commerce_analytics_spark.plans.explain import plan_string
    from pyspark.sql import types as T

    emb = tables["embeddings"]
    path = str(tmp_path / "ivfpq_idx")
    centroids, cb_rows, stats = similarity.write_ivf_pq_refine_index(
        emb, path, n_cells=8, n_codewords=16, m_subspaces=8, lloyd_iters=1
    )
    pq_tier = spark.read.parquet(f"{path}/pq")
    code_type = pq_tier.schema["pq_code"].dataType
    assert isinstance(code_type, T.ArrayType)
    assert isinstance(code_type.elementType, T.ByteType)
    assert "embedding" not in pq_tier.columns  # floats never hit disk
    sq8_tier = spark.read.parquet(f"{path}/sq8")
    joined = pq_tier.select("vec_id", F.col("cell").alias("pc")).join(
        sq8_tier.select("vec_id", F.col("cell").alias("sc")), "vec_id"
    )
    assert joined.filter(F.col("pc") != F.col("sc")).count() == 0

    qrow = emb.filter(F.col("vec_id") == 0).select("embedding").head()
    q = [float(x) for x in qrow[0]]
    got = similarity.ivf_pq_refine_knn_pruned(
        spark, path, centroids, cb_rows, stats, q,
        k=5, n_probe=3, shortlist=50, exclude_vec_id=0,
    )
    plan = plan_string(got)
    assert "PartitionFilters" in plan and "cell" in plan
    assert "vec_id" in plan and "PushedFilters" in plan

    n = emb.count()
    full = similarity.ivf_pq_refine_knn_pruned(
        spark, path, centroids, cb_rows, stats, q,
        k=5, n_probe=8, shortlist=int(n), exclude_vec_id=0,
    ).collect()
    plain = similarity.sq8_knn(emb, query_vec_id=0, k=5).collect()
    assert [(r["vec_id"], r["sqdist"]) for r in full] == [
        (r["vec_id"], r["sqdist"]) for r in plain
    ]


def test_sq8_codes_are_bytes_and_recall_is_high(spark, tables):
    """SQ8 code-space neighbors must land in [0, 255] per dim and agree
    with exact float cosine top-k on most of the neighborhood (scalar
    quantization at 8 bits loses little at dim 64)."""
    emb = tables["embeddings"]
    stats = {
        r["pos"]: (r["mn"], r["mx"])
        for r in similarity.sq8_corpus_stats(emb).collect()
    }
    assert len(stats) == len(emb.head()["embedding"])
    for mn, mx in stats.values():
        assert mn <= mx
    got = similarity.sq8_knn(emb, query_vec_id=0, k=10)
    rows = got.collect()
    assert len(rows) == 10
    assert all(rows[i]["sqdist"] <= rows[i + 1]["sqdist"] for i in range(9))
    exact = similarity.knn_for_vec_id(spark, emb, query_vec_id=0, k=10)
    overlap = {r["vec_id"] for r in rows} & {r["vec_id"] for r in exact.collect()}
    assert len(overlap) >= 7


def test_sq8_knn_plan_is_topk_mapside(spark, tables):
    """SQ8 search must compile to a TakeOrderedAndProject over map-side
    quantize+distance expressions — the only shuffles allowed are the
    dim-row stats pass (inside the operator, already collected) and the
    k-row gather."""
    from data_lake_for_e_commerce_analytics_spark.plans.explain import plan_string

    df = similarity.sq8_knn(tables["embeddings"], query_vec_id=0, k=10)
    df.collect()
    plan = plan_string(df)
    assert "TakeOrderedAndProject" in plan
    # the ranking query itself must not shuffle the corpus
    assert "Exchange hashpartitioning" not in plan


def test_pq_knn_shape_recall_and_plan(spark, tables):
    """PQ ADC ranking: deterministic integer distances ascending, some
    overlap with exact top-k (16 sampled codewords is a coarse
    quantizer — the documented accuracy/memory trade), and a map-side
    top-k plan with no corpus shuffle."""
    from data_lake_for_e_commerce_analytics_spark.plans.explain import plan_string

    emb = tables["embeddings"]
    got = similarity.pq_knn(emb, query_vec_id=0, k=10)
    rows = got.collect()
    assert len(rows) == 10
    dists = [r["pqdist_micro"] for r in rows]
    assert dists == sorted(dists) and all(isinstance(d, int) for d in dists)
    exact = {r["vec_id"] for r in similarity.knn_for_vec_id(spark, emb).collect()}
    assert len({r["vec_id"] for r in rows} & exact) >= 2
    plan = plan_string(got)
    assert "TakeOrderedAndProject" in plan
    assert "Exchange hashpartitioning" not in plan


def test_ivf_sq8_two_tier_recall_and_no_float_rank(spark, tables):
    """The IVF->SQ8 composition: candidates come only from probed cells,
    ranking is the integer SQ8 code distance (sqdist column, longs),
    and recall at half-probe stays above the verdict floor."""
    emb = tables["embeddings"]
    got = similarity.ivf_sq8_knn(
        spark, emb, query_vec_id=0, k=10, n_cells=8, n_probe=4
    )
    rows = got.collect()
    assert len(rows) == 10
    dists = [r["sqdist"] for r in rows]
    assert dists == sorted(dists) and all(isinstance(d, int) for d in dists)
    exact = {r["vec_id"] for r in similarity.knn_for_vec_id(spark, emb).collect()}
    assert len({r["vec_id"] for r in rows} & exact) >= 5
    # full-probe degenerates to plain SQ8 (same candidate set)
    full = similarity.ivf_sq8_knn(
        spark, emb, query_vec_id=0, k=10, n_cells=8, n_probe=8
    ).collect()
    plain = similarity.sq8_knn(emb, query_vec_id=0, k=10).collect()
    assert [r["vec_id"] for r in full] == [r["vec_id"] for r in plain]


def test_pq_trained_codebook_never_worse_than_sampled(spark, tables):
    """pq_train_codebooks inits Lloyd from the sampled baseline, so the
    trained per-subspace quantization error can never exceed the
    baseline's (Lloyd monotonicity) — and the codebook is deterministic
    (integer-grid arithmetic, two runs identical)."""
    import numpy as np

    emb = tables["embeddings"]
    cb = similarity.pq_train_codebooks(emb, n_codewords=4, m_subspaces=4, iters=2)
    cb2 = similarity.pq_train_codebooks(emb, n_codewords=4, m_subspaces=4, iters=2)
    assert cb == cb2
    rows = emb.select("vec_id", "embedding").collect()
    V = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in rows])
    # Lloyd runs on the integer grid (scale=1000) — measure MSE there too
    Q = np.floor(V * 1000.0)
    sampled = {
        r["vec_id"]: np.floor(np.asarray(r["embedding"], np.float64) * 1000.0)
        for r in emb.filter(F.col("vec_id") < 4).collect()
    }
    dim = V.shape[1]
    sub = dim // 4

    def mse(book):
        total = 0.0
        for m in range(4):
            sl = slice(m * sub, (m + 1) * sub)
            C = np.stack([book[j][sl] for j in range(4)])
            d = ((Q[:, None, sl] - C[None, :, :]) ** 2).sum(axis=2)
            total += d.min(axis=1).sum()
        return total

    trained_grid = {j: np.floor(np.asarray(v) * 1000.0 + 0.5) for j, v in cb.items()}
    assert mse(trained_grid) <= mse(sampled) + 1e-6


def test_pq_knn_accepts_trained_codebook(spark, tables):
    """codebook= swaps the quantizer; output contract (k rows, ascending
    integer micro-distances) is unchanged."""
    emb = tables["embeddings"]
    cb = similarity.pq_train_codebooks(emb, n_codewords=4, m_subspaces=4, iters=1)
    rows = similarity.pq_knn(
        emb, query_vec_id=0, k=5, n_codewords=4, m_subspaces=4, codebook=cb
    ).collect()
    assert len(rows) == 5
    dists = [r["pqdist_micro"] for r in rows]
    assert dists == sorted(dists) and all(isinstance(d, int) for d in dists)


def test_pq_refine_recovers_recall_over_raw_pq(spark, tables):
    """The ADC-shortlist -> rerank composition (VERDICT r8 task 2): the
    reranked top-k must strictly beat raw PQ top-k recall on this corpus
    and reach the SQ8 tier's level; output contract is sq8_knn's
    (ascending integer sqdist)."""
    emb = tables["embeddings"]
    exact = {r["vec_id"] for r in similarity.knn_for_vec_id(spark, emb).collect()}
    raw = {r["vec_id"] for r in similarity.pq_knn(emb, query_vec_id=0, k=10).collect()}
    refined_rows = similarity.pq_refine_knn(
        emb, query_vec_id=0, k=10, shortlist=100
    ).collect()
    refined = {r["vec_id"] for r in refined_rows}
    sq8 = {r["vec_id"] for r in similarity.sq8_knn(emb, query_vec_id=0, k=10).collect()}
    assert len(refined & exact) > len(raw & exact)
    assert len(refined & exact) >= len(sq8 & exact) - 2
    dists = [r["sqdist"] for r in refined_rows]
    assert dists == sorted(dists) and all(isinstance(d, int) for d in dists)


def test_pq_refine_full_shortlist_degenerates_to_sq8(spark, tables):
    """shortlist >= corpus makes stage 1 a no-op filter, so the result
    must equal plain SQ8 — pins that the rerank tier is exactly
    sq8_knn's ranking."""
    emb = tables["embeddings"]
    n = emb.count()
    full = similarity.pq_refine_knn(
        emb, query_vec_id=0, k=10, shortlist=int(n)
    ).collect()
    plain = similarity.sq8_knn(emb, query_vec_id=0, k=10).collect()
    assert [r["vec_id"] for r in full] == [r["vec_id"] for r in plain]


def test_pq_refine_float_rerank_and_bad_tier(spark, tables):
    emb = tables["embeddings"]
    rows = similarity.pq_refine_knn(
        emb, query_vec_id=0, k=5, shortlist=50, rerank="float"
    ).collect()
    assert len(rows) == 5
    cos = [r["cosine"] for r in rows]
    assert cos == sorted(cos, reverse=True)
    import pytest as _pt

    with _pt.raises(ValueError):
        similarity.pq_refine_knn(emb, rerank="nope")


def test_contrastive_candidates_roles_and_ranks(spark, tables):
    from data_lake_for_e_commerce_analytics_spark.operators import similarity as S

    emb = tables["embeddings"]
    anchor_label = emb.filter(F.col("vec_id") == 0).head()["label"]
    got = S.contrastive_candidates(emb, query_vec_id=0, k=5).collect()
    pos = [r for r in got if r["role"] == "positive"]
    neg = [r for r in got if r["role"] == "negative"]
    assert len(pos) == 5 and len(neg) == 5
    assert all(r["label"] == anchor_label for r in pos)
    assert all(r["label"] != anchor_label for r in neg)
    assert all(r["vec_id"] != 0 for r in got)
    for group in (pos, neg):
        cosines = [r["cosine"] for r in sorted(group, key=lambda r: r["rank"])]
        assert cosines == sorted(cosines, reverse=True)
    # the top positive is the same vector brute-force knn ranks first
    # among same-label neighbors
    knn = S.knn_for_vec_id(spark, emb, 0, k=50).collect()
    best_same = next(r for r in knn if r["label"] == anchor_label)
    assert sorted(pos, key=lambda r: r["rank"])[0]["vec_id"] == best_same["vec_id"]


def test_jl_project_matches_numpy_exact(spark, tables):
    """The projection is pure int64 arithmetic: numpy with the same
    pure-Python sign grid reproduces every coordinate exactly."""
    from data_lake_for_e_commerce_analytics_spark.functions.ann_oracle import (
        _jl_sign_grid,
    )

    emb = tables["embeddings"]
    got = {
        r["vec_id"]: list(r["proj"])
        for r in similarity.jl_project(emb).collect()
    }
    S = np.asarray(_jl_sign_grid(), dtype=np.int64)  # (16, 64)
    rows = emb.select("vec_id", "embedding").limit(50).collect()
    for r in rows:
        q = np.floor(np.asarray(r["embedding"], dtype=np.float64) * 1_000_000).astype(
            np.int64
        )
        want = (S @ q).tolist()
        assert got[r["vec_id"]] == want


def test_jl_distortion_within_bounds(spark, tables):
    """JL lemma sanity: mean squared-distance ratio near 1 and inside
    the 2x gate bound on the sample pairs."""
    row = similarity.jl_distortion_stats(tables["embeddings"]).head()
    assert row["n_pairs"] == 190
    assert row["within_2x"] == 1
    assert 0.7 <= row["distortion_ratio"] <= 1.4
    assert row["sum_d2_proj"] > 0 and row["sum_d2_orig_scaled"] > 0


def test_jl_project_is_map_side_only(spark, tables):
    """No shuffle anywhere: the sign matrix folds into one projection."""
    plan = similarity.jl_project(tables["embeddings"])._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_ivf_jl_knn_recall_and_candidate_pruning(spark, tables):
    """JL-coarse-tier IVF: candidates come only from probed cells
    (scanned fraction < 1) and recall at half-probe stays >= the gate
    floor; full probe must recover the full-scan SQ8 ranking exactly
    (cell assignment cannot change rank fidelity)."""
    emb = tables["embeddings"]
    got = similarity.ivf_jl_knn(
        spark, emb, query_vec_id=0, k=10, n_cells=8, n_probe=4
    ).collect()
    exact = {r["vec_id"] for r in similarity.knn_for_vec_id(spark, emb, 0, 10).collect()}
    assert len({r["vec_id"] for r in got} & exact) >= 5
    full_probe = similarity.ivf_jl_knn(
        spark, emb, query_vec_id=0, k=10, n_cells=8, n_probe=8
    ).collect()
    sq8 = similarity.sq8_knn(emb, query_vec_id=0, k=10).collect()
    assert [r["vec_id"] for r in full_probe] == [r["vec_id"] for r in sq8]


def test_append_to_ivf_sq8_index_matches_full_rebuild_probe(
    spark, tables, tmp_path
):
    """Incremental add (FAISS add-after-train semantics): appending a
    batch with the STORED centroids/codebook must (a) leave existing
    code rows byte-identical, (b) make a probe over the grown index
    return exactly what probing the same frozen geometry over the
    union corpus returns."""
    emb = tables["embeddings"]
    base = emb.filter(F.col("vec_id") < 400)
    batch = emb.filter(F.col("vec_id") >= 400)
    path = str(tmp_path / "ivf_grow")
    centroids, stats = similarity.write_ivf_sq8_index(
        base, path, n_cells=8, lloyd_iters=1
    )
    before = {
        (r["vec_id"], tuple(r["code"]), r["cell"])
        for r in spark.read.parquet(path).collect()
    }
    n = similarity.append_to_ivf_sq8_index(spark, path, centroids, stats, batch)
    assert n == batch.count() and n > 0
    after_rows = spark.read.parquet(path).collect()
    after = {(r["vec_id"], tuple(r["code"]), r["cell"]) for r in after_rows}
    assert before <= after and len(after) == len(before) + n

    # full probe over the grown index must equal a numpy re-encode of
    # the UNION corpus with the same stored codebook (frozen geometry:
    # appended vectors are first-class probe citizens)
    import numpy as np

    qrow = emb.filter(F.col("vec_id") == 0).select("embedding").head()
    q = [float(x) for x in qrow[0]]
    grown = similarity.ivf_sq8_knn_pruned(
        spark, path, centroids, stats, q, k=10, n_probe=8, exclude_vec_id=0
    ).collect()
    assert len(grown) == 10

    dim = len(stats)
    mn = np.array([stats[i][0] for i in range(dim)])
    scale = np.maximum(np.array([stats[i][1] for i in range(dim)]) - mn, 1e-12)

    def encode(v):
        return np.clip(np.floor((np.asarray(v) - mn) / scale * 255.0), 0, 255)

    qc = encode(q)
    rows = emb.filter(F.col("vec_id") != 0).select("vec_id", "embedding").collect()
    dists = sorted(
        (int(((encode(r["embedding"]) - qc) ** 2).sum()), int(r["vec_id"]))
        for r in rows
    )[:10]
    assert [r["vec_id"] for r in grown] == [vid for _, vid in dists]
    # and at least one appended (vec_id >= 400) vector is probe-reachable
    all_cells = {r["cell"] for r in after_rows if r["vec_id"] >= 400}
    assert all_cells, "appended rows must land in real cells"


# --- multi-query gate harness (r10) -----------------------------------------


def test_exact_knn_multi_degenerates_to_single_query(spark, tables):
    """Per query id, exact_knn_multi's top-10 must equal the
    single-query brute-force path's (same round-4 cosine + vec_id
    tiebreak contract)."""
    emb = tables["embeddings"]
    multi = similarity.exact_knn_multi(spark, emb, query_ids=(0, 31), k=10).collect()
    got = {qid: [] for qid in (0, 31)}
    for r in multi:
        got[r["qid"]].append(r["vec_id"])
    for qid in (0, 31):
        single = [
            r["vec_id"]
            for r in similarity.knn_for_vec_id(spark, emb, qid, k=10).collect()
        ]
        assert sorted(got[qid]) == sorted(single)


def test_ivf_knn_multi_single_query_matches_operator(spark, tables):
    """With ONE query id and a shared index geometry, the multi harness
    must return a candidate ranking consistent with the single-query
    operator's contract: k results, none the query itself, all drawn
    from the probed cells."""
    emb = tables["embeddings"]
    multi = similarity.ivf_knn_multi(
        spark, emb, query_ids=(0,), k=10, n_cells=8, n_probe=8, rank="float"
    ).collect()
    # full probe degenerates to exact search
    exact = [
        r["vec_id"] for r in similarity.knn_for_vec_id(spark, emb, 0, k=10).collect()
    ]
    assert sorted(r["vec_id"] for r in multi) == sorted(exact)


def test_ivf_sq8_multi_full_probe_matches_sq8_knn(spark, tables):
    """rank='sq8' with full probe must reproduce the full-scan SQ8
    ranking per query (the two-tier degeneracy contract, multi form)."""
    emb = tables["embeddings"]
    multi = similarity.ivf_knn_multi(
        spark, emb, query_ids=(0, 31), k=10, n_cells=4, n_probe=4, rank="sq8"
    ).collect()
    got = {qid: [] for qid in (0, 31)}
    for r in multi:
        got[r["qid"]].append(r["vec_id"])
    for qid in (0, 31):
        single = [
            r["vec_id"]
            for r in similarity.sq8_knn(emb, query_vec_id=qid, k=10).collect()
        ]
        assert got[qid] == single  # window order == orderBy order


def test_pq_refine_multi_matches_single_query(spark, tables):
    """pq_refine_knn_multi per query == pq_refine_knn (same codebook,
    shortlist, micro-unit ADC arithmetic, SQ8 rerank)."""
    emb = tables["embeddings"]
    multi = similarity.pq_refine_knn_multi(
        spark, emb, query_ids=(0, 93), k=10, shortlist=50, n_codewords=16
    ).collect()
    got = {qid: [] for qid in (0, 93)}
    for r in multi:
        got[r["qid"]].append(r["vec_id"])
    for qid in (0, 93):
        single = [
            r["vec_id"]
            for r in similarity.pq_refine_knn(
                emb, query_vec_id=qid, k=10, shortlist=50, n_codewords=16
            ).collect()
        ]
        assert got[qid] == single


def test_gate_query_ids_exist_at_smallest_fixture(spark, tables):
    ids = similarity.ANN_GATE_QUERY_IDS
    assert len(ids) == 16 and len(set(ids)) == 16
    n = tables["embeddings"].count()
    assert max(ids) < min(n, 500)


def test_ivfadc_residual_full_shortlist_degenerates_to_sq8(spark, tables):
    """With full probe AND shortlist >= corpus the residual ADC stage
    passes everything through, so the result must equal the full-scan
    SQ8 ranking per query — pins that residual encode/probe plumbing
    never corrupts the rerank tier."""
    emb = tables["embeddings"]
    n = emb.count()
    multi = similarity.ivfadc_residual_knn_multi(
        spark, emb, query_ids=(0, 31), k=10, shortlist=n,
        n_cells=4, n_probe=4, n_codewords=16,
    ).collect()
    got = {qid: [] for qid in (0, 31)}
    for r in multi:
        got[r["qid"]].append(r["vec_id"])
    for qid in (0, 31):
        single = [
            r["vec_id"]
            for r in similarity.sq8_knn(emb, query_vec_id=qid, k=10).collect()
        ]
        assert got[qid] == single


def test_ivfadc_residual_probe_prunes_candidates(spark, tables):
    """Partial probe must return <= k rows per query drawn only from
    probed cells (rows can be fewer if the probed cells are thin)."""
    emb = tables["embeddings"]
    rows = similarity.ivfadc_residual_knn_multi(
        spark, emb, query_ids=(0,), k=10, shortlist=50,
        n_cells=8, n_probe=2, n_codewords=16,
    ).collect()
    assert 0 < len(rows) <= 10
    assert all(r["vec_id"] != 0 for r in rows)


def test_write_ivf_pq_refine_index_rejects_codewords_over_127(spark, tables, tmp_path):
    """ADVICE r9: the at-rest PQ code is a 1-based tinyint — 128+
    codewords would wrap negative and silently mis-index the ADC table."""
    import pytest

    with pytest.raises(ValueError, match="127"):
        similarity.write_ivf_pq_refine_index(
            tables["embeddings"], str(tmp_path / "idx"), n_codewords=128
        )


def test_retrain_trigger_decay_points(spark, tmp_path):
    """Pins one cell of the r10 re-train-trigger sweep (SCALING.md r10,
    retrain_trigger_r10.json) at small scale: base = sf0.01 corpus
    (500), append 250 strongly-drifted (+0.3/dim) vectors, n_cells=8,
    n_probe=4, 16 gate queries. The FROZEN-geometry index's recall sits
    within rebuild variance of a full re-train (here it even wins),
    while the ONLINE trigger metrics — batch quantization-distance
    ratio and SQ8 clip fraction — scream: that ordering is the whole
    basis of the documented 'QDR > 1.2 or clip > 1%' trigger.

    The recall integers are environment-coupled the same way the ANN
    verdict gates are (numpy float Lloyd; spark.default.parallelism):
    re-measure before diagnosing a flip on different hardware."""
    import numpy as np
    from data_lake_for_e_commerce_analytics_spark.sources.tables import load_table

    base = load_table(spark, "/root/testdata/sf0.01", "embeddings").localCheckpoint(
        eager=True
    )
    n_base = base.count()
    batch = (
        load_table(spark, "/root/testdata/sf0.1", "embeddings")
        .filter((F.col("vec_id") >= n_base) & (F.col("vec_id") < n_base + 250))
        .select(
            "vec_id",
            "label",
            F.transform("embedding", lambda x: x.cast("double") + F.lit(0.3)).alias(
                "embedding"
            ),
        )
        .localCheckpoint(eager=True)
    )
    union = base.unionByName(batch).localCheckpoint(eager=True)
    exact_sets: dict[int, set] = {}
    for r in similarity.exact_knn_multi(spark, union, k=10).collect():
        exact_sets.setdefault(r["qid"], set()).add(r["vec_id"])
    qvecs = similarity._gate_query_vecs(base, similarity.ANN_GATE_QUERY_IDS)

    def recall(path, cent, stats):
        hits = 0
        for qid, qv in qvecs:
            got = {
                r["vec_id"]
                for r in similarity.ivf_sq8_knn_pruned(
                    spark, path, cent, stats, qv, k=10, n_probe=4,
                    exclude_vec_id=qid,
                ).collect()
            }
            hits += len(got & exact_sets[qid])
        return hits

    frozen_path = str(tmp_path / "frozen")
    cent, stats = similarity.write_ivf_sq8_index(
        base, frozen_path, n_cells=8, lloyd_iters=2
    )
    similarity.append_to_ivf_sq8_index(spark, frozen_path, cent, stats, batch)
    frozen_n = recall(frozen_path, cent, stats)

    rebuilt_path = str(tmp_path / "rebuilt")
    rc, rs = similarity.write_ivf_sq8_index(
        union, rebuilt_path, n_cells=8, lloyd_iters=2
    )
    rebuilt_n = recall(rebuilt_path, rc, rs)

    assert (frozen_n, rebuilt_n) == (104, 100)  # measured decay points

    B = np.stack([np.asarray(r[0]) for r in batch.select("embedding").collect()])
    V = np.stack([np.asarray(r[0]) for r in base.select("embedding").collect()])
    C = np.asarray(cent)

    def mean_dist(X):
        cells = (X @ C.T).argmax(axis=1)
        return float(np.linalg.norm(X - C[cells], axis=1).mean())

    qdr = mean_dist(B) / mean_dist(V)
    mn = np.array([stats[i][0] for i in range(B.shape[1])])
    mx = np.array([stats[i][1] for i in range(B.shape[1])])
    clip = float(((B < mn) | (B > mx)).mean())
    # the online metrics fire well past the documented trigger while
    # recall stays within rebuild variance — trigger leads, decay lags
    assert qdr > 1.2 and clip > 0.01
    assert abs(qdr - 2.2239) < 1e-3 and abs(clip - 0.2924) < 1e-3


def test_batch_drift_metrics_matches_numpy(spark, tables):
    """batch_drift_metrics (the online re-train trigger) must agree
    with the numpy arithmetic the sweep used."""
    import numpy as np

    emb = tables["embeddings"]
    _, centroids = similarity.build_ivf_index(emb, n_cells=4, lloyd_iters=1)
    stats = {
        r["pos"]: (r["mn"], r["mx"])
        for r in similarity.sq8_corpus_stats(emb).collect()
    }
    batch = emb.limit(50).select(
        "vec_id", "label",
        F.transform("embedding", lambda x: x.cast("double") + F.lit(0.2)).alias("embedding"),
    )
    row = similarity.batch_drift_metrics(batch, centroids, stats).head()
    B = np.stack([np.asarray(r[0]) for r in batch.select("embedding").collect()])
    C = np.asarray(centroids)
    # same assignment metric as the operator: dot / ||x|| argmax
    norms = np.maximum(np.linalg.norm(B, axis=1), 1e-12)
    cells = ((B @ C.T) / norms[:, None]).argmax(axis=1)
    want_dist = float(np.linalg.norm(B - C[cells], axis=1).mean())
    mn = np.array([stats[i][0] for i in range(B.shape[1])])
    mx = np.array([stats[i][1] for i in range(B.shape[1])])
    want_clip = float(((B < mn) | (B > mx)).mean())
    assert abs(row["mean_assign_dist"] - want_dist) < 1e-4
    assert abs(row["clip_frac"] - want_clip) < 1e-4
    assert row["n"] == 50


# --- filtered vector search (r12) -------------------------------------------

def test_exact_filtered_knn_multi_matches_numpy_per_label(spark, tables):
    """Ground truth check: per-query top-k within the query's own label
    class equals brute-force over the label-filtered corpus."""
    emb = tables["embeddings"]
    got = similarity.exact_filtered_knn_multi(spark, emb, k=5)
    by_q = {}
    for r in got.collect():
        by_q.setdefault(r["qid"], []).append(r["vec_id"])
    rows = emb.select("vec_id", "label", "embedding").collect()
    vecs = {r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64) for r in rows}
    labs = {r["vec_id"]: r["label"] for r in rows}
    for qid in similarity.ANN_GATE_QUERY_IDS:
        q = vecs[qid]
        sims = sorted(
            (
                (-round(float(v @ q / (np.linalg.norm(v) * np.linalg.norm(q))), 4), vid)
                for vid, v in vecs.items()
                if vid != qid and labs[vid] == labs[qid]
            )
        )[:5]
        assert sorted(by_q[qid]) == sorted(vid for _, vid in sims)


def test_prefilter_fills_k_postfilter_underfills(spark, tables):
    """The pre/post-filter contract itself: the pre-filter plan returns
    k matching rows per query; post-filtering the unfiltered top-k
    keeps only ~selectivity*k (label selectivity ~10% here)."""
    emb = tables["embeddings"]
    n_q = len(similarity.ANN_GATE_QUERY_IDS)
    pre = similarity.ivf_filtered_knn_multi(
        spark, emb, k=10, n_cells=8, n_probe=4, prefilter=True
    ).collect()
    assert len(pre) == n_q * 10  # fills k for every query
    labs = {
        r["vec_id"]: r["label"]
        for r in emb.select("vec_id", "label").collect()
    }
    for r in pre:  # every returned row satisfies the predicate
        assert labs[r["vec_id"]] == labs[r["qid"]]
    post = similarity.ivf_filtered_knn_multi(
        spark, emb, k=10, n_cells=8, n_probe=4, prefilter=False
    ).collect()
    assert len(post) < n_q * 10 * 0.5  # measured ~0.1*k fill


def test_pruned_probe_predicate_inside_cells(spark, tables, tmp_path):
    """ivf_sq8_knn_pruned(predicate=...): the filter lands inside the
    probed-cell scan (pushed to the parquet source) and the result is
    the top-k of the probed cells' matching members — equal to probing
    with allowed_ids of the same class, and to post-filtering the FULL
    probed candidate ranking (no-limit) by the label."""
    emb = tables["embeddings"]
    path = str(tmp_path / "fividx")
    centroids, stats = similarity.write_ivf_sq8_index(emb, path, n_cells=8)
    q = emb.filter(F.col("vec_id") == 0).head()["embedding"]
    ql = emb.filter(F.col("vec_id") == 0).head()["label"]
    by_pred = similarity.ivf_sq8_knn_pruned(
        spark, path, centroids, stats, [float(x) for x in q],
        k=5, n_probe=4, exclude_vec_id=0, predicate=F.col("label") == ql,
    )
    # predicate reaches the scan: PushedFilters mentions label
    from data_lake_for_e_commerce_analytics_spark.plans.explain import plan_string

    plan = plan_string(by_pred)
    assert "label" in plan and "PushedFilters" in plan
    got = [(r["vec_id"], r["sqdist"]) for r in by_pred.collect()]
    assert len(got) == 5
    allowed = emb.filter(F.col("label") == ql).select("vec_id")
    by_ids = similarity.ivf_sq8_knn_pruned(
        spark, path, centroids, stats, [float(x) for x in q],
        k=5, n_probe=4, exclude_vec_id=0, allowed_ids=allowed,
    ).collect()
    assert got == [(r["vec_id"], r["sqdist"]) for r in by_ids]
    # oracle within probed cells: rank everything, then filter
    full = similarity.ivf_sq8_knn_pruned(
        spark, path, centroids, stats, [float(x) for x in q],
        k=10**6, n_probe=4, exclude_vec_id=0,
    ).collect()
    labs = {r["vec_id"]: r["label"] for r in emb.select("vec_id", "label").collect()}
    want = [(r["vec_id"], r["sqdist"]) for r in full if labs[r["vec_id"]] == ql][:5]
    assert got == want


def test_ivf_filtered_knn_both_matches_individual_plans(spark, tables):
    """The single-pass both-plans form (r13) is row-identical to the
    two separate ivf_filtered_knn_multi calls it replaces in the
    filtered_ann_recall gate."""
    emb = tables["embeddings"]
    both = similarity.ivf_filtered_knn_both(
        spark, emb, k=10, n_cells=8, n_probe=4
    ).collect()
    pre_ref = {
        (r["qid"], r["vec_id"])
        for r in similarity.ivf_filtered_knn_multi(
            spark, emb, k=10, n_cells=8, n_probe=4, prefilter=True
        ).collect()
    }
    post_ref = {
        (r["qid"], r["vec_id"])
        for r in similarity.ivf_filtered_knn_multi(
            spark, emb, k=10, n_cells=8, n_probe=4, prefilter=False
        ).collect()
    }
    got_pre = {(r["qid"], r["vec_id"]) for r in both if r["plan"] == "pre"}
    got_post = {(r["qid"], r["vec_id"]) for r in both if r["plan"] == "post"}
    assert got_pre == pre_ref
    assert got_post == post_ref
    assert len(got_pre) > len(got_post)  # the under-fill the gate pins


def test_mmr_topk_matches_numpy_greedy(spark, tables):
    """MMR contract (r13): the selection equals a pure-numpy greedy
    over the same quantized pool — first pick = argmax relevance, each
    later pick = argmax(rel_m - max sim_m to selected), ties on
    vec_id."""
    emb = tables["embeddings"]
    q = np.asarray(
        emb.filter(F.col("vec_id") == 0).head()["embedding"], dtype=np.float64
    )
    rows = emb.filter(F.col("vec_id") != 0).select(
        "vec_id", "label", "embedding"
    ).collect()
    vecs = {
        r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64) for r in rows
    }
    rel = {
        vid: int(round(float(v @ q / (np.linalg.norm(v) * np.linalg.norm(q))) * 10000))
        for vid, v in vecs.items()
    }
    pool = sorted(rel.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    pool_ids = [vid for vid, _ in pool]

    def sim(a, b):
        va, vb = vecs[a], vecs[b]
        return int(round(float(va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb))) * 10000))

    sel, want = [], []
    while len(sel) < 5:
        best = None
        for vid in pool_ids:
            if vid in sel:
                continue
            div = max((sim(vid, s) for s in sel), default=0)
            key = (-(rel[vid] - div), vid)
            if best is None or key < best[0]:
                best = (key, vid, rel[vid], div)
        sel.append(best[1])
        want.append((len(sel), best[1], best[2], best[3]))

    got = similarity.mmr_topk(emb, list(q), pool=20, m=5, exclude_vec_id=0).collect()
    assert [
        (r["mmr_rank"], r["vec_id"], r["rel_m"], r["div_m"]) for r in got
    ] == want


def test_mmr_diversity_binds(spark):
    """A near-duplicate of the top pick must be displaced by a less
    relevant but diverse candidate — the point of MMR."""
    rows = [
        (1, 0, [1.0, 0.2, 0.0]),      # top relevance (rel 9956)
        (2, 0, [1.0, 0.18, 0.02]),    # near-dup of 1 (sim 9996), rel 9934
        (3, 0, [0.8, 0.55, 0.0]),     # diverse (sim 9191), rel 9521
        (4, 0, [0.1, 0.2, 0.9]),      # diverse, low relevance (1653)
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<double>"
    )
    q = [1.0, 0.3, 0.0]
    # step-2 scores: v2 = 9934 - 9996 = -62, v3 = 9521 - 9191 = 330
    got = similarity.mmr_topk(emb, q, pool=4, m=2).collect()
    assert [r["vec_id"] for r in got] == [1, 3]
    # plain relevance order would have picked the near-dup
    plain = similarity.brute_force_knn(emb, q, k=2).collect()
    assert [r["vec_id"] for r in plain] == [1, 2]


def test_np_kernel_parity(spark, tables):
    """The r14 Arrow/numpy quantization kernels must be BIT-EXACT twins
    of the Catalyst expression forms they replaced (pq_codes_np /
    sq8_codes_np / _np_sq8_dist / _np_adc_scores vs _pq_subspace_code /
    _sq8_code_col / the zip_with-aggregate folds) — every float64 op
    replays the same IEEE order, every integer fold is exact. Checked
    value-for-value over the full test corpus, raw and residual."""
    from data_lake_for_e_commerce_analytics_spark.functions.vector import (
        to_double_array,
    )

    emb = tables["embeddings"]
    n_codewords, m_subspaces = 16, 8
    cb_rows = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in emb.filter(F.col("vec_id") < n_codewords)
        .select("vec_id", "embedding")
        .collect()
    }
    dim = len(cb_rows[0])
    sub = dim // m_subspaces
    vecd = to_double_array("embedding")

    # 1. raw PQ encode
    expr = emb.select(
        "vec_id",
        F.array(
            *[
                similarity._pq_subspace_code(
                    vecd, cb_rows, n_codewords, m * sub, sub
                )
                for m in range(m_subspaces)
            ]
        ).alias("pcode"),
    )
    want = {r["vec_id"]: list(r["pcode"]) for r in expr.collect()}
    got = {
        r["vec_id"]: list(r["pcode"])
        for r in similarity.pq_codes_np(
            emb, cb_rows, n_codewords, m_subspaces
        ).collect()
    }
    assert got == want

    # 2. SQ8 encode
    stats = {
        r["pos"]: (r["mn"], r["mx"])
        for r in similarity.sq8_corpus_stats(emb).collect()
    }
    mn_lit = F.array(*[F.lit(float(stats[i][0])) for i in range(dim)])
    scale_lit = F.array(
        *[F.lit(float(stats[i][1]) - float(stats[i][0])) for i in range(dim)]
    )
    want_sq8 = {
        r["vec_id"]: list(r["code"])
        for r in emb.select(
            "vec_id",
            similarity._sq8_code_col(vecd, mn_lit, scale_lit).alias("code"),
        ).collect()
    }
    coded_np = similarity.sq8_codes_np(emb, stats)
    got_sq8 = {r["vec_id"]: list(r["code"]) for r in coded_np.collect()}
    assert got_sq8 == want_sq8

    # 3. integer SQ8 distance fold (query = vec 0's code)
    q0 = want_sq8[0]
    joined = coded_np.filter(F.col("vec_id") != 0).select(
        F.lit(0).cast("long").alias("qid"),
        "vec_id",
        "code",
        F.array(*[F.lit(int(c)) for c in q0]).alias("qcode"),
    )
    got_d = {
        r["vec_id"]: r["sqdist"]
        for r in similarity._np_sq8_dist(joined).collect()
    }
    want_d = {
        r["vec_id"]: r["sqdist"]
        for r in joined.select(
            "vec_id",
            F.aggregate(
                F.zip_with(
                    F.col("code"),
                    F.col("qcode"),
                    lambda a, b: (a - b).cast("long") * (a - b),
                ),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias("sqdist"),
        ).collect()
    }
    assert got_d == want_d

    # 4. flat ADC fan-out vs the element_at fold
    qvec = [float(x) for x in cb_rows[1]]
    flat = []
    for m in range(m_subspaces):
        flat.extend(
            similarity._pq_query_table(qvec, cb_rows, n_codewords, m * sub, sub)
        )
    pc_np = similarity.pq_codes_np(emb, cb_rows, n_codewords, m_subspaces)
    got_adc = {
        r["vec_id"]: r["adc"]
        for r in similarity._np_adc_scores(
            pc_np, [(1, flat)], n_codewords, m_subspaces, by_cell=False
        ).collect()
    }
    qd_lit = F.array(*[F.lit(int(x)) for x in flat])
    want_adc = {
        r["vec_id"]: r["adc"]
        for r in expr.filter(F.col("vec_id") != 1)
        .select(
            "vec_id",
            F.aggregate(
                F.zip_with(
                    F.col("pcode"),
                    F.sequence(F.lit(0), F.lit(m_subspaces - 1)),
                    lambda c, m: F.element_at(
                        qd_lit, (m * n_codewords + c).cast("int")
                    ),
                ),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias("adc"),
        )
        .collect()
    }
    assert got_adc == want_adc


def test_cosine_kernel_parity(spark, tables):
    """The r15 Arrow/numpy cosine kernel must be a BIT-EXACT twin of the
    cosine_similarity HOF expression it replaced (cosine_scores_np vs
    _cosine_scored_expr): the three folds (a.b, a.a, b.b) replay the
    zip_with + aggregate left-to-right IEEE order, sqrt/multiply/divide
    are single correctly-rounded ops on both paths, and a
    zero-denominator row yields NULL on both. Compared RAW (unrounded)
    over the full test corpus x 3 query vectors including a zero
    vector, plus the JVM-side round(4) the callers apply."""
    emb = tables["embeddings"]
    qvecs = [
        (int(q), [float(x) for x in r])
        for q, r in [
            (0, emb.filter(F.col("vec_id") == 0).head()["embedding"]),
            (31, emb.filter(F.col("vec_id") == 31).head()["embedding"]),
        ]
    ]
    dim = len(qvecs[0][1])
    qvecs.append((999, [0.0] * dim))  # zero query -> NULL cosine branch
    qdf = spark.createDataFrame(qvecs, "qid long, qvec array<double>")
    joined = emb.crossJoin(F.broadcast(qdf)).filter(
        F.col("vec_id") != F.col("qid")
    )

    def key(rows):
        return {
            (r["qid"], r["vec_id"]): (r["cos"], r["rcos"]) for r in rows
        }

    want = key(
        similarity._cosine_scored_expr(joined)
        .withColumn("rcos", F.round("cos", 4))
        .collect()
    )
    got = key(
        similarity.cosine_scores_np(joined)
        .withColumn("rcos", F.round("cos", 4))
        .collect()
    )
    assert got == want
    # the zero-norm query really exercised the NULL branch
    assert all(v == (None, None) for (q, _), v in got.items() if q == 999)

    # passthrough columns survive with their values and types
    j2 = joined.withColumn("match", F.col("vec_id") % 2 == 0)
    got_m = {
        (r["qid"], r["vec_id"]): r["match"]
        for r in similarity.cosine_scores_np(j2, passthrough=("match",)).collect()
    }
    assert all(got_m[(q, v)] == (v % 2 == 0) for q, v in got_m)


def test_pq_trainer_kernel_parity(spark, tables):
    """The r15 PQ-trainer/quantization-error Arrow kernels must be
    BIT-EXACT twins of the expression forms they replaced
    (pq_train_codebooks vs _pq_train_codebooks_expr,
    pq_quantization_error vs _pq_quantization_error_expr): the grid
    quantization replays floor(double * scale) in IEEE order, every
    distance/update fold is exact integer arithmetic (int64 per batch,
    arbitrary precision across), assignment ties break to the lowest
    codeword id on both paths. Checked at the gate config (4x4) and at
    the production config (16x8), 1 and 2 Lloyd rounds."""
    emb = tables["embeddings"]
    for n_cw, m_sub, iters in ((4, 4, 2), (4, 4, 1), (16, 8, 2)):
        want = similarity._pq_train_codebooks_expr(
            emb, n_codewords=n_cw, m_subspaces=m_sub, iters=iters
        )
        got = similarity.pq_train_codebooks(
            emb, n_codewords=n_cw, m_subspaces=m_sub, iters=iters
        )
        assert got == want, (n_cw, m_sub, iters)
    trained, sampled = similarity.pq_train_codebooks_grid(
        emb, n_codewords=4, m_subspaces=4, iters=2
    )
    for grid in (trained, sampled):
        assert similarity.pq_quantization_error(
            emb, grid, m_subspaces=4
        ) == similarity._pq_quantization_error_expr(emb, grid, m_subspaces=4)


def test_frozen_geometry_kernel_parity(spark, tables):
    """The r15 frozen-geometry Arrow kernels must be BIT-EXACT twins of
    the expression forms (encode_frozen_geometry vs
    _encode_frozen_geometry_expr; batch_drift_metrics vs
    _batch_drift_metrics_expr): assignment dots and norms replay the
    sequential per-dimension float64 folds, SQ8 codes replay the
    per-dim clamped-floor arithmetic, argmax ties break to the first
    maximum on both paths, and the drift reduction stays the same Spark
    aggregate over identical per-row values."""
    import numpy as np

    emb = tables["embeddings"]
    assignments, centroids = similarity.build_ivf_index(emb, n_cells=8, lloyd_iters=1)
    stats = {
        r["pos"]: (r["mn"], r["mx"])
        for r in similarity.sq8_corpus_stats(emb).collect()
    }
    want = {
        r["vec_id"]: (list(r["code"]), r["cell"])
        for r in similarity._encode_frozen_geometry_expr(emb, centroids, stats).collect()
    }
    got = {
        r["vec_id"]: (list(r["code"]), r["cell"])
        for r in similarity.encode_frozen_geometry(emb, centroids, stats).collect()
    }
    assert got == want
    w = similarity._batch_drift_metrics_expr(emb, centroids, stats).head()
    g = similarity.batch_drift_metrics(emb, centroids, stats).head()
    assert (g["mean_assign_dist"], g["clip_frac"], g["n"]) == (
        w["mean_assign_dist"], w["clip_frac"], w["n"]
    )
    # drifted batch (out-of-grid components exercise the clip count)
    drifted = emb.select(
        "vec_id", "label",
        F.transform("embedding", lambda x: x.cast("double") + F.lit(0.3)).alias("embedding"),
    )
    w2 = similarity._batch_drift_metrics_expr(drifted, centroids, stats).head()
    g2 = similarity.batch_drift_metrics(drifted, centroids, stats).head()
    assert (g2["mean_assign_dist"], g2["clip_frac"], g2["n"]) == (
        w2["mean_assign_dist"], w2["clip_frac"], w2["n"]
    )
    assert g2["clip_frac"] > 0
