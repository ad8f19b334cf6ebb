"""Dedup operator properties: candidate pairs are real (verified against
exact similarity), keep-first is idempotent, LSH recall is sane."""

import pytest
from pyspark.sql import functions as F

from data_lake_for_e_commerce_analytics_spark.operators import dedup


def test_exact_dedup_groups_partition_docs(tables):
    docs = tables["documents"]
    groups = dedup.exact_dedup_groups(docs)
    assert groups.agg(F.sum("group_size")).collect()[0][0] == docs.count()


def test_exact_dedup_keep_first_idempotent(tables):
    docs = tables["documents"]
    once = dedup.exact_dedup_keep_first(docs)
    twice = dedup.exact_dedup_keep_first(once)
    assert once.count() == twice.count()
    # keeps the minimum doc_id of each group
    keepers = {r["keeper_doc_id"] for r in dedup.exact_dedup_groups(docs).collect()}
    assert {r["doc_id"] for r in once.collect()} == keepers


def test_minhash_pairs_are_true_near_dups(tables):
    """Every LSH candidate surviving the exact-Jaccard filter must truly
    exceed the threshold (no false positives by construction)."""
    docs = tables["documents"]
    pairs = dedup.minhash_lsh_pairs(docs, jaccard_threshold=0.3).collect()
    for r in pairs:
        assert r["jaccard"] >= 0.3
        assert r["doc_a"] < r["doc_b"]


def test_minhash_signature_shape(tables):
    sigs = dedup.minhash_signatures(tables["documents"], num_hashes=16).limit(5).collect()
    for r in sigs:
        assert len(r["signature"]) == 16
    # signatures must differ across seeds for a non-trivial doc
    # (guards the regression where every seed produced the same hash)
    assert any(len(set(r["signature"])) > 1 for r in sigs)


def test_simhash_near_identical_fingerprints(spark, tables):
    """Two texts differing in one token out of many must be within a few
    Hamming bits; unrelated texts far apart."""
    base = "the quick brown fox jumps over the lazy dog " * 5
    df = spark.createDataFrame(
        [(1, base + "alpha"), (2, base + "beta"), (3, "completely different words entirely unrelated content here")],
        ["doc_id", "text"],
    )
    # mask to unsigned 64-bit: Spark longs are signed and bin() on a
    # negative XOR miscounts bits
    fps = {
        r["doc_id"]: r["simhash"] & 0xFFFFFFFFFFFFFFFF
        for r in dedup.simhash_fingerprints(df).collect()
    }
    ham_near = bin(fps[1] ^ fps[2]).count("1")
    ham_far = bin(fps[1] ^ fps[3]).count("1")
    assert ham_near < ham_far
    assert ham_near <= 16


def test_ngram_jaccard_pairs_symmetric_threshold(tables):
    pairs = dedup.ngram_jaccard_pairs(tables["documents"], threshold=0.2).collect()
    for r in pairs:
        assert r["jaccard"] >= 0.2
        assert r["doc_a"] < r["doc_b"]


def test_embedding_near_dup_threshold(tables):
    pairs = dedup.embedding_near_dup_pairs(tables["embeddings"], threshold=0.3).collect()
    for r in pairs:
        assert r["cosine"] >= 0.3


def test_embedding_near_dup_exact_matches_float_off_boundary(tables):
    """The exact quantized twin must agree with the float variant on
    every pair whose cosine sits clearly away from the threshold —
    quantization only moves cosines by ~1e-4, so disagreements can only
    live in a thin boundary band."""
    tau = 0.35
    emb = tables["embeddings"]
    f = {
        (r["vec_a"], r["vec_b"]): r["cosine"]
        for r in dedup.embedding_near_dup_pairs(emb, threshold=tau).collect()
    }
    e = {
        (r["vec_a"], r["vec_b"])
        for r in dedup.embedding_near_dup_pairs_exact(emb, tau_bp=3500).collect()
    }
    band = 1e-3
    for pair, cos in f.items():
        if cos >= tau + band:
            assert pair in e, pair
    # anything the exact variant adds must be boundary-adjacent: its
    # float cosine may sit just under tau, but never below tau - band
    near = {
        (r["vec_a"], r["vec_b"])
        for r in dedup.embedding_near_dup_pairs(emb, threshold=tau - band).collect()
    }
    assert (e - set(f)) <= near


def test_embedding_near_dup_exact_sql_equals_pandas_kernel(tables):
    """The pure-JVM exact fold and the applyInPandas exact kernel are
    the same contract — pair-for-pair, dot-for-dot (transitively ties
    the JVM path to the registered DuckDB oracle)."""
    emb = tables["embeddings"]
    pk = sorted(
        map(tuple, dedup.embedding_near_dup_pairs_exact(emb, tau_bp=3500).collect())
    )
    jvm = sorted(
        map(
            tuple,
            dedup.embedding_near_dup_pairs_exact_sql(emb, tau_bp=3500).collect(),
        )
    )
    assert pk == jvm
    assert pk  # non-vacuous


def test_embedding_near_dup_exact_partitioning_invariant(tables):
    """The whole contract: the quantized pair set is a function of the
    bytes alone — repartitioning must not move a single pair."""
    emb = tables["embeddings"]
    base = sorted(
        map(tuple, dedup.embedding_near_dup_pairs_exact(emb, tau_bp=3500).collect())
    )
    shuffled = sorted(
        map(
            tuple,
            dedup.embedding_near_dup_pairs_exact(
                emb.repartition(7, "vec_id"), tau_bp=3500
            ).collect(),
        )
    )
    assert base == shuffled
    assert base  # non-vacuous on the fixture corpus


def test_no_cross_join_in_lsh_plan(tables):
    """The scale guarantee: near-dup candidate generation must be an
    equi-join on bucket keys, never a cartesian product."""
    plan = (
        dedup.minhash_lsh_pairs(tables["documents"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_prefix_filtered_jaccard_equals_plain(tables):
    """The PPJoin-style prefix filter (Bayardo'07) is lossless: it must
    produce exactly the pairs of the plain blocked join."""
    plain = dedup.ngram_jaccard_pairs(tables["documents"], threshold=0.5, shingle_n=2)
    pref = dedup.ngram_jaccard_pairs_prefix(tables["documents"], threshold=0.5, shingle_n=2)
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, pref.collect()))


def test_simhash_multiprobe_equals_brute_force(tables):
    """Pigeonhole multiprobe blocking has PROVABLY perfect recall for
    hamming <= 3 with 4 blocks: its output must equal the all-pairs
    Hamming join exactly (measured, not asserted from theory)."""
    docs = tables["documents"]
    multi = sorted(map(tuple, dedup.simhash_near_dup_pairs_multiprobe(docs).collect()))
    brute = sorted(map(tuple, dedup.simhash_all_pairs_hamming(docs).collect()))
    assert multi == brute
    assert len(multi) > 0  # corpus has known near-dups; empty would be vacuous


def test_simhash_single_prefix_is_subset_of_multiprobe(tables):
    """Single-prefix blocking can only lose pairs, never invent them."""
    docs = tables["documents"]
    single = set(map(tuple, dedup.simhash_near_dup_pairs(docs).collect()))
    multi = set(map(tuple, dedup.simhash_near_dup_pairs_multiprobe(docs).collect()))
    assert single <= multi


def test_portable_minhash_pairs_are_true_near_dups(tables):
    """md5-variant emits only pairs truly above the threshold (exact
    Jaccard filter) — same guarantee as the xxhash64 production path."""
    pairs = dedup.minhash_lsh_pairs_portable(
        tables["documents"], jaccard_threshold=0.3
    ).collect()
    assert len(pairs) > 0
    for r in pairs:
        assert r["jaccard"] >= 0.3
        assert r["doc_a"] < r["doc_b"]


def test_portable_simhash_agrees_with_production_on_near_identical(spark):
    """Portable 32-bit and production 64-bit simhash must agree on the
    ordering near-identical < unrelated (different hash, same physics)."""
    base = "the quick brown fox jumps over the lazy dog " * 5
    df = spark.createDataFrame(
        [
            (1, base + "alpha"),
            (2, base + "beta"),
            (3, "completely different words entirely unrelated content here"),
        ],
        ["doc_id", "text"],
    )
    fps = {
        r["doc_id"]: r["simhash32"]
        for r in dedup.simhash_fingerprints_portable(df).collect()
    }
    ham_near = bin(fps[1] ^ fps[2]).count("1")
    ham_far = bin(fps[1] ^ fps[3]).count("1")
    assert ham_near < ham_far
    assert 0 <= fps[1] < (1 << 32)  # fits 32 bits, non-negative


def test_embedding_auto_subblocking_equals_plain(tables):
    """With max_block_rows far below every label's size, every label is
    forced through the blocked-matmul sub-block path — output must equal
    the single-block BLAS path exactly (same pairs, same cosines)."""
    emb = tables["embeddings"]
    plain = sorted(map(tuple, dedup.embedding_near_dup_pairs(emb, threshold=0.3).collect()))
    auto = sorted(
        map(
            tuple,
            dedup.embedding_near_dup_pairs_auto(
                emb, threshold=0.3, max_block_rows=7
            ).collect(),
        )
    )
    assert auto == plain
    assert len(plain) > 0  # corpus has known near-dups; empty would be vacuous


def test_embedding_auto_subblocking_small_path_identity(tables):
    """With a huge max_block_rows nothing sub-blocks: the auto variant
    must reduce to the plain per-label path."""
    emb = tables["embeddings"]
    plain = sorted(map(tuple, dedup.embedding_near_dup_pairs(emb, threshold=0.3).collect()))
    auto = sorted(
        map(
            tuple,
            dedup.embedding_near_dup_pairs_auto(
                emb, threshold=0.3, max_block_rows=10**6
            ).collect(),
        )
    )
    assert auto == plain


def test_connected_components_chain_and_island(spark):
    """A 5-node chain (needs several propagation rounds) plus a separate
    2-node island: every member gets the component-minimum id."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11)], ["doc_a", "doc_b"]
    )
    got = {
        (r["doc_id"], r["cluster_id"])
        for r in dedup.connected_components(pairs).collect()
    }
    assert got == {(1, 1), (2, 1), (3, 1), (4, 1), (5, 1), (10, 10), (11, 10)}


def test_connected_components_cluster_id_is_member(tables):
    """On real near-dup pairs: cluster ids are themselves members, and
    every paired doc is labeled exactly once."""
    pairs = dedup.ngram_jaccard_pairs(tables["documents"], threshold=0.5, shingle_n=2)
    labels = dedup.connected_components(pairs).collect()
    nodes = {r["doc_id"] for r in labels}
    paired = {r["doc_a"] for r in pairs.collect()} | {r["doc_b"] for r in pairs.collect()}
    assert nodes == paired
    assert len(labels) == len(nodes)
    by_cluster: dict = {}
    for r in labels:
        by_cluster.setdefault(r["cluster_id"], set()).add(r["doc_id"])
    for cid, members in by_cluster.items():
        assert cid == min(members)


def test_apply_dedup_keeps_one_per_cluster_and_singletons(spark, tables):
    from data_lake_for_e_commerce_analytics_spark.operators import dedup

    docs = tables["documents"]
    pairs = dedup.ngram_jaccard_pairs(docs, threshold=0.5, shingle_n=2)
    clusters = dedup.connected_components(pairs)
    survivors = dedup.apply_dedup(docs, clusters)

    n_docs = docs.count()
    n_clustered = clusters.count()
    n_clusters = clusters.select("cluster_id").distinct().count()
    # survivors = all docs minus non-keeper cluster members
    assert survivors.count() == n_docs - (n_clustered - n_clusters)
    # exactly the keeper (min id) of every cluster survives
    kept_ids = {r["doc_id"] for r in survivors.select("doc_id").collect()}
    for r in clusters.collect():
        if r["doc_id"] == r["cluster_id"]:
            assert r["doc_id"] in kept_ids
        else:
            assert r["doc_id"] not in kept_ids


def test_apply_dedup_ranked_keeps_best_quality(spark, tables):
    from data_lake_for_e_commerce_analytics_spark.operators import dedup, text

    docs = tables["documents"]
    scored = docs.join(text.quality_score(docs), "doc_id")
    pairs = dedup.ngram_jaccard_pairs(docs, threshold=0.5, shingle_n=2)
    clusters = dedup.connected_components(pairs)
    survivors = dedup.apply_dedup_ranked(scored, clusters, rank_col="quality")

    kept = {r["doc_id"] for r in survivors.select("doc_id").collect()}
    qual = {r["doc_id"]: r["quality"] for r in scored.select("doc_id", "quality").collect()}
    by_cluster = {}
    for r in clusters.collect():
        by_cluster.setdefault(r["cluster_id"], []).append(r["doc_id"])
    for cid, members in by_cluster.items():
        best = sorted(members, key=lambda d: (-qual[d], d))[0]
        assert best in kept
        for m in members:
            assert (m in kept) == (m == best)
    # same survivor COUNT as min-id keeper rule, different keepers allowed
    assert survivors.count() == docs.count() - sum(len(m) - 1 for m in by_cluster.values())


def test_simhash_self_join_reuses_fingerprint_exchange(tables):
    """Both sides of the multiprobe bucket self-join consume the same
    fingerprint aggregation; Spark must REUSE that exchange rather than
    recompute the 64-sum vote per branch. This is why the operator needs
    no localCheckpoint (measured at parity) — pin the property so the
    identical-subtree shape is not refactored away."""
    df = dedup.simhash_near_dup_pairs_multiprobe(tables["documents"])
    df.collect()  # AQE finalizes reuse decisions at execution
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in plan


def test_duplicate_passage_stats_matches_bruteforce(spark, tables):
    """Per-doc duplicated-span fractions must equal a driver-side
    recomputation from raw token spans (every position, repeats kept;
    a span is duplicated iff it appears in >= 2 distinct docs)."""
    docs = tables["documents"]
    got = {r["doc_id"]: r for r in dedup.duplicate_passage_stats(docs).collect()}
    raw = docs.select("doc_id", "text").collect()
    spans_by_doc = {}
    for r in raw:
        tk = r["text"].strip().lower().split()
        m = max(len(tk) - 4, 1)
        spans_by_doc[r["doc_id"]] = [" ".join(tk[i : i + 5]) for i in range(m)]
    owners = {}
    for d, spans in spans_by_doc.items():
        for s in set(spans):
            owners.setdefault(s, set()).add(d)
    assert set(got) == set(spans_by_doc)
    for d, spans in spans_by_doc.items():
        n_dup = sum(1 for s in spans if len(owners[s]) >= 2)
        assert got[d]["n_spans"] == len(spans)
        assert got[d]["n_dup_spans"] == n_dup
        assert abs(got[d]["dup_rate"] - round(n_dup / len(spans), 4)) < 1e-9


def test_duplicate_passage_stats_flags_injected_boilerplate(spark, tables):
    """Two otherwise-distinct docs sharing one pasted passage must both
    score dup_rate > 0; fully unique docs must stay at 0."""
    boiler = "all rights reserved contact us for more information today"
    rows = [
        (1, "alpha beta gamma delta epsilon zeta " + boiler),
        (2, "one two three four five six seven " + boiler),
        (3, "totally unique text with no shared passage at all here"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in dedup.duplicate_passage_stats(df).collect()}
    assert out[1]["n_dup_spans"] > 0 and out[2]["n_dup_spans"] > 0
    assert out[3]["n_dup_spans"] == 0 and out[3]["dup_rate"] == 0.0


def test_remove_duplicate_passages_cuts_only_repeats(spark):
    """Non-first occurrences of a repeated span are cut; the canonical
    first occurrence and unique text survive verbatim."""
    boiler = "all rights reserved contact us for more information"
    rows = [
        (1, "alpha beta gamma delta epsilon " + boiler),
        (2, boiler + " one two three four five six"),
        (3, "entirely unique text with no repeated passage at all"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in dedup.remove_duplicate_passages(df).collect()}
    # doc 1 holds the first occurrence (min doc_id): untouched
    assert out[1]["clean_text"] == rows[0][1]
    assert out[1]["n_removed"] == 0
    # doc 2 loses the pasted passage but keeps its unique tail
    assert boiler not in out[2]["clean_text"]
    assert "one two three four five six" in out[2]["clean_text"]
    assert out[2]["n_removed"] == len(boiler.split())
    # unique doc untouched
    assert out[3]["clean_text"] == rows[2][1]
    assert out[3]["n_removed"] == 0
    # conservation: kept + removed == original token count
    for d, (_, text) in zip((1, 2, 3), rows):
        kept = len(out[d]["clean_text"].split()) if out[d]["clean_text"] else 0
        assert kept + out[d]["n_removed"] == len(text.split())
        assert out[d]["n_tokens"] == len(text.split())


def test_incremental_dedup_index_roundtrip(spark, tables, tmp_path):
    """Path-backed probe (build_dedup_index -> incremental_dedup) must
    equal the frame form, exact dups of index docs must be flagged with
    the right match, and novel docs kept."""
    docs = tables["documents"]
    idx_src = docs.filter(F.col("doc_id") % 2 == 0)
    new_src = docs.filter(F.col("doc_id") % 2 == 1)
    path = str(tmp_path / "dedup_index")
    dedup.build_dedup_index(idx_src, path)
    via_path = dedup.incremental_dedup(spark, new_src, path).collect()
    idx_docs, idx_bands = dedup.dedup_index_frames(idx_src)
    via_frames = dedup.incremental_dedup_frames(new_src, idx_docs, idx_bands).collect()
    assert via_path == via_frames
    statuses = {r["doc_id"]: r for r in via_path}
    assert set(statuses) == {r["doc_id"] for r in new_src.select("doc_id").collect()}
    for r in via_path:
        assert (r["status"] == "kept") == (r["match_doc_id"] == -1)


def test_incremental_dedup_flags_exact_copy_of_index_doc(spark, tables):
    """A new doc that is a byte-copy of an index doc must come back
    exact_dup with that index doc as its match."""
    docs = tables["documents"].limit(50)
    some = docs.orderBy("doc_id").limit(1).collect()[0]
    new = spark.createDataFrame(
        [
            (100001, some["text"]),
            (100003, "a brand new never seen string of words xyzzy plugh"),
        ],
        ["doc_id", "text"],
    )
    idx_docs, idx_bands = dedup.dedup_index_frames(docs)
    out = {r["doc_id"]: r for r in dedup.incremental_dedup_frames(new, idx_docs, idx_bands).collect()}
    assert out[100001]["status"] == "exact_dup"
    assert out[100001]["match_doc_id"] == some["doc_id"]
    assert out[100003]["status"] == "kept"


def test_incremental_dedup_probes_broadcast_the_batch_side(spark, tables):
    """With a small ingest batch against a big index, both probe joins
    must resolve to broadcast joins (the index side never reshuffles) —
    the property that makes per-ingest dedup O(batch), not O(corpus)."""
    from data_lake_for_e_commerce_analytics_spark.plans.explain import plan_string

    docs = tables["documents"]
    idx_docs, idx_bands = dedup.dedup_index_frames(docs)
    batch = docs.filter(F.col("doc_id") < 5)
    out = dedup.incremental_dedup_frames(batch, idx_docs, idx_bands)
    out.collect()
    assert plan_string(out).count("BroadcastHashJoin") >= 2


def test_curate_corpus_stage_precedence(spark):
    """Each verdict fires at the right stage, in order: exact beats
    near, near beats quality, quality beats passage."""
    good = " ".join(f"tok{i}" for i in range(60))  # long, diverse: kept
    near_a = " ".join(f"word{i}" for i in range(50))
    near_b = near_a + " extra trailing bit"
    low_q = "dup " * 30  # repetitive -> low diversity score
    rows = [
        (1, good, "en", len(good)),
        (2, good, "en", len(good)),          # exact dup of 1
        (3, near_a, "en", len(near_a)),      # near-dup cluster keeper
        (4, near_b, "en", len(near_b)),      # near-dup non-keeper
        (5, low_q.strip(), "en", len(low_q.strip())),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang", "n_chars"])
    out = {r["doc_id"]: r["status"] for r in dedup.curate_corpus(df).collect()}
    assert out[1] == "kept"
    assert out[2] == "exact"
    assert out[3] == "kept"
    assert out[4] == "near"
    assert out[5] == "quality"


def test_source_overlap_bounds_and_full_duplicate(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (1, base, "en", "srcA", 0),
        (2, base, "en", "srcB", 0),          # full republish of srcA
        (3, "one two three four five six", "en", "srcC", 0),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source", "n_chars"])
    out = {(r["source_a"], r["source_b"]): r for r in dedup.source_overlap(df).collect()}
    assert out[("srcA", "srcB")]["jaccard"] == 1.0  # identical shingle sets
    assert ("srcA", "srcC") not in out and ("srcB", "srcC") not in out  # disjoint
    for r in out.values():
        assert 0.0 <= r["jaccard"] <= 1.0
        assert r["shared_fp"] <= min(r["n_a"], r["n_b"])


def test_source_overlap_pair_count_on_corpus(tables):
    srcs = tables["documents"].select("source").distinct().count()
    out = dedup.source_overlap(tables["documents"]).collect()
    assert len(out) <= srcs * (srcs - 1) // 2
    assert all(r["source_a"] < r["source_b"] for r in out)


def test_curate_web_corpus_stage_precedence(spark, tables):
    from data_lake_for_e_commerce_analytics_spark.operators import dedup as D
    from data_lake_for_e_commerce_analytics_spark.operators import urls as U

    docs = tables["documents"]
    verdicts = D.curate_web_corpus(docs).collect()
    assert len(verdicts) == docs.count()
    by_status = {}
    for r in verdicts:
        by_status.setdefault(r["status"], set()).add(r["doc_id"])
    # the 'url' set is exactly the complement of the URL-dedup keepers
    keepers = {
        r["doc_id"] for r in U.url_dedup(U.synth_urls(docs)).collect()
    }
    assert by_status.get("url", set()) == {
        r["doc_id"] for r in docs.select("doc_id").collect()
    } - keepers
    # over the keepers, the verdicts equal the plain text pipeline
    from pyspark.sql import functions as F

    survivors = docs.join(
        spark.createDataFrame([(k,) for k in keepers], "doc_id long"),
        "doc_id",
        "left_semi",
    )
    plain = {r["doc_id"]: r["status"] for r in D.curate_corpus(survivors).collect()}
    web = {r["doc_id"]: r["status"] for r in verdicts if r["status"] != "url"}
    assert web == plain


def test_banded_hamming_group_pairs_recovers_enumeration(spark, tables):
    """The clique-collapsed relation expands EXACTLY to the enumerating
    join: sum over self rows of n*(n-1)/2 plus cross rows of n_a*n_b
    equals the banded pair count, and every enumerated pair's
    fingerprints map to a (rep_a, rep_b) row (or a shared group)."""
    from data_lake_for_e_commerce_analytics_spark.operators import dedup, multimodal

    docs = tables["documents"].filter(F.col("doc_id") < 150)
    media = multimodal.synthesize_ppm_images(docs)
    copies = multimodal.hflip_images(
        media.filter(F.col("media_id") % 7 == 0)
    ).withColumn("media_id", F.col("media_id") + F.lit(1000000))
    fps = multimodal.image_phash(media.unionByName(copies))

    enum_n = dedup.banded_hamming_pairs(
        fps, max_hamming=2, n_blocks=4, id_col="media_id", fp_col="phash"
    ).count()
    grouped = dedup.banded_hamming_group_pairs(
        fps, max_hamming=2, n_blocks=4, id_col="media_id", fp_col="phash"
    ).collect()
    implied = 0
    for r in grouped:
        if r["rep_a"] == r["rep_b"]:
            assert r["hamming"] == 0 and r["n_a"] == r["n_b"] > 1
            implied += r["n_a"] * (r["n_a"] - 1) // 2
        else:
            assert 1 <= r["hamming"] <= 2
            implied += r["n_a"] * r["n_b"]
    assert implied == enum_n


def test_connected_components_long_chain_converges(spark):
    """r12 regression: a 200-node PATH graph (diameter 199 >> the old
    25-round budget) must still collapse to ONE component — pointer
    jumping makes rounds O(log diameter), and non-convergence raises
    instead of returning silently split components."""
    from data_lake_for_e_commerce_analytics_spark.operators import dedup as dd

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(199)], "doc_a long, doc_b long"
    )
    cc = dd.connected_components(
        pairs, max_iter=25, small_graph_max_edges=0
    ).collect()
    assert len(cc) == 200
    assert {r["cluster_id"] for r in cc} == {0}

    import pytest

    with pytest.raises(RuntimeError, match="did not converge"):
        dd.connected_components(pairs, max_iter=2, small_graph_max_edges=0)


def test_connected_components_exact_boundary_convergence(spark):
    """ADVICE r12: a graph whose labels reach the fixpoint exactly in
    round max_iter must NOT be reported as non-convergent — the
    zero-change confirmation gets its own extra round. The 3-node path
    fixpoints in round 1 (neighbor min + pointer jump label node 3),
    so max_iter=1 must succeed."""
    from data_lake_for_e_commerce_analytics_spark.operators import dedup as dd

    pairs = spark.createDataFrame([(1, 2), (2, 3)], "doc_a long, doc_b long")
    cc = dd.connected_components(
        pairs, max_iter=1, small_graph_max_edges=0
    ).collect()
    assert {r["cluster_id"] for r in cc} == {1}
    assert len(cc) == 3


def test_connected_components_small_graph_path_equality(spark):
    """r15: the scale-adaptive driver-side union-find (taken when the
    edge relation fits ``small_graph_max_edges``) must return EXACTLY
    the relation the distributed pointer-jumping loop returns — same
    rows, same (doc_id, cluster_id) schema, same doc_id ordering —
    on a graph mixing a long chain, a triangle, a star and an isolated
    pair."""
    from data_lake_for_e_commerce_analytics_spark.operators import dedup as dd

    raw = (
        [(i, i + 1) for i in range(10, 30)]          # chain
        + [(100, 101), (101, 102), (102, 100)]       # triangle
        + [(200, 201), (200, 202), (200, 203)]       # star
        + [(300, 301)]                               # isolated pair
        + [(101, 100), (12, 11)]                     # dup / reversed edges
    )
    pairs = spark.createDataFrame(raw, "doc_a long, doc_b long")
    small = dd.connected_components(pairs).collect()          # driver path
    big = dd.connected_components(pairs, small_graph_max_edges=0).collect()
    assert [tuple(r) for r in small] == [tuple(r) for r in big]
    assert small[0].asDict().keys() == {"doc_id", "cluster_id"}
