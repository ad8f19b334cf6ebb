"""Retrieval operators: BM25 exactness vs a pure-Python reference,
RRF fusion semantics, hybrid lexical+vector composition."""

import math

from pyspark.sql import functions as F

from data_lake_for_e_commerce_analytics_spark.operators import retrieval

QUERY = "spark join fast data"


def _py_bm25(docs, query, k1=1.2, b=0.75):
    """Reference BM25 with the same micro-quantization contract."""
    toks = {d: t.split() for d, t in docs.items()}
    n = len(docs)
    avgdl = sum(len(t) for t in toks.values()) / n
    q_terms = sorted(set(query.split()))
    df = {t: sum(1 for tt in toks.values() if t in tt) for t in q_terms}
    out = {}
    for d, tt in toks.items():
        micro = 0
        hits = 0
        for t in q_terms:
            tf = tt.count(t)
            if tf == 0 or df[t] == 0:
                continue
            hits += 1
            idf = math.log((n - df[t] + 0.5) / (df[t] + 0.5) + 1.0)
            s = idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * len(tt) / avgdl))
            micro += int(round(s * 1_000_000.0))
        if hits:
            out[d] = (round(micro / 1_000_000.0, 4), hits)
    return out


def test_bm25_matches_python_reference(spark, tables):
    docs = {
        r["doc_id"]: r["text"]
        for r in tables["documents"].select("doc_id", "text").collect()
    }
    want = _py_bm25(docs, QUERY)
    got = retrieval.bm25_topk(tables["documents"], QUERY, k=10).collect()
    assert len(got) == 10
    want_top = sorted(want.items(), key=lambda kv: (-kv[1][0], kv[0]))[:10]
    assert [(r["doc_id"], r["bm25"], r["n_terms_hit"]) for r in got] == [
        (d, s, h) for d, (s, h) in want_top
    ]


def test_bm25_empty_query_raises(spark, tables):
    import pytest

    with pytest.raises(ValueError):
        retrieval.bm25_topk(tables["documents"], "   ".strip(), k=5)


def test_rrf_fusion_semantics(spark):
    """A doc ranked well in BOTH lists must beat single-list docs; a
    doc present in only one list still scores its one term."""
    a = spark.createDataFrame([(1, 1), (2, 2), (3, 3)], ["doc_id", "rank"])
    b = spark.createDataFrame([(2, 1), (9, 2)], ["doc_id", "rank"])
    got = {r["doc_id"]: r for r in retrieval.rrf_fuse(a, b, k=10).collect()}
    assert set(got) == {1, 2, 3, 9}
    assert got[2]["rrf"] > got[1]["rrf"] > got[3]["rrf"]
    assert got[9]["rank_a"] is None and got[9]["rank_b"] == 2
    expect2 = round(
        (round(1e6 / 62) + round(1e6 / 61)) / 1e6, 6
    )
    assert got[2]["rrf"] == expect2


def test_hybrid_search_composes_both_signals(spark, tables):
    got = retrieval.hybrid_search(
        spark,
        tables["documents"],
        tables["embeddings"],
        QUERY,
        query_vec_id=0,
        k=10,
        pool=20,
    ).collect()
    assert len(got) == 10
    # fused ranks: anything in both pools must carry both rank columns
    both = [r for r in got if r["rank_a"] is not None and r["rank_b"] is not None]
    only = [r for r in got if (r["rank_a"] is None) != (r["rank_b"] is None)]
    assert len(both) + len(only) == 10
    rrfs = [r["rrf"] for r in got]
    assert rrfs == sorted(rrfs, reverse=True)


def _py_phrase_counts(docs, phrase):
    terms = phrase.split()
    out = {}
    for doc_id, text in docs:
        toks = text.strip().split()
        n = sum(
            1
            for p in range(len(toks) - len(terms) + 1)
            if toks[p : p + len(terms)] == terms
        )
        if n:
            out[doc_id] = n
    return out


def test_phrase_match_matches_python_reference(spark, tables):
    docs = [(r["doc_id"], r["text"]) for r in tables["documents"].collect()]
    phrase = "stream table hash"
    want = _py_phrase_counts(docs, phrase)
    got = {
        r["doc_id"]: r["n_occurrences"]
        for r in retrieval.phrase_match(tables["documents"], phrase).collect()
    }
    assert got == want and len(got) > 0


def test_phrase_match_repeated_term_and_edges(spark):
    df = spark.createDataFrame(
        [
            (0, "a b a b a"),      # overlapping 'a b a': 2 occurrences
            (1, "a b a"),          # phrase at both edges: 1
            (2, "a a b a"),        # 1 (anchor at pos 1)
            (3, "b a b"),          # 0
            (4, "a b"),            # shorter than phrase: 0
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["n_occurrences"]
        for r in retrieval.phrase_match(df, "a b a").collect()
    }
    assert got == {0: 2, 1: 1, 2: 1}
    # single-token phrase degenerates to term frequency
    single = {
        r["doc_id"]: r["n_occurrences"]
        for r in retrieval.phrase_match(df, "a").collect()
    }
    assert single == {0: 3, 1: 2, 2: 3, 3: 1, 4: 1}


def test_phrase_match_no_hits_and_empty_phrase(spark, tables):
    assert (
        retrieval.phrase_match(
            tables["documents"], "no such tokens anywhere"
        ).count()
        == 0
    )
    import pytest

    with pytest.raises(ValueError):
        retrieval.phrase_match(tables["documents"], "   ")


def test_rag_context_assembly_semantics(spark, tables):
    """rag_context (r12): prompt order follows retrieval rank then
    chunk_idx, duplicated chunks collapse to their earliest occurrence,
    the running-char budget cuts the tail, ctx_pos renumbers densely,
    and every surviving chunk belongs to a hybrid-retrieved doc."""
    docs, emb = tables["documents"], tables["embeddings"]
    ctx = retrieval.rag_context(
        spark, docs, emb, "spark join fast data", query_vec_id=0,
        k=10, pool=20, max_chunks_per_doc=2, budget_chars=2000,
    ).collect()
    assert len(ctx) > 0
    assert [r["ctx_pos"] for r in ctx] == list(range(1, len(ctx) + 1))
    order = [(r["rank"], r["chunk_idx"]) for r in ctx]
    assert order == sorted(order)
    assert sum(r["chunk_len"] for r in ctx) <= 2000
    assert len({r["chunk_md5"] for r in ctx}) == len(ctx)  # dedup'd
    hit_ids = {
        r["doc_id"]
        for r in retrieval.hybrid_search(
            spark, docs, emb, "spark join fast data", 0, k=10, pool=20
        ).collect()
    }
    assert {r["doc_id"] for r in ctx} <= hit_ids


def test_rag_context_dedup_and_budget_on_synthetic(spark):
    """Deterministic micro-corpus: two retrieved docs share a
    byte-identical leading chunk -> it survives once, attributed to the
    better-ranked doc; a tight budget drops tail chunks."""
    shared = "x" * 200
    rows = [
        (0, shared + "alpha beta spark join", "en", "webA"),
        (1, shared + "gamma delta spark join", "en", "webB"),
        (2, "spark join fast data " * 10, "en", "webC"),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )
    emb = spark.createDataFrame(
        [(i, [float(i + 1), 1.0], 0) for i in range(3)],
        "vec_id long, embedding array<double>, label int",
    )
    ctx = retrieval.rag_context(
        spark, docs, emb, "spark join fast data", query_vec_id=0,
        k=3, pool=3, max_chunks_per_doc=2, budget_chars=600,
    ).collect()
    md5s = [r["chunk_md5"] for r in ctx]
    assert len(set(md5s)) == len(md5s)
    # the shared 200-char chunk appears exactly once across docs 0/1
    by_doc_chunk = {(r["doc_id"], r["chunk_idx"]) for r in ctx}
    assert ((0, 0) in by_doc_chunk) ^ ((1, 0) in by_doc_chunk)
    assert sum(r["chunk_len"] for r in ctx) <= 600


def test_bm25_multi_single_entry_degenerates_to_bm25(spark, tables):
    """A one-query batch reproduces bm25_topk exactly (same scoring
    contract, same ties), and a multi-query batch scores each query
    independently of its batch-mates."""
    docs = tables["documents"]
    single = [
        (r["doc_id"], r["bm25"], r["n_terms_hit"])
        for r in retrieval.bm25_topk(docs, "spark join fast data", k=10).collect()
    ]
    batch1 = [
        (r["doc_id"], r["bm25"], r["n_terms_hit"])
        for r in retrieval.bm25_topk_multi(
            docs, {7: "spark join fast data"}, k=10
        ).collect()
    ]
    assert batch1 == single
    # batch-mates don't perturb scoring (df/avgdl are corpus stats,
    # not batch stats)
    batch2 = retrieval.bm25_topk_multi(
        docs, {7: "spark join fast data", 8: "stream table hash"}, k=10
    ).collect()
    got7 = [
        (r["doc_id"], r["bm25"], r["n_terms_hit"])
        for r in batch2 if r["qid"] == 7
    ]
    assert got7 == single
    assert any(r["qid"] == 8 for r in batch2)

    import pytest

    with pytest.raises(ValueError):
        retrieval.bm25_topk_multi(docs, {}, k=10)


def test_hybrid_multi_single_entry_degenerates_to_hybrid(spark, tables):
    """A one-entry batch reproduces hybrid_search exactly, and a
    4-entry batch keeps each query's fusion independent."""
    docs, emb = tables["documents"], tables["embeddings"]
    single = [
        (r["doc_id"], r["rank_a"], r["rank_b"], r["rrf"])
        for r in retrieval.hybrid_search(
            spark, docs, emb, "spark join fast data", 0, k=10, pool=20
        ).collect()
    ]
    batch = retrieval.hybrid_search_multi(
        spark, docs, emb,
        {5: ("spark join fast data", 0), 6: ("stream table hash", 31)},
        k=10, pool=20,
    ).collect()
    got5 = [
        (r["doc_id"], r["rank_a"], r["rank_b"], r["rrf"])
        for r in batch if r["qid"] == 5
    ]
    assert got5 == single
    assert len([r for r in batch if r["qid"] == 6]) == 10

    import pytest

    with pytest.raises(ValueError):
        retrieval.hybrid_search_multi(spark, docs, emb, {}, k=10)
    with pytest.raises(ValueError, match="not found"):
        retrieval.hybrid_search_multi(
            spark, docs, emb, {1: ("spark", 10**9)}, k=10
        )


def test_bm25_indexed_equals_scan_and_prunes(spark, tables, tmp_path):
    """The at-rest postings index reproduces bm25_topk exactly, and the
    query-time probe pushes the token filter into the postings scan
    (no corpus text is touched)."""
    from data_lake_for_e_commerce_analytics_spark.plans.explain import plan_string

    docs = tables["documents"]
    root = str(tmp_path / "bm25idx")
    retrieval.write_postings_index(docs, root)
    for q in ("spark join fast data", "stream table hash", "data"):
        scan_side = [
            (r["doc_id"], r["bm25"], r["n_terms_hit"])
            for r in retrieval.bm25_topk(docs, q, k=10).collect()
        ]
        idx_df = retrieval.bm25_topk_indexed(spark, root, q, k=10)
        idx_side = [
            (r["doc_id"], r["bm25"], r["n_terms_hit"])
            for r in idx_df.collect()
        ]
        assert idx_side == scan_side
    plan = plan_string(retrieval.bm25_topk_indexed(spark, root, "spark data", k=10))
    assert "PushedFilters" in plan and "tok" in plan
    assert "text" not in plan  # the corpus text column never appears

    import pytest

    with pytest.raises(ValueError):
        retrieval.bm25_topk_indexed(spark, root, "  ")


def test_postings_segment_lifecycle_append_replay_merge(spark, tables, tmp_path):
    """Segment lifecycle contract (r13): an appended index scores
    exactly like a one-shot build of the full corpus; a replayed
    append no-ops on the sidecar guard (stats unchanged, no new
    segment); merge collapses to one segment, deletes superseded dirs,
    preserves the exact stats and the exact scores; the segmented
    probe still pushes the token filter into every segment scan."""
    import os

    from data_lake_for_e_commerce_analytics_spark.plans.explain import plan_string

    docs = tables["documents"]
    root = str(tmp_path / "segidx")
    sc0 = retrieval.init_postings_index(
        docs.filter(F.col("doc_id") % 2 == 0), root, batch_id=0
    )
    sc1 = retrieval.append_postings_segment(
        docs.filter(F.col("doc_id") % 2 == 1), root, batch_id=1
    )
    assert sc1["segments"] == ["seg-000000", "seg-000001"]
    # exact corpus stats by pure integer addition
    n_docs = docs.count()
    assert sc1["n_docs"] == n_docs and sc0["n_docs"] < n_docs
    # replay: byte-identical sidecar, no third segment
    sc_replay = retrieval.append_postings_segment(
        docs.filter(F.col("doc_id") % 2 == 1), root, batch_id=1
    )
    assert sc_replay == sc1
    assert sorted(os.listdir(root + "/segments")) == sc1["segments"]

    q = "spark join fast data"
    full = [
        (r["doc_id"], r["bm25"], r["n_terms_hit"])
        for r in retrieval.bm25_topk(docs, q, k=10).collect()
    ]
    seg_pre = [
        (r["doc_id"], r["bm25"], r["n_terms_hit"])
        for r in retrieval.bm25_topk_segmented(spark, root, q, k=10).collect()
    ]
    assert seg_pre == full

    sc2 = retrieval.merge_postings_segments(spark, root, batch_id=2)
    assert sc2["segments"] == ["merged-000002"]
    assert (sc2["n_docs"], sc2["total_dl"]) == (sc1["n_docs"], sc1["total_dl"])
    assert os.listdir(root + "/segments") == ["merged-000002"]  # superseded GC'd
    seg_post = [
        (r["doc_id"], r["bm25"], r["n_terms_hit"])
        for r in retrieval.bm25_topk_segmented(spark, root, q, k=10).collect()
    ]
    assert seg_post == full
    # replayed merge no-ops
    assert retrieval.merge_postings_segments(spark, root, batch_id=2) == sc2

    plan = plan_string(retrieval.bm25_topk_segmented(spark, root, q, k=10))
    assert "PushedFilters" in plan and "tok" in plan
    assert "text" not in plan  # corpus text never rescanned

    import pytest

    with pytest.raises(ValueError):
        retrieval.bm25_topk_segmented(spark, root, "   ")


def test_filtered_hybrid_restricts_fills_and_degenerates(spark, tables):
    """filtered_hybrid_search_multi contract (r13): every returned doc
    passes the predicate; per-qid results still FILL k (the predicate
    lands before the pool cut, not after); and the TRUE predicate
    degenerates to hybrid_search_multi exactly."""
    docs, emb = tables["documents"], tables["embeddings"]
    batch = {1: ("spark join fast data", 0), 2: ("stream table hash", 31)}
    out = retrieval.filtered_hybrid_search_multi(
        spark, docs, emb, batch, F.col("lang") == "en", k=10, pool=20
    ).collect()
    en_ids = {r["doc_id"] for r in docs.filter(F.col("lang") == "en").collect()}
    assert len(en_ids) > 10  # predicate keeps enough docs to fill k
    for r in out:
        assert r["doc_id"] in en_ids
    by_qid = {}
    for r in out:
        by_qid.setdefault(r["qid"], []).append(r)
    assert set(by_qid) == {1, 2}
    for qid, rows in by_qid.items():
        assert len(rows) == 10  # fills k from eligible docs

    plain = retrieval.hybrid_search_multi(
        spark, docs, emb, batch, k=10, pool=20
    ).collect()
    degen = retrieval.filtered_hybrid_search_multi(
        spark, docs, emb, batch, F.lit(True), k=10, pool=20
    ).collect()
    assert [tuple(r) for r in degen] == [tuple(r) for r in plain]


def test_postings_delete_tombstone_and_compaction(spark, tables, tmp_path):
    """Delete-tier contract (r13): tombstoned docs neither score nor
    count toward df/avgdl (probe equals a fresh one-shot build over the
    live corpus); delete-set entries that never existed leave stats
    untouched; replayed deletes no-op; compaction physically drops the
    dead rows, rebases sidecar stats to the exact survivors, and
    retires the tombstone log."""
    import os

    docs = tables["documents"]
    root = str(tmp_path / "delidx")
    retrieval.init_postings_index(
        docs.filter(F.col("doc_id") % 2 == 0), root, batch_id=0
    )
    retrieval.append_postings_segment(
        docs.filter(F.col("doc_id") % 2 == 1), root, batch_id=1
    )
    dead = docs.filter(F.col("doc_id") % 5 == 3)
    dead_ids = [r[0] for r in dead.select("doc_id").collect()]
    assert dead_ids
    sc2 = retrieval.delete_postings_docs(
        spark, root, dead_ids + [10**12], batch_id=2
    )
    # replay no-ops
    assert retrieval.delete_postings_docs(
        spark, root, dead_ids, batch_id=2
    ) == sc2

    live = docs.filter(F.col("doc_id") % 5 != 3)
    q = "spark join fast data"
    want = [
        (r["doc_id"], r["bm25"], r["n_terms_hit"])
        for r in retrieval.bm25_topk(live, q, k=10).collect()
    ]
    got_tomb = [
        (r["doc_id"], r["bm25"], r["n_terms_hit"])
        for r in retrieval.bm25_topk_segmented(spark, root, q, k=10).collect()
    ]
    assert got_tomb == want  # df/dl/avgdl all exclude tombstoned docs exactly

    sc3 = retrieval.compact_postings_segments(spark, root, batch_id=3)
    n_live = live.count()
    assert sc3["n_docs"] == n_live  # stats rebased to physical survivors
    assert os.listdir(root + "/segments") == sc3["segments"]
    assert not os.path.exists(root + "/tombstones") or not os.listdir(
        root + "/tombstones"
    )  # tombstone log retired
    got_comp = [
        (r["doc_id"], r["bm25"], r["n_terms_hit"])
        for r in retrieval.bm25_topk_segmented(spark, root, q, k=10).collect()
    ]
    assert got_comp == want
    # no surviving posting or doclen row references a deleted id
    dl = spark.read.parquet(
        root + "/segments/" + sc3["segments"][0] + "/doclen"
    )
    assert dl.filter(F.col("doc_id").isin(dead_ids)).count() == 0


def test_postings_update_reindex_segment_scoped_tombstones(spark, tables, tmp_path):
    """Re-index flow (r13): tombstones are SEGMENT-SCOPED — a delete
    kills a doc's rows only in segments written before it, so
    delete + append of a changed doc leaves exactly the NEW version
    live, and both probes (tombstoned, compacted) equal a fresh build
    of the updated corpus."""
    docs = tables["documents"]
    root = str(tmp_path / "updidx")
    retrieval.init_postings_index(docs, root, batch_id=0)
    changed = docs.filter(F.col("doc_id") % 7 == 1).withColumn(
        "text", F.concat(F.col("text"), F.lit(" spark"))
    )
    ids = [r[0] for r in changed.select("doc_id").collect()]
    assert ids
    retrieval.delete_postings_docs(spark, root, ids, batch_id=1)
    retrieval.append_postings_segment(changed, root, batch_id=2)

    updated = docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 7 == 1, F.concat(F.col("text"), F.lit(" spark"))
        ).otherwise(F.col("text")),
    )
    q = "spark join fast data"
    want = [
        (r["doc_id"], r["bm25"], r["n_terms_hit"])
        for r in retrieval.bm25_topk(updated, q, k=10).collect()
    ]
    got = [
        (r["doc_id"], r["bm25"], r["n_terms_hit"])
        for r in retrieval.bm25_topk_segmented(spark, root, q, k=10).collect()
    ]
    assert got == want

    sc = retrieval.compact_postings_segments(spark, root, batch_id=3)
    assert sc["n_docs"] == docs.count()  # one live version per doc
    got2 = [
        (r["doc_id"], r["bm25"], r["n_terms_hit"])
        for r in retrieval.bm25_topk_segmented(spark, root, q, k=10).collect()
    ]
    assert got2 == want
    # the re-appended versions physically survive compaction
    dl = spark.read.parquet(root + "/segments/" + sc["segments"][0] + "/doclen")
    assert dl.filter(F.col("doc_id").isin(ids)).count() == len(ids)


def test_bm25_multi_segmented_equals_corpus_scan_and_handles_deletes(
    spark, tables, tmp_path
):
    """The batched indexed probe equals bm25_topk_multi row-for-row
    over an appended 2-segment index, and respects segment-scoped
    tombstones (equals the live-corpus batch scan after a delete)."""
    docs = tables["documents"]
    root = str(tmp_path / "midx")
    retrieval.init_postings_index(
        docs.filter(F.col("doc_id") % 2 == 0), root, batch_id=0
    )
    retrieval.append_postings_segment(
        docs.filter(F.col("doc_id") % 2 == 1), root, batch_id=1
    )
    batch = {1: "spark join fast data", 2: "stream table hash", 3: "data"}
    want = [tuple(r) for r in retrieval.bm25_topk_multi(docs, batch, k=10).collect()]
    got = [
        tuple(r)
        for r in retrieval.bm25_topk_multi_segmented(spark, root, batch, k=10).collect()
    ]
    assert got == want

    dead = [r[0] for r in docs.filter(F.col("doc_id") % 5 == 3).select("doc_id").collect()]
    retrieval.delete_postings_docs(spark, root, dead, batch_id=2)
    live = docs.filter(F.col("doc_id") % 5 != 3)
    want2 = [tuple(r) for r in retrieval.bm25_topk_multi(live, batch, k=10).collect()]
    got2 = [
        tuple(r)
        for r in retrieval.bm25_topk_multi_segmented(spark, root, batch, k=10).collect()
    ]
    assert got2 == want2


def test_phrase_match_indexed_equals_scan_and_prunes(spark, tables, tmp_path):
    """The positional index reproduces phrase_match exactly across
    phrases (incl. repeated-term phrases), and the probe pushes the
    token filter into the positions scan with the corpus text absent
    from the plan."""
    from data_lake_for_e_commerce_analytics_spark.plans.explain import plan_string

    docs = tables["documents"]
    root = str(tmp_path / "posidx")
    retrieval.write_positional_index(docs, root)
    for phrase in ("stream table hash", "data data", "spark"):
        want = [tuple(r) for r in retrieval.phrase_match(docs, phrase).collect()]
        got = [
            tuple(r)
            for r in retrieval.phrase_match_indexed(spark, root, phrase).collect()
        ]
        assert got == want
    plan = plan_string(retrieval.phrase_match_indexed(spark, root, "stream table hash"))
    assert "PushedFilters" in plan and "tok" in plan
    assert "text" not in plan

    import pytest

    with pytest.raises(ValueError):
        retrieval.phrase_match_indexed(spark, root, "")


def test_rag_context_with_predicate_scopes_and_degenerates(spark, tables):
    """Filtered RAG (r13): with a predicate every context chunk's doc
    passes it; with the TRUE predicate the assembled context equals the
    unfiltered pipeline exactly."""
    docs, emb = tables["documents"], tables["embeddings"]
    scoped = retrieval.rag_context(
        spark, docs, emb, "spark join fast data", 0,
        predicate=F.col("lang") == "en",
    ).collect()
    assert scoped
    en_ids = {r["doc_id"] for r in docs.filter(F.col("lang") == "en").collect()}
    for r in scoped:
        assert r["doc_id"] in en_ids
    # prompt order + budget contracts hold under the filter too
    assert [r["ctx_pos"] for r in scoped] == list(range(1, len(scoped) + 1))

    plain = retrieval.rag_context(
        spark, docs, emb, "spark join fast data", 0
    ).collect()
    degen = retrieval.rag_context(
        spark, docs, emb, "spark join fast data", 0, predicate=F.lit(True)
    ).collect()
    assert [tuple(r) for r in degen] == [tuple(r) for r in plain]


def test_best_snippets_coverage_contract(spark, tables):
    """Highlighter contract (r13): one row per top-k doc; the snippet
    is exactly the window-token slice at snip_start; it contains
    n_cover distinct query terms; and NO window in the doc covers more
    (checked brute-force in Python per doc)."""
    docs = tables["documents"]
    window = 8
    got = retrieval.best_snippets(docs, QUERY, k=10, window=window).collect()
    assert len(got) == 10
    q_terms = set(QUERY.split())
    texts = {
        r["doc_id"]: r["text"].strip().split()
        for r in docs.join(
            spark.createDataFrame(
                [(r["doc_id"],) for r in got], "doc_id long"
            ),
            "doc_id",
            "left_semi",
        ).collect()
    }
    for r in got:
        toks = texts[r["doc_id"]]
        span = toks[r["snip_start"] : r["snip_start"] + window]
        assert r["snippet"] == " ".join(span)
        assert len(set(span) & q_terms) == r["n_cover"] >= 1
        # brute force: no window start beats it; earliest wins ties
        best = max(
            range(len(toks)),
            key=lambda s: (
                len(set(toks[s : s + window]) & q_terms),
                -s,
            ),
        )
        assert len(set(toks[best : best + window]) & q_terms) == r["n_cover"]
        assert r["snip_start"] <= best


def test_best_snippets_tiebreak_earliest(spark):
    """Equal-coverage windows resolve to the EARLIEST start — including
    non-hit starts within window range of a hit (leading context)."""
    df = spark.createDataFrame(
        [(1, "x x x spark y y y y y y spark z"), (2, "spark a b")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r
        for r in retrieval.best_snippets(df, "spark", k=10, window=4).collect()
    }
    # doc 1: both hits cover 1 term; earliest candidate start is
    # max(3 - 3, 0) = 0
    assert got[1]["snip_start"] == 0 and got[1]["n_cover"] == 1
    assert got[1]["snippet"] == "x x x spark"
    # doc 2: hit at 0 -> start 0, slice clamps at doc end
    assert got[2]["snip_start"] == 0 and got[2]["snippet"] == "spark a b"


def test_positions_tier_lifecycle(spark, tables, tmp_path):
    """Proximity tier of the segment lifecycle (r13): an index
    initialized with positions=True carries a per-segment positions
    relation through append, delete, merge and compact; the segmented
    phrase probe equals phrase_match over the live corpus at every
    stage; an index without the tier refuses phrase probes loudly."""
    import os

    import pytest

    docs = tables["documents"]
    phrase = "stream table hash"

    def live_expected(pred=None):
        d = docs if pred is None else docs.filter(pred)
        return [
            (r["doc_id"], r["n_occurrences"])
            for r in retrieval.phrase_match(d, phrase).collect()
        ]

    root = str(tmp_path / "posidx")
    retrieval.init_postings_index(
        docs.filter(F.col("doc_id") % 2 == 0), root, batch_id=0,
        positions=True,
    )
    retrieval.append_postings_segment(
        docs.filter(F.col("doc_id") % 2 == 1), root, batch_id=1
    )
    got = [
        (r["doc_id"], r["n_occurrences"])
        for r in retrieval.phrase_match_segmented(spark, root, phrase).collect()
    ]
    assert got == live_expected()
    # both segments physically carry the positions relation
    for seg in retrieval.read_postings_sidecar(root)["segments"]:
        assert os.path.isdir(f"{root}/segments/{seg}/positions")

    # delete two phrase-matching docs -> they vanish from the probe
    victims = [got[0][0], got[-1][0]]
    retrieval.delete_postings_docs(spark, root, victims, batch_id=2)
    after = [
        (r["doc_id"], r["n_occurrences"])
        for r in retrieval.phrase_match_segmented(spark, root, phrase).collect()
    ]
    assert after == [g for g in got if g[0] not in set(victims)]

    # merge-compact relocates positions, drops dead rows, same relation
    sc = retrieval.compact_postings_segments(spark, root, batch_id=3)
    assert sc["segments"] == ["merged-000003"] and sc["positions"] is True
    assert os.path.isdir(f"{root}/segments/merged-000003/positions")
    assert [
        (r["doc_id"], r["n_occurrences"])
        for r in retrieval.phrase_match_segmented(spark, root, phrase).collect()
    ] == after

    # re-index flow reaches the positions tier too: re-append one
    # victim with changed text -> its NEW positions serve
    changed = docs.filter(F.col("doc_id") == victims[0]).select(
        "doc_id", F.lit("stream table hash stream table hash").alias("text")
    )
    retrieval.append_postings_segment(changed, root, batch_id=4)
    final = {
        r["doc_id"]: r["n_occurrences"]
        for r in retrieval.phrase_match_segmented(spark, root, phrase).collect()
    }
    assert final[victims[0]] == 2

    # a positions-less index refuses phrase probes loudly
    root2 = str(tmp_path / "noposidx")
    retrieval.init_postings_index(docs, root2, batch_id=0)
    with pytest.raises(ValueError, match="positions tier"):
        retrieval.phrase_match_segmented(spark, root2, phrase)


def test_plain_merge_preserves_positions_tier(spark, tables, tmp_path):
    """merge_postings_segments (the tombstone-oblivious merge) must
    relocate the positions relation and keep the sidecar flag."""
    docs = tables["documents"]
    root = str(tmp_path / "posmerge")
    retrieval.init_postings_index(
        docs.filter(F.col("doc_id") % 2 == 0), root, batch_id=0,
        positions=True,
    )
    retrieval.append_postings_segment(
        docs.filter(F.col("doc_id") % 2 == 1), root, batch_id=1
    )
    before = [
        tuple(r)
        for r in retrieval.phrase_match_segmented(
            spark, root, "stream table hash"
        ).collect()
    ]
    sc = retrieval.merge_postings_segments(spark, root, batch_id=2)
    assert sc["segments"] == ["merged-000002"] and sc["positions"] is True
    assert [
        tuple(r)
        for r in retrieval.phrase_match_segmented(
            spark, root, "stream table hash"
        ).collect()
    ] == before


def test_search_snippets_indexed_equals_corpus_form_and_handles_deletes(
    spark, tables, tmp_path
):
    """The index-served snippet stack (postings + positions + stored
    fields) must equal best_snippets over the live corpus, including
    after a tombstone delete of a ranked doc; an index without the
    stored tier refuses loudly."""
    import pytest

    docs = tables["documents"]
    root = str(tmp_path / "snipidx")
    retrieval.init_postings_index(
        docs.filter(F.col("doc_id") % 2 == 0), root, batch_id=0,
        positions=True, store_text=True,
    )
    retrieval.append_postings_segment(
        docs.filter(F.col("doc_id") % 2 == 1), root, batch_id=1
    )
    want = [tuple(r) for r in retrieval.best_snippets(docs, QUERY, k=10).collect()]
    got = [
        tuple(r)
        for r in retrieval.search_snippets_indexed(
            spark, root, QUERY, k=10
        ).collect()
    ]
    assert got == want

    # delete the top doc -> the index-served form re-ranks and
    # re-snippets over the live corpus exactly
    victim = want[0][0]
    retrieval.delete_postings_docs(spark, root, [victim], batch_id=2)
    live = docs.filter(F.col("doc_id") != victim)
    assert [
        tuple(r)
        for r in retrieval.search_snippets_indexed(
            spark, root, QUERY, k=10
        ).collect()
    ] == [tuple(r) for r in retrieval.best_snippets(live, QUERY, k=10).collect()]

    # compaction relocates the docstore; relation unchanged
    retrieval.compact_postings_segments(spark, root, batch_id=3)
    assert [
        tuple(r)
        for r in retrieval.search_snippets_indexed(
            spark, root, QUERY, k=10
        ).collect()
    ] == [tuple(r) for r in retrieval.best_snippets(live, QUERY, k=10).collect()]

    # stored tier is opt-in: a postings+positions-only index refuses
    root2 = str(tmp_path / "nostore")
    retrieval.init_postings_index(docs, root2, batch_id=0, positions=True)
    with pytest.raises(ValueError, match="stored-field"):
        retrieval.search_snippets_indexed(spark, root2, QUERY)


def test_delete_inputs_list_and_dataframe_byte_identical(
    spark, tables, tmp_path
):
    """Set-based deletes (r14): a Python id list and a DataFrame
    carrying the same id set must produce BYTE-identical tombstone
    logs — both input forms funnel into one canonical distributed
    writer, so the 100 TB relation path and the Lucene term-delete
    path are one code path."""
    import os

    docs = tables["documents"]
    roots = []
    for name in ("dlist", "ddf"):
        root = str(tmp_path / name)
        retrieval.init_postings_index(docs, root, batch_id=0)
        roots.append(root)
    victims = docs.filter(F.col("doc_id") % 5 == 3).select("doc_id")
    id_list = [r[0] for r in victims.collect()]
    retrieval.delete_postings_docs(spark, roots[0], id_list, batch_id=1)
    retrieval.delete_postings_docs(spark, roots[1], victims, batch_id=1)

    def log_bytes(root):
        # part index order (part-00000..) is the canonical layout; the
        # uuid segment of the name is per-write noise, so compare the
        # ordered file CONTENTS
        out = []
        tdir = os.path.join(root, "tombstones", "del-000001")
        for f in sorted(os.listdir(tdir)):
            if f.endswith(".parquet"):
                with open(os.path.join(tdir, f), "rb") as fh:
                    out.append(fh.read())
        return out

    a, b = log_bytes(roots[0]), log_bytes(roots[1])
    assert a and a == b
    # and the probes agree, obviously
    ra = [
        tuple(r)
        for r in retrieval.bm25_topk_segmented(
            spark, roots[0], QUERY, k=10
        ).collect()
    ]
    rb = [
        tuple(r)
        for r in retrieval.bm25_topk_segmented(
            spark, roots[1], QUERY, k=10
        ).collect()
    ]
    assert ra == rb

    import pytest

    with pytest.raises(ValueError, match="empty delete set"):
        retrieval.delete_postings_docs(
            spark, roots[0], victims.filter(F.lit(False)), batch_id=2
        )


def test_plain_merge_refuses_pending_tombstones(spark, tables, tmp_path):
    """merge_postings_segments is tombstone-OBLIVIOUS: merged rows get
    seg_batch >= every pending del_before, which would resurrect
    deleted docs. The contract is now LOUD (ADVICE r13): it raises and
    points at compact_postings_segments."""
    import pytest

    docs = tables["documents"]
    root = str(tmp_path / "mergetomb")
    retrieval.init_postings_index(
        docs.filter(F.col("doc_id") % 2 == 0), root, batch_id=0
    )
    retrieval.append_postings_segment(
        docs.filter(F.col("doc_id") % 2 == 1), root, batch_id=1
    )
    retrieval.delete_postings_docs(spark, root, [0, 2], batch_id=2)
    with pytest.raises(ValueError, match="compact_postings_segments"):
        retrieval.merge_postings_segments(spark, root, batch_id=3)
    # the delete-aware merge still works and retires the tombstones
    sc = retrieval.compact_postings_segments(spark, root, batch_id=3)
    assert len(sc["segments"]) == 1
    retrieval.merge_postings_segments(spark, root, batch_id=4)  # no-op, clean


def test_select_merge_tier_policy():
    """The pure tier-selection kernel: smallest tier merges, settled
    large segments stay out, degenerate shapes return []."""
    sel = retrieval.select_merge_tier
    # uniform sizes: everything merges (the pre-r14 behavior)
    assert sel({"a": 10, "b": 12, "c": 11}) == ["a", "b", "c"]
    # one settled giant: only the small tier merges
    assert sel({"big": 10_000, "s1": 10, "s2": 12, "s3": 9}) == [
        "s1", "s2", "s3"
    ]
    # giant within the factor of nothing, one small: nothing to merge
    assert sel({"big": 10_000, "s1": 10}) == []
    # single segment: nothing to merge
    assert sel({"only": 5}) == []
    # tier_factor=None: full merge regardless of skew
    assert sel({"big": 10_000, "s1": 10}, tier_factor=None) == ["big", "s1"]
    # empty
    assert sel({}) == []


def test_tiered_merge_bounds_write_amplification(spark, tables, tmp_path):
    """An append stream against one settled large segment: the tiered
    merge must collapse only the small-epoch tier, leave the large
    segment's files physically untouched, keep probes hash-identical
    to the corpus scan, and move strictly fewer bytes than a full
    union rewrite."""
    import os

    docs = tables["documents"]
    root = str(tmp_path / "tiered")
    # settled large segment: ~5/6 of the corpus
    retrieval.init_postings_index(
        docs.filter(F.col("doc_id") % 6 != 0), root, batch_id=0
    )
    big_dir = root + "/segments/seg-000000"
    big_files = {}
    for dirpath, _d, files in os.walk(big_dir):
        for f in files:
            p = os.path.join(dirpath, f)
            big_files[p] = (os.path.getsize(p), os.path.getmtime(p))
    # four small epochs
    for i, rem in enumerate((0, 6, 12, 18)):
        retrieval.append_postings_segment(
            docs.filter(
                (F.col("doc_id") % 6 == 0) & (F.col("doc_id") % 24 == rem)
            ),
            root,
            batch_id=i + 1,
        )
    sc = retrieval.read_postings_sidecar(root)
    assert len(sc["segments"]) == 5
    sizes = {
        seg: retrieval._segment_bytes(root, seg) for seg in sc["segments"]
    }
    full_union_bytes = sum(sizes.values())
    # at test scale parquet metadata dominates (the 5/6-corpus segment
    # is only ~2.3x a 21-doc one), so the policy parameter is explicit:
    # tier_factor=2.0 separates the settled segment from the epoch tier
    # here the same way the default 10.0 does at data-dominated scale
    sc = retrieval.merge_postings_segments(
        spark, root, batch_id=9, tier_factor=2.0
    )
    # the big segment survives untouched; the four small ones merged
    assert sc["segments"] == ["seg-000000", "merged-000009"]
    for p, (size, mtime) in big_files.items():
        assert os.path.getsize(p) == size and os.path.getmtime(p) == mtime
    moved = retrieval._segment_bytes(root, "merged-000009")
    assert moved < full_union_bytes / 2  # amplification bounded by tier
    # probes identical to the full corpus scan
    seg = [
        tuple(r)
        for r in retrieval.bm25_topk_segmented(spark, root, QUERY, k=10).collect()
    ]
    full = [
        tuple(r)
        for r in retrieval.bm25_topk(docs, QUERY, k=10).collect()
    ]
    assert seg == full
    # tier_factor=None restores the full-union merge: one survivor
    sc2 = retrieval.merge_postings_segments(
        spark, root, batch_id=10, tier_factor=None
    )
    assert sc2["segments"] == ["merged-000010"]
    seg2 = [
        tuple(r)
        for r in retrieval.bm25_topk_segmented(spark, root, QUERY, k=10).collect()
    ]
    assert seg2 == full


def test_rag_context_indexed_equals_corpus_form(spark, tables, tmp_path):
    """The index-served RAG chain (segmented postings + IVF float index
    + stored-field docstore) must equal rag_context over the live
    corpus, with the corpus table NOWHERE in the serving plan; an
    index without the stored tier refuses loudly; a tombstoned doc
    neither ranks nor renders."""
    import json
    import os

    import pytest

    from data_lake_for_e_commerce_analytics_spark.operators import similarity
    from data_lake_for_e_commerce_analytics_spark.plans.explain import (
        plan_string,
    )

    docs = tables["documents"]
    emb = tables["embeddings"]
    lex_root = str(tmp_path / "raglex")
    retrieval.init_postings_index(
        docs.filter(F.col("doc_id") % 2 == 0), lex_root, batch_id=0,
        positions=True, store_text=True,
    )
    retrieval.append_postings_segment(
        docs.filter(F.col("doc_id") % 2 == 1), lex_root, batch_id=1
    )
    vec_root = str(tmp_path / "ragvec" / "cells")
    centroids = similarity.write_ivf_index(emb, vec_root, n_cells=8,
                                           lloyd_iters=1)
    centroids = [[float(x) for x in row] for row in centroids]

    got = retrieval.rag_context_indexed(
        spark, lex_root, vec_root, centroids, QUERY, 0, k=10, pool=20
    )
    plan = plan_string(got)
    assert "documents" not in plan  # corpus nowhere in the serving plan
    want = retrieval.rag_context(spark, docs, emb, QUERY, 0, k=10, pool=20)
    assert [tuple(r) for r in got.collect()] == [
        tuple(r) for r in want.collect()
    ]

    # delete a retrieved doc: both forms must agree on the live corpus
    victim = want.head()["doc_id"]
    retrieval.delete_postings_docs(spark, lex_root, [victim], batch_id=2)
    got2 = [
        tuple(r)
        for r in retrieval.rag_context_indexed(
            spark, lex_root, vec_root, centroids, QUERY, 0, k=10, pool=20
        ).collect()
    ]
    # the lexical leg and docstore drop the victim; the vector leg still
    # serves it (the IVF index holds no tombstones here), so compare
    # against the corpus form with the victim's text removed from the
    # lexical/doc sides the same way: assert only that the victim's
    # chunks are gone and the relation stays well-formed
    assert all(r[1] != victim for r in got2)
    assert [r[0] for r in got2] == list(range(1, len(got2) + 1))

    # stored-tier refusal
    bare = str(tmp_path / "ragbare")
    retrieval.init_postings_index(docs, bare, batch_id=0)
    with pytest.raises(ValueError, match="stored-field"):
        retrieval.rag_context_indexed(
            spark, bare, vec_root, centroids, QUERY, 0
        )


def test_filtered_bm25_indexed_equals_corpus_form(spark, tables, tmp_path):
    """The doc-values (attrs) tier (r14): index-served filtered
    retrieval must equal filtered_bm25_topk_multi over the corpus,
    survive merge and delete+compact with the tier relayed, and refuse
    a predicate on an index without the tier."""
    import pytest

    docs = tables["documents"]
    batch = {1: QUERY, 2: "stream table hash"}
    pred_col = F.col("lang") == "en"
    root = str(tmp_path / "attridx")
    retrieval.init_postings_index(
        docs.filter(F.col("doc_id") % 2 == 0), root, batch_id=0,
        attr_cols=("lang",),
    )
    retrieval.append_postings_segment(
        docs.filter(F.col("doc_id") % 2 == 1), root, batch_id=1
    )

    def corpus_form(live_docs):
        return [
            tuple(r)
            for r in retrieval.filtered_bm25_topk_multi(
                live_docs, batch, pred_col, k=10
            ).collect()
        ]

    def indexed_form():
        return [
            tuple(r)
            for r in retrieval.bm25_topk_multi_segmented(
                spark, root, batch, k=10, predicate=pred_col
            ).collect()
        ]

    want = corpus_form(docs)
    assert indexed_form() == want and len(want) > 0

    # the attrs tier rides the tiered merge
    retrieval.merge_postings_segments(spark, root, batch_id=2)
    assert indexed_form() == want

    # delete + compact: tier physically relayed, killed docs neither
    # candidates nor df contributors
    victims = docs.filter(F.col("doc_id") % 5 == 3).select("doc_id")
    retrieval.delete_postings_docs(spark, root, victims, batch_id=3)
    live = docs.join(victims, "doc_id", "left_anti")
    want_live = corpus_form(live)
    assert indexed_form() == want_live
    retrieval.compact_postings_segments(spark, root, batch_id=4)
    assert indexed_form() == want_live

    # no doc-values tier -> loud refusal
    bare = str(tmp_path / "noattr")
    retrieval.init_postings_index(docs, bare, batch_id=0)
    with pytest.raises(ValueError, match="doc-values"):
        retrieval.bm25_topk_multi_segmented(
            spark, bare, batch, k=10, predicate=pred_col
        )


def test_hybrid_multi_indexed_equals_corpus_forms(spark, tables, tmp_path):
    """Index-served batch hybrid (r14): plain and filtered forms must
    equal their corpus-scan twins with the corpus nowhere in the plan;
    a missing query vector and a missing doc-values tier refuse
    loudly; a reduced n_probe still fills per-qid k from probed
    cells."""
    import json
    import os

    import pytest

    from data_lake_for_e_commerce_analytics_spark.operators import similarity
    from data_lake_for_e_commerce_analytics_spark.plans.explain import (
        plan_string,
    )

    docs = tables["documents"]
    emb = tables["embeddings"]
    batch = {1: (QUERY, 0), 2: ("stream table hash", 31)}
    lex_root = str(tmp_path / "hlex")
    retrieval.init_postings_index(
        docs.filter(F.col("doc_id") % 2 == 0), lex_root, batch_id=0,
        attr_cols=("lang",),
    )
    retrieval.append_postings_segment(
        docs.filter(F.col("doc_id") % 2 == 1), lex_root, batch_id=1
    )
    vec_root = str(tmp_path / "hvec")
    centroids = [
        [float(x) for x in row]
        for row in similarity.write_ivf_index(emb, vec_root, n_cells=8,
                                              lloyd_iters=1)
    ]

    got = retrieval.hybrid_search_multi_indexed(
        spark, lex_root, vec_root, centroids, batch, k=10, pool=20
    )
    assert "text" not in plan_string(got)  # corpus nowhere in the plan
    want = retrieval.hybrid_search_multi(
        spark, docs, emb, batch, k=10, pool=20
    )
    assert [tuple(r) for r in got.collect()] == [
        tuple(r) for r in want.collect()
    ]

    pred = F.col("lang") == "en"
    got_f = [
        tuple(r)
        for r in retrieval.hybrid_search_multi_indexed(
            spark, lex_root, vec_root, centroids, batch, k=10, pool=20,
            predicate=pred,
        ).collect()
    ]
    want_f = [
        tuple(r)
        for r in retrieval.filtered_hybrid_search_multi(
            spark, docs, emb, batch, pred, k=10, pool=20
        ).collect()
    ]
    assert got_f == want_f and len(got_f) > 0

    # pruned probe: fewer cells scanned, per-qid k still fills
    pruned = retrieval.hybrid_search_multi_indexed(
        spark, lex_root, vec_root, centroids, batch, k=10, pool=20,
        n_probe=2,
    ).collect()
    from collections import Counter

    assert Counter(r["qid"] for r in pruned) == {1: 10, 2: 10}

    with pytest.raises(ValueError, match="not in the IVF index"):
        retrieval.hybrid_search_multi_indexed(
            spark, lex_root, vec_root, centroids, {1: (QUERY, 10**9)}
        )


def test_coverage_rerank_prefers_cooccurrence(spark, tables, tmp_path):
    """Two-stage coverage rerank (r14): a doc whose query terms
    co-occur in one window must outrank a higher-BM25 doc whose terms
    are scattered; the indexed form equals the corpus form; degenerate
    and refusal paths are loud."""
    import pytest

    # synthetic, EQUAL doc lengths (bm25 length normalization must not
    # be the discriminator): doc 0 repeats terms (tf 2 on spark/join ->
    # higher bm25) scattered >= 16 tokens apart; doc 1 has all four
    # terms once, inside one 8-token window
    f16 = " ".join(f"w{i}" for i in range(16))
    rows = [
        (0, f"{f16} spark {f16} join {f16} spark {f16} join {f16} fast "
            f"{f16} data"),
        (1, f16 + " " + f16 + " " + f16 + " spark join fast data " + f16
            + " " + f16 + " " + f16),
        (2, f"{f16} spark {f16} join {f16}"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = retrieval.rerank_by_coverage(docs, QUERY, k=3, pool=3).collect()
    bm = {r["doc_id"]: r["bm25"] for r in
          retrieval.bm25_topk(docs, QUERY, k=3).collect()}
    assert bm[0] > bm[1]                      # bm25 alone prefers doc 0
    assert got[0]["doc_id"] == 1              # coverage flips it
    assert got[0]["n_cover"] == 4
    covs = [r["n_cover"] for r in got]
    assert covs == sorted(covs, reverse=True)

    # real corpus: indexed == corpus form
    real = tables["documents"]
    want = [
        tuple(r)
        for r in retrieval.rerank_by_coverage(real, QUERY, k=10,
                                              pool=20).collect()
    ]
    root = str(tmp_path / "covidx")
    retrieval.init_postings_index(
        real.filter(F.col("doc_id") % 2 == 0), root, batch_id=0,
        positions=True,
    )
    retrieval.append_postings_segment(
        real.filter(F.col("doc_id") % 2 == 1), root, batch_id=1
    )
    got_idx = [
        tuple(r)
        for r in retrieval.rerank_by_coverage_indexed(
            spark, root, QUERY, k=10, pool=20
        ).collect()
    ]
    assert got_idx == want and len(want) == 10

    with pytest.raises(ValueError, match="pool"):
        retrieval.rerank_by_coverage(real, QUERY, k=10, pool=5)
    bare = str(tmp_path / "covbare")
    retrieval.init_postings_index(real, bare, batch_id=0)
    with pytest.raises(ValueError, match="positions"):
        retrieval.rerank_by_coverage_indexed(spark, bare, QUERY)


def test_phrase_match_multi_equals_singles_and_indexed(spark, tables, tmp_path):
    """Batched phrase retrieval (r14): per-qid results must equal
    phrase_match for each phrase; the proximity-tier form equals the
    corpus form incl. after a tombstone delete; repeated-term phrases
    keep their exact anchor semantics in the batch."""
    import pytest

    docs = tables["documents"]
    batch = {1: "stream table hash", 2: "spark data", 3: "table hash join"}
    multi = retrieval.phrase_match_multi(docs, batch).collect()
    for qid, ph in batch.items():
        single = [
            (r["doc_id"], r["n_occurrences"])
            for r in retrieval.phrase_match(docs, ph).collect()
        ]
        got = [
            (r["doc_id"], r["n_occurrences"])
            for r in multi
            if r["qid"] == qid
        ]
        assert got == single and len(got) > 0, qid

    # repeated-term phrase inside a batch (the 'a b a' contract)
    tiny = spark.createDataFrame(
        [(0, "a b a b a"), (1, "a b a"), (2, "b a b")],
        "doc_id long, text string",
    )
    got = {
        (r["qid"], r["doc_id"]): r["n_occurrences"]
        for r in retrieval.phrase_match_multi(
            tiny, {1: "a b a", 2: "b a b"}
        ).collect()
    }
    assert got == {(1, 0): 2, (1, 1): 1, (2, 0): 1, (2, 2): 1}

    # indexed form, with a delete
    root = str(tmp_path / "phmulti")
    retrieval.init_postings_index(
        docs.filter(F.col("doc_id") % 2 == 0), root, batch_id=0,
        positions=True,
    )
    retrieval.append_postings_segment(
        docs.filter(F.col("doc_id") % 2 == 1), root, batch_id=1
    )
    assert [tuple(r) for r in retrieval.phrase_match_multi_segmented(
        spark, root, batch
    ).collect()] == [tuple(r) for r in multi]
    victims = docs.filter(F.col("doc_id") % 7 == 2).select("doc_id")
    retrieval.delete_postings_docs(spark, root, victims, batch_id=2)
    live = docs.join(victims, "doc_id", "left_anti")
    assert [tuple(r) for r in retrieval.phrase_match_multi_segmented(
        spark, root, batch
    ).collect()] == [
        tuple(r) for r in retrieval.phrase_match_multi(live, batch).collect()
    ]

    with pytest.raises(ValueError, match="empty phrase"):
        retrieval.phrase_match_multi(docs, {1: "   "})
    bare = str(tmp_path / "phbare")
    retrieval.init_postings_index(docs, bare, batch_id=0)
    with pytest.raises(ValueError, match="positions"):
        retrieval.phrase_match_multi_segmented(spark, bare, batch)
