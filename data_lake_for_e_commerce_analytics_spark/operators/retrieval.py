"""Retrieval over the document/embedding tables: exact BM25 lexical
top-k, reciprocal-rank fusion, and the hybrid lexical+vector search a
training-data curation stack runs for targeted corpus mining (find the
documents most like a reference set: BM25 for surface terms, embedding
cosine for semantics, RRF to fuse without score calibration).

Cross-engine exactness: BM25 per-(doc, term) partials and RRF
reciprocal terms are quantized to integer MICRO-units before any
cross-row sum (FP addition is not associative — the same contract as
`text.bigram_lm_score`), so every score replays to the last digit in
DuckDB. Ranks tie-break on doc id everywhere.

Scale shape: the token stream filters to the QUERY terms before any
aggregation (a scan-local semi-filter — the posting-list analog), df
and avgdl are term- and corpus-bounded aggregates, the per-doc score
sum shuffles only docs containing query terms, and top-k is a
TakeOrderedAndProject. The vector side is `brute_force_knn`'s
map-side-only scan (or any IVF tier); RRF joins two k-row relations.

Reference parity note: extension beyond the reference per the
training-data-pipeline north star (BASELINE.json).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window

from .text import tokens
from . import similarity

MICRO = 1_000_000.0


def bm25_topk(
    documents: DataFrame,
    query: str,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Okapi BM25 top-k documents for a literal query string.

    idf(t) = ln((N - df + 0.5)/(df + 0.5) + 1)   (the +1 'plus' form:
    never negative, the variant Lucene ships). Per-(doc, term) partial
    scores are micro-quantized before the per-doc sum; final score
    rounded to 4 decimals, ties broken by doc_id.
    """
    q_terms = sorted(set(query.split()))
    if not q_terms:
        raise ValueError("empty query")
    tok = documents.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("tok")
    )
    # doc lengths + corpus stats (exact integer sums -> exact avgdl)
    dl = documents.select(
        "doc_id", F.size(tokens(F.col("text"))).cast("long").alias("dl")
    )
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("total_dl")
    )
    # posting-list analog: keep only query-term tokens before counting
    qtok = tok.filter(F.col("tok").isin(q_terms))
    tf = qtok.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    df_ = qtok.groupBy("tok").agg(F.countDistinct("doc_id").alias("df"))
    # dl is CORPUS-cardinality (one row per document) — broadcasting it
    # OOMs executors at web scale (VERDICT r10). Semi-join it down to
    # the query-matching docs first (the same bound as tf); the dl⋈tf
    # join then shuffles/broadcasts only term-bounded relations, and
    # the only hinted broadcasts left are term-bounded df_ and 1-row
    # corpus stats.
    dl_matched = dl.join(qtok.select("doc_id"), "doc_id", "left_semi")
    part = (
        tf.join(F.broadcast(df_), "tok")
        .join(dl_matched, "doc_id")
        .crossJoin(F.broadcast(stats))
    )
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    avgdl = F.col("total_dl") / F.col("n_docs")
    score_t = (
        idf
        * (F.col("tf") * (k1 + 1))
        / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / avgdl))
    )
    return (
        part.withColumn(
            "s_micro", F.round(score_t * F.lit(MICRO)).cast("long")
        )
        .groupBy("doc_id")
        .agg(
            F.round(F.sum("s_micro") / F.lit(MICRO), 4).alias("bm25"),
            F.count(F.lit(1)).alias("n_terms_hit"),
        )
        .orderBy(F.desc("bm25"), "doc_id")
        .limit(k)
    )


def rrf_fuse(
    ranked_a: DataFrame,
    ranked_b: DataFrame,
    k: int = 10,
    c: int = 60,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack'09): rrf(d) = Σ 1/(c + rank_d)
    over the lists containing d. Inputs: (doc_id, rank) relations with
    1-based ranks. Calibration-free — the reason hybrid search fuses on
    ranks, not raw scores. Each reciprocal is micro-quantized so the
    two-term sum is engine-exact; ties break on doc_id."""
    ra = ranked_a.select("doc_id", F.col("rank").alias("rank_a"))
    rb = ranked_b.select("doc_id", F.col("rank").alias("rank_b"))
    both = ra.join(rb, "doc_id", "full_outer")

    def term(col):
        return F.when(
            col.isNotNull(),
            F.round(F.lit(MICRO) / (F.lit(float(c)) + col), 0).cast("long"),
        ).otherwise(F.lit(0).cast("long"))

    return (
        both.select(
            "doc_id",
            "rank_a",
            "rank_b",
            F.round((term(F.col("rank_a")) + term(F.col("rank_b"))) / F.lit(MICRO), 6)
            .alias("rrf"),
        )
        .orderBy(F.desc("rrf"), "doc_id")
        .limit(k)
    )


def _with_rank(df: DataFrame, order_cols) -> DataFrame:
    w = Window.orderBy(*order_cols)
    return df.withColumn("rank", F.row_number().over(w))


def hybrid_search(
    spark: SparkSession,
    documents: DataFrame,
    embeddings: DataFrame,
    query_text: str,
    query_vec_id: int,
    k: int = 10,
    pool: int = 20,
    c: int = 60,
) -> DataFrame:
    """Hybrid lexical+vector retrieval: BM25 top-``pool`` on the query
    TEXT fused by RRF with exact-cosine top-``pool`` on the query
    VECTOR (doc_id and vec_id share the id space in this corpus — the
    usual lakehouse layout where embeddings are a derived column
    table). The single-column window rank over a ``pool``-row relation
    is k-row work, not a corpus sort."""
    lex = _with_rank(
        bm25_topk(documents, query_text, k=pool),
        [F.desc("bm25"), F.col("doc_id")],
    ).select("doc_id", "rank")
    vec = _with_rank(
        similarity.knn_for_vec_id(spark, embeddings, query_vec_id, k=pool)
        .withColumnRenamed("vec_id", "doc_id"),
        [F.desc("cosine"), F.col("doc_id")],
    ).select("doc_id", "rank")
    return rrf_fuse(lex, vec, k=k, c=c)


def phrase_match(documents: DataFrame, phrase: str) -> DataFrame:
    """Exact positional phrase retrieval: documents containing the
    token sequence ``phrase`` (whitespace tokenization, the corpus
    contract shared with bm25_topk), with per-document occurrence
    counts — the positional-index query a lexical stack needs beyond
    bag-of-words BM25.

    Plan (one corpus scan, shuffle-only — no self-joins): posexplode
    the token stream, keep ONLY phrase terms (the posting-list prune,
    so everything after the scan is term-bounded), and map each
    surviving token to the phrase indexes it could fill. A token
    matching phrase index ``i`` at position ``p`` anchors a candidate
    occurrence at ``p - i``; a real occurrence is an (doc, anchor)
    group covering ALL k distinct indexes. That turns k-way positional
    adjacency — classically a k-way self-join over the positions table
    — into one groupBy, exact for repeated phrase terms too (each index
    must be covered at its own offset). Cost: one shuffle of
    (doc_id, anchor, ix) triples bounded by phrase-term frequency,
    then a per-doc count.
    """
    terms = phrase.split()
    if not terms:
        raise ValueError("phrase must contain at least one token")
    toks = documents.select(
        "doc_id",
        F.posexplode(F.split(F.trim("text"), r"\s+")).alias("pos", "tok"),
    ).filter(F.col("tok").isin(terms))
    # phrase indexes this token can fill (duplicated terms -> several)
    ix_arr = F.array(
        *[F.when(F.col("tok") == t, F.lit(i)) for i, t in enumerate(terms)]
    )
    legs = toks.select(
        "doc_id",
        "pos",
        F.explode(F.filter(ix_arr, lambda x: x.isNotNull())).alias("ix"),
    ).select("doc_id", (F.col("pos") - F.col("ix")).alias("anchor"), "ix")
    return (
        legs.groupBy("doc_id", "anchor")
        .agg(F.countDistinct("ix").alias("n_ix"))
        .filter(F.col("n_ix") == len(terms))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .orderBy(F.desc("n_occurrences"), "doc_id")
    )


def _phrase_batch_relations(spark: SparkSession, phrases: dict[int, str]):
    """The broadcast relations a batched phrase probe needs: (qid, tok,
    ix) — every phrase index each term fills per query (duplicated
    terms produce several rows) — and (qid, n_terms)."""
    if not phrases:
        raise ValueError("empty phrase batch")
    qt_rows = []
    qn_rows = []
    for qid, phrase in sorted(phrases.items()):
        terms = phrase.split()
        if not terms:
            raise ValueError(f"empty phrase for qid {qid}")
        qn_rows.append((int(qid), len(terms)))
        for i, t in enumerate(terms):
            qt_rows.append((int(qid), t, i))
    qt = spark.createDataFrame(qt_rows, "qid int, tok string, ix int")
    qn = spark.createDataFrame(qn_rows, "qid int, n_terms int")
    return qt, qn


def _phrase_match_from_positions_multi(
    toks: DataFrame, qt: DataFrame, qn: DataFrame
) -> DataFrame:
    """Anchor-alignment phrase matching for a phrase BATCH over a
    (doc_id, tok, pos) stream already pruned to the union of all
    phrase terms: the per-query fan-out is the broadcast (qid, tok,
    ix) join, an occurrence is a (qid, doc, anchor) group covering all
    of that query's indexes."""
    legs = toks.join(F.broadcast(qt), "tok").select(
        "qid", "doc_id", (F.col("pos") - F.col("ix")).alias("anchor"), "ix"
    )
    return (
        legs.groupBy("qid", "doc_id", "anchor")
        .agg(F.countDistinct("ix").alias("n_ix"))
        .join(F.broadcast(qn), "qid")
        .filter(F.col("n_ix") == F.col("n_terms"))
        .groupBy("qid", "doc_id")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .orderBy("qid", F.desc("n_occurrences"), "doc_id")
    )


def phrase_match_multi(
    documents: DataFrame, phrases: dict[int, str]
) -> DataFrame:
    """Batched exact phrase retrieval (r14): per-doc occurrence counts
    for a SET of phrases in ONE corpus scan — `phrase_match`'s
    anchor-alignment contract with the per-phrase index mapping turned
    into a broadcast (qid, tok, ix) relation, so the token stream is
    tokenized and pruned once for the whole batch (the bm25_topk_multi
    throughput shape applied to the proximity query class). A
    single-entry batch reproduces phrase_match exactly
    (pytest-pinned). Returns (qid, doc_id, n_occurrences)."""
    spark = documents.sparkSession
    qt, qn = _phrase_batch_relations(spark, phrases)
    all_terms = sorted({t for ph in phrases.values() for t in ph.split()})
    toks = documents.select(
        "doc_id",
        F.posexplode(F.split(F.trim("text"), r"\s+")).alias("pos", "tok"),
    ).filter(F.col("tok").isin(all_terms))
    return _phrase_match_from_positions_multi(toks, qt, qn)


def phrase_match_multi_segmented(
    spark: SparkSession, path: str, phrases: dict[int, str]
) -> DataFrame:
    """`phrase_match_multi` served from the segmented index's PROXIMITY
    tier: one term-pruned positions scan per segment covers the union
    of all phrases' terms (row-group pruning intact), segment-scoped
    tombstones apply inside the scans, and the per-query fan-out is
    the same broadcast (qid, tok, ix) join — the batch serving shape
    for phrase queries, corpus nowhere in the plan. Same oracle as
    the corpus-scan form."""
    sc = read_postings_sidecar(path)
    if not sc.get("positions", False):
        raise ValueError(
            "index lacks the positions tier — "
            "init_postings_index(..., positions=True)"
        )
    qt, qn = _phrase_batch_relations(spark, phrases)
    all_terms = sorted({t for ph in phrases.values() for t in ph.split()})
    root = path.rstrip("/")
    tomb = _read_tombstones(spark, path)
    pos = None
    for seg in sc["segments"]:
        x = (
            _rp(spark, POSITIONS_DDL, f"{root}/segments/{seg}/positions")
            .filter(F.col("tok").isin(all_terms))
            .withColumn("seg_batch", F.lit(_seg_batch(seg)))
        )
        pos = x if pos is None else pos.unionByName(x)
    toks = _apply_tombstones(pos, tomb).drop("seg_batch")
    return _phrase_match_from_positions_multi(toks, qt, qn)


def best_snippets(
    documents: DataFrame,
    query: str,
    k: int = 10,
    window: int = 8,
) -> DataFrame:
    """Best-coverage snippet per BM25 top-k document — the Lucene
    highlighter tier, completing the lexical serving chain (index ->
    search -> highlight). For each of the ``k`` ranked docs, returns
    the ``window``-token span covering the most DISTINCT query terms
    (ties: earliest start), as both positions and the extracted text.

    Plan: rank with `bm25_topk` (term-bounded, TakeOrdered), compute
    positions ONLY for the k winners (semi-join bound — the corpus is
    never rescanned beyond the ranking pass), keep query-term hits,
    and score candidate window starts WITHOUT a positions self-join:
    each hit at position p explodes to the ``window`` starts that
    could cover it (max(p - window + 1, 0) .. p — the phrase_match
    anchor trick generalized from exact offsets to ranges), then one
    groupBy counts distinct covered terms per (doc, start) and a
    doc-partitioned row_number picks the winner. Cost: hits x window
    rows over k documents — bounded by per-doc query-term frequency,
    never O(doc_len^2); the only window function is partitioned by
    doc_id over the k winners.

    Scale shape: everything upstream of the k-doc semi-join is
    `bm25_topk`'s posting-pruned plan; everything downstream touches k
    documents. Snippet extraction is an in-row slice + concat (codegen,
    no UDF)."""
    if window < 1:
        raise ValueError("window must be >= 1")
    top = bm25_topk(documents, query, k=k)
    q_terms = sorted(set(query.split()))
    docs_k = documents.join(top.select("doc_id"), "doc_id", "left_semi").select(
        "doc_id", "text"
    )
    hits = docs_k.select(
        "doc_id", F.posexplode(tokens(F.col("text"))).alias("pos", "tok")
    ).filter(F.col("tok").isin(q_terms))
    return _assemble_snippets(top, hits, docs_k, window)


def _best_windows(hits: DataFrame, window: int) -> DataFrame:
    """The anchor-explode window kernel shared by every snippet form:
    term-hit positions (doc_id, pos, tok) in, the per-document best
    window start out — (doc_id, apos, n_cover), max distinct-term
    coverage, ties to the earliest start."""
    anchored = hits.select(
        "doc_id",
        "tok",
        F.explode(
            F.sequence(
                F.greatest(F.col("pos") - (window - 1), F.lit(0)), F.col("pos")
            )
        ).alias("apos"),
    )
    cov = anchored.groupBy("doc_id", "apos").agg(
        F.countDistinct("tok").alias("n_cover")
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("n_cover"), F.asc("apos"))
    return (
        cov.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


def _assemble_snippets(
    top: DataFrame, hits: DataFrame, texts: DataFrame, window: int
) -> DataFrame:
    """Join the ranked relation, the best windows, and the text source
    into the snippet output contract — shared by the corpus-scan and
    index-served forms so the two stay one logical relation."""
    best = _best_windows(hits, window)
    return (
        top.join(best, "doc_id")
        .join(texts.select("doc_id", "text"), "doc_id")
        .select(
            "doc_id",
            "bm25",
            F.col("apos").cast("long").alias("snip_start"),
            F.col("n_cover").cast("long").alias("n_cover"),
            F.concat_ws(
                " ", F.slice(tokens(F.col("text")), F.col("apos") + 1, window)
            ).alias("snippet"),
        )
        .orderBy(F.desc("bm25"), "doc_id")
    )


def search_snippets_indexed(
    spark: SparkSession,
    path: str,
    query: str,
    k: int = 10,
    window: int = 8,
) -> DataFrame:
    """`best_snippets` served ENTIRELY from the segmented index — the
    full Lucene serving stack with the corpus nowhere in the plan:
    ranking from the postings tier (`bm25_topk_segmented`), hit
    positions from the proximity tier (term-pruned per-segment scans),
    snippet text from the STORED-FIELD tier (the per-segment docstore,
    doc_id-sorted so the k-winner semi-join prunes at row-group
    stats). Segment-scoped tombstones apply inside all three tiers, so
    deleted docs neither rank, anchor, nor render. Same output
    contract as `best_snippets` over the live corpus — one logical
    relation, two physical plans (the `bm25_topk_indexed` precedent).

    Requires an index initialized with ``positions=True`` AND
    ``store_text=True``."""
    sc = read_postings_sidecar(path)
    if not (sc.get("positions", False) and sc.get("stored", False)):
        raise ValueError(
            "index lacks the positions and/or stored-field tier — "
            "init_postings_index(..., positions=True, store_text=True)"
        )
    q_terms = sorted(set(query.split()))
    if not q_terms:
        raise ValueError("empty query")
    top = bm25_topk_segmented(spark, path, query, k=k)
    root = path.rstrip("/")
    tomb = _read_tombstones(spark, path)
    pos = None
    docs = None
    for seg in sc["segments"]:
        sb = F.lit(_seg_batch(seg)).alias("seg_batch")
        x = (
            _rp(spark, POSITIONS_DDL, f"{root}/segments/{seg}/positions")
            .filter(F.col("tok").isin(q_terms))
            .withColumn("seg_batch", sb)
        )
        pos = x if pos is None else pos.unionByName(x)
        s_ = _rp(spark, DOCS_DDL, f"{root}/segments/{seg}/docs").withColumn(
            "seg_batch", sb
        )
        docs = s_ if docs is None else docs.unionByName(s_)
    top_ids = top.select("doc_id")
    hits = (
        _apply_tombstones(pos, tomb)
        .drop("seg_batch")
        .join(top_ids, "doc_id", "left_semi")
    )
    texts = (
        _apply_tombstones(docs, tomb)
        .drop("seg_batch")
        .join(top_ids, "doc_id", "left_semi")
    )
    return _assemble_snippets(top, hits, texts, window)


def rerank_by_coverage(
    documents: DataFrame,
    query: str,
    k: int = 10,
    pool: int = 20,
    window: int = 8,
) -> DataFrame:
    """Two-stage retrieval (r14): a cheap high-recall BM25 candidate
    pool re-ranked by a precision signal — the best ``window``-token
    span's DISTINCT-query-term coverage (`_best_windows`, the
    highlighter kernel reused as a proximity scorer: bag-of-words BM25
    cannot tell 'terms scattered across the doc' from 'terms
    co-occurring in one span'; the coverage rerank can). Order:
    n_cover DESC, bm25 DESC, doc_id. The production two-stage shape —
    stage 1 is the posting-pruned corpus-scale scorer, stage 2 touches
    only ``pool`` documents.

    Returns (doc_id, bm25, n_cover), top-``k``."""
    if pool < k:
        raise ValueError("pool must be >= k")
    top = bm25_topk(documents, query, k=pool)
    q_terms = sorted(set(query.split()))
    docs_k = documents.join(top.select("doc_id"), "doc_id", "left_semi")
    hits = docs_k.select(
        "doc_id", F.posexplode(tokens(F.col("text"))).alias("pos", "tok")
    ).filter(F.col("tok").isin(q_terms))
    best = _best_windows(hits, window)
    return (
        top.join(best, "doc_id")
        .select(
            "doc_id", "bm25", F.col("n_cover").cast("long").alias("n_cover")
        )
        .orderBy(F.desc("n_cover"), F.desc("bm25"), "doc_id")
        .limit(k)
    )


def rerank_by_coverage_indexed(
    spark: SparkSession,
    path: str,
    query: str,
    k: int = 10,
    pool: int = 20,
    window: int = 8,
) -> DataFrame:
    """`rerank_by_coverage` served from the segmented index: stage-1
    ranking from the postings tier, stage-2 hit positions from the
    PROXIMITY tier (term-pruned per-segment scans, tombstone-filtered)
    — neither the corpus nor even the docstore is touched (coverage
    needs positions, not text). Same output contract, same oracle
    (one logical relation, two physical plans)."""
    if pool < k:
        raise ValueError("pool must be >= k")
    sc = read_postings_sidecar(path)
    if not sc.get("positions", False):
        raise ValueError(
            "index lacks the positions tier — "
            "init_postings_index(..., positions=True)"
        )
    q_terms = sorted(set(query.split()))
    if not q_terms:
        raise ValueError("empty query")
    top = bm25_topk_segmented(spark, path, query, k=pool)
    root = path.rstrip("/")
    tomb = _read_tombstones(spark, path)
    pos = None
    for seg in sc["segments"]:
        x = (
            _rp(spark, POSITIONS_DDL, f"{root}/segments/{seg}/positions")
            .filter(F.col("tok").isin(q_terms))
            .withColumn("seg_batch", F.lit(_seg_batch(seg)))
        )
        pos = x if pos is None else pos.unionByName(x)
    hits = (
        _apply_tombstones(pos, tomb)
        .drop("seg_batch")
        .join(top.select("doc_id"), "doc_id", "left_semi")
    )
    best = _best_windows(hits, window)
    return (
        top.join(best, "doc_id")
        .select(
            "doc_id", "bm25", F.col("n_cover").cast("long").alias("n_cover")
        )
        .orderBy(F.desc("n_cover"), F.desc("bm25"), "doc_id")
        .limit(k)
    )


def rag_context(
    spark: SparkSession,
    documents: DataFrame,
    embeddings: DataFrame,
    query_text: str,
    query_vec_id: int,
    k: int = 10,
    pool: int = 20,
    chunk_chars: int = 200,
    max_chunks_per_doc: int = 2,
    budget_chars: int = 2000,
    predicate=None,
) -> DataFrame:
    """End-to-end RAG context assembly (r12) — the retrieval pipeline
    composed from the green pieces: hybrid lexical+vector retrieval
    (`hybrid_search`), document chunking (`text.chunk_documents`),
    exact chunk dedup, and a context-window budget cut. Returns the
    assembled context relation, one row per chunk in prompt order:

      (ctx_pos, doc_id, rank, chunk_idx, chunk_len, chunk_md5, rrf)

    Assembly contract (all deterministic, fully SQL-replayable):

    1. hybrid top-``k`` docs for (query_text, query_vec_id); retrieval
       rank = RRF order with doc_id ties;
    2. each retrieved doc contributes its first ``max_chunks_per_doc``
       chunks (``chunk_chars`` fixed-width — the leading chunks carry
       titles/abstracts; a production stack would rank chunks, the
       budget/dedup plumbing is identical);
    3. DEDUP'D context: byte-identical chunks (md5) across retrieved
       docs collapse to the earliest (rank, chunk_idx) occurrence —
       near-dup retrieved docs otherwise waste context on repeats;
    4. context-window budget: running chunk_len sum in prompt order,
       rows beyond ``budget_chars`` dropped; ctx_pos renumbers the
       survivors 1..n.

    Scale shape: chunking runs ONLY on the k retrieved docs (semi-join
    first, then chunk — never corpus-wide fan-out); every window is
    over a <= k * max_chunks_per_doc row relation (k-row work, not a
    corpus sort); the corpus-scale stages are exactly hybrid_search's,
    unchanged."""
    from .text import chunk_documents

    if predicate is not None:
        # metadata-scoped RAG (r13): the predicate rides through BOTH
        # retrieval legs via the filtered batch form (single-entry
        # batch == hybrid_search contract, pytest-pinned), so every
        # retrieved doc — and therefore every context chunk — is
        # eligible, with pools FILLED from eligible docs rather than
        # post-filtered down.
        hits = filtered_hybrid_search_multi(
            spark,
            documents,
            embeddings,
            {0: (query_text, query_vec_id)},
            predicate,
            k=k,
            pool=pool,
        ).select("doc_id", "rrf")
    else:
        hits = hybrid_search(
            spark, documents, embeddings, query_text, query_vec_id, k=k, pool=pool
        )
    ranked = _with_rank(hits, [F.desc("rrf"), F.col("doc_id")]).select(
        "doc_id", "rank", "rrf"
    )
    return _assemble_rag_context(
        ranked, documents, k, chunk_chars, max_chunks_per_doc, budget_chars
    )


def _assemble_rag_context(
    ranked: DataFrame,
    texts: DataFrame,
    k: int,
    chunk_chars: int,
    max_chunks_per_doc: int,
    budget_chars: int,
) -> DataFrame:
    """Chunk -> dedup -> budget-cut assembly shared by the corpus-scan
    and index-served RAG forms (the `_assemble_snippets` precedent —
    one logical relation, two physical plans). ``texts`` is any
    (doc_id, text) source: the corpus, or the stored-field docstore."""
    from .text import chunk_documents

    retrieved_docs = texts.join(
        ranked.select("doc_id"), "doc_id", "left_semi"
    ).select("doc_id", "text")
    chunks = chunk_documents(retrieved_docs, chunk_chars=chunk_chars).filter(
        F.col("chunk_idx") < max_chunks_per_doc
    )
    # the context relation holds AT MOST k * max_chunks_per_doc rows by
    # construction (k retrieved docs, first m chunks each); the explicit
    # limit states that bound in the plan, so the assembly windows below
    # are visibly k-row work (the single-partition plan screen checks
    # subtree boundedness, not join-derived cardinality)
    ctx = chunks.join(ranked, "doc_id").limit(k * max_chunks_per_doc)
    # dedup: keep the earliest (rank, chunk_idx) occurrence per digest
    w_dup = Window.partitionBy("chunk_md5").orderBy("rank", "chunk_idx")
    ctx = (
        ctx.withColumn("dup_rn", F.row_number().over(w_dup))
        .filter(F.col("dup_rn") == 1)
        .drop("dup_rn")
    )
    # context budget: running chars in prompt order over <= k*m rows
    w_ord = Window.orderBy("rank", "chunk_idx")
    ctx = (
        ctx.withColumn("running_chars", F.sum("chunk_len").over(w_ord))
        .filter(F.col("running_chars") <= budget_chars)
        .withColumn("ctx_pos", F.row_number().over(w_ord))
    )
    return ctx.select(
        "ctx_pos", "doc_id", "rank", "chunk_idx", "chunk_len", "chunk_md5", "rrf"
    ).orderBy("ctx_pos")


def rag_context_indexed(
    spark: SparkSession,
    postings_path: str,
    ivf_path: str,
    centroids,
    query_text: str,
    query_vec_id: int,
    k: int = 10,
    pool: int = 20,
    chunk_chars: int = 200,
    max_chunks_per_doc: int = 2,
    budget_chars: int = 2000,
    n_probe: int | None = None,
) -> DataFrame:
    """`rag_context` served ENTIRELY from at-rest indexes (r14, the
    last serving-tier gap): the lexical leg ranks from the SEGMENTED
    postings index (`bm25_topk_segmented` — term-pruned scans, sidecar
    stats), the vector leg from the cell-partitioned IVF float index
    (`similarity.ivf_knn_pruned` — directory-pruned cosine, the query
    vector fetched from the index itself), and the chunk text comes
    from the STORED-FIELD docstore tier — the corpus table appears
    NOWHERE in the serving plan (pytest plan-asserted). Output contract
    identical to `rag_context`; the same oracle gates both physical
    forms (the `search_snippets_indexed` precedent).

    ``n_probe`` defaults to ALL cells: the exactness contract of the
    shared oracle requires the exact cosine top-``pool``, and a full
    probe of the cell-partitioned layout computes precisely
    `brute_force_knn` while still serving from the at-rest index files.
    A production deployment sets ``n_probe`` < n_cells and trades the
    recall measured by the `ivf_quality` gate for ~n_probe/n_cells of
    the scan bytes.

    Requires a postings index initialized with ``store_text=True``."""
    import numpy as np

    centroids = np.asarray(centroids, dtype=np.float64)
    sc = read_postings_sidecar(postings_path)
    if not sc.get("stored", False):
        raise ValueError(
            "index lacks the stored-field tier — "
            "init_postings_index(..., store_text=True)"
        )
    lex = _with_rank(
        bm25_topk_segmented(spark, postings_path, query_text, k=pool),
        [F.desc("bm25"), F.col("doc_id")],
    ).select("doc_id", "rank")
    qrow = (
        _rp_sniffed(spark, ivf_path)
        .filter(F.col("vec_id") == int(query_vec_id))
        .select("embedding")
        .head()
    )
    if qrow is None:
        raise ValueError(f"query vec_id {query_vec_id} not in the IVF index")
    if n_probe is None:
        n_probe = len(centroids)
    vec = _with_rank(
        similarity.ivf_knn_pruned(
            spark,
            ivf_path,
            centroids,
            [float(x) for x in qrow[0]],
            k=pool,
            n_probe=n_probe,
            exclude_vec_id=int(query_vec_id),
        ).withColumnRenamed("vec_id", "doc_id"),
        [F.desc("cosine"), F.col("doc_id")],
    ).select("doc_id", "rank")
    hits = rrf_fuse(lex, vec, k=k)
    ranked = _with_rank(hits, [F.desc("rrf"), F.col("doc_id")]).select(
        "doc_id", "rank", "rrf"
    )
    root = postings_path.rstrip("/")
    tomb = _read_tombstones(spark, postings_path)
    docs = None
    for seg in sc["segments"]:
        s_ = _rp(spark, DOCS_DDL, f"{root}/segments/{seg}/docs").withColumn(
            "seg_batch", F.lit(_seg_batch(seg))
        )
        docs = s_ if docs is None else docs.unionByName(s_)
    texts = _apply_tombstones(docs, tomb).drop("seg_batch")
    return _assemble_rag_context(
        ranked, texts, k, chunk_chars, max_chunks_per_doc, budget_chars
    )


def bm25_topk_multi(
    documents: DataFrame,
    queries: dict[int, str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Batched Okapi BM25: top-``k`` per query for a SET of queries in
    ONE corpus scan — the throughput shape a retrieval service actually
    runs (thousands of queries against one posting build), vs
    `bm25_topk`'s one-plan-per-query. Identical scoring contract
    (Lucene '+1' idf, micro-quantized per-(doc, term) partials, doc_id
    ties), so a single-entry batch reproduces `bm25_topk` exactly
    (pytest-pinned).

    Plan: the token stream filters ONCE to the UNION of all query
    terms (one posting-list prune covering every query), tf/df/dl/avgdl
    are computed once and shared, and the per-query fan-out is a join
    against the tiny (qid, tok) relation — per-query cost is the join
    fan-out on matching docs, not a rescan. Top-k per qid is a window
    PARTITIONED by qid (never a single global sort).

    ``queries``: {qid: query_text}. Returns
    (qid, doc_id, bm25, n_terms_hit) for the per-qid top-k."""
    from pyspark.sql import Window as W

    q_pairs = sorted(
        {(int(qid), t) for qid, text in queries.items() for t in set(text.split())}
    )
    if not q_pairs:
        raise ValueError("empty query batch")
    spark = documents.sparkSession
    qterms = spark.createDataFrame(q_pairs, "qid int, tok string")
    all_terms = sorted({t for _, t in q_pairs})

    tok = documents.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("tok")
    )
    dl = documents.select(
        "doc_id", F.size(tokens(F.col("text"))).cast("long").alias("dl")
    )
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("total_dl")
    )
    qtok = tok.filter(F.col("tok").isin(all_terms))
    tf = qtok.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    df_ = qtok.groupBy("tok").agg(F.countDistinct("doc_id").alias("df"))
    dl_matched = dl.join(qtok.select("doc_id"), "doc_id", "left_semi")
    part = (
        tf.join(F.broadcast(qterms), "tok")  # per-query fan-out, term-bounded
        .join(F.broadcast(df_), "tok")
        .join(dl_matched, "doc_id")
        .crossJoin(F.broadcast(stats))
    )
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    avgdl = F.col("total_dl") / F.col("n_docs")
    score_t = (
        idf
        * (F.col("tf") * (k1 + 1))
        / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / avgdl))
    )
    scored = (
        part.withColumn(
            "s_micro", F.round(score_t * F.lit(MICRO)).cast("long")
        )
        .groupBy("qid", "doc_id")
        .agg(
            F.round(F.sum("s_micro") / F.lit(MICRO), 4).alias("bm25"),
            F.count(F.lit(1)).alias("n_terms_hit"),
        )
    )
    w = W.partitionBy("qid").orderBy(F.desc("bm25"), F.col("doc_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("qid", "doc_id", "bm25", "n_terms_hit")
        .orderBy("qid", F.desc("bm25"), "doc_id")
    )


def hybrid_search_multi(
    spark: SparkSession,
    documents: DataFrame,
    embeddings: DataFrame,
    queries: dict[int, tuple[str, int]],
    k: int = 10,
    pool: int = 20,
    c: int = 60,
) -> DataFrame:
    """Batched hybrid retrieval — `hybrid_search` for a SET of queries
    in one plan per side: lexical candidates from `bm25_topk_multi`
    (one corpus scan for the whole batch), vector candidates from one
    broadcast-joined exact-cosine scan over all query vectors, RRF
    fused per query. ``queries``: {qid: (query_text, query_vec_id)}.

    Identical per-query contract to `hybrid_search` (micro-quantized
    reciprocals, doc_id ties), so a single-entry batch reproduces it
    exactly (pytest-pinned). Every window is PARTITIONED by qid; the
    fusion join carries batch*pool rows."""
    from pyspark.sql import Window as W

    from ..functions.vector import cosine_similarity

    if not queries:
        raise ValueError("empty query batch")
    lex_pool = bm25_topk_multi(
        documents, {qid: t for qid, (t, _) in queries.items()}, k=pool
    )
    w_lex = W.partitionBy("qid").orderBy(F.desc("bm25"), F.col("doc_id"))
    lex = (
        lex_pool.withColumn("rank", F.row_number().over(w_lex))
        .select("qid", "doc_id", F.col("rank").alias("rank_a"))
    )
    qvec_rows = []
    for qid, (_, vid) in sorted(queries.items()):
        row = embeddings.filter(F.col("vec_id") == int(vid)).select("embedding").head()
        if row is None:
            raise ValueError(f"query vec_id {vid} not found")
        qvec_rows.append((int(qid), int(vid), [float(x) for x in row[0]]))
    qdf = spark.createDataFrame(
        qvec_rows, "qid int, qvid long, qvec array<double>"
    )
    from .similarity import cosine_scores_np

    w_vec = W.partitionBy("qid").orderBy(F.desc("cosine"), F.col("doc_id"))
    # Arrow/numpy cosine fold (r15 opt, guide §4.2), rounded JVM-side
    vec = (
        cosine_scores_np(
            embeddings.crossJoin(F.broadcast(qdf)).filter(
                F.col("vec_id") != F.col("qvid")
            )
        )
        .withColumn("cosine", F.round("cos", 4))
        .select("qid", F.col("vec_id").alias("doc_id"), "cosine")
        .withColumn("rank", F.row_number().over(w_vec))
        .filter(F.col("rank") <= pool)
        .select("qid", "doc_id", F.col("rank").alias("rank_b"))
    )
    both = lex.join(vec, ["qid", "doc_id"], "full_outer")

    def term(col):
        return F.when(
            col.isNotNull(),
            F.round(F.lit(MICRO) / (F.lit(float(c)) + col), 0).cast("long"),
        ).otherwise(F.lit(0).cast("long"))

    w_rrf = W.partitionBy("qid").orderBy(F.desc("rrf"), F.col("doc_id"))
    return (
        both.select(
            "qid",
            "doc_id",
            "rank_a",
            "rank_b",
            F.round(
                (term(F.col("rank_a")) + term(F.col("rank_b"))) / F.lit(MICRO), 6
            ).alias("rrf"),
        )
        .withColumn("rn", F.row_number().over(w_rrf))
        .filter(F.col("rn") <= k)
        .select("qid", "doc_id", "rank_a", "rank_b", "rrf")
        .orderBy("qid", F.desc("rrf"), "doc_id")
    )



#: writer-controlled at-rest layouts (r14 opt): every reader below
#: passes the explicit schema to spark.read — schema inference is a
#: Spark job per read (~0.15 s) and a segmented probe issues one read
#: per (segment, tier). The postings/doclen/stats/positions/docs
#: layouts have had exactly these columns since the writers were
#: introduced; the attrs tier carries caller-defined columns, so its
#: reads keep Spark inference.
POSTINGS_DDL = "tok string, doc_id long, tf long"
POSITIONS_DDL = "tok string, doc_id long, pos int"
DOCLEN_DDL = "doc_id long, dl long"
STATS_DDL = "n_docs long, total_dl long"
DOCS_DDL = "doc_id long, text string"


def _rp(spark, ddl: str, *paths):
    """Read a WRITER-CONTROLLED layout with its declared DDL, but only
    after a driver-side footer sniff confirms the files really carry
    those (name, type) pairs (r15, VERDICT r14 "what's wrong" #1: the
    blind explicit schema silently read NULLs for any renamed/missing
    column). Sniff mismatch or non-local paths fall back to Spark's own
    inference, which preserves the loud-failure semantics the explicit
    schema bypassed."""
    from pyspark.sql.types import _parse_datatype_string

    from ..sources.fs import sniff_local_parquet_fields

    sniffed = sniff_local_parquet_fields(list(paths))
    if sniffed is not None:
        declared = {
            f.name: f.dataType.simpleString()
            for f in _parse_datatype_string(ddl).fields
        }
        if sniffed == declared:
            return spark.read.schema(ddl).parquet(*paths)
    return spark.read.parquet(*paths)


def _rp_sniffed(spark, path: str):
    """Read an externally-supplied parquet layout with a footer-derived
    explicit schema when local (skips the inference job); Spark
    inference otherwise. The ``cell`` partition column is appended only
    when the directory actually holds ``cell=*`` partition dirs (r15,
    ADVICE r14: unconditionally appending it turned a probe of a
    non-cell-partitioned layout into a silent empty result instead of
    the unresolved-column error inference raises)."""
    import os

    from ..sources.fs import spark_schema_of_local_parquet

    has_cell = os.path.isdir(path) and any(
        e.startswith("cell=") for e in os.listdir(path)
    )
    schema = spark_schema_of_local_parquet(
        [path], partition_cols="cell int" if has_cell else ""
    )
    reader = spark.read if schema is None else spark.read.schema(schema)
    return reader.parquet(path)


def write_postings_index(documents: DataFrame, path: str) -> None:
    """Write the AT-REST lexical index (the Lucene shape): a postings
    table ``(tok, doc_id, tf)`` range-partitioned and sorted by token —
    so a query's ``tok IN (...)`` filter prunes at parquet row-group
    min/max stats and reads only the queried terms' postings — plus a
    doc-length table and a one-row corpus-stats table. Index once,
    query many: `bm25_topk_indexed` probes this without ever rescanning
    the corpus text.

    Layout:
      path/postings  (tok, doc_id, tf)  — range-partitioned by tok,
                                          sorted within partitions
      path/doclen    (doc_id, dl)
      path/stats     (n_docs, total_dl) — one row

    df(t) is NOT materialized: it is a term-bounded aggregate over the
    already-pruned postings at query time, so the index never goes
    stale against its own postings."""
    tok = documents.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("tok")
    )
    tf = tok.groupBy("tok", "doc_id").agg(F.count(F.lit(1)).alias("tf"))
    (
        tf.repartitionByRange("tok")
        .sortWithinPartitions("tok", "doc_id")
        .write.mode("overwrite")
        .parquet(path.rstrip("/") + "/postings")
    )
    dl = documents.select(
        "doc_id", F.size(tokens(F.col("text"))).cast("long").alias("dl")
    )
    dl.write.mode("overwrite").parquet(path.rstrip("/") + "/doclen")
    dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("total_dl")
    ).write.mode("overwrite").parquet(path.rstrip("/") + "/stats")


def bm25_topk_indexed(
    spark: SparkSession,
    path: str,
    query: str,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 top-k over a written postings index — identical scoring
    contract to `bm25_topk` (pytest-pinned equal), but the corpus text
    is never rescanned: the ``tok IN (...)`` filter pushes into the
    postings parquet scan (range-partitioned + sorted by tok, so
    row-group stats prune everything but the queried terms), doc
    lengths semi-join down to matching docs, and the one-row stats
    table broadcasts. Per-query scan bytes track posting-list size,
    not corpus size — the at-rest index shape a retrieval service
    actually serves from."""
    q_terms = sorted(set(query.split()))
    if not q_terms:
        raise ValueError("empty query")
    post = _rp(spark, POSTINGS_DDL, path.rstrip("/") + "/postings").filter(
        F.col("tok").isin(q_terms)
    )
    dl = _rp(spark, DOCLEN_DDL, path.rstrip("/") + "/doclen")
    stats = _rp(spark, STATS_DDL, path.rstrip("/") + "/stats")
    df_ = post.groupBy("tok").agg(F.countDistinct("doc_id").alias("df"))
    dl_matched = dl.join(post.select("doc_id"), "doc_id", "left_semi")
    part = (
        post.join(F.broadcast(df_), "tok")
        .join(dl_matched, "doc_id")
        .crossJoin(F.broadcast(stats))
    )
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    avgdl = F.col("total_dl") / F.col("n_docs")
    score_t = (
        idf
        * (F.col("tf") * (k1 + 1))
        / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / avgdl))
    )
    return (
        part.withColumn(
            "s_micro", F.round(score_t * F.lit(MICRO)).cast("long")
        )
        .groupBy("doc_id")
        .agg(
            F.round(F.sum("s_micro") / F.lit(MICRO), 4).alias("bm25"),
            F.count(F.lit(1)).alias("n_terms_hit"),
        )
        .orderBy(F.desc("bm25"), "doc_id")
        .limit(k)
    )


# --- postings-index segment lifecycle (r13) ---------------------------------
#
# write_postings_index above is the one-shot (write-once) form;
# production Lucene APPENDS segments and MERGES them. The lifecycle
# below mirrors the ANN index machinery (streaming/ann_ingest.py):
# per-batch postings SEGMENTS under a sidecar-listed membership, an
# explicit merge/compaction op, and batch-id-keyed idempotency so an
# at-least-once replay converges to the first attempt's state.
#
# Layout:
#   path/segments/<seg>/postings  (tok, doc_id, tf) range-partitioned +
#                                 sorted by tok (row-group prunable)
#   path/segments/<seg>/doclen    (doc_id, dl)
#   path/sidecar.json             {"segments": [...], "n_docs": N,
#                                  "total_dl": T, "last_batch_id": B}
#
# Staleness contract (df / avgdl / N): NONE of the scoring statistics
# can go stale against the postings. df(t) is never materialized — it
# is recomputed at query time from the term-pruned UNION of segment
# postings, so it always reflects exactly the sidecar-listed segments.
# n_docs / total_dl are exact integers maintained in the sidecar by
# pure addition on append (merge preserves them), so avgdl is always
# the exact corpus value. The one invariant the caller owes the index
# (same as ann_ingest's vec_ids): doc_ids must be UNIQUE across
# appended segments — a doc re-appended in a later segment would
# double-count its dl and tf. Re-indexing a changed doc = delete (the
# tombstone tier below) + append under a fresh segment; the tombstone
# keeps df/dl/stats exact in the meantime and compaction physically
# drops the dead rows and rebases the sidecar stats.
#
# Crash/replay safety: a segment dir is written with overwrite under a
# batch-id-derived name BEFORE the sidecar swap; the swap (tmp+rename)
# is the commit point and records last_batch_id, so a replayed append
# (batch_id <= recorded) is a pure no-op and a pre-swap crash replays
# overwrite-idempotently. Merge swaps the membership list to the single
# merged segment, then deletes the superseded dirs (unreferenced once
# the swap is durable — keeping them leaks disk, the ann_ingest rule).

POSTINGS_SIDECAR = "sidecar.json"


def _postings_sidecar_path(path: str) -> str:
    import os

    return os.path.join(path.rstrip("/"), POSTINGS_SIDECAR)


def read_postings_sidecar(path: str) -> dict:
    import json

    with open(_postings_sidecar_path(path)) as f:
        return json.load(f)


def _write_postings_sidecar(path: str, payload: dict) -> None:
    import json
    import os

    tmp = _postings_sidecar_path(path) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(payload, f)
    os.replace(tmp, _postings_sidecar_path(path))


def _write_postings_segment(
    documents: DataFrame,
    seg_dir: str,
    n_partitions: int | None = None,
    positions: bool = False,
    store_text: bool = False,
    attr_cols: tuple = (),
) -> tuple[int, int]:
    """Write one segment's postings + doclen (and, when the index was
    initialized with the proximity tier, per-occurrence positions —
    the Lucene 'field with positions' option; when initialized with
    stored fields, the (doc_id, text) docstore — Lucene's stored-field
    tier, letting snippet assembly serve without the corpus; when
    initialized with ``attr_cols``, a (doc_id, *attrs) DOC-VALUES
    tier — Lucene's per-document column store, letting metadata
    predicates evaluate index-side for filtered retrieval); returns
    the segment's exact (n_docs, total_dl) for the sidecar
    accumulator.

    ``n_partitions=None`` (default since r14): the tok-range shuffle
    carries no explicit partition count, so AQE sizes the output files
    from the data (advisoryPartitionSizeInBytes) instead of a constant
    — a KB-scale segment lands as one file, a TB-scale one as
    advisory-sized range files, both still tok-sorted/row-group
    prunable (guide §6: output file sizing)."""
    tok = documents.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("tok")
    )
    tf = tok.groupBy("tok", "doc_id").agg(F.count(F.lit(1)).alias("tf"))
    _by_tok = (
        (lambda d: d.repartitionByRange("tok"))
        if n_partitions is None
        else (lambda d: d.repartitionByRange(n_partitions, "tok"))
    )
    (
        _by_tok(tf)
        .sortWithinPartitions("tok", "doc_id")
        .write.mode("overwrite")
        .parquet(seg_dir + "/postings")
    )
    if positions:
        pos = documents.select(
            "doc_id",
            F.posexplode(F.split(F.trim("text"), r"\s+")).alias("pos", "tok"),
        ).select("tok", "doc_id", "pos")
        (
            _by_tok(pos)
            .sortWithinPartitions("tok", "doc_id", "pos")
            .write.mode("overwrite")
            .parquet(seg_dir + "/positions")
        )
    if store_text:
        (
            documents.select("doc_id", "text")
            .sortWithinPartitions("doc_id")  # doc_id row-group prunable
            .write.mode("overwrite")
            .parquet(seg_dir + "/docs")
        )
    if attr_cols:
        (
            documents.select("doc_id", *attr_cols)
            .sortWithinPartitions("doc_id")
            .write.mode("overwrite")
            .parquet(seg_dir + "/attrs")
        )
    dl = documents.select(
        "doc_id", F.size(tokens(F.col("text"))).cast("long").alias("dl")
    )
    dl.write.mode("overwrite").parquet(seg_dir + "/doclen")
    row = dl.agg(
        F.count(F.lit(1)).alias("n"), F.coalesce(F.sum("dl"), F.lit(0)).alias("t")
    ).head()
    return int(row["n"]), int(row["t"])


def _read_tombstones(spark: SparkSession, path: str):
    """Tombstones as (doc_id, del_before), one row per doc with the
    LATEST delete batch, or None if no deletes recorded. A delete is
    SEGMENT-SCOPED (the Lucene liveness semantics): it kills a doc's
    rows only in segments written BEFORE the delete (seg_batch <
    del_before), so a doc re-appended after its delete — the re-index
    flow — stays live."""
    import glob as _glob

    dirs = sorted(_glob.glob(path.rstrip("/") + "/tombstones/del-*"))
    if not dirs:
        return None
    return (
        _rp(spark, "doc_id long, del_before int", *dirs)
        .groupBy("doc_id")
        .agg(F.max("del_before").alias("del_before"))
    )


def _seg_batch(seg: str) -> int:
    """Segment's batch number from its dir name (seg-000001 /
    merged-000003)."""
    return int(seg.rsplit("-", 1)[1])


def _apply_tombstones(df: DataFrame, tomb) -> DataFrame:
    """Drop rows whose segment predates the doc's latest delete.
    ``df`` must carry seg_batch; broadcast left join + keep."""
    if tomb is None:
        return df
    return (
        df.join(F.broadcast(tomb), "doc_id", "left")
        .filter(
            F.col("del_before").isNull()
            | (F.col("del_before") <= F.col("seg_batch"))
        )
        .drop("del_before")
    )


def delete_postings_docs(
    spark: SparkSession, path: str, doc_ids, batch_id: int
) -> dict:
    """Delete documents from the postings index as TOMBSTONES — the
    Lucene liveness-doc design mirrored from the ANN tier
    (streaming/ann_ingest.delete_ann_ids): the ids land in an
    epoch-named parquet log; probes anti-join them INSIDE every segment
    scan (before df, tf, dl and the top-k, so a deleted doc can neither
    score nor perturb any statistic), and the sidecar's n_docs/total_dl
    are adjusted at query time by an EXACT in-plan delta (semi-join of
    the doclen union against the tombstones — a deleted id that never
    existed in the index contributes nothing, so stats stay exact under
    sloppy delete sets too). Physical removal + stats rebase happen at
    `compact_postings_segments`. Deletes are SEGMENT-SCOPED (the
    Lucene liveness semantics): a tombstone kills a doc's rows only in
    segments written BEFORE the delete batch, so re-indexing a changed
    doc is delete + append and the re-appended rows stay live.
    Idempotent via the shared sidecar batch-id guard; the tombstone
    relation is bounded by distinct delete history, not corpus size.

    ``doc_ids`` is an iterable of ints (Lucene-style term deletes) OR a
    DataFrame with a ``doc_id`` column (r14, VERDICT r13: a bulk
    GDPR-class delete set is itself a relation at 100 TB — the ids are
    deduped and written to the tombstone log DISTRIBUTIVELY, never
    routed through the driver). Both input forms funnel into one
    canonical writer (distinct -> hash-repartition by doc_id -> sorted
    files), so a list and a DataFrame carrying the same id set produce
    byte-identical logs (pytest-pinned)."""
    sc = read_postings_sidecar(path)
    if batch_id <= sc["last_batch_id"]:
        return sc
    if isinstance(doc_ids, DataFrame):
        ids_df = doc_ids.select(F.col("doc_id").cast("long")).distinct()
        if ids_df.isEmpty():
            raise ValueError("empty delete set")
    else:
        rows = [(int(d),) for d in sorted(set(doc_ids))]
        if not rows:
            raise ValueError("empty delete set")
        ids_df = spark.createDataFrame(rows, "doc_id long")
    out = ids_df.select(
        "doc_id", F.lit(int(batch_id)).cast("int").alias("del_before")
    ).repartition(8, "doc_id").sortWithinPartitions("doc_id")
    # pin the canonical layout (8 hash buckets, doc_id-sorted files):
    # AQE's partition coalescing would otherwise make the file layout
    # depend on upstream plan statistics, so the same id set arriving
    # as a list vs a relation wrote different logs — the byte-identity
    # contract the pytest pins. The log is tiny relative to the corpus;
    # a fixed 8-way layout costs nothing and diffs cleanly.
    conf_key = "spark.sql.adaptive.coalescePartitions.enabled"
    prev = spark.conf.get(conf_key, "true")
    spark.conf.set(conf_key, "false")
    try:
        out.write.mode("overwrite").parquet(
            path.rstrip("/") + f"/tombstones/del-{batch_id:06d}"
        )
    finally:
        spark.conf.set(conf_key, prev)
    sc = {**sc, "last_batch_id": batch_id}
    _write_postings_sidecar(path, sc)  # commit point
    return sc


def compact_postings_segments(
    spark: SparkSession, path: str, batch_id: int
) -> dict:
    """Merge + physical delete: all segments collapse to one with the
    tombstoned rows DROPPED, the sidecar stats REBASE to the exact
    physical (n_docs, total_dl) of the survivors, and the tombstone log
    retires after the swap (no surviving row references a deleted id).
    This is `merge_postings_segments` extended with the delete tier;
    the plain merge stays tombstone-oblivious by contract (its callers
    hold no deletes)."""
    import glob as _glob
    import shutil

    sc = read_postings_sidecar(path)
    if batch_id <= sc["last_batch_id"]:
        return sc
    root = path.rstrip("/")
    tomb = _read_tombstones(spark, path)
    merged = f"merged-{batch_id:06d}"
    post = None
    dl = None
    pos = None
    docs = None
    attrs = None
    for seg in sc["segments"]:
        sb = F.lit(_seg_batch(seg)).alias("seg_batch")
        p = _rp(spark, POSTINGS_DDL, f"{root}/segments/{seg}/postings").withColumn(
            "seg_batch", sb
        )
        d = _rp(spark, DOCLEN_DDL, f"{root}/segments/{seg}/doclen").withColumn(
            "seg_batch", sb
        )
        post = p if post is None else post.unionByName(p)
        dl = d if dl is None else dl.unionByName(d)
        if sc.get("positions", False):
            x = _rp(
                spark, POSITIONS_DDL, f"{root}/segments/{seg}/positions"
            ).withColumn("seg_batch", sb)
            pos = x if pos is None else pos.unionByName(x)
        if sc.get("stored", False):
            s_ = _rp(
                spark, DOCS_DDL, f"{root}/segments/{seg}/docs"
            ).withColumn("seg_batch", sb)
            docs = s_ if docs is None else docs.unionByName(s_)
        if sc.get("attrs"):
            a_ = spark.read.parquet(
                f"{root}/segments/{seg}/attrs"
            ).withColumn("seg_batch", sb)
            attrs = a_ if attrs is None else attrs.unionByName(a_)
    post = _apply_tombstones(post, tomb).drop("seg_batch")
    dl = _apply_tombstones(dl, tomb).drop("seg_batch")
    (
        post.repartitionByRange("tok")
        .sortWithinPartitions("tok", "doc_id")
        .write.mode("overwrite")
        .parquet(f"{root}/segments/{merged}/postings")
    )
    if pos is not None:
        (
            _apply_tombstones(pos, tomb)
            .drop("seg_batch")
            .repartitionByRange("tok")
            .sortWithinPartitions("tok", "doc_id", "pos")
            .write.mode("overwrite")
            .parquet(f"{root}/segments/{merged}/positions")
        )
    if docs is not None:
        (
            _apply_tombstones(docs, tomb)
            .drop("seg_batch")
            .sortWithinPartitions("doc_id")
            .write.mode("overwrite")
            .parquet(f"{root}/segments/{merged}/docs")
        )
    if attrs is not None:
        (
            _apply_tombstones(attrs, tomb)
            .drop("seg_batch")
            .sortWithinPartitions("doc_id")
            .write.mode("overwrite")
            .parquet(f"{root}/segments/{merged}/attrs")
        )
    dl.write.mode("overwrite").parquet(f"{root}/segments/{merged}/doclen")
    row = (
        _rp(spark, DOCLEN_DDL, f"{root}/segments/{merged}/doclen")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.sum("dl"), F.lit(0)).alias("t"),
        )
        .head()
    )
    superseded = sc["segments"]
    sc = {
        **sc,
        "segments": [merged],
        "n_docs": int(row["n"]),
        "total_dl": int(row["t"]),
        "last_batch_id": batch_id,
    }
    _write_postings_sidecar(path, sc)  # commit point
    for seg in superseded:
        if seg != merged:
            shutil.rmtree(f"{root}/segments/{seg}", ignore_errors=True)
    for d in _glob.glob(f"{root}/tombstones/del-*"):
        shutil.rmtree(d, ignore_errors=True)
    return sc


def init_postings_index(
    documents: DataFrame, path: str, batch_id: int = 0,
    positions: bool = False, store_text: bool = False,
    attr_cols: tuple = (),
) -> dict:
    """Create a segmented postings index from the initial corpus batch.
    ``positions=True`` adds the proximity tier: every segment (this one
    and all future appends/merges — the choice is recorded in the
    sidecar) also carries a per-occurrence (tok, doc_id, pos) relation,
    and `phrase_match_segmented` serves phrase queries from the live
    segment union. ``store_text=True`` adds the stored-field tier: a
    (doc_id, text) docstore per segment, so `search_snippets_indexed`
    assembles highlighted results without ever touching the corpus.
    ``attr_cols`` adds the DOC-VALUES tier (r14): a (doc_id, *attrs)
    relation per segment, so metadata predicates for FILTERED retrieval
    evaluate index-side (`bm25_topk_multi_segmented(predicate=...)`) —
    the Lucene doc-values column store."""
    import os

    seg = f"seg-{batch_id:06d}"
    os.makedirs(path.rstrip("/") + "/segments", exist_ok=True)
    n, t = _write_postings_segment(
        documents, path.rstrip("/") + f"/segments/{seg}",
        positions=positions, store_text=store_text,
        attr_cols=tuple(attr_cols),
    )
    sc = {
        "segments": [seg],
        "n_docs": n,
        "total_dl": t,
        "last_batch_id": batch_id,
        "positions": bool(positions),
        "stored": bool(store_text),
        "attrs": list(attr_cols),
    }
    _write_postings_sidecar(path, sc)
    return sc


def append_postings_segment(
    documents: DataFrame, path: str, batch_id: int
) -> dict:
    """Append a new-docs batch as its own segment (Lucene-style).
    Idempotent under at-least-once replay: batch_id <= the sidecar's
    last_batch_id is a no-op. doc_ids must be new (module contract).
    The positions tier follows the sidecar's init-time choice."""
    sc = read_postings_sidecar(path)
    if batch_id <= sc["last_batch_id"]:
        return sc
    seg = f"seg-{batch_id:06d}"
    n, t = _write_postings_segment(
        documents,
        path.rstrip("/") + f"/segments/{seg}",
        positions=sc.get("positions", False),
        store_text=sc.get("stored", False),
        attr_cols=tuple(sc.get("attrs", ())),
    )
    sc = {
        **sc,
        "segments": sc["segments"] + [seg],
        "n_docs": sc["n_docs"] + n,
        "total_dl": sc["total_dl"] + t,
        "last_batch_id": batch_id,
    }
    _write_postings_sidecar(path, sc)  # commit point
    return sc


def _segment_bytes(root: str, seg: str) -> int:
    """On-disk bytes of one segment dir (all tiers) — the size input to
    the tiered merge policy. Walk, not parquet metadata: the policy
    cares about physical write amplification, which is bytes moved."""
    import os

    total = 0
    for dirpath, _dirs, files in os.walk(f"{root}/segments/{seg}"):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(dirpath, f))
            except OSError:
                pass
    return total


def select_merge_tier(
    sizes: dict[str, int], tier_factor: float | None = 10.0
) -> list[str]:
    """Lucene-style size-tiered merge selection: from the current
    segment sizes (bytes), pick the segments to merge this round — the
    SMALLEST tier, i.e. every segment within ``tier_factor`` x the
    smallest segment's size. Large settled segments fall outside the
    tier and are left untouched, so an N-epoch append stream rewrites
    each byte O(log N) times instead of O(N) (full-union merge).
    ``tier_factor=None`` selects everything (the pre-r14 full merge).
    Returns [] when fewer than 2 segments qualify (nothing to merge).
    Pure on its inputs — unit-tested directly."""
    if len(sizes) < 2:
        return []
    if tier_factor is None:
        return sorted(sizes)
    ordered = sorted(sizes, key=lambda s: (sizes[s], s))
    floor = max(sizes[ordered[0]], 1)
    tier = [s for s in ordered if sizes[s] <= tier_factor * floor]
    return sorted(tier) if len(tier) >= 2 else []


def merge_postings_segments(
    spark: SparkSession, path: str, batch_id: int,
    tier_factor: float | None = 10.0,
) -> dict:
    """Size-tiered Lucene merge (r14): collapse the SMALLEST size tier
    of sidecar-listed segments — every segment within ``tier_factor`` x
    the smallest one's on-disk bytes — into a single segment: postings
    union re-range-partitioned + re-sorted by token (restoring
    row-group prunability degraded by many small segments), doclen (and
    the positions/docs tiers, when present) unioned. Segments OUTSIDE
    the tier (large, settled) are left physically untouched, so merge
    write amplification is bounded by the tier's bytes, not the corpus:
    under a steady append stream each byte is rewritten O(log N) times
    across N epochs instead of O(N) under the pre-r14 full-union merge
    (measured: SCALING.md r14). ``tier_factor=None`` restores the full
    merge (all segments, one survivor). Corpus stats are preserved
    untouched (disjoint doc_ids). Superseded segment dirs are deleted
    AFTER the sidecar swap.

    Tombstone contract (ADVICE r13, made LOUD): this merge is
    tombstone-OBLIVIOUS — re-homing rows under merged-{batch_id} gives
    them seg_batch = batch_id >= any pending delete's del_before, which
    would silently resurrect killed docs in ranking, phrase, and
    snippet serving. With pending tombstones it therefore RAISES and
    directs the caller to `compact_postings_segments` (the merge with
    the delete tier), instead of leaving the contract buried in a
    docstring."""
    import shutil

    sc = read_postings_sidecar(path)
    if batch_id <= sc["last_batch_id"]:
        return sc
    root = path.rstrip("/")
    if _read_tombstones(spark, path) is not None:
        raise ValueError(
            "merge_postings_segments with pending tombstones would "
            "resurrect deleted docs (merged rows get seg_batch >= every "
            "pending del_before) — run compact_postings_segments, the "
            "merge that applies the delete tier"
        )
    sizes = {seg: _segment_bytes(root, seg) for seg in sc["segments"]}
    tier = select_merge_tier(sizes, tier_factor)
    if len(tier) > 1:
        merged = f"merged-{batch_id:06d}"
        post = None
        dl = None
        pos = None
        docs = None
        attrs = None
        for seg in tier:
            p = _rp(spark, POSTINGS_DDL, f"{root}/segments/{seg}/postings")
            d = _rp(spark, DOCLEN_DDL, f"{root}/segments/{seg}/doclen")
            post = p if post is None else post.unionByName(p)
            dl = d if dl is None else dl.unionByName(d)
            if sc.get("positions", False):
                x = _rp(spark, POSITIONS_DDL, f"{root}/segments/{seg}/positions")
                pos = x if pos is None else pos.unionByName(x)
            if sc.get("stored", False):
                s_ = _rp(spark, DOCS_DDL, f"{root}/segments/{seg}/docs")
                docs = s_ if docs is None else docs.unionByName(s_)
            if sc.get("attrs"):
                a_ = spark.read.parquet(f"{root}/segments/{seg}/attrs")
                attrs = a_ if attrs is None else attrs.unionByName(a_)
        (
            post.repartitionByRange("tok")
            .sortWithinPartitions("tok", "doc_id")
            .write.mode("overwrite")
            .parquet(f"{root}/segments/{merged}/postings")
        )
        if pos is not None:
            (
                pos.repartitionByRange("tok")
                .sortWithinPartitions("tok", "doc_id", "pos")
                .write.mode("overwrite")
                .parquet(f"{root}/segments/{merged}/positions")
            )
        if docs is not None:
            (
                docs.sortWithinPartitions("doc_id")
                .write.mode("overwrite")
                .parquet(f"{root}/segments/{merged}/docs")
            )
        if attrs is not None:
            (
                attrs.sortWithinPartitions("doc_id")
                .write.mode("overwrite")
                .parquet(f"{root}/segments/{merged}/attrs")
            )
        dl.write.mode("overwrite").parquet(f"{root}/segments/{merged}/doclen")
        keep = [s for s in sc["segments"] if s not in set(tier)]
        sc = {
            **sc,
            # survivors ordered by their segment batch — probe union
            # order is value-irrelevant but determinism keeps sidecars
            # byte-comparable across replays
            "segments": sorted(keep + [merged], key=_seg_batch),
            "n_docs": sc["n_docs"],
            "total_dl": sc["total_dl"],
            "last_batch_id": batch_id,
        }
        _write_postings_sidecar(path, sc)  # commit point
        for seg in tier:
            shutil.rmtree(f"{root}/segments/{seg}", ignore_errors=True)
    else:
        sc = {**sc, "last_batch_id": batch_id}
        _write_postings_sidecar(path, sc)
    return sc


def bm25_topk_segmented(
    spark: SparkSession,
    path: str,
    query: str,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 top-k over the SEGMENTED postings index: the term-pruned
    probe unions every sidecar-listed segment's postings scan (each
    scan row-group-pruned by the pushed ``tok IN`` filter), df is
    recomputed from that union (exact by construction — the staleness
    contract above), and n_docs / total_dl come from the sidecar as
    plan literals (no stats table scan, no broadcast). Identical
    scoring contract to bm25_topk / bm25_topk_indexed, so a merged and
    an unmerged index return the SAME relation — pinned in pytest and
    by the bm25_index_lifecycle gate. Query cost grows with segment
    COUNT (one pruned scan each), not corpus size; merge restores the
    single-scan shape."""
    q_terms = sorted(set(query.split()))
    if not q_terms:
        raise ValueError("empty query")
    sc = read_postings_sidecar(path)
    if not sc["segments"]:
        raise ValueError("empty index: no segments")
    root = path.rstrip("/")
    post = None
    dl = None
    for seg in sc["segments"]:
        sb = F.lit(_seg_batch(seg)).alias("seg_batch")
        p = (
            _rp(spark, POSTINGS_DDL, f"{root}/segments/{seg}/postings")
            .filter(F.col("tok").isin(q_terms))
            .withColumn("seg_batch", sb)
        )
        d = _rp(spark, DOCLEN_DDL, f"{root}/segments/{seg}/doclen").withColumn(
            "seg_batch", sb
        )
        post = p if post is None else post.unionByName(p)
        dl = d if dl is None else dl.unionByName(d)
    tomb = _read_tombstones(spark, path)
    if tomb is not None:
        # tombstones land INSIDE the scans, SEGMENT-SCOPED (a delete
        # kills only rows in segments older than it, so re-appended
        # docs stay live): dead docs can neither score (tf), count
        # toward df, nor ride in dl; the sidecar's written totals are
        # corrected by the EXACT delta of dead rows actually present
        # (dl join — delete-set entries that never existed contribute
        # nothing).
        del_stats = (
            dl.join(F.broadcast(tomb), "doc_id")
            .filter(F.col("del_before") > F.col("seg_batch"))
            .agg(
                F.count(F.lit(1)).alias("n_del"),
                F.coalesce(F.sum("dl"), F.lit(0)).alias("dl_del"),
            )
        )
        post = _apply_tombstones(post, tomb)
        dl = _apply_tombstones(dl, tomb)
    else:
        del_stats = spark.range(1).select(
            F.lit(0).cast("long").alias("n_del"),
            F.lit(0).cast("long").alias("dl_del"),
        )
    stats = del_stats.select(
        (F.lit(int(sc["n_docs"])) - F.col("n_del")).alias("n_docs"),
        (F.lit(int(sc["total_dl"])) - F.col("dl_del")).alias("total_dl"),
    )
    post = post.drop("seg_batch")
    dl = dl.drop("seg_batch")
    df_ = post.groupBy("tok").agg(F.countDistinct("doc_id").alias("df"))
    dl_matched = dl.join(post.select("doc_id"), "doc_id", "left_semi")
    part = (
        post.join(F.broadcast(df_), "tok")
        .join(dl_matched, "doc_id")
        .crossJoin(F.broadcast(stats))
    )
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    avgdl = F.col("total_dl").cast("double") / F.col("n_docs")
    score_t = (
        idf
        * (F.col("tf") * (k1 + 1))
        / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / avgdl))
    )
    return (
        part.withColumn(
            "s_micro", F.round(score_t * F.lit(MICRO)).cast("long")
        )
        .groupBy("doc_id")
        .agg(
            F.round(F.sum("s_micro") / F.lit(MICRO), 4).alias("bm25"),
            F.count(F.lit(1)).alias("n_terms_hit"),
        )
        .orderBy(F.desc("bm25"), "doc_id")
        .limit(k)
    )


# --- filtered (metadata-scoped) retrieval (r13) ------------------------------

def filtered_bm25_topk_multi(
    documents: DataFrame,
    queries: dict[int, str],
    predicate,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Batched BM25 restricted to predicate-passing documents — the
    lexical leg of tenant/date/lang-scoped retrieval (the production
    RAG shape: 'top-k among the ENGLISH docs', not 'top-k overall that
    happen to be English').

    Scoring contract = Lucene filter-query semantics: idf / dl / avgdl
    / N stay CORPUS-level (they are index statistics), the predicate
    restricts which documents can SCORE. A post-filter on
    bm25_topk_multi's output would instead UNDER-FILL k (the r12
    pre/post-fill lesson, similarity.py in-cell predicate); here the
    predicate lands inside the one corpus scan, before the tf
    aggregation, so every shuffled row is both term- and
    predicate-bounded and the per-qid top-k windows always fill from
    eligible docs.

    ``predicate``: a boolean Column over the documents schema."""
    from pyspark.sql import Window as W

    q_pairs = sorted(
        {(int(qid), t) for qid, text in queries.items() for t in set(text.split())}
    )
    if not q_pairs:
        raise ValueError("empty query batch")
    spark = documents.sparkSession
    qterms = spark.createDataFrame(q_pairs, "qid int, tok string")
    all_terms = sorted({t for _, t in q_pairs})

    # ONE corpus scan: the predicate rides along as a boolean column,
    # evaluated scan-side; df (index stat) aggregates ALL matching
    # docs, tf (candidates) only predicate-passing ones.
    tok = documents.select(
        "doc_id",
        predicate.alias("__ok"),
        F.explode(tokens(F.col("text"))).alias("tok"),
    )
    dl = documents.select(
        "doc_id", F.size(tokens(F.col("text"))).cast("long").alias("dl")
    )
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("total_dl")
    )
    qtok = tok.filter(F.col("tok").isin(all_terms))
    df_ = qtok.groupBy("tok").agg(F.countDistinct("doc_id").alias("df"))
    cand = qtok.filter(F.col("__ok"))
    tf = cand.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    dl_matched = dl.join(cand.select("doc_id"), "doc_id", "left_semi")
    part = (
        tf.join(F.broadcast(qterms), "tok")
        .join(F.broadcast(df_), "tok")
        .join(dl_matched, "doc_id")
        .crossJoin(F.broadcast(stats))
    )
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    avgdl = F.col("total_dl") / F.col("n_docs")
    score_t = (
        idf
        * (F.col("tf") * (k1 + 1))
        / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / avgdl))
    )
    scored = (
        part.withColumn(
            "s_micro", F.round(score_t * F.lit(MICRO)).cast("long")
        )
        .groupBy("qid", "doc_id")
        .agg(
            F.round(F.sum("s_micro") / F.lit(MICRO), 4).alias("bm25"),
            F.count(F.lit(1)).alias("n_terms_hit"),
        )
    )
    w = W.partitionBy("qid").orderBy(F.desc("bm25"), F.col("doc_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("qid", "doc_id", "bm25", "n_terms_hit")
        .orderBy("qid", F.desc("bm25"), "doc_id")
    )


def filtered_hybrid_search_multi(
    spark: SparkSession,
    documents: DataFrame,
    embeddings: DataFrame,
    queries: dict[int, tuple[str, int]],
    predicate,
    k: int = 10,
    pool: int = 20,
    c: int = 60,
) -> DataFrame:
    """Metadata-scoped batched hybrid retrieval (VERDICT r12 task 4):
    `hybrid_search_multi` with the predicate pushed through BOTH legs —
    posting-prune AND predicate inside the lexical corpus scan
    (`filtered_bm25_topk_multi`), predicate-restricted candidates
    inside the vector cosine scan (semi-join on the eligible-id
    relation BEFORE any distance is computed, the in-scan analog of the
    r12 in-cell ANN predicate `similarity.write_ivf_sq8_index` probes).
    Both pools therefore FILL with eligible docs; a post-filter on the
    unfiltered hybrid result would under-fill k.

    The predicate lives on the documents schema; embeddings join it by
    the shared id space (doc_id == vec_id, the derived-column-table
    layout). Query vectors are looked up from the FULL embeddings table
    — the query itself need not pass its own filter. Per-query contract
    (micro-quantized RRF, doc_id ties) is hybrid_search_multi's."""
    from pyspark.sql import Window as W

    from ..functions.vector import cosine_similarity

    if not queries:
        raise ValueError("empty query batch")
    lex_pool = filtered_bm25_topk_multi(
        documents, {qid: t for qid, (t, _) in queries.items()}, predicate, k=pool
    )
    w_lex = W.partitionBy("qid").orderBy(F.desc("bm25"), F.col("doc_id"))
    lex = (
        lex_pool.withColumn("rank", F.row_number().over(w_lex))
        .select("qid", "doc_id", F.col("rank").alias("rank_a"))
    )
    qvec_rows = []
    for qid, (_, vid) in sorted(queries.items()):
        row = embeddings.filter(F.col("vec_id") == int(vid)).select("embedding").head()
        if row is None:
            raise ValueError(f"query vec_id {vid} not found")
        qvec_rows.append((int(qid), int(vid), [float(x) for x in row[0]]))
    qdf = spark.createDataFrame(
        qvec_rows, "qid int, qvid long, qvec array<double>"
    )
    allowed = documents.filter(predicate).select(
        F.col("doc_id").alias("vec_id")
    )
    emb_f = embeddings.join(allowed, "vec_id", "left_semi")
    from .similarity import cosine_scores_np

    w_vec = W.partitionBy("qid").orderBy(F.desc("cosine"), F.col("doc_id"))
    # Arrow/numpy cosine fold (r15 opt, guide §4.2), rounded JVM-side
    vec = (
        cosine_scores_np(
            emb_f.crossJoin(F.broadcast(qdf)).filter(
                F.col("vec_id") != F.col("qvid")
            )
        )
        .withColumn("cosine", F.round("cos", 4))
        .select("qid", F.col("vec_id").alias("doc_id"), "cosine")
        .withColumn("rank", F.row_number().over(w_vec))
        .filter(F.col("rank") <= pool)
        .select("qid", "doc_id", F.col("rank").alias("rank_b"))
    )
    both = lex.join(vec, ["qid", "doc_id"], "full_outer")

    def term(col):
        return F.when(
            col.isNotNull(),
            F.round(F.lit(MICRO) / (F.lit(float(c)) + col), 0).cast("long"),
        ).otherwise(F.lit(0).cast("long"))

    w_rrf = W.partitionBy("qid").orderBy(F.desc("rrf"), F.col("doc_id"))
    return (
        both.select(
            "qid",
            "doc_id",
            "rank_a",
            "rank_b",
            F.round(
                (term(F.col("rank_a")) + term(F.col("rank_b"))) / F.lit(MICRO), 6
            ).alias("rrf"),
        )
        .withColumn("rn", F.row_number().over(w_rrf))
        .filter(F.col("rn") <= k)
        .select("qid", "doc_id", "rank_a", "rank_b", "rrf")
        .orderBy("qid", F.desc("rrf"), "doc_id")
    )


def _attrs_live(spark: SparkSession, path: str, sc: dict | None = None) -> DataFrame:
    """Tombstone-filtered DOC-VALUES union across segments — the live
    (doc_id, *attrs) relation metadata predicates evaluate against."""
    if sc is None:
        sc = read_postings_sidecar(path)
    if not sc.get("attrs"):
        raise ValueError(
            "index lacks the doc-values tier — "
            "init_postings_index(..., attr_cols=(...))"
        )
    root = path.rstrip("/")
    tomb = _read_tombstones(spark, path)
    attrs = None
    for seg in sc["segments"]:
        a_ = spark.read.parquet(f"{root}/segments/{seg}/attrs").withColumn(
            "seg_batch", F.lit(_seg_batch(seg))
        )
        attrs = a_ if attrs is None else attrs.unionByName(a_)
    return _apply_tombstones(attrs, tomb).drop("seg_batch")


def hybrid_search_multi_indexed(
    spark: SparkSession,
    postings_path: str,
    ivf_path: str,
    centroids,
    queries: dict[int, tuple[str, int]],
    k: int = 10,
    pool: int = 20,
    c: int = 60,
    predicate=None,
    n_probe: int | None = None,
) -> DataFrame:
    """Batched hybrid retrieval served ENTIRELY from at-rest indexes
    (r14): the lexical pools from the segmented postings index
    (`bm25_topk_multi_segmented`), the vector pools from ONE scan of
    the cell-partitioned IVF float index joined against the broadcast
    (qid, cell) probe-eligibility pairs and the broadcast query-vector
    relation (the query vectors themselves are fetched from the index),
    RRF fused per qid — the corpus appears nowhere in the plan.

    ``predicate`` pushes through BOTH legs index-side: the lexical leg
    via the doc-values tier inside `bm25_topk_multi_segmented`, the
    vector leg as an eligible-id semi-join (doc-values tier again)
    BEFORE any distance math — pre-filter semantics, pools fill from
    eligible docs. ``n_probe`` defaults to ALL cells so the shared
    exact-cosine oracle contract holds (production trades recall for
    scan bytes by lowering it). Per-query contract identical to
    `hybrid_search_multi` / `filtered_hybrid_search_multi`, so the
    same oracles gate the corpus-scan and index-served forms."""
    import numpy as np

    from pyspark.sql import Window as W

    from ..functions.vector import cosine_similarity
    from .similarity import _probe_cells_for

    if not queries:
        raise ValueError("empty query batch")
    centroids = np.asarray(centroids, dtype=np.float64)
    if n_probe is None:
        n_probe = len(centroids)
    lex_pool = bm25_topk_multi_segmented(
        spark,
        postings_path,
        {qid: t for qid, (t, _) in queries.items()},
        k=pool,
        predicate=predicate,
    )
    w_lex = W.partitionBy("qid").orderBy(F.desc("bm25"), F.col("doc_id"))
    lex = (
        lex_pool.withColumn("rank", F.row_number().over(w_lex))
        .select("qid", "doc_id", F.col("rank").alias("rank_a"))
    )
    index_scan = _rp_sniffed(spark, ivf_path)
    qvids = sorted({int(vid) for _, (_, vid) in queries.items()})
    qvecs = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in index_scan.filter(F.col("vec_id").isin(qvids))
        .select("vec_id", "embedding")
        .collect()
    }
    missing = [v for v in qvids if v not in qvecs]
    if missing:
        raise ValueError(f"query vec_ids {missing} not in the IVF index")
    qdf = spark.createDataFrame(
        [
            (int(qid), int(vid), qvecs[int(vid)])
            for qid, (_, vid) in sorted(queries.items())
        ],
        "qid int, qvid long, qvec array<double>",
    )
    pairs = sorted(
        {
            (int(qid), int(cell))
            for qid, (_, vid) in queries.items()
            for cell in _probe_cells_for(centroids, qvecs[int(vid)], n_probe)
        }
    )
    cells_df = spark.createDataFrame(pairs, "qid int, cell int")
    scan = index_scan.filter(
        F.col("cell").isin(sorted({cl for _, cl in pairs}))
    )
    if predicate is not None:
        allowed = (
            _attrs_live(spark, postings_path)
            .filter(predicate)
            .select(F.col("doc_id").alias("vec_id"))
        )
        scan = scan.join(allowed, "vec_id", "left_semi")
    from .similarity import cosine_scores_np

    w_vec = W.partitionBy("qid").orderBy(F.desc("cosine"), F.col("doc_id"))
    # Arrow/numpy cosine fold (r15 opt, guide §4.2), rounded JVM-side
    vec = (
        cosine_scores_np(
            scan.join(F.broadcast(cells_df), "cell")
            .join(F.broadcast(qdf), "qid")
            .filter(F.col("vec_id") != F.col("qvid"))
        )
        .withColumn("cosine", F.round("cos", 4))
        .select("qid", F.col("vec_id").alias("doc_id"), "cosine")
        .withColumn("rank", F.row_number().over(w_vec))
        .filter(F.col("rank") <= pool)
        .select("qid", "doc_id", F.col("rank").alias("rank_b"))
    )
    both = lex.join(vec, ["qid", "doc_id"], "full_outer")

    def term(col):
        return F.when(
            col.isNotNull(),
            F.round(F.lit(MICRO) / (F.lit(float(c)) + col), 0).cast("long"),
        ).otherwise(F.lit(0).cast("long"))

    w_rrf = W.partitionBy("qid").orderBy(F.desc("rrf"), F.col("doc_id"))
    return (
        both.select(
            "qid",
            "doc_id",
            "rank_a",
            "rank_b",
            F.round(
                (term(F.col("rank_a")) + term(F.col("rank_b"))) / F.lit(MICRO), 6
            ).alias("rrf"),
        )
        .withColumn("rn", F.row_number().over(w_rrf))
        .filter(F.col("rn") <= k)
        .select("qid", "doc_id", "rank_a", "rank_b", "rrf")
        .orderBy("qid", F.desc("rrf"), "doc_id")
    )


def bm25_topk_multi_segmented(
    spark: SparkSession,
    path: str,
    queries: dict[int, str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    predicate=None,
) -> DataFrame:
    """Batched multi-query BM25 served FROM the at-rest segmented index
    — the production serving shape proper (r13): `bm25_topk_multi`'s
    one-scan-per-batch throughput married to `bm25_topk_segmented`'s
    index. ONE term-pruned scan per segment covers the UNION of all
    batch terms (row-group pruning intact), tombstones apply
    segment-scoped before any statistic, df/tf/dl are computed once and
    shared, and the per-query fan-out is the broadcast (qid, tok) join.
    Scoring contract identical to bm25_topk_multi (micro-quantized
    partials, Lucene '+1' idf, qid-partitioned top-k windows), so the
    same oracle SQL gates both.

    ``predicate`` (r14) is the INDEX-SERVED filtered-retrieval form: a
    boolean Column over the DOC-VALUES tier (``attr_cols`` at init —
    Lucene's doc-values filter query), evaluated against the at-rest
    attrs relation with the corpus nowhere in the plan. Semantics are
    `filtered_bm25_topk_multi`'s exactly — df/dl/avgdl/N stay
    corpus-level index stats, only the CANDIDATE (tf) aggregation is
    restricted to predicate-passing docs, so the same filtered oracle
    gates both physical forms. The eligible-id semi-join lands before
    any scoring; pools always fill from eligible docs."""
    from pyspark.sql import Window as W

    q_pairs = sorted(
        {(int(qid), t) for qid, text in queries.items() for t in set(text.split())}
    )
    if not q_pairs:
        raise ValueError("empty query batch")
    qterms = spark.createDataFrame(q_pairs, "qid int, tok string")
    all_terms = sorted({t for _, t in q_pairs})
    sc = read_postings_sidecar(path)
    if not sc["segments"]:
        raise ValueError("empty index: no segments")
    if predicate is not None and not sc.get("attrs"):
        raise ValueError(
            "index lacks the doc-values tier — "
            "init_postings_index(..., attr_cols=(...)) to serve filtered "
            "retrieval from the index"
        )
    root = path.rstrip("/")
    post = None
    dl = None
    attrs = None
    for seg in sc["segments"]:
        sb = F.lit(_seg_batch(seg)).alias("seg_batch")
        p = (
            _rp(spark, POSTINGS_DDL, f"{root}/segments/{seg}/postings")
            .filter(F.col("tok").isin(all_terms))
            .withColumn("seg_batch", sb)
        )
        d = _rp(spark, DOCLEN_DDL, f"{root}/segments/{seg}/doclen").withColumn(
            "seg_batch", sb
        )
        post = p if post is None else post.unionByName(p)
        dl = d if dl is None else dl.unionByName(d)
        if predicate is not None:
            a_ = (
                spark.read.parquet(f"{root}/segments/{seg}/attrs")
                .filter(predicate)  # pushed into the attrs scan
                .withColumn("seg_batch", sb)
            )
            attrs = a_ if attrs is None else attrs.unionByName(a_)
    tomb = _read_tombstones(spark, path)
    if tomb is not None:
        del_stats = (
            dl.join(F.broadcast(tomb), "doc_id")
            .filter(F.col("del_before") > F.col("seg_batch"))
            .agg(
                F.count(F.lit(1)).alias("n_del"),
                F.coalesce(F.sum("dl"), F.lit(0)).alias("dl_del"),
            )
        )
        post = _apply_tombstones(post, tomb)
        dl = _apply_tombstones(dl, tomb)
    else:
        del_stats = spark.range(1).select(
            F.lit(0).cast("long").alias("n_del"),
            F.lit(0).cast("long").alias("dl_del"),
        )
    stats = del_stats.select(
        (F.lit(int(sc["n_docs"])) - F.col("n_del")).alias("n_docs"),
        (F.lit(int(sc["total_dl"])) - F.col("dl_del")).alias("total_dl"),
    )
    post = post.drop("seg_batch")
    dl = dl.drop("seg_batch")
    # df is an INDEX stat: it aggregates ALL live matching docs, never
    # the predicate-restricted candidates (the Lucene filter-query
    # contract shared with filtered_bm25_topk_multi)
    df_ = post.groupBy("tok").agg(F.countDistinct("doc_id").alias("df"))
    cand = post
    if predicate is not None:
        allowed = (
            _apply_tombstones(attrs, tomb).drop("seg_batch").select("doc_id")
        )
        cand = post.join(allowed, "doc_id", "left_semi")
    dl_matched = dl.join(cand.select("doc_id"), "doc_id", "left_semi")
    part = (
        cand.join(F.broadcast(qterms), "tok")
        .join(F.broadcast(df_), "tok")
        .join(dl_matched, "doc_id")
        .crossJoin(F.broadcast(stats))
    )
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    avgdl = F.col("total_dl").cast("double") / F.col("n_docs")
    score_t = (
        idf
        * (F.col("tf") * (k1 + 1))
        / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / avgdl))
    )
    scored = (
        part.withColumn(
            "s_micro", F.round(score_t * F.lit(MICRO)).cast("long")
        )
        .groupBy("qid", "doc_id")
        .agg(
            F.round(F.sum("s_micro") / F.lit(MICRO), 4).alias("bm25"),
            F.count(F.lit(1)).alias("n_terms_hit"),
        )
    )
    w = W.partitionBy("qid").orderBy(F.desc("bm25"), F.col("doc_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("qid", "doc_id", "bm25", "n_terms_hit")
        .orderBy("qid", F.desc("bm25"), "doc_id")
    )


def write_positional_index(documents: DataFrame, path: str) -> None:
    """AT-REST positional index (the Lucene proximity tier, r13): a
    positions table ``(tok, doc_id, pos)`` range-partitioned and sorted
    by token, so a phrase query's ``tok IN (...)`` filter prunes at
    parquet row-group stats and reads only the phrase terms' postings —
    `phrase_match` without ever rescanning the corpus text. Positions
    use `phrase_match`'s exact tokenization contract (whitespace split
    of trimmed text) so the two forms return identical relations.

    Index size is one row per token OCCURRENCE (vs one per (tok, doc)
    in the BM25 postings) — the classical positional-index cost, paid
    once at build; per-query scan bytes track phrase-term frequency."""
    pos = documents.select(
        "doc_id",
        F.posexplode(F.split(F.trim("text"), r"\s+")).alias("pos", "tok"),
    ).select("tok", "doc_id", "pos")
    (
        pos.repartitionByRange("tok")
        .sortWithinPartitions("tok", "doc_id", "pos")
        .write.mode("overwrite")
        .parquet(path.rstrip("/") + "/positions")
    )


def phrase_match_indexed(
    spark: SparkSession, path: str, phrase: str
) -> DataFrame:
    """Exact positional phrase retrieval over the written positional
    index — identical anchor-alignment contract to `phrase_match`
    (token at position p matching phrase index i anchors p - i; an
    occurrence covers all k distinct indexes), but the candidate stream
    comes from the term-pruned positions scan instead of a corpus
    tokenization. Everything after the scan is phrase-term-bounded."""
    terms = phrase.split()
    if not terms:
        raise ValueError("phrase must contain at least one token")
    toks = _rp(spark, POSITIONS_DDL, path.rstrip("/") + "/positions").filter(
        F.col("tok").isin(terms)
    )
    return _phrase_from_positions(toks, terms)


def _phrase_from_positions(toks: DataFrame, terms: list[str]) -> DataFrame:
    """The anchor-alignment tail shared by every positional phrase
    form: term-pruned (doc_id, pos, tok) candidates in, per-document
    occurrence counts out."""
    ix_arr = F.array(
        *[F.when(F.col("tok") == t, F.lit(i)) for i, t in enumerate(terms)]
    )
    legs = toks.select(
        "doc_id",
        "pos",
        F.explode(F.filter(ix_arr, lambda x: x.isNotNull())).alias("ix"),
    ).select("doc_id", (F.col("pos") - F.col("ix")).alias("anchor"), "ix")
    return (
        legs.groupBy("doc_id", "anchor")
        .agg(F.countDistinct("ix").alias("n_ix"))
        .filter(F.col("n_ix") == len(terms))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .orderBy(F.desc("n_occurrences"), "doc_id")
    )


def phrase_match_segmented(
    spark: SparkSession, path: str, phrase: str
) -> DataFrame:
    """Phrase retrieval over the SEGMENTED index's proximity tier: the
    positional analog of `bm25_topk_segmented`. The candidate stream is
    the term-pruned union of per-segment positions relations with
    segment-scoped tombstones applied INSIDE the union (a deleted doc's
    occurrences vanish; a re-appended doc's live version serves), then
    the exact `phrase_match` anchor-alignment contract. Requires an
    index initialized with ``positions=True`` — the sidecar records the
    choice and every append/merge/compact carries the tier forward."""
    terms = phrase.split()
    if not terms:
        raise ValueError("phrase must contain at least one token")
    sc = read_postings_sidecar(path)
    if not sc.get("positions", False):
        raise ValueError(
            "index was initialized without the positions tier — "
            "init_postings_index(..., positions=True)"
        )
    root = path.rstrip("/")
    toks = None
    for seg in sc["segments"]:
        sb = F.lit(_seg_batch(seg)).alias("seg_batch")
        t = (
            _rp(spark, POSITIONS_DDL, f"{root}/segments/{seg}/positions")
            .filter(F.col("tok").isin(terms))
            .withColumn("seg_batch", sb)
        )
        toks = t if toks is None else toks.unionByName(t)
    toks = _apply_tombstones(toks, _read_tombstones(spark, path)).drop(
        "seg_batch"
    )
    return _phrase_from_positions(toks, terms)
