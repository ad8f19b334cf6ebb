"""Text-analysis operators for the training-data pipeline extension:
tokenization, quality scoring, language identification, and document
fingerprinting over the ``documents`` table.

All operators are pure pyspark.sql.functions expressions (no Python UDFs):
they run inside whole-stage codegen and scale linearly with the scan — the
only shuffles below are explicit aggregations. The reference has no text
surface (SURVEY.md §2.9 'absent' list); these follow the BASELINE.json
north-star scope.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..sources.tables import ensure_min_parallelism

# Minimal per-language stopword profiles for the heuristic language
# scorer. The driver's synthetic corpus shares one vocabulary across its
# lang labels, so accuracy on it is not meaningful — the operator verifies
# the scoring/argmax dataflow.
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is"),
    "de": ("der", "die", "das", "und", "ist", "ein"),
    "es": ("el", "la", "de", "y", "es", "un"),
    "fr": ("le", "la", "et", "est", "un", "dans"),
    "zh": ("de", "shi", "le", "zai", "he", "you"),
}

# Deterministic tie-break order for argmax (must match the oracle SQL).
LANG_ORDER = ("en", "de", "es", "fr", "zh")


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization (split on runs of whitespace)."""
    return F.split(F.trim(col), r"\s+")


def token_count(col: Column | str) -> Column:
    """Whitespace token count."""
    return F.size(tokens(col))


def word_token_count(col: Column | str) -> Column:
    """BPE-ish token proxy: count of maximal alphabetic runs (a regex
    subword segmentation baseline; numbers/punctuation counted singly)."""
    return F.size(F.regexp_extract_all(col, F.lit(r"[a-zA-Z]+|[0-9]|[^\sa-zA-Z0-9]"), 0))


def stopword_count(col: Column | str, words: tuple[str, ...]) -> Column:
    """Number of tokens that belong to ``words``."""
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(tokens(col), lambda t: F.array_contains(arr, t)))


def text_stats(documents: DataFrame) -> DataFrame:
    """Per-document quality statistics: length, token counts, average token
    length, stopword ratio, distinct-token ratio. The standard pre-training
    quality-filter features (length/punct/stopword heuristics)."""
    documents = ensure_min_parallelism(documents)
    toks = tokens(F.col("text"))
    n_tokens = F.size(toks)
    return documents.select(
        "doc_id",
        "lang",
        F.length("text").cast("long").alias("n_chars_measured"),
        n_tokens.cast("long").alias("n_tokens"),
        F.round(
            F.aggregate(toks, F.lit(0.0), lambda acc, t: acc + F.length(t)) / n_tokens, 4
        ).alias("avg_token_len"),
        F.round(stopword_count(F.col("text"), LANG_PROFILES["en"]) / n_tokens, 4).alias(
            "stopword_ratio"
        ),
        F.round(F.size(F.array_distinct(toks)) / n_tokens, 4).alias("distinct_ratio"),
    )


def quality_score(documents: DataFrame) -> DataFrame:
    """Composite quality score in [0,1]: rewards moderate length, penalizes
    extreme repetition — a deterministic stand-in for a trained quality
    classifier, usable as a filter predicate at scale.

    Computed from raw (unrounded) ratios — reusing text_stats' rounded
    columns would double-round and drift from the oracle.
    """
    documents = ensure_min_parallelism(documents)
    return documents.select("doc_id", _quality_col().alias("quality"))


def _quality_col() -> Column:
    """The raw composite-quality expression over ``text`` (rounded 4)."""
    toks = tokens(F.col("text"))
    n_tokens = F.size(toks)
    length_score = F.least(n_tokens / F.lit(50.0), F.lit(1.0))
    diversity_score = F.size(F.array_distinct(toks)) / n_tokens
    return F.round(0.5 * length_score + 0.5 * diversity_score, 4)


def _quality_bp_col() -> Column:
    """``_quality_col``'s 4-decimal value in integer BASIS POINTS,
    derived with pure integer arithmetic: the score is the rational
    min(n,50)/100 + d/(2n) (n tokens, d distinct), so
    bp = 100*min(n,50) + floor((10000d + n) / (2n)) is its exact
    half-up rounding at 1e-4 — no double ROUND anywhere, hence no
    engine-specific string-vs-binary rounding divergence (the 10x
    verify caught quality_ensemble flipping percentile buckets on
    .00005-boundary docs). The double division is exact enough for
    floor: every operand is an integer < 2^53 and the quotient's
    distance from any integer is >= 1/(2n), dwarfing the division's
    half-ulp error."""
    toks = tokens(F.col("text"))
    n = F.size(toks)
    d = F.size(F.array_distinct(toks))
    return (
        F.least(n, F.lit(50)).cast("long") * 100
        + F.floor((F.lit(10000).cast("long") * d + n) / (n * 2)).cast("long")
    )


def lang_id(documents: DataFrame) -> DataFrame:
    """Heuristic language ID: score each language profile by stopword hits
    per token, take the argmax with a fixed tie-break order."""
    documents = ensure_min_parallelism(documents)
    toks = tokens(F.col("text"))
    n_tokens = F.size(toks)
    scored = documents.select(
        "doc_id",
        "lang",
        *[
            (stopword_count(F.col("text"), LANG_PROFILES[lg]) / n_tokens).alias(f"score_{lg}")
            for lg in LANG_ORDER
        ],
    )
    best = F.greatest(*[F.col(f"score_{lg}") for lg in LANG_ORDER])
    pred = F.lit(None).cast("string")
    for lg in reversed(LANG_ORDER):
        pred = F.when(F.col(f"score_{lg}") == best, F.lit(lg)).otherwise(pred)
    return scored.select(
        "doc_id",
        "lang",
        F.round(best, 4).alias("best_score"),
        pred.alias("predicted_lang"),
    )


def fingerprint(documents: DataFrame) -> DataFrame:
    """Deterministic document fingerprint: md5 of the normalized
    (lowercased, whitespace-collapsed) text. The exact-dedup key that is
    stable across storage encodings; 16 bytes per doc instead of the full
    text makes the dedup shuffle payload tiny at 100 TB."""
    documents = ensure_min_parallelism(documents)
    normalized = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    return documents.select(
        "doc_id",
        F.md5(normalized).alias("fingerprint"),
        F.length("text").cast("long").alias("n_chars_measured"),
    )


def token_counts(documents: DataFrame) -> DataFrame:
    """Per-document token counts under both tokenizers: whitespace and
    the BPE-ish regex proxy (alphabetic runs + single digits/punct —
    approximates subword token budgets for pre-training data sizing).
    Pure codegen regexp work, no shuffle."""
    documents = ensure_min_parallelism(documents)
    return documents.select(
        "doc_id",
        token_count(F.col("text")).cast("long").alias("ws_tokens"),
        word_token_count(F.col("text")).cast("long").alias("bpe_ish_tokens"),
    )


def winnow_fingerprints(documents: DataFrame, k: int = 4, w: int = 5) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    SIGMOD'03 — the MOSS algorithm): hash every k-gram of tokens, slide
    a window of ``w`` consecutive hashes, keep each window's minimum.
    Guarantees any shared run of >= w + k - 1 tokens between two
    documents shares at least one fingerprint, with a ~2/(w+1) sampling
    rate of the k-gram stream.

    Shingle hashes are md5 STRINGS (not xxhash64) so the operator is
    bit-identical in ANSI SQL engines for the oracle check; the
    selection per window is the lexicographic min. All array work is
    per-row codegen — the only job-level cost is the scan."""
    documents = ensure_min_parallelism(documents)
    toks = tokens(F.col("text"))
    n_sh = F.greatest(F.size(toks) - (k - 1), F.lit(1))
    sh = F.transform(
        F.sequence(F.lit(1), n_sh),
        lambda i: F.md5(F.concat_ws(" ", F.slice(toks, i, k))),
    )
    fps = documents.select("doc_id", sh.alias("sh")).select(
        "doc_id",
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.greatest(F.size("sh") - (w - 1), F.lit(1))),
                lambda j: F.array_min(F.slice("sh", j, w)),
            )
        ).alias("fps"),
    )
    return fps.select(
        "doc_id",
        F.size("fps").cast("long").alias("n_fingerprints"),
        F.array_min("fps").alias("min_fp"),
        F.array_max("fps").alias("max_fp"),
    )


def top_terms(documents: DataFrame, k: int = 20) -> DataFrame:
    """Corpus-level term frequencies: explode tokens, hash-aggregate
    counts, keep the top k (deterministic tie-break on the term). The
    explode shuffles (term, partial count) after map-side combine; at
    100 TB this is the canonical word-count shape — no arrays survive
    the exchange and TakeOrderedAndProject keeps k rows per partition.
    """
    documents = ensure_min_parallelism(documents)
    return (
        documents.select(F.explode(tokens(F.col("text"))).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "term")
        .limit(k)
    )


def tfidf_top_terms_by_lang(documents: DataFrame, k: int = 5) -> DataFrame:
    """Most distinctive terms per language by summed TF-IDF
    (tf = term count in doc, idf = ln(N / df) with document frequency df
    over the whole corpus).

    Scale shape: one explode pass feeds BOTH aggregates — per-(doc,term)
    tf and per-term df — and the |terms|-sized idf relation broadcasts
    back; the fact-sized (doc, term) stream never joins another
    fact-sized side. Top-k per lang is a bounded window over the
    (lang, term) aggregate, which is already small.
    """
    documents = ensure_min_parallelism(documents)
    n_docs = documents.count()
    doc_terms = documents.select(
        "doc_id", "lang", F.explode(tokens(F.lower(F.col("text")))).alias("term")
    ).filter(F.length("term") >= 3)
    tf = doc_terms.groupBy("doc_id", "lang", "term").agg(
        F.count(F.lit(1)).alias("tf")
    )
    df_ = (
        tf.groupBy("term")
        .agg(F.countDistinct("doc_id").alias("df"))
        .withColumn("idf", F.log(F.lit(float(n_docs)) / F.col("df")))
    )
    lang_term = (
        tf.join(F.broadcast(df_), "term")
        .groupBy("lang", "term")
        .agg(F.round(F.sum(F.col("tf") * F.col("idf")), 4).alias("tfidf"))
    )
    w = Window.partitionBy("lang").orderBy(F.desc("tfidf"), "term")
    return (
        lang_term.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("lang", "rank", "term", "tfidf")
        .orderBy("lang", "rank")
    )


def decontaminate(
    documents: DataFrame,
    eval_source: str = "src0",
    shingle_n: int = 3,
    threshold: float = 0.2,
) -> DataFrame:
    """Train/eval contamination report: for every eval-split document,
    the fraction of its distinct word ``shingle_n``-grams that appear
    anywhere in the train split (all other sources), and a contaminated
    flag at ``threshold``. The standard pre-training decontamination
    check (n-gram overlap, as in GPT-3/C4-style dataset hygiene).

    Scale shape: grams are xxhash64-reduced BEFORE any shuffle, so the
    distinct and the overlap join move 8-byte ints, never gram strings
    (collision odds ~n²/2⁶⁴ — immaterial next to the shingle
    approximation itself); the eval side is tiny by construction, so the
    overlap join is a broadcast-able semi-join per gram hash, then one
    aggregate per eval doc. Never joins text payloads.
    """
    documents = ensure_min_parallelism(documents)
    from .dedup import rolling_shingles, token_hashes

    # Token hashes materialize in their own projection and the rolling
    # fold replaces string-shingle construction entirely (same xxhash64
    # collision class as before — grams were already hash-reduced before
    # any shuffle; the fold is ~8x cheaper than building gram strings).
    eval_docs = documents.filter(F.col("source") == eval_source)
    train_grams = (
        documents.filter(F.col("source") != eval_source)
        .select(token_hashes(F.lower(F.col("text"))).alias("thv"))
        .select(F.explode(rolling_shingles(F.col("thv"), shingle_n)).alias("gram"))
        .distinct()
        .withColumn("in_train", F.lit(1))
    )
    eval_grams = eval_docs.select(
        "doc_id", token_hashes(F.lower(F.col("text"))).alias("thv")
    ).select(
        "doc_id", F.explode(rolling_shingles(F.col("thv"), shingle_n)).alias("gram")
    )
    overlap = (
        eval_grams.join(train_grams, "gram", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.coalesce("in_train", F.lit(0))).alias("n_shared"),
        )
        .withColumn(
            "contamination", F.round(F.col("n_shared") / F.col("n_grams"), 4)
        )
        .withColumn("contaminated", (F.col("contamination") >= threshold).cast("int"))
    )
    return overlap.select(
        "doc_id", "n_grams", "n_shared", "contamination", "contaminated"
    ).orderBy("doc_id")


def quality_percentile_filter(documents: DataFrame, drop_pct: float = 0.1) -> DataFrame:
    """Drop the worst ``drop_pct`` of documents per language by quality
    score — percentile-based corpus filtering, rank-defined rather than
    threshold-interpolated so the cut is reproducible across engines
    (percent_rank with a doc_id tiebreaker; an interpolated quantile
    threshold can land exactly on a score and flip membership between
    engines).

    Scale shape (VERDICT r10): ``Window.partitionBy("lang")`` puts a
    dominant language (~90%-English web corpora) through ONE task — the
    exact failure mode `sources/maintenance.py` documents. Now computed
    by `distributed_rank.grouped_percent_rank`: the range partitioner
    keys on (lang, quality, doc_id), so the hot language spreads over
    many contiguous partitions; per-group ranks come from local ranks +
    a (partition x lang) offset census. Identical percent_rank values
    (the doc_id tiebreak makes the order total), oracle-pinned.
    """
    from .distributed_rank import grouped_percent_rank

    documents = ensure_min_parallelism(documents)
    scored = documents.select("doc_id", "lang", _quality_col().alias("quality"))
    return (
        grouped_percent_rank(
            scored, ["quality", "doc_id"], out="__pr", group_cols=("lang",)
        )
        .withColumn("pct_rank", F.round(F.col("__pr"), 6))
        .filter(F.col("pct_rank") >= drop_pct)
        .select("doc_id", "lang", "quality", "pct_rank")
        .orderBy("doc_id")
    )


def quality_ensemble(documents: DataFrame) -> DataFrame:
    """Rank-fusion quality score: the mean of three signals' corpus
    percentile ranks — composite heuristic quality (higher = better),
    bigram-LM surprisal (lower = better, orientation flipped), and the
    linear-model score (higher = better) — hard-gated by the Gopher
    rule conjunction. Rank fusion is how production curation stacks
    combine incommensurable signals (raw scales don't compare; ranks
    do).

    Percentiles are computed WITHOUT a global single-partition window:
    each signal is already rounded to 4 digits, so its distinct values
    form a <=10k-row census (basis points); ``pr(s) = #{s' < s}/(n-1)``
    falls out of a cumulative sum over that tiny relation, broadcast
    back onto the corpus. This is the token_budget_select trick applied
    to ranking — exact, engine-replayable, and one partial aggregation
    per signal at any corpus size.
    """
    documents = ensure_min_parallelism(documents)
    # Each signal relation feeds THREE trees (the n count, the census,
    # and the per-doc rejoin); localCheckpoint computes the signal once.
    # The materialized form is two columns per doc — far smaller than
    # re-running the signal (bigram_lm_score alone is a corpus-scale
    # n-gram join). Measured: 14.0 s -> ~4 s at sf0.1.
    # The quality signal arrives as integer basis points directly
    # (_quality_bp_col): its census bucket is then engine-exact by
    # construction, not a double ROUND away from flipping.
    q = documents.select(
        "doc_id", _quality_bp_col().alias("bp")
    ).localCheckpoint()
    lm = (
        bigram_lm_score(documents)
        .select("doc_id", F.col("bits_per_token").alias("s"))
        .localCheckpoint()
    )
    lin = (
        linear_score(documents)
        .select("doc_id", F.col("score_per_token").alias("s"))
        .localCheckpoint()
    )
    gate = gopher_quality_flags(documents).select("doc_id", "keep")

    def pct_rank(scored: DataFrame, out: str, ascending: bool) -> DataFrame:
        """pr = (# strictly better-ranked docs) / (n-1) via bucket census.
        Accepts either a pre-bucketed ``bp`` column (integer-exact
        signals) or a rounded-to-4 double ``s`` (s*10000 is then
        half an integer away from any boundary — safe)."""
        bp = (
            scored
            if "bp" in scored.columns
            else scored.withColumn(
                "bp", F.round(F.col("s") * 10000).cast("long")
            )
        )
        census = bp.groupBy("bp").agg(F.count(F.lit(1)).alias("c"))
        order = F.col("bp").asc() if ascending else F.col("bp").desc()
        w = Window.orderBy(order).rowsBetween(
            Window.unboundedPreceding, -1
        )
        cum = census.withColumn("below", F.coalesce(F.sum("c").over(w), F.lit(0)))
        n = scored.count()
        denom = max(n - 1, 1)
        return bp.join(F.broadcast(cum.select("bp", "below")), "bp").select(
            "doc_id", (F.col("below") / F.lit(denom)).alias(out)
        )

    pr_q = pct_rank(q, "pr_quality", ascending=True)
    pr_lm = pct_rank(lm, "pr_fluency", ascending=False)  # low surprisal = good
    pr_lin = pct_rank(lin, "pr_model", ascending=True)
    return (
        pr_q.join(pr_lm, "doc_id", "left")
        .join(pr_lin, "doc_id", "left")
        .join(gate, "doc_id")
        .select(
            "doc_id",
            F.round("pr_quality", 4).alias("pr_quality"),
            F.round(F.coalesce("pr_fluency", F.lit(0.5)), 4).alias("pr_fluency"),
            F.round(F.coalesce("pr_model", F.lit(0.5)), 4).alias("pr_model"),
            F.round(
                (F.col("pr_quality")
                 + F.coalesce("pr_fluency", F.lit(0.5))
                 + F.coalesce("pr_model", F.lit(0.5))) / 3.0,
                4,
            ).alias("ensemble"),
            "keep",
        )
        .orderBy("doc_id")
    )


PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE_RE = r"\+1-555-[0-9]{4}"


def pii_scrub(documents: DataFrame) -> DataFrame:
    """Detect and mask PII (emails, phone numbers) — the scrubbing pass
    every pre-training corpus needs before tokenization.

    The synthetic corpus carries no PII, so the operator first AUGMENTS
    each document with a deterministic doc_id-derived email and phone
    (making the scrub observable end-to-end), then counts matches and
    replaces them with typed mask tokens. Patterns restrict to the
    regex-dialect intersection of Java (Spark) and RE2 (DuckDB/most SQL
    engines) so the oracle replays them verbatim. Pure per-row codegen —
    the scan is the only cost at 100 TB; output carries an md5 of the
    scrubbed text, never the text itself, so the check shuffles 16-byte
    digests.
    """
    documents = ensure_min_parallelism(documents)
    aug = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or +1-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    scrubbed = F.regexp_replace(
        F.regexp_replace(aug, PII_EMAIL_RE, "<EMAIL>"), PII_PHONE_RE, "<PHONE>"
    )
    return documents.select(
        "doc_id",
        F.regexp_count(aug, F.lit(PII_EMAIL_RE)).cast("long").alias("n_emails"),
        F.regexp_count(aug, F.lit(PII_PHONE_RE)).cast("long").alias("n_phones"),
        F.md5(scrubbed).alias("scrubbed_md5"),
    )


def chunk_documents(documents: DataFrame, chunk_chars: int = 200) -> DataFrame:
    """Split every document into fixed-width character chunks — the
    context-window pre-slicing step (larger docs become multiple training
    rows). Emits (doc_id, chunk_idx, chunk_len, chunk_md5).

    posexplode of an index sequence + substring is whole-stage codegen;
    the output fans out rows ~len/chunk_chars x but shuffles nothing.
    Empty documents still yield their one (empty) chunk so the row set is
    total over the corpus.
    """
    documents = ensure_min_parallelism(documents)
    n_chunks = F.greatest(
        F.ceil(F.length("text") / F.lit(float(chunk_chars))).cast("long"),
        F.lit(1).cast("long"),
    )
    return (
        documents.select(
            "doc_id",
            F.col("text"),
            F.explode(F.sequence(F.lit(0).cast("long"), n_chunks - 1)).alias(
                "chunk_idx"
            ),
        )
        .select(
            "doc_id",
            "chunk_idx",
            F.substring(
                F.col("text"),
                (F.col("chunk_idx") * chunk_chars + 1).cast("int"),
                chunk_chars,
            ).alias("chunk"),
        )
        .select(
            "doc_id",
            "chunk_idx",
            F.length("chunk").cast("long").alias("chunk_len"),
            F.md5("chunk").alias("chunk_md5"),
        )
        .orderBy("doc_id", "chunk_idx")
    )


def repetition_ratio(documents: DataFrame) -> DataFrame:
    """Repetition quality signal: fraction of word bigrams that are
    repeats of an earlier bigram in the same document (1 - distinct/total)
    — the standard boilerplate/template detector in corpus filtering.

    All array work is per-row codegen (no explode-shuffle: the distinct
    count happens inside the row via array_distinct), so the scan is the
    whole job. Ratio is one IEEE division + subtraction on both engines —
    drift-free.
    """
    documents = ensure_min_parallelism(documents)
    toks = tokens(F.col("text"))
    n_bi = F.greatest(F.size(toks) - 1, F.lit(1))
    bigrams = F.transform(
        F.sequence(F.lit(1), n_bi),
        lambda i: F.concat_ws(" ", F.slice(toks, i, 2)),
    )
    return documents.select(
        "doc_id",
        F.size(bigrams).cast("long").alias("n_bigrams"),
        F.size(F.array_distinct(bigrams)).cast("long").alias("n_distinct"),
        F.round(
            F.lit(1.0) - F.size(F.array_distinct(bigrams)) / F.size(bigrams), 4
        ).alias("rep_ratio"),
    )


def pack_sequences(documents: DataFrame, capacity: int = 256) -> DataFrame:
    """Assign documents to training-sequence bins of ~``capacity`` tokens
    (contiguous streaming packing): docs are taken in doc_id order within
    each language and a doc's bin is its starting token offset divided by
    the capacity. The batch-construction step between filtering and
    tokenized output.

    Bins can overrun by at most one document (the standard streaming-pack
    semantics — true first-fit bin packing is inherently sequential).
    One window shuffle on (lang); the cumulative sum is computed
    per-partition after the range sort, so at 100 TB the cost is one
    range-partitioned sort of (lang, doc_id, n_tokens) triples — the
    text itself never enters the window.
    """
    documents = ensure_min_parallelism(documents)
    n_tok = token_count(F.col("text"))
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = F.sum("n_tokens").over(w)
    return (
        documents.select("doc_id", "lang", n_tok.cast("long").alias("n_tokens"))
        .withColumn(
            "bin_id", F.floor((cum - F.col("n_tokens")) / F.lit(capacity)).cast("long")
        )
        .orderBy("doc_id")
    )


def feature_hash_vectors(documents: DataFrame, n_buckets: int = 64) -> DataFrame:
    """Feature-hashing (hashing-trick) term-frequency vectors as flat
    (doc_id, bucket, tf) rows — the fixed-width featurization step
    (Weinberger et al., ICML'09) between raw text and any linear model /
    nearest-neighbor index, with no vocabulary to build or broadcast.

    Flat rows rather than assembled arrays: the aggregate shuffles
    (doc, bucket) partials with map-side combine, downstream consumers
    can pivot or collect per need, and external comparators can hash the
    relation. Bucket ids come from the portable md5 token hash, so the
    oracle replays them exactly.
    """
    from .dedup import portable_token_hashes

    documents = ensure_min_parallelism(documents)
    return (
        documents.select(
            "doc_id", portable_token_hashes(F.col("text")).alias("tv")
        )
        .select("doc_id", F.explode("tv").alias("h"))
        .groupBy("doc_id", (F.col("h") % n_buckets).cast("int").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("tf"))
        .orderBy("doc_id", "bucket")
    )


def linear_score(documents: DataFrame, n_buckets: int = 64) -> DataFrame:
    """Score every document with a linear model over hashed-tf features
    — the INFERENCE half of a fasttext-style quality classifier, as one
    declarative plan. Weights here are a fixed deterministic grid
    (``w_b = (b*37) % 21 - 10``, integer milli-units) so the whole dot
    product stays in integer arithmetic and any engine replays it
    bit-for-bit; swap in a trained relation from
    ``train_logreg_hashed`` for production scoring.

    Scale shape: (doc, bucket, tf) rows join a |buckets|-row broadcast
    weight relation, one per-doc sum — model scoring costs exactly one
    aggregation over the feature relation, and the model itself never
    exceeds a broadcast.
    """
    spark = documents.sparkSession
    weights = spark.range(n_buckets).select(
        F.col("id").cast("int").alias("bucket"),
        ((F.col("id") * 37) % 21 - 10).cast("long").alias("w_milli"),
    )
    fh = feature_hash_vectors(documents, n_buckets)
    return (
        fh.join(F.broadcast(weights), "bucket")
        .groupBy("doc_id")
        .agg(
            F.sum(F.col("tf") * F.col("w_milli")).alias("score_milli"),
            F.sum("tf").alias("n_tokens_hashed"),
        )
        .withColumn(
            "score_per_token",
            # The 4-decimal score is rounded in INTEGER arithmetic:
            # score/n/1000 at 1e-4 units is the rational
            # (score_milli*10)/n, and (2|a|+b) DIV 2b is its exact
            # half-away-from-zero rounding. Rounding the DOUBLE instead
            # divergences across engines for boundary values — Spark's
            # round() rounds the shortest decimal repr (HALF_UP on the
            # string) while DuckDB rounds in binary, and at 10x the
            # corpus several docs landed on .00005 boundaries
            # (VERIFY_sf1_r08). Same-integer-in, same-double-out is
            # engine-exact at any scale.
            F.expr(
                "CAST(CASE WHEN score_milli < 0 THEN "
                "-((abs(score_milli)*20 + n_tokens_hashed) "
                "DIV (2*n_tokens_hashed)) "
                "ELSE ((score_milli*20 + n_tokens_hashed) "
                "DIV (2*n_tokens_hashed)) END AS DOUBLE) / 10000.0"
            ),
        )
        .orderBy("doc_id")
    )


def train_logreg_hashed(
    documents: DataFrame,
    target_lang: str = "en",
    n_buckets: int = 64,
    iters: int = 8,
    lr: float = 1.0,
) -> tuple[DataFrame, list[float]]:
    """TRAIN a quality/domain classifier: batch-gradient logistic
    regression on hashed term-frequency features (the distributed
    fasttext-lite every curation stack keeps around), predicting
    membership in ``target_lang``. Returns (weights DataFrame with
    ``bucket``/``weight`` rows + bias as bucket -1, per-iteration log
    losses).

    Every step is a DataFrame plan — no Python UDFs, no per-row driver
    work: z = feature ⋈ broadcast(weights) → per-doc sum; the gradient
    is one groupBy(bucket) over err × x rows. The driver materializes
    exactly ``n_buckets+1`` weight rows and one loss scalar per
    iteration — the same k-row discipline as the distributed k-means
    update (similarity.py), so 1000 executors never funnel data through
    the driver. Features are L1-normalized per doc (tf/n_tokens) to
    keep gradients bounded without a second pass.
    """
    fh = feature_hash_vectors(documents, n_buckets)
    norm = fh.groupBy("doc_id").agg(F.sum("tf").alias("n_tok"))
    x = (
        fh.join(norm, "doc_id")
        .select("doc_id", "bucket", (F.col("tf") / F.col("n_tok")).alias("x"))
        .localCheckpoint()  # reused every iteration: truncate lineage once
    )
    y = documents.select(
        "doc_id", (F.col("lang") == target_lang).cast("double").alias("y")
    ).localCheckpoint()
    n_docs = y.count()
    spark = documents.sparkSession
    w = {b: 0.0 for b in range(n_buckets)}
    bias = 0.0
    losses: list[float] = []
    for _ in range(iters):
        wdf = spark.createDataFrame(list(w.items()), ["bucket", "weight"])
        z = (
            x.join(F.broadcast(wdf), "bucket")
            .groupBy("doc_id")
            .agg(F.sum(F.col("x") * F.col("weight")).alias("z"))
        )
        scored = (
            y.join(z, "doc_id", "left")
            .select(
                "doc_id",
                "y",
                (F.lit(1.0) / (F.lit(1.0) + F.exp(-(F.coalesce(F.col("z"), F.lit(0.0)) + bias)))).alias("p"),
            )
        )
        err = scored.select("doc_id", (F.col("p") - F.col("y")).alias("err"))
        # distributed gradient: n_buckets rows + 1 scalar reach the driver
        grad_rows = (
            x.join(err, "doc_id")
            .groupBy("bucket")
            .agg(F.sum(F.col("x") * F.col("err")).alias("g"))
            .collect()
        )
        stats = scored.agg(
            F.sum(F.col("p") - F.col("y")).alias("gb"),
            F.avg(
                -(F.col("y") * F.log(F.greatest(F.col("p"), F.lit(1e-12)))
                  + (1 - F.col("y")) * F.log(F.greatest(1 - F.col("p"), F.lit(1e-12))))
            ).alias("loss"),
        ).collect()[0]
        for r in grad_rows:
            w[r["bucket"]] -= lr * r["g"] / n_docs * n_buckets
        bias -= lr * stats["gb"] / n_docs
        losses.append(stats["loss"])
    rows = [(b, wv) for b, wv in sorted(w.items())] + [(-1, bias)]
    return spark.createDataFrame(rows, ["bucket", "weight"]), losses


def logreg_predict(documents: DataFrame, weights: DataFrame, n_buckets: int = 64) -> DataFrame:
    """Apply a trained hashed-feature logistic model: p = sigmoid(w·x + b)
    per document. Same broadcast-join shape as scoring — the model rides
    to the data, never the reverse."""
    fh = feature_hash_vectors(documents, n_buckets)
    norm = fh.groupBy("doc_id").agg(F.sum("tf").alias("n_tok"))
    x = fh.join(norm, "doc_id").select(
        "doc_id", "bucket", (F.col("tf") / F.col("n_tok")).alias("x")
    )
    bias = weights.filter(F.col("bucket") == -1).select("weight")
    z = (
        x.join(F.broadcast(weights.filter(F.col("bucket") >= 0)), "bucket")
        .groupBy("doc_id")
        .agg(F.sum(F.col("x") * F.col("weight")).alias("z"))
    )
    return (
        z.crossJoin(F.broadcast(bias))
        .select(
            "doc_id",
            (F.lit(1.0) / (F.lit(1.0) + F.exp(-(F.col("z") + F.col("weight"))))).alias("p"),
        )
        .withColumn("predicted", (F.col("p") >= 0.5).cast("int"))
    )


def corpus_drift(
    docs_a: DataFrame, docs_b: DataFrame, n_buckets: int = 256
) -> DataFrame:
    """Distribution drift between two corpus versions — the monitoring
    step a training pipeline runs when a new crawl snapshot lands:
    hashed-bucket token histograms of A and B (add-one smoothed),
    per-bucket KL contributions both ways plus the total-variation
    term. Alerting thresholds sit on the aggregated KL; the per-bucket
    relation (returned here, ``n_buckets`` rows) localizes WHICH
    feature mass moved.

    Cross-engine exactness: counts are integers and every per-bucket
    log2 term is quantized to integer micro-bits (the bigram_lm_score
    recipe), so sums over buckets are order-free. Scale shape: two
    token-explode partial aggregations into ``n_buckets``-row
    relations; the comparison itself is constant-size work regardless
    of corpus size.
    """
    docs_a = ensure_min_parallelism(docs_a)
    docs_b = ensure_min_parallelism(docs_b)
    return drift_from_histograms(
        token_histogram(docs_a, n_buckets),
        token_histogram(docs_b, n_buckets),
        n_buckets,
    )


def token_histogram(documents: DataFrame, n_buckets: int = 256) -> DataFrame:
    """Hashed-token histogram (bucket, cnt) — the constant-size corpus
    signature drift monitoring compares. One token-explode partial
    aggregation; output is n_buckets rows whatever the corpus."""
    return (
        documents.select(F.explode(tokens(F.col("text"))).alias("tok"))
        .withColumn("bucket", F.pmod(F.xxhash64("tok"), F.lit(n_buckets)))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def drift_from_histograms(
    hist_a: DataFrame, hist_b: DataFrame, n_buckets: int = 256
) -> DataFrame:
    """Per-bucket KL/TV drift terms between two (bucket, cnt) histograms
    (see corpus_drift). Histograms may come from a live micro-batch and
    a persisted reference — the comparison never touches raw text."""
    spark = hist_a.sparkSession
    buckets = spark.range(n_buckets).select(F.col("id").cast("long").alias("bucket"))
    h = (
        buckets.join(
            F.broadcast(hist_a.withColumnRenamed("cnt", "c_a")), "bucket", "left"
        )
        .join(F.broadcast(hist_b.withColumnRenamed("cnt", "c_b")), "bucket", "left")
        .select(
            "bucket",
            F.coalesce("c_a", F.lit(0)).alias("c_a"),
            F.coalesce("c_b", F.lit(0)).alias("c_b"),
        )
    )
    totals = h.agg(
        F.sum("c_a").alias("t_a"), F.sum("c_b").alias("t_b")
    )
    p = (F.col("c_a") + 1) / (F.col("t_a") + n_buckets)
    q = (F.col("c_b") + 1) / (F.col("t_b") + n_buckets)
    return (
        h.crossJoin(F.broadcast(totals))
        .select(
            "bucket",
            "c_a",
            "c_b",
            F.round(p * F.log2(p / q) * 1000000.0).cast("long").alias("kl_ab_micro"),
            F.round(q * F.log2(q / p) * 1000000.0).cast("long").alias("kl_ba_micro"),
            F.round(F.abs(p - q) * 1000000.0).cast("long").alias("tv_micro"),
        )
        .orderBy("bucket")
    )


def oov_rate(documents: DataFrame, vocab_size: int = 20) -> DataFrame:
    """Out-of-vocabulary rate per document against the corpus's own
    top-``vocab_size`` tokens — the vocabulary-coverage quality signal
    (high OOV = noise, markup, or wrong-language text). The default
    vocab_size is sized to the synthetic corpus's ~31-token vocabulary
    so rates are non-trivial; production would use 10^5-10^6.

    Scale shape: one explode pass feeds the corpus term counts; the
    vocabulary (top-k with deterministic count/term tie-break) is
    vocab-sized and BROADCASTS back into a second token stream; per-doc
    counts are integers and the rate is one final division, so the
    oracle matches exactly. Two scans of the text column, no fact-sized
    join."""
    documents = ensure_min_parallelism(documents)
    toks = documents.select("doc_id", F.explode(tokens(F.col("text"))).alias("t"))
    vocab = (
        toks.groupBy("t")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "t")
        .limit(vocab_size)
        .select("t", F.lit(1).alias("in_vocab"))
    )
    return (
        toks.join(F.broadcast(vocab), "t", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(
                F.when(F.col("in_vocab").isNull(), F.lit(1)).otherwise(F.lit(0))
            ).alias("n_oov"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "n_oov",
            F.round(F.col("n_oov") / F.col("n_tokens"), 4).alias("oov_rate"),
        )
        .orderBy("doc_id")
    )


def token_budget_select(documents: DataFrame, budget_tokens: int = 25000) -> DataFrame:
    """Select the highest-quality subset of the corpus whose cumulative
    token count fits a training budget — the "give me the best N tokens"
    curation step of an LLM data pipeline.

    A naive global ORDER BY quality + running-sum window serializes the
    whole corpus through one partition. This is the scale-aware rewrite:

    1. quality is discretized to basis points (the score is already
       rounded to 4 decimals, so ``round(q*10000)`` is exact — no
       cross-engine float drift);
    2. per-bucket token sums aggregate map-side into a <=10,001-row
       relation (bounded by the score RESOLUTION, not the corpus), and
       the cumulative-over-buckets window runs on that tiny relation;
    3. whole buckets above the cutoff are selected with a broadcast
       join — no window ever touches their rows;
    4. only the single boundary bucket runs a per-row running sum, and
       that window is partitioned by the bucket key with a doc_id
       tiebreak, so its cost is one bucket's rows, not the corpus.

    Deterministic end-to-end (greedy highest-quality-first, doc_id
    tiebreak, never overshoots the budget) and SQL-expressible — the
    DuckDB oracle replays it exactly.
    """
    documents = ensure_min_parallelism(documents)
    d = documents.select(
        "doc_id",
        "lang",
        token_count(F.col("text")).alias("n_tokens"),
        F.round(_quality_col() * 10000).cast("int").alias("qbp"),
    )
    wb = Window.orderBy(F.desc("qbp")).rowsBetween(Window.unboundedPreceding, -1)
    buckets = (
        d.groupBy("qbp")
        .agg(F.sum("n_tokens").cast("long").alias("btok"))
        .withColumn("cum_before", F.coalesce(F.sum("btok").over(wb), F.lit(0)))
    )
    dd = d.join(F.broadcast(buckets), "qbp")
    full = dd.filter(F.col("cum_before") + F.col("btok") <= budget_tokens)
    wdoc = (
        Window.partitionBy("qbp")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    boundary = (
        dd.filter(
            (F.col("cum_before") <= budget_tokens)
            & (F.col("cum_before") + F.col("btok") > budget_tokens)
        )
        .withColumn("run", F.sum("n_tokens").over(wdoc))
        .filter(F.col("cum_before") + F.col("run") <= budget_tokens)
        .drop("run")
    )
    return (
        full.unionByName(boundary)
        .select(
            "doc_id",
            "lang",
            "n_tokens",
            (F.col("qbp") / 10000.0).alias("quality"),
        )
        .orderBy("doc_id")
    )


def gopher_quality_flags(
    documents: DataFrame,
    min_words: int = 15,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.2,
    max_mean_word_len: float = 10.0,
    min_alpha_ratio: float = 0.8,
    min_stopword_hits: int = 2,
    max_rep_ratio: float = 0.2,
) -> DataFrame:
    """Rule-based document filtering in the style of the Gopher corpus
    rules (Rae et al. 2021, §A1.1): word-count bounds, mean-word-length
    bounds, minimum fraction of words containing an alphabetic
    character, minimum distinct-stopword hits, and a repetition ceiling
    (duplicate-bigram fraction). Each rule is emitted as its own 0/1
    flag so downstream reporting can attribute WHY a document was
    dropped; ``keep`` is the conjunction.

    Every signal is computed inside the row (array ops under
    whole-stage codegen — no explode, no shuffle, no Python), so the
    scan is the whole job and the filter runs at I/O speed at 100 TB.
    Ratios are rounded to 4 digits BEFORE the threshold comparison so
    both engines threshold the same value.
    """
    documents = ensure_min_parallelism(documents)
    toks = tokens(F.col("text"))
    n = F.size(toks)
    mean_wl = F.round(
        F.aggregate(toks, F.lit(0.0), lambda acc, t: acc + F.length(t)) / n, 4
    )
    alpha_ratio = F.round(
        F.size(F.filter(toks, lambda t: t.rlike("[a-zA-Z]"))) / n, 4
    )
    stop_arr = F.array(*[F.lit(w) for w in LANG_PROFILES["en"]])
    stop_hits = F.size(F.array_intersect(F.array_distinct(toks), stop_arr))
    n_bi = F.greatest(n - 1, F.lit(1))
    bigrams = F.transform(
        F.sequence(F.lit(1), n_bi), lambda i: F.concat_ws(" ", F.slice(toks, i, 2))
    )
    rep = F.round(F.lit(1.0) - F.size(F.array_distinct(bigrams)) / F.size(bigrams), 4)
    flags = {
        "flag_word_count": (n >= min_words) & (n <= max_words),
        "flag_mean_word_len": (mean_wl >= min_mean_word_len)
        & (mean_wl <= max_mean_word_len),
        "flag_alpha_ratio": alpha_ratio >= min_alpha_ratio,
        "flag_stopwords": stop_hits >= min_stopword_hits,
        "flag_repetition": rep <= max_rep_ratio,
    }
    keep = None
    for c in flags.values():
        keep = c if keep is None else (keep & c)
    return documents.select(
        "doc_id",
        n.cast("long").alias("n_words"),
        mean_wl.alias("mean_word_len"),
        alpha_ratio.alias("alpha_ratio"),
        stop_hits.cast("long").alias("stop_hits"),
        rep.alias("rep_ratio"),
        *[c.cast("int").alias(name) for name, c in flags.items()],
        keep.cast("int").alias("keep"),
    )


def dsir_importance(
    documents: DataFrame, target_lang: str = "en", n_buckets: int = 256
) -> DataFrame:
    """DSIR-style importance scoring (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): score every
    document by the log-likelihood ratio of a hashed-unigram model of a
    TARGET domain (here: the ``target_lang`` slice) against the raw
    corpus. High scores = documents that look like the target domain;
    resampling by this weight shifts the corpus mixture toward it.

    Per bucket ``b`` (token -> ``pmod(xxhash64(token), n_buckets)``):
    ``lw(b) = log2((t_b+1)/(T+B)) - log2((r_b+1)/(R+B))`` with integer
    counts ``t_b``/``r_b`` (target/raw tokens in bucket) and totals
    ``T``/``R`` — add-one smoothing on both sides. A document's score
    is the MEAN of its tokens' ``lw`` values, each quantized to integer
    micro-bits before the sum (same order-free cross-engine recipe as
    bigram_lm_score).

    Scale shape: the bucket-count relations are ``n_buckets`` rows —
    constant-size whatever the corpus — so both model joins broadcast;
    the token explode feeds one partial aggregation, and the only
    corpus-scale shuffle is the final per-doc sum. This is why DSIR
    hashes features instead of keeping a vocabulary: the model state is
    O(buckets), not O(|V|).
    """
    documents = ensure_min_parallelism(documents)
    tok = documents.select(
        "doc_id",
        "lang",
        F.explode(tokens(F.col("text"))).alias("tok"),
    ).withColumn("bucket", F.pmod(F.xxhash64("tok"), F.lit(n_buckets)))
    raw = tok.groupBy("bucket").agg(F.count(F.lit(1)).alias("r_b"))
    tgt = (
        tok.filter(F.col("lang") == target_lang)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("t_b"))
    )
    totals = tok.agg(
        F.count(F.lit(1)).alias("r_total"),
        F.sum((F.col("lang") == target_lang).cast("long")).alias("t_total"),
    )
    lw = F.log2((F.coalesce(F.col("t_b"), F.lit(0)) + 1) / (F.col("t_total") + n_buckets)) - F.log2(
        (F.col("r_b") + 1) / (F.col("r_total") + n_buckets)
    )
    return (
        tok.join(F.broadcast(raw), "bucket")
        .join(F.broadcast(tgt), "bucket", "left")
        .crossJoin(F.broadcast(totals))
        .withColumn("lw_micro", F.round(lw * 1000000.0).cast("long"))
        .groupBy("doc_id")
        .agg(
            F.first("lang").alias("lang"),
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.sum("lw_micro") / F.count(F.lit(1)) / 1000000.0, 4).alias(
                "llr_per_token"
            ),
        )
        .orderBy("doc_id")
    )


def bigram_lm_score(documents: DataFrame) -> DataFrame:
    """Statistical-LM quality scoring: train an add-one-smoothed bigram
    model on the corpus itself and score every document's mean
    surprisal, ``bits_per_token`` — the classic perplexity-proxy filter
    (improbable token sequences = boilerplate, garbled text, spam) a
    training pipeline runs next to heuristic quality scores.

    P(w_i | w_{i-1}) = (c(w_{i-1} w_i) + 1) / (c(w_{i-1}) + V).

    Cross-engine exactness: every count is an integer, the per-token
    surprisal is quantized to integer MICRO-bits before the per-doc
    aggregation, so the sum is order-free (FP addition is not
    associative; summing raw doubles in partition order would drift
    between engines) and any ANSI engine reproduces the score to the
    last digit.

    Scale shape: the n-gram count relations are vocabulary-bounded, not
    corpus-bounded — c1 is |V| rows, c2 is |observed bigrams| rows —
    and join back onto the token stream by key (AQE broadcasts them
    while they fit, shuffle-joins beyond that); the only full-corpus
    shuffles are the doc-keyed lag window and the final per-doc
    aggregate. Documents with fewer than two tokens have no bigrams and
    are not scored.
    """
    documents = ensure_min_parallelism(documents)
    tok = documents.select(
        "doc_id", F.posexplode(tokens(F.col("text"))).alias("pos", "tok")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    big = (
        tok.withColumn("prev", F.lag("tok").over(w))
        .filter(F.col("prev").isNotNull())
        .select("doc_id", "prev", "tok")
    )
    c1 = (
        tok.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c1"))
        .withColumnRenamed("tok", "prev")
    )
    c2 = big.groupBy("prev", "tok").agg(F.count(F.lit(1)).alias("c2"))
    vrow = tok.agg(F.countDistinct("tok").alias("v"))
    lp = -F.log2((F.col("c2") + 1) / (F.col("c1") + F.col("v")))
    return (
        big.join(c2, ["prev", "tok"])
        .join(F.broadcast(c1), "prev")
        .crossJoin(F.broadcast(vrow))
        .withColumn("lp_micro", F.round(lp * 1000000.0).cast("long"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(
                F.sum("lp_micro") / F.count(F.lit(1)) / 1000000.0, 4
            ).alias("bits_per_token"),
        )
        .orderBy("doc_id")
    )


def mask_tokens(documents: DataFrame, rate_pct: int = 15) -> DataFrame:
    """Deterministic MLM-style token masking — the corpus-prep step for
    masked-language-model training: token position ``i`` of document
    ``d`` is replaced by ``[MASK]`` iff
    ``pmod(xxhash64(d, i, 'mask'), 100) < rate_pct``. Keying the
    decision on (doc, position) instead of ``rand()`` makes the masked
    corpus layout-independent and rerun-identical (the epoch-shuffle
    rule applied to masking) and lets the DuckDB oracle replay every
    mask decision through the XXH64 chain.

    Returns (doc_id, masked_text, n_masked, n_tokens). Pure per-row
    expression work over the token array — scan speed, no shuffle, no
    Python.
    """
    toks = F.split(F.trim(F.col("text")), r"\s+")
    pos_long = lambda i: i.cast("long")  # Spark hashes int and long differently
    is_masked = lambda t, i: (
        F.pmod(
            F.xxhash64(F.col("doc_id"), pos_long(i), F.lit("mask")), F.lit(100)
        )
        < rate_pct
    )
    masked = F.transform(
        toks, lambda t, i: F.when(is_masked(t, i), F.lit("[MASK]")).otherwise(t)
    )
    flags = F.transform(toks, lambda t, i: is_masked(t, i).cast("long"))
    return documents.select(
        "doc_id",
        F.array_join(masked, " ").alias("masked_text"),
        F.aggregate(flags, F.lit(0).cast("long"), lambda a, v: a + v).alias(
            "n_masked"
        ),
        F.size(toks).cast("long").alias("n_tokens"),
    )


def dataset_card(documents: DataFrame) -> DataFrame:
    """The per-(lang, source) dataset documentation table — the numbers
    a dataset card reports for every corpus slice: document count,
    whitespace-token total, mean composite quality, and how many
    documents the Gopher rule gate keeps.

    Exactness rule: the mean sums the (already 4-decimal-rounded)
    quality in integer basis points and rounds half-up with INTEGER
    arithmetic (``(2*sum + n) div (2*n)``) — a float ROUND here would
    diverge cross-engine on exact .5 boundaries (Spark rounds half-up,
    DuckDB half-even), and summation order can never move the mean.

    Scale: one scan computing all per-doc signals in-row, one
    partial-agg groupBy on the tiny (lang, source) key. The whole card
    is one shuffle of |slices| rows.
    """
    documents = ensure_min_parallelism(documents)
    flags = gopher_quality_flags(documents).select("doc_id", "keep")
    base = documents.select(
        "doc_id",
        "lang",
        "source",
        token_count(F.col("text")).cast("long").alias("nt"),
        _quality_col().alias("q"),
    )
    return (
        base.join(flags, "doc_id")
        .groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("nt").alias("n_tokens"),
            F.sum(F.round(F.col("q") * 10000).cast("long")).alias("__qbp"),
            F.sum("keep").cast("long").alias("n_gopher_kept"),
        )
        .select(
            "lang",
            "source",
            "n_docs",
            "n_tokens",
            (F.expr("(2 * __qbp + n_docs) div (2 * n_docs)") / F.lit(10000.0))
            .alias("mean_quality"),
            "n_gopher_kept",
        )
        .orderBy("lang", "source")
    )
