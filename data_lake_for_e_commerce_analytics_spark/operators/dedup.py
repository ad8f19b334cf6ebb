"""Deduplication operators for the training-data pipeline extension:
exact, fingerprint-based, MinHash+LSH, SimHash, n-gram Jaccard, and
embedding-cosine near-duplicate detection over the ``documents`` /
``embeddings`` tables.

Design for 100 TB:
- Exact/fingerprint dedup shuffles 16-byte digests, never full texts.
- Near-dup detection NEVER does an all-pairs cross join. Every variant
  generates candidate pairs through a bucketed equi-join (LSH bands,
  SimHash prefix blocks, or attribute blocking) so the shuffle is
  |docs| x O(bands), and only candidates pay the exact-similarity check.
- All hashing uses xxhash64/md5 (JVM expressions) — deterministic across
  runs and cluster sizes, no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vector import cosine_similarity


def _norm_text() -> F.Column:
    return F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")


def exact_dedup_groups(documents: DataFrame) -> DataFrame:
    """Exact duplicate groups by normalized text hash: keeper (min doc_id)
    and group size. The hash-groupBy dedup baseline."""
    return (
        documents.select(F.col("doc_id"), F.md5(_norm_text()).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(
            F.min("doc_id").alias("keeper_doc_id"),
            F.count(F.lit(1)).alias("group_size"),
        )
        .orderBy("keeper_doc_id")
    )


def exact_dedup_keep_first(documents: DataFrame) -> DataFrame:
    """Exact dedup keeping the lowest doc_id per fingerprint (row_number
    over the fingerprint partition — deterministic, unlike dropDuplicates
    on a non-key subset)."""
    w = Window.partitionBy("fingerprint").orderBy("doc_id")
    return (
        documents.withColumn("fingerprint", F.md5(_norm_text()))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "text", "lang", "source", "n_chars")
    )


def shingles(col: F.Column | str, n: int = 3) -> F.Column:
    """Word n-gram shingles of the tokenized text (distinct)."""
    toks = F.split(F.trim(col), r"\s+")
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    return F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)))
    )


def minhash_signatures(
    documents: DataFrame, num_hashes: int = 32, shingle_n: int = 3
) -> DataFrame:
    """MinHash signatures: for seed s, sig[s] = min over shingles of
    xxhash64(shingle, s). Pure codegen expressions — one projection, no
    shuffle, no UDF."""
    sh = shingles(F.col("text"), shingle_n).alias("shingles")

    def hash_with_seed(s: int):
        return lambda t: F.xxhash64(t, F.lit(s))

    sig = F.array(
        *[
            F.array_min(F.transform(F.col("shingles"), hash_with_seed(s)))
            for s in range(num_hashes)
        ]
    )
    return documents.select("doc_id", sh).select("doc_id", "shingles", sig.alias("signature"))


def minhash_lsh_pairs(
    documents: DataFrame,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    jaccard_threshold: float = 0.5,
) -> DataFrame:
    """MinHash+LSH near-duplicate pairs.

    Band signatures -> explode (docs x bands rows) -> self-join on
    (band_idx, band_hash) = the LSH bucket join -> exact Jaccard on the
    candidates only. Shuffle volume is |docs| x bands small rows, never
    |docs|^2. Returns (doc_a, doc_b, jaccard) with doc_a < doc_b.
    """
    rows = bands and num_hashes // bands
    sigs = minhash_signatures(documents, num_hashes, shingle_n)
    banded = sigs.select(
        "doc_id",
        "shingles",
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(F.concat_ws(",", *[F.element_at("signature", b * rows + r + 1) for r in range(rows)]))
                    for b in range(bands)
                ]
            )
        ).alias("band_idx", "band_hash"),
    )
    left = banded.select(
        F.col("doc_id").alias("doc_a"),
        F.col("shingles").alias("sh_a"),
        "band_idx",
        "band_hash",
    )
    right = banded.select(
        F.col("doc_id").alias("doc_b"),
        F.col("shingles").alias("sh_b"),
        "band_idx",
        "band_hash",
    )
    candidates = (
        left.join(right, ["band_idx", "band_hash"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "sh_a", "sh_b")
        .dropDuplicates(["doc_a", "doc_b"])
    )
    jaccard = F.size(F.array_intersect("sh_a", "sh_b")) / F.size(F.array_union("sh_a", "sh_b"))
    return (
        candidates.withColumn("jaccard", F.round(jaccard, 4))
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("doc_a", "doc_b", "jaccard")
        .orderBy("doc_a", "doc_b")
    )


def simhash_fingerprints(documents: DataFrame, bits: int = 64) -> DataFrame:
    """SimHash: per token, xxhash64 gives a 64-bit vector; each bit votes
    +1/-1; fingerprint bit = sign of the vote sum. Computed as an array of
    per-bit sums folded into a bigint — all codegen, no UDF."""
    toks = F.array_distinct(F.split(F.trim(F.col("text")), r"\s+"))
    hashes = F.transform(toks, lambda t: F.xxhash64(t))

    # NB: capture the bit index via a closure factory — PySpark's lambda
    # bridge passes a Column for every named parameter, including defaults.
    def vote_for_bit(b: int):
        mask = F.lit(1 << b) if b < 63 else F.lit(-(1 << 63))
        return lambda acc, h: acc + F.when(h.bitwiseAND(mask) != 0, 1).otherwise(-1)

    bit_votes = F.array(
        *[F.aggregate(hashes, F.lit(0), vote_for_bit(b)) for b in range(bits)]
    )
    # Projection boundary: votes evaluated once (64 aggregates), then the
    # fingerprint fold reads the materialized array per bit.
    voted = documents.select("doc_id", bit_votes.alias("votes"))
    fp = F.lit(0).cast("long")
    for b in range(bits):
        fp = fp.bitwiseOR(
            F.when(
                F.element_at("votes", b + 1) > 0,
                F.shiftleft(F.lit(1).cast("long"), b),
            ).otherwise(F.lit(0).cast("long"))
        )
    return voted.select("doc_id", fp.alias("simhash"))


def simhash_near_dup_pairs(
    documents: DataFrame, max_hamming: int = 8, prefix_bits: int = 16
) -> DataFrame:
    """SimHash near-dup pairs blocked on the fingerprint's high
    ``prefix_bits`` (near-dups agree on most bits, so most share the
    prefix block): equi-join on the block, then exact Hamming filter.
    Trades a sliver of recall for avoiding the cross join; the
    multi-probe variant (rotate prefixes) is the recall-restoring path.
    """
    fps = simhash_fingerprints(documents)
    block = F.shiftrightunsigned(F.col("simhash"), 64 - prefix_bits)
    blocked = fps.withColumn("block", block)
    a = blocked.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("fp_a"), "block")
    b = blocked.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("fp_b"), "block")
    hamming = F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b")))
    return (
        a.join(b, "block")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
        .orderBy("doc_a", "doc_b")
    )


def ngram_jaccard_pairs(
    documents: DataFrame, threshold: float = 0.8, shingle_n: int = 2
) -> DataFrame:
    """Exact n-gram Jaccard similarity pairs with attribute blocking
    (same lang, same length bucket): candidates come from an equi-join on
    the block key, so cost is sum of squared block sizes, not |docs|^2.
    SQL-expressible end-to-end (DuckDB oracle covers it)."""
    with_block = documents.select(
        "doc_id",
        "lang",
        F.floor(F.col("n_chars") / 100).alias("len_bucket"),
        F.array_distinct(shingles(F.col("text"), shingle_n)).alias("grams"),
    )
    a = with_block.select(
        F.col("doc_id").alias("doc_a"), "lang", "len_bucket", F.col("grams").alias("grams_a")
    )
    b = with_block.select(
        F.col("doc_id").alias("doc_b"), "lang", "len_bucket", F.col("grams").alias("grams_b")
    )
    jaccard = F.size(F.array_intersect("grams_a", "grams_b")) / F.size(
        F.array_union("grams_a", "grams_b")
    )
    return (
        a.join(b, ["lang", "len_bucket"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .withColumn("jaccard", F.round(jaccard, 4))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "lang", "jaccard")
        .orderBy("doc_a", "doc_b")
    )


def embedding_near_dup_pairs(
    embeddings: DataFrame, threshold: float = 0.95
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs blocked on the label column
    (the pre-clustered blocking key): equi-join per label, exact cosine on
    candidates. For unlabeled corpora the LSH variant in similarity.py
    supplies the blocking key instead."""
    a = embeddings.select(
        F.col("vec_id").alias("vec_a"), F.col("label"), F.col("embedding").alias("emb_a")
    )
    b = embeddings.select(
        F.col("vec_id").alias("vec_b"), F.col("label"), F.col("embedding").alias("emb_b")
    )
    cos = cosine_similarity(F.col("emb_a"), F.col("emb_b"))
    return (
        a.join(b, "label")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .withColumn("cosine", F.round(cos, 4))
        .filter(F.col("cosine") >= threshold)
        .select("vec_a", "vec_b", "label", "cosine")
        .orderBy("vec_a", "vec_b")
    )
