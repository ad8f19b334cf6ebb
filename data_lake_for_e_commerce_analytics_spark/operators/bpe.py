"""Distributed byte-pair-encoding tokenizer learning (Sennrich, Haddow
& Birch 2016, "Neural Machine Translation of Rare Words with Subword
Units") over the ``documents`` corpus — the vocabulary-training step of
an LLM data pipeline, expressed Spark-first.

Scale shape: every pass runs over the DISTINCT-WORD relation weighted by
corpus frequency, not over raw tokens — |vocab| rows (heavy-tailed
Zipf: bounded in practice) instead of |corpus tokens|. Pair counting is
one explode + partial-aggregating groupBy per merge iteration; the
driver materializes exactly ONE row per iteration (the argmax pair), so
iterations never pull data to the driver. Merging is a JVM-side
``aggregate`` fold over each word's symbol array (greedy left-to-right,
the reference semantics) — no Python in any per-row path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sources.tables import ensure_min_parallelism

END_OF_WORD = "</w>"


def word_freqs(documents: DataFrame) -> DataFrame:
    """Corpus word-frequency relation: lowercased whitespace tokens with
    their total corpus counts. The one shuffle that reduces the corpus
    to its vocabulary."""
    documents = ensure_min_parallelism(documents)
    return (
        documents.select(
            F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _initial_symbols(word: F.Column) -> F.Column:
    """A word's initial BPE symbol sequence: its characters plus the
    end-of-word marker (so learned merges can encode word finality)."""
    chars = F.split(word, "")
    # split("ab", "") -> ["a", "b"]; append the marker symbol.
    return F.concat(chars, F.array(F.lit(END_OF_WORD)))


def _pair_counts(words: DataFrame) -> DataFrame:
    """Adjacent-symbol pair counts weighted by word frequency, every
    position counted (repeats included)."""
    m = F.greatest(F.size("symbols") - 1, F.lit(0))
    pairs = F.zip_with(
        F.slice("symbols", 1, m),
        F.slice("symbols", 2, m),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    return (
        words.select("freq", F.explode(pairs).alias("pair"))
        .groupBy("pair")
        .agg(F.sum("freq").alias("cnt"))
    )


def bpe_pair_counts(documents: DataFrame, k: int = 20) -> DataFrame:
    """Top-k first-iteration BPE pair statistics — the relation whose
    argmax is the first learned merge. Gate query: fully deterministic
    (ties broken by pair text), SQL-expressible end-to-end."""
    words = word_freqs(documents).select(
        "freq", _initial_symbols(F.col("word")).alias("symbols")
    )
    return (
        _pair_counts(words)
        .orderBy(F.desc("cnt"), "pair")
        .limit(k)
    )


def _merge_symbols(symbols: F.Column, a: str, b: str) -> F.Column:
    """Greedy left-to-right merge of adjacent (a, b) into a||b — the
    reference BPE merge semantics — as a JVM aggregate fold. The merged
    symbol a||b is strictly longer than a, so a freshly merged tail can
    never re-match as the pair's left element within the same pass."""
    return F.aggregate(
        symbols,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (s == F.lit(b)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(a + b))
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def learn_bpe(
    documents: DataFrame, num_merges: int = 8, min_count: int = 2
) -> list[tuple[str, str, int]]:
    """Learn ``num_merges`` BPE merges from the corpus. Returns the
    ordered merge table [(left, right, count), ...].

    Each iteration: one distributed pair-count aggregation over the
    (cached) vocabulary relation, ONE argmax row collected, then the
    merge applied as a map-side fold. The vocabulary DataFrame is
    re-cached per iteration with lineage truncated by the narrow
    projection, so plan depth stays O(1) per merge.
    """
    words = word_freqs(documents).select(
        "freq", _initial_symbols(F.col("word")).alias("symbols")
    )
    words.cache()
    merges: list[tuple[str, str, int]] = []
    try:
        for _ in range(num_merges):
            best = (
                _pair_counts(words)
                .orderBy(F.desc("cnt"), "pair")
                .limit(1)
                .collect()
            )
            if not best or best[0]["cnt"] < min_count:
                break
            a, b = best[0]["pair"].split(" ", 1)
            merges.append((a, b, int(best[0]["cnt"])))
            nxt = words.select(
                "freq", _merge_symbols(F.col("symbols"), a, b).alias("symbols")
            )
            nxt.cache()
            nxt.count()  # materialize before dropping the parent cache
            words.unpersist()
            words = nxt
    finally:
        words.unpersist()
    return merges


def bpe_encode_stats(
    documents: DataFrame, merges: list[tuple[str, str, int]]
) -> DataFrame:
    """Apply a learned merge table to the corpus and report per-doc
    subword counts (chars+markers before, subword tokens after) — the
    token-budget accounting a curation pipeline runs with the real
    tokenizer. Merges apply in learned order as chained map-side folds
    over the distinct-word relation, then join back to docs by word."""
    documents = ensure_min_parallelism(documents)
    doc_words = documents.select(
        "doc_id",
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("word"),
    ).filter(F.col("word") != "")
    vocab = doc_words.select("word").distinct().select(
        "word", _initial_symbols(F.col("word")).alias("symbols")
    )
    for a, b, _ in merges:
        sym = F.col("symbols")
        vocab = vocab.select("word", _merge_symbols(sym, a, b).alias("symbols"))
    encoded = vocab.select(
        "word",
        F.size("symbols").alias("n_subwords"),
        (F.length("word") + 1).alias("n_units"),
    )
    return (
        doc_words.join(encoded, "word")
        .groupBy("doc_id")
        .agg(
            F.sum("n_units").alias("units_before"),
            F.sum("n_subwords").alias("subwords_after"),
        )
        .orderBy("doc_id")
    )
