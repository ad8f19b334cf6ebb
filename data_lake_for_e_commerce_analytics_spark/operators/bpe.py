"""Distributed byte-pair-encoding tokenizer learning (Sennrich, Haddow
& Birch 2016, "Neural Machine Translation of Rare Words with Subword
Units") over the ``documents`` corpus — the vocabulary-training step of
an LLM data pipeline, expressed Spark-first.

Scale shape: every pass runs over the DISTINCT-WORD relation weighted by
corpus frequency, not over raw tokens — |vocab| rows (heavy-tailed
Zipf: bounded in practice) instead of |corpus tokens|. Three learning
strategies, pinned merge-for-merge identical (tests/test_bpe.py and the
``bpe_learn_consistency`` driver gate):

- ``local`` (default when the vocabulary fits the driver): ONE
  distributed reduction to (word, freq), then exact in-memory Sennrich
  with incremental pair maintenance — 1 Spark job for any merge count
  (measured: 513x fewer jobs than sequential at 256 merges,
  SCALING.md).
- ``batched``: fully distributed; each round applies the longest
  provably-commuting prefix of the top candidates (zero interaction
  trigrams + creation-dominance guard), O(rounds) jobs.
- ``sequential``: the 2-jobs-per-merge baseline the others are pinned
  against.

Merging applies greedy left-to-right over each word's symbol array
(the reference semantics) through an Arrow batch kernel
(`_apply_merges_rows`; r14 — the JVM ``aggregate`` fold twin
`_merge_symbols` is kept for the parity tests). Iterative plans
localCheckpoint on a bounded cadence so lineage depth stays O(1).
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


def _apply_merges_rows(
    vocab: DataFrame, merge_pairs: list[tuple[str, str]], key_col: str,
    key_type: str = "long",
) -> DataFrame:
    """Greedy left-to-right application of ``merge_pairs`` (in order,
    one full pass per pair) to the ``(key_col, symbols)`` vocabulary
    relation — the exact `_merge_symbols` fold semantics as an Arrow
    batch kernel (r14 opt, guide §4.2: the Catalyst aggregate fold
    rebuilt an array per element, interpreted, and dominated the
    learner loops). String compare/concat are code-point-exact in both
    runtimes, so the tables are identical — pinned by test_bpe's
    cross-strategy and property tests."""
    import pandas as pd

    pairs = [(str(a), str(b), str(a) + str(b)) for a, b in merge_pairs]

    def apply(batches):
        for pdf in batches:
            out = []
            for syms in pdf["symbols"]:
                cur = list(syms)
                for a, b, ab in pairs:
                    acc: list[str] = []
                    for s in cur:
                        if acc and s == b and acc[-1] == a:
                            acc[-1] = ab
                        else:
                            acc.append(s)
                    cur = acc
                out.append(cur)
            yield pd.DataFrame({key_col: pdf[key_col], "symbols": out})

    return vocab.select(key_col, "symbols").mapInPandas(
        apply, schema=f"{key_col} {key_type}, symbols array<string>"
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
    documents: DataFrame,
    num_merges: int = 8,
    min_count: int = 2,
    strategy: str = "auto",
    max_local_vocab: int = 2_000_000,
    stats: dict | None = None,
) -> list[tuple[str, str, int]]:
    """Learn ``num_merges`` BPE merges from the corpus. Returns the
    ordered merge table [(left, right, count), ...]. All strategies
    produce the IDENTICAL table (pinned in tests/test_bpe.py):

    - ``'local'``: one distributed pass reduces the corpus to the
      distinct-word frequency relation (vocab-sized, NOT corpus-sized —
      the one reduction that makes driver-finishing sound), then the
      classic in-memory Sennrich'16 loop with incremental pair-count
      maintenance finishes locally. A 32k-merge production vocab is TWO
      Spark jobs, not 64k — the trick real BPE trainers use.
    - ``'batched'``: stays fully distributed; each round selects a
      provably-commuting PREFIX of the top pair candidates and applies
      them together (`learn_bpe_batched`), so job count tracks rounds,
      not merges. For vocabularies too large to collect.
    - ``'sequential'``: the one-job-per-merge loop (kept as the
      semantics baseline the other two are pinned against).
    - ``'auto'``: 'local' when the distinct-word count fits
      ``max_local_vocab``, else 'batched'.

    ``stats``, when given, is filled with {'strategy', 'spark_jobs'}
    (collect-or-materialize actions — the scheduler-latency currency a
    32k-merge vocab pays at production scale).
    """
    if strategy == "auto":
        # ONE job decides and (when local wins) already holds the data:
        # limit(max+1) collects at most max+1 rows; <= max means the
        # whole vocabulary is in hand and the local path runs on it
        # directly — no second corpus-side aggregation
        rows = word_freqs(documents).limit(max_local_vocab + 1).collect()
        if len(rows) <= max_local_vocab:
            merges = sennrich_merges(
                [(w, int(f)) for w, f in rows], num_merges, min_count
            )
            if stats is not None:
                stats.update(strategy="local", spark_jobs=1)
            return merges
        strategy = "batched"
    if strategy == "local":
        return _learn_bpe_local(documents, num_merges, min_count, stats)
    if strategy == "batched":
        return learn_bpe_batched(
            documents, num_merges, min_count=min_count, stats=stats
        )
    if strategy != "sequential":
        raise ValueError(f"unknown strategy: {strategy}")

    # localCheckpoint (not cache): caching reuses the materialized rows
    # but the LOGICAL plan still deepens by one nested fold per merge —
    # by a few dozen merges analysis itself OOMs. Checkpointing every
    # CKPT_EVERY rounds truncates lineage, so plan depth stays O(1)
    # forever while the baseline keeps exactly one collect per merge.
    # CKPT_EVERY = 4 (r15, VERDICT r14 "what's wrong" #3: the shipped
    # value 1 reproduced the old per-merge checkpoint and made the
    # cadence machinery dead code): each pair-counts collect re-runs at
    # most 3 pending merge kernels over the vocab-sized relation —
    # cheaper than a materialization job each (measured A/B in
    # OPTIMIZATION_r15.md), while plan depth stays bounded at 4 folds.
    CKPT_EVERY = 4
    words = word_freqs(documents).select(
        "freq", _initial_symbols(F.col("word")).alias("symbols")
    ).localCheckpoint(eager=True)
    merges: list[tuple[str, str, int]] = []
    jobs = 1
    pending = 0
    for _ in range(num_merges):
        best = (
            _pair_counts(words)
            .orderBy(F.desc("cnt"), "pair")
            .limit(1)
            .collect()
        )
        jobs += 1
        if not best or best[0]["cnt"] < min_count:
            break
        a, b = best[0]["pair"].split(" ", 1)
        merges.append((a, b, int(best[0]["cnt"])))
        words = _apply_merges_rows(words, [(a, b)], "freq")
        pending += 1
        if pending >= CKPT_EVERY:
            words = words.localCheckpoint(eager=True)
            jobs += 1
            pending = 0
    if stats is not None:
        stats.update(strategy="sequential", spark_jobs=jobs)
    return merges


def _learn_bpe_local(
    documents: DataFrame,
    num_merges: int,
    min_count: int,
    stats: dict | None = None,
) -> list[tuple[str, str, int]]:
    """Driver-local finish: collect the (word, freq) vocabulary relation
    — bounded by DISTINCT words, which word_freqs' groupBy already
    reduced corpus-side — and run the exact Sennrich'16 greedy loop with
    incremental pair-count maintenance (a lazy max-heap over pair
    counts; per merge, only the words containing the merged pair are
    re-counted). Identical counting (every adjacent position, repeats
    included), identical tie-break (max count, then pair text
    ascending), identical greedy left-to-right application as the
    distributed strategies.
    """
    rows = word_freqs(documents).collect()
    merges = sennrich_merges(
        [(w, int(f)) for w, f in rows], num_merges, min_count
    )
    if stats is not None:
        stats.update(strategy="local", spark_jobs=1)
    return merges


def sennrich_merges(
    word_freq_rows: list[tuple[str, int]], num_merges: int, min_count: int
) -> list[tuple[str, str, int]]:
    """The pure in-memory greedy loop (no Spark): lazy max-heap over
    pair counts, per merge only the words containing the merged pair
    are re-counted (delta update). Property-tested against a naive
    recount-everything reference in tests/test_bpe.py."""
    import heapq

    vocab: list[list] = [
        [list(w) + [END_OF_WORD], int(f)] for w, f in word_freq_rows
    ]

    counts: dict[tuple[str, str], int] = {}
    where: dict[tuple[str, str], set[int]] = {}
    for idx, (syms, freq) in enumerate(vocab):
        for i in range(len(syms) - 1):
            p = (syms[i], syms[i + 1])
            counts[p] = counts.get(p, 0) + freq
            where.setdefault(p, set()).add(idx)

    heap: list[tuple[int, str, tuple[str, str]]] = [
        (-c, f"{p[0]} {p[1]}", p) for p, c in counts.items()
    ]
    heapq.heapify(heap)

    def push(p: tuple[str, str]) -> None:
        c = counts.get(p)
        if c:
            heapq.heappush(heap, (-c, f"{p[0]} {p[1]}", p))

    merges: list[tuple[str, str, int]] = []
    while len(merges) < num_merges and heap:
        negc, _text, best = heap[0]
        cur = counts.get(best, 0)
        if cur != -negc:  # stale lazy-heap entry
            heapq.heappop(heap)
            if cur > 0:
                push(best)
            continue
        if cur < min_count:
            break
        heapq.heappop(heap)
        a, b = best
        merges.append((a, b, cur))
        touched: set[tuple[str, str]] = set()
        for idx in sorted(where.get(best, ())):
            syms, freq = vocab[idx]
            if best not in zip(syms, syms[1:]):
                continue
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                left = counts[p] - freq
                if left:
                    counts[p] = left
                else:
                    del counts[p]
                    where[p].discard(idx)
                touched.add(p)
            merged: list[str] = []
            for s in syms:
                if merged and merged[-1] == a and s == b:
                    merged[-1] = a + b
                else:
                    merged.append(s)
            vocab[idx][0] = merged
            for i in range(len(merged) - 1):
                p = (merged[i], merged[i + 1])
                counts[p] = counts.get(p, 0) + freq
                where.setdefault(p, set()).add(idx)
                touched.add(p)
        where.pop(best, None)
        for p in touched:
            push(p)
    return merges


def _batch_guard_stats(
    words: DataFrame, cand_pairs: list[str]
) -> tuple[dict[str, int], dict[str, dict[str, dict[str, int]]]]:
    """The per-round relations the batch-selection proof needs, for all
    candidates in two driver-bounded aggregations:

    - ``bounds['a b']``: an upper bound on the count any single pair
      could reach because of (a,b)'s merge — the heaviest adjacent
      trigram (merging (a,b)->ab turns trigram (x,a,b) into pair (x,ab)
      and (a,b,y) into (ab,y); greedy-overlap corrections only LOWER
      the true gain, so the bound is sound) PLUS the largest
      PRE-EXISTING count of a pair already touching the symbol 'ab'
      (if 'ab' is already in the vocabulary, a created pair starts from
      its pre-merge count and gains on top — without this term a
      sub-threshold existing pair could be pushed past a later batch
      member and the sequential argmax would diverge).
    - ``inter['a b']['L'][x]`` / ``['R'][y]``: exact trigram counts
      t(x,a,b) / t(a,b,y) restricted to x,y drawn from CANDIDATE
      symbols — the only counts needed to prove two shared-symbol
      candidates still commute (zero interaction trigram)."""
    m = F.greatest(F.size("symbols") - 2, F.lit(0))
    t1 = F.slice("symbols", 1, m)
    t2 = F.slice("symbols", 2, m)
    t3 = F.slice("symbols", 3, m)
    tri = words.select(
        "freq",
        F.explode(
            F.zip_with(
                F.zip_with(t1, t2, lambda a, b: F.concat_ws(" ", a, b)),
                t3,
                lambda ab, c: F.struct(
                    ab.alias("p12"),
                    F.concat_ws(
                        " ", F.element_at(F.split(ab, " ", 2), 2), c
                    ).alias("p23"),
                    F.element_at(F.split(ab, " ", 2), 1).alias("x"),
                    c.alias("y"),
                ),
            )
        ).alias("t"),
    ).select("freq", "t.*")
    sides = tri.select(
        F.col("p12").alias("cand"),
        F.lit("R").alias("side"),
        F.col("y").alias("other"),
        "freq",
    ).filter(F.col("cand").isin(cand_pairs)).unionByName(
        tri.select(
            F.col("p23").alias("cand"),
            F.lit("L").alias("side"),
            F.col("x").alias("other"),
            "freq",
        ).filter(F.col("cand").isin(cand_pairs))
    )
    per_other = sides.groupBy("cand", "side", "other").agg(
        F.sum("freq").alias("c")
    )
    cand_syms = sorted({s for p in cand_pairs for s in p.split(" ", 1)})
    gain = per_other.groupBy("cand").agg(F.max("c").alias("c")).select(
        "cand", F.lit("G").alias("side"), F.lit("").alias("other"), "c"
    )
    inter_df = per_other.filter(F.col("other").isin(cand_syms))
    # Pre-existing pairs that already touch a candidate's merged string.
    merged_of = {p: "".join(p.split(" ", 1)) for p in cand_pairs}
    merged_strs = list(merged_of.values())
    pc = _pair_counts(words).select(
        F.split("pair", " ", 2).alias("lr"), "cnt"
    )
    touch = (
        pc.select(F.explode("lr").alias("sym"), "cnt")
        .filter(F.col("sym").isin(merged_strs))
        .groupBy("sym")
        .agg(F.max("cnt").alias("c"))
        .select(
            F.col("sym").alias("cand"),
            F.lit("P").alias("side"),
            F.lit("").alias("other"),
            "c",
        )
    )
    # one action for all three driver-bounded relations
    rows = gain.unionByName(inter_df).unionByName(touch).collect()
    gains: dict[str, int] = {}
    pre: dict[str, int] = {}
    inter: dict[str, dict[str, dict[str, int]]] = {}
    for r in rows:
        if r["side"] == "G":
            gains[r["cand"]] = int(r["c"])
        elif r["side"] == "P":
            pre[r["cand"]] = int(r["c"])
        else:
            inter.setdefault(r["cand"], {"L": {}, "R": {}})[r["side"]][
                r["other"]
            ] = int(r["c"])
    out_bounds = {
        p: gains.get(p, 0) + pre.get(merged_of[p], 0) for p in cand_pairs
    }
    return out_bounds, inter


def learn_bpe_batched(
    documents: DataFrame,
    num_merges: int = 8,
    min_count: int = 2,
    batch_candidates: int = 48,
    stats: dict | None = None,
) -> list[tuple[str, str, int]]:
    """Distributed BPE with PROVABLY-commuting merge batches: identical
    merge table to the sequential loop, O(rounds) Spark jobs instead of
    O(merges).

    Per round, the top ``batch_candidates`` pairs are collected and a
    batch is cut as the longest PREFIX of that ranking such that every
    member (a_j, b_j)

    1. names no earlier member's MERGED string as one of its symbols
       (a pair over a symbol that earlier batch merges are still
       creating would count the new occurrences);
    2. has provably-unchanged count under every earlier member
       (a_i, b_i)'s application. An occurrence of (a_j, b_j) is
       destroyed only when one of its symbols is absorbed into an
       (a_i, b_i) merge, which needs trigram (a_j, a_i, b_i) [when
       b_j = a_i] or (a_i, b_i, b_j) [when a_j = b_i]; both trigram
       counts must be ZERO (exact counts from `_batch_guard_stats` —
       merely sharing a symbol is fine when the interaction trigram
       never occurs, which is what lets batches grow past the naive
       disjoint-symbol rule);
    3. strictly out-counts every pair an earlier member's merge could
       CREATE or inflate (trigram gain + pre-existing-touch bound from
       `_batch_guard_stats`) — so no freshly-created pair could have
       out-ranked it mid-batch.

    Under 1-3 the sequential argmax provably selects exactly this
    prefix, in this order, with these counts — so batching changes job
    count, never the result (pinned batched == sequential in
    tests/test_bpe.py). The batch applies as chained greedy folds in
    ONE materialization; per-round cost is 3 bounded-output jobs
    regardless of batch size. Stopping at the first violation (not
    skipping past it) is what keeps the proof: a skipped candidate's
    count could have survived and out-ranked later picks.
    """
    words = word_freqs(documents).select(
        "freq", _initial_symbols(F.col("word")).alias("symbols")
    ).localCheckpoint(eager=True)  # same lineage-truncation note as above
    merges: list[tuple[str, str, int]] = []
    jobs = 1
    rounds = 0
    while len(merges) < num_merges:
        top = (
            _pair_counts(words)
            .orderBy(F.desc("cnt"), "pair")
            .limit(batch_candidates)
            .collect()
        )
        jobs += 1
        rounds += 1
        cand = [
            (r["pair"], int(r["cnt"]))
            for r in top
            if r["cnt"] >= min_count
        ]
        if not cand:
            break

        window = cand[: num_merges - len(merges)]
        prefix: list[tuple[str, str, int]] = []
        if len(window) > 1:
            bounds, inter = _batch_guard_stats(words, [p for p, _ in window])
            jobs += 1  # gain + interaction + touch, one unioned action
            used_merged: set[str] = set()
            created_max = 0
            for pair, cnt in window:
                a, b = pair.split(" ", 1)
                # rule 1: never touch a symbol the batch is creating
                if a in used_merged or b in used_merged:
                    break
                # rule 2: zero interaction trigrams vs every kept merge
                ok = True
                for ai, bi, _c in prefix:
                    ip = inter.get(f"{ai} {bi}", {"L": {}, "R": {}})
                    if b == ai and ip["L"].get(a, 0):
                        ok = False
                        break
                    if a == bi and ip["R"].get(b, 0):
                        ok = False
                        break
                if not ok:
                    break
                # rule 3: creation guard
                if prefix and cnt <= created_max:
                    break
                prefix.append((a, b, cnt))
                used_merged.add(a + b)
                created_max = max(created_max, bounds.get(pair, 0))
        if not prefix:
            a, b = window[0][0].split(" ", 1)
            prefix = [(a, b, window[0][1])]

        merges.extend(prefix)
        words = _apply_merges_rows(
            words, [(a, b) for a, b, _ in prefix], "freq"
        ).localCheckpoint(eager=True)
        jobs += 1
    if stats is not None:
        stats.update(strategy="batched", spark_jobs=jobs, rounds=rounds)
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
    # Chained fold per merge; truncate lineage every chunk — a
    # production 32k-merge table would otherwise deepen the logical
    # plan past what analysis survives (same failure class the learner
    # loops hit). The checkpoint relation is vocab-sized, not
    # corpus-sized, so the per-chunk materialization is cheap.
    vocab = _apply_merges_rows(
        vocab, [(a, b) for a, b, _ in merges], "word", key_type="string"
    )
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
