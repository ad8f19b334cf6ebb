"""Distributed BPE learner vs a pure-Python reference implementation of
Sennrich'16 (frequency-weighted pair counts over the vocabulary, greedy
left-to-right merges, ties broken by pair text)."""

from collections import Counter

from data_lake_for_e_commerce_analytics_spark.operators import bpe


def _ref_word_freqs(texts):
    c = Counter()
    for t in texts:
        for w in t.strip().lower().split():
            if w:
                c[w] += 1
    return c


def _ref_pair_counts(vocab):
    c = Counter()
    for syms, freq in vocab:
        for i in range(len(syms) - 1):
            c[(syms[i], syms[i + 1])] += freq
    return c


def _ref_merge(syms, a, b):
    out = []
    for s in syms:
        if out and out[-1] == a and s == b:
            out[-1] = a + b
        else:
            out.append(s)
    return out


def _ref_learn_bpe(texts, num_merges, min_count=2):
    vocab = [
        (list(w) + [bpe.END_OF_WORD], f) for w, f in _ref_word_freqs(texts).items()
    ]
    merges = []
    for _ in range(num_merges):
        counts = _ref_pair_counts(vocab)
        if not counts:
            break
        # max count, ties by the space-joined pair text ascending
        best = min(counts.items(), key=lambda kv: (-kv[1], f"{kv[0][0]} {kv[0][1]}"))
        (a, b), cnt = best
        if cnt < min_count:
            break
        merges.append((a, b, cnt))
        vocab = [(_ref_merge(s, a, b), f) for s, f in vocab]
    return merges


def test_learn_bpe_matches_reference(spark, tables):
    docs = tables["documents"].limit(80).cache()
    texts = [r["text"] for r in docs.select("text").collect()]
    got = bpe.learn_bpe(docs, num_merges=6)
    want = _ref_learn_bpe(texts, num_merges=6)
    assert got == want
    docs.unpersist()


def test_learn_bpe_learns_frequent_subwords(spark):
    rows = [(1, "low lower lowest low low"), (2, "new newer newest new")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    merges = bpe.learn_bpe(df, num_merges=5)
    assert merges[0][:2] == ("l", "o")
    assert merges[1][:2] == ("lo", "w")
    learned = {a + b for a, b, _ in merges}
    assert "low" in learned


def test_bpe_encode_compresses_and_conserves(spark):
    rows = [(1, "banana bandana"), (2, "banana banana band")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    merges = bpe.learn_bpe(df, num_merges=4)
    stats = {r["doc_id"]: r for r in bpe.bpe_encode_stats(df, merges).collect()}
    for r in stats.values():
        # merging only ever shrinks the sequence, never below 1/word
        assert 0 < r["subwords_after"] <= r["units_before"]
    assert stats[2]["subwords_after"] < stats[2]["units_before"]


def test_learn_bpe_strategies_agree_on_corpus(spark, tables):
    docs = tables["documents"].limit(120).cache()
    texts = [r["text"] for r in docs.select("text").collect()]
    want = _ref_learn_bpe(texts, num_merges=16)
    st_loc, st_bat = {}, {}
    loc = bpe.learn_bpe(docs, num_merges=16, strategy="local", stats=st_loc)
    bat = bpe.learn_bpe(docs, num_merges=16, strategy="batched", stats=st_bat)
    assert loc == want
    assert bat == want
    # the de-weakening contract: local finishes in O(1) jobs, batched in
    # O(rounds) — both strictly below the 2-jobs-per-merge sequential loop
    assert st_loc["spark_jobs"] <= 2
    assert st_bat["spark_jobs"] < 2 * 16
    docs.unpersist()


def test_learn_bpe_batched_equals_sequential_adversarial(spark):
    """Randomized corpora over a TINY alphabet — dense pair interactions,
    repeated-symbol runs ('aaaa'), ties — the worst case for the batch
    commutation proof. Batched and local must replay the sequential
    (= pure-Python Sennrich) table merge-for-merge."""
    import random

    for seed in (1, 2, 3):
        rnd = random.Random(seed)
        texts = [
            (
                i,
                " ".join(
                    "".join(
                        rnd.choice("aab") for _ in range(rnd.randint(1, 7))
                    )
                    for _ in range(rnd.randint(2, 12))
                ),
            )
            for i in range(40)
        ]
        df = spark.createDataFrame(texts, ["doc_id", "text"])
        want = _ref_learn_bpe([t for _, t in texts], num_merges=10)
        assert bpe.learn_bpe(df, num_merges=10, strategy="batched") == want, seed
        assert bpe.learn_bpe(df, num_merges=10, strategy="local") == want, seed


def test_learn_bpe_batched_batches_disjoint_scripts(spark):
    """A bilingual corpus with non-overlapping alphabets: the
    commutation rules must batch across scripts, cutting job count well
    below sequential — the scale scenario batching exists for."""
    import random

    rnd = random.Random(7)
    lang1 = ["".join(rnd.choice("abcdefgh") for _ in range(rnd.randint(3, 8))) for _ in range(300)]
    lang2 = ["".join(rnd.choice("qrstuvwx") for _ in range(rnd.randint(3, 8))) for _ in range(300)]
    texts = [
        (
            i,
            " ".join(
                rnd.choice(lang1 if i % 2 == 0 else lang2)
                for _ in range(rnd.randint(5, 20))
            ),
        )
        for i in range(400)
    ]
    df = spark.createDataFrame(texts, ["doc_id", "text"])
    st = {}
    got = bpe.learn_bpe(df, num_merges=64, strategy="batched", stats=st)
    assert got == _ref_learn_bpe([t for _, t in texts], num_merges=64)
    assert st["rounds"] < 64 / 2  # genuinely batches (>2 merges/round avg)
    assert st["spark_jobs"] < 2 * 64 / 2


def test_bpe_encode_survives_large_merge_table(spark):
    """A production-sized merge table must not blow up plan analysis:
    the encode path checkpoints every chunk, so 200+ chained folds
    still run (and still match the incremental reference encode)."""
    rows = [(1, "abcdefg abcdef abcde abcd abc ab"), (2, "abcdefg abcdefg ab")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    real = bpe.learn_bpe(df, num_merges=50, min_count=1, strategy="local")
    # pad with never-matching merges: plan depth is what's under test —
    # each entry chains one more fold whether or not it fires
    padded = real + [(f"x{i}", f"y{i}", 1) for i in range(250)]
    stats = {
        r["doc_id"]: r for r in bpe.bpe_encode_stats(df, padded).collect()
    }
    want = {r["doc_id"]: r for r in bpe.bpe_encode_stats(df, real).collect()}
    assert stats == want
    # corpus fully merged by the real merges: 1 subword per word
    for d, t in {1: rows[0][1], 2: rows[1][1]}.items():
        assert stats[d]["subwords_after"] == len(t.split())


def test_sennrich_merges_hypothesis_vs_naive():
    """Spark-free property test of the incremental-maintenance learner:
    random word/frequency tables over a tiny alphabet (dense pair
    collisions, repeated-symbol runs, shared-prefix words) must yield
    the exact merge table the naive recount-everything loop does —
    including counts and tie-breaks."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from data_lake_for_e_commerce_analytics_spark.operators.bpe import (
        END_OF_WORD,
        sennrich_merges,
    )

    def naive(rows, num_merges, min_count):
        vocab = [(list(w) + [END_OF_WORD], f) for w, f in rows]
        merges = []
        for _ in range(num_merges):
            counts = {}
            for syms, f in vocab:
                for i in range(len(syms) - 1):
                    p = (syms[i], syms[i + 1])
                    counts[p] = counts.get(p, 0) + f
            if not counts:
                break
            best = min(counts.items(), key=lambda kv: (-kv[1], f"{kv[0][0]} {kv[0][1]}"))
            (a, b), c = best
            if c < min_count:
                break
            merges.append((a, b, c))
            nxt = []
            for syms, f in vocab:
                out = []
                for s in syms:
                    if out and out[-1] == a and s == b:
                        out[-1] = a + b
                    else:
                        out.append(s)
                nxt.append((out, f))
            vocab = nxt
        return merges

    words = st.text(alphabet="aab c", min_size=1, max_size=8).map(
        lambda s: s.replace(" ", "a")
    )
    tables = st.lists(
        st.tuples(words, st.integers(min_value=1, max_value=9)),
        min_size=1,
        max_size=12,
    ).map(lambda rows: list({w: f for w, f in rows}.items()))

    @settings(max_examples=300, deadline=None)
    @given(tables, st.integers(min_value=1, max_value=12), st.integers(min_value=1, max_value=3))
    def check(rows, k, mc):
        assert sennrich_merges(rows, k, mc) == naive(rows, k, mc)

    check()


def test_apply_merges_rows_matches_expression_fold(spark, tables):
    """The r14 Arrow merge kernel must equal the Catalyst aggregate-fold
    twin (`_merge_symbols`) row-for-row on the real corpus, including
    chained merges."""
    from pyspark.sql import functions as F

    from data_lake_for_e_commerce_analytics_spark.operators import bpe

    words = bpe.word_freqs(tables["documents"]).select(
        "freq", bpe._initial_symbols(F.col("word")).alias("symbols")
    )
    merges = [("e", "</w>"), ("t", "h"), ("th", "e</w>")]
    sym = F.col("symbols")
    for a, b in merges:
        sym = bpe._merge_symbols(sym, a, b)
    want = sorted(
        (r["freq"], list(r["symbols"]))
        for r in words.select("freq", sym.alias("symbols")).collect()
    )
    got = sorted(
        (r["freq"], list(r["symbols"]))
        for r in bpe._apply_merges_rows(words, merges, "freq").collect()
    )
    assert got == want
