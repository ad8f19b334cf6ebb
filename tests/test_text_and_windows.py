"""Text-analysis and window-operator properties."""

from pyspark.sql import functions as F

from data_lake_for_e_commerce_analytics_spark.operators import text, windows
from data_lake_for_e_commerce_analytics_spark.operators.cleaning import clean_events


def test_text_stats_ratios_bounded(tables):
    rows = text.text_stats(tables["documents"]).collect()
    for r in rows:
        assert r["n_tokens"] > 0
        assert 0 <= r["stopword_ratio"] <= 1
        assert 0 < r["distinct_ratio"] <= 1


def test_quality_score_bounded(tables):
    rows = text.quality_score(tables["documents"]).collect()
    assert all(0 <= r["quality"] <= 1 for r in rows)


def test_lang_id_predicts_from_profile(tables):
    rows = text.lang_id(tables["documents"]).collect()
    assert all(r["predicted_lang"] in text.LANG_ORDER for r in rows)


def test_fingerprint_whitespace_invariant(spark):
    df = spark.createDataFrame(
        [(1, "hello  world"), (2, "Hello world "), (3, "entirely different")],
        ["doc_id", "text"],
    )
    fps = {r["doc_id"]: r["fingerprint"] for r in text.fingerprint(df).collect()}
    assert fps[1] == fps[2]
    assert fps[1] != fps[3]


def test_sessionize_monotone_session_seq(tables):
    sess = windows.sessionize(clean_events(tables["events"]))
    bad = (
        sess.groupBy("user_id")
        .agg(F.max("session_seq").alias("mx"), F.countDistinct("session_seq").alias("n"))
        .filter(F.col("mx") != F.col("n"))
        .count()
    )
    assert bad == 0  # session numbers are 1..n dense per user


def test_session_stats_consistent(tables):
    ev = clean_events(tables["events"])
    stats = windows.session_stats(ev).collect()
    total_events = ev.count()
    assert sum(r["n_events"] for r in stats) == total_events
    for r in stats:
        assert r["n_sessions"] <= r["n_events"]


def test_top_n_per_group(tables):
    top = windows.top_n_per_group(
        tables["part"].select("p_brand", "p_partkey", "p_name", "p_retailprice"),
        "p_brand",
        "p_retailprice",
        2,
        "p_partkey",
    )
    counts = top.groupBy("p_brand").count().collect()
    assert all(r["count"] <= 2 for r in counts)


def test_running_spend_monotone_for_positive_values(tables):
    ev = tables["events"].filter(F.col("value") >= 0)
    run = windows.running_user_spend(ev)
    w_bad = (
        run.groupBy("user_id")
        .agg(F.max("running_value").alias("mx"))
        .join(
            run.filter(F.col("event_seq") == 1).select("user_id", F.col("running_value").alias("first")),
            "user_id",
        )
        .filter(F.col("first") > F.col("mx"))
        .count()
    )
    assert w_bad == 0


def test_token_counts_bpe_ish_vs_ws(tables):
    from data_lake_for_e_commerce_analytics_spark.operators import text as t

    rows = t.token_counts(tables["documents"]).collect()
    for r in rows:
        # subword-ish segmentation never yields fewer pieces than words
        assert r["bpe_ish_tokens"] >= r["ws_tokens"] > 0


def test_winnow_shared_run_shares_fingerprint(spark):
    """Winnowing guarantee (Schleimer'03): two docs sharing a token run
    of length >= w + k - 1 (= 8 for k=4, w=5) share >= 1 fingerprint."""
    from data_lake_for_e_commerce_analytics_spark.operators import text as t
    from pyspark.sql import functions as F

    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    df = spark.createDataFrame(
        [(1, f"one two three {shared} four"), (2, f"{shared} nine ten eleven twelve")],
        "doc_id long, text string",
    )
    # recompute the full fingerprint sets (the operator returns the
    # summary; the guarantee is about the underlying sets)
    toks = F.split(F.trim(F.col("text")), r"\s+")
    n_sh = F.greatest(F.size(toks) - 3, F.lit(1))
    sh = F.transform(F.sequence(F.lit(1), n_sh), lambda i: F.md5(F.concat_ws(" ", F.slice(toks, i, 4))))
    win = df.select("doc_id", sh.alias("sh")).select(
        "doc_id",
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.greatest(F.size("sh") - 4, F.lit(1))),
                lambda j: F.array_min(F.slice("sh", j, 5)),
            )
        ).alias("fps"),
    )
    rows = {r["doc_id"]: set(r["fps"]) for r in win.collect()}
    assert rows[1] & rows[2], "8-token shared run must share a fingerprint"


def test_tfidf_top_terms_shape(tables):
    rows = text.tfidf_top_terms_by_lang(tables["documents"], k=5).collect()
    by_lang: dict = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r)
    for lang, lrows in by_lang.items():
        assert [r["rank"] for r in lrows] == list(range(1, len(lrows) + 1))
        scores = [r["tfidf"] for r in lrows]
        assert scores == sorted(scores, reverse=True)
        assert len({r["term"] for r in lrows}) == len(lrows)


def test_decontaminate_bounds(tables):
    docs = tables["documents"]
    rows = text.decontaminate(docs).collect()
    n_eval = docs.filter(F.col("source") == "src0").count()
    assert len(rows) == n_eval
    for r in rows:
        assert 0 <= r["n_shared"] <= r["n_grams"]
        assert 0.0 <= r["contamination"] <= 1.0
        assert r["contaminated"] == (1 if r["contamination"] >= 0.2 else 0)


def test_decontaminate_self_split_fully_contaminated(spark):
    """A doc duplicated across splits must score contamination 1.0."""
    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon", "en", "src0", 30),
            (2, "alpha beta gamma delta epsilon", "en", "src1", 30),
            (3, "totally different words here now", "en", "src1", 32),
        ],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    rows = text.decontaminate(df).collect()
    assert len(rows) == 1 and rows[0]["doc_id"] == 1
    assert rows[0]["contamination"] == 1.0 and rows[0]["contaminated"] == 1


def test_quality_percentile_filter_cut(tables):
    docs = tables["documents"]
    kept = text.quality_percentile_filter(docs, drop_pct=0.1).collect()
    n_in = docs.count()
    # drops at most ~10% overall, never more than drop_pct per lang + 1
    assert len(kept) >= 0.85 * n_in
    for r in kept:
        assert r["pct_rank"] >= 0.1


def test_pack_sequences_invariants(tables):
    rows = text.pack_sequences(tables["documents"], capacity=256).collect()
    assert len(rows) == tables["documents"].count()
    by_lang: dict = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r)
    for lang, lrows in by_lang.items():
        lrows.sort(key=lambda r: r["doc_id"])
        cum = 0
        for r in lrows:
            # bin is the starting-offset bucket of the doc
            assert r["bin_id"] == cum // 256
            cum += r["n_tokens"]
        # bin ids are monotone in doc order
        bins = [r["bin_id"] for r in lrows]
        assert bins == sorted(bins)


def test_flatten_json_sampled_schema(spark):
    from data_lake_for_e_commerce_analytics_spark.functions import json_fns

    df = spark.createDataFrame(
        [
            (1, '{"a": 1, "b": "x"}'),
            (2, '{"a": 2, "c": 3.5}'),
            (3, None),
        ],
        ["id", "payload"],
    )
    flat = json_fns.flatten_json(df, "payload")
    rows = {r["id"]: r for r in flat.collect()}
    # union of sampled keys becomes columns; missing keys are NULL
    assert rows[1]["a"] == 1 and rows[1]["b"] == "x" and rows[1]["c"] is None
    assert rows[2]["a"] == 2 and rows[2]["b"] is None and abs(rows[2]["c"] - 3.5) < 1e-9
    assert rows[3]["a"] is None and rows[3]["b"] is None and rows[3]["c"] is None


def test_flatten_json_on_events_props(tables):
    from data_lake_for_e_commerce_analytics_spark.functions import json_fns

    flat = json_fns.flatten_json(tables["events"].limit(200), "props")
    assert "k" in flat.columns
    vals = [r["k"] for r in flat.select("k").collect()]
    assert any(v is not None for v in vals)


def test_pii_scrub_finds_injected_pii(tables):
    from data_lake_for_e_commerce_analytics_spark.operators import text as text_ops

    rows = text_ops.pii_scrub(tables["documents"]).collect()
    assert rows
    # every doc gets one injected email + one injected phone
    assert all(r["n_emails"] >= 1 for r in rows)
    assert all(r["n_phones"] >= 1 for r in rows)


def test_chunk_documents_partitions_every_char(spark, tables):
    from pyspark.sql import functions as F

    from data_lake_for_e_commerce_analytics_spark.operators import text as text_ops

    chunks = text_ops.chunk_documents(tables["documents"], chunk_chars=200)
    got = {
        r["doc_id"]: r["total"]
        for r in chunks.groupBy("doc_id")
        .agg(F.sum("chunk_len").alias("total"))
        .collect()
    }
    want = {
        r["doc_id"]: r["n"]
        for r in tables["documents"]
        .select("doc_id", F.length("text").alias("n"))
        .collect()
    }
    assert got == want
    # chunk indexes are dense from 0
    idx = chunks.groupBy("doc_id").agg(
        F.min("chunk_idx").alias("lo"), F.max("chunk_idx").alias("hi"), F.count("*").alias("n")
    )
    bad = idx.filter((F.col("lo") != 0) | (F.col("hi") != F.col("n") - 1)).count()
    assert bad == 0


def test_repetition_ratio_bounds(tables):
    from data_lake_for_e_commerce_analytics_spark.operators import text as text_ops

    rows = text_ops.repetition_ratio(tables["documents"]).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["rep_ratio"] <= 1.0
        assert r["n_distinct"] <= r["n_bigrams"]


def test_gmv_trailing_week_range_frame(tables):
    from data_lake_for_e_commerce_analytics_spark.operators import windows as win_ops

    rows = win_ops.gmv_trailing_week(tables["orders"]).collect()
    assert rows
    by_day = {r["d"]: r for r in rows}
    for r in rows:
        # recompute the trailing sum naively over the 7 calendar days
        import datetime

        want = sum(
            by_day[d]["gmv"]
            for i in range(7)
            if (d := r["d"] - datetime.timedelta(days=i)) in by_day
        )
        assert abs(r["trailing_7d_gmv"] - want) < 0.01
        assert 1 <= r["days_present"] <= 7


def test_event_value_ffill_carries_last_value(tables):
    from data_lake_for_e_commerce_analytics_spark.operators import windows as win_ops

    rows = win_ops.event_value_ffill(tables["events"]).collect()
    assert rows
    masked = [r for r in rows if r["masked_value"] is None]
    assert masked, "expected click/view events to be masked"
    filled = [r for r in masked if r["filled_value"] is not None]
    # forward fill must populate at least some masked rows
    assert filled
    for r in rows:
        if r["masked_value"] is not None:
            assert r["filled_value"] == r["masked_value"]


def test_token_budget_select_properties(tables):
    docs = tables["documents"]
    budget = 10000
    sel = text.token_budget_select(docs, budget_tokens=budget)
    rows = sel.collect()
    assert rows, "selection must be non-empty at this budget"
    # never overshoots the budget
    assert sum(r["n_tokens"] for r in rows) <= budget
    # greedy highest-quality-first: every fully-skipped document outside
    # the boundary bucket has quality <= every selected document's
    picked = {r["doc_id"] for r in rows}
    qualities = {r["doc_id"]: r["quality"] for r in rows}
    min_picked_q = min(qualities.values())
    scored = {
        r["doc_id"]: r["quality"]
        for r in text.quality_score(docs).collect()
    }
    for doc_id, q in scored.items():
        if doc_id not in picked:
            assert q <= min_picked_q + 1e-9
    # greedy maximality: the highest-quality unselected doc would
    # overshoot (or ties broke on doc_id within the boundary bucket)
    n_tok = {
        r["doc_id"]: r["n_tokens"]
        for r in docs.select(
            "doc_id", text.token_count(F.col("text")).alias("n_tokens")
        ).collect()
    }
    total = sum(r["n_tokens"] for r in rows)
    boundary_q = min_picked_q
    for doc_id, q in scored.items():
        if doc_id not in picked and abs(q - boundary_q) < 1e-9:
            # same-bucket skipped docs: either they overshoot or a
            # doc_id-earlier selected doc used the remaining budget
            assert total + n_tok[doc_id] > budget or any(
                d < doc_id for d in picked if abs(qualities[d] - q) < 1e-9
            )


def test_bigram_lm_score_ranks_repetition_below_novelty(spark, tables):
    docs = tables["documents"]
    scored = text.bigram_lm_score(docs)
    rows = scored.collect()
    # every >=2-token document is scored, surprisal is positive
    n_scorable = docs.filter(
        text.token_count(F.col("text")) >= 2
    ).count()
    assert len(rows) == n_scorable
    assert all(r["bits_per_token"] > 0 for r in rows)
    # a degenerate repeated-bigram doc must score (much) lower surprisal
    # than a plausible-text doc under the corpus model
    synth = spark.createDataFrame(
        [(900001, "alpha alpha alpha alpha alpha alpha alpha alpha",)],
        ["doc_id", "text"],
    )
    combined = docs.select("doc_id", "text").unionByName(synth)
    got = {
        r["doc_id"]: r["bits_per_token"]
        for r in text.bigram_lm_score(combined).collect()
    }
    corpus_mean = sum(v for k, v in got.items() if k != 900001) / (len(got) - 1)
    assert got[900001] < corpus_mean


def test_gopher_flags_reject_each_rule_and_conjunction(spark):
    rows = [
        (1, "the and of " + " ".join(f"word{i}" for i in range(40)), "en", "s", 0),
        (2, "the of tiny doc", "en", "s", 0),  # < 15 words
        (3, " ".join(["spam ham"] * 30) + " the of", "en", "s", 0),  # repetitive
        (4, " ".join(f"w{i}" for i in range(30)), "en", "s", 0),  # no stopwords
        (5, "the of " + " ".join("ab" for _ in range(40)), "en", "s", 0),  # short words
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source", "n_chars"])
    out = {r["doc_id"]: r for r in text.gopher_quality_flags(df).collect()}
    assert out[1]["keep"] == 1
    assert out[2]["flag_word_count"] == 0 and out[2]["keep"] == 0
    assert out[3]["flag_repetition"] == 0 and out[3]["keep"] == 0
    assert out[4]["flag_stopwords"] == 0 and out[4]["keep"] == 0
    assert out[5]["flag_mean_word_len"] == 0 and out[5]["keep"] == 0
    for r in out.values():  # keep is exactly the conjunction
        conj = (r["flag_word_count"] and r["flag_mean_word_len"]
                and r["flag_alpha_ratio"] and r["flag_stopwords"]
                and r["flag_repetition"])
        assert bool(r["keep"]) == bool(conj)


def test_dsir_scores_target_domain_higher(tables):
    from pyspark.sql import functions as F

    out = text.dsir_importance(tables["documents"], target_lang="en")
    means = {
        r["is_en"]: r["m"]
        for r in out.groupBy((F.col("lang") == "en").alias("is_en"))
        .agg(F.avg("llr_per_token").alias("m"))
        .collect()
    }
    # documents from the target domain must score higher under the
    # target-vs-raw likelihood ratio than the rest of the corpus
    assert means[True] > means[False]


def test_dsir_model_relations_broadcast(tables):
    from data_lake_for_e_commerce_analytics_spark.plans.explain import plan_string

    plan = plan_string(text.dsir_importance(tables["documents"]))
    # both bucket-count model joins must be broadcasts — the models are
    # n_buckets rows; shuffling the token stream on bucket would be the
    # 100 TB mistake
    assert plan.count("BroadcastHashJoin") >= 2
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_logreg_trains_to_separate_synthetic_domains(spark):
    rows = [
        (i,
         ("quality signal text here alpha " if i % 2 == 0
          else "junk noise blob here beta ") * 8,
         "en" if i % 2 == 0 else "de", "s", 0)
        for i in range(60)
    ]
    toy = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source", "n_chars"])
    w, losses = text.train_logreg_hashed(toy, iters=6)
    # batch gradient descent on a separable problem: loss strictly falls
    assert all(b < a for a, b in zip(losses, losses[1:]))
    from pyspark.sql import functions as F

    pred = text.logreg_predict(toy, w).join(toy.select("doc_id", "lang"), "doc_id")
    acc = pred.select(
        F.avg((F.col("predicted") == (F.col("lang") == "en").cast("int"))
              .cast("double")).alias("a")
    ).collect()[0]["a"]
    assert acc == 1.0
    # the driver only ever materializes the model: n_buckets + 1 rows
    assert w.count() == 65


def test_linear_score_model_join_broadcasts(tables):
    from data_lake_for_e_commerce_analytics_spark.plans.explain import plan_string

    plan = plan_string(text.linear_score(tables["documents"]))
    assert "BroadcastHashJoin" in plan


def test_corpus_drift_zero_on_identical_and_detects_shift(spark, tables):
    from pyspark.sql import functions as F

    docs = tables["documents"]
    same = text.corpus_drift(docs, docs)
    # identical corpora: every KL and TV term is exactly zero
    assert same.filter(
        (F.col("kl_ab_micro") != 0) | (F.col("tv_micro") != 0)
    ).count() == 0
    # inject drift: B is A plus a heavy flood of one new token
    flood = spark.createDataFrame(
        [(10_000 + i, "zzqx " * 50, "en", "s", 0) for i in range(50)],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    drifted = text.corpus_drift(docs, docs.unionByName(flood))
    agg = drifted.agg(F.sum("kl_ba_micro").alias("kl")).collect()[0]["kl"]
    assert agg > 10_000  # > 0.01 bits of divergence


def test_quality_ensemble_bounds_and_dominance(tables):
    from pyspark.sql import functions as F

    out = text.quality_ensemble(tables["documents"])
    rows = out.collect()
    assert len(rows) == tables["documents"].count()
    for r in rows:
        for c in ("pr_quality", "pr_fluency", "pr_model", "ensemble"):
            assert 0.0 <= r[c] <= 1.0
    # keep agrees with the stand-alone gopher gate
    gate = {r["doc_id"]: r["keep"] for r in
            text.gopher_quality_flags(tables["documents"]).collect()}
    assert all(gate[r["doc_id"]] == r["keep"] for r in rows)
    # the ensemble is the rounded mean of its three percentile columns
    # (to within the double rounding of the displayed columns)
    for r in rows:
        mean = (r["pr_quality"] + r["pr_fluency"] + r["pr_model"]) / 3.0
        assert abs(r["ensemble"] - mean) < 2e-4


def test_census_percentile_equals_percent_rank(spark):
    """The bucket-census percentile (quality_ensemble's scale trick) must
    equal percent_rank over the same ordering: pr = #{s' < s}/(n-1) is
    exactly SQL percent_rank when ties share ranks."""
    import random

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    random.seed(7)
    rows = [(i, round(random.choice([0.1, 0.25, 0.25, 0.7, 0.9]), 4))
            for i in range(200)]
    df = spark.createDataFrame(rows, ["doc_id", "s"])
    w = Window.orderBy("s")
    expected = {r["doc_id"]: r["pr"] for r in df.withColumn(
        "pr", F.percent_rank().over(w)).collect()}
    bp = df.withColumn("bp", F.round(F.col("s") * 10000).cast("long"))
    census = bp.groupBy("bp").agg(F.count(F.lit(1)).alias("c"))
    cw = Window.orderBy(F.col("bp").asc()).rowsBetween(
        Window.unboundedPreceding, -1)
    cum = census.withColumn("below", F.coalesce(F.sum("c").over(cw), F.lit(0)))
    n = df.count()
    got = {r["doc_id"]: r["below"] / (n - 1) for r in
           bp.join(cum.select("bp", "below"), "bp").collect()}
    assert got == expected


def test_mask_tokens_rate_identity_and_layout(tables):
    from data_lake_for_e_commerce_analytics_spark.operators import text as T

    docs = tables["documents"]
    m = T.mask_tokens(docs, rate_pct=15)
    agg = m.agg(F.sum("n_masked").alias("nm"), F.sum("n_tokens").alias("nt")).head()
    rate = agg["nm"] / agg["nt"]
    assert 0.10 < rate < 0.20  # hash-uniform ~15%
    # the masked text has exactly n_masked [MASK] tokens
    row = m.orderBy("doc_id").head()
    assert row["masked_text"].split().count("[MASK]") == row["n_masked"]
    # rate 0 is the identity on token streams
    ident = T.mask_tokens(docs, rate_pct=0)
    assert ident.agg(F.sum("n_masked")).head()[0] == 0
    # layout-independent (mask decisions keyed on values, not partitions)
    a = m.orderBy("doc_id").collect()
    b = T.mask_tokens(docs.repartition(13), rate_pct=15).orderBy("doc_id").collect()
    assert a == b


def test_behavior_sequences_structure(tables):
    from data_lake_for_e_commerce_analytics_spark.operators import windows as W

    seqs = W.behavior_sequences(tables["events"])
    rows = seqs.collect()
    ev = tables["events"].filter(F.col("ts").isNotNull())
    # every event lands in exactly one sequence token
    assert sum(r["n_events"] for r in rows) == ev.count()
    for r in rows[:50]:
        assert len(r["sequence"].split(" ")) == r["n_events"]
    # session count per user agrees with session_stats
    per_user = {}
    for r in rows:
        per_user[r["user_id"]] = max(per_user.get(r["user_id"], 0), r["session_seq"])
    stats = {r["user_id"]: r["n_sessions"] for r in W.session_stats(ev).collect()}
    assert per_user == stats


def test_dataset_card_conservation(tables):
    from data_lake_for_e_commerce_analytics_spark.operators import text as T

    docs = tables["documents"]
    card = T.dataset_card(docs).collect()
    assert sum(r["n_docs"] for r in card) == docs.count()
    total_tokens = docs.select(
        F.sum(T.token_count(F.col("text")).cast("long"))
    ).head()[0]
    assert sum(r["n_tokens"] for r in card) == total_tokens
    kept = T.gopher_quality_flags(docs).agg(F.sum("keep")).head()[0]
    assert sum(r["n_gopher_kept"] for r in card) == kept
    for r in card:
        assert 0.0 <= r["mean_quality"] <= 1.0
        assert 0 <= r["n_gopher_kept"] <= r["n_docs"]
