"""Sampling operator properties (R1-R5)."""

from pyspark.sql import functions as F

from data_lake_for_e_commerce_analytics_spark.operators import sampling


def test_exact_n_sample_size_and_determinism(tables):
    a = sampling.exact_n_sample(tables["orders"], 100, seed=7).collect()
    b = sampling.exact_n_sample(tables["orders"], 100, seed=7).collect()
    assert len(a) == 100
    assert a == b


def test_exact_n_sample_by_key_stable_across_partitioning(tables):
    orders = tables["orders"]
    a = {r["o_orderkey"] for r in sampling.exact_n_sample_by_key(orders, 50, "o_orderkey").collect()}
    b = {
        r["o_orderkey"]
        for r in sampling.exact_n_sample_by_key(orders.repartition(13), 50, "o_orderkey").collect()
    }
    assert a == b  # hash ranking is independent of partition layout


def test_per_group_sample_caps_group_size(tables):
    out = sampling.per_group_sample(
        tables["lineitem"], "l_orderkey", 3, order_key="l_partkey"
    )
    counts = out.groupBy("l_orderkey").count().collect()
    assert all(r["count"] <= 3 for r in counts)
    # groups smaller than k keep all their rows
    small = tables["lineitem"].groupBy("l_orderkey").count().filter(F.col("count") <= 3)
    kept = out.groupBy("l_orderkey").count()
    joined = small.withColumnRenamed("count", "orig").join(kept, "l_orderkey")
    assert joined.filter(F.col("orig") != F.col("count")).count() == 0


def test_weighted_choice_distribution(spark):
    df = spark.range(20_000).withColumn("u", F.rand(11))
    choice = sampling.weighted_choice({"a": 0.5, "b": 0.3, "c": 0.2}, F.col("u"))
    counts = dict(
        df.select(choice.alias("c")).groupBy("c").count().rdd.map(tuple).collect()
    )
    n = sum(counts.values())
    assert abs(counts["a"] / n - 0.5) < 0.05
    assert abs(counts["b"] / n - 0.3) < 0.05
    assert abs(counts["c"] / n - 0.2) < 0.05


def test_uniform_choice_covers_all_values(spark):
    df = spark.range(5_000).withColumn("u", F.rand(3))
    vals = {
        r["c"]
        for r in df.select(sampling.uniform_choice(["x", "y", "z"], F.col("u")).alias("c"))
        .distinct()
        .collect()
    }
    assert vals == {"x", "y", "z"}


def test_dense_index_is_global_rank_by_key(tables):
    from data_lake_for_e_commerce_analytics_spark.operators.sampling import dense_index

    nation = tables["nation"]
    idx = dense_index(nation, "n_nationkey", num_partitions=4)
    rows = idx.select("n_nationkey", "__idx").orderBy("n_nationkey").collect()
    keys = [r["n_nationkey"] for r in rows]
    got = [r["__idx"] for r in rows]
    # __idx must be exactly the 0-based rank of the key, dense, no gaps
    assert got == list(range(len(rows)))
    assert keys == sorted(keys)
    # partition-layout independence
    idx2 = dense_index(nation.repartition(7), "n_nationkey", num_partitions=2)
    rows2 = {r["n_nationkey"]: r["__idx"] for r in idx2.collect()}
    assert rows2 == {k: i for i, k in enumerate(keys)}


def test_partition_stats_and_skew_ratio(spark):
    from data_lake_for_e_commerce_analytics_spark.plans.explain import partition_stats, skew_ratio

    even = spark.range(0, 10_000).repartition(8, "id")
    stats = partition_stats(even)
    assert sum(c for _, c in stats) == 10_000
    assert skew_ratio(even) < 1.5
    # single hot key -> everything lands in one partition
    skewed = spark.range(0, 10_000).withColumn("k", F.lit(1)).repartition(8, "k")
    assert skew_ratio(skewed) == 8.0


def test_deterministic_stratified_sample_rates_and_replay(tables):
    docs = tables["documents"]
    fractions = {"en": 0.3, "fr": 0.5}
    sampled = sampling.deterministic_stratified_sample(
        docs, key="doc_id", strata="lang", fractions=fractions
    )
    # deterministic: two runs agree row-for-row
    ids_a = {r["doc_id"] for r in sampled.select("doc_id").collect()}
    ids_b = {r["doc_id"] for r in sampled.select("doc_id").collect()}
    assert ids_a == ids_b
    # untouched strata survive whole; sampled strata shrink
    by_lang_in = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    by_lang_out = {r["lang"]: r["n"] for r in sampled.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    for lang, n_in in by_lang_in.items():
        n_out = by_lang_out.get(lang, 0)
        if lang in fractions:
            assert n_out <= n_in
        else:
            assert n_out == n_in
    # keep decision is a pure row predicate: no shuffle in the plan
    plan = sampled._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_weighted_sample_topk_properties(tables):
    orders = tables["orders"]
    got = sampling.weighted_sample_topk(orders, "o_orderkey", "o_totalprice", k=100)
    rows = got.collect()
    assert len(rows) == 100
    # deterministic replay
    again = sampling.weighted_sample_topk(orders, "o_orderkey", "o_totalprice", k=100).collect()
    assert [r["o_orderkey"] for r in rows] == [r["o_orderkey"] for r in again]
    # weight bias: the sample's mean order value exceeds the population mean
    pop_mean = orders.agg(F.avg("o_totalprice")).collect()[0][0]
    samp_mean = sum(r["o_totalprice"] for r in rows) / len(rows)
    assert samp_mean > pop_mean
    # top-k is planned as TakeOrderedAndProject, not a global sort
    assert "TakeOrderedAndProject" in got._jdf.queryExecution().executedPlan().toString()


def test_assign_split_deterministic_and_layout_independent(tables):
    docs = tables["documents"]
    a = {r["doc_id"]: r["split"] for r in sampling.assign_split(docs).collect()}
    # every row assigned exactly one split
    assert set(a.values()) <= {"train", "val", "test"}
    assert len(a) == docs.count()
    # repartitioning the input must not move any document across splits
    # (a moved doc would contaminate an already-trained model's held-out
    # set) — the property rand()-based splits do NOT have
    b = {
        r["doc_id"]: r["split"]
        for r in sampling.assign_split(docs.repartition(7, "lang")).collect()
    }
    assert a == b
    # weights are respected to within sampling noise (80/10/10)
    n = len(a)
    from collections import Counter

    counts = Counter(a.values())
    assert 0.6 * n < counts["train"] < 0.95 * n
    assert counts["val"] > 0 and counts["test"] > 0


def test_mixture_resample_hits_target_shares(tables):
    from data_lake_for_e_commerce_analytics_spark.operators import text

    docs = tables["documents"].select(
        "doc_id", "lang", text.token_count(F.col("text")).alias("n_tokens")
    )
    kept = sampling.mixture_resample(docs, weight_col="n_tokens")
    by_lang = {
        r["lang"]: r["tok"]
        for r in kept.groupBy("lang").agg(F.sum("n_tokens").alias("tok")).collect()
    }
    # dropped domains are gone entirely
    assert "zh" not in by_lang
    total = sum(by_lang.values())
    targets = {"en": 0.40, "de": 0.20, "es": 0.20, "fr": 0.20}
    # achieved token mixture within doc-granularity noise of the target
    for lang, share in targets.items():
        assert abs(by_lang[lang] / total - share) < 0.08, (lang, by_lang)
    # deterministic and layout-independent, like every keyed sampler here
    again = {
        r["doc_id"]
        for r in sampling.mixture_resample(
            docs.repartition(5, "lang"), weight_col="n_tokens"
        ).collect()
    }
    assert again == {r["doc_id"] for r in kept.collect()}


def test_split_assign_plan_is_shuffle_free(tables):
    """The split must be a pure map-side decision — any Exchange in the
    plan would mean the assignment depends on data movement."""
    from data_lake_for_e_commerce_analytics_spark.plans.explain import plan_string

    plan = plan_string(sampling.assign_split(tables["documents"]).select("doc_id", "split"))
    assert "Exchange" not in plan


def test_mixture_resample_plan_broadcasts_rates(tables):
    """The per-group keep-rate relation must reach the corpus via
    broadcast joins — a shuffle of data rows keyed on the group column
    would be the 100 TB mistake."""
    from data_lake_for_e_commerce_analytics_spark.operators import text
    from data_lake_for_e_commerce_analytics_spark.plans.explain import plan_string

    docs = tables["documents"].select(
        "doc_id", "lang", text.token_count(F.col("text")).alias("n_tokens")
    )
    plan = plan_string(sampling.mixture_resample(docs, weight_col="n_tokens"))
    # the corpus-side probe joins the rate relation via broadcast: the
    # FIRST (outermost) join in the plan must be a BroadcastHashJoin on
    # lang with the keep filter folded into it. The only Exchanges in
    # the plan are partial aggregates producing the k-row group
    # relations — never a shuffle of corpus rows.
    first_join = next(
        line for line in plan.splitlines() if "Join" in line
    )
    assert "BroadcastHashJoin" in first_join and "keep_ppm" in first_join


def test_epoch_shuffle_is_a_permutation_with_fixed_shards(tables):
    docs = tables["documents"]
    n = docs.count()
    out = sampling.epoch_shuffle(docs, epoch=1, shard_size=50)
    rows = out.collect()
    assert len(rows) == n
    assert len({r["doc_id"] for r in rows}) == n
    sizes = {}
    for r in rows:
        sizes[r["shard_id"]] = sizes.get(r["shard_id"], 0) + 1
    last = max(sizes)
    assert all(c == 50 for s, c in sizes.items() if s != last)
    assert 0 < sizes[last] <= 50
    # positions within a shard are a contiguous 0..size-1 run
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["shard_id"], []).append(r["pos_in_shard"])
    for s, ps in by_shard.items():
        assert sorted(ps) == list(range(len(ps)))


def test_epoch_shuffle_layout_independent_and_epoch_sensitive(tables):
    docs = tables["documents"]
    a = {(r["doc_id"], r["shard_id"], r["pos_in_shard"])
         for r in sampling.epoch_shuffle(docs, epoch=2, shard_size=64).collect()}
    b = {(r["doc_id"], r["shard_id"], r["pos_in_shard"])
         for r in sampling.epoch_shuffle(docs.repartition(13), epoch=2, shard_size=64).collect()}
    assert a == b  # rank follows the key hash, not the partition layout
    c = {(r["doc_id"], r["shard_id"], r["pos_in_shard"])
         for r in sampling.epoch_shuffle(docs, epoch=3, shard_size=64).collect()}
    assert a != c  # a new epoch is a new permutation


def test_write_training_shards_manifest_and_pruning(tables, tmp_path):
    docs = tables["documents"]
    path = str(tmp_path / "shards")
    manifest = sampling.write_training_shards(docs, path, epoch=1, shard_size=50)
    rows = manifest.collect()
    assert sum(r["n_rows"] for r in rows) == docs.count()
    # a loader reading one shard must hit only that directory
    from data_lake_for_e_commerce_analytics_spark.plans.explain import plan_string

    spark = docs.sparkSession
    one = spark.read.parquet(path).filter(F.col("shard_id") == rows[0]["shard_id"])
    assert "PartitionFilters" in plan_string(one)
    # rerun writes the identical assignment (same permutation, same sigs)
    manifest2 = sampling.write_training_shards(docs, path, epoch=1, shard_size=50)
    assert sorted(map(tuple, rows)) == sorted(map(tuple, manifest2.collect()))


def test_epoch_shuffle_plan_has_no_global_window(tables):
    """The global rank must come from the bucket exchange + per-bucket
    offsets — a Window with an EMPTY partition spec (single-partition
    global sort) would serialize the corpus through one task at 100 TB.
    Since the r8 fix the bucket id is computed FROM the shuffle key
    (no repartitionByRange sampling pass), so the only exchange is the
    window's hash partitioning on __pid."""
    import re

    from data_lake_for_e_commerce_analytics_spark.plans.explain import plan_string

    plan = plan_string(sampling.epoch_shuffle(tables["documents"], epoch=1))
    assert "hashpartitioning(__pid" in plan.lower()
    # the sampled range exchange is gone — bucketing is a row-local expr
    assert "rangepartitioning" not in plan.lower()
    for m in re.finditer(r"Window \[(.*?)\]", plan):
        spec = m.group(0)
        # every window in the plan is partitioned by the bucket id
        assert "__pid" in spec


def test_epoch_shuffle_is_exact_permutation_at_scale(spark):
    """Regression for the r8 sf1-verify catch: the old implementation
    derived __pid from repartitionByRange + spark_partition_id, but
    range boundaries are sampled per job and AQE coalesces per job, so
    the count pass and the final pass could disagree on partition
    identity — at 50k rows / 32 buckets the global 'rank' had 1206
    duplicate indices. The bucket is now a pure function of the
    shuffle key's top bits; the rank must be an exact 0..n-1
    permutation consistent with the (shuffle_key, key) sort order, at
    a size where many buckets are actually populated."""
    from pyspark.sql import functions as F

    from data_lake_for_e_commerce_analytics_spark.operators.sampling import (
        epoch_shuffle,
    )

    n = 60_000
    df = spark.range(n).select((F.col("id") * 17 + 3).alias("doc_id"))
    out = epoch_shuffle(
        df, key="doc_id", epoch=3, shard_size=50, num_partitions=32
    ).collect()
    assert len(out) == n
    rows = sorted(
        (r["shuffle_key"], r["doc_id"], r["shard_id"] * 50 + r["pos_in_shard"])
        for r in out
    )
    assert [t[2] for t in rows] == list(range(n))
    # stability: a different input layout yields the identical mapping
    out2 = epoch_shuffle(
        df.repartition(7), key="doc_id", epoch=3, shard_size=50,
        num_partitions=32,
    ).collect()
    m1 = {r["doc_id"]: (r["shard_id"], r["pos_in_shard"]) for r in out}
    m2 = {r["doc_id"]: (r["shard_id"], r["pos_in_shard"]) for r in out2}
    assert m1 == m2
