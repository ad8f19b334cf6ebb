"""Sampling operators (R1-R3, generate_clickstream.py:70-74/:133/:210).

pandas ``sample(n)`` has no single Spark primitive (SURVEY.md §4 custom
work #1); these utilities provide deterministic, distributed equivalents:

- exact_n_sample:  seeded ORDER BY rand LIMIT n — one TakeOrdered pass,
  no full sort materialization, deterministic for a fixed seed + input.
- per_group_sample: windowed row_number over rand(seed) <= k — the
  set-based rewrite of the reference's per-order ``oi.sample(n=min(3,...))``
  loop; one shuffle on the group key regardless of group count.
- weighted_choice: weighted categorical pick per row from rand(seed)
  (R4/R5's set-based form).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def exact_n_sample(df: DataFrame, n: int, seed: int = 42) -> DataFrame:
    """Deterministic exact-n sample (R1): rank all rows by rand(seed),
    keep n. Spark plans TakeOrderedAndProject — each partition keeps its
    top-n candidates, the driver merges; nothing like a global sort runs.

    Note rand(seed) is seeded PER PARTITION: determinism holds for a
    fixed partitioning of the input, which parquet scans give us
    (TESTDATA is static). For partitioning-independent sampling, rank by
    xxhash64 of a key column instead (see exact_n_sample_by_key).
    """
    return df.orderBy(F.rand(seed), *df.columns[:1]).limit(n)


def exact_n_sample_by_key(df: DataFrame, n: int, key: str | Column, salt: int = 42) -> DataFrame:
    """Deterministic exact-n sample independent of partition layout:
    rank by xxhash64(key, salt). Stable across cluster sizes — the
    variant to prefer at 100 TB where input splits are not fixed."""
    return df.orderBy(F.xxhash64(key, F.lit(salt)), key).limit(n)


def exact_n_sample_portable(df: DataFrame, n: int, key: str, salt: int = 42) -> DataFrame:
    """Same partition-independent exact-n sample, ranked by
    md5(key || ':salt') — a hash every SQL engine reproduces, so the
    sampled set is oracle-checkable cross-engine. Use the xxhash64
    variant where only Spark needs to agree with itself."""
    rank = F.md5(F.concat(F.col(key).cast("string"), F.lit(f":{salt}")))
    return df.orderBy(rank, key).limit(n)


def per_group_sample(
    df: DataFrame, group_col: str, k: int, seed: int = 42, order_key: str | None = None
) -> DataFrame:
    """<=k rows per group (R2): row_number over rand within each group.
    With ``order_key`` the rank is hash-derived and partition-independent."""
    rank_expr = (
        F.xxhash64(F.col(order_key), F.lit(seed)) if order_key else F.rand(seed)
    )
    w = Window.partitionBy(group_col).orderBy(rank_expr)
    return df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") <= k).drop("__rn")


def dense_index(df: DataFrame, key: str, num_partitions: int | None = None) -> DataFrame:
    """Add ``__idx``: the 0-based dense rank of ``key`` (keys must be
    unique), computed WITHOUT a global single-partition window.

    Distributed zipWithIndex pattern: range-partition on the key, rank
    within each partition, then add per-partition row-count offsets
    (metadata-scale, collected at the driver). Because range partitions
    are ordered and disjoint, offset + local rank == global rank by key
    — deterministic for any partition layout, and every partition ranks
    only its own slice.

    The ranged frame is localCheckpoint-ed (eager) before the two
    actions: repartitionByRange samples its boundaries per job and AQE
    may re-coalesce differently per job, so WITHOUT pinning, the count
    pass and the final pass can disagree on partition identity and the
    offsets corrupt the rank (the bug class the 10x verify caught in
    ``epoch_shuffle``). RDD.zipWithIndex is correct for exactly the
    same reason — its count job and data job run over one materialized
    partitioning. ``epoch_shuffle`` avoids the materialization because
    its sort key is a uniform hash whose top bits give a
    pure-function-of-the-row bucketing; an arbitrary key column has no
    such shortcut.
    """
    parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = (
        df.repartitionByRange(parts, F.col(key))
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    counts = sorted(
        (r["__pid"], r["cnt"])
        for r in ranged.groupBy("__pid").agg(F.count("*").alias("cnt")).collect()
    )
    offsets, acc = {}, 0
    for pid, cnt in counts:
        offsets[pid] = acc
        acc += cnt
    offset_map = F.create_map(
        *[F.lit(x) for pid, off in offsets.items() for x in (pid, off)]
    )
    w = Window.partitionBy("__pid").orderBy(key)
    return (
        ranged.withColumn(
            "__idx",
            (offset_map[F.col("__pid")] + F.row_number().over(w) - 1).cast("long"),
        )
        .drop("__pid")
    )


def epoch_shuffle(
    df: DataFrame,
    key: str = "doc_id",
    epoch: int = 0,
    shard_size: int = 50,
    num_partitions: int | None = None,
) -> DataFrame:
    """Deterministic epoch shuffle + fixed-size sharding — the step that
    turns a curated corpus into training shards: every epoch gets a
    fresh, reproducible global permutation, cut into shards of exactly
    ``shard_size`` examples (last shard ragged) that a data loader
    streams in shard order.

    The permutation key is ``xxhash64(key, 'ep<epoch>')`` — a function
    of the ROW KEY and the epoch only, so the order is independent of
    partition layout, cluster size, and rerun timing (rand() would give
    a different epoch on every retry), and every engine can replay it.

    The global rank is computed WITHOUT a single-partition window:
    the row's BUCKET is derived from the shuffle key's own top bits
    (sign-flipped so unsigned bit order equals signed sort order —
    xxhash64 output is uniform, so buckets are balanced and bucket
    order equals key order), rank within each bucket's window, add
    per-bucket count offsets (metadata-scale collect — one row per
    bucket, never data). At 100 TB this is one hash exchange on the
    bucket id, the same cost as any global sort's exchange.

    The bucket MUST be a pure function of the row (not
    ``repartitionByRange`` + ``spark_partition_id``): range boundaries
    come from a sampling pass and AQE may re-coalesce partitions, and
    neither is stable across the two actions this computation runs
    (the count collect and the final pass) — at sf1 that produced
    overlapping ranks (1206 duplicate indices in 50k rows; caught by
    the 10x oracle verify, invisible at small scale where AQE
    collapses everything to one partition both times).
    """
    if not 0 <= epoch <= 9999:
        raise ValueError("epoch tag must stay under 8 bytes: 0 <= epoch <= 9999")
    tag = f"ep{epoch}"
    parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    bucket_bits = max(1, (parts - 1).bit_length())
    keyed = df.withColumn("shuffle_key", F.xxhash64(F.col(key), F.lit(tag)))
    # flip the sign bit: maps signed int64 order onto unsigned bit
    # order, so the top `bucket_bits` bits are an ORDERED bucketing
    bucketed = keyed.withColumn(
        "__pid",
        F.shiftrightunsigned(
            F.col("shuffle_key").bitwiseXOR(F.lit(-(1 << 63))),
            64 - bucket_bits,
        ).cast("int"),
    )
    counts = sorted(
        (r["__pid"], r["cnt"])
        for r in bucketed.groupBy("__pid").agg(F.count("*").alias("cnt")).collect()
    )
    offsets, acc = {}, 0
    for pid, cnt in counts:
        offsets[pid] = acc
        acc += cnt
    offset_map = F.create_map(
        *[F.lit(x) for pid, off in offsets.items() for x in (pid, off)]
    )
    w = Window.partitionBy("__pid").orderBy("shuffle_key", key)
    idx = (offset_map[F.col("__pid")] + F.row_number().over(w) - 1).cast("long")
    return (
        bucketed.withColumn("__idx", idx)
        .select(
            key,
            "shuffle_key",
            F.expr(f"__idx div {shard_size}").cast("long").alias("shard_id"),
            F.pmod(F.col("__idx"), F.lit(shard_size)).cast("long").alias("pos_in_shard"),
        )
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    key: str = "doc_id",
    epoch: int = 0,
    shard_size: int = 50,
) -> DataFrame:
    """Materialize an epoch's training shards: ``epoch_shuffle`` the
    corpus, write it partitioned by ``shard_id`` (each shard = one
    directory a data-loader worker claims), and return the manifest —
    one row per shard with its row count and an order-insensitive
    content signature (XOR of key hashes) the loader can verify after
    download.

    The payload rides along through the same range exchange the rank
    needs — no second shuffle to re-attach columns. Reruns produce
    byte-identical shard assignments (the permutation follows the key),
    so a failed epoch write is safely re-runnable.
    """
    assignment = epoch_shuffle(df, key=key, epoch=epoch, shard_size=shard_size)
    sharded = df.join(assignment, key)
    sharded.write.mode("overwrite").partitionBy("shard_id").parquet(path)
    spark = df.sparkSession
    manifest = (
        spark.read.parquet(path)
        .groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.expr(f"bit_xor(xxhash64({key}))").alias("content_sig"),
        )
        .orderBy("shard_id")
    )
    return manifest


def weighted_choice(weights: dict[str, float], seed_col: Column) -> Column:
    """Weighted categorical choice (R5, generate_clickstream.py:238-247):
    fold cumulative weights into nested WHENs over a uniform [0,1) column.
    ``seed_col`` is any uniform random/hash-derived double column."""
    total = sum(weights.values())
    expr = None
    acc = 0.0
    items = list(weights.items())
    for value, w in items[:-1]:
        acc += w / total
        expr = (
            F.when(seed_col < acc, F.lit(value))
            if expr is None
            else expr.when(seed_col < acc, F.lit(value))
        )
    last = items[-1][0]
    return F.lit(last) if expr is None else expr.otherwise(F.lit(last))


def uniform_choice(values: list[str], seed_col: Column) -> Column:
    """Uniform categorical choice (R4): index a literal array by the
    scaled uniform column."""
    arr = F.array(*[F.lit(v) for v in values])
    idx = (seed_col * len(values)).cast("int") + 1
    return F.element_at(arr, F.least(idx, F.lit(len(values))))


def deterministic_stratified_sample(
    df: DataFrame,
    key: str,
    strata: str,
    fractions: dict[str, float],
    salt: int = 1_000_003,
    buckets: int = 1_000,
) -> DataFrame:
    """Per-stratum downsampling with a DETERMINISTIC keep rule — the
    training-mix rebalancing primitive (e.g. cap an overrepresented
    language at 30% while keeping rare languages whole).

    A row is kept iff ``(key * salt) mod buckets < fractions[stratum] *
    buckets``: a multiplicative systematic sample, reproducible across
    runs, engines, and cluster sizes, embarrassingly parallel (pure
    per-row predicate, no shuffle, pushes past scans). Unlike
    ``DataFrame.sampleBy`` the decision is a function of the KEY, so
    reruns and incremental loads keep exactly the same rows. Strata
    missing from ``fractions`` are kept whole. For adversarial integer
    keys use a mixing hash (xxhash64) instead of the multiplicative
    bucket; the modular rule is used here for cross-engine parity.
    """
    frac_col = None
    for stratum, frac in fractions.items():
        cond = F.col(strata) == stratum
        frac_col = (
            F.when(cond, F.lit(float(frac)))
            if frac_col is None
            else frac_col.when(cond, F.lit(float(frac)))
        )
    frac_col = frac_col.otherwise(F.lit(1.0)) if frac_col is not None else F.lit(1.0)
    bucket = F.pmod(F.col(key).cast("long") * F.lit(salt), F.lit(buckets))
    return df.filter(bucket < frac_col * buckets)


def weighted_sample_topk(
    df: DataFrame,
    key: str,
    weight: str,
    k: int = 100,
    salt: int = 1_000_003,
) -> DataFrame:
    """Weighted sampling without replacement via the A-ES priority rule
    (Efraimidis & Spirakis, IPL 2006): each row gets priority
    ``u^(1/w)`` for a uniform ``u`` and weight ``w``; the top-k
    priorities are a weighted sample without replacement.

    ``u`` is derived from the KEY (same modular rule as
    ``deterministic_stratified_sample``), so the draw is reproducible
    across runs and engines — rerunning a pipeline re-selects the same
    rows. Single pass, no shuffle except the top-k
    (TakeOrderedAndProject): the canonical way to take a
    price-weighted sample of 100 TB of orders in one scan.
    """
    u = ((F.col(key).cast("long") * F.lit(salt)) % 1_000_000 + 1) / 1_000_000.0
    priority = F.pow(u, 1.0 / F.col(weight))
    return (
        df.select(key, weight)
        .withColumn("priority", F.round(priority, 8))
        .orderBy(F.desc("priority"), key)
        .limit(k)
    )


def assign_split(
    df: DataFrame,
    key: str = "doc_id",
    tag: str = "split",
    weights: tuple[tuple[str, int], ...] = (("train", 80), ("val", 10), ("test", 10)),
) -> DataFrame:
    """Deterministic train/val/test assignment — the corpus-partitioning
    step every training pipeline runs before anything else. Each row's
    bucket is ``pmod(xxhash64(key, tag), sum(weights))``; cumulative
    weight ranges map buckets to split names.

    Properties that matter at 100 TB:
    - partition-layout-independent and rerun-stable: the split follows
      the KEY, not rand(), so adding machines, reshuffling input files,
      or re-running tomorrow never moves a document across splits (which
      would contaminate an already-trained model's held-out set);
    - map-side only — no shuffle, no state, composable with any scan;
    - externally replayable: the same assignment is re-derivable in any
      engine via the portable XXH64 SQL layer (functions/xxh64_sql.py),
      which is how the DuckDB oracle checks every row.
    """
    total = sum(w for _, w in weights)
    bucket = F.pmod(F.xxhash64(F.col(key), F.lit(tag)), F.lit(total))
    split = None
    acc = 0
    for name, w in weights:
        cond = (bucket >= F.lit(acc)) & (bucket < F.lit(acc + w))
        split = F.when(cond, name) if split is None else split.when(cond, name)
        acc += w
    return df.withColumn("bucket", bucket.cast("int")).withColumn("split", split)


def mixture_resample(
    df: DataFrame,
    weight_col: str,
    targets: tuple[tuple[str, int], ...] = (("en", 40), ("de", 20), ("es", 20), ("fr", 20)),
    group_col: str = "lang",
    key: str = "doc_id",
    tag: str = "mix",
) -> DataFrame:
    """Resample a corpus toward a target domain mixture — the data-mixing
    step of a training pipeline (choose how much of each language/domain
    the model sees). ``targets`` are integer percent shares; groups not
    listed are dropped.

    The achievable corpus size is bound by the scarcest group:
    ``N* = min over groups of (available_g * 100 // share_g)``, each
    group keeps ``take_g = share_g * N* // 100`` weight, and documents
    are thinned deterministically at rate ``take_g / available_g`` via
    ``pmod(xxhash64(key, tag), 1e6) < keep_ppm_g``. ALL arithmetic is
    integer (floors, parts-per-million rates), so any ANSI engine
    replays the exact kept set — and like assign_split the keep decision
    follows the KEY, so reruns and repartitions keep identical rows.

    Scale shape: one map-side pass over the corpus plus two broadcast
    scalar relations (per-group availability, then per-group keep rate)
    — no shuffle of data rows, no sort, no sampling state.
    """
    spark = df.sparkSession
    tdf = spark.createDataFrame(list(targets), [group_col, "share_pct"])
    d = df.select(key, group_col, F.col(weight_col).cast("long").alias("w"))
    avail = (
        d.groupBy(group_col)
        .agg(F.sum("w").alias("avail"))
        .join(F.broadcast(tdf), group_col)
    )
    nstar = avail.agg(
        F.min(F.expr("avail * 100 div share_pct")).alias("nstar")
    )
    rates = (
        avail.crossJoin(F.broadcast(nstar))
        .select(
            group_col,
            F.least(
                F.lit(1_000_000),
                F.expr("share_pct * nstar div 100 * 1000000 div avail"),
            ).alias("keep_ppm"),
        )
    )
    bucket = F.pmod(F.xxhash64(F.col(key), F.lit(tag)), F.lit(1_000_000))
    return (
        d.join(F.broadcast(rates), group_col)
        .filter(bucket < F.col("keep_ppm"))
        .select(key, group_col, F.col("w").alias(weight_col))
    )
