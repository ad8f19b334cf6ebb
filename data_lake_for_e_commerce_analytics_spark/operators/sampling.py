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
