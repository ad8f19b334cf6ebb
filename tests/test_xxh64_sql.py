"""Pin the DuckDB XXH64 macro library bit-for-bit against Spark's
F.xxhash64 — the parity foundation for every hash-replayed oracle
(clickstream synthesis, LSH hyperplanes, hash-ranked samples)."""

from __future__ import annotations

import random

import duckdb
from pyspark.sql import functions as F

from data_lake_for_e_commerce_analytics_spark.functions.xxh64_sql import (
    SPARK_SEED,
    install_xxh64,
    spark_uniform_sql,
)

TAGS = ["start", "g1", "g2", "g3", "g4", "device", "traffic", "auth", "n", "days", "w", "g", "base", "x"]


def _duck():
    con = duckdb.connect()
    install_xxh64(con)
    return con


def test_long_hash_parity(spark):
    rng = random.Random(7)
    vals = [0, 1, -1, 2**63 - 1, -(2**63), 42] + [rng.randrange(-(2**63), 2**63) for _ in range(100)]
    got_spark = [
        r[0]
        for r in spark.createDataFrame([(v,) for v in vals], "v long")
        .select(F.xxhash64("v"))
        .collect()
    ]
    con = _duck()
    got_duck = [
        con.execute(f"SELECT xxsigned(xxh64_long({v}, {SPARK_SEED}))").fetchone()[0]
        for v in vals
    ]
    assert got_spark == got_duck


def test_int_hash_parity_and_chaining(spark):
    rng = random.Random(11)
    pairs = [(0, 0), (-1, 1), (2**31 - 1, -(2**31))] + [
        (rng.randrange(-(2**31), 2**31), rng.randrange(-(2**31), 2**31)) for _ in range(100)
    ]
    df = spark.createDataFrame(pairs, "a int, b int")
    got_spark = [tuple(r) for r in df.select(F.xxhash64("a"), F.xxhash64("a", "b")).collect()]
    con = _duck()
    got_duck = [
        (
            con.execute(f"SELECT xxsigned(xxh64_int({a}, {SPARK_SEED}))").fetchone()[0],
            con.execute(
                f"SELECT xxsigned(xxh64_int({b}, xxh64_int({a}, {SPARK_SEED})))"
            ).fetchone()[0],
        )
        for a, b in pairs
    ]
    assert got_spark == got_duck


def test_long_str_hash_parity(spark):
    """Chain-builder path (what oracles actually emit): hashLong then
    per-tag string hash, laid out as CTE stages."""
    from data_lake_for_e_commerce_analytics_spark.functions.xxh64_sql import (
        cte_stages,
        long_hash_chain,
        merge_chains,
        signed_sql,
        str_hash_chain,
    )

    rng = random.Random(13)
    keys = [rng.randrange(-(2**62), 2**62) for _ in range(20)] + [0, 1, -1]
    rows = [(k, t) for k in keys for t in TAGS]
    df = spark.createDataFrame(rows, "k long, tag string")
    got_spark = {(r[0], r[1]): r[2] for r in df.select("k", "tag", F.xxhash64("k", "tag")).collect()}
    con = _duck()
    con.execute("CREATE TABLE ks (k BIGINT)")
    con.executemany("INSERT INTO ks VALUES (?)", [(k,) for k in keys])
    for t in TAGS:
        chain = long_hash_chain("hk", "k", 42) + str_hash_chain("ht", "hk", t)
        body, final = cte_stages("b", "SELECT k FROM ks", merge_chains([chain]))
        got = dict(
            con.execute(f"WITH {body} SELECT k, {signed_sql('ht')} FROM {final}").fetchall()
        )
        for k in keys:
            assert got[k] == got_spark[(k, t)], (k, t)


def test_uniform_parity(spark):
    """pmod(h, 1e9+7)/(1e9+7) — the generator's random.random() stand-in."""
    keys = [1, 17, 999_983, -5, 123456789]
    df = spark.createDataFrame([(k,) for k in keys], "k long")
    h = F.xxhash64("k", F.lit("start"))
    got_spark = [
        r[0]
        for r in df.select(
            (F.pmod(h, F.lit(1_000_000_007)).cast("double") / F.lit(1_000_000_007.0))
        ).collect()
    ]
    con = _duck()
    got_duck = [
        con.execute(f"SELECT {spark_uniform_sql(str(k), 'start')}").fetchone()[0]
        for k in keys
    ]
    assert got_spark == got_duck


def test_blob_hash_parity(spark):
    """Arbitrary-length string hashing (the production token-hash path):
    empty/short/stripe-boundary/32+ byte inputs, unicode, and the
    comma-joined signed-long band-string shapes."""
    from data_lake_for_e_commerce_analytics_spark.functions.xxh64_sql import (
        blob_hash_chain,
        cte_stages,
        merge_chains,
        signed_sql,
    )

    rng = random.Random(99)
    alphabet = "abcdefghij XYZ0123456789éü漢字,|-"
    strs = ["", "a", "abc", "abcd", "abcdefg", "abcdefgh", "x" * 31, "y" * 32, "z" * 33, "w" * 64, "v" * 100]
    strs += ["".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 90))) for _ in range(40)]
    strs += [",".join(str(rng.randrange(-(2**63), 2**63)) for _ in range(4)) for _ in range(10)]

    df = spark.createDataFrame([(i, s) for i, s in enumerate(strs)], "i int, s string")
    expect = {r["i"]: r["h"] for r in df.select("i", F.xxhash64("s").alias("h")).collect()}

    con = duckdb.connect()
    con.execute("CREATE TABLE t (i INT, s VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", [(i, s) for i, s in enumerate(strs)])
    body, final = cte_stages(
        "b", "SELECT i, s FROM t", merge_chains([blob_hash_chain("bh", "encode(s)")])
    )
    got = dict(con.execute(f"WITH {body} SELECT i, {signed_sql('bh')} FROM {final}").fetchall())
    assert got == expect


def test_blob_hash_differential_hypothesis():
    """Property-based differential: the pure-Python XXH64 (xxh64_py,
    itself pinned against Spark) vs the SQL chain, over hypothesis-
    generated byte strings — exercises stripe/word/chunk/tail boundary
    combinations no fixed list covers. No Spark session needed."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from data_lake_for_e_commerce_analytics_spark.functions.xxh64_py import (
        hash_bytes,
        to_signed,
    )
    from data_lake_for_e_commerce_analytics_spark.functions.xxh64_sql import (
        blob_hash_chain,
        cte_stages,
        merge_chains,
        signed_sql,
    )

    con = duckdb.connect()
    body, final = cte_stages(
        "b", "SELECT ?::BLOB AS pl", merge_chains([blob_hash_chain("bh", "pl")])
    )
    sql = f"WITH {body} SELECT {signed_sql('bh')} FROM {final}"

    @settings(max_examples=60, deadline=None)
    @given(st.binary(min_size=0, max_size=120))
    def check(payload):
        expect = to_signed(hash_bytes(payload, 42))
        got = con.execute(sql, [payload]).fetchone()[0]
        assert got == expect, payload.hex()

    check()
