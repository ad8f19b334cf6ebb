"""Spark-compatible XXH64 as portable ANSI-ish SQL (DuckDB macros).

Spark's ``F.xxhash64`` (seed 42, per-column chaining) drives every
deterministic-random operator in this engine (clickstream synthesis,
LSH hyperplanes, hash-ranked samples).  DuckDB has no xxhash64, so
cross-engine oracles for those operators need the hash replayed in
SQL.  XXH64 is pure 64-bit wrapping integer arithmetic; DuckDB BIGINT
errors on overflow, so these macros carry values as *unsigned 64-bit
residues in HUGEINT* and reduce mod 2^64 explicitly.  128-bit products
of two 64-bit operands would overflow INT128, so multiplication splits
the left operand into 32-bit halves (schoolbook mod-2^64).

Parity surface (pinned against Spark in tests/test_xxh64_sql.py):
- ``xxh64_long(v, seed)``  == Spark XXH64.hashLong   (LongType column)
- ``xxh64_int(v, seed)``   == Spark XXH64.hashInt    (IntegerType column)
- ``xxh64_str_sql(seed_sql, s)`` == Spark hashUnsafeBytes for a
  compile-time-known string under 8 bytes (every tag the engine uses)
- chaining: ``xxhash64(a, b)`` == hash(b, seed=hash(a, seed=42))

Reference semantics: Spark `sql/catalyst` XXH64.java (public Apache
source); the generator consuming these is operators/clickstream.py.
"""

from __future__ import annotations

P1 = 0x9E3779B185EBCA87  # 11400714785074694791
P2 = 0xC2B2AE3D27D4EB4F  # 14029467366897019727
P3 = 0x165667B19E3779F9  # 1609587929392839161
P4 = 0x85EBCA77C2B2AE63  # 9650029242287828579
P5 = 0x27D4EB2F165667C5  # 2870177450012600261

SPARK_SEED = 42

# Macro set. Order matters (later macros call earlier ones).  All
# values in [0, 2^64); callers convert Spark's signed longs with
# xxu64 / back with xxsigned.
XXH64_MACROS = f"""
CREATE OR REPLACE MACRO xxm64(x) AS
    ((x % 18446744073709551616) + 18446744073709551616) % 18446744073709551616;
CREATE OR REPLACE MACRO xxu64(x) AS
    xxm64(CAST(x AS HUGEINT));
CREATE OR REPLACE MACRO xxsigned(x) AS
    CAST(CASE WHEN x >= 9223372036854775808 THEN x - 18446744073709551616
              ELSE x END AS BIGINT);
CREATE OR REPLACE MACRO xxmul64(a, b) AS
    xxm64((a % 4294967296) * b
          + ((((a // 4294967296) * (b % 4294967296)) % 4294967296) * 4294967296));
CREATE OR REPLACE MACRO xxrotl(x, n) AS
    xxm64(x * (CAST(1 AS HUGEINT) << n)) + (x >> (64 - n));
CREATE OR REPLACE MACRO xxfmix(h0) AS (
    WITH t1 AS (SELECT xxmul64(xor(h0, h0 >> 33), {P2}) AS h1),
         t2 AS (SELECT xxmul64(xor(h1, h1 >> 29), {P3}) AS h2 FROM t1)
    SELECT xor(h2, h2 >> 32) FROM t2
);
CREATE OR REPLACE MACRO xxh64_long(v, seed) AS (
    WITH s1 AS (SELECT xxm64(CAST(seed AS HUGEINT) + {P5} + 8) AS acc,
                       xxmul64(xxrotl(xxmul64(xxu64(v), {P2}), 31), {P1}) AS k1),
         s2 AS (SELECT xxm64(xxmul64(xxrotl(xor(acc, k1), 27), {P1}) + {P4}) AS h FROM s1)
    SELECT xxfmix(h) FROM s2
);
CREATE OR REPLACE MACRO xxh64_int(v, seed) AS (
    WITH s1 AS (SELECT xxm64(CAST(seed AS HUGEINT) + {P5} + 4) AS acc,
                       xxmul64((CAST(v AS HUGEINT) % 4294967296 + 4294967296) % 4294967296, {P1}) AS k1),
         s2 AS (SELECT xxm64(xxmul64(xxrotl(xor(acc, k1), 23), {P2}) + {P3}) AS h FROM s1)
    SELECT xxfmix(h) FROM s2
);
"""


def install_xxh64(con) -> None:
    """Register the macro set on a DuckDB connection."""
    for stmt in XXH64_MACROS.split(";"):
        if stmt.strip():
            con.execute(stmt)


def xxh64_str_sql(seed_sql: str, s: str) -> str:
    """SQL expression for Spark XXH64 of compile-time string ``s``
    (UTF-8, < 8 bytes — every tag this engine hashes) chained on the
    unsigned-64 seed expression ``seed_sql``.

    Mirrors hashUnsafeBytes for len<8: no 8-byte words, one optional
    4-byte little-endian chunk, then per-byte tail, then fmix.  The
    chunk/byte constants fold at generation time, so the emitted SQL is
    a short macro chain.
    """
    b = s.encode("utf-8")
    if len(b) >= 8:
        raise ValueError(f"tag {s!r} is >= 8 bytes; extend xxh64_str_sql with the word loop")
    h = f"xxm64(({seed_sql}) + {P5} + {len(b)})"
    rest = b
    if len(b) >= 4:
        c4 = int.from_bytes(b[:4], "little")
        h = f"xxm64(xxmul64(xxrotl(xor({h}, xxmul64(CAST({c4} AS HUGEINT), {P1})), 23), {P2}) + {P3})"
        rest = b[4:]
    for byte in rest:
        h = f"xxmul64(xxrotl(xor({h}, xxmul64(CAST({byte} AS HUGEINT), {P5})), 11), {P1})"
    return f"xxfmix({h})"


def spark_xxhash64_long_str_sql(key_sql: str, tag: str) -> str:
    """SQL for Spark ``F.xxhash64(longCol, lit(tag))`` as a SIGNED
    bigint: chain hashLong(key, 42) then hashString(tag, ·)."""
    return f"xxsigned({xxh64_str_sql(f'xxh64_long({key_sql}, {SPARK_SEED})', tag)})"


def spark_uniform_sql(key_sql: str, tag: str) -> str:
    """SQL twin of clickstream._uniform: pmod(xxhash64(key, tag), 1e9+7)
    / (1e9+7) — deterministic uniform in [0, 1)."""
    h = spark_xxhash64_long_str_sql(key_sql, tag)
    m = 1_000_000_007
    return f"((({h}) % {m} + {m}) % {m}) / {float(m)!r}"


# --- inline-expression chain builders --------------------------------------
#
# Driver oracles must be a SINGLE SELECT statement — no CREATE MACRO —
# and DuckDB's macro binder caps recursion at 128 anyway.  These
# builders emit the same arithmetic as the macro set above, but as
# chains of (alias, expr) steps meant to be laid out one CTE stage per
# step: each step's expression references only plain column aliases
# from earlier stages, so expression depth and size stay bounded no
# matter how many hashes compose.

M64 = 1 << 64
_MASK64 = M64 - 1
_MASK32 = (1 << 32) - 1


def _m64(x: str) -> str:
    """Low 64 bits as an unsigned residue.  Two's-complement masking
    makes `& MASK` correct even for negative INT128 inputs, and it is
    ~40x faster than `%` (an int128 division) in DuckDB."""
    return f"(({x}) & {_MASK64})"


def _m64p(x: str) -> str:
    return f"(({x}) & {_MASK64})"


def _mul64(a: str, b: str) -> str:
    """(a*b) mod 2^64 without overflowing INT128: split a into 32-bit
    halves (schoolbook).  a and b must be non-negative residues."""
    return (
        f"(((({a}) & {_MASK32}) * ({b})"
        f" + (((({a}) >> 32) * (({b}) & {_MASK32})) & {_MASK32})"
        f" * 4294967296) & {_MASK64})"
    )


def _rotl(x: str, n: int) -> str:
    return f"(((({x}) << {n}) & {_MASK64}) + (({x}) >> {64 - n}))"


def _xor(a: str, b: str) -> str:
    return f"xor({a}, {b})"


def _shr(x: str, n: int) -> str:
    return f"(({x}) >> {n})"


Chain = list[tuple[str, str]]  # [(alias, sql_expr)], each step may ref earlier aliases


def fmix_chain(prefix: str, h_ref: str) -> Chain:
    f1 = f"{prefix}_f1"
    f2 = f"{prefix}_f2"
    return [
        (f1, _mul64(_xor(h_ref, _shr(h_ref, 33)), str(P2))),
        (f2, _mul64(_xor(f1, _shr(f1, 29)), str(P3))),
        (prefix, _xor(f2, _shr(f2, 32))),
    ]


def _acc_sql(seed: int | str, length: int) -> str:
    if isinstance(seed, int):
        return str((seed + P5 + length) % M64)
    return _m64p(f"({seed}) + {P5 + length}")


def long_hash_chain(prefix: str, v_sql: str, seed: int | str = SPARK_SEED) -> Chain:
    """Spark XXH64.hashLong(v, seed) as a step chain; final alias =
    ``prefix`` (unsigned 64-bit residue in HUGEINT)."""
    u = f"{prefix}_u"
    k = f"{prefix}_k"
    h = f"{prefix}_h"
    acc = _acc_sql(seed, 8)
    return [
        (u, _m64(f"CAST({v_sql} AS HUGEINT)")),
        (k, _mul64(_rotl(_mul64(u, str(P2)), 31), str(P1))),
        (h, _m64p(f"{_mul64(_rotl(_xor(acc, k), 27), str(P1))} + {P4}")),
        *fmix_chain(prefix, h),
    ]


def int_hash_chain(prefix: str, v_sql: str, seed: int | str = SPARK_SEED) -> Chain:
    """Spark XXH64.hashInt(v, seed) as a step chain."""
    h = f"{prefix}_h"
    acc = _acc_sql(seed, 4)
    u32 = f"(CAST({v_sql} AS HUGEINT) & {_MASK32})"
    k1 = _mul64(u32, str(P1))
    return [
        (h, _m64p(f"{_mul64(_rotl(_xor(acc, k1), 23), str(P2))} + {P3}")),
        *fmix_chain(prefix, h),
    ]


def str_hash_chain(prefix: str, seed_ref: str, tag: str) -> Chain:
    """Spark hashUnsafeBytes for compile-time string ``tag`` (< 8 bytes)
    chained on the unsigned residue ``seed_ref``.  Byte/chunk constants
    fold at generation time."""
    b = tag.encode("utf-8")
    if len(b) >= 8:
        raise ValueError(f"tag {tag!r} >= 8 bytes; add the 8-byte word loop")
    steps: Chain = []
    cur = _acc_sql(seed_ref, len(b))
    rest = b
    if len(b) >= 4:
        c4 = int.from_bytes(b[:4], "little")
        kc = (c4 * P1) % M64
        alias = f"{prefix}_c"
        steps.append((alias, _m64p(f"{_mul64(_rotl(_xor(cur, str(kc)), 23), str(P2))} + {P3}")))
        cur = alias
        rest = b[4:]
    for j, byte in enumerate(rest):
        kb = (byte * P5) % M64
        alias = f"{prefix}_b{j}"
        steps.append((alias, _mul64(_rotl(_xor(cur, str(kb)), 11), str(P1))))
        cur = alias
    steps.extend(fmix_chain(prefix, cur))
    return steps


def signed_sql(u_ref: str) -> str:
    """Unsigned 64-bit residue -> Spark's signed BIGINT."""
    return (
        f"CAST(CASE WHEN ({u_ref}) >= {1 << 63} THEN ({u_ref}) - {M64}"
        f" ELSE ({u_ref}) END AS BIGINT)"
    )


def uniform_sql(u_ref: str) -> str:
    """clickstream._uniform on an already-computed unsigned hash
    residue: pmod(signed, 1e9+7) / (1e9+7)."""
    m = 1_000_000_007
    s = signed_sql(u_ref)
    return f"((({s}) % {m} + {m}) % {m}) / {float(m)!r}"


def blob_hash_chain(prefix: str, blob_sql: str, seed: int = SPARK_SEED) -> Chain:
    """Spark XXH64 over an ARBITRARY-LENGTH binary column (StringType
    hashing = XXH64 of the UTF-8 bytes) as a step chain.

    The full algorithm: 32-byte stripes into four accumulators (each an
    independent left fold over every-4th little-endian word, so plain
    ``list_reduce`` expresses it), merge rounds, the remaining 8-byte
    words, optional 4-byte chunk, byte tail, avalanche. Byte access is
    hex-pair extraction; all per-element arithmetic lives inside lambda
    variables, so expression size stays bounded no matter the input
    length. Parity pinned against F.xxhash64 in tests/test_xxh64_sql.py."""
    p = prefix
    hx, n = f"{p}_hx", f"{p}_n"

    def byte(j: str) -> str:
        return f"CAST(CAST('0x' || substr({hx}, 2*({j})+1, 2) AS BIGINT) AS HUGEINT)"

    def word(i: str) -> str:
        return "(" + " + ".join(f"({byte(f'8*({i})+{jj}')} << {8 * jj})" for jj in range(8)) + ")"

    def stripe_step(a: str, w: str) -> str:
        return _mul64(_rotl(_m64p(f"({a}) + {_mul64(w, str(P2))}"), 31), str(P1))

    def word_round(a: str, w: str) -> str:
        k1 = _mul64(_rotl(_mul64(w, str(P2)), 31), str(P1))
        return _m64p(f"{_mul64(_rotl(_xor(a, k1), 27), str(P1))} + {P4}")

    v_init = {
        1: (seed + P1 + P2) % M64,
        2: (seed + P2) % M64,
        3: seed % M64,
        4: (seed - P1) % M64,
    }
    steps: Chain = [
        (hx, f"hex({blob_sql})"),
        (n, f"octet_length({blob_sql})"),
    ]
    for N in (1, 2, 3, 4):
        stripe_words = (
            f"list_transform(generate_series(0, CAST({n} // 32 AS BIGINT) - 1),"
            f" k -> {word(f'4*k+{N - 1}')})"
        )
        steps.append(
            (
                f"{p}_v{N}",
                f"list_reduce(list_prepend(CAST({v_init[N]} AS HUGEINT), {stripe_words}),"
                f" (a, w) -> {stripe_step('a', 'w')})",
            )
        )
    merged = " + ".join(
        _rotl(f"{p}_v{N}", r) for N, r in ((1, 1), (2, 7), (3, 12), (4, 18))
    )
    steps.append((f"{p}_hm0", _m64p(merged)))
    cur = f"{p}_hm0"
    for N in (1, 2, 3, 4):
        k1 = _mul64(_rotl(_mul64(f"{p}_v{N}", str(P2)), 31), str(P1))
        nxt = f"{p}_hm{N}"
        steps.append((nxt, _m64p(f"{_mul64(_xor(cur, k1), str(P1))} + {P4}")))
        cur = nxt
    steps.append(
        (
            f"{p}_h0",
            f"((CASE WHEN {n} >= 32 THEN {cur} ELSE CAST({(seed + P5) % M64} AS HUGEINT) END"
            f" + {n}) & {_MASK64})",
        )
    )
    rem_words = (
        f"list_transform(generate_series(CAST({n} // 32 AS BIGINT) * 4,"
        f" CAST({n} // 8 AS BIGINT) - 1), i -> {word('i')})"
    )
    steps.append(
        (
            f"{p}_hw",
            f"list_reduce(list_prepend({p}_h0, {rem_words}), (a, w) -> {word_round('a', 'w')})",
        )
    )
    c4 = "(" + " + ".join(
        f"({byte(f'({n} // 8) * 8 + {jj}')} << {8 * jj})" for jj in range(4)
    ) + ")"
    chunk_step = _m64p(
        f"{_mul64(_rotl(_xor(f'{p}_hw', _mul64(c4, str(P1))), 23), str(P2))} + {P3}"
    )
    steps.append((f"{p}_hc", f"CASE WHEN {n} % 8 >= 4 THEN {chunk_step} ELSE {p}_hw END"))
    tail_start = f"(({n} // 8) * 8 + CASE WHEN {n} % 8 >= 4 THEN 4 ELSE 0 END)"
    tail_bytes = f"list_transform(generate_series({tail_start}, {n} - 1), j -> {byte('j')})"
    byte_step = _mul64(_rotl(_xor("a", _mul64("b", str(P5))), 11), str(P1))
    steps.append(
        (
            f"{p}_ht",
            f"list_reduce(list_prepend({p}_hc, {tail_bytes}), (a, b) -> {byte_step})",
        )
    )
    steps.extend(fmix_chain(p, f"{p}_ht"))
    return steps


def merge_chains(chains: list[Chain]) -> list[list[tuple[str, str]]]:
    """Zip independent chains into waves: wave i holds step i of every
    chain still running.  Steps only reference earlier aliases of their
    own chain, so one CTE stage per wave is dependency-safe."""
    n = max((len(c) for c in chains), default=0)
    return [[c[i] for c in chains if len(c) > i] for i in range(n)]


def cte_stages(first_name: str, base_sql: str, waves: list[list[tuple[str, str]]]) -> tuple[str, str]:
    """Render ``base_sql`` plus one chained CTE per wave.  Returns
    (cte_body_fragment, final_cte_name); the fragment is a comma-joined
    list of named CTEs starting with ``first_name``."""
    parts = [f"{first_name} AS ({base_sql})"]
    prev = first_name
    for i, wave in enumerate(waves):
        name = f"{first_name}_s{i}"
        cols = ", ".join(f"{expr} AS {alias}" for alias, expr in wave)
        parts.append(f"{name} AS (SELECT *, {cols} FROM {prev})")
        prev = name
    return ", ".join(parts), prev
