"""Property-based tests (hypothesis): algebraic invariants the operators
must satisfy for ANY input, not just the driver fixtures — dedup
idempotence, merge last-writer-wins vs a reference dict, similarity
bounds, histogram totals."""

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from data_lake_for_e_commerce_analytics_spark.operators import dedup, upsert
from data_lake_for_e_commerce_analytics_spark.session import get_spark

SETTINGS = dict(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

texts = st.lists(
    st.text(alphabet="ab cd", min_size=1, max_size=30), min_size=1, max_size=12
)


def _spark():
    return get_spark(app_name="props", shuffle_partitions=4)


@given(texts)
@settings(**SETTINGS)
def test_exact_dedup_idempotent(docs):
    spark = _spark()
    df = spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(docs)],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    once = dedup.exact_dedup_keep_first(df)
    twice = dedup.exact_dedup_keep_first(once)
    a = sorted(r["doc_id"] for r in once.collect())
    b = sorted(r["doc_id"] for r in twice.collect())
    assert a == b
    # group count equals number of distinct normalized texts
    norm = {" ".join(t.strip().lower().split()) for t in docs}
    assert len(a) == len(norm)


merge_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),   # key
        st.integers(min_value=0, max_value=9),   # version
        st.text(alphabet="xyz", min_size=1, max_size=3),
    ),
    min_size=1,
    max_size=20,
)


@given(merge_rows, merge_rows)
@settings(**SETTINGS)
def test_merge_keep_latest_is_last_writer_wins(base_rows, delta_rows):
    spark = _spark()
    base = spark.createDataFrame(
        [(k, v, s) for k, v, s in base_rows], ["k", "version", "payload"]
    )
    delta = spark.createDataFrame(
        [(k, v, s) for k, v, s in delta_rows], ["k", "version", "payload"]
    )
    got = {
        r["k"]: r["version"]
        for r in upsert.merge_keep_latest(base, delta, ["k"], "version").collect()
    }
    # reference: highest version per key across both sides
    expect: dict[int, int] = {}
    for k, v, _ in base_rows + delta_rows:
        expect[k] = max(expect.get(k, -1), v)
    assert got == expect


@given(
    st.lists(
        st.lists(
            st.floats(min_value=-1.0, max_value=1.0, allow_nan=False, width=32),
            min_size=4,
            max_size=4,
        ),
        min_size=2,
        max_size=8,
    )
)
@settings(**SETTINGS)
def test_embedding_cosine_bounds(vecs):
    spark = _spark()
    df = spark.createDataFrame(
        [(i, [float(x) for x in v], 0) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>, label int",
    )
    pairs = dedup.embedding_near_dup_pairs(df, threshold=-1.1).collect()
    n = len(vecs)
    zero_norm = sum(1 for v in vecs if all(x == 0.0 for x in v))
    nonzero = n - zero_norm
    # all nonzero-norm pairs emitted, every cosine in [-1, 1] (+rounding)
    assert len(pairs) == nonzero * (nonzero - 1) // 2
    for r in pairs:
        assert r["cosine"] is not None and -1.0001 <= r["cosine"] <= 1.0001


@given(
    st.lists(st.integers(min_value=0, max_value=10_000), min_size=2, max_size=30,
             unique=True),
    st.integers(min_value=0, max_value=99),
    st.integers(min_value=1, max_value=7),
)
@settings(**SETTINGS)
def test_epoch_shuffle_matches_python_reference(ids, epoch, shard_size):
    """The distributed rank must equal a pure-Python sort by the same
    xxhash64 permutation key — for ANY key set, epoch, and shard size."""
    from data_lake_for_e_commerce_analytics_spark.functions.xxh64_py import (
        spark_xxhash64,
    )
    from data_lake_for_e_commerce_analytics_spark.operators import sampling

    spark = _spark()
    df = spark.createDataFrame([(i,) for i in ids], ["doc_id"])
    got = {
        r["doc_id"]: (r["shard_id"], r["pos_in_shard"])
        for r in sampling.epoch_shuffle(
            df, epoch=epoch, shard_size=shard_size
        ).collect()
    }
    order = sorted(ids, key=lambda i: (spark_xxhash64(("long", i), f"ep{epoch}"), i))
    expected = {
        doc: (idx // shard_size, idx % shard_size)
        for idx, doc in enumerate(order)
    }
    assert got == expected


@given(
    st.lists(
        st.tuples(st.integers(min_value=0, max_value=1 << 40),
                  st.integers(min_value=0, max_value=1 << 40)),
        min_size=2, max_size=25,
    )
)
@settings(**SETTINGS)
def test_zorder_matches_python_reference(pairs):
    """Bucketization + Morton interleave vs a pure-Python reference."""
    from data_lake_for_e_commerce_analytics_spark.sources import zorder

    spark = _spark()
    df = spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(pairs)], ["k", "c1", "c2"]
    )
    got = {r["k"]: (r["zb1"], r["zb2"], r["zval"])
           for r in zorder.zorder_keys(df, "c1", "c2", bits=16).collect()}
    a_min, a_max = min(a for a, _ in pairs), max(a for a, _ in pairs)
    b_min, b_max = min(b for _, b in pairs), max(b for _, b in pairs)
    for i, (a, b) in enumerate(pairs):
        zb1 = (a - a_min) * 65535 // max(a_max - a_min, 1)
        zb2 = (b - b_min) * 65535 // max(b_max - b_min, 1)
        z = 0
        for bit in range(16):
            z |= ((zb1 >> bit) & 1) << (2 * bit + 1)
            z |= ((zb2 >> bit) & 1) << (2 * bit)
        assert got[i] == (zb1, zb2, z)


# --- URL canonicalization properties ---------------------------------------

_hosts = st.sampled_from(["Example.com", "WWW.Shop.example.COM", "a-b.org"])
_schemes = st.sampled_from(["http", "https", "HTTP", "HTTPS"])
_ports = st.sampled_from(["", ":80", ":443", ":8080"])
_paths = st.lists(
    st.text(alphabet="abcXYZ09", min_size=1, max_size=5), min_size=0, max_size=3
)
_params = st.lists(
    st.sampled_from(
        ["page=1", "sort=price", "q=a+b", "utm_source=x", "fbclid=z", "ref=h", "gclid=2"]
    ),
    min_size=0,
    max_size=5,
)
_frags = st.sampled_from(["", "#top", "#s1"])
_urls = st.builds(
    lambda sch, h, po, pa, ps, fr: (
        f"{sch}://{h}{po}/" + "/".join(pa) + (("?" + "&".join(ps)) if ps else "") + fr
    ),
    _schemes, _hosts, _ports, _paths, _params, _frags,
)


@given(st.lists(_urls, min_size=1, max_size=8))
@settings(**SETTINGS)
def test_url_canonicalize_idempotent(url_list):
    """canonicalize(canonicalize(u)) == canonicalize(u) for any URL the
    grammar produces — a canonical form must be a fixed point."""
    from data_lake_for_e_commerce_analytics_spark.operators import urls as U

    spark = _spark()
    df = spark.createDataFrame([(u,) for u in url_list], "url string")
    c1 = df.select(U.canonicalize_url("url").alias("url"))
    once = [r["url"] for r in c1.collect()]
    twice = [
        r["url"] for r in c1.select(U.canonicalize_url("url").alias("url")).collect()
    ]
    assert once == twice


@given(_schemes, _ports, st.lists(st.sampled_from(["page=1", "sort=price", "q=x"]),
                                  min_size=0, max_size=3, unique=True))
@settings(**SETTINGS)
def test_url_canonicalize_invariant_under_messification(sch, po, params):
    """The canonical form must not depend on scheme case, www prefix,
    host case, default ports, param order, appended tracking params, a
    fragment, or a trailing slash."""
    import random

    from data_lake_for_e_commerce_analytics_spark.operators import urls as U

    rnd = random.Random(42)
    base = f"{sch.lower()}://example.com{po}/a/b" + (
        ("?" + "&".join(sorted(params))) if params else ""
    )
    default = (sch.lower() == "http" and po == ":80") or (
        sch.lower() == "https" and po == ":443"
    )
    shuffled = list(params)
    rnd.shuffle(shuffled)
    messy = (
        f"{sch}://WWW.Example.COM{po}/a/b/"
        + "?"
        + "&".join(shuffled + ["utm_source=t", "fbclid=q"])
        + "#frag"
    )
    spark = _spark()
    df = spark.createDataFrame([(base,), (messy,)], "url string")
    got = [r["u"] for r in df.select(U.canonicalize_url("url").alias("u")).collect()]
    assert got[0] == got[1]
    # and the canonical form strips default ports / keeps explicit
    # non-default ones (:443 on http IS non-default and survives)
    assert (":" in got[0].split("//")[1].split("/")[0]) == (po != "" and not default)


# --- SCD2 history properties ------------------------------------------------

_changes = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),          # key
        st.sampled_from(["A", "B", "C"]),               # attr
        st.integers(min_value=1, max_value=9),          # day
    ),
    min_size=1,
    max_size=12,
)


@given(_changes)
@settings(**SETTINGS)
def test_scd2_history_invariants(rows):
    """For ANY change log: per key exactly one current version, version
    numbers contiguous from 1, valid intervals chain gaplessly
    (valid_to == next valid_from), no zero-length versions, and no two
    CONSECUTIVE versions carry the same attribute value."""
    from data_lake_for_e_commerce_analytics_spark.operators import upsert

    spark = _spark()
    log = spark.createDataFrame(
        [(k, a, f"2024-01-0{d}", i) for i, (k, a, d) in enumerate(rows)],
        "k long, attr string, ts string, seq long",
    )
    hist = upsert.scd2_history(log, ["k"], ["attr"], "ts", "seq").collect()
    by_key = {}
    for r in hist:
        by_key.setdefault(r["k"], []).append(r)
    for k, vs in by_key.items():
        vs.sort(key=lambda r: r["version"])
        assert [r["version"] for r in vs] == list(range(1, len(vs) + 1))
        assert sum(r["is_current"] for r in vs) == 1
        assert vs[-1]["is_current"] == 1 and vs[-1]["valid_to"] is None
        for a, b in zip(vs, vs[1:]):
            assert a["valid_to"] == b["valid_from"]
            assert a["attr"] != b["attr"]  # collapse happened


# --- PageRank properties ----------------------------------------------------

_edges = st.lists(
    st.tuples(st.sampled_from("abcd"), st.sampled_from("abcd")),
    min_size=1,
    max_size=10,
)


@given(_edges)
@settings(**SETTINGS)
def test_pagerank_bounds_and_python_parity(edges):
    """For ANY small graph: the Spark ranks equal a pure-Python integer
    replay exactly, every rank >= the damping floor, and total mass
    never exceeds the initial n * scale (dangling mass only leaks)."""
    from data_lake_for_e_commerce_analytics_spark.operators import graph

    spark = _spark()
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r["node"]: r["pr"] for r in graph.pagerank(df, iters=2).collect()}
    # pure-Python replay
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    outdeg = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    pr = {n: 1_000_000 for n in nodes}
    for _ in range(2):
        acc = {n: 0 for n in nodes}
        for u, v in edges:
            acc[v] += pr[u] // outdeg[u]
        pr = {n: 150_000 + (85 * acc[n]) // 100 for n in nodes}
    assert got == pr
    assert all(v >= 150_000 for v in got.values())
    assert sum(got.values()) <= len(nodes) * 1_000_000


# --- MLM masking properties --------------------------------------------------

_mask_texts = st.lists(
    st.text(alphabet="ab cd", min_size=1, max_size=40).filter(str.strip),
    min_size=1,
    max_size=8,
)


@given(_mask_texts, st.integers(min_value=0, max_value=100))
@settings(**SETTINGS)
def test_mask_tokens_matches_python_reference(docs, rate):
    """For ANY corpus and rate: every mask decision equals the
    pure-Python xxh64 replay of pmod(xxhash64(doc_id, pos, 'mask'), 100)
    < rate, and counts are consistent."""
    from data_lake_for_e_commerce_analytics_spark.functions.xxh64_py import (
        spark_xxhash64,
    )
    from data_lake_for_e_commerce_analytics_spark.operators import text as T

    spark = _spark()
    df = spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(docs)],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    got = {r["doc_id"]: r for r in T.mask_tokens(df, rate_pct=rate).collect()}
    for i, t in enumerate(docs):
        toks = t.strip().split()
        want = [
            "[MASK]"
            if (spark_xxhash64(("long", i), ("long", p), "mask") % 100 + 100)
            % 100
            < rate
            else tok
            for p, tok in enumerate(toks)
        ]
        r = got[i]
        assert r["masked_text"] == " ".join(want)
        assert r["n_masked"] == sum(1 for w in want if w == "[MASK]")
        assert r["n_tokens"] == len(toks)


@given(
    st.lists(
        st.lists(
            st.floats(min_value=-1.0, max_value=1.0, allow_nan=False, width=32),
            min_size=4,
            max_size=4,
        ),
        min_size=2,
        max_size=8,
    )
)
@settings(**SETTINGS)
def test_embedding_exact_matches_bigint_reference(vecs):
    """The exact quantized near-dup contract replayed in pure Python
    big-ints: floor-quantize, integer dot/norms, squared threshold
    compare — the Spark kernel (numpy int64 matmul + float prescreen +
    big-int ambiguity resolve) must agree pair-for-pair."""
    import math

    spark = _spark()
    df = spark.createDataFrame(
        [(i, [float(x) for x in v], 0) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>, label int",
    )
    got = {
        (r["vec_a"], r["vec_b"])
        for r in dedup.embedding_near_dup_pairs_exact(df, tau_bp=3500).collect()
    }
    # reference: recompute from the float32-rounded values the table holds
    import numpy as np

    qs = [
        [int(math.floor(float(np.float32(x)) * 1_000_000)) for x in v] for v in vecs
    ]
    want = set()
    for a in range(len(qs)):
        for b in range(a + 1, len(qs)):
            dot = sum(x * y for x, y in zip(qs[a], qs[b]))
            n2a = sum(x * x for x in qs[a])
            n2b = sum(y * y for y in qs[b])
            if n2a > 0 and n2b > 0 and dot >= 0 and dot * dot * 10**8 >= 3500**2 * n2a * n2b:
                want.add((a, b))
    assert got == want


@given(
    st.lists(
        st.tuples(
            st.floats(min_value=0.01, max_value=99999.99, allow_nan=False),
            st.floats(min_value=0.0, max_value=0.99, allow_nan=False),
        ),
        min_size=1,
        max_size=40,
    ),
    st.randoms(use_true_random=False),
)
@settings(**SETTINGS)
def test_money_volume_sum_is_order_independent(rows, rng):
    """The engine-exact money contract: the decimal(18,4) revenue sum
    must be bit-identical under any row order / partitioning (float
    sums are not — that is why _money_volume exists)."""
    from decimal import Decimal

    from data_lake_for_e_commerce_analytics_spark.operators.analytics import (
        _money_volume,
    )

    spark = _spark()
    # 2-decimal money values, like the fixture tables
    rows = [(round(p, 2), round(d, 2)) for p, d in rows]
    shuffled = rows[:]
    rng.shuffle(shuffled)

    def total(data, parts):
        df = spark.createDataFrame(
            data, "l_extendedprice double, l_discount double"
        ).repartition(parts)
        return df.agg(F.sum(_money_volume()).alias("s")).collect()[0]["s"]

    a = total(rows, 1)
    b = total(shuffled, 5)
    assert a == b
    # and it equals the exact Decimal reference
    want = sum(
        Decimal(str(p)).quantize(Decimal("0.0001"))
        * (1 - Decimal(str(d)).quantize(Decimal("0.0001")))
        for p, d in rows
    )
    assert a == want
