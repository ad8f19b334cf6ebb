"""FULL-SUITE sf0.1 -> sf1 scaling pass (VERDICT r6 task 4): run every
registered query once at a synthesized 10x of every table and compare
per-query and suite-total wall clock against the recorded sf0.1 bench.

Synthesis (FK-consistent 10-copy replication, extending
tools/bench_sf1.py's 3-table approach to the whole schema):

- region/nation are TPC-H fixed-cardinality dimensions: copied 1x
  (scale factor never grows them);
- customer/supplier/part/orders/lineitem/events get per-copy key
  shifts applied CONSISTENTLY across tables (o_custkey moves with
  c_custkey, l_orderkey with o_orderkey, events.user_id with
  c_custkey, ...) so every join keeps its selectivity and every copy
  is a disjoint, referentially-intact shard — what a real 10x tenant
  actually looks like;
- documents get a per-copy token suffix on EVERY token (no cross-copy
  shingles: replication must not inject synthetic near-dup cliques),
  EXCEPT copy 0 which keeps the original text verbatim so fixed-query
  lexical gates stay value-bearing at sf1;
- embeddings interleave ids and shift values by a per-copy constant
  (cluster structure replicates; seed sets span all modes — see
  bench_sf1.py for the k-means pathology this avoids).

Usage:
    python tools/bench_sf1_full.py [--keep] [--skip-build]

Prints one JSON line: per-query sf1 seconds, sf0.1 seconds (from
bench_full_r06.json), ratio, suite totals. Queries >3x at 10x data are
listed under "over3x" for SCALING.md adjudication.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import __spark_entry__ as entry_mod
from data_lake_for_e_commerce_analytics_spark.session import get_spark
from data_lake_for_e_commerce_analytics_spark.sources.tables import load_table

SF01 = "/root/testdata/sf0.1"
SF1 = "/tmp/sparkgraft_sf1_full"
COPIES = 10
_here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BASELINE_BENCH = os.path.join(_here, "bench_full_r07.json")
RESULT = os.path.join(_here, "bench_sf1_full_r09.json")
for _a in sys.argv[1:]:
    if _a.startswith("--baseline="):
        BASELINE_BENCH = os.path.join(_here, _a.split("=", 1)[1])
    elif _a.startswith("--out="):
        RESULT = os.path.join(_here, _a.split("=", 1)[1])

# per-copy key shifts, shared by every table referencing the key
CUST = 10_000_000
ORDER = 100_000_000
PART = 10_000_000
SUPP = 10_000_000
EVENT = 1_000_000_000


def _replicate(df, exprs_fn):
    out = None
    for i in range(COPIES):
        c = df.select(*exprs_fn(i))
        out = c if out is None else out.unionByName(c)
    return out


def build(spark) -> None:
    if os.path.isdir(SF1):
        shutil.rmtree(SF1)
    os.makedirs(SF1)

    for t in ("region", "nation"):
        load_table(spark, SF01, t).write.parquet(f"{SF1}/{t}.parquet")

    cust = load_table(spark, SF01, "customer")
    _replicate(
        cust,
        lambda i: [
            (F.col("c_custkey") + i * CUST).alias("c_custkey"),
            "c_name", "c_nationkey", "c_acctbal", "c_mktsegment",
        ],
    ).repartition(16).write.parquet(f"{SF1}/customer.parquet")

    supp = load_table(spark, SF01, "supplier")
    _replicate(
        supp,
        lambda i: [
            (F.col("s_suppkey") + i * SUPP).alias("s_suppkey"),
            "s_name", "s_nationkey", "s_acctbal",
        ],
    ).repartition(8).write.parquet(f"{SF1}/supplier.parquet")

    part = load_table(spark, SF01, "part")
    _replicate(
        part,
        lambda i: [
            (F.col("p_partkey") + i * PART).alias("p_partkey"),
            "p_name", "p_brand", "p_type", "p_size", "p_retailprice",
        ],
    ).repartition(16).write.parquet(f"{SF1}/part.parquet")

    orders = load_table(spark, SF01, "orders")
    _replicate(
        orders,
        lambda i: [
            (F.col("o_orderkey") + i * ORDER).alias("o_orderkey"),
            (F.col("o_custkey") + i * CUST).alias("o_custkey"),
            "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority",
        ],
    ).repartition(32).write.parquet(f"{SF1}/orders.parquet")

    li = load_table(spark, SF01, "lineitem")
    _replicate(
        li,
        lambda i: [
            (F.col("l_orderkey") + i * ORDER).alias("l_orderkey"),
            (F.col("l_partkey") + i * PART).alias("l_partkey"),
            (F.col("l_suppkey") + i * SUPP).alias("l_suppkey"),
            "l_linenumber", "l_quantity", "l_extendedprice", "l_discount",
            "l_tax", "l_returnflag", "l_linestatus", "l_shipdate",
        ],
    ).repartition(64).write.parquet(f"{SF1}/lineitem.parquet")

    ev = load_table(spark, SF01, "events")
    _replicate(
        ev,
        lambda i: [
            (F.col("event_id") + i * EVENT).alias("event_id"),
            "ts",
            (F.col("user_id") + i * CUST).alias("user_id"),
            "event_type", "value", "props",
        ],
    ).repartition(64).write.parquet(f"{SF1}/events.parquet")

    # NOTE: the per-copy constant must be CLOSED OVER via a factory —
    # a two-argument lambda handed to F.transform receives
    # (element, index) and the index COLUMN would silently override a
    # `_i=i` default argument.
    def _suffix_tokens(i: int):
        suf = f"x{i}"
        return lambda t: F.concat(t, F.lit(suf))

    # Copy 0 keeps the ORIGINAL text verbatim (no suffix): fixed-query
    # gates (bm25_topk, hybrid_search's lexical leg) stay value-bearing
    # at sf1 — the query's tokens still exist in the corpus — while
    # copies 1..9 suffix EVERY token so replication still injects zero
    # cross-copy shingles/near-dup cliques (suffixed tokens can never
    # collide with unsuffixed ones). Before this, the sf1 bm25 check
    # matched 0 docs (vacuous-but-consistent; VERDICT r10 task 6).
    def _copy_text(i: int):
        if i == 0:
            return F.col("text").alias("text")
        return F.array_join(
            F.transform(F.split(F.col("text"), r"\s+"), _suffix_tokens(i)),
            " ",
        ).alias("text")

    docs = load_table(spark, SF01, "documents")
    _replicate(
        docs,
        lambda i: [
            (F.col("doc_id") + i * 10_000_000).alias("doc_id"),
            _copy_text(i),
            "lang", "source", "n_chars",
        ],
    ).repartition(64).write.parquet(f"{SF1}/documents.parquet")

    # Embeddings replicate under a per-copy SIGNED PERMUTATION of the
    # dimensions — an orthogonal transform, so every copy's INTERNAL
    # geometry (cosines, cluster structure, near-dup pairs) is exactly
    # the base corpus's, while cross-copy directions scramble. The
    # first attempt (shift every dim by a per-copy constant) collapsed
    # all of copy i>=3 toward the all-ones direction: 100% of those
    # copies became mutual near-dups at cos>=0.99, handing the
    # near-dup/semdedup family a quadratic synthetic clique — a
    # measurement artifact, not a workload. Copy 0 stays identity.
    emb = load_table(spark, SF01, "embeddings")
    dim = len(emb.select("embedding").head()[0])

    def _signed_perm_expr(i: int):
        if i == 0:
            return F.col("embedding")
        import random

        rng = random.Random(1000 + i)
        perm = list(range(dim))
        rng.shuffle(perm)
        e = F.col("embedding")
        return F.array(
            *[
                (e[perm[d]] * F.lit(rng.choice((1.0, -1.0)))).cast("float")
                for d in range(dim)
            ]
        )

    _replicate(
        emb,
        lambda i: [
            (F.col("vec_id") * COPIES + i).alias("vec_id"),
            _signed_perm_expr(i).alias("embedding"),
            "label",
        ],
    ).repartition(32).write.parquet(f"{SF1}/embeddings.parquet")


def main() -> None:
    spark = get_spark(app_name="bench_sf1_full")
    spark.sparkContext.setLogLevel("ERROR")
    if "--skip-build" not in sys.argv:
        t0 = time.perf_counter()
        build(spark)
        print(f"build: {time.perf_counter() - t0:.0f}s", file=sys.stderr)

    base = json.load(open(BASELINE_BENCH))["queries"]
    queries = entry_mod.queries()

    # warmup at the smallest sf (JIT/codegen)
    for fn in queries.values():
        try:
            fn(spark, "/root/testdata/sf0.001").collect()
        except Exception:
            pass

    # one-time shared silver-zone materializations at SF1, outside the
    # per-query timing — SYMMETRIC with bench.py's sf0.1 prewarm
    # (without this the sf1 side pays the cache builds inside whichever
    # consumer runs first while the sf0.1 denominators are cache-hit
    # times, inflating those queries' ratios ~10-100x; r9 observed
    # ngram_jaccard_pairs at a meaningless "112x")
    shared_build: dict[str, float] = {}
    try:
        shared_build = entry_mod.prewarm_shared(spark, SF1)
        print(f"prewarm(sf1): {shared_build}", file=sys.stderr)
    except Exception as e:
        print(f"prewarm failed: {e}", file=sys.stderr)

    per: dict[str, dict] = {}
    for name, fn in queries.items():
        t0 = time.perf_counter()
        try:
            fn(spark, SF1).collect()
            dt = round(time.perf_counter() - t0, 2)
        except Exception as e:
            print(f"FAIL {name}: {e}", file=sys.stderr)
            per[name] = {"sf1_s": -1.0}
            continue
        # per-query ambient load so a co-tenant ramp is attributable
        # (VERDICT r7 bench-hygiene note)
        rec = {"sf1_s": dt, "load1": round(os.getloadavg()[0], 2)}
        if name in base and base[name] > 0:
            rec["sf0.1_s"] = base[name]
            rec["ratio"] = round(dt / base[name], 1)
        per[name] = rec
        print(f"{name}: {rec}", file=sys.stderr)

    ok = {k: v for k, v in per.items() if v["sf1_s"] >= 0}
    total1 = round(sum(v["sf1_s"] for v in ok.values()), 1)
    total01 = round(sum(v.get("sf0.1_s", 0) for v in ok.values()), 1)
    over3x = {
        k: v["ratio"]
        for k, v in ok.items()
        if v.get("ratio", 0) > 3.0
    }
    out = {
        "sf1_total_s": total1,
        "sf0.1_total_s": total01,
        "suite_ratio": round(total1 / total01, 2) if total01 else None,
        "n_queries": len(ok),
        "n_failed": len(per) - len(ok),
        "over3x": dict(sorted(over3x.items(), key=lambda kv: -kv[1])),
        "top10_sf1": dict(
            sorted(((k, v["sf1_s"]) for k, v in ok.items()),
                   key=lambda kv: -kv[1])[:10]
        ),
        "queries": per,
        "shared_build_s": {k: round(v, 2) for k, v in shared_build.items()},
        "shared_build_total_s": round(sum(shared_build.values()), 2),
    }
    print(json.dumps(out))
    with open(RESULT, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    if "--keep" not in sys.argv:
        shutil.rmtree(SF1, ignore_errors=True)


if __name__ == "__main__":
    main()
