"""sf0.1 -> sf1 scaling pass for the superlinear-risk families
(VERDICT r5 task 6): basket_pairs, source_overlap, simhash_pairs,
semdedup (k = n/250), curate_web_corpus.

The driver ships no sf1 testdata, so this synthesizes a 10x corpus from
sf0.1 the way SCALING.md's crossover tables already do: 10 copies with
shifted keys. Document text gets a per-copy TOKEN suffix (every token,
not just an appended tail) so copies share no shingles — otherwise the
synthesis itself would inject a 10-way near-dup clique per document and
the pair counts would blow up quadratically as an artifact of the
replication, not of the operator. Within-copy duplicate structure is
preserved verbatim, so true dup rates stay constant across scales —
the property a real 10x crawl has. Embeddings shift by a per-copy
constant (cluster structure replicates; no cross-copy collisions).

Usage: python tools/bench_sf1.py [--keep]   (prints one JSON line)
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
from data_lake_for_e_commerce_analytics_spark.operators import semdedup as sd
from data_lake_for_e_commerce_analytics_spark.session import get_spark
from data_lake_for_e_commerce_analytics_spark.sources.tables import load_table

SF01 = "/root/testdata/sf0.1"
SF1 = "/tmp/sparkgraft_sf1"
COPIES = 10

QUERIES = ["basket_pairs", "source_overlap", "simhash_pairs", "curate_web_corpus"]


def build_sf1(spark) -> None:
    if os.path.isdir(SF1):
        shutil.rmtree(SF1)
    os.makedirs(SF1)

    docs = load_table(spark, SF01, "documents")
    scaled = None
    for i in range(COPIES):
        c = docs.select(
            (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
            F.array_join(
                F.transform(
                    F.split(F.col("text"), r"\s+"),
                    lambda t: F.concat(t, F.lit(f"x{i}")),
                ),
                " ",
            ).alias("text"),
            "lang",
            "source",
            "n_chars",
        )
        scaled = c if scaled is None else scaled.unionByName(c)
    scaled.repartition(64).write.parquet(f"{SF1}/documents.parquet")

    emb = load_table(spark, SF01, "embeddings")
    scaled = None
    for i in range(COPIES):
        # INTERLEAVED ids (old*COPIES + i), not id blocks: the k-means
        # gates seed centroids from the first k vec_ids, and id-blocked
        # copies would put every seed inside copy 0 — the other copies
        # then collapse into one giant cluster and the within-cluster
        # pair join goes quadratic as a synthesis artifact (observed:
        # a 15-minute single-task stage). Interleaving keeps the seed
        # set spanning all modes, which is what real id assignment
        # looks like. The id-order sensitivity itself is documented on
        # the operator (init='scatter' decorrelates).
        c = emb.select(
            (F.col("vec_id") * COPIES + F.lit(i)).alias("vec_id"),
            F.transform(
                F.col("embedding"), lambda x: x + F.lit(float(i) * 0.37)
            ).alias("embedding"),
            "label",
        )
        scaled = c if scaled is None else scaled.unionByName(c)
    scaled.repartition(32).write.parquet(f"{SF1}/embeddings.parquet")

    li = load_table(spark, SF01, "lineitem")
    scaled = None
    for i in range(COPIES):
        c = li.withColumn(
            "l_orderkey", F.col("l_orderkey") + F.lit(i * 100_000_000)
        )
        scaled = c if scaled is None else scaled.unionByName(c)
    scaled.repartition(64).write.parquet(f"{SF1}/lineitem.parquet")


def time_query(fn, *args) -> float:
    t0 = time.perf_counter()
    fn(*args).collect()
    return round(time.perf_counter() - t0, 2)


def main() -> None:
    spark = get_spark(app_name="bench_sf1")
    spark.sparkContext.setLogLevel("ERROR")
    build_sf1(spark)

    queries = entry_mod.queries()
    out: dict[str, dict] = {}
    for name in QUERIES:
        fn = queries[name]
        fn(spark, SF01).collect()  # warm
        t_small = time_query(fn, spark, SF01)
        t_big = time_query(fn, spark, SF1)
        out[name] = {
            "sf0.1_s": t_small,
            "sf1_s": t_big,
            "ratio": round(t_big / t_small, 1),
        }
        print(f"{name}: {out[name]}", file=sys.stderr)

    # semdedup measured at the documented scale law k = n/250
    for tag, sf_dir in (("sf0.1", SF01), ("sf1", SF1)):
        emb = load_table(spark, sf_dir, "embeddings")
        n = emb.count()
        k = max(2, n // 250)
        t0 = time.perf_counter()
        sd.semdedup(emb, k=k, iters=2, tau_bp=35).collect()
        dt = round(time.perf_counter() - t0, 2)
        out.setdefault("semdedup_k_n250", {})[f"{tag}_s"] = dt
        out["semdedup_k_n250"][f"{tag}_k"] = k
        print(f"semdedup {tag}: k={k} {dt}s", file=sys.stderr)
    s = out["semdedup_k_n250"]
    s["ratio"] = round(s["sf1_s"] / s["sf0.1_s"], 1)

    print(json.dumps(out))
    if "--keep" not in sys.argv:
        shutil.rmtree(SF1, ignore_errors=True)


if __name__ == "__main__":
    main()
