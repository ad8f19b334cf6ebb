"""Blocked embedding near-dup at its PRODUCTION design point
(VERDICT r8 task 7).

The registered gate `embedding_near_dup_blocked` pins
``max_block_rows=16`` deliberately: at 16 every label routes through the
hash-derived sub-block pairing, so the oracle exercises the pairing
dataflow itself. The price is by-construction quadratic group growth at
10x (measured 12.3x in r8). This harness measures the SAME operator at a
realistic bound (2,000 rows at this scale — a bound sized to worker
memory, as production would) next to the gate bound and the un-blocked
operator, at sf0.1 and the synthesized 10x corpus:

- production bound: labels below the bound keep the single-group fast
  path, so the 10x ratio should sit in the plain operator's family
  (~4-6x, overhead-dominated) — NOT the gate's 12.3x;
- dominant-label corpus (every row one label, the hot-label case the
  bound exists for): blocked at 2,000 completes with bounded per-task
  memory where the plain path would materialize one n x n Gram block
  (3.2 GB of int64 at 20k rows) in a single Python worker.

Usage: python tools/bench_blocked_neardup.py [sf1_dir] [out_json]
Writes bench_blocked_neardup_r09.json and prints a SCALING.md row.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from data_lake_for_e_commerce_analytics_spark.operators import dedup
from data_lake_for_e_commerce_analytics_spark.session import get_spark
from data_lake_for_e_commerce_analytics_spark.sources.tables import load_table

SF01 = "/root/testdata/sf0.1"
SF1 = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sparkgraft_sf1_full"
THRESHOLD = 0.35


def corpus(spark, sf_dir):
    p = os.path.join(sf_dir, "embeddings.parquet")
    if os.path.isdir(sf_dir) and os.path.exists(p):
        return spark.read.parquet(p)
    return load_table(spark, sf_dir, "embeddings")


def timed_count(df) -> tuple[float, int]:
    t0 = time.perf_counter()
    n = df.count()
    return round(time.perf_counter() - t0, 2), n


def main() -> None:
    spark = get_spark(app_name="bench_blocked_neardup")
    spark.sparkContext.setLogLevel("ERROR")
    res: dict = {"threshold": THRESHOLD}
    for tag, sf_dir in (("sf0.1", SF01), ("sf1", SF1)):
        emb = corpus(spark, sf_dir).cache()
        n = emb.count()
        row = {"n_vectors": n}
        # warmup (codegen/JIT) on the plain path
        dedup.embedding_near_dup_pairs(emb, threshold=THRESHOLD).count()
        row["plain_s"], row["pairs"] = timed_count(
            dedup.embedding_near_dup_pairs(emb, threshold=THRESHOLD)
        )
        row["blocked_gate16_s"], _ = timed_count(
            dedup.embedding_near_dup_pairs_auto(
                emb, threshold=THRESHOLD, max_block_rows=16
            )
        )
        row["blocked_prod2000_s"], prod_pairs = timed_count(
            dedup.embedding_near_dup_pairs_auto(
                emb, threshold=THRESHOLD, max_block_rows=2000
            )
        )
        assert prod_pairs == row["pairs"], (
            f"{tag}: blocked-at-2000 pair count {prod_pairs} != plain "
            f"{row['pairs']}"
        )
        # the hot-label case: one dominant label, bound keeps workers
        # at <= 2 x 2000 rows each
        dom = emb.withColumn("label", F.lit("hot"))
        row["dominant_blocked2000_s"], row["dominant_pairs"] = timed_count(
            dedup.embedding_near_dup_pairs_auto(
                dom, threshold=THRESHOLD, max_block_rows=2000
            )
        )
        emb.unpersist()
        res[tag] = row
    for key in ("plain_s", "blocked_gate16_s", "blocked_prod2000_s",
                "dominant_blocked2000_s"):
        res[f"ratio_{key}"] = round(res["sf1"][key] / max(res["sf0.1"][key], 0.01), 2)

    out = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "bench_blocked_neardup_r09.json",
        )
    )
    with open(out, "w") as f:
        json.dump(res, f, indent=1, sort_keys=True)
    print(json.dumps(res))
    print(
        f"\nSCALING.md row: blocked near-dup at production bound 2000: "
        f"{res['sf0.1']['blocked_prod2000_s']}s -> "
        f"{res['sf1']['blocked_prod2000_s']}s "
        f"({res['ratio_blocked_prod2000_s']}x at 10x) vs gate bound 16: "
        f"{res['ratio_blocked_gate16_s']}x, plain: {res['ratio_plain_s']}x"
    )


if __name__ == "__main__":
    main()
