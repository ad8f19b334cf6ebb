"""Measure how SemDeDup's cluster-bounded pair join scales against the
flat LSH-bucketed embedding near-dup as the corpus grows, and how the
paper's k-grows-with-n rule controls the quadratic term.

The scaled corpus is synthesized honestly: extra vectors are generated
by perturbing real sf0.1 embeddings with small deterministic
xxhash64-derived offsets (preserves the cluster structure and the
near-dup density that drives both candidate generators), never by raw
replication (which would make every vector an exact dup) or random
vectors (which would have no near-dup structure at all).

Usage: python tools/bench_semdedup_scale.py [scale ...]
  scale = multiplier over the sf0.1 vector count (default: 1 4 10)

Prints one line per (scale, variant, k) with wall-clock seconds and
pair counts; paste the table into SCALING.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from data_lake_for_e_commerce_analytics_spark.operators import dedup, semdedup
from data_lake_for_e_commerce_analytics_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def scaled_embeddings(spark, mult: int):
    base = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    n = base.count()
    if mult == 1:
        return base, n
    copies = [base]
    for c in range(1, mult):
        jitter = F.transform(
            "embedding",
            lambda x, i: x
            + (
                F.pmod(F.xxhash64(F.col("vec_id"), F.lit(f"j{c}"), i), F.lit(200))
                - 100
            ).cast("float")
            / 5000.0,
        )
        copies.append(
            base.select(
                (F.col("vec_id") + c * n).alias("vec_id"),
                jitter.alias("embedding"),
                "label",
            )
        )
    out = copies[0]
    for o in copies[1:]:
        out = out.unionByName(o)
    return out, n * mult


def main() -> None:
    mults = [int(a) for a in sys.argv[1:]] or [1, 4, 10]
    spark = get_spark(app_name="semdedup-scale", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    print(f"{'scale':>5} {'n_vec':>7} {'variant':>22} {'sec':>7} {'pairs':>8}")
    for m in mults:
        emb, n = scaled_embeddings(spark, m)
        emb = emb.localCheckpoint(eager=True)
        # k grows with n (the SemDeDup deployment rule): n/250 per cluster.
        k_scaled = max(8, n // 250)
        for label, fn in (
            ("semdedup k=8 (fixed)", lambda e: semdedup.semdedup_pairs(e, k=8, tau_bp=85)),
            (
                f"semdedup k={k_scaled} (n/250)",
                lambda e: semdedup.semdedup_pairs(e, k=k_scaled, tau_bp=85),
            ),
            (
                "lsh near-dup t=0.85",
                lambda e: dedup.embedding_near_dup_pairs(e, threshold=0.85),
            ),
        ):
            t0 = time.time()
            pairs = fn(emb).count()
            print(f"{m:>5} {n:>7} {label:>22} {time.time() - t0:>7.2f} {pairs:>8}")


if __name__ == "__main__":
    main()
