"""Quantized-reranker recall at sf1: does SQ8 / PQ ranking fidelity
survive 10x the corpus?

Completes the round-8 ANN scale evidence (SCALING.md: IVF/LSH
recall/probe curves) for the other index tier this engine ships — the
quantized FULL-SCAN rerankers (`similarity.sq8_knn`, `similarity.pq_knn`).
These never prune candidates, so their failure mode at scale is not
missed cells but RANKING drift: quantization error reordering the
top-k. Recall@10 here is |operator top-10 ∩ exact-L2 top-10| / 10
(both ops rank by squared euclidean — the exact baseline matches their
metric, not cosine).

The operators run as-is (the real Spark jobs, bit-exact integer
distance contracts); only the exact ground truth is computed
driver-side over the collected corpus.

Usage:
    python tools/quant_recall_sf1.py [sf1_dir] [out_json]

Writes quant_recall_sf1_r08.json with recall at sf0.1 and sf1 plus a
markdown row pair for SCALING.md.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_lake_for_e_commerce_analytics_spark.operators import similarity
from data_lake_for_e_commerce_analytics_spark.session import get_spark
from data_lake_for_e_commerce_analytics_spark.sources.tables import load_table

SF01 = "/root/testdata/sf0.1"
SF1 = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sparkgraft_sf1_full"
K = 10
N_QUERIES = 16


def corpus(spark, sf_dir):
    if os.path.isdir(sf_dir) and os.path.exists(
        os.path.join(sf_dir, "embeddings.parquet")
    ):
        return spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return load_table(spark, sf_dir, "embeddings")


def measure(spark, emb) -> dict:
    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([int(r["vec_id"]) for r in rows])
    V = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in rows])
    pos = {int(i): p for p, i in enumerate(ids)}
    # deterministic query sample: hash-ranked ids, like ann_recall_sf1
    order = np.argsort([hash((int(i), 7)) for i in ids])
    q_ids = [int(ids[i]) for i in order[:N_QUERIES]]

    def exact_top(qid: int) -> set:
        d = ((V - V[pos[qid]]) ** 2).sum(axis=1)
        d[pos[qid]] = np.inf
        return set(int(x) for x in ids[np.argpartition(d, K)[:K]])

    spark = emb.sparkSession
    cb = similarity.pq_train_codebooks(emb)
    out = {}
    for name, fn in (
        ("sq8", lambda q: similarity.sq8_knn(emb, query_vec_id=q, k=K)),
        ("pq", lambda q: similarity.pq_knn(emb, query_vec_id=q, k=K)),
        (
            "pq_trained",
            lambda q: similarity.pq_knn(emb, query_vec_id=q, k=K, codebook=cb),
        ),
        (
            # the deployed two-tier shape: IVF prune (64 cells, probe 8
            # = ~12.5% scan) + SQ8 integer ranking; ground truth is the
            # same exact-L2 the SQ8 contract targets
            "ivf_sq8",
            lambda q: similarity.ivf_sq8_knn(
                spark, emb, query_vec_id=q, k=K, n_cells=64, n_probe=8
            ),
        ),
        (
            # VERDICT r8 task 2: ADC-shortlist -> SQ8 rerank at the
            # production design point (R = 5% of the corpus). Stage 1
            # touches 8-byte PQ codes for every vector, stage 2 the
            # 64-byte SQ8 codes for R rows only: ~11.2% of a full SQ8
            # scan's bytes at R=5%.
            "pq_refine_5pct",
            lambda q: similarity.pq_refine_knn(
                emb, query_vec_id=q, k=K, shortlist=max(100, len(ids) // 20)
            ),
        ),
        (
            "pq_refine_trained_5pct",
            lambda q: similarity.pq_refine_knn(
                emb,
                query_vec_id=q,
                k=K,
                shortlist=max(100, len(ids) // 20),
                codebook=cb,
            ),
        ),
        (
            "pq_refine_10pct",
            lambda q: similarity.pq_refine_knn(
                emb, query_vec_id=q, k=K, shortlist=max(200, len(ids) // 10)
            ),
        ),
        (
            # the PRODUCTION design point found by the r9 codeword sweep:
            # 64 codewords (6 bits/subspace x 8 subspaces, accounted as
            # the same 8 B/vector code row) + 10% shortlist recovers
            # SQ8-tier recall (0.83 vs 0.85 at sf1) at ~4.4x fewer scan
            # bytes than the full SQ8 scan.
            "pq_refine_nc64_10pct",
            lambda q: similarity.pq_refine_knn(
                emb,
                query_vec_id=q,
                k=K,
                shortlist=max(200, len(ids) // 10),
                n_codewords=64,
            ),
        ),
        (
            # the memory-lean alternative: 256 codewords + 5% shortlist
            # (0.82 at sf1 at ~5.7x fewer bytes than full SQ8)
            "pq_refine_nc256_5pct",
            lambda q: similarity.pq_refine_knn(
                emb,
                query_vec_id=q,
                k=K,
                shortlist=max(100, len(ids) // 20),
                n_codewords=256,
            ),
        ),
    ):
        recs = []
        for qid in q_ids:
            got = {int(r["vec_id"]) for r in fn(qid).collect()}
            got.discard(qid)
            recs.append(len(got & exact_top(qid)) / K)
        out[name] = round(float(np.mean(recs)), 3)
    out["n_vectors"] = int(len(ids))
    # scan-bytes accounting per tier (64-dim corpus): SQ8 full scan
    # reads 64 B/vector; the refine path reads 8 B/vector of PQ codes
    # plus 64 B for each of the R reranked rows.
    n = len(ids)
    r5 = max(100, n // 20)
    out["bytes_per_vector_sq8"] = 64.0
    out["bytes_per_vector_pq_refine_5pct"] = round((8.0 * n + 64.0 * r5) / n, 2)
    r10 = max(200, n // 10)
    out["bytes_per_vector_pq_refine_nc64_10pct"] = round(
        (8.0 * n + 64.0 * r10) / n, 2
    )
    return out


def main() -> None:
    spark = get_spark(app_name="quant_recall_sf1")
    spark.sparkContext.setLogLevel("ERROR")
    res = {
        "k": K,
        "n_queries": N_QUERIES,
        "sf0.1": measure(spark, corpus(spark, SF01)),
        "sf1": measure(spark, corpus(spark, SF1)),
    }
    out = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "quant_recall_sf1_r09.json",
        )
    )
    with open(out, "w") as f:
        json.dump(res, f, indent=1, sort_keys=True)
    print(json.dumps(res))
    print("\n| reranker | recall@10 sf0.1 | recall@10 sf1 |")
    print("|---|---|---|")
    for name in (
        "sq8",
        "pq",
        "pq_trained",
        "ivf_sq8",
        "pq_refine_5pct",
        "pq_refine_trained_5pct",
        "pq_refine_10pct",
        "pq_refine_nc64_10pct",
        "pq_refine_nc256_5pct",
    ):
        print(
            f"| {name.upper()} full-scan | {res['sf0.1'][name]} "
            f"| {res['sf1'][name]} |"
        )


if __name__ == "__main__":
    main()
