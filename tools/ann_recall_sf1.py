"""ANN recall/probe curve at sf1 (VERDICT r6 task 7 / r7 task 2):
measure recall@10 of the IVF and LSH indexes against brute-force
cosine ground truth on the 10x embedding corpus (20k vectors), at 3-4
probe settings each.

The INDEXES are built by the real Spark operators
(`operators/similarity.build_ivf_index`, `hyperplane_signature`) —
cell assignments and bucket signatures come out of the cluster-side
dataflow exactly as `ivf_knn` / `lsh_bucketed_knn` would use them.
The recall arithmetic (per-query candidate filter + exact cosine on
the candidates) then runs driver-side in numpy over the collected
(id, cell/sig, vector) tables — 20k x 64 floats, a few MB — because
recall is a property of the INDEX, not of the per-query job plumbing:
the candidate sets are identical to what the operators scan, so the
measured recall is the operators' recall, without paying 32 queries x
2 index variants x 4 probe settings of Spark job latency for the same
numbers.

Usage:
    python tools/ann_recall_sf1.py [sf1_dir]

Expects the FK-consistent 10x corpus from tools/bench_sf1_full.py
(run it with --keep first); falls back to building just the
embeddings table if the dir is missing. Writes
ann_recall_sf1_r08.json and prints a markdown table for SCALING.md.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from data_lake_for_e_commerce_analytics_spark.operators.similarity import (
    build_ivf_index,
    hyperplane_signature,
    jl_project,
)
from data_lake_for_e_commerce_analytics_spark.session import get_spark
from data_lake_for_e_commerce_analytics_spark.sources.tables import load_table

SF1 = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sparkgraft_sf1_full"
K = 10
N_QUERIES = 32
IVF_CELLS = 64
IVF_PROBES = (1, 2, 4, 8, 16)
LSH_PLANES = 12
LSH_HAMMING = (0, 1, 2, 3)
RESULT = (
    sys.argv[2]
    if len(sys.argv) > 2
    else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "ann_recall_sf1_r09.json",
    )
)


def main() -> None:
    spark = get_spark(app_name="ann_recall_sf1")
    spark.sparkContext.setLogLevel("ERROR")
    if os.path.isdir(os.path.join(SF1)):
        emb = spark.read.parquet(f"{SF1}/embeddings.parquet")
    else:  # embeddings-only fallback (same replication as bench_sf1_full)
        base = load_table(spark, "/root/testdata/sf0.1", "embeddings")
        dim = len(base.select("embedding").head()[0])

        def _signed_perm_expr(i: int):
            # per-copy signed permutation (orthogonal): within-copy
            # geometry preserved, cross-copy scrambled — same synthesis
            # as tools/bench_sf1_full.py (see the clique pathology note
            # there)
            if i == 0:
                return F.col("embedding")
            import random

            rng = random.Random(1000 + i)
            perm = list(range(dim))
            rng.shuffle(perm)
            e = F.col("embedding")
            return F.array(
                *[
                    (e[perm[d]] * F.lit(rng.choice((1.0, -1.0)))).cast(
                        "float"
                    )
                    for d in range(dim)
                ]
            )

        parts = [
            base.select(
                (F.col("vec_id") * 10 + i).alias("vec_id"),
                _signed_perm_expr(i).alias("embedding"),
                "label",
            )
            for i in range(10)
        ]
        emb = parts[0]
        for p in parts[1:]:
            emb = emb.unionByName(p)

    # ---- index builds: the real Spark operators --------------------------
    assignments, centroids = build_ivf_index(
        emb, n_cells=IVF_CELLS, lloyd_iters=2
    )
    ivf = {
        int(r["vec_id"]): int(r["cell"]) for r in assignments.collect()
    }
    sigs = {
        int(r["vec_id"]): int(r["sig"])
        for r in emb.select(
            "vec_id",
            hyperplane_signature(F.col("embedding"), LSH_PLANES).alias("sig"),
        ).collect()
    }

    # JL-coarse-tier IVF (r9): the same IVF build over the 16-dim
    # integer sketch — isolates the cell-boundary recall cost of
    # building AND probing the coarse tier in projection space at a
    # quarter of the assignment bytes/multiplies (ivf_jl_knn's shape;
    # ranking fidelity inside cells is the separately-measured SQ8
    # tier, 0.85 and scale-invariant, so exact rerank is used here).
    as_emb = (
        jl_project(emb, out_dim=16, quant=1000)
        .select(
            "vec_id",
            F.transform("proj", lambda y: y.cast("double")).alias("embedding"),
        )
        .localCheckpoint(eager=True)
    )
    assign_jl, cent_jl = build_ivf_index(as_emb, n_cells=IVF_CELLS, lloyd_iters=2)
    ivf_jl = {int(r["vec_id"]): int(r["cell"]) for r in assign_jl.collect()}
    prows = as_emb.select("vec_id", "embedding").collect()
    pmap = {int(r["vec_id"]): np.asarray(r["embedding"], dtype=np.float64) for r in prows}

    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([int(r["vec_id"]) for r in rows])
    V = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in rows])
    Vn = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
    n = len(ids)
    cells = np.array([ivf[i] for i in ids])
    cells_jl = np.array([ivf_jl[i] for i in ids])
    P = np.stack([pmap[int(i)] for i in ids])
    Pn = P / np.maximum(np.linalg.norm(P, axis=1, keepdims=True), 1e-12)
    sig_arr = np.array([sigs[i] for i in ids], dtype=np.int64)

    # deterministic query sample: hash-ranked ids (same shape the
    # operators' seed sampling uses)
    order = np.argsort([hash((int(i), 7)) for i in ids])
    q_idx = order[:N_QUERIES]

    def topk_exact(qi: int) -> set:
        scores = Vn @ Vn[qi]
        scores[qi] = -np.inf
        return set(ids[np.argpartition(-scores, K)[:K]])

    truth = {qi: topk_exact(qi) for qi in q_idx}

    def recall_for(candidate_mask_fn) -> tuple[float, float]:
        recs, fracs = [], []
        for qi in q_idx:
            mask = candidate_mask_fn(qi)
            mask[qi] = False
            fracs.append(mask.sum() / n)
            scores = np.where(mask, Vn @ Vn[qi], -np.inf)
            kk = min(K, int(mask.sum()))
            got = set(ids[np.argpartition(-scores, kk)[:kk]]) if kk else set()
            recs.append(len(got & truth[qi]) / K)
        return round(float(np.mean(recs)), 3), round(float(np.mean(fracs)), 4)

    out = {"n_vectors": int(n), "k": K, "n_queries": int(N_QUERIES),
           "ivf": {}, "ivf_jl": {}, "lsh": {}}

    cnorm = centroids  # build_ivf_index returns unit centroids
    for n_probe in IVF_PROBES:
        def ivf_mask(qi, n_probe=n_probe):
            probe = np.argsort(-(cnorm @ Vn[qi]))[:n_probe]
            return np.isin(cells, probe)

        r, f = recall_for(ivf_mask)
        out["ivf"][str(n_probe)] = {"recall_at_10": r, "scanned_frac": f}

    for n_probe in IVF_PROBES:
        def ivf_jl_mask(qi, n_probe=n_probe):
            probe = np.argsort(-(cent_jl @ Pn[qi]))[:n_probe]
            return np.isin(cells_jl, probe)

        r, f = recall_for(ivf_jl_mask)
        out["ivf_jl"][str(n_probe)] = {"recall_at_10": r, "scanned_frac": f}

    for h in LSH_HAMMING:
        def lsh_mask(qi, h=h):
            x = sig_arr ^ sig_arr[qi]
            return np.array([bin(v).count("1") <= h for v in x])

        r, f = recall_for(lsh_mask)
        out["lsh"][str(h)] = {"recall_at_10": r, "scanned_frac": f}

    print(json.dumps(out))
    with open(RESULT, "w") as fo:
        json.dump(out, fo, indent=1, sort_keys=True)

    print(f"\n| index | probe | recall@10 | scanned |", file=sys.stderr)
    print(f"|---|---|---|---|", file=sys.stderr)
    for p, v in out["ivf"].items():
        print(
            f"| IVF {IVF_CELLS} cells | n_probe={p} | "
            f"{v['recall_at_10']} | {v['scanned_frac']:.1%} |",
            file=sys.stderr,
        )
    for p_, v in out["ivf_jl"].items():
        print(
            f"| IVF-JL {IVF_CELLS} cells (16-dim sketch) | n_probe={p_} | "
            f"{v['recall_at_10']} | {v['scanned_frac']:.1%} |",
            file=sys.stderr,
        )
    for h, v in out["lsh"].items():
        print(
            f"| LSH {LSH_PLANES} planes | hamming<={h} | "
            f"{v['recall_at_10']} | {v['scanned_frac']:.1%} |",
            file=sys.stderr,
        )


if __name__ == "__main__":
    main()
