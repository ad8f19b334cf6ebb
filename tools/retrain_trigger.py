"""Re-train trigger curve for the incremental IVF+SQ8 index (VERDICT
r9 task 4): `append_to_ivf_sq8_index` freezes centroids and SQ8 stats
by design, so recall must decay as appended mass drifts away from the
trained geometry. This tool MEASURES that decay and derives the
re-train trigger:

- base corpus: sf0.1 embeddings (2000 x 64), index written at
  n_cells=16 / 2 Lloyd iters;
- appends: fractions {25%, 50%, 100%} of base size drawn from the
  deterministic 10x synthesis (vec_ids 2000+ - in-distribution), under
  three drift levels: none (as synthesized), mild (+0.1/dim bias),
  strong (+0.3/dim bias). Bias shifts mass off the trained centroids
  AND outside the frozen SQ8 [mn,mx] grid (clipping) - the two frozen
  artifacts whose staleness the trigger must detect;
- per cell of the grid: recall@10 over the 16 fixed gate queries of
  the FROZEN (append) index vs a REBUILT index on the union, both at
  n_probe=4, ground truth = exact cosine over the union;
- online trigger metrics, computed per batch at append time (cheap
  map-side aggregates, no ground truth needed):
    QDR  = mean ||x - c(x)|| over the batch / same over the base
    clip = fraction of batch components outside the frozen [mn, mx]

Writes retrain_trigger_r10.json and prints the SCALING.md table.
Usage: python tools/retrain_trigger.py [out.json]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from data_lake_for_e_commerce_analytics_spark.operators import similarity
from data_lake_for_e_commerce_analytics_spark.session import get_spark
from data_lake_for_e_commerce_analytics_spark.sources.tables import load_table

SF1 = "/tmp/sparkgraft_sf1_full"
BASE_DIR = "/root/testdata/sf0.1"
K = 10
N_PROBE = 4
N_CELLS = 16
FRACTIONS = (0.25, 0.5, 1.0)
DRIFTS = {"none": 0.0, "mild": 0.1, "strong": 0.3}
OUT = (
    sys.argv[1]
    if len(sys.argv) > 1
    else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "retrain_trigger_r10.json",
    )
)


def recall_against(spark, index_path, centroids, stats, qvecs, exact_sets) -> int:
    hits = 0
    for qid, qv in qvecs:
        got = {
            r["vec_id"]
            for r in similarity.ivf_sq8_knn_pruned(
                spark, index_path, centroids, stats, qv,
                k=K, n_probe=N_PROBE, exclude_vec_id=qid,
            ).collect()
        }
        hits += len(got & exact_sets[qid])
    return hits


def main() -> None:
    spark = get_spark(app_name="retrain_trigger")
    spark.sparkContext.setLogLevel("ERROR")
    base = load_table(spark, BASE_DIR, "embeddings").localCheckpoint(eager=True)
    n_base = base.count()
    pool = (
        spark.read.parquet(f"{SF1}/embeddings.parquet")
        .filter(F.col("vec_id") >= n_base)
        .localCheckpoint(eager=True)
    )
    qvecs = similarity._gate_query_vecs(base, similarity.ANN_GATE_QUERY_IDS)

    # base-side driver copies for the trigger metrics (measurement tool:
    # 2k x 64 floats is a few MB; the PRODUCTION trigger is the same
    # arithmetic as a map-side Spark aggregate at append time)
    base_rows = base.select("vec_id", "embedding").collect()
    base_V = np.stack([np.asarray(r[1], dtype=np.float64) for r in base_rows])

    results = []
    work = tempfile.mkdtemp(prefix="retrain_trigger_")
    try:
        for drift_name, bias in DRIFTS.items():
            shifted = pool.select(
                "vec_id",
                "label",
                F.transform(
                    "embedding", lambda x: x.cast("double") + F.lit(bias)
                ).alias("embedding"),
            )
            for frac in FRACTIONS:
                n_add = int(n_base * frac)
                batch = shifted.filter(F.col("vec_id") < n_base + n_add)
                union = base.unionByName(batch).localCheckpoint(eager=True)
                exact = similarity.exact_knn_multi(spark, union, k=K)
                exact_sets: dict[int, set] = {}
                for r in exact.collect():
                    exact_sets.setdefault(r["qid"], set()).add(r["vec_id"])

                frozen_path = os.path.join(work, f"{drift_name}_{frac}_frozen")
                centroids, stats = similarity.write_ivf_sq8_index(
                    base, frozen_path, n_cells=N_CELLS, lloyd_iters=2
                )
                similarity.append_to_ivf_sq8_index(
                    spark, frozen_path, centroids, stats, batch
                )
                frozen_n = recall_against(
                    spark, frozen_path, centroids, stats, qvecs, exact_sets
                )

                rebuilt_path = os.path.join(work, f"{drift_name}_{frac}_rebuilt")
                rc, rs = similarity.write_ivf_sq8_index(
                    union, rebuilt_path, n_cells=N_CELLS, lloyd_iters=2
                )
                rebuilt_n = recall_against(
                    spark, rebuilt_path, rc, rs, qvecs, exact_sets
                )

                # online trigger metrics for this batch vs the FROZEN geometry
                batch_rows = batch.select("embedding").collect()
                B = np.stack([np.asarray(r[0], dtype=np.float64) for r in batch_rows])
                C = np.asarray(centroids, dtype=np.float64)
                def mean_dist(V):
                    cells = (V @ C.T).argmax(axis=1)
                    return float(np.linalg.norm(V - C[cells], axis=1).mean())
                qdr = mean_dist(B) / mean_dist(base_V)
                mn = np.array([stats[i][0] for i in range(B.shape[1])])
                mx = np.array([stats[i][1] for i in range(B.shape[1])])
                clip = float(((B < mn) | (B > mx)).mean())

                row = {
                    "drift": drift_name, "bias": bias, "fraction": frac,
                    "n_appended": n_add,
                    "frozen_recall_n": frozen_n, "rebuilt_recall_n": rebuilt_n,
                    "recall_d": K * len(qvecs),
                    "decay_n": rebuilt_n - frozen_n,
                    "qdr": round(qdr, 4), "clip_frac": round(clip, 4),
                }
                results.append(row)
                print("ROW", json.dumps(row), flush=True)
                shutil.rmtree(frozen_path, ignore_errors=True)
                shutil.rmtree(rebuilt_path, ignore_errors=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)

    with open(OUT, "w") as f:
        json.dump({
            "what": "frozen-append vs rebuilt IVF+SQ8 recall@10 over 16 gate "
                    "queries (recall_d=160), base=2000, n_cells=16, n_probe=4; "
                    "QDR/clip are the online re-train trigger metrics",
            "rows": results,
        }, f, indent=1)
    print(f"written {OUT}")
    print("| drift | frac | frozen | rebuilt | decay | QDR | clip |")
    print("|---|---|---|---|---|---|---|")
    for r in results:
        print(f"| {r['drift']} | {r['fraction']} | {r['frozen_recall_n']}/160 "
              f"| {r['rebuilt_recall_n']}/160 | {r['decay_n']} | {r['qdr']} "
              f"| {r['clip_frac']} |")


if __name__ == "__main__":
    main()
