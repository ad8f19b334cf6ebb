"""sf1 AND sf10 measurement for round 14.

1. ADJUDICATION of phrase_match_indexed's 2.43x at the 10x step
   (VERDICT r13 task 5): the r13 gate timed positional-index BUILD +
   probe together. The build and the probe are now timed SEPARATELY
   (the gate itself serves from the shared seed build since r14, so
   its bench number is probe-only going forward); expectation is a
   ~linear build and a posting-list-bounded probe.
2. Build/probe split for the new rag_context_indexed (postings+docstore
   and IVF builds vs the index-served RAG probe).
3. Tiered-merge WRITE AMPLIFICATION (VERDICT r13 task 4): one settled
   large segment + 6 epoch appends, then merge — bytes moved by the
   size-tiered policy vs the full-union policy, probes checked equal.

Reuses tools/bench_sf1_full.py's synthesis (FK-consistent key-shifted
copies; text suffixed per copy except copy 0) at COPIES=10 (sf1) then
COPIES=100 (sf10).

Usage: python tools/bench_scale_r14.py [--skip-sf10] [--keep]
Writes bench_scale_r14.json.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import bench_sf1_full as s1

import __spark_entry__ as entry_mod
from pyspark.sql import functions as F
from data_lake_for_e_commerce_analytics_spark.operators import retrieval
from data_lake_for_e_commerce_analytics_spark.session import get_spark
from data_lake_for_e_commerce_analytics_spark.sources import load_table

_here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RESULT = os.path.join(_here, "bench_scale_r14.json")


def _timed(fn) -> float:
    t0 = time.time()
    fn()
    return round(time.time() - t0, 2)


def _merge_amplification(spark, root_dir: str, sf_dir: str) -> dict:
    """One settled segment (5/6 of docs) + 6 small epoch appends, then
    merge. Tiered policy vs full-union policy: bytes MOVED (the merged
    segment's size) and whether the settled segment was rewritten."""
    docs = load_table(spark, sf_dir, "documents")
    out: dict[str, float | int | bool] = {}
    for mode, tf in (("tiered", 2.0), ("full_union", None)):
        root = os.path.join(root_dir, f"merge_{mode}")
        retrieval.init_postings_index(
            docs.filter(F.col("doc_id") % 6 != 0), root, batch_id=0
        )
        for i, rem in enumerate((0, 6, 12, 18, 24, 30)):
            retrieval.append_postings_segment(
                docs.filter(
                    (F.col("doc_id") % 6 == 0) & (F.col("doc_id") % 36 == rem)
                ),
                root,
                batch_id=i + 1,
            )
        sizes = {
            seg: retrieval._segment_bytes(root, seg)
            for seg in retrieval.read_postings_sidecar(root)["segments"]
        }
        total_before = sum(sizes.values())
        t0 = time.time()
        sc = retrieval.merge_postings_segments(
            spark, root, batch_id=9, tier_factor=tf
        )
        wall = round(time.time() - t0, 2)
        merged = [s for s in sc["segments"] if s.startswith("merged-")]
        moved = sum(retrieval._segment_bytes(root, s) for s in merged)
        out[f"{mode}_bytes_before"] = total_before
        out[f"{mode}_bytes_moved"] = moved
        out[f"{mode}_settled_rewritten"] = "seg-000000" not in sc["segments"]
        out[f"{mode}_n_segments_after"] = len(sc["segments"])
        out[f"{mode}_merge_wall_s"] = wall
        out[f"{mode}_probe"] = [
            list(r)
            for r in retrieval.bm25_topk_segmented(
                spark, root, "spark join fast data", k=10
            ).collect()
        ]
    out["probes_equal"] = out.pop("tiered_probe") == out.pop("full_union_probe")
    out["moved_ratio_tiered_vs_full"] = round(
        out["tiered_bytes_moved"] / max(out["full_union_bytes_moved"], 1), 3
    )
    return out


def _run_tier(tier: str, root: str, copies: int) -> dict:
    s1.SF1 = root
    s1.COPIES = copies
    spark = get_spark(app_name=f"bench_scale_r14_{tier}")
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()
    s1.build(spark)
    print(f"{tier} build: {time.time() - t0:.1f}s", flush=True)
    queries = entry_mod.queries()
    out: dict = {}
    # --- split builds vs probes via the seed-fixture cache ---
    out["posfull_build_s"] = _timed(
        lambda: entry_mod._seed_index(spark, root, "posfull")
    )
    out["phrase_match_indexed_probe_s"] = _timed(
        lambda: queries["phrase_match_indexed"](spark, root).collect()
    )
    out["snip2seg_build_s"] = _timed(
        lambda: entry_mod._seed_index(spark, root, "snip2seg")
    )
    out["ivf_float_build_s"] = _timed(
        lambda: entry_mod._seed_index(spark, root, "ivf_float")
    )
    out["rag_context_indexed_probe_s"] = _timed(
        lambda: queries["rag_context_indexed"](spark, root).collect()
    )
    out["rag_retrieval_e2e_s"] = _timed(
        lambda: queries["rag_retrieval_e2e"](spark, root).collect()
    )
    # the r14-reshaped lifecycle gates (clone + mutate, seeds cached)
    for name in (
        "bm25_index_lifecycle",
        "bm25_index_delete",
        "bm25_index_update",
        "bm25_multi_indexed",
        "search_snippets_indexed",
        "phrase_index_lifecycle",
    ):
        try:
            out[f"{name}_s"] = _timed(
                lambda n=name: queries[n](spark, root).collect()
            )
        except Exception as e:
            print(f"{tier} {name} FAILED: {e}", flush=True)
            out[f"{name}_s"] = -1.0
        print(f"{tier} {name}: {out[f'{name}_s']}s", flush=True)
    out["merge_amplification"] = _merge_amplification(
        spark, root + "_merge", root
    )
    out["load1_end"] = round(os.getloadavg()[0], 2)
    spark.stop()
    # seed cache is keyed by sf dir; drop entries for this tier's root so
    # a later tier (or rerun) rebuilds against its own data
    for key in [k for k in entry_mod._SEED_INDEX_CACHE if k[0] == root]:
        shutil.rmtree(entry_mod._SEED_INDEX_CACHE[key], ignore_errors=True)
        del entry_mod._SEED_INDEX_CACHE[key]
    return out


def main() -> None:
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "16g")
    sf1_root, sf10_root = "/tmp/sgr14_sf1", "/tmp/sgr14_sf10"
    result: dict = {"sf1": _run_tier("sf1", sf1_root, 10)}
    if "--skip-sf10" not in sys.argv:
        result["sf10"] = _run_tier("sf10", sf10_root, 100)
        ratios = {}
        for k, v in result["sf1"].items():
            if k.endswith("_s") and isinstance(v, float) and v > 0:
                w = result["sf10"].get(k)
                if isinstance(w, float) and w > 0:
                    ratios[k[:-2]] = round(w / v, 2)
        result["ratio_10x"] = ratios
    with open(RESULT, "w") as f:
        json.dump(result, f, indent=1, sort_keys=True)
    print(f"written: {RESULT}", flush=True)
    if "--keep" not in sys.argv:
        for d in (sf1_root, sf10_root, sf1_root + "_merge", sf10_root + "_merge"):
            shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
