"""Streaming ANN index maintenance (streaming/ann_ingest.py): the r10
re-train trigger wired into a foreachBatch ingest — in-distribution
batches APPEND as frozen-geometry epoch segments, drifted batches fire
a full REBUILD from the raw corpus; probes union the directory-pruned
segments under one sidecar geometry; epoch effects are replay-safe."""

import os

from pyspark.sql import functions as F

from data_lake_for_e_commerce_analytics_spark.operators import similarity
from data_lake_for_e_commerce_analytics_spark.sources.tables import load_table
from data_lake_for_e_commerce_analytics_spark.streaming import ann_ingest


def _base(spark):
    return load_table(spark, "/root/testdata/sf0.01", "embeddings")


def _pool(spark, lo, hi, bias=0.0):
    df = load_table(spark, "/root/testdata/sf0.1", "embeddings").filter(
        (F.col("vec_id") >= lo) & (F.col("vec_id") < hi)
    )
    if bias:
        df = df.select(
            "vec_id",
            "label",
            F.transform("embedding", lambda x: x.cast("double") + F.lit(bias)).alias(
                "embedding"
            ),
        )
    return df.select("vec_id", "label", "embedding")


def test_ingest_append_then_rebuild_on_drift(spark, tmp_path):
    root = str(tmp_path / "annidx")
    ann_ingest.init_ann_index(spark, _base(spark), root, n_cells=8)
    s0 = ann_ingest.read_sidecar(root)
    assert s0["segments"] == ["seg_base"]

    # epoch 0: in-distribution batch -> frozen-geometry segment append
    a0 = ann_ingest.ingest_ann_batch(_pool(spark, 500, 700), root, batch_id=0)
    assert a0 == "append"
    s1 = ann_ingest.read_sidecar(root)
    assert s1["segments"] == ["seg_base", "seg_epoch_00000000"]
    assert s1["centroids"] == s0["centroids"]  # geometry untouched

    # epoch 1: strongly drifted batch -> trigger fires, full rebuild
    a1 = ann_ingest.ingest_ann_batch(
        _pool(spark, 700, 900, bias=0.3), root, batch_id=1
    )
    assert a1 == "rebuild"
    s2 = ann_ingest.read_sidecar(root)
    assert s2["segments"] == ["seg_rebuild_00000001"]
    assert s2["centroids"] != s0["centroids"]  # retrained
    # superseded segment dirs are GC'd after the swap (ADVICE r10)
    assert not os.path.isdir(os.path.join(root, "seg_base"))
    assert not os.path.isdir(os.path.join(root, "seg_epoch_00000000"))

    # metrics log carries the decisions with the measured trigger values
    m = {
        r["epoch"]: r
        for r in spark.read.parquet(os.path.join(root, "metrics")).collect()
    }
    assert m[0]["action"] == "append" and m[0]["qdr"] <= 1.2
    assert m[1]["action"] == "rebuild" and (
        m[1]["qdr"] > 1.2 or m[1]["clip_frac"] > 0.01
    )

    # rebuilt index covers base + both epochs: probe returns k unique ids
    q = _base(spark).filter(F.col("vec_id") == 0).head()["embedding"]
    got = ann_ingest.probe_ann_index(
        spark, root, q, k=10, n_probe=8, exclude_vec_id=0
    ).collect()
    assert len(got) == 10
    assert len({r["vec_id"] for r in got}) == 10


def test_multi_segment_probe_equals_single_index(spark, tmp_path):
    """Segmented probe must rank EXACTLY like one grown index: the
    epoch-segment form is append_to_ivf_sq8_index with idempotent
    layout, so full-probe top-k over {base, epoch} segments equals the
    probe over an index grown by the shared append operator."""
    base = _base(spark)
    batch = _pool(spark, 500, 800)
    root = str(tmp_path / "seg")
    ann_ingest.init_ann_index(spark, base, root, n_cells=8)
    assert ann_ingest.ingest_ann_batch(batch, root, batch_id=0) == "append"
    s = ann_ingest.read_sidecar(root)

    import numpy as np

    grown = str(tmp_path / "grown")
    centroids, stats = similarity.write_ivf_sq8_index(base, grown, n_cells=8)
    # identical geometry by construction (same corpus, same build)
    assert np.allclose(np.asarray(s["centroids"]), centroids)
    similarity.append_to_ivf_sq8_index(spark, grown, centroids, stats, batch)

    q = base.filter(F.col("vec_id") == 31).head()["embedding"]
    seg_ids = [
        (r["vec_id"], r["sqdist"])
        for r in ann_ingest.probe_ann_index(
            spark, root, q, k=10, n_probe=8, exclude_vec_id=31
        ).collect()
    ]
    one_ids = [
        (r["vec_id"], r["sqdist"])
        for r in similarity.ivf_sq8_knn_pruned(
            spark, grown, centroids, stats, [float(x) for x in q],
            k=10, n_probe=8, exclude_vec_id=31,
        ).collect()
    ]
    assert seg_ids == one_ids


def test_epoch_replay_converges(spark, tmp_path):
    """At-least-once: replaying an epoch (same batch_id) leaves the
    index, corpus, metrics, and sidecar in the first attempt's state —
    the committed sidecar's last_batch_id makes the replay a pure
    no-op."""
    root = str(tmp_path / "replay")
    ann_ingest.init_ann_index(spark, _base(spark), root, n_cells=8)
    batch = _pool(spark, 500, 600)
    assert ann_ingest.ingest_ann_batch(batch, root, batch_id=0) == "append"
    seg = os.path.join(root, "seg_epoch_00000000")
    first_rows = sorted(
        (r["vec_id"], tuple(r["code"])) for r in spark.read.parquet(seg).collect()
    )
    s1 = ann_ingest.read_sidecar(root)
    assert s1["last_batch_id"] == 0
    # replay the SAME epoch: recognized and skipped
    assert ann_ingest.ingest_ann_batch(batch, root, batch_id=0) == "replayed"
    again = sorted(
        (r["vec_id"], tuple(r["code"])) for r in spark.read.parquet(seg).collect()
    )
    assert again == first_rows  # no duplicates, same codes
    assert ann_ingest.read_sidecar(root)["segments"] == s1["segments"]
    corpus = spark.read.parquet(os.path.join(root, "corpus", "epochs"))
    assert corpus.count() == batch.count()
    metrics = spark.read.parquet(os.path.join(root, "metrics"))
    assert metrics.count() == 1


def test_rebuild_replay_is_noop(spark, tmp_path):
    """ADVICE r10 (medium): a crash after the rebuild's sidecar swap but
    before the streaming checkpoint commit replays the epoch against the
    NEW geometry; without the last_batch_id guard it measured QDR ~1,
    appended a duplicate segment, and logged a contradictory 'append'
    row. The replay must be a no-op and the probe must stay
    duplicate-free."""
    root = str(tmp_path / "rebuild_replay")
    ann_ingest.init_ann_index(spark, _base(spark), root, n_cells=8)
    drifted = _pool(spark, 700, 900, bias=0.3)
    assert ann_ingest.ingest_ann_batch(drifted, root, batch_id=0) == "rebuild"
    s1 = ann_ingest.read_sidecar(root)
    assert s1["segments"] == ["seg_rebuild_00000000"]

    # simulate the checkpoint-uncommitted replay of the same epoch
    assert ann_ingest.ingest_ann_batch(drifted, root, batch_id=0) == "replayed"
    s2 = ann_ingest.read_sidecar(root)
    assert s2["segments"] == ["seg_rebuild_00000000"]  # no duplicate segment
    m = spark.read.parquet(os.path.join(root, "metrics")).collect()
    assert [r["action"] for r in m] == ["rebuild"]  # no contradictory row

    q = _base(spark).filter(F.col("vec_id") == 0).head()["embedding"]
    got = ann_ingest.probe_ann_index(
        spark, root, q, k=10, n_probe=8, exclude_vec_id=0
    ).collect()
    assert len({r["vec_id"] for r in got}) == 10  # no duplicate vec_ids


def test_streamed_ingest_via_foreachbatch(spark, tmp_path):
    """End-to-end through a real availableNow stream: two parquet
    epochs arrive as separate files, the query drains, and the probe
    sees vectors from both."""
    root = str(tmp_path / "stream_idx")
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    ann_ingest.init_ann_index(spark, _base(spark), root, n_cells=8)
    b1 = _pool(spark, 500, 600)
    b1.write.parquet(src)
    q = ann_ingest.run_ann_ingest(
        spark.readStream.schema(b1.schema).parquet(src), root, ckpt
    )
    q.awaitTermination(120)
    _pool(spark, 600, 700).write.mode("append").parquet(src)
    q2 = ann_ingest.run_ann_ingest(
        spark.readStream.schema(b1.schema).parquet(src), root, ckpt
    )
    q2.awaitTermination(120)
    s = ann_ingest.read_sidecar(root)
    assert len(s["segments"]) >= 2  # base + appended epoch segment(s)
    ids = {
        r["vec_id"]
        for r in spark.read.parquet(os.path.join(root, "corpus", "epochs")).collect()
    }
    assert ids == set(range(500, 700))


def test_compaction_preserves_ranking_bit_exact(spark, tmp_path):
    """compact_segments moves code rows verbatim — probe results before
    and after must be identical, and the sidecar collapses to one
    segment while geometry stays frozen."""
    root = str(tmp_path / "compact")
    ann_ingest.init_ann_index(spark, _base(spark), root, n_cells=8)
    ann_ingest.ingest_ann_batch(_pool(spark, 500, 600), root, batch_id=0)
    ann_ingest.ingest_ann_batch(_pool(spark, 600, 700), root, batch_id=1)
    s_before = ann_ingest.read_sidecar(root)
    assert len(s_before["segments"]) == 3
    q = _base(spark).filter(F.col("vec_id") == 0).head()["embedding"]
    before = [
        (r["vec_id"], r["sqdist"])
        for r in ann_ingest.probe_ann_index(
            spark, root, q, k=10, n_probe=8, exclude_vec_id=0
        ).collect()
    ]
    n = ann_ingest.compact_segments(spark, root, batch_id=2)
    s_after = ann_ingest.read_sidecar(root)
    assert s_after["segments"] == ["seg_compact_00000002"]
    assert s_after["centroids"] == s_before["centroids"]
    assert n == 700  # 500 base + 2 x 100 epochs
    # superseded dirs GC'd after the swap (ADVICE r10)
    for seg in s_before["segments"]:
        assert not os.path.isdir(os.path.join(root, seg))
    # the maintenance decision lands in the metrics log (VERDICT r10
    # task 7): action='compact', NULL drift columns, 1 segment after
    m = {
        r["epoch"]: r
        for r in spark.read.parquet(os.path.join(root, "metrics")).collect()
    }
    assert m[2]["action"] == "compact" and m[2]["n"] == 700
    assert m[2]["qdr"] is None and m[2]["n_segments"] == 1
    after = [
        (r["vec_id"], r["sqdist"])
        for r in ann_ingest.probe_ann_index(
            spark, root, q, k=10, n_probe=8, exclude_vec_id=0
        ).collect()
    ]
    assert after == before
    # replay the compaction epoch: same state
    assert ann_ingest.compact_segments(spark, root, batch_id=2) == 0


def test_delete_tombstones_probe_and_purge(spark, tmp_path):
    """The r11 delete lifecycle: tombstoned ids vanish from probes
    immediately (and never shrink top-k below k while live candidates
    exist), a single-segment compaction physically purges them, and the
    whole flow is replay-idempotent."""
    root = str(tmp_path / "annmut")
    ann_ingest.init_ann_index(spark, _base(spark), root, n_cells=8)
    q = _base(spark).filter(F.col("vec_id") == 0).head()["embedding"]
    before = [
        r["vec_id"]
        for r in ann_ingest.probe_ann_index(
            spark, root, q, k=10, n_probe=8
        ).collect()
    ]
    victims = before[:3]
    n_del = ann_ingest.delete_ann_ids(spark, root, victims, batch_id=0)
    assert n_del == 3
    after = [
        r["vec_id"]
        for r in ann_ingest.probe_ann_index(
            spark, root, q, k=10, n_probe=8
        ).collect()
    ]
    assert len(after) == 10  # next-nearest fill in — no shrink
    assert not set(victims) & set(after)
    assert after == [v for v in before if v not in set(victims)] + after[7:]

    # single-segment compaction fires BECAUSE tombstoned rows are live
    n_live = ann_ingest.compact_segments(spark, root, batch_id=1)
    assert n_live == 500 - 3
    seg = ann_ingest.read_sidecar(root)["segments"]
    assert seg == ["seg_compact_00000001"]
    codes = spark.read.parquet(os.path.join(root, seg[0]))
    assert codes.filter(F.col("vec_id").isin(victims)).count() == 0
    # probe unchanged by the physical purge
    assert [
        r["vec_id"]
        for r in ann_ingest.probe_ann_index(
            spark, root, q, k=10, n_probe=8
        ).collect()
    ] == after
    # purged + no pending tombstoned rows -> compaction no-ops now
    assert ann_ingest.compact_segments(spark, root, batch_id=2) == 0
    # metrics log carries the full decision history
    m = {
        r["epoch"]: r
        for r in spark.read.parquet(os.path.join(root, "metrics")).collect()
    }
    assert m[0]["action"] == "delete" and m[0]["n"] == 3
    assert m[1]["action"] == "compact" and m[1]["n"] == 497
    # delete replay converges (same batch_id overwrites, DISTINCT read)
    assert ann_ingest.delete_ann_ids(spark, root, victims, batch_id=0) == 3
    assert spark.read.parquet(
        os.path.join(root, "tombstones")
    ).distinct().count() == 3


def test_rebuild_excludes_tombstones(spark, tmp_path):
    """A trigger-fired rebuild is the index-level physical purge: the
    new segment and geometry are computed over corpus MINUS tombstones,
    so deleted ids never resurrect from the raw corpus zone."""
    root = str(tmp_path / "annreb")
    ann_ingest.init_ann_index(spark, _base(spark), root, n_cells=8)
    ann_ingest.delete_ann_ids(spark, root, [0, 1, 2, 3], batch_id=0)
    a = ann_ingest.ingest_ann_batch(
        _pool(spark, 500, 700, bias=0.3), root, batch_id=1
    )
    assert a == "rebuild"
    seg = ann_ingest.read_sidecar(root)["segments"]
    assert seg == ["seg_rebuild_00000001"]
    codes = spark.read.parquet(os.path.join(root, seg[0]))
    assert codes.filter(F.col("vec_id") < 4).count() == 0
    assert codes.count() == 500 - 4 + 200


def test_vacuum_corpus_reclaims_and_retires_tombstones(spark, tmp_path):
    """vacuum_corpus folds the live corpus into one dir, excludes
    tombstoned vectors so a rebuild cannot resurrect them, GCs the
    consumed seed/epoch storage, and retires the tombstone log once
    the index is purged too."""
    root = str(tmp_path / "annvac")
    ann_ingest.init_ann_index(spark, _base(spark), root, n_cells=8)
    ann_ingest.ingest_ann_batch(_pool(spark, 500, 600), root, batch_id=0)
    ann_ingest.delete_ann_ids(spark, root, [0, 1, 501], batch_id=1)
    # purge the index first (so vacuum can retire the tombstones)
    assert ann_ingest.compact_segments(spark, root, batch_id=2) == 600 - 3

    n = ann_ingest.vacuum_corpus(spark, root, batch_id=3)
    assert n == 600 - 3
    s = ann_ingest.read_sidecar(root)
    assert s["corpus_dirs"] == ["vacuum_00000003"]
    assert s["vacuumed_upto"] == 0  # epoch-0 files consumed
    corpus_root = os.path.join(root, "corpus")
    assert not os.path.isdir(os.path.join(corpus_root, "seed"))
    assert sorted(os.listdir(corpus_root)) == ["epochs", "vacuum_00000003"]
    assert os.listdir(os.path.join(corpus_root, "epochs")) == []
    # corpus zone holds exactly the live rows; tombstone log retired
    corpus = spark.read.parquet(os.path.join(corpus_root, "vacuum_00000003"))
    assert corpus.count() == 597
    assert corpus.filter(F.col("vec_id").isin([0, 1, 501])).count() == 0
    assert not os.path.isdir(os.path.join(root, "tombstones"))
    # a post-vacuum drifted batch rebuilds from the vacuumed corpus:
    # deleted ids stay gone even with no tombstone filter left
    a = ann_ingest.ingest_ann_batch(
        _pool(spark, 600, 700, bias=0.3), root, batch_id=4
    )
    assert a == "rebuild"
    seg = ann_ingest.read_sidecar(root)["segments"]
    codes = spark.read.parquet(os.path.join(root, seg[0]))
    assert codes.filter(F.col("vec_id").isin([0, 1, 501])).count() == 0
    assert codes.count() == 597 + 100
    # metrics history: delete, compact, vacuum all logged
    m = {
        r["epoch"]: r["action"]
        for r in spark.read.parquet(os.path.join(root, "metrics")).collect()
    }
    assert m[1] == "delete" and m[2] == "compact" and m[3] == "vacuum"


def test_vacuum_keeps_tombstones_while_index_dirty(spark, tmp_path):
    """Vacuum before any index purge: the corpus is reclaimed but the
    tombstone log must SURVIVE (live segments still hold the deleted
    rows, so probes still need the filter); vacuum replay converges."""
    root = str(tmp_path / "anndirty")
    ann_ingest.init_ann_index(spark, _base(spark), root, n_cells=8)
    ann_ingest.delete_ann_ids(spark, root, [5, 6], batch_id=0)
    assert ann_ingest.vacuum_corpus(spark, root, batch_id=1) == 498
    assert os.path.isdir(os.path.join(root, "tombstones"))
    q = _base(spark).filter(F.col("vec_id") == 5).head()["embedding"]
    hits = [
        r["vec_id"]
        for r in ann_ingest.probe_ann_index(
            spark, root, q, k=5, n_probe=8
        ).collect()
    ]
    assert 5 not in hits and 6 not in hits
    # replay the vacuum epoch: same state, same count
    assert ann_ingest.vacuum_corpus(spark, root, batch_id=1) == 498
    assert ann_ingest.read_sidecar(root)["corpus_dirs"] == ["vacuum_00000001"]


def test_batch_id_collision_refused_before_any_effect(spark, tmp_path):
    """ADVICE r11: the metrics/tombstone keyspace is batch_id-keyed, so
    a maintenance id colliding with a past epoch of a DIFFERENT action
    must raise — and raise BEFORE any effect lands. Same-action reuse
    is an at-least-once replay and must still converge."""
    import pytest

    root = str(tmp_path / "anncol")
    ann_ingest.init_ann_index(spark, _base(spark), root, n_cells=8)
    assert ann_ingest.ingest_ann_batch(_pool(spark, 500, 600), root, 0) == "append"

    # delete reusing the ingest epoch's id: refused, no tombstone dir
    with pytest.raises(ValueError, match="already holds a 'append'"):
        ann_ingest.delete_ann_ids(spark, root, [0, 1], batch_id=0)
    assert not os.path.isdir(os.path.join(root, "tombstones"))

    ann_ingest.delete_ann_ids(spark, root, [0, 1], batch_id=1)
    # compact/vacuum reusing the delete's id: refused, state untouched
    with pytest.raises(ValueError, match="already holds a 'delete'"):
        ann_ingest.compact_segments(spark, root, batch_id=1)
    assert len(ann_ingest.read_sidecar(root)["segments"]) == 2
    with pytest.raises(ValueError, match="already holds"):
        ann_ingest.vacuum_corpus(spark, root, batch_id=1)
    assert ann_ingest.read_sidecar(root)["corpus_dirs"] == ["seed"]

    # same-action replay still converges (delete re-records id 0,1)
    assert ann_ingest.delete_ann_ids(spark, root, [0, 1], batch_id=1) == 2

    # disjoint ids proceed normally
    assert ann_ingest.compact_segments(spark, root, batch_id=2) == 600 - 2


def test_missing_sidecar_corpus_dir_raises(spark, tmp_path):
    """ADVICE r11: a sidecar-listed corpus dir absent on disk is
    corruption or an external mutation — reads/vacuum must raise, not
    silently shrink the rebuild input (masked data loss)."""
    import shutil

    import pytest

    root = str(tmp_path / "annmiss")
    ann_ingest.init_ann_index(spark, _base(spark), root, n_cells=8)
    shutil.rmtree(os.path.join(root, "corpus", "seed"))
    with pytest.raises(FileNotFoundError, match="sidecar-listed corpus dir"):
        ann_ingest.vacuum_corpus(spark, root, batch_id=1)
    with pytest.raises(FileNotFoundError, match="sidecar-listed corpus dir"):
        ann_ingest._read_corpus(spark, root)


def test_vacuum_watermark_shares_the_read_snapshot(spark, tmp_path):
    """ADVICE r11 (the race itself, deterministically staged): an
    ingest epoch file that exists at watermark time but would have been
    missed by a second listing — here simulated by asserting the
    snapshot helper returns BOTH the paths and the watermark from ONE
    listing — is either fully in the vacuum (in paths AND under the
    watermark) or fully out. After a vacuum that consumed epoch 0, a
    later rebuild sees each vec_id exactly once."""
    root = str(tmp_path / "annsnap")
    ann_ingest.init_ann_index(spark, _base(spark), root, n_cells=8)
    ann_ingest.ingest_ann_batch(_pool(spark, 500, 600), root, batch_id=0)
    s = ann_ingest.read_sidecar(root)
    s.setdefault("corpus_dirs", ["seed"])
    s.setdefault("vacuumed_upto", -1)
    paths, upto = ann_ingest._corpus_snapshot(root, s)
    # every epoch file in paths is <= the returned watermark
    assert upto == 0
    assert any("epochs" in p for p in paths)
    ann_ingest.vacuum_corpus(spark, root, batch_id=1)
    # post-vacuum rebuild: no duplicate vec_ids (the race's symptom)
    a = ann_ingest.ingest_ann_batch(
        _pool(spark, 600, 700, bias=0.3), root, batch_id=2
    )
    assert a == "rebuild"
    seg = ann_ingest.read_sidecar(root)["segments"][0]
    codes = spark.read.parquet(os.path.join(root, seg))
    assert codes.count() == codes.select("vec_id").distinct().count() == 700


def test_streaming_probe_with_predicate_prefilters(spark, tmp_path):
    """Filtered search on the SEGMENTED streaming index (r12): the
    predicate rides the tombstone anti-join's inside-the-probe
    placement per segment, so a metadata-constrained probe fills k with
    matching candidates instead of post-filter under-filling."""
    root = str(tmp_path / "annfilt")
    ann_ingest.init_ann_index(spark, _base(spark), root, n_cells=8)
    ann_ingest.ingest_ann_batch(_pool(spark, 500, 700), root, batch_id=0)
    base = _base(spark)
    q = base.filter(F.col("vec_id") == 0).head()["embedding"]
    ql = base.filter(F.col("vec_id") == 0).head()["label"]
    got = ann_ingest.probe_ann_index(
        spark, root, q, k=10, n_probe=8, exclude_vec_id=0,
        predicate=F.col("label") == ql,
    ).collect()
    assert len(got) == 10
    assert all(r["label"] == ql for r in got)
    # post-filtering the unfiltered top-k under-fills (the contract)
    unfiltered = ann_ingest.probe_ann_index(
        spark, root, q, k=10, n_probe=8, exclude_vec_id=0
    ).collect()
    assert len([r for r in unfiltered if r["label"] == ql]) < 10


def test_reingest_after_delete_is_the_update_flow(spark, tmp_path):
    """r13 epoch-scoped tombstones: delete -> re-ingest IS the update
    flow, no forced compaction/retirement in between. The re-ingested
    version (ingest_epoch >= del_before) is probe-visible immediately
    while every earlier version stays killed; rebuild, compaction and
    vacuum each keep exactly the one live version."""
    import os

    root = str(tmp_path / "annupd")
    # loose trigger: a 2-row re-ingest batch has a noisy QDR and this
    # test pins the APPEND path (the rebuild path has its own test)
    ann_ingest.init_ann_index(
        spark, _base(spark), root, n_cells=8, qdr_max=10.0, clip_max=1.0
    )
    ann_ingest.ingest_ann_batch(_pool(spark, 500, 600), root, batch_id=0)
    ann_ingest.delete_ann_ids(spark, root, [500, 501], batch_id=1)

    # re-ingest the two deleted ids right away — accepted, live, ranked
    resend = _pool(spark, 500, 502)
    a = ann_ingest.ingest_ann_batch(resend, root, batch_id=2)
    assert a == "append"
    q = resend.filter(F.col("vec_id") == 500).head()["embedding"]
    got = ann_ingest.probe_ann_index(spark, root, q, k=3, n_probe=8).collect()
    assert 500 in {r["vec_id"] for r in got}
    # exactly ONE live row per re-ingested id across all segments: the
    # epoch-0 version is killed, the epoch-2 version serves
    live = ann_ingest.probe_ann_index(spark, root, q, k=1000, n_probe=8)
    assert live.filter(F.col("vec_id") == 500).count() == 1

    # compaction physically drops the killed epoch-0 rows, keeps the
    # re-ingested versions (500 seed + 100 epoch0 - 2 killed + 2 new)
    n_live = ann_ingest.compact_segments(spark, root, batch_id=3)
    assert n_live == 500 + 100 - 2 + 2
    seg = ann_ingest.read_sidecar(root)["segments"][0]
    codes = spark.read.parquet(os.path.join(root, seg))
    per_id = codes.filter(F.col("vec_id") == 500).collect()
    assert len(per_id) == 1 and per_id[0]["ingest_epoch"] == 2

    # vacuum folds the corpus to live versions only and retires the
    # log (no killed rows anywhere; the live re-ingested versions of
    # once-deleted ids do NOT block retirement)
    assert ann_ingest.vacuum_corpus(spark, root, batch_id=4) == 600
    assert not os.path.isdir(os.path.join(root, "tombstones"))
    corpus = spark.read.parquet(os.path.join(root, "corpus", "vacuum_00000004"))
    rows = corpus.filter(F.col("vec_id") == 500).collect()
    assert len(rows) == 1 and rows[0]["ingest_epoch"] == 2
    # probe identical after the full physical cycle
    got2 = ann_ingest.probe_ann_index(spark, root, q, k=3, n_probe=8).collect()
    assert [r["vec_id"] for r in got2] == [r["vec_id"] for r in got]


def test_reingest_before_delete_batch_is_dead_on_arrival(spark, tmp_path):
    """The one illegal re-ingest shape left: a batch_id PRECEDING the
    id's latest delete (violating the monotone shared keyspace) would
    write rows that are killed the moment they land — refused loudly
    before any effect."""
    import pytest

    root = str(tmp_path / "anndoa")
    ann_ingest.init_ann_index(spark, _base(spark), root, n_cells=8)
    ann_ingest.delete_ann_ids(spark, root, [500], batch_id=7)
    with pytest.raises(ValueError, match="dead on arrival"):
        ann_ingest.ingest_ann_batch(_pool(spark, 500, 502), root, batch_id=0)


def test_rebuild_keeps_one_live_version_after_reingest(spark, tmp_path):
    """A trigger-fired rebuild after delete -> re-ingest must put
    exactly the live version in the new segment: the kill-filter is
    per-VERSION, so the corpus zone's two rows for the updated id
    (killed epoch-0, live epoch-2) contribute one row — no duplicate
    vec_id double-join in the assignment."""
    root = str(tmp_path / "annrebu")
    ann_ingest.init_ann_index(spark, _base(spark), root, n_cells=8)
    ann_ingest.ingest_ann_batch(_pool(spark, 500, 600), root, batch_id=0)
    ann_ingest.delete_ann_ids(spark, root, [500, 501], batch_id=1)
    # re-ingest updated versions (biased so the values differ), then
    # force a rebuild with a drifted batch
    ann_ingest.ingest_ann_batch(
        _pool(spark, 500, 502, bias=0.05), root, batch_id=2
    )
    a = ann_ingest.ingest_ann_batch(
        _pool(spark, 700, 900, bias=0.3), root, batch_id=3
    )
    assert a == "rebuild"
    seg = ann_ingest.read_sidecar(root)["segments"]
    assert seg == ["seg_rebuild_00000003"]
    codes = spark.read.parquet(os.path.join(root, seg[0]))
    assert codes.count() == 500 + 100 - 2 + 2 + 200
    rows = codes.filter(F.col("vec_id") == 500).collect()
    assert len(rows) == 1 and rows[0]["ingest_epoch"] == 2


def test_streaming_auto_compaction_bounds_segments(spark, tmp_path):
    """compact_every (r13): the ANN streaming glue gains the lexical
    glue's bounded-probe-fan-out trigger — epochs that leave more than
    compact_every segments compact in-epoch (odd lifecycle id), and the
    probe relation is unchanged by the relayout."""
    import os

    root = str(tmp_path / "autocompact")
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    ann_ingest.init_ann_index(spark, _base(spark), root, n_cells=8)
    b1 = _pool(spark, 500, 550)
    b1.write.parquet(src)
    _pool(spark, 550, 600).write.mode("append").parquet(src)
    _pool(spark, 600, 650).write.mode("append").parquet(src)
    q = ann_ingest.run_ann_ingest(
        spark.readStream.schema(b1.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src),
        root,
        ckpt,
        compact_every=2,
    )
    q.awaitTermination(180)
    s = ann_ingest.read_sidecar(root)
    assert len(s["segments"]) <= 2
    # every ingested vector still serves through the compacted layout
    qv = _pool(spark, 500, 501).head()["embedding"]
    got = ann_ingest.probe_ann_index(spark, root, qv, k=2000, n_probe=8)
    ids = {r["vec_id"] for r in got.collect()}
    assert set(range(500, 650)) <= ids
    # the compaction decisions are on the metrics log at odd ids
    acts = {
        r["epoch"]: r["action"]
        for r in spark.read.parquet(os.path.join(root, "metrics")).collect()
    }
    assert "compact" in acts.values()
    assert all(e % 2 == 1 for e, a in acts.items() if a == "compact")


def _downgrade_to_pre_r13(spark, root):
    """Rewrite an index root into the pre-r13 on-disk shape: no
    ingest_epoch column on segment/corpus rows, no id_scheme in the
    sidecar — the state ADVICE r13 flagged as breaking every reader."""
    import json
    import shutil

    s = ann_ingest.read_sidecar(root)
    for seg in s["segments"]:
        p = os.path.join(root, seg)
        df = spark.read.parquet(p).drop("ingest_epoch")
        rows = df.collect()  # tiny test index; rewrite without lineage
        shutil.rmtree(p)
        spark.createDataFrame(rows, df.schema).write.mode(
            "overwrite"
        ).partitionBy("cell").parquet(p)
    for d in s.get("corpus_dirs", ["seed"]):
        p = os.path.join(root, "corpus", d)
        df = spark.read.parquet(p).drop("ingest_epoch")
        rows = df.collect()
        shutil.rmtree(p)
        spark.createDataFrame(rows, df.schema).write.mode(
            "overwrite"
        ).parquet(p)
    s.pop("id_scheme", None)
    s["stats"] = {str(k): list(v) for k, v in s["stats"].items()}
    with open(os.path.join(root, ann_ingest.SIDECAR), "w") as f:
        json.dump(s, f)


def test_pre_r13_root_without_ingest_epoch_serves_deletes(spark, tmp_path):
    """ADVICE r13 (medium): on a pre-r13 root — segment/corpus rows
    without ingest_epoch, tombstone logs without del_before — probe,
    compact, and vacuum must keep working with the old kill-everything
    delete semantics instead of failing AnalysisException. The shims:
    missing del_before reads as 2^31-1, missing ingest_epoch as a
    sentinel below every batch id."""
    from data_lake_for_e_commerce_analytics_spark.sources.fs import (
        write_epoch_files,
    )

    root = str(tmp_path / "legacyroot")
    ann_ingest.init_ann_index(spark, _base(spark), root, n_cells=4,
                              lloyd_iters=1)
    _downgrade_to_pre_r13(spark, root)

    # an OLD-style tombstone log: vec_id only, no del_before column
    old_log = spark.createDataFrame([(0,), (1,)], "vec_id long")
    write_epoch_files(old_log, os.path.join(root, "tombstones"), 1)
    # plus a newly issued (r13-style) delete on the legacy root
    ann_ingest.delete_ann_ids(spark, root, [2], batch_id=2)

    q = _base(spark).filter(F.col("vec_id") == 5).head()["embedding"]
    got = [
        r["vec_id"]
        for r in ann_ingest.probe_ann_index(
            spark, root, q, k=600, n_probe=4
        ).collect()
    ]
    assert not {0, 1, 2} & set(got)
    assert len(got) == 500 - 3

    # physical purge + storage reclamation on the legacy shapes
    assert ann_ingest.compact_segments(spark, root, batch_id=3) == 497
    assert ann_ingest.vacuum_corpus(spark, root, batch_id=4) == 497
    assert not os.path.isdir(os.path.join(root, "tombstones"))
    # a rebuild-path read over the legacy corpus works too (the
    # _read_corpus shim): ingest a drifted batch to force it
    drifted = _pool(spark, 500, 550, bias=5.0)
    assert ann_ingest.ingest_ann_batch(drifted, root, batch_id=5) == "rebuild"


def test_legacy_unspaced_root_resume_translates_ids(spark, tmp_path):
    """ADVICE r13 (medium): a pre-r13 root recorded UNSPACED lifecycle
    ids. Resuming it under the r13 spaced scheme would let a replay of
    stream batch b slip the monotone guard (2b > b) and double-ingest.
    apply_ann_batch must detect the legacy lineage (no id_scheme, has
    history) and keep running unspaced — the replay no-ops — and must
    refuse compact_every on that keyspace."""
    import json

    import pytest

    root = str(tmp_path / "unspaced")
    ann_ingest.init_ann_index(spark, _base(spark), root, n_cells=4,
                              lloyd_iters=1)
    # pre-r13 history: stream batch 0 was ingested UNSPACED (id 0)
    b0 = _pool(spark, 500, 520)
    ann_ingest.ingest_ann_batch(b0, root, batch_id=0)
    s = ann_ingest.read_sidecar(root)
    assert s["last_batch_id"] == 0
    s.pop("id_scheme")
    s["stats"] = {str(k): list(v) for k, v in s["stats"].items()}
    with open(os.path.join(root, ann_ingest.SIDECAR), "w") as f:
        json.dump(s, f)

    # upgraded binary replays stream batch 0 (at-least-once): must be a
    # pure no-op, not a double ingest at lifecycle id 2*0
    n_before = ann_ingest._read_corpus(spark, root).count()
    segs_before = ann_ingest.read_sidecar(root)["segments"]
    ann_ingest.apply_ann_batch(b0, 0, root)
    assert ann_ingest._read_corpus(spark, root).count() == n_before
    assert ann_ingest.read_sidecar(root)["segments"] == segs_before

    # new stream batch 1 continues the unspaced keyspace (id 1, not 2)
    b1 = _pool(spark, 520, 540)
    ann_ingest.apply_ann_batch(b1, 1, root)
    assert ann_ingest.read_sidecar(root)["last_batch_id"] == 1

    # in-epoch compaction has no id slot in the unspaced keyspace
    with pytest.raises(ValueError, match="unspaced"):
        ann_ingest.apply_ann_batch(_pool(spark, 540, 560), 2, root,
                                   compact_every=1)


def test_fresh_legacy_root_adopts_spaced_scheme(spark, tmp_path):
    """A legacy root with NO ingest history is safe to upgrade: the
    first apply stamps id_scheme=spaced2 and runs spaced."""
    import json

    root = str(tmp_path / "freshlegacy")
    ann_ingest.init_ann_index(spark, _base(spark), root, n_cells=4,
                              lloyd_iters=1)
    s = ann_ingest.read_sidecar(root)
    s.pop("id_scheme")
    s["stats"] = {str(k): list(v) for k, v in s["stats"].items()}
    with open(os.path.join(root, ann_ingest.SIDECAR), "w") as f:
        json.dump(s, f)
    ann_ingest.apply_ann_batch(_pool(spark, 500, 520), 3, root)
    s2 = ann_ingest.read_sidecar(root)
    assert s2["id_scheme"] == "spaced2"
    assert s2["last_batch_id"] == 6  # 2 * stream batch 3


def test_probe_multi_equals_single_probes_through_lifecycle(spark, tmp_path):
    """Batched segmented probe (r14): per-qid results must equal the
    single-query probe_ann_index for every query in the batch — on a
    multi-segment index, at reduced n_probe, and after a delete +
    re-ingest (liveness applied per version inside each scan)."""
    root = str(tmp_path / "annmulti")
    ann_ingest.init_ann_index(spark, _base(spark), root, n_cells=8,
                              lloyd_iters=1, qdr_max=100.0, clip_max=1.0)
    ann_ingest.ingest_ann_batch(_pool(spark, 500, 560), root, batch_id=0)
    corpus = ann_ingest._read_corpus(spark, root)
    qids = {1: 0, 2: 31, 3: 510}
    vecs = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in corpus.filter(
            F.col("vec_id").isin(list(qids.values()))
        ).collect()
    }
    queries = {qid: (vid, vecs[vid]) for qid, vid in qids.items()}

    def check(n_probe):
        multi = ann_ingest.probe_ann_index_multi(
            spark, root, queries, k=10, n_probe=n_probe
        ).collect()
        for qid, vid in qids.items():
            single = [
                (r["vec_id"], r["label"], r["sqdist"])
                for r in ann_ingest.probe_ann_index(
                    spark, root, vecs[vid], k=10, n_probe=n_probe,
                    exclude_vec_id=vid,
                ).collect()
            ]
            got = [
                (r["vec_id"], r["label"], r["sqdist"])
                for r in multi
                if r["qid"] == qid
            ]
            assert got == single, (qid, n_probe)

    check(8)   # full probe
    check(3)   # pruned probe: same cells per query by construction

    # delete one of query 1's near neighbors and re-ingest an updated
    # version: both forms must agree on the live relation
    top1 = ann_ingest.probe_ann_index(
        spark, root, vecs[0], k=3, n_probe=8, exclude_vec_id=0
    ).collect()
    victim = int(top1[0]["vec_id"])
    ann_ingest.delete_ann_ids(spark, root, [victim], batch_id=3)
    upd = corpus.filter(F.col("vec_id") == victim).select(
        "vec_id",
        (F.col("label") + F.lit(500)).cast("int").alias("label"),
        "embedding",
    )
    ann_ingest.ingest_ann_batch(upd, root, batch_id=4)
    check(8)


def test_probe_multi_with_predicate_matches_single(spark, tmp_path):
    """The batched probe's predicate/allowed_ids placement must match
    the single-query filtered probe per qid (pre-filter semantics)."""
    root = str(tmp_path / "annmultif")
    ann_ingest.init_ann_index(spark, _base(spark), root, n_cells=8,
                              lloyd_iters=1)
    corpus = ann_ingest._read_corpus(spark, root)
    vecs = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in corpus.filter(F.col("vec_id").isin([0, 31])).collect()
    }
    queries = {1: (0, vecs[0]), 2: (31, vecs[31])}
    pred = F.col("label") == 2
    multi = ann_ingest.probe_ann_index_multi(
        spark, root, queries, k=10, n_probe=8, predicate=pred
    ).collect()
    assert all(r["label"] == 2 for r in multi)
    for qid, vid in ((1, 0), (2, 31)):
        single = [
            (r["vec_id"], r["sqdist"])
            for r in ann_ingest.probe_ann_index(
                spark, root, vecs[vid], k=10, n_probe=8,
                exclude_vec_id=vid, predicate=pred,
            ).collect()
        ]
        got = [(r["vec_id"], r["sqdist"]) for r in multi if r["qid"] == qid]
        assert got == single and len(got) == 10
