"""End-to-end snapshot-to-snapshot streaming pipeline (VERDICT r6 task
8): incremental source pull → curation transform → exactly-once sink
commit, with crashes injected at every boundary of the
pull-transform-commit loop, replay-exact no-dup/no-loss verified
through the sink's own change feed (CDF)."""

import pytest
from pyspark.sql import functions as F

from data_lake_for_e_commerce_analytics_spark.operators.text import _quality_col
from data_lake_for_e_commerce_analytics_spark.sources import snapshots as S
from data_lake_for_e_commerce_analytics_spark.streaming.snapshot_stream import (
    consume_snapshot_changes,
    pump_snapshot_pipeline,
)


def _docs(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("document text body "),
            F.col("id").cast("string"),
            # odd ids get a degenerate (low-quality) body
            F.when(F.col("id") % 2 == 1, F.lit(" spam spam spam spam")).otherwise(
                F.lit(" with diverse useful tokens here")
            ),
        ).alias("text"),
    )


def _curate(batch):
    """The curation stage: score quality, keep the good half, stamp a
    token count — deterministic, so replays are byte-identical."""
    scored = batch.withColumn("quality", _quality_col()).withColumn(
        "n_tokens", F.size(F.split(F.col("text"), r"\s+"))
    )
    return scored.filter(F.col("quality") >= 0.52).select(
        "doc_id", "text", "quality", "n_tokens"
    )


def test_pipeline_exactly_once_under_crashes(spark, tmp_path):
    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    state = str(tmp_path / "consumer.json")

    pump = lambda: pump_snapshot_pipeline(
        spark, src, sink, state, _curate, app_id="curator"
    )

    # ---- epoch 1: clean run -------------------------------------------------
    S.snapshot_write(_docs(spark, 0, 40), src)  # source v1
    v = pump()
    assert v == 1
    expect1 = sorted(r["doc_id"] for r in _curate(_docs(spark, 0, 40)).collect())
    assert sorted(r["doc_id"] for r in S.snapshot_read(spark, sink).collect()) == expect1

    # ---- epoch 2: crash AFTER sink commit, BEFORE ack ----------------------
    S.snapshot_write(_docs(spark, 40, 80), src, mode="append")  # source v2
    df, ack = consume_snapshot_changes(spark, src, state)
    S.snapshot_write(
        _curate(df.drop("change_type")), sink, mode="append",
        txn_id=f"curator/upto{ack.to_version}",
    )
    # ... crash: ack never runs. Restart:
    v = pump()
    # the replayed commit found its txn_id and NO-OPED onto the same
    # sink version — no duplicate rows, no duplicate version
    assert v == 2 and S.snapshot_versions(spark, sink) == [1, 2]
    got = [r["doc_id"] for r in S.snapshot_read(spark, sink).collect()]
    assert len(got) == len(set(got))

    # ---- epoch 3: crash BEFORE the sink commit (mid-transform) -------------
    S.snapshot_write(_docs(spark, 80, 120), src, mode="append")  # source v3
    df, _ack = consume_snapshot_changes(spark, src, state)
    df.collect()  # the work ran, then the process died: no commit, no ack
    v = pump()  # restart re-pulls the same range and lands it
    assert v == 3

    # ---- converged state: every curated doc exactly once, none lost --------
    expect_all = sorted(
        r["doc_id"] for r in _curate(_docs(spark, 0, 120)).collect()
    )
    final = sorted(r["doc_id"] for r in S.snapshot_read(spark, sink).collect())
    assert final == expect_all

    # ---- the CDF proof: each sink version added its epoch exactly once -----
    added_per_epoch = []
    prev = None
    for v_old, v_new in [(1, 2), (2, 3)]:
        cdf = S.snapshot_row_changes(
            spark, sink, v_old, v_new, ["doc_id"], ["quality", "n_tokens"]
        )
        kinds = {r["change_type"] for r in cdf.collect()}
        assert kinds <= {"added"}  # appends only: nothing mutated or removed
        added_per_epoch.append(cdf.count())
    epoch2 = _curate(_docs(spark, 40, 80)).count()
    epoch3 = _curate(_docs(spark, 80, 120)).count()
    assert added_per_epoch == [epoch2, epoch3]

    # idle pump: nothing new, no sink version burned
    assert pump() is None
    assert S.snapshot_versions(spark, sink) == [1, 2, 3]


def test_pipeline_handles_source_merge_commits_via_cdf(spark, tmp_path):
    """A source that sees MERGE commits (not just appends) feeds the
    pipeline through the row-diff CDF path when key/compare cols are
    given — the transform then sees change records."""
    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    state = str(tmp_path / "consumer.json")

    S.snapshot_write(
        spark.createDataFrame(
            [(1, "a", 1), (2, "b", 1)], "k int, v string, ver int"
        ),
        src,
    )
    keep_changes = lambda df: df.select("k", "change_type", "new_v")
    v = pump_snapshot_pipeline(
        spark, src, sink, state, keep_changes, app_id="cdc",
        key_cols=["k"], compare_cols=["v"],
    )
    assert v == 1

    S.snapshot_merge(
        spark.createDataFrame([(2, "B", 2), (3, "c", 1)], "k int, v string, ver int"),
        src, ["k"], "ver",
    )
    v = pump_snapshot_pipeline(
        spark, src, sink, state, keep_changes, app_id="cdc",
        key_cols=["k"], compare_cols=["v"],
    )
    assert v == 2
    rows = {
        (r["k"], r["change_type"], r["new_v"])
        for r in S.snapshot_read(spark, sink).collect()
    }
    assert (2, "changed", "B") in rows and (3, "added", "c") in rows


def test_pipeline_pins_range_across_interleaved_source_commit(spark, tmp_path):
    """ADVICE r7 (high): crash AFTER the sink commit but BEFORE the ack,
    then the SOURCE gains a commit before the replay. Without range
    pinning the replay would pull the widened range (upto3), derive a
    fresh txn_id, and re-append the already-committed epoch-2 rows as
    duplicates. The pump persists the intended upper bound ('pending')
    before the sink commit, so the replay consumes exactly the pinned
    range, re-derives txn upto2, and the commit no-ops."""
    from data_lake_for_e_commerce_analytics_spark.streaming.snapshot_stream import (
        _read_consumer_state,
        _write_consumer_state,
    )

    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    state = str(tmp_path / "consumer.json")
    pump = lambda: pump_snapshot_pipeline(
        spark, src, sink, state, _curate, app_id="curator"
    )

    S.snapshot_write(_docs(spark, 0, 40), src)  # source v1
    assert pump() == 1

    # epoch 2 crashes between sink commit and ack — replicate the
    # pump's own protocol steps (pin, commit, then die):
    S.snapshot_write(_docs(spark, 40, 80), src, mode="append")  # source v2
    df, ack = consume_snapshot_changes(spark, src, state)
    _write_consumer_state(
        spark, state, {"version": 1, "pending": ack.to_version}
    )
    S.snapshot_write(
        _curate(df.drop("change_type")), sink, mode="append",
        txn_id=f"curator/upto{ack.to_version}",
    )
    # ... crash. The source commits v3 BEFORE the pipeline restarts:
    S.snapshot_write(_docs(spark, 80, 120), src, mode="append")  # source v3

    v = pump()  # replay: pinned to v2 → txn upto2 → no-op
    assert v == 2 and S.snapshot_versions(spark, sink) == [1, 2]
    # the pin cleared on ack; the NEXT pump lands v3 normally
    assert _read_consumer_state(spark, state) == {"version": 2}
    assert pump() == 3

    got = sorted(r["doc_id"] for r in S.snapshot_read(spark, sink).collect())
    expect = sorted(
        r["doc_id"] for r in _curate(_docs(spark, 0, 120)).collect()
    )
    assert got == expect  # exactly once: no duplicates, nothing lost


def test_pipeline_replays_pin_when_crash_precedes_sink_commit(spark, tmp_path):
    """Crash AFTER the pin but BEFORE the sink commit: the restarted
    pump must honor the pin (consume exactly the pinned range), commit
    it for the first time, and only then move on."""
    from data_lake_for_e_commerce_analytics_spark.streaming.snapshot_stream import (
        _write_consumer_state,
    )

    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    state = str(tmp_path / "consumer.json")
    pump = lambda: pump_snapshot_pipeline(
        spark, src, sink, state, _curate, app_id="curator"
    )

    S.snapshot_write(_docs(spark, 0, 40), src)  # v1
    assert pump() == 1
    S.snapshot_write(_docs(spark, 40, 80), src, mode="append")  # v2
    df, ack = consume_snapshot_changes(spark, src, state)
    _write_consumer_state(
        spark, state, {"version": 1, "pending": ack.to_version}
    )
    # ... crash before the sink commit; source gains v3 meanwhile
    S.snapshot_write(_docs(spark, 80, 120), src, mode="append")  # v3

    assert pump() == 2  # pinned range commits (v2's rows only)
    epoch2 = sorted(
        r["doc_id"] for r in _curate(_docs(spark, 40, 80)).collect()
    )
    cdf = S.snapshot_row_changes(
        spark, sink, 1, 2, ["doc_id"], ["quality", "n_tokens"]
    )
    assert sorted(r["doc_id"] for r in cdf.collect()) == epoch2
    assert pump() == 3  # v3 follows cleanly
