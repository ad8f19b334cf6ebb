"""Merge/upsert (SCD1 keep-latest) semantics and partition-pruned rewrite."""

from pyspark.sql import functions as F

from data_lake_for_e_commerce_analytics_spark.operators import upsert


def _orders(spark, rows):
    return spark.createDataFrame(
        rows, ["order_id", "status", "version", "day"]
    )


def test_merge_keep_latest_prefers_higher_version(spark):
    base = _orders(spark, [("o1", "created", 1, "d1"), ("o2", "created", 1, "d1")])
    delta = _orders(spark, [("o1", "shipped", 2, "d1"), ("o3", "created", 1, "d2")])
    got = {r["order_id"]: r["status"] for r in
           upsert.merge_keep_latest(base, delta, ["order_id"], "version").collect()}
    assert got == {"o1": "shipped", "o2": "created", "o3": "created"}


def test_merge_tie_prefers_delta(spark):
    base = _orders(spark, [("o1", "base", 1, "d1")])
    delta = _orders(spark, [("o1", "delta", 1, "d1")])
    [row] = upsert.merge_keep_latest(base, delta, ["order_id"], "version").collect()
    assert row["status"] == "delta"


def test_merge_into_path_roundtrip(spark, tmp_path):
    path = str(tmp_path / "merge_tbl")
    upsert.merge_into_path(spark, path, _orders(spark, [("o1", "created", 1, "d1")]),
                           ["order_id"], "version")
    upsert.merge_into_path(spark, path, _orders(spark, [("o1", "shipped", 2, "d1"),
                                                        ("o2", "created", 1, "d1")]),
                           ["order_id"], "version")
    got = {r["order_id"]: r["status"] for r in spark.read.parquet(path).collect()}
    assert got == {"o1": "shipped", "o2": "created"}


def test_merge_partitioned_rewrites_only_touched(spark, tmp_path):
    path = str(tmp_path / "merge_part")
    base = _orders(spark, [("o1", "created", 1, "d1"), ("o2", "created", 1, "d2")])
    upsert.merge_into_path(spark, path, base, ["order_id"], "version",
                           partition_cols=["day"])
    import os
    d2_files_before = set(os.listdir(f"{path}/day=d2"))
    # delta touches only d1
    upsert.merge_into_path(spark, path,
                           _orders(spark, [("o1", "shipped", 2, "d1")]),
                           ["order_id"], "version", partition_cols=["day"])
    d2_files_after = set(os.listdir(f"{path}/day=d2"))
    assert d2_files_before == d2_files_after  # untouched partition intact
    got = {r["order_id"]: r["status"] for r in spark.read.parquet(path).collect()}
    assert got == {"o1": "shipped", "o2": "created"}


def test_jsonl_roundtrip(spark, tmp_path):
    from data_lake_for_e_commerce_analytics_spark.sources import json_source
    from pyspark.sql import types as T

    df = spark.createDataFrame([(1, "hello"), (2, "world")], ["doc_id", "text"])
    path = str(tmp_path / "docs_jsonl")
    json_source.write_jsonl(df, path)
    schema = T.StructType([T.StructField("doc_id", T.LongType()),
                           T.StructField("text", T.StringType())])
    back = json_source.read_jsonl(spark, path, schema)
    assert {(r["doc_id"], r["text"]) for r in back.collect()} == {(1, "hello"), (2, "world")}


def test_snapshot_diff_classification(spark):
    from data_lake_for_e_commerce_analytics_spark.operators import upsert as _u

    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", None)], ["k", "status", "val"]
    )
    new = spark.createDataFrame(
        [(2, "b", 25.0), (3, "c", None), (4, "d", 40.0)], ["k", "status", "val"]
    )
    got = {
        r["change_type"]: r["n_rows"]
        for r in _u.snapshot_diff(old, new, ["k"], ["status", "val"]).collect()
    }
    # 1 removed (k=1), 1 changed (k=2), 1 unchanged (k=3: NULL==NULL null-safely), 1 added (k=4)
    assert got == {"added": 1, "changed": 1, "removed": 1, "unchanged": 1}


def test_maintain_aggregate_equals_recompute_and_drops_empty_groups(spark):
    from pyspark.sql import functions as F

    from data_lake_for_e_commerce_analytics_spark.operators import upsert

    facts = spark.createDataFrame(
        [("a", 10), ("a", 20), ("b", 5), ("c", 7)], ["k", "v"]
    )
    base = facts.groupBy("k").agg(
        F.count(F.lit(1)).cast("long").alias("n"), F.sum("v").alias("v")
    )
    # delete BOTH 'b' and 'c' rows (c's group must vanish), insert new 'd'
    cdc = spark.createDataFrame(
        [("b", "D", 5), ("c", "D", 7), ("d", "I", 9), ("a", "I", 1)],
        ["k", "op", "v"],
    )
    out = {r["k"]: (r["n"], r["v"]) for r in
           upsert.maintain_aggregate(base, cdc, ["k"], "n", {"v": "v"}).collect()}
    # recompute from the effective fact set: b emptied but had count 1-1=0
    # only for its own rows; c cancels entirely; both groups must be gone
    assert out == {"a": (3, 31), "d": (1, 9)}


def test_stream_maintain_aggregate_equals_batch(spark, tmp_path):
    from pyspark.sql import functions as F

    from data_lake_for_e_commerce_analytics_spark.streaming import upsert_stream

    # two CDC epochs streamed file-by-file
    e1 = spark.createDataFrame(
        [("a", "I", 10), ("a", "I", 20), ("b", "I", 5)], ["k", "op", "v"]
    )
    e2 = spark.createDataFrame(
        [("b", "D", 5), ("c", "I", 7)], ["k", "op", "v"]
    )
    src = str(tmp_path / "cdc")
    e1.write.parquet(src + "/e=1")
    e2.write.parquet(src + "/e=2")
    stream = spark.readStream.schema(e1.schema).option(
        "maxFilesPerTrigger", "1").parquet(src)
    agg_path = str(tmp_path / "agg")
    q = upsert_stream.stream_maintain_aggregate(
        stream, agg_path, ["k"], str(tmp_path / "ckpt"), sum_cols={"v": "v"}
    )
    q.awaitTermination(120)
    out = {r["k"]: (r["n"], r["v"]) for r in spark.read.parquet(agg_path).collect()}
    # equal to maintaining both epochs in one batch: a(2,30), c(1,7); b gone
    assert out == {"a": (2, 30), "c": (1, 7)}


def test_scd2_history_collapses_and_versions(spark):
    from data_lake_for_e_commerce_analytics_spark.operators import upsert

    rows = [
        # key 1: A, A (collapsed), B, B (collapsed), A  -> 3 versions
        (1, "A", "2024-01-01", 10),
        (1, "A", "2024-01-05", 11),
        (1, "B", "2024-02-01", 12),
        (1, "B", "2024-02-10", 13),
        (1, "A", "2024-03-01", 14),
        # key 2: single row -> 1 current version
        (2, "X", "2024-01-02", 20),
    ]
    log = spark.createDataFrame(rows, "k long, attr string, ts string, seq long")
    hist = upsert.scd2_history(log, ["k"], ["attr"], "ts", "seq")
    h1 = [r.asDict() for r in hist.filter("k = 1").orderBy("version").collect()]
    assert [r["attr"] for r in h1] == ["A", "B", "A"]
    assert [r["valid_from"] for r in h1] == ["2024-01-01", "2024-02-01", "2024-03-01"]
    assert [r["valid_to"] for r in h1] == ["2024-02-01", "2024-03-01", None]
    assert [r["is_current"] for r in h1] == [0, 0, 1]
    assert [r["version"] for r in h1] == [1, 2, 3]
    h2 = hist.filter("k = 2").collect()
    assert len(h2) == 1 and h2[0]["is_current"] == 1
    # exactly one current row per key, always
    cur = hist.groupBy("k").agg(F.sum("is_current").alias("s")).collect()
    assert all(r["s"] == 1 for r in cur)


def test_scd2_same_ts_ordered_by_seq(spark):
    from data_lake_for_e_commerce_analytics_spark.operators import upsert

    rows = [(1, "A", "2024-01-01", 2), (1, "B", "2024-01-01", 1)]
    log = spark.createDataFrame(rows, "k long, attr string, ts string, seq long")
    hist = upsert.scd2_history(log, ["k"], ["attr"], "ts", "seq").orderBy("version")
    assert [r["attr"] for r in hist.collect()] == ["B", "A"]


def test_scd2_as_of_snapshot(spark):
    from data_lake_for_e_commerce_analytics_spark.operators import upsert

    rows = [
        (1, "A", "2024-01-01", 10),
        (1, "B", "2024-02-01", 11),
        (2, "X", "2024-03-01", 20),
    ]
    log = spark.createDataFrame(rows, "k long, attr string, ts string, seq long")
    hist = upsert.scd2_history(log, ["k"], ["attr"], "ts", "seq")
    snap = {r["k"]: r["attr"] for r in upsert.scd2_as_of(hist, ["k"], "2024-01-15").collect()}
    assert snap == {1: "A"}  # key 2 does not exist yet at that date
    snap2 = {r["k"]: r["attr"] for r in upsert.scd2_as_of(hist, ["k"], "2024-06-01").collect()}
    assert snap2 == {1: "B", 2: "X"}


def test_streamed_scd2_equals_batch_build(spark, tables, tmp_path):
    """Two in-order CDC epochs through the foreachBatch SCD2 maintainer
    must produce EXACTLY the history the one-shot batch build derives
    from the concatenated log, and only touched buckets are rewritten
    semantically (bystander keys' rows survive verbatim)."""
    from data_lake_for_e_commerce_analytics_spark.operators import upsert
    from data_lake_for_e_commerce_analytics_spark.streaming import scd2_stream

    log = tables["orders"].select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_orderdate").alias("ts"),
        F.col("o_orderkey").alias("seq"),
    )
    cut = "1995-01-01"
    e1 = log.filter(F.col("ts") < cut)
    e2 = log.filter(F.col("ts") >= cut)

    hist_path = str(tmp_path / "scd2_hist")
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")

    e1.write.mode("overwrite").parquet(src)
    q = scd2_stream.run_scd2_ingest(
        spark.readStream.schema(e1.schema).parquet(src),
        hist_path, ["custkey"], ["status"], "ts", "seq", ckpt,
    )
    q.awaitTermination(180)
    e2.write.mode("append").parquet(src)
    q = scd2_stream.run_scd2_ingest(
        spark.readStream.schema(e1.schema).parquet(src),
        hist_path, ["custkey"], ["status"], "ts", "seq", ckpt,
    )
    q.awaitTermination(180)

    pub = ["custkey", "status", "valid_from", "valid_to", "version", "is_current"]
    got = spark.read.parquet(hist_path).select(*pub)
    want = upsert.scd2_history(log, ["custkey"], ["status"], "ts", "seq").select(*pub)
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
    # invariant: exactly one current version per key
    cur = got.groupBy("custkey").agg(F.sum("is_current").alias("s"))
    assert cur.filter(F.col("s") != 1).count() == 0


def test_scd2_ingest_touches_only_affected_keys(spark, tmp_path):
    """A second batch for ONE key must leave every other key's history
    rows byte-identical (affected-key-scoped rebuild)."""
    from data_lake_for_e_commerce_analytics_spark.streaming import scd2_stream

    rows1 = [(k, "A", "2024-01-01", k * 10) for k in range(1, 9)]
    b1 = spark.createDataFrame(rows1, "k long, attr string, ts string, seq long")
    hist_path = str(tmp_path / "hist")
    scd2_stream.scd2_ingest_batch(b1, hist_path, ["k"], ["attr"], "ts", "seq")
    before = {
        r["k"]: r
        for r in spark.read.parquet(hist_path).filter("k <> 3").collect()
    }
    b2 = spark.createDataFrame(
        [(3, "B", "2024-02-01", 999)], "k long, attr string, ts string, seq long"
    )
    scd2_stream.scd2_ingest_batch(b2, hist_path, ["k"], ["attr"], "ts", "seq")
    after_all = spark.read.parquet(hist_path)
    after = {r["k"]: r for r in after_all.filter("k <> 3").collect()}
    assert before == after
    k3 = after_all.filter("k = 3").orderBy("version").collect()
    assert [r["attr"] for r in k3] == ["A", "B"]
    assert [r["is_current"] for r in k3] == [0, 1]


def test_scd2_ingest_order_independent_within_epoch(spark, tables, tmp_path):
    """VERDICT r5 task 7 part 1: WITHIN an epoch arrival order is
    irrelevant — per-key change rows shuffled across partitions and
    reversed must produce the identical history to the ordered feed."""
    from data_lake_for_e_commerce_analytics_spark.streaming import scd2_stream

    log = tables["orders"].select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_orderdate").alias("ts"),
        F.col("o_orderkey").alias("seq"),
    )
    cut = "1995-01-01"
    pub = ["custkey", "status", "valid_from", "valid_to", "version", "is_current"]

    paths = []
    for tag, scramble in (("a", False), ("b", True)):
        hp = str(tmp_path / f"hist_{tag}")
        for epoch in (log.filter(F.col("ts") < cut), log.filter(F.col("ts") >= cut)):
            if scramble:
                epoch = (
                    epoch.orderBy(F.desc("seq"))
                    .repartition(7, F.col("seq") % 5)
                )
            scd2_stream.scd2_ingest_batch(
                epoch, hp, ["custkey"], ["status"], "ts", "seq"
            )
        paths.append(hp)

    a = spark.read.parquet(paths[0]).select(*pub)
    b = spark.read.parquet(paths[1]).select(*pub)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_scd2_ingest_quarantines_late_rows(spark, tmp_path):
    """VERDICT r5 task 7 part 2: a change at-or-below its key's
    persisted high-watermark is rejected from the apply (it could erase
    a collapse-dropped reversion) and lands in the quarantine dir; the
    history stays byte-identical. The adversarial case: the late row
    falls BETWEEN two rows the collapse merged."""
    from data_lake_for_e_commerce_analytics_spark.streaming import scd2_stream

    hp = str(tmp_path / "hist")
    qp = str(tmp_path / "quarantine")
    # epoch 1: A@t1, A@t3 — collapses to one version, but the
    # watermark must remember t3 (the SEEN frontier, not the retained)
    b1 = spark.createDataFrame(
        [(1, "A", "2024-01-01", 10), (1, "A", "2024-03-01", 30),
         (2, "X", "2024-01-01", 11)],
        "k long, attr string, ts string, seq long",
    )
    scd2_stream.scd2_ingest_batch(
        b1, hp, ["k"], ["attr"], "ts", "seq", quarantine_path=qp, batch_id=0
    )
    before = sorted(map(tuple, spark.read.parquet(hp).collect()))

    # epoch 2: B@t2 for key 1 is LATE (t2 < seen frontier t3) even
    # though t2 is after the retained version's valid_from t1; key 2
    # gets a legitimate on-time change
    b2 = spark.createDataFrame(
        [(1, "B", "2024-02-01", 20), (2, "Y", "2024-04-01", 40)],
        "k long, attr string, ts string, seq long",
    )
    scd2_stream.scd2_ingest_batch(
        b2, hp, ["k"], ["attr"], "ts", "seq", quarantine_path=qp, batch_id=1
    )

    hist = spark.read.parquet(hp)
    # key 1 untouched (its only change was late): still one version, A
    k1_before = sorted(t for t in before if t[0] == 1)
    assert sorted(map(tuple, hist.filter("k = 1").collect())) == k1_before
    assert [r["attr"] for r in hist.filter("k = 1").collect()] == ["A"]
    assert [r["attr"] for r in hist.filter("k = 2").orderBy("version").collect()] == ["X", "Y"]
    q = spark.read.parquet(qp).collect()
    assert len(q) == 1 and q[0]["k"] == 1 and q[0]["attr"] == "B"

    # an epoch replay after SUCCESS (the at-least-once case) converges:
    # the persisted previous-watermark lets the retry re-derive the
    # first attempt's exact split — history unchanged, quarantine still
    # exactly one copy, and key 2's re-applied row collapses away
    snap = sorted(map(tuple, hist.collect()))
    scd2_stream.scd2_ingest_batch(
        b2, hp, ["k"], ["attr"], "ts", "seq", quarantine_path=qp, batch_id=1
    )
    assert sorted(map(tuple, spark.read.parquet(hp).collect())) == snap
    q2 = spark.read.parquet(qp).collect()
    assert len(q2) == 1 and q2[0]["k"] == 1 and q2[0]["attr"] == "B"


def test_streamed_scd2_quarantine_end_to_end(spark, tmp_path):
    """The full run_scd2_ingest path (checkpointed foreachBatch with
    real batch ids): epoch 2 carries one late change (below the seen
    frontier) and one on-time change — the stream must apply the
    on-time row, quarantine the late one, and keep the late key's
    history untouched."""
    from data_lake_for_e_commerce_analytics_spark.streaming import scd2_stream

    hp = str(tmp_path / "hist")
    qp = str(tmp_path / "q")
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")

    b1 = spark.createDataFrame(
        [(1, "A", "2024-01-01", 10), (1, "A", "2024-03-01", 30),
         (2, "X", "2024-01-01", 11)],
        "k long, attr string, ts string, seq long",
    )
    b1.write.mode("overwrite").parquet(src)
    q = scd2_stream.run_scd2_ingest(
        spark.readStream.schema(b1.schema).parquet(src),
        hp, ["k"], ["attr"], "ts", "seq", ckpt, quarantine_path=qp,
    )
    q.awaitTermination(180)

    b2 = spark.createDataFrame(
        [(1, "B", "2024-02-01", 20), (2, "Y", "2024-04-01", 40)],
        "k long, attr string, ts string, seq long",
    )
    b2.write.mode("append").parquet(src)
    q = scd2_stream.run_scd2_ingest(
        spark.readStream.schema(b1.schema).parquet(src),
        hp, ["k"], ["attr"], "ts", "seq", ckpt, quarantine_path=qp,
    )
    q.awaitTermination(180)

    hist = spark.read.parquet(hp)
    assert [r["attr"] for r in hist.filter("k = 1").collect()] == ["A"]
    assert [
        r["attr"] for r in hist.filter("k = 2").orderBy("version").collect()
    ] == ["X", "Y"]
    quar = spark.read.parquet(qp).collect()
    assert len(quar) == 1 and quar[0]["k"] == 1 and quar[0]["attr"] == "B"


def test_scd2_history_random_sequences_vs_model(spark):
    """Model-based pin of the cornerstone SCD2 builder: 200 random
    per-key change sequences (duplicate attrs, same-ts ties, NULL
    attributes, single-row keys) evaluated in ONE Spark job, compared
    key-by-key against a pure-Python simulator of the collapse +
    versioning semantics."""
    import random

    rnd = random.Random(23)
    rows = []
    model = {}
    for k in range(200):
        n = rnd.randint(1, 8)
        seq_vals = rnd.sample(range(100), n)
        changes = []
        for j in range(n):
            ts = f"2024-{rnd.randint(1, 12):02d}-{rnd.randint(1, 28):02d}"
            attr = rnd.choice(["A", "B", "C", None])
            changes.append((ts, seq_vals[j], attr))
        for ts, sq, attr in changes:
            rows.append((k, attr, ts, sq))
        # model: sort by (ts, seq), collapse runs of equal attr (null-safe)
        ordered = sorted(changes, key=lambda c: (c[0], c[1]))
        versions = []
        for ts, sq, attr in ordered:
            if not versions or versions[-1][1] != attr:
                versions.append((ts, attr))
        model[k] = [
            (
                attr,
                ts,
                versions[i + 1][0] if i + 1 < len(versions) else None,
                i + 1,
                1 if i + 1 == len(versions) else 0,
            )
            for i, (ts, attr) in enumerate(versions)
        ]

    log = spark.createDataFrame(rows, "k long, attr string, ts string, seq long")
    hist = upsert.scd2_history(log, ["k"], ["attr"], "ts", "seq")
    got = {}
    for r in hist.collect():
        got.setdefault(r["k"], []).append(
            (r["attr"], r["valid_from"], r["valid_to"], r["version"], r["is_current"])
        )
    for k in model:
        assert sorted(got[k], key=lambda v: v[3]) == model[k], k
    assert set(got) == set(model)


def test_scd2_ingest_random_epochs_vs_model(spark, tmp_path):
    """Model-based pin of the FULL incremental path: 100 random keys,
    change rows scattered over 3 epochs with deliberate late rows
    (below the key's seen frontier at their epoch). A pure-Python
    simulator tracks, per key, the applied set + frontier exactly as
    the watermark contract specifies; the persisted history must equal
    collapse(applied) and the quarantine must hold exactly the late
    rows."""
    import random

    from data_lake_for_e_commerce_analytics_spark.streaming import scd2_stream

    rnd = random.Random(41)
    per_epoch = {0: [], 1: [], 2: []}
    for k in range(100):
        n = rnd.randint(1, 9)
        seqs = rnd.sample(range(1000), n)
        for j in range(n):
            ts = f"2024-{rnd.randint(1, 12):02d}-{rnd.randint(1, 28):02d}"
            attr = rnd.choice(["A", "B", "C"])
            per_epoch[rnd.randint(0, 2)].append((k, attr, ts, seqs[j]))

    # simulator
    applied = {}   # k -> list[(ts, seq, attr)]
    frontier = {}  # k -> (ts, seq)
    late_rows = set()
    for e in range(3):
        for k, attr, ts, sq in per_epoch[e]:
            f = frontier.get(k)
            if f is not None and (ts, sq) <= f:
                late_rows.add((k, attr, ts, sq))
            else:
                applied.setdefault(k, []).append((ts, sq, attr))
        # frontier advances AFTER the epoch applies (epoch rows are
        # mutually on-time regardless of intra-epoch order)
        for k, attr, ts, sq in per_epoch[e]:
            if (k, attr, ts, sq) not in late_rows:
                f = frontier.get(k)
                if f is None or (ts, sq) > f:
                    frontier[k] = (ts, sq)

    hp, qp = str(tmp_path / "hist"), str(tmp_path / "q")
    for e in range(3):
        df = spark.createDataFrame(
            per_epoch[e], "k long, attr string, ts string, seq long"
        )
        scd2_stream.scd2_ingest_batch(
            df, hp, ["k"], ["attr"], "ts", "seq", batch_id=e, quarantine_path=qp
        )

    # quarantine contents match the model's late set exactly
    import os

    got_late = set()
    if os.path.isdir(qp):
        got_late = {
            (r["k"], r["attr"], r["ts"], r["seq"])
            for r in spark.read.parquet(qp).collect()
        }
    assert got_late == late_rows

    # history equals collapse(applied) per key
    hist = spark.read.parquet(hp)
    got = {}
    for r in hist.collect():
        got.setdefault(r["k"], []).append(
            (r["version"], r["attr"], r["valid_from"], r["valid_to"], r["is_current"])
        )
    for k, rows_k in applied.items():
        ordered = sorted(rows_k)
        versions = []
        for ts, sq, attr in ordered:
            if not versions or versions[-1][1] != attr:
                versions.append((ts, attr))
        want = [
            (
                i + 1,
                attr,
                ts,
                versions[i + 1][0] if i + 1 < len(versions) else None,
                1 if i + 1 == len(versions) else 0,
            )
            for i, (ts, attr) in enumerate(versions)
        ]
        assert sorted(got[k]) == want, k
    assert set(got) == set(applied)


def test_crashed_first_write_does_not_wedge(spark, tmp_path):
    """A dir holding only _temporary debris (crashed first write) must
    route retries into the initial build, not wedge every subsequent
    run on UNABLE_TO_INFER_SCHEMA."""
    import os

    path = str(tmp_path / "tbl")
    os.makedirs(path + "/_temporary/0")  # the crash residue shape
    out = upsert.merge_into_path(
        spark, path,
        _orders(spark, [("o1", "created", 1, "d1")]),
        ["order_id"], "version",
    )
    assert {r["order_id"] for r in out.collect()} == {"o1"}


def test_scd2_fresh_stream_scope_does_not_misread_replays(spark, tmp_path):
    """VERDICT-review finding: batch ids are only meaningful within one
    checkpoint. A NEW stream (different scope) reaching the same
    numeric batch_id over an existing history must judge lateness
    against the CURRENT watermark, not the previous one — otherwise a
    late row below the real frontier would be applied."""
    from data_lake_for_e_commerce_analytics_spark.streaming import scd2_stream

    hp = str(tmp_path / "hist")
    # stream 1, batch 5: advances key 1's frontier to t3 (t1 collapsed)
    b = spark.createDataFrame(
        [(1, "A", "2024-01-01", 10), (1, "A", "2024-03-01", 30)],
        "k long, attr string, ts string, seq long",
    )
    scd2_stream.scd2_ingest_batch(
        b, hp, ["k"], ["attr"], "ts", "seq", batch_id=5, scope="ckpt1"
    )
    # stream 2 (fresh checkpoint) also at batch_id 5: B@t2 is BELOW the
    # real frontier t3 and must be rejected, not applied via the
    # previous-watermark replay path
    late = spark.createDataFrame(
        [(1, "B", "2024-02-01", 20)], "k long, attr string, ts string, seq long"
    )
    qp = str(tmp_path / "q")
    scd2_stream.scd2_ingest_batch(
        late, hp, ["k"], ["attr"], "ts", "seq", batch_id=5, scope="ckpt2",
        quarantine_path=qp,
    )
    hist = spark.read.parquet(hp)
    assert [r["attr"] for r in hist.filter("k = 1").collect()] == ["A"]
    assert spark.read.parquet(qp).count() == 1

    # but the SAME scope at batch 5 IS a replay and re-derives the
    # original split (idempotent, nothing quarantined for it)
    scd2_stream.scd2_ingest_batch(
        b, hp, ["k"], ["attr"], "ts", "seq", batch_id=5, scope="ckpt1",
        quarantine_path=qp,
    )
    assert [r["attr"] for r in spark.read.parquet(hp).filter("k = 1").collect()] == ["A"]
    assert spark.read.parquet(qp).count() == 1


def test_fresh_stream_scope_prevents_false_replay(spark, tmp_path):
    """ADVICE r6 (high): run_scd2_ingest must scope replay detection by
    checkpoint. A NEW stream (fresh checkpoint, batch ids restarting at
    0) over an existing history must not mistake its batch 0 for a
    replay of the FIRST stream's batch 0 — that would judge lateness
    against the weaker previous watermark and apply a late row that
    must be quarantined (erasing a collapse-dropped reversion)."""
    from data_lake_for_e_commerce_analytics_spark.streaming import scd2_stream

    hp = str(tmp_path / "hist")
    qp = str(tmp_path / "q")

    # stream 1, batch 0: A@t1, A@t3 collapse to one version; the seen
    # frontier (watermark) is t3 with NO previous watermark
    b1 = spark.createDataFrame(
        [(1, "A", "2024-01-01", 10), (1, "A", "2024-03-01", 30)],
        "k long, attr string, ts string, seq long",
    )
    src1, ck1 = str(tmp_path / "src1"), str(tmp_path / "ck1")
    b1.write.mode("overwrite").parquet(src1)
    q = scd2_stream.run_scd2_ingest(
        spark.readStream.schema(b1.schema).parquet(src1),
        hp, ["k"], ["attr"], "ts", "seq", ck1, quarantine_path=qp,
    )
    q.awaitTermination(180)

    # stream 2, fresh checkpoint, ALSO batch 0: B@t2 is late (t2 < t3).
    # Unscoped, the stored '#0' tag matches and the row wrongly applies.
    b2 = spark.createDataFrame(
        [(1, "B", "2024-02-01", 20)],
        "k long, attr string, ts string, seq long",
    )
    src2, ck2 = str(tmp_path / "src2"), str(tmp_path / "ck2")
    b2.write.mode("overwrite").parquet(src2)
    q = scd2_stream.run_scd2_ingest(
        spark.readStream.schema(b2.schema).parquet(src2),
        hp, ["k"], ["attr"], "ts", "seq", ck2, quarantine_path=qp,
    )
    q.awaitTermination(180)

    hist = spark.read.parquet(hp)
    assert [r["attr"] for r in hist.filter("k = 1").collect()] == ["A"]
    quar1 = spark.read.parquet(qp).collect()
    assert len(quar1) == 1 and quar1[0]["attr"] == "B"

    # stream 3, another fresh checkpoint, batch 0 again, another late
    # row: its quarantine files must NOT overwrite stream 2's (scoped
    # epoch file names) — both late rows survive in the shared dir
    b3 = spark.createDataFrame(
        [(1, "C", "2024-02-15", 25)],
        "k long, attr string, ts string, seq long",
    )
    src3, ck3 = str(tmp_path / "src3"), str(tmp_path / "ck3")
    b3.write.mode("overwrite").parquet(src3)
    q = scd2_stream.run_scd2_ingest(
        spark.readStream.schema(b3.schema).parquet(src3),
        hp, ["k"], ["attr"], "ts", "seq", ck3, quarantine_path=qp,
    )
    q.awaitTermination(180)

    assert [r["attr"] for r in spark.read.parquet(hp).filter("k = 1").collect()] == ["A"]
    quar2 = sorted(r["attr"] for r in spark.read.parquet(qp).collect())
    assert quar2 == ["B", "C"]


def test_scd2_replay_matches_legacy_unscoped_epoch_tag(spark, tmp_path):
    """ADVICE r7 (low): histories written before replay-detection
    scoping stored epoch tags as '#<batch_id>' (empty scope). A stream
    restarting mid-upgrade with the SAME checkpoint now carries
    scope=checkpoint_dir; it must still recognize its own pre-upgrade
    epoch as a replay — otherwise the replayed rows are judged against
    the ADVANCED watermark and spuriously land in quarantine."""
    from data_lake_for_e_commerce_analytics_spark.streaming import scd2_stream

    hp = str(tmp_path / "hist")
    qp = str(tmp_path / "quarantine")
    b1 = spark.createDataFrame(
        [(1, "A", "2024-01-01", 10)], "k long, attr string, ts string, seq long"
    )
    b2 = spark.createDataFrame(
        [(1, "B", "2024-02-01", 20)], "k long, attr string, ts string, seq long"
    )
    # pre-upgrade stream: unscoped tags
    scd2_stream.scd2_ingest_batch(
        b1, hp, ["k"], ["attr"], "ts", "seq", batch_id=0, quarantine_path=qp
    )
    scd2_stream.scd2_ingest_batch(
        b2, hp, ["k"], ["attr"], "ts", "seq", batch_id=1, quarantine_path=qp
    )
    # public columns only: the replay legitimately re-stamps the
    # internal epoch-tag column with the new scoped tag
    pub = [
        c
        for c in spark.read.parquet(hp).columns
        if c != scd2_stream.HWM_BATCH
    ]
    snap = sorted(map(tuple, spark.read.parquet(hp).select(*pub).collect()))

    # post-upgrade restart of the SAME stream replays batch 1, now
    # scoped by its checkpoint dir: must converge (history unchanged)
    # with ZERO quarantined rows
    scd2_stream.scd2_ingest_batch(
        b2, hp, ["k"], ["attr"], "ts", "seq", batch_id=1,
        quarantine_path=qp, scope="file:/ckpt/stream-1",
    )
    assert (
        sorted(map(tuple, spark.read.parquet(hp).select(*pub).collect()))
        == snap
    )
    from data_lake_for_e_commerce_analytics_spark.sources.fs import (
        parquet_table_exists,
    )
    assert not parquet_table_exists(spark, qp)  # no false late rows
