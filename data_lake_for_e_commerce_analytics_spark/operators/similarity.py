"""Similarity search over embedding columns: brute-force cosine top-k as
the exactness baseline, and a hyperplane-LSH bucketed variant as the
scale path (probe a few buckets instead of scanning every vector).

Everything is JVM higher-order-function arithmetic (functions/vector.py);
the LSH 'random' hyperplanes are derived deterministically from
xxhash64(plane, dim) so signatures are reproducible across runs and
cluster layouts without shipping any plane matrix.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.vector import cosine_similarity, to_double_array


def brute_force_knn(
    embeddings: DataFrame, query_vec: list[float], k: int = 10
) -> DataFrame:
    """Exact cosine top-k against one query vector.

    The query is a literal array -> constant-folded, no join at all; the
    scan computes one cosine per row and TakeOrderedAndProject keeps k.
    At 100 TB this is the map-side-only pattern: no shuffle except the
    k-row final gather.
    """
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    cos = cosine_similarity(F.col("embedding"), q)
    return (
        embeddings.select("vec_id", "label", F.round(cos, 4).alias("cosine"))
        .orderBy(F.desc("cosine"), "vec_id")
        .limit(k)
    )


def mmr_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    pool: int = 20,
    m: int = 5,
    exclude_vec_id: int | None = None,
) -> DataFrame:
    """Maximal Marginal Relevance selection (Carbonell & Goldstein '98)
    — the retrieval DIVERSITY pass a production RAG stack runs between
    ranking and context assembly: from the cosine top-``pool``
    candidates, greedily pick ``m`` where each pick maximizes
    relevance MINUS its max similarity to anything already picked
    (lambda = 0.5, equal weight — the 0.5 factor divides out of the
    argmax, keeping the contract integer-exact).

    Integer-exact contract: relevance and pairwise similarity are
    quantized to 1e-4 units (`brute_force_knn`'s proven cross-engine
    rounding grid) BEFORE the greedy, so the selection replays exactly
    in SQL; all ties break on vec_id ascending.

    Scale shape: the candidate pool is `brute_force_knn`'s
    map-side-only scan (no shuffle but the pool-row gather); pairwise
    similarities are a pool x pool broadcast self-join (pool^2 rows,
    pool-bounded, corpus-independent). The greedy itself runs over
    driver-collected integers — O(m * pool) on pool + pool^2 rows, the
    metadata-scale boundary (same class as bpe.py's argmax rows), never
    corpus-sized. Output: (mmr_rank, vec_id, label, rel_m, div_m) with
    rel/div in 1e-4 units and div_m = max similarity to the earlier
    picks (0 for the first)."""
    spark = embeddings.sparkSession
    q = [float(x) for x in query_vec]
    base = embeddings
    if exclude_vec_id is not None:
        base = base.filter(F.col("vec_id") != exclude_vec_id)
    qcol = F.array(*[F.lit(x) for x in q])
    rel_m = F.round(
        cosine_similarity(F.col("embedding"), qcol) * 10000
    ).cast("long")
    cand = (
        base.select("vec_id", "label", rel_m.alias("rel_m"), "embedding")
        .orderBy(F.desc("rel_m"), "vec_id")
        .limit(pool)
        .localCheckpoint(eager=True)
    )
    a = cand.select(F.col("vec_id").alias("a"), F.col("embedding").alias("ea"))
    b = cand.select(F.col("vec_id").alias("b"), F.col("embedding").alias("eb"))
    sim_m = F.round(
        cosine_similarity(F.col("ea"), F.col("eb")) * 10000
    ).cast("long")
    pairs = a.join(F.broadcast(b), F.col("a") != F.col("b")).select(
        "a", "b", sim_m.alias("sim_m")
    )
    # pool-bounded driver greedy over quantized integers
    rows = {
        r["vec_id"]: (int(r["rel_m"]), r["label"]) for r in cand.collect()
    }
    sims = {(r["a"], r["b"]): int(r["sim_m"]) for r in pairs.collect()}
    selected: list[int] = []
    sel_set: set[int] = set()  # membership hoisted out of the candidate loop
    out = []
    while len(selected) < min(m, len(rows)):
        best = None
        for v, (rel, lab) in rows.items():
            if v in sel_set:
                continue
            div = max((sims[(v, s)] for s in selected), default=0)
            key = (-(rel - div), v)
            if best is None or key < best[0]:
                best = (key, v, lab, rel, div)
        selected.append(best[1])
        sel_set.add(best[1])
        out.append((len(selected), best[1], best[2], best[3], best[4]))
    return spark.createDataFrame(
        out, "mmr_rank int, vec_id long, label int, rel_m long, div_m long"
    )


def knn_for_vec_id(
    spark: SparkSession, embeddings: DataFrame, query_vec_id: int = 0, k: int = 10
) -> DataFrame:
    """Top-k neighbors of a stored vector (excluding itself). The single
    query row is collected at the driver (k-row boundary, allowed) and
    inlined as a literal so the big side never joins."""
    row = embeddings.filter(F.col("vec_id") == query_vec_id).select("embedding").head()
    if row is None:
        raise ValueError(f"vec_id {query_vec_id} not found")
    return brute_force_knn(
        embeddings.filter(F.col("vec_id") != query_vec_id), list(row[0]), k
    )


def hyperplane_signature(col: F.Column | str, num_planes: int = 16, dim: int = 64) -> F.Column:
    """LSH bit signature: bit p = sign(dot(v, h_p)) where h_p[d] is a
    deterministic pseudo-random unit component derived from
    xxhash64(p, d). Folded to a single int — the bucket key."""
    # h_p[d] in {-1, +1} derived from parity of xxhash64(p, d): a random
    # Rademacher hyperplane, which preserves cosine locality like Gaussian
    # planes but needs no stored matrix.
    # Closure factory, not a default arg: PySpark's lambda bridge binds a
    # Column to every named parameter of a higher-order-function lambda.
    def plane_component(p: int):
        return lambda d: F.when(
            F.xxhash64(F.lit(p), d).bitwiseAND(F.lit(1)) == 1, F.lit(1.0)
        ).otherwise(F.lit(-1.0))

    sig = F.lit(0).cast("long")
    for p in range(num_planes):
        dot_p = F.aggregate(
            F.zip_with(
                col,
                F.transform(F.sequence(F.lit(0), F.lit(dim - 1)), plane_component(p)),
                lambda x, h: x.cast("double") * h,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        sig = sig.bitwiseOR(
            F.when(dot_p > 0, F.shiftleft(F.lit(1).cast("long"), p)).otherwise(F.lit(0).cast("long"))
        )
    return sig


def lsh_bucketed_knn(
    spark: SparkSession,
    embeddings: DataFrame,
    query_vec_id: int = 0,
    k: int = 10,
    num_planes: int = 12,
    dim: int = 64,
    max_probe_hamming: int = 2,
) -> DataFrame:
    """Approximate top-k: compute bucket signatures once, then scan only
    vectors whose signature is within ``max_probe_hamming`` bits of the
    query's (multi-probe LSH). The signature comparison is a cheap long
    XOR/bit_count pushed into the scan filter, so the expensive cosine
    runs on a small candidate slice — the 100 TB ANN pattern (signatures
    would be precomputed/bucketed at write time in a real deployment).
    """
    sigs = embeddings.withColumn(
        "bucket_sig", hyperplane_signature(F.col("embedding"), num_planes, dim)
    )
    qrow = sigs.filter(F.col("vec_id") == query_vec_id).select("embedding", "bucket_sig").head()
    if qrow is None:
        raise ValueError(f"vec_id {query_vec_id} not found")
    q_vec, q_sig = list(qrow[0]), int(qrow[1])
    candidates = sigs.filter(
        (F.bit_count(F.col("bucket_sig").bitwiseXOR(F.lit(q_sig))) <= max_probe_hamming)
        & (F.col("vec_id") != query_vec_id)
    )
    return brute_force_knn(candidates, q_vec, k)


# --- IVF (inverted-file) ANN: the coarse-quantizer scale path --------------

def build_ivf_index(
    embeddings: DataFrame,
    n_cells: int = 16,
    lloyd_iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
):
    """Build an IVF index: k coarse centroids (deterministic hash-ranked
    seed sample + a few Lloyd iterations) and a cell assignment per
    vector.

    Returns (assignments DataFrame [id_col, cell], centroids ndarray
    [n_cells x dim]).

    Driver-boundary contract (pinned by a collect-spy test): nothing
    larger than k ROWS ever crosses to the driver. The centroid update
    runs in the cluster — (cell, d) mean partials with map-side combine,
    reassembled and unit-normalized into k (cell, cvec) rows — and only
    that k-row table is collected per iteration to feed the next numpy
    argmax assignment pass. This matters because the naive alternative
    (collecting the k x dim SCALAR partials and looping in Python) ships
    ~50M Row objects per round at realistic ANN scale (k=65536 cells x
    768 dims) and melts the driver. The k-row round-trip itself is NOT
    a scale cheat: a Spark broadcast-hash join would move the same k
    rows through the driver anyway (BroadcastExchange collects the
    build side), so an "in-cluster" broadcast-join formulation pays the
    identical driver traffic while adding 5+ shuffle stages of latency
    per iteration. For k x dim too big to broadcast at all, the escape
    hatch is a shuffle join of the exploded (id, d, x) stream against a
    (cell, d, cx) relation keyed on d — same dataflow as kmeans_assign.
    At 100 TB: same dataflow, larger k; assignments are written bucketed
    by cell so probes prune at the scan.
    """
    import numpy as np
    import pandas as pd

    seed_rows = (
        embeddings.select(id_col, vec_col)
        .orderBy(F.xxhash64(F.col(id_col), F.lit(7)), F.col(id_col))
        .limit(n_cells)
        .collect()  # k rows: TakeOrderedAndProject gathers only the seeds
    )
    centroids = np.stack([np.asarray(r[1], dtype=np.float64) for r in seed_rows])
    centroids /= np.maximum(np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12)

    def assign_factory(C):
        def assign(batches):
            for pdf in batches:
                V = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
                cell = (V @ C.T).argmax(axis=1)
                yield pd.DataFrame({id_col: pdf[id_col], "cell": cell.astype("int32")})
        return assign

    assign_schema = f"{id_col} long, cell int"
    for _ in range(lloyd_iters):
        assigned = embeddings.select(id_col, vec_col).mapInPandas(
            assign_factory(centroids), schema=assign_schema
        )
        # new centroid = unit-normalized mean of member vectors, computed
        # IN the cluster: (cell, d) partial aggregates with map-side
        # combine, reassembled per cell with an ordered collect_list and
        # normalized in-row — the driver sees k finished rows, never the
        # k x dim partials
        joined = embeddings.select(id_col, vec_col).join(assigned, id_col)
        mvec = F.transform(
            F.array_sort(F.collect_list(F.struct("d", "mx"))), lambda s: s["mx"]
        )
        nrm = F.greatest(
            F.sqrt(F.aggregate(mvec, F.lit(0.0), lambda a, x: a + x * x)),
            F.lit(1e-12),
        )
        cent_rows = (
            joined.select("cell", F.posexplode(vec_col).alias("d", "x"))
            .groupBy("cell", "d")
            .agg(F.avg(F.col("x").cast("double")).alias("mx"))
            .groupBy("cell")
            .agg(F.transform(mvec, lambda x: x / nrm).alias("cvec"))
            .collect()  # k rows (cell, unit centroid)
        )
        new_c = centroids.copy()  # cells with no members keep their centroid
        for r in cent_rows:
            new_c[r["cell"]] = np.asarray(r["cvec"], dtype=np.float64)
        centroids = new_c

    final = embeddings.select(id_col, vec_col).mapInPandas(
        assign_factory(centroids), schema=assign_schema
    )
    return final, centroids


def ivf_knn(
    spark: SparkSession,
    embeddings: DataFrame,
    query_vec_id: int = 0,
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    lloyd_iters: int = 1,
) -> DataFrame:
    """IVF approximate top-k: probe only the ``n_probe`` cells whose
    centroids are nearest the query, brute-force cosine inside them.
    Scanned fraction ~= n_probe / n_cells; recall grows with n_probe
    (n_probe == n_cells degenerates to exact search). In a real
    deployment the index is built once at write time and reused per
    query; here each call rebuilds it (one seed pass + ``lloyd_iters``
    refinements)."""
    import numpy as np

    assignments, centroids = build_ivf_index(
        embeddings, n_cells=n_cells, lloyd_iters=lloyd_iters
    )
    qrow = embeddings.filter(F.col("vec_id") == query_vec_id).select("embedding").head()
    if qrow is None:
        raise ValueError(f"vec_id {query_vec_id} not found")
    q = np.asarray(qrow[0], dtype=np.float64)
    qn = q / max(np.linalg.norm(q), 1e-12)
    probe_cells = [int(c) for c in (centroids @ qn).argsort()[::-1][:n_probe]]

    candidates = (
        embeddings.join(assignments.filter(F.col("cell").isin(probe_cells)), "vec_id")
        .filter(F.col("vec_id") != query_vec_id)
    )
    return brute_force_knn(candidates, list(q), k)


def ivf_sq8_knn(
    spark: SparkSession,
    embeddings: DataFrame,
    query_vec_id: int = 0,
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    lloyd_iters: int = 1,
) -> DataFrame:
    """Two-tier production ANN — the FAISS ``IVF<n>,SQ8`` shape: the IVF
    coarse quantizer prunes the scan to ``n_probe`` cells, then SQ8
    integer code distance ranks the survivors. This is the composition
    a 10-TB embedding corpus actually deploys: the coarse tier bounds
    I/O (scanned fraction ~ n_probe/n_cells, partition-pruned when the
    index is written with ``write_ivf_index``), the scalar-quantized
    tier bounds memory (1 byte/dim) and keeps the distance loop in
    integer whole-stage codegen — float vectors are never touched after
    encoding. SQ8 codebook stats and the query code come from the full
    corpus (build-time artifacts), so ranking fidelity is independent
    of which cells a query probes.

    Recall is gated by `ivf_sq8_quality` (in-gate verdict, same shape
    as `ivf_quality`) and measured against exact search in
    tests/test_similarity.py; the SQ8 tier's standalone fidelity is
    0.85 recall@10 and scale-stable (SCALING.md round-8 addendum)."""
    import numpy as np

    assignments, centroids = build_ivf_index(
        embeddings, n_cells=n_cells, lloyd_iters=lloyd_iters
    )
    qrow = embeddings.filter(F.col("vec_id") == query_vec_id).select("embedding").head()
    if qrow is None:
        raise ValueError(f"vec_id {query_vec_id} not found")
    q = np.asarray(qrow[0], dtype=np.float64)
    qn = q / max(np.linalg.norm(q), 1e-12)
    probe_cells = [int(c) for c in (centroids @ qn).argsort()[::-1][:n_probe]]
    candidates = assignments.filter(F.col("cell").isin(probe_cells))
    return sq8_knn(embeddings, query_vec_id=query_vec_id, k=k, candidates=candidates)


def kmeans_seed_ids(embeddings: DataFrame, k: int, init: str) -> DataFrame | None:
    """Centroid seed selection shared by the Lloyd variants.

    ``'first'`` (the oracle-replayed default): vec_id < k. Cheap and
    deterministic, but SENSITIVE to id-order/mode correlation — if ids
    were assigned per source shard, the first k can all fall in one
    mode and the other modes collapse into a giant cluster (observed in
    the sf1 scaling pass: a single cluster then makes SemDeDup's
    within-cluster pair join quadratic on one task). ``'scatter'``: the
    k smallest (xxhash64(vec_id), vec_id) — deterministic, layout-
    independent, and uncorrelated with id assignment, the cheap
    k-means++-shaped defense for production corpora. Returns None for
    'first' (callers keep the filter form) or a k-row seed relation."""
    if init == "first":
        return None
    if init != "scatter":
        raise ValueError(f"init must be first|scatter, got {init!r}")
    return (
        embeddings.select("vec_id")
        .orderBy(F.xxhash64(F.col("vec_id").cast("long")), "vec_id")
        .limit(k)
    )


def kmeans_assign(
    embeddings: DataFrame,
    k: int = 8,
    iters: int = 2,
    scale: int = 1000,
    init: str = "first",
) -> DataFrame:
    """Deterministic Lloyd k-means over the embedding column, fully
    declarative (no driver-side centroid state, unlike build_ivf_index):
    ``iters`` assignment/update rounds unrolled into one logical plan.

    Exact-parity variant: embeddings are quantized to an integer grid
    (``floor(x * scale)``), centroids are integer floor-division means,
    and distances are integer squared-Euclidean sums — so there is no
    floating-point anywhere and any ANSI engine reproduces every
    assignment bit-for-bit (the repo's oracle-parity rule taken to its
    limit). Quantization error is 1/scale per dimension — immaterial next
    to Lloyd's own local-optimum variance. Init is the first ``k``
    vec_ids; argmin ties break on cluster id.

    Scale shape: the exploded (vec_id, dim, x) stream joins a BROADCAST
    k x dim centroid relation per round — map-side only — then aggregates
    |rows| x k partial distances with map-side combine; the centroid
    update is a (cid, dim) partial aggregate producing k x dim rows.
    Per-round cost is two shuffles of keyed aggregates, never a
    vector-by-vector join; at 100 TB rounds are scans, exactly like the
    IVF builder but without the mapInPandas hop.
    """
    e = embeddings.select(
        "vec_id", F.posexplode("embedding").alias("d", "xf")
    ).select(
        "vec_id",
        "d",
        F.floor(F.col("xf").cast("double") * F.lit(float(scale)))
        .cast("long")
        .alias("x"),
    )
    seeds = kmeans_seed_ids(embeddings, k, init)
    seeded = (
        e.filter(F.col("vec_id") < k)
        if seeds is None
        else e.join(F.broadcast(seeds), "vec_id")
    )
    cent = seeded.select(
        F.col("vec_id").alias("cid"), "d", F.col("x").alias("cx")
    )
    assign = None
    for _ in range(iters):
        dists = (
            e.join(F.broadcast(cent), "d")
            .groupBy("vec_id", "cid")
            .agg(
                F.sum(
                    (F.col("x") - F.col("cx")) * (F.col("x") - F.col("cx"))
                ).alias("dist2")
            )
        )
        assign = (
            dists.groupBy("vec_id")
            .agg(F.min(F.struct("dist2", "cid")).alias("m"))
            .select("vec_id", F.col("m.cid").alias("cluster"))
        )
        cent = (
            e.join(assign, "vec_id")
            .groupBy(F.col("cluster").alias("cid"), F.col("d"))
            .agg(F.expr("sum(x) div count(1)").alias("cx"))
        )
    return assign.orderBy("vec_id")


def label_centroid_dims(embeddings: DataFrame, decimals: int = 4) -> DataFrame:
    """Per-(label, dimension) centroid components as flat rows — the
    relational form of ``label_centroids`` (same single-shuffle partial
    aggregate, no array reassembly). Flat rows are also what external
    result comparators can sort/hash; vector-typed cells are not.
    """
    return (
        embeddings.select("label", F.posexplode(to_double_array("embedding")).alias("pos", "x"))
        .groupBy("label", "pos")
        .agg(F.round(F.avg("x"), decimals).alias("mean_x"), F.count(F.lit(1)).alias("n"))
    )


def label_centroids(embeddings: DataFrame, decimals: int = 4) -> DataFrame:
    """Per-label centroid of the embedding column — the vector-column
    aggregation pattern (class prototypes, IVF coarse training, cluster
    summaries).

    Scale shape: posexplode turns |rows| x dim values into (label, pos)
    partial aggregates — map-side combine reduces each partition to
    |labels| x dim rows before the single shuffle, then the centroid is
    reassembled with an ordered collect per label (|labels| x dim total,
    driver never involved). Never collects vectors whole and never holds
    more than one (label, pos) accumulator per partition in flight.
    """
    per_dim = label_centroid_dims(embeddings, decimals)
    return (
        per_dim.groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "mean_x"))),
                lambda s: s["mean_x"],
            ).alias("centroid"),
            F.max("n").alias("n_vectors"),
        )
        .orderBy("label")
    )


def write_ivf_index(
    embeddings: DataFrame,
    path: str,
    n_cells: int = 16,
    lloyd_iters: int = 2,
):
    """Materialize the IVF index the way the docstrings promise: vectors
    written PARTITIONED BY their cell, so a probe is a directory-pruned
    scan (PartitionFilters at the file index), not a join. Returns the
    centroid matrix (k x dim driver metadata — persist alongside the
    index in a real deployment).

    At 100 TB this is the write-once/probe-many ANN layout: index build
    cost is one assignment pass + one shuffled write; every query after
    that touches ~n_probe/n_cells of the files.
    """
    assignments, centroids = build_ivf_index(
        embeddings, n_cells=n_cells, lloyd_iters=lloyd_iters
    )
    embeddings.join(assignments, "vec_id").write.mode("overwrite").partitionBy(
        "cell"
    ).parquet(path)
    return centroids


def write_ivf_sq8_index(
    embeddings: DataFrame,
    path: str,
    n_cells: int = 16,
    lloyd_iters: int = 2,
    extra_cols: tuple = (),
):
    """The at-rest form of the two-tier index (`ivf_sq8_knn`): SQ8
    CODES — one tinyint per dimension, 4x smaller than float32 —
    written PARTITIONED BY their IVF cell. A probe is then a
    directory-pruned scan of byte codes: scanned bytes ~
    (n_probe/n_cells) x (dim bytes/vector), the minimum a disk-resident
    10-TB embedding corpus can pay per query. Float vectors exist only
    during the build.

    ``extra_cols`` names passthrough columns copied verbatim from
    ``embeddings`` onto the at-rest rows — the streaming tier
    (ann_ingest.py) threads its per-row ``ingest_epoch`` provenance
    through rebuilds this way so epoch-scoped tombstones survive a
    re-train.

    Returns (centroids, stats): the k x dim centroid matrix and the
    per-dim (mn, mx) SQ8 codebook — both driver metadata to persist
    alongside the index (a real deployment writes them as a sidecar).
    """
    import numpy as np
    import pandas as pd

    assignments, centroids = build_ivf_index(
        embeddings, n_cells=n_cells, lloyd_iters=lloyd_iters
    )
    stats = {
        r["pos"]: (r["mn"], r["mx"]) for r in sq8_corpus_stats(embeddings).collect()
    }
    dim = len(stats)
    mn = np.asarray([float(stats[i][0]) for i in range(dim)])
    span = np.asarray([float(stats[i][1]) - float(stats[i][0]) for i in range(dim)])
    extra = list(extra_cols)

    # SQ8 encode as an Arrow kernel (r15, guide §4.2): exact
    # `_sq8_code_col` arithmetic (`_np_sq8_codes_signed` replays the
    # per-dim IEEE order), replacing an interpreted zip_with fold plus a
    # 2 x dim literal tree per build. Parity pinned by
    # tests/test_similarity.py::test_frozen_geometry_kernel_parity.
    def enc(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = _np_mat(pdf["embedding"])
            out = {
                "vec_id": pdf["vec_id"].to_numpy(),
                "label": pdf["label"].to_numpy(),
            }
            for c in extra:
                out[c] = pdf[c]
            out["code"] = list(_np_sq8_codes_signed(V, mn, span))
            yield pd.DataFrame(out)

    extra_ddl = "".join(
        f", {name} {embeddings.schema[name].dataType.simpleString()}"
        for name in extra
    )
    coded = embeddings.select("vec_id", "label", *extra, "embedding").mapInPandas(
        enc,
        schema=f"vec_id long, label int{extra_ddl}, code array<tinyint>",
    )
    coded.join(assignments, "vec_id").write.mode("overwrite").partitionBy(
        "cell"
    ).parquet(path)
    return centroids, stats



def _read_index_scan(spark: SparkSession, index_path: str, fields) -> "DataFrame":
    """Read a cell-partitioned at-rest index with the writer's explicit
    schema when a driver-side footer sniff confirms it (r14 opt: schema
    inference is a Spark job per read and probes issue one per segment);
    unknown/mixed/type-drifted layouts fall back to Spark inference
    (r15, ADVICE r14: the sniff confirms TYPES too, not names only)."""
    from pyspark.sql.types import _parse_datatype_string

    from ..sources.fs import sniff_local_parquet_fields

    sniffed = sniff_local_parquet_fields([index_path])
    declared = {n: t for n, t in fields}
    optional = {"ingest_epoch"}
    if (
        sniffed is not None
        and set(sniffed).issubset(declared)
        and (set(declared) - optional).issubset(sniffed)
        and all(
            sniffed[n] == _parse_datatype_string(declared[n]).simpleString()
            for n in sniffed
        )
    ):
        ddl = ", ".join(f"{n} {t}" for n, t in fields if n in sniffed)
        return spark.read.schema(ddl + ", cell int").parquet(index_path)
    return spark.read.parquet(index_path)


#: at-rest layouts (field order as written; `cell` is the partition col)
_SQ8_SEG_FIELDS = (
    ("vec_id", "long"),
    ("label", "int"),
    ("code", "array<tinyint>"),
    ("ingest_epoch", "int"),
)
_FLOAT_IVF_FIELDS = (
    ("vec_id", "long"),
    ("embedding", "array<float>"),
    ("label", "int"),
)

def _probe_cells_for(centroids, q: list[float], n_probe: int) -> list[int]:
    """Nearest ``n_probe`` IVF cells by centroid dot product against the
    normalized query (driver metadata math — centroids are k x dim)."""
    import math

    qn2 = math.sqrt(sum(x * x for x in q)) or 1e-12
    return [
        int(c)
        for c in (centroids @ ([x / qn2 for x in q])).argsort()[::-1][:n_probe]
    ]


def _sq8_encode_query(q: list[float], stats: dict) -> list[int]:
    """Encode a query with a stored SQ8 codebook — same clamped-floor
    arithmetic as `_sq8_code_col` (identical IEEE operation order), in
    plain Python."""
    import math

    q_code = []
    for i in range(len(q)):
        mn, mx = float(stats[i][0]), float(stats[i][1])
        span = mx - mn
        if span == 0.0:
            q_code.append(0)  # degenerate dim codes to 0, like _sq8_code_col
            continue
        c = math.floor((q[i] - mn) * 255.0 / span)
        q_code.append(max(0, min(255, int(c))))
    return q_code


def ivf_sq8_knn_pruned(
    spark: SparkSession,
    index_path: str,
    centroids,
    stats: dict,
    query_vec: list[float],
    k: int = 10,
    n_probe: int = 4,
    exclude_vec_id: int | None = None,
    exclude_ids: DataFrame | None = None,
    predicate: F.Column | None = None,
    allowed_ids: DataFrame | None = None,
    tombstones: DataFrame | None = None,
) -> DataFrame:
    """Probe a written IVF+SQ8 index: pick the ``n_probe`` nearest
    cells by centroid dot product, scan ONLY their partitions
    (PartitionFilters prunes at the file index — plan-asserted), and
    rank by integer code distance against the query encoded with the
    SAME stored codebook. The scan reads byte codes, never floats; the
    only join is the optional ``exclude_ids`` anti-join (a ``vec_id``
    tombstone relation — streaming deletes, ann_ingest.py): it lands
    BEFORE the top-k so deleted vectors can never displace live ones,
    and carries no broadcast hint (tombstone cardinality tracks delete
    history, not the corpus, but AQE sizes it at runtime).

    ``tombstones`` is the EPOCH-SCOPED form (r13, the streaming tier's
    Lucene liveness semantics): a ``(vec_id, del_before)`` relation
    applied as a broadcast anti-join on ``vec_id`` AND
    ``ingest_epoch < del_before`` — a delete kills only row versions
    ingested BEFORE it, so a re-ingested (updated) vector stays live.
    Requires the index rows to carry ``ingest_epoch`` (every
    ann_ingest.py segment does); plain indexes keep using
    ``exclude_ids``.

    FILTERED search (r12): ``predicate`` is an arbitrary Column over
    the index scan's columns (vec_id, label, cell) and ``allowed_ids``
    an arbitrary ``vec_id`` allow-relation (doc-attribute filters
    resolved outside the index) — both land INSIDE each probed cell
    scan, before the top-k. That is the PRE-filtering plan: the result
    always holds k live matching candidates when the probed cells
    contain that many, whereas post-filtering an unfiltered top-k
    under-fills k whenever fewer than k of the global top-k satisfy the
    filter (contract measured by the filtered_ann_recall gate). Same
    placement mechanism as the tombstone anti-join, generalized;
    `predicate` pushes into the parquet scan (codes are cell-partitioned
    parquet, so a label predicate prunes row groups via min/max)."""
    q = [float(x) for x in query_vec]
    probe_cells = _probe_cells_for(centroids, q, n_probe)
    q_lit = F.array(*[F.lit(int(c)) for c in _sq8_encode_query(q, stats)])
    scan = _read_index_scan(spark, index_path, _SQ8_SEG_FIELDS).filter(
        F.col("cell").isin(probe_cells)
    )
    if predicate is not None:
        scan = scan.filter(predicate)
    if allowed_ids is not None:
        scan = scan.join(allowed_ids.select("vec_id"), "vec_id", "left_semi")
    if exclude_vec_id is not None:
        scan = scan.filter(F.col("vec_id") != exclude_vec_id)
    if exclude_ids is not None:
        scan = scan.join(exclude_ids.select("vec_id"), "vec_id", "left_anti")
    if tombstones is not None:
        if "ingest_epoch" not in scan.columns:
            # pre-r13 segments carry no provenance column: default to a
            # sentinel below every batch id, so the epoch-scoped filter
            # reproduces the old kill-everything delete semantics
            # (ADVICE r13; ann_ingest.PRE_EPOCH)
            scan = scan.withColumn(
                "ingest_epoch", F.lit(-(2**31)).cast("int")
            )
        t = F.broadcast(tombstones.select("vec_id", "del_before"))
        scan = scan.join(
            t,
            (scan["vec_id"] == t["vec_id"])
            & (scan["ingest_epoch"] < t["del_before"]),
            "left_anti",
        )
    sqdist = F.aggregate(
        F.zip_with(
            F.col("code"),
            q_lit,
            lambda a, b: (a.cast("long") + 128 - b) * (a.cast("long") + 128 - b),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return (
        scan.select("vec_id", "label", sqdist.alias("sqdist"))
        .orderBy("sqdist", "vec_id")
        .limit(k)
    )


def ivf_sq8_knn_pruned_multi(
    spark: SparkSession,
    index_path: str,
    centroids,
    stats: dict,
    queries: dict[int, tuple[int | None, list[float]]],
    k: int = 10,
    n_probe: int = 4,
    tombstones: DataFrame | None = None,
    predicate: F.Column | None = None,
    allowed_ids: DataFrame | None = None,
) -> DataFrame:
    """Batched `ivf_sq8_knn_pruned`: a query BATCH served from ONE scan
    of the cell-partitioned SQ8 index — the QPS serving shape, the
    at-rest ANN analog of `retrieval.bm25_topk_multi_segmented`. The
    scan is pruned to the UNION of all queries' probe cells; per-query
    eligibility rides the broadcast (qid, cell) pairs join and the
    per-query SQ8-encoded code arrays ride a broadcast (qid, qvid,
    qcode) relation, so per-query cost is the join fan-out on probed
    rows, never a rescan. Ranking is the exact integer code-distance
    contract of the single-query form per qid (pytest-pinned equal);
    top-k is a qid-PARTITIONED window, never a global sort.

    ``queries``: {qid: (exclude_vec_id | None, query_vec)} — the
    exclude id is the query's own stored id (or None). Tombstones /
    predicate / allowed_ids land inside the scan exactly like the
    single-query form (pre-filter semantics)."""
    import numpy as np

    from pyspark.sql import Window

    if not queries:
        raise ValueError("empty query batch")
    centroids = np.asarray(centroids, dtype=np.float64)
    pairs = sorted(
        {
            (int(qid), int(cell))
            for qid, (_, qv) in queries.items()
            for cell in _probe_cells_for(
                centroids, [float(x) for x in qv], n_probe
            )
        }
    )
    cells_df = spark.createDataFrame(pairs, "qid int, cell int")
    qdf = spark.createDataFrame(
        [
            (
                int(qid),
                None if xid is None else int(xid),
                _sq8_encode_query([float(x) for x in qv], stats),
            )
            for qid, (xid, qv) in sorted(queries.items())
        ],
        "qid int, qvid long, qcode array<int>",
    )
    scan = _read_index_scan(spark, index_path, _SQ8_SEG_FIELDS).filter(
        F.col("cell").isin(sorted({cl for _, cl in pairs}))
    )
    if predicate is not None:
        scan = scan.filter(predicate)
    if allowed_ids is not None:
        scan = scan.join(allowed_ids.select("vec_id"), "vec_id", "left_semi")
    if tombstones is not None:
        if "ingest_epoch" not in scan.columns:
            scan = scan.withColumn(
                "ingest_epoch", F.lit(-(2**31)).cast("int")
            )
        t = F.broadcast(tombstones.select("vec_id", "del_before"))
        scan = scan.join(
            t,
            (scan["vec_id"] == t["vec_id"])
            & (scan["ingest_epoch"] < t["del_before"]),
            "left_anti",
        )
    sqdist = F.aggregate(
        F.zip_with(
            F.col("code"),
            F.col("qcode"),
            lambda a, b: (a.cast("long") + 128 - b) * (a.cast("long") + 128 - b),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    w = Window.partitionBy("qid").orderBy("sqdist", "vec_id")
    return (
        scan.join(F.broadcast(cells_df), "cell")
        .join(F.broadcast(qdf), "qid")
        .filter(F.col("qvid").isNull() | (F.col("vec_id") != F.col("qvid")))
        .select("qid", "vec_id", "label", sqdist.alias("sqdist"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("qid", "vec_id", "label", "sqdist")
        .orderBy("qid", "sqdist", "vec_id")
    )


def ivf_knn_pruned(
    spark: SparkSession,
    index_path: str,
    centroids,
    query_vec: list[float],
    k: int = 10,
    n_probe: int = 4,
    exclude_vec_id: int | None = None,
) -> DataFrame:
    """Probe a written IVF index: pick the ``n_probe`` nearest cells by
    centroid dot product, scan ONLY their partitions (the cell filter
    prunes at the file index — plan-asserted in tests), brute-force
    cosine inside. No join anywhere; scanned bytes ~ n_probe/n_cells of
    the index."""
    import numpy as np

    q = np.asarray(query_vec, dtype=np.float64)
    qn = q / max(np.linalg.norm(q), 1e-12)
    probe_cells = [int(c) for c in (centroids @ qn).argsort()[::-1][:n_probe]]
    scan = _read_index_scan(spark, index_path, _FLOAT_IVF_FIELDS).filter(
        F.col("cell").isin(probe_cells)
    )
    if exclude_vec_id is not None:
        scan = scan.filter(F.col("vec_id") != exclude_vec_id)
    return brute_force_knn(scan, list(q), k)


def write_ivf_pq_refine_index(
    embeddings: DataFrame,
    path: str,
    n_cells: int = 16,
    n_codewords: int = 16,
    m_subspaces: int = 8,
    lloyd_iters: int = 2,
    codebook: dict[int, list[float]] | None = None,
):
    """At-rest IVFADC + refine (the disk form of ``pq_refine_knn``;
    FAISS's IVFPQ + RefineFlat as two parquet layouts under one root):

    - ``path/pq``: PQ codes — ONE TINYINT PER SUBSPACE (8 bytes/vector
      at 16x8, 32x smaller than float32) — partitioned by IVF cell.
      The shortlist probe reads ~(n_probe/n_cells) x m bytes/vector.
    - ``path/sq8``: SQ8 codes (dim bytes/vector) partitioned by the
      SAME cell assignment and SORTED BY vec_id inside each partition,
      so the rerank's ``vec_id IN (shortlist)`` predicate prunes at
      parquet row-group stats, not just at the directory level.

    Floats never reach disk in either tier. One IVF assignment pass is
    shared by both writes, so the two layouts agree on cells by
    construction. Returns (centroids, cb_rows, stats): the k x dim
    centroid matrix, the PQ codebook rows, and the per-dim SQ8 (mn, mx)
    — all driver metadata for the sidecar, like `write_ivf_sq8_index`.
    """
    if n_codewords > 127:
        # the at-rest code is a 1-based TINYINT: 128+ codewords would
        # silently wrap negative and element_at(qd, code) would index
        # from the END of the ADC table — wrong distances, no error.
        # (The in-memory pq_refine_knn path has no such cap; the r9
        # sweep's 256-codeword config is in-memory only.)
        raise ValueError(
            f"n_codewords={n_codewords} > 127 cannot be stored as the "
            "tinyint 1-based at-rest code; use <=127 or widen the schema"
        )
    assignments, centroids = build_ivf_index(
        embeddings, n_cells=n_cells, lloyd_iters=lloyd_iters
    )
    if codebook is not None:
        cb_rows = {int(j): [float(x) for x in v] for j, v in codebook.items()}
        if sorted(cb_rows) != list(range(n_codewords)):
            raise ValueError("codebook must map 0..n_codewords-1 to dim-length rows")
    else:
        cb_rows = {
            r["vec_id"]: [float(x) for x in r["embedding"]]
            for r in embeddings.filter(F.col("vec_id") < n_codewords)
            .select("vec_id", "embedding")
            .collect()
        }
    if len(cb_rows) < n_codewords:
        raise ValueError(f"need vec_ids 0..{n_codewords - 1} for the codebook")
    head = embeddings.select("embedding").head()
    dim = len(head[0])
    sub = dim // m_subspaces
    vecd = to_double_array("embedding")
    pq_code = F.array(
        *[
            _pq_subspace_code(vecd, cb_rows, n_codewords, m * sub, sub)
            .cast("tinyint")
            for m in range(m_subspaces)
        ]
    )
    with_cell = embeddings.join(assignments, "vec_id")
    with_cell.select("vec_id", "label", pq_code.alias("pq_code"), "cell").write.mode(
        "overwrite"
    ).partitionBy("cell").parquet(f"{path}/pq")

    stats = {
        r["pos"]: (r["mn"], r["mx"]) for r in sq8_corpus_stats(embeddings).collect()
    }
    mn_lit = F.array(*[F.lit(float(stats[i][0])) for i in range(dim)])
    scale_lit = F.array(
        *[F.lit(float(stats[i][1]) - float(stats[i][0])) for i in range(dim)]
    )
    sq8_code = F.transform(
        _sq8_code_col(vecd, mn_lit, scale_lit),
        lambda c: (c - 128).cast("tinyint"),  # parquet INT8 at rest
    )
    (
        with_cell.select("vec_id", "label", sq8_code.alias("code"), "cell")
        .repartition("cell")
        .sortWithinPartitions("cell", "vec_id")
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(f"{path}/sq8")
    )
    return centroids, cb_rows, stats


def ivf_pq_refine_knn_pruned(
    spark: SparkSession,
    index_path: str,
    centroids,
    cb_rows: dict[int, list[float]],
    stats: dict,
    query_vec: list[float],
    k: int = 10,
    n_probe: int = 4,
    shortlist: int = 100,
    n_codewords: int = 16,
    m_subspaces: int = 8,
    exclude_vec_id: int | None = None,
) -> DataFrame:
    """Probe a ``write_ivf_pq_refine_index`` layout: directory-pruned
    scan of the probed cells' PQ codes, ADC ranking against the driver-
    computed query tables keeps the ``shortlist`` best ids, then the
    rerank scans ONLY the same cells of the SQ8 tier with a
    ``vec_id IN (shortlist)`` predicate (row-group pruned via the
    sorted layout) and returns the integer-exact SQ8 top-k.

    Bytes touched per query ~ (n_probe/n_cells) x (m + eps) per vector
    in the corpus plus ~shortlist x dim for the rerank fetch — the
    IVFADC scan economics, with the shortlist collect bounded by the
    ``shortlist`` parameter (driver metadata scale, like the centroid
    matrix)."""
    q = [float(x) for x in query_vec]
    dim = len(q)
    sub = dim // m_subspaces
    probe_cells = _probe_cells_for(centroids, q, n_probe)

    adc = F.lit(0).cast("long")
    for m in range(m_subspaces):
        qd_lit = F.array(
            *[
                F.lit(x)
                for x in _pq_query_table(q, cb_rows, n_codewords, m * sub, sub)
            ]
        )
        adc = adc + F.element_at(
            qd_lit, F.element_at(F.col("pq_code"), m + 1).cast("int")
        )
    pq_scan = spark.read.parquet(f"{index_path}/pq").filter(
        F.col("cell").isin(probe_cells)
    )
    if exclude_vec_id is not None:
        pq_scan = pq_scan.filter(F.col("vec_id") != exclude_vec_id)
    short_ids = [
        r["vec_id"]
        for r in pq_scan.select("vec_id", adc.alias("adc"))
        .orderBy("adc", "vec_id")
        .limit(shortlist)
        .collect()
    ]

    q_lit = F.array(*[F.lit(int(c)) for c in _sq8_encode_query(q, stats)])
    sqdist = F.aggregate(
        F.zip_with(
            F.col("code"),
            q_lit,
            lambda a, b: (a.cast("long") + 128 - b) * (a.cast("long") + 128 - b),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    rerank = (
        spark.read.parquet(f"{index_path}/sq8")
        .filter(F.col("cell").isin(probe_cells))
        .filter(F.col("vec_id").isin(short_ids))
    )
    return (
        rerank.select("vec_id", "label", sqdist.alias("sqdist"))
        .orderBy("sqdist", "vec_id")
        .limit(k)
    )


def _sq8_code_col(vec, mn_lit, scale_lit) -> F.Column:
    """Per-dimension SQ8 code: floor((v - mn) * 255 / scale) clamped to
    [0, 255]; degenerate dimensions (scale 0) code to 0. Pure IEEE-double
    arithmetic in a fixed operation order so any engine replaying the
    same expression produces bit-identical codes."""
    diffs = F.zip_with(vec, mn_lit, lambda v, mn: v - mn)
    return F.zip_with(
        diffs,
        scale_lit,
        lambda d, s: F.when(s == 0.0, F.lit(0)).otherwise(
            F.least(
                F.lit(255),
                F.greatest(F.lit(0), F.floor(d * F.lit(255.0) / s).cast("int")),
            )
        ),
    )


def sq8_corpus_stats(embeddings: DataFrame) -> DataFrame:
    """Per-dimension (min, max) over the corpus — the SQ8 codebook. One
    posexplode pass with map-side partial min/max, shuffling only
    dim x partitions partial rows down to dim result rows."""
    return (
        embeddings.select(
            F.posexplode(to_double_array("embedding")).alias("pos", "x")
        )
        .groupBy("pos")
        .agg(F.min("x").alias("mn"), F.max("x").alias("mx"))
    )


def sq8_knn(
    embeddings: DataFrame,
    query_vec_id: int = 0,
    k: int = 10,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Scalar-quantized (SQ8 / int8) approximate kNN: every embedding is
    compressed to one unsigned byte per dimension against per-dimension
    corpus (min, max) bounds, and neighbors rank by integer squared
    distance in code space. The standard memory-compression ANN tier
    (FAISS's ScalarQuantizer): 4x smaller than float32, distance loops
    are pure integer arithmetic.

    Scale shape: the codebook is a single tree-aggregated pass reduced
    to dim rows (the only driver materialization — dim, not |corpus|);
    quantization and distance are map-side whole-stage-codegen
    expressions over broadcast-folded literal arrays; the top-k is a
    TakeOrderedAndProject. No shuffle anywhere except the dim-row stats
    pass and the k-row gather. Integer distances make the result exactly
    reproducible across engines and partition layouts — this query is
    hash-oracled, not rows-only.

    ``candidates``: rank only this subset (codebook stats and the query
    code still come from the FULL ``embeddings`` — index-build-time
    stats don't drift with the probe set). The two-tier composition
    ``ivf_sq8_knn`` passes the IVF-probed cells here.
    """
    stats = {r["pos"]: (r["mn"], r["mx"]) for r in sq8_corpus_stats(embeddings).collect()}
    dim = len(stats)
    mn_lit = F.array(*[F.lit(float(stats[i][0])) for i in range(dim)])
    scale_lit = F.array(
        *[F.lit(float(stats[i][1]) - float(stats[i][0])) for i in range(dim)]
    )
    coded = embeddings.select(
        "vec_id",
        "label",
        _sq8_code_col(to_double_array("embedding"), mn_lit, scale_lit).alias("code"),
    )
    # Query codes come out of the SAME Spark expression (collect of one
    # k=dim int array), so engine and oracle share one arithmetic path.
    qrow = coded.filter(F.col("vec_id") == query_vec_id).select("code").head()
    if qrow is None:
        raise ValueError(f"vec_id {query_vec_id} not found")
    q_lit = F.array(*[F.lit(int(c)) for c in qrow[0]])
    sqdist = F.aggregate(
        F.zip_with(F.col("code"), q_lit, lambda a, b: (a - b).cast("long") * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    if candidates is not None:
        coded = coded.join(candidates.select("vec_id"), "vec_id", "left_semi")
    return (
        coded.filter(F.col("vec_id") != query_vec_id)
        .select("vec_id", "label", sqdist.alias("sqdist"))
        .orderBy("sqdist", "vec_id")
        .limit(k)
    )


def _pq_train_codebooks_expr(
    embeddings: DataFrame,
    n_codewords: int = 16,
    m_subspaces: int = 8,
    iters: int = 2,
    scale: int = 1000,
) -> dict[int, list[float]]:
    """EXPRESSION-FORM reference trainer (pre-r15). Kept verbatim as the
    parity anchor for `pq_train_codebooks` (the Arrow/numpy kernel that
    replaced it on the serving path — guide §4.2); equality is pinned in
    tests/test_similarity.py::test_pq_trainer_kernel_parity.

    Train PQ codebooks with per-subspace Lloyd k-means — the
    production recipe ``pq_knn``'s docstring promises, measured to lift
    recall@10 ~2x over the sampled baseline on the (near-uniform,
    PQ-hostile) synthetic corpus (SCALING.md round-8 addendum).

    One declarative plan trains ALL subspaces at once: the exploded
    (vec_id, subspace m, in-subspace dim di, x) stream runs
    ``kmeans_assign``'s engine-exact integer-grid Lloyd with the
    centroid key extended to (m, cid) — assignment is an argmin per
    (vec_id, m), the update a (m, cid, di) partial aggregate. Init is
    the first ``n_codewords`` vectors' slices, i.e. exactly the sampled
    baseline codebook, and the centroid update is the ROUNDED integer
    mean (the true per-coordinate SSE minimizer on the grid — truncating
    division voided the guarantee, ADVICE r8), so Lloyd's monotonicity
    makes "trained error never exceeds the baseline's" a theorem
    independent of the data (pytest-pinned). Empty clusters keep their
    previous centroid.

    Returns the ``pq_knn(codebook=...)`` dict: codeword id -> full-dim
    row whose subspace-m slice is that subspace's centroid — driver
    metadata scale (n_codewords x dim floats), like the IVF centroids.

    Scale shape: per round two keyed partial-aggregate shuffles over the
    exploded stream (map-side combine; the centroid relation broadcast),
    identical to ``kmeans_assign`` — scans, never vector-by-vector
    joins.
    """
    head = embeddings.select("embedding").head()
    if head is None:
        raise ValueError("pq_train_codebooks: embeddings is empty")
    dim = len(head[0])
    sub = dim // m_subspaces
    e = embeddings.select(
        "vec_id", F.posexplode(to_double_array("embedding")).alias("d", "xf")
    ).select(
        "vec_id",
        (F.floor(F.col("d") / sub)).cast("int").alias("m"),
        (F.col("d") % sub).alias("di"),
        F.floor(F.col("xf") * F.lit(float(scale))).cast("long").alias("x"),
    )
    cent = e.filter(F.col("vec_id") < n_codewords).select(
        F.col("vec_id").alias("cid"), "m", "di", F.col("x").alias("cx")
    )
    for _ in range(iters):
        dists = (
            e.join(F.broadcast(cent), ["m", "di"])
            .groupBy("vec_id", "m", "cid")
            .agg(
                F.sum(
                    (F.col("x") - F.col("cx")) * (F.col("x") - F.col("cx"))
                ).alias("dist2")
            )
        )
        assign = (
            dists.groupBy("vec_id", "m")
            .agg(F.min(F.struct("dist2", "cid")).alias("mm"))
            .select("vec_id", "m", F.col("mm.cid").alias("cid"))
        )
        # ROUNDED integer mean, not truncating `div` (ADVICE r8): on the
        # integer grid the per-coordinate SSE minimizer is the integer
        # NEAREST the mean — truncation toward zero can move a centroid
        # a full grid step off it (cluster {0,1,1}: mean 2/3, truncated
        # 0 raises SSE 1 -> 2), breaking Lloyd's monotone-descent
        # guarantee the pq_trained_quality gate relies on. round-half-up
        # = floordiv(2*s + c, 2*c), with the exact-integer floor-div
        # correction for negative sums (`div` truncates toward zero).
        update = (
            e.join(assign, ["vec_id", "m"])
            .groupBy("cid", "m", "di")
            .agg(
                F.expr(
                    "(2 * sum(x) + count(1)) div (2 * count(1))"
                    " - CASE WHEN (2 * sum(x) + count(1)) < 0"
                    "        AND (2 * sum(x) + count(1)) % (2 * count(1)) != 0"
                    "   THEN 1 ELSE 0 END"
                ).alias("ux")
            )
        )
        cent = (
            cent.join(update, ["cid", "m", "di"], "left")
            .select(
                "cid", "m", "di", F.coalesce("ux", "cx").alias("cx")
            )
        )
    cb = {j: [0.0] * dim for j in range(n_codewords)}
    for r in cent.collect():  # n_codewords x dim rows: driver metadata
        cb[int(r["cid"])][int(r["m"]) * sub + int(r["di"])] = (
            float(r["cx"]) / scale
        )
    return cb


def pq_train_codebooks(
    embeddings: DataFrame,
    n_codewords: int = 16,
    m_subspaces: int = 8,
    iters: int = 2,
    scale: int = 1000,
) -> dict[int, list[float]]:
    """`_pq_train_codebooks_expr` as an Arrow/numpy kernel (r15 opt,
    guide §4.2 — the Lloyd rounds were the last expression-form
    quantization path left after r14): same sampled init, same
    integer-grid assignment (exact int64 distances, ties to the lowest
    cid — `F.min(struct(dist2, cid))`), same rounded-integer-mean
    update computed from EXACT partial sums (int64 per Arrow batch,
    arbitrary-precision Python across batches — integer folds are
    exact in any order, so the distributed reduction is bit-identical
    to the expression plan's). Per Lloyd round: ONE mapInPandas pass
    over the corpus emitting per-batch (sum, count) partials per
    (codeword, subspace, dim), folded driver-side — replacing the
    per-round broadcast-join + two keyed aggregates + a final
    n_codewords x dim collect of a 2-iteration-deep interpreted plan.
    Equality with the expression form is pinned by
    tests/test_similarity.py::test_pq_trainer_kernel_parity."""
    import math

    import numpy as np
    import pandas as pd

    head = embeddings.select("embedding").head()
    if head is None:
        raise ValueError("pq_train_codebooks: embeddings is empty")
    dim = len(head[0])
    sub = dim // m_subspaces
    # the exploded expression keys m = d // sub over ALL dims, so a
    # non-divisible dim trains ceil(dim/sub) groups (the last partial)
    n_groups = (dim + sub - 1) // sub
    init_rows = (
        embeddings.filter(F.col("vec_id") < n_codewords)
        .select("vec_id", "embedding")
        .collect()
    )
    # centroids on the integer grid, keyed by cid (missing init ids —
    # vec_id gaps below n_codewords — simply never exist, exactly like
    # the expression's cent relation)
    cent: dict[int, list[int]] = {
        int(r["vec_id"]): [
            int(math.floor(float(x) * float(scale))) for x in r["embedding"]
        ]
        for r in init_rows
    }
    cids = sorted(cent)
    k = len(cids)
    if k:
        fscale = float(scale)

        def make_pass(C_rows):
            C = np.asarray(C_rows, dtype=np.int64)  # (k, dim)

            def part(batches):
                for pdf in batches:
                    if len(pdf) == 0:
                        continue
                    V = _np_mat(pdf["embedding"])
                    X = np.floor(V * fscale).astype(np.int64)
                    sums = np.zeros((k, n_groups, sub), dtype=np.int64)
                    counts = np.zeros((k, n_groups), dtype=np.int64)
                    for g in range(n_groups):
                        lo, hi = g * sub, min((g + 1) * sub, dim)
                        Xg = X[:, lo:hi]
                        D = (
                            (Xg[:, None, :] - C[None, :, lo:hi]) ** 2
                        ).sum(axis=2)
                        a = D.argmin(axis=1)  # first min == lowest cid
                        for j in range(k):
                            mask = a == j
                            if mask.any():
                                sums[j, g, : hi - lo] += Xg[mask].sum(axis=0)
                                counts[j, g] += int(mask.sum())
                    yield pd.DataFrame(
                        {"s": [sums.ravel()], "c": [counts.ravel()]}
                    )

            return part

        for _ in range(iters):
            C_rows = [cent[c] for c in cids]
            partials = (
                embeddings.select("embedding")
                .mapInPandas(make_pass(C_rows), "s array<long>, c array<long>")
                .collect()
            )
            # exact fold in Python ints (no wrap possible on the way up)
            S = [[0] * dim for _ in range(k)]
            Cn = [[0] * n_groups for _ in range(k)]
            for r in partials:
                s, c = r["s"], r["c"]
                for j in range(k):
                    base = j * n_groups * sub
                    for g in range(n_groups):
                        lo, hi = g * sub, min((g + 1) * sub, dim)
                        for i in range(hi - lo):
                            S[j][lo + i] += int(s[base + g * sub + i])
                        Cn[j][g] += int(c[j * n_groups + g])
            for j, cid in enumerate(cids):
                row = cent[cid]
                for g in range(n_groups):
                    n_ = Cn[j][g]
                    if n_ == 0:
                        continue  # empty cluster keeps its centroid
                    lo, hi = g * sub, min((g + 1) * sub, dim)
                    for d_ in range(lo, hi):
                        # round-half-up integer mean == the expression's
                        # floor-corrected `div` (Python // floors)
                        row[d_] = (2 * S[j][d_] + n_) // (2 * n_)
    cb = {j: [0.0] * dim for j in range(n_codewords)}
    for cid, row in cent.items():
        cb[cid] = [float(v) / scale for v in row]
    return cb


def _pq_quantization_error_expr(
    embeddings: DataFrame,
    codebook_grid: dict[int, list[int]],
    m_subspaces: int = 8,
    scale: int = 1000,
) -> int:
    """EXPRESSION-FORM reference (pre-r15) for `pq_quantization_error`
    — kept as the kernel's parity anchor
    (tests/test_similarity.py::test_pq_trainer_kernel_parity).

    Total PQ quantization error of a codebook over the corpus, on the
    SAME integer grid the trainer optimizes (``floor(x*scale)`` longs):
    per subspace, each vector pays the squared distance to its nearest
    codeword; summed over subspaces and rows. Pure long arithmetic in
    one scan (16 x m fold expressions, map-side only) — exact, so
    cross-codebook comparisons are deterministic on any engine or
    partitioning. This is the quantity Lloyd provably never increases,
    which the `pq_trained_quality` driver gate pins every round."""
    head = embeddings.select("embedding").head()
    if head is None:
        raise ValueError("pq_quantization_error: embeddings is empty")
    dim = len(head[0])
    sub = dim // m_subspaces
    n_codewords = len(codebook_grid)
    qv = F.transform(
        to_double_array("embedding"),
        lambda x: F.floor(x * F.lit(float(scale))).cast("long"),
    )
    total = F.lit(0).cast("long")
    for m in range(m_subspaces):
        off = m * sub
        vsub = F.slice(qv, off + 1, sub)
        dists = F.array(
            *[
                F.aggregate(
                    F.zip_with(
                        vsub,
                        F.array(
                            *[
                                F.lit(int(codebook_grid[j][off + i]))
                                for i in range(sub)
                            ]
                        ),
                        lambda a, b: (a - b) * (a - b),
                    ),
                    F.lit(0).cast("long"),
                    lambda acc, x: acc + x,
                )
                for j in range(n_codewords)
            ]
        )
        total = total + F.array_min(dists)
    row = embeddings.select(total.alias("err")).agg(F.sum("err").alias("mse")).head()
    return int(row["mse"])


def pq_quantization_error(
    embeddings: DataFrame,
    codebook_grid: dict[int, list[int]],
    m_subspaces: int = 8,
    scale: int = 1000,
) -> int:
    """`_pq_quantization_error_expr` as an Arrow/numpy kernel (r15 opt,
    guide §4.2): the per-row nearest-codeword fold is pure int64
    arithmetic on the training grid — exact in any order — so one
    mapInPandas pass emits per-batch partial error sums and the driver
    folds them in arbitrary-precision Python ints. Replaces a scan
    whose projection held n_codewords x m interpreted
    aggregate(zip_with) folds per row. Parity with the expression form
    pinned by tests/test_similarity.py::test_pq_trainer_kernel_parity."""
    import numpy as np
    import pandas as pd

    head = embeddings.select("embedding").head()
    if head is None:
        raise ValueError("pq_quantization_error: embeddings is empty")
    dim = len(head[0])
    sub = dim // m_subspaces
    n_codewords = len(codebook_grid)
    CB = np.asarray(
        [codebook_grid[j] for j in range(n_codewords)], dtype=np.int64
    )
    fscale = float(scale)

    def part(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = _np_mat(pdf["embedding"])
            X = np.floor(V * fscale).astype(np.int64)
            total = np.zeros(len(pdf), dtype=np.int64)
            for m in range(m_subspaces):
                lo = m * sub
                Xg = X[:, lo:lo + sub]
                D = ((Xg[:, None, :] - CB[None, :, lo:lo + sub]) ** 2).sum(
                    axis=2
                )
                total += D.min(axis=1)
            yield pd.DataFrame({"err": [int(total.sum())]})

    rows = (
        embeddings.select("embedding")
        .mapInPandas(part, "err long")
        .collect()
    )
    return sum(int(r["err"]) for r in rows)


def pq_train_codebooks_grid(
    embeddings: DataFrame,
    n_codewords: int = 16,
    m_subspaces: int = 8,
    iters: int = 2,
    scale: int = 1000,
) -> tuple[dict[int, list[int]], dict[int, list[int]]]:
    """(trained, sampled-init) codebooks on the raw integer grid —
    the exact values `pq_quantization_error` compares. The trained book
    is `pq_train_codebooks`'s output before the /scale float conversion;
    the sampled book is the first-``n_codewords`` rows quantized the
    same way (Lloyd's init, i.e. `pq_knn`'s default codebook on the
    grid)."""
    cb = pq_train_codebooks(
        embeddings, n_codewords=n_codewords, m_subspaces=m_subspaces,
        iters=iters, scale=scale,
    )
    trained = {
        j: [int(round(x * scale)) for x in v] for j, v in cb.items()
    }
    import math

    sampled = {
        int(r["vec_id"]): [
            int(math.floor(float(x) * scale)) for x in r["embedding"]
        ]
        for r in embeddings.filter(F.col("vec_id") < n_codewords)
        .select("vec_id", "embedding")
        .collect()
    }
    return trained, sampled


def _pq_subspace_code(vecd, cb_rows, n_codewords: int, off: int, sub: int):
    """1-based nearest-codeword id for one subspace — the exact encode
    expression `pq_knn` has always used (micro-unit floored fixed-order
    fold), factored out so the at-rest index writer stores the SAME
    codes the in-memory ADC path computes."""

    def micro(c):
        # fixed-order fold -> micro-unit integer, mirrored in SQL
        return F.floor(
            F.aggregate(c, F.lit(0.0), lambda a, x: a + x)
            * F.lit(1000000.0)
        ).cast("long")

    vsub = F.slice(vecd, off + 1, sub)
    cb_lit = F.array(
        *[
            F.array(*[F.lit(cb_rows[j][off + i]) for i in range(sub)])
            for j in range(n_codewords)
        ]
    )
    dists = F.transform(
        cb_lit,
        lambda c: micro(F.zip_with(vsub, c, lambda x, y: (x - y) * (x - y))),
    )
    return F.array_position(dists, F.array_min(dists))


def _pq_query_table(q: list, cb_rows, n_codewords: int, off: int, sub: int) -> list[int]:
    """query-to-codeword ADC table for one subspace — Python doubles
    with the same left-to-right fold and micro quantization as
    `_pq_subspace_code`, so engine and driver share one arithmetic."""
    import math

    qd = []
    for j in range(n_codewords):
        acc = 0.0
        for i in range(sub):
            d = q[off + i] - cb_rows[j][off + i]
            acc = acc + d * d
        qd.append(int(math.floor(acc * 1000000.0)))
    return qd


# --- Arrow/numpy quantization kernels (r14 optimization) --------------------
#
# The SQ8/PQ encode and distance expressions above are Catalyst
# higher-order functions (zip_with/aggregate lambdas). HOFs are
# evaluated interpreted, per row, outside whole-stage codegen — measured
# at ~300 us/row for the 64-codeword x 8-subspace encode, which
# serialized the ANN quality gates into single-task multi-second stages
# (guide §4.2: hand whole Arrow batches to vectorized native kernels
# instead). These kernels are BIT-EXACT twins of the expressions: every
# float64 operation is replayed in the same IEEE order (a sequential
# Python loop over dimensions doing vectorized numpy column ops — numpy
# float64 arithmetic is the same round-to-nearest binary64 as the JVM's,
# and the loop preserves the fold order), and every integer fold is
# exact in int64 regardless of order. Equality with the expression path
# is pinned per corpus in tests/test_similarity.py::test_np_kernel_parity.


def _np_mat(col, dtype=None):
    """Stack an Arrow list column to a 2D ndarray, widening through the
    stored dtype (float32 parquet -> float64 exactly mirrors the
    expressions' to_double_array cast)."""
    import numpy as np

    m = np.stack(col.to_numpy())
    return m.astype(np.float64) if dtype is None else m.astype(dtype)


def _np_sq_fold_micro(V, crow):
    """Micro-unit floored squared-distance fold of every row of ``V``
    against codeword ``crow`` — the `_pq_subspace_code` micro() fold:
    acc starts at 0.0 and adds (x_i - y_i)^2 left-to-right."""
    import numpy as np

    acc = np.zeros(V.shape[0], dtype=np.float64)
    for i in range(V.shape[1]):
        d = V[:, i] - crow[i]
        acc = acc + d * d
    return np.floor(acc * 1000000.0).astype(np.int64)


def _np_pq_encode(V, cb_grid, n_codewords, m_subspaces):
    """pcode matrix (n x m, 1-based codeword ids) for already-double
    rows ``V`` — exact `_pq_subspace_code` semantics: per subspace the
    FIRST index of the minimum micro distance (array_position)."""
    import numpy as np

    n, dim = V.shape
    sub = dim // m_subspaces
    out = np.empty((n, m_subspaces), dtype=np.int32)
    for m in range(m_subspaces):
        off = m * sub
        dists = np.stack(
            [
                _np_sq_fold_micro(V[:, off:off + sub], cb_grid[j][off:off + sub])
                for j in range(n_codewords)
            ],
            axis=1,
        )
        out[:, m] = dists.argmin(axis=1) + 1  # first min, 1-based
    return out


def pq_codes_np(
    src: DataFrame,
    cb_rows: dict,
    n_codewords: int,
    m_subspaces: int,
    residual_centroids=None,
) -> DataFrame:
    """(vec_id[, cell], pcode) via an Arrow batch kernel — the at-scale
    replacement for mapping `_pq_subspace_code` expressions over the
    corpus. ``residual_centroids`` (k x dim) switches to the IVFADC
    residual encode: r = x - centroid(cell) elementwise (the same
    IEEE-double subtraction as the Spark zip_with), ``src`` must then
    carry a ``cell`` column."""
    import numpy as np
    import pandas as pd

    cb_grid = [
        np.asarray(cb_rows[j], dtype=np.float64) for j in range(n_codewords)
    ]
    C = (
        None
        if residual_centroids is None
        else np.asarray(residual_centroids, dtype=np.float64)
    )
    with_cell = C is not None

    def encode(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = _np_mat(pdf["embedding"])
            if with_cell:
                cells = pdf["cell"].to_numpy()
                V = V - C[cells]  # elementwise double subtract, exact
            P = _np_pq_encode(V, cb_grid, n_codewords, m_subspaces)
            out = {"vec_id": pdf["vec_id"].to_numpy()}
            if with_cell:
                out["cell"] = cells
            out["pcode"] = list(P)
            yield pd.DataFrame(out)

    schema = (
        "vec_id long, cell int, pcode array<int>"
        if with_cell
        else "vec_id long, pcode array<int>"
    )
    cols = ["vec_id", "cell", "embedding"] if with_cell else ["vec_id", "embedding"]
    return src.select(*cols).mapInPandas(encode, schema=schema)


def sq8_codes_np(embeddings: DataFrame, stats: dict) -> DataFrame:
    """(vec_id, code) unsigned SQ8 codes via an Arrow batch kernel —
    exact `_sq8_code_col` arithmetic: floor((v - mn) * 255.0 / scale)
    clamped to [0, 255], degenerate dims code to 0."""
    import numpy as np
    import pandas as pd

    dim = len(stats)
    mn = np.asarray([float(stats[i][0]) for i in range(dim)])
    scale = np.asarray(
        [float(stats[i][1]) - float(stats[i][0]) for i in range(dim)]
    )

    def encode(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = _np_mat(pdf["embedding"])
            out = np.zeros((V.shape[0], dim), dtype=np.int32)
            for i in range(dim):
                if scale[i] == 0.0:
                    continue
                d = V[:, i] - mn[i]
                c = np.floor((d * 255.0) / scale[i])
                out[:, i] = np.clip(c, 0, 255).astype(np.int32)
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"].to_numpy(), "code": list(out)}
            )

    return embeddings.select("vec_id", "embedding").mapInPandas(
        encode, schema="vec_id long, code array<int>"
    )


def _np_sq8_dist(scored: DataFrame) -> DataFrame:
    """(qid, vec_id, sqdist) from rows carrying (code, qcode) — the
    integer fold sum((a-b)^2) as int64 (order-free exact)."""
    import numpy as np
    import pandas as pd

    def dist(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            A = _np_mat(pdf["code"], dtype=np.int64)
            B = _np_mat(pdf["qcode"], dtype=np.int64)
            d = A - B
            yield pd.DataFrame(
                {
                    "qid": pdf["qid"].to_numpy(),
                    "vec_id": pdf["vec_id"].to_numpy(),
                    "sqdist": (d * d).sum(axis=1),
                }
            )

    return scored.select("qid", "vec_id", "code", "qcode").mapInPandas(
        dist, schema="qid long, vec_id long, sqdist long"
    )


def _np_adc_scores(
    coded: DataFrame,
    qd_rows: list,
    n_codewords: int,
    m_subspaces: int,
    by_cell: bool,
) -> DataFrame:
    """(qid, vec_id, adc) fan-out of the ADC lookup-sum over the coded
    corpus: per query (or per (query, probed cell) when ``by_cell``),
    adc = sum_m qd[m * n_codewords + pcode[m]] — integer table lookups
    summed in int64, exact in any order. Rows with vec_id == qid are
    dropped (the expressions' self-exclusion filter)."""
    import numpy as np
    import pandas as pd

    offsets = (np.arange(m_subspaces) * n_codewords) - 1  # 1-based pcode
    if by_cell:
        tables: dict = {}
        for qid, cell, flat in qd_rows:
            tables.setdefault(int(cell), []).append(
                (int(qid), np.asarray(flat, dtype=np.int64))
            )
    else:
        qlist = [(int(qid), np.asarray(flat, dtype=np.int64)) for qid, flat in qd_rows]

    def score(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            P = _np_mat(pdf["pcode"], dtype=np.int64)
            vids = pdf["vec_id"].to_numpy()
            idx = P + offsets
            if by_cell:
                cells = pdf["cell"].to_numpy()
                for cell, qs in tables.items():
                    m = cells == cell
                    if not m.any():
                        continue
                    sub_idx, sub_vid = idx[m], vids[m]
                    for qid, flat in qs:
                        keep = sub_vid != qid
                        yield pd.DataFrame(
                            {
                                "qid": np.full(int(keep.sum()), qid, dtype=np.int64),
                                "vec_id": sub_vid[keep],
                                "adc": flat[sub_idx[keep]].sum(axis=1),
                            }
                        )
            else:
                for qid, flat in qlist:
                    keep = vids != qid
                    yield pd.DataFrame(
                        {
                            "qid": np.full(int(keep.sum()), qid, dtype=np.int64),
                            "vec_id": vids[keep],
                            "adc": flat[idx[keep]].sum(axis=1),
                        }
                    )

    cols = ["vec_id", "cell", "pcode"] if by_cell else ["vec_id", "pcode"]
    return coded.select(*cols).mapInPandas(
        score, schema="qid long, vec_id long, adc long"
    )


def _cosine_scored_expr(joined: DataFrame, passthrough: tuple = ()) -> DataFrame:
    """Expression-form twin of `cosine_scores_np` (the pre-r15 shape),
    kept as the parity anchor: the interpreted HOF cosine fold over the
    same joined relation. Tests pin kernel == expression per corpus."""
    return joined.select(
        "qid",
        "vec_id",
        *passthrough,
        cosine_similarity(F.col("embedding"), F.col("qvec")).alias("cos"),
    )


def cosine_scores_np(joined: DataFrame, passthrough: tuple = ()) -> DataFrame:
    """(qid, vec_id, *passthrough, cos) via an Arrow batch kernel — the
    at-scale replacement for projecting
    ``cosine_similarity(embedding, qvec)`` over a joined candidate
    relation (r15, guide §4.2: the interpreted HOF dot/norm folds were
    the dominant per-row cost of every float-rank ANN gate; stage
    attribution showed four ~7.5 s-task-time fold stages on
    filtered_ann_recall alone).

    Bit-exact replay of the expression (pinned in
    test_similarity.test_cosine_kernel_parity): the three folds
    (a.b, a.a, b.b) run left-to-right per dimension as vectorized
    float64 column ops — product then add, the same one-rounding-each
    IEEE sequence as zip_with + aggregate — then sqrt/multiply/divide
    elementwise (each a single correctly-rounded op on both paths).
    Zero-denominator rows yield NULL exactly like the expression's
    ``when(denom != 0, ...)``.

    ``cos`` is the RAW cosine: callers apply ``F.round(cos, 4)``
    JVM-side, so the BigDecimal decimal rounding stays the Spark Round
    expression and needs no Python twin."""
    import numpy as np
    import pandas as pd

    types = {f.name: f.dataType.simpleString() for f in joined.schema.fields}

    def score(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            A = _np_mat(pdf["embedding"])
            B = _np_mat(pdf["qvec"])
            n = A.shape[0]
            ab = np.zeros(n)
            aa = np.zeros(n)
            bb = np.zeros(n)
            for i in range(A.shape[1]):
                x = A[:, i]
                y = B[:, i]
                ab = ab + x * y
                aa = aa + x * x
                bb = bb + y * y
            denom = np.sqrt(aa) * np.sqrt(bb)
            with np.errstate(divide="ignore", invalid="ignore"):
                cos = ab / denom
            vals = pd.array(cos, dtype="Float64")
            vals[denom == 0.0] = pd.NA
            out = {
                "qid": pdf["qid"].to_numpy(),
                "vec_id": pdf["vec_id"].to_numpy(),
            }
            for c in passthrough:
                out[c] = pdf[c]
            out["cos"] = vals
            yield pd.DataFrame(out)

    schema = ", ".join(
        [f"qid {types['qid']}", f"vec_id {types['vec_id']}"]
        + [f"{c} {types[c]}" for c in passthrough]
        + ["cos double"]
    )
    return joined.select("qid", "vec_id", *passthrough, "embedding", "qvec").mapInPandas(
        score, schema=schema
    )


def pq_knn(
    embeddings: DataFrame,
    query_vec_id: int = 0,
    k: int = 10,
    n_codewords: int = 16,
    m_subspaces: int = 8,
    codebook: dict[int, list[float]] | None = None,
) -> DataFrame:
    """Product-quantization ANN (Jegou, Douze & Schmid 2011): each
    vector splits into ``m_subspaces`` subvectors, each encoded as the
    id of its nearest codeword, and query distance is the sum of
    per-subspace code distances (asymmetric distance computation). The
    codebook here is the deterministic sampled baseline — the first
    ``n_codewords`` vectors per subspace — so the whole path replays
    exactly in SQL; pass ``codebook=pq_train_codebooks(...)`` for the
    trained quantizer (recall lift measured in SCALING.md).

    NOT a standalone production ANN: raw PQ top-k recall at 16x8
    collapses on near-uniform corpora (0.06-0.09 at 10x scale). Use
    ``pq_refine_knn`` — PQ as the compressed SHORTLIST stage plus an
    SQ8/float rerank — which restores recall to the SQ8 tier's level at
    a fraction of its scan bytes; this function is the shortlist stage
    and the exactly-replayable compression contract.

    At 64 dims / 8 subspaces / 16 codewords a vector compresses to 8
    nibbles — 64x smaller than float32 — and the scan touches codes
    plus one 8x16 lookup table. Per-subspace squared distances are
    folded in fixed order and quantized to integer MICRO-UNITS before
    any cross-row comparison or sum, so ranking is bit-exact across
    engines and partition layouts (hash-oracled, not rows-only).

    Scale shape: codebook + query table are driver literals (bounded:
    n_codewords + m x n_codewords rows); encode and distance are
    map-side codegen; top-k is TakeOrderedAndProject. No shuffle.
    """
    import math

    vecd = to_double_array("embedding")
    if codebook is not None:
        # trained codebooks (pq_train_codebooks) — same full-dim-row
        # shape as the sampled baseline, so the encode/ADC path below is
        # identical; the registered oracle query keeps the default
        cb_rows = {int(j): [float(x) for x in v] for j, v in codebook.items()}
        if sorted(cb_rows) != list(range(n_codewords)):
            raise ValueError("codebook must map 0..n_codewords-1 to dim-length rows")
    else:
        cb_rows = {
            r["vec_id"]: [float(x) for x in r["embedding"]]
            for r in embeddings.filter(F.col("vec_id") < n_codewords)
            .select("vec_id", "embedding")
            .collect()
        }
    if len(cb_rows) < n_codewords:
        raise ValueError(f"need vec_ids 0..{n_codewords - 1} for the codebook")
    qrow = (
        embeddings.filter(F.col("vec_id") == query_vec_id)
        .select("embedding")
        .head()
    )
    if qrow is None:
        raise ValueError(f"vec_id {query_vec_id} not found")
    q = [float(x) for x in qrow[0]]
    dim = len(q)
    sub = dim // m_subspaces

    total = F.lit(0).cast("long")
    for m in range(m_subspaces):
        off = m * sub
        code = _pq_subspace_code(vecd, cb_rows, n_codewords, off, sub)
        qd_lit = F.array(
            *[F.lit(x) for x in _pq_query_table(q, cb_rows, n_codewords, off, sub)]
        )
        total = total + F.element_at(qd_lit, code.cast("int"))
    return (
        embeddings.filter(F.col("vec_id") != query_vec_id)
        .select("vec_id", "label", total.alias("pqdist_micro"))
        .orderBy("pqdist_micro", "vec_id")
        .limit(k)
    )


def pq_refine_knn(
    embeddings: DataFrame,
    query_vec_id: int = 0,
    k: int = 10,
    shortlist: int = 100,
    n_codewords: int = 16,
    m_subspaces: int = 8,
    codebook: dict[int, list[float]] | None = None,
    rerank: str = "sq8",
) -> DataFrame:
    """ADC-shortlist -> rerank: the standard composition that makes PQ
    production-usable (FAISS's IVFPQ + RefineFlat shape; Jegou'11 §V's
    own recommendation). Raw 16x8 PQ top-k recall collapses on
    near-uniform corpora (measured 0.06-0.09 at 10x scale, SCALING.md) —
    but PQ top-`shortlist` is a fine FILTER: stage 1 scans only the
    8-byte PQ codes and keeps the `shortlist` best candidates by ADC
    distance; stage 2 reranks just those with a higher-fidelity
    distance and returns the top ``k``.

    ``rerank="sq8"`` (default): integer SQ8 code distance — fully
    deterministic, so the whole two-stage path is hash-oracled, and the
    rerank tier still reads 4x-compressed codes. ``rerank="float"``:
    exact float cosine on the shortlist (the recall ceiling; float sums
    are engine-deterministic per row but threshold-tie order at new
    scales makes it the measurement twin, not the oracle path).

    Scale shape: stage 1 touches 8 bytes/vector (64x compression) with
    a TakeOrderedAndProject keeping `shortlist` ids; stage 2's semi-join
    broadcasts those ids and reranks `shortlist` rows. At R = 5% of the
    corpus the bytes touched are ~8n + 64*0.05n = 11x less than a full
    SQ8 scan, and recall@10 recovers to the SQ8 tier's level (measured:
    quant_recall_r09.json — 0.8 at sf1 vs 0.85 full-scan SQ8).
    """
    cand = pq_knn(
        embeddings,
        query_vec_id=query_vec_id,
        k=shortlist,
        n_codewords=n_codewords,
        m_subspaces=m_subspaces,
        codebook=codebook,
    ).select("vec_id")
    if rerank == "sq8":
        return sq8_knn(embeddings, query_vec_id=query_vec_id, k=k, candidates=cand)
    if rerank == "float":
        row = (
            embeddings.filter(F.col("vec_id") == query_vec_id)
            .select("embedding")
            .head()
        )
        if row is None:
            raise ValueError(f"vec_id {query_vec_id} not found")
        pool = embeddings.filter(F.col("vec_id") != query_vec_id).join(
            F.broadcast(cand), "vec_id", "left_semi"
        )
        return brute_force_knn(pool, list(row[0]), k)
    raise ValueError(f"unknown rerank tier: {rerank!r}")


def contrastive_candidates(
    embeddings: DataFrame,
    query_vec_id: int = 0,
    k: int = 10,
) -> DataFrame:
    """Contrastive-training candidate mining for one anchor: the top-k
    most-similar SAME-label vectors (positives) and the top-k
    most-similar DIFFERENT-label vectors (hard negatives — the
    highest-value negatives for metric learning, per the standard
    hard-negative-mining recipe). Returns (role, rank, vec_id, label,
    cosine).

    Same scale shape as ``knn_for_vec_id``: the anchor row is inlined
    as a literal (k-row driver boundary), one map-side cosine per
    corpus row, and a per-role window whose partitions hold only the
    corpus split by role — at 100 TB this is a scan plus a 2-partition
    top-k, no join anywhere.
    """
    row = (
        embeddings.filter(F.col("vec_id") == query_vec_id)
        .select("embedding", "label")
        .head()
    )
    if row is None:
        raise ValueError(f"vec_id {query_vec_id} not found")
    q = F.array(*[F.lit(float(x)) for x in row[0]])
    anchor_label = int(row[1])
    cos = cosine_similarity(F.col("embedding"), q)
    scored = embeddings.filter(F.col("vec_id") != query_vec_id).select(
        "vec_id",
        "label",
        F.round(cos, 4).alias("cosine"),
        F.when(F.col("label") == anchor_label, F.lit("positive"))
        .otherwise(F.lit("negative"))
        .alias("role"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("role").orderBy(F.desc("cosine"), "vec_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("role", "rank", "vec_id", "label", "cosine")
    )


# --- Johnson-Lindenstrauss random projection (dimensionality reduction) ----

JL_PLANE_OFFSET = 1000  # decorrelates the JL sign stream from the LSH planes


def _jl_sign_component(j: int):
    """Rademacher sign s(j, d) = ±1 from the parity of
    xxhash64(JL_PLANE_OFFSET + j, d) — same derivation family as
    ``hyperplane_signature``'s planes but an offset plane index, so the
    two pseudo-random streams never alias. Closure factory (not a
    default arg) for the same PySpark lambda-bridge reason as there."""
    return lambda d: (
        F.when(
            F.xxhash64(F.lit(JL_PLANE_OFFSET + j), d).bitwiseAND(F.lit(1)) == 1,
            F.lit(1),
        )
        .otherwise(F.lit(-1))
        .cast("long")
    )


def jl_project(
    embeddings: DataFrame,
    out_dim: int = 16,
    dim: int = 64,
    quant: int = 1_000_000,
) -> DataFrame:
    """Johnson-Lindenstrauss random projection: reduce ``dim``-dim
    embeddings to ``out_dim`` integer coordinates with a deterministic
    Rademacher sign matrix — the standard pre-clustering /
    pre-dedup dimensionality-reduction step (Achlioptas 2003: ±1
    entries satisfy the JL lemma with the same distortion bounds as
    Gaussian matrices, and need no stored matrix).

    EXACT integer contract, same convention as the quantized near-dup
    family (``dedup.embedding_near_dup_pairs_exact``): each component
    is floor-quantized ``q_i = floor(v_i * quant)`` and the projection
    is ``y_j = sum_i s(j, i) * q_i`` — pure int64 arithmetic
    (|y_j| <= dim * quant = 6.4e7 at the defaults), so the output is a
    function of the input bytes alone: same result on any engine, any
    partitioning, any scale. Squared distances are preserved in
    expectation scaled by ``out_dim``: E[|ya - yb|^2] = out_dim *
    |qa - qb|^2 (measured distortion gate: ``jl_distortion_stats``).

    Scale shape: the sign matrix folds to literals inside one map-side
    projection (whole-stage codegen, no Python, no stored model, no
    shuffle); at 100 TB this is a scan that writes out_dim/dim of the
    input bytes — e.g. 64->16 dims cuts every downstream k-means /
    SemDeDup / ANN-train pass to a quarter of the I/O while keeping
    cluster structure (cosine locality is what the identical-family
    LSH signs already exploit).

    Returns (vec_id, label, proj: array<long> length ``out_dim``).
    """
    # r14 opt (guide §4.2): the sign grid s(j, i) is a CONSTANT ±1
    # matrix, but expressed inside HOF lambdas it re-evaluated
    # xxhash64 per row per (j, i) — out_dim x dim interpreted calls per
    # vector. Evaluate the grid ONCE through the identical Spark
    # expressions (one 1-row job, cached per shape), then run the
    # projection as one int64 matrix product per Arrow batch —
    # bit-identical: q = floor(x * quant) replays the same IEEE ops,
    # and the ±1 dot fold is int64 (order-free, wrap-consistent).
    import numpy as np
    import pandas as pd

    S = _jl_sign_matrix(embeddings.sparkSession, out_dim, dim)
    ST = S.T
    fq = float(quant)

    def project(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = _np_mat(pdf["embedding"])
            Q = np.floor(V * fq).astype(np.int64)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy(),
                    "label": pdf["label"].to_numpy(),
                    "proj": list(Q @ ST),
                }
            )

    return embeddings.select("vec_id", "label", "embedding").mapInPandas(
        project, schema="vec_id long, label int, proj array<long>"
    )


#: constant Rademacher grids, keyed by (out_dim, dim) — pure functions
#: of the shape (xxhash64 parities of literal plane/dim indices), not
#: of any input data
_JL_SIGN_CACHE: dict[tuple[int, int], "object"] = {}


def _jl_sign_matrix(spark: SparkSession, out_dim: int, dim: int):
    import numpy as np

    key = (out_dim, dim)
    S = _JL_SIGN_CACHE.get(key)
    if S is None:
        row = (
            spark.range(1)
            .select(
                F.array(
                    *[
                        F.array(
                            *[
                                _jl_sign_component(j)(F.lit(i))
                                for i in range(dim)
                            ]
                        )
                        for j in range(out_dim)
                    ]
                ).alias("s")
            )
            .head()
        )
        S = np.asarray(row["s"], dtype=np.int64)
        _JL_SIGN_CACHE[key] = S
    return S


def jl_distortion_stats(
    embeddings: DataFrame,
    out_dim: int = 16,
    dim: int = 64,
    n_sample: int = 20,
    quant: int = 10_000,
) -> DataFrame:
    """JL distance-preservation as an in-gate verdict the oracle can
    RECOMPUTE (stronger than the fixture-pinned recall gates): over all
    pairs among vec_ids < ``n_sample``, the exact integer sums of
    projected and original squared distances, plus their ratio —
    E[ratio] = 1 by the JL lemma, and every quantity except the final
    one-division ratio is int64 arithmetic DuckDB replays itself.

    ``quant`` is deliberately coarser than ``jl_project``'s default so
    every sum is bounded by construction (|q_i| <= 1e4 for unit-scale
    inputs => per-pair projected d2 <= out_dim * (2 * dim * quant)^2
    ~ 2.6e13, times n_sample^2/2 pairs ~ 5e15 < 2^53), which also makes
    the ratio division exact-input: both integer sums are < 2^53, so
    the double division is one correctly-rounded op on both engines.

    Scale shape: the sample is a broadcast self-join of ``n_sample``
    rows — a driver-bounded verdict, not a corpus-scale pass.
    """
    # the projection joined to the quantized original, sample-bounded
    base = jl_project(
        embeddings.filter(F.col("vec_id") < n_sample),
        out_dim=out_dim,
        dim=dim,
        quant=quant,
    ).join(
        embeddings.filter(F.col("vec_id") < n_sample).select(
            "vec_id",
            F.transform(
                to_double_array("embedding"),
                lambda x: F.floor(x * quant).cast("long"),
            ).alias("q"),
        ),
        "vec_id",
    )
    a = base.alias("a")
    b = base.alias("b")
    sq = lambda x, y: (x - y) * (x - y)  # noqa: E731
    pairs = a.join(
        F.broadcast(b), F.col("a.vec_id") < F.col("b.vec_id")
    ).select(
        F.aggregate(
            F.zip_with(F.col("a.q"), F.col("b.q"), sq),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("d2_orig"),
        F.aggregate(
            F.zip_with(F.col("a.proj"), F.col("b.proj"), sq),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("d2_proj"),
    )
    return pairs.agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum("d2_proj").alias("sum_d2_proj"),
        (F.sum("d2_orig") * out_dim).alias("sum_d2_orig_scaled"),
        F.round(
            F.sum("d2_proj").cast("double")
            / (F.sum("d2_orig") * out_dim).cast("double"),
            4,
        ).alias("distortion_ratio"),
        F.when(
            (F.sum("d2_proj") * 2 >= F.sum("d2_orig") * out_dim)
            & (F.sum("d2_proj") <= F.sum("d2_orig") * out_dim * 2),
            1,
        )
        .otherwise(0)
        .alias("within_2x"),
    )


def ivf_jl_knn(
    spark: SparkSession,
    embeddings: DataFrame,
    query_vec_id: int = 0,
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    out_dim: int = 16,
    jl_quant: int = 1000,
    lloyd_iters: int = 1,
) -> DataFrame:
    """IVF with a Johnson-Lindenstrauss SKETCH coarse quantizer: cells
    are built and probed in ``out_dim``-dim projection space
    (``jl_project``), then the survivors are ranked by full-dimension
    SQ8 integer code distance — completing the JL family's coverage of
    the ANN tier (projection -> clustering -> dedup -> ANN all share
    the one sketch).

    Why this shape at 100 TB: the coarse tier's build cost is the
    k-means assignment term O(n * n_cells * dim) — with n_cells grown
    ~ n/cell_size at scale, the dominant bill — and the sketch cuts its
    dim factor 4x at the defaults. The measured trade
    (ann_recall_sf1_r09.json, 32 queries at 20k vectors): the sketch
    coarse tier costs ~0.12-0.15 recall@10 at EQUAL scan fraction —
    one probe doubling to match raw IVF — so this variant fits
    BUILD-heavy / query-light regimes (frequently-rebuilt corpora,
    streaming ingest); query-heavy serving should pay the raw-space
    build (``ivf_sq8_knn``). The rank fidelity tier is untouched in
    both: SQ8 codes are built from the RAW corpus, so within probed
    cells ranking is exactly the deployed two-tier path's (full-probe
    degenerates to the full-scan SQ8 ranking, pytest-pinned), and the
    `ivf_jl_quality` gate pins per-fixture recall as the drift
    detector.

    The sketch is materialized once (localCheckpoint) before Lloyd
    iterates — the silver-zone shape, same as ``semdedup_jl``.
    """
    import numpy as np

    proj = jl_project(embeddings, out_dim=out_dim, quant=jl_quant)
    as_emb = proj.select(
        "vec_id",
        F.transform("proj", lambda y: y.cast("double")).alias("embedding"),
    ).localCheckpoint(eager=True)
    assignments, centroids = build_ivf_index(
        as_emb, n_cells=n_cells, lloyd_iters=lloyd_iters
    )
    qrow = (
        as_emb.filter(F.col("vec_id") == query_vec_id).select("embedding").head()
    )
    if qrow is None:
        raise ValueError(f"vec_id {query_vec_id} not found")
    q = np.asarray(qrow[0], dtype=np.float64)
    qn = q / max(np.linalg.norm(q), 1e-12)
    probe_cells = [int(c) for c in (centroids @ qn).argsort()[::-1][:n_probe]]
    candidates = assignments.filter(F.col("cell").isin(probe_cells))
    return sq8_knn(embeddings, query_vec_id=query_vec_id, k=k, candidates=candidates)


def append_to_ivf_sq8_index(
    spark: SparkSession,
    index_path: str,
    centroids,
    stats: dict,
    new_vectors: DataFrame,
) -> int:
    """Incrementally ADD vectors to a written IVF+SQ8 index (FAISS
    ``add`` semantics): each new vector is assigned to its nearest
    STORED centroid and encoded with the STORED per-dim codebook —
    neither is retrained, so every previously-written code row stays
    byte-identical and a probe sees old and new vectors under exactly
    the same geometry. This is the continuous-ingest shape a training
    pipeline needs: embeddings stream in per batch, the index grows by
    appending cell-partitioned files, and full rebuilds happen on a
    slow cadence (when drift in the frozen codebook/centroids warrants
    it — the same tradeoff FAISS documents for add-after-train).

    Scale shape: assignment is one broadcast of k x dim centroid
    literals folded into a map-side argmin (no shuffle), encoding is
    the same codegen expression as the initial writer, and the write
    APPENDS into the existing ``cell=`` directories — PartitionFilters
    pruning over probes is unchanged. Returns the number of appended
    rows (one count job on the batch).

    Epsilon-tie caveat: assignment here is a Spark sequential float
    fold (dot/norm argmax), while ``build_ivf_index`` assigns with
    numpy BLAS (``V @ C.T``) — the same metric, but FP summation order
    differs, so a vector almost exactly equidistant between two
    centroids can land in a different cell than a full rebuild would
    put it. Frozen-geometry exactness holds regardless (codes are
    identical and full-probe search is rank-exact vs a union re-encode,
    pytest-pinned); only PARTIAL-probe results for such boundary
    vectors may differ from a rebuilt index by that one cell.

    Reference parity note: extension beyond the reference per the
    training-data-pipeline north star (BASELINE.json); composes with
    ``ivf_sq8_knn_pruned`` for probing.
    """
    coded = encode_frozen_geometry(new_vectors, centroids, stats)
    n = coded.count()
    coded.write.mode("append").partitionBy("cell").parquet(index_path)
    return n


def _np_sq8_codes_signed(V, mn, span):
    """Signed at-rest SQ8 codes for already-double rows ``V`` — the
    exact `_sq8_code_col` arithmetic ((v - mn) * 255.0 / span, floored,
    clamped to [0, 255]; degenerate dims 0) shifted by -128 into the
    parquet INT8 range. Pure per-dimension IEEE double ops in the
    expressions' order."""
    import numpy as np

    n, dim = V.shape
    codes = np.zeros((n, dim), dtype=np.int32)
    for i in range(dim):
        if span[i] == 0.0:
            continue
        d = V[:, i] - mn[i]
        c = np.floor((d * 255.0) / span[i])
        codes[:, i] = np.clip(c, 0, 255).astype(np.int32)
    return (codes - 128).astype(np.int8)


def _np_assign_cells(V, C):
    """Frozen-geometry cosine-argmax cell per row — the exact
    `encode_frozen_geometry` expression arithmetic: sequential
    per-dimension float64 folds for the norm and each centroid dot
    (same IEEE order as the aggregate(zip_with) lambdas), dots divided
    by max(norm, 1e-12), first-max tie like array_position(array_max).
    Returns (cells int64 array, dots (n x k) matrix, denom)."""
    import numpy as np

    n, dim = V.shape
    acc = np.zeros(n, dtype=np.float64)
    for i in range(dim):
        acc = acc + V[:, i] * V[:, i]
    denom = np.maximum(np.sqrt(acc), 1e-12)
    dots = np.empty((n, C.shape[0]), dtype=np.float64)
    for c in range(C.shape[0]):
        a = np.zeros(n, dtype=np.float64)
        for i in range(dim):
            a = a + V[:, i] * C[c, i]
        dots[:, c] = a / denom
    return dots.argmax(axis=1), dots, denom


def encode_frozen_geometry(
    new_vectors: DataFrame, centroids, stats: dict
) -> DataFrame:
    """Assign + SQ8-encode a batch under STORED index geometry — an
    Arrow/numpy batch kernel since r15 (guide §4.2: the expression form
    `_encode_frozen_geometry_expr` evaluated n_cells aggregate(zip_with)
    dot folds per row, interpreted, plus a k x dim literal tree that
    re-paid analysis every epoch). Bit-exact twin of the expression
    form (`_np_assign_cells` / `_np_sq8_codes_signed` replay the IEEE
    fold order; tie-breaks match first-max) — pinned by
    tests/test_similarity.py::test_frozen_geometry_kernel_parity.
    Returns (vec_id, label, code tinyint[], cell int)."""
    import numpy as np
    import pandas as pd

    C = np.asarray(centroids, dtype=np.float64)
    n_cells, dim = C.shape
    if len(stats) != dim:
        raise ValueError("stats/centroid dim mismatch")
    mn = np.asarray([float(stats[i][0]) for i in range(dim)])
    span = np.asarray([float(stats[i][1]) - float(stats[i][0]) for i in range(dim)])

    def enc(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = _np_mat(pdf["embedding"])
            cells, _, _ = _np_assign_cells(V, C)
            codes = _np_sq8_codes_signed(V, mn, span)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy(),
                    "label": pdf["label"].to_numpy(),
                    "code": list(codes),
                    "cell": cells.astype(np.int32),
                }
            )

    return new_vectors.select("vec_id", "label", "embedding").mapInPandas(
        enc, schema="vec_id long, label int, code array<tinyint>, cell int"
    )


def _encode_frozen_geometry_expr(
    new_vectors: DataFrame, centroids, stats: dict
) -> DataFrame:
    """EXPRESSION-FORM reference for `encode_frozen_geometry` (pre-r15)
    — kept as the kernel's parity anchor.

    Assignment is a literal-folded cosine argmax over an ARRAY of cell
    dots — array_position(array_max), first max on ties like numpy
    argmax. (This replaced a sequential `dot > best` when-chain that
    referenced the running best TWICE per cell, doubling the expression
    tree per iteration: exponential codegen, ~2^16 dot-folds at
    n_cells=16 — found when the r10 retrain-trigger sweep stalled
    minutes in this assignment. The array form is linear in n_cells.)
    """
    import numpy as np

    C = np.asarray(centroids, dtype=np.float64)
    n_cells, dim = C.shape
    if len(stats) != dim:
        raise ValueError("stats/centroid dim mismatch")
    vecd = to_double_array("embedding")
    norm = F.sqrt(
        F.aggregate(vecd, F.lit(0.0), lambda a, x: a + x * x)
    )
    dots = F.array(
        *[
            F.aggregate(
                F.zip_with(
                    vecd,
                    F.array(*[F.lit(float(x)) for x in C[c]]),
                    lambda x, y: x * y,
                ),
                F.lit(0.0),
                lambda a, x: a + x,
            )
            / F.greatest(norm, F.lit(1e-12))
            for c in range(n_cells)
        ]
    )
    best_cell = F.array_position(dots, F.array_max(dots)) - 1
    mn_lit = F.array(*[F.lit(float(stats[i][0])) for i in range(dim)])
    scale_lit = F.array(
        *[F.lit(float(stats[i][1]) - float(stats[i][0])) for i in range(dim)]
    )
    return new_vectors.select(
        "vec_id",
        "label",
        F.transform(
            _sq8_code_col(vecd, mn_lit, scale_lit),
            lambda c: (c - 128).cast("tinyint"),
        ).alias("code"),
        best_cell.cast("int").alias("cell"),
    )


# --- multi-query recall harness (verdict gates) -----------------------------
#
# The r9 IVF-JL episode proved single-query verdict gates underestimate
# quality gaps: the gate read 6/10 vs the raw twin's 7/10 where the
# 32-query curve (ann_recall_sf1_r09.json) showed 0.387 vs 0.531
# recall@10. These helpers give every ANN gate a 16-query recall
# numerator (recall_n over 160) computed in ONE Spark plan per stage —
# the index builds once, the 16 probes share a broadcast-joined scan,
# and per-query top-k is a 16-partition window, so the gate statistic
# finally matches the curve that drives design decisions without paying
# 16x single-query job latency.

ANN_GATE_QUERY_IDS: tuple[int, ...] = tuple(j * 31 for j in range(16))
"""16 fixed gate query ids, spread 0..465 (present at every fixture
size — the smallest corpus is 500 vectors). Spread, not 0..15, so the
sample isn't biased toward one synthesis stripe."""


def _gate_query_vecs(
    embeddings: DataFrame, query_ids
) -> list[tuple[int, list[float]]]:
    """Collect the gate query vectors — len(query_ids) rows, the same
    driver metadata boundary as the single-query `.head()` path."""
    rows = (
        embeddings.filter(F.col("vec_id").isin(list(query_ids)))
        .select("vec_id", "embedding")
        .collect()
    )
    got = {int(r[0]): [float(x) for x in r[1]] for r in rows}
    missing = [q for q in query_ids if q not in got]
    if missing:
        raise ValueError(f"gate query vec_ids missing from corpus: {missing}")
    return [(int(q), got[int(q)]) for q in query_ids]


def _gate_queries_df(spark: SparkSession, qvecs) -> DataFrame:
    return spark.createDataFrame(
        [(q, v) for q, v in qvecs], "qid long, qvec array<double>"
    )


def _topk_per_query(scored: DataFrame, order_cols, k: int) -> DataFrame:
    """Per-qid top-k: a row_number window over 16 tiny partitions.
    Deterministic because every order_cols list ends in vec_id."""
    from pyspark.sql import Window

    w = Window.partitionBy("qid").orderBy(*order_cols)
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("qid", "vec_id")
    )


def _salted_topk_per_query(
    scored: DataFrame, order_cols, k: int, buckets: int = 32
) -> DataFrame:
    """EXACT distributed per-qid top-k for corpus-sized candidate
    relations (r13): a plain per-qid window sorts |candidates| rows in
    only n_queries partitions — parallelism capped at 16 on this gate
    regardless of cores, the superlinear wall term bench_scale_new_r12
    flagged on filtered_ann_recall. Two levels fix it: top-k per
    (qid, xxhash64-salt bucket) first (n_queries x buckets concurrent
    small sorts), then the final top-k over the <= k*buckets survivors
    per qid. Exact because the global top-k is contained in the union
    of per-bucket top-ks; deterministic because every order_cols list
    ends in vec_id. Returns the ranked rows (all of scored's columns +
    rn) so callers can keep rank semantics."""
    from pyspark.sql import Window

    w1 = Window.partitionBy("qid", "__salt").orderBy(*order_cols)
    w2 = Window.partitionBy("qid").orderBy(*order_cols)
    pruned = (
        scored.withColumn(
            "__salt", F.pmod(F.xxhash64("vec_id"), F.lit(buckets))
        )
        .withColumn("__rn1", F.row_number().over(w1))
        .filter(F.col("__rn1") <= k)
        .drop("__rn1", "__salt")
    )
    return pruned.withColumn("rn", F.row_number().over(w2)).filter(
        F.col("rn") <= k
    )


def exact_knn_multi(
    spark: SparkSession,
    embeddings: DataFrame,
    query_ids=ANN_GATE_QUERY_IDS,
    k: int = 10,
) -> DataFrame:
    """Exact cosine top-k for every gate query in one plan: corpus x
    16-row broadcast nested-loop, per-row fixed-order cosine fold
    rounded to 4 decimals with a vec_id tiebreak — the identical
    determinism contract as `brute_force_knn`, so at k=10 /
    query_vec_id=0 this degenerates to its result (pytest-pinned)."""
    qdf = _gate_queries_df(spark, _gate_query_vecs(embeddings, query_ids))
    joined = embeddings.crossJoin(F.broadcast(qdf)).filter(
        F.col("vec_id") != F.col("qid")
    )
    # Arrow/numpy cosine fold (r15 opt, guide §4.2), rounded JVM-side
    scored = cosine_scores_np(joined).withColumn("cos", F.round("cos", 4))
    return _topk_per_query(scored, [F.desc("cos"), F.col("vec_id")], k)


def _sq8_rank_multi(
    spark: SparkSession,
    embeddings: DataFrame,
    query_ids,
    candidates: DataFrame,
    k: int,
) -> DataFrame:
    """SQ8 integer ranking over per-qid candidate sets
    (``candidates``: [qid, vec_id]). Codebook stats and query codes come
    from the FULL corpus through the exact `sq8_knn` expressions, so a
    full-corpus candidate set reproduces `sq8_knn` per query."""
    stats = {
        r["pos"]: (r["mn"], r["mx"]) for r in sq8_corpus_stats(embeddings).collect()
    }
    # Arrow/numpy encode + integer distance fold (r14 opt, guide §4.2)
    # — bit-exact twins of the `_sq8_code_col` / zip_with expressions
    # (parity pinned in tests); the HOF expression forms serialized
    # this rank into a single-task multi-second stage.
    coded = sq8_codes_np(embeddings, stats)
    qcoded = coded.filter(F.col("vec_id").isin(list(query_ids))).select(
        F.col("vec_id").alias("qid"), F.col("code").alias("qcode")
    )
    joined = (
        candidates.filter(F.col("vec_id") != F.col("qid"))
        .join(coded, "vec_id")
        .join(F.broadcast(qcoded), "qid")
    )
    scored = _np_sq8_dist(joined)
    return _topk_per_query(scored, [F.col("sqdist"), F.col("vec_id")], k)


def _probe_pairs_df(spark: SparkSession, centroids, qvecs, n_probe: int) -> DataFrame:
    """(qid, cell) probe pairs for every gate query — numpy over the
    already-collected k x dim centroid matrix, 16 * n_probe rows."""
    import numpy as np

    pairs = []
    for qid, v in qvecs:
        q = np.asarray(v, dtype=np.float64)
        qn = q / max(np.linalg.norm(q), 1e-12)
        for c in (centroids @ qn).argsort()[::-1][:n_probe]:
            pairs.append((qid, int(c)))
    return spark.createDataFrame(pairs, "qid long, cell int")


def ivf_knn_multi(
    spark: SparkSession,
    embeddings: DataFrame,
    query_ids=ANN_GATE_QUERY_IDS,
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    lloyd_iters: int = 1,
    rank: str = "float",
) -> DataFrame:
    """Multi-query IVF top-k: ONE index build, one broadcast-joined
    candidate scan for all queries, per-qid ranking (``rank="float"`` =
    `ivf_knn`'s cosine tier, ``rank="sq8"`` = `ivf_sq8_knn`'s integer
    tier). Per query, candidates are exactly the single-query
    operator's probed-cell members, so measured recall is the deployed
    operator's recall."""
    assignments, centroids = build_ivf_index(
        embeddings, n_cells=n_cells, lloyd_iters=lloyd_iters
    )
    qvecs = _gate_query_vecs(embeddings, query_ids)
    probe_df = _probe_pairs_df(spark, centroids, qvecs, n_probe)
    candidates = assignments.join(F.broadcast(probe_df), "cell").select(
        "qid", "vec_id"
    )
    if rank == "sq8":
        return _sq8_rank_multi(spark, embeddings, [q for q, _ in qvecs], candidates, k)
    qdf = _gate_queries_df(spark, qvecs)
    joined = (
        candidates.filter(F.col("vec_id") != F.col("qid"))
        .join(embeddings.select("vec_id", "embedding"), "vec_id")
        .join(F.broadcast(qdf), "qid")
    )
    # Arrow/numpy cosine fold (r15 opt, guide §4.2), rounded JVM-side
    scored = cosine_scores_np(joined).withColumn("cos", F.round("cos", 4))
    return _topk_per_query(scored, [F.desc("cos"), F.col("vec_id")], k)


def ivf_jl_knn_multi(
    spark: SparkSession,
    embeddings: DataFrame,
    query_ids=ANN_GATE_QUERY_IDS,
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    out_dim: int = 16,
    jl_quant: int = 1000,
    lloyd_iters: int = 1,
) -> DataFrame:
    """Multi-query `ivf_jl_knn`: cells built AND probed in JL sketch
    space (the probe direction for each query is its own sketch vector,
    exactly as the single-query path), full-dim SQ8 ranking inside."""
    proj = jl_project(embeddings, out_dim=out_dim, quant=jl_quant)
    as_emb = proj.select(
        "vec_id",
        F.transform("proj", lambda y: y.cast("double")).alias("embedding"),
    ).localCheckpoint(eager=True)
    assignments, centroids = build_ivf_index(
        as_emb, n_cells=n_cells, lloyd_iters=lloyd_iters
    )
    sketch_qvecs = _gate_query_vecs(as_emb, query_ids)
    probe_df = _probe_pairs_df(spark, centroids, sketch_qvecs, n_probe)
    candidates = assignments.join(F.broadcast(probe_df), "cell").select(
        "qid", "vec_id"
    )
    return _sq8_rank_multi(spark, embeddings, list(query_ids), candidates, k)


def pq_refine_knn_multi(
    spark: SparkSession,
    embeddings: DataFrame,
    query_ids=ANN_GATE_QUERY_IDS,
    k: int = 10,
    shortlist: int = 100,
    n_codewords: int = 16,
    m_subspaces: int = 8,
    codebook: dict[int, list[float]] | None = None,
) -> DataFrame:
    """Multi-query `pq_refine_knn` (sampled codebook by default — pass
    ``codebook=pq_train_codebooks(...)`` for the trained one; sq8
    rerank): the
    corpus PQ-encodes ONCE into an m-element code array, each query's
    flat ADC table joins in as a broadcast row, stage-1 keeps the
    per-qid ADC top-``shortlist``, stage-2 SQ8-reranks those candidate
    sets — identical per-subspace micro-unit arithmetic to
    `_pq_subspace_code` / `_pq_query_table`, so per query the result
    equals the single-query operator's."""
    if codebook is not None:
        cb_rows = {int(j): [float(x) for x in v] for j, v in codebook.items()}
        if sorted(cb_rows) != list(range(n_codewords)):
            raise ValueError("codebook must map 0..n_codewords-1 to dim-length rows")
    else:
        cb_rows = {
            r["vec_id"]: [float(x) for x in r["embedding"]]
            for r in embeddings.filter(F.col("vec_id") < n_codewords)
            .select("vec_id", "embedding")
            .collect()
        }
    if len(cb_rows) < n_codewords:
        raise ValueError(f"need vec_ids 0..{n_codewords - 1} for the codebook")
    dim = len(next(iter(cb_rows.values())))
    sub = dim // m_subspaces
    # Arrow/numpy PQ encode + ADC lookup-sum fan-out (r14 opt, guide
    # §4.2) — bit-exact twins of the `_pq_subspace_code` / element_at
    # fold expressions (parity pinned in tests). Same dataflow: corpus
    # encodes once, each query's flat ADC table scores every coded row,
    # per-qid shortlist feeds the SQ8 rerank.
    coded = pq_codes_np(embeddings, cb_rows, n_codewords, m_subspaces)
    qvecs = _gate_query_vecs(embeddings, query_ids)
    qrows = []
    for qid, q in qvecs:
        flat: list[int] = []
        for m in range(m_subspaces):
            flat.extend(_pq_query_table(q, cb_rows, n_codewords, m * sub, sub))
        qrows.append((qid, flat))
    adc = _np_adc_scores(coded, qrows, n_codewords, m_subspaces, by_cell=False)
    cand = _topk_per_query(adc, [F.col("adc"), F.col("vec_id")], shortlist)
    return _sq8_rank_multi(spark, embeddings, list(query_ids), cand, k)


def ivfadc_residual_knn_multi(
    spark: SparkSession,
    embeddings: DataFrame,
    query_ids=ANN_GATE_QUERY_IDS,
    k: int = 10,
    shortlist: int = 100,
    n_cells: int = 8,
    n_probe: int = 4,
    n_codewords: int = 64,
    m_subspaces: int = 8,
    lloyd_iters: int = 1,
    codebook: dict[int, list[float]] | None = None,
) -> DataFrame:
    """RESIDUAL-encoded IVFADC + SQ8 refine (FAISS's actual IVFPQ
    recipe, Jegou'11 §III-C): PQ encodes r = x - centroid(cell(x))
    instead of the raw vector, and the query's ADC table is built per
    (query, probed cell) from q - centroid(cell). On CLUSTERABLE data
    residuals concentrate near the origin, so a small shared codebook
    covers them far better than raw vectors — where IVFADC recall comes
    from at small codebooks.

    Measured regime boundary (quant_recall_r10.json, r10 null result):
    on the near-uniform synthetic corpus residuals are 1.26x LARGER
    than the raw unit vectors (weak centroids, small x.c), and residual
    encoding LOSES 0.07-0.10 recall@10 at equal bytes at every scale,
    sampled or trained codebook (20k vectors: 119/160 full-probe vs raw
    ADC's 133/160). Prefer `pq_refine_knn` on unclusterable corpora;
    reach for this when mean ||x - centroid|| / ||x|| < 1 — check that
    ratio first, it is one aggregate.

    Integer-grid determinism: the residual subtraction is elementwise
    IEEE-double (no fold, so bit-identical in Spark, Python, and SQL),
    and the per-subspace distances reuse `_pq_subspace_code`'s
    micro-unit floored fixed-order fold. The shared residual codebook
    is the sampled baseline — residuals of the first ``n_codewords``
    corpus vectors under the SAME frozen centroids — so the whole path
    replays without shipping a trained artifact.

    Scale shape: one IVF build; corpus residual-encodes once into m
    tinyint-range codes + a cell id (same at-rest bytes as the raw
    ADC index +1 cell byte, already paid by partitioning); candidates
    are probed-cell members via a 16*n_probe-row broadcast; ADC tables
    are a 16*n_probe x (m*n_codewords) broadcast literal table; the
    per-qid shortlist windows feed the SQ8 rerank. n_probe == n_cells
    degenerates to a full-scan residual ADC shortlist (the equal-bytes
    comparison point against `pq_refine_knn_multi`).

    Returns (qid, vec_id) per-query top-k like the other multis.
    """
    assignments, centroids = build_ivf_index(
        embeddings, n_cells=n_cells, lloyd_iters=lloyd_iters
    )
    # shared residual codebook: residuals of the first n_codewords
    # vectors under the frozen centroids (driver-side elementwise
    # subtraction — bit-identical to the Spark expression); pass
    # ``codebook`` (residual-space rows, e.g. pq_train_codebooks over
    # the residual table) to override the sampled baseline
    if codebook is not None:
        cb_rows = {int(j): [float(x) for x in v] for j, v in codebook.items()}
        if sorted(cb_rows) != list(range(n_codewords)):
            raise ValueError("codebook must map 0..n_codewords-1 to dim-length rows")
    else:
        cb_src = (
            embeddings.filter(F.col("vec_id") < n_codewords)
            .join(assignments, "vec_id")
            .select("vec_id", "embedding", "cell")
            .collect()
        )
        if len(cb_src) < n_codewords:
            raise ValueError(
                f"need vec_ids 0..{n_codewords - 1} for the codebook"
            )
        cb_rows = {
            int(r["vec_id"]): [
                float(x) - float(centroids[int(r["cell"])][i])
                for i, x in enumerate(r["embedding"])
            ]
            for r in cb_src
        }
    dim = len(next(iter(cb_rows.values())))
    sub = dim // m_subspaces
    # Arrow/numpy residual PQ encode (r14 opt, guide §4.2): r = x -
    # centroid(cell) elementwise, then the exact `_pq_subspace_code`
    # micro-fold encode — bit-exact twins of the expression forms
    # (parity pinned in tests).
    coded = pq_codes_np(
        embeddings.join(assignments, "vec_id").select(
            "vec_id", "cell", "embedding"
        ),
        cb_rows,
        n_codewords,
        m_subspaces,
        residual_centroids=centroids,
    )
    qvecs = _gate_query_vecs(embeddings, query_ids)
    probe_df = _probe_pairs_df(spark, centroids, qvecs, n_probe)
    # per-(qid, cell) ADC table: the query RESIDUAL against that cell
    qd_rows = []
    qmap = dict(qvecs)
    for qid, cell in sorted((r["qid"], r["cell"]) for r in probe_df.collect()):
        q = qmap[qid]
        qres = [float(q[i]) - float(centroids[cell][i]) for i in range(dim)]
        flat: list[int] = []
        for m in range(m_subspaces):
            flat.extend(_pq_query_table(qres, cb_rows, n_codewords, m * sub, sub))
        qd_rows.append((qid, cell, flat))
    # scoring by cell alone IS the probe: a coded row is scored by every
    # (qid, cell) table probing its cell — i.e. exactly the queries
    # whose candidate set contains it
    adc = _np_adc_scores(coded, qd_rows, n_codewords, m_subspaces, by_cell=True)
    cand = _topk_per_query(adc, [F.col("adc"), F.col("vec_id")], shortlist)
    return _sq8_rank_multi(spark, embeddings, list(query_ids), cand, k)


def batch_drift_metrics(
    new_vectors: DataFrame,
    centroids,
    stats: dict,
    vec_col: str = "embedding",
) -> DataFrame:
    """The ONLINE re-train trigger for the incremental index
    (SCALING.md r10, retrain_trigger_r10.json): one map-side pass over
    a to-be-appended batch against the FROZEN geometry, returning a
    1-row DataFrame (mean_assign_dist / clip_frac / n — see
    `_batch_drift_metrics_expr` for the full contract and thresholds).

    The PER-ROW projection (assignment distance d, out-of-grid
    component count oob) is an Arrow/numpy kernel since r15 (guide
    §4.2 — the expression form paid n_cells interpreted dot folds per
    row plus a k x dim literal tree per epoch); the kernel replays the
    expressions' IEEE fold order so every (d, oob) row is bit-identical,
    and the 1-row reduction stays the SAME Spark aggregate over the
    same narrow partitioning — so the rounded mean is bit-identical
    too. Parity pinned by
    tests/test_similarity.py::test_frozen_geometry_kernel_parity."""
    import numpy as np
    import pandas as pd

    C = np.asarray(centroids, dtype=np.float64)
    n_cells, dim = C.shape
    if len(stats) != dim:
        raise ValueError("stats/centroid dim mismatch")
    mn = np.asarray([float(stats[i][0]) for i in range(dim)])
    mx = np.asarray([float(stats[i][1]) for i in range(dim)])

    def proj(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = _np_mat(pdf[vec_col])
            cells, _, _ = _np_assign_cells(V, C)
            B = C[cells]  # best centroid per row
            acc = np.zeros(len(pdf), dtype=np.float64)
            for i in range(dim):
                d_ = V[:, i] - B[:, i]
                acc = acc + d_ * d_
            dist = np.sqrt(acc)
            oob = np.zeros(len(pdf), dtype=np.int64)
            for i in range(dim):
                oob += ((V[:, i] < mn[i]) | (V[:, i] > mx[i])).astype(np.int64)
            yield pd.DataFrame({"d": dist, "oob": oob.astype(np.int32)})

    return (
        new_vectors.select(vec_col)
        .mapInPandas(proj, schema="d double, oob int")
        .agg(
            F.round(F.avg("d"), 6).alias("mean_assign_dist"),
            F.round(F.sum("oob") / (F.count(F.lit(1)) * dim), 6).alias("clip_frac"),
            F.count(F.lit(1)).alias("n"),
        )
    )


def _batch_drift_metrics_expr(
    new_vectors: DataFrame,
    centroids,
    stats: dict,
    vec_col: str = "embedding",
) -> DataFrame:
    """EXPRESSION-FORM reference for `batch_drift_metrics` (pre-r15) —
    kept as the kernel's parity anchor.

    - ``mean_assign_dist`` — mean L2 distance to the nearest stored
      centroid. Divide by the base corpus's value at build time (run
      this same function over the base once, store it in the sidecar)
      to get QDR;
    - ``clip_frac`` — fraction of batch components outside the frozen
      SQ8 [mn, mx] grid (they clamp at encode time);
    - ``n`` — batch rows.

    Documented trigger (measured sweep: decay stays within rebuild
    variance while these metrics move first): re-train when
    QDR > 1.2 or clip_frac > 0.01. Aggregate-only — no shuffle beyond
    the 1-row reduction, so it rides along with the append itself.
    """
    import numpy as np

    C = np.asarray(centroids, dtype=np.float64)
    n_cells, dim = C.shape
    if len(stats) != dim:
        raise ValueError("stats/centroid dim mismatch")
    vecd = to_double_array(vec_col)
    norm = F.sqrt(F.aggregate(vecd, F.lit(0.0), lambda a, x: a + x * x))
    c_lit = F.array(
        *[F.array(*[F.lit(float(x)) for x in C[c]]) for c in range(n_cells)]
    )
    dots = F.transform(
        c_lit,
        lambda cv: F.aggregate(
            F.zip_with(vecd, cv, lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
        )
        / F.greatest(norm, F.lit(1e-12)),
    )
    best = F.element_at(c_lit, F.array_position(dots, F.array_max(dots)).cast("int"))
    dist = F.sqrt(
        F.aggregate(
            F.zip_with(vecd, best, lambda x, c: (x - c) * (x - c)),
            F.lit(0.0),
            lambda a, x: a + x,
        )
    )
    mn_lit = F.array(*[F.lit(float(stats[i][0])) for i in range(dim)])
    mx_lit = F.array(*[F.lit(float(stats[i][1])) for i in range(dim)])
    oob = F.aggregate(
        F.zip_with(
            vecd,
            F.zip_with(mn_lit, mx_lit, lambda a, b: F.struct(a.alias("mn"), b.alias("mx"))),
            lambda x, s: F.when((x < s["mn"]) | (x > s["mx"]), 1).otherwise(0),
        ),
        F.lit(0),
        lambda a, x: a + x,
    )
    return new_vectors.select(
        dist.alias("d"), oob.alias("oob")
    ).agg(
        F.round(F.avg("d"), 6).alias("mean_assign_dist"),
        F.round(F.sum("oob") / (F.count(F.lit(1)) * dim), 6).alias("clip_frac"),
        F.count(F.lit(1)).alias("n"),
    )


# --- filtered vector search (r12) -------------------------------------------
#
# The production retrieval shape the plain ANN tiers lack: a metadata
# predicate composed with the probe ("top-k among vectors whose label
# matches the query's"). Two plans exist and they are NOT equivalent:
#
# - PRE-filter: the predicate lands inside each probed cell, before the
#   top-k. The result holds k matching candidates whenever the probed
#   cells contain that many. This is the correct plan (Qdrant/Vespa
#   "filtered HNSW", FAISS IDSelector) and what
#   `ivf_sq8_knn_pruned(predicate=...)` and the *_filtered_* gates run.
# - POST-filter: take the unfiltered top-k, then apply the predicate.
#   Under-fills k whenever fewer than k of the global top-k match — at
#   selectivity s the expected fill is ~s*k. Implemented here only to
#   MEASURE that contract (`ivf_filtered_knn_multi(prefilter=False)`).


def _gate_query_labels(embeddings: DataFrame, query_ids) -> dict[int, int]:
    """label per gate query id (len(query_ids) rows to the driver)."""
    rows = (
        embeddings.filter(F.col("vec_id").isin(list(query_ids)))
        .select("vec_id", "label")
        .collect()
    )
    return {int(r[0]): int(r[1]) for r in rows}


def _gate_labeled_queries_df(spark: SparkSession, embeddings, query_ids) -> DataFrame:
    qvecs = _gate_query_vecs(embeddings, query_ids)
    labels = _gate_query_labels(embeddings, query_ids)
    return spark.createDataFrame(
        [(q, v, labels[q]) for q, v in qvecs],
        "qid long, qvec array<double>, qlabel int",
    )


def exact_filtered_knn_multi(
    spark: SparkSession,
    embeddings: DataFrame,
    query_ids=ANN_GATE_QUERY_IDS,
    k: int = 10,
) -> DataFrame:
    """Exact cosine top-k WITHIN the query's own label class, for every
    gate query in one plan — the ground truth the filtered ANN gates
    measure recall against. Same determinism contract as
    `exact_knn_multi` (fixed-order cosine fold rounded to 4 decimals,
    vec_id tiebreak); the label equi-condition joins corpus rows to the
    16-row broadcast query table, so the filter is applied BEFORE the
    per-qid top-k by construction."""
    qdf = _gate_labeled_queries_df(spark, embeddings, query_ids)
    joined = embeddings.join(
        F.broadcast(qdf), F.col("label") == F.col("qlabel")
    ).filter(F.col("vec_id") != F.col("qid"))
    # Arrow/numpy cosine fold (r15 opt, guide §4.2), rounded JVM-side
    scored = cosine_scores_np(joined).withColumn("cos", F.round("cos", 4))
    # corpus-sized candidate stream (selectivity * n per query): the
    # salted two-level top-k keeps parallelism above n_queries (r13)
    return _salted_topk_per_query(
        scored, [F.desc("cos"), F.col("vec_id")], k
    ).select("qid", "vec_id")


def ivf_filtered_knn_multi(
    spark: SparkSession,
    embeddings: DataFrame,
    query_ids=ANN_GATE_QUERY_IDS,
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    lloyd_iters: int = 1,
    prefilter: bool = True,
) -> DataFrame:
    """Multi-query FILTERED IVF top-k (predicate: corpus label ==
    query's label). ONE index build for all queries; candidates are the
    probed-cell members exactly as `ivf_knn_multi`.

    ``prefilter=True`` (the correct plan): the label predicate lands on
    the candidate stream INSIDE the probed cells, before the per-qid
    top-k — every returned row matches, and the result fills k whenever
    the probed cells hold k matching vectors. ``prefilter=False`` (the
    broken plan, kept to MEASURE the contract): the unfiltered per-qid
    top-k is computed first and the predicate applied after — fills
    ~selectivity*k. The filtered_ann_recall gate pins pre-fill vs
    post-fill and pre-filter recall vs `exact_filtered_knn_multi`.

    Scale shape: identical to `ivf_knn_multi` (assignment scan joined
    to a broadcast 16*n_probe probe-pair table) plus one broadcast
    label-equality condition — no extra shuffle; on a WRITTEN index the
    same predicate pushes into the cell-partitioned parquet scan
    (`ivf_sq8_knn_pruned(predicate=...)`)."""
    assignments, centroids = build_ivf_index(
        embeddings, n_cells=n_cells, lloyd_iters=lloyd_iters
    )
    qdf = _gate_labeled_queries_df(spark, embeddings, query_ids)
    qvecs = _gate_query_vecs(embeddings, query_ids)
    probe_df = _probe_pairs_df(spark, centroids, qvecs, n_probe)
    candidates = assignments.join(F.broadcast(probe_df), "cell").select(
        "qid", "vec_id"
    )
    joined = (
        candidates.filter(F.col("vec_id") != F.col("qid"))
        .join(embeddings.select("vec_id", "label", "embedding"), "vec_id")
        .join(F.broadcast(qdf), "qid")
    )
    # Arrow/numpy cosine fold (r15 opt, guide §4.2), rounded JVM-side
    scored = cosine_scores_np(joined, passthrough=("label", "qlabel")).withColumn(
        "cos", F.round("cos", 4)
    )
    if prefilter:
        scored = scored.filter(F.col("label") == F.col("qlabel"))
        return _topk_per_query(scored, [F.desc("cos"), F.col("vec_id")], k)
    from pyspark.sql import Window

    topk = scored.withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("qid").orderBy(F.desc("cos"), F.col("vec_id"))
        ),
    ).filter(F.col("rn") <= k)
    return topk.filter(F.col("label") == F.col("qlabel")).select("qid", "vec_id")


def ivf_filtered_knn_both(
    spark: SparkSession,
    embeddings: DataFrame,
    query_ids=ANN_GATE_QUERY_IDS,
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    lloyd_iters: int = 1,
) -> DataFrame:
    """Pre-filter AND post-filter top-k from ONE index build and ONE
    candidate-scoring pass — the measurement shape `filtered_ann_recall`
    needs. The gate used to call `ivf_filtered_knn_multi` twice, which
    built the SAME deterministic IVF index twice and re-scored every
    probed candidate (the dominant corpus-scaling term the r12 bench
    flagged at 3.85x on the sf1->sf10 step); here the two plans are two
    row_number windows over the one scored relation:

    - pre  = rank within the MATCHING candidates (partition qid+match)
             <= k — the predicate-inside-the-probe plan;
    - post = rank within ALL candidates (partition qid) <= k, then the
             predicate — the broken under-filling plan, kept to measure.

    Returns (plan, qid, vec_id), plan in {'pre', 'post'}; each half is
    pinned row-identical to the corresponding `ivf_filtered_knn_multi`
    call in pytest."""
    assignments, centroids = build_ivf_index(
        embeddings, n_cells=n_cells, lloyd_iters=lloyd_iters
    )
    qdf = _gate_labeled_queries_df(spark, embeddings, query_ids)
    qvecs = _gate_query_vecs(embeddings, query_ids)
    probe_df = _probe_pairs_df(spark, centroids, qvecs, n_probe)
    candidates = assignments.join(F.broadcast(probe_df), "cell").select(
        "qid", "vec_id"
    )
    joined = (
        candidates.filter(F.col("vec_id") != F.col("qid"))
        .join(embeddings.select("vec_id", "label", "embedding"), "vec_id")
        .join(F.broadcast(qdf), "qid")
        .withColumn("match", F.col("label") == F.col("qlabel"))
    )
    # Arrow/numpy cosine fold (r15 opt, guide §4.2), rounded JVM-side.
    # Lazy checkpoint: the scored relation feeds BOTH plan rankings
    # (pre filters before its salted window, post after — different
    # subtrees, so ReuseExchange cannot deduplicate them); without it
    # the candidate scoring pass executed twice.
    scored = (
        cosine_scores_np(joined, passthrough=("match",))
        .withColumn("cos", F.round("cos", 4))
        .localCheckpoint(eager=False)
    )
    order = [F.desc("cos"), F.col("vec_id")]
    # both plans are top-k selections, so both take the salted two-level
    # form: pre ranks only the MATCHING candidates, post ranks ALL
    # candidates then filters — the under-fill being measured.
    pre = _salted_topk_per_query(scored.filter(F.col("match")), order, k).select(
        F.lit("pre").alias("plan"), "qid", "vec_id"
    )
    post = (
        _salted_topk_per_query(scored, order, k)
        .filter(F.col("match"))
        .select(F.lit("post").alias("plan"), "qid", "vec_id")
    )
    return pre.unionByName(post)
