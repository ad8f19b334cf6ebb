"""DuckDB oracle for hyperplane-LSH bucketed kNN
(operators/similarity.py:52-110) — replayed exactly.

The 'random' Rademacher hyperplanes are h[p][d] = ±1 from the parity
of ``xxhash64(p, d)`` over plane/dimension LITERALS, so the whole
plane grid folds to numeric constants at generation time via the
pure-Python XXH64 (functions/xxh64_py.py).  The signature dot products
are left-fold double sums exactly like Spark's ``F.aggregate`` (init
0.0, in-order accumulation), so signs — and therefore bucket
signatures, the Hamming probe set, and the final rounded-cosine top-k
— reproduce bit-for-bit.
"""

from __future__ import annotations

from .xxh64_py import hash_int

NUM_PLANES = 12
DIM = 64
MAX_PROBE_HAMMING = 2
K = 10


def _plane_grid(num_planes: int = NUM_PLANES, dim: int = DIM) -> list[list[float]]:
    """h[p][d] = +1.0 if xxhash64(lit(p), d) has low bit 1 else -1.0
    (similarity.hyperplane_signature's plane_component)."""
    return [
        [1.0 if (hash_int(d, hash_int(p, 42)) & 1) == 1 else -1.0 for d in range(dim)]
        for p in range(num_planes)
    ]


def _sig_sql(grid: list[list[float]]) -> str:
    """BIGINT bucket signature: bit p set iff dot(v, h_p) > 0, with the
    dot product as an in-order left fold seeded 0.0 (F.aggregate
    parity; 0.0 + x == x for every x except -0.0, which cannot flip
    the > 0 test)."""
    bits = []
    for p, plane in enumerate(grid):
        arr = "[" + ", ".join(f"{h:.1f}" for h in plane) + "]"
        dot = (
            f"list_reduce(list_transform(generate_series(1, {len(plane)}),"
            f" i -> v[i] * ({arr})[i]), (a, b) -> a + b)"
        )
        bits.append(f"(CASE WHEN {dot} > 0 THEN {1 << p} ELSE 0 END)")
    return "(" + " + ".join(bits) + ")"


def lsh_knn_oracle(
    query_vec_id: int = 0,
    k: int = K,
    num_planes: int = NUM_PLANES,
    dim: int = DIM,
    max_probe_hamming: int = MAX_PROBE_HAMMING,
) -> str:
    sig = _sig_sql(_plane_grid(num_planes, dim))
    return f"""
        WITH e AS (
            SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ),
        sigs AS (
            SELECT vec_id, label, v, {sig} AS bsig FROM e
        ),
        q AS (SELECT v AS qv, bsig AS qsig FROM sigs WHERE vec_id = {query_vec_id}),
        cand AS (
            SELECT s.vec_id, s.label, s.v
            FROM sigs s, q
            WHERE bit_count(xor(s.bsig, q.qsig)) <= {max_probe_hamming}
              AND s.vec_id <> {query_vec_id}
        )
        SELECT c.vec_id, c.label,
               ROUND(list_dot_product(c.v, q.qv)
                     / (sqrt(list_dot_product(c.v, c.v))
                        * sqrt(list_dot_product(q.qv, q.qv))), 4) AS cosine
        FROM cand c, q
        ORDER BY cosine DESC, c.vec_id
        LIMIT {k}
    """


# --- Johnson-Lindenstrauss projection oracles ------------------------------

JL_PLANE_OFFSET = 1000  # similarity.JL_PLANE_OFFSET
JL_OUT_DIM = 16
JL_QUANT = 1_000_000
JL_GATE_QUANT = 10_000
JL_GATE_SAMPLE = 20


def _jl_sign_grid(
    out_dim: int = JL_OUT_DIM, dim: int = DIM, offset: int = JL_PLANE_OFFSET
) -> list[list[int]]:
    """s[j][d] = ±1 from the parity of xxhash64(lit(offset + j), d)
    (similarity._jl_sign_component), folded to literals via the
    pure-Python XXH64 exactly like ``_plane_grid``."""
    return [
        [
            1 if (hash_int(d, hash_int(offset + j, 42)) & 1) == 1 else -1
            for d in range(dim)
        ]
        for j in range(out_dim)
    ]


def _jl_grid_sql(grid: list[list[int]]) -> str:
    return (
        "["
        + ", ".join("[" + ", ".join(str(s) for s in row) + "]" for row in grid)
        + "]"
    )


def jl_projection_oracle(
    out_dim: int = JL_OUT_DIM, dim: int = DIM, quant: int = JL_QUANT
) -> str:
    """Replays similarity.jl_project exactly: floor-quantized int64
    components dotted with the literal sign grid — integer addition is
    associative, so no fold-order caveat applies.

    RELATIONAL form, not a per-row list fold: indexing the 16x64 grid
    literal inside a list_transform makes DuckDB rebuild the literal
    per evaluated ELEMENT (~150 s at 500 vectors); unnesting it once
    into a (j, i, s) sign table and group-summing q*s is ~100x faster
    for identical integer results."""
    grid = _jl_grid_sql(_jl_sign_grid(out_dim, dim))
    return f"""
        WITH sg AS MATERIALIZED (
            SELECT js.j, ii.i, ({grid})[js.j + 1][ii.i] AS s
            FROM (SELECT unnest(generate_series(0, {out_dim - 1})) AS j) js,
                 (SELECT unnest(generate_series(1, {dim})) AS i) ii
        ),
        eq AS (
            SELECT vec_id, label,
                   generate_subscripts(embedding, 1) AS i,
                   CAST(floor(CAST(unnest(embedding) AS DOUBLE) * {quant})
                        AS BIGINT) AS q
            FROM embeddings
        )
        SELECT eq.vec_id, eq.label, CAST(sg.j AS INTEGER) AS j,
               CAST(SUM(eq.q * sg.s) AS BIGINT) AS y_q
        FROM eq JOIN sg USING (i)
        GROUP BY eq.vec_id, eq.label, sg.j
        ORDER BY eq.vec_id, j
    """


def jl_quality_oracle(
    out_dim: int = JL_OUT_DIM,
    dim: int = DIM,
    n_sample: int = JL_GATE_SAMPLE,
    quant: int = JL_GATE_QUANT,
) -> str:
    """Replays similarity.jl_distortion_stats: DuckDB recomputes the
    exact integer distance sums itself (value-bearing AND
    value-derived — no fixture-pinned constants)."""
    grid = _jl_grid_sql(_jl_sign_grid(out_dim, dim))
    return f"""
        WITH e AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
            FROM embeddings WHERE vec_id < {n_sample}
        ),
        qz AS (
            SELECT vec_id,
                   list_transform(generate_series(1, {dim}),
                       i -> CAST(floor(v[i] * {quant}) AS BIGINT)) AS q
            FROM e
        ),
        pr AS (
            SELECT vec_id, q,
                   list_transform(generate_series(1, {out_dim}),
                       j -> list_reduce(list_transform(generate_series(1, {dim}),
                                i -> q[i] * ({grid})[j][i]),
                            (a, b) -> a + b)) AS proj
            FROM qz
        ),
        pairs AS (
            SELECT list_reduce(list_transform(generate_series(1, {dim}),
                       i -> (a.q[i] - b.q[i]) * (a.q[i] - b.q[i])),
                       (x, y) -> x + y) AS d2o,
                   list_reduce(list_transform(generate_series(1, {out_dim}),
                       j -> (a.proj[j] - b.proj[j]) * (a.proj[j] - b.proj[j])),
                       (x, y) -> x + y) AS d2p
            FROM pr a JOIN pr b ON a.vec_id < b.vec_id
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
               CAST(SUM(d2p) AS BIGINT) AS sum_d2_proj,
               CAST(SUM(d2o) * {out_dim} AS BIGINT) AS sum_d2_orig_scaled,
               ROUND(CAST(SUM(d2p) AS DOUBLE)
                     / CAST(SUM(d2o) * {out_dim} AS DOUBLE), 4)
                   AS distortion_ratio,
               CASE WHEN SUM(d2p) * 2 >= SUM(d2o) * {out_dim}
                     AND SUM(d2p) <= SUM(d2o) * {out_dim} * 2
                    THEN 1 ELSE 0 END AS within_2x
        FROM pairs
    """


def semdedup_jl_oracle(
    out_dim: int = 16,
    dim: int = DIM,
    jl_quant: int = 1000,
    tau_bp: int = 35,
    cos_scale: int = 1000,
) -> str:
    """Replays operators/semdedup.semdedup_jl: clustering over the JL
    projection (integer grid, scale 1 — the projection IS the grid) and
    pair confirmation over the raw scale-1000 grid. Everything except
    the CTE feeding the k-means is the registered ``semdedup`` oracle's
    SQL verbatim; the HUGEINT threshold products match the Spark side's
    decimal(38,0)."""
    grid = _jl_grid_sql(_jl_sign_grid(out_dim, dim))
    tau2 = tau_bp * tau_bp
    return f"""
        WITH sg AS MATERIALIZED (
            SELECT js.j, ii.i, ({grid})[js.j + 1][ii.i] AS s
            FROM (SELECT unnest(generate_series(0, {out_dim - 1})) AS j) js,
                 (SELECT unnest(generate_series(1, {dim})) AS i) ii
        ),
        ej AS MATERIALIZED (
            -- relational projection (see jl_projection_oracle: a
            -- literal-grid list fold here is ~100x slower and would be
            -- re-evaluated per consumer join row)
            SELECT eq.vec_id, sg.j AS d,
                   CAST(SUM(eq.q * sg.s) AS BIGINT) AS x
            FROM (
                SELECT vec_id,
                       generate_subscripts(embedding, 1) AS i,
                       CAST(floor(CAST(unnest(embedding) AS DOUBLE)
                                  * {jl_quant}) AS BIGINT) AS q
                FROM embeddings
            ) eq JOIN sg USING (i)
            GROUP BY eq.vec_id, sg.j
        ),
        er AS MATERIALIZED (
            SELECT vec_id, i - 1 AS d,
                   CAST(FLOOR(CAST(x AS DOUBLE) * {cos_scale}) AS BIGINT) AS x
            FROM (
                SELECT vec_id,
                       unnest(embedding) AS x,
                       generate_subscripts(embedding, 1) AS i
                FROM embeddings
            )
        ),
        kk AS (
            SELECT GREATEST(8, CAST(CEIL(COUNT(*) / 256.0) AS BIGINT)) AS k
            FROM embeddings
        ),
        c0 AS (
            SELECT vec_id AS cid, d, x AS cx FROM ej
            WHERE vec_id < (SELECT k FROM kk)
        ),
        d1 AS (
            SELECT ej.vec_id, c.cid,
                   SUM((ej.x - c.cx) * (ej.x - c.cx)) AS dist2
            FROM ej JOIN c0 c USING (d)
            GROUP BY ej.vec_id, c.cid
        ),
        a1 AS (
            SELECT vec_id, cid AS cluster
            FROM (
                SELECT vec_id, cid,
                       ROW_NUMBER() OVER (
                           PARTITION BY vec_id ORDER BY dist2, cid
                       ) AS rn
                FROM d1
            ) WHERE rn = 1
        ),
        c1 AS (
            SELECT a1.cluster AS cid, ej.d, SUM(ej.x) // COUNT(*) AS cx
            FROM ej JOIN a1 USING (vec_id)
            GROUP BY a1.cluster, ej.d
        ),
        d2 AS (
            SELECT ej.vec_id, c.cid,
                   SUM((ej.x - c.cx) * (ej.x - c.cx)) AS dist2
            FROM ej JOIN c1 c USING (d)
            GROUP BY ej.vec_id, c.cid
        ),
        a2 AS (
            SELECT vec_id, cid AS cluster, dist2 AS cdist2
            FROM (
                SELECT vec_id, cid, dist2,
                       ROW_NUMBER() OVER (
                           PARTITION BY vec_id ORDER BY dist2, cid
                       ) AS rn
                FROM d2
            ) WHERE rn = 1
        ),
        n2 AS (SELECT vec_id, SUM(x * x) AS n2 FROM er GROUP BY vec_id),
        sided AS (
            SELECT er.vec_id, a2.cluster, er.d, er.x, n2.n2
            FROM er JOIN n2 USING (vec_id) JOIN a2 USING (vec_id)
        ),
        dots AS (
            SELECT a.cluster, a.vec_id AS vec_a, b.vec_id AS vec_b,
                   a.n2 AS na2, b.n2 AS nb2, SUM(a.x * b.x) AS dot
            FROM sided a JOIN sided b
              ON a.cluster = b.cluster AND a.d = b.d
             AND a.vec_id < b.vec_id
            GROUP BY 1, 2, 3, 4, 5
        ),
        pairs AS (
            SELECT * FROM dots
            WHERE dot > 0 AND 10000 * dot * dot >= {tau2} * na2 * nb2
        ),
        victims AS (
            SELECT DISTINCT CASE
                WHEN da.cdist2 < db.cdist2
                     OR (da.cdist2 = db.cdist2 AND p.vec_a > p.vec_b)
                THEN p.vec_a ELSE p.vec_b END AS vec_id
            FROM pairs p
            JOIN a2 da ON p.vec_a = da.vec_id
            JOIN a2 db ON p.vec_b = db.vec_id
        )
        SELECT a2.vec_id, a2.cluster,
               CAST(a2.cdist2 AS BIGINT) AS cdist2,
               CASE WHEN v.vec_id IS NULL THEN 0 ELSE 1 END AS dropped
        FROM a2 LEFT JOIN victims v USING (vec_id)
        ORDER BY vec_id
    """
