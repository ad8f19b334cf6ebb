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
    associative, so no fold-order caveat applies."""
    grid = _jl_grid_sql(_jl_sign_grid(out_dim, dim))
    return f"""
        WITH e AS (
            SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ),
        js AS (SELECT unnest(generate_series(0, {out_dim - 1})) AS j)
        SELECT e.vec_id, e.label, CAST(js.j AS INTEGER) AS j,
               list_reduce(list_transform(generate_series(1, {dim}),
                   i -> CAST(floor(e.v[i] * {quant}) AS BIGINT)
                        * ({grid})[js.j + 1][i]),
                   (a, b) -> a + b) AS y_q
        FROM e, js
        ORDER BY e.vec_id, j
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
