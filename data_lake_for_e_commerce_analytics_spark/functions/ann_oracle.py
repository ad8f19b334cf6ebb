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
