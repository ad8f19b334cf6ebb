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

from ..functions.vector import cosine_similarity


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
