"""Vector math over ``array<float>`` columns, built entirely from
JVM-side higher-order functions (F.zip_with / F.aggregate / F.transform).

No Python UDFs anywhere in this module: every expression stays inside
whole-stage codegen, so a 100 TB embedding scan never crosses the
JVM->Python boundary. Elements are cast to double before arithmetic so
results match DuckDB's double-precision list functions bit-for-bit at
micro rounding.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_double_array(col: Column | str) -> Column:
    """Cast array<float> -> array<double> (float32 arithmetic drifts from
    the oracle's double math)."""
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column | str, b: Column | str) -> Column:
    """Dot product of two equal-length numeric arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column | str) -> Column:
    """Euclidean (L2) norm."""
    return F.sqrt(dot(a, a))


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; NULL when either vector has zero norm."""
    denom = norm(a) * norm(b)
    return F.when(denom != 0, dot(a, b) / denom)


def l2_normalize(a: Column | str) -> Column:
    """Unit-length copy of the vector (NULL elements when norm is 0).
    Normalizing ONCE per row turns every downstream pairwise cosine into
    a bare dot product — the cheap-inner-loop form for pairwise joins."""
    n = norm(a)
    return F.transform(a, lambda x: F.when(n != 0, x.cast("double") / n))
