"""Synthetic ``order_reviews`` relation for the oracle gate — closing
the last unhandled Olist input (reference README.md:57 lists
``olist_order_reviews_dataset.csv`` among its nine key files; its own
DDL/queries never consume it, so this is surface parity for a user
porting the reference's source list).

Like ``payments.synth_order_payments``, the raw Olist-shaped reviews
relation is DERIVED deterministically from ``orders`` with pure integer
arithmetic so DuckDB replays it bit-for-bit:

- orders with ``o_orderkey % 3 = 2`` are unreviewed (the real file
  covers ~96k of 99k orders);
- ``review_id`` is the order key folded modulo 997 — deliberately
  COLLIDING so distinct orders share a review_id, the real-data quirk
  (the Kaggle file has ~800 review_ids spanning multiple orders) that
  makes ``clean_reviews``'s dedup-by-review_id non-trivial;
- ``review_score`` is a STRING "1".."5" off the order key (the raw CSV
  is untyped — the silver cast is part of the contract);
- ``review_creation_date`` strings are o_orderdate shifted 0-6 days;
  every 17th key emits an UNPARSEABLE string (NULL after the silver
  try_to_timestamp, the errors='coerce' semantics);
- ``review_answer_timestamp`` is creation + 1-30 days;
- comment title is NULL three rows out of four (the real file is ~88%
  NULL titles);
- every 11th key emits a SECOND row for the SAME (review_id, order_id)
  pair with a different score — the dirty-input duplicate that makes
  ``clean_reviews``'s keep-first dedup value-bearing, not vacuous (the
  two scores differ by exactly 1 mod 5, so the keep-smallest-score
  ordering is always deterministic).

Scale shape: a single codegen projection of ``orders`` — generated
inline, never materialized or shuffled on its own.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: DuckDB twin of synth_order_reviews (kept adjacent so drift is a
#: one-screen diff).
REVIEWS_CTE = """
raw_reviews AS (
    SELECT
        'rev-' || CAST(o_orderkey % 997 AS VARCHAR) AS review_id,
        CAST(o_orderkey AS VARCHAR) AS order_id,
        CAST((o_orderkey * 7 + 3 + i.i) % 5 + 1 AS VARCHAR) AS review_score,
        CASE WHEN o_orderkey % 4 = 0
             THEN 'title ' || CAST(o_orderkey % 10 AS VARCHAR)
        END AS review_comment_title,
        CASE WHEN o_orderkey % 17 = 0 THEN 'not a date'
             ELSE strftime(
                 o_orderdate + (o_orderkey % 7) * INTERVAL 1 DAY,
                 '%Y-%m-%d %H:%M:%S')
        END AS review_creation_date,
        strftime(
            o_orderdate + (o_orderkey % 7) * INTERVAL 1 DAY
                        + (o_orderkey % 30 + 1) * INTERVAL 1 DAY,
            '%Y-%m-%d %H:%M:%S') AS review_answer_timestamp
    FROM orders
    CROSS JOIN (SELECT unnest([0, 1]) AS i) AS i
    WHERE o_orderkey % 3 <> 2 AND (i.i = 0 OR o_orderkey % 11 = 0)
)
"""


def synth_order_reviews(orders: DataFrame) -> DataFrame:
    """Derive the raw (string-typed, Olist-schema) reviews relation."""
    creation_ts = F.timestamp_add(
        "DAY", (F.col("o_orderkey") % 7).cast("int"), F.col("o_orderdate")
    )
    answer_ts = F.timestamp_add(
        "DAY", (F.col("o_orderkey") % 30 + 1).cast("int"), creation_ts
    )
    return (
        orders.filter(F.col("o_orderkey") % 3 != 2)
        .select(
            "o_orderkey",
            "o_orderdate",
            F.explode(F.array(F.lit(0), F.lit(1))).alias("i"),
        )
        .filter((F.col("i") == 0) | (F.col("o_orderkey") % 11 == 0))
        .select(
            F.concat(F.lit("rev-"), (F.col("o_orderkey") % 997).cast("string"))
            .alias("review_id"),
            F.col("o_orderkey").cast("string").alias("order_id"),
            ((F.col("o_orderkey") * 7 + 3 + F.col("i")) % 5 + 1)
            .cast("string")
            .alias("review_score"),
            F.when(
                F.col("o_orderkey") % 4 == 0,
                F.concat(F.lit("title "), (F.col("o_orderkey") % 10).cast("string")),
            ).alias("review_comment_title"),
            F.when(F.col("o_orderkey") % 17 == 0, F.lit("not a date"))
            .otherwise(F.date_format(creation_ts, "yyyy-MM-dd HH:mm:ss"))
            .alias("review_creation_date"),
            F.date_format(answer_ts, "yyyy-MM-dd HH:mm:ss")
            .alias("review_answer_timestamp"),
        )
    )
