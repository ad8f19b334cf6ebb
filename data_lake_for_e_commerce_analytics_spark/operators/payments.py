"""Synthetic ``order_payments`` relation for the oracle gate.

The driver's lake has no payments table, so — exactly like
``partsupp.synth_partsupp`` — a raw Olist-shaped payments relation is
DERIVED deterministically from ``orders`` with pure integer arithmetic,
reproducible bit-for-bit in any ANSI SQL engine for the DuckDB oracle:

- every order pays once; orders with ``o_orderkey % 5 = 0`` split into
  two payments (sequential 1 and 2);
- the split is computed in integer cents (60/40 by integer division, the
  remainder riding on the second payment) so the two parts sum exactly
  to the order total and no cross-engine float drift is possible;
- payment_type / installments are modular picks off the order key.

Scale shape: payments is a <=2x codegen projection of ``orders``
(explode of a 2-literal array + filter) — generated inline, never
materialized or shuffled on its own. The raw columns come out STRING
where the real CSV is string-typed so ``olist.clean_order_payments``
exercises its casts on the gate path too.

Reference parity: reference README.md:58 lists the payments CSV among
its nine inputs but publishes no payments query; the mix query extends
the suite per SURVEY.md §2's completeness rule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PAYMENT_TYPES = ("boleto", "credit_card", "debit_card", "not_defined", "voucher")

# DuckDB twin of synth_order_payments (kept adjacent so drift is a
# one-screen diff). list_extract is 1-based like Spark's element_at.
PAYMENTS_CTE = """
raw_payments AS (
    SELECT
        CAST(o_orderkey AS VARCHAR) AS order_id,
        i.i + 1 AS payment_sequential,
        list_extract(
            ['boleto', 'credit_card', 'debit_card', 'not_defined', 'voucher'],
            (o_orderkey * 7 + i.i * 3) % 5 + 1
        ) AS payment_type,
        CAST((o_orderkey + i.i * 3) % 10 + 1 AS VARCHAR)
            AS payment_installments,
        CAST(
            CASE
                WHEN o_orderkey % 5 <> 0
                    THEN CAST(ROUND(o_totalprice * 100) AS BIGINT)
                WHEN i.i = 0
                    THEN CAST(ROUND(o_totalprice * 100) AS BIGINT) * 6 // 10
                ELSE CAST(ROUND(o_totalprice * 100) AS BIGINT)
                     - CAST(ROUND(o_totalprice * 100) AS BIGINT) * 6 // 10
            END / 100.0 AS VARCHAR
        ) AS payment_value
    FROM orders
    CROSS JOIN (SELECT unnest([0, 1]) AS i) AS i
    WHERE i.i = 0 OR o_orderkey % 5 = 0
)
"""


def synth_order_payments(orders: DataFrame) -> DataFrame:
    """Derive the raw (string-typed, Olist-schema) payments relation."""
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    first_cents = F.expr(
        "CAST(ROUND(o_totalprice * 100) AS BIGINT) * 6 div 10"
    )
    value_cents = (
        F.when(F.col("o_orderkey") % 5 != 0, cents)
        .when(F.col("i") == 0, first_cents)
        .otherwise(cents - first_cents)
    )
    return (
        orders.select(
            "o_orderkey",
            "o_totalprice",
            F.explode(F.array(F.lit(0), F.lit(1))).alias("i"),
        )
        .filter((F.col("i") == 0) | (F.col("o_orderkey") % 5 == 0))
        .select(
            F.col("o_orderkey").cast("string").alias("order_id"),
            (F.col("i") + 1).alias("payment_sequential"),
            F.element_at(
                F.array(*[F.lit(t) for t in PAYMENT_TYPES]),
                ((F.col("o_orderkey") * 7 + F.col("i") * 3) % 5 + 1).cast("int"),
            ).alias("payment_type"),
            ((F.col("o_orderkey") + F.col("i") * 3) % 10 + 1)
            .cast("string")
            .alias("payment_installments"),
            (value_cents / 100.0).cast("string").alias("payment_value"),
        )
    )
