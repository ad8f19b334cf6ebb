"""Synthetic ``partsupp`` relation and the TPC-H query shapes that need it
(Q2 min-cost supplier, Q11 important stock, Q16 supplier counts, Q20
excess inventory).

The driver's lake has no partsupp table, so the relation is DERIVED
deterministically from ``part`` x ``supplier`` with pure integer
arithmetic — four suppliers per part, collision-free by construction
(``(p*4 + i) % S`` hits four consecutive residues), reproducible
bit-for-bit in any ANSI SQL engine for the DuckDB oracle. Monetary values
stay integer cents until a single final IEEE division (the repo's
oracle-parity rule), so no cross-engine float drift is possible.

Scale shape: partsupp is a 4x projection of ``part`` — it is generated
inline by codegen (explode of a 4-literal array), never materialized or
shuffled on its own. Joins to supplier/nation/region broadcast the dims;
per-part minima use a partition-only window (no self-join); Q11's global
total is a broadcast 1-row aggregate (scalar-subquery shape). At 100 TB
the only shuffles are the per-part/per-group aggregations on already-key
partitioned data.

Reference parity: the reference (README.md analytics zone) publishes only
three Olist showcase queries; these TPC-H shapes extend the suite per
SURVEY.md §2's benchmark-posture items.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Shared oracle CTE: the exact SQL twin of synth_partsupp (DuckDB dialect,
# integer-only; ``//`` would also work but % arithmetic avoids division
# entirely on the key path).
PARTSUPP_CTE = """
partsupp AS (
    SELECT
        p.p_partkey AS ps_partkey,
        (p.p_partkey * 4 + i.i) % (SELECT COUNT(*) FROM supplier)
            AS ps_suppkey,
        (p.p_partkey * 7 + i.i * 11) % 9999 + 1 AS ps_availqty,
        (p.p_partkey * 13 + i.i * 29) % 99901 + 100 AS ps_supplycost_cents
    FROM part p
    CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS i) AS i
)
"""


def synth_partsupp(part: DataFrame, supplier: DataFrame) -> DataFrame:
    """Derive the 4-suppliers-per-part relation.

    ``explode`` of a literal 4-array is whole-stage codegen over the part
    scan — zero shuffle; the supplier count is a broadcast 1-row aggregate
    (the scalar-subquery pattern used across the repo).
    """
    s_cnt = supplier.agg(F.count(F.lit(1)).alias("s_cnt"))
    return (
        part.crossJoin(F.broadcast(s_cnt))
        .select(
            F.col("p_partkey"),
            F.col("s_cnt"),
            F.explode(F.array(F.lit(0), F.lit(1), F.lit(2), F.lit(3))).alias("i"),
        )
        .select(
            F.col("p_partkey").alias("ps_partkey"),
            ((F.col("p_partkey") * 4 + F.col("i")) % F.col("s_cnt")).alias(
                "ps_suppkey"
            ),
            ((F.col("p_partkey") * 7 + F.col("i") * 11) % 9999 + 1).alias(
                "ps_availqty"
            ),
            ((F.col("p_partkey") * 13 + F.col("i") * 29) % 99901 + 100).alias(
                "ps_supplycost_cents"
            ),
        )
    )


def min_cost_supplier(
    part: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    r_name: str = "EUROPE",
    p_size: int = 15,
    p_type: str | None = None,
    limit: int = 100,
) -> DataFrame:
    """TPC-H Q2 shape: for every part of the given size/type, the
    supplier(s) in ``r_name`` offering the region-minimum supply cost.

    The correlated MIN subquery is decorrelated into a partition-only
    window over ps_partkey (no self-join — the repo's standard rewrite);
    supplier/nation/region broadcast into the partsupp stream, so the
    only exchange is the window's hash partition on ps_partkey.
    """
    ps = synth_partsupp(part, supplier)
    sup_region = (
        supplier.join(
            F.broadcast(
                nation.join(
                    F.broadcast(region.filter(F.col("r_name") == r_name)),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                )
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
    ).select("s_suppkey", "s_name", "s_acctbal", "n_name")
    parts = part.filter(F.col("p_size") == p_size)
    if p_type is not None:
        parts = parts.filter(F.col("p_type") == p_type)
    parts = parts.select("p_partkey", "p_retailprice")
    joined = (
        ps.join(F.broadcast(parts), ps.ps_partkey == parts.p_partkey)
        .join(F.broadcast(sup_region), ps.ps_suppkey == F.col("s_suppkey"))
    )
    w = Window.partitionBy("ps_partkey")
    return (
        joined.withColumn(
            "min_cost_cents", F.min("ps_supplycost_cents").over(w)
        )
        .filter(F.col("ps_supplycost_cents") == F.col("min_cost_cents"))
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            F.col("ps_partkey").alias("p_partkey"),
            "p_retailprice",
            (F.col("ps_supplycost_cents") / 100.0).alias("supplycost"),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(limit)
    )


def important_stock(
    part: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    n_name: str = "NATION_3",
    fraction_denom: int = 1000,
) -> DataFrame:
    """TPC-H Q11 shape: parts whose stock value at one nation's suppliers
    exceeds 1/``fraction_denom`` of that nation's total stock value.

    Value stays integer cents end-to-end; the HAVING threshold is the
    pure-integer comparison ``group * denom > total`` (no float until the
    final display division). The grand total is a broadcast 1-row
    aggregate; the only shuffle is the groupBy on ps_partkey.
    """
    ps = synth_partsupp(part, supplier)
    nat_sup = supplier.join(
        F.broadcast(nation.filter(F.col("n_name") == n_name)),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey")
    stock = ps.join(F.broadcast(nat_sup), ps.ps_suppkey == F.col("s_suppkey")).select(
        "ps_partkey",
        (F.col("ps_supplycost_cents").cast("long") * F.col("ps_availqty")).alias(
            "value_cents"
        ),
    )
    total = stock.agg(F.sum("value_cents").alias("total_cents"))
    return (
        stock.groupBy("ps_partkey")
        .agg(F.sum("value_cents").alias("group_cents"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("group_cents") * fraction_denom > F.col("total_cents"))
        .select(
            "ps_partkey", (F.col("group_cents") / 100.0).alias("stock_value")
        )
        .orderBy(F.desc("stock_value"), "ps_partkey")
    )


def supplier_counts(
    part: DataFrame,
    supplier: DataFrame,
    excluded_brand: str = "Brand#5",
    sizes: tuple[int, ...] = (1, 3, 9, 14, 19, 23, 36, 45),
) -> DataFrame:
    """TPC-H Q16 shape: distinct supplier count per (brand, type, size)
    for selected sizes, excluding one brand and any supplier with a
    negative account balance (the NOT IN subquery — the part the optimizer
    must turn into an anti-join).

    The exclusion list is a broadcast null-safe anti-join; count distinct
    shuffles (group, suppkey) pairs once. All-integer output.
    """
    ps = synth_partsupp(part, supplier)
    bad_suppliers = supplier.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    parts = part.filter(
        (F.col("p_brand") != excluded_brand) & F.col("p_size").isin(*sizes)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    return (
        ps.join(F.broadcast(parts), ps.ps_partkey == parts.p_partkey)
        .join(
            F.broadcast(bad_suppliers),
            ps.ps_suppkey == bad_suppliers.s_suppkey,
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


def product_type_profit(
    part: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    name_contains: str = "blue",
) -> DataFrame:
    """TPC-H Q9 shape: profit (revenue minus supply cost) by supplier
    nation and order year for parts whose name contains ``name_contains``.

    Cross-engine parity: both revenue and cost are computed in integer
    cent-x100 units — ``round(l_extendedprice * 100)`` is exact (prices
    have 2 decimals), discounts become integer percents, and the supply
    cost is already integer cents — so the SUM is integer-exact in any
    engine and only the final display division touches floats. This is
    the repo's integer-cents rule; a naive SUM(price * (1 - disc)) drifts
    between engines on summation order.

    Scale shape: part filter prunes the lineitem join via a broadcast;
    partsupp joins on the composite (partkey, suppkey) key; orders joins
    on orderkey to source the year. One aggregate shuffle on the tiny
    (nation, year) key space.
    """
    ps = synth_partsupp(part, supplier)
    parts = part.filter(F.col("p_name").contains(name_contains)).select("p_partkey")
    li = (
        lineitem.join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            ps,
            (F.col("l_partkey") == ps.ps_partkey)
            & (F.col("l_suppkey") == ps.ps_suppkey),
        )
        .join(
            F.broadcast(
                supplier.join(
                    F.broadcast(nation),
                    F.col("s_nationkey") == F.col("n_nationkey"),
                ).select("s_suppkey", "n_name")
            ),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(
            orders.select("o_orderkey", F.year("o_orderdate").alias("o_year")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
    )
    # cent-x100 units: price_cents * (100 - disc_pct) and cost_cents * qty * 100
    amount = (
        F.round(F.col("l_extendedprice") * 100).cast("long")
        * (F.lit(100) - F.round(F.col("l_discount") * 100).cast("long"))
        - F.col("ps_supplycost_cents").cast("long")
        * F.col("l_quantity").cast("long")
        * 100
    )
    return (
        li.groupBy("n_name", "o_year")
        .agg((F.sum(amount) / 10000.0).alias("profit"))
        .orderBy("n_name", F.desc("o_year"))
    )


def excess_inventory_suppliers(
    part: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    lineitem: DataFrame,
    name_prefix: str = "red",
    year: int = 1996,
) -> DataFrame:
    """TPC-H Q20 shape: suppliers holding more than half a year's shipped
    quantity of any ``name_prefix`` part they stock.

    ``ps_availqty > 0.5 * sum(qty)`` is evaluated as the drift-free
    ``2 * ps_availqty > sum(qty)`` (quantities are integral, so the
    float64 sum is exact in both engines). The lineitem aggregate is the
    only fact-sized shuffle; parts and the resulting (part, supp) demand
    relation broadcast into partsupp.
    """
    ps = synth_partsupp(part, supplier)
    red_parts = part.filter(F.col("p_name").startswith(name_prefix)).select(
        "p_partkey"
    )
    shipped = (
        lineitem.filter(F.year("l_shipdate") == year)
        .join(F.broadcast(red_parts), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("shipped_qty"))
    )
    qualifying = (
        ps.join(
            shipped,
            (ps.ps_partkey == F.col("l_partkey"))
            & (ps.ps_suppkey == F.col("l_suppkey")),
        )
        .filter(F.col("ps_availqty") * 2 > F.col("shipped_qty"))
        .select("ps_suppkey")
        .distinct()
    )
    return (
        supplier.join(qualifying, F.col("s_suppkey") == F.col("ps_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_name", "n_name")
        .orderBy("s_name")
    )
