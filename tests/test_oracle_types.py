"""Driver-canonicalizer type gate over every registered DuckDB oracle.

The driver hashes query results through pandas, which renders DuckDB
HUGEINT (the inferred type of ``SUM(int_expr)``) and DECIMAL columns as
float64 — while Spark emits int64 — so an oracle with such a column
hash-mismatches on every row even when values are identical.  Rounds
1-3 lost `session_stats` / `urgent_shipment_share` / `decontaminate` /
(latent) `oov_rate` to exactly this.  This gate DESCRIBEs every oracle
(type inference only, no execution beyond scalar subqueries DuckDB
folds during binding) and fails if any column would float.

No Spark session needed — pure DuckDB, runs in seconds.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod
from data_lake_for_e_commerce_analytics_spark.sources import TABLE_NAMES

SF_DIR = os.environ.get("SPARK_GRAFT_SF_SMALL", "/root/testdata/sf0.001")

# Types pandas cannot round-trip losslessly to what Spark emits.
FORBIDDEN = ("HUGEINT", "INT128", "DECIMAL", "UHUGEINT")


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def test_every_oracle_column_is_canonicalizer_safe(duck):
    oracles = entry_mod.oracle_sql()
    offenders: dict[str, list[tuple[str, str]]] = {}
    for name, sql in oracles.items():
        desc = duck.execute("DESCRIBE " + sql).fetchall()
        bad = [
            (col, typ)
            for col, typ, *_ in desc
            if any(f in typ.upper() for f in FORBIDDEN)
        ]
        if bad:
            offenders[name] = bad
    assert not offenders, (
        "oracles with pandas-floated column types (wrap in CAST(... AS "
        f"BIGINT) / round to DOUBLE): {offenders}"
    )


# The rows-only class is RETIRED (VERDICT r6 task 6): the array/sketch
# shapes are no longer registered; their hashable twins ARE the queries
# (media_features_flat / ivf_quality / approx_event_value_bounds), and
# the array-shaped operators stay pytest-covered. This guard keeps the
# class retired: no registered entry may lack an oracle.
RETIRED_ROWS_ONLY = (
    "media_features",
    "ivf_knn_vec0",
    "approx_event_value_stats",
)


def test_rows_only_class_stays_retired():
    qs = entry_mod.queries()
    back = [n for n in RETIRED_ROWS_ONLY if n in qs]
    assert not back, f"retired rows-only entries re-registered: {back}"
    no_oracle = [n for n in qs if n not in entry_mod.oracle_sql()]
    assert not no_oracle, (
        f"every registered query must carry a DuckDB oracle now that the"
        f" rows-only class is retired; missing: {no_oracle}"
    )


def test_no_decimal_columns_in_spark_results(spark):
    """Spark-side dual of the HUGEINT gate: Spark SQL parses exact numeric
    literals (``100.0``) as DECIMAL, so dialect queries can silently emit
    DecimalType columns that the driver's pandas hasher renders as
    ``Decimal('123.450000')`` — hash-mismatching the oracle's float even
    when values are equal (round 4's ``min_cost_supplier_sql`` red; the
    DataFrame twin was green because Python ``100.0`` is a DOUBLE literal).
    Gate: no registered query may emit a DecimalType column — CAST to
    DOUBLE before dividing."""
    from pyspark.sql import types as T

    offenders: dict[str, list[str]] = {}
    for name, fn in entry_mod.queries().items():
        df = fn(spark, SF_DIR)
        bad = [
            f.name
            for f in df.schema.fields
            if isinstance(f.dataType, T.DecimalType)
        ]
        if bad:
            offenders[name] = bad
    assert not offenders, (
        f"queries emitting DECIMAL columns (CAST ... AS DOUBLE): {offenders}"
    )


def test_every_window_query_has_oracle(duck):
    """The first 50 keys are the driver's correctness window; each one
    must carry an oracle (the rows-only waiver class is retired)."""
    oracles = entry_mod.oracle_sql()
    window = list(entry_mod.queries())[:50]
    missing = [n for n in window if n not in oracles]
    assert not missing, f"window queries with no oracle: {missing}"
