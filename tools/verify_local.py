"""Local replica of the driver's correctness harness.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` twin on DuckDB over the same parquet tables, then
compares row count, sorted column names, and an order-insensitive
value hash. Usage:

    python tools/verify_local.py [--pandas-hash] [sf_dir] [query ...]

``--pandas-hash`` routes BOTH results through pandas (DuckDB via
``.df()``, Spark via ``toPandas()``) before hashing, replicating the
driver's canonicalization path: pandas renders DuckDB HUGEINT/DECIMAL
columns as float64 (``47.0``) while a NULL-free Spark int64 stays
``47``, so oracle typing bugs that only the driver can see reproduce
locally in this mode.  The round-3 reds (session_stats /
urgent_shipment_share / decontaminate) were exactly this class — green
under fetchall(), red under pandas.  The Spark side must be
pandas-ified too: a NULL-carrying int column goes float64 on BOTH
engines in the driver (r11 false-red on hybrid_search/lakehouse_e2e
when only the DuckDB side was converted).
"""

from __future__ import annotations

import hashlib
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod
from data_lake_for_e_commerce_analytics_spark.session import get_spark
from data_lake_for_e_commerce_analytics_spark.sources import TABLE_NAMES


def norm_cell(v) -> str:
    # STRICTER than the driver's likely normalization on purpose: full
    # repr of floats (shortest round-trip), so any cross-engine last-bit
    # drift fails HERE first. Round 1 proved %.6g was too lenient — three
    # queries passed locally but hash-failed in the driver.
    import decimal

    import numpy as np

    if v is None:
        return "NULL"
    if isinstance(v, decimal.Decimal):
        v = float(v)
    # numpy scalars (pandas path): repr(np.float64(x)) is
    # "np.float64(x)" under numpy>=2 — unwrap to python scalars first.
    if isinstance(v, np.integer):
        v = int(v)
    elif isinstance(v, np.floating):
        v = float(v)
    elif v is getattr(np, "nan", None):
        return "NaN"
    # pandas renders DuckDB DATE columns as midnight Timestamps while
    # Spark collect() yields datetime.date; the driver's canonicalizer
    # demonstrably treats these as equal (date-typed queries were green
    # in r01/r03), so normalize midnight timestamps to the date string.
    import datetime

    if isinstance(v, datetime.datetime) and v.time() == datetime.time(0, 0) and v.tzinfo is None:
        return v.date().isoformat()
    if isinstance(v, float):
        if v != v:
            return "NaN"
        if v == 0.0:
            # -0.0 == 0.0 (IEEE): engines differ only in the sign bit
            # of a rounded zero (Spark round() flushes it, DuckDB
            # keeps it) — not a semantic difference
            return "0.0"
        return repr(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)


def table_hash(rows: list[tuple], colnames: list[str]) -> str:
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted("|".join(norm_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main() -> int:
    oracle_timeout = 0.0
    duckdb_mem = "24GB"
    argv = []
    for a in sys.argv[1:]:
        if a == "--pandas-hash":
            continue
        if a.startswith("--oracle-timeout="):
            oracle_timeout = float(a.split("=", 1)[1])
            continue
        if a.startswith("--duckdb-mem="):
            duckdb_mem = a.split("=", 1)[1]
            continue
        argv.append(a)
    pandas_hash = "--pandas-hash" in sys.argv[1:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
    timeouts: list[str] = []

    spark = get_spark()

    def _make_con():
        c = duckdb.connect()
        # At synthesized 10x scale the heavier oracles (banded
        # self-joins) exceed DuckDB's in-memory budget while Spark holds
        # the rest of the box — give DuckDB an explicit limit and a
        # spill directory so the oracle completes out-of-core instead of
        # dying.
        c.execute(f"SET memory_limit='{duckdb_mem}'")
        c.execute("SET temp_directory='/tmp/duckdb_spill'")
        for t in TABLE_NAMES:
            # sf dirs hold single-file tables; synthesized scale dirs
            # (tools/bench_sf1_full.py --keep) hold DIRECTORIES of
            # parts — glob those so the oracle can run at sf1 too
            import os as _os

            p = f"{sf_dir}/{t}.parquet"
            if _os.path.isdir(p):
                p = f"{p}/*.parquet"
            c.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )
        return c

    con = _make_con()

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    unknown = only - set(queries)
    if unknown:
        print(f"WARNING: not in queries(): {sorted(unknown)}")
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            if pandas_hash:
                # BOTH sides go through pandas, like the driver: a
                # NULL-carrying int column becomes float64 on the Spark
                # side too (2 -> 2.0), matching DuckDB's rendering. The
                # one-sided variant flagged hybrid_search/lakehouse_e2e
                # as red while the driver (CORRECTNESS_r10) was green —
                # only the DuckDB side was being pandas-ified. The r3
                # driver-red class (HUGEINT/DECIMAL -> float64 vs a
                # NULL-free Spark int64) still reproduces: no NULLs
                # means Spark's toPandas() keeps int64.
                spdf = sdf.toPandas()
                spdf = spdf.astype(object).where(spdf.notna(), None)
                srows = [
                    tuple(r)
                    for r in spdf.itertuples(index=False, name=None)
                ]
            else:
                srows = [tuple(r) for r in sdf.collect()]
            scols = sdf.columns
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            failures.append(name)
            continue
        dt = time.time() - t0
        # The driver's pandas canonicalizer cannot sort/hash list cells —
        # an array/map column makes a query permanently unverifiable there.
        bad_cols = [
            f.name for f in sdf.schema.fields if f.dataType.typeName() in ("array", "map")
        ]
        if bad_cols and name in oracles:
            print(f"FAIL  {name}: array/map columns {bad_cols} break the driver canonicalizer")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"rows-only  {name}: {len(srows)} rows  ({dt:.1f}s)")
            continue
        try:
            # Bounded oracle: some DuckDB twins (recursive-CTE closures,
            # banded self-joins) are O(pairs) replications designed for
            # the sf0.01 gate; at synthesized 10x they can grind for
            # hours. --oracle-timeout=N interrupts DuckDB after N
            # seconds and records ORACLE-TIMEOUT instead of hanging the
            # whole pass.
            # Race-free timeout (ADVICE r8): the old `timer.is_alive()`
            # check discarded a result that completed AT the timeout
            # instant, and an interrupt fired after completion stayed
            # pending on the shared connection, cancelling the NEXT
            # oracle. Now the callback sets an explicit flag before
            # interrupting; TimeoutError is raised only when the flag is
            # set AND DuckDB actually aborted; and after ANY fired
            # interrupt the connection is rebuilt so no interrupt can
            # leak across queries.
            timer = None
            import threading as _th

            fired = _th.Event()
            if oracle_timeout:

                def _interrupt(c=con, flag=fired):
                    flag.set()
                    c.interrupt()

                timer = _th.Timer(oracle_timeout, _interrupt)
                timer.start()
            try:
                res = con.execute(oracles[name])
                dcols = [d[0] for d in res.description]
                if pandas_hash:
                    pdf = res.df()
                    # mimic the driver: hash whatever dtype pandas lands
                    # on (HUGEINT/DECIMAL -> float64 is the class under
                    # test), but map missing back to None so NULL
                    # handling stays comparable with the fetchall path.
                    pdf = pdf.astype(object).where(pdf.notna(), None)
                    drows = [
                        tuple(r)
                        for r in pdf.itertuples(index=False, name=None)
                    ]
                else:
                    drows = res.fetchall()
            except Exception as e:
                if fired.is_set() and (
                    isinstance(e, getattr(duckdb, "InterruptException", ()))
                    or "INTERRUPT" in str(e).upper()
                ):
                    raise TimeoutError(
                        f"oracle exceeded {oracle_timeout}s"
                    ) from e
                raise
            finally:
                if timer is not None:
                    timer.cancel()
                if fired.is_set():
                    # the interrupt may have landed after completion and
                    # still be pending — rebuild the connection so it
                    # cannot cancel the next oracle
                    try:
                        con.close()
                    except Exception:
                        pass
                    con = _make_con()
        except TimeoutError as e:
            print(f"ORACLE-TIMEOUT  {name}: {e} (spark side OK, {len(srows)} rows)")
            timeouts.append(name)
            continue
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            failures.append(name)
            continue
        ok_count = len(srows) == len(drows)
        ok_schema = sorted(c.lower() for c in scols) == sorted(c.lower() for c in dcols)
        sh = table_hash(srows, [c.lower() for c in scols])
        dh = table_hash(drows, [c.lower() for c in dcols])
        ok_hash = sh == dh
        status = "OK  " if (ok_count and ok_schema and ok_hash) else "FAIL"
        print(
            f"{status}  {name}: rows {len(srows)}/{len(drows)} "
            f"schema={'ok' if ok_schema else f'{sorted(scols)} vs {sorted(dcols)}'} "
            f"hash={'ok' if ok_hash else f'{sh} vs {dh}'}  ({dt:.1f}s)"
        )
        if status == "FAIL":
            failures.append(name)
            if ok_schema and not ok_hash:
                order = sorted(range(len(scols)), key=lambda i: scols[i].lower())
                sset = {tuple(norm_cell(r[i]) for i in order) for r in srows}
                dorder = sorted(range(len(dcols)), key=lambda i: dcols[i].lower())
                dset = {tuple(norm_cell(r[i]) for i in dorder) for r in drows}
                for x in list(sset - dset)[:3]:
                    print(f"      spark-only: {x}")
                for x in list(dset - sset)[:3]:
                    print(f"      duck-only:  {x}")
    if timeouts:
        print(f"\n{len(timeouts)} oracle timeouts (spark side OK): {timeouts}")
    print(f"\n{len(failures)} failures: {failures}" if failures else "\nall green")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
