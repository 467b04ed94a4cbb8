"""Driver-mimic: t1 smoke + t2 full oracle sweep with a VANILLA session.

Mirrors the grading driver's consumption of ``__spark_entry__.py``:

- builds a *vanilla* ``local[32]`` SparkSession (shuffle=32, NOT the
  engine's tuned builder — the driver uses its own session, so any
  dependence on our session config is a bug this script must catch),
- t1: calls ``entry(spark)`` and asserts >0 rows,
- t2: for EVERY ``queries()`` entry runs Spark at sf0.01 and the
  matching ``oracle_sql()`` in DuckDB over the same parquet views,
  comparing order-insensitively and EXACTLY (no float tolerance — the
  engine owes determinism via decimal-accumulated aggregates).

Also flags oracle output columns whose DuckDB dtype round-trips badly
through pandas (HUGEINT → float64, DECIMAL → object): those need an
explicit CAST in the oracle SQL or the driver's schema/hash compare can
mismatch even when values agree.

Usage: python tools/driver_mimic.py [--sf /root/testdata/sf0.01]
"""

from __future__ import annotations

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

SF_SMOKE = "/root/testdata/sf0.001"


def flag_fragile_oracle_dtypes(con, sql: str, name: str) -> list[str]:
    """Return warnings for oracle columns that leave DuckDB as HUGEINT
    or DECIMAL: pandas maps HUGEINT to float64 (silent precision loss
    past 2^53) and DECIMAL to object (hash/schema mismatch vs Spark's
    float/int), so the oracle should CAST them explicitly."""
    rel = con.sql(sql)
    warnings = []
    for col, typ in zip(rel.columns, map(str, rel.types)):
        if typ in ("HUGEINT", "UHUGEINT") or typ.startswith("DECIMAL"):
            warnings.append(f"{name}: oracle column {col!r} is {typ} — CAST it")
    return warnings


def main() -> int:
    sf = "/root/testdata/sf0.01"
    args = sys.argv[1:]
    i = 0
    while i < len(args):
        if args[i] == "--sf":
            if i + 1 >= len(args):
                raise SystemExit("--sf requires a value")
            sf = args[i + 1]
            i += 1
        elif args[i].startswith("--sf="):
            sf = args[i].split("=", 1)[1]
        else:
            raise SystemExit(f"unknown arg {args[i]!r}")
        i += 1

    import __spark_entry__ as entrymod
    from tests.oracle_utils import assert_frames_match, duckdb_connection

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .appName("driver-mimic")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    df = entrymod.entry(spark)
    n = df.count()
    print(f"t1 entry(): {n} rows, schema={[f.name for f in df.schema.fields]}")
    assert n > 0

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    con = duckdb_connection(sf)
    ok, weak, bad, dtype_warnings = [], [], [], []
    t_start = time.time()
    for i, (name, fn) in enumerate(sorted(queries.items())):
        try:
            spark_pdf = fn(spark, sf).toPandas()
            if name in oracles:
                dtype_warnings += flag_fragile_oracle_dtypes(
                    con, oracles[name], name
                )
                oracle_pdf = con.sql(oracles[name]).df()
                assert_frames_match(spark_pdf, oracle_pdf, name)
                ok.append(name)
            else:
                # rows-only check — the driver's weaker path for
                # genuinely non-SQL-expressible ops; the driver expects
                # NON-EMPTY output, so zero rows is a failure here too
                # (ADVICE r13: >= 0 was vacuous)
                assert len(spark_pdf) > 0, f"{name}: rows-only query returned 0 rows"
                weak.append(name)
        except Exception as ex:
            bad.append(name)
            print(f"FAIL {name}: {type(ex).__name__}: {str(ex)[:300]}")
            traceback.print_exc(limit=3)
        if (i + 1) % 25 == 0:
            print(
                f"  ... {i + 1}/{len(queries)} ({time.time() - t_start:.0f}s)",
                flush=True,
            )
    print(
        f"t2 sweep: {len(ok)} oracle-exact, {len(weak)} rows-only "
        f"({sorted(weak)}), {len(bad)} FAILED in {time.time() - t_start:.0f}s"
    )
    for w in dtype_warnings:
        print(f"  dtype warning: {w}")
    if bad:
        print("FAILED:", sorted(bad))
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
