"""Spot-check named catalog queries against their DuckDB oracles.

Usage: python tools/check_queries.py NAME [NAME...] [--sf sf0.001,sf0.01,sf0.1]

Same exact-compare discipline as the driver / driver_mimic, but scoped to
a handful of queries so iterating on a new oracle doesn't cost a
215-query sweep.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd
from pyspark.sql import SparkSession

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def parse_args(argv: list[str]) -> tuple[list[str], list[str]]:
    """Accept both ``--sf=X,Y`` and ``--sf X,Y``; everything else is a
    query name. Unknown ``--`` flags and a missing ``--sf`` value error
    instead of leaking into the name list."""
    names: list[str] = []
    sfs = ["sf0.001", "sf0.01", "sf0.1"]
    i = 0
    while i < len(argv):
        a = argv[i]
        if a.startswith("--sf="):
            sfs = a.split("=", 1)[1].split(",")
        elif a == "--sf":
            if i + 1 >= len(argv):
                raise SystemExit("--sf requires a value (e.g. --sf sf0.01)")
            sfs = argv[i + 1].split(",")
            i += 1
        elif a.startswith("--"):
            raise SystemExit(f"unknown flag {a!r}")
        else:
            names.append(a)
        i += 1
    if not names:
        raise SystemExit("usage: check_queries.py NAME [NAME...] [--sf sf0.01,...]")
    return names, sfs


def main() -> int:
    names, sfs = parse_args(sys.argv[1:])
    from finance_data_ingestion_pipeline_with_kafka_spark.registry import load_all

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .appName("check-queries")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    cat = load_all()
    bad = 0
    for sf in sfs:
        sdir = f"/root/testdata/{sf}"
        con = duckdb.connect()
        import os

        for t in TABLES:
            p = f"{sdir}/{t}.parquet"
            if os.path.exists(p):
                con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
        for name in names:
            spec = cat[name]
            sdf = spec.fn(spark, sdir).toPandas()
            if spec.oracle is None:
                print(f"{sf} {name}: no_oracle rows={len(sdf)}")
                continue
            ddf = con.execute(spec.oracle).df()
            cols = sorted(sdf.columns)
            if sorted(ddf.columns) != cols:
                print(f"{sf} {name}: COLUMN-MISMATCH {sorted(ddf.columns)} vs {cols}")
                bad += 1
                continue
            s = sdf[cols].sort_values(cols).reset_index(drop=True)
            d = ddf[cols].sort_values(cols).reset_index(drop=True)
            try:
                d = d.astype({c: s[c].dtype for c in cols})
            except (TypeError, ValueError) as ex:
                print(f"{sf} {name}: DTYPE-MISMATCH {ex}")
                bad += 1
                continue
            if len(s) != len(d):
                print(f"{sf} {name}: ROWCOUNT {len(s)} vs {len(d)}")
                bad += 1
            elif not s.equals(d):
                neq = (s != d) & ~(s.isna() & d.isna())
                print(f"{sf} {name}: VALUE-MISMATCH ({int(neq.any(axis=1).sum())} rows)")
                with pd.option_context("display.width", 200):
                    mask = neq.any(axis=1)
                    print(s[mask].head(3))
                    print(d[mask].head(3))
                bad += 1
            else:
                print(f"{sf} {name}: EXACT-MATCH ({len(s)} rows)")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
