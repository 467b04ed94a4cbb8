#!/usr/bin/env python
"""Single-query oracle compare (driver_mimic's t2, one name at a time) —
the fast inner loop while developing a new catalog query.

Usage: python tools/check_one.py NAME [NAME...] [--sf DIR] [--explain]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf = "/root/testdata/sf0.01"
    explain = "--explain" in sys.argv
    for a in sys.argv[1:]:
        if a.startswith("--sf="):
            sf = a.split("=", 1)[1]

    import duckdb
    from pyspark.sql import SparkSession

    from finance_data_ingestion_pipeline_with_kafka_spark.catalog import TABLES
    from finance_data_ingestion_pipeline_with_kafka_spark.registry import load_all

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .appName("check-one")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    catalog = load_all()
    rc = 0
    for name in names:
        spec = catalog[name]
        t0 = time.perf_counter()
        sdf = spec.fn(spark, sf)
        if explain:
            sdf.explain("formatted")
        spark_pdf = sdf.toPandas()
        t_spark = time.perf_counter() - t0
        if spec.oracle is None:
            print(f"{name}: rows-only, {len(spark_pdf)} rows ({t_spark:.2f}s)")
            continue
        t0 = time.perf_counter()
        duck_pdf = con.sql(spec.oracle).df()
        t_duck = time.perf_counter() - t0
        ok_rows = len(spark_pdf) == len(duck_pdf)
        ok_schema = sorted(spark_pdf.columns) == sorted(duck_pdf.columns)
        ok_vals = False
        if ok_rows and ok_schema:
            cols = sorted(spark_pdf.columns)
            a = spark_pdf[cols].sort_values(cols, ignore_index=True)
            b = duck_pdf[cols].sort_values(cols, ignore_index=True)
            try:
                import pandas as pd

                # check_exact: the driver hash-compares byte-exact, so a
                # last-ULP float drift must FAIL here too, not pass under
                # assert_frame_equal's default rtol
                pd.testing.assert_frame_equal(
                    a, b, check_dtype=False, check_exact=True
                )
                ok_vals = True
            except AssertionError as ex:
                print(f"  value diff: {str(ex)[:500]}")
        status = "OK" if (ok_rows and ok_schema and ok_vals) else "FAIL"
        if status == "FAIL":
            rc = 1
        print(
            f"{name}: {status} rows={len(spark_pdf)}/{len(duck_pdf)} "
            f"schema_match={ok_schema} values_match={ok_vals} "
            f"(spark {t_spark:.2f}s, duck {t_duck:.2f}s)"
        )
        if not ok_schema:
            print(f"  spark cols: {sorted(spark_pdf.columns)}")
            print(f"  duck cols:  {sorted(duck_pdf.columns)}")
    sys.exit(rc)


if __name__ == "__main__":
    main()
