"""Local mirror of the driver's t2 correctness check: run a catalog query
on Spark and its oracle SQL on DuckDB over the same parquet tables, then
compare row count, schema-compatible values, order-insensitively and
EXACTLY (no float tolerance — the engine is responsible for determinism,
see registry docstring).
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd

from finance_data_ingestion_pipeline_with_kafka_spark.catalog import TABLES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    out = df.copy()
    for c in out.columns:
        dt = out[c].dtype
        if pd.api.types.is_integer_dtype(dt):
            out[c] = out[c].astype("int64")
        elif pd.api.types.is_float_dtype(dt):
            out[c] = out[c].astype("float64")
        elif pd.api.types.is_datetime64_any_dtype(dt):
            out[c] = out[c].astype("datetime64[us]")
        elif pd.api.types.is_bool_dtype(dt):
            out[c] = out[c].astype("bool")
    out = out[sorted(out.columns)]
    out = out.sort_values(by=list(out.columns), na_position="last").reset_index(drop=True)
    return out


def assert_frames_match(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str) -> None:
    assert len(spark_pdf) == len(oracle_pdf), (
        f"{name}: row count {len(spark_pdf)} != oracle {len(oracle_pdf)}"
    )
    s = _normalize(spark_pdf)
    o = _normalize(oracle_pdf)
    assert list(s.columns) == list(o.columns), (
        f"{name}: columns {list(s.columns)} != oracle {list(o.columns)}"
    )
    for c in s.columns:
        sv, ov = s[c].to_numpy(), o[c].to_numpy()
        if sv.dtype.kind == "f":
            eq = (sv == ov) | (np.isnan(sv) & np.isnan(ov))
            if not eq.all():
                idx = np.where(~eq)[0][:5]
                diffs = [(int(i), sv[i], ov[i]) for i in idx]
                raise AssertionError(
                    f"{name}: column {c!r} float mismatch at rows {diffs} "
                    f"(max abs diff {np.nanmax(np.abs(sv - ov))})"
                )
        else:
            eq = (pd.Series(sv).astype(object).where(pd.notna(sv), None)
                  == pd.Series(ov).astype(object).where(pd.notna(ov), None)) | (
                pd.isna(pd.Series(sv)) & pd.isna(pd.Series(ov))
            )
            if not eq.all():
                i = int(np.where(~eq.to_numpy())[0][0])
                raise AssertionError(
                    f"{name}: column {c!r} mismatch at row {i}: "
                    f"spark={sv[i]!r} oracle={ov[i]!r}"
                )


def run_and_compare(spark, sf_dir: str, name: str, fn, oracle: str) -> None:
    spark_pdf = fn(spark, sf_dir).toPandas()
    con = duckdb_connection(sf_dir)
    try:
        oracle_pdf = con.sql(oracle).df()
    finally:
        con.close()
    assert_frames_match(spark_pdf, oracle_pdf, name)
