#!/usr/bin/env python
"""Dump .explain("formatted") for catalog queries to plans/<tag>/<q>_<suffix>.txt.

Usage: python tools/dump_plans.py --tag r17 --suffix before [query ...]
Defaults to the full headline bench set. Runs under the same env the
bench uses (ENGINE_LAKE_CACHE=1, $SPARK_GRAFT_SF_DIR) so sized-partition
conf paths and lake scans match what the bench times.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from finance_data_ingestion_pipeline_with_kafka_spark.registry import load_all
from finance_data_ingestion_pipeline_with_kafka_spark.session import get_spark


def main() -> None:
    tag, suffix = "r17", "before"
    names: list[str] = []
    it = iter(sys.argv[1:])
    for a in it:
        if a == "--tag":
            tag = next(it)
        elif a == "--suffix":
            suffix = next(it)
        else:
            names.append(a)
    os.environ.setdefault("ENGINE_LAKE_CACHE", "1")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    catalog = load_all()
    if not names:
        names = [n for n, s in sorted(catalog.items()) if s.bench]
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = catalog[name].fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        n_ex = plan.count("Exchange")
        n_sq = plan.count("Subquery")
        print(f"{name:26s} exchanges={n_ex:2d} subqueries={n_sq} -> {path}",
              file=sys.stderr)


if __name__ == "__main__":
    main()
