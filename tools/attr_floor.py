"""Attribution protocol for round-over-round draws in floor-bound bench
numbers (SCALE.md §Round 7 protocol): N fresh-JVM re-runs of a single
query's 1x wall (min-of-3 warm, identical conf to bench.py — lake cache
on, same session builder), plus the DuckDB twin, so a suspicious draw
can be pinned to noise or to a real cost move.

Usage:
  python tools/attr_floor.py top_revenue_orders [--jvms 3] [--sf /root/testdata/sf0.1]
  python tools/attr_floor.py --streaming [--jvms 3]   # replay/steady throughput draws
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_CHILD = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
os.environ.setdefault("ENGINE_LAKE_CACHE", "1")
from finance_data_ingestion_pipeline_with_kafka_spark.registry import load_all
from finance_data_ingestion_pipeline_with_kafka_spark.session import get_spark

spark = get_spark(app_name="attr-floor")
spark.sparkContext.setLogLevel("ERROR")
name = {name!r}
sf_dir = {sf_dir!r}
spec = load_all()[name]
spec.fn(spark, sf_dir).toPandas()  # cold: plan + codegen + lake ingest
walls = []
for _ in range(3):
    t0 = time.perf_counter()
    spec.fn(spark, sf_dir).toPandas()
    walls.append(time.perf_counter() - t0)
print(json.dumps({{"walls": [round(w, 4) for w in walls], "min": round(min(walls), 4)}}))
"""

_CHILD_STREAMING = r"""
import json, os, sys
sys.path.insert(0, {repo!r})
os.environ.setdefault("ENGINE_LAKE_CACHE", "1")
from finance_data_ingestion_pipeline_with_kafka_spark.session import get_spark
from bench import _streaming_throughput

spark = get_spark(app_name="attr-streaming")
spark.sparkContext.setLogLevel("ERROR")
rate, steady = _streaming_throughput(spark)
print(json.dumps({{"replay_msgs_per_sec": rate, "steady_msgs_per_sec": steady}}))
"""


def main() -> int:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    args = sys.argv[1:]
    jvms = 3
    sf_dir = "/root/testdata/sf0.1"
    streaming = False
    names: list[str] = []
    i = 0
    while i < len(args):
        a = args[i]
        if a.startswith("--jvms="):
            jvms = int(a.split("=", 1)[1])
        elif a == "--jvms":
            if i + 1 >= len(args):
                raise SystemExit("--jvms requires a value")
            jvms = int(args[i + 1])
            i += 1
        elif a.startswith("--sf="):
            sf_dir = a.split("=", 1)[1]
        elif a == "--sf":
            if i + 1 >= len(args):
                raise SystemExit("--sf requires a value (e.g. --sf /root/testdata/sf0.1)")
            sf_dir = args[i + 1]
            i += 1
        elif a == "--streaming":
            streaming = True
        elif a.startswith("--"):
            raise SystemExit(f"unknown flag {a!r}")
        else:
            names.append(a)
        i += 1
    if not streaming and not names:
        raise SystemExit("usage: attr_floor.py QUERY_NAME [--jvms N] [--sf DIR] | --streaming")

    duck_time = None
    if not streaming:
        import time as _t

        import duckdb

        con = duckdb.connect()
        from finance_data_ingestion_pipeline_with_kafka_spark.catalog import TABLES
        from finance_data_ingestion_pipeline_with_kafka_spark.registry import load_all

        for t in TABLES:
            p = f"{sf_dir}/{t}.parquet"
            if os.path.exists(p):
                con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
        oracle = load_all()[names[0]].oracle
        con.sql(oracle).df()  # warm once

        def duck_time():
            walls = []
            for _ in range(3):
                t0 = _t.perf_counter()
                con.sql(oracle).df()
                walls.append(_t.perf_counter() - t0)
            return round(min(walls), 4)

    # the DuckDB twin is drawn ONCE PER JVM, interleaved with the spark
    # child runs, so each draw pair shares co-tenant load conditions and
    # the per-draw ratio distribution is meaningful (VERDICT r13 ask #3:
    # the per-cell band needs paired draws, not one duck number)
    draws = []
    for i in range(jvms):
        if streaming:
            code = _CHILD_STREAMING.format(repo=repo)
        else:
            code = _CHILD.format(repo=repo, name=names[0], sf_dir=sf_dir)
        out = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True,
            text=True,
            timeout=900,
        )
        line = out.stdout.strip().splitlines()[-1] if out.stdout.strip() else "{}"
        try:
            draws.append(json.loads(line))
        except json.JSONDecodeError:
            draws.append({"error": out.stderr[-300:]})
        if duck_time is not None and "min" in draws[-1]:
            draws[-1]["duckdb_min"] = duck_time()
            draws[-1]["ratio"] = round(draws[-1]["min"] / draws[-1]["duckdb_min"], 2)
        print(f"jvm {i + 1}/{jvms}: {draws[-1]}", flush=True)

    ratios = sorted(d["ratio"] for d in draws if "ratio" in d)
    if ratios:
        print(json.dumps({"ratio_band": [ratios[0], ratios[-1]], "ratios": ratios}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
