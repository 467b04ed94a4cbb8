#!/usr/bin/env python
"""Decompose the scan-agg per-action floor (VERDICT r16 ask #1).

For each headline query (default: the scan-agg family), measures per warm
invocation, inside one JVM:

* ``construct`` — ``spec.fn(spark, sf_dir)`` wall (plan-cache rewrap).
* ``plan``      — forcing ``executedPlan`` on the fresh Dataset: Catalyst
  optimization + physical planning + (non-adaptive) codegen, zero jobs.
* ``noop``      — noop-sink execution of a fresh Dataset (guide §1.4).
* ``topandas``  — full bench forcing (Arrow collect) on a fresh Dataset.
* ``n_jobs``    — Spark jobs submitted during the ``topandas`` pass (job
  group scoped), the scheduling-floor multiplier.

Usage: python tools/floor_decompose.py [query ...] [--passes N]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from finance_data_ingestion_pipeline_with_kafka_spark.registry import load_all
from finance_data_ingestion_pipeline_with_kafka_spark.session import get_spark


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    passes = 5
    for a in sys.argv[1:]:
        if a.startswith("--passes"):
            passes = int(a.split("=", 1)[1])
    os.environ.setdefault("ENGINE_LAKE_CACHE", "1")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    catalog = load_all()
    if args:
        names = args
    else:
        names = [
            n
            for n, s in sorted(catalog.items())
            if s.bench and not s.fn.__module__.endswith(".dedup")
        ]
    spark = get_spark(app_name="floor-decompose")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    out: dict[str, dict] = {}
    for name in names:
        spec = catalog[name]
        # warm: cold plan build + codegen out of the measurement
        for _ in range(2):
            spec.fn(spark, sf_dir).toPandas()
        rec = {k: [] for k in ("construct", "plan", "noop", "topandas")}
        n_jobs = []
        for p in range(passes):
            t0 = time.perf_counter()
            df = spec.fn(spark, sf_dir)
            rec["construct"].append(time.perf_counter() - t0)

            t0 = time.perf_counter()
            df._jdf.queryExecution().executedPlan()
            rec["plan"].append(time.perf_counter() - t0)

            df2 = spec.fn(spark, sf_dir)
            t0 = time.perf_counter()
            df2.write.format("noop").mode("overwrite").save()
            rec["noop"].append(time.perf_counter() - t0)

            df3 = spec.fn(spark, sf_dir)
            sc.setJobGroup(f"fd-{name}-{p}", name)
            t0 = time.perf_counter()
            df3.toPandas()
            rec["topandas"].append(time.perf_counter() - t0)
            try:
                ids = sc.statusTracker().getJobIdsForGroup(f"fd-{name}-{p}")
                n_jobs.append(len(ids))
            except Exception:
                n_jobs.append(-1)
            finally:
                sc.setJobGroup(None, None)
        out[name] = {
            **{k: round(min(v), 4) for k, v in rec.items()},
            "n_jobs": max(n_jobs) if n_jobs else -1,
        }
        print(f"{name:24s} " + json.dumps(out[name]), file=sys.stderr, flush=True)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
