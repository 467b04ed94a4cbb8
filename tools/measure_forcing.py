"""Measure per-query forcing cost: Arrow toPandas() vs JVM-side noop
write, per headline query at the bench SF. Decides (with numbers) how
much of the scan-agg family's fixed overhead is driver transfer
machinery rather than query execution — bench.py's forcing choice
follows from this measurement (SCALE.md §Round 8).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("ENGINE_LAKE_CACHE", "1")

from finance_data_ingestion_pipeline_with_kafka_spark.registry import load_all
from finance_data_ingestion_pipeline_with_kafka_spark.session import get_spark


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="measure-forcing")
    spark.sparkContext.setLogLevel("ERROR")
    specs = {n: s for n, s in sorted(load_all().items()) if s.bench}
    out = {}
    for name, spec in specs.items():
        rows = len(spec.fn(spark, sf_dir).toPandas())  # warm + row count
        arrow, noop = [], []
        for _ in range(5):
            t0 = time.perf_counter()
            spec.fn(spark, sf_dir).toPandas()
            arrow.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            noop.append(time.perf_counter() - t0)
        out[name] = {
            "rows": rows,
            "arrow_med": round(statistics.median(arrow), 4),
            "noop_med": round(statistics.median(noop), 4),
            "delta_med": round(
                statistics.median(arrow) - statistics.median(noop), 4
            ),
            "family": "dedup" if spec.fn.__module__.endswith(".dedup") else "scanagg",
        }
        print(f"{name}: {out[name]}", flush=True)
    for fam in ("scanagg", "dedup"):
        fam_rows = {n: v for n, v in out.items() if v["family"] == fam}
        print(
            json.dumps(
                {
                    "family": fam,
                    "arrow_total": round(sum(v["arrow_med"] for v in fam_rows.values()), 3),
                    "noop_total": round(sum(v["noop_med"] for v in fam_rows.values()), 3),
                }
            )
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
