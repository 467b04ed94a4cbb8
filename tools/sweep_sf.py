#!/usr/bin/env python
"""Execute every catalog query at a given SF dir (no oracle compare) —
the robustness sweep that catches data-dependent hazards the sf0.01
correctness sweep can't see (e.g. value=0 rows existing only at sf0.1
turned an unguarded divide into an ANSI-mode query failure, round 4).

Usage: python tools/sweep_sf.py [/root/testdata/sf0.1]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from finance_data_ingestion_pipeline_with_kafka_spark.registry import load_all
    from finance_data_ingestion_pipeline_with_kafka_spark.session import get_spark

    spark = get_spark(app_name="sf-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    cat = load_all()
    fails = []
    t0 = time.perf_counter()
    for name, spec in cat.items():
        try:
            spec.fn(spark, sf_dir).count()
        except Exception as e:
            fails.append((name, str(e)[:200]))
            print(f"FAIL {name}: {str(e)[:200]}", flush=True)
    print(
        f"{sf_dir}: {len(cat)} queries in {time.perf_counter() - t0:.0f}s, "
        f"{len(fails)} failures"
    )
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
