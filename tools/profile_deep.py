#!/usr/bin/env python
"""Profile the deep-crossover floor-bound queries at Nx replication.

Usage: python tools/profile_deep.py [query ...] [--rep N] [--mem 8g]
Prints per-run wall times plus the executed plan so the superlinear
30x scaling (VERDICT r3 #2/#3) can be attributed to a stage.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    rep = 30
    mem = None
    explain = "--explain" in sys.argv
    argv = [a for a in sys.argv[1:] if a != "--explain"]
    args = []
    skip = False
    for i, a in enumerate(argv):
        if skip:
            skip = False
            continue
        if a == "--rep":
            rep = int(argv[i + 1])
            skip = True
        elif a == "--mem":
            mem = argv[i + 1]
            skip = True
        else:
            args.append(a)
    if mem:
        os.environ["ENGINE_DRIVER_MEMORY"] = mem
    names = args or ["top_revenue_orders", "session_window_agg", "tumbling_window_agg"]

    from finance_data_ingestion_pipeline_with_kafka_spark.registry import load_all
    from finance_data_ingestion_pipeline_with_kafka_spark.session import get_spark

    spark = get_spark(app_name="profile-deep")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cat = load_all()

    def force(df):
        df.toPandas()

    for name in names:
        spec = cat[name]
        for r in (1, rep):
            os.environ["ENGINE_SCAN_REPLICATE"] = str(r)
            try:
                df = spec.fn(spark, sf_dir)
                force(df)  # warm
                ts = []
                for _ in range(3):
                    df = spec.fn(spark, sf_dir)
                    t0 = time.perf_counter()
                    force(df)
                    ts.append(round(time.perf_counter() - t0, 3))
                print(f"{name} rep={r}: {ts} min={min(ts)}")
                if explain and r == rep:
                    df = spec.fn(spark, sf_dir)
                    df.explain("formatted")
            finally:
                os.environ.pop("ENGINE_SCAN_REPLICATE", None)


if __name__ == "__main__":
    main()
