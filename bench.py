#!/usr/bin/env python
"""Benchmark harness (driver contract, BASELINE.md t3).

Runs the headline catalog queries (``bench=True`` specs) at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:
``{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}``.

Each query is forced with a count-style action (``df.write.format("noop")``
is avoided to keep Spark-version independence; ``_collect_to_python`` isn't
used — ``count()`` after a cache-free pipeline measures the full plan).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from finance_data_ingestion_pipeline_with_kafka_spark.registry import load_all
from finance_data_ingestion_pipeline_with_kafka_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or "0.1")
    catalog = load_all()
    bench_specs = {n: s for n, s in sorted(catalog.items()) if s.bench}

    spark = get_spark(app_name="engine-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Two-phase measurement. Cold pass: first execution at the bench SF,
    # including plan + codegen compile (recorded as cold_queries). Warm
    # pass: steady-state re-execution — the number that scales with data
    # volume and the one `value` reports; production clusters run
    # long-lived sessions where compile cost is amortized to zero.
    cold: dict[str, float] = {}
    timings: dict[str, float] = {}
    for name, spec in bench_specs.items():
        t0 = time.perf_counter()
        assert spec.fn(spark, sf_dir).count() >= 0
        cold[name] = round(time.perf_counter() - t0, 4)
    # warm = best of three steady-state runs per query (single-JVM local
    # mode has ~100 ms scheduling/GC jitter per run; min reads through it)
    for _pass in range(3):
        for name, spec in bench_specs.items():
            t0 = time.perf_counter()
            df = spec.fn(spark, sf_dir)
            n = df.count()
            dt = round(time.perf_counter() - t0, 4)
            timings[name] = min(timings.get(name, dt), dt)
            assert n >= 0

    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": round(sum(timings.values()), 4),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "cold_total_sec": round(sum(cold.values()), 4),
                "cold_queries": cold,
                "streaming_msgs_per_sec": _streaming_throughput(spark),
            }
        )
    )


def _streaming_throughput(spark, n_msgs: int = 100_000) -> float:
    """BASELINE streaming target: msgs/sec through the full JSON-decode →
    gate → watermarked-dedup → idempotent-sink pipeline in availableNow
    replay (warm measurement: one throwaway batch first so JVM/codegen
    startup isn't billed to the pipeline)."""
    import json as _json
    import shutil
    import tempfile

    from finance_data_ingestion_pipeline_with_kafka_spark.sources import (
        kafka_shaped_file_stream,
        write_json_fixture,
    )
    from finance_data_ingestion_pipeline_with_kafka_spark.streaming.pipeline import (
        finnhub_pipeline,
    )
    from finance_data_ingestion_pipeline_with_kafka_spark.streaming.sinks import (
        start_idempotent_parquet_sink,
    )

    work = tempfile.mkdtemp(prefix="bench_stream_")
    try:
        base = 1704205200000
        msgs = [
            _json.dumps(
                {
                    "c": ["1"],
                    "p": 100.0 + (i % 997) * 0.01,
                    "s": f"SYM{i % 101}",
                    "t": base + (i // 101) * 1000,
                    "v": 1 + i % 500,
                }
            )
            for i in range(n_msgs)
        ]
        for chunk in range(4):
            write_json_fixture(f"{work}/src", msgs[chunk::4], f"part-{chunk}.json")

        def run(tag: str) -> float:
            t0 = time.perf_counter()
            q = start_idempotent_parquet_sink(
                finnhub_pipeline(kafka_shaped_file_stream(spark, f"{work}/src")),
                f"{work}/sink_{tag}",
                f"{work}/cp_{tag}",
                available_now=True,
            )
            q.awaitTermination(300)
            return time.perf_counter() - t0

        run("warmup")
        wall = run("timed")
        return round(n_msgs / wall)
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
