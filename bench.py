#!/usr/bin/env python
"""Benchmark harness (driver contract, BASELINE.md t3).

Runs the headline catalog queries (``bench=True`` specs) at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:
``{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}``.

Each query is forced with ``df.write.format("noop")`` — a full
materialization of every output column, so Catalyst cannot prune
projections or eliminate final sorts the way a bare ``count()`` allows
(the round-1 numbers measured some scan+filter-only plans; these measure
the advertised plan).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from finance_data_ingestion_pipeline_with_kafka_spark.registry import load_all
from finance_data_ingestion_pipeline_with_kafka_spark.session import get_spark


def _force(df) -> None:
    """Materialize every column of every row (noop DSv2 sink)."""
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or "0.1")
    catalog = load_all()
    bench_specs = {n: s for n, s in sorted(catalog.items()) if s.bench}

    spark = get_spark(app_name="engine-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Two-phase measurement. Cold pass: first execution at the bench SF,
    # including plan + codegen compile (recorded as cold_queries). Warm
    # passes: steady-state re-execution — the number that scales with data
    # volume; production clusters run long-lived sessions where compile
    # cost is amortized to zero. Both min-of-3 (jitter floor) and
    # median-of-3 (robust central estimate) are reported; `value` is the
    # min total for round-over-round continuity, `median_total_sec` is the
    # honest companion.
    cold: dict[str, float] = {}
    samples: dict[str, list[float]] = {}
    for name, spec in bench_specs.items():
        t0 = time.perf_counter()
        _force(spec.fn(spark, sf_dir))
        cold[name] = round(time.perf_counter() - t0, 4)
    for _pass in range(3):
        for name, spec in bench_specs.items():
            t0 = time.perf_counter()
            _force(spec.fn(spark, sf_dir))
            samples.setdefault(name, []).append(time.perf_counter() - t0)
    timings = {n: round(min(ts), 4) for n, ts in samples.items()}
    medians = {n: round(statistics.median(ts), 4) for n, ts in samples.items()}

    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": round(sum(timings.values()), 4),
                "unit": "sec",
                "queries": timings,
                "queries_median": medians,
                "median_total_sec": round(sum(medians.values()), 4),
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
