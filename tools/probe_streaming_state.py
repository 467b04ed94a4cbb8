"""Streaming state-scaling probe (VERDICT r13 ask #4): the batch
families carry two-decade 100x evidence, but the streaming numbers were
single-scale replays. For ``applyInPandasWithState`` operators the
100 TB question is STATE scaling, not throughput: does the state store
grow with KEYS (bounded — fine) or with MESSAGES (unbounded — a leak),
and does watermark-driven eviction actually evict?

Two probes, both reading the query's own progress telemetry
(``stateOperators``: numRowsTotal, memoryUsedBytes, per-batch walls):

* ``key_sweep`` — same per-key tick depth at 1x/10x/100x key
  cardinality (101 → 10,201 symbols), time span ≫ the watermark
  horizon so eviction is active. Healthy reading: final state rows ∝
  keys × O(horizon/interval), per-batch wall growing with VOLUME (rows
  scale with keys here), bytes/key roughly flat.
* ``eviction`` — fixed keys, 8 TIME-ORDERED micro-batches spanning many
  watermark horizons. Healthy reading: numRowsTotal per batch PLATEAUS
  after the horizon fills instead of growing linearly with delivered
  batches — the measured (not asserted) eviction the ask demands.

Operators probed: ``rsi_stream`` (watermark-ordered scalar fold),
``session_stream`` (custom session windows w/ event-time timeout),
``rv_bipower_stream`` (daily jump-decomposition fold with a (ts, id)
ordered buffer).

Usage: python tools/probe_streaming_state.py [--msgs-per-key 20]
       [--keys 101,1010,10201] [--json-out PATH]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE_MS = 1_704_205_200_000
TICK_INTERVAL_S = 120  # per-key tick spacing; 12x the 10 s probe watermark


def _messages(n_keys: int, per_key: int) -> list[str]:
    # time-ordered: all keys tick together every TICK_INTERVAL_S, so a
    # sequential file split yields time-advancing micro-batches and the
    # watermark moves between batches (the eviction trigger)
    out = []
    for step in range(per_key):
        t = BASE_MS + step * TICK_INTERVAL_S * 1000
        for k in range(n_keys):
            out.append(
                json.dumps(
                    {
                        "c": ["1"],
                        "p": 100.0 + ((step * 31 + k * 13) % 997) * 0.01,
                        "s": f"S{k}",
                        "t": t,
                        "v": 1 + (step + k) % 500,
                    }
                )
            )
    return out


def _run_stream(spark, work: str, tag: str, msgs: list[str], make_query, mode: str, n_batches=8):
    from finance_data_ingestion_pipeline_with_kafka_spark.sources import (
        kafka_shaped_file_stream,
        write_json_fixture,
    )
    from finance_data_ingestion_pipeline_with_kafka_spark.streaming.pipeline import (
        finnhub_pipeline,
    )

    src = f"{work}/src_{tag}"
    per = (len(msgs) + n_batches - 1) // n_batches
    for b in range(n_batches):
        chunk = msgs[b * per : (b + 1) * per]
        if chunk:
            f = write_json_fixture(src, chunk, f"b{b:02d}.json")
            # mtimes strictly increasing so file-source batch order ==
            # event-time order
            os.utime(f, (time.time() - 600 + b, time.time() - 600 + b))
    stream = finnhub_pipeline(
        kafka_shaped_file_stream(spark, src, max_files_per_trigger=1),
        dedup_watermark=None,
    )
    q = (
        make_query(stream)
        .writeStream.format("noop")
        .option("checkpointLocation", f"{work}/cp_{tag}")
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(600):
        q.stop()
        raise RuntimeError(f"{tag}: replay exceeded 600 s")
    batches = []
    for p in q.recentProgress or []:
        d = json.loads(p.json) if hasattr(p, "json") else p
        so = (d.get("stateOperators") or [{}])[0]
        batches.append(
            {
                "batch": d.get("batchId"),
                "rows_in": d.get("numInputRows", 0),
                "wall_ms": (d.get("durationMs") or {}).get("triggerExecution"),
                "state_rows": so.get("numRowsTotal"),
                "state_bytes": so.get("memoryUsedBytes"),
                "rows_removed": so.get("numRowsRemoved"),
            }
        )
    return [b for b in batches if b["rows_in"]]


def main() -> int:
    msgs_per_key = 20
    keys = [101, 1010, 10201]
    json_out = None
    args = sys.argv[1:]
    i = 0
    while i < len(args):
        a = args[i]
        if a.startswith("--msgs-per-key="):
            msgs_per_key = int(a.split("=", 1)[1])
        elif a.startswith("--keys="):
            keys = [int(x) for x in a.split("=", 1)[1].split(",")]
        elif a.startswith("--json-out="):
            json_out = a.split("=", 1)[1]
        else:
            raise SystemExit(f"unknown argument {a!r}")
        i += 1

    from finance_data_ingestion_pipeline_with_kafka_spark.session import get_spark
    from finance_data_ingestion_pipeline_with_kafka_spark.streaming.stateful import (
        rsi_stream,
        rv_bipower_stream,
        session_stream,
    )

    spark = get_spark(app_name="probe-streaming-state")
    spark.sparkContext.setLogLevel("ERROR")

    # short watermarks so the probe's 40-minute tape spans many horizons
    operators = {
        "rsi_stream": ("append", lambda s: rsi_stream(s, watermark="10 seconds")),
        "session_stream": ("append", lambda s: session_stream(
            s, gap="30 seconds", watermark="10 seconds"
        )),
        "rv_bipower_stream": ("update", lambda s: rv_bipower_stream(s, watermark="10 seconds")),
    }

    work = tempfile.mkdtemp(prefix="probe_stream_state_")
    out = {"msgs_per_key": msgs_per_key, "tick_interval_s": TICK_INTERVAL_S, "sweep": {}}
    try:
        for op_name, (mode, make) in operators.items():
            out["sweep"][op_name] = {}
            for n_keys in keys:
                msgs = _messages(n_keys, msgs_per_key)
                tag = f"{op_name}_{n_keys}"
                t0 = time.perf_counter()
                batches = _run_stream(spark, work, tag, msgs, make, mode)
                wall = time.perf_counter() - t0
                tail = batches[len(batches) // 2 :]
                peak_rows = max((b["state_rows"] or 0) for b in batches)
                final_rows = batches[-1]["state_rows"]
                peak_bytes = max((b["state_bytes"] or 0) for b in batches)
                out["sweep"][op_name][str(n_keys)] = {
                    "n_msgs": len(msgs),
                    "wall_s": round(wall, 2),
                    "per_batch_ms_back_half": [b["wall_ms"] for b in tail],
                    "state_rows_per_batch": [b["state_rows"] for b in batches],
                    "state_bytes_per_batch": [b["state_bytes"] for b in batches],
                    "rows_removed_per_batch": [b["rows_removed"] for b in batches],
                    "peak_state_rows": peak_rows,
                    "final_state_rows": final_rows,
                    "peak_state_bytes": peak_bytes,
                    "peak_rows_per_key": round(peak_rows / n_keys, 2),
                    "peak_bytes_per_key": round(peak_bytes / n_keys, 1),
                }
                print(f"{op_name} keys={n_keys}: {out['sweep'][op_name][str(n_keys)]}",
                      flush=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)

    print(json.dumps(out))
    if json_out:
        with open(json_out, "w") as f:
            json.dump(out, f, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
