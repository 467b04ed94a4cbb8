#!/usr/bin/env python
"""Paired streaming-throughput A/B: HEAD vs pre-r14 ``20b6849``
(VERDICT r14 ask #2 — attribute the r13→r14 drop: burst 136.3k→68.7k,
steady 27.7k→20.7k, stateful 62.8k→43.5k msg/s).

Static prior: ``git diff 20b6849..HEAD -- streaming/`` shows the ONLY
executable change is inside ``_update_rv_bipower`` (the sha2 trade-id
state lane + (ts,id) sort), which is NOT on either benched path — the
steady/burst pipeline is ``finnhub_pipeline`` (unchanged) and the
stateful path is ``rsi_stream`` → ``_update_rsi_ordered`` (comment-only
diff). So the code cannot explain the drop; this tool produces the
paired-draw evidence.

Protocol: alternating fresh-JVM subprocess runs (A B A B), each arm a
separate checkout (HEAD = repo root, pre-r14 = .ab_pre_r14 worktree),
same fixture arithmetic, same window. Each run prints burst/steady/
stateful; the pairing means a co-tenant spike lands on both arms.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

RUNNER = r"""
import json, sys, time
sys.path.insert(0, sys.argv[1])
import bench
from finance_data_ingestion_pipeline_with_kafka_spark.session import get_spark
spark = get_spark(app_name="ab-stream-r14")
spark.sparkContext.setLogLevel("ERROR")
rate, steady = bench._streaming_throughput(spark)
stateful = bench._streaming_stateful_throughput(spark)
print(json.dumps({"burst": rate, "steady": steady, "stateful": stateful}))
"""


def run_arm(tree: str) -> dict:
    proc = subprocess.run(
        [sys.executable, "-c", RUNNER, tree],
        capture_output=True,
        text=True,
        timeout=900,
        cwd=tree,
    )
    if proc.returncode != 0:
        raise RuntimeError(f"arm {tree} rc={proc.returncode}: {proc.stderr[-400:]}")
    return json.loads(proc.stdout.strip().splitlines()[-1])


def main() -> None:
    head = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pre = os.path.join(head, ".ab_pre_r14")
    results: dict[str, list[dict]] = {"head": [], "pre_r14": []}
    for _ in range(2):  # A B A B
        la = os.getloadavg()
        results["head"].append({**run_arm(head), "loadavg_at_start": round(la[0], 2)})
        la = os.getloadavg()
        results["pre_r14"].append({**run_arm(pre), "loadavg_at_start": round(la[0], 2)})
        print(json.dumps(results), flush=True)
    for metric in ("burst", "steady", "stateful"):
        h = max(r[metric] for r in results["head"])
        p = max(r[metric] for r in results["pre_r14"])
        print(f"{metric}: head={h} pre_r14={p} ratio={h / max(p, 1):.3f}")


if __name__ == "__main__":
    main()
