#!/usr/bin/env python
"""A/B the ANN shared-subtree strategy under the HONEST protocol
(every timed pass rebuilds the plan and re-runs the shared-subtree
handling). HISTORICAL NOTE (r12): the shipped kernels no longer call
materialize() at all (training runs in-plan; the strategy monkeypatch
below is a no-op against them), so for current kernels all three
"strategies" measure the same plan — the tool remains useful as a
min-of-5 fresh-pass wall-clock harness and as the record of the
experiment that motivated the rewrite (SCALE.md Round 12). Three
strategies per query:

  ckpt    — current: eager localCheckpoint (extra job + block write per
            pass, subtree runs once)
  persist — lazy .persist(): no eager job; the first consumer computes,
            later consumers read cache (per-partition loading locks
            dedupe concurrent broadcast builds)
  plain   — no sharing: the subtree recomputes per consumer

Each (query, strategy, rep) cell runs in THIS process sequentially:
warm + min-of-5 fresh-plan passes, bench-identical forcing (toPandas).

Usage: python tools/ab_ann.py [ivf_ann pq_ann ...] [--reps 1,10]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("ENGINE_LAKE_CACHE", "1")

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

names = [a for a in sys.argv[1:] if not a.startswith("--")] or ["ivf_ann", "pq_ann", "ivf_probe_sweep"]
reps = [1, 10]
for a in sys.argv[1:]:
    if a.startswith("--reps"):
        reps = [int(x) for x in a.split("=", 1)[1].split(",")]

from finance_data_ingestion_pipeline_with_kafka_spark import execution
from finance_data_ingestion_pipeline_with_kafka_spark.operators import similarity
from finance_data_ingestion_pipeline_with_kafka_spark.registry import load_all
from finance_data_ingestion_pipeline_with_kafka_spark.session import get_spark

spark = get_spark(app_name="ab-ann")
spark.sparkContext.setLogLevel("ERROR")
cat = load_all()

real_materialize = execution.materialize

_live: list = []


def _persist_slot(df):
    """Honest persist sharing: drop the PREVIOUS invocation's cache entry
    first, so Spark's CacheManager (which matches canonicalized plans
    across invocations) cannot replay stored rows into this pass — then
    persist the fresh frame so this pass's consumers share one compute."""
    while _live:
        try:
            _live.pop().unpersist()
        except Exception:
            pass
    df = df.persist()
    _live.append(df)
    return df


STRATS = {
    "ckpt": real_materialize,
    "persist": _persist_slot,
    "plain": lambda df: df,
}


def run(name: str, strat: str, rep: int) -> float:
    similarity.materialize = STRATS[strat]
    os.environ["ENGINE_SCAN_REPLICATE"] = str(rep)
    spec = cat[name]
    try:
        spec.fn(spark, SF).toPandas()  # warm (codegen at this rep)
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            spec.fn(spark, SF).toPandas()
            ts.append(time.perf_counter() - t0)
        return min(ts)
    finally:
        similarity.materialize = real_materialize
        os.environ.pop("ENGINE_SCAN_REPLICATE", None)
        spark.catalog.clearCache()


for name in names:
    for rep in reps:
        row = []
        for strat in STRATS:
            w = run(name, strat, rep)
            row.append(f"{strat}={w:.3f}")
        print(f"{name} rep={rep}: " + "  ".join(row), flush=True)
