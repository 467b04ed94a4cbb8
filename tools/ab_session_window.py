"""Decompose the session_window_agg 10x-vs-30x scaling contradiction
(VERDICT r13 ask #2).

BENCH_r13's two crossover phases told opposite stories about the same
kernel inside one bench run:

  scale_crossover_10x : spark_scaling 5.77 vs duckdb 3.95  (inverted)
  deep_crossover_30x  : spark_scaling 3.04 vs duckdb 7.78  (amortizing)

The suspect is the 1x denominator, not the N-x numerator: the 10x phase
measures 1x inside the long-lived main-bench JVM (spark_1x 0.16 s), the
30x phase in a fresh subprocess (spark_1x 0.49 s) — the same kernel, so
one of the two 1x walls carries phase-state (JIT maturity, co-tenant
draw), and scaling = wall_Nx / wall_1x inherits its noise.

This tool re-draws the cell standalone, N_DRAWS independent times in one
fresh JVM (the ab_minhash_phase pattern): per draw, DuckDB-then-Spark
back-to-back at 1x and 10x (and 30x), min-of-5 timed passes per engine
per scale point, so the per-draw scaling ratios come with a spread
instead of a single draw. It also A/Bs the kernel against a
repartition(user_id)-before-session variant at 10x to answer the ask's
"if the inversion is real, attribute it to the session-window state
exchange" branch.

Output: one JSON line with per-draw walls, per-draw scaling ratios,
min/median per arm, and the A/B walls.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("ENGINE_LAKE_CACHE", "1")

from pyspark.sql import functions as F  # noqa: E402

from finance_data_ingestion_pipeline_with_kafka_spark.catalog import load_table  # noqa: E402
from finance_data_ingestion_pipeline_with_kafka_spark.functions.core import dsum  # noqa: E402
from finance_data_ingestion_pipeline_with_kafka_spark.registry import load_all  # noqa: E402
from finance_data_ingestion_pipeline_with_kafka_spark.session import get_spark  # noqa: E402

TARGET = "session_window_agg"
N_DRAWS = 5
N_PASSES = 5
FACTORS = (1, 10, 30)


def _variant_repartitioned(spark, sf_dir):
    """The A/B arm: explicit hash repartition on the session key before
    the native session-window aggregation (forces the exchange shape the
    planner would pick anyway, but WITHOUT the sized-partitions AQE
    floor interacting with the merging-sessions pass)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.repartition("user_id")
        .groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value").alias("sum_value"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            "n_events",
            "sum_value",
        )
    )


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from bench import _duck_connect_replicated, _force

    spec = load_all()[TARGET]
    spark = get_spark(app_name="ab-session-window")
    spark.sparkContext.setLogLevel("ERROR")

    def timed_spark(fn, rep):
        os.environ["ENGINE_SCAN_REPLICATE"] = str(rep)
        try:
            _force(fn(spark, sf_dir))  # warm
            ts = []
            for _ in range(N_PASSES):
                t0 = time.perf_counter()
                _force(fn(spark, sf_dir))
                ts.append(time.perf_counter() - t0)
            return round(min(ts), 4)
        finally:
            os.environ.pop("ENGINE_SCAN_REPLICATE", None)

    def timed_duck(rep):
        con = _duck_connect_replicated(sf_dir, rep)
        try:
            con.sql(spec.oracle).df()  # warm
            ts = []
            for _ in range(N_PASSES):
                t0 = time.perf_counter()
                con.sql(spec.oracle).df()
                ts.append(time.perf_counter() - t0)
            return round(min(ts), 4)
        finally:
            con.close()

    # session warmup: one pass at each scale point so codegen/JIT for
    # every plan shape exists before draw 1 (the 30x phase's fresh-JVM
    # 1x wall is exactly the state this avoids)
    for rep in FACTORS:
        timed_spark(spec.fn, rep)

    draws = []
    for d in range(N_DRAWS):
        row = {"draw": d}
        for rep in FACTORS:
            row[f"duck_{rep}x"] = timed_duck(rep)
            row[f"spark_{rep}x"] = timed_spark(spec.fn, rep)
        for rep in FACTORS[1:]:
            row[f"spark_scaling_{rep}x"] = round(row[f"spark_{rep}x"] / row["spark_1x"], 2)
            row[f"duck_scaling_{rep}x"] = round(row[f"duck_{rep}x"] / row["duck_1x"], 2)
            row[f"ratio_{rep}x"] = round(row[f"spark_{rep}x"] / row[f"duck_{rep}x"], 2)
        draws.append(row)

    ab = {
        "native_10x": timed_spark(spec.fn, 10),
        "repartition_10x": timed_spark(_variant_repartitioned, 10),
        "native_30x": timed_spark(spec.fn, 30),
        "repartition_30x": timed_spark(_variant_repartitioned, 30),
    }

    def spread(key):
        vals = [r[key] for r in draws]
        return {
            "min": min(vals),
            "median": round(statistics.median(vals), 2),
            "max": max(vals),
        }

    out = {
        "target": TARGET,
        "sf_dir": sf_dir,
        "n_draws": N_DRAWS,
        "n_passes": N_PASSES,
        "draws": draws,
        "spark_scaling_10x": spread("spark_scaling_10x"),
        "duck_scaling_10x": spread("duck_scaling_10x"),
        "spark_scaling_30x": spread("spark_scaling_30x"),
        "duck_scaling_30x": spread("duck_scaling_30x"),
        "ratio_10x": spread("ratio_10x"),
        "ratio_30x": spread("ratio_30x"),
        "ab_repartition": ab,
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
