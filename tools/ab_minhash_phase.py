"""A/B the 0.32 s minhash_near_dup headline-vs-crossover intra-run delta
(VERDICT r12 ask #3).

In BENCH_r12 the SAME query at the SAME sf read 1.497 s in the headline
phase and 1.177 s in the dedup-crossover phase of one bench run. The
two phases share the session, the forcing (arrow toPandas), and the
scan config (ENGINE_SCAN_REPLICATE=1 hits the same scan-cache key as
unset) — the REAL protocol deltas are:

  (a) pass structure: the headline warm loop INTERLEAVES all 20 bench
      queries per pass (19 foreign queries run between consecutive
      minhash draws), the crossover phase runs minhash back-to-back;
  (b) pass depth: headline is min-of-3, crossover is adaptive min-of-5.

This tool isolates (a) from (b) in one JVM, same env as the headline
phase (ENGINE_LAKE_CACHE=1, arrow forcing, session pre-aged by a full
catalog-style warmup):

  back_to_back : warm, then N consecutive timed minhash passes
  interleaved  : warm, then N timed minhash passes with the other
                 headline dedup/scan queries run between each pair

Output: one JSON line with all walls, min/median per arm, and the
min-of-3 vs min-of-5 sub-reads so the depth effect is separable.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("ENGINE_LAKE_CACHE", "1")

from finance_data_ingestion_pipeline_with_kafka_spark.registry import load_all  # noqa: E402
from finance_data_ingestion_pipeline_with_kafka_spark.session import get_spark  # noqa: E402

TARGET = "minhash_near_dup"
#: headline-set queries run between draws in the interleaved arm — the
#: same kind of foreign work (dedup + scan-agg) the real headline loop
#: inserts between consecutive minhash passes
FOREIGN = (
    "simhash_near_dup", "ngram_jaccard_pairs", "exact_dedup",
    "pricing_summary", "top_revenue_orders",
)
N_PASSES = 5


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="ab-minhash-phase")
    spark.sparkContext.setLogLevel("ERROR")
    cat = load_all()

    def run(name: str) -> float:
        t0 = time.perf_counter()
        cat[name].fn(spark, sf_dir).toPandas()
        return time.perf_counter() - t0

    # pre-age the session the way the headline phase does: streaming is
    # too heavy to replicate here, but a full pass over the foreign set
    # plus the target's cold pass reproduces the JIT/heap state
    for name in FOREIGN:
        run(name)
    run(TARGET)  # cold/warm

    arms: dict[str, list[float]] = {}

    walls = [run(TARGET) for _ in range(N_PASSES)]
    arms["back_to_back"] = [round(w, 4) for w in walls]

    walls = []
    for _ in range(N_PASSES):
        for name in FOREIGN:
            run(name)
        walls.append(run(TARGET))
    arms["interleaved"] = [round(w, 4) for w in walls]

    out = {"sf_dir": sf_dir, "n_passes": N_PASSES, "arms": arms}
    for arm, ws in arms.items():
        out[f"{arm}_min5"] = round(min(ws), 4)
        out[f"{arm}_min3"] = round(min(ws[:3]), 4)
        out[f"{arm}_median"] = round(statistics.median(ws), 4)
    out["phase_delta_min"] = round(out["interleaved_min5"] - out["back_to_back_min5"], 4)
    out["depth_delta_interleaved"] = round(
        out["interleaved_min3"] - out["interleaved_min5"], 4
    )
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
