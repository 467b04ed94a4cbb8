"""One-off 100x volume probe: the sf0.1 fixture replicated 100-way
key-shifted (sf10-equivalent row counts — lineitem ~60M, events ~10M)
through the SAME two-engine machinery the bench crossover phases use,
for a handful of representative kernels. This answers the "would the
ratio still hold at the next 10x?" question with a measurement instead
of an extrapolation from the 10x/30x tables.

Usage: python tools/probe_100x.py [--queries a,b,c] [--factor 100]
                                  [--sf /root/testdata/sf0.1]

Protocol notes (matches bench._deep_crossover): DuckDB then Spark
back-to-back per (query, rep) so co-tenant spikes hit both sides of a
ratio; one warm pass then min-of-3 timed per engine (walls at 100x are
seconds — a deeper min buys little and costs minutes); both scale
points measured inside one JVM state.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("ENGINE_LAKE_CACHE", "1")

DEFAULT_QUERIES = (
    "pricing_summary",       # q1-class scan-agg: the per-row efficiency bar
    "top_revenue_orders",    # q3-class join + topk
    "tumbling_window_agg",   # event-time window agg
    "exact_dedup",           # hash-groupBy dedup
    "regional_revenue",      # 5-way dim join
)


def parse_args(argv: list[str]) -> tuple[list[str], int, str]:
    names = list(DEFAULT_QUERIES)
    factor = 100
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    i = 0
    while i < len(argv):
        a = argv[i]
        if a.startswith("--queries="):
            names = a.split("=", 1)[1].split(",")
        elif a == "--queries":
            if i + 1 >= len(argv):
                raise SystemExit("--queries requires a value")
            i += 1
            names = argv[i].split(",")
        elif a.startswith("--factor="):
            factor = int(a.split("=", 1)[1])
        elif a == "--factor":
            if i + 1 >= len(argv):
                raise SystemExit("--factor requires a value")
            i += 1
            factor = int(argv[i])
        elif a.startswith("--sf="):
            sf_dir = a.split("=", 1)[1]
        elif a == "--sf":
            if i + 1 >= len(argv):
                raise SystemExit("--sf requires a value")
            i += 1
            sf_dir = argv[i]
        else:
            raise SystemExit(f"unknown argument {a!r}")
        i += 1
    return names, factor, sf_dir


def main() -> int:
    names, factor, sf_dir = parse_args(sys.argv[1:])
    from bench import _duck_connect_replicated, _force

    from finance_data_ingestion_pipeline_with_kafka_spark.registry import load_all
    from finance_data_ingestion_pipeline_with_kafka_spark.session import get_spark

    cat = load_all()
    missing = [n for n in names if n not in cat or cat[n].oracle is None]
    if missing:
        raise SystemExit(f"not oracle-benchable: {missing}")
    spark = get_spark(app_name="probe-100x")

    def measure(rep: int) -> tuple[dict[str, float], dict[str, float]]:
        con = _duck_connect_replicated(sf_dir, rep)
        duck, spk = {}, {}
        os.environ["ENGINE_SCAN_REPLICATE"] = str(rep)
        try:
            for name in names:
                spec = cat[name]
                con.sql(spec.oracle).df()  # warm
                ts = []
                for _ in range(3):
                    t0 = time.perf_counter()
                    con.sql(spec.oracle).df()
                    ts.append(time.perf_counter() - t0)
                duck[name] = min(ts)
                _force(spec.fn(spark, sf_dir))  # warm (plan+codegen at N×)
                ts = []
                for _ in range(3):
                    t0 = time.perf_counter()
                    _force(spec.fn(spark, sf_dir))
                    ts.append(time.perf_counter() - t0)
                spk[name] = min(ts)
                print(
                    f"  rep={rep} {name}: spark {spk[name]:.2f} s, "
                    f"duckdb {duck[name]:.2f} s",
                    file=sys.stderr,
                )
        finally:
            os.environ.pop("ENGINE_SCAN_REPLICATE", None)
            con.close()
        return duck, spk

    duck_1x, spark_1x = measure(1)
    duck_nx, spark_nx = measure(factor)
    out = {
        name: {
            "spark_1x": round(spark_1x[name], 4),
            "duckdb_1x": round(duck_1x[name], 4),
            f"spark_{factor}x": round(spark_nx[name], 4),
            f"duckdb_{factor}x": round(duck_nx[name], 4),
            f"ratio_{factor}x": round(
                spark_nx[name] / max(duck_nx[name], 1e-6), 2
            ),
            "spark_scaling": round(spark_nx[name] / max(spark_1x[name], 1e-6), 2),
            "duckdb_scaling": round(duck_nx[name] / max(duck_1x[name], 1e-6), 2),
        }
        for name in names
    }
    print(json.dumps({"factor": factor, "sf_dir": sf_dir, "queries": out}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
