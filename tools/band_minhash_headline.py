"""Per-cell distribution band for the minhash_near_dup HEADLINE cell
(VERDICT r13 ask #3): N same-binary draws of the headline-phase
protocol for this one query, each paired with its DuckDB twin drawn
under the same load window, so BASELINE.md can carry a measured band
the way the round-13 session-4 note banded the 20-query aggregate.

Headline-protocol replication per draw (one fresh child JVM each, the
`attr_floor` isolation): pre-age the session with the foreign headline
dedup/scan queries plus the target's cold pass (the JIT/heap state the
real headline loop accumulates), then time the target min-of-3 with the
foreign set re-run between passes (the headline loop interleaves all 20
queries per pass). The parent draws the DuckDB twin min-of-2 (the
headline phase's `_duckdb_headline_times` depth) immediately after each
child, so each ratio's numerator and denominator share co-tenant
conditions.

Usage: python tools/band_minhash_headline.py [--draws 5]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TARGET = "minhash_near_dup"
FOREIGN = (
    "simhash_near_dup", "ngram_jaccard_pairs", "exact_dedup",
    "pricing_summary", "top_revenue_orders",
)

_CHILD = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
os.environ.setdefault("ENGINE_LAKE_CACHE", "1")
from finance_data_ingestion_pipeline_with_kafka_spark.registry import load_all
from finance_data_ingestion_pipeline_with_kafka_spark.session import get_spark

spark = get_spark(app_name="band-minhash")
spark.sparkContext.setLogLevel("ERROR")
sf_dir = {sf_dir!r}
cat = load_all()

def run(name):
    t0 = time.perf_counter()
    cat[name].fn(spark, sf_dir).toPandas()
    return time.perf_counter() - t0

for name in {foreign!r}:
    run(name)
run({target!r})  # cold
walls = []
for _ in range(3):
    for name in {foreign!r}:
        run(name)
    walls.append(run({target!r}))
print(json.dumps({{"walls": [round(w, 4) for w in walls], "min3": round(min(walls), 4)}}))
"""


def main() -> int:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_draws = 5
    for a in sys.argv[1:]:
        if a.startswith("--draws="):
            n_draws = int(a.split("=", 1)[1])
        else:
            raise SystemExit(f"unknown argument {a!r}")

    import duckdb

    from finance_data_ingestion_pipeline_with_kafka_spark.catalog import TABLES
    from finance_data_ingestion_pipeline_with_kafka_spark.registry import load_all

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = load_all()[TARGET].oracle
    con.sql(oracle).df()  # warm once, like the headline's duck pass

    def duck_min2() -> float:
        walls = []
        for _ in range(2):
            t0 = time.perf_counter()
            con.sql(oracle).df()
            walls.append(time.perf_counter() - t0)
        return round(min(walls), 4)

    draws = []
    for i in range(n_draws):
        code = _CHILD.format(
            repo=repo, sf_dir=sf_dir, foreign=FOREIGN, target=TARGET
        )
        out = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True, timeout=900
        )
        line = out.stdout.strip().splitlines()[-1] if out.stdout.strip() else "{}"
        try:
            d = json.loads(line)
        except json.JSONDecodeError:
            d = {"error": out.stderr[-300:]}
        if "min3" in d:
            d["duckdb_min2"] = duck_min2()
            d["ratio"] = round(d["min3"] / d["duckdb_min2"], 2)
        draws.append(d)
        print(f"draw {i + 1}/{n_draws}: {d}", flush=True)

    ratios = sorted(d["ratio"] for d in draws if "ratio" in d)
    out = {
        "target": TARGET,
        "protocol": "headline (pre-aged JVM, interleaved min-of-3 vs duck min-of-2)",
        "draws": draws,
        "ratios": ratios,
        "ratio_band": [ratios[0], ratios[-1]] if ratios else None,
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
