#!/usr/bin/env python
"""Stage-barrier decomposition for ivf_ann at 10x (VERDICT r12 ask #4).

The honest r12 ratio_10x read 3.39 (spark 0.36 -> 0.79 s, absolute gap
~0.55 s) with every sharing topology A/B'd into the same ~1 s floor
band — so this measures WHERE the wall lives across the kernel's
sequential barriers, with the rank-topk rigor: cumulative limbs, each
rebuilt fresh per pass (no shared Datasets -> no skipped stages),
min-of-N_PASSES, plus the stage/shuffle delta per limb from the UI REST
API, and the DuckDB full-query denominator at the same volume.

Limbs (each includes its predecessors — the kernel is one lazy plan):
  scan_norm : corpus scan + nonzero filter + norm projection
  train     : + decimal centroid means (groupBy label, dim)
  model     : + 1-row centroid model (collect_list struct agg)
  assign    : + map-only cell election over the corpus
  probes    : + query-side probe-cell projection (tiny frame)
  scored    : + probe broadcast-join + cosine scoring (NO window)
  full      : + per-query top-k window (the only candidate exchange)

Usage: REP=10 python tools/decompose_ivf.py
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
os.environ.setdefault("ENGINE_LAKE_CACHE", "1")

from pyspark.sql import functions as F

from finance_data_ingestion_pipeline_with_kafka_spark.operators.similarity import (
    N_PROBE,
    _ivf_index,
    _ivf_topk,
    ivf_ann,
)
from finance_data_ingestion_pipeline_with_kafka_spark.registry import (
    _apply_sized_partitions,
    load_all,
)
from finance_data_ingestion_pipeline_with_kafka_spark.session import get_spark
from tools.soak_sf1 import _stage_totals

REP = int(os.environ.get("REP", "10"))
N_PASSES = int(os.environ.get("N_PASSES", "5"))
sf = os.environ["SPARK_GRAFT_SF_DIR"]

spark = get_spark(app_name="decompose-ivf", extra_conf={"spark.ui.enabled": "true"})
spark.sparkContext.setLogLevel("ERROR")
ui = spark.sparkContext.uiWebUrl

os.environ["ENGINE_SCAN_REPLICATE"] = str(REP)
# the catalog query's own conf policy (sized_partitions=True)
_apply_sized_partitions(spark, sf, True, False)


def _index_parts():
    # rebuild the whole lineage fresh each call — shared Datasets would
    # replay materialized shuffle stages and fake the limb cost
    return _ivf_index(spark, sf)


def _corpus():
    from finance_data_ingestion_pipeline_with_kafka_spark.catalog import load_table
    from finance_data_ingestion_pipeline_with_kafka_spark.operators.similarity import (
        dot,
        nonzero,
    )

    e = nonzero(
        load_table(spark, sf, "embeddings").select(
            "vec_id", "label", F.col("embedding").alias("v")
        )
    )
    return e.withColumn("norm", F.sqrt(dot("v", "v")))


def _model_only():
    from finance_data_ingestion_pipeline_with_kafka_spark.operators.similarity import (
        _centroid_model,
        decimal_centroids,
    )

    return _centroid_model(decimal_centroids(_corpus(), "label"))


def _probes_only():
    from finance_data_ingestion_pipeline_with_kafka_spark.operators.similarity import (
        _probe_cells,
    )

    model, _assigned, q = _index_parts()
    return q.join(model).select(
        "query_id",
        F.explode(F.transform(_probe_cells(N_PROBE), lambda s: s["cid"])).alias("cell"),
    )
    # NOTE: forced via toPandas — 5 queries x n_probe rows, negligible


def _scored_only():
    from finance_data_ingestion_pipeline_with_kafka_spark.operators.similarity import (
        _probe_cells,
        dot,
    )

    model, assigned, q = _index_parts()
    probes = F.broadcast(
        q.join(model).select(
            "query_id",
            "qv",
            "qnorm",
            F.explode(F.transform(_probe_cells(N_PROBE), lambda s: s["cid"])).alias(
                "cell"
            ),
        )
    )
    return (
        probes.join(assigned, "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.round(
                dot("qv", "v") / (F.col("qnorm") * F.col("norm")), 6
            ).alias("cosine_sim"),
        )
        .agg(F.count(F.lit(1)), F.sum("cosine_sim"))
    )


def _train_only():
    from finance_data_ingestion_pipeline_with_kafka_spark.operators.similarity import (
        decimal_centroids,
    )

    return decimal_centroids(_corpus(), "label")


LIMBS = {
    # corpus scan + nonzero + norm: aggregate forces v AND norm without
    # billing a 64-dim Arrow transfer of the whole corpus
    "scan_norm": lambda: _corpus().agg(F.count(F.lit(1)), F.sum("norm")),
    "train": _train_only,
    "model": _model_only,
    "assign": lambda: _index_parts()[1].agg(F.count(F.lit(1)), F.sum("cell")),
    "probes": _probes_only,
    "scored": _scored_only,
    "full": lambda: _ivf_topk(spark, sf, N_PROBE),
}


def main() -> int:
    report: dict[str, dict] = {}
    prev_min = 0.0
    for tag, mk in LIMBS.items():
        mk().toPandas()  # warm (fresh lineage; the warm pass absorbs codegen)
        walls = []
        before = _stage_totals(ui)
        for _ in range(N_PASSES):
            t0 = time.perf_counter()
            mk().toPandas()
            walls.append(round(time.perf_counter() - t0, 3))
        delta_stages = len(_stage_totals(ui)) - len(before)
        m = min(walls)
        report[tag] = {
            "walls": walls,
            "min": m,
            "marginal_vs_prev_limb": round(m - prev_min, 3),
            "stages_per_pass": round(delta_stages / N_PASSES, 1),
        }
        prev_min = m
        print(f"spark {tag}: {walls} min={m} stages/pass={report[tag]['stages_per_pass']}", flush=True)

    # DuckDB full-query denominator at the same volume
    import bench

    spec = load_all()["ivf_ann"]
    con = bench._duck_connect_replicated(sf, REP)
    try:
        con.sql(spec.oracle).df()  # warm
        walls = []
        for _ in range(N_PASSES):
            t0 = time.perf_counter()
            con.sql(spec.oracle).df()
            walls.append(round(time.perf_counter() - t0, 3))
        report["duckdb_full"] = {"walls": walls, "min": min(walls)}
        print(f"duckdb full: {walls} min={min(walls)}", flush=True)
    finally:
        con.close()

    report["rep"] = REP
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
