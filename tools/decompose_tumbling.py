#!/usr/bin/env python
"""Attribute tumbling_window_agg's constant ~7x ratio at 30x (VERDICT r11
ask #2) with the rank-topk rigor: scan floor vs window-bucket grouping vs
the sum variants (none / double / exact-decimal), on BOTH engines, under
the query's own conf policy (sized_partitions) and the bench's forcing
(arrow toPandas for the full query; count() for the scan limbs whose
output would otherwise bill millions of rows of Arrow transfer).

Usage: REP=30 python tools/decompose_tumbling.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
os.environ.setdefault("ENGINE_LAKE_CACHE", "1")

from pyspark.sql import functions as F

from finance_data_ingestion_pipeline_with_kafka_spark.catalog import load_table
from finance_data_ingestion_pipeline_with_kafka_spark.functions.core import dsum
from finance_data_ingestion_pipeline_with_kafka_spark.registry import (
    _apply_sized_partitions,
)
from finance_data_ingestion_pipeline_with_kafka_spark.session import get_spark

REP = int(os.environ.get("REP", "30"))
N_PASSES = 5
sf = os.environ["SPARK_GRAFT_SF_DIR"]
spark = get_spark(app_name="decompose-tumbling")
spark.sparkContext.setLogLevel("ERROR")

os.environ["ENGINE_SCAN_REPLICATE"] = str(REP)
# same conf policy the catalog query runs under
_apply_sized_partitions(spark, sf, True, False)


def t(tag, mk, force="toPandas"):
    getattr(mk(), force)()  # warm
    ts = []
    for _ in range(N_PASSES):
        t0 = time.perf_counter()
        getattr(mk(), force)()
        ts.append(round(time.perf_counter() - t0, 3))
    print(f"spark {tag}: {ts} min={min(ts)}", flush=True)


e = lambda: load_table(spark, sf, "events")
grp = lambda: (
    load_table(spark, sf, "events")
    .groupBy("event_type", F.window("ts", "1 hour").start.alias("window_start"))
)

t("scan count", lambda: e().groupBy().count())
t("scan project3 count", lambda: e().select("event_type", "ts", "value").groupBy().count())
t("group count-only", lambda: grp().agg(F.count(F.lit(1)).alias("n_events")))
t("group + double sum", lambda: grp().agg(
    F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value")))
t("group + long-micros sum", lambda: grp().agg(
    F.count(F.lit(1)).alias("n_events"),
    F.sum((F.col("value").cast("decimal(18,6)") * 1000000).cast("long")).alias("sum_micros")))
t("group + dsum (FULL)", lambda: grp().agg(
    F.count(F.lit(1)).alias("n_events"), dsum("value").alias("sum_value")))

# ---- DuckDB twins over the same replicated view ----
import bench  # noqa: E402

con = bench._duck_connect_replicated(sf, REP)


def d(tag, sql):
    con.sql(sql).df()  # warm
    ts = []
    for _ in range(N_PASSES):
        t0 = time.perf_counter()
        con.sql(sql).df()
        ts.append(round(time.perf_counter() - t0, 3))
    print(f"duck  {tag}: {ts} min={min(ts)}", flush=True)


PRE = "WITH events_us AS (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events)"
GRP = "event_type, time_bucket(INTERVAL '1 hour', ts) AS window_start"
d("scan count", f"{PRE} SELECT COUNT(*) FROM events_us")
d("group count-only", f"{PRE} SELECT {GRP}, COUNT(*) AS n FROM events_us GROUP BY 1, 2")
d("group + double sum", f"{PRE} SELECT {GRP}, COUNT(*) AS n, SUM(value) AS s FROM events_us GROUP BY 1, 2")
d("group + decimal sum (FULL)", f"{PRE} SELECT {GRP}, COUNT(*) AS n, CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS s FROM events_us GROUP BY 1, 2")
con.close()
