#!/usr/bin/env python
"""Limb-by-limb decomposition of pq_ann at REP× (default 10): where do
the seconds go under the honest (prepared=False) protocol, and does the
tiny-input static-partition policy strangle the posexplode×labels
fan-out? Each limb: warm + min-of-3 fresh plans.

Usage: REP=10 python tools/decompose_pq.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("ENGINE_LAKE_CACHE", "1")

from pyspark.sql import Window
from pyspark.sql import functions as F

from finance_data_ingestion_pipeline_with_kafka_spark.catalog import load_table
from finance_data_ingestion_pipeline_with_kafka_spark.functions.core import davg
from finance_data_ingestion_pipeline_with_kafka_spark.operators.similarity import (
    N_QUERY_VECS,
    PQ_SUB_DIM,
    PQ_SUBS,
    TOP_K,
)
from finance_data_ingestion_pipeline_with_kafka_spark.registry import (
    _apply_sized_partitions,
)
from finance_data_ingestion_pipeline_with_kafka_spark.session import get_spark

REP = int(os.environ.get("REP", "10"))
SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PARTS = os.environ.get("PARTS")  # override static partition count

spark = get_spark(app_name="decompose-pq")
spark.sparkContext.setLogLevel("ERROR")
os.environ["ENGINE_SCAN_REPLICATE"] = str(REP)
_apply_sized_partitions(spark, SF, True, False)
if PARTS:
    spark.conf.set("spark.sql.shuffle.partitions", PARTS)
print("shuffle.partitions =", spark.conf.get("spark.sql.shuffle.partitions"),
      "AQE =", spark.conf.get("spark.sql.adaptive.enabled"))


def t(tag, mk, force="toPandas"):
    getattr(mk(), force)()
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        getattr(mk(), force)()
        ts.append(round(time.perf_counter() - t0, 3))
    print(f"{tag}: {ts} min={min(ts)}", flush=True)


def dims():
    e = load_table(spark, SF, "embeddings")
    return e.select(
        "vec_id", "label", F.posexplode("embedding").alias("dim", "xf")
    ).select(
        "vec_id", "label", "dim",
        F.col("xf").cast("double").alias("x"),
        (F.col("dim") / PQ_SUB_DIM).cast("int").alias("sub"),
    )


def codebook():
    return dims().groupBy("sub", F.col("label").alias("cl"), "dim").agg(
        davg("x").alias("c")
    )


def dists():
    diff = F.col("x") - F.col("c")
    return (
        dims().join(F.broadcast(codebook()), ["sub", "dim"])
        .groupBy("vec_id", "sub", "cl")
        .agg(F.round(F.sum((diff * diff).cast("decimal(38,6)")).cast("double"), 6).alias("d6"))
    )


def full():
    d = dists()
    codes = d.groupBy("vec_id", "sub").agg(
        F.min_by("cl", F.struct("d6", "cl")).alias("cl"))
    lut = d.filter(F.col("vec_id") < N_QUERY_VECS).select(
        F.col("vec_id").alias("query_id"), "sub", "cl", "d6")
    adc = (
        codes.join(F.broadcast(lut), ["sub", "cl"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", "vec_id")
        .agg(F.sum(F.col("d6").cast("decimal(38,6)")).cast("double").alias("adc_dist"),
             F.count(F.lit(1)).alias("n_subs"))
        .filter(F.col("n_subs") == PQ_SUBS).drop("n_subs")
    )
    w = Window.partitionBy("query_id").orderBy("adc_dist", "vec_id")
    return (adc.select("query_id", "vec_id", "adc_dist", F.row_number().over(w).alias("rn"))
            .filter(F.col("rn") <= TOP_K).drop("rn"))


t("scan count", lambda: load_table(spark, SF, "embeddings").groupBy().count(), "collect")
t("dims count", lambda: dims().groupBy().count(), "collect")
t("codebook", codebook)
t("dists count", lambda: dists().groupBy().count(), "collect")
t("codes only", lambda: dists().groupBy("vec_id", "sub").agg(
    F.min_by("cl", F.struct("d6", "cl")).alias("cl")).groupBy().count(), "collect")
t("FULL (no share)", full)
