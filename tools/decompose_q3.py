#!/usr/bin/env python
"""Attribute top_revenue_orders' 30x cost to scan / join / agg limbs."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

from pyspark.sql import functions as F

from finance_data_ingestion_pipeline_with_kafka_spark.catalog import load_table
from finance_data_ingestion_pipeline_with_kafka_spark.functions.core import dsum
from finance_data_ingestion_pipeline_with_kafka_spark.session import get_spark

REP = int(os.environ.get("REP", "30"))
sf = os.environ["SPARK_GRAFT_SF_DIR"]
spark = get_spark(app_name="decompose-q3")


def t(tag, mk):
    mk().collect()  # warm
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        mk().collect()
        ts.append(round(time.perf_counter() - t0, 3))
    print(f"{tag}: {ts} min={min(ts)}", flush=True)


os.environ["ENGINE_SCAN_REPLICATE"] = str(REP)

l = lambda: load_table(spark, sf, "lineitem", replicate=REP)
o = lambda: load_table(spark, sf, "orders", replicate=REP)
c = lambda: load_table(spark, sf, "customer", replicate=REP)

t("scan lineitem count", lambda: l().filter(F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp")).groupBy().count())
t("scan orders count", lambda: o().filter(F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")).groupBy().count())

def join_only():
    cc = F.broadcast(c().filter(F.col("c_mktsegment") == "BUILDING"))
    oo = o().filter(F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp"))
    ll = l().filter(F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp"))
    return cc.join(oo, cc["c_custkey"] == oo["o_custkey"]).join(
        ll, ll["l_orderkey"] == oo["o_orderkey"]).groupBy().count()

t("join only (count)", join_only)

def agg_double():
    cc = F.broadcast(c().filter(F.col("c_mktsegment") == "BUILDING"))
    oo = o().filter(F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp"))
    ll = l().filter(F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp"))
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (cc.join(oo, cc["c_custkey"] == oo["o_custkey"])
            .join(ll, ll["l_orderkey"] == oo["o_orderkey"])
            .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
            .agg(F.sum(rev).alias("revenue"))
            .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey").limit(10))

t("full with double sum", agg_double)

def agg_dsum():
    cc = F.broadcast(c().filter(F.col("c_mktsegment") == "BUILDING"))
    oo = o().filter(F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp"))
    ll = l().filter(F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp"))
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (cc.join(oo, cc["c_custkey"] == oo["o_custkey"])
            .join(ll, ll["l_orderkey"] == oo["o_orderkey"])
            .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
            .agg(dsum(rev).alias("revenue"))
            .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey").limit(10))

t("full with dsum", agg_dsum)

def agg_dsum_nobc():
    cc = c().filter(F.col("c_mktsegment") == "BUILDING")
    oo = o().filter(F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp"))
    ll = l().filter(F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp"))
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (cc.join(oo, cc["c_custkey"] == oo["o_custkey"])
            .join(ll, ll["l_orderkey"] == oo["o_orderkey"])
            .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
            .agg(dsum(rev).alias("revenue"))
            .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey").limit(10))

t("full dsum no-explicit-broadcast", agg_dsum_nobc)
