#!/usr/bin/env python
"""A/B rewrite variants for pq_ann / ivf_ann model-as-literal plumbing:
F.expr parse-tree literals (bloated plans) vs single F.lit Literal nodes
vs local-relation broadcast joins. min-of-5 fresh-plan passes per cell.

Usage: python tools/ab_ann2.py [--reps 1,10]
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
from finance_data_ingestion_pipeline_with_kafka_spark.operators import similarity as S
from finance_data_ingestion_pipeline_with_kafka_spark.registry import (
    _apply_sized_partitions,
)
from finance_data_ingestion_pipeline_with_kafka_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
reps = [1, 10]
for a in sys.argv[1:]:
    if a.startswith("--reps"):
        reps = [int(x) for x in a.split("=", 1)[1].split(",")]

spark = get_spark(app_name="ab-ann2")
spark.sparkContext.setLogLevel("ERROR")


def timed(tag, mk):
    mk().toPandas()
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        mk().toPandas()
        ts.append(time.perf_counter() - t0)
    print(f"{tag}: min={min(ts):.3f}", flush=True)


# ---------------- PQ variants ----------------
def pq_codebook_rows():
    return (
        S._pq_dims(spark, SF)
        .groupBy("sub", F.col("label").alias("cl"), "dim")
        .agg(davg("x").alias("c"))
        .collect()
    )


def pq_build(carr_source):
    """carr_source(dims) -> frame with columns of dims + 'carr' (array of
    |cls| centroid values for that row's dim) + returns (frame, cls)."""
    rows = pq_codebook_rows()
    cls = sorted({r["cl"] for r in rows})
    by_dim = {}
    for r in rows:
        by_dim.setdefault(r["dim"], {})[r["cl"]] = r["c"]
    d = carr_source(S._pq_dims(spark, SF), by_dim, cls)
    micros = [
        F.sum(
            F.floor(
                (F.col("x") - F.element_at(F.col("carr"), i + 1))
                * (F.col("x") - F.element_at(F.col("carr"), i + 1))
                * 1e6
                + 0.5
            ).cast("long")
        ).alias(f"u{i}")
        for i in range(len(cls))
    ]
    wide = d.groupBy("vec_id", "sub").agg(*micros)
    d6s = F.array(
        *[
            F.struct(
                F.round(F.col(f"u{i}").cast("double") / 1e6, 6).alias("d6"),
                F.lit(cl).alias("cl"),
            )
            for i, cl in enumerate(cls)
        ]
    )
    codes = wide.select("vec_id", "sub", F.array_min(d6s)["cl"].alias("cl"))
    lut = (
        wide.filter(F.col("vec_id") < S.N_QUERY_VECS)
        .select(F.col("vec_id").alias("query_id"), "sub", F.explode(d6s).alias("e"))
        .select("query_id", "sub", F.col("e")["cl"].alias("cl"), F.col("e")["d6"].alias("d6"))
    )
    adc = (
        codes.join(F.broadcast(lut), ["sub", "cl"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", "vec_id")
        .agg(
            (F.sum(F.floor(F.col("d6") * 1e6 + 0.5).cast("long")).cast("double") / 1e6).alias("adc_dist"),
            F.count(F.lit(1)).alias("n_subs"),
        )
        .filter(F.col("n_subs") == S.PQ_SUBS)
        .drop("n_subs")
    )
    w = Window.partitionBy("query_id").orderBy("adc_dist", "vec_id")
    return (
        adc.select("query_id", "vec_id", "adc_dist", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= S.TOP_K)
        .drop("rn")
    )


def src_lit(dims, by_dim, cls):
    cb = F.lit([[by_dim[d][cl] for cl in cls] for d in range(S.EMBED_DIM)])
    return dims.withColumn("carr", F.element_at(cb, (F.col("dim") + 1).cast("int")))


def src_join(dims, by_dim, cls):
    local = spark.createDataFrame(
        [(d, [by_dim[d][cl] for cl in cls]) for d in range(S.EMBED_DIM)],
        "dim int, carr array<double>",
    )
    return dims.join(F.broadcast(local), "dim")


# ---------------- IVF variants ----------------
def ivf_inputs():
    e = S.nonzero(
        load_table(spark, SF, "embeddings").select(
            "vec_id", "label", F.col("embedding").alias("v")
        )
    ).withColumn("norm", F.sqrt(S.dot("v", "v")))
    cents = S._collect_centroids(S.decimal_centroids(e, "label"))
    return e, cents


def ivf_full(assign_fn, probe_fn):
    e, cents = ivf_inputs()
    assigned = assign_fn(e, cents)
    q = e.filter(F.col("vec_id") < S.N_QUERY_VECS).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"), F.col("norm").alias("qnorm")
    )
    probes = F.broadcast(probe_fn(q, cents))
    scored = probes.join(assigned, "cell").filter(F.col("vec_id") != F.col("query_id")).select(
        "query_id", "vec_id", "label",
        F.round(S.dot("qv", "v") / (F.col("qnorm") * F.col("norm")), 6).alias("cosine_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), "vec_id")
    return (scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= S.TOP_K)
            .select("query_id", "vec_id", "label", "cosine_sim"))


def assign_dotlit(e, cents):
    return e.withColumn("cell", S._cell_elect(cents, "v", "norm")["cid"])


def assign_hof(e, cents):
    arr = F.lit([(r["cid"], list(r["cv"]), r["cnorm"]) for r in cents])
    elect = F.array_max(
        F.transform(
            arr,
            lambda c: F.struct(
                F.round(S.dot(F.col("v"), c["_2"]) / (F.col("norm") * c["_3"]), 9).alias("s"),
                (-c["_1"]).alias("tb"),
                c["_1"].alias("cid"),
            ),
        )
    )
    return e.withColumn("cell", elect["cid"])


def assign_join(e, cents):
    local = spark.createDataFrame(
        [(r["cid"], list(r["cv"]), r["cnorm"]) for r in cents],
        "cid int, cv array<double>, cnorm double",
    )
    csim = S.dot("v", "cv") / (F.col("norm") * F.col("cnorm"))
    return (
        e.join(F.broadcast(local))
        .select("vec_id", "label", "v", "norm", "cid", csim.alias("csim"))
        .groupBy("vec_id")
        .agg(
            F.max_by("cid", F.struct(F.round("csim", 9), (-F.col("cid")).alias("tb"))).alias("cell"),
            F.first("label").alias("label"),
            F.first("v").alias("v"),
            F.first("norm").alias("norm"),
        )
    )


def probe_dotlit(q, cents):
    return q.select(
        "query_id", "qv", "qnorm",
        F.explode(F.transform(S._probe_cells(cents, S.N_PROBE), lambda s: s["cid"])).alias("cell"),
    )


def probe_hof(q, cents):
    arr = F.lit([(r["cid"], list(r["cv"]), r["cnorm"]) for r in cents])
    sims = F.transform(
        arr,
        lambda c: F.struct(
            F.round(S.dot(F.col("qv"), c["_2"]) / (F.col("qnorm") * c["_3"]), 9).alias("s"),
            (-c["_1"]).alias("tb"),
            c["_1"].alias("cid"),
        ),
    )
    top = F.slice(F.reverse(F.array_sort(sims)), 1, S.N_PROBE)
    return q.select(
        "query_id", "qv", "qnorm",
        F.explode(F.transform(top, lambda s: s["cid"])).alias("cell"),
    )


for rep in reps:
    os.environ["ENGINE_SCAN_REPLICATE"] = str(rep)
    _apply_sized_partitions(spark, SF, True, False)
    timed(f"pq lit      rep={rep}", lambda: pq_build(src_lit))
    timed(f"pq join     rep={rep}", lambda: pq_build(src_join))
    timed(f"ivf dotlit  rep={rep}", lambda: ivf_full(assign_dotlit, probe_dotlit))
    timed(f"ivf hof     rep={rep}", lambda: ivf_full(assign_hof, probe_hof))
    timed(f"ivf join    rep={rep}", lambda: ivf_full(assign_join, probe_dotlit))
os.environ.pop("ENGINE_SCAN_REPLICATE", None)
