"""Lake-layout tests: partition pruning and bucketed shuffle-free joins —
the two plan properties the 100 TB design depends on (SURVEY §4).
"""

import os

import pytest
from pyspark.sql import functions as F

from finance_data_ingestion_pipeline_with_kafka_spark.catalog import load_table
from finance_data_ingestion_pipeline_with_kafka_spark.plans import executed_plan
from finance_data_ingestion_pipeline_with_kafka_spark.sources.lake import (
    create_table_ddl,
    write_bucketed,
    write_partitioned,
)


def test_partition_pruning(spark, sf_dir, tmp_path):
    lake = str(tmp_path / "events_lake")
    events = load_table(spark, sf_dir, "events")
    write_partitioned(events, lake, ["event_type"])
    # hive-style directories exist
    assert any(d.startswith("event_type=") for d in os.listdir(lake))

    filtered = spark.read.parquet(lake).filter(F.col("event_type") == "click")
    p = executed_plan(filtered)
    assert "PartitionFilters" in p and "event_type" in p.split("PartitionFilters:")[1].split("]")[0]
    # pruned read returns exactly the partition's rows
    expected = events.filter(F.col("event_type") == "click").count()
    assert filtered.count() == expected


def test_bucketed_join_no_shuffle(spark, sf_dir, tmp_path):
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force non-broadcast
    try:
        orders = load_table(spark, sf_dir, "orders")
        lineitem = load_table(spark, sf_dir, "lineitem").withColumnRenamed(
            "l_orderkey", "o_orderkey"
        )
        write_bucketed(orders, "b_orders", "o_orderkey", 8, sort_col="o_orderkey")
        write_bucketed(lineitem, "b_lineitem", "o_orderkey", 8, sort_col="o_orderkey")
        joined = spark.table("b_orders").join(spark.table("b_lineitem"), "o_orderkey")
        p = executed_plan(joined)
        assert "Exchange" not in p, f"bucketed join still shuffles:\n{p[:1500]}"
        assert joined.count() == lineitem.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_create_table_ddl(spark, tmp_path):
    loc = str(tmp_path / "ddl_tbl")
    create_table_ddl(
        spark, "stock_data_ddl", "id STRING, datetime TIMESTAMP, close FLOAT, ticker STRING", loc
    )
    try:
        assert spark.catalog.tableExists("stock_data_ddl")
        # idempotent (IF NOT EXISTS — the reference's bootstrap contract)
        create_table_ddl(
            spark,
            "stock_data_ddl",
            "id STRING, datetime TIMESTAMP, close FLOAT, ticker STRING",
            loc,
        )
        cols = [f.name for f in spark.table("stock_data_ddl").schema.fields]
        assert cols == ["id", "datetime", "close", "ticker"]
    finally:
        spark.sql("DROP TABLE IF EXISTS stock_data_ddl")


def test_training_shards_balanced_and_deterministic(spark, sf_dir, tmp_path):
    from finance_data_ingestion_pipeline_with_kafka_spark.sources.lake import (
        write_training_shards,
    )

    docs = load_table(spark, sf_dir, "documents")
    out = str(tmp_path / "shards")
    write_training_shards(docs, out, n_shards=8, shard_key="doc_id")
    back = spark.read.parquet(out)
    assert back.count() == docs.count()
    sizes = {r["shard"]: r["count"] for r in back.groupBy("shard").count().collect()}
    assert len(sizes) == 8
    # hash-uniform: no shard more than 3x the smallest (tiny-sample slack)
    assert max(sizes.values()) <= 3 * min(sizes.values())
    # deterministic: same row -> same shard on rewrite
    out2 = str(tmp_path / "shards2")
    write_training_shards(docs, out2, n_shards=8, shard_key="doc_id")
    a = {r["doc_id"]: r["shard"] for r in back.select("doc_id", "shard").collect()}
    b = {
        r["doc_id"]: r["shard"]
        for r in spark.read.parquet(out2).select("doc_id", "shard").collect()
    }
    assert a == b


def test_compaction_reduces_files_preserves_rows(spark, sf_dir, tmp_path):
    from finance_data_ingestion_pipeline_with_kafka_spark.sources.lake import (
        compact_small_files,
    )

    out = str(tmp_path / "fragmented")
    orders = load_table(spark, sf_dir, "orders")
    orders.repartition(40).write.parquet(out)  # 40 tiny files
    n_before = len([f for f in os.listdir(out) if f.endswith(".parquet")])
    assert n_before == 40
    n_target = compact_small_files(spark, out)
    n_after = len([f for f in os.listdir(out) if f.endswith(".parquet")])
    assert n_after == n_target < n_before
    back = spark.read.parquet(out)
    assert back.count() == orders.count()
    assert sorted(back.columns) == sorted(orders.columns)


def test_replicate_shifted_matches_union_semantics(spark, sf_dir):
    """Generator-based replication (explode over a single scan branch)
    must produce exactly the multiset a rep-way key-shifted UNION ALL
    would: every row appears rep times, copy k with its surrogate keys
    shifted by k*KEY_SHIFT and all other columns untouched."""
    from finance_data_ingestion_pipeline_with_kafka_spark.catalog import (
        KEY_SHIFT,
        load_table,
    )

    rep = 3
    base = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    got = (
        load_table(spark, sf_dir, "orders", replicate=rep)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .toPandas()
        .sort_values(["o_orderkey", "o_custkey"])
        .reset_index(drop=True)
    )
    import pandas as pd

    b = base.toPandas()
    copies = []
    for k in range(rep):
        c = b.copy()
        c["o_orderkey"] = c["o_orderkey"] + k * KEY_SHIFT
        c["o_custkey"] = c["o_custkey"] + k * KEY_SHIFT
        copies.append(c)
    want = (
        pd.concat(copies)
        .sort_values(["o_orderkey", "o_custkey"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)


def test_replicate_keeps_single_scan_branch(spark, sf_dir):
    """The replicated plan must contain exactly ONE parquet scan of the
    table (generator replication), not N union branches — N branches
    means N decodes of the same bytes and N cold codegen stages."""
    from finance_data_ingestion_pipeline_with_kafka_spark.catalog import load_table

    df = load_table(spark, sf_dir, "lineitem", replicate=30).filter(
        "l_quantity > 0"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    # one lineitem scan + the tiny Range spine; never N union branches
    assert plan.count("Scan parquet") == 1, plan
    assert "Union" not in plan, plan
