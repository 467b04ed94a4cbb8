"""Physical-plan assertions (SURVEY §4; the 100 TB posture): predicates
and column pruning reach the parquet scan, small dims broadcast, grouped
aggregation is partial+final, and the hot path stays inside whole-stage
codegen. These guard against plan regressions the way golden tests guard
values.
"""

import pytest

from finance_data_ingestion_pipeline_with_kafka_spark.registry import load_all

CATALOG = load_all()


def plan(spark, sf_dir, name) -> str:
    df = CATALOG[name].fn(spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    p = plan(spark, sf_dir, "filter_project")
    assert "PushedFilters: [" in p
    assert "l_shipdate" in p.split("PushedFilters:")[1].split("]")[0]


def test_column_pruning(spark, sf_dir):
    p = plan(spark, sf_dir, "filter_project")
    read_schema = p.split("ReadSchema:")[1].splitlines()[0]
    # only the 6 referenced columns are read, not all 11
    assert "l_extendedprice" in read_schema and "l_returnflag" not in read_schema


def test_broadcast_join_strategy(spark, sf_dir):
    p = plan(spark, sf_dir, "broadcast_dim_join")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_partial_aggregation(spark, sf_dir):
    df = CATALOG["pricing_summary"].fn(spark, sf_dir)
    df.collect()  # resolve the AQE final plan so codegen annotations appear
    p = df._jdf.queryExecution().executedPlan().toString()
    # partial (map-side) + final hash aggregate — the shuffle carries
    # one row per (group × partition)
    assert "partial_sum" in p  # map-side combine before the shuffle
    assert p.count("HashAggregate") >= 2
    assert "*(" in p  # whole-stage codegen spans (toString marks them *(n))


def test_metadata_query_prunes_payload(spark, sf_dir):
    p = plan(spark, sf_dir, "multimodal_metadata")
    read_schema = p.split("ReadSchema:")[1].splitlines()[0]
    assert "text" in read_schema  # payload derives from text here
    # the point at lake scale: a true binary column would be absent; the
    # scan must not read lang/n_chars which the query never touches
    assert "lang" not in read_schema and "n_chars" not in read_schema


def test_semi_join_not_inner(spark, sf_dir):
    p = plan(spark, sf_dir, "semi_join")
    assert "LeftSemi" in p


def test_asof_join_single_shuffle(spark, sf_dir):
    # the union+last-non-null recipe must shuffle once on user_id, not
    # produce a range-join explosion (no nested-loop join in the plan)
    p = plan(spark, sf_dir, "asof_join")
    assert "BroadcastNestedLoopJoin" not in p and "CartesianProduct" not in p
