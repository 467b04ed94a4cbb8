"""Smoke tests for bench.py's measurement phases — the phases mutate
session-global confs and env vars, so a save/restore bug would silently
poison every phase that runs after them. These pin the contract at a
tiny scale factor (the real measurements run at sf0.1 inside bench.py).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def test_skew_crossover_restores_confs_and_reports(spark, sf_dir):
    keys = (
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.autoBroadcastJoinThreshold",
    )
    before = {k: spark.conf.get(k) for k in keys}
    out = bench._skew_crossover(spark, sf_dir, factor=2)
    for k in keys:
        assert spark.conf.get(k) == before[k], k
    assert os.environ.get("ENGINE_SCAN_REPLICATE") is None
    for key in (
        "factor",
        "hot_key_share",
        "n_salts",
        "plain_aqe_1x",
        "salted_1x",
        "plain_aqe_2x",
        "salted_2x",
        "salted_speedup_2x",
    ):
        assert key in out, key
    assert out["plain_aqe_1x"] > 0 and out["salted_2x"] > 0


def test_streaming_stateful_throughput_reports_rate(spark):
    rate = bench._streaming_stateful_throughput(spark, n_msgs=2_000)
    assert rate > 0
