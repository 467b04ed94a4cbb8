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


def test_soak_flag_parsing_is_strict():
    """ADVICE r12: the soak tool's space-separated flag form must reject
    a trailing bare flag cleanly and must NOT treat unrelated flags
    (--sfoo) as --sf."""
    import pytest

    from tools import soak_sf1

    # simulate main()'s parse loop via the module-level helper semantics:
    # we can't call main() (it builds a session), so reproduce the
    # closure's contract through a tiny harness mirroring its use
    def parse(argv):
        names, sf_dir = None, None

        def _flag_value(i, a, flag):
            if a.startswith(flag + "="):
                return a.split("=", 1)[1]
            if a == flag:
                if i + 1 >= len(argv):
                    raise SystemExit(f"usage: {flag} requires a value operand")
                return argv[i + 1]
            return None

        for i, a in enumerate(argv):
            if (v := _flag_value(i, a, "--queries")) is not None:
                names = v.split(",")
            elif (v := _flag_value(i, a, "--sf")) is not None:
                sf_dir = v
        return names, sf_dir

    assert parse(["--sf=/x", "--queries=a,b"]) == (["a", "b"], "/x")
    assert parse(["--sf", "/y"]) == (None, "/y")
    # unrelated flag prefixed with --sf must not consume the next token
    assert parse(["--sfoo", "/z"]) == (None, None)
    with pytest.raises(SystemExit):
        parse(["--queries"])
    # and the real module must carry the strict form (no bare startswith)
    import inspect

    src = inspect.getsource(soak_sf1.main)
    assert 'startswith("--sf")' not in src and "startswith('--sf')" not in src


def test_stream_ab_subprocess_mode_contract():
    """bench.py's SPARK_GRAFT_STREAM_AB_ONLY mode must exist and the
    trigger threshold must match the documented 25k gate."""
    import inspect

    src = inspect.getsource(bench.main)
    assert "SPARK_GRAFT_STREAM_AB_ONLY" in src
    assert "25_000" in src
    assert callable(bench._streaming_steady_ab)


def test_dedup_crossover_budget_exhaustion_is_loud(spark, sf_dir, monkeypatch):
    """With the wall budget exhausted, the phase must NOT silently return
    partial totals: every cell is skipped, the marker names all of them,
    and the (empty) totals cover zero cells rather than a lucky prefix."""
    monkeypatch.setenv("SPARK_GRAFT_BENCH_BUDGET", "0")
    out = bench._dedup_crossover(spark, sf_dir, factor=2)
    assert sorted(out["skipped_for_budget"]) == sorted(bench.DEDUP_CROSSOVER)
    assert out["queries"] == {}
    assert out["spark_total_1x"] == 0
    assert os.environ.get("ENGINE_SCAN_REPLICATE") is None


def test_budget_left_env_override(monkeypatch):
    """_budget_left reads SPARK_GRAFT_BENCH_BUDGET (seconds since process
    start); an enormous budget must report plenty remaining, a zero budget
    must report none."""
    monkeypatch.setenv("SPARK_GRAFT_BENCH_BUDGET", "1000000")
    assert bench._budget_left() > 900_000
    monkeypatch.setenv("SPARK_GRAFT_BENCH_BUDGET", "0")
    assert bench._budget_left() <= 0


def test_dedup_crossover_order_is_cheapest_first():
    """Budget skips drop from the END of DEDUP_CROSSOVER — the tuple must
    keep the sub-second ANN cells ahead of the multi-second recursive /
    banded cells or a degraded run measures almost nothing."""
    assert bench.DEDUP_CROSSOVER.index("ivf_ann") < bench.DEDUP_CROSSOVER.index(
        "minhash_near_dup"
    )
    assert bench.DEDUP_CROSSOVER.index("pq_ann") < bench.DEDUP_CROSSOVER.index(
        "near_dup_clusters"
    )


def test_probe_100x_flag_parsing_is_strict():
    """The 100x probe tool follows the soak tool's strict-flag contract:
    exact flag matches only, clean usage errors for a trailing bare
    flag, unknown flags rejected instead of silently consumed."""
    import pytest

    from tools.probe_100x import DEFAULT_QUERIES, parse_args

    names, factor, sf = parse_args(["--queries", "a,b", "--factor", "50"])
    assert names == ["a", "b"] and factor == 50
    names, factor, sf = parse_args(["--factor=25", "--sf=/tmp/x"])
    assert list(names) == list(DEFAULT_QUERIES) and factor == 25 and sf == "/tmp/x"
    for bad in (["--factor"], ["--queries"], ["--sf"], ["--sfoo", "x"], ["stray"]):
        with pytest.raises(SystemExit):
            parse_args(bad)
