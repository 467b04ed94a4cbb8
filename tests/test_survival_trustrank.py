"""Crafted-input semantics for the round-15 session-2 operators:
Kaplan-Meier survival (``operators/survival.py``) and seeded TrustRank
(``operators/graph.py: trustrank_fixed_point``)."""

from __future__ import annotations

import datetime as dt

import pandas as pd
from pyspark.sql import functions as F

from finance_data_ingestion_pipeline_with_kafka_spark.operators.graph import (
    PR_SCALE,
    trustrank_fixed_point,
)
from finance_data_ingestion_pipeline_with_kafka_spark.operators.survival import (
    KM_HORIZON,
    km_curve,
    km_survival,
)

_EDGE_COLS = ["src", "dst", "w", "out_w"]


def _nodes(spark, names):
    return spark.createDataFrame([(n,) for n in names], ["source"])


def _trust(df) -> dict[str, int]:
    return {r["source"]: r["r"] for r in df.collect()}


# ------------------------------------------------------------- TrustRank


def test_trustrank_nonseeds_get_zero_without_inflow(spark):
    """No edges at all: teleport and dangling mass both re-enter at the
    seeds only, so non-seeds hold EXACTLY zero trust forever — the
    defining difference from uniform-teleport PageRank."""
    edges = spark.createDataFrame([], "src string, dst string, w long, out_w long")
    r = _trust(
        trustrank_fixed_point(
            _nodes(spark, ["a", "b", "c"]), edges, _nodes(spark, ["a"]), iters=3
        )
    )
    assert r["b"] == 0 and r["c"] == 0
    assert r["a"] > 0


def test_trustrank_one_hop_hand_computed(spark):
    """seed a → b, one iteration: a keeps only its teleport share
    (3·SCALE/20 = 150e9), b gets the damped full flow (17·SCALE/20 =
    850e9); mass conserved exactly on this graph."""
    edges = spark.createDataFrame([("a", "b", 1, 1)], _EDGE_COLS)
    r = _trust(
        trustrank_fixed_point(
            _nodes(spark, ["a", "b"]), edges, _nodes(spark, ["a"]), iters=1
        )
    )
    assert r["a"] == 150_000_000_000
    assert r["b"] == 850_000_000_000
    assert r["a"] + r["b"] == PR_SCALE


def test_trustrank_unreachable_component_stays_zero(spark):
    """b→c in a separate component from the seed: neither endpoint can
    ever accumulate trust (b has no in-flow, c's only in-flow is b's
    zero) — TrustRank's spam-demotion property."""
    edges = spark.createDataFrame([("b", "c", 1, 1)], _EDGE_COLS)
    r = _trust(
        trustrank_fixed_point(
            _nodes(spark, ["a", "b", "c"]), edges, _nodes(spark, ["a"]), iters=3
        )
    )
    assert r["b"] == 0 and r["c"] == 0


def test_trustrank_mass_conserved_on_fixture(spark, sf_dir):
    """Σ trust_fp ≤ SCALE with only integer-floor loss: per iteration
    each edge divide, node damping divide, and per-seed teleport /
    dangling divides truncate < 1 unit."""
    from finance_data_ingestion_pipeline_with_kafka_spark.operators.graph import (
        TR_ITERS,
        source_shingle_edges,
        trustrank_seeded,
    )
    from finance_data_ingestion_pipeline_with_kafka_spark.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    n_edges = source_shingle_edges(docs).count()
    n_nodes = docs.select("source").distinct().count()
    out = trustrank_seeded(spark, sf_dir)
    total = out.agg(F.sum("trust_fp")).collect()[0][0]
    n_seeds = out.filter("is_seed = 1").count()
    assert n_seeds > 0
    loss_bound = TR_ITERS * (n_edges + n_nodes + 2 * n_seeds + 4)
    assert PR_SCALE - loss_bound <= total <= PR_SCALE


# ---------------------------------------------------------- Kaplan-Meier


def _ev(spark, rows):
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type"]
    )
    return spark.createDataFrame(pdf)


def _t(day: int, hour: int = 0) -> dt.datetime:
    return dt.datetime(2024, 3, 1 + day, hour, 0, 0)


def test_km_hand_computed_curve(spark):
    """Three signups: u1 converts after 36h (step 1), u2 never converts
    (censored at the cutoff, 4 days out → step 4), u3 converts at the
    same timestamp via a later event_id (step 0). A pre-signup purchase
    must NOT count. Hand-computed risk sets and survival."""
    rows = [
        (1, _t(0), 1, "purchase"),   # BEFORE u1's signup: must not match
        (2, _t(0, 12), 1, "signup"),
        (3, _t(2), 1, "purchase"),   # 36h after → bucket 1
        (4, _t(0, 12), 2, "signup"),  # never converts → censored
        (5, _t(0, 12), 3, "signup"),
        (6, _t(0, 12), 3, "purchase"),  # same ts, later event_id → bucket 0
        (7, _t(4, 12), 9, "view"),   # sets the corpus cutoff
    ]
    out = km_curve(spark, _ev(spark, rows)).collect()
    by_step = {r["step"]: r for r in out}
    assert len(out) == KM_HORIZON
    # step 0: 3 at risk, u3 dies
    assert (by_step[0]["n_risk"], by_step[0]["n_death"], by_step[0]["n_censor"]) == (3, 1, 0)
    assert by_step[0]["survival"] == (3 - 1) / 3
    # step 1: u1 dies
    assert (by_step[1]["n_risk"], by_step[1]["n_death"], by_step[1]["n_censor"]) == (2, 1, 0)
    assert by_step[1]["survival"] == ((3 - 1) / 3) * ((2 - 1) / 2)
    # steps 2-3: only u2 at risk, nothing happens
    assert (by_step[2]["n_risk"], by_step[2]["n_death"], by_step[2]["n_censor"]) == (1, 0, 0)
    # step 4: u2 censored (cutoff - signup = 4 days exactly)
    assert (by_step[4]["n_risk"], by_step[4]["n_death"], by_step[4]["n_censor"]) == (1, 0, 1)
    # censoring does NOT move the curve
    assert by_step[4]["survival"] == by_step[1]["survival"]
    # empty risk set afterwards: curve flat, ratio guard holds
    assert (by_step[5]["n_risk"], by_step[5]["survival"]) == (
        0,
        by_step[4]["survival"],
    )


def test_km_fixture_matches_python_brute_force(spark, sf_dir):
    """Full-fixture cross-check against an independent pandas KM:
    identical integer counts and bit-identical survival (both sides are
    the same left-fold over the same doubles)."""
    import glob

    ev = pd.read_parquet(glob.glob(f"{sf_dir}/events.parquet")[0])
    ev = ev.sort_values(["user_id", "ts", "event_id"]).reset_index(drop=True)
    cutoff = ev["ts"].max()
    subjects = []
    for _, g in ev.groupby("user_id", sort=False):
        ts = g["ts"].to_numpy()
        types = g["event_type"].to_numpy()
        for i in range(len(g)):
            if types[i] != "signup":
                continue
            nxt = [j for j in range(i + 1, len(g)) if types[j] == "purchase"]
            if nxt:
                delta = ts[nxt[0]] - ts[i]
                subjects.append((int(delta / pd.Timedelta(days=1)), 1))
            else:
                delta = cutoff - ts[i]
                subjects.append((int(delta / pd.Timedelta(days=1)), 0))
    out = km_survival(spark, sf_dir).collect()
    n_total = len(subjects)
    surv = 1.0
    for r in out:
        t = r["step"]
        d = sum(1 for tb, died in subjects if tb == t and died)
        c = sum(1 for tb, died in subjects if tb == t and not died)
        n = n_total - sum(1 for tb, _ in subjects if tb < t)
        assert (r["n_risk"], r["n_death"], r["n_censor"]) == (n, d, c)
        if n > 0:
            surv = surv * ((n - d) / n)
        assert r["survival"] == surv  # bit-identical fold
