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


# ------------------------------------------------------- triangles / LCC


def _und(spark, pairs):
    return spark.createDataFrame(pairs, ["a", "b"])


def _lcc(df):
    return {
        r["source"]: (r["degree"], r["n_triangles"], r["clustering"])
        for r in df.collect()
    }


def test_triangle_hand_computed(spark):
    """Triangle a-b-c plus pendant d on c: per-node triangle counts and
    exact LCC values (c has degree 3, one closed wedge of three)."""
    from finance_data_ingestion_pipeline_with_kafka_spark.operators.graph import (
        clustering_from_edges,
    )

    out = _lcc(
        clustering_from_edges(
            _nodes(spark, ["a", "b", "c", "d", "iso"]),
            _und(spark, [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d")]),
        )
    )
    assert out["a"] == (2, 1, 1.0)
    assert out["b"] == (2, 1, 1.0)
    assert out["c"] == (3, 1, 1 / 3)
    assert out["d"] == (1, 0, 0.0)
    assert out["iso"] == (0, 0, 0.0)


def test_triangles_sharing_an_edge(spark):
    """Two triangles sharing edge a-b: a and b corner both, c and d one
    each — the wedge-orientation must not double- or under-count."""
    from finance_data_ingestion_pipeline_with_kafka_spark.operators.graph import (
        clustering_from_edges,
    )

    out = _lcc(
        clustering_from_edges(
            _nodes(spark, ["a", "b", "c", "d"]),
            _und(
                spark,
                [("a", "b"), ("a", "c"), ("b", "c"), ("a", "d"), ("b", "d")],
            ),
        )
    )
    assert out["a"] == (3, 2, 2 / 3)
    assert out["b"] == (3, 2, 2 / 3)
    assert out["c"] == (2, 1, 1.0)
    assert out["d"] == (2, 1, 1.0)


def test_k4_counts_every_triangle(spark):
    """K4: every vertex corners C(3,2)=3 triangles, LCC exactly 1 —
    the complete-graph identity catches orientation tie-break bugs
    (all degrees equal, so ordering falls through to the name)."""
    from itertools import combinations

    from finance_data_ingestion_pipeline_with_kafka_spark.operators.graph import (
        clustering_from_edges,
    )

    vs = ["a", "b", "c", "d"]
    out = _lcc(
        clustering_from_edges(
            _nodes(spark, vs), _und(spark, list(combinations(vs, 2)))
        )
    )
    for v in vs:
        assert out[v] == (3, 3, 1.0)


def test_triangle_fixture_corner_sum_is_three_per_triangle(spark, sf_dir):
    """Σ per-node triangle counts ≡ 0 (mod 3) on the fixture, and the
    registered query agrees with a brute-force python triangle count
    over the same edge set."""
    from itertools import combinations

    from finance_data_ingestion_pipeline_with_kafka_spark.catalog import load_table
    from finance_data_ingestion_pipeline_with_kafka_spark.operators.graph import (
        source_shingle_edges,
        triangle_clustering,
    )

    docs = load_table(spark, sf_dir, "documents")
    pairs = {
        tuple(sorted((r["src"], r["dst"])))
        for r in source_shingle_edges(docs).select("src", "dst").collect()
    }
    adj: dict[str, set[str]] = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    brute = {
        v: sum(
            1
            for x, y in combinations(sorted(ns), 2)
            if y in adj.get(x, ())
        )
        for v, ns in adj.items()
    }
    out = triangle_clustering(spark, sf_dir).collect()
    total = 0
    for r in out:
        assert r["n_triangles"] == brute.get(r["source"], 0), r["source"]
        total += r["n_triangles"]
    assert total % 3 == 0


# ------------------------------------------------------------ attribution


def _attr_ev(spark, rows):
    pdf = pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    return spark.createDataFrame(pdf)


def _h(hours: float) -> dt.datetime:
    return dt.datetime(2024, 5, 10, 0, 0, 0) + dt.timedelta(hours=hours)


def test_attribution_hand_computed_models(spark):
    """u1: ch0 @ t-10h, ch1 @ t-5h, ch0 @ t-2h → $10 purchase at t.
    first = ch0 (earliest), last = ch0 (latest), linear = 2/3 vs 1/3
    with the documented floor (6.666666 + 3.333333). u2's only click is
    outside the 72h lookback and u3's click is AFTER the purchase —
    both purchases land in 'direct' under every model."""
    from finance_data_ingestion_pipeline_with_kafka_spark.operators.attribution import (
        attribution_report,
    )

    t = 100.0  # purchase hour offset
    rows = [
        (1, _h(t - 10), 1, "click", 1.0, '{"k": 0}'),   # ch0
        (2, _h(t - 5), 1, "click", 1.0, '{"k": 1}'),    # ch1
        (3, _h(t - 2), 1, "click", 1.0, '{"k": 5}'),    # 5 % 5 -> ch0
        (4, _h(t), 1, "purchase", 10.0, "{}"),
        (5, _h(t - 80), 2, "click", 1.0, '{"k": 2}'),   # outside lookback
        (6, _h(t), 2, "purchase", 7.0, "{}"),
        (7, _h(t + 1), 3, "click", 1.0, '{"k": 3}'),    # after purchase
        (8, _h(t), 3, "purchase", 5.0, "{}"),
    ]
    out = {
        r["channel"]: r
        for r in attribution_report(_attr_ev(spark, rows)).collect()
    }
    ch0, ch1, direct = out["ch0"], out["ch1"], out["direct"]
    assert (ch0["n_touches"], ch0["n_first"], ch0["n_last"]) == (2, 1, 1)
    assert ch0["first_revenue"] == 10.0 and ch0["last_revenue"] == 10.0
    assert ch0["linear_revenue"] == 6666666 / 1e6
    assert (ch1["n_touches"], ch1["n_first"], ch1["n_last"]) == (1, 0, 0)
    assert ch1["linear_revenue"] == 3333333 / 1e6
    assert (direct["n_first"], direct["first_revenue"]) == (2, 12.0)
    assert direct["last_revenue"] == 12.0 and direct["linear_revenue"] == 12.0
    assert "ch2" not in out and "ch3" not in out


def test_attribution_same_timestamp_tiebreak(spark):
    """A click sharing the purchase's exact timestamp counts iff its
    event_id is smaller — the (ts, event_id) strict total order."""
    from finance_data_ingestion_pipeline_with_kafka_spark.operators.attribution import (
        attribution_report,
    )

    rows = [
        (1, _h(0), 1, "click", 1.0, '{"k": 0}'),   # same ts, id 1 < 2: counts
        (2, _h(0), 1, "purchase", 4.0, "{}"),
        (9, _h(0), 2, "click", 1.0, '{"k": 1}'),   # same ts, id 9 > 3: excluded
        (3, _h(0), 2, "purchase", 6.0, "{}"),
    ]
    out = {
        r["channel"]: r
        for r in attribution_report(_attr_ev(spark, rows)).collect()
    }
    assert out["ch0"]["first_revenue"] == 4.0
    assert out["direct"]["first_revenue"] == 6.0
    assert "ch1" not in out


def test_attribution_conservation(spark, sf_dir):
    """Every model's total credited revenue equals total purchase micros
    (linear up to the documented < n-micro floor undershoot per
    purchase) and Σ n_first = Σ n_last = number of purchases."""
    from finance_data_ingestion_pipeline_with_kafka_spark.catalog import load_table
    from finance_data_ingestion_pipeline_with_kafka_spark.functions.core import (
        snap_scaled,
    )
    from finance_data_ingestion_pipeline_with_kafka_spark.operators.attribution import (
        touch_attribution,
    )

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter("event_type = 'purchase'")
    n_p = purchases.count()
    total = (
        purchases.select(snap_scaled("value").cast("long").alias("m"))
        .agg(F.sum("m"))
        .collect()[0][0]
    )
    rows = touch_attribution(spark, sf_dir).collect()
    first = round(sum(r["first_revenue"] for r in rows) * 1e6)
    last = round(sum(r["last_revenue"] for r in rows) * 1e6)
    linear = round(sum(r["linear_revenue"] for r in rows) * 1e6)
    assert first == total
    assert last == total
    assert total - n_p * 10 <= linear <= total
    assert sum(r["n_first"] for r in rows) == n_p
    assert sum(r["n_last"] for r in rows) == n_p


def test_trustrank_with_all_seeds_is_pagerank(spark):
    """Seeds = every node collapses TrustRank to plain PageRank (uniform
    teleport, uniform dangling redistribution) — bit-identical fixed-
    point ranks on an arbitrary small graph. This is the identity the
    `centrality_agreement` metric reads as rho == 1."""
    from finance_data_ingestion_pipeline_with_kafka_spark.operators.graph import (
        pagerank_fixed_point,
    )

    edges = spark.createDataFrame(
        [("a", "b", 2, 3), ("a", "c", 1, 3), ("b", "a", 1, 1)], _EDGE_COLS
    )
    nodes = _nodes(spark, ["a", "b", "c"])
    pr = {r["source"]: r["r"] for r in pagerank_fixed_point(nodes, edges, 3).collect()}
    tr = _trust(trustrank_fixed_point(nodes, edges, nodes, iters=3))
    assert pr == tr


def test_centrality_agreement_ranks_are_permutations(spark, sf_dir):
    """Each rho lies in [-1, 1]; n_nodes equals the source count; the
    self-consistency bound sum_d2 <= (n^3 - n) / 3 (the reversed
    permutation's maximum) holds for every pair."""
    from finance_data_ingestion_pipeline_with_kafka_spark.operators.graph import (
        centrality_agreement,
    )

    rows = centrality_agreement(spark, sf_dir).collect()
    assert len(rows) == 3
    n = rows[0]["n_nodes"]
    for r in rows:
        assert r["n_nodes"] == n
        assert -1.0 <= r["spearman_rho"] <= 1.0
        assert 0 <= r["sum_d2"] <= (n ** 3 - n) // 3
        assert 0 <= r["topk_common"] <= 5


# ------------------------------------------------------- label propagation


def test_lpa_two_cliques_with_bridge_split(spark):
    """Two 3-cliques joined by one bridge edge: synchronous LPA with the
    (count DESC, label ASC) tie-break must put each clique in its own
    community and leave the isolated node alone — the bridge is never
    enough votes to merge them."""
    from finance_data_ingestion_pipeline_with_kafka_spark.operators.graph import (
        label_propagation_fixed,
    )

    und = [("a", "b"), ("a", "c"), ("b", "c"), ("d", "e"), ("d", "f"),
           ("e", "f"), ("c", "d")]
    pairs = und + [(y, x) for x, y in und]
    edges = spark.createDataFrame(pairs, ["src", "dst"])
    nodes = _nodes(spark, ["a", "b", "c", "d", "e", "f", "iso"])
    lab = {
        r["source"]: r["label"]
        for r in label_propagation_fixed(nodes, edges, 3).collect()
    }
    assert lab["a"] == lab["b"] == lab["c"]
    assert lab["d"] == lab["e"] == lab["f"]
    assert lab["a"] != lab["d"]
    assert lab["iso"] == "iso"


def test_lpa_star_converges_to_center_label_or_spoke_min(spark):
    """Star: spokes see only the center, so after round 1 every spoke
    holds the center's label; the center sees unanimous spokes. The
    exact fixed point is hand-computable: sync updates oscillate the
    center between the min spoke label and its own, while spokes settle
    on 'c' after round 2 (c's round-1 label was the min spoke 's1')."""
    from finance_data_ingestion_pipeline_with_kafka_spark.operators.graph import (
        label_propagation_fixed,
    )

    spokes = ["s1", "s2", "s3"]
    pairs = [("c", s) for s in spokes] + [(s, "c") for s in spokes]
    edges = spark.createDataFrame(pairs, ["src", "dst"])
    nodes = _nodes(spark, ["c"] + spokes)
    lab = {
        r["source"]: r["label"]
        for r in label_propagation_fixed(nodes, edges, 3).collect()
    }
    # round 1: spokes -> 'c', center -> 's1'; round 2: spokes -> 's1',
    # center -> 'c'; round 3: spokes -> 'c', center -> 's1'
    assert lab == {"c": "s1", "s1": "c", "s2": "c", "s3": "c"}


# --------------------------------------------------------------- bootstrap


def test_bootstrap_ci_brackets_the_point_mean(spark, sf_dir):
    """The ~94% percentile interval must bracket the exact point mean on
    every event type (deterministic hashes → this is a fixed property
    of the fixture, not a flaky statistical assertion), with
    ci_lo <= ci_hi and the full B=32 resamples present."""
    from finance_data_ingestion_pipeline_with_kafka_spark.operators.bootstrap import (
        BOOT_B,
        bootstrap_ci,
    )

    rows = bootstrap_ci(spark, sf_dir).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["n_res"] == BOOT_B
        assert r["ci_lo"] <= r["mean_value"] <= r["ci_hi"], r
        assert r["ci_hi"] - r["ci_lo"] < r["mean_value"]  # sane width


def test_bootstrap_weights_average_to_one(spark, sf_dir):
    """The hash-Poisson weight table must actually BE Poisson(1)-shaped:
    across all (row, b) draws the mean weight sits at 1 within 1% and
    weight 0 is drawn ~e^-1 of the time (deterministic fixture: exact
    reproducible numbers, generous bounds)."""
    from finance_data_ingestion_pipeline_with_kafka_spark.catalog import load_table
    from finance_data_ingestion_pipeline_with_kafka_spark.operators.bootstrap import (
        BOOT_B,
        _weight_case_sql,
    )

    ev = load_table(spark, sf_dir, "events").select("event_id")
    u = (
        "substring(md5(concat(CAST(event_id AS STRING), ':',"
        " CAST(b AS STRING))), 1, 15)"
    )
    w = ev.select(
        "event_id", F.explode(F.sequence(F.lit(0), F.lit(BOOT_B - 1))).alias("b")
    ).selectExpr(f"{_weight_case_sql(u)} AS wt")
    agg = w.agg(
        F.avg("wt").alias("m"),
        F.avg(F.when(F.col("wt") == 0, 1.0).otherwise(0.0)).alias("p0"),
    ).collect()[0]
    assert abs(agg["m"] - 1.0) < 0.01
    assert abs(agg["p0"] - 0.3679) < 0.01


def test_bootstrap_thresholds_match_generator():
    """The pinned Poisson(1)-CDF hex literals must equal what the
    documented generator produces on this platform (guards accidental
    edits of the spec constants)."""
    from finance_data_ingestion_pipeline_with_kafka_spark.operators.bootstrap import (
        _THRESH,
        _poisson1_hex_thresholds,
    )

    assert _THRESH == _poisson1_hex_thresholds()
    assert all(len(t) == 15 for t in _THRESH)
    assert _THRESH == sorted(_THRESH)


# ---------------------------------------------------------------- log-rank


def test_logrank_consistent_with_km_and_aa_bounded(spark, sf_dir):
    """The two-group table must partition km_survival's: n_a+n_b and
    d_a+d_b equal the single-curve risk/death counts at every step;
    cum_v is nondecreasing; and the A/A hash split keeps |z| well inside
    ±2 at every step (deterministic fixture → fixed numbers, generous
    bound). The cumulative fold re-derives from the per-step columns
    bit-exactly."""
    import math

    from finance_data_ingestion_pipeline_with_kafka_spark.operators.logrank import (
        km_logrank,
    )

    km = {r["step"]: r for r in km_survival(spark, sf_dir).collect()}
    rows = km_logrank(spark, sf_dir).collect()
    assert len(rows) == KM_HORIZON
    prev_v = 0.0
    oe = 0.0
    v = 0.0
    for r in sorted(rows, key=lambda r: r["step"]):
        k = km[r["step"]]
        assert r["n_a"] + r["n_b"] == k["n_risk"]
        assert r["d_a"] + r["d_b"] == k["n_death"]
        assert r["cum_v"] >= prev_v
        prev_v = r["cum_v"]
        if r["z"] is not None:
            assert abs(r["z"]) < 2.0
        n = r["n_a"] + r["n_b"]
        d = r["d_a"] + r["d_b"]
        e_t = (float(r["n_a"]) * float(d)) / float(n) if n > 0 else 0.0
        v_t = (
            (((float(r["n_a"]) * float(r["n_b"])) * float(d)) * float(n - d))
            / ((float(n) * float(n)) * float(n - 1))
            if n > 1
            else 0.0
        )
        oe = oe + (float(r["d_a"]) - e_t)
        v = v + v_t
        assert r["cum_oe"] == oe  # bit-identical left fold
        assert r["cum_v"] == v
        if v > 0:
            assert r["z"] == oe / math.sqrt(v)
