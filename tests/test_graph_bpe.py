"""Crafted-input semantics for the round-15 operators: fixed-point
PageRank (``operators/graph.py``) and the trained-BPE merge learner
(``operators/bpe.py``)."""

from __future__ import annotations

from pyspark.sql import functions as F

from finance_data_ingestion_pipeline_with_kafka_spark.operators.bpe import (
    SEP,
    _apply_merge,
    _vocab,
    train_merges,
)
from finance_data_ingestion_pipeline_with_kafka_spark.operators.graph import (
    PR_ITERS,
    PR_SCALE,
    domain_pagerank,
    pagerank_fixed_point,
    source_shingle_edges,
)

_EDGE_COLS = ["src", "dst", "w", "out_w"]


def _nodes(spark, names):
    return spark.createDataFrame([(n,) for n in names], ["source"])


def _ranks(df) -> dict[str, int]:
    return {r["source"]: r["r"] for r in df.collect()}


def test_pagerank_two_node_cycle_is_uniform(spark):
    """A symmetric 2-cycle is the power method's fixed point: both ranks
    stay at exactly SCALE/2 through every iteration (no floor loss on
    this graph — checks the teleport/damping arithmetic end to end)."""
    edges = spark.createDataFrame(
        [("a", "b", 1, 1), ("b", "a", 1, 1)], _EDGE_COLS
    )
    r = _ranks(pagerank_fixed_point(_nodes(spark, ["a", "b"]), edges, iters=3))
    assert r == {"a": PR_SCALE // 2, "b": PR_SCALE // 2}


def test_pagerank_star_center_ranks_highest(spark):
    """Spokes pointing at a center: center outranks every spoke, spokes
    are symmetric and exactly equal."""
    spokes = ["s1", "s2", "s3"]
    rows = [(s, "c", 1, 1) for s in spokes] + [("c", s, 1, 3) for s in spokes]
    edges = spark.createDataFrame(rows, _EDGE_COLS)
    r = _ranks(pagerank_fixed_point(_nodes(spark, ["c"] + spokes), edges, iters=3))
    assert r["c"] > r["s1"]
    assert r["s1"] == r["s2"] == r["s3"]


def test_pagerank_dangling_mass_redistributed_exactly(spark):
    """a→b with b dangling: hand-computed one-iteration values. b's mass
    teleports uniformly (explicit dangling handling), so total mass is
    conserved exactly on this graph."""
    edges = spark.createDataFrame([("a", "b", 1, 1)], _EDGE_COLS)
    r = _ranks(pagerank_fixed_point(_nodes(spark, ["a", "b"]), edges, iters=1))
    # base = ((3e12 div 20) div 2) = 75e9; dang share = (5e11 div 2)
    assert r["a"] == 75_000_000_000 + (17 * 250_000_000_000) // 20
    assert r["b"] == 75_000_000_000 + (17 * 750_000_000_000) // 20
    assert r["a"] + r["b"] == PR_SCALE


def test_pagerank_mass_conserved_on_fixture(spark, sf_dir):
    """Σ rank_fp drifts below PR_SCALE only by integer-floor loss:
    bounded by iters · (edges + 2·nodes + 2) fixed-point units."""
    from finance_data_ingestion_pipeline_with_kafka_spark.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    n_edges = source_shingle_edges(docs).count()
    n_nodes = docs.select("source").distinct().count()
    total = domain_pagerank(spark, sf_dir).agg(F.sum("rank_fp")).collect()[0][0]
    loss_bound = PR_ITERS * (n_edges + 2 * n_nodes + 2)
    assert PR_SCALE - loss_bound <= total <= PR_SCALE


def test_pagerank_iterates_toward_fixed_point(spark, sf_dir):
    """L1 distance between successive iterates contracts (damping 0.85
    makes the Google matrix an L1 contraction)."""
    from finance_data_ingestion_pipeline_with_kafka_spark.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    edges = source_shingle_edges(docs).localCheckpoint(eager=True)
    nodes = docs.select("source").distinct().localCheckpoint(eager=True)
    rs = [_ranks(pagerank_fixed_point(nodes, edges, iters=k)) for k in (1, 2, 3)]
    d12 = sum(abs(rs[1][s] - rs[0][s]) for s in rs[0])
    d23 = sum(abs(rs[2][s] - rs[1][s]) for s in rs[1])
    assert d23 < d12


def test_harmonic_centrality_path_graph_hand_computed(spark):
    """Path a→b→c→d: H6(d) = 6/1 + 6/2 + 6/3 = 11; upstream nodes get
    0/6/9 — pins the hop expansion, the exact-integer lanes, and that
    unreachable pairs contribute nothing."""
    from finance_data_ingestion_pipeline_with_kafka_spark.operators.graph import (
        HC_LCM,
        khop_distances,
    )

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d")], ["src", "dst"]
    )
    pairs = khop_distances(edges, max_hops=3)
    h = {
        r["dst"]: r["h6"]
        for r in pairs.groupBy("dst")
        .agg(F.sum(F.expr(f"{HC_LCM} div d")).alias("h6"))
        .collect()
    }
    assert h == {"b": 6, "c": 9, "d": 11}


def test_khop_keeps_shortest_distance_only(spark):
    """Diamond with a direct chord a→d: d(a,d) must be 1, not 2/3 —
    the per-hop anti-join implements BFS min-distance semantics."""
    from finance_data_ingestion_pipeline_with_kafka_spark.operators.graph import (
        khop_distances,
    )

    edges = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "d"), ("c", "d"), ("a", "d")],
        ["src", "dst"],
    )
    d = {
        (r["src"], r["dst"]): r["d"]
        for r in khop_distances(edges, max_hops=3).collect()
    }
    assert d[("a", "d")] == 1
    assert d[("a", "b")] == 1 and d[("b", "d")] == 1
    assert ("a", "a") not in d


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t, "en", f"src{i}", len(t)) for i, t in enumerate(texts)],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )


def test_bpe_learns_hand_computed_merges(spark):
    """Corpus 'abab abab cd': pair (a,b) appears 4× (2 per 'abab' × freq
    2... the word is distinct so freq=2 via two docs), beats (b,a) 2×
    and (c,d) 1×; after merging, (ab,ab) leads. Pins counting, the
    freq-weighting, and the tie-break order end to end."""
    docs = _docs(spark, ["abab cd", "abab"])
    bests = train_merges(docs, k=2)
    m1 = bests[0].collect()[0]
    assert (m1["l"], m1["r"], m1["cnt"]) == ("a", "b", 4)
    m2 = bests[1].collect()[0]
    assert (m2["l"], m2["r"], m2["cnt"]) == ("ab", "ab", 2)


def test_bpe_merge_pass_is_greedy_nonoverlapping(spark):
    """'aaaa' under merge (a,a) must become [aa, aa] — the leftmost
    non-overlapping semantics of reference BPE (an overlapping count
    would leave [aa, a, a] or merge greedily into 'aaa')."""
    docs = _docs(spark, ["aaaa"])
    bests = train_merges(docs, k=2)
    m1 = bests[0].collect()[0]
    assert (m1["l"], m1["r"], m1["cnt"]) == ("a", "a", 3)
    m2 = bests[1].collect()[0]
    # after one pass: symbols [aa, aa] → only pair left is (aa, aa)
    assert (m2["l"], m2["r"], m2["cnt"]) == ("aa", "aa", 1)


def test_bpe_apply_token_count_hand_checked(spark):
    """Applying the two learned merges to 'abab abab cd' tokenizes to
    [abab][abab][c,d] → 4 tokens over 3 words."""
    docs = _docs(spark, ["abab abab cd"])
    bests = train_merges(docs, k=2)
    words = F.split(F.trim(F.col("text")), r"\s+")
    out = docs.select(
        "doc_id",
        F.size(words).cast("long").alias("n_words"),
        F.array_join(
            F.transform(words, lambda w: F.regexp_replace(w, "(.)", f"{SEP}$1{SEP}")),
            "|",
        ).alias("s"),
    )
    for b in bests:
        out = _apply_merge(out, b)
    n_dseps = F.length("s") - F.length(
        F.replace(F.col("s"), F.lit(SEP + SEP), F.lit(SEP))
    )
    row = out.select(
        "n_words", (F.col("n_words") + n_dseps).alias("n_tokens")
    ).collect()[0]
    assert (row["n_words"], row["n_tokens"]) == (3, 4)


def test_random_documents_oracle_exactness(spark, sf_dir, tmp_path):
    """Driver-style exact compare for the graph/BPE kernels over seeded
    random documents corpora with adversarial shapes: (a) plain random
    text, (b) heavy shared boilerplate — every source shares one
    sentence, so the df-cap must drop it or the pair join explodes, (c)
    per-source disjoint vocabularies — the edge set is EMPTY and every
    node is dangling (pure-teleport PageRank, all-zero harmonic), (d)
    docs below the shingle length mixed in everywhere. The testdata
    regenerates between rounds, so data-dependent divergence is the
    residual risk this sweep guards."""
    import shutil

    import numpy as np
    import pandas as pd

    from finance_data_ingestion_pipeline_with_kafka_spark.catalog import TABLES
    from finance_data_ingestion_pipeline_with_kafka_spark.registry import load_all

    from .oracle_utils import run_and_compare

    cat = load_all()
    names = (
        "domain_pagerank",
        "harmonic_centrality",
        "bpe_train_merges",
        "bpe_apply_tokenize",
        "trustrank_seeded",
        "triangle_clustering",
        "label_propagation",
        "centrality_agreement",
    )
    letters = list("abcdef")
    for seed in range(3):
        rng = np.random.default_rng(seed)
        n_docs, n_src = 40, 5
        boiler = "alpha beta gamma delta epsilon zeta eta theta"
        rows = []
        for i in range(n_docs):
            src = f"s{i % n_src}"
            if seed == 2:  # disjoint vocab per source: zero shared shingles
                vocab = [f"{src}w{j}" for j in range(8)]
            else:
                vocab = [
                    "".join(rng.choice(letters, size=int(rng.integers(2, 6))))
                    for _ in range(10)
                ]
            n_words = int(rng.integers(1, 14))  # some below PR_SHINGLE_N
            text = " ".join(rng.choice(vocab, size=n_words))
            if seed == 1 and i % 2 == 0:  # shared boilerplate across sources
                text = boiler + " " + text
            # s0 is all-zh → a guaranteed NON-seed source for trustrank
            # (the others are all-en majority seeds): both branches of
            # the seed predicate run in every corpus
            lang = "zh" if src == "s0" else "en"
            rows.append((i, text, lang, src, len(text)))
        pdf = pd.DataFrame(
            rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
        )
        d = tmp_path / f"corpus{seed}"
        d.mkdir()
        pdf.to_parquet(d / "documents.parquet", index=False)
        for t in TABLES:
            if t != "documents":
                shutil.copy(f"{sf_dir}/{t}.parquet", d / f"{t}.parquet")
        for name in names:
            run_and_compare(spark, str(d), name, cat[name].fn, cat[name].oracle)


def test_bpe_vocab_is_distinct_words_with_freq(spark):
    """The trainer's working set is vocabulary-sized: repeated words
    collapse to one row carrying the corpus frequency."""
    docs = _docs(spark, ["x y x", "x"])
    rows = {
        r["s"]: r["freq"] for r in _vocab(docs).collect()
    }
    assert rows == {f"{SEP}x{SEP}": 3, f"{SEP}y{SEP}": 1}
