"""Link-graph quality ranking over the document corpus (SURVEY §2.10 U6;
the Common-Crawl-style domain-weighting signal — VERDICT r14 ask #5).

A 100 TB curation pipeline ranks *domains* (not pages): the page corpus
is huge but the domain graph is millions of nodes, so the scalable shape
is (a) a corpus-linear edge-extraction pass and (b) a fixed number of
power-method iterations over the small(er) graph — each iteration one
shuffle-join on the source key plus one grouped sum, no driver-side
loop state beyond the fixed plan depth (the ``kmeans_refine`` /
``near_dup_clusters`` declarative-iteration discipline).

Edge derivation here: two document sources are linked when they share a
rare 4-token shingle (content syndication/citation proxy — the fixtures
carry no explicit hyperlinks; reference repo has no graph surface at
all). The shared-shingle self-join is df-capped exactly like the LSH
hot-bucket guard: shingles appearing in more than ``PR_DF_CAP`` distinct
sources are stopword-grade and dropped, bounding the pair fan-out per
shingle at ``PR_DF_CAP²`` — without the cap a boilerplate shingle shared
by k domains emits k² pairs.

Determinism: the power method runs in FIXED-POINT integer arithmetic —
ranks are scaled by ``PR_SCALE`` (10^12) and every divide is an integral
``div`` (Spark) / ``//`` (DuckDB), so both engines compute bit-identical
BIGINT ranks with no float summation, no rounding snaps, and no
order-sensitivity (integer sums commute). Each floor-divide truncates
< 1 fixed-point unit (10^-12), so total mass ``Σr`` drifts below
``PR_SCALE`` by at most (edges + 2·nodes + 2) units per iteration —
pinned by ``tests/test_graph.py::test_pagerank_mass_conserved``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query

#: fixed-point scale: ranks live in [0, PR_SCALE] as BIGINTs. Overflow
#: headroom: the largest intermediate is ``r·w ≤ PR_SCALE·w``, so edge
#: weights up to ~9·10^6 shared shingles fit int64; past that (a
#: pathological duplicated-boilerplate pair of domains) the lanes would
#: move to DECIMAL(38,0) — the df-cap makes such weights unreachable
#: here (w ≤ distinct capped shingles).
PR_SCALE = 10**12
#: damping d = 0.85 as the exact rational 17/20 (no float anywhere).
PR_DAMP_NUM, PR_DAMP_DEN = 17, 20
PR_ITERS = 3
PR_SHINGLE_N = 4
#: drop shingles shared by more than this many distinct sources —
#: boilerplate/stopword shingles carry no citation signal and their
#: pair fan-out is quadratic (same role as dedup.HOT_BUCKET_CAP).
PR_DF_CAP = 10

_TOKEN_SPLIT = r"\s+"


def source_shingle_edges(docs: DataFrame) -> DataFrame:
    """(src, dst, w, out_w) weighted directed edges between document
    sources sharing rare ``PR_SHINGLE_N``-gram shingles.

    Pipeline is corpus-linear and narrow until the per-shingle exchange:
    ``arrays_zip``-of-slices shingling (the ``dedup.shingle_rows`` shape
    — whole-stage codegen, no window), per-(source, shingle) distinct,
    one window count per shingle for the df-cap, then the capped
    self-join. ``out_w`` rides a window over the already-grouped edges —
    no extra shuffle (stays partitioned on src)."""
    toks = F.split(F.trim(F.col("text")), _TOKEN_SPLIT)
    m = F.size(toks) - (PR_SHINGLE_N - 1)
    zipped = F.arrays_zip(*[F.slice(toks, j + 1, m) for j in range(PR_SHINGLE_N)])
    sh = (
        docs.filter(F.size(toks) >= PR_SHINGLE_N)
        .select("source", F.explode(zipped).alias("z"))
        .select(
            "source",
            F.concat_ws(" ", *[F.col(f"z.{j}") for j in range(PR_SHINGLE_N)]).alias("sh"),
        )
        .distinct()
    )
    from pyspark.sql import Window

    good = (
        sh.withColumn("nsrc", F.count(F.lit(1)).over(Window.partitionBy("sh")))
        .filter((F.col("nsrc") >= 2) & (F.col("nsrc") <= PR_DF_CAP))
        .select("source", "sh")
    )
    a = good.alias("a")
    b = good.alias("b")
    edges = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.source") != F.col("b.source")))
        .groupBy(F.col("a.source").alias("src"), F.col("b.source").alias("dst"))
        .agg(F.count(F.lit(1)).alias("w"))
    )
    return edges.withColumn(
        "out_w", F.sum("w").over(Window.partitionBy("src"))
    )


def pagerank_fixed_point(
    nodes: DataFrame, edges: DataFrame, iters: int = PR_ITERS
) -> DataFrame:
    """``iters`` power-method iterations in exact fixed-point arithmetic.

    ``nodes``: one ``source`` column (every vertex, including isolated
    ones). ``edges``: (src, dst, w, out_w) with ``out_w = Σ_dst w`` per
    src. Returns (source, r) with ``r`` the PR_SCALE-scaled BIGINT rank.

    Per iteration: dangling mass (nodes with no out-edge) is summed into
    a 1-row broadcast and redistributed uniformly — explicit, not
    dropped; contributions ``(r·w) div out_w`` shuffle once on src and
    group-sum once on dst; the teleport/damping combine is pure integral
    arithmetic. The iteration count is fixed plan depth — ONE declarative
    plan, no collect, no checkpoint."""
    n1 = F.broadcast(nodes.agg(F.count(F.lit(1)).cast("long").alias("n")))
    srcs = edges.select("src").distinct()
    r = nodes.crossJoin(n1).select(
        "source", F.expr(f"{PR_SCALE} div n").cast("long").alias("r")
    )
    for _ in range(iters):
        dang = F.broadcast(
            r.join(srcs, r["source"] == srcs["src"], "left_anti").agg(
                F.coalesce(F.sum("r"), F.lit(0)).cast("long").alias("dm")
            )
        )
        contrib = (
            r.join(edges, r["source"] == edges["src"])
            .select("dst", F.expr("(r * w) div out_w").alias("ct"))
            .groupBy("dst")
            .agg(F.sum("ct").cast("long").alias("c"))
        )
        r = (
            nodes.join(contrib, nodes["source"] == contrib["dst"], "left")
            .crossJoin(n1)
            .crossJoin(dang)
            .select(
                "source",
                F.expr(
                    f"(({3 * PR_SCALE} div {PR_DAMP_DEN}) div n)"
                    f" + ({PR_DAMP_NUM} * (coalesce(c, 0L) + dm div n))"
                    f" div {PR_DAMP_DEN}"
                )
                .cast("long")
                .alias("r"),
            )
        )
    return r


def _pagerank_iter_cte(prev: str, k: int) -> str:
    """One DuckDB power-method iteration as chained CTEs — the exact
    integer twin of one ``pagerank_fixed_point`` loop body."""
    return f"""d{k} AS (
      SELECT CAST(COALESCE(SUM(r), 0) AS BIGINT) AS dm FROM {prev}
      WHERE source NOT IN (SELECT src FROM srcs)
    ), c{k} AS (
      SELECT e.dst AS source, CAST(SUM((r.r * e.w) // e.out_w) AS BIGINT) AS c
      FROM {prev} r JOIN enorm e ON r.source = e.src GROUP BY e.dst
    ), r{k} AS MATERIALIZED (
      SELECT n.source,
             CAST((({3 * PR_SCALE} // {PR_DAMP_DEN}) // nn.n)
                + ({PR_DAMP_NUM} * (COALESCE(c.c, 0) + d{k}.dm // nn.n))
                  // {PR_DAMP_DEN} AS BIGINT) AS r
      FROM nodes n CROSS JOIN nn CROSS JOIN d{k}
      LEFT JOIN c{k} c ON n.source = c.source
    )"""


_PAGERANK_ORACLE = f"""
    WITH toks AS (
      SELECT source, string_split_regex(trim(text), '\\s+') AS t FROM documents
    ), sh AS (
      SELECT DISTINCT source,
             list_aggregate(t[i:i+{PR_SHINGLE_N - 1}], 'string_agg', ' ') AS sh
      FROM toks, UNNEST(range(1, len(t) - {PR_SHINGLE_N} + 2)) AS rr(i)
      WHERE len(t) >= {PR_SHINGLE_N}
    ), good AS MATERIALIZED (
      SELECT source, sh FROM (
        SELECT source, sh, COUNT(*) OVER (PARTITION BY sh) AS nsrc FROM sh
      ) WHERE nsrc BETWEEN 2 AND {PR_DF_CAP}
    ), edges AS MATERIALIZED (
      SELECT a.source AS src, b.source AS dst, CAST(COUNT(*) AS BIGINT) AS w
      FROM good a JOIN good b ON a.sh = b.sh AND a.source <> b.source
      GROUP BY 1, 2
    ), enorm AS MATERIALIZED (
      SELECT src, dst, w, CAST(SUM(w) OVER (PARTITION BY src) AS BIGINT) AS out_w
      FROM edges
    ), nodes AS MATERIALIZED (
      SELECT DISTINCT source FROM documents
    ), nn AS MATERIALIZED (
      SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes
    ), srcs AS MATERIALIZED (
      SELECT DISTINCT src FROM edges
    ), r0 AS MATERIALIZED (
      SELECT source, CAST({PR_SCALE} // n AS BIGINT) AS r FROM nodes CROSS JOIN nn
    ), {_pagerank_iter_cte("r0", 1)}, {_pagerank_iter_cte("r1", 2)},
    {_pagerank_iter_cte("r2", 3)}
    SELECT n.source,
           r{PR_ITERS}.r AS rank_fp,
           CAST(r{PR_ITERS}.r AS DOUBLE) / {float(PR_SCALE)} AS rank,
           COALESCE(ow.out_w, 0) AS out_weight,
           COALESCE(iw.n_in, 0) AS n_in
    FROM nodes n
    JOIN r{PR_ITERS} ON n.source = r{PR_ITERS}.source
    LEFT JOIN (SELECT src, CAST(MAX(out_w) AS BIGINT) AS out_w FROM enorm GROUP BY src) ow
      ON n.source = ow.src
    LEFT JOIN (SELECT dst, CAST(COUNT(*) AS BIGINT) AS n_in FROM edges GROUP BY dst) iw
      ON n.source = iw.dst
    ORDER BY n.source
"""


HC_MAX_HOPS = 3
#: lcm(1..HC_MAX_HOPS): harmonic contributions 1/d ride as the exact
#: integers HC_LCM/d, so the centrality sum is integer arithmetic and
#: the final unscale is one deterministic double divide.
HC_LCM = 6


def khop_distances(edges: DataFrame, max_hops: int = HC_MAX_HOPS) -> DataFrame:
    """(u, v, d): shortest-path distance for every ordered pair within
    ``max_hops`` — BFS frontier expansion as a fixed-depth declarative
    plan. Each hop is one join of the previous frontier onto the edge
    list plus an anti-join against everything already reached (BFS
    finds shortest distances precisely because closer pairs are claimed
    by earlier hops). Truncated k-hop is the standard web-scale
    formulation (exact all-pairs is quadratic; the hop cap bounds the
    materialized pair set by the k-neighborhood size)."""
    reached = edges.select("src", "dst").distinct().withColumn(
        "d", F.lit(1).cast("int")
    )
    frontier = reached
    for hop in range(2, max_hops + 1):
        grown = (
            frontier.alias("f")
            .join(edges.alias("e"), F.col("f.dst") == F.col("e.src"))
            .filter(F.col("f.src") != F.col("e.dst"))
            .select(F.col("f.src").alias("src"), F.col("e.dst").alias("dst"))
            .distinct()
            .withColumn("d", F.lit(hop).cast("int"))
        )
        fresh = grown.join(
            reached.select("src", "dst"), ["src", "dst"], "left_anti"
        )
        reached = reached.unionAll(fresh)
        frontier = fresh
    return reached


def _hc_hop_ctes(max_hops: int = HC_MAX_HOPS) -> str:
    """DuckDB twin of ``khop_distances``: chained frontier CTEs."""
    parts = [
        "p1 AS MATERIALIZED (SELECT DISTINCT src, dst, 1 AS d FROM edges)",
    ]
    for hop in range(2, max_hops + 1):
        prev_union = " UNION ALL ".join(
            f"SELECT src, dst FROM p{i}" for i in range(1, hop)
        )
        parts.append(
            f"""p{hop} AS MATERIALIZED (
      SELECT DISTINCT f.src, e.dst, {hop} AS d
      FROM p{hop - 1} f JOIN edges e ON f.dst = e.src
      WHERE f.src <> e.dst
        AND NOT EXISTS (SELECT 1 FROM ({prev_union}) q
                        WHERE q.src = f.src AND q.dst = e.dst)
    )"""
        )
    return ", ".join(parts)


_HARMONIC_ORACLE = f"""
    WITH toks AS (
      SELECT source, string_split_regex(trim(text), '\\s+') AS t FROM documents
    ), sh AS (
      SELECT DISTINCT source,
             list_aggregate(t[i:i+{PR_SHINGLE_N - 1}], 'string_agg', ' ') AS sh
      FROM toks, UNNEST(range(1, len(t) - {PR_SHINGLE_N} + 2)) AS rr(i)
      WHERE len(t) >= {PR_SHINGLE_N}
    ), good AS MATERIALIZED (
      SELECT source, sh FROM (
        SELECT source, sh, COUNT(*) OVER (PARTITION BY sh) AS nsrc FROM sh
      ) WHERE nsrc BETWEEN 2 AND {PR_DF_CAP}
    ), edges AS MATERIALIZED (
      SELECT DISTINCT a.source AS src, b.source AS dst
      FROM good a JOIN good b ON a.sh = b.sh AND a.source <> b.source
    ), nodes AS MATERIALIZED (
      SELECT DISTINCT source FROM documents
    ), {_hc_hop_ctes()}, pairs AS (
      {" UNION ALL ".join(f"SELECT * FROM p{i}" for i in range(1, HC_MAX_HOPS + 1))}
    ), scores AS (
      SELECT dst AS source,
             CAST(SUM({HC_LCM} // d) AS BIGINT) AS harmonic{HC_LCM},
             CAST(COUNT(*) AS BIGINT) AS n_reachable,
             CAST(SUM(CASE WHEN d = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_in
      FROM pairs GROUP BY dst
    )
    SELECT n.source,
           COALESCE(s.harmonic{HC_LCM}, 0) AS harmonic{HC_LCM},
           CAST(COALESCE(s.harmonic{HC_LCM}, 0) AS DOUBLE) / {HC_LCM}.0
             AS harmonic,
           COALESCE(s.n_reachable, 0) AS n_reachable,
           COALESCE(s.n_in, 0) AS n_in
    FROM nodes n LEFT JOIN scores s ON n.source = s.source
    ORDER BY n.source
"""


@query("harmonic_centrality", oracle=_HARMONIC_ORACLE, tags=("U6",), prepared=False)
def harmonic_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[U6] Truncated ({HC_MAX_HOPS}-hop) harmonic centrality over the
    shared-shingle domain graph — H(v) = Σ_u 1/d(u→v), the
    distance-based quality signal that complements ``domain_pagerank``'s
    flow-based one (Boldi & Vigna 2014 rank harmonic centrality as the
    best-axiomatized centrality; the k-hop truncation is the web-scale
    neighborhood-function formulation). Contributions ride as exact
    integers (HC_LCM/d) so the score is order-independent integer
    summation; the only double is the final unscale divide.

    Scale: the frontier expansion materializes k-neighborhood pairs —
    bounded by the hop cap; each hop is one shuffle join + one anti-join
    on the pair key. Same checkpointed-graph discipline as
    ``domain_pagerank``."""
    docs = load_table(spark, sf_dir, "documents")
    edges = (
        source_shingle_edges(docs)
        .select("src", "dst")
        .localCheckpoint(eager=True)
    )
    nodes = docs.select("source").distinct().localCheckpoint(eager=True)
    pairs = khop_distances(edges, HC_MAX_HOPS)
    scores = pairs.groupBy("dst").agg(
        F.sum(F.expr(f"{HC_LCM} div d")).cast("long").alias(f"harmonic{HC_LCM}"),
        F.count(F.lit(1)).cast("long").alias("n_reachable"),
        F.sum(F.when(F.col("d") == 1, 1).otherwise(0)).cast("long").alias("n_in"),
    )
    return (
        nodes.join(scores, nodes["source"] == scores["dst"], "left")
        .select(
            "source",
            F.coalesce(F.col(f"harmonic{HC_LCM}"), F.lit(0).cast("long")).alias(
                f"harmonic{HC_LCM}"
            ),
            (
                F.coalesce(F.col(f"harmonic{HC_LCM}"), F.lit(0).cast("long")).cast(
                    "double"
                )
                / F.lit(float(HC_LCM))
            ).alias("harmonic"),
            F.coalesce(F.col("n_reachable"), F.lit(0).cast("long")).alias(
                "n_reachable"
            ),
            F.coalesce(F.col("n_in"), F.lit(0).cast("long")).alias("n_in"),
        )
        .orderBy("source")
    )


_TRIANGLE_ORACLE = f"""
    WITH toks AS (
      SELECT source, string_split_regex(trim(text), '\\s+') AS t FROM documents
    ), sh AS (
      SELECT DISTINCT source,
             list_aggregate(t[i:i+{PR_SHINGLE_N - 1}], 'string_agg', ' ') AS sh
      FROM toks, UNNEST(range(1, len(t) - {PR_SHINGLE_N} + 2)) AS rr(i)
      WHERE len(t) >= {PR_SHINGLE_N}
    ), good AS MATERIALIZED (
      SELECT source, sh FROM (
        SELECT source, sh, COUNT(*) OVER (PARTITION BY sh) AS nsrc FROM sh
      ) WHERE nsrc BETWEEN 2 AND {PR_DF_CAP}
    ), und AS MATERIALIZED (
      SELECT DISTINCT LEAST(a.source, b.source) AS a,
                      GREATEST(a.source, b.source) AS b
      FROM good a JOIN good b ON a.sh = b.sh AND a.source <> b.source
    ), deg AS MATERIALIZED (
      SELECT v, CAST(COUNT(*) AS BIGINT) AS d FROM (
        SELECT a AS v FROM und UNION ALL SELECT b AS v FROM und
      ) GROUP BY v
    ), oriented AS MATERIALIZED (
      SELECT CASE WHEN (da.d, e.a) < (db.d, e.b) THEN e.a ELSE e.b END AS u,
             CASE WHEN (da.d, e.a) < (db.d, e.b) THEN e.b ELSE e.a END AS v,
             CASE WHEN (da.d, e.a) < (db.d, e.b) THEN db.d ELSE da.d END AS dv
      FROM und e JOIN deg da ON e.a = da.v JOIN deg db ON e.b = db.v
    ), tri AS MATERIALIZED (
      SELECT x.u AS c1, x.v AS c2, y.v AS c3
      FROM oriented x
      JOIN oriented y ON x.u = y.u AND (x.dv, x.v) < (y.dv, y.v)
      JOIN oriented z ON z.u = x.v AND z.v = y.v
    ), corner AS (
      SELECT v, CAST(COUNT(*) AS BIGINT) AS t FROM (
        SELECT c1 AS v FROM tri UNION ALL SELECT c2 FROM tri
        UNION ALL SELECT c3 FROM tri
      ) GROUP BY v
    ), nodes AS MATERIALIZED (
      SELECT DISTINCT source FROM documents
    )
    SELECT n.source,
           COALESCE(d.d, 0) AS degree,
           COALESCE(c.t, 0) AS n_triangles,
           CASE WHEN COALESCE(d.d, 0) >= 2
                THEN CAST(2 * COALESCE(c.t, 0) AS DOUBLE)
                   / CAST(d.d * (d.d - 1) AS DOUBLE)
                ELSE 0.0 END AS clustering
    FROM nodes n
    LEFT JOIN deg d ON n.source = d.v
    LEFT JOIN corner c ON n.source = c.v
    ORDER BY n.source
"""


@query("triangle_clustering", oracle=_TRIANGLE_ORACLE, tags=("U6",), prepared=False)
def triangle_clustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[U6] Triangle count + local clustering coefficient per source over
    the shared-shingle graph — the standard cohesion signal (a domain
    whose neighbors also reference each other is a community hub; an
    LCC near 0 at high degree is the link-farm / scraped-hub shape that
    TrustRank demotes and this measures directly).

    Scale design: the DEGREE-ORDERED orientation (Schank & Wagner 2005
    node-iterator / the MapReduce formulation of Suri & Vassilvitskii
    2011): each undirected edge is directed from its (degree, name)-
    smaller endpoint, so every wedge is generated at its lowest-degree
    corner and the wedge count is bounded by Σ_v d_out(v)² with
    d_out = O(√m) — the bound that makes triangle counting feasible on
    power-law graphs where a naive neighbor-pair join explodes at the
    hubs. Everything is equi-joins (wedge join on the apex, closing
    check on the (v,w) pair key); counts are exact integers; the LCC
    2T/(d(d-1)) is one IEEE divide of exact integers. Triangles are
    materialized once and exploded to corners for per-node counts.
    ``prepared=False`` for the checkpointed edge list."""
    docs = load_table(spark, sf_dir, "documents")
    edges = source_shingle_edges(docs).localCheckpoint(eager=True)
    nodes = docs.select("source").distinct().localCheckpoint(eager=True)
    und = (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .distinct()
    )
    return clustering_from_edges(nodes, und)


def clustering_from_edges(nodes: DataFrame, und: DataFrame) -> DataFrame:
    """The degree-ordered triangle/LCC kernel on canonical undirected
    edges (columns a < b, deduplicated) — split out so crafted-graph
    tests drive the exact code the registered query runs."""
    deg = (
        und.select(F.col("a").alias("v"))
        .unionAll(und.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
    )
    e = (
        und.join(deg.withColumnRenamed("v", "a").withColumnRenamed("d", "da"), "a")
        .join(deg.withColumnRenamed("v", "b").withColumnRenamed("d", "db"), "b")
    )
    lower = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    oriented = e.select(
        F.when(lower, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(lower, F.col("b")).otherwise(F.col("a")).alias("v"),
        F.when(lower, F.col("db")).otherwise(F.col("da")).alias("dv"),
    )
    x = oriented.alias("x")
    y = oriented.alias("y")
    z = oriented.alias("z")
    wedge_lt = (F.col("x.dv") < F.col("y.dv")) | (
        (F.col("x.dv") == F.col("y.dv")) & (F.col("x.v") < F.col("y.v"))
    )
    tri = (
        x.join(y, (F.col("x.u") == F.col("y.u")) & wedge_lt)
        .join(z, (F.col("z.u") == F.col("x.v")) & (F.col("z.v") == F.col("y.v")))
        .select(
            F.col("x.u").alias("c1"),
            F.col("x.v").alias("c2"),
            F.col("y.v").alias("c3"),
        )
    )
    corner = (
        tri.select(F.col("c1").alias("v"))
        .unionAll(tri.select(F.col("c2").alias("v")))
        .unionAll(tri.select(F.col("c3").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).cast("long").alias("t"))
    )
    d0 = F.coalesce(F.col("d"), F.lit(0).cast("long"))
    t0 = F.coalesce(F.col("t"), F.lit(0).cast("long"))
    return (
        nodes.join(deg, nodes["source"] == deg["v"], "left")
        .drop("v")
        .join(corner, nodes["source"] == corner["v"], "left")
        .select(
            "source",
            d0.alias("degree"),
            t0.alias("n_triangles"),
            F.when(
                d0 >= 2,
                (2 * t0).cast("double") / (F.col("d") * (F.col("d") - 1)).cast("double"),
            )
            .otherwise(F.lit(0.0))
            .alias("clustering"),
        )
        .orderBy("source")
    )


#: TrustRank seed-restart probability lives on the same fixed-point
#: lanes as PageRank; seeds are the majority-English sources (en-doc
#: count × 2 > doc count — a deterministic integer predicate standing in
#: for the human-audited whitelist the Gyöngyi et al. 2004 algorithm
#: assumes; real deployments plug their curated seed list in here).
TR_ITERS = 3


def trustrank_fixed_point(
    nodes: DataFrame, edges: DataFrame, seeds: DataFrame, iters: int = TR_ITERS
) -> DataFrame:
    """``iters`` TrustRank iterations: PageRank's power method with the
    teleport vector RESTRICTED to the seed set (Gyöngyi, Garcia-Molina &
    Pedersen 2004, "Combating web spam with TrustRank") — trust mass
    enters only at seeds and flows along edges, so unreferenced regions
    of the graph decay toward zero instead of receiving uniform teleport.
    Dangling mass also re-enters at the seeds (the standard fold of the
    dangling term into the restart vector).

    Same exact fixed-point discipline as ``pagerank_fixed_point``: BIGINT
    lanes scaled by ``PR_SCALE``, damping as the rational 17/20, every
    divide integral — bit-identical across engines. ``seeds``: one
    ``source`` column, a non-empty subset of ``nodes`` — an EMPTY seed
    set makes every ``div ns`` NULL (both engines) rather than raising;
    callers own the precondition (every fixture SF yields ≥1
    majority-English source, like the BPE trainer's ≥K-pairs caveat)."""
    s1 = F.broadcast(seeds.agg(F.count(F.lit(1)).cast("long").alias("ns")))
    seed_flag = seeds.select(F.col("source").alias("source"), F.lit(1).alias("is_seed"))
    srcs = edges.select("src").distinct()
    base = nodes.join(seed_flag, "source", "left").select(
        "source", F.coalesce(F.col("is_seed"), F.lit(0)).alias("is_seed")
    )
    r = base.crossJoin(s1).select(
        "source",
        "is_seed",
        F.expr(f"CASE WHEN is_seed = 1 THEN {PR_SCALE} div ns ELSE 0 END")
        .cast("long")
        .alias("r"),
    )
    for _ in range(iters):
        dang = F.broadcast(
            r.join(srcs, r["source"] == srcs["src"], "left_anti").agg(
                F.coalesce(F.sum("r"), F.lit(0)).cast("long").alias("dm")
            )
        )
        contrib = (
            r.join(edges, r["source"] == edges["src"])
            .select("dst", F.expr("(r * w) div out_w").alias("ct"))
            .groupBy("dst")
            .agg(F.sum("ct").cast("long").alias("c"))
        )
        r = (
            base.join(contrib, base["source"] == contrib["dst"], "left")
            .crossJoin(s1)
            .crossJoin(dang)
            .select(
                "source",
                "is_seed",
                F.expr(
                    f"CASE WHEN is_seed = 1 THEN ({3 * PR_SCALE} div {PR_DAMP_DEN}) div ns"
                    f" ELSE 0 END"
                    f" + ({PR_DAMP_NUM} * (coalesce(c, 0L)"
                    f" + CASE WHEN is_seed = 1 THEN dm div ns ELSE 0 END))"
                    f" div {PR_DAMP_DEN}"
                )
                .cast("long")
                .alias("r"),
            )
        )
    return r


def _trustrank_iter_cte(prev: str, k: int) -> str:
    """One DuckDB TrustRank iteration as chained CTEs — the exact
    integer twin of one ``trustrank_fixed_point`` loop body."""
    return f"""d{k} AS (
      SELECT CAST(COALESCE(SUM(r), 0) AS BIGINT) AS dm FROM {prev}
      WHERE source NOT IN (SELECT src FROM srcs)
    ), c{k} AS (
      SELECT e.dst AS source, CAST(SUM((r.r * e.w) // e.out_w) AS BIGINT) AS c
      FROM {prev} r JOIN enorm e ON r.source = e.src GROUP BY e.dst
    ), r{k} AS MATERIALIZED (
      SELECT b.source, b.is_seed,
             CAST(CASE WHEN b.is_seed = 1
                       THEN ({3 * PR_SCALE} // {PR_DAMP_DEN}) // ss.ns ELSE 0 END
                + ({PR_DAMP_NUM} * (COALESCE(c.c, 0)
                     + CASE WHEN b.is_seed = 1 THEN d{k}.dm // ss.ns ELSE 0 END))
                  // {PR_DAMP_DEN} AS BIGINT) AS r
      FROM base b CROSS JOIN ss CROSS JOIN d{k}
      LEFT JOIN c{k} c ON b.source = c.source
    )"""


_TRUSTRANK_ORACLE = f"""
    WITH toks AS (
      SELECT source, string_split_regex(trim(text), '\\s+') AS t FROM documents
    ), sh AS (
      SELECT DISTINCT source,
             list_aggregate(t[i:i+{PR_SHINGLE_N - 1}], 'string_agg', ' ') AS sh
      FROM toks, UNNEST(range(1, len(t) - {PR_SHINGLE_N} + 2)) AS rr(i)
      WHERE len(t) >= {PR_SHINGLE_N}
    ), good AS MATERIALIZED (
      SELECT source, sh FROM (
        SELECT source, sh, COUNT(*) OVER (PARTITION BY sh) AS nsrc FROM sh
      ) WHERE nsrc BETWEEN 2 AND {PR_DF_CAP}
    ), edges AS MATERIALIZED (
      SELECT a.source AS src, b.source AS dst, CAST(COUNT(*) AS BIGINT) AS w
      FROM good a JOIN good b ON a.sh = b.sh AND a.source <> b.source
      GROUP BY 1, 2
    ), enorm AS MATERIALIZED (
      SELECT src, dst, w, CAST(SUM(w) OVER (PARTITION BY src) AS BIGINT) AS out_w
      FROM edges
    ), nodes AS MATERIALIZED (
      SELECT DISTINCT source FROM documents
    ), seeds AS MATERIALIZED (
      SELECT source FROM documents GROUP BY source
      HAVING 2 * SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) > COUNT(*)
    ), ss AS MATERIALIZED (
      SELECT CAST(COUNT(*) AS BIGINT) AS ns FROM seeds
    ), base AS MATERIALIZED (
      SELECT n.source,
             CASE WHEN s.source IS NULL THEN 0 ELSE 1 END AS is_seed
      FROM nodes n LEFT JOIN seeds s ON n.source = s.source
    ), srcs AS MATERIALIZED (
      SELECT DISTINCT src FROM edges
    ), r0 AS MATERIALIZED (
      SELECT source, is_seed,
             CAST(CASE WHEN is_seed = 1 THEN {PR_SCALE} // ss.ns ELSE 0 END
                  AS BIGINT) AS r
      FROM base CROSS JOIN ss
    ), {_trustrank_iter_cte("r0", 1)}, {_trustrank_iter_cte("r1", 2)},
    {_trustrank_iter_cte("r2", 3)}
    SELECT source,
           r AS trust_fp,
           CAST(r AS DOUBLE) / {float(PR_SCALE)} AS trust,
           CAST(is_seed AS BIGINT) AS is_seed
    FROM r{TR_ITERS}
    ORDER BY source
"""


@query("trustrank_seeded", oracle=_TRUSTRANK_ORACLE, tags=("U6",), prepared=False)
def trustrank_seeded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[U6] TrustRank over the shared-shingle source graph — personalized
    PageRank whose teleport vector is restricted to a trusted SEED set
    (Gyöngyi et al. 2004): the standard seed-propagated quality signal a
    100 TB curation pipeline runs next to raw PageRank, because uniform
    teleport hands every spam/SEO domain a rank floor while TrustRank
    gives unreferenced regions none. Complements ``domain_pagerank``
    (flow volume) and ``harmonic_centrality`` (distance): the three
    are the standard centrality panel for link-informed corpus curation.

    Seeds here: majority-English sources (a deterministic stand-in for
    the audited whitelist — see ``TR_ITERS`` note). Scale: identical
    posture to ``domain_pagerank`` — corpus-linear df-capped edge
    extraction runs once and is checkpointed; the iteration loop touches
    only the domain-cardinality graph; seed/dangling totals are 1-row
    broadcasts. ``prepared=False`` for the checkpoint lineage."""
    docs = load_table(spark, sf_dir, "documents")
    edges = source_shingle_edges(docs).localCheckpoint(eager=True)
    nodes = docs.select("source").distinct().localCheckpoint(eager=True)
    seeds = (
        docs.groupBy("source")
        .agg(
            F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).alias("en"),
            F.count(F.lit(1)).alias("n"),
        )
        .filter(2 * F.col("en") > F.col("n"))
        .select("source")
        .localCheckpoint(eager=True)
    )
    r = trustrank_fixed_point(nodes, edges, seeds, TR_ITERS)
    return r.select(
        "source",
        F.col("r").alias("trust_fp"),
        (F.col("r").cast("double") / F.lit(float(PR_SCALE))).alias("trust"),
        F.col("is_seed").cast("long").alias("is_seed"),
    ).orderBy("source")


LPA_ITERS = 3


def label_propagation_fixed(nodes: DataFrame, edges: DataFrame, iters: int = LPA_ITERS) -> DataFrame:
    """``iters`` SYNCHRONOUS label-propagation rounds (Raghavan et al.
    2007) with a deterministic tie-break: every node simultaneously
    adopts the label most frequent among its in-neighbors, ties broken
    by (count DESC, label ASC); nodes with no in-edges keep their label.
    Labels start as the node's own name. Fixed iteration count +
    synchronous updates + total-order tie-break ⇒ bit-identical results
    in both engines (asynchronous LPA's update-order dependence is the
    standard reproducibility complaint; this is the deterministic
    variant a pipeline can actually regression-test).

    Per round: one join of the label table onto the edge list, one
    grouped count, one per-node window pick — graph-sized, never
    corpus-sized. ``nodes``: (source); ``edges``: (src, dst)."""
    from pyspark.sql import Window

    lab = nodes.select("source", F.col("source").alias("label"))
    for _ in range(iters):
        votes = (
            lab.join(edges, lab["source"] == edges["src"])
            .groupBy("dst", "label")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        w = Window.partitionBy("dst").orderBy(F.desc("cnt"), "label")
        pick = (
            votes.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") == 1)
            .select(F.col("dst"), F.col("label").alias("new_label"))
        )
        lab = (
            lab.join(pick, lab["source"] == pick["dst"], "left")
            .select(
                "source",
                F.coalesce(F.col("new_label"), F.col("label")).alias("label"),
            )
        )
    return lab


def _lpa_iter_cte(prev: str, k: int) -> str:
    return f"""v{k} AS (
      SELECT e.dst, l.label, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM {prev} l JOIN uedges e ON l.source = e.src
      GROUP BY e.dst, l.label
    ), pk{k} AS (
      SELECT dst, label AS new_label FROM (
        SELECT dst, label,
               ROW_NUMBER() OVER (PARTITION BY dst
                                  ORDER BY cnt DESC, label) AS rk
        FROM v{k}
      ) WHERE rk = 1
    ), l{k} AS MATERIALIZED (
      SELECT l.source, COALESCE(p.new_label, l.label) AS label
      FROM {prev} l LEFT JOIN pk{k} p ON l.source = p.dst
    )"""


_LPA_ORACLE = f"""
    WITH toks AS (
      SELECT source, string_split_regex(trim(text), '\\s+') AS t FROM documents
    ), sh AS (
      SELECT DISTINCT source,
             list_aggregate(t[i:i+{PR_SHINGLE_N - 1}], 'string_agg', ' ') AS sh
      FROM toks, UNNEST(range(1, len(t) - {PR_SHINGLE_N} + 2)) AS rr(i)
      WHERE len(t) >= {PR_SHINGLE_N}
    ), good AS MATERIALIZED (
      SELECT source, sh FROM (
        SELECT source, sh, COUNT(*) OVER (PARTITION BY sh) AS nsrc FROM sh
      ) WHERE nsrc BETWEEN 2 AND {PR_DF_CAP}
    ), uedges AS MATERIALIZED (
      SELECT DISTINCT a.source AS src, b.source AS dst
      FROM good a JOIN good b ON a.sh = b.sh AND a.source <> b.source
    ), nodes AS MATERIALIZED (
      SELECT DISTINCT source FROM documents
    ), l0 AS MATERIALIZED (
      SELECT source, source AS label FROM nodes
    ), {_lpa_iter_cte("l0", 1)}, {_lpa_iter_cte("l1", 2)}, {_lpa_iter_cte("l2", 3)}
    SELECT l.source, l.label AS community,
           CAST(COUNT(*) OVER (PARTITION BY l.label) AS BIGINT) AS community_size
    FROM l{LPA_ITERS} l
    ORDER BY l.source
"""


@query("label_propagation", oracle=_LPA_ORACLE, tags=("U6",), prepared=False)
def label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[U6] Community detection by deterministic synchronous label
    propagation over the shared-shingle graph — the content-community
    signal next to connectivity (``near_dup_clusters`` gives components;
    LPA splits a component into densely-linked communities, the
    domain-clustering step a curation pipeline runs before per-community
    sampling caps). Fixed {LPA_ITERS} rounds, (count DESC, label ASC)
    tie-break — see ``label_propagation_fixed`` for the determinism
    argument. Scale: each round is one graph-sized join + grouped count
    + per-node window pick; the corpus enters only the (checkpointed)
    edge extraction. ``prepared=False`` for the checkpoint lineage."""
    docs = load_table(spark, sf_dir, "documents")
    edges = (
        source_shingle_edges(docs)
        .select("src", "dst")
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = docs.select("source").distinct().localCheckpoint(eager=True)
    lab = label_propagation_fixed(nodes, edges, LPA_ITERS)
    from pyspark.sql import Window

    return (
        lab.select(
            "source",
            F.col("label").alias("community"),
            F.count(F.lit(1))
            .over(Window.partitionBy("label"))
            .cast("long")
            .alias("community_size"),
        )
        .orderBy("source")
    )


#: top-k cutoff for the centrality agreement metric.
CA_TOPK = 5


def _tr_iter_cte(prev: str, k: int) -> str:
    """TrustRank iteration CTEs under ``t``-prefixed names so they can
    share one WITH clause with the PageRank chain (same shared graph
    CTEs, disjoint state names)."""
    return f"""td{k} AS (
      SELECT CAST(COALESCE(SUM(r), 0) AS BIGINT) AS dm FROM {prev}
      WHERE source NOT IN (SELECT src FROM srcs)
    ), tc{k} AS (
      SELECT e.dst AS source, CAST(SUM((r.r * e.w) // e.out_w) AS BIGINT) AS c
      FROM {prev} r JOIN enorm e ON r.source = e.src GROUP BY e.dst
    ), tr{k} AS MATERIALIZED (
      SELECT b.source, b.is_seed,
             CAST(CASE WHEN b.is_seed = 1
                       THEN ({3 * PR_SCALE} // {PR_DAMP_DEN}) // ss.ns ELSE 0 END
                + ({PR_DAMP_NUM} * (COALESCE(c.c, 0)
                     + CASE WHEN b.is_seed = 1 THEN td{k}.dm // ss.ns ELSE 0 END))
                  // {PR_DAMP_DEN} AS BIGINT) AS r
      FROM base b CROSS JOIN ss CROSS JOIN td{k}
      LEFT JOIN tc{k} c ON b.source = c.source
    )"""


def _spearman_select(pair: str, ra: str, rb: str) -> str:
    return f"""
      SELECT '{pair}' AS pair,
             CAST(COUNT(*) AS BIGINT) AS n_nodes,
             CAST(SUM(({ra} - {rb}) * ({ra} - {rb})) AS BIGINT) AS sum_d2,
             CASE WHEN COUNT(*) >= 2 THEN
               1.0 - CAST(6 * SUM(({ra} - {rb}) * ({ra} - {rb})) AS DOUBLE)
                   / CAST(COUNT(*) * (COUNT(*) * COUNT(*) - 1) AS DOUBLE)
             ELSE NULL END AS spearman_rho,
             CAST(SUM(CASE WHEN {ra} <= {CA_TOPK} AND {rb} <= {CA_TOPK}
                           THEN 1 ELSE 0 END) AS BIGINT) AS topk_common,
             CAST(SUM(CASE WHEN {ra} <= {CA_TOPK} AND {rb} <= {CA_TOPK}
                           THEN 1 ELSE 0 END) AS DOUBLE) / {CA_TOPK}.0
               AS topk_share
      FROM ranks"""


_AGREEMENT_ORACLE = f"""
    WITH toks AS (
      SELECT source, string_split_regex(trim(text), '\\s+') AS t FROM documents
    ), sh AS (
      SELECT DISTINCT source,
             list_aggregate(t[i:i+{PR_SHINGLE_N - 1}], 'string_agg', ' ') AS sh
      FROM toks, UNNEST(range(1, len(t) - {PR_SHINGLE_N} + 2)) AS rr(i)
      WHERE len(t) >= {PR_SHINGLE_N}
    ), good AS MATERIALIZED (
      SELECT source, sh FROM (
        SELECT source, sh, COUNT(*) OVER (PARTITION BY sh) AS nsrc FROM sh
      ) WHERE nsrc BETWEEN 2 AND {PR_DF_CAP}
    ), edges AS MATERIALIZED (
      SELECT a.source AS src, b.source AS dst, CAST(COUNT(*) AS BIGINT) AS w
      FROM good a JOIN good b ON a.sh = b.sh AND a.source <> b.source
      GROUP BY 1, 2
    ), enorm AS MATERIALIZED (
      SELECT src, dst, w, CAST(SUM(w) OVER (PARTITION BY src) AS BIGINT) AS out_w
      FROM edges
    ), nodes AS MATERIALIZED (
      SELECT DISTINCT source FROM documents
    ), nn AS MATERIALIZED (
      SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes
    ), srcs AS MATERIALIZED (
      SELECT DISTINCT src FROM edges
    ), r0 AS MATERIALIZED (
      SELECT source, CAST({PR_SCALE} // n AS BIGINT) AS r FROM nodes CROSS JOIN nn
    ), {_pagerank_iter_cte("r0", 1)}, {_pagerank_iter_cte("r1", 2)},
    {_pagerank_iter_cte("r2", 3)},
    seeds AS MATERIALIZED (
      SELECT source FROM documents GROUP BY source
      HAVING 2 * SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) > COUNT(*)
    ), ss AS MATERIALIZED (
      SELECT CAST(COUNT(*) AS BIGINT) AS ns FROM seeds
    ), base AS MATERIALIZED (
      SELECT n.source,
             CASE WHEN s.source IS NULL THEN 0 ELSE 1 END AS is_seed
      FROM nodes n LEFT JOIN seeds s ON n.source = s.source
    ), tr0 AS MATERIALIZED (
      SELECT source, is_seed,
             CAST(CASE WHEN is_seed = 1 THEN {PR_SCALE} // ss.ns ELSE 0 END
                  AS BIGINT) AS r
      FROM base CROSS JOIN ss
    ), {_tr_iter_cte("tr0", 1)}, {_tr_iter_cte("tr1", 2)}, {_tr_iter_cte("tr2", 3)},
    uedges AS MATERIALIZED (SELECT DISTINCT src, dst FROM edges),
    {_hc_hop_ctes().replace("FROM edges", "FROM uedges").replace("JOIN edges e", "JOIN uedges e")}, pairs AS (
      {" UNION ALL ".join(f"SELECT * FROM p{i}" for i in range(1, HC_MAX_HOPS + 1))}
    ), hscores AS MATERIALIZED (
      SELECT dst AS source, CAST(SUM({HC_LCM} // d) AS BIGINT) AS h
      FROM pairs GROUP BY dst
    ), ranks AS MATERIALIZED (
      SELECT n.source,
             ROW_NUMBER() OVER (ORDER BY pr.r DESC, n.source) AS rk_pr,
             ROW_NUMBER() OVER (ORDER BY t.r DESC, n.source) AS rk_tr,
             ROW_NUMBER() OVER (ORDER BY COALESCE(hs.h, 0) DESC, n.source) AS rk_hc
      FROM nodes n
      JOIN r{PR_ITERS} pr ON n.source = pr.source
      JOIN tr{TR_ITERS} t ON n.source = t.source
      LEFT JOIN hscores hs ON n.source = hs.source
    )
    SELECT * FROM ({_spearman_select("pagerank~harmonic", "rk_pr", "rk_hc")}
    UNION ALL {_spearman_select("pagerank~trustrank", "rk_pr", "rk_tr")}
    UNION ALL {_spearman_select("trustrank~harmonic", "rk_tr", "rk_hc")})
    ORDER BY pair
"""


@query("centrality_agreement", oracle=_AGREEMENT_ORACLE, tags=("U6", "A7"), prepared=False)
def centrality_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[U6/A7] Acceptance metric for the centrality panel — the
    ``ann_recall`` analogue for the graph family: Spearman rank
    correlation and top-{CA_TOPK} overlap between each pair of quality
    signals (PageRank vs TrustRank vs harmonic), over ONE shared
    checkpointed graph. Flow-based and distance-based signals agreeing
    is the sanity check before any is used as a corpus-curation weight;
    where they DISAGREE (trustrank demoting a high-PageRank region) is
    exactly the spam-demotion effect, now a measured number.

    Exactness: ranks are ROW_NUMBER over the total (score DESC, source)
    order — a deterministic permutation (the tie-broken Spearman
    variant, documented; no averaged ranks), so Σd² and the top-k
    overlap are exact integers and rho is one IEEE divide. Width note:
    ``sum_d2`` ≤ n³/3 stays in int64 to n ≈ 2M domains; past that the
    lane moves to DECIMAL(38,0) (the PR_SCALE headroom discipline). Scale: the
    extraction runs ONCE (checkpointed); each power method touches only
    the graph; the global rank windows sort the domain-cardinality
    table (≪ corpus; at 10^7 domains a single-partition sort is the
    honest cost of a total ranking and still trivial next to the
    corpus scan)."""
    docs = load_table(spark, sf_dir, "documents")
    edges = source_shingle_edges(docs).localCheckpoint(eager=True)
    nodes = docs.select("source").distinct().localCheckpoint(eager=True)
    seeds = (
        docs.groupBy("source")
        .agg(
            F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).alias("en"),
            F.count(F.lit(1)).alias("n"),
        )
        .filter(2 * F.col("en") > F.col("n"))
        .select("source")
        .localCheckpoint(eager=True)
    )
    pr = pagerank_fixed_point(nodes, edges, PR_ITERS).select(
        "source", F.col("r").alias("pr")
    )
    tr = trustrank_fixed_point(nodes, edges, seeds, TR_ITERS).select(
        "source", F.col("r").alias("tr")
    )
    hs = (
        khop_distances(edges.select("src", "dst").distinct(), HC_MAX_HOPS)
        .groupBy("dst")
        .agg(F.sum(F.expr(f"{HC_LCM} div d")).cast("long").alias("h"))
    )
    from pyspark.sql import Window

    joined = (
        nodes.join(pr, "source")
        .join(tr, "source")
        .join(hs, nodes["source"] == hs["dst"], "left")
        .select(
            "source",
            "pr",
            "tr",
            F.coalesce(F.col("h"), F.lit(0).cast("long")).alias("h"),
        )
    )
    ranks = joined.select(
        "source",
        F.row_number().over(Window.orderBy(F.desc("pr"), "source")).alias("rk_pr"),
        F.row_number().over(Window.orderBy(F.desc("tr"), "source")).alias("rk_tr"),
        F.row_number().over(Window.orderBy(F.desc("h"), "source")).alias("rk_hc"),
    )

    def agree(pair: str, ra: str, rb: str) -> DataFrame:
        d2 = (F.col(ra) - F.col(rb)) * (F.col(ra) - F.col(rb))
        both_top = F.when(
            (F.col(ra) <= CA_TOPK) & (F.col(rb) <= CA_TOPK), 1
        ).otherwise(0)
        return ranks.agg(
            F.count(F.lit(1)).cast("long").alias("n_nodes"),
            F.sum(d2).cast("long").alias("sum_d2"),
            F.sum(both_top).cast("long").alias("tk"),
        ).select(
            F.lit(pair).alias("pair"),
            "n_nodes",
            "sum_d2",
            F.when(
                F.col("n_nodes") >= 2,
                1.0
                - (6 * F.col("sum_d2")).cast("double")
                / (
                    F.col("n_nodes")
                    * (F.col("n_nodes") * F.col("n_nodes") - 1)
                ).cast("double"),
            ).alias("spearman_rho"),
            F.col("tk").alias("topk_common"),
            (F.col("tk").cast("double") / F.lit(float(CA_TOPK))).alias("topk_share"),
        )

    out = (
        agree("pagerank~harmonic", "rk_pr", "rk_hc")
        .unionAll(agree("pagerank~trustrank", "rk_pr", "rk_tr"))
        .unionAll(agree("trustrank~harmonic", "rk_tr", "rk_hc"))
    )
    return out.orderBy("pair")


@query("domain_pagerank", oracle=_PAGERANK_ORACLE, tags=("U6",), prepared=False)
def domain_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[U6] Domain-level PageRank over the shared-shingle source graph —
    {PR_ITERS} fixed-point power iterations with explicit dangling-mass
    redistribution (see module docstring for the exact-arithmetic and
    df-cap design).

    Scale: edge extraction is corpus-linear (narrow shingling, one
    per-shingle exchange, df-capped pair join) and runs ONCE — the graph
    is ``localCheckpoint``-ed before the loop (the ``near_dup_clusters``
    iteration discipline; without it each iteration's plan re-embeds the
    extraction ~3× per level since ``r`` feeds dangling + contributions
    + the next state, measured 14 s → 3 s at sf0.01). The iteration
    loop touches only the domain-cardinality graph — at 100 TB the
    corpus never enters the loop. 100× corpus replication leaves the
    graph bit-identical while the extraction pass scales linearly (soak
    row in SCALE.md). ``prepared=False`` for the checkpoint lineage."""
    docs = load_table(spark, sf_dir, "documents")
    edges = source_shingle_edges(docs).localCheckpoint(eager=True)
    nodes = docs.select("source").distinct().localCheckpoint(eager=True)
    r = pagerank_fixed_point(nodes, edges, PR_ITERS)
    outw = edges.groupBy("src").agg(F.max("out_w").cast("long").alias("out_w"))
    inw = edges.groupBy("dst").agg(F.count(F.lit(1)).cast("long").alias("n_in"))
    return (
        r.join(outw, r["source"] == outw["src"], "left")
        .join(inw, r["source"] == inw["dst"], "left")
        .select(
            "source",
            F.col("r").alias("rank_fp"),
            (F.col("r").cast("double") / F.lit(float(PR_SCALE))).alias("rank"),
            F.coalesce(F.col("out_w"), F.lit(0).cast("long")).alias("out_weight"),
            F.coalesce(F.col("n_in"), F.lit(0).cast("long")).alias("n_in"),
        )
        .orderBy("source")
    )
