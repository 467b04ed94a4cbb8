"""Mergeable probabilistic sketches as first-class relational operators
(SURVEY §2.4 A4 family; LLM-pipeline scale instruments).

Both sketches here are DETERMINISTIC (md5-derived hash functions — the
engine-portable idiom established by ``dedup.simhash_column``), so each
carries an exact DuckDB oracle: the same bit/bucket arithmetic in SQL
produces the identical sketch, estimate for estimate.

Scale posture: a Count-Min sketch is a (rows × width) count matrix built
by one key-bounded groupBy — the matrix IS the mergeable summary (union
of corpora = cell-wise sum), so a 100 TB corpus streams through partial
aggregation with no state beyond rows×width cells per task. A Bloom
filter is a distinct-bit set over the build side — thousands of rows —
broadcast to the probe side: the declarative form of the runtime bloom
filter Spark injects into shuffle joins (session.py enables that too;
this operator makes the mechanism inspectable and oracle-checkable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query
from .text import tokens

#: Count-Min geometry. Width 256 on a ~31-token fixture vocabulary keeps
#: collisions rare but possible — the CMS overestimate guarantee
#: (est >= exact) is part of what the oracle pins.
CMS_ROWS = 4
CMS_WIDTH = 256
#: Fixed probe set: high/low-frequency fixture words plus one absent
#: token (its estimate is pure collision mass — the sketch's error term).
CMS_PROBES = ("data", "spark", "value", "window", "zzz-absent")


def _bucket_array(col: F.Column) -> F.Column:
    """All CMS_ROWS buckets from ONE md5: the 32-hex digest is sliced into
    CMS_ROWS disjoint 7-hex (28-bit) windows, each parsed as a
    non-negative int64 and reduced mod CMS_WIDTH — the
    one-digest-many-hashes economy ``dedup.minhash_signatures`` uses
    (4 hashes for the price of 1 md5; hashing dominated the sketch build
    when measured per-salt). DuckDB twin:
    ``CAST('0x' || substr(md5(w), 1+7r, 7) AS BIGINT) % width``."""
    h = F.md5(col)
    return F.array(
        *[
            F.conv(F.substring(h, 1 + 7 * r, 7), 16, 10).cast("long") % CMS_WIDTH
            for r in range(CMS_ROWS)
        ]
    )


def _cms_probe_values() -> str:
    return ", ".join(f"'{t}'" for t in CMS_PROBES)


def cms_sketch(tok: DataFrame, col: str = "w") -> DataFrame:
    """(r, bucket, c) Count-Min matrix over a token column — the
    mergeable summary: ``cms_sketch(A ∪ B)`` equals the cell-wise sum of
    the two sketches (unit-tested), so per-shard sketches combine with a
    (r, bucket) groupBy at any scale."""
    return (
        tok.select(F.posexplode(_bucket_array(F.col(col))).alias("r", "bucket"))
        .groupBy("r", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )


@query(
    "count_min_freq",
    oracle=f"""
    WITH toks AS (
      SELECT unnest(string_split_regex(trim(text), '\\s+')) AS w FROM documents
    ), hashrows AS (
      SELECT unnest(range({CMS_ROWS})) AS r
    ), sketch AS (
      SELECT r,
             CAST('0x' || substr(md5(w), 1 + 7 * r, 7) AS BIGINT) % {CMS_WIDTH} AS bucket,
             COUNT(*) AS c
      FROM toks CROSS JOIN hashrows
      GROUP BY r, bucket
    ), probes AS (
      SELECT unnest([{_cms_probe_values()}]) AS token
    ), probe_buckets AS (
      SELECT token, r,
             CAST('0x' || substr(md5(token), 1 + 7 * r, 7) AS BIGINT) % {CMS_WIDTH} AS bucket
      FROM probes CROSS JOIN hashrows
    ), est AS (
      SELECT pb.token, CAST(MIN(COALESCE(s.c, 0)) AS BIGINT) AS est_count
      FROM probe_buckets pb LEFT JOIN sketch s ON pb.r = s.r AND pb.bucket = s.bucket
      GROUP BY pb.token
    ), exact AS (
      SELECT w AS token, CAST(COUNT(*) AS BIGINT) AS exact_count FROM toks GROUP BY w
    )
    SELECT e.token, e.est_count, COALESCE(x.exact_count, 0) AS exact_count
    FROM est e LEFT JOIN exact x ON e.token = x.token
    ORDER BY e.token
    """,
    tags=("A4",),
)
def count_min_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[A4] Count-Min frequency sketch over the document token stream.

    The sketch is the (r, bucket) count matrix — built with ONE explode
    (×CMS_ROWS) + one partial-aggregated groupBy, bounded at
    CMS_ROWS×CMS_WIDTH cells regardless of corpus size, and mergeable by
    cell-wise addition (union two corpora's sketches = sum the matrices).
    Estimates read the matrix with the same md5 bucket arithmetic; the
    absent probe token's nonzero estimate (if any) is the collision mass
    the CMS overestimate bound promises. est >= exact always.
    """
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(F.explode(tokens()).alias("w"))
    sketch = cms_sketch(tok)
    probes = spark.range(1).select(
        F.explode(F.array(*[F.lit(t) for t in CMS_PROBES])).alias("token")
    )
    probe_buckets = probes.select(
        "token", F.posexplode(_bucket_array(F.col("token"))).alias("r", "bucket")
    )
    est = (
        probe_buckets.join(F.broadcast(sketch), ["r", "bucket"], "left")
        .groupBy("token")
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).cast("long").alias("est_count"))
    )
    exact = tok.groupBy("w").agg(F.count(F.lit(1)).cast("long").alias("exact_count"))
    return (
        est.join(exact, est["token"] == exact["w"], "left")
        .select(
            "token",
            "est_count",
            F.coalesce(F.col("exact_count"), F.lit(0).cast("long")).alias("exact_count"),
        )
        .orderBy("token")
    )


#: Bloom geometry: 4096 bits / 3 hashes. The build side (BUILDING-segment
#: customers) sets ~3·n bits; the false-positive count the query reports
#: is the filter's actual error at this geometry.
BLOOM_BITS = 4096
BLOOM_K = 3


def _bloom_bit_sql(expr: str, h: str) -> str:
    return f"CAST('0x' || substr(md5({h} || '#' || {expr}), 1, 15) AS BIGINT) % {BLOOM_BITS}"


@query(
    "bloom_join_prune",
    oracle=f"""
    WITH hashes AS (SELECT unnest(range({BLOOM_K})) AS h),
    build AS (
      SELECT DISTINCT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'
    ), bits AS (
      SELECT DISTINCT {_bloom_bit_sql('k', 'h')} AS bit FROM build CROSS JOIN hashes
    ), probe AS (
      SELECT o.o_orderkey, o.o_custkey, h.h, {_bloom_bit_sql('o.o_custkey', 'h.h')} AS bit
      FROM orders o CROSS JOIN hashes h
    ), candidates AS (
      SELECT o_orderkey, o_custkey
      FROM probe JOIN bits USING (bit)
      GROUP BY o_orderkey, o_custkey
      HAVING COUNT(*) = {BLOOM_K}
    ), truth AS (
      SELECT o_orderkey FROM orders WHERE o_custkey IN (SELECT k FROM build)
    )
    SELECT CAST((SELECT COUNT(*) FROM orders) AS BIGINT) AS n_orders,
           CAST((SELECT COUNT(*) FROM candidates) AS BIGINT) AS n_candidates,
           CAST((SELECT COUNT(*) FROM truth) AS BIGINT) AS n_true_matches,
           CAST((SELECT COUNT(*) FROM candidates) - (SELECT COUNT(*) FROM truth)
                AS BIGINT) AS n_false_positives
    """,
    tags=("A4", "J4"),
)
def bloom_join_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[A4/J4] Declarative Bloom-filter join pruning, error-audited.

    Build side: distinct BUILDING-segment customer keys → k md5-derived
    bit positions each → a DISTINCT bit set of at most BLOOM_BITS rows,
    broadcast to the probe side (orders). An order is a candidate iff all
    BLOOM_K of its key's bits are present. The query reports the filter's
    own confusion summary (candidates vs exact semi-join truth) — the
    measurable form of the runtime bloom pruning Spark's optimizer
    injects into shuffle joins at scale. Every join here is broadcast
    (bit set ≤ 4096 rows); the probe side is never shuffled.
    """
    hashes = F.explode(F.array(*[F.lit(h) for h in range(BLOOM_K)])).alias("h")

    def bloom_bit(col: F.Column) -> F.Column:
        raw = F.conv(
            F.substring(
                F.md5(F.concat(F.col("h").cast("string"), F.lit("#"), col.cast("string"))),
                1,
                15,
            ),
            16,
            10,
        )
        return (raw.cast("long") % BLOOM_BITS).alias("bit")

    build = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").alias("k"))
        .distinct()
    )
    bits = build.select(hashes, "k").select(bloom_bit(F.col("k"))).distinct()
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    probe = orders.select("o_orderkey", "o_custkey", hashes).select(
        "o_orderkey", "o_custkey", "h", bloom_bit(F.col("o_custkey"))
    )
    candidates = (
        probe.join(F.broadcast(bits), "bit")
        .groupBy("o_orderkey", "o_custkey")
        .agg(F.count(F.lit(1)).alias("nbits"))
        .filter(F.col("nbits") == BLOOM_K)
    )
    truth = orders.join(F.broadcast(build), orders["o_custkey"] == build["k"], "left_semi")
    n_orders = orders.agg(F.count(F.lit(1)).cast("long").alias("n_orders"))
    n_cand = candidates.agg(F.count(F.lit(1)).cast("long").alias("n_candidates"))
    n_true = truth.agg(F.count(F.lit(1)).cast("long").alias("n_true_matches"))
    return (
        n_orders.crossJoin(n_cand)
        .crossJoin(n_true)
        .select(
            "n_orders",
            "n_candidates",
            "n_true_matches",
            (F.col("n_candidates") - F.col("n_true_matches")).alias("n_false_positives"),
        )
    )


#: KMV (k-minimum-values / theta-style) sketch size. 64 keeps relative
#: error ~ 1/sqrt(K-1) ≈ 13% — small enough to exercise the estimator
#: (not degenerate-exact) on the fixture's distinct counts.
KMV_K = 64
KMV_FRAC_DIV = float(16 ** 13)  # first 13 hex chars → fraction of [0,1)


@query(
    "kmv_distinct",
    oracle=f"""
    WITH dh AS (
      SELECT DISTINCT event_type, md5(CAST(user_id AS VARCHAR)) AS h FROM events
      WHERE user_id IS NOT NULL
    ), ranked AS (
      SELECT event_type, h,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rn
      FROM dh
    ), sk AS (SELECT event_type, h FROM ranked WHERE rn <= {KMV_K}),
    per AS (
      SELECT event_type, MAX(h) AS kth, COUNT(*) AS n_sketch FROM sk GROUP BY event_type
    ), exact_per AS (
      SELECT event_type, COUNT(DISTINCT user_id) AS exact_distinct FROM events GROUP BY event_type
    ), merged_sk AS (
      SELECT h FROM (
        SELECT DISTINCT h FROM sk
      ) ORDER BY h LIMIT {KMV_K}
    ), merged AS (
      SELECT 'ALL' AS event_type, MAX(h) AS kth, COUNT(*) AS n_sketch FROM merged_sk
    ), exact_all AS (
      SELECT 'ALL' AS event_type, COUNT(DISTINCT user_id) AS exact_distinct FROM events
    ), unioned AS (
      SELECT p.event_type, p.kth, p.n_sketch, x.exact_distinct
      FROM per p JOIN exact_per x USING (event_type)
      UNION ALL
      SELECT m.event_type, m.kth, m.n_sketch, a.exact_distinct
      FROM merged m JOIN exact_all a USING (event_type)
    )
    SELECT event_type,
           CAST(n_sketch AS BIGINT) AS n_sketch,
           CASE WHEN n_sketch < {KMV_K} THEN CAST(n_sketch AS DOUBLE)
                WHEN CAST('0x' || substr(kth, 1, 13) AS BIGINT) = 0 THEN NULL
                ELSE ROUND(({KMV_K} - 1) /
                     (CAST('0x' || substr(kth, 1, 13) AS BIGINT) / {KMV_FRAC_DIV!r}), 4)
           END AS est_distinct,
           CAST(exact_distinct AS BIGINT) AS exact_distinct
    FROM unioned
    ORDER BY event_type
    """,
    tags=("A4",),
)
def kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[A4] KMV (k-minimum-values, the theta-sketch core) distinct-count
    sketch with a SET-OPERATION merge: per event_type the sketch is the
    K smallest md5(user_id) values; |distinct| ≈ (K-1)/kth-hash-fraction.
    Sketches MERGE by taking the K smallest of the union of sketch
    sets — the 'ALL' row here is estimated purely from the five per-type
    sketches (union semantics: a user hashing identically in two cohorts
    dedups), never from re-reading the data: exactly how a 100 TB
    corpus' per-shard sketches roll up. Deterministic md5 hashing means
    the estimate itself is oracle-exact — no tolerance band.

    Scale note: the relational K-smallest (row_number over per-type
    distinct hashes) sorts each type's distinct-hash set; at extreme
    cardinalities an implementation would pre-filter h < θ for a static
    θ or carry a bounded heap in an Aggregator — the sketch contract
    (merge = k-smallest-of-union) is unchanged. Accuracy
    ~1/sqrt(K-1) ≈ 13% at K=64; the exact column sits beside the
    estimate so the error is visible and pinned."""
    e = load_table(spark, sf_dir, "events")
    # NULL user_id guard: a NULL hash would rank NULLS FIRST in Spark's
    # ascending sort but NULLS LAST in DuckDB's — filter identically
    dh = (
        e.filter(F.col("user_id").isNotNull())
        .select("event_type", F.md5(F.col("user_id").cast("string")).alias("h"))
        .distinct()
    )
    from pyspark.sql import Window

    w = Window.partitionBy("event_type").orderBy("h")
    sk = dh.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= KMV_K)
    per = sk.groupBy("event_type").agg(
        F.max("h").alias("kth"), F.count(F.lit(1)).alias("n_sketch")
    )
    exact_per = e.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("exact_distinct")
    )
    merged = (
        sk.select("h")
        .distinct()
        .orderBy("h")
        .limit(KMV_K)
        .agg(F.max("h").alias("kth"), F.count(F.lit(1)).alias("n_sketch"))
        .select(F.lit("ALL").alias("event_type"), "kth", "n_sketch")
    )
    exact_all = e.agg(F.count_distinct("user_id").alias("exact_distinct")).select(
        F.lit("ALL").alias("event_type"), "exact_distinct"
    )
    unioned = per.join(exact_per, "event_type").unionByName(
        merged.join(exact_all, "event_type")
    )
    frac = F.conv(F.substring("kth", 1, 13), 16, 10).cast("double") / F.lit(KMV_FRAC_DIV)
    # frac == 0 needs an astronomically unlikely all-zero 13-hex prefix,
    # but under ANSI mode an unguarded divide would be query-fatal
    est = F.when(F.col("n_sketch") < KMV_K, F.col("n_sketch").cast("double")).when(
        frac > 0, F.round(F.lit(KMV_K - 1) / frac, 4)
    )
    return unioned.select(
        "event_type",
        F.col("n_sketch").cast("long").alias("n_sketch"),
        est.alias("est_distinct"),
        F.col("exact_distinct").cast("long").alias("exact_distinct"),
    ).orderBy("event_type")
