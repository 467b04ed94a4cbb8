"""Set operations (SURVEY §2.7) — the combined-tape / feed-divergence
family over union-compatible normalized feeds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query


def _normalized_feeds(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """Two union-compatible (entity, day) feeds — the shape of the two sink
    tables after normalization (SURVEY §2.7): customers seen via orders
    vs customers seen via high-balance status."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    feed_a = o.select(F.col("o_custkey").alias("custkey")).distinct()
    feed_b = c.filter(F.col("c_acctbal") > 0).select(F.col("c_custkey").alias("custkey"))
    return feed_a, feed_b


_FEED_A = "SELECT DISTINCT o_custkey AS custkey FROM orders"
_FEED_B = "SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 0"


@query(
    "union_feeds",
    oracle=f"""
    SELECT custkey, COUNT(*) AS appearances FROM (
      ({_FEED_A}) UNION ALL ({_FEED_B})
    ) GROUP BY custkey ORDER BY custkey
    """,
    tags=("SET",),
)
def union_feeds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL (combined tape) + appearance counts."""
    a, b = _normalized_feeds(spark, sf_dir)
    return (
        a.unionByName(b)
        .groupBy("custkey")
        .agg(F.count(F.lit(1)).alias("appearances"))
        .orderBy("custkey")
    )


@query(
    "intersect_feeds",
    oracle=f"({_FEED_A}) INTERSECT ({_FEED_B}) ORDER BY custkey",
    tags=("SET",),
)
def intersect_feeds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT — entities present in both feeds."""
    a, b = _normalized_feeds(spark, sf_dir)
    return a.intersect(b).orderBy("custkey")


@query(
    "except_feeds",
    oracle=f"({_FEED_B}) EXCEPT ({_FEED_A}) ORDER BY custkey",
    tags=("SET",),
)
def except_feeds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT — feed divergence: positive-balance customers who never
    ordered."""
    a, b = _normalized_feeds(spark, sf_dir)
    return b.exceptAll(a).orderBy("custkey")


@query(
    "union_by_name_missing",
    oracle="""
    SELECT custkey, src, bal FROM (
      SELECT o_custkey AS custkey, 'orders' AS src, CAST(NULL AS DOUBLE) AS bal FROM orders
      UNION ALL
      SELECT c_custkey AS custkey, 'customer' AS src, c_acctbal AS bal FROM customer
    ) ORDER BY custkey, src, bal
    """,
    tags=("SET",),
)
def union_by_name_missing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``unionByName(allowMissingColumns=True)`` — schema-mismatched feeds
    merged with NULL fill (the yfinance/finnhub sink-merge case)."""
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey"), F.lit("orders").alias("src")
    )
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey"),
        F.lit("customer").alias("src"),
        F.col("c_acctbal").alias("bal"),
    )
    return o.unionByName(c, allowMissingColumns=True).orderBy("custkey", "src", "bal")


@query(
    "sql_entry_revenue",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE) AS total_revenue
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '2000-01-01'
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("SQL",),
)
def sql_entry_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[§3.3 entry point 2] The same engine through ``spark.sql`` over
    registered temp views — proves the SQL surface is first-class (the
    Jupyter-notebook usage the reference promises, README.md:15)."""
    from ..catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderpriority,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE) AS total_revenue
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '2000-01-01'
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        """
    )


_MULTI_A = "SELECT o_orderstatus AS status FROM orders WHERE o_custkey < 200"
_MULTI_B = "SELECT o_orderstatus AS status FROM orders WHERE o_custkey < 100"


@query(
    "except_all_multiset",
    oracle=f"""
    SELECT status, COUNT(*) AS n FROM (
      ({_MULTI_A}) EXCEPT ALL ({_MULTI_B})
    ) GROUP BY status ORDER BY status
    """,
    tags=("SET",),
)
def except_all_multiset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL — multiset difference (each duplicate counts), the
    feed-divergence check that preserves volumes instead of collapsing
    to distinct rows."""
    o = load_table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_custkey") < 200).select(F.col("o_orderstatus").alias("status"))
    b = o.filter(F.col("o_custkey") < 100).select(F.col("o_orderstatus").alias("status"))
    return (
        a.exceptAll(b)
        .groupBy("status")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("status")
    )


@query(
    "intersect_all_multiset",
    oracle=f"""
    SELECT status, COUNT(*) AS n FROM (
      ({_MULTI_A}) INTERSECT ALL ({_MULTI_B})
    ) GROUP BY status ORDER BY status
    """,
    tags=("SET",),
)
def intersect_all_multiset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL — multiset intersection (min of per-side counts)."""
    o = load_table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_custkey") < 200).select(F.col("o_orderstatus").alias("status"))
    b = o.filter(F.col("o_custkey") < 100).select(F.col("o_orderstatus").alias("status"))
    return (
        a.intersectAll(b)
        .groupBy("status")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("status")
    )


@query(
    "scd_upsert",
    oracle="""
    WITH upd AS (
      SELECT o_orderkey, o_custkey, o_orderstatus,
             ROUND(o_totalprice * 1.1, 4) AS o_totalprice
      FROM orders WHERE o_orderkey % 10 = 0
    ), kept AS (
      SELECT o_orderkey, o_custkey, o_orderstatus,
             ROUND(o_totalprice, 4) AS o_totalprice
      FROM orders o
      WHERE NOT EXISTS (SELECT 1 FROM upd u WHERE u.o_orderkey = o.o_orderkey)
    )
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, 'updated' AS src
    FROM upd
    UNION ALL
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, 'kept' AS src
    FROM kept
    ORDER BY o_orderkey
    """,
    tags=("SET", "J4"),
)
def scd_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE/upsert semantics on plain parquet tables: an incoming change
    feed (here: a 10% slice of orders with adjusted prices) replaces
    matching keys and the rest of the base survives — expressed as
    change-feed ∪ (base ANTI-JOIN change-feed). This is exactly the
    engine's idempotent-sink contract generalized to batch: at lake scale
    the same statement is a Delta/Iceberg ``MERGE INTO`` keyed on the
    deterministic id, and the anti-join shuffles only the base keys
    (Catalyst plans a hash anti-join; the change feed is typically the
    small broadcast side)."""
    o = load_table(spark, sf_dir, "orders")
    cols = ["o_orderkey", "o_custkey", "o_orderstatus"]
    upd = (
        o.filter(F.col("o_orderkey") % 10 == 0)
        .select(*cols, F.round(F.col("o_totalprice") * 1.1, 4).alias("o_totalprice"))
        .withColumn("src", F.lit("updated"))
    )
    kept = (
        o.join(upd.select("o_orderkey"), "o_orderkey", "left_anti")
        .select(*cols, F.round("o_totalprice", 4).alias("o_totalprice"))
        .withColumn("src", F.lit("kept"))
    )
    return upd.unionByName(kept).orderBy("o_orderkey")


@query(
    "scd2_intervals",
    oracle="""
    SELECT o_custkey,
           CAST(ROW_NUMBER() OVER w AS BIGINT) AS version,
           o_orderdate AS valid_from,
           LEAD(o_orderdate) OVER w AS valid_to,
           LEAD(o_orderdate) OVER w IS NULL AS is_current,
           o_orderstatus AS status
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ORDER BY o_custkey, version
    """,
    tags=("SET", "W2"),
)
def scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension TYPE 2 history build — the other half of
    the MERGE story next to ``scd_upsert`` (type 1): each change event
    becomes a versioned row with a validity interval [valid_from,
    valid_to), closed by the NEXT change's timestamp (``lead`` over the
    deterministic per-key order) and left open (`is_current`) on the
    latest. One shuffle on the dimension key; at lake scale this is the
    standard as-of-queryable dimension snapshot build, and the `asof_join`
    operator is its consumer."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    nxt = F.lead("o_orderdate").over(w)
    return o.select(
        "o_custkey",
        F.row_number().over(w).cast("bigint").alias("version"),
        F.col("o_orderdate").alias("valid_from"),
        nxt.alias("valid_to"),
        nxt.isNull().alias("is_current"),
        F.col("o_orderstatus").alias("status"),
    ).orderBy("o_custkey", "version")


@query(
    "scd2_point_in_time",
    oracle="""
    WITH hist AS (
      SELECT o_custkey,
             CAST(ROW_NUMBER() OVER w AS BIGINT) AS version,
             o_orderdate AS valid_from,
             LEAD(o_orderdate) OVER w AS valid_to,
             o_orderstatus AS status
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ), probes AS (
      SELECT l_orderkey, o_custkey AS custkey, l_shipdate AS probe_ts
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE l_orderkey % 50 = 0 AND l_linenumber = 1
    )
    SELECT p.l_orderkey, p.custkey, p.probe_ts, h.version, h.status
    FROM probes p JOIN hist h
      ON h.o_custkey = p.custkey
     AND h.valid_from <= p.probe_ts
     AND (h.valid_to IS NULL OR p.probe_ts < h.valid_to)
    ORDER BY l_orderkey
    """,
    tags=("J6", "W2"),
)
def scd2_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (as-of) lookup against the SCD2 history — the
    canonical consumer of ``scd2_intervals`` and THE temporal-correctness
    pattern of financial data (training a model on the dimension row
    that was valid at event time, never a future version). Probes
    (sampled lineitems at their ship date) join the customer's version
    history on the key plus interval containment; per-key intervals are
    disjoint by construction, so each probe matches at most one version.
    Scale: equi-join on the dimension key carries the plan (hash
    partition both sides), the interval predicates filter inside the
    key's (small) version group — never a cross product
    (plan-pinned)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    hist = o.select(
        "o_custkey",
        F.row_number().over(w).cast("bigint").alias("version"),
        F.col("o_orderdate").alias("valid_from"),
        F.lead("o_orderdate").over(w).alias("valid_to"),
        F.col("o_orderstatus").alias("status"),
    )
    l = load_table(spark, sf_dir, "lineitem")
    probes = (
        l.filter((F.col("l_orderkey") % 50 == 0) & (F.col("l_linenumber") == 1))
        .join(o.select("o_orderkey", "o_custkey"), l["l_orderkey"] == o["o_orderkey"])
        .select(
            "l_orderkey",
            F.col("o_custkey").alias("custkey"),
            F.col("l_shipdate").alias("probe_ts"),
        )
    )
    return (
        probes.join(
            hist,
            (hist["o_custkey"] == probes["custkey"])
            & (hist["valid_from"] <= probes["probe_ts"])
            & (hist["valid_to"].isNull() | (probes["probe_ts"] < hist["valid_to"])),
        )
        .select("l_orderkey", "custkey", "probe_ts", "version", "status")
        .orderBy("l_orderkey")
    )


@query(
    "snapshot_diff",
    oracle="""
    WITH events_us AS (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events),
    a AS (
      SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CAST(value AS DECIMAL(30,6))) AS s
      FROM events_us
      WHERE ts >= TIMESTAMP '2024-01-08' AND ts < TIMESTAMP '2024-01-10'
      GROUP BY user_id, event_type
    ), b AS (
      SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CAST(value AS DECIMAL(30,6))) AS s
      FROM events_us
      WHERE ts >= TIMESTAMP '2024-01-10' AND ts < TIMESTAMP '2024-01-12'
      GROUP BY user_id, event_type
    )
    SELECT COALESCE(a.user_id, b.user_id) AS user_id,
           COALESCE(a.event_type, b.event_type) AS event_type,
           CASE WHEN a.user_id IS NULL THEN 'added'
                WHEN b.user_id IS NULL THEN 'removed'
                WHEN a.n = b.n AND a.s = b.s THEN 'unchanged'
                ELSE 'changed' END AS change_type,
           a.n AS old_n, b.n AS new_n,
           CAST(a.s AS DOUBLE) AS old_sum, CAST(b.s AS DOUBLE) AS new_sum
    FROM a FULL OUTER JOIN b
      ON a.user_id = b.user_id AND a.event_type = b.event_type
    ORDER BY user_id, event_type
    """,
    tags=("J3", "A1"),
)
def snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[J3/A1] CDC-style snapshot diff — the change report between two
    rebuilt states of a keyed mart table (here: per (user, event type)
    activity state over two adjacent 2-day windows): FULL OUTER join on
    the key, classifying every key as added / removed / changed /
    unchanged with old and new values side by side. This is the audit
    complement of ``scd_upsert`` (which APPLIES changes): it COMPUTES
    them — what a lakehouse MERGE would write, shown before writing.

    Equality for 'unchanged' compares the exact DECIMAL sums (never
    derived doubles), so a key flips class identically in both engines;
    the window filters push into the scan on both branches. All four
    classes are exercised by the fixture at every SF except 'unchanged'
    (two continuous-valued sums colliding is measure-zero; the branch is
    still covered by the count compare).

    At 100 TB: two pruned scans of the events lake (the date filters are
    partition prunes on a date-partitioned layout) and one shuffle each
    onto the diff key, then a key-co-located full outer join — diff cost
    scales with the two snapshots, not with history."""
    e = load_table(spark, sf_dir, "events")

    def snap(lo: str, hi: str) -> DataFrame:
        return (
            e.filter(
                (F.col("ts") >= F.lit(lo).cast("timestamp"))
                & (F.col("ts") < F.lit(hi).cast("timestamp"))
            )
            .groupBy("user_id", "event_type")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n"),
                F.sum(F.col("value").cast("decimal(30,6)")).alias("s"),
            )
        )

    a = snap("2024-01-08", "2024-01-10")
    b = snap("2024-01-10", "2024-01-12")
    an, bn = [c + "_a" for c in a.columns], [c + "_b" for c in b.columns]
    a, b = a.toDF(*an), b.toDF(*bn)
    joined = a.join(
        b,
        (a["user_id_a"] == b["user_id_b"]) & (a["event_type_a"] == b["event_type_b"]),
        "full_outer",
    )
    return joined.select(
        F.coalesce("user_id_a", "user_id_b").alias("user_id"),
        F.coalesce("event_type_a", "event_type_b").alias("event_type"),
        F.when(F.col("user_id_a").isNull(), "added")
        .when(F.col("user_id_b").isNull(), "removed")
        .when(
            (F.col("n_a") == F.col("n_b")) & (F.col("s_a") == F.col("s_b")),
            "unchanged",
        )
        .otherwise("changed")
        .alias("change_type"),
        F.col("n_a").alias("old_n"),
        F.col("n_b").alias("new_n"),
        F.col("s_a").cast("double").alias("old_sum"),
        F.col("s_b").cast("double").alias("new_sum"),
    ).orderBy("user_id", "event_type")
