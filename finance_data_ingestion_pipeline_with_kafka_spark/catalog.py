"""Table catalog over the driver's parquet fixtures (TESTDATA.md).

``load_table`` is a plain columnar parquet scan — Catalyst pushes filters
and prunes columns into the scan (verified in tests/test_plans.py). At
100 TB the same call reads a date/symbol-partitioned parquet lake and
partition pruning applies; nothing in the query layer changes.
"""

from __future__ import annotations

import os
import threading
import weakref

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: Oracle-SQL CTE normalizing events.ts to µs precision (DuckDB reads the
#: parquet as TIMESTAMP_NS; Spark-side we truncate nanos → µs identically).
EVENTS_US = "events_us AS (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events)"

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

#: Surrogate-key columns shifted per replica when a table is replicated
#: for the scale-crossover bench (TPC-H-style scaling: more orders/
#: customers/parts/documents, not N copies of the same keys — preserves
#: join selectivity so work scales linearly like real data growth).
#: region/nation are true fixed-size dims: never replicated.
KEY_SHIFT_COLS: dict[str, tuple[str, ...]] = {
    "customer": ("c_custkey",),
    "supplier": ("s_suppkey",),
    "part": ("p_partkey",),
    "orders": ("o_orderkey", "o_custkey"),
    "lineitem": ("l_orderkey", "l_partkey", "l_suppkey"),
    "events": ("event_id", "user_id"),
    "documents": ("doc_id",),
    "embeddings": ("vec_id",),
    "region": (),
    "nation": (),
}

#: Key-shift stride — far above any fixture key, far below int64 overflow
#: even at 1000 replicas.
KEY_SHIFT = 10**12

#: Memoized unresolved scans: session → {(sf_dir, table, …): DataFrame}. A
#: DataFrame is an immutable logical plan, so reuse is safe — and it skips
#: the driver-side file listing + parquet footer/schema read that
#: ``spark.read.parquet`` repeats on every call (~100 ms per table, the
#: dominant cost of multi-table plan construction at small SF).
#: The outer map is WEAKLY keyed by the live session object (not
#: ``id(spark)``, which CPython can reuse after a stopped session is
#: GC'd): a collected session releases its scans and the JVM objects they
#: pin. The inner map is capped, evicting oldest-first.
_SCAN_CACHE: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()
_SCAN_CACHE_MAX = 256  # per session: ~10 tables × few sf dirs × env combos
_SCAN_CACHE_LOCK = threading.Lock()  # bench's concurrent phase shares one session

#: Lake-layout ingest (opt-in via ENGINE_LAKE_CACHE=1). The driver's
#: fixtures are written as ONE parquet row group per table, which caps
#: every scan stage — IO, decode, filter, explode, partial aggregation —
#: at ONE task regardless of cores (a single row group is one split).
#: A real deployment never queries someone else's layout: the engine
#: ingests into its own lake (sources/lake.py) and queries that. This
#: cache is that ingest step for the fixture tables: one-time rewrite of
#: each large table into ``_N_LAKE_FILES`` files (→ that many parallel
#: scan tasks), stored under spark-warehouse/, invalidated by source
#: mtime. Row order changes (round-robin repartition), which is
#: immaterial: every result compare is order-insensitive and every
#: aggregate/pick in the engine is order-independent by design.
#: Default OFF so the driver's correctness sweep reads the pristine
#: fixtures; bench.py turns it on (and reports that it did).
_N_LAKE_FILES = 16
_LAKE_CACHE_MIN_BYTES = 100_000  # tiny dims gain nothing from 16 splits


def _lake_cache_dir(sf_dir: str, name: str) -> str:
    base = os.environ.get(
        "ENGINE_LAKE_DIR",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "spark-warehouse",
            "lakecache",
        ),
    )
    return os.path.join(base, os.path.basename(sf_dir.rstrip("/")), name)


def _lake_cached_scan(spark: SparkSession, df: DataFrame, src_path: str, dest: str) -> DataFrame:
    marker = os.path.join(dest, "_SUCCESS")
    if (
        not os.path.exists(marker)
        or os.path.getmtime(marker) < os.path.getmtime(src_path)
    ):
        df.repartition(_N_LAKE_FILES).write.mode("overwrite").parquet(dest)
    return spark.read.parquet(dest)


def load_table(spark: SparkSession, sf_dir: str, name: str, replicate: int = 1) -> DataFrame:
    """Columnar scan of a fixture table. ``replicate > 1`` unions N
    key-shifted copies (see ``KEY_SHIFT_COLS``) — TPC-H-style N× data
    growth with preserved join selectivity, used by the bench's
    scale-crossover measurement. Fixed dims (region/nation) never grow."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    if replicate == 1:
        # env override lets the bench scale-crossover run the unmodified
        # catalog queries against an N×-replicated scan
        replicate = int(os.environ.get("ENGINE_SCAN_REPLICATE", "1"))
    if not KEY_SHIFT_COLS.get(name, ()):  # fixed-size dims don't grow
        replicate = 1
    lake_cache = os.environ.get("ENGINE_LAKE_CACHE") == "1"
    per_session = _SCAN_CACHE.get(spark)
    if per_session is None:
        per_session = _SCAN_CACHE.setdefault(spark, {})
    key = (sf_dir, name, replicate, lake_cache)
    cached = per_session.get(key)
    if cached is not None:
        return cached
    # Timestamp determinism on externally built sessions (the driver's
    # vanilla session inherits the HOST timezone): every events-derived
    # epoch/window/watermark result — and the TIMESTAMP_NTZ→TIMESTAMP cast
    # below — is only oracle-exact when the session runs in UTC. The
    # engine's own builder (session.get_spark) already pins this.
    if spark.conf.get("spark.sql.session.timeZone") != "UTC":
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS), which Spark rejects by
        # default. Read nanos as long and truncate to microseconds — the
        # same truncation DuckDB applies casting TIMESTAMP_NS → TIMESTAMP,
        # so both engines see identical µs values. The engine's own builder
        # (session.get_spark) sets this conf at build time; this guarded
        # set only covers externally built sessions (the driver's vanilla
        # session). Value is a constant "true", so concurrent setters
        # cannot race to different states.
        if spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true":
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        raw = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        ts_type = dict(raw.dtypes).get("ts")
        if ts_type == "bigint":
            df = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            # Plain parquet TIMESTAMP(µs, isAdjustedToUTC=false) infers as
            # TIMESTAMP_NTZ under Spark 4. The session runs in UTC, so the
            # NTZ→LTZ cast is value-preserving and restores the single
            # TimestampType the operators (epoch casts, windows,
            # watermarks) are written against.
            df = raw.withColumn("ts", F.col("ts").cast("timestamp"))
        else:  # engine-written lake copies already store ts as TIMESTAMP(µs)
            df = raw
    else:
        df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    src_path = os.path.join(sf_dir, f"{name}.parquet")
    if (
        lake_cache
        # replicate>1 composes with the 16-file layout: replication is a
        # per-row generator (single scan branch), so scan parallelism
        # comes entirely from file splits — 16 tasks each decoding its
        # split ONCE and generating N key-shifted copies
        and os.path.exists(src_path)
        and os.path.getsize(src_path) >= _LAKE_CACHE_MIN_BYTES
    ):
        df = _lake_cached_scan(spark, df, src_path, _lake_cache_dir(sf_dir, name))
    if replicate > 1:
        df = _replicate_shifted(df, name, replicate)
    with _SCAN_CACHE_LOCK:
        while len(per_session) >= _SCAN_CACHE_MAX:
            try:
                per_session.pop(next(iter(per_session)))
            except (KeyError, StopIteration):
                break
        per_session[key] = df
    return df


def _replicate_shifted(df: DataFrame, name: str, replicate: int) -> DataFrame:
    """``replicate`` key-shifted copies of every row (shift k·KEY_SHIFT,
    k = 0..replicate-1) — new entities, same distributions.

    Emitted as a single scan branch crossed with a broadcast
    ``range(replicate)`` spine, NOT an N-way plan union: a union of N
    branches re-decodes the same parquet bytes N times AND splits
    execution across N separate codegen stages, each of which must reach
    JIT heat independently — at N=30 that made the scale-crossover
    measure JVM warm-up, not the plan (bimodal 6 s/14 s runs). One
    branch decodes each file split once, generates N copies per row, and
    keeps ONE hot codegen loop; scan parallelism comes from file splits
    (the lake layout), exactly like a real N×-sized lake.

    The spine is a cross JOIN (row-multiplying) rather than an
    ``explode`` generator deliberately: Catalyst's size estimate for
    ``Generate`` is its child's, so an exploded fact table is estimated
    at 1/N its true size and downstream joins mis-plan BROADCAST on an
    N×-fact side (observed driver OOM at N=30). Join stats multiply, so
    the crossed plan is estimated ≥N× — never mis-broadcast."""
    shift_cols = set(KEY_SHIFT_COLS[name])
    spine = df.sparkSession.range(replicate).select(F.col("id").alias("__rep"))
    return df.crossJoin(F.broadcast(spine)).select(
        *[
            (F.col(c) + F.col("__rep") * F.lit(KEY_SHIFT)).alias(c)
            if c in shift_cols
            else F.col(c)
            for c in df.columns
        ]
    )


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a SQL temp view (entry point 2:
    ``spark.sql`` over views — SURVEY §3.3)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
