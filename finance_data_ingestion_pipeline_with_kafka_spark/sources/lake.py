"""At-rest lake layout (SURVEY §2.1 S6/S8, §4 partitioning; the 100 TB
posture made concrete).

Three mechanisms, each with a test pinning the plan it buys:

* **Partitioned writes** (`write_partitioned`): hive-style directory
  partitioning (e.g. by event date/symbol). Buys *partition pruning* — a
  filtered read lists only matching directories; at 100 TB a one-day query
  touches 1/365th of the files before any I/O.
* **Bucketed tables** (`write_bucketed`): pre-shuffled storage on the join
  key. Buys *shuffle-free joins/aggregations* — two tables bucketed on the
  same key join with zero Exchange in the plan; at 100 TB this removes the
  dominant network cost of fact-fact joins.
* **DDL parity** (`create_table_ddl`): the reference's CREATE-IF-ABSENT
  contract (dags/...yfinance...py:108-138) expressed against the Spark
  catalog instead of Cassandra.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    """Hive-style partitioned parquet. Partition columns should be
    low-cardinality (date, symbol-prefix, source) — one directory per
    value per write."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 8,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed + sorted managed table. Joins/groupBys on ``bucket_col``
    between tables with the same bucketing need no shuffle (asserted in
    tests/test_lake.py)."""
    writer = df.write.mode(mode).format("parquet").bucketBy(n_buckets, bucket_col)
    if sort_col is not None:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table)


def create_table_ddl(spark: SparkSession, table: str, schema_ddl: str, location: str) -> None:
    """CREATE TABLE IF NOT EXISTS ... USING parquet — the reference's
    keyspace/table bootstrap (S6) against the Spark catalog."""
    spark.sql(
        f"CREATE TABLE IF NOT EXISTS {table} ({schema_ddl}) "
        f"USING parquet LOCATION '{location}'"
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    shard_key: str,
    mode: str = "overwrite",
) -> None:
    """Balanced, deterministic output sharding for training-data exports:
    shard = md5-bucket of ``shard_key`` modulo ``n_shards``, then one file
    per shard via ``repartition(n_shards, shard)``. Deterministic (a row
    always lands in the same shard across rebuilds — same property as
    ``operators/sampling.py`` splits), balanced (hash-uniform, no
    straggler shards), and downstream loaders can read any subset of
    shards as an unbiased sample. At 100 TB pick n_shards so each shard
    is ~0.5–1 GB."""
    from pyspark.sql import functions as F

    shard = (
        F.conv(F.substring(F.md5(F.col(shard_key).cast("string")), 1, 8), 16, 10)
        .cast("long") % n_shards
    ).alias("shard")
    (
        df.withColumn("shard", shard)
        .repartition(n_shards, "shard")
        .write.mode(mode)
        .partitionBy("shard")
        .parquet(path)
    )


def compact_small_files(
    spark: SparkSession, path: str, target_file_bytes: int = 128 * 1024 * 1024
) -> int:
    """Small-files compaction: rewrite a parquet directory into
    ceil(total_bytes / target) files. Streaming appends and fine-grained
    partitions accumulate KB-sized files whose open/footer overhead
    dominates scans at lake scale; periodic compaction restores
    ~target-sized files. Returns the new file count.

    Concurrency contract: SINGLE WRITER, NO CONCURRENT READERS during the
    swap. The swap is two ``os.rename`` calls — between them the path does
    not exist (a concurrent reader errors), a crash between them leaves
    only ``<path>.old``, and rename fails across filesystems (the temp dir
    is created alongside ``path`` so both live on one filesystem). When
    readers must never block, use a table format whose commit is atomic —
    Delta/Iceberg ``rewrite_data_files`` — instead of raw-directory
    compaction; this helper is for maintenance windows on plain parquet."""
    import math
    import os
    import shutil

    total = sum(
        os.path.getsize(os.path.join(root, f))
        for root, _, files in os.walk(path)
        for f in files
        if f.endswith(".parquet")
    )
    n_files = max(1, math.ceil(total / target_file_bytes))
    tmp = path.rstrip("/") + ".compacting"
    spark.read.parquet(path).repartition(n_files).write.mode("overwrite").parquet(tmp)
    old = path.rstrip("/") + ".old"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    return n_files
