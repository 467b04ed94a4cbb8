"""Streaming sinks (SURVEY §2.1 S2/S3, §2.9 T1–T3, T11).

The reference appends into Cassandra from ``foreachBatch`` with a random
``uuid()`` key — a re-processed micro-batch lands duplicate rows
(at-least-once, SURVEY §4). Here the parity sink is ``foreachBatch`` into
parquet with a deterministic ``id`` and an anti-join against already-sunk
keys → effectively-once. At lake scale the anti-join is replaced by a
Delta/Iceberg ``MERGE`` on ``id``; the pipeline contract is unchanged.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


#: Event-date partition column added by the idempotent sink (storage
#: layout, not part of the pipeline's rename contract).
PARTITION_COL = "sink_date"


def _sink_has_data(sink_dir: str) -> bool:
    if not os.path.isdir(sink_dir):
        return False
    for root, _dirs, files in os.walk(sink_dir):
        if any(f.endswith(".parquet") for f in files):
            return True
    return False


def existing_keys_in_range(
    spark, sink_dir: str, key: str, lo, hi, horizon_days: int = 0
) -> DataFrame:
    """Keys already sunk in event-date partitions [lo - horizon, hi] —
    a partition-pruned scan (PartitionFilters on ``sink_date``), so
    per-batch anti-join cost is bounded by the horizon window, never by
    total sink history."""
    existing = spark.read.parquet(sink_dir)
    return existing.where(
        (F.col(PARTITION_COL) >= F.date_sub(F.lit(lo), horizon_days))
        & (F.col(PARTITION_COL) <= F.lit(hi))
    ).select(key)


def foreach_batch_idempotent_parquet(
    sink_dir: str, key: str = "id", ts_col: str = "datetime", horizon_days: int = 0
):
    """Build a ``foreachBatch`` function appending only not-yet-sunk rows.

    Shape parity with dags/...yfinance...py:272-279 (foreachBatch → batch
    append), plus idempotence: batch-local dedup on ``key`` then anti-join
    against already-sunk keys.

    Scale contract: the sink is hive-partitioned by event date
    (``sink_date = to_date(ts_col)``) and the anti-join reads ONLY the
    partitions spanning the incoming batch's own date range (± an optional
    ``horizon_days`` slack). The dedup ``key`` is a deterministic hash that
    includes ``ts_col``, so any exact duplicate lands in the same event-date
    partition as its original — the pruned scan cannot miss it. Per-batch
    cost is therefore O(rows in the touched date partitions), independent
    of total sink history (a long-running stream's sink grows without
    making batches slower). At lake scale the same contract is a
    Delta/Iceberg ``MERGE`` keyed on (sink_date, id).

    ``ts_col=None`` falls back to the unpartitioned full-history anti-join
    (only for keys not derived from an event time).
    """

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        fresh = batch_df.dropDuplicates([key])
        if ts_col is None:
            if _sink_has_data(sink_dir):
                existing = spark.read.parquet(sink_dir).select(key)
                fresh = fresh.join(existing, on=key, how="left_anti")
            fresh.write.mode("append").parquet(sink_dir)
            return
        dated = fresh.withColumn(PARTITION_COL, F.to_date(F.col(ts_col))).persist()
        try:
            out = dated
            if _sink_has_data(sink_dir):
                bounds = dated.agg(
                    F.min(PARTITION_COL).alias("lo"), F.max(PARTITION_COL).alias("hi")
                ).first()
                if bounds["lo"] is not None:
                    existing = existing_keys_in_range(
                        spark, sink_dir, key, bounds["lo"], bounds["hi"], horizon_days
                    )
                    out = dated.join(existing, on=key, how="left_anti")
            out.write.mode("append").partitionBy(PARTITION_COL).parquet(sink_dir)
        finally:
            dated.unpersist()

    return _write


def start_idempotent_parquet_sink(
    df: DataFrame,
    sink_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    key: str = "id",
    ts_col: str = "datetime",
    horizon_days: int = 0,
) -> StreamingQuery:
    """writeStream → foreachBatch idempotent parquet append.

    ``availableNow`` drains all available input then stops — the
    deterministic test/replay trigger (SURVEY §2.9 T1); pass False for the
    reference's continuous processing-time trigger. Checkpointing is
    mandatory (T3): offsets + state survive restarts.

    Output mode is ``append`` — the reference declares ``update`` on a
    stateless query, which executes as append anyway (SURVEY §7.6).
    """
    writer = (
        df.writeStream.outputMode("append")
        .foreachBatch(foreach_batch_idempotent_parquet(sink_dir, key, ts_col, horizon_days))
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_kafka_passthrough_sink(
    df: DataFrame,
    topic: str,
    bootstrap_servers: str,
    checkpoint_dir: str,
    available_now: bool = True,
) -> StreamingQuery:
    """T11: the declared-but-never-wired Kafka output
    (SparkProcessOperator.py:26-30) — serialize all columns to JSON and
    publish. Requires a broker; exercised only when one is configured."""
    payload = df.select(F.to_json(F.struct(*df.columns)).alias("value"))
    writer = (
        payload.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_memory_sink(
    df: DataFrame, name: str, output_mode: str = "append", available_now: bool = True
) -> StreamingQuery:
    """In-memory table sink for tests/debug."""
    writer = df.writeStream.format("memory").queryName(name).outputMode(output_mode)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
