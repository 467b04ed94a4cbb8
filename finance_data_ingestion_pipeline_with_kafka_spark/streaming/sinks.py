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


def foreach_batch_idempotent_parquet(sink_dir: str, key: str = "id"):
    """Build a ``foreachBatch`` function appending only not-yet-sunk rows.

    Shape parity with dags/...yfinance...py:272-279 (foreachBatch → batch
    append), plus idempotence: batch-local dedup on ``key`` then anti-join
    against the sink's existing keys.
    """

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        fresh = batch_df.dropDuplicates([key])
        if os.path.isdir(sink_dir) and any(
            f.endswith(".parquet") for f in os.listdir(sink_dir)
        ):
            existing = spark.read.parquet(sink_dir).select(key)
            fresh = fresh.join(existing, on=key, how="left_anti")
        fresh.write.mode("append").parquet(sink_dir)

    return _write


def start_idempotent_parquet_sink(
    df: DataFrame,
    sink_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    key: str = "id",
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
        .foreachBatch(foreach_batch_idempotent_parquet(sink_dir, key))
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
