"""Streaming sources (SURVEY §2.1 S1, S4–S5 replay).

Two interchangeable builders both yield a Kafka-shaped streaming DataFrame
(a ``value: string`` column, one JSON message per row):

* ``kafka_stream`` — the real thing: ``readStream.format("kafka")``
  exactly as the reference wires it
  (plugins/Operators/SparkProcessOperator.py:96-101), ``earliest`` offsets,
  ``failOnDataLoss=false``.
* ``kafka_shaped_file_stream`` — deterministic file replay of the same
  wire format for tests/CI (no broker in the loop). Downstream pipeline
  code is identical for both.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def kafka_source_options(
    topic: str,
    bootstrap_servers: str,
    starting_offsets: str = "earliest",
    fail_on_data_loss: bool = False,
) -> dict[str, str]:
    """The Kafka source option set, mirroring the reference's live wiring
    (plugins/Operators/SparkProcessOperator.py:96-101: subscribe + earliest,
    with failOnDataLoss=false from its config dict at :23). Factored out so
    the wiring contract is assertable in tests even when no broker or
    connector jar is present (tests/test_kafka_live.py)."""
    return {
        "kafka.bootstrap.servers": bootstrap_servers,
        "subscribe": topic,
        "startingOffsets": starting_offsets,
        "failOnDataLoss": str(fail_on_data_loss).lower(),
    }


def kafka_stream(
    spark: SparkSession,
    topic: str,
    bootstrap_servers: str,
    starting_offsets: str = "earliest",
    fail_on_data_loss: bool = False,
) -> DataFrame:
    """Kafka streaming source → ``value: string``. The reference's config
    dict says ``latest`` while its live code hardcodes ``earliest``
    (SURVEY §4 offset conflict) — here it is an explicit, tested option."""
    reader = spark.readStream.format("kafka")
    for k, v in kafka_source_options(
        topic, bootstrap_servers, starting_offsets, fail_on_data_loss
    ).items():
        reader = reader.option(k, v)
    raw = reader.load()
    # P1: raw Kafka value bytes → string (dags/...yfinance...py:254)
    return raw.selectExpr("CAST(value AS STRING) AS value")


def kafka_shaped_file_stream(
    spark: SparkSession,
    path: str,
    max_files_per_trigger: int | None = None,
    min_parallelism: int | None = None,
) -> DataFrame:
    """File-replay source with the Kafka wire shape: each line of each
    text file is one message in a ``value`` column.

    ``min_parallelism`` (r17, guide §2.5 input skew): a replay batch is
    typically ONE text file — one input split — so everything narrow
    downstream (JSON decode, the sha2 surrogate key) ran single-task no
    matter how many cores the session has; profiled at 62.5k msgs/batch
    the single-task decode chain was the dominant term of the steady
    micro-batch. Default (None) spreads each batch round-robin across
    ``defaultParallelism`` tasks — one cheap exchange of the raw message
    bytes buys cluster-wide decode, mirroring what a real Kafka source
    gets from its topic partitioning (``kafka_stream`` is untouched).
    Pass 1 to disable. Round-robin repartition is retry-deterministic
    (Spark sorts before repartition by default) and every downstream
    operator is key- or watermark-based, so results are placement-
    independent."""
    reader = spark.readStream.format("text")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    out = reader.load(path).select(F.col("value").cast("string").alias("value"))
    if min_parallelism is None:
        min_parallelism = spark.sparkContext.defaultParallelism
    if min_parallelism and min_parallelism > 1:
        out = out.repartition(min_parallelism)
    return out


def write_json_fixture(path: str, messages: list[str], filename: str = "part-0000.json") -> str:
    """Write one JSON message per line — the producer's wire format
    (StockFinanceMetrics.py:22-24: dict → JSON bytes → topic)."""
    os.makedirs(path, exist_ok=True)
    out = os.path.join(path, filename)
    with open(out, "w") as f:
        for m in messages:
            f.write(m + "\n")
    return out
