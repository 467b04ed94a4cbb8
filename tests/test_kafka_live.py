"""Live-Kafka path (SURVEY §2.1 S1, §2.9 T11).

The sandbox has no broker and no spark-sql-kafka connector jar, so the
end-to-end test skips cleanly with the reason recorded; the WIRING
contract (the exact option set the reference's live code passes,
``plugins/Operators/SparkProcessOperator.py:19-24,96-101``) is asserted
unconditionally so a drifting option can't hide behind the skip.

To exercise the live path: run a broker (e.g. single-node KRaft), set
``KAFKA_BOOTSTRAP=host:port``, and launch Spark with
``--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-version>``.
"""

from __future__ import annotations

import json
import os
import socket

import pytest

from finance_data_ingestion_pipeline_with_kafka_spark.sources import (
    kafka_source_options,
    kafka_stream,
)

BOOTSTRAP = os.environ.get("KAFKA_BOOTSTRAP", "localhost:9092")


def _broker_reachable(addr: str, timeout: float = 1.0) -> bool:
    host, _, port = addr.partition(":")
    try:
        with socket.create_connection((host, int(port or 9092)), timeout=timeout):
            return True
    except OSError:
        return False


def _kafka_connector_available(spark) -> bool:
    """True when the spark-sql-kafka DSv2 connector is on the classpath."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.spark.sql.kafka010.KafkaSourceProvider"
        )
        return True
    except Exception:
        return False


def test_kafka_wiring_matches_reference_contract():
    """The option set must match the reference's live code: subscribe-by-
    topic, earliest offsets (SparkProcessOperator.py:100 hardcodes
    earliest over its config dict's latest — SURVEY §4), and
    failOnDataLoss=false (SparkProcessOperator.py:23)."""
    opts = kafka_source_options("yfinance_stock", "broker:9092")
    assert opts == {
        "kafka.bootstrap.servers": "broker:9092",
        "subscribe": "yfinance_stock",
        "startingOffsets": "earliest",
        "failOnDataLoss": "false",
    }
    # and the explicit-offset override stays an option, not a hardcode
    assert (
        kafka_source_options("t", "b:9092", starting_offsets="latest")["startingOffsets"]
        == "latest"
    )


def test_kafka_end_to_end_live(spark, tmp_path):
    """Produce → consume → decode → gate → idempotent sink against a real
    broker. Skips (with the precise reason) when the sandbox lacks a
    broker or the Kafka connector jar."""
    if not _broker_reachable(BOOTSTRAP):
        pytest.skip(f"no Kafka broker reachable at {BOOTSTRAP} (set KAFKA_BOOTSTRAP)")
    if not _kafka_connector_available(spark):
        pytest.skip(
            "spark-sql-kafka connector not on classpath "
            "(launch with --packages org.apache.spark:spark-sql-kafka-0-10_2.13:...)"
        )

    from pyspark.sql import functions as F

    from finance_data_ingestion_pipeline_with_kafka_spark.streaming.pipeline import (
        finnhub_pipeline,
    )
    from finance_data_ingestion_pipeline_with_kafka_spark.streaming.sinks import (
        start_idempotent_parquet_sink,
    )

    topic = f"engine_live_test_{os.getpid()}"
    msgs = [
        json.dumps({"c": ["1"], "p": 100.5 + i, "s": "AAPL", "t": 1704205200000 + i * 1000, "v": 10})
        for i in range(5)
    ]
    # produce via Spark's own batch Kafka sink — no extra client library
    (
        spark.createDataFrame([(m,) for m in msgs], ["value"])
        .select(F.col("value").cast("binary").alias("value"))
        .write.format("kafka")
        .option("kafka.bootstrap.servers", BOOTSTRAP)
        .option("topic", topic)
        .save()
    )
    sink = str(tmp_path / "kafka_sink")
    q = start_idempotent_parquet_sink(
        finnhub_pipeline(kafka_stream(spark, topic, BOOTSTRAP)),
        sink,
        str(tmp_path / "kafka_cp"),
        available_now=True,
    )
    q.awaitTermination(120)
    out = spark.read.parquet(sink)
    assert out.count() == 5
    assert out.filter(F.col("symbol") == "AAPL").count() == 5


def test_kafka_sink_wiring_reaches_datasource_resolution(spark, tmp_path):
    """Environment finding (round 4): no spark-sql-kafka jar exists
    anywhere on this box and there is no network to fetch one, so NO
    fake broker — however protocol-complete — can be driven through
    Spark's Kafka source/sink. The strongest in-sandbox assertion is
    therefore the classpath boundary: the passthrough sink must build a
    syntactically valid kafka sink spec that Spark's data-source
    resolution ACCEPTS up to provider lookup — i.e. startup fails with
    the missing-provider error (DATA_SOURCE_NOT_FOUND), never with an
    option/shape error. With the jar on the classpath the same code runs
    live (test above)."""
    import pytest as _pytest

    from finance_data_ingestion_pipeline_with_kafka_spark.sources import (
        kafka_shaped_file_stream,
        write_json_fixture,
    )
    from finance_data_ingestion_pipeline_with_kafka_spark.streaming.pipeline import (
        finnhub_pipeline,
    )
    from finance_data_ingestion_pipeline_with_kafka_spark.streaming.sinks import (
        start_kafka_passthrough_sink,
    )

    if _kafka_connector_available(spark):
        _pytest.skip("connector present: the live e2e test covers this path")

    src = str(tmp_path / "src")
    write_json_fixture(
        src,
        [json.dumps({"c": ["1"], "p": 1.0, "s": "A", "t": 1704205200000, "v": 1})],
        "part-0.json",
    )
    stream = finnhub_pipeline(kafka_shaped_file_stream(spark, src))
    with _pytest.raises(Exception) as exc:
        start_kafka_passthrough_sink(
            stream, "t", "localhost:9092", str(tmp_path / "cp")
        )
    msg = str(exc.value)
    assert "kafka" in msg.lower()
    assert "DATA_SOURCE_NOT_FOUND" in msg or "Failed to find" in msg, msg
