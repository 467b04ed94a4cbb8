"""Cassandra sink parity (SURVEY §2.1 S3/S9).

No connector jar or cluster ships in the sandbox, so the live write
skips with the reason recorded; the wiring contract — conf block and
foreachBatch shape matching the reference
(``plugins/Operators/SparkProcessOperator.py:72-77``,
``dags/ingestion_yfinance_data_to_cassandra_db.py:272-279``) — is
asserted unconditionally.
"""

from __future__ import annotations

import pytest

from finance_data_ingestion_pipeline_with_kafka_spark.streaming.cassandra import (
    CASSANDRA_FORMAT,
    cassandra_connector_available,
    cassandra_session_configs,
    foreach_batch_cassandra,
    start_cassandra_sink,
)


def test_cassandra_conf_block_matches_reference():
    cfg = cassandra_session_configs()
    assert cfg == {
        "spark.cassandra.connection.host": "cassandra",
        "spark.cassandra.connection.port": "9042",
        "spark.sql.extensions": "com.datastax.spark.connector.CassandraSparkExtensions",
        "spark.sql.catalog.cassandra": "com.datastax.spark.connector.datasource.CassandraCatalog",
        "spark.cassandra.auth.username": "cassandra",
        "spark.cassandra.auth.password": "cassandra",
    }
    # deployment overrides flow through
    assert (
        cassandra_session_configs(host="db1", port=9043)["spark.cassandra.connection.host"]
        == "db1"
    )
    assert CASSANDRA_FORMAT == "org.apache.spark.sql.cassandra"


def test_foreach_batch_closure_is_batch_append(spark):
    """The closure must issue a BATCH write in append mode through the
    connector format — verified against a recording fake, since no
    connector jar is present to execute it."""
    calls: dict = {}

    class FakeWriter:
        def format(self, fmt):
            calls["format"] = fmt
            return self

        def options(self, **kw):
            calls["options"] = kw
            return self

        def mode(self, m):
            calls["mode"] = m
            return self

        def save(self):
            calls["saved"] = True

    class FakeBatch:
        write = FakeWriter()

    foreach_batch_cassandra("finance", "stock_data")(FakeBatch(), 0)
    assert calls == {
        "format": CASSANDRA_FORMAT,
        "options": {"table": "stock_data", "keyspace": "finance"},
        "mode": "append",
        "saved": True,
    }


def test_cassandra_live_sink(spark, tmp_path):
    """End-to-end micro-batch append into a live Cassandra — skips with
    the precise reason when the connector jar is absent."""
    if not cassandra_connector_available(spark):
        pytest.skip(
            "spark-cassandra-connector not on classpath (launch with --packages "
            "com.datastax.spark:spark-cassandra-connector_2.13:...)"
        )
    from finance_data_ingestion_pipeline_with_kafka_spark.sources import (
        kafka_shaped_file_stream,
        write_json_fixture,
    )
    from finance_data_ingestion_pipeline_with_kafka_spark.streaming.pipeline import (
        finnhub_pipeline,
    )

    src = tmp_path / "src"
    write_json_fixture(
        str(src), ['{"c":["1"],"p":100.5,"s":"AAPL","t":1704205200000,"v":10}']
    )
    q = start_cassandra_sink(
        finnhub_pipeline(kafka_shaped_file_stream(spark, str(src))),
        "finance",
        "stock_trade",
        str(tmp_path / "cp"),
    )
    q.awaitTermination(120)


def test_cassandra_read_reaches_datasource_resolution(spark):
    """Classpath-boundary assertion (the Kafka-sink pattern,
    tests/test_kafka_live.py): with no spark-cassandra-connector jar in
    this environment, `read_cassandra_table` must build a spec Spark's
    data-source resolution accepts up to provider lookup — failing with
    the missing-provider error, never an option/shape error. With the
    jar present the live test above covers the same path."""
    from finance_data_ingestion_pipeline_with_kafka_spark.streaming.cassandra import (
        cassandra_connector_available,
        read_cassandra_table,
    )

    if cassandra_connector_available(spark):
        pytest.skip("connector present: the live test covers this path")
    with pytest.raises(Exception) as exc:
        read_cassandra_table(spark, "finance", "stock_data").collect()
    msg = str(exc.value)
    assert "cassandra" in msg.lower()
    assert "DATA_SOURCE_NOT_FOUND" in msg or "Failed to find" in msg, msg
