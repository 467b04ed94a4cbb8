"""Cassandra sink parity (SURVEY §2.1 S3/S9 — the reference's actual
at-rest store).

The reference lands every micro-batch in Cassandra via the DataStax DSv2
connector: session configs at
``plugins/Operators/SparkProcessOperator.py:72-77`` (connection host/port,
``CassandraSparkExtensions``, catalog registration, auth) and a
``foreachBatch`` batch-append at
``dags/ingestion_yfinance_data_to_cassandra_db.py:272-279``
(``format("org.apache.spark.sql.cassandra")`` + table/keyspace options +
``mode("append")``).

This module reproduces that exact wiring behind a connector-availability
gate: the sandbox ships no Cassandra connector jar (and no cluster), so
the live path is exercised only when
``com.datastax.spark:spark-cassandra-connector`` is on the classpath —
the wiring contract itself is asserted unconditionally in
``tests/test_cassandra_parity.py``. The engine's default sink remains the
idempotent parquet mirror (``streaming/sinks.py``): unlike the
reference's random-``uuid()`` append (at-least-once → duplicate rows on
replay, SURVEY §4), this path keeps the deterministic ``id`` so a
Cassandra ``INSERT`` overwrite per primary key is naturally idempotent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

CASSANDRA_FORMAT = "org.apache.spark.sql.cassandra"

#: DSv2 connector entry class — present iff the connector jar is on the
#: classpath (the reference loads it via spark.jars.packages,
#: SparkProcessOperator.py:70-71).
_CONNECTOR_CLASS = "com.datastax.spark.connector.datasource.CassandraCatalog"


def cassandra_session_configs(
    host: str = "cassandra",
    port: int = 9042,
    username: str = "cassandra",
    password: str = "cassandra",
    catalog_name: str = "cassandra",
) -> dict[str, str]:
    """The Spark-session conf block the reference applies
    (SparkProcessOperator.py:72-77), as a dict to feed
    ``session.get_spark(extra_conf=...)``. Includes the SQL extensions and
    catalog registration so ``spark.sql("SELECT * FROM
    cassandra.ks.table")`` resolves through the connector's DSv2 catalog
    with predicate/projection pushdown (SURVEY §4)."""
    return {
        "spark.cassandra.connection.host": host,
        "spark.cassandra.connection.port": str(port),
        "spark.sql.extensions": "com.datastax.spark.connector.CassandraSparkExtensions",
        f"spark.sql.catalog.{catalog_name}": _CONNECTOR_CLASS,
        "spark.cassandra.auth.username": username,
        "spark.cassandra.auth.password": password,
    }


def cassandra_connector_available(spark) -> bool:
    """True when the DataStax connector jar is on the JVM classpath."""
    try:
        spark._jvm.java.lang.Class.forName(_CONNECTOR_CLASS)
        return True
    except Exception:
        return False


def foreach_batch_cassandra(keyspace: str, table: str):
    """The reference's ``foreachBatch`` closure shape
    (dags/...yfinance...py:273-277): per micro-batch, a BATCH append into
    the Cassandra table through the DSv2 connector."""

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.write.format(CASSANDRA_FORMAT)
            .options(table=table, keyspace=keyspace)
            .mode("append")
            .save()
        )

    return _write


def start_cassandra_sink(
    df: DataFrame,
    keyspace: str,
    table: str,
    checkpoint_dir: str,
    available_now: bool = True,
) -> StreamingQuery:
    """writeStream → foreachBatch → Cassandra append, with mandatory
    checkpointing (the reference configures checkpointing globally,
    SparkProcessOperator.py:68-69) and ``append`` output mode (the
    reference declares ``update`` on a stateless query, which executes as
    append — SURVEY §7.6). Caller must ensure the connector is present
    (``cassandra_connector_available``)."""
    writer = (
        df.writeStream.outputMode("append")
        .foreachBatch(foreach_batch_cassandra(keyspace, table))
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_cassandra_table(spark, keyspace: str, table: str) -> DataFrame:
    """S9 batch scan for EDA — the notebook's
    ``Check_Data_from_Cassandra`` path (notebooks/EDA.ipynb cell 1)
    through the DSv2 reader (predicate/projection pushdown built-in)."""
    return (
        spark.read.format(CASSANDRA_FORMAT)
        .options(table=table, keyspace=keyspace)
        .load()
    )
