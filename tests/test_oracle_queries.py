"""Every SQL-expressible catalog query hash-matches its DuckDB oracle —
the local mirror of the driver's t2 gate, run at sf0.001 for speed
(override with TEST_SF_DIR=/root/testdata/sf0.01).
"""

import pytest

from finance_data_ingestion_pipeline_with_kafka_spark.registry import load_all

from .oracle_utils import run_and_compare

CATALOG = load_all()
ORACLE_QUERIES = sorted(n for n, s in CATALOG.items() if s.oracle is not None)
ROWS_ONLY_QUERIES = sorted(n for n, s in CATALOG.items() if s.oracle is None)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_match(spark, sf_dir, name):
    spec = CATALOG[name]
    run_and_compare(spark, sf_dir, name, spec.fn, spec.oracle)


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_runs(spark, sf_dir, name):
    """Non-SQL-expressible operators must at least run and have a stable
    schema; semantics are covered by dedicated unit tests."""
    df = CATALOG[name].fn(spark, sf_dir)
    assert df.columns  # schema resolves
    assert df.count() >= 0


def test_bad_sf_dir_raises_cleanly(spark):
    """A nonexistent data dir must surface Spark's own PATH_NOT_FOUND
    analysis error, not an engine-internal failure."""
    from pyspark.errors.exceptions.captured import AnalysisException

    with pytest.raises(AnalysisException, match="PATH_NOT_FOUND"):
        CATALOG["pricing_summary"].fn(spark, "/root/testdata/sf_nope").collect()


def test_query_reruns_are_identical(spark, sf_dir):
    """Two executions of the same query return byte-identical frames —
    the determinism contract (DECIMAL accumulation, total-order picks)."""
    import pandas as pd

    fn = CATALOG["pricing_summary"].fn
    a, b = fn(spark, sf_dir).toPandas(), fn(spark, sf_dir).toPandas()
    pd.testing.assert_frame_equal(a, b)
