"""t2-style correctness: every REGISTRY query vs its DuckDB oracle at
sf0.001 (the driver repeats this at sf0.01)."""

import pytest

from es_analytics_spark.oracle import compare_query, duck_connection
from es_analytics_spark.queries import REGISTRY


@pytest.fixture(scope="module")
def con(sf_dir):
    return duck_connection(sf_dir)


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(spark, con, sf_dir, name):
    result = compare_query(spark, con, sf_dir, name)
    assert result.ok, result.detail
