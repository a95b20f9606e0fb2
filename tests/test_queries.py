"""The local mirror of the driver's correctness gate: every registered query
runs under Spark AND its DuckDB oracle; results must hash-match."""

from __future__ import annotations

import pytest

from hadoop_hdfs_spark import registry
from hadoop_hdfs_spark.testing import assert_query_matches_oracle

QUERIES = registry.queries()
ORACLES = registry.oracle_sql()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, sf_dir, name):
    if name not in ORACLES:
        # rows-only check (non-SQL-expressible op)
        n = QUERIES[name](spark, sf_dir).count()
        assert n >= 0
        return
    n = assert_query_matches_oracle(spark, QUERIES[name], ORACLES[name], sf_dir)
    assert n > 0, f"{name} returned no rows — trivial result proves nothing"
