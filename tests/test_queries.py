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

def test_pivot_unpivot_roundtrip(spark, sf_dir):
    """Unpivot (melt) is pivot's inverse: melting the opcode matrix back to
    long form must reproduce the plain groupBy counts exactly."""
    from pyspark.sql import functions as F

    from hadoop_hdfs_spark import registry

    from hadoop_hdfs_spark.operators.events import _OPCODES

    wide = registry.queries()["t12_opcode_hour_pivot"](spark, sf_dir)
    long = (
        wide.unpivot(
            "hour_bucket",
            [op.lower() for op in _OPCODES],
            "op",
            "n",
        )
        .filter(F.col("n") > 0)
        .select("hour_bucket", F.upper("op").alias("op"), "n")
    )
    e = registry._entities(spark, sf_dir)
    direct = (
        e["edits"]
        .groupBy(
            (F.col("ts_ms") / 3600000).cast("long").alias("hour_bucket"), "op"
        )
        .agg(F.count("*").alias("n"))
    )
    assert long.exceptAll(direct).count() == 0
    assert direct.exceptAll(long).count() == 0
