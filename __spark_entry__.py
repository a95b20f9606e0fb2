"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (ContentSummary for every directory
— the reference's du/count, NamenodeFsck-adjacent) on sf0.001.
``queries()``/``oracle_sql()`` expose the full operator registry; see
``hadoop_hdfs_spark/registry.py`` and SURVEY.md §2.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hadoop_hdfs_spark import registry  # noqa: E402

_SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return registry.queries()["a1_content_summary"](spark, _SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query (entity CTE prelude included)."""
    return registry.oracle_sql()
