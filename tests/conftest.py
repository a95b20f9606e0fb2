from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hadoop_hdfs_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
# a9b_content_checksum pins its blob corpus at import (the DuckDB oracle
# needs a literal glob); point it at the test SF before registry import.
os.environ.setdefault("SPARK_GRAFT_BLOB_DIR", SF_DIR)


@pytest.fixture(scope="session")
def spark():
    s = get_spark("hadoop-hdfs-spark-tests", cpus=8, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
