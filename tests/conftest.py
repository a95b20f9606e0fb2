from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hadoop_hdfs_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
# a9b_content_checksum pins its blob corpus at import (the DuckDB oracle
# needs a literal glob); point it at the test-SF deterministic blob
# fixture before registry import (blobfixture.py — fixed bytes per SF).
from hadoop_hdfs_spark.blobfixture import blob_fixture_dir  # noqa: E402

_sf = float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in SF_DIR else 0.001
os.environ.setdefault("SPARK_GRAFT_BLOB_DIR", blob_fixture_dir(_sf))


@pytest.fixture(scope="session")
def spark():
    s = get_spark("hadoop-hdfs-spark-tests", cpus=8, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
