"""hadoop_hdfs_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of Apache Hadoop HDFS (reference:
ivankelly/hadoop-hdfs, trunk ~0.23).

The reference is a distributed filesystem; its query surface is a metadata
query API over inodes/blocks/replicas/datanodes plus an edit-log changelog
(see SURVEY.md). This package re-expresses that surface Spark-first:

- ``entities``   — the HDFS entity model as DataFrames, derived
                   deterministically from the driver's TPC-H-ish fixture
                   tables so a DuckDB oracle can verify every operator.
- ``operators``  — every SURVEY.md §2 operator as a DataFrame function.
- ``functions``  — scalar helpers (path manipulation, block-name codecs).
- ``streaming``  — edit-log replay / heartbeat-liveness / lease expiry as
                   Structured Streaming jobs.
- ``pipeline``   — LLM-training-data operators (dedup, similarity search,
                   text analysis, multimodal columns) beyond the reference
                   surface.
"""

__version__ = "0.1.0"

import os as _os

# Executor Python workers inherit PYTHONPATH from the JVM's process
# environment, not the driver's sys.path. Export the repo root at package
# import — before any SparkSession (and its JVM) can be created by a caller
# that imports this library first — so Python-shipping paths (the hftp
# DataSource, mapInPandas kernels) resolve from any cwd. A JVM started
# before this import keeps its old environment; the cluster-grade fix is
# shipping the package via --py-files. get_spark() repeats this defensively.
_repo_root = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
_existing = _os.environ.get("PYTHONPATH", "")
if _repo_root not in _existing.split(_os.pathsep):
    _os.environ["PYTHONPATH"] = (
        _repo_root + (_os.pathsep + _existing if _existing else "")
    )
del _os, _repo_root, _existing
