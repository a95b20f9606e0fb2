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
