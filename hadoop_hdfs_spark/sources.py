"""Sources and sinks (SURVEY.md §2.1 S7/S8/S9): fsimage-snapshot load/save
and the offline-viewer output formats.

The reference's OfflineImageViewer renders a binary fsimage through visitor
sinks — XML, ^A-delimited, indented text (XmlImageVisitor /
DelimitedImageVisitor.java / IndentedImageVisitor.java); the Spark-native
analogs are ``df.write`` formats:

- snapshot (S7)     -> parquet directory (columnar fsimage; dictionary
                       encoding subsumes NameCache, SURVEY §1.4)
- edits log (S8)    -> parquet directory consumed by streaming.replay
- XML sink (S9)     -> json-lines (the structured-record equivalent)
- delimited (S9)    -> csv with the reference's ^A (\\x01) separator
                       (DelimitedImageVisitor default)

All writers partition by a namespace-prefix column so a 100 TB image lands
as parallel, prunable files rather than one stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DELIMITER = "\x01"  # DelimitedImageVisitor's default field separator


def save_snapshot(inodes: DataFrame, path: str, partition_depth: int = 1) -> None:
    """S7 saveNamespace: write the namespace as a partitioned parquet
    snapshot (FSImageFormat.save:584-608 -> columnar). Partition key is the
    top-level directory so subtree reads prune files."""
    part = F.coalesce(
        F.nullif(F.element_at(F.split("path", "/"), 2), F.lit("")), F.lit("_root")
    )
    inodes.withColumn("ns_top", part).write.mode("overwrite").partitionBy(
        "ns_top"
    ).parquet(path)


def load_snapshot(spark: SparkSession, path: str) -> DataFrame:
    """S7 image load (FSImageFormat.load:130): read the parquet snapshot;
    partition pruning applies to any path-prefix query."""
    return spark.read.parquet(path).drop("ns_top")


def save_edits(edits: DataFrame, path: str, n_segments: int = 8) -> None:
    """S8: persist the changelog as txid-RANGE-partitioned segments.

    ``repartitionByRange`` makes file order == txid order (segment i holds
    strictly lower txids than segment i+1, like the reference's
    ``edits_<first>-<last>`` roll naming) — streaming.replay depends on this
    so that ``maxFilesPerTrigger=1`` applies segments in log order. A plain
    sortWithinPartitions would interleave txid ranges across files and let a
    later micro-batch carry earlier txids (ordering tested in
    tests/test_sources.py).

    The part files are then stamped with strictly increasing mtimes in
    part order: a single write job commits every segment within the same
    second, and the file stream source orders equal-timestamp files
    ARBITRARILY — observed (r7, t2c) replaying an earlier txid range
    after a later one, which resurrects subtree-deleted files and
    regresses attributes. Distinct mtimes make file order == log order
    under the source's timestamp sort too."""
    import glob as _glob
    import os as _os
    import time as _time

    (
        edits.repartitionByRange(n_segments, "txid")
        .sortWithinPartitions("txid")
        .write.mode("overwrite")
        .parquet(path)
    )
    parts = sorted(_glob.glob(_os.path.join(path, "part-*")))
    base = int(_time.time()) - len(parts)
    for i, p in enumerate(parts):
        _os.utime(p, (base + i, base + i))


def write_xml_sink(df: DataFrame, path: str, row_tag: str = "RECORD") -> None:
    """S9 XML visitor analog (XmlImageVisitor / XmlEditsVisitor,
    tools/offlineImageViewer/XmlImageVisitor.java): real XML records via
    Spark's native xml data source, one <RECORD> element per row."""
    df.write.mode("overwrite").format("xml").option("rowTag", row_tag).save(path)


def load_xml_records(
    spark: SparkSession, path: str, row_tag: str = "RECORD", schema=None
) -> DataFrame:
    """Reparse an XML sink — the OfflineEditsViewer reverse direction
    (``oev -i edits.xml -o edits`` reconstructs the binary log from XML;
    offlineEditsViewer/XmlEditsVisitor.java). Schema is inferred from the
    records unless an explicit ``schema`` is passed (a re-emitter that
    knows its record layout must pass one: inference type-guesses each
    column from the VALUES, so a string field holding '007' comes back a
    bigint and re-renders as '7'). Round-trip losslessness is tested in
    tests/test_sources.py."""
    reader = spark.read.format("xml").option("rowTag", row_tag)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.load(path)


def write_delimited_sink(df: DataFrame, path: str) -> None:
    """S9 DelimitedImageVisitor analog: ^A-separated flat records."""
    df.write.mode("overwrite").option("sep", DELIMITER).option(
        "header", "false"
    ).csv(path)


def reemit_edits(
    spark: SparkSession, xml_path: str, out_path: str, n_segments: int = 8
) -> DataFrame:
    """S9 BinaryEditsVisitor analog: rebuild the NATIVE log from an XML
    dump (``oev -i edits.xml -o edits`` — offlineEditsViewer/
    BinaryEditsVisitor.java writes the binary edits file back from the
    visited records; EditsVisitorFactory.java:43-55 picks it for any
    non-.xml output). This engine's native log format is the parquet
    segment directory (``save_edits``), so the re-emit direction is
    XML -> reparse -> txid-range-partitioned parquet segments, with the
    same file-order==txid-order guarantee replay depends on.

    The reparse reads every field as STRING under an EXPLICIT schema —
    never inference, which type-guesses from the values and corrupts
    numeric-looking strings (an ``owner`` of '007' would infer bigint,
    parse to 7, and re-render as '7') — then casts each column to its
    EDITS_SCHEMA type; the XML writer omits all-null fields, so absent
    columns re-enter as typed NULLs. (One representational limit is the
    XML format's own, shared with the reference's XML visitor: an
    empty-string attribute and an absent one render identically, so ''
    round-trips to NULL — no edits field uses '' as a meaningful value.)
    The returned frame is the re-emitted log as ``streaming.replay``
    would stream it. Txid-exactness (every record, every attribute,
    segment order) is pinned by tests/test_sources.py."""
    from .streaming.replay import EDITS_COLUMNS, EDITS_SCHEMA

    types = dict(
        f.split(" ", 1) for f in (p.strip() for p in EDITS_SCHEMA.split(","))
    )
    back = load_xml_records(
        spark,
        xml_path,
        schema=", ".join(f"{c} STRING" for c in EDITS_COLUMNS),
    )
    cols = [
        (
            F.col(c) if c in back.columns else F.lit(None)
        ).cast(types[c]).alias(c)
        for c in EDITS_COLUMNS
    ]
    reemitted = back.select(*cols)
    save_edits(reemitted, out_path, n_segments)
    return spark.read.parquet(out_path)


def roundtrip_check(spark: SparkSession, inodes: DataFrame, tmp: str) -> bool:
    """Snapshot save->load must be lossless (the TestOIVCanReadOldVersions
    analog): same rows, same schema."""
    save_snapshot(inodes, tmp)
    back = load_snapshot(spark, tmp)
    if set(back.columns) != set(inodes.columns):
        return False
    a = inodes.select(*sorted(inodes.columns))
    b = back.select(*sorted(inodes.columns))
    return a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()

def save_bucketed_block_map(
    e: dict, path_prefix: str, n_buckets: int = 16, name_prefix: str = "bkt"
) -> None:
    """Write ``blocks`` and ``replicas`` as co-bucketed tables on block_id.

    The block<->replica join is the hottest join in the model (J1/J2/J5 all
    contain it; the reference materializes it as the BlockInfo triplets
    array, server/namenode/BlockInfo.java). Bucketing both sides identically
    at write time (same key, same bucket count, sorted within buckets) is
    the at-rest equivalent: every later join reads bucket i against bucket
    i — no exchange on either side, at any scale. The write costs one
    shuffle, paid once; a 100 TB deployment re-buckets on ingest and every
    downstream join in every job rides it free.
    """
    for nm in ("blocks", "replicas"):
        (
            e[nm]
            .write.mode("overwrite")
            .bucketBy(n_buckets, "block_id")
            .sortBy("block_id")
            .option("path", f"{path_prefix}/{nm}")
            .saveAsTable(f"{name_prefix}_{nm}")
        )


def bucketed_block_join(spark: SparkSession, name_prefix: str = "bkt") -> DataFrame:
    """Join the co-bucketed tables: Catalyst sees matching bucket specs and
    plans a sort-merge join with ZERO Exchange operators (bucketed scan
    feeds the join directly)."""
    b = spark.table(f"{name_prefix}_blocks")
    r = spark.table(f"{name_prefix}_replicas").select(
        "block_id", "datanode_id", "state", "is_corrupt"
    )
    return b.join(r, "block_id")
