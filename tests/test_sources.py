"""S7/S8/S9 snapshot + sink round-trips."""

from __future__ import annotations

import glob

from hadoop_hdfs_spark import sources
from hadoop_hdfs_spark.entities import load_entities


def test_snapshot_roundtrip_lossless(spark, sf_dir, tmp_path):
    e = load_entities(spark, sf_dir)
    assert sources.roundtrip_check(spark, e["inodes"], str(tmp_path / "snap"))


def test_snapshot_partitioned_by_namespace(spark, sf_dir, tmp_path):
    e = load_entities(spark, sf_dir)
    sources.save_snapshot(e["inodes"], str(tmp_path / "snap"))
    parts = glob.glob(str(tmp_path / "snap" / "ns_top=*"))
    # one partition per top-level dir (+_root): path-prefix queries prune
    assert len(parts) >= 5
    one = spark.read.parquet(str(tmp_path / "snap")).filter("ns_top = 'r0'")
    assert one.count() > 0
    assert all(r["path"].startswith("/r0") for r in one.select("path").collect())


def test_delimited_sink_uses_ctrl_a(spark, sf_dir, tmp_path):
    e = load_entities(spark, sf_dir)
    sources.write_delimited_sink(
        e["inodes"].select("id", "path", "length").limit(10), str(tmp_path / "delim")
    )
    data = "".join(
        open(f).read() for f in glob.glob(str(tmp_path / "delim" / "part-*"))
    )
    assert "\x01" in data


def test_edits_roundtrip_feeds_replay(spark, sf_dir, tmp_path):
    e = load_entities(spark, sf_dir)
    sources.save_edits(
        e["edits"].select("txid", "op", "ts_ms", "path", "dst", "replication"),
        str(tmp_path / "edits"),
    )
    back = spark.read.parquet(str(tmp_path / "edits"))
    assert back.count() == e["edits"].count()


def test_save_edits_segments_are_txid_ordered(spark, sf_dir, tmp_path):
    """Replay depends on file order == txid order (maxFilesPerTrigger=1
    applies segments in log order): segments must hold disjoint, increasing
    txid ranges in filename order."""
    e = load_entities(spark, sf_dir)
    sources.save_edits(
        e["edits"].select("txid", "op", "ts_ms", "path", "dst", "replication"),
        str(tmp_path / "edits_seg"),
        n_segments=4,
    )
    files = sorted(glob.glob(str(tmp_path / "edits_seg" / "part-*")))
    assert len(files) > 1, "need multiple segments to test ordering"
    ranges = []
    for f in files:
        stats = spark.read.parquet(f).selectExpr(
            "min(txid) AS lo", "max(txid) AS hi"
        ).collect()[0]
        if stats["lo"] is not None:
            ranges.append((stats["lo"], stats["hi"]))
    for (_, hi_prev), (lo_next, _) in zip(ranges, ranges[1:]):
        assert hi_prev < lo_next, f"txid ranges interleave: {ranges}"
    # the file stream source orders by MODIFICATION TIME (ties arbitrary):
    # save_edits must stamp strictly increasing mtimes in part order, or a
    # one-job write ties every segment's mtime and replay can apply an
    # earlier txid range AFTER a later one (observed r7, t2c gate)
    import os

    mtimes = [os.stat(f).st_mtime_ns for f in files]
    assert mtimes == sorted(mtimes) and len(set(mtimes)) == len(mtimes), (
        f"segment mtimes must strictly increase in part order: {mtimes}"
    )


def test_snapshot_chain_feeds_queries(spark, sf_dir, tmp_path):
    """Integration chain: derive entities -> save snapshot -> reload ->
    run ContentSummary on the reloaded namespace -> identical to direct."""
    from hadoop_hdfs_spark.operators.namespace import content_summary_all

    e = load_entities(spark, sf_dir)
    sources.save_snapshot(e["inodes"], str(tmp_path / "snap"))
    reloaded = sources.load_snapshot(spark, str(tmp_path / "snap"))
    direct = content_summary_all(e["inodes"])
    via_snapshot = content_summary_all(reloaded)
    assert direct.exceptAll(via_snapshot).isEmpty()
    assert via_snapshot.exceptAll(direct).isEmpty()


def test_s1_binary_scan_reads_block_heads(spark, sf_dir):
    """One row per 64 KiB block of the blob corpus, each carrying the real
    bytes' magic sniff and head digest (r6: the whole-file binaryFile scan
    became a range-sharded positional read, hash-matched by oracle)."""
    import glob as _glob
    import os as _os

    from hadoop_hdfs_spark import registry
    from hadoop_hdfs_spark.operators import admin as admin_mod

    df = registry.queries()["s1_binary_block_scan"](spark, sf_dir)
    rows = df.collect()
    want_blocks = sum(
        (_os.path.getsize(p) + admin_mod._S1_SPAN - 1) // admin_mod._S1_SPAN
        for p in _glob.glob(
            _os.path.join(admin_mod._S1_BLOB_DIR, admin_mod._S1_BLOB_GLOB)
        )
        if _os.path.getsize(p) > 0
    )
    assert len(rows) == want_blocks > 0
    assert all(r["block_len"] > 0 for r in rows)
    assert all(len(r["magic_hex"]) == 8 for r in rows)
    assert all(len(r["head_md5"]) == 32 for r in rows)
    assert all(r["offset"] == r["block_idx"] * admin_mod._S1_SPAN for r in rows)

def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path):
    """Co-bucketed block<->replica join must be shuffle-free: the one-time
    bucketed write prepays the exchange for every later join."""
    e = load_entities(spark, sf_dir)
    # external tables (explicit path option) — the static warehouse dir is
    # only used for the metastore listing
    sources.save_bucketed_block_map(e, str(tmp_path / "bkt"), n_buckets=8)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # no hiding
    try:
        from hadoop_hdfs_spark.plans import formatted_plan

        df = sources.bucketed_block_join(spark)
        plan = formatted_plan(df)
        assert "Exchange" not in plan, plan
        # the shuffle-free property is the pin; the co-partitioned join may
        # plan as sort-merge or (since preferSortMergeJoin=false) as a
        # bucket-local shuffled-hash join — both read the buckets in place
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        # and it computes the same thing as the straight join
        straight = e["blocks"].join(
            e["replicas"].select("block_id", "datanode_id", "state", "is_corrupt"),
            "block_id",
        )
        assert df.count() == straight.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        for nm in ("bkt_blocks", "bkt_replicas"):
            spark.sql(f"DROP TABLE IF EXISTS {nm}")


def test_xml_sink_roundtrip(spark, sf_dir, tmp_path):
    """S9: the XML sink must be reparseable losslessly — the reference's
    OfflineEditsViewer supports XML -> binary reconstruction
    (offlineEditsViewer/XmlEditsVisitor.java), so write+load must preserve
    every record and value."""
    from hadoop_hdfs_spark import registry
    from hadoop_hdfs_spark.sources import load_xml_records, write_xml_sink

    edits = registry._entities(spark, sf_dir)["edits"].limit(500)
    path = str(tmp_path / "edits_xml")
    write_xml_sink(edits, path)
    back = load_xml_records(spark, path)
    # XML inference widens ints; realign to the written schema
    back = back.selectExpr(
        *[f"CAST({c} AS {t}) AS {c}" for c, t in edits.dtypes]
    )
    assert back.count() == 500
    assert edits.exceptAll(back).isEmpty() and back.exceptAll(edits).isEmpty()


def test_delimited_sink_roundtrip(spark, sf_dir, tmp_path):
    """S9: ^A-delimited records (DelimitedImageVisitor) read back intact."""
    from hadoop_hdfs_spark import registry
    from hadoop_hdfs_spark.sources import DELIMITER, write_delimited_sink

    inodes = (
        registry._entities(spark, sf_dir)["inodes"]
        .select("id", "path", "length", "replication")
        .limit(300)
    )
    path = str(tmp_path / "inodes_sv")
    write_delimited_sink(inodes, path)
    back = (
        spark.read.option("sep", DELIMITER)
        .schema(inodes.schema)
        .csv(path)
    )
    assert back.count() == 300
    assert inodes.exceptAll(back).isEmpty() and back.exceptAll(inodes).isEmpty()


def test_binary_reemit_roundtrip_txid_exact(spark, sf_dir, tmp_path):
    """S9's BinaryEditsVisitor leg: XML dump -> reemit_edits must rebuild
    the NATIVE log (txid-range parquet segments) TXID-EXACTLY — every
    record and attribute identical to the original edits, and the
    re-emitted segment files ordered so file order == txid order (the
    property replay depends on)."""
    import glob
    import os

    from hadoop_hdfs_spark import registry
    from hadoop_hdfs_spark.sources import reemit_edits, write_xml_sink

    edits = registry._entities(spark, sf_dir)["edits"]
    xml = str(tmp_path / "edits_xml")
    out = str(tmp_path / "edits_bin")
    write_xml_sink(edits, xml)
    back = reemit_edits(spark, xml, out, n_segments=4)
    # txid-exact: same schema, same rows
    assert [f.simpleString() for f in back.schema.fields] == [
        f.simpleString() for f in edits.schema.fields
    ]
    assert back.count() == edits.count()
    assert edits.exceptAll(back).isEmpty() and back.exceptAll(edits).isEmpty()
    # segment order == txid order, and mtimes strictly increase in
    # part order (the file-source replay ordering contract)
    parts = sorted(glob.glob(os.path.join(out, "part-*")))
    assert len(parts) == 4
    prev_max, prev_mtime = -1, -1.0
    for p in parts:
        pdf = spark.read.parquet(p).agg(
            {"txid": "min"}
        ).collect()[0], spark.read.parquet(p).agg({"txid": "max"}).collect()[0]
        lo, hi = pdf[0]["min(txid)"], pdf[1]["max(txid)"]
        assert lo > prev_max
        prev_max = hi
        mt = os.path.getmtime(p)
        assert mt > prev_mtime
        prev_mtime = mt


def test_binary_reemit_preserves_numeric_looking_strings(spark, tmp_path):
    """The reparse must read under an explicit all-string schema: schema
    INFERENCE type-guesses from values, so an owner of '007' would come
    back bigint 7 and re-render as '7' — corrupting the txid-exact
    contract for legal numeric usernames/uids."""
    from hadoop_hdfs_spark.sources import reemit_edits, write_xml_sink
    from hadoop_hdfs_spark.streaming.replay import EDITS_SCHEMA

    edits = spark.createDataFrame(
        [
            (1, "OP_ADD", 1000, "/u/007/f", None, 2, "0644", "007", 10),
            (2, "OP_SET_OWNER", 2000, "/u/007/f", None, None, None, "42", None),
        ],
        EDITS_SCHEMA,
    )
    xml = str(tmp_path / "numeric_xml")
    out = str(tmp_path / "numeric_bin")
    write_xml_sink(edits, xml)
    back = reemit_edits(spark, xml, out, n_segments=1)
    rows = {r["txid"]: r for r in back.collect()}
    assert rows[1]["owner"] == "007" and rows[1]["perm"] == "0644"
    assert rows[2]["owner"] == "42"
    assert edits.exceptAll(back).isEmpty() and back.exceptAll(edits).isEmpty()
