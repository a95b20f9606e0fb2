"""Range-shard boundary correctness for a9b_content_checksum.

The driver gate hash-matches a9b against DuckDB on the fixed fixture,
whose file sizes are all multiples of 1024 — so it cannot catch
off-by-one bugs at chunk (512 B), block (64 KiB), or shard (16 MiB)
boundaries. This test runs the sharded kernel over files with adversarial
sizes (one byte over/under every boundary, including a file larger than
one shard) and compares against a sequential in-memory reference that
never shards at all.
"""

from __future__ import annotations

import hashlib
import os

import pytest

from hadoop_hdfs_spark.operators import blocks as blocks_mod
from hadoop_hdfs_spark.registry import _entities

SPAN = 128 * 512  # one 'block'
SHARD = 16 * 1024 * 1024

SIZES = [1, 511, 512, 513, SPAN - 1, SPAN, SPAN + 1, 3 * SPAN + 7, SHARD + 5]


def _reference(data: bytes) -> tuple[int, str]:
    """Sequential, unsharded: chunk digests -> block MD5s -> file MD5."""
    block_md5s = []
    for b in range(0, len(data), SPAN):
        piece = data[b : b + SPAN]
        cat = "".join(
            hashlib.md5(piece[i : i + 512].hex().upper().encode()).hexdigest()
            for i in range(0, len(piece), 512)
        )
        block_md5s.append(hashlib.md5(cat.encode()).hexdigest())
    return len(block_md5s), hashlib.md5("".join(block_md5s).encode()).hexdigest()


def test_a9b_shard_boundaries_match_sequential(spark, sf_dir, tmp_path, monkeypatch):
    contents = {}
    for i, size in enumerate(SIZES):
        name = f"edge_{i:02d}.bin"
        # deterministic, non-repeating bytes so boundary mixups change digests
        data = hashlib.sha256(name.encode()).digest() * (size // 32 + 1)
        contents[name] = data[:size]
        (tmp_path / name).write_bytes(contents[name])
    monkeypatch.setattr(blocks_mod, "_BLOB_DIR", str(tmp_path))
    monkeypatch.setattr(blocks_mod, "_BLOB_GLOB", "edge_*.bin")

    e = _entities(spark, sf_dir)
    got = {
        r.file_name: (r.byte_len, r.n_blocks, r.file_md5)
        for r in blocks_mod.a9b_content_checksum(e).collect()
    }
    assert set(got) == set(contents)
    for name, data in contents.items():
        n_blocks, file_md5 = _reference(data)
        assert got[name] == (len(data), n_blocks, file_md5), name


def test_a9b_zero_byte_file_is_skipped(spark, sf_dir, tmp_path, monkeypatch):
    # a 0-byte file has no chunks in either engine (the oracle's
    # range(0, ceil(0/512)) is empty) — the plan must not emit a row for it
    (tmp_path / "edge_empty.bin").write_bytes(b"")
    (tmp_path / "edge_one.bin").write_bytes(b"x")
    monkeypatch.setattr(blocks_mod, "_BLOB_DIR", str(tmp_path))
    monkeypatch.setattr(blocks_mod, "_BLOB_GLOB", "edge_*.bin")
    e = _entities(spark, sf_dir)
    names = {r.file_name for r in blocks_mod.a9b_content_checksum(e).collect()}
    assert names == {"edge_one.bin"}


def test_s1_head_crc32_matches_jvm_crc32(spark, tmp_path, monkeypatch):
    """The s1 crc32 leg (kernel zlib.crc32 over raw head bytes) against the
    JVM's independent CRC32 on the same bytes — the cross-implementation
    check the DuckDB oracle cannot provide (no crc32 in DuckDB)."""
    import pyspark.sql.functions as F

    from hadoop_hdfs_spark.operators import admin as admin_mod

    contents = {}
    for i, size in enumerate([1, 4, 511, 512, 513, 65536, 65537, 200000]):
        name = f"crc_{i:02d}.bin"
        data = hashlib.sha256(name.encode()).digest() * (size // 32 + 1)
        contents[name] = data[:size]
        (tmp_path / name).write_bytes(contents[name])
    monkeypatch.setattr(admin_mod, "_S1_BLOB_DIR", str(tmp_path))
    monkeypatch.setattr(admin_mod, "_S1_BLOB_GLOB", "crc_*.bin")

    got = admin_mod.block_scan_df(spark).collect()
    assert len(got) == sum(
        (len(d) + 65535) // 65536 for d in contents.values()
    )
    heads = spark.createDataFrame(
        [
            (r.file_name, r.block_idx,
             bytearray(contents[r.file_name][r.offset : r.offset + 512]))
            for r in got
        ],
        "file_name string, block_idx long, head binary",
    ).select("file_name", "block_idx", F.crc32("head").alias("jvm_crc32"))
    jvm = {(r.file_name, r.block_idx): r.jvm_crc32 for r in heads.collect()}
    for r in got:
        assert r.head_crc32 == jvm[(r.file_name, r.block_idx)], r
