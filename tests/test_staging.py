"""Staging-cache behavior for the streaming certification drains (ADVICE
r3): the stage key must track fixture CONTENT, so a regenerated fixture at
the same path restages instead of silently replaying stale bytes; and a
visible stage directory must always be complete (marker inside before the
rename into place)."""

from __future__ import annotations

import os
import shutil

from hadoop_hdfs_spark.streaming.staging import fixture_fingerprint, staged_dir


def _mk_fixture(tmp_path, payload: bytes):
    d = tmp_path / "sf"
    d.mkdir(exist_ok=True)
    (d / "documents.parquet").write_bytes(payload)
    return str(d)


def test_fingerprint_tracks_content(tmp_path):
    d = _mk_fixture(tmp_path, b"v1")
    fp1 = fixture_fingerprint(d)
    os.utime(os.path.join(d, "documents.parquet"), (1, 1))
    fp2 = fixture_fingerprint(d)
    assert fp1 != fp2  # mtime change alone restages (regeneration signal)
    (tmp_path / "sf" / "documents.parquet").write_bytes(b"v2-longer")
    assert fixture_fingerprint(d) not in (fp1, fp2)


def test_staged_dir_builds_once_then_restages_on_regen(tmp_path):
    d = _mk_fixture(tmp_path, b"v1")
    builds = []

    def build(p):
        os.makedirs(p)
        builds.append(p)
        with open(os.path.join(p, "data"), "w") as f:
            f.write("built")

    s1 = staged_dir(d, "test_stage", build)
    s2 = staged_dir(d, "test_stage", build)
    assert s1 == s2 and len(builds) == 1
    assert os.path.exists(os.path.join(s1, "_STAGED"))

    # regenerate the fixture -> new fingerprint -> fresh stage dir
    (tmp_path / "sf" / "documents.parquet").write_bytes(b"v2-regenerated")
    s3 = staged_dir(d, "test_stage", build)
    assert s3 != s1 and len(builds) == 2
    for s in (s1, s3):
        shutil.rmtree(s, ignore_errors=True)


def test_torn_stage_is_replaced(tmp_path):
    d = _mk_fixture(tmp_path, b"v1")

    def build(p):
        os.makedirs(p)
        with open(os.path.join(p, "data"), "w") as f:
            f.write("built")

    # simulate a crashed build: stage dir exists WITHOUT the marker
    import hashlib

    key = hashlib.md5(
        f"{d}|test_torn|{fixture_fingerprint(d)}".encode()
    ).hexdigest()[:12]
    torn = f"/tmp/test_torn_{key}"
    shutil.rmtree(torn, ignore_errors=True)
    os.makedirs(torn)
    s = staged_dir(d, "test_torn", build)
    assert s == torn
    assert os.path.exists(os.path.join(s, "_STAGED"))
    assert os.path.exists(os.path.join(s, "data"))
    shutil.rmtree(s, ignore_errors=True)
