"""Reusable scalar Column builders — the library form of the reference's
static utility classes (DFSUtil, Block name codec, FsPermission, path
helpers). The registered queries state the same expressions inline next to
their DuckDB-oracle SQL (the shared-text parity discipline); this module is
the composable API a library user reaches for, and
``tests/test_functions.py`` pins both forms to identical results.

Everything here is a pure built-in-function expression: JVM-side, fused by
whole-stage codegen, zero Python on the executor path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


# -- path helpers (INode.getPathNames/getPathComponents INode.java:344-365,
#    FSDirectory.getFullPathName:1404-1410)

def path_basename(path: Column | str) -> Column:
    """Final component of an absolute path ('' for '/')."""
    return F.regexp_extract(_c(path), r"([^/]*)$", 1)


def path_parent(path: Column | str) -> Column:
    """Parent directory; NULL for '/', '/' for top-level entries."""
    p = _c(path)
    parent = F.regexp_extract(p, r"^(.*)/[^/]*$", 1)
    return (
        F.when(p == "/", F.lit(None).cast("string"))
        .when(parent == "", F.lit("/"))
        .otherwise(parent)
    )


def path_depth(path: Column | str) -> Column:
    """Number of '/' separators — 1 for top-level entries."""
    p = _c(path)
    return (F.length(p) - F.length(F.replace(p, F.lit("/"), F.lit("")))).cast("int")


def path_components(path: Column | str) -> Column:
    """Array of path components, root exclusive (INode.getPathComponents)."""
    return F.filter(F.split(_c(path), "/"), lambda s: s != "")


def is_descendant_of(path: Column | str, ancestor: Column | str) -> Column:
    """Subtree predicate: path lies strictly under ancestor ('/' included)."""
    p, a = _c(path), _c(ancestor)
    return F.when(a == "/", p != "/").otherwise(
        p.startswith(F.concat(a, F.lit("/")))
    )


# -- block filename codec (Block.java:47-82,126-128)

def block_name(block_id: Column | str) -> Column:
    """blk_<id> on-disk data-file name."""
    return F.concat(F.lit("blk_"), _c(block_id).cast("string"))


def meta_name(block_id: Column | str, gen_stamp: Column | str) -> Column:
    """blk_<id>_<genstamp>.meta checksum-file name."""
    return F.concat(
        block_name(block_id), F.lit("_"), _c(gen_stamp).cast("string"), F.lit(".meta")
    )


def parse_block_id(name: Column | str) -> Column:
    """Extract the block id from a blk_* file name (Block.filename2id)."""
    return F.regexp_extract(_c(name), r"blk_(-?[0-9]+)", 1).cast("long")


def parse_gen_stamp(meta: Column | str) -> Column:
    """Extract the generation stamp from a .meta file name."""
    return F.regexp_extract(_c(meta), r"blk_-?[0-9]+_([0-9]+)\.meta", 1).cast("long")


def is_block_filename(name: Column | str) -> Column:
    """Block.isBlockFilename: a data file, not a .meta file."""
    return _c(name).rlike(r"^blk_-?[0-9]+$")


def is_meta_filename(name: Column | str) -> Column:
    return _c(name).rlike(r"^blk_-?[0-9]+_[0-9]+\.meta$")


# -- permission codec (FsPermission; ImageLoaderCurrent.java:316-320)

def perm_octal(perm: Column | str) -> Column:
    """rwxrwxrwx string -> 3-digit octal int (e.g. 'rw-r--r--' -> 644)."""
    p = _c(perm)

    def tri(base: int) -> Column:
        return (
            F.when(F.substring(p, base + 1, 1) == "r", 4).otherwise(0)
            + F.when(F.substring(p, base + 2, 1) == "w", 2).otherwise(0)
            + F.when(F.substring(p, base + 3, 1) == "x", 1).otherwise(0)
        )

    return (tri(0) * 100 + tri(3) * 10 + tri(6)).cast("int")


# -- size scalars (DFSUtil; c3_c8_scalar_functions)

def round_bytes_to_gb(num_bytes: Column | str) -> Column:
    """Round-half-up to whole GiB (DFSUtil.roundBytesToGB)."""
    return F.floor(_c(num_bytes) / 1073741824.0 + 0.5).cast("long")


# -- vector scalars (pipeline/similarity.py conventions)

def dot(u: Column | str, v: Column | str) -> Column:
    """Sequential double-fold dot product over two array columns."""
    return F.aggregate(
        F.zip_with(_c(u), _c(v), lambda a, b: a.cast("double") * b.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(v: Column | str) -> Column:
    return F.sqrt(dot(v, v))


# -- text shingles (pipeline/curation.py, t_fingerprint conventions)

def ngrams(text: Column | str, n: int = 3) -> Column:
    """Distinct raw word n-grams of a whitespace-tokenized text.

    The ONE guarded implementation every shingle consumer builds on
    (pipeline/dedup, pipeline/curation, t_fingerprint): under n tokens a
    bare sequence() would DESCEND and element_at would fault under ANSI
    mode — return an empty array instead, mirroring DuckDB's empty range().
    """
    # let-binding via a single-element transform: the lambda variable binds
    # the token split ONCE per row — referencing `F.split(...)` directly in
    # the guard, the sequence bound, and each element_at would re-evaluate
    # the split 5x per row (higher-order functions are interpreted, so no
    # codegen subexpression elimination rescues the duplicates; r9 sweep)
    def build(toks):
        return F.when(
            F.size(toks) >= n,
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), F.size(toks) - (n - 1)),
                    lambda i: F.concat_ws(
                        " ", *[F.element_at(toks, i + j) for j in range(n)]
                    ),
                )
            ),
        ).otherwise(F.array().cast("array<string>"))

    return F.element_at(
        F.transform(F.array(F.split(_c(text), " ")), build), 1
    )


def shingles(text: Column | str, n: int = 3) -> Column:
    """Distinct md5-hashed n-gram shingles (the join/compare-ready form)."""
    return F.transform(ngrams(text, n), lambda s: F.md5(s))


# The Gopher/C4 repetition rule (t_repetition's flag): a doc is repetitive
# when it has at least REPETITION_MIN_BIGRAMS bigrams and at least
# REPETITION_DUP_E6 of them (e6 fixed-point fraction) are duplicates.
# t_repetition's flag and c_quality_filter_cascade's REPETITIVE_BIGRAMS
# stage both state this ONE rule — shared constants so
# an adjustment cannot de-sync the cascade stage from the flag it
# restates (the oracles carry the same literals; each query's own hash
# gate catches a Spark/oracle mismatch immediately).
REPETITION_MIN_BIGRAMS = 20
REPETITION_DUP_E6 = 200_000


def bigrams(toks: Column | str) -> Column:
    """Multiplicity-PRESERVING word bigrams of a pre-split token array —
    the counting form t_repetition's duplicate ratio needs (ngrams() is
    the distinct form), with the same <2-token guard (a bare descending
    sequence() faults element_at under ANSI mode). The ONE definition the
    repetition-rule consumers transform; callers alias the result once
    (staged select) so it evaluates once per row."""
    t = _c(toks)
    return F.when(
        F.size(t) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(t) - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(t, i), F.element_at(t, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
