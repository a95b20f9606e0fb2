"""Test harness mirroring the driver's DuckDB-oracle comparison.

The driver runs each ``queries()`` entry under Spark and the matching
``oracle_sql()`` string under DuckDB (fixture parquet pre-registered as
views), then compares row count + schema + an order-insensitive value hash
with columns sorted by name. This module reproduces that comparison so every
operator is verified locally before the driver sees it.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from .entities import BASE_TABLES


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in BASE_TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {name} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    # Present the ORACLE-CONTRACT view surface whatever the fixture's
    # physical form, mirroring entities.normalize_event_ts on the Spark
    # side: the four epoch_ns(ts) oracles assume events.ts is a
    # timestamp (what the driver's raw views see on the shipped
    # fixtures), but bench._materialize_sf1 writes the 10x fact-scaled
    # events with ts already as BIGINT UTC nanoseconds — coerce that
    # form back to a timestamp so the same oracle text binds at any SF
    # dir. make_timestamp takes MICROseconds; the truncation is exact
    # here because the materializer derives its nanos from
    # microsecond-precision source timestamps (sub-us is always zero).
    (ts_type,) = (
        r[1]
        for r in con.execute("DESCRIBE SELECT ts FROM events").fetchall()
    )
    if "INT" in ts_type.upper():
        con.execute(
            "CREATE OR REPLACE VIEW events AS "
            "SELECT * REPLACE (make_timestamp(ts // 1000) AS ts) "
            f"FROM read_parquet('{sf_dir}/events.parquet')"
        )
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, canonicalize cell values, sort rows."""
    df = df[sorted(df.columns)].copy()

    def cell(v):
        if v is None:
            return "NULL"
        if isinstance(v, float):
            if math.isnan(v):
                return "NULL"
            # round to 9 significant-ish digits to absorb engine ulp noise
            return format(v, ".9g")
        if isinstance(v, (list, tuple)):
            return "[" + ",".join(cell(x) for x in v) + "]"
        if pd.isna(v):
            return "NULL"
        if isinstance(v, bool):
            return "true" if v else "false"
        return str(v)

    out = df.map(cell)
    out = out.sort_values(by=list(out.columns), kind="mergesort").reset_index(drop=True)
    return out


def compare_frames(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> None:
    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), (
        f"column mismatch: spark={sorted(spark_pdf.columns)} "
        f"duck={sorted(duck_pdf.columns)}"
    )
    assert len(spark_pdf) == len(duck_pdf), (
        f"row count mismatch: spark={len(spark_pdf)} duck={len(duck_pdf)}"
    )
    a, b = _canon(spark_pdf), _canon(duck_pdf)
    if not a.equals(b):
        diff_mask = (a != b).any(axis=1)
        sample = pd.concat(
            [a[diff_mask].head(5).add_prefix("spark_"),
             b[diff_mask].head(5).add_prefix("duck_")],
            axis=1,
        )
        raise AssertionError(f"value mismatch ({int(diff_mask.sum())} rows):\n{sample}")


def assert_query_matches_oracle(spark, query_fn, oracle_sql: str, sf_dir: str) -> int:
    """Run a queries()-style callable and its oracle; assert equality.

    Returns the row count so tests can assert non-triviality.
    """
    spark_pdf = query_fn(spark, sf_dir).toPandas()
    con = duckdb_connect(sf_dir)
    duck_pdf = con.execute(oracle_sql).fetchdf()
    con.close()
    compare_frames(spark_pdf, duck_pdf)
    return len(spark_pdf)
