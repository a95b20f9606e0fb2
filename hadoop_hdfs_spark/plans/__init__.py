"""Physical-plan inspection utilities — the programmatic form of the
`.explain("formatted")` discipline this repo develops against (README
"Design decisions", PLANS.md gallery, tests/test_plans.py audits).

At 100 TB the plan IS the product: these helpers make scale properties
(broadcasts present, exchanges absent, partial aggregation kept, columns
pruned) assertable in tests and inspectable in notebooks.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """The full `.explain("formatted")` text of a DataFrame's plan."""
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def operator_counts(df: DataFrame) -> dict[str, int]:
    """Physical operator histogram of the plan tree (node names only)."""
    tree = formatted_plan(df).split("\n\n")[0]
    out: dict[str, int] = {}
    for m in re.finditer(r"[+:*-]- ([A-Za-z]+)", tree):
        out[m.group(1)] = out.get(m.group(1), 0) + 1
    return out


def exchange_count(df: DataFrame) -> int:
    """Number of Exchange (shuffle/broadcast-build) nodes in the plan."""
    return operator_counts(df).get("Exchange", 0)


def read_schema_of_first_scan(df: DataFrame) -> str:
    """ReadSchema of the first parquet scan — what actually leaves storage.

    Column pruning is visible here: a 2-column projection over a 10-column
    table must show a 2-field struct.
    """
    plan = formatted_plan(df)
    line = next(
        (line for line in plan.splitlines() if "ReadSchema" in line), None
    )
    if line is None:
        raise ValueError("plan contains no file scan with a ReadSchema")
    return line
