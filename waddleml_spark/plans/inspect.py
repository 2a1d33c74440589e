"""Helpers to read a DataFrame's physical plan as text and assert the
properties that matter at scale."""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """The text df.explain(mode) would print.

    Classic sessions read it straight off the JVM queryExecution; Spark
    Connect DataFrames have no _jdf, so fall back to capturing
    df.explain() stdout (the only plan surface Connect exposes) — every
    helper below works unchanged on either session type.
    """
    try:
        qe = df._jdf.queryExecution()
        jvm = df.sparkSession._jvm
        jmode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
        return qe.explainString(jmode)
    except AttributeError:
        return _explain_via_stdout(df, mode)


def _explain_via_stdout(df: DataFrame, mode: str) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def pushed_filters(df: DataFrame) -> str:
    """All PushedFilters bracket contents from the plan's scans, joined —
    check membership with substring tests (filters contain commas)."""
    text = explain_str(df, "formatted")
    return "; ".join(
        m.group(1).strip() for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", text)
    )


def count_op(df: DataFrame, op: str) -> int:
    """How many physical operators named `op` the plan has (counted from
    the numbered detail blocks, so tree + detail duplication doesn't
    double-count)."""
    text = explain_str(df, "formatted")
    return len(re.findall(rf"\(\d+\) {re.escape(op)}\b", text))


def read_schema_columns(df: DataFrame) -> list[list[str]]:
    """Column lists actually read by each parquet scan (pruning check)."""
    text = explain_str(df, "formatted")
    out = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", text):
        cols = [c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()]
        out.append(cols)
    return out


def assert_plan(
    df: DataFrame,
    contains: list[str] | None = None,
    absent: list[str] | None = None,
) -> str:
    """Assert physical-plan substrings (operator names, pushed predicates).
    Returns the plan text so failures are debuggable."""
    text = explain_str(df, "formatted")
    for needle in contains or []:
        assert needle in text, f"plan missing {needle!r}:\n{text}"
    for needle in absent or []:
        assert needle not in text, f"plan unexpectedly has {needle!r}:\n{text}"
    return text
