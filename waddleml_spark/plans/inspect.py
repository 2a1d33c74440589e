"""Helpers to read a DataFrame's physical plan as text and assert the
properties that matter at scale."""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """The text df.explain(mode) would print."""
    qe = df._jdf.queryExecution()
    jvm = df.sparkSession._jvm
    jmode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    return qe.explainString(jmode)


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
