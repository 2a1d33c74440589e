"""Differential tests: every catalog query vs its DuckDB oracle at sf0.001
(fast) — the driver re-runs the same comparison at sf0.01.

A catalog entry without an oracle (rows-only ops) is checked for
executability + schema stability instead.
"""

from __future__ import annotations

import pytest

from waddleml_spark import catalog
from waddleml_spark.testing import compare
from tests.conftest import SF_SMOKE

ORACLE_NAMES = sorted(catalog.ORACLE)
ROWS_ONLY = sorted(set(catalog.QUERIES) - set(catalog.ORACLE))


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_parity(spark, duck_smoke, name):
    df = catalog.QUERIES[name](spark, SF_SMOKE)
    ok, msg = compare(df, duck_smoke, catalog.ORACLE[name], name=name)
    assert ok, msg


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_executes(spark, name):
    df = catalog.QUERIES[name](spark, SF_SMOKE)
    rows = df.collect()
    assert df.columns, f"{name}: empty schema"
    assert rows is not None


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert len(df.collect()) > 0
    # every queries() key with an oracle twin must agree on key sets
    q = e.queries()
    o = e.oracle_sql()
    assert set(o) <= set(q)
