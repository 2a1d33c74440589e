"""Driver-contract invariants for __spark_entry__ (no Spark session needed).

The driver hash-checks exactly the FIRST 50 entries of queries() against
oracle_sql() at sf0.01; these tests pin the certification window so a
refactor can't silently rotate a rows-only or unregistered query into it.
"""

from __future__ import annotations

import importlib
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

entry = importlib.import_module("__spark_entry__")
from waddleml_spark import catalog  # noqa: E402


def test_window_is_exactly_50_unique_names():
    assert len(entry._DRIVER_WINDOW) == 50
    assert len(set(entry._DRIVER_WINDOW)) == 50


def test_window_entries_are_all_oracle_paired():
    # rows-only entries can never hash-match; they must not burn a slot
    missing_q = [n for n in entry._DRIVER_WINDOW if n not in catalog.QUERIES]
    missing_o = [n for n in entry._DRIVER_WINDOW if n not in catalog.ORACLE]
    assert not missing_q, f"window names without a query: {missing_q}"
    assert not missing_o, f"window names without an oracle: {missing_o}"


def test_queries_leads_with_window_and_keeps_everything():
    q = entry.queries()
    assert list(q)[:50] == list(entry._DRIVER_WINDOW)
    assert set(q) == set(catalog.QUERIES)


def test_oracle_keys_subset_of_queries():
    q, o = entry.queries(), entry.oracle_sql()
    assert set(o) <= set(q)
    assert set(o) == set(catalog.ORACLE)


def test_no_hugeint_or_decimal_in_any_oracle_output():
    """The driver's value-hash is TYPE-sensitive: DuckDB types sum(INTEGER/
    BIGINT) as HUGEINT (int128) while Spark emits BIGINT, so a hash-identical
    value still fails the gate (the round-3 red rows: sessionize_users,
    pii_scrub_report, sequence_packing_report).  Every integer sum in an
    oracle must carry CAST(... AS BIGINT); same for any DECIMAL the SQL
    dialect might infer.  Planning the relation is enough — no execution.
    """
    import pytest

    duckdb = pytest.importorskip("duckdb")  # noqa: F841
    from waddleml_spark.testing import duckdb_conn
    from tests.conftest import SF_SMOKE

    con = duckdb_conn(SF_SMOKE)
    offenders = []
    for name, sql in sorted(catalog.ORACLE.items()):
        rel = con.sql(sql)
        for col, typ in zip(rel.columns, rel.types):
            t = str(typ).upper()
            if "HUGEINT" in t or "INT128" in t or "DECIMAL" in t:
                offenders.append((name, col, t))
    assert not offenders, (
        "oracle outputs with driver-hash-incompatible types "
        f"(wrap in CAST(... AS BIGINT)): {offenders}"
    )


def test_catalog_registration_names_match_functions():
    """Every catalog key must map to the function it claims to (name or
    the _q-suffixed collision-avoidance form).  Pins the r11 near-miss:
    a new function spliced between an existing @_register decorator and
    its def silently re-bound that oracle key to the WRONG query — the
    decorator registers whatever def follows it, so a name mismatch
    here means a splice, not a style choice."""
    offenders = {
        n: f.__name__
        for n, f in catalog.QUERIES.items()
        if f.__name__ not in (n, n + "_q")
    }
    assert not offenders, f"mis-bound catalog registrations: {offenders}"
