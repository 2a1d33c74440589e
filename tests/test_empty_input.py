"""Empty-input differential edge: every oracle pairing, 0-row tables.

A production pipeline hits empty inputs constantly (an empty partition,
a date with no data, a source that produced nothing); the SQL-standard
answer on an empty table is what DuckDB computes, so running the whole
oracle-paired catalog against schema-identical EMPTY parquet is a free
spec check for the edge the sf fixtures never exercise.  The round-5
sweep found 108/113 agreeing bit-exactly with no special-casing; after
fixing the media_payload_stats oracle the agreeing set is 109, and the
named exceptions below are each pinned individually.

- The rollup family (rollup/cube/grouping sets) is a REAL engine
  divergence: standard SQL emits the () grand-total row over an empty
  input (aggregate over the empty set, like a bare COUNT(*)), Spark's
  Expand-based implementation replicates input rows per grouping set —
  zero in, zero out.  Identical on any non-empty input.  If a Spark
  upgrade ever fixes this, the canary fails loudly and the pin flips.
- cosine_topk_q0 joined the agreeing set in round 7: the query vector
  is now resolved IN-PLAN (1-row broadcast cross join, the oracle's
  ``FROM c, q``), so an empty corpus yields 0 rows on both sides —
  no parameter-lookup carve-out remains.
"""

from __future__ import annotations

import os

import pytest

from tests.conftest import SF_SMOKE
from waddleml_spark import catalog
from waddleml_spark.testing import DRIVER_TABLES as TABLES

# Spark emits no grand-total row on empty input; standard SQL emits one.
GRAND_TOTAL_DIVERGENT = {
    "rollup_lineitem",
    "cube_orders",
    "grouping_sets_orders",
}

@pytest.fixture(scope="session")
def empty_dir(tmp_path_factory):
    """Schema-identical empty twins of the smoke tables (schemas read
    from the REAL testdata, so physical-type drift can never desync)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = str(tmp_path_factory.mktemp("sf_empty"))
    for n in TABLES:
        sch = pq.read_schema(os.path.join(SF_SMOKE, f"{n}.parquet"))
        pq.write_table(
            pa.table(
                {c: pa.array([], type=t) for c, t in zip(sch.names, sch.types)},
                schema=sch,
            ),
            os.path.join(d, f"{n}.parquet"),
        )
    return d


@pytest.fixture(scope="session")
def duck_empty(empty_dir):
    from waddleml_spark.testing import duckdb_conn

    con = duckdb_conn(empty_dir)
    yield con
    con.close()


@pytest.mark.parametrize(
    "name",
    sorted(set(catalog.ORACLE) - GRAND_TOTAL_DIVERGENT),
)
def test_oracle_pair_agrees_on_empty_input(spark, empty_dir, duck_empty, name):
    from waddleml_spark.testing import compare

    df = catalog.QUERIES[name](spark, empty_dir)
    ok, msg = compare(df, duck_empty, catalog.ORACLE[name], name=name)
    assert ok, msg


@pytest.mark.parametrize("name", sorted(GRAND_TOTAL_DIVERGENT))
def test_grand_total_row_divergence_canary(spark, empty_dir, duck_empty, name):
    n_spark = catalog.QUERIES[name](spark, empty_dir).count()
    n_duck = len(duck_empty.execute(catalog.ORACLE[name]).fetchall())
    assert n_spark == 0, (
        f"{name}: Spark now emits rows on empty input — the Expand "
        "divergence pinned here has changed; re-run the full empty sweep "
        "and move this query into the agreeing set"
    )
    assert n_duck == 1  # the () grand-total row, per the SQL standard
