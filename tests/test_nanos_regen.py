"""End-to-end insurance against testdata physical-type regeneration:
rebuild sf0.001 with TIMESTAMP(NANOS) columns and run the temporal-heavy
oracle pairs through the full compare — the exact round-1 failure class
(driver regenerated parquet with nanos; every timestamp query went red).
test_schema_drift covers read_table unit-wise; this covers the whole
query-vs-oracle path on regenerated files."""

from __future__ import annotations

import os
import shutil

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from waddleml_spark import catalog
from waddleml_spark.testing import compare
from tests.conftest import SF_SMOKE

# every oracle-paired query whose semantics hinge on timestamp values
TEMPORAL_QUERIES = [
    "sessionize_users",
    "asof_purchase_click",
    "range_pairs_60s",
    "hypertable_rollup_day",
    "derived_duration",
    "resample_purchase_1h",
    "orders_per_month",
    "tpch_q1",
    "agg_minmax_count",
    "lead_lag_delta",
]


@pytest.fixture(scope="module")
def nanos_dir(tmp_path_factory):
    dst = str(tmp_path_factory.mktemp("sfnanos"))
    for n in os.listdir(SF_SMOKE):
        if not n.endswith(".parquet"):
            continue
        t = pq.read_table(os.path.join(SF_SMOKE, n))
        fields = [
            pa.field(f.name, pa.timestamp("ns"))
            if pa.types.is_timestamp(f.type)
            else f
            for f in t.schema
        ]
        pq.write_table(
            t.cast(pa.schema(fields)),
            os.path.join(dst, n),
            store_schema=False,  # physical TIMESTAMP(NANOS), no arrow hint
            version="2.6",
        )
    yield dst
    shutil.rmtree(dst, ignore_errors=True)


@pytest.fixture(scope="module")
def duck_nanos(nanos_dir):
    con = duckdb.connect()
    for n in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {n} AS SELECT * FROM "
            f"read_parquet('{nanos_dir}/{n}.parquet')"
        )
    yield con
    con.close()


def test_nanos_regeneration_has_nanos_types(nanos_dir):
    s = pq.read_schema(os.path.join(nanos_dir, "events.parquet"))
    assert "timestamp[ns]" in str(dict(zip(s.names, s.types))["ts"])


@pytest.mark.parametrize("name", TEMPORAL_QUERIES)
def test_temporal_oracle_parity_on_nanos(spark, duck_nanos, nanos_dir, name):
    df = catalog.QUERIES[name](spark, nanos_dir)
    ok, msg = compare(df, duck_nanos, catalog.ORACLE[name], name=name)
    assert ok, msg
