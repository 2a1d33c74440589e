"""Randomized relational fuzzing: hypothesis-generated filter+group+agg
query shapes executed on both engines (Spark DataFrame plan vs generated
DuckDB SQL) over the orders fixture — an SQL-logic-corpus-style check the
reference lacks entirely."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from waddleml_spark.session import read_table
from waddleml_spark.testing import compare, duckdb_conn
from tests.conftest import SF_SMOKE

SET = settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

NUM_COLS = ["o_orderkey", "o_custkey", "o_totalprice"]
STR_COLS = ["o_orderstatus", "o_orderpriority"]
OPS = ["<", "<=", ">", ">=", "=", "<>"]

filter_st = st.lists(
    st.tuples(
        st.sampled_from(NUM_COLS),
        st.sampled_from(OPS),
        st.integers(0, 200000),
    ),
    min_size=0,
    max_size=3,
)


@pytest.fixture(scope="module")
def duck_smoke_orders():
    con = duckdb_conn(SF_SMOKE)
    yield con
    con.close()


@given(
    filters=filter_st,
    group=st.sampled_from(STR_COLS),
    agg_col=st.sampled_from(NUM_COLS),
    kind=st.sampled_from(["count", "min", "max"]),
)
@SET
def test_fuzz_filter_group_agg(spark, duck_smoke_orders, filters, group, agg_col, kind):
    df = read_table(spark, SF_SMOKE, "orders")
    where = []
    for col, op, val in filters:
        expr = {
            "<": F.col(col) < val,
            "<=": F.col(col) <= val,
            ">": F.col(col) > val,
            ">=": F.col(col) >= val,
            "=": F.col(col) == val,
            "<>": F.col(col) != val,
        }[op]
        df = df.filter(expr)
        where.append(f"{col} {op} {val}")
    aggfn = {"count": F.count, "min": F.min, "max": F.max}[kind]
    out = df.groupBy(group).agg(aggfn(agg_col).alias("agg_v"))
    sql = f"SELECT {group}, {kind}({agg_col}) AS agg_v FROM orders"
    if where:
        sql += " WHERE " + " AND ".join(where)
    sql += f" GROUP BY {group}"
    ok, msg = compare(out, duck_smoke_orders, sql, name="fuzz")
    assert ok, msg


@given(
    col=st.sampled_from([c for c in NUM_COLS + STR_COLS if c != "o_orderkey"]),
    desc=st.booleans(),
    limit=st.integers(1, 40),
)
@SET
def test_fuzz_topn(spark, duck_smoke_orders, col, desc, limit):
    df = read_table(spark, SF_SMOKE, "orders")
    key = F.col(col).desc() if desc else F.col(col).asc()
    out = (
        df.orderBy(key, F.col("o_orderkey"))
        .limit(limit)
        .select("o_orderkey", col)
    )
    d = "DESC" if desc else "ASC"
    sql = (
        f"SELECT o_orderkey, {col} FROM orders "
        f"ORDER BY {col} {d}, o_orderkey LIMIT {limit}"
    )
    ok, msg = compare(out, duck_smoke_orders, sql, name="fuzz_topn")
    assert ok, msg
