"""Schema-layer parity (ref tests/test_waddle.py model): DDL creates all 7
tables, repo upsert round-trips, nullable FKs on runs."""

from __future__ import annotations

import pytest

from waddleml_spark import schemas
from waddleml_spark.store import WaddleStore


def test_ddl_creates_all_seven_tables(tmp_path, spark):
    store = WaddleStore(str(tmp_path / "s"), spark=spark)
    tables = {
        r[0]
        for r in store.duck.execute(
            "SELECT table_name FROM information_schema.tables "
            "WHERE table_schema = 'main'"
        ).fetchall()
    }
    assert {"repos", "commits", "runs", "params", "tags", "metrics", "artifacts"} <= tables
    # spark StructTypes cover the same 7
    assert set(schemas.WADDLE_TABLES) == {
        "repos", "commits", "runs", "params", "tags", "metrics", "artifacts",
    }
    store.close()


def test_repo_upsert_round_trip(tmp_path, spark):
    # ref tests/test_waddle.py:31-38: same name keeps id, refreshes fields
    store = WaddleStore(str(tmp_path / "s"), spark=spark)
    row = {
        "id": "a" * 32, "name": "proj", "path": "/old", "origin_url": None,
        "default_branch": "main", "created_at": 1000.0,
    }
    store.upsert("repos", [row])
    row2 = dict(row, id="b" * 32, path="/new", origin_url="https://x/r.git")
    store.upsert("repos", [row2])
    got = store._duck_row("repos", "name", "proj")
    assert got["id"] == "a" * 32  # PK retained on conflict-by-name
    assert got["path"] == "/new"
    assert got["origin_url"] == "https://x/r.git"
    # parquet dedupe view converges (keyed by name)
    pq = store.df("repos").collect()
    assert len(pq) == 1 and pq[0].path == "/new"
    store.close()


def test_runs_nullable_fk(tmp_path, spark):
    # ref tests/test_waddle.py:63-74: runs insert with NULL repo/commit
    store = WaddleStore(str(tmp_path / "s"), spark=spark)
    store.append(
        "runs",
        [{
            "id": "c" * 32, "project": "p", "repo_id": None, "commit_sha": None,
            "name": "r", "status": "running", "started_at": 1.0, "ended_at": None,
            "env": "{}", "config": "{}", "notes": None,
        }],
    )
    got = store._duck_row("runs", "id", "c" * 32)
    assert got["repo_id"] is None and got["commit_sha"] is None
    store.close()


def test_run_status_enum(tmp_path, spark):
    assert schemas.RUN_STATUSES == ("running", "completed", "failed", "aborted")


def test_read_table_normalizes_timestamp_physical_types(tmp_path, spark):
    """Driver testdata timestamp physical types drift between rounds
    (TIMESTAMP(NANOS) → timestamp[us]/NTZ observed r1→r2); read_table must
    deliver cast-to-double-able instant timestamps with identical epoch
    values for every variant, on any session."""
    import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from waddleml_spark.session import read_table

    inst = datetime.datetime(2024, 1, 15, 12, 30, 0)
    epoch = 1705321800.0

    # timestamp[us] no tz → Spark would infer TIMESTAMP_NTZ
    d1 = tmp_path / "v_us"
    d1.mkdir()
    pq.write_table(
        pa.table({"event_id": pa.array([1], pa.int64()),
                  "ts": pa.array([inst], pa.timestamp("us"))}),
        str(d1 / "events.parquet"),
    )
    # timestamp[ns] → nanosAsLong path (long → timestamp_micros)
    d2 = tmp_path / "v_ns"
    d2.mkdir()
    pq.write_table(
        pa.table({"event_id": pa.array([1], pa.int64()),
                  "ts": pa.array([inst], pa.timestamp("ns"))}),
        str(d2 / "events.parquet"),
    )
    # date32 → midnight-UTC timestamp
    d3 = tmp_path / "v_date"
    d3.mkdir()
    pq.write_table(
        pa.table({"o_orderkey": pa.array([1], pa.int64()),
                  "o_orderdate": pa.array([inst.date()], pa.date32())}),
        str(d3 / "orders.parquet"),
    )

    for d, name, col, want in [
        (d1, "events", "ts", epoch),
        (d2, "events", "ts", epoch),
        (d3, "orders", "o_orderdate", 1705276800.0),
    ]:
        df = read_table(spark, str(d), name)
        assert df.schema[col].dataType.typeName() == "timestamp", (d, col)
        got = df.select(F.col(col).cast("double")).collect()[0][0]
        assert got == want, (d, col, got, want)


def test_canonical_json_keeps_nulls_and_validates_names(spark):
    # round-6 review find: to_json drops null fields by default, so the
    # "canonical" form diverged from the reference's json.dumps (which
    # keeps them); and a short names list silently TRUNCATED fields
    import pytest
    from pyspark.sql import functions as F

    from waddleml_spark.functions.scalars import canonical_json

    df = spark.createDataFrame([(None, 1)], "a string, b long")
    out = df.select(canonical_json("a", "b").alias("j")).first().j
    assert out == '{"a":null,"b":1}'
    with pytest.raises(ValueError, match="names"):
        canonical_json(F.col("a"), F.col("b"), names=["x"])
