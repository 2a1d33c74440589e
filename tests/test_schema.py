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
