"""Explicit StructType schemas.

Waddle-domain tables mirror the reference DDL (ref: waddle/_schema.py:3-72):
7 tables — repos, commits, runs, params, tags, metrics, artifacts.  Types map
per SURVEY.md §1.3: epoch-seconds DOUBLE timestamps, JSON kept as canonical
sorted strings, BLOB → BinaryType.

Driver synthetic tables (TESTDATA.md / FIXTURES.md §B) are read from parquet
with their embedded schemas; the constants here are for validation only.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- waddle domain (ref: waddle/_schema.py) ---------------------------------

REPOS = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("name", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("origin_url", T.StringType(), True),
        T.StructField("default_branch", T.StringType(), True),
        T.StructField("created_at", T.DoubleType(), False),
    ]
)

COMMITS = T.StructType(
    [
        T.StructField("repo_id", T.StringType(), False),
        T.StructField("commit_sha", T.StringType(), False),
        T.StructField("tree_sha", T.StringType(), True),
        T.StructField("author", T.StringType(), True),
        T.StructField("author_time", T.DoubleType(), True),
        T.StructField("message", T.StringType(), True),
    ]
)

RUNS = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("project", T.StringType(), False),
        T.StructField("repo_id", T.StringType(), True),
        T.StructField("commit_sha", T.StringType(), True),
        T.StructField("name", T.StringType(), True),
        T.StructField("status", T.StringType(), False),
        T.StructField("started_at", T.DoubleType(), False),
        T.StructField("ended_at", T.DoubleType(), True),
        T.StructField("env", T.StringType(), True),  # canonical sorted JSON
        T.StructField("config", T.StringType(), True),  # canonical sorted JSON
        T.StructField("notes", T.StringType(), True),
    ]
)

# EAV tables: PK (run_id, key), value is a JSON-encoded scalar/structure.
PARAMS = T.StructType(
    [
        T.StructField("run_id", T.StringType(), False),
        T.StructField("key", T.StringType(), False),
        T.StructField("value", T.StringType(), False),
    ]
)
TAGS = PARAMS

# Tall fact table; ref has a secondary index (run_id,key,step) — our
# equivalent is partition-by-run_id + sortWithinPartitions(key, step) so
# parquet min/max stats prune series scans (SURVEY.md §4.1).
METRICS = T.StructType(
    [
        T.StructField("run_id", T.StringType(), False),
        T.StructField("key", T.StringType(), False),
        T.StructField("step", T.IntegerType(), False),
        T.StructField("ts", T.DoubleType(), False),
        T.StructField("value", T.DoubleType(), False),
    ]
)

ARTIFACTS = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("run_id", T.StringType(), False),
        T.StructField("name", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("created_at", T.DoubleType(), False),
        T.StructField("uri", T.StringType(), True),
        T.StructField("sha256", T.StringType(), True),
        T.StructField("size_bytes", T.LongType(), True),
        T.StructField("inline_bytes", T.BinaryType(), True),
    ]
)

WADDLE_TABLES: dict[str, T.StructType] = {
    "repos": REPOS,
    "commits": COMMITS,
    "runs": RUNS,
    "params": PARAMS,
    "tags": TAGS,
    "metrics": METRICS,
    "artifacts": ARTIFACTS,
}

# Run status enum-by-convention (ref: waddle/_run.py:53,192-201).
RUN_STATUSES = ("running", "completed", "failed", "aborted")

# DuckDB mirror DDL — semantically equivalent to waddle/_schema.py:3-72
# (constraints relaxed: the Spark side treats these as append logs and
# enforces key semantics via dedupe views; DuckDB is storage/oracle).
DUCKDB_DDL = """
CREATE TABLE IF NOT EXISTS repos (
    id VARCHAR PRIMARY KEY, name VARCHAR NOT NULL UNIQUE, path VARCHAR NOT NULL,
    origin_url VARCHAR, default_branch VARCHAR, created_at DOUBLE NOT NULL);
CREATE TABLE IF NOT EXISTS commits (
    repo_id VARCHAR NOT NULL, commit_sha VARCHAR NOT NULL, tree_sha VARCHAR,
    author VARCHAR, author_time DOUBLE, message VARCHAR,
    PRIMARY KEY (repo_id, commit_sha));
CREATE TABLE IF NOT EXISTS runs (
    id VARCHAR PRIMARY KEY, project VARCHAR NOT NULL DEFAULT 'default',
    repo_id VARCHAR, commit_sha VARCHAR, name VARCHAR,
    status VARCHAR NOT NULL DEFAULT 'running',
    started_at DOUBLE NOT NULL, ended_at DOUBLE,
    env JSON, config JSON, notes VARCHAR);
CREATE TABLE IF NOT EXISTS params (
    run_id VARCHAR NOT NULL, key VARCHAR NOT NULL, value JSON NOT NULL,
    PRIMARY KEY (run_id, key));
CREATE TABLE IF NOT EXISTS tags (
    run_id VARCHAR NOT NULL, key VARCHAR NOT NULL, value JSON NOT NULL,
    PRIMARY KEY (run_id, key));
CREATE TABLE IF NOT EXISTS metrics (
    run_id VARCHAR NOT NULL, key VARCHAR NOT NULL, step INTEGER NOT NULL,
    ts DOUBLE NOT NULL, value DOUBLE NOT NULL);
CREATE INDEX IF NOT EXISTS idx_metrics_run_key_step
    ON metrics (run_id, key, step);
CREATE TABLE IF NOT EXISTS artifacts (
    id VARCHAR PRIMARY KEY, run_id VARCHAR NOT NULL, name VARCHAR NOT NULL,
    kind VARCHAR NOT NULL DEFAULT 'file', created_at DOUBLE NOT NULL,
    uri VARCHAR, sha256 VARCHAR, size_bytes BIGINT, inline_bytes BLOB);
"""
