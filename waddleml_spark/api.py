"""Module-level wandb-style API: init, log, finish, log_artifact, log_param,
log_tag (ref: waddle/_api.py — same signatures and semantics; the storage
argument is `store_path` for the store root directory, with `db_path`
accepted as an alias pointing at the same layout).

Write ordering honored exactly as the reference's init path
(waddle/_api.py:14-70): repo → commit → run → params/tags → metrics.
"""

from __future__ import annotations

import os
import time
import uuid
from typing import Any

from waddleml_spark import gitmeta, state
from waddleml_spark.run import Run
from waddleml_spark.store import WaddleStore


def init(
    project: str = "default",
    name: str | None = None,
    config: dict[str, Any] | None = None,
    tags: dict[str, Any] | None = None,
    store_path: str | None = None,
    db_path: str | None = None,
    system_metrics: bool = True,
    spark=None,
) -> Run:
    """Initialize a new run.  Works anywhere; inside a git repo the commit
    SHA and repo info are captured automatically (never required)."""
    store_path = store_path or db_path
    repo_id = None
    commit_sha = None

    repo_root = gitmeta.detect_repo_root(os.getcwd())
    if repo_root:
        if store_path is None:
            store_path = os.path.join(repo_root, ".waddle")
        store = WaddleStore(store_path, spark=spark)
        repo_id = _upsert_repo(store, repo_root)
        commit_sha = gitmeta.auto_snapshot(repo_root)
        if commit_sha:
            _record_commit(store, repo_id, commit_sha, repo_root)
    else:
        if store_path is None:
            store_path = os.path.join(os.getcwd(), ".waddle")
        store = WaddleStore(store_path, spark=spark)

    run = Run(
        store=store,
        run_id=uuid.uuid4().hex,
        project=project,
        name=name,
        config=config,
        tags=tags,
        repo_id=repo_id,
        commit_sha=commit_sha,
        system_metrics=system_metrics,
    )
    state.set_active_run(run)
    return run


def _upsert_repo(store: WaddleStore, repo_root: str) -> str:
    """Repo upsert by name (ref: waddle/_db.py:76-98): existing repo keeps
    its id, path/origin/branch refresh; else a new 32-hex id."""
    name = os.path.basename(repo_root)
    existing = store._duck_row("repos", "name", name)
    rid = existing["id"] if existing else uuid.uuid4().hex
    store.upsert(
        "repos",
        [
            {
                "id": rid,
                "name": name,
                "path": repo_root,
                "origin_url": gitmeta.get_origin(repo_root),
                "default_branch": gitmeta.detect_default_branch(repo_root),
                "created_at": existing["created_at"] if existing else time.time(),
            }
        ],
    )
    return rid


def _record_commit(store: WaddleStore, repo_id: str, commit_sha: str, repo_root: str) -> None:
    """Idempotent commit record (ref: waddle/_db.py:111-134, ON CONFLICT
    DO NOTHING / J5 anti-insert)."""
    meta = gitmeta.head_commit(repo_root) or {}
    store.upsert(
        "commits",
        [
            {
                "repo_id": repo_id,
                "commit_sha": commit_sha,
                "tree_sha": meta.get("tree_sha"),
                "author": meta.get("author"),
                "author_time": meta.get("author_time"),
                "message": meta.get("message"),
            }
        ],
    )


def _require_run() -> Run:
    run = state.get_active_run()
    if run is None:
        raise RuntimeError("No active run. Call waddleml_spark.init() first.")
    return run


def log(metrics: dict[str, float], step: int | None = None) -> None:
    _require_run().log(metrics, step=step)


def log_param(key: str, value: Any) -> None:
    _require_run().log_param(key, value)


def log_tag(key: str, value: Any) -> None:
    _require_run().log_tag(key, value)


def log_artifact(
    name: str, path: str | None = None, kind: str = "file", inline: bool = False
) -> str:
    return _require_run().log_artifact(name, path, kind, inline)


def finish() -> None:
    run = state.get_active_run()
    if run is None:
        return
    run.finish()
    state.set_active_run(None)


def serve_dashboard(host: str = "0.0.0.0", port: int = 8000):
    """Module-level dashboard launcher on the ACTIVE run's store — export
    parity with the reference (waddle/_api.py:111-116): raises when no
    run is active, otherwise delegates to Run.serve_dashboard."""
    run = state.get_active_run()
    if run is None:
        raise RuntimeError("No active run. Call waddleml_spark.init() first.")
    return run.serve_dashboard(host=host, port=port)
