"""Pure-Python Delta Lake transaction log — reader, writer, checkpoint.

The Delta Lake PROTOCOL (delta.io/protocol, public spec) is a directory
of parquet data files plus an ordered log of JSON commits under
``_delta_log/``: each ``%020d.json`` holds actions (``protocol``,
``metaData``, ``add``, ``remove``, ``commitInfo``), the table state at
version v is the action-by-action replay up to v, and a parquet
checkpoint (``%020d.checkpoint.parquet`` + ``_last_checkpoint``)
collapses the replay prefix.  None of that needs the delta-spark jars —
it is JSON + parquet footers — so this module implements the log
natively and hands Spark a plain ``spark.read.parquet`` over exactly
the live file set.  ``sources/lakehouse.py`` prefers the real data
source when its jars are present and falls back to this.

What is implemented (and spec-conformant in layout):

* ``write_delta``: append / overwrite commits, optional hive-style
  partitioning (``partitionValues`` in the add action is the source of
  truth, as the spec requires), per-file ``stats`` with ``numRecords``,
  protocol (1, 2) + metaData on first commit, ``commitInfo`` per commit.
* ``read_delta``: latest-or-``version`` snapshot (time travel) from the
  newest checkpoint ≤ v plus JSON tail replay; partition columns are
  reconstructed from ``partitionValues`` and cast to the metaData
  schema's types (Delta's ``schemaString`` IS Spark's StructType JSON).
* ``create_checkpoint``: one-row-per-action parquet checkpoint
  (add/metaData/protocol structs, ``partitionValues`` as a map) +
  ``_last_checkpoint`` pointer, after which older JSON commits are no
  longer needed for reads.
* ``history`` / ``vacuum``: commitInfo log and unreferenced-file GC.

Documented simplifications vs the full spec: no deletion vectors,
column mapping, generated columns, CDC files, or multi-part
checkpoints; concurrent overwrites conflict instead of rebasing
(appends retry).  Single-filesystem atomicity via ``os.rename`` — an
object store would use a conditional PUT, same protocol shape.

No counterpart in the reference (briangu/waddleml persists to one
embedded DuckDB file, waddle/_db.py); this is the open-format escape
hatch a 100 TB corpus needs: old snapshots stay pinned for reproducible
training runs while ingest appends (see also sources/snaptable.py for
the package-native format with manifest-level min/max pruning).
"""

from __future__ import annotations

import json
import os
import time
import uuid
from urllib.parse import quote, unquote

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

_LOG = "_delta_log"
_NULL_PART = "__HIVE_DEFAULT_PARTITION__"


def _log_dir(table: str) -> str:
    return os.path.join(table, _LOG)


def _commit_path(table: str, version: int) -> str:
    return os.path.join(_log_dir(table), f"{version:020d}.json")


def _checkpoint_path(table: str, version: int) -> str:
    return os.path.join(_log_dir(table), f"{version:020d}.checkpoint.parquet")


def _list_commits(table: str) -> list[int]:
    d = _log_dir(table)
    if not os.path.isdir(d):
        return []
    out = []
    for n in os.listdir(d):
        if n.endswith(".json") and len(n) == 25 and n[:20].isdigit():
            out.append(int(n[:20]))
    return sorted(out)


def _list_checkpoints(table: str) -> list[int]:
    d = _log_dir(table)
    if not os.path.isdir(d):
        return []
    out = []
    for n in os.listdir(d):
        if n.endswith(".checkpoint.parquet") and n[:20].isdigit():
            out.append(int(n[:20]))
    return sorted(out)


def current_version(table: str) -> int:
    """Latest committed version (0-based, per the spec); -1 if no table."""
    commits = _list_commits(table)
    cps = _list_checkpoints(table)
    vs = commits + cps
    return max(vs) if vs else -1


def _partition_values(raw) -> dict[str, str | None]:
    """Normalize partitionValues from JSON (dict) or checkpoint (map →
    list of (k, v) pairs under pyarrow) to a plain dict."""
    if raw is None:
        return {}
    if isinstance(raw, dict):
        return dict(raw)
    return {k: v for k, v in raw}


def _replay_state(table: str, version: int) -> dict:
    """Table state at ``version``: checkpoint base + JSON tail replay.

    ``removes`` carries the still-standing tombstones (spec: checkpoints
    must retain remove actions until vacuum's retention expires them) —
    a re-add of the same path clears its tombstone."""
    adds: dict[str, dict] = {}
    removes: dict[str, dict] = {}
    meta: dict | None = None
    txns: dict[str, dict] = {}
    start = 0
    cps = [c for c in _list_checkpoints(table) if c <= version]
    if cps:
        cp = cps[-1]
        t = pq.read_table(_checkpoint_path(table, cp))
        for rec in t.to_pylist():
            a, m = rec.get("add"), rec.get("metaData")
            if a is not None and a.get("path"):
                a = dict(a)
                a["partitionValues"] = _partition_values(a.get("partitionValues"))
                adds[a["path"]] = a
            if m is not None and m.get("id"):
                meta = dict(m)
            r = rec.get("remove")
            if r is not None and r.get("path"):
                removes[r["path"]] = dict(r)
            x = rec.get("txn")
            if x is not None and x.get("appId"):
                txns[x["appId"]] = dict(x)
        start = cp + 1
    for v in range(start, version + 1):
        p = _commit_path(table, v)
        if not os.path.exists(p):
            if v == 0 and start == 0:
                raise FileNotFoundError(f"no delta table at {table!r}")
            raise FileNotFoundError(f"delta log gap: missing version {v} of {table!r}")
        with open(p) as f:
            for line in f:
                if not line.strip():
                    continue
                action = json.loads(line)
                if "add" in action:
                    a = action["add"]
                    a["partitionValues"] = _partition_values(a.get("partitionValues"))
                    adds[a["path"]] = a
                    removes.pop(a["path"], None)
                elif "remove" in action:
                    r = action["remove"]
                    adds.pop(r["path"], None)
                    removes[r["path"]] = r
                elif "metaData" in action:
                    meta = action["metaData"]
                elif "txn" in action:
                    txns[action["txn"]["appId"]] = action["txn"]
    if meta is None:
        raise ValueError(f"delta log of {table!r} has no metaData action")
    return {"adds": adds, "metaData": meta, "removes": removes, "txns": txns}


def read_delta(
    spark: SparkSession, table: str, version: int | None = None
) -> DataFrame:
    """Read a Delta table snapshot with no delta-spark jars.

    Latest version by default; ``version=`` time-travels (versions are
    0-based like the spec/`DESCRIBE HISTORY`).  Partition columns are
    rebuilt from each file's ``partitionValues`` (the spec's source of
    truth — data files do not contain them) and cast to the types in
    the metaData ``schemaString``.  Scale shape: one ``spark.read
    .parquet`` per distinct partition tuple, unioned by position after
    projecting to schema order — the scan itself stays JVM-native with
    full pushdown into the listed files.
    """
    v = current_version(table) if version is None else version
    if v < 0:
        raise FileNotFoundError(f"no delta table at {table!r}")
    state = _replay_state(table, v)
    meta = state["metaData"]
    schema = StructType.fromJson(json.loads(meta["schemaString"]))
    part_cols = list(meta.get("partitionColumns") or [])
    data_schema = StructType([f for f in schema.fields if f.name not in part_cols])
    by_type = {f.name: f.dataType for f in schema.fields}
    if not state["adds"]:
        return spark.createDataFrame([], schema)
    groups: dict[tuple, list[str]] = {}
    for a in state["adds"].values():
        key = tuple(a["partitionValues"].get(c) for c in part_cols)
        groups.setdefault(key, []).append(os.path.join(table, unquote(a["path"])))
    parts = []
    for key, paths in sorted(groups.items(), key=lambda kv: tuple(map(str, kv[0]))):
        df = spark.read.schema(data_schema).parquet(*paths)
        for c, raw in zip(part_cols, key):
            val = None if raw is None or raw == _NULL_PART else raw
            df = df.withColumn(c, F.lit(val).cast(by_type[c]))
        parts.append(df.select(*[f.name for f in schema.fields]))
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out


def _stage_files(
    df: DataFrame, table: str, partition_by: list[str] | None
) -> list[dict]:
    """Write df via Spark into a staging dir, move the parquet files to
    their final table-relative paths, return add actions."""
    staging = os.path.join(table, f".tmp-{uuid.uuid4().hex}")
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(staging)
    adds: list[dict] = []
    for dirpath, _dirs, names in os.walk(staging):
        for n in sorted(names):
            if not n.endswith(".parquet"):
                continue
            src = os.path.join(dirpath, n)
            rel_dir = os.path.relpath(dirpath, staging)
            pvals: dict[str, str | None] = {}
            if rel_dir != ".":
                for comp in rel_dir.split(os.sep):
                    k, _, raw = comp.partition("=")
                    pvals[k] = None if raw == _NULL_PART else unquote(raw)
            final_rel = os.path.join(
                "" if rel_dir == "." else rel_dir, f"part-{uuid.uuid4().hex}.parquet"
            )
            dst = os.path.join(table, final_rel)
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            os.rename(src, dst)
            md = pq.read_metadata(dst)
            # the spec's add.path is a percent-encoded relative URI: store
            # it so unquote(path) reproduces the LITERAL on-disk name —
            # Spark hive-escapes partition values in dir names (k=a%3Ab),
            # and that raw '%' must survive the round trip or readers
            # miss the file and vacuum deletes live data
            adds.append(
                {
                    "path": quote(final_rel.replace(os.sep, "/"), safe="/=-._"),
                    "partitionValues": pvals,
                    "size": os.path.getsize(dst),
                    "modificationTime": int(os.path.getmtime(dst) * 1000),
                    "dataChange": True,
                    "stats": json.dumps({"numRecords": md.num_rows}),
                }
            )
    # clear the staging skeleton (_SUCCESS, empty partition dirs)
    for dirpath, _dirs, names in os.walk(staging, topdown=False):
        for n in names:
            os.unlink(os.path.join(dirpath, n))
        os.rmdir(dirpath)
    return adds


def write_delta(
    df: DataFrame,
    table: str,
    mode: str = "append",
    partition_by: list[str] | None = None,
) -> int:
    """Commit ``df`` to a Delta table; returns the committed version.

    First commit writes ``protocol`` (minReader 1 / minWriter 2) and
    ``metaData``; overwrite emits ``remove`` actions for every
    previously-live file (old versions stay readable until ``vacuum``).
    Appends retry past concurrent commits; a concurrent overwrite
    conflicts (its remove set would be stale).
    """
    if mode not in ("append", "overwrite"):
        raise ValueError(f"mode must be append|overwrite, got {mode!r}")
    requested_parts = None if partition_by is None else list(partition_by)
    # Stage the data files once (they are commit-independent); the
    # validate-build-publish sequence below re-runs IN FULL after a lost
    # version race, so an append that raced a concurrent commit is
    # re-validated against the NEW tip's schema/partitioning and never
    # re-emits a stale protocol/metaData (a lost create race must not
    # mint a second table identity at version 1).
    first_schema_check = True
    staged: list[dict] | None = None
    while True:
        parent = current_version(table)
        partition_by = requested_parts
        if parent >= 0:
            prev = _replay_state(table, parent)
            prev_meta = prev["metaData"]
            prev_parts = list(prev_meta.get("partitionColumns") or [])
            if partition_by is None:
                partition_by = prev_parts
            elif partition_by != prev_parts:
                raise ValueError(
                    f"partition_by {partition_by} != table's {prev_parts}"
                )
            if mode == "append" and json.loads(df.schema.json()) != json.loads(
                prev_meta["schemaString"]
            ):
                raise ValueError(
                    "append schema mismatch vs "
                    + ("current" if first_schema_check else "concurrently committed")
                    + " snapshot"
                )
        if staged is None:
            staged_parts = list(partition_by or [])
            staged = _stage_files(df, table, partition_by or None)
            os.makedirs(_log_dir(table), exist_ok=True)
        elif list(partition_by or []) != staged_parts:
            raise RuntimeError(
                "concurrent commit changed the table's partitioning "
                f"({staged_parts} -> {list(partition_by or [])}); retry the write"
            )
        first_schema_check = False
        actions: list[dict] = []
        if parent < 0:
            actions.append(
                {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}}
            )
        if parent < 0 or mode == "overwrite":
            actions.append(
                {
                    "metaData": {
                        "id": str(uuid.uuid4()),
                        "format": {"provider": "parquet", "options": {}},
                        "schemaString": df.schema.json(),
                        "partitionColumns": list(partition_by or []),
                        "configuration": {},
                        "createdTime": int(time.time() * 1000),
                    }
                }
            )
        if parent >= 0 and mode == "overwrite":
            actions += [
                {
                    "remove": {
                        "path": a["path"],
                        "deletionTimestamp": int(time.time() * 1000),
                        "dataChange": True,
                    }
                }
                for a in prev["adds"].values()
            ]
        actions += [{"add": a} for a in staged]
        actions.append(
            {
                "commitInfo": {
                    "timestamp": int(time.time() * 1000),
                    "operation": "WRITE",
                    "operationParameters": {"mode": mode},
                }
            }
        )
        version = parent + 1
        tmp = os.path.join(_log_dir(table), f".tmp-{uuid.uuid4().hex}.json")
        with open(tmp, "w") as f:
            f.write("\n".join(json.dumps(a) for a in actions) + "\n")
        target = _commit_path(table, version)
        try:
            # atomic claim: os.link fails EEXIST; an exists-check+rename
            # window would let two racers clobber one commit file
            os.link(tmp, target)
        except FileExistsError:  # lost the race: rebase onto the new tip
            os.unlink(tmp)
            if mode == "overwrite":
                raise RuntimeError(
                    f"concurrent commit conflict at version {version} "
                    "(overwrite cannot auto-rebase; retry the write)"
                )
            continue
        os.unlink(tmp)
        return version


def create_checkpoint(table: str, version: int | None = None) -> int:
    """Write ``{v}.checkpoint.parquet`` + ``_last_checkpoint``.

    The checkpoint is the complete replayed state at ``v``, one action
    per row with the FULL set of top-level action columns a Delta reader
    replays — ``add``, ``remove`` (standing tombstones; a client that
    replays the checkpoint plus newer commits must see them or a
    vacuum-era file could resurrect), ``txn`` (streaming-writer
    idempotence watermarks), ``metaData`` (incl. ``configuration`` and
    ``format.options``) and ``protocol`` — with ``partitionValues`` as a
    string→string map.  After it, reads never touch the JSON commits at
    or before ``v``.
    """
    v = current_version(table) if version is None else version
    state = _replay_state(table, v)
    meta = state["metaData"]
    str_map = pa.map_(pa.string(), pa.string())
    add_t = pa.struct(
        [
            ("path", pa.string()),
            ("partitionValues", str_map),
            ("size", pa.int64()),
            ("modificationTime", pa.int64()),
            ("dataChange", pa.bool_()),
            ("stats", pa.string()),
        ]
    )
    remove_t = pa.struct(
        [
            ("path", pa.string()),
            ("deletionTimestamp", pa.int64()),
            ("dataChange", pa.bool_()),
            ("extendedFileMetadata", pa.bool_()),
            ("partitionValues", str_map),
            ("size", pa.int64()),
        ]
    )
    txn_t = pa.struct(
        [
            ("appId", pa.string()),
            ("version", pa.int64()),
            ("lastUpdated", pa.int64()),
        ]
    )
    meta_t = pa.struct(
        [
            ("id", pa.string()),
            ("name", pa.string()),
            ("description", pa.string()),
            (
                "format",
                pa.struct([("provider", pa.string()), ("options", str_map)]),
            ),
            ("schemaString", pa.string()),
            ("partitionColumns", pa.list_(pa.string())),
            ("configuration", str_map),
            ("createdTime", pa.int64()),
        ]
    )
    proto_t = pa.struct(
        [("minReaderVersion", pa.int32()), ("minWriterVersion", pa.int32())]
    )

    n_actions = (
        len(state["adds"]) + len(state["removes"]) + len(state["txns"]) + 2
    )
    cols: dict[str, list] = {
        k: [None] * n_actions for k in ("add", "remove", "txn", "metaData", "protocol")
    }
    i = 0
    for a in state["adds"].values():
        cols["add"][i] = {
            "path": a["path"],
            "partitionValues": list(a["partitionValues"].items()),
            "size": a.get("size"),
            "modificationTime": a.get("modificationTime"),
            "dataChange": False,
            "stats": a.get("stats"),
        }
        i += 1
    for r in state["removes"].values():
        cols["remove"][i] = {
            "path": r["path"],
            "deletionTimestamp": r.get("deletionTimestamp"),
            "dataChange": False,
            "extendedFileMetadata": r.get("extendedFileMetadata"),
            "partitionValues": (
                list(_partition_values(r.get("partitionValues")).items())
                if r.get("partitionValues") is not None
                else None
            ),
            "size": r.get("size"),
        }
        i += 1
    for x in state["txns"].values():
        cols["txn"][i] = {
            "appId": x["appId"],
            "version": x.get("version"),
            "lastUpdated": x.get("lastUpdated"),
        }
        i += 1
    fmt = meta.get("format") or {}
    cols["metaData"][i] = {
        "id": meta["id"],
        "name": meta.get("name"),
        "description": meta.get("description"),
        "format": {
            "provider": fmt.get("provider", "parquet"),
            "options": list((fmt.get("options") or {}).items()),
        },
        "schemaString": meta["schemaString"],
        "partitionColumns": list(meta.get("partitionColumns") or []),
        "configuration": list((meta.get("configuration") or {}).items()),
        "createdTime": meta.get("createdTime"),
    }
    cols["protocol"][i + 1] = {"minReaderVersion": 1, "minWriterVersion": 2}
    t = pa.table(
        {
            "txn": pa.array(cols["txn"], type=txn_t),
            "add": pa.array(cols["add"], type=add_t),
            "remove": pa.array(cols["remove"], type=remove_t),
            "metaData": pa.array(cols["metaData"], type=meta_t),
            "protocol": pa.array(cols["protocol"], type=proto_t),
        }
    )
    pq.write_table(t, _checkpoint_path(table, v))
    with open(os.path.join(_log_dir(table), "_last_checkpoint"), "w") as f:
        json.dump({"version": v, "size": t.num_rows}, f)
    return v


def history(table: str) -> list[dict]:
    """Commit log oldest-first from each version's commitInfo action."""
    out = []
    for v in _list_commits(table):
        info = {}
        with open(_commit_path(table, v)) as f:
            for line in f:
                if line.strip():
                    a = json.loads(line)
                    if "commitInfo" in a:
                        info = a["commitInfo"]
        out.append({"version": v, **info})
    return out


def vacuum(table: str, retain_minutes: float = 30.0) -> list[str]:
    """Delete data files not referenced by the LATEST snapshot (plus
    crashed-commit staging leftovers).  Returns deleted relative paths.
    Time travel before the latest version stops working — the trade.

    ``retain_minutes`` is the concurrent-writer grace window (Delta's
    retention check): a writer moves staged parquet to final paths
    BEFORE its log commit, so an unreferenced-but-young file may belong
    to an in-flight write — deleting it would make the imminent commit
    reference missing data.  Files younger than the window are skipped;
    pass 0 only when no writer can be active."""
    v = current_version(table)
    if v < 0:
        return []
    live = {unquote(a["path"]) for a in _replay_state(table, v)["adds"].values()}
    cutoff = time.time() - retain_minutes * 60.0
    deleted: list[str] = []
    for dirpath, _dirs, names in os.walk(table, topdown=False):
        if os.path.basename(dirpath) == _LOG or (_LOG + os.sep) in dirpath:
            continue
        for n in names:
            full = os.path.join(dirpath, n)
            rel = os.path.relpath(full, table).replace(os.sep, "/")
            if rel not in live and (n.endswith(".parquet") or n.startswith(("_", "."))):
                try:
                    if os.path.getmtime(full) > cutoff:
                        continue  # possibly an in-flight writer's staging
                except OSError:
                    continue
                os.unlink(full)
                deleted.append(rel)
        if dirpath != table and not os.listdir(dirpath):
            os.rmdir(dirpath)
    return deleted
